package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Normalizers, TimeFunctions}
import graft.sources.Tables
import graft.streaming.EventStreams

/** Streaming/session/time/multimodal queries (SURVEY.md §2 #12, #29,
  * #31, #42).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // #12 event-time windowed aggregation — identical plan runs under
    // Structured Streaming (see EventStreams + StreamingSpec).
    "q_stream_window" -> { (s, dir) =>
      EventStreams.windowedCounts(Tables(s, dir).events, "10 minutes", "1 hour")
        .select(
          unix_millis(col("window_start")).as("window_start_ms"),
          col("event_type"), col("cnt"), col("sum_value")
        )
    },

    // #12 gap sessionization (batch formulation of the stateful op).
    "q_sessionize" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[EventStreams.Event]
      EventStreams.sessionizeBatch(ev, gapMs = 600000L)
        .select(
          col("user_id"),
          unix_millis(col("start")).as("start_ms"),
          unix_millis(col("end")).as("end_ms"),
          col("n_events"),
          round(col("total_value"), 2).as("total_value")
        )
    },

    // #49b NATIVE session windows (the Catalyst session_window
    // operator Structured Streaming shares, vs q_sessionize's typed
    // mapGroups form): 30-min-gap sessions per user, declarative —
    // one (user, merged-window) hash aggregate, no per-group sort or
    // object serialization, AQE-splittable.
    "q_session_native" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          max(unix_millis(col("ts"))).as("last_ms"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("user_id"), unix_millis(col("sw.start")).as("start_ms"),
          col("last_ms"), col("n_events"), col("value_cents"))
    },

    // #12b exact dedup with bounded state: the batch twin of
    // dropDuplicatesWithinWatermark (stream form in StreamingSpec).
    "q_stream_dedup" -> { (s, dir) =>
      EventStreams.dedupWithinWatermark(
        Tables(s, dir).events, Seq("user_id", "event_type"), "10 minutes")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"))
    },

    // #42at streaming near-dup vs a static reference corpus: batch
    // twin of TextDedup.nearDupsAgainstReference (stream form in
    // StreamingSpec). md5-portable basis so the full stream-static
    // probe chain is oracle-exact; planted variants of reference docs
    // guarantee known positives.
    "q_stream_neardup" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val ref = d.filter(col("doc_id") % 25 === 0).select("doc_id", "text")
      val probe = d.filter(col("doc_id") % 25 =!= 0).select("doc_id", "text")
        .unionByName(ref.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" extra tail token")).as("text")))
        .withColumn("ts", col("doc_id").cast("timestamp"))
      TextDedup.nearDupsAgainstReference(probe, ref, "doc_id", "text",
        tsCol = "ts", ngram = 3, h = 8, bands = 4, minJaccard = 0.5, portable = true)
    },

    // #29 ORCID list: normalize + dedupe + sort + piped.
    "q_orcid_list" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_orderkey")
        .agg(
          Normalizers.piped(
            Normalizers.orcidList(
              collect_set(concat(lit("https://orcid.org/s"), col("l_suppkey").cast("string")))
            )
          ).as("orcids")
        )
    },

    // #31 days_since with Python timedelta.days flooring.
    "q_days_since" -> { (s, dir) =>
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        TimeFunctions.daysBetween(col("o_orderdate"), lit("2026-08-12").cast("timestamp")).as("age_days")
      )
    },

    // #42 byte accounting through the mapPartitions decode path.
    "q_multimodal_bytes" -> { (s, dir) =>
      val media = Tables(s, dir).documents.select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("content")
      )
      Multimodal.extractFeatures(media, dim = 8).select("media_id", "n_bytes")
    },

    // #42c REAL image decode (javax.imageio): synthesize a grayscale
    // PNG per doc, decode it back, and let the oracle recompute dims
    // and the pixel checksum as pure arithmetic — PNG is lossless, so
    // a hash match proves the codec path reads true pixel data.
    "q_image_decode" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 13 + 4).as("w"),
        (col("doc_id") % 11 + 4).as("h"))
      Multimodal.decodeImages(Multimodal.synthGrayPng(d, "doc_id", "w", "h"))
        .select("media_id", "decode_ok", "width", "height", "pixel_sum")
    },

    // Shannon entropy of each REAL-decoded image's gray histogram —
    // the exposure/contrast quality gate of a vision-data pipeline:
    // H = log2(n) − Σc·log2(c)/n over exact integer counts, only
    // (value, count) rows ever leave the codec boundary.
    "q_image_entropy" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 13 + 4).as("w"),
        (col("doc_id") % 11 + 4).as("h"))
      val hist = Multimodal.pixelHistogram(Multimodal.synthGrayPng(d, "doc_id", "w", "h"))
      hist.groupBy("media_id")
        .agg(sum("cnt").as("n_pixels"), count(lit(1)).as("n_distinct"),
          sum(col("cnt").cast("double") * log2(col("cnt").cast("double"))).as("clc"))
        .select(col("media_id"), col("n_pixels"), col("n_distinct"),
          round(log2(col("n_pixels").cast("double")) -
            col("clc") / col("n_pixels").cast("double"), 4).as("entropy_bits"))
    },

    // #42v2 ViT patch grid over REAL-decoded PNGs: 2×2 partition,
    // exact per-patch luminance sums, mean formed in the SQL layer.
    "q_image_patches" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 13 + 4).as("w"),
        (col("doc_id") % 11 + 4).as("h"))
      Multimodal.patchGrid(Multimodal.synthGrayPng(d, "doc_id", "w", "h"), grid = 2)
    },

    // #42 header-only media probe: container + dimensions from the
    // first bytes as pure column algebra (no codec, no mapPartitions)
    // — the routing/triage pass that runs before any decode. Probes a
    // mixed lake of real PNGs, real WAVs, and junk blobs; the oracle
    // recomputes every field from the synth formulas.
    "q_media_probe" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val png = Multimodal.synthGrayPng(
        d.select(col("doc_id"), (col("doc_id") % 13 + 4).as("w"), (col("doc_id") % 11 + 4).as("h")),
        "doc_id", "w", "h")
      val wav = Multimodal.synthPcmWav(
        d.select((col("doc_id") + 1000000L).as("wid"), lit(25).as("n")), "wid", "n")
      val junk = d.select((col("doc_id") + 2000000L).as("media_id"),
        lit("junk").as("kind"), encode(col("text"), "UTF-8").as("content"))
      Multimodal.probeHeaders(png.unionByName(wav).unionByName(junk))
    },

    // #42d REAL audio decode (javax.sound.sampled): synthesize a mono
    // 16-bit PCM WAV per doc, decode it back, and let the oracle
    // recompute the sample checksum as pure arithmetic — PCM is
    // lossless, so a hash match proves the codec path reads true
    // sample data.
    "q_audio_decode" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 50 + 20).cast("int").as("n"))
      Multimodal.decodeAudio(Multimodal.synthPcmWav(d, "doc_id", "n"))
        .select("media_id", "decode_ok", "channels", "sample_rate", "n_samples", "sample_sum")
    },

    // #42bl REAL spectral analysis (Goertzel band energy) over decoded
    // PCM: each doc's WAV carries a pure sine at DFT bin
    // (doc_id%8+1)*4; by orthogonality the dominant measured band must
    // be exactly the planted one with share 1.00 — physics the oracle
    // pins per row, while the Spark side runs the real decode + DFT
    // recurrence.
    "q_audio_spectrum" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 4 * 64 + 256).cast("int").as("n"))
      Multimodal.audioBandEnergy(
        Multimodal.synthToneWav(d, "doc_id", "n"), Seq(4, 8, 12, 16, 20, 24, 28, 32))
        .withColumn("expected_band", (col("media_id") % 8).cast("int"))
        .withColumn("matches", col("dominant_band") === col("expected_band"))
        .select("media_id", "decode_ok", "dominant_band", "dominant_share",
          "expected_band", "matches")
    },

    // #42 REAL video decode (RIFF/AVI with uncompressed 24-bit DIB
    // frames — the lossless, codec-free video format): synthesize an
    // AVI per doc, decode it back with frame sampling fused in
    // (stride 2), and let the oracle recompute the sampled-frame
    // pixel checksum as pure arithmetic.
    "q_video_decode" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 9 + 4).cast("int").as("w"),
        (col("doc_id") % 7 + 4).cast("int").as("h"),
        (col("doc_id") % 5 + 2).cast("int").as("n"))
      Multimodal.decodeVideo(Multimodal.synthDibAvi(d, "doc_id", "w", "h", "n"), stride = 2)
        .select("media_id", "decode_ok", "width", "height", "n_frames", "n_sampled", "pixel_sum")
    },

    // #42 perceptual-hash image near-dup: REAL decode → integer-exact
    // dHash → banded LSH on 16-bit quarters → exact Hamming verify.
    // Planted positives: every 5th doc gets a twin image under a
    // shifted id — even ones byte-identical (hamming 0), odd ones
    // with one perturbed pixel (small hamming). The oracle recomputes
    // hash and pairs as pure arithmetic from the pixel formula.
    "q_image_neardup" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val base = d.select(
        col("doc_id").as("media"), col("doc_id").as("seed"),
        (col("doc_id") % 13 + 9).cast("int").as("w"),
        (col("doc_id") % 11 + 8).cast("int").as("h"),
        lit(0).cast("int").as("delta"))
      val twins = d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 1000000L).as("media"), col("doc_id").as("seed"),
        (col("doc_id") % 13 + 9).cast("int").as("w"),
        (col("doc_id") % 11 + 8).cast("int").as("h"),
        (pmod(col("doc_id"), lit(2)) * 64).cast("int").as("delta"))
      val media = Multimodal.synthGrayPngSeeded(
        base.unionByName(twins), "media", "seed", "w", "h", "delta")
      Multimodal.dHashNearDup(Multimodal.dHashImages(media), maxHamming = 6)
    },

    // #13c boolean-formatted download projection (reference
    // publish/publication.py:398-421): booleans become literal
    // 'true'/'false' strings and NULL stays NULL (empty CSV cell, NOT
    // 'false'). Booleans derived from documents so all three states
    // (true / false / null) are exercised.
    "q_csv_boolfmt" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(null).cast("boolean"))
          .otherwise(col("doc_id") % 3 === 0).as("flag"),
        col("lang"))
      graft.sources.Sinks.boolFormatted(d)
    },

    // #42e-audio REAL audio feature extraction (RMS energy basis,
    // zero crossings, peak) over decoded PCM — the filter signals an
    // audio-corpus curation pass needs; integer arithmetic, so the
    // oracle recomputes every feature exactly.
    "q_audio_features" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(
        col("doc_id"),
        (col("doc_id") % 50 + 20).cast("int").as("n"))
      Multimodal.audioFeatures(Multimodal.synthPcmWav(d, "doc_id", "n"))
        .select("media_id", "decode_ok", "n_samples", "sum_sq", "zero_crossings", "peak")
    },

    // #42 resize plumbing: target dims in metadata + deterministic
    // byte resample, accounting oracle-checked.
    "q_multimodal_resize" -> { (s, dir) =>
      val media = Tables(s, dir).documents.select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          (lit(100) + pmod(col("doc_id"), lit(50)).cast("int")).as("width"),
          lit(80).as("height"), lit("raw").as("format")).as("meta"))
      Multimodal.resizeImages(media, targetW = 64, targetH = 64)
        .select(
          col("media_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          length(col("content")).cast("long").as("n_bytes_out"))
    },

    // #42 REAL multimodal feature extraction: synth PNGs and WAVs
    // through the container-routed decode → per-media luminance /
    // sample histogram, exploded to (bucket, cnt) rows. Counts are
    // exact integers the oracle recomputes from the synth
    // pixel/sample formulas — including the zero buckets, so the
    // full dim-8 histogram is proven, not just the populated cells.
    "q_multimodal_features" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val png = Multimodal.synthGrayPng(
        d.select(col("doc_id"), (col("doc_id") % 13 + 4).as("w"), (col("doc_id") % 11 + 4).as("h")),
        "doc_id", "w", "h")
      val wav = Multimodal.synthPcmWav(
        d.select((col("doc_id") + 1000000L).as("wid"),
          (col("doc_id") % 50 + 20).cast("int").as("n")), "wid", "n")
      Multimodal.extractFeatures(png.unionByName(wav), dim = 8)
        .select(col("media_id"), col("container"), col("decode_ok"),
          posexplode(col("hist")).as(Seq("bucket", "cnt")))
    }
  )

  /** Renders the md5 shingle+signature+band CTE pair over a docs CTE
    * `src` (doc_id, text), prefixed `pfx` — both sides of
    * q_stream_neardup derive from this one template (h=8, bands=4,
    * ngram=3, matching the query's parameters).
    */
  private def minhashChainDuck(src: String, pfx: String): String =
    s"""${pfx}g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
       |        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS sh
       |      FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM $src) t
       |      WHERE len(ws) >= 3),
       |${pfx}bd AS (SELECT doc_id, u.band AS band, u.bh AS bh FROM (
       |      SELECT doc_id, unnest(list_transform(range(0, 4), b ->
       |        {'band': b, 'bh': array_to_string(list_slice(sig, b * 2 + 1, b * 2 + 2), '')})) AS u
       |      FROM (SELECT doc_id, list_transform(range(0, 8), i ->
       |              list_min(list_transform(sh, s -> substr(md5(s || ':' || i), 1, 16)))) AS sig
       |            FROM ${pfx}g) s) t)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_stream_neardup" ->
      s"""WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0),
         |pr AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 <> 0
         |       UNION ALL
         |       SELECT doc_id + 1000000 AS doc_id, text || ' extra tail token' AS text FROM ref),
         |${minhashChainDuck("ref", "r")},
         |${minhashChainDuck("pr", "p")},
         |cand AS (SELECT DISTINCT p.doc_id AS id, r.doc_id AS ref_id
         |         FROM pbd p JOIN rbd r ON r.band = p.band AND r.bh = p.bh
         |         WHERE p.doc_id <> r.doc_id),
         |j AS (SELECT c.id, c.ref_id,
         |        round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |          ELSE CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
         |               / len(list_distinct(list_concat(a.sh, b.sh))) END, 4) AS jaccard
         |      FROM cand c JOIN pg a ON a.doc_id = c.id JOIN rg b ON b.doc_id = c.ref_id)
         |SELECT id, ref_id, jaccard FROM j WHERE jaccard >= 0.5""".stripMargin,
    // byte accounting of the multimodal plumbing — proves the
    // mapPartitions featurization path preserves rows and content
    // length (text blobs take extractFeatures' byte-histogram
    // fallback route; n_bytes is route-independent)
    "q_multimodal_bytes" ->
      """SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // Recomputes BOTH real-decode histograms as pure arithmetic:
    // PNG luminance v(x,y) = (id*31 + x*7 + y*13) mod 256 bucketed
    // v·8/256, WAV sample s(i) = ((id*31 + i*7) mod 4096) − 2048
    // bucketed (s+32768)·8/65536 — cross-joined against all 8
    // buckets so the zero cells are proven too. A hash match means
    // the REAL codecs (ImageIO, javax.sound) fed the feature path
    // with exactly the planted pixels/samples.
    "q_multimodal_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h,
        |             doc_id % 50 + 20 AS n FROM documents),
        |png AS (SELECT d.doc_id AS media_id, 'png' AS container,
        |          ((d.doc_id * 31 + x.k * 7 + y.k * 13) % 256) * 8 // 256 AS bucket
        |        FROM d, range(0, 16) x(k), range(0, 14) y(k)
        |        WHERE x.k < d.w AND y.k < d.h),
        |wav AS (SELECT d.doc_id + 1000000 AS media_id, 'wav' AS container,
        |          (((((d.doc_id + 1000000) * 31 + i.k * 7) % 4096) - 2048) + 32768) * 8 // 65536 AS bucket
        |        FROM d, range(0, 70) i(k) WHERE i.k < d.n),
        |u AS (SELECT * FROM png UNION ALL SELECT * FROM wav),
        |counts AS (SELECT media_id, container, bucket, count(*) AS c
        |           FROM u GROUP BY 1, 2, 3),
        |ids AS (SELECT DISTINCT media_id, container FROM u)
        |SELECT i.media_id, i.container, TRUE AS decode_ok,
        |       CAST(b.k AS INTEGER) AS bucket,
        |       CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
        |FROM ids i CROSS JOIN range(0, 8) b(k)
        |LEFT JOIN counts c ON c.media_id = i.media_id AND c.bucket = b.k""".stripMargin,
    // Recomputes the PNG round-trip's expected pixels as arithmetic:
    // v(x,y) = (id*31 + x*7 + y*13) mod 256 summed over the w×h grid
    // (ranges cover the max dims, filtered per row). PNG is lossless,
    // so the decoded sum must equal this exactly.
    "q_image_patches" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h FROM documents),
        |px AS (SELECT d.doc_id, (y.k * 2) // d.h AS pr, (x.k * 2) // d.w AS pc,
        |         (d.doc_id * 31 + x.k * 7 + y.k * 13) % 256 AS v
        |       FROM d, range(0, 16) x(k), range(0, 14) y(k)
        |       WHERE x.k < d.w AND y.k < d.h)
        |SELECT doc_id AS media_id, CAST(pr AS INTEGER) AS patch_row,
        |  CAST(pc AS INTEGER) AS patch_col,
        |  CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS lum_sum,
        |  round(sum(v)::DOUBLE / count(*)::DOUBLE, 4) + 0.0 AS lum_mean
        |FROM px GROUP BY doc_id, pr, pc""".stripMargin,
    "q_image_decode" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h FROM documents)
        |SELECT d.doc_id AS media_id, TRUE AS decode_ok,
        |  CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
        |  CAST(sum((d.doc_id * 31 + x.k * 7 + y.k * 13) % 256) AS BIGINT) AS pixel_sum
        |FROM d, range(0, 16) x(k), range(0, 14) y(k)
        |WHERE x.k < d.w AND y.k < d.h
        |GROUP BY d.doc_id, d.w, d.h""".stripMargin,
    // Pixel values recomputed from the synth formula, histogrammed,
    // and folded into H = log2(n) - sum c*log2(c)/n per image.
    "q_image_entropy" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h FROM documents),
        |px AS (SELECT d.doc_id AS media_id,
        |         (d.doc_id * 31 + x.k * 7 + y.k * 13) % 256 AS v
        |       FROM d, range(0, 16) x(k), range(0, 14) y(k)
        |       WHERE x.k < d.w AND y.k < d.h),
        |hh AS (SELECT media_id, v, CAST(count(*) AS BIGINT) AS cnt FROM px GROUP BY 1, 2),
        |ag AS (SELECT media_id, CAST(sum(cnt) AS BIGINT) AS n_pixels,
        |         CAST(count(*) AS BIGINT) AS n_distinct,
        |         sum(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE))) AS clc
        |       FROM hh GROUP BY media_id)
        |SELECT media_id, n_pixels, n_distinct,
        |  round(log2(CAST(n_pixels AS DOUBLE)) - clc / CAST(n_pixels AS DOUBLE), 4)
        |    AS entropy_bits
        |FROM ag""".stripMargin,
    // Every probed field recomputed from the synth formulas: PNG dims
    // from the w/h expressions (ImageIO writes 8-bit channels), WAV
    // constants from the hand-rolled 44-byte header, junk text blobs
    // probe unknown with NULL dims.
    "q_media_probe" ->
      """SELECT doc_id AS media_id, 'png' AS container,
        |       CAST(doc_id % 13 + 4 AS BIGINT) AS dim1,
        |       CAST(doc_id % 11 + 4 AS BIGINT) AS dim2,
        |       CAST(8 AS BIGINT) AS depth
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000, 'wav', 1, 8000, 16 FROM documents
        |UNION ALL
        |SELECT doc_id + 2000000, 'unknown', NULL, NULL, NULL FROM documents""".stripMargin,

    // Recomputes the dHash near-dup chain as pure arithmetic: pixel
    // v(x,y) from the synth formula, 9x8 cell sums by the same
    // floor-division mapping, left>right bits via the same
    // cross-multiplication, then the identical band+verify candidate
    // generation — so the decoded-pixel path is proven end to end.
    "q_image_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS seed,
        |         doc_id % 13 + 9 AS w, doc_id % 11 + 8 AS h, 0 AS delta FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, doc_id % 13 + 9, doc_id % 11 + 8,
        |         (doc_id % 2) * 64 FROM documents WHERE doc_id % 5 = 0),
        |pxx AS (SELECT media_id, seed, w, h, delta, unnest(range(w)) AS x FROM m),
        |px AS (SELECT media_id, seed, w, h, delta, x, unnest(range(h)) AS y FROM pxx),
        |pv AS (SELECT media_id, x * 9 // w AS cx, y * 8 // h AS cy,
        |         ((s * 31 + x * 7 + y * 13) * (s * 13 + x * 101 + y * 31) // 16 +
        |          CASE WHEN x = 0 AND y = 0 THEN delta ELSE 0 END) % 256 AS v
        |       FROM (SELECT *, (seed * 2654435761) % 100000000 AS s FROM px) t),
        |cells AS (SELECT media_id, cx, cy, sum(v) AS s, count(*) AS c
        |          FROM pv GROUP BY media_id, cx, cy),
        |bits AS (SELECT l.media_id, l.cx, l.cy,
        |           CASE WHEN l.s * r.c > r.s * l.c THEN 1 ELSE 0 END AS bit
        |         FROM cells l JOIN cells r
        |           ON r.media_id = l.media_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |         WHERE l.cx < 8),
        |hs AS (SELECT media_id,
        |         CAST(sum(CASE WHEN cy < 4 THEN bit * (1::BIGINT << (cx + 8 * cy))
        |                  ELSE 0 END) AS BIGINT) AS hash_hi,
        |         CAST(sum(CASE WHEN cy >= 4 THEN bit * (1::BIGINT << (cx + 8 * (cy - 4)))
        |                  ELSE 0 END) AS BIGINT) AS hash_lo
        |       FROM bits GROUP BY media_id),
        |bd AS (SELECT media_id, hash_hi, hash_lo, b.band,
        |         CASE b.band WHEN 0 THEN hash_hi // 65536 WHEN 1 THEN hash_hi % 65536
        |                     WHEN 2 THEN hash_lo // 65536 ELSE hash_lo % 65536 END AS key
        |       FROM hs, (SELECT unnest(range(4)) AS band) b),
        |cand AS (SELECT DISTINCT a.media_id AS ida, b2.media_id AS idb,
        |                a.hash_hi AS ha, a.hash_lo AS la, b2.hash_hi AS hb, b2.hash_lo AS lb
        |         FROM bd a JOIN bd b2
        |           ON a.band = b2.band AND a.key = b2.key AND a.media_id < b2.media_id)
        |SELECT ida AS media_id_a, idb AS media_id_b,
        |       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 6""".stripMargin,
    // Mirrors the reference _copy_stmt CASE: true→'true', false→
    // 'false', NULL→NULL.
    "q_csv_boolfmt" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN 'true' ELSE 'false' END AS flag,
        |  lang
        |FROM documents""".stripMargin,
    // Feature-level twin of q_audio_decode: sum of squares, sign
    // changes, and max |v| over the same synthetic wave, via a lag
    // window in DuckDB.
    "q_audio_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 50 + 20 AS n FROM documents),
        |s AS (SELECT d.doc_id, d.n, i.k AS i,
        |        (d.doc_id * 31 + i.k * 7) % 4096 - 2048 AS v
        |      FROM d, range(0, 70) i(k) WHERE i.k < d.n),
        |s2 AS (SELECT doc_id, n, i, v,
        |         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s)
        |SELECT doc_id AS media_id, TRUE AS decode_ok,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |  CAST(max(abs(v)) AS INTEGER) AS peak
        |FROM s2 GROUP BY doc_id, n""".stripMargin,
    // Recomputes the WAV round-trip's expected samples as arithmetic:
    // v(i) = (id*31 + i*7) mod 4096 - 2048 summed over n samples (the
    // range covers the max n, filtered per row). PCM is lossless, so
    // the decoded sum must equal this exactly.
    "q_audio_decode" ->
      """WITH d AS (SELECT doc_id, doc_id % 50 + 20 AS n FROM documents)
        |SELECT d.doc_id AS media_id, TRUE AS decode_ok,
        |  CAST(1 AS INTEGER) AS channels, CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(d.n AS BIGINT) AS n_samples,
        |  CAST(sum((d.doc_id * 31 + i.k * 7) % 4096 - 2048) AS BIGINT) AS sample_sum
        |FROM d, range(0, 70) i(k)
        |WHERE i.k < d.n
        |GROUP BY d.doc_id, d.n""".stripMargin,
    // The spectral physics pinned per row: a full-window pure tone at
    // DFT bin (id%8+1)*4 puts all measured energy in that Goertzel
    // band (orthogonal bins read ~0), so dominant = planted and the
    // rounded share is exactly 1.0.
    "q_audio_spectrum" ->
      """SELECT doc_id AS media_id, TRUE AS decode_ok,
        |  CAST(doc_id % 8 AS INTEGER) AS dominant_band,
        |  CAST(1.0 AS DOUBLE) AS dominant_share,
        |  CAST(doc_id % 8 AS INTEGER) AS expected_band,
        |  TRUE AS matches
        |FROM documents""".stripMargin,
    // Recomputes the AVI round-trip's sampled-frame pixel checksum as
    // arithmetic: v(f,x,y) = (id*31 + f*17 + x*7 + y*13) mod 256,
    // summed over even frames only (stride 2). Uncompressed DIB is
    // lossless, so the decoded sum must equal this exactly.
    "q_video_decode" ->
      """WITH d AS (SELECT doc_id, doc_id % 9 + 4 AS w, doc_id % 7 + 4 AS h,
        |                  doc_id % 5 + 2 AS n FROM documents)
        |SELECT d.doc_id AS media_id, TRUE AS decode_ok,
        |  CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
        |  CAST(d.n AS INTEGER) AS n_frames,
        |  CAST((d.n + 1) // 2 AS INTEGER) AS n_sampled,
        |  CAST(sum(CASE WHEN f.k % 2 = 0
        |           THEN (d.doc_id * 31 + f.k * 17 + x.k * 7 + y.k * 13) % 256
        |           ELSE 0 END) AS BIGINT) AS pixel_sum
        |FROM d, range(0, 6) f(k), range(0, 12) x(k), range(0, 10) y(k)
        |WHERE f.k < d.n AND x.k < d.w AND y.k < d.h
        |GROUP BY d.doc_id, d.w, d.h, d.n""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id AS media_id, 64 AS width, 64 AS height,
        |  CAST(ceil(strlen(text) * least(1.0, 4096.0 / ((100 + doc_id % 50) * 80.0))) AS BIGINT) AS n_bytes_out
        |FROM documents""".stripMargin,
    "q_stream_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms, event_type,
        |       count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (SELECT user_id, ts, value,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
        |y AS (SELECT user_id, ts, value,
        |        CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 600000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, ts, value,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM y)
        |SELECT user_id, epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM z GROUP BY user_id, sid""".stripMargin,
    "q_session_native" ->
      """WITH x AS (SELECT user_id, ts, value,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
        |y AS (SELECT user_id, ts, value,
        |        CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 1800000
        |             THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, ts, value,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM y)
        |SELECT user_id, epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS last_ms,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM z GROUP BY user_id, sid""".stripMargin,
    "q_stream_dedup" ->
      """SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q_orcid_list" ->
      """SELECT l_orderkey,
        |  string_agg(DISTINCT 's' || CAST(l_suppkey AS VARCHAR), '|' ORDER BY 's' || CAST(l_suppkey AS VARCHAR)) AS orcids
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q_days_since" ->
      """SELECT o_orderkey,
        |  CAST(floor((epoch(TIMESTAMP '2026-08-12') - epoch(o_orderdate)) / 86400) AS BIGINT) AS age_days
        |FROM orders""".stripMargin
  )
}
