package graft

import java.nio.file.Files

import graft.operators.Multimodal
import graft.sources.{AuthorsCsv, JsonSource, MediaFiles}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(content: String): String = {
    val f = Files.createTempFile("authors", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  private val header =
    "sunetid,cap_profile_id,orcidid,first_name,last_name,active,academic_council,role,all_schools,all_departments,primary_school,primary_department,primary_division"

  test("AuthorsCsv loads, parses booleans/arrays, nulls empty ids") {
    val path = writeCsv(
      header + "\n" +
        "jdoe,cap1,https://orcid.org/0000-0001,Jane,Doe,True,false,faculty,Eng|Med,CS|Bio,Eng,CS,Div1\n" +
        "asmith,,,Al,Smith,false,true,staff,,,Hum,Hist,\n"
    )
    val df = AuthorsCsv.load(spark, path)
    val rows = df.orderBy("sunet").collect()
    val a = rows(0) // asmith
    assert(a.getAs[String]("cap_profile_id") == null)
    assert(a.getAs[String]("orcid") == null)
    assert(!a.getAs[Boolean]("status") && a.getAs[Boolean]("academic_council"))
    assert(a.getSeq[String](a.fieldIndex("schools")).isEmpty)
    val j = rows(1) // jdoe
    assert(j.getAs[Boolean]("status") && !j.getAs[Boolean]("academic_council"))
    assert(j.getSeq[String](j.fieldIndex("schools")) == Seq("Eng", "Med"))
    assert(j.getSeq[String](j.fieldIndex("departments")) == Seq("CS", "Bio"))
  }

  test("AuthorsCsv tolerates malformed rows (permissive mode)") {
    val path = writeCsv(
      header + "\n" +
        "jdoe,cap1,,Jane,Doe,true,false,faculty,Eng,CS,Eng,CS,Div1\n" +
        "broken-row-with-too-few-fields\n"
    )
    val df = AuthorsCsv.load(spark, path)
    // the malformed row parses to nulls instead of failing the load;
    // a boolean cast over a null stays usable downstream
    assert(df.count() == 2)
    assert(df.filter(col("sunet") === "jdoe").count() == 1)
  }

  test("AuthorsCsv rejects files with missing headers") {
    val path = writeCsv("sunetid,first_name\njdoe,Jane\n")
    val ex = intercept[IllegalArgumentException](AuthorsCsv.load(spark, path))
    assert(ex.getMessage.contains("missing required"))
  }

  test("Multimodal extractFeatures: container routing, real decode, byte fallback") {
    // Real 2x2 grayscale PNG with known luminances 0, 64, 128, 192 →
    // dim-4 luminance histogram must read one pixel per bucket.
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for ((v, i) <- Seq(0, 64, 128, 192).zipWithIndex)
      img.setRGB(i % 2, i / 2, (v << 16) | (v << 8) | v)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (1L, bos.toByteArray),                       // real PNG → luminance hist
      (2L, "abcabc".getBytes("UTF-8")),            // text → byte-hist fallback
      (3L, Array.empty[Byte])                      // empty → zero hist
    ).toDF("media_id", "content")
    val out = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    // PNG row: routed + decoded, one pixel per luminance bucket.
    assert(out(0).getString(2) == "png" && out(0).getBoolean(3))
    assert(out(0).getSeq[Long](4) == Seq(1L, 1L, 1L, 1L))
    val feats = out(0).getSeq[Float](5)
    assert(feats.length == 4 && math.abs(feats.sum - 1.0f) < 1e-6)
    // Text row: fallback route, n_bytes accounted, 'a'/'b'/'c' ∈
    // [97, 99] → bucket 97*4/256 = 1 for all six bytes; decode_ok is
    // false.
    assert(out(1).getString(2) == "other" && !out(1).getBoolean(3))
    assert(out(1).getLong(1) == 6L && out(1).getSeq[Long](4) == Seq(0L, 6L, 0L, 0L))
    // Empty row: total 0 → all-zero features, no NaN from 0/0.
    assert(out(2).getSeq[Float](5).forall(_ == 0f))
    // rerun must produce identical features (deterministic decode)
    val again = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()(0).getSeq[Float](5)
    assert(again == feats)
  }

  test("Multimodal decodeImages reads true PNG pixel data; corrupt bytes degrade, not throw") {
    // Hand-built 3x2 PNG via ImageIO directly, pixels 10,20,30 / 40,50,60.
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for ((v, i) <- Seq(10, 20, 30, 40, 50, 60).zipWithIndex)
      img.setRGB(i % 3, i / 3, (v << 16) | (v << 8) | v)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (1L, bos.toByteArray),
      (2L, "not a png at all".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "content")
    val out = Multimodal.decodeImages(media).orderBy("media_id").collect()
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 3 && out(0).getInt(3) == 2)
    assert(out(0).getLong(4) == 10 + 20 + 30 + 40 + 50 + 60)
    assert(!out(1).getBoolean(1) && out(1).isNullAt(2))
    assert(!out(2).getBoolean(1) && out(2).isNullAt(4))
  }

  test("synthGrayPng → decodeImages round-trips dims and the arithmetic pixel sum") {
    val d = Seq((7L, 5, 4), (8L, 16, 14)).toDF("doc_id", "w", "h")
    val out = Multimodal.decodeImages(Multimodal.synthGrayPng(d, "doc_id", "w", "h"))
      .orderBy("media_id").collect()
    def expect(id: Long, w: Int, h: Int): Long =
      (for (x <- 0 until w; y <- 0 until h) yield (id * 31 + x * 7 + y * 13) % 256).sum
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 5 && out(0).getInt(3) == 4)
    assert(out(0).getLong(4) == expect(7L, 5, 4))
    assert(out(1).getLong(4) == expect(8L, 16, 14))
  }

  test("patchGrid: 2×2 partition covers every pixel with the arithmetic sums") {
    val d = Seq((7L, 5, 4)).toDF("doc_id", "w", "h")
    val out = Multimodal.patchGrid(Multimodal.synthGrayPng(d, "doc_id", "w", "h"), grid = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r).toMap
    assert(out.size == 4)
    // pixel (x, y) lands in patch (y*2/4, x*2/5): patch (0,0) covers x<3, y<2
    def lum(xs: Range, ys: Range): Long =
      (for (x <- xs; y <- ys) yield (7L * 31 + x * 7 + y * 13) % 256).sum
    assert(out((0, 0)).getAs[Long]("n_px") == 6L)
    assert(out((0, 0)).getAs[Long]("lum_sum") == lum(0 until 3, 0 until 2))
    assert(out((1, 1)).getAs[Long]("n_px") == 4L)
    assert(out((1, 1)).getAs[Long]("lum_sum") == lum(3 until 5, 2 until 4))
    val total = out.values.map(_.getAs[Long]("n_px")).sum
    assert(total == 20L) // every pixel assigned exactly once
  }

  test("SyntheticDocs DSv2: pushdown prunes partitions, pruning narrows the read schema, rows match the formula") {
    import graft.sources.SyntheticDocs
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "10000").option("partitions", "8").load()
    // row scans (collect, not count — count() is agg-pushed now) plan
    // the full slice grid
    assert(df.select("doc_id").collect().length == 10000)
    assert(!SyntheticDocs.lastAggPushed)
    assert(SyntheticDocs.lastPartitionCount == 8)
    // a doc_id range narrows the generated interval BEFORE planning:
    // slices wholly outside the bounds are never created
    val slice = df.filter(col("doc_id") >= 9000L && col("doc_id") < 9500L)
    assert(slice.select("doc_id").collect().length == 500)
    assert(SyntheticDocs.lastPartitionCount == 1, s"got ${SyntheticDocs.lastPartitionCount}")
    // column pruning reaches the reader (text generation skipped)
    slice.select("doc_id", "source").collect()
    assert(SyntheticDocs.lastReadSchema.fieldNames.toSeq == Seq("doc_id", "source"))
    // row content is the declared pure function of doc_id
    val r = df.filter(col("doc_id") === 7L).collect()(0)
    assert(r.getAs[String]("text") == SyntheticDocs.textOf(7L))
    assert(r.getAs[Long]("n_chars") == SyntheticDocs.textOf(7L).length.toLong)
    assert(r.getAs[String]("source") == "s2")
    // the consumed range filters apply EXACTLY via interval
    // intersection: an equality lands exactly one generated row
    assert(df.filter(col("doc_id") === 123L).select("doc_id").collect().length == 1)
  }

  test("SyntheticDocs DSv2 aggregate pushdown: COUNT/MIN/MAX answer from bounds, zero rows generated") {
    import graft.sources.SyntheticDocs
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "1000000").option("partitions", "8").load()
    // COUNT/MIN/MAX over a pushed doc_id range: one computed row, no
    // document generation at all (the footer-stats fast path)
    SyntheticDocs.rowsGenerated.set(0L)
    val r = df.filter(col("doc_id") >= 1000L && col("doc_id") <= 9999L)
      .agg(count(lit(1)).as("c"), min("doc_id").as("mn"), max("doc_id").as("mx"))
      .collect()(0)
    assert(r.getLong(0) == 9000L && r.getLong(1) == 1000L && r.getLong(2) == 9999L)
    assert(SyntheticDocs.lastAggPushed)
    assert(SyntheticDocs.lastPartitionCount == 1)
    assert(SyntheticDocs.rowsGenerated.get() == 0L,
      s"aggregate must not generate rows, generated ${SyntheticDocs.rowsGenerated.get()}")
    // a bare table count is the same zero-work path
    SyntheticDocs.rowsGenerated.set(0L)
    assert(df.count() == 1000000L)
    assert(SyntheticDocs.lastAggPushed && SyntheticDocs.rowsGenerated.get() == 0L)
    // empty pushed interval keeps SQL agg-over-zero-rows semantics
    val e = df.filter(col("doc_id") > 5000000L)
      .agg(count(lit(1)).as("c"), min("doc_id").as("mn")).collect()(0)
    assert(e.getLong(0) == 0L && e.isNullAt(1))
    // grouped aggregation is NOT supported: falls back to the row
    // scan and stays correct
    SyntheticDocs.rowsGenerated.set(0L)
    val g = df.filter(col("doc_id") < 50L).groupBy("source").count().collect()
    assert(g.map(_.getLong(1)).sum == 50L)
    assert(!SyntheticDocs.lastAggPushed)
    assert(SyntheticDocs.rowsGenerated.get() == 50L)
  }

  test("probeHeaders reads PNG/WAV dims from bytes alone; truncated, junk, and NULL blobs probe unknown") {
    val png = Multimodal.synthGrayPng(
      Seq((1L, 6, 9)).toDF("doc_id", "w", "h"), "doc_id", "w", "h")
    val wav = Multimodal.synthPcmWav(Seq((2L, 30)).toDF("id", "n"), "id", "n")
    // truncated PNG (below the 33-byte IHDR guard), junk text, NULL
    val pngBytes = png.collect()(0).getAs[Array[Byte]]("content")
    val odd = Seq(
      (3L, "junk", pngBytes.take(20)),
      (4L, "junk", "plain text bytes that are no container".getBytes("UTF-8")),
      (5L, "junk", null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "kind", "content")
    val got = Multimodal.probeHeaders(png.unionByName(wav).unionByName(odd))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got(0) == ((1L, "png", 6L, 9L, 8L)), got(0).toString)
    assert(got(1) == ((2L, "wav", 1L, 8000L, 16L)), got(1).toString)
    assert(got.drop(2).forall(t => t._2 == "unknown" && t._3 == -1L && t._4 == -1L && t._5 == -1L),
      got.drop(2).toSeq.toString)
  }

  test("dHashImages matches an independent pixel-loop reference; dHashNearDup finds the planted twin; degenerate inputs degrade") {
    // Independent reference: same pixel formula as synthGrayPngSeeded,
    // dHash computed by a direct loop — the operator must agree through
    // the PNG encode→decode round trip.
    def ref(rawSeed: Long, w: Int, h: Int, delta: Int): (Long, Long) = {
      val seed = java.lang.Math.floorMod(rawSeed * 2654435761L, 100000000L)
      val sums = Array.ofDim[Long](9, 8); val cnts = Array.ofDim[Long](9, 8)
      for (y <- 0 until h; x <- 0 until w) {
        val dd = if (x == 0 && y == 0) delta else 0
        val v = java.lang.Math.floorMod(
          (seed * 31 + x * 7 + y * 13) * (seed * 13 + x * 101 + y * 31) / 16 + dd, 256L)
        sums(x * 9 / w)(y * 8 / h) += v; cnts(x * 9 / w)(y * 8 / h) += 1
      }
      var hi = 0L; var lo = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (sums(cx)(cy) * cnts(cx + 1)(cy) > sums(cx + 1)(cy) * cnts(cx)(cy)) {
          if (cy < 4) hi |= 1L << (cx + 8 * cy) else lo |= 1L << (cx + 8 * (cy - 4))
        }
      (hi, lo)
    }
    val d = Seq((1L, 5L, 9, 8, 0), (2L, 5L, 9, 8, 64), (3L, 77L, 12, 10, 0))
      .toDF("media", "seed", "w", "h", "delta")
    val hashed = Multimodal.dHashImages(
      Multimodal.synthGrayPngSeeded(d, "media", "seed", "w", "h", "delta"))
    val out = hashed.orderBy("media_id").collect()
    for ((r, (seed, w, h, delta)) <- out.zip(Seq((5L, 9, 8, 0), (5L, 9, 8, 64), (77L, 12, 10, 0)))) {
      val (hi, lo) = ref(seed, w, h, delta)
      assert(r.getBoolean(1) && r.getLong(2) == hi && r.getLong(3) == lo,
        s"media ${r.getLong(0)}: got (${r.getLong(2)},${r.getLong(3)}), want ($hi,$lo)")
    }
    // 1 and 2 share a seed (one perturbed pixel): the banded near-dup
    // must surface exactly that pair among these three images.
    val pairs = Multimodal.dHashNearDup(hashed, maxHamming = 6).collect()
    assert(pairs.length == 1 &&
      pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L && pairs(0).getLong(2) <= 6)
    // sub-9x8 images and corrupt bytes: decode_ok=false, never a throw
    val small = Seq((9L, 9L, 8, 8, 0)).toDF("media", "seed", "w", "h", "delta")
    val smallOut = Multimodal.dHashImages(
      Multimodal.synthGrayPngSeeded(small, "media", "seed", "w", "h", "delta")).collect()
    assert(smallOut.length == 1 && !smallOut(0).getBoolean(1) && smallOut(0).isNullAt(2))
    val bad = Seq((10L, "not a png".getBytes("UTF-8")), (11L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val badOut = Multimodal.dHashImages(bad).collect()
    assert(badOut.forall(r => !r.getBoolean(1) && r.isNullAt(2)))
  }

  test("synthPcmWav → decodeAudio round-trips format and the arithmetic sample sum; corrupt bytes degrade, not throw") {
    val d = Seq((7L, 25), (8L, 64)).toDF("doc_id", "n")
    val out = Multimodal.decodeAudio(Multimodal.synthPcmWav(d, "doc_id", "n"))
      .orderBy("media_id").collect()
    def expect(id: Long, n: Int): Long =
      (0 until n).map(i => (id * 31 + i * 7) % 4096 - 2048).sum
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 1 && out(0).getInt(3) == 8000)
    assert(out(0).getLong(4) == 25L && out(0).getLong(5) == expect(7L, 25))
    assert(out(1).getLong(4) == 64L && out(1).getLong(5) == expect(8L, 64))
    // poisoned blobs and nulls: decode_ok=false, never an exception
    val bad = Seq(
      (1L, "not a wav".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "content")
    val badOut = Multimodal.decodeAudio(bad).orderBy("media_id").collect()
    assert(badOut.forall(r => !r.getBoolean(1) && r.isNullAt(5)))
  }

  test("synthToneWav → audioBandEnergy: a planted pure tone dominates exactly its Goertzel bin") {
    val d = Seq((0L, 256), (3L, 320), (5L, 384), (7L, 448)).toDF("doc_id", "n")
    val out = Multimodal.audioBandEnergy(
      Multimodal.synthToneWav(d, "doc_id", "n"), Seq(4, 8, 12, 16, 20, 24, 28, 32))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1), s"decode failed for $id")
      assert(r.getInt(2) == (id % 8).toInt, s"dominant band ${r.getInt(2)} != planted ${id % 8}")
      assert(r.getDouble(3) == 1.0, s"tone share ${r.getDouble(3)} not 1.0 for $id")
    }
    // poisoned blobs and nulls: decode_ok=false, never an exception
    val bad = Seq(
      (1L, "not a wav".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "content")
    val badOut = Multimodal.audioBandEnergy(bad, Seq(4, 8)).orderBy("media_id").collect()
    assert(badOut.forall(r => !r.getBoolean(1) && r.isNullAt(2)))
  }

  test("synthDibAvi → decodeVideo round-trips dims, frame counts, and the sampled-frame pixel sum") {
    val d = Seq((7L, 5, 4, 3), (8L, 9, 6, 4), (9L, 4, 4, 1)).toDF("doc_id", "w", "h", "n")
    val out = Multimodal.decodeVideo(Multimodal.synthDibAvi(d, "doc_id", "w", "h", "n"), stride = 2)
      .orderBy("media_id").collect()
    def expect(id: Long, w: Int, h: Int, n: Int): Long =
      (for (f <- 0 until n if f % 2 == 0; x <- 0 until w; y <- 0 until h)
        yield (id * 31 + f * 17 + x * 7 + y * 13) % 256).sum
    // (7): frames 0,2 sampled of 3; (8): 0,2 of 4; (9): 0 of 1
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 5 && out(0).getInt(3) == 4)
    assert(out(0).getInt(4) == 3 && out(0).getInt(5) == 2)
    assert(out(0).getLong(6) == expect(7L, 5, 4, 3))
    assert(out(1).getInt(4) == 4 && out(1).getInt(5) == 2)
    assert(out(1).getLong(6) == expect(8L, 9, 6, 4))
    assert(out(2).getInt(4) == 1 && out(2).getInt(5) == 1)
    assert(out(2).getLong(6) == expect(9L, 4, 4, 1))
  }

  test("decodeVideo: poisoned blobs degrade to decode_ok=false, never throw") {
    val good = Multimodal.synthDibAvi(Seq((1L, 4, 4, 2)).toDF("doc_id", "w", "h", "n"),
      "doc_id", "w", "h", "n").collect()(0).getAs[Array[Byte]]("content")
    val bad = Seq(
      (1L, "not an avi".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, good.take(40)), // truncated mid-header
      (4L, good.take(good.length - 5)), // truncated mid-frame
      (5L, { val b = good.clone(); b(9) = 'X'.toByte; b }), // wrong RIFF type
      (6L, { // frame-size/format mismatch: claim 8-bit in strf
        val b = good.clone()
        // strf biBitCount lives right after 'strf' size + 14 bytes
        val i = b.indexOfSlice("strf".getBytes("US-ASCII"))
        b(i + 8 + 14) = 8.toByte; b
      })
    ).toDF("media_id", "content")
    val out = Multimodal.decodeVideo(bad, stride = 2).orderBy("media_id").collect()
    assert(out.forall(r => !r.getBoolean(1) && r.isNullAt(6)))
  }

  test("audioFeatures matches a scalar reference on the synthetic wave") {
    val d = Seq((5L, 40)).toDF("doc_id", "n")
    val out = Multimodal.audioFeatures(Multimodal.synthPcmWav(d, "doc_id", "n")).collect()(0)
    val vs = (0 until 40).map(i => ((5L * 31 + i * 7) % 4096 - 2048).toInt)
    assert(out.getBoolean(1) && out.getLong(2) == 40L)
    assert(out.getLong(3) == vs.map(v => v.toLong * v).sum)
    assert(out.getLong(4) == vs.sliding(2).count { case Seq(a, b) => (a >= 0) != (b >= 0) })
    assert(out.getInt(5) == vs.map(math.abs).max)
  }

  test("MediaFiles binaryFile ingestion: per-object rows decode byte-identically, glob and length gates prune") {
    val dir = Files.createTempDirectory("media_src").toFile
    val d = Seq((3L, 4, 3), (11L, 6, 5), (12L, 9, 2)).toDF("doc_id", "w", "h")
    val pngs = Multimodal.synthGrayPng(d, "doc_id", "w", "h").collect()
    pngs.foreach { r =>
      Files.write(new java.io.File(dir, s"img_${r.getLong(0)}.png").toPath,
        r.getAs[Array[Byte]]("content"))
    }
    // objects the glob must never even list
    Files.write(new java.io.File(dir, "manifest.txt").toPath, "not media".getBytes("UTF-8"))

    val loaded = MediaFiles.load(spark, dir.getAbsolutePath, "*.png", "image")
    assert(loaded.count() == 3, "glob should admit exactly the three png objects")

    // ingested bytes decode to the same dims/pixel sums as the in-plan
    // frames they were written from — the object-store round trip is
    // byte-faithful end to end.
    val viaFiles = Multimodal.decodeImages(loaded.select("media_id", "content"))
      .select("media_id", "width", "height", "pixel_sum")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    val direct = Multimodal.decodeImages(
        Multimodal.synthGrayPng(d, "doc_id", "w", "h").select("media_id", "content"))
      .select("media_id", "width", "height", "pixel_sum")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(viaFiles == direct, s"file round-trip drifted: $viaFiles vs $direct")

    // size gate: a length predicate reaches the binaryFile relation
    // (pushed to the listing, skipped objects never open)
    val small = MediaFiles.load(spark, dir.getAbsolutePath, "*.png", "image")
      .filter(col("length") < pngs.map(_.getAs[Array[Byte]]("content").length).max)
    assert(small.count() < 3 && small.count() >= 1)
    val planStr = small.queryExecution.executedPlan.toString
    assert(planStr.contains("binaryFile") || planStr.contains("BinaryFile"),
      s"expected a binaryFile scan in:\n$planStr")
  }

  test("JsonSource quarantines malformed lines, projects good rows to schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      """{"doi": "10.1/a", "year": 2020}
        |not json at all
        |{"doi": "10.1/b", "year": 2021}
        |{"doi": "10.1/c", "year": "bad-int"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doi", StringType), StructField("year", IntegerType)))
    // Delta-based: other suites share this session and may hold their
    // own caches — assert only on the RDDs THIS loader adds/removes.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (good, bad, release) = JsonSource.loadWithQuarantine(spark, dir, schema)
    // the unparseable line AND the type-mismatched line are quarantined
    assert(bad.count() == 2)
    val rows = good.orderBy("doi").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows.toSeq == Seq(("10.1/a", 2020), ("10.1/b", 2021)))
    assert(good.schema.fieldNames.toSeq == Seq("doi", "year"))
    // DISK_ONLY persist while live; release() drops it
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    release()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("ORC round-trip preserves rows and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/t"
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    JsonSource.writeOrc(df, dir)
    val back = JsonSource.readOrc(spark, dir).filter(col("o_orderkey") < 100)
    assert(back.count() == df.filter(col("o_orderkey") < 100).count())
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.toLowerCase.contains("orc") && scan.contains("o_orderkey"), scan)
  }

  test("Multimodal resizeImages: target dims in meta, shrunken payload, image-only") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "0123456789abcdef".getBytes, (4, 2, "raw")),
      (2L, "video", "xxxx".getBytes, (4, 2, "raw"))
    ).toDF("media_id", "kind", "content", "m")
      .select(col("media_id"), col("kind"), col("content"),
        struct(col("m._1").as("width"), col("m._2").as("height"), col("m._3").as("format")).as("meta"))
    val out = Multimodal.resizeImages(media, targetW = 2, targetH = 2).collect()
    assert(out.length == 1) // video row filtered
    val r = out.head
    assert(r.getStruct(1).getInt(0) == 2 && r.getStruct(1).getInt(1) == 2)
    // 16 bytes x (4 target px / 8 orig px) = 8 bytes
    assert(r.getAs[Array[Byte]]("content").length == 8)
  }

  test("Multimodal sampleFrames explodes video content into frames") {
    val media = Seq((1L, "video", "0123456789"), (2L, "image", "xx")).toDF("media_id", "kind", "txt")
      .select(col("media_id"), col("kind"), encode(col("txt"), "UTF-8").as("content"))
    val frames = Multimodal.sampleFrames(media, stride = 4, frameBytes = 4).collect()
    assert(frames.forall(_.getLong(0) == 1L)) // image rows filtered out
    assert(frames.length == 3)                 // ceil(10/4) frames
  }

  test("DocsSink DSv2 write: two-phase commit round-trip with per-partition accounting") {
    import graft.sources.DocsSink
    val dir = Files.createTempDirectory("docs_sink").toString
    // generate through the DSv2 READ connector, write through the DSv2
    // WRITE connector — the full source-API loop
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", 1000).option("partitions", 7).load()
    val nParts = df.rdd.getNumPartitions
    df.write.format("graft.sources.DocsSink").option("path", dir)
      .mode("append").save()
    // commit accounting: exactly one committed task per input partition
    val entries = DocsSink.manifestEntries(dir)
    assert(entries.length == nParts, s"entries=${entries.length} parts=$nParts")
    assert(entries.map(_._3).sorted == (0 until nParts), "partition ids")
    assert(entries.map(_._2).sum == 1000L, "row accounting")
    // staging fully cleaned; only committed part files + manifest remain
    val left = Files.list(java.nio.file.Paths.get(dir)).iterator()
    val names = Iterator.continually(left).takeWhile(_.hasNext).map(_.next().getFileName.toString).toSet
    assert(!names.contains(DocsSink.StagingName), names.toString)
    assert(names.size == nParts + 1, names.toString) // parts + _manifest
    // manifest-gated read-back: identical content, pruning honored
    val back = spark.read.format("graft.sources.DocsSink").option("path", dir).load()
    assert(back.count() == 1000L)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    assert(back.select(sum("n_chars")).collect().head.getLong(0) ==
      df.select(sum("n_chars")).collect().head.getLong(0))
    // an orphan part file NOT in the manifest is invisible to readers
    Files.write(java.nio.file.Paths.get(dir, "part-99999-t999.tsv"),
      "7\tzz\t1\tzz\n".getBytes)
    assert(spark.read.format("graft.sources.DocsSink").option("path", dir).load()
      .count() == 1000L)
  }

  test("DocsSink DSv2 write: failed job aborts cleanly — no manifest, no partial files") {
    import graft.sources.DocsSink
    val dir = Files.createTempDirectory("docs_sink_abort").toString
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", 100).option("partitions", 4).load()
      // poison: fails inside the write stage AFTER some rows flowed
      .withColumn("n_chars", expr("case when doc_id = 77 then raise_error('poison') " +
        "else n_chars end"))
    intercept[Exception] {
      df.write.format("graft.sources.DocsSink").option("path", dir)
        .mode("append").save()
    }
    // abort left the target untouched: no manifest, no staged files,
    // no published part files — and the read path sees an empty table
    assert(DocsSink.manifestEntries(dir).isEmpty)
    val p = java.nio.file.Paths.get(dir)
    if (Files.exists(p)) {
      val s = Files.list(p)
      val names = try {
        val it = s.iterator()
        Iterator.continually(it).takeWhile(_.hasNext)
          .map(_.next().getFileName.toString).toSet
      } finally s.close()
      assert(!names.contains(DocsSink.ManifestName), names.toString)
      assert(!names.contains(DocsSink.StagingName), names.toString)
      assert(!names.exists(_.endsWith(".tsv")), names.toString)
    }
    assert(spark.read.format("graft.sources.DocsSink").option("path", dir).load()
      .count() == 0L)
  }

  test("DocsSink BATCH crash windows: pre-manifest crash reads EMPTY, post-manifest is COMPLETE, a retry never collides with orphans") {
    // The batch twin of StreamingSourceSpec's epoch-ledger crash test.
    // The batch commit's declared windows (DocsWrite.publish scaladoc):
    // staged files move into the target FIRST, the `_manifest` is
    // atomically published SECOND — so the manifest is the commit
    // point. A crash in the window between them must leave readers on
    // the pre-job state (empty here), never a partial table; a crash
    // after the manifest move is a complete, committed table.
    import graft.sources.DocsSink
    val dir = Files.createTempDirectory("docs_sink_crash").toString
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", 1000).option("partitions", 7).load()
    val nParts = df.rdd.getNumPartitions
    def write(): Unit =
      df.write.format("graft.sources.DocsSink").option("path", dir)
        .mode("append").save()
    def tsvNames: Set[String] = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try {
        val it = s.iterator()
        Iterator.continually(it).takeWhile(_.hasNext)
          .map(_.next().getFileName.toString).filter(_.endsWith(".tsv")).toSet
      } finally s.close()
    }
    def readCount: Long =
      spark.read.format("graft.sources.DocsSink").option("path", dir).load().count()

    // Window A — crash BETWEEN the staged-file moves and the manifest
    // publish. Simulate the exact on-disk state the interruption
    // leaves: run a full write, then un-publish the manifest back to
    // its pre-move `.tmp` name (part files moved, `_manifest.tmp`
    // written, `_manifest` absent).
    write()
    assert(readCount == 1000L)
    val firstAttempt = tsvNames
    val mf = java.nio.file.Paths.get(dir, DocsSink.ManifestName)
    Files.move(mf, java.nio.file.Paths.get(dir, DocsSink.ManifestName + ".tmp"))
    assert(DocsSink.manifestEntries(dir).isEmpty)
    assert(tsvNames == firstAttempt, "crash simulation must keep the moved part files")
    assert(readCount == 0L,
      "pre-manifest crash must read as the pre-job state, not a partial table")

    // Retry after the crash: a fresh job against the same target. Its
    // commit publishes ONLY its own files — the crashed attempt's
    // orphans stay on disk but stay invisible — and the attempt token
    // in every filename is what guarantees the retry's ATOMIC_MOVEs
    // cannot collide with those orphans even when a restarted
    // application re-derives the same (partitionId, taskId) pairs.
    write()
    assert(readCount == 1000L, "retry must restore exactly the job's rows")
    val entries = DocsSink.manifestEntries(dir)
    assert(entries.length == nParts && entries.map(_._2).sum == 1000L)
    val retryNames = entries.map(_._1).toSet
    assert(retryNames.intersect(firstAttempt).isEmpty,
      "retry filenames must be disjoint from the crashed attempt's orphans")
    assert(tsvNames == firstAttempt ++ retryNames, "orphans remain on disk, unlisted")
    def attemptTokens(names: Set[String]): Set[String] =
      names.map(n => n.stripSuffix(".tsv").split("-").last)
    assert(attemptTokens(firstAttempt).size == 1 &&
      attemptTokens(retryNames).size == 1 &&
      attemptTokens(firstAttempt) != attemptTokens(retryNames),
      "each commit attempt carries its own filename token")

    // Window B — crash AFTER the manifest move but BEFORE the staging
    // cleanup: a stray staged leftover must not perturb readers (the
    // table is already committed and complete), and the next write
    // sweeps it.
    val staging = java.nio.file.Paths.get(dir, DocsSink.StagingName)
    Files.createDirectories(staging)
    Files.write(staging.resolve("part-00000-t0-deadbeef.tsv"), "9\tzz\t1\tzz\n".getBytes)
    assert(readCount == 1000L, "post-manifest crash is a complete committed table")
    write()
    assert(readCount == 2000L)
    assert(!Files.exists(staging) || {
      val s = Files.list(staging)
      try !s.iterator().hasNext finally s.close()
    })
  }
}
