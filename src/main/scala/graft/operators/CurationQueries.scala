package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.sources.Tables

/** Oracle-checked queries for the corpus-curation operators
  * (Curation.scala, Graph.scala). The synthetic documents table has no
  * PII / unicode / line structure, so each query first builds a
  * deterministic "dirty" text from doc_id — the SAME construction
  * appears in the DuckDB oracle, so the transforms are verified on
  * inputs that actually exercise them.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private val enStops = TextAnalysis.langProfiles("en")

  /** doc text + synthetic email/phone/SSN/IP derived from doc_id. */
  private def piiText = concat(
    col("text"),
    lit(" contact user"), col("doc_id").cast("string"), lit("@cs.example.edu or "),
    lit("650-555-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
    lit(" ssn 123-45-6789 host 171.64."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".1"))

  /** doc text + bullet lines, an ellipsis line, and (every 7th doc) a
    * run of '#' symbols.
    */
  private def linedText = concat(
    col("text"), lit("\n- bullet one\n- bullet two\nlast line..."),
    when(pmod(col("doc_id"), lit(7)) === 0, lit(" ### ## #")).otherwise(lit("")))

  /** doc text + decomposed accents (e+U+0301, i+U+0308) + a C0 control. */
  private def accentedText =
    concat(col("text"), lit(" café naïveend"))

  /** Mojibake corruption constants shared by q_mojibake_fix and its
    * oracle: 'a' -> cp1252-mojibake \u00e1, plus a suffix exercising
    * the 3-char punctuation entries (left quote, ellipsis, apostrophe,
    * en-dash, degree, em-dash).
    */
  private[operators] val MojiA = "\u00c3\u00a1"
  private[operators] val MojiSuffix = " \u00e2\u20ac\u0153moji\u00e2\u20ac\u00a6 test\u00e2\u20ac\u2122s \u00e2\u20ac\u201c 25\u00c2\u00b0\u00e2\u20ac\u201d end"

  val queries: Map[String, Q] = Map(
    // Cross-source overlap matrix on md5 content fingerprints; a
    // planted "mirror" source (every 9th doc's text) makes known
    // overlaps with each real source.
    "q_source_overlap" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val withMirror = d.select(col("source"), col("text"))
        .unionByName(d.filter(col("doc_id") % 9 === 0)
          .select(lit("mirror").as("source"), col("text")))
      DataOps.sourceOverlap(withMirror, "source", md5(col("text")))
    },

    // Per-source quantile normalization of a quality proxy (n_chars):
    // percent_rank with doc_id tiebreak — engine-exact.
    "q_quantile_norm" -> { (s, dir) =>
      DataOps.quantileNorm(Tables(s, dir).documents, "source", "doc_id", "n_chars")
    },

    // PII scrub: typed placeholders + per-class counts, one codegen pass.
    "q_pii_redact" -> { (s, dir) =>
      val counts = Curation.piiCounts(piiText)
      Tables(s, dir).documents.select(
        col("doc_id"),
        Curation.redactPii(piiText).as("redacted"),
        counts("emails").cast("long").as("emails"),
        counts("ssns").cast("long").as("ssns"),
        counts("phones").cast("long").as("phones"),
        counts("ips").cast("long").as("ips"))
    },

    // Gopher/C4 structural quality rules over line-structured text.
    "q_gopher_filter" -> { (s, dir) =>
      // project the stats struct ONCE, then read fields from the
      // attribute: the inline form duplicated the whole gopherStats
      // subtree (two splits + three regexp passes) into each of the 10
      // field reads. Same values, one evaluation per row.
      Tables(s, dir).documents
        .select(col("doc_id"), Curation.gopherStats(linedText).as("__st"),
          TextAnalysis.stopwordHits(linedText, enStops).as("__sh"))
        .select(
          col("doc_id"),
          col("__st")("n_words").as("n_words"),
          col("__st")("mean_word_len").as("mean_word_len"),
          col("__st")("symbol_ratio").as("symbol_ratio"),
          col("__st")("bullet_frac").as("bullet_frac"),
          col("__st")("ellipsis_frac").as("ellipsis_frac"),
          Curation.gopherKeep(col("__st"), col("__sh")).as("keep"))
    },

    // NFC normalize + control strip via the native NfcNormalize expr.
    "q_unicode_clean" -> { (s, dir) =>
      val clean = Curation.cleanUnicode(accentedText)
      Tables(s, dir).documents.select(
        col("doc_id"),
        clean.as("clean"),
        length(clean).cast("long").as("n_clean_chars"),
        (length(accentedText) - length(clean)).cast("long").as("n_removed"))
    },

    // Main-text extraction from HTML: each doc wrapped in a realistic
    // page (title, style/script payloads, comment, nav, entities) and
    // de-boilerplated back to prose in one codegen pass.
    "q_html_extract" -> { (s, dir) =>
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style><script>var x=1 && y<2;</script>" +
          "</head><body><!-- nav --><div class=\"nav\">Home | About</div><p>"),
        col("text"),
        lit("</p><br><footer>&copy; 2026 Example &amp; Co &#39;q&#39;</footer></body></html>"))
      val clean = Curation.extractHtmlText(html)
      Tables(s, dir).documents.select(
        col("doc_id"), clean.as("clean_text"), length(clean).cast("long").as("n_chars"))
    },

    // Mojibake repair (ftfy's cp1252 double-encoding fix): corruption
    // injected deterministically (a -> mojibake-á plus a suffix
    // exercising the multi-byte punctuation entries), then repaired;
    // n_fixed counts by portable length arithmetic.
    "q_mojibake_fix" -> { (s, dir) =>
      val corrupted = concat(
        replace(col("text"), lit("a"), lit(CurationQueries.MojiA)),
        lit(CurationQueries.MojiSuffix))
      Tables(s, dir).documents.select(
        col("doc_id"),
        Curation.countMojibake(corrupted).as("n_fixed"),
        Curation.fixMojibake(corrupted).as("clean_text"))
    },

    // Sliding-window chunking: 32-token windows every 24 tokens.
    "q_chunk_sliding" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), explode(Curation.slidingChunks(split(col("text"), " "), 32, 24)).as("u"))
        .select(col("doc_id"), col("u.chunk_id"), col("u.chunk_text"), col("u.chunk_tokens"))
    },

    // #42h2 FIM prefix/middle/suffix split (Bavarian et al. 2022):
    // hash-derived split points, every span non-empty.
    "q_fim_split" -> { (s, dir) =>
      Curation.fimSplit(Tables(s, dir).documents, "doc_id", "text")
    },

    // #42x2 DPO preference-pair mining: best-vs-worst n_chars within
    // each (lang, md5-bucket) cell.
    "q_pref_pairs" -> { (s, dir) =>
      Curation.preferencePairs(Tables(s, dir).documents, "lang", "doc_id",
        col("n_chars"), buckets = 16)
    },

    // Contiguous sequence packing into 2048-token bins per (lang, shard).
    "q_seq_pack" -> { (s, dir) =>
      Curation.packSequences(
        Tables(s, dir).documents,
        idCol = "doc_id", stratumCol = "lang",
        tokensCol = size(split(col("text"), " ")).cast("long"),
        budget = 2048L, nShards = 8
      ).select(col("doc_id"), col("lang"), col("shard").cast("long").as("shard"),
        col("n_tokens"), col("bin").cast("long").as("bin"), col("pos"))
    },

    // Packed bins materialized into one training sequence per bin
    // (same shuffle as the packing windows — two exchanges total).
    "q_pack_materialize" -> { (s, dir) =>
      val packed = Curation.packSequences(
        Tables(s, dir).documents.select(col("doc_id"), col("lang"), col("text")),
        idCol = "doc_id", stratumCol = "lang",
        tokensCol = size(split(col("text"), " ")).cast("long"),
        budget = 2048L, nShards = 8)
      Curation.materializeBins(packed, "doc_id", "lang", "text", eod = "<eod>")
        .select(col("lang"), col("shard").cast("long").as("shard"),
          col("bin").cast("long").as("bin"), col("sequence"),
          col("n_docs"), col("total_tokens"))
    },

    // Engine-portable deterministic sample (md5-hex threshold, ~25%).
    "q_sample_hash" -> { (s, dir) =>
      Tables(s, dir).documents
        .filter(Curation.hashSample(col("doc_id"), "40000000"))
        .select(col("doc_id"), col("source"))
    },

    // SQL-reproducible polynomial fingerprint (vs xxhash64 rows-only).
    "q_fingerprint_poly" -> { (s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        Curation.polyFingerprint(col("text")).as("poly_fp"))
    },

    // Compression-ratio quality signal (rows-only: no DuckDB deflate;
    // monotonicity covered by spec).
    "q_compress_ratio" -> { (s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        round(graft.plans.CompressionRatio(col("text")), 4).as("deflate_ratio"))
    },

    // Exactly-k-per-stratum deterministic sample (md5-ordered
    // reservoir through TopKPerKey).
    "q_sample_exactk" -> { (s, dir) =>
      Sampling.exactKPerStratum(
        Tables(s, dir).documents.select("doc_id", "lang"), "lang", "doc_id", k = 10)
    },

    // #42d4 class-balanced downsampling: every lang keeps exactly the
    // minority lang's count (md5-order reservoir, deterministic).
    "q_class_balance" -> { (s, dir) =>
      Sampling.classBalance(
        Tables(s, dir).documents.select("doc_id", "lang"), "lang", "doc_id")
    },

    // Neyman-allocation sampling (alloc_h ∝ N_h·σ_h): the budget goes
    // where strata are big AND internally variable — the
    // minimum-variance stratified design. σ from exact integer sums,
    // so the plan is deterministic across engines.
    "q_neyman_plan" -> { (s, dir) =>
      Sampling.neymanPlan(Tables(s, dir).documents, "source", col("n_chars"), budget = 500L)
        .orderBy("stratum")
    },
    "q_neyman_sample" -> { (s, dir) =>
      Sampling.neymanSample(Tables(s, dir).documents.select("doc_id", "source", "n_chars"),
          "source", "doc_id", col("n_chars"), budget = 500L, seed = 42L)
        .select("doc_id", "source")
    },

    // Corpus stats: top-5 bigrams per language by document frequency,
    // through the custom TopKPerKey physical operator (bounded heaps,
    // no full sort of the gram counts).
    "q_top_ngrams" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val counts = d
        .select(col("lang"), explode(TextAnalysis.wordNgrams(col("text"), 2)).as("gram"))
        .groupBy("lang", "gram").agg(count(lit(1)).as("df"))
      TopK.perKey(counts, Seq("lang"), struct(-col("df"), col("gram")), 5)
    },

    // Duplicated-substring stats: fraction of 8-token windows shared
    // with other docs (the small vocab makes natural collisions, which
    // the oracle reproduces exactly).
    "q_substring_dup" -> { (s, dir) =>
      TextDedup.duplicateWindowStats(Tables(s, dir).documents, "doc_id", "text", window = 8)
    },

    // Duplicated-substring REMOVAL (Lee et al. 2022): tokens covered
    // by any cross-doc-duplicated 8-token window are cut and the
    // survivors rejoined — the full dedup, not just the stats.
    // Reconstruction shuffles only AFFECTED documents' tokens.
    "q_substring_remove" -> { (s, dir) =>
      TextDedup.removeDuplicateWindows(Tables(s, dir).documents, "doc_id", "text", window = 8)
    },

    // BM25 lexical retrieval: top-20 docs for a 3-term query; rounded
    // scores rank deterministically across engines.
    "q_bm25" -> { (s, dir) =>
      TextRank.bm25TopK(Tables(s, dir).documents, "doc_id", "text",
        query = Seq("spark", "window", "merge"), k = 20)
        .select(col("id").as("doc_id"), col("score"), col("rank"))
    },

    // C4 boilerplate removal: corpus-global line dedup. Every doc gets
    // a shared header line, a per-residue group line, and unique lines;
    // only the first occurrence (min doc_id, pos) of each line survives.
    "q_line_dedup" -> { (s, dir) =>
      val id = col("doc_id")
      val lined = Tables(s, dir).documents.select(
        id,
        concat_ws("\n",
          lit("hdr-common"),
          concat(lit("u-"), id.cast("string")),
          concat(lit("grp-"), pmod(id, lit(5)).cast("string")),
          substring(col("text"), 1, 20)).as("text"))
      TextDedup.dedupLinesAcrossCorpus(lined, "doc_id", "text")
    },

    // Flagship: the whole curation pipeline in ONE plan — quality gate
    // (map) → exact dedup (1 shuffle: min-struct agg on the prefix
    // hash; an aggregation, not a window, so giant duplicate groups
    // partial-combine map-side instead of sorting in one task) → hash
    // sample (map) → sequence packing (1 shuffle: lang/shard windows).
    // Two exchanges total for the end-to-end pass, guarded by
    // PlanAuditSpec.
    "q_curation_pipeline" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val stats = d.select(
        col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        TextAnalysis.stopwordHits(col("text"), enStops).as("stop_hits"))
      val kept = stats.filter(col("n_tokens") >= 20 && col("stop_hits") >= 1)
      val deduped = kept
        .groupBy(sha2(lower(substring(col("text"), 1, 30)), 256).as("__h"))
        .agg(min(struct(col("doc_id"), col("lang"), col("n_tokens"))).as("__k"))
        .select(col("__k.doc_id").as("doc_id"), col("__k.lang").as("lang"),
          col("__k.n_tokens").as("n_tokens"))
      val sampled = deduped.filter(Curation.hashSample(col("doc_id"), "c0000000"))
      Curation.packSequences(sampled, "doc_id", "lang", col("n_tokens"), budget = 2048L, nShards = 4)
        .select(col("doc_id"), col("lang"), col("shard").cast("long").as("shard"),
          col("n_tokens"), col("bin").cast("long").as("bin"), col("pos"))
    },

    // C4 bad-words blocklist: per-doc hit count + keep flag, one
    // codegen regexp pass (single alternation DFA). Planted words
    // exercise case-insensitivity and the word boundary (every doc
    // contains "classy", which must NOT hit blocked "class").
    "q_blocklist" -> { (s, dir) =>
      val t = blockText
      Tables(s, dir).documents.select(
        col("doc_id"),
        Curation.blocklistHits(t, blockWords).as("hits"),
        Curation.blocklistKeep(t, blockWords).as("keep"))
    },

    // Connected components over planted dup edges: chains i—(i+1) and
    // skip-links i—(i+2) inside each block of 5 ids, so components are
    // exactly the blocks and the oracle is closed-form.
    "q_components" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Graph.connectedComponentsAll(plantedEdges(d), "src", "dst", d, "doc_id")
    },

    // Dedup report: duplicate-cluster size distribution — the number
    // a curation run publishes (how much of the corpus is how
    // duplicated) from the same transitive closure as q_components.
    "q_cluster_sizes" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Graph.connectedComponentsAll(plantedEdges(d), "src", "dst", d, "doc_id")
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
    },

    // #42u2 Flesch reading-ease per document — the readability band
    // quality signal alongside the Gopher structural rules.
    "q_readability" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), Curation.fleschStats(col("text")).as("f"))
        .select(col("doc_id"), col("f.n_words").as("n_words"),
          col("f.n_sents").as("n_sents"), col("f.n_syllables").as("n_syllables"),
          col("f.flesch").as("flesch"))
    },

    // #42h3 T5 span corruption: 3-token blocks masked at a hash-
    // derived 1-in-5 rate, numbered sentinels, deterministic on any
    // engine.
    "q_span_corrupt" -> { (s, dir) =>
      Curation.spanCorrupt(Tables(s, dir).documents, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },

    // #42d3 PPS (probability-proportional-to-size) Poisson sample of
    // orders weighted by order value: E[n]=200, certainty rows always
    // kept, inclusion probability reported in exact ppm.
    "q_pps_sample" -> { (s, dir) =>
      val t = Tables(s, dir).orders.select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("w_cents"))
      Sampling.ppsSample(t, "o_orderkey", col("w_cents"), k = 200L, seed = 7L)
        .select("o_orderkey", "w_cents", "pi_ppm")
    },

    // Priority sampling (Duffield et al. 2007): exact-k weighted
    // sample whose max(w, tau) estimates make subset sums unbiased —
    // the fixed-size companion of q_pps_sample's Poisson design.
    "q_priority_sample" -> { (s, dir) =>
      val t = Tables(s, dir).orders.select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("w_cents"))
      Sampling.prioritySample(t, "o_orderkey", col("w_cents"), k = 64, seed = 7L)
        .withColumnRenamed("id", "o_orderkey")
    }
  )

  /** Blocklist shared by q_blocklist and its oracle. "class" proves
    * the word boundary (docs all contain "classy" via the suffix).
    */
  private val blockWords = Seq("spamword", "badphrase", "class")

  /** Shared Neyman plan chain (σ from exact integer sums → 6-dp share
    * → whole-row alloc), used by both q_neyman oracles so plan and
    * sample provably derive from the same allocation.
    */
  private val neymanPlanCteDuck =
    """st AS (SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_rows,
      |         sum(CAST(n_chars AS DOUBLE)) AS s1,
      |         sum(CAST(n_chars * n_chars AS DOUBLE)) AS s2
      |       FROM documents GROUP BY 1),
      |sg AS (SELECT stratum, n_rows,
      |         round(CASE WHEN n_rows > 1
      |           THEN sqrt(greatest((s2 - s1 * s1 / n_rows) / (n_rows - 1), 0.0))
      |           ELSE 0.0 END, 6) AS sigma
      |       FROM st),
      |pl AS (SELECT stratum, n_rows, sigma,
      |         CAST(round(CASE WHEN sum(n_rows * sigma) OVER () = 0 THEN 0.0
      |           ELSE round(n_rows * sigma / sum(n_rows * sigma) OVER (), 6) END * 500, 0) AS BIGINT) AS alloc
      |       FROM sg)""".stripMargin

  /** doc text + " classy" always, plus planted blocklist hits: every
    * 3rd doc a lowercase hit, every 7th a mixed-case phrase hit.
    */
  private def blockText = concat(
    col("text"), lit(" classy"),
    when(pmod(col("doc_id"), lit(3)) === 0, lit(" spamword")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0, lit(" BadPhrase end")).otherwise(lit("")))

  /** The planted dup-pair edge set used by q_components and
    * q_canonical_pick: components are exactly the blocks of 5 ids.
    */
  private[operators] def plantedEdges(d: DataFrame): DataFrame = {
    val ids = d.select(col("doc_id"))
    def linked(step: Int, modMax: Int) = ids.as("a")
      .join(ids.as("b"), col("b.doc_id") === col("a.doc_id") + step)
      .filter(pmod(col("a.doc_id"), lit(5)) <= modMax)
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    linked(1, 3).unionByName(linked(2, 2))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ssnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  private val phoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  private val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private val piiCte =
    """d AS (SELECT doc_id,
      |  text || ' contact user' || doc_id || '@cs.example.edu or 650-555-' ||
      |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ssn 123-45-6789 host 171.64.' ||
      |  CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
      |FROM documents)""".stripMargin

  private val linedCte =
    """d AS (SELECT doc_id,
      |  text || chr(10) || '- bullet one' || chr(10) || '- bullet two' || chr(10) || 'last line...' ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' ### ## #' ELSE '' END AS t
      |FROM documents)""".stripMargin

  private val accentCte =
    """d AS (SELECT doc_id,
      |  text || ' cafe' || chr(769) || ' nai' || chr(776) || 've' || chr(1) || 'end' AS t
      |FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_source_overlap" ->
      """WITH pool AS (SELECT source, text FROM documents
        |              UNION ALL
        |              SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 9 = 0),
        |fps AS (SELECT DISTINCT source, md5(text) AS fp FROM pool),
        |sz AS (SELECT source, count(*) AS n FROM fps GROUP BY source),
        |pr AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS overlap
        |       FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
        |       GROUP BY a.source, b.source)
        |SELECT source_a, source_b, CAST(overlap AS BIGINT) AS overlap,
        |       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |       round(CAST(overlap AS DOUBLE) / (na.n + nb.n - overlap), 6) AS jaccard
        |FROM pr JOIN sz na ON na.source = pr.source_a JOIN sz nb ON nb.source = pr.source_b""".stripMargin,
    "q_quantile_norm" ->
      """SELECT source AS grp, doc_id AS id, CAST(n_chars AS DOUBLE) AS v,
        |       round(percent_rank() OVER (
        |         PARTITION BY source ORDER BY CAST(n_chars AS DOUBLE), doc_id), 6) AS q
        |FROM documents""".stripMargin,
    "q_pii_redact" ->
      s"""WITH $piiCte,
         |s1 AS (SELECT doc_id, CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS emails,
         |         regexp_replace(t, '$emailRe', '<EMAIL>', 'g') AS t1 FROM d),
         |s2 AS (SELECT doc_id, emails, CAST(len(regexp_extract_all(t1, '$ssnRe')) AS BIGINT) AS ssns,
         |         regexp_replace(t1, '$ssnRe', '<SSN>', 'g') AS t2 FROM s1),
         |s3 AS (SELECT doc_id, emails, ssns, CAST(len(regexp_extract_all(t2, '$phoneRe')) AS BIGINT) AS phones,
         |         regexp_replace(t2, '$phoneRe', '<PHONE>', 'g') AS t3 FROM s2),
         |s4 AS (SELECT doc_id, emails, ssns, phones, CAST(len(regexp_extract_all(t3, '$ipRe')) AS BIGINT) AS ips,
         |         regexp_replace(t3, '$ipRe', '<IP>', 'g') AS redacted FROM s3)
         |SELECT doc_id, redacted, emails, ssns, phones, ips FROM s4""".stripMargin,
    "q_gopher_filter" ->
      s"""WITH $linedCte,
         |w AS (SELECT doc_id, t, string_split(t, ' ') AS ws, string_split(t, chr(10)) AS ls FROM d),
         |m AS (SELECT doc_id, t, CAST(len(ws) AS BIGINT) AS n_words,
         |        CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / greatest(len(ws), 1) AS mean_raw,
         |        (length(t) - length(replace(t, '#', '')) + len(regexp_extract_all(t, '\\.\\.\\.'))) * 1.0
         |          / greatest(len(ws), 1) AS sym_raw,
         |        CAST(len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %')) AS DOUBLE) / len(ls) AS bullet_raw,
         |        CAST(len(list_filter(ls, l -> l LIKE '%...')) AS DOUBLE) / len(ls) AS ell_raw,
         |        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
         |            w -> w IN ('the','a','of','and','to','in','is','for','on','with'))) AS stop_hits
         |      FROM w)
         |SELECT doc_id, n_words, round(mean_raw, 4) AS mean_word_len, round(sym_raw, 4) AS symbol_ratio,
         |       round(bullet_raw, 4) AS bullet_frac, round(ell_raw, 4) AS ellipsis_frac,
         |       (n_words BETWEEN 50 AND 100000) AND (round(mean_raw, 4) BETWEEN 3 AND 10)
         |         AND round(sym_raw, 4) < 0.1 AND round(bullet_raw, 4) < 0.9
         |         AND round(ell_raw, 4) < 0.3 AND stop_hits >= 2 AS keep
         |FROM m""".stripMargin,
    "q_unicode_clean" ->
      s"""WITH $accentCte,
         |c AS (SELECT doc_id, length(t) AS n_dirty,
         |        nfc_normalize(regexp_replace(t, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS clean
         |      FROM d)
         |SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_clean_chars,
         |       CAST(n_dirty - length(clean) AS BIGINT) AS n_removed
         |FROM c""".stripMargin,
    // Same page construction || same strip/decode chain; entity table
    // and mojibake table are shared Scala constants, so the SQL is
    // generated from the exact strings the Column chain uses.
    "q_html_extract" ->
      s"""WITH h AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || doc_id ||
         |  '</title><style>p{color:red}</style><script>var x=1 && y<2;</script>' ||
         |  '</head><body><!-- nav --><div class="nav">Home | About</div><p>' ||
         |  text ||
         |  '</p><br><footer>&copy; 2026 Example &amp; Co &#39;q&#39;</footer></body></html>' AS html
         |  FROM documents),
         |s AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<!--.*?-->', ' ', 'g'),
         |    '<[^>]+>', ' ', 'g') AS t FROM h),
         |c AS (SELECT doc_id,
         |  trim(regexp_replace(${Curation.replaceChainSqlDuck("t", Curation.HtmlEntities)},
         |       '\\s+', ' ', 'g')) AS clean_text FROM s)
         |SELECT doc_id, clean_text, CAST(length(clean_text) AS BIGINT) AS n_chars
         |FROM c""".stripMargin,
    "q_mojibake_fix" ->
      s"""WITH c AS (SELECT doc_id,
         |  replace(text, 'a', ${"'" + MojiA + "'"}) || ${"'" + MojiSuffix + "'"} AS t
         |  FROM documents)
         |SELECT doc_id,
         |  ${Curation.mojibakeCountSqlDuck("t")} AS n_fixed,
         |  ${Curation.replaceChainSqlDuck("t", Curation.MojibakeTable)} AS clean_text
         |FROM c""".stripMargin,
    "q_fim_split" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |t AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
        |        ('0x' || substr(md5(doc_id::VARCHAR || '-a'), 1, 6))::BIGINT AS h1,
        |        ('0x' || substr(md5(doc_id::VARCHAR || '-b'), 1, 6))::BIGINT AS h2
        |      FROM w WHERE len(ws) >= 3),
        |sp AS (SELECT doc_id, ws, n, h2, 1 + h1 % (n - 2) AS a FROM t),
        |sp2 AS (SELECT doc_id, ws, n, a, a + 1 + h2 % (n - a - 1) AS b FROM sp)
        |SELECT doc_id, n AS n_words, a AS n_prefix, b - a AS n_middle, n - b AS n_suffix,
        |  md5(array_to_string(list_slice(ws, a + 1, b), ' ')) AS middle_fp
        |FROM sp2""".stripMargin,
    "q_pref_pairs" ->
      """WITH t AS (SELECT lang AS stratum,
        |             ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 16 AS bucket,
        |             CAST(n_chars AS BIGINT) AS score, doc_id AS id FROM documents),
        |hi AS (SELECT stratum, bucket, score AS hs, id AS hid FROM (
        |         SELECT *, row_number() OVER (PARTITION BY stratum, bucket
        |                     ORDER BY score DESC, id DESC) AS rn FROM t) x WHERE rn = 1),
        |lo AS (SELECT stratum, bucket, score AS ls, id AS lid FROM (
        |         SELECT *, row_number() OVER (PARTITION BY stratum, bucket
        |                     ORDER BY score, id) AS rn FROM t) x WHERE rn = 1)
        |SELECT hi.stratum, hi.bucket, hid AS chosen_id, lid AS rejected_id,
        |       hs - ls AS margin
        |FROM hi JOIN lo USING (stratum, bucket)
        |WHERE hid <> lid""".stripMargin,
    "q_chunk_sliding" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws), 1) + 1, 24),
        |        s -> {'chunk_id': CAST((s - 1) // 24 AS BIGINT),
        |              'chunk_text': array_to_string(list_slice(ws, s, s + 31), ' '),
        |              'chunk_tokens': CAST(least(len(ws), s + 31) - s + 1 AS BIGINT)})) AS u
        |      FROM w)
        |SELECT doc_id, u.chunk_id AS chunk_id, u.chunk_text AS chunk_text, u.chunk_tokens AS chunk_tokens
        |FROM c""".stripMargin,
    "q_seq_pack" ->
      """WITH t AS (SELECT doc_id, lang, doc_id % 8 AS shard,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |p AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM t)
        |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens,
        |       CAST(prev // 2048 AS BIGINT) AS bin,
        |       CAST(row_number() OVER (PARTITION BY lang, shard, prev // 2048 ORDER BY doc_id) AS BIGINT) AS pos
        |FROM p""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'""".stripMargin,
    "q_pack_materialize" ->
      """WITH t AS (SELECT doc_id, lang, text, doc_id % 8 AS shard,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |p AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM t)
        |SELECT lang, CAST(shard AS BIGINT) AS shard, CAST(prev // 2048 AS BIGINT) AS bin,
        |       string_agg(text, '<eod>' ORDER BY doc_id) AS sequence,
        |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM p GROUP BY lang, shard, prev // 2048""".stripMargin,
    "q_fingerprint_poly" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ws,
        |      w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                         list_transform(range(1, length(w) + 1), i -> CAST(ascii(w[i]) AS BIGINT))),
        |                       (a, b) -> (a * 131 + b) % 1000000007))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS poly_fp
        |FROM w""".stripMargin,
    "q_components" ->
      """SELECT doc_id AS id, CAST((doc_id // 5) * 5 AS BIGINT) AS component FROM documents""".stripMargin,
    "q_cluster_sizes" ->
      """WITH c AS (SELECT (doc_id // 5) * 5 AS comp FROM documents),
        |s AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size FROM c GROUP BY comp)
        |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM s GROUP BY cluster_size""".stripMargin,
    // Same pattern string as the query (Curation.blocklistPattern is
    // the single source of truth); RE2 executes it identically.
    "q_blocklist" ->
      s"""WITH d AS (SELECT doc_id,
         |  text || ' classy' || CASE WHEN doc_id % 3 = 0 THEN ' spamword' ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0 THEN ' BadPhrase end' ELSE '' END AS t
         |FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${Curation.blocklistPattern(blockWords)}')) AS BIGINT) AS hits,
         |  len(regexp_extract_all(t, '${Curation.blocklistPattern(blockWords)}')) = 0 AS keep
         |FROM d""".stripMargin,
    "q_sample_exactk" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 10""".stripMargin,
    "q_class_balance" ->
      """WITH k AS (SELECT min(c) AS k FROM (
        |             SELECT count(*) AS c FROM documents GROUP BY lang)),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |      FROM documents)
        |SELECT doc_id, lang FROM r, k WHERE rn <= k.k""".stripMargin,
    // Same exact-integer-sum σ, 6-dp share rounding, and whole-row
    // allocation rounding as Sampling.neymanPlan.
    "q_neyman_plan" ->
      s"""WITH $neymanPlanCteDuck
         |SELECT stratum, n_rows, sigma, alloc FROM pl ORDER BY stratum""".stripMargin,
    // The realized sample: md5 bucket vs the in-plan hex threshold
    // floor(rate·2^32); alloc >= n_rows keeps the stratum whole.
    "q_neyman_sample" ->
      s"""WITH $neymanPlanCteDuck
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN pl ON pl.stratum = d.source
         |WHERE pl.alloc >= pl.n_rows
         |   OR substr(md5(d.doc_id::VARCHAR || ':42'), 1, 8) <
         |      lpad(lower(to_hex(CAST(floor(least(CAST(pl.alloc AS DOUBLE) / pl.n_rows, 1.0) * 4294967296) AS BIGINT))), 8, '0')""".stripMargin,
    "q_top_ngrams" ->
      """WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
        |g AS (SELECT lang, unnest(list_distinct(list_transform(range(1, len(ws)),
        |        i -> ws[i] || ' ' || ws[i + 1]))) AS gram FROM w),
        |c AS (SELECT lang, gram, count(*) AS df FROM g GROUP BY lang, gram)
        |SELECT lang, gram, df FROM (
        |  SELECT lang, gram, df,
        |         row_number() OVER (PARTITION BY lang ORDER BY df DESC, gram) AS rn
        |  FROM c) t
        |WHERE rn <= 5""".stripMargin,
    "q_substring_dup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 7, 0) + 1),
        |        s -> array_to_string(list_slice(ws, s, s + 7), ' '))) AS gram
        |      FROM w WHERE len(ws) >= 8),
        |x AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS c FROM g GROUP BY gram) t WHERE c > 1),
        |n AS (SELECT doc_id, count(*) AS n_windows FROM g GROUP BY doc_id),
        |d AS (SELECT doc_id, count(*) AS dup_windows FROM g JOIN x USING (gram) GROUP BY doc_id)
        |SELECT n.doc_id, n.n_windows, COALESCE(d.dup_windows, 0) AS dup_windows,
        |       round(COALESCE(d.dup_windows, 0) * 1.0 / n.n_windows, 4) AS dup_frac
        |FROM n LEFT JOIN d USING (doc_id)""".stripMargin,
    // Same window equivalence as q_substring_dup (gram strings are
    // injective for space-split tokens); positions covered by a
    // duplicated window are cut, survivors string_agg'd in order, and
    // a doc whose every token was cut rebuilds to '' (not NULL).
    "q_substring_remove" ->
      """WITH e AS (SELECT doc_id, text, string_split(text, ' ') AS ws,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(n - 7, 0) + 1),
        |        s -> {'s': s, 'gram': array_to_string(list_slice(ws, s, s + 7), ' ')})) AS u
        |      FROM e WHERE n >= 8),
        |g2 AS (SELECT doc_id, u.s AS s, u.gram AS gram FROM g),
        |x AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS c
        |                        FROM g2 GROUP BY gram) t WHERE c > 1),
        |dp AS (SELECT DISTINCT g2.doc_id, g2.s + o.k AS pos
        |       FROM g2 JOIN x USING (gram), range(0, 8) o(k)),
        |aff AS (SELECT DISTINCT doc_id FROM dp),
        |tk AS (SELECT e.doc_id, unnest(range(1, e.n + 1)) AS pos FROM e JOIN aff USING (doc_id)),
        |kept AS (SELECT tk.doc_id, tk.pos FROM tk ANTI JOIN dp USING (doc_id, pos)),
        |rb AS (SELECT k.doc_id, string_agg(e.ws[k.pos], ' ' ORDER BY k.pos) AS rebuilt
        |       FROM kept k JOIN e USING (doc_id) GROUP BY k.doc_id),
        |rc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM dp GROUP BY doc_id)
        |SELECT e.doc_id, CAST(e.n AS BIGINT) AS n_tokens,
        |       COALESCE(rc.n_removed, 0) AS n_removed,
        |       CASE WHEN rc.n_removed > 0 THEN COALESCE(rb.rebuilt, '')
        |            ELSE e.text END AS clean_text
        |FROM e LEFT JOIN rc USING (doc_id) LEFT JOIN rb USING (doc_id)""".stripMargin,
    "q_bm25" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |st AS (SELECT count(*) AS n, avg(len(ws)) AS avglen FROM w),
        |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
        |      WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3),
        |d AS (SELECT term, count(*) AS df FROM f GROUP BY term),
        |s AS (SELECT f.doc_id,
        |        sum(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |            * (f.tf * 2.2) / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / st.avglen))) AS score
        |      FROM f JOIN d USING (term), st GROUP BY f.doc_id)
        |SELECT doc_id, round(score, 4) AS score, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT doc_id, round(score, 4) AS score,
        |         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
        |  FROM s) q
        |WHERE rn <= 20""".stripMargin,
    "q_line_dedup" ->
      """WITH d AS (SELECT doc_id,
        |             'hdr-common' || chr(10) || 'u-' || doc_id || chr(10) ||
        |             'grp-' || CAST(doc_id % 5 AS VARCHAR) || chr(10) || substring(text, 1, 20) AS t
        |           FROM documents),
        |lines AS (SELECT doc_id, u.pos, u.line FROM (
        |            SELECT doc_id, unnest(list_transform(string_split(t, chr(10)),
        |                     (l, i) -> {'pos': i - 1, 'line': l})) AS u FROM d) q),
        |kept AS (SELECT * FROM (
        |           SELECT doc_id, pos, line,
        |                  row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |           FROM lines) t WHERE rn = 1),
        |r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |      FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text
        |FROM d LEFT JOIN r USING (doc_id)""".stripMargin,
    "q_curation_pipeline" ->
      """WITH s AS (SELECT doc_id, lang, text,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |             len(list_filter(string_split(lower(text), ' '),
        |                 w -> w IN ('the','a','of','and','to','in','is','for','on','with'))) AS stop_hits
        |           FROM documents),
        |k AS (SELECT * FROM s WHERE n_tokens >= 20 AND stop_hits >= 1),
        |d AS (SELECT * FROM (
        |        SELECT *, row_number() OVER (PARTITION BY lower(substring(text, 1, 30)) ORDER BY doc_id) AS rn
        |        FROM k) t WHERE rn = 1),
        |sm AS (SELECT * FROM d WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000'),
        |p AS (SELECT doc_id, lang, doc_id % 4 AS shard, n_tokens,
        |        COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, doc_id % 4 ORDER BY doc_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |      FROM sm)
        |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens,
        |       CAST(prev // 2048 AS BIGINT) AS bin,
        |       CAST(row_number() OVER (PARTITION BY lang, shard, prev // 2048 ORDER BY doc_id) AS BIGINT) AS pos
        |FROM p""".stripMargin,
    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |    regexp_replace(text, '[.!?]+', '.', 'g') AS cs,
        |    regexp_replace(text, '[^ ]+', 'W', 'g') AS cw,
        |    regexp_replace(lower(text), '[aeiouy]+', 'V', 'g') AS cv
        |  FROM documents),
        |k AS (SELECT doc_id,
        |    greatest(CAST(length(cs) - length(replace(cs, '.', '')) AS BIGINT), 1) AS n_sents,
        |    CAST(length(cw) - length(replace(cw, 'W', '')) AS BIGINT) AS n_words,
        |    CAST(length(cv) - length(replace(cv, 'V', '')) AS BIGINT) AS n_syllables
        |  FROM c)
        |SELECT doc_id, n_words, n_sents, n_syllables,
        |  round(206.835 - 1.015 * n_words::DOUBLE / n_sents::DOUBLE -
        |        84.6 * n_syllables::DOUBLE / greatest(n_words, 1)::DOUBLE, 4) + 0.0 AS flesch
        |FROM k""".stripMargin,
    "q_span_corrupt" ->
      """WITH t AS (SELECT doc_id, u.pos, u.tok FROM (
        |    SELECT doc_id, unnest(list_transform(string_split(text, ' '),
        |             (w, i) -> {'pos': i - 1, 'tok': w})) AS u FROM documents) q),
        |b AS (SELECT doc_id, pos // 3 AS blk, list(tok ORDER BY pos) AS bt
        |      FROM t GROUP BY doc_id, blk),
        |f AS (SELECT *, substr(md5(doc_id || ':' || blk || ':17'), 1, 6) < '333333' AS masked
        |      FROM b),
        |k AS (SELECT *, sum(CASE WHEN masked THEN 1 ELSE 0 END) OVER
        |        (PARTITION BY doc_id ORDER BY blk
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kk
        |      FROM f),
        |o AS (SELECT doc_id, blk, masked, bt,
        |        CASE WHEN masked THEN ['<extra_id_' || (kk - 1) || '>'] ELSE bt END AS ot
        |      FROM k),
        |agg AS (SELECT doc_id,
        |          CAST(sum(len(bt)) AS BIGINT) AS n_tokens,
        |          CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |          CAST(sum(CASE WHEN masked THEN len(bt) ELSE 0 END) AS BIGINT) AS n_masked,
        |          array_to_string(flatten(list(ot ORDER BY blk)), ' ') AS corrupted
        |        FROM o GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_spans, n_masked,
        |       substring(corrupted, 1, 160) AS corrupted_head
        |FROM agg""".stripMargin,
    "q_priority_sample" ->
      """WITH t AS (SELECT o_orderkey AS id,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS w FROM orders),
        |s AS (SELECT id, w,
        |        CAST(w AS DOUBLE) * 4294967296.0 /
        |          CAST(('0x' || substr(md5(id::VARCHAR || ':7'), 1, 8))::BIGINT + 1 AS DOUBLE)
        |          AS pr
        |      FROM t),
        |hd AS (SELECT id, w, pr,
        |         CAST(row_number() OVER (ORDER BY pr DESC, id) AS BIGINT) AS rn
        |       FROM s QUALIFY rn <= 65),
        |tau AS (SELECT max(CASE WHEN rn = 65 THEN pr END) AS tau FROM hd)
        |SELECT hd.id AS o_orderkey, hd.w,
        |  round(greatest(CAST(hd.w AS DOUBLE), coalesce(tau.tau, 0.0)), 4) AS w_hat
        |FROM hd CROSS JOIN tau WHERE hd.rn <= 64""".stripMargin,

    "q_pps_sample" ->
      """WITH t AS (SELECT o_orderkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents FROM orders),
        |w AS (SELECT CAST(sum(w_cents) AS BIGINT) AS tw FROM t),
        |s AS (SELECT t.*, tw,
        |        substr(md5(o_orderkey || ':7'), 1, 6) AS u6,
        |        least((200 * w_cents * 16777216) // tw, 16777216) AS thr
        |      FROM t, w)
        |SELECT o_orderkey, w_cents,
        |  least((200 * w_cents * 1000000) // tw, 1000000) AS pi_ppm
        |FROM s WHERE '0' || u6 < lpad(lower(to_hex(thr)), 7, '0')""".stripMargin
  )
}
