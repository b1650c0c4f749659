package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.NfcNormalize

/** Corpus-curation operators an LLM training-data pipeline runs before
  * dedup/mixing: PII scrubbing, heuristic quality gates over line
  * structure, unicode cleanup, sliding-window chunking, fixed-budget
  * sequence packing, and deterministic hash sampling.
  *
  * Everything here is pure Column algebra (codegen'd, no UDFs) so the
  * rules fuse into one WholeStageCodegen pass over the corpus — at
  * 100 TB these run as a single scan, and all of it is
  * oracle-checkable SQL.
  */
object Curation {

  /** PII patterns: RE2-compatible (no backrefs/lookahead) so the same
    * pattern strings drive both Spark's Java regex and the DuckDB
    * oracle. Order matters when scrubbing: email before phone (an
    * email local-part can contain digit runs), SSN before phone
    * (3-2-4 vs 3-3-4 grouping), IP last (already digit-safe).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private val scrubOrder: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", SsnRe -> "<SSN>", PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")

  /** Replace each PII class with a typed placeholder token. */
  def redactPii(text: Column): Column =
    scrubOrder.foldLeft(text) { case (c, (re, tok)) => regexp_replace(c, re, tok) }

  /** Per-class match counts (for audit dashboards / filter thresholds).
    * Counted in scrub order on the progressively-redacted text so the
    * counts agree with what redactPii actually replaced.
    */
  def piiCounts(text: Column): Column = {
    val (_, counts) = scrubOrder.foldLeft((text, List.empty[Column])) {
      case ((c, acc), (re, tok)) =>
        (regexp_replace(c, re, tok), regexp_count(c, lit(re)) :: acc)
    }
    val Seq(e, s, p, i) = counts.reverse.toSeq
    struct(e.as("emails"), s.as("ssns"), p.as("phones"), i.as("ips"))
  }

  /** C4-style blocklist pattern (Raffel et al. 2020 §2.2: pages with
    * any "bad word" are dropped). The list compiles to ONE
    * case-insensitive alternation with word boundaries — "class" and
    * "grass" never hit a blocked "ass" — so matching is a single DFA
    * pass over the text, O(text) per row regardless of list size:
    * never a per-word loop, and never a join against an exploded
    * token table (which would cost a corpus-sized token explode).
    * RE2-compatible (no backrefs/lookaround), so the identical
    * pattern runs on Spark's Java regex and DuckDB/RE2 engines.
    * Words must be plain `[A-Za-z0-9]+` literals; anything else is
    * rejected rather than silently altering the pattern's meaning.
    */
  def blocklistPattern(words: Seq[String]): String = {
    require(words.nonEmpty && words.forall(_.matches("[A-Za-z0-9]+")),
      s"blocklist words must be non-empty alphanumeric literals: $words")
    "(?i)\\b(" + words.mkString("|") + ")\\b"
  }

  /** Count of blocklisted-word occurrences in `text`. */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit(blocklistPattern(words))).cast("long")

  /** C4 keep decision: true iff no blocklisted word occurs. */
  def blocklistKeep(text: Column, words: Seq[String]): Column =
    blocklistHits(text, words) === 0L

  /** Gopher-style structural quality rules (Rae et al. 2021 §A1.1,
    * plus C4's line heuristics): word-count bounds, mean word length,
    * symbol-to-word ratio, bullet-line and ellipsis-line fractions.
    * Returns a struct of the raw measurements; callers threshold.
    */
  def gopherStats(text: Column): Column = {
    val ws = split(text, " ")
    val nWords = size(ws).cast("long")
    val meanLen = aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") /
      greatest(nWords, lit(1L))
    val hashes = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ellipses = regexp_count(text, lit("\\.\\.\\.")).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    struct(
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round((hashes + ellipses).cast("double") / greatest(nWords, lit(1L)), 4).as("symbol_ratio"),
      round(bulletLines.cast("double") / nLines, 4).as("bullet_frac"),
      round(ellipsisLines.cast("double") / nLines, 4).as("ellipsis_frac"))
  }

  /** Flesch reading-ease readability stats (Flesch 1948) from three
    * engine-portable counts: sentences = runs of [.!?] (collapsed then
    * counted, min 1 — a fragment is one sentence), words = runs of
    * non-space, syllables ≈ vowel-group runs per word (the standard
    * dictionary-free proxy). score = 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words) — ratios of exact integers, so both
    * engines produce the identical double. The readability band is a
    * corpus-quality signal alongside gopherStats (an instruction-tuned
    * corpus wants prose, not telegraphic fragments or run-ons).
    */
  def fleschStats(text: Column): Column = {
    def runCount(collapsed: Column, marker: String): Column =
      (length(collapsed) - length(translate(collapsed, marker, ""))).cast("long")
    val nSents0 = runCount(regexp_replace(text, "[.!?]+", "."), ".")
    val nSents = greatest(nSents0, lit(1L))
    val nWords = runCount(regexp_replace(text, "[^ ]+", "W"), "W")
    val nSyll = runCount(regexp_replace(lower(text), "[aeiouy]+", "V"), "V")
    val score = lit(206.835) -
      lit(1.015) * nWords.cast("double") / nSents.cast("double") -
      lit(84.6) * nSyll.cast("double") / greatest(nWords, lit(1L)).cast("double")
    struct(
      nWords.as("n_words"),
      nSents.as("n_sents"),
      nSyll.as("n_syllables"),
      round(score, 4).as("flesch"))
  }

  /** Gopher keep/drop decision over the stats struct. */
  def gopherKeep(stats: Column, stopHits: Column): Column =
    stats("n_words").between(50, 100000) &&
      stats("mean_word_len").between(3.0, 10.0) &&
      stats("symbol_ratio") < 0.1 &&
      stats("bullet_frac") < 0.9 &&
      stats("ellipsis_frac") < 0.3 &&
      stopHits >= 2

  /** NFC-normalize and strip C0 control characters (keeping \t \n \r).
    * Control strip first: a stray control char between a base char and
    * its combining mark would otherwise block composition.
    */
  def cleanUnicode(text: Column): Column =
    NfcNormalize(regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))

  /** HTML entity decode table. `&amp;` is deliberately LAST in the
    * chain: decoding it first would turn the literal text "&amp;lt;"
    * into "&lt;" and then a second entry would double-decode it to
    * "<" — with &amp; last, "&amp;lt;" decodes exactly once to "&lt;",
    * matching single-pass entity semantics.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&copy;" -> "©", "&amp;" -> "&")

  /** Main-text extraction from HTML (the trafilatura/jusText step of a
    * web-corpus pipeline, as pure column algebra): drop script/style
    * payloads and comments whole, strip remaining tags to spaces,
    * decode common entities, collapse whitespace. All patterns are
    * RE2-compatible (inline (?is) flags + non-greedy, no lookaround)
    * so the same strings drive the DuckDB oracle; the whole chain is
    * one codegen pass — de-boilerplating 100 TB of HTML is one scan.
    */
  def extractHtmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** UTF-8-read-as-Latin-1 mojibake repair table (the ftfy fix for the
    * most common double-encoding corruption). Entries are mutually
    * non-overlapping — lead bytes Ã/â/Â are distinct and second chars
    * disambiguate — so chain order is irrelevant and match counts on
    * the ORIGINAL string equal the fixes applied. Excluded: sequences
    * whose mojibake form contains C1 control chars (e.g. the right
    * double quote's 0x9D), which survive no text pipeline anyway.
    */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "\u00c3\u00a1" -> "\u00e1", "\u00c3\u00a9" -> "\u00e9", // U+00E1 U+00E9
    "\u00c3\u00ad" -> "\u00ed", "\u00c3\u00b3" -> "\u00f3", // U+00ED U+00F3
    "\u00c3\u00ba" -> "\u00fa", "\u00c3\u00b1" -> "\u00f1", // U+00FA U+00F1
    "\u00c3\u00a4" -> "\u00e4", "\u00c3\u00b6" -> "\u00f6", // U+00E4 U+00F6
    "\u00c3\u00bc" -> "\u00fc", "\u00c3\u00a8" -> "\u00e8", // U+00FC U+00E8
    "\u00c3\u00a7" -> "\u00e7", "\u00e2\u20ac\u2122" -> "\u2019", // U+00E7 U+2019
    "\u00e2\u20ac\u02dc" -> "\u2018", "\u00e2\u20ac\u0153" -> "\u201c", // U+2018 U+201C
    "\u00e2\u20ac\u201c" -> "\u2013", "\u00e2\u20ac\u201d" -> "\u2014", // U+2013 U+2014
    "\u00e2\u20ac\u00a6" -> "\u2026", "\u00c2\u00b0" -> "\u00b0", // U+2026 U+00B0
    "\u00c2\u00b7" -> "\u00b7") // U+00B7

  /** Repaired text: every table entry replaced. One codegen pass. */
  def fixMojibake(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** Number of mojibake sequences present, by length arithmetic
    * ((len - len(without)) / len(pattern)) — counts on the original
    * string, which equals fixes applied because entries never overlap.
    * Pure integer math any engine reproduces.
    */
  def countMojibake(text: Column): Column =
    MojibakeTable.map { case (bad, _) =>
      ((length(text) - length(replace(text, lit(bad), lit("")))) / bad.length).cast("long")
    }.reduce(_ + _)

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB replace-chain over SQL expression `e` for a literal
    * (search, replacement) table — oracle twin of a foldLeft of
    * replace() Columns.
    */
  def replaceChainSqlDuck(e: String, table: Seq[(String, String)]): String =
    table.foldLeft(e) { case (acc, (a, b)) => s"replace($acc, ${sqlLit(a)}, ${sqlLit(b)})" }

  /** DuckDB twin of [[countMojibake]] over SQL expression `e`. */
  def mojibakeCountSqlDuck(e: String): String =
    "CAST(" + MojibakeTable.map { case (bad, _) =>
      s"(length($e) - length(replace($e, ${sqlLit(bad)}, ''))) // ${bad.length}"
    }.mkString(" + ") + " AS BIGINT)"

  /** Sliding-window chunks over a token array: windows of `size`
    * tokens every `stride`, the final window truncated. Returns an
    * array of (chunk_id, chunk_text, chunk_tokens) structs; explode to
    * rows. Per-row array algebra — no shuffle, chunking 100 TB is one
    * map pass.
    */
  def slidingChunks(tokens: Column, size: Int, stride: Int): Column = {
    val starts = sequence(lit(1), greatest(org.apache.spark.sql.functions.size(tokens), lit(1)), lit(stride))
    transform(starts, s =>
      struct(
        ((s - 1) / stride).cast("long").as("chunk_id"),
        array_join(slice(tokens, s, lit(size)), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(slice(tokens, s, lit(size))).cast("long").as("chunk_tokens")))
  }

  /** Greedy contiguous sequence packing: within each (stratum, shard),
    * documents ordered by id fill fixed token-budget bins; a document
    * goes to the bin its running prefix sum lands in. This is the
    * distributed-standard packing (contiguous fill, not bin-packing —
    * first-fit-decreasing needs sequential state and does not scale;
    * contiguous fill is what sequence-packing jobs actually run).
    * The shard key bounds every window partition to |stratum|/nShards
    * rows, so no single sort partition absorbs a whole stratum at
    * 100 TB.
    */
  def packSequences(df: DataFrame, idCol: String, stratumCol: String,
                    tokensCol: Column, budget: Long, nShards: Int): DataFrame = {
    val shard = pmod(col(idCol), lit(nShards.toLong))
    val w = Window.partitionBy(col(stratumCol), col("shard"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, -1)
    val withPrev = df
      .withColumn("shard", shard)
      .withColumn("n_tokens", tokensCol)
      .withColumn("bin", floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget))
    withPrev.withColumn("pos",
      row_number().over(Window.partitionBy(col(stratumCol), col("shard"), col("bin"))
        .orderBy(col(idCol))).cast("long"))
  }

  /** Materialize packed bins into one training sequence each:
    * documents of a (stratum, shard, bin) concatenated in id order
    * with an end-of-document separator. The groupBy keys extend the
    * packing window's partitioning, so Catalyst reuses the same
    * shuffle — pack + materialize is still a two-exchange plan from
    * the raw corpus.
    */
  def materializeBins(packed: DataFrame, idCol: String, stratumCol: String,
                      textCol: String, eod: String): DataFrame =
    packed
      .groupBy(col(stratumCol), col("shard"), col("bin"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          eod).as("sequence"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))

  /** Deterministic hash-threshold sampling: keep rows whose md5-hex
    * prefix sorts below the threshold. Like Sampling.stratified this
    * is stable under AQE/retries, but md5 makes it reproducible by
    * any engine (the xxhash64 variant is Spark-specific) — the
    * standard trick for cross-system-auditable samples.
    */
  def hashSample(key: Column, hexThreshold: String): Column =
    substring(md5(key.cast("string")), 1, hexThreshold.length) < hexThreshold

  /** Word-polynomial document fingerprint, h = fold(31·h + wordHash)
    * mod p with wordHash = fold(131·g + codepoint) mod p. Weaker
    * dispersion than xxhash64 (TextAnalysis.fingerprint) but exactly
    * reproducible in plain SQL by any engine — use where fingerprints
    * must be re-derivable outside Spark.
    */
  /** Engine-portable per-word hash: fold(131·g + codepoint) mod p.
    * Chars via 1-based substring (split(w, "") appends a trailing ""
    * under Java's limit=-1 semantics, which no SQL twin reproduces).
    */
  def polyWordHash(w: Column): Column =
    when(length(w) === 0, lit(0L)).otherwise(
      aggregate(sequence(lit(1), length(w)), lit(0L),
        (g, i) => pmod(g * 131L + ascii(w.substr(i, lit(1))).cast("long"), lit(1000000007L))))

  def polyFingerprint(text: Column): Column =
    aggregate(split(text, " "), lit(0L),
      (h, w) => pmod(h * 31L + polyWordHash(w), lit(1000000007L)))

  /** Engine-portable md5-derived integer in [0, 2^24): the first six
    * hex digits parsed as a number — the randomness source for FIM
    * split points and pair bucketing (hashSample's ordering trick,
    * but as an integer the modulo arithmetic can consume).
    */
  def md5Int(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long")

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): the word
    * sequence splits into fixed `blockLen`-token blocks; a block is
    * masked iff its md5 bucket clears a hex threshold (≈1/`oneInK` of
    * blocks — the hashSample string-compare trick, no numeric
    * conversion), and each masked block collapses to a numbered
    * sentinel `<extra_id_k>` in block order. Deterministic: the same
    * corpus yields the same denoising training set on any engine, and
    * re-running on a grown corpus never re-masks an old document
    * differently. Shape: one posexplode + a block aggregate + one
    * per-doc window — shuffle keys are (doc, block), never raw text
    * twice.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  blockLen: Int = 3, oneInK: Int = 5, seed: Long = 17L): DataFrame = {
    require(oneInK == 5, "threshold hex below is derived for oneInK = 5")
    val toks = docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val blocks = toks
      .withColumn("blk", (col("pos") / blockLen).cast("long"))
      .groupBy("id", "blk")
      .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("bt"))
    // 0x333333 / 0x1000000 ≈ 0.2 — the 1-in-5 mask rate
    val masked = substring(md5(concat(col("id").cast("string"), lit(":"),
      col("blk").cast("string"), lit(":" + seed))), 1, 6) < "333333"
    val wRun = Window.partitionBy("id").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val numbered = blocks
      .withColumn("masked", masked)
      .withColumn("k", sum(when(col("masked"), 1L).otherwise(0L)).over(wRun))
    val outToks = when(col("masked"),
      array(concat(lit("<extra_id_"), (col("k") - 1).cast("string"), lit(">"))))
      .otherwise(transform(col("bt"), x => x.getField("tok")))
    numbered
      .withColumn("ot", outToks)
      .groupBy("id")
      .agg(
        sum(size(col("bt")).cast("long")).as("n_tokens"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("masked"), size(col("bt")).cast("long")).otherwise(0L)).as("n_masked"),
        concat_ws(" ", flatten(transform(
          sort_array(collect_list(struct(col("blk"), col("ot")))),
          x => x.getField("ot")))).as("corrupted"))
      .select(col("id"), col("n_tokens"), col("n_spans"), col("n_masked"),
        substring(col("corrupted"), 1, 160).as("corrupted_head"))
  }

  /** Fill-in-the-middle split (Bavarian et al. 2022, arXiv:2207.14255):
    * each document's word sequence splits into (prefix, middle,
    * suffix) at two hash-derived points — deterministic, so the same
    * corpus always yields the same FIM training set on any engine.
    * Guarantees each span is non-empty (docs under 3 words are
    * dropped). Pure projection — the 100 TB pass is scan-bound; the
    * middle re-materializes as an md5 fingerprint so the output stays
    * narrow while still pinning the exact span content.
    */
  def fimSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val n = size(ws).cast("long")
    val h1 = md5Int(concat(col(idCol).cast("string"), lit("-a")))
    val h2 = md5Int(concat(col(idCol).cast("string"), lit("-b")))
    docs.filter(size(ws) >= 3)
      .select(col(idCol), ws.as("ws"), n.as("n"), h1.as("h1"), h2.as("h2"))
      .withColumn("a", lit(1L) + col("h1") % (col("n") - 2))
      .withColumn("b", col("a") + 1L + col("h2") % (col("n") - col("a") - 1))
      .select(col(idCol), col("n").as("n_words"),
        col("a").as("n_prefix"), (col("b") - col("a")).as("n_middle"),
        (col("n") - col("b")).as("n_suffix"),
        md5(concat_ws(" ", slice(col("ws"), (col("a") + 1).cast("int"),
          (col("b") - col("a")).cast("int")))).as("middle_fp"))
  }

  /** Preference-pair mining (the DPO/RLHF data-prep step): within
    * each (stratum, hash-bucket) cell, pair the highest-scoring
    * document against the lowest as (chosen, rejected). Struct-min/max
    * aggregates — map-side combined, one shuffle of cell keys; ties
    * break on id so the pairing is deterministic under AQE/retries.
    * Cells with a single distinct document produce no pair.
    */
  def preferencePairs(docs: DataFrame, stratumCol: String, idCol: String,
                      score: Column, buckets: Int): DataFrame = {
    docs.select(col(stratumCol).as("stratum"),
      (md5Int(col(idCol)) % buckets).as("bucket"),
      score.cast("long").as("score"), col(idCol).as("id"))
      .groupBy("stratum", "bucket")
      .agg(max(struct(col("score"), col("id"))).as("hi"),
        min(struct(col("score"), col("id"))).as("lo"))
      .filter(col("hi.id") =!= col("lo.id"))
      .select(col("stratum"), col("bucket"),
        col("hi.id").as("chosen_id"), col("lo.id").as("rejected_id"),
        (col("hi.score") - col("lo.score")).as("margin"))
  }
}
