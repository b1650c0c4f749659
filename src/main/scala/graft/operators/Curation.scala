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
  def polyFingerprint(text: Column): Column = {
    val P = 1000000007L
    // Chars via 1-based substring (split(w, "") appends a trailing ""
    // under Java's limit=-1 semantics, which no SQL twin reproduces).
    val wordHash: Column => Column = w =>
      when(length(w) === 0, lit(0L)).otherwise(
        aggregate(sequence(lit(1), length(w)), lit(0L),
          (g, i) => pmod(g * 131L + ascii(w.substr(i, lit(1))).cast("long"), lit(P))))
    aggregate(split(text, " "), lit(0L), (h, w) => pmod(h * 31L + wordHash(w), lit(P)))
  }
}
