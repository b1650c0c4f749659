package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction (Sennrich et al. 2016) as a driver-bounded
  * Spark loop — the step that turns a curated corpus into a tokenizer.
  *
  * Scale shape: everything after the one-time word-count aggregation
  * operates on the VOCABULARY weighted by word counts, never the
  * corpus — the classic BPE trick. Each merge round is one pair-count
  * aggregate over the symbolized vocab (rows = vocab size, shrinking
  * as merges apply) and collects exactly ONE row (the argmax pair)
  * back to the driver; the merge application is a per-row fold. At
  * 100 TB the corpus is touched once for word counts; every round
  * after that costs the same as at 1 GB.
  */
object Bpe {

  /** Greedy left-to-right application of one merge (a, b) → "ab" to a
    * symbol array — the standard BPE semantics ("aaa" + (a,a) →
    * ["aa", "a"]).
    */
  private[operators] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x)))
    )

  /** Adjacent-pair weighted frequencies of a symbolized vocab. */
  private[operators] def pairCounts(symbolized: DataFrame): DataFrame =
    symbolized
      .filter(size(col("s")) >= 2)
      // both slices bounded by size (slice with Int.MaxValue length
      // overflows on the interpreted path); equal lengths mean
      // zip_with never pads
      .select(col("wc"), explode(
        zip_with(slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .filter(col("p.b").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wc")).as("freq"))

  /** Learn `nMerges` merges from a (word, count) table. Deterministic:
    * argmax pair with (freq desc, a asc, b asc) tiebreak. Stops early
    * if no pair remains. Returns merges in application order.
    */
  def learnMerges(words: DataFrame, wordCol: String, countCol: String, nMerges: Int): Seq[(String, String)] = {
    var symbolized = words
      .select(col(countCol).cast("long").as("wc"),
        expr(s"transform(sequence(1, length($wordCol)), i -> substr($wordCol, i, 1))").as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    try {
      var continue = true
      while (continue && merges.size < nMerges) {
        val top = pairCounts(symbolized)
          .orderBy(col("freq").desc, col("a"), col("b")).limit(1).collect()
        if (top.isEmpty) continue = false
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          val next = symbolized.select(col("wc"), applyMerge(col("s"), a, b).as("s"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // force before dropping the parent so the lineage is short
          next.count()
          symbolized.unpersist(false)
          symbolized = next
        }
      }
      merges.toList
    } finally { symbolized.unpersist(false); () }
  }

  /** Tokenize words with a learned merge list (applied in order) —
    * returns (word, tokens). The runtime encoder a pipeline would
    * broadcast; here it doubles as the spec's round-trip check.
    */
  def encode(words: DataFrame, wordCol: String, merges: Seq[(String, String)]): DataFrame = {
    val base = expr(s"transform(sequence(1, length($wordCol)), i -> substr($wordCol, i, 1))")
    val toks = merges.foldLeft(base: Column) { case (acc, (a, b)) => applyMerge(acc, a, b) }
    words.select(col(wordCol), toks.as("tokens"))
  }
}
