package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, arXiv:2302.03169): score every document in a raw SOURCE pool
  * by how much more likely its hashed bag-of-words is under a small
  * high-quality TARGET corpus than under the pool itself, then sample
  * the pool proportionally to those importance weights. This is the
  * standard recipe for skewing a 100 TB crawl toward a curated
  * distribution (Wikipedia/books-like text) without training a
  * classifier.
  *
  * The feature space is `buckets` hashed unigram bins (the paper uses
  * hashed n-grams for exactly this collision-tolerant compression);
  * both distributions are Laplace-smoothed multinomials over the bins,
  * and the weight is the per-document log-likelihood ratio
  * Σ_tokens [log p_target(bin) − log p_source(bin)].
  *
  * Scale shape: one tokenization of the pool, persisted (see
  * `storage` — corpus-token-sized, DISK_ONLY at 100 TB); from it the
  * bin-count aggregation shuffles only (bin, partial-count) rows with
  * map-side combine, so both distribution tables are `buckets` rows —
  * broadcast back for the scoring join. The target corpus is small by
  * definition and aggregates the same way. Nothing corpus-sized
  * shuffles; nothing reaches the driver.
  *
  * Hashes are md5-prefix (not xxhash64) so any engine reproduces the
  * binning exactly — the DuckDB oracle recomputes the full pipeline.
  */
object Dsir {

  /** Hashed unigram bin in [0, buckets): first 32 md5 bits mod buckets. */
  def tokenBucket(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % buckets

  /** Per-document importance weight over the source pool.
    * Returns (id, weight) with weight rounded to 4 decimals (the
    * per-bin terms are bit-exact across engines; the per-document sum
    * is float addition whose order an engine may choose, so — as with
    * BM25 — consumers compare and rank the rounded value).
    */
  def importanceWeights(source: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 1024): DataFrame =
    importanceWeightsReleasable(source, target, idCol, textCol, buckets)._1

  /** importanceWeights with a [[CacheHandle]] for the persisted
    * tokenized pool (same contract as bm25TopKReleasable: the cache is
    * corpus-token-sized — pass StorageLevel.DISK_ONLY at full scale).
    */
  def importanceWeightsReleasable(source: DataFrame, target: DataFrame,
                                  idCol: String, textCol: String,
                                  buckets: Int = 1024,
                                  storage: org.apache.spark.storage.StorageLevel =
                                    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, CacheHandle) = {
    val handle = CacheHandle()
    // Persisted because BOTH the source bin counts and the scoring
    // pass read the tokenized pool; recomputing would tokenize the
    // corpus twice.
    val srcBins = handle.track(source
      .select(col(idCol).as("id"), explode(split(lower(col(textCol)), " ")).as("w"))
      .select(col("id"), tokenBucket(col("w"), buckets).as("b"))
      .persist(storage))
    val tgtBins = target
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .select(tokenBucket(col("w"), buckets).as("b"))
    // Both count tables are read twice (ratio join + totals row) and
    // are at most `buckets` rows — persisting them keeps each corpus
    // side at ONE tokenization pass (without this the target corpus
    // would be scanned and tokenized twice).
    val srcCnt = handle.track(srcBins.groupBy("b").agg(count(lit(1)).as("sn")).persist())
    val tgtCnt = handle.track(tgtBins.groupBy("b").agg(count(lit(1)).as("tn")).persist())
    // Totals ride along as a broadcast single-row frame (no collect).
    val totals = srcCnt.agg(sum(col("sn")).as("st"))
      .crossJoin(tgtCnt.agg(sum(col("tn")).as("tt")))
    val ratio = srcCnt.join(tgtCnt, Seq("b"), "full_outer")
      .na.fill(0L, Seq("sn", "tn"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("tn") + lit(1.0)) / (col("tt") + lit(buckets.toDouble))) -
         log((col("sn") + lit(1.0)) / (col("st") + lit(buckets.toDouble)))).as("lr"))
    val weights = srcBins.join(broadcast(ratio), "b")
      .groupBy("id").agg(round(sum(col("lr")), 4).as("weight"))
    (weights, handle)
  }

  /** Deterministic Gumbel-top-k sample of `k` documents by importance
    * weight — the exact sampling-without-replacement scheme DSIR uses
    * (add Gumbel(0,1) noise to the log-weights, take the top k), made
    * reproducible by deriving the uniform from md5(id:seed) instead of
    * an RNG: u = (first-32-md5-bits + 0.5) / 2^32, g = −ln(−ln u).
    * Ranking compares the ROUNDED noisy key (id tiebreak), and the
    * orderBy+limit plans TakeOrderedAndProject — per-partition top-k
    * with a k-row driver merge, not a global sort.
    */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
                 k: Int, seed: Long): DataFrame = {
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = round(col(weightCol) + -log(-log(u)), 6)
    import org.apache.spark.sql.expressions.Window
    weights.withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol)).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("gumbel_key").desc, col(idCol))).cast("long"))
  }
}
