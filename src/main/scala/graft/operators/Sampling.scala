package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data sampling and mixing — the dataset-assembly side of an
  * LLM pipeline: per-stratum rates and weighted source mixtures.
  *
  * Deterministic by construction: selection hashes the row's id with a
  * seed instead of consuming an RNG stream, so results are stable
  * across retries/partitionings (an RNG-based sample changes under AQE
  * re-planning; a hash-based one never does).
  */
object Sampling {

  /** Keep each row of stratum s with probability rates(s): hash-bucket
    * the id into [0,1) and compare. Unknown strata default to 0.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String, rates: Map[String, Double], seed: Long): DataFrame = {
    val bucket = (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0)
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Weighted mixture of sources: per-source hash-rate downsampling
    * then union, tagging each row's origin.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], idCol: String, seed: Long): DataFrame =
    sources.map { case (name, df, rate) =>
      val bucket = (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0)
      df.filter(bucket < rate).withColumn("source_name", lit(name))
    }.reduce(_ unionByName _)

  /** EXACTLY k rows per stratum (rate-based sampling only hits k in
    * expectation): order each stratum by an md5 hash of the id (an
    * engine-portable deterministic "random" order) and keep the first
    * k via the bounded-heap TopKPerKey operator — a distributed
    * reservoir sample without reservoir state. Ties impossible
    * (md5 of distinct ids), so the sample is a pure function of the
    * id set.
    */
  def exactKPerStratum(df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame =
    TopK.perKey(
      df.withColumn("__h", md5(col(idCol).cast("string"))),
      Seq(stratumCol),
      struct(col("__h"), col(idCol)), k
    ).drop("__h")
}
