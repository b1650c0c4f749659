package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * AQE's skew-join split handles most skew at runtime (enabled in
  * GraftSession); salting is the explicit fallback when one join key
  * dominates so heavily that even split partitions hot-spot — the big
  * side spreads each key over `n` salts deterministically, the small
  * side replicates each row `n` times. Shuffle volume: |L| + n·|R|.
  */
object Salt {

  /** Inner equi-join of a skewed `big` side with a `small` side on
    * `key`, spreading each big-side key across `n` salt buckets.
    * Deterministic: the salt derives from a hash of the whole big-side
    * row, not from rand().
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val salted = big.withColumn(
      "__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(n.toLong)).cast("int")
    )
    val replicated = small.withColumn("__salt", explode(lit((0 until n).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
