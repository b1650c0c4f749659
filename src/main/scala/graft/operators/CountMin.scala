package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the mergeable heavy-hitter frequency sketch
  * (Cormode & Muthukrishnan 2005): d hash rows of w counters; a key's
  * estimate is the MIN of its d bucket counts, which never
  * under-counts (each bucket holds the key's true count plus
  * non-negative collision mass). The d×w counter table is the whole
  * state — kilobytes for any corpus size — so per-partition or per-day
  * sketches sum counter-wise into a corpus sketch without rescanning
  * data, the same rolling pattern as the HLL union (SURVEY §2 #59b).
  *
  * md5-prefix bucketing (the house portability idiom, Sampling
  * .scala:16) keeps the construction integer-exact: the DuckDB oracle
  * rebuilds the identical sketch and identical estimates, so unlike
  * the HLL / approx_percentile sketches this one is oracle-PROVABLE
  * end-to-end, not just error-bounded in a spec.
  *
  * Scale shape: the build explodes d bucket ids per row into a
  * (depth, bucket) groupBy — map-side combine collapses the stream
  * into counter cells long before the exchange, so the shuffle
  * carries at most d×w partial rows per map task regardless of corpus
  * size. Estimation broadcasts the ≤ d×w-row sketch to the candidate
  * side; nothing corpus-sized moves.
  */
object CountMin {

  /** Depth-j counter index: first 32 md5 bits of "key:seed:j" mod
    * width — non-negative, integer-exact on any engine with md5.
    */
  def bucket(key: Column, j: Int, width: Int, seed: Long): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$seed:$j"))), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch: (depth, bucket, cnt) counter cells. Zero
    * counters are absent rows — [[estimate]] coalesces them back to 0.
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int, seed: Long): DataFrame =
    df.select(posexplode(array((0 until depth).map(j =>
        bucket(col(keyCol), j, width, seed)): _*)).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point estimates for the (distinct) keys in `keys`: min over
    * depths of each key's counter. The sketch side broadcasts — it is
    * ≤ depth×width rows by construction. Keys the sketch never saw
    * estimate 0 via the left join.
    */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int, width: Int, seed: Long): DataFrame =
    keys.select(col(keyCol),
        posexplode(array((0 until depth).map(j =>
          bucket(col(keyCol), j, width, seed)): _*)).as(Seq("depth", "bucket")))
      .join(broadcast(sk), Seq("depth", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
