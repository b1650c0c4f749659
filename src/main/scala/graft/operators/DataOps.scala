package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-operations utilities around the harvest/curation lifecycle:
  * snapshot diffing (what changed between two harvest runs), column
  * histograms, and shuffle-key skew diagnostics — the checks an
  * operator of a 100 TB pipeline runs before trusting or re-planning
  * a load.
  */
object DataOps {

  /** Row-level diff of two snapshots on a natural key: one row per key
    * with status added / removed / changed / unchanged ("changed"
    * compares the given payload columns null-safely). One full outer
    * join keyed on the natural key — both sides shuffle once; payload
    * comparison is a map-side expression.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      col(keyCol).as("key") +: lit(true).as("__o") +: compareCols.map(c => col(c).as(s"o_$c")): _*)
    val n = newSnap.select(
      col(keyCol).as("key") +: lit(true).as("__n") +: compareCols.map(c => col(c).as(s"n_$c")): _*)
    val anyChanged = compareCols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    o.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__o").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Equi-width histogram of a numeric column with FIXED bounds (no
    * min/max pre-pass — deterministic and one aggregation): bucket i
    * covers [lo + i·step, lo + (i+1)·step); values outside clamp to
    * the edge buckets. Emits (bucket, n, lo/hi/avg of the bucket's
    * actual values).
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, step: Double, nBuckets: Int): DataFrame = {
    val raw = floor((col(valueCol) - lo) / step).cast("long")
    val b = least(greatest(raw, lit(0L)), lit(nBuckets - 1L))
    df.select(b.as("bucket"), col(valueCol).cast("double").as("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 4).as("v_min"),
        round(max(col("v")), 4).as("v_max"),
        round(avg(col("v")), 4).as("v_avg"))
  }

  /** Shuffle-key skew diagnostic: the top-k heaviest keys of a column
    * with their row share — the number an engineer reads before
    * deciding on salting or AQE skew thresholds. One keyed count
    * (map-side combine), a broadcast single-row total, and a bounded
    * TakeOrderedAndProject for the top-k; never a full sort.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val total = df.select(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), round(col("cnt") / col("total"), 6).as("share"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
  }
}
