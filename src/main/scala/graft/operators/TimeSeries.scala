package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over event streams: fixed-interval resampling
  * with forward fill, and cohort retention. Slots are epoch-second
  * buckets (floor(epoch/step)*step) rather than calendar windows, so
  * every engine reproduces them with integer arithmetic — no
  * timezone/calendar semantics in the key.
  */
object TimeSeries {

  private def slotOf(ts: Column, stepSeconds: Long): Column =
    floor(ts.cast("long") / stepSeconds) * stepSeconds

  /** Resample to a fixed grid with last-observation-carried-forward:
    * one row per (key, slot) from the key's first to last active slot;
    * slots with observations carry their mean, gaps carry the fill.
    *
    * Scale shape: everything clusters by key — the input is
    * repartitioned by key ONCE and the slot aggregation, span
    * aggregation, grid join, and fill window all run on that exchange
    * (hash(key) satisfies each of their clusterings; same pattern as
    * the report association fix, guarded in PlanAuditSpec). Grid rows
    * explode from a per-key sequence bounded by the key's own active
    * span. The fill window carries one value of state per key.
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, stepSeconds: Long): DataFrame = {
    val byKey = events
      .select(col(keyCol).as("key"), slotOf(col(tsCol), stepSeconds).as("slot"),
        col(valueCol).cast("double").as("v"))
      .repartition(col("key"))
    val slotAgg = byKey.groupBy("key", "slot").agg(avg(col("v")).as("v_obs"))
    val grid = byKey.groupBy("key")
      .agg(min(col("slot")).as("s0"), max(col("slot")).as("s1"))
      .select(col("key"), explode(sequence(col("s0"), col("s1"), lit(stepSeconds))).as("slot"))
    val w = Window.partitionBy("key").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(slotAgg, Seq("key", "slot"), "left")
      .select(col("key"), col("slot"),
        round(col("v_obs"), 4).as("v_obs"),
        round(last(col("v_obs"), ignoreNulls = true).over(w), 4).as("v_filled"),
        col("v_obs").isNull.as("is_gap"))
  }

  /** Cohort retention: users grouped by their first-activity bucket,
    * counted per (cohort, age) — age in buckets since the cohort
    * bucket. One distinct (key, bucket) table feeds both the cohort
    * assignment and the activity join; dims stay ids-only.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
                      bucketSeconds: Long): DataFrame = {
    val active = events
      .select(col(keyCol).as("key"), slotOf(col(tsCol), bucketSeconds).as("bucket"))
      .distinct()
    val cohorts = active.groupBy("key").agg(min(col("bucket")).as("cohort"))
    active.join(cohorts, "key")
      .groupBy(col("cohort"), ((col("bucket") - col("cohort")) / bucketSeconds).cast("long").as("age"))
      .agg(count(lit(1)).as("n_active"))
  }
}
