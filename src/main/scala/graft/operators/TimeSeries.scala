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

  /** Final exponentially-weighted moving average per key, computed in
    * CLOSED FORM rather than as a sequential fold: with rows numbered
    * rn = 1..n per key in time order and the standard init
    * ewma_1 = x_1,
    *
    *   ewma_n = (1-α)^(n-1)·x_1 + Σ_{rn≥2} α·(1-α)^(n-rn)·x_rn
    *
    * — one weight per row from its position, so the whole computation
    * is a row_number window plus one aggregation (two key-clustered
    * shuffles; a fold would serialize per key and an engine can't
    * vectorize it). With α = 1/2^k the weights are exact powers of
    * two (float multiplication by 2^-j is an exponent shift), so the
    * only inexactness is the final sum's addition order — rounding
    * absorbs it and any engine reproduces the value.
    *
    * `orderCols` must be a total order within a key (pass a unique
    * tiebreaker) or rn — and the result — is nondeterministic.
    */
  def ewmaLast(events: DataFrame, keyCol: String, orderCols: Seq[Column],
               valueCol: String, alpha: Double): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val numbered = events
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .select(col(keyCol), col(valueCol).cast("double").as("v"), col("rn"), col("n"))
    numbered
      .select(col(keyCol),
        when(col("rn") === 1, col("v") * pow(lit(1 - alpha), col("n") - 1))
          .otherwise(col("v") * alpha * pow(lit(1 - alpha), col("n") - col("rn"))).as("wv"),
        col("n"))
      .groupBy(keyCol)
      .agg(first(col("n")).as("n_obs"), round(sum(col("wv")), 4).as("ewma"))
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
