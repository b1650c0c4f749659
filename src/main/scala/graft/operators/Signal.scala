package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval/bar/stream-shape operators over timestamped event data:
  * overlapping-interval islands, OHLC bars, time-weighted averages,
  * trailing-window distinct actors, and linear-interpolation gap fill.
  *
  * Exactness contract (SURVEY.md §5): epoch-second / integer-cent
  * arithmetic end to end; the only doubles are final ratios, rounded
  * at 4dp in BOTH engines. Windows are never unpartitioned and never
  * row-grain under a low-cardinality key: islands order within a
  * scaling key, bars are one map-side-combinable aggregation, the
  * grid windows run at slot grain (span-bounded), and the trailing
  * distinct runs at (key, actor, day) grain.
  */
object Signal {

  private def slotOf(ts: Column, stepSeconds: Long): Column =
    (floor(ts.cast("long") / stepSeconds) * stepSeconds).cast("long")

  /** Merge overlapping [start, end) intervals per key into islands
    * (Itzik Ben-Gan's gaps-and-islands form, the sweep that handles
    * CONTAINED intervals where gap sessionization cannot): an island
    * opens exactly when an interval starts past the running max of
    * all earlier ends. Returns one row per key with island count,
    * covered span, interval count, and the widest island.
    *
    * Scale shape: one hash exchange on the key; the running-max and
    * island-id windows order within a key whose cardinality grows
    * with the data (no global sort, no low-cardinality pin). All
    * arithmetic is epoch-second longs — engine-exact.
    */
  def intervalIslands(df: DataFrame, keyCol: String, start: Column, end: Column,
                      tieBreak: Seq[Column]): DataFrame = {
    val iv = df.select(col(keyCol).as("key"),
      start.cast("long").as("s"), end.cast("long").as("e"),
      struct(tieBreak: _*).as("tb"))
    val order = Seq(col("s"), col("e"), col("tb"))
    val prevMax = Window.partitionBy("key").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val runId = Window.partitionBy("key").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = iv.withColumn("pm", max(col("e")).over(prevMax))
      .withColumn("opens", (col("pm").isNull || col("s") > col("pm")).cast("long"))
      .withColumn("island", sum(col("opens")).over(runId))
    flagged.groupBy("key", "island")
      .agg(min(col("s")).as("is0"), max(col("e")).as("is1"),
        count(lit(1)).as("niv"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("niv")).as("n_intervals"),
        sum(col("is1") - col("is0")).as("covered_s"),
        max(col("is1") - col("is0")).as("widest_s"))
  }

  /** OHLC bars: per (key, fixed slot) the first/max/min/last value in
    * integer cents plus volume and turnover. One aggregation — open
    * and close ride `min_by`/`max_by` over the (ts, tiebreak) struct,
    * so the whole bar is map-side combinable (no window, no second
    * pass; the plan is a single hash aggregate over the scan).
    */
  def ohlcBars(df: DataFrame, keyCol: String, ts: Column, cents: Column,
               tieBreak: Column, stepSeconds: Long): DataFrame = {
    val e = df.select(col(keyCol).as("key"), slotOf(ts, stepSeconds).as("slot"),
      ts.cast("long").as("sec"), tieBreak.as("tb"), cents.as("c"))
    e.groupBy("key", "slot").agg(
      min_by(col("c"), struct(col("sec"), col("tb"))).as("open_c"),
      max(col("c")).as("high_c"),
      min(col("c")).as("low_c"),
      max_by(col("c"), struct(col("sec"), col("tb"))).as("close_c"),
      count(lit(1)).as("volume"),
      sum(col("c")).as("turnover_c"))
  }

  /** Time-weighted average price per key: Σ vᵢ·(tᵢ₊₁−tᵢ) / (tₙ−t₁),
    * the last observation carrying no weight (standard TWAP). The
    * weighted sum accumulates cent×second products in DECIMAL(38,0)
    * (no overflow at any corpus scale) and divides once at the end.
    *
    * Scale shape: the lead window partitions by the FULL key —
    * callers must pass a key whose cardinality scales with the data
    * (e.g. (series, actor)), never a handful of series names alone.
    */
  def twap(df: DataFrame, keyCols: Seq[String], ts: Column, cents: Column,
           tieBreak: Column): DataFrame = {
    val ks = keyCols.map(col)
    val e = df.select(ks :+ ts.cast("long").as("sec") :+ cents.as("c") :+
      tieBreak.as("tb"): _*)
    val w = Window.partitionBy(ks: _*).orderBy(col("sec"), col("tb"))
    val d38 = "decimal(38,0)"
    e.withColumn("nxt", lead(col("sec"), 1).over(w))
      .groupBy(ks: _*)
      .agg(count(lit(1)).as("n_obs"),
        (max(col("sec")) - min(col("sec"))).as("span_s"),
        sum((col("nxt") - col("sec")).cast(d38) * col("c").cast(d38)).as("wsum"))
      .filter(col("span_s") > 0)
      .select(ks :+ col("n_obs") :+ col("span_s") :+
        round(col("wsum").cast("double") / col("span_s").cast("double"), 4)
          .as("twap_c"): _*)
  }

  /** Trailing-k-day distinct actors per (key, day) — "7-day active
    * users" — WITHOUT a distinct-over-window: the rows collapse to
    * the distinct (key, actor, day) grain, each activity day then
    * contributes the actor to days d..d+k−1 (a k-row explode of the
    * DEDUPED grain, not of raw events), contributions re-dedupe, and
    * a plain count per (key, day) finishes. Three hash exchanges, all
    * at activity-grain volume × k; no state, no sort.
    */
  def trailingDistinct(df: DataFrame, keyCol: String, actor: Column, ts: Column,
                       days: Int): DataFrame = {
    val ud = df.select(col(keyCol).as("key"), actor.as("actor"),
      slotOf(ts, 86400L).as("d")).distinct()
    val maxDay = ud.agg(max(col("d")).as("mx"))
    val contrib = ud
      .select(col("key"), col("actor"),
        explode(sequence(lit(0L), lit(days.toLong - 1))).as("off"), col("d"))
      .select(col("key"), col("actor"), (col("d") + col("off") * 86400L).as("cd"))
      .distinct()
    contrib.crossJoin(broadcast(maxDay))
      .filter(col("cd") <= col("mx"))
      .groupBy(col("key"), col("cd").as("day_slot"))
      .agg(count(lit(1)).as("active"))
  }

  /** Fixed-grid resampling with LINEAR interpolation — the
    * two-sided complement of [[TimeSeries.resampleFfill]]'s LOCF:
    * interior gap slots take v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀) between the
    * bracketing observations; leading/trailing slots (no bracket)
    * stay the one-sided neighbor. Same plan skeleton as resampleFfill
    * (one key exchange serves slot agg, span agg, grid join, and all
    * four ignore-nulls windows; grid rows bounded by each key's span,
    * windows run at SLOT grain, never raw-row grain).
    */
  def resampleInterpolate(events: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, stepSeconds: Long): DataFrame = {
    val d38 = "decimal(38,0)"
    val byKey = events
      .select(col(keyCol).as("key"), slotOf(col(tsCol), stepSeconds).as("slot"),
        round(col(valueCol) * 100).cast("long").as("c"))
      .repartition(col("key"))
    // per-slot observation kept as an exact rational (Σcents, n): the
    // ONLY float op anywhere is the single final division, so both
    // engines round the identical IEEE double — no ULP slack at the
    // 4dp boundary (the repo's integer-exactness contract, SURVEY §5)
    val slotAgg = byKey.groupBy("key", "slot")
      .agg(sum(col("c")).cast(d38).as("sc"), count(lit(1)).cast(d38).as("cn"))
    val grid = byKey.groupBy("key")
      .agg(min(col("slot")).as("s0"), max(col("slot")).as("s1"))
      .select(col("key"),
        explode(sequence(col("s0"), col("s1"), lit(stepSeconds))).as("slot"))
    // BOTH lookaround directions as RUNNING frames: Spark evaluates
    // (unboundedPreceding → currentRow) incrementally in O(n), while
    // a (currentRow → unboundedFollowing) frame rescans the remainder
    // per row — O(n²) per key (measured 31 s at sf0.1 before this
    // rewrite, 10.5M grid rows). "Next observation" is therefore the
    // running last over the DESCENDING slot order.
    val back = Window.partitionBy("key").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdAsc = Window.partitionBy("key").orderBy(col("slot").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SHUFFLE_HASH, not the auto-broadcast the planner picks at mid
    // scale: slotAgg is the data-scaled per-slot observation table
    // (its stats sit just under 32 MB at sf1, and it only grows), and
    // BOTH sides are already clustered by key — which satisfies the
    // (key, slot) join's distribution — so the hinted join is
    // exchange-free where the broadcast paid a driver-side build for
    // nothing (5.8 s vs 2.7 s quiet interleaved A/B at sf1).
    val j = grid.join(slotAgg.hint("shuffle_hash"), Seq("key", "slot"), "left")
      .withColumn("os", when(col("sc").isNotNull, col("slot")))
      .withColumn("psc", last(col("sc"), ignoreNulls = true).over(back))
      .withColumn("pcn", last(col("cn"), ignoreNulls = true).over(back))
      .withColumn("ps", last(col("os"), ignoreNulls = true).over(back))
      .withColumn("nsc", last(col("sc"), ignoreNulls = true).over(fwdAsc))
      .withColumn("ncn", last(col("cn"), ignoreNulls = true).over(fwdAsc))
      .withColumn("ns", last(col("os"), ignoreNulls = true).over(fwdAsc))
    // exact-integer cross-multiplied lerp:
    //   v = (psc·ncn·(ns−slot) + nsc·pcn·(slot−ps)) / (pcn·ncn·(ns−ps)·100)
    def dl(c: Column): Column = c.cast(d38)
    val num = when(col("sc").isNotNull, col("sc") * lit(1).cast(d38))
      .when(col("psc").isNotNull && col("nsc").isNotNull,
        col("psc") * col("ncn") * dl(col("ns") - col("slot")) +
          col("nsc") * col("pcn") * dl(col("slot") - col("ps")))
      .otherwise(coalesce(col("psc"), col("nsc")))
    val den = when(col("sc").isNotNull, col("cn") * lit(100).cast(d38))
      .when(col("psc").isNotNull && col("nsc").isNotNull,
        col("pcn") * col("ncn") * dl(col("ns") - col("ps")) * lit(100).cast(d38))
      .otherwise(coalesce(col("pcn"), col("ncn")) * lit(100).cast(d38))
    // No final round: the operands are exact integers, so the one
    // IEEE division is bit-identical across engines — rounding would
    // only reintroduce the engines' divergent half-way conventions.
    j.select(col("key"), col("slot"),
      (col("sc").cast("double") / (col("cn") * lit(100).cast(d38)).cast("double"))
        .as("v_obs"),
      (num.cast("double") / den.cast("double")).as("v_interp"),
      col("sc").isNull.as("is_gap"))
  }

  /** Gaps-and-islands consecutive-day streaks per actor: distinct
    * active days collapse into runs via the classic day − row_number
    * island key, then one row per actor carries the activity ledger
    * (active days, streak count, longest streak, earliest start of a
    * longest streak).
    *
    * Scale shape: the only window partitions by the ACTOR — key
    * cardinality grows with the data, partition size is bounded by
    * one actor's active days. The longest-streak start resolves with
    * an actor-keyed self-join at island grain (no second window), so
    * everything after the distinct is co-partitioned on actor.
    */
  def activeStreaks(df: DataFrame, actorCol: String, ts: Column): DataFrame = {
    val days = df.select(col(actorCol).as("actor"),
        floor(ts.cast("long") / 86400L).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("actor").orderBy("day")
    val islands = days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("actor", "island")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    val per = islands.groupBy("actor").agg(
      sum("len").as("n_active_days"),
      count(lit(1)).as("n_streaks"),
      max("len").as("max_streak"))
    per.join(islands, Seq("actor"))
      .filter(col("len") === col("max_streak"))
      .groupBy("actor", "n_active_days", "n_streaks", "max_streak")
      .agg(min("start_day").as("best_start_day"))
  }

  /** Per-series maximum drawdown over a cumulative integer-cent sum:
    * running total, running peak, peak − current, max. The classic
    * peak-to-trough risk statistic, exact end to end (cent sums are
    * longs; no floats anywhere).
    *
    * Scale shape: one window per SERIES key (caller supplies a
    * compound key whose cardinality grows with the data — e.g.
    * (event_type, user_id), never a low-cardinality pin), explicit
    * ROWS running frames (incremental, never the O(n²)
    * unboundedFollowing rescan), then a series-grain aggregate.
    */
  def maxDrawdown(df: DataFrame, seriesCols: Seq[String], ts: Column,
                  cents: Column, tieBreak: Column): DataFrame = {
    val keys = seriesCols.map(col)
    val base = df.select(keys :+ ts.cast("long").as("t") :+ tieBreak.as("tb") :+
      cents.as("c"): _*)
    val run = Window.partitionBy(keys: _*).orderBy(col("t"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base
      .withColumn("cum", sum("c").over(run))
      .withColumn("peak", max("cum").over(run))
    cum.groupBy(seriesCols.head, seriesCols.tail: _*)
      .agg(
        count(lit(1)).as("n_obs"),
        max(col("peak") - col("cum")).as("max_dd_c"),
        max("peak").as("peak_c"))
  }
}
