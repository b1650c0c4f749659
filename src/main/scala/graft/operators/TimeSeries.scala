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

  /** Ordered conversion funnel: for stages A → B → C, a key converts
    * to stage i+1 only by an event of that type AT OR AFTER its first
    * qualifying stage-i event (first-touch semantics — re-orderings
    * like purchase-before-view do NOT count, which is what separates
    * a funnel from three independent counts). One row out: total keys
    * and per-stage converted counts with rates.
    *
    * Scale shape: one repartition by key, then every stage is a
    * windowed conditional min over that same exchange — no joins, no
    * per-stage passes over the corpus (stage i+1's window reads stage
    * i's column). 100 TB of events pays one shuffle.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy("__k")
    val base = events.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(typeCol).as("__ty")).repartition(col("__k"))
    val withStages = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col("__ty") === stage
        else col("__ty") === stage && col("__ts") >= col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(cond, col("__ts"))).over(w))
    }
    val stageAggs = stages.indices.map(i => max(col(s"__t$i")).as(s"t$i"))
    val perKey = withStages.groupBy("__k").agg(stageAggs.head, stageAggs.tail: _*)
    val aggs = count(lit(1)).as("n_keys") +:
      stages.indices.map(i => count(col(s"t$i")).as(s"n_${stages(i)}"))
    val counted = perKey.agg(aggs.head, aggs.tail: _*)
    stages.indices.foldLeft(counted) { (df, i) =>
      df.withColumn(s"rate_${stages(i)}",
        round(col(s"n_${stages(i)}").cast("double") / col("n_keys"), 4))
    }
  }

  /** Time-constrained funnel: like [[funnel]], but each stage must
    * follow the previous one within `maxGapSeconds` — the "click
    * within an hour of the view" form real conversion analysis uses
    * (the unconstrained funnel credits a purchase weeks later).
    * Stage i's timestamp is the EARLIEST qualifying event after
    * stage i−1 and inside its gap window. Same single-exchange
    * chained-window shape as [[funnel]]; rates are one 4dp-rounded
    * division per stage.
    */
  def funnelWindowed(events: DataFrame, keyCol: String, tsCol: String,
                     typeCol: String, stages: Seq[String],
                     maxGapSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy("__k")
    val base = events.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(typeCol).as("__ty")).repartition(col("__k"))
    val withStages = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col("__ty") === stage
        else col("__ty") === stage && col("__ts") >= col(s"__t${i - 1}") &&
          col("__ts") <= col(s"__t${i - 1}") + expr(s"INTERVAL $maxGapSeconds SECOND")
      df.withColumn(s"__t$i", min(when(cond, col("__ts"))).over(w))
    }
    val stageAggs = stages.indices.map(i => max(col(s"__t$i")).as(s"t$i"))
    val perKey = withStages.groupBy("__k").agg(stageAggs.head, stageAggs.tail: _*)
    val aggs = count(lit(1)).as("n_keys") +:
      stages.indices.map(i => count(col(s"t$i")).as(s"n_${stages(i)}"))
    val counted = perKey.agg(aggs.head, aggs.tail: _*)
    stages.indices.foldLeft(counted) { (df, i) =>
      df.withColumn(s"rate_${stages(i)}",
        round(col(s"n_${stages(i)}").cast("double") / col("n_keys"), 4))
    }
  }

  /** Time-DECAY multi-touch attribution: each touch inside the
    * lookback earns weight 2^(capDays − age_days) (a half-life of one
    * day, capped), and every conversion splits one credit by weight.
    * Fully integer: the weights are exact powers of two in a LONG,
    * the per-conversion share is parts-per-million via integer
    * division — no float enters at all, so the engine-exactness is
    * unconditional (the [[attribution]] ppm discipline extended to
    * non-uniform weights). Same conversions×touches user-grain range
    * join shape as [[attribution]].
    */
  def attributionDecay(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, convType: String,
                       touchTypes: Seq[String], lookbackMs: Long,
                       capDays: Int = 30): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(tsCol).as("cts"),
        col("event_id").as("conv_id"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).as("tts"),
        col("event_id").as("touch_id"), col(typeCol).as("channel"))
    val pairs = conv.join(touch, Seq("u"))
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL ${lookbackMs / 1000} SECOND"))
      .withColumn("age_days",
        floor((col("cts").cast("long") - col("tts").cast("long")) / 86400L))
      .withColumn("w",
        expr(s"shiftleft(1L, int(greatest(0L, $capDays - age_days)))"))
    val perConv = Window.partitionBy(col("conv_id"))
    pairs.withColumn("wsum", sum(col("w")).over(perConv))
      .withColumn("share_ppm", expr("(1000000 * w) div wsum"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("share_ppm")).as("decay_credit_ppm"))
  }

  /** Rolling window aggregate per key: mean/min/max of the value over
    * the last `n` rows (current inclusive) in time order — the
    * smoothing pass a metrics pipeline applies before anomaly gates.
    * One window on the key clustering; rows-based framing so the
    * result is engine-exact under the (ts, tiebreak) total order.
    */
  def rollingStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    val v = col(valueCol).cast("double")
    events.select(col(keyCol), col(tieCol),
      v.as("v"),
      round(avg(v).over(w), 4).as("roll_avg"),
      min(v).over(w).as("roll_min"),
      max(v).over(w).as("roll_max"))
  }

  /** Trailing time-RANGE window stats: for every event, the count and
    * sum of the key's events in the preceding `windowSec` seconds
    * inclusive of the current row. A RANGE frame, not ROWS: membership
    * is decided by the ORDER BY VALUE, so ties (simultaneous events)
    * are always wholly in or out together — deterministic under
    * duplicate timestamps, where a row-count frame's tail is whatever
    * tiebreak you remembered to add. Second granularity by contract
    * (the ordering value is floor-epoch-seconds on both engines).
    * One key-partitioned exchange; the frame is computed by Spark's
    * sliding-window aggregation, never a self-join.
    */
  def trailingRangeStats(events: DataFrame, keyCol: String, tsCol: String,
                         idCol: String, valueCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).cast("long"))
      .rangeBetween(-windowSec, Window.currentRow)
    // SUM, not AVG: the frame average of 2-decimal values lands
    // EXACTLY on .xx5 rounding boundaries (avg of two 2dp values has a
    // 3rd decimal of 0 or 5), where a 1-ulp summation difference flips
    // round(x, 2) by a full cent across engines. The frame sum's true
    // value IS a 2-decimal number, so every engine's double sits ~1 ulp
    // from it and 0.005 from the nearest boundary - round(sum, 2) is
    // engine-exact where round(avg, 2) is a coin flip. Consumers divide
    // by win_cnt when they want the mean.
    events.select(col(idCol), col(keyCol),
      count(lit(1)).over(w).as("win_cnt"),
      round(sum(col(valueCol).cast("double")).over(w), 2).as("win_sum"))
  }

  /** Session path mining: sessionize by inactivity gap (lag + cumsum
    * of session starts — the same construction the sessionize oracle
    * uses), render each session's ordered event-type sequence as a
    * `>`-joined path string, and return the top-k paths by frequency.
    * The whole computation runs on the key clustering (two windows +
    * one per-session aggregation), then a vocab-of-paths-sized count
    * and a bounded top-k — no global sort.
    */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, typeCol: String, gapMs: Long, k: Int): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val starts = events
      .withColumn("__prev", lag(col(tsCol), 1).over(wOrd))
      .withColumn("__ns",
        when(col("__prev").isNull ||
          (unix_millis(col(tsCol)) - unix_millis(col("__prev"))) > gapMs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__ns")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = starts.groupBy(col(keyCol), col("__sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(typeCol).as("ty")))),
        x => x.getField("ty")), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** First-order Markov transition matrix over an event stream: counts
    * and conditional probabilities P(next | current) from consecutive
    * events per key (ordered by ts with a unique tiebreaker). The
    * per-key sequencing is one lag window on the key clustering; the
    * matrix itself is |types|² rows.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, orderCols: Seq[Column],
                       typeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val pairs = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__prev").as("from_type"), col(typeCol).as("to_type"))
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 4).as("p"))
  }

  /** Cohort retention: users grouped by their first-activity bucket,
    * counted per (cohort, age) — age in buckets since the cohort
    * bucket. One distinct (key, bucket) table feeds both the cohort
    * assignment and the activity join; dims stay ids-only.
    */
  /** Theil–Sen robust slope per group: the MEDIAN of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i), x_i < x_j (Theil 1950, Sen 1968)
    * — the trend estimator with a 29% breakdown point, where one bad
    * harvest day drags an OLS fit (cf. q_zipf_slope's regr_slope)
    * arbitrarily far. The robust drift signal for "is this source
    * growing or rotting" over noisy daily volumes.
    *
    * Scale shape: the pair blow-up unit is points-per-group² — here
    * groups are (source × day)-grade series of bounded length, never
    * the corpus; the self-join shuffles each group once on the group
    * key and explodes INSIDE the group. Median via exact interpolated
    * percentile over the bounded per-group slope set, rounded 6 dp so
    * both engines agree to the digit.
    */
  /** Additive seasonal decomposition (classical moving-average
    * decomposition; the averaging core of STL, Cleveland et al. 1990,
    * without loess): per group over a daily series,
    * trend = centered 7-day moving average, seasonal = per-weekday
    * mean of the detrended series, residual = value − trend −
    * seasonal. Series edges (incomplete windows) carry NULL trend and
    * are excluded from the seasonal fit.
    *
    * Exactness: the detrended value is kept SCALED by 7
    * (7·v − Σ₇ — pure longs, no double subtraction), so the seasonal
    * component is an exact integer ratio Σ(detr₇)/(7n) and every
    * emitted double is a closed form of exact longs. Windows are
    * keyed per group over the date axis — day-domain-bounded, not
    * row-bounded.
    */
  def seasonalDecompose(daily: DataFrame, groupCol: String, dateCol: String,
                        v: Column): DataFrame = {
    val t = daily.select(col(groupCol).as("g"), col(dateCol).as("d"), v.cast("long").as("x"))
    val w = Window.partitionBy("g").orderBy("d").rowsBetween(-3, 3)
    val windowed = t
      .withColumn("s7", sum("x").over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("detr7", when(col("n7") === 7, col("x") * 7 - col("s7")))
    val seasonal = windowed.filter(col("detr7").isNotNull)
      .groupBy(col("g"), dayofweek(col("d")).as("dow"))
      .agg(sum("detr7").as("sd"), count(lit(1)).as("nd"))
      .withColumn("seas_raw", col("sd").cast("double") / (col("nd") * 7).cast("double"))
    val seas = seasonal.select(col("g").as("sg"), col("dow"), col("seas_raw"))
    windowed
      .join(seas,
        windowed("g") === col("sg") && dayofweek(windowed("d")) === col("dow"), "left")
      .select(windowed("g").as(groupCol), col("d").as(dateCol), col("x").as("value"),
        when(col("n7") === 7, round(col("s7").cast("double") / 7.0, 4)).as("trend"),
        round(col("seas_raw"), 4).as("seasonal"),
        when(col("n7") === 7,
          round(col("x").cast("double") - col("s7").cast("double") / 7.0 -
            col("seas_raw"), 4)).as("residual"))
  }

  def theilSenSlope(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("g"),
      col(xCol).cast("double").as("xa"), col(yCol).cast("double").as("ya"))
    val b = df.select(col(groupCol).as("g"),
      col(xCol).cast("double").as("xb"), col(yCol).cast("double").as("yb"))
    a.join(b, Seq("g"))
      .filter(col("xa") < col("xb"))
      .select(col("g"), ((col("yb") - col("ya")) / (col("xb") - col("xa"))).as("slope"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("slope_med"))
  }

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

  /** Apply a CDC changelog to a materialized view: latest operation
    * per key wins (ordered by `orderCols`), and a key whose latest
    * operation is a delete vanishes from the result. The Debezium /
    * Kafka-compaction contract as one keep-newest window — no
    * iterative merge, no driver loop; at 100 TB the only shuffle is
    * the key partition (and with the target bucketed by key, even that
    * co-locates).
    */
  def cdcApply(log: DataFrame, keyCol: String, orderCols: Seq[Column],
               isDelete: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.desc): _*)
    val all = Window.partitionBy(col(keyCol))
    log.withColumn("__del", isDelete)
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(all))
      .filter(col("__rn") === 1 && !col("__del"))
      .drop("__rn", "__del")
  }

  /** Multi-touch conversion attribution: for every conversion event,
    * credit the user's touch events inside the lookback window —
    * last-touch gives the latest touch a full credit; linear splits
    * one credit evenly. The linear share is kept engine-exact as
    * integer parts-per-million (1e6 div n_touches), sidestepping
    * float-sum ordering entirely.
    *
    * Shape: conversions × touches join on user within the time range —
    * per-user event counts are bounded (sessions, not corpus), so the
    * range join stays linear in conversions; per-conversion sizes and
    * last-touch election are window passes over the joined pairs.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, convType: String, touchTypes: Seq[String],
                  lookbackMs: Long): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(tsCol).as("cts"),
        col("event_id").as("conv_id"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).as("tts"),
        col("event_id").as("touch_id"), col(typeCol).as("channel"))
    val pairs = conv.join(touch, Seq("u"))
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL ${lookbackMs / 1000} SECOND"))
    val perConv = Window.partitionBy(col("conv_id"))
    val scored = pairs
      .withColumn("n_touches", count(lit(1)).over(perConv))
      .withColumn("rn", row_number().over(
        perConv.orderBy(col("tts").desc, col("touch_id").desc)))
    scored.groupBy("channel").agg(
      count(lit(1)).as("n_touches"),
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("last_touch_convs"),
      sum(expr("1000000 div n_touches")).as("linear_credit_ppm"))
  }

  /** Rolling z-score anomaly gate: each point scored against the mean
    * and stddev of its own PRIOR `n` points (current row excluded —
    * leakage-free, the online-monitoring form). Moments stay exact:
    * the window carries integer Σx and Σx², doubles enter only in the
    * final z. Emits only the flagged rows. One keyed window pass —
    * partitions by the series key, never global.
    */
  def rollingAnomaly(events: DataFrame, keyCol: String, orderCols: Seq[Column],
                     x: Column, n: Int, zThresh: Double): DataFrame = {
    val projected = events.select(col(keyCol), x.cast("long").as("x"),
      orderCols.head.as("__o1"), orderCols.tail.headOption.getOrElse(lit(0)).as("__o2"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__o1"), col("__o2"))
      .rowsBetween(-n, -1)
    val t = projected
      .withColumn("c", count(lit(1)).over(w))
      .withColumn("sl", sum("x").over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
    val cD = col("c").cast("double")
    val mean = col("sl").cast("double") / cD
    val variance = (col("sxx").cast("double") - col("sl").cast("double") * col("sl").cast("double") / cD) / cD
    // variance == 0 (constant history) gives an infinite/NaN z — not a
    // scoreable point; excluded on both engines identically
    t.filter(col("c") === n)
      .withColumn("variance", variance)
      .filter(col("variance") > 0)
      .withColumn("z", (col("x").cast("double") - mean) / sqrt(col("variance")))
      .filter(abs(col("z")) > zThresh)
      .select(col(keyCol), col("__o1"), col("__o2"), col("x"),
        round(mean, 4).as("roll_mean"), round(col("z"), 4).as("z_score"))
  }

  /** Seasonal-naive forecast backtest: predict each (group, day)'s
    * total as the expanding mean of all PRIOR days with the same
    * day-of-week, score by MAE over the forecastable days. The
    * expanding mean is an exact integer ratio per row; only the final
    * MAE sums doubles (rounded 2 dp — q_winsorized's family). Windows
    * key on (group, dow): the scan is bounded by the period domain.
    */
  def seasonalBacktest(events: DataFrame, groupCol: String, tsCol: String,
                       x: Column): DataFrame = {
    val daily = events
      .select(col(groupCol).as("g"), to_date(col(tsCol)).as("day"), x.cast("long").as("x"))
      .groupBy("g", "day").agg(sum("x").as("x"))
      .withColumn("dow", dayofweek(col("day")))
    val wPrior = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "dow").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("cPrior", count(lit(1)).over(wPrior))
      .withColumn("slPrior", sum("x").over(wPrior))
      .filter(col("cPrior") > 0)
      .withColumn("resid",
        abs(col("x").cast("double") - col("slPrior").cast("double") / col("cPrior").cast("double")))
      .groupBy("g").agg(count(lit(1)).as("n_days"),
        round(avg(col("resid")), 2).as("mae"),
        round(avg(col("x").cast("double")), 2).as("mean_daily"))
      .select(col("g").as(groupCol), col("n_days"), col("mae"), col("mean_daily"))
  }

  /** 2-D skyline (Pareto frontier) per group via ONE window pass: a
    * row survives iff no other row strictly dominates it on both
    * axes. Sorted by x descending, that reduces to "y exceeds the
    * running max of y over all strictly-better-x rows" — the classic
    * O(n log n) sweep (Börzsönyi et al. 2001 §BNL vs sort-based),
    * instead of the naive quadratic self-anti-join. x ties share a
    * frame (RANGE window) so equal-x rows can't eliminate each other
    * on x alone. Windows key on the group.
    */
  def skyline(df: DataFrame, groupCol: String, x: Column, y: Column,
              idCol: String): DataFrame = {
    val t = df.select(col(groupCol).as("g"), x.cast("long").as("x"),
      y.cast("long").as("y"), col(idCol).as("id"))
    // collapse to the DISTINCT x domain first: per (g, x) only the
    // max-y row can survive (an equal-x higher-y row dominates), and
    // the sweep window then runs tie-free over x values — a ROWS
    // frame, no RANGE-offset portability concerns
    val perX = t.groupBy("g", "x").agg(max("y").as("ymax_x"))
    val w = Window.partitionBy("g").orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX.withColumn("ymax_better", max("ymax_x").over(w))
      .filter(col("ymax_better").isNull || col("ymax_x") > col("ymax_better"))
      .select(col("g"), col("x"), col("ymax_x"))
    // join back: survivors are the max-y rows at frontier x values
    // (exact y duplicates tie — neither dominates — so both survive)
    t.join(frontier, Seq("g", "x"))
      .filter(col("y") === col("ymax_x"))
      .select(col("g").as(groupCol), col("x"), col("y"), col("id"))
  }

  /** Week-over-week change report: weekly totals per group with the
    * previous week's total and the percent change — the everyday BI
    * trend readout. Weeks are epoch-day/7 buckets (integer, engine-
    * portable — no ISO-week calendar semantics in the key).
    */
  def weekOverWeek(events: DataFrame, groupCol: String, tsCol: String,
                   x: Column): DataFrame = {
    val weekly = events
      .select(col(groupCol).as("g"),
        (unix_millis(col(tsCol)) / lit(604800000L)).cast("long").as("week"),
        x.cast("long").as("x"))
      .groupBy("g", "week").agg(sum("x").as("total"))
    val w = Window.partitionBy("g").orderBy("week")
    weekly.withColumn("prev_total", lag("total", 1).over(w))
      .select(col("g").as(groupCol), col("week"), col("total"), col("prev_total"),
        round((col("total") - col("prev_total")).cast("double") /
          col("prev_total").cast("double") * 100, 4).as("pct_change"))
  }

  /** Daily uniques ledger: per day the active-user count, the
    * first-seen (new) count, and the running cumulative distinct —
    * computed WITHOUT a distinct-accumulating state: each user
    * contributes once at their min(day), and the cumulative is a sum
    * over the bounded day domain. The unpartitioned window runs over
    * distinct days only.
    */
  /** Peak-concurrency sweep line over an interval table: +1 at each
    * start, −1 just after each end (closed intervals), one GLOBAL
    * running sum over the merged delta stream, then a per-day rollup
    * of (peak concurrency, first ms attaining it, interval starts).
    * The classic "max simultaneous sessions" operator — O(n log n)
    * where the naive interval×interval overlap join is quadratic.
    *
    * Exactness: deltas, the running sum, and the per-day argmax are
    * all integers; ties at one timestamp order −1 before +1 (ORDER BY
    * ms, delta) so both engines walk the identical sequence — and rows
    * tied on the FULL (ms, delta) key are interchangeable (identical
    * deltas produce the same prefix-sum multiset under any
    * permutation), so the global order is effectively total. Scale
    * shape: the delta stream is 2 rows/interval and the running sum
    * comes from [[GlobalRank]]'s range-partitioned running-sum pass —
    * the GLOBAL frame is the operator's semantics (concurrency across
    * everything) but no single task ever sorts the whole stream.
    */
  def peakConcurrency(intervals: DataFrame, startMs: Column, endMs: Column): DataFrame = {
    val deltas = intervals.select(startMs.as("ms"), lit(1L).as("delta"))
      .unionByName(intervals.select((endMs + 1).as("ms"), lit(-1L).as("delta")))
    val run = GlobalRank.rowNumbers(deltas, Nil, Seq(col("ms"), col("delta")), "__rn",
      running = Seq(("delta", "conc"))).df
      .select(col("ms"), col("delta"), col("conc"))
    // epoch-day bucket (ms // 86400000) rather than a calendar date:
    // timezone-free, so the rollup is engine- and session-TZ-portable
    val withDay = run.withColumn("day", floor(col("ms") / lit(86400000L)).cast("long"))
      .withColumn("dmax", max(col("conc")).over(Window.partitionBy("day")))
    withDay.groupBy("day").agg(
      max(col("conc")).as("peak_concurrent"),
      min(when(col("conc") === col("dmax"), col("ms"))).as("peak_ms"),
      sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"))
  }

  def cumulativeUniques(events: DataFrame, tsCol: String, idCol: String): DataFrame = {
    val t = events.select(to_date(col(tsCol)).as("day"), col(idCol).as("id"))
    val dau = t.distinct().groupBy("day").agg(count(lit(1)).as("dau"))
    val firstSeen = t.groupBy("id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(firstSeen, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_uniques", sum("n_new").over(w))
      .select(col("day"), col("dau"), col("n_new"), col("cum_uniques"))
  }

  /** Single-breakpoint binary segmentation (Scott & Knott 1974; the
    * first step of Killick et al.'s PELT family): per series, the
    * split day minimizing SSE_left + SSE_right — FINDS the structural
    * break that [[graft.operators.Stats.chowTest]] can only TEST at a
    * fixed date. Prefix sums over the day-grain series (partitioned,
    * calendar-bounded) make every candidate's two SSEs closed forms
    * of exact integers (squares in DECIMAL(38,0)); the argmin is an
    * equality join on the engine-identical double, ties to the
    * earliest day. Edge splits leaving fewer than 2 points per side
    * are excluded.
    */
  def binaryBreakpoint(df: DataFrame, groupCol: String, dayCol: Column,
                       v: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), dayCol.as("day"), v.cast("long").as("y"))
    val w = Window.partitionBy("g").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = base
      .withColumn("nl", count(lit(1)).over(w))
      .withColumn("syl", sum("y").over(w))
      .withColumn("syyl",
        sum(col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).over(w))
    val tot = base.groupBy("g").agg(count(lit(1)).as("n"), sum("y").as("sy"),
      sum(col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("syy"))
    // The >= 2 filter precedes these projections, but ANSI Spark can
    // still evaluate a fused projection speculatively inside the same
    // codegen stage — guard every divisor explicitly (the guarded
    // branch is unreachable for surviving rows, so results are
    // unchanged; hillTail lesson, stricter form).
    def sse(syy: Column, sy: Column, n: Column): Column =
      when(n > 0,
        syy.cast("double") - sy.cast("double") * sy.cast("double") / n.cast("double"))
    val cands = pre.join(broadcast(tot), "g")
      .filter(col("nl") >= 2 && col("n") - col("nl") >= 2)
      .select(col("g"), col("day"), col("nl"), col("n"),
        (sse(col("syyl"), col("syl"), col("nl")) +
          sse(col("syy") - col("syyl"), col("sy") - col("syl"),
            col("n") - col("nl"))).as("wsse"),
        sse(col("syy"), col("sy"), col("n")).as("sse_total"))
    val best = cands.groupBy("g").agg(min("wsse").as("best_w"))
    cands.join(broadcast(best), "g")
      .filter(col("wsse") === col("best_w"))
      .groupBy("g")
      .agg(min("day").as("break_day"), max("n").as("n"),
        max("wsse").as("wsse"), max("sse_total").as("sse_total"))
      .join(cands.select(col("g"), col("day").as("break_day"), col("nl")),
        Seq("g", "break_day"))
      .select(col("g").as(groupCol), col("break_day"), col("nl").as("n_left"),
        (col("n") - col("nl")).as("n_right"),
        round(col("sse_total"), 4).as("sse_total"),
        round(col("wsse"), 4).as("sse_split"),
        round(col("sse_total") - col("wsse"), 4).as("reduction"))
  }
}
