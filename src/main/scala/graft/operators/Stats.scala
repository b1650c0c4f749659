package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical statistics over Spark aggregates: regression, correlation,
  * rank tests, experiment scoring, change-point and tail diagnostics.
  *
  * The reference pipeline stops at counts and maxima (its reports are
  * row-at-a-time Python — e.g. publish/publication.py's per-pub loops);
  * a corpus-scale engine needs the next layer up: "did this harvest
  * shift the distribution", "is this source heavy-tailed", "is metric X
  * actually correlated with Y". Everything here is one or two shuffles
  * on group keys — no driver-side math beyond the closed forms.
  *
  * Engine-portability discipline (see SURVEY.md §5): every statistic is
  * computed from EXACT sums — longs where they fit, DECIMAL(38,0)
  * where squares could overflow (the DuckDB oracle mirrors them as
  * HUGEINT) — and only the final closed-form division happens in
  * doubles, rounded for output. Two engines computing the same closed
  * form from identical integers produce identical doubles.
  */
object Stats {

  /** Exact decimal sum of a long-valued column product: sum(a*b) with
    * 128-bit-wide accumulation so squares of ~1e13-scale values cannot
    * overflow at any benchmark sf.
    */
  private def dsum(a: Column, b: Column): Column =
    sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).cast("double")

  /** Per-group ordinary least squares y = slope*x + intercept with r².
    *
    * Closed form from the five exact sums (n, Σx, Σy, Σxx, Σxy, Σyy);
    * x and y must be integer-valued (cast upstream — e.g. price in
    * cents). Map-side partial aggregation does all the work; one row
    * per group crosses the shuffle.
    */
  def olsFit(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        dsum(x, x).as("sxx"),
        dsum(x, y).as("sxy"),
        dsum(y, y).as("syy"))
    val n = col("n").cast("double")
    val covn = col("sxy") * n - col("sx") * col("sy")       // n²·cov
    val varxn = col("sxx") * n - col("sx") * col("sx")      // n²·var(x)
    val varyn = col("syy") * n - col("sy") * col("sy")      // n²·var(y)
    agg.select(
      col(groupCol), col("n"),
      round(covn / varxn, 6).as("slope"),
      round((col("sy") - (covn / varxn) * col("sx")) / n, 6).as("intercept"),
      round((covn * covn) / (varxn * varyn), 6).as("r2"))
  }

  /** Per-group Pearson correlation from the same exact-sum machinery. */
  def pearson(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        dsum(x, x).as("sxx"),
        dsum(x, y).as("sxy"),
        dsum(y, y).as("syy"))
    val n = col("n").cast("double")
    val num = col("sxy") * n - col("sx") * col("sy")
    val den = sqrt(col("sxx") * n - col("sx") * col("sx")) *
      sqrt(col("syy") * n - col("sy") * col("sy"))
    agg.select(col(groupCol), col("n"), round(num / den, 6).as("pearson_r"))
  }

  /** Per-group FIRST-ORDER PARTIAL correlation r_xy·z (Yule 1907):
    * the x–y association with the confounder z regressed out of both
    * sides, computed from the three pairwise Pearson coefficients via
    *
    *   r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²))
    *
    * All three coefficients come from ONE aggregation of the nine
    * exact sufficient sums (n, Σx, Σy, Σz, Σx², Σy², Σz², Σxy, Σxz,
    * Σyz) — decimal(38,0) cross-products, one row per group over the
    * shuffle, same contract as [[pearson]]. NULL when either partial
    * variance is zero (x or z, y or z perfectly collinear).
    */
  def partialCorrelation(df: DataFrame, groupCol: String,
                         x: Column, y: Column, z: Column): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(z).cast("double").as("sz"),
        dsum(x, x).as("sxx"), dsum(y, y).as("syy"), dsum(z, z).as("szz"),
        dsum(x, y).as("sxy"), dsum(x, z).as("sxz"), dsum(y, z).as("syz"))
    val n = col("n").cast("double")
    def r(spq: Column, sp: Column, sq: Column, spp: Column, sqq: Column): Column =
      (spq * n - sp * sq) /
        (sqrt(spp * n - sp * sp) * sqrt(sqq * n - sq * sq))
    val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    val den = sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    agg.select(col(groupCol), col("n"),
      round(rxy, 6).as("r_xy"),
      when(den > 0, round((rxy - rxz * ryz) / den, 6)).as("r_xy_given_z"))
  }

  /** Wald's sequential probability ratio test as a daily ledger
    * (Wald 1945): per (variant, day) the CUMULATIVE conversion counts
    * and the log-likelihood ratio for H₁: p = p1 vs H₀: p = p0,
    *
    *   LLR_t = K_t·ln(p1/p0) + (N_t−K_t)·ln((1−p1)/(1−p0)),
    *
    * with the Wald decision bounds ln((1−β)/α) / ln(β/(1−α)) — the
    * "peek every day without inflating α" A/B companion to the fixed-
    * horizon q_ab_test.
    *
    * Engine-exact WITHOUT rounding: the four log constants are
    * evaluated ONCE on the driver and inlined as the same literal
    * double into both plans (callers embed `"%.17g".format` of these
    * into the oracle SQL), so LLR is two double·integer products and
    * one add of identical IEEE inputs. Cumulative counts are a window
    * at (variant, DAY) grain — bounded by the calendar, never rows.
    */
  def sprtLedger(df: DataFrame, variantCol: String, day: Column,
                 isConv: Column, p0: Double, p1: Double,
                 alpha: Double, beta: Double): DataFrame = {
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1 - p1) / (1 - p0))
    val upper = math.log((1 - beta) / alpha)
    val lower = math.log(beta / (1 - alpha))
    val daily = df.groupBy(col(variantCol).as("variant"), day.as("day"))
      .agg(count(lit(1)).as("n"), sum(isConv.cast("long")).as("k"))
    val w = Window.partitionBy("variant").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_k", sum("k").over(w))
      .withColumn("llr", lit(c1) * col("cum_k").cast("double") +
        lit(c2) * (col("cum_n") - col("cum_k")).cast("double"))
      .withColumn("decision",
        when(col("llr") >= lit(upper), "reject_h0")
          .when(col("llr") <= lit(lower), "accept_h0")
          .otherwise("continue"))
      .select(col("variant"), col("day"), col("cum_n"), col("cum_k"),
        col("llr"), col("decision"))
  }

  /** SPRT constants for oracle-SQL mirroring — the exact doubles
    * [[sprtLedger]] inlines, printed by the caller at full precision.
    */
  def sprtConstants(p0: Double, p1: Double, alpha: Double, beta: Double):
      (Double, Double, Double, Double) =
    (math.log(p1 / p0), math.log((1 - p1) / (1 - p0)),
      math.log((1 - beta) / alpha), math.log(beta / (1 - alpha)))

  /** Wald–Wolfowitz runs test per key (Wald & Wolfowitz 1940): is the
    * sequence of above/below-average values random, or does it
    * cluster (trend/regime) or alternate (over-dispersion)?
    *
    * Dichotomization is against the GLOBAL mean as an exact integer
    * cross-product test (v·N > Σv — no float threshold), runs count
    * from one lag over the per-key (scaling-cardinality) order, and
    * z = (R − μ)/σ from the closed form μ = 2n₁n₂/n + 1,
    * σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) — every input an exact long, the
    * float expression mirrored operation-for-operation in the oracle
    * so the doubles are bit-identical. Keys with a one-sided or
    * too-short sequence emit NULL z.
    */
  def runsTest(df: DataFrame, keyCol: String, orderCols: Seq[Column],
               x: Column, minN: Long): DataFrame = {
    val t = df.select(col(keyCol).as("k"), x.cast("long").as("v"),
      orderCols.head.as("__o1"),
      orderCols.tail.headOption.getOrElse(lit(0)).as("__o2"))
    val tot = t.agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
    val signed = t.crossJoin(broadcast(tot))
      .withColumn("above", col("v") * col("nv") > col("sv"))
    val w = Window.partitionBy("k").orderBy(col("__o1"), col("__o2"))
    val runs = signed
      .withColumn("prev", lag(col("above"), 1).over(w))
      .groupBy(col("k").as(keyCol))
      .agg(
        sum(when(col("above"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("above"), 1L).otherwise(0L)).as("n2"),
        (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L))).as("runs"))
    val n = col("n1") + col("n2")
    val num = lit(2L) * col("n1") * col("n2")
    val mu = num.cast("double") / n.cast("double") + lit(1.0)
    val variance = num.cast("double") * (num - n).cast("double") /
      (n * n * (n - 1)).cast("double")
    runs.filter(n >= minN)
      .withColumn("z_runs",
        when(col("n1") > 0 && col("n2") > 0 && variance > 0,
          (col("runs").cast("double") - mu) / sqrt(variance)))
  }

  /** Per-group Spearman rank correlation (Spearman 1904).
    *
    * Tie-averaged fractional ranks kept EXACT by working in half-rank
    * units: for a tie block of c equal values preceded by cumPrev rows,
    * 2·avgrank = 2·cumPrev + c + 1 is always an integer, so the
    * downstream Pearson runs on integers and the result is
    * engine-exact. Scaling both rank vectors by 2 leaves ρ unchanged.
    *
    * Scale posture: ranks are NEVER assigned at row grain. The rows
    * collapse to the (group, x, y) joint histogram first (map-side
    * combinable), the half-ranks come from cumulative counts over the
    * per-group MARGINAL value histograms — windows bounded by value
    * cardinality, not row count (the mannWhitneyU / kruskalWallis /
    * aucRoc discipline) — and the Pearson sums are weighted by the
    * joint-cell count, exactly equal to the row-grain sums. A
    * row-grain rank() here measured 4.2× at 10× data; this form moves
    * one histogram row per distinct (x,y) cell.
    */
  def spearman(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val pairs = df.groupBy(col(groupCol).as("g"), x.as("vx"), y.as("vy"))
      .agg(count(lit(1)).as("c2"))
    // marginal half-rank map for one axis: (g, v) -> 2·avgrank
    def rankMap(vcol: String, as: String): DataFrame = {
      val h = pairs.groupBy(col("g"), col(vcol).as("v")).agg(sum("c2").as("c"))
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
      h.select(col("g"), col("v").as(vcol),
        (lit(2L) * (sum(col("c")).over(w) - col("c")) + col("c") + 1L).as(as))
    }
    val joined = pairs
      .join(rankMap("vx", "rx"), Seq("g", "vx"))
      .join(rankMap("vy", "ry"), Seq("g", "vy"))
    // weighted Pearson over the joint histogram — exact integer sums
    // identical to the row-grain formulation (decimal accumulation so
    // c2·rank² cannot overflow at any sf)
    def d(c: Column) = c.cast("decimal(19,0)")
    val agg = joined.groupBy(col("g").as(groupCol))
      .agg(
        sum("c2").as("n"),
        sum(d(col("c2")) * d(col("rx"))).cast("double").as("sx"),
        sum(d(col("c2")) * d(col("ry"))).cast("double").as("sy"),
        sum(d(col("c2")) * d(col("rx")) * d(col("rx"))).cast("double").as("sxx"),
        sum(d(col("c2")) * d(col("rx")) * d(col("ry"))).cast("double").as("sxy"),
        sum(d(col("c2")) * d(col("ry")) * d(col("ry"))).cast("double").as("syy"))
    val n = col("n").cast("double")
    val num = col("sxy") * n - col("sx") * col("sy")
    val den = sqrt(col("sxx") * n - col("sx") * col("sx")) *
      sqrt(col("syy") * n - col("sy") * col("sy"))
    agg.select(col(groupCol), col("n"), round(num / den, 6).as("spearman_rho"))
  }

  /** Per-group Kendall rank correlation τ-b (Kendall 1938; tie-aware
    * b-variant) — the pairwise-concordance alternative to [[spearman]]
    * whose value is a direct probability statement (P(concordant) −
    * P(discordant)) and whose arithmetic is integers end-to-end:
    * nc/nd are Σ c_i·c_j over JOINT-histogram cell pairs with strictly
    * increasing x (equal-x pairs contribute to neither), the tie terms
    * come from the marginal histograms, and
    * τ-b = (nc−nd)/(√(n0−n1)·√(n0−n2)) divides once at the end
    * (two correctly-rounded sqrts, never the 128-bit product).
    *
    * Scale posture: rows collapse to the (g, x, y) joint histogram
    * first (map-side combinable); the pair enumeration is a self-join
    * of that histogram keyed on the group — bounded by |X|·|Y| cells
    * per group, NOT by rows, so it is only for bounded-cardinality
    * pairs (quantity × discount points), never raw cents. Nothing
    * row-grain ever pairs or sorts.
    */
  def kendallTauB(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame =
    concordanceStats(df, groupCol, x, y)
      .select(col("g").as(groupCol), col("n"), col("nc"), col("nd"),
        // τ undefined when an axis is a single tie block (n0 = n1):
        // NULL, not DIVIDE_BY_ZERO — ANSI throws even on double/0.0
        // (the hillTail sf3 lesson).
        when(col("n0") > col("tx") && col("n0") > col("ty"),
          round((col("nc") - col("nd")).cast("double") /
            (sqrt((col("n0") - col("tx")).cast("double")) *
              sqrt((col("n0") - col("ty")).cast("double"))), 6)).as("tau_b"))

  /** Somers' D (Somers 1962): the ASYMMETRIC concordance measure —
    * Kendall's numerator normalized by only the pairs untied on the
    * FIRST axis x: D = (nc − nd)/(n0 − T_x). With x a binary OUTCOME
    * and y the score, the denominator is exactly the pos×neg pair
    * count, so D equals the scoring-industry Gini (= 2·AUC − 1) —
    * proven against [[aucRoc]] in StatsSpec. Same joint-histogram-
    * grain machinery as [[kendallTauB]]: integers end-to-end,
    * cardinality-bounded, one division at the end.
    */
  def somersD(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame =
    concordanceStats(df, groupCol, x, y)
      .select(col("g").as(groupCol), col("n"), col("nc"), col("nd"),
        when(col("n0") > col("tx"),
          round((col("nc") - col("nd")).cast("double") /
            (col("n0") - col("tx")).cast("double"), 6)).as("somers_d"))

  /** Shared concordance core of τ-b / Somers' D: the (g, x, y) joint
    * histogram, the strictly-increasing-x cell-pair fold into nc/nd,
    * the marginal tie terms, and the pair total — all exact integers.
    * Returns one row per group: (g, n, n0, tx, ty, nc, nd).
    */
  private def concordanceStats(df: DataFrame, groupCol: String,
                               x: Column, y: Column): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("g"), x.as("vx"), y.as("vy"))
      .agg(count(lit(1)).as("c")).localCheckpoint(false)
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.g") === col("b.g") && col("a.vx") < col("b.vx"))
      .select(col("a.g").as("g"),
        (col("a.c") * col("b.c")).as("w"),
        when(col("a.vy") < col("b.vy"), 1).when(col("a.vy") > col("b.vy"), -1)
          .otherwise(0).as("s"))
    val conc = pairs.groupBy("g").agg(
      sum(when(col("s") === 1, col("w")).otherwise(0L)).as("nc"),
      sum(when(col("s") === -1, col("w")).otherwise(0L)).as("nd"))
    def tieTerm(vcol: String, as: String): DataFrame =
      cells.groupBy(col("g"), col(vcol)).agg(sum("c").as("t"))
        .groupBy("g").agg(sum(expr("t * (t - 1) div 2")).as(as))
    val tot = cells.groupBy("g").agg(sum("c").as("n"))
      .withColumn("n0", expr("n * (n - 1) div 2"))
    tot.join(tieTerm("vx", "tx"), "g").join(tieTerm("vy", "ty"), "g")
      .join(conc, "g")
  }

  /** Mann-Whitney U rank-sum test (Mann & Whitney 1947) between two
    * value samples identified by `isTreatment`. Combined tie-averaged
    * ranks in exact half-units; U and the normal-approximation z are
    * closed forms of the exact rank sum.
    *
    * Scale posture: a naive global rank() sorts the full table on one
    * partition. Instead ranks are derived at DISTINCT-VALUE grain —
    * group by value first (map-side combinable), then one ordered pass
    * over the value-histogram, which is bounded by cardinality, not
    * row count. For a tie block of c values starting after cumPrev
    * rows, 2·avgrank = 2·cumPrev + c + 1 exactly.
    */
  def mannWhitneyU(df: DataFrame, isTreatment: Column, v: Column): DataFrame = {
    val hist = df.select(v.as("v"), isTreatment.as("grp"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"),
        sum(when(col("grp"), 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("v"))
    val ranked = hist.select(
      col("c1"), col("c"),
      (sum(col("c")).over(w) - col("c")).as("cumPrev"))
    val agg = ranked.agg(
      sum(col("c1") * (col("cumPrev") * 2 + col("c") + 1)).as("r2sum1"),
      sum("c1").as("n1"),
      sum(col("c") - col("c1")).as("n2"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    // R1 in half-units → U1 = R1 - n1(n1+1)/2, still exact in halves.
    val u1 = (col("r2sum1").cast("double") - n1 * (n1 + 1)) / 2.0
    val mu = n1 * n2 / 2.0
    val sigma = sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    agg.select(
      col("n1"), col("n2"),
      round(u1, 1).as("u_stat"),
      round((u1 - mu) / sigma, 4).as("z_score"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013): adjust
    * the experiment metric with a pre-experiment covariate,
    * Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), and report the
    * adjusted treatment effect plus the variance-reduction factor
    * 1 − ρ²(X,Y) — the standard lever for shrinking A/B confidence
    * intervals without more traffic. One aggregation: per-arm and
    * pooled exact sufficient statistics (longs + DECIMAL(38,0) for
    * the product sums, the welchT discipline), closed forms after.
    */
  def cuped(df: DataFrame, isA: Column, y: Column, x: Column): DataFrame = {
    def d38(c: Column) = c.cast("decimal(19,0)")
    val t = df.select(isA.as("a"), y.cast("long").as("y"), x.cast("long").as("x"))
    val agg = t.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(d38(col("x")) * d38(col("y"))).cast("double").as("sxy"),
      sum(d38(col("x")) * d38(col("x"))).cast("double").as("sxx"),
      sum(d38(col("y")) * d38(col("y"))).cast("double").as("syy"),
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("a"), col("y")).otherwise(0L)).as("sya"),
      sum(when(col("a"), col("x")).otherwise(0L)).as("sxa"))
    val n = col("n").cast("double")
    val mx = col("sx").cast("double") / n
    val my = col("sy").cast("double") / n
    val covXY = col("sxy") / n - mx * my
    val varX = col("sxx") / n - mx * mx
    val varY = col("syy") / n - my * my
    val theta = covXY / varX
    val na = col("na").cast("double")
    val nb = n - na
    val rawEffect = col("sya").cast("double") / na -
      (col("sy") - col("sya")).cast("double") / nb
    val xGap = col("sxa").cast("double") / na -
      (col("sx") - col("sxa")).cast("double") / nb
    agg.select(
      col("na").as("n_treat"), (col("n") - col("na")).as("n_control"),
      round(theta, 4).as("theta"),
      round(rawEffect, 4).as("raw_effect"),
      round(rawEffect - theta * xGap, 4).as("cuped_effect"),
      round(lit(1.0) - covXY * covXY / (varX * varY), 4).as("var_ratio"))
  }

  /** Leave-one-out target encoding (mean encoding with the row's own
    * label excluded — the self-leakage guard; Micci-Barreca 2001's
    * empirical-Bayes family, LOO variant): enc_i = (S_cat − y_i) /
    * (n_cat − 1), NULL for singleton categories (no information
    * without leaking). Exact: one (category) aggregate broadcast
    * back, the encoding is integer arithmetic per row until the final
    * division.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, y: Column): DataFrame = {
    val t = df.withColumn("__y", y.cast("long"))
    val stats = t.groupBy(col(catCol)).agg(count(lit(1)).as("__n"), sum("__y").as("__s"))
    // RAW double, no round(): the operands are exact longs, so the one
    // IEEE division is bit-identical across engines — round(x, 4) sat
    // exactly on a half-way point at sf1 (25053571.84585: Spark's
    // shortest-decimal HALF_UP → .8459, DuckDB's binary round → .8458;
    // the TUNING.md round-8 portability rule, caught by the round-11
    // sf1 re-proof).
    t.join(broadcast(stats), catCol)
      .withColumn("loo_enc",
        when(col("__n") > 1,
          (col("__s") - col("__y")).cast("double") / (col("__n") - 1).cast("double")))
      .drop("__y", "__n", "__s")
  }

  /** McNemar's test (McNemar 1947) for two classifiers evaluated on
    * the SAME items — the paired readout model comparisons need
    * (accuracy deltas on shared eval sets are correlated; the
    * discordant pairs carry all the signal): χ² = (b−c)²/(b+c) over
    * the counts where exactly one classifier is right. One
    * aggregation, four exact longs, closed form; NULL χ² when no
    * discordant pairs exist (the test is undefined, not zero).
    */
  def mcnemar(df: DataFrame, aCorrect: Column, bCorrect: Column): DataFrame = {
    val agg = df.select(aCorrect.as("a"), bCorrect.as("b")).agg(
      sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n_both"),
      sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n_a_only"),
      sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n_b_only"),
      sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n_neither"))
    val b = col("n_a_only").cast("double")
    val c = col("n_b_only").cast("double")
    agg.select(col("n_both"), col("n_a_only"), col("n_b_only"), col("n_neither"),
      when(col("n_a_only") + col("n_b_only") > 0,
        round((b - c) * (b - c) / (b + c), 4)).as("chi2"))
  }

  /** Kruskal-Wallis H test (Kruskal & Wallis 1952): the k-group
    * rank-sum test — ANOVA's nonparametric sibling on the same
    * half-rank histogram machinery as [[mannWhitneyU]]: ranks derive
    * at DISTINCT-VALUE grain (the window is value-domain-bounded, not
    * row-bounded), per-group rank sums are exact integers in half
    * units, and the tie-corrected H = [12/(N(N+1)) Σ R_g²/n_g −
    * 3(N+1)] / [1 − Σ(t³−t)/(N³−N)] is one closed form over those
    * longs. Group rank sums fold group-ascending for the one
    * irrational accumulation.
    */
  def kruskalWallis(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), v.as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("cgv"))
    val byVal = hist.groupBy("v").agg(sum("cgv").as("t"))
    val w = Window.orderBy(col("v"))
    val rankedVals = byVal.select(col("v"), col("t"),
      (sum(col("t")).over(w) - col("t")).as("cumPrev"))
    // 2·avgrank(v) = 2·cumPrev + t + 1 (integer); R2_g = Σ c_gv·(2·avgrank)
    val perGroup = hist.join(rankedVals, "v")
      .groupBy("g").agg(
        sum("cgv").as("ng"),
        sum(col("cgv") * (col("cumPrev") * 2 + col("t") + 1)).as("r2"))
    val rTerm = (col("r2").cast("double") * col("r2").cast("double") /
      (lit(4.0) * col("ng").cast("double"))).as("t")
    val ties = byVal.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tieSum"))
    val tot = perGroup.agg(
      count(lit(1)).as("k"), sum("ng").as("n"),
      aggregate(sort_array(collect_list(struct(col("g"), rTerm))),
        lit(0.0), (a, x) => a + x.getField("t")).as("rss"))
      .crossJoin(broadcast(ties))
    val n = col("n").cast("double")
    val hRaw = lit(12.0) / (n * (n + 1.0)) * col("rss") - lit(3.0) * (n + 1.0)
    val corr = lit(1.0) - col("tieSum").cast("double") / (n * n * n - n)
    tot.select(col("k"), col("n"),
      round(hRaw / corr, 4).as("h_stat"))
  }

  /** Cliff's delta (Cliff 1993): the ordinal effect size
    * P(x_A > x_B) − P(x_A < x_B) that should accompany every
    * Mann-Whitney p-value — significance without magnitude is the
    * classic A/B misread. Derived on the same half-rank histogram:
    * 2U₁ = r2sum₁ − 2·n₁(n₁+1)/2 is exact, so
    * δ = (2U₁ − n₁n₂)/(n₁n₂) is one division over exact longs (ties
    * get half-credit automatically through average ranks).
    */
  def cliffsDelta(df: DataFrame, isTreatment: Column, v: Column): DataFrame = {
    val hist = df.select(v.as("v"), isTreatment.as("grp"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"),
        sum(when(col("grp"), 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("v"))
    val ranked = hist.select(
      col("c1"), col("c"),
      (sum(col("c")).over(w) - col("c")).as("cumPrev"))
    val agg = ranked.agg(
      sum(col("c1") * (col("cumPrev") * 2 + col("c") + 1)).as("r2sum1"),
      sum("c1").as("n1"),
      sum(col("c") - col("c1")).as("n2"))
    // 2·U1 = r2sum1 − n1(n1+1) exactly (half-rank units)
    val twoU = col("r2sum1") - col("n1") * (col("n1") + 1)
    agg.select(col("n1"), col("n2"),
      round((twoU - col("n1") * col("n2")).cast("double") /
        (col("n1") * col("n2")).cast("double"), 4).as("cliffs_delta"))
  }

  /** ROC AUC of a score against a binary label via the rank-sum
    * identity AUC = U/(n⁺·n⁻) (Hanley & McNeil 1982) — ties get the
    * trapezoidal half-credit automatically through average ranks. The
    * numerator r2sum1 − n1(n1+1) is an exact integer (the
    * mannWhitneyU half-rank histogram), so the AUC is one exact
    * division; no sort of the raw rows — the window runs over the
    * DISTINCT score domain.
    */
  def aucRoc(df: DataFrame, isPos: Column, score: Column): DataFrame = {
    val hist = df.select(score.as("v"), isPos.as("grp"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"),
        sum(when(col("grp"), 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("v"))
    val ranked = hist.select(
      col("c1"), col("c"),
      (sum(col("c")).over(w) - col("c")).as("cumPrev"))
    ranked.agg(
      sum(col("c1") * (col("cumPrev") * 2 + col("c") + 1)).as("r2sum1"),
      sum("c1").as("n_pos"),
      sum(col("c") - col("c1")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round((col("r2sum1") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (col("n_pos") * col("n_neg") * 2).cast("double"), 6).as("auc"))
  }

  /** Decile lift/gains table: rank by score (descending, tiebroken),
    * ntile into k buckets, report per-bucket response rate plus
    * cumulative lift and gain vs the base rate — the classifier
    * targeting readout. Bucket/cumulative math is exact integer
    * counts; the k-row cumulative window is trivially bounded. The
    * global ranking comes from [[GlobalRank]]'s two-pass
    * range-partitioned row number — no unpartitioned ntile window, no
    * single-task full-table sort (that formulation measured 5.8× at
    * 10× data); the bucket is the SQL-standard ntile closed form over
    * (rank, driver-known total), bit-identical to the window ntile.
    */
  def liftTable(df: DataFrame, isResp: Column, score: Column, tie: Column,
                k: Int = 10): DataFrame = {
    val ranked = GlobalRank.rowNumbers(
      df.select(isResp.as("resp"), score.as("s"), tie.as("t")),
      Nil, Seq(col("s").desc, col("t")), "__rn")
    val bucketed = ranked.df
      .select(col("resp"), GlobalRank.ntileBucket("__rn", ranked.total, k).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"),
        sum(when(col("resp"), 1L).otherwise(0L)).as("resp"))
    val wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bucketed.agg(sum("n").as("tn"), sum("resp").as("tresp"))
    bucketed.crossJoin(broadcast(tot))
      .withColumn("cum_n", sum("n").over(wc))
      .withColumn("cum_resp", sum("resp").over(wc))
      .select(col("bucket"), col("n"), col("resp"),
        round(col("resp").cast("double") / col("n").cast("double"), 6).as("resp_rate"),
        round((col("cum_resp").cast("double") / col("cum_n").cast("double")) /
          (col("tresp").cast("double") / col("tn").cast("double")), 6).as("cum_lift"),
        round(col("cum_resp").cast("double") / col("tresp").cast("double"), 6).as("cum_gain"))
  }

  /** Cohen's kappa (Cohen 1960): chance-corrected agreement between
    * two labelings — the inter-annotator / classifier-vs-gold QA
    * metric for labeled training data. Computed as ONE exact integer
    * ratio: kappa = (po−pe)/(1−pe) = (n_agree·N − Σ_k rowN_k·colN_k)
    * / (N² − Σ_k rowN_k·colN_k), so the only rounding is at output.
    * One shuffle (the confusion cells); margins are class-bounded.
    */
  def cohensKappa(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val cells = df.select(actual.as("a"), predicted.as("p"))
      .groupBy("a", "p").agg(count(lit(1)).as("n"))
    val rm = cells.groupBy("a").agg(sum("n").as("na"))
    val cm = cells.groupBy("p").agg(sum("n").as("np"))
    val tot = cells.agg(sum("n").as("nt"))
    val agree = cells.filter(col("a") === col("p"))
      .agg(coalesce(sum("n"), lit(0L)).as("n_agree"))
    // pe numerator: classes present in only one margin contribute 0
    val peNum = rm.join(cm, col("a") === col("p"))
      .agg(coalesce(sum(col("na") * col("np")), lit(0L)).as("pe_num"))
    agree.crossJoin(broadcast(tot)).crossJoin(broadcast(peNum))
      .select(col("nt").as("n"), col("n_agree"),
        round(col("n_agree").cast("double") / col("nt").cast("double"), 6).as("po"),
        round(col("pe_num").cast("double") / (col("nt") * col("nt")).cast("double"), 6).as("pe"),
        round((col("n_agree") * col("nt") - col("pe_num")).cast("double") /
          (col("nt") * col("nt") - col("pe_num")).cast("double"), 6).as("kappa"))
  }

  /** Average precision (the area under the precision-recall curve in
    * its rank-sum form): AP = (1/n⁺) Σ_{positive ranks k} cumPos(k)/k
    * over the (score desc, tie) total order. Complements [[aucRoc]] on
    * skewed-prevalence labels where ROC flatters. The per-rank terms
    * are exact integer ratios; only their sum is a double (rounded at
    * 6 dp). The global ranking AND the cumulative-positives counter
    * both come from [[GlobalRank]]'s two-pass range-partitioned pass
    * (running-sum offsets ride the same per-partition subtotals as the
    * rank offsets) — no unpartitioned window, no single-task sort.
    */
  def averagePrecision(df: DataFrame, isPos: Column, score: Column,
                       tie: Column): DataFrame = {
    val base = df.select(isPos.as("pos"), score.as("s"), tie.as("t"))
      .withColumn("__p", when(col("pos"), 1L).otherwise(0L))
    val ranked = GlobalRank.rowNumbers(base, Nil, Seq(col("s").desc, col("t")), "k",
      running = Seq(("__p", "cum"))).df
    ranked.agg(
      count(lit(1)).as("n"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("pos"), col("cum").cast("double") / col("k").cast("double"))
        .otherwise(lit(0.0))).as("ap_num"))
      .select(col("n"), col("n_pos"),
        round(col("ap_num") / col("n_pos").cast("double"), 6).as("avg_precision"))
  }

  /** Per-variant two-proportion z-test against the pooled rest
    * (the standard A/B readout). `converted` is a boolean column.
    * All inputs to the closed form are exact counts.
    */
  def twoProportionZ(df: DataFrame, variantCol: String, converted: Column): DataFrame = {
    val per = df.groupBy(col(variantCol))
      .agg(count(lit(1)).as("n"), sum(when(converted, 1L).otherwise(0L)).as("conv"))
    val tot = per.agg(sum("n").as("tn"), sum("conv").as("tconv"))
    val n1 = col("n").cast("double")
    val c1 = col("conv").cast("double")
    val n2 = (col("tn") - col("n")).cast("double")
    val c2 = (col("tconv") - col("conv")).cast("double")
    val p1 = c1 / n1
    val p2 = c2 / n2
    val pp = (c1 + c2) / (n1 + n2)
    per.crossJoin(tot).select(
      col(variantCol), col("n"), col("conv"),
      round(p1, 6).as("p_variant"),
      round(p2, 6).as("p_rest"),
      round((p1 - p2) / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n1 + lit(1.0) / n2)), 4)
        .as("z_score"))
  }

  /** CUSUM change-point detection per series (Page 1954): the index
    * maximizing |cumulative deviation from the series mean|.
    *
    * Kept exact by scaling: with S = Σx and prefix_i = Σ_{j≤i} x_j,
    * the deviation n·prefix_i − i·S is an integer multiple (n·) of the
    * usual CUSUM statistic, so the argmax — THE change point — is
    * integer-exact; only the reported magnitude divides back to value
    * units. `x` must be a non-null integral column (cents-style).
    *
    * Scale shape: the natural `row_number()/sum() OVER (PARTITION BY
    * series)` formulation caps parallelism at the SERIES COUNT — five
    * event types means five tasks each sorting n/5 rows, whatever the
    * cluster size; at the 100 TB regime one task would sort a
    * billion-row series. Instead the per-series prefix sums are
    * BUCKETED: each row windows only within its (series, time-bucket)
    * cell, the per-cell subtotal table (G × buckets rows — tiny, and
    * data-independent in size) prefix-sums per series in bucket order,
    * and the cell offsets ride back as a broadcast join — the
    * distributed prefix-sum, declaratively, with every operator
    * codegen'd and parallelism = series × buckets, not series.
    * (A [[GlobalRank]] formulation was measured and rejected: its
    * Row-boxed two-pass RDD machinery cost ~5× the window plan at sf1
    * while this bucketed plan matches it and keeps the same scale
    * posture.) Bucket width `bucketSeconds` defaults to hourly.
    */
  def cusumChangePoint(df: DataFrame, groupCol: String, orderCol: Column,
                       x: Column, tieCol: Column,
                       bucketSeconds: Long = 3600L): DataFrame = {
    val base = df.select(col(groupCol), orderCol.as("ord"), tieCol.as("tie"), x.as("xv"))
      .withColumn("bkt", floor(unix_micros(col("ord")) / lit(bucketSeconds * 1000000L)))
    // local rank + inclusive running sum within the (series, bucket) cell
    val wCell = Window.partitionBy(col(groupCol), col("bkt"))
      .orderBy(col("ord"), col("tie"))
    val local = base.select(col(groupCol), col("bkt"), col("ord"),
      row_number().over(wCell).as("li"),
      sum(col("xv")).over(wCell).as("lprefix"))
    // per-cell subtotals, prefix-summed per series in bucket order
    // (EXCLUSIVE of the own bucket) — G × buckets rows, window over a
    // frame whose size does not grow with the data
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = base.groupBy(col(groupCol), col("bkt"))
      .agg(count(lit(1)).as("bc"), sum(col("xv")).as("bs"))
      .select(col(groupCol), col("bkt"),
        coalesce(sum(col("bc")).over(wOff), lit(0L)).as("offc"),
        coalesce(sum(col("bs")).over(wOff), lit(0L)).as("offs"))
    val ranked = local.join(broadcast(cells), Seq(groupCol, "bkt"))
      .select(col(groupCol), col("ord"),
        (col("offc") + col("li")).as("i"),
        (col("offs") + col("lprefix")).as("prefix"))
    val tot = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("xv")).as("s"))
    // same long arithmetic as the window formulation (and the oracle):
    // dev = prefix_i·n − i·S
    val dev = col("prefix") * col("n") - col("i") * col("s")
    // argmax via max_by keyed on the LONGS-ONLY struct (adev, −i):
    // unique per group (i is a row number), so no-tie deterministic;
    // a plain max(struct(… ord …)) instead falls off hash aggregation
    // into SortAggregate + a full pre-agg Sort (measured 7 s vs 1 s on
    // 1M rows at 32 threads).
    ranked.join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col("n"),
        abs(dev).as("adev"), (-col("i")).as("negi"), col("i"), col("ord"))
      .groupBy(col(groupCol))
      .agg(max_by(struct(col("adev"), col("i"), col("ord"), col("n")),
        struct(col("adev"), col("negi"))).as("m"))
      .select(
        col(groupCol), col("m.n").as("n"),
        col("m.i").cast("int").as("cp_index"),
        col("m.ord").as("cp_at"),
        round(col("m.adev").cast("double") / col("m.n").cast("double"), 4).as("cusum_stat"))
  }

  /** Per-series lag-k autocorrelation for k = 1..maxLag.
    *
    * Mean-centered in exact integers: d_i = n·x_i − S (so no division
    * before the final ratio), products accumulated in DECIMAL(38,0) —
    * d_i can reach ~1e13 at the ladder's widest point, so long
    * accumulation would overflow where decimal cannot.
    *
    * Scale shape: the natural `lag() OVER (PARTITION BY series ORDER
    * BY ts)` caps parallelism at the SERIES COUNT — the same defect
    * [[cusumChangePoint]]'s bucketed prefix-sum kills, because lag-k
    * is every bit as local as a running sum. Rows window only within
    * their (series, time-bucket) cell; the only values a cell cannot
    * see — the lags of its first maxLag rows — are the LAST maxLag
    * values of the preceding cells, and since every non-empty cell
    * contributes at least one value, the previous maxLag cells of the
    * tiny per-cell "tail array" table (G × buckets rows) always
    * contain them. The stitched carry rides back on a broadcast join
    * and `element_at` with a negative (from-the-end) index reads the
    * exact cross-boundary lag, null at series start — value-identical
    * to the global window, parallelism = series × buckets.
    * ([[ljungBox]] keeps the plain window form: it runs on day-grain
    * pre-aggregates whose per-series row count is calendar-bounded.)
    *
    * `orderCol` must be a TimestampType column: the bucket id is
    * `unix_micros(orderCol) / bucketSeconds`, which fails analysis on
    * long/date order columns (cast such columns to timestamp first).
    * `bucketSeconds` must be positive — 0 would divide to null
    * buckets (one cell per series, the very parallelism cap this
    * rewrite exists to kill) and a negative value would invert bucket
    * order and mis-stitch the cross-cell lag carry.
    */
  def autocorrelation(df: DataFrame, groupCol: String, orderCol: Column,
                      x: Column, tieCol: Column, maxLag: Int,
                      bucketSeconds: Long = 3600L): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8, "maxLag in [1,8]")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val base = df.select(col(groupCol), orderCol.as("ord"), tieCol.as("tie"), x.as("xv"))
      .withColumn("bkt", floor(unix_micros(col("ord")) / lit(bucketSeconds * 1000000L)))
    // xv as the final in-cell tiebreak, mirroring wCellDesc below:
    // with duplicate (ord, tie) keys the lag pairings would otherwise
    // be nondeterministic exactly where the tail/carry was already
    // made deterministic (round-12 advice) — q_acf's tie column is a
    // unique event_id so this is a no-op there, but the operator no
    // longer silently requires uniqueness for determinism.
    val wCell = Window.partitionBy(col(groupCol), col("bkt"))
      .orderBy(col("ord"), col("tie"), col("xv"))
    val local = base.select(Seq(
      col(groupCol), col("bkt"), col("xv"),
      row_number().over(wCell).as("li")) ++
      (1 to maxLag).map(k => lag(col("xv"), k).over(wCell).as(s"cl$k")): _*)
    // per-cell tail = the cell's last (up to) maxLag values in order;
    // carry = concat of the previous maxLag cells' tails (non-empty
    // cells only exist here, so that is always enough history).
    // The tail rows are pre-filtered by a REVERSE row_number over the
    // same (series, bucket) cell so the collect_list aggregates at
    // most maxLag (≤8) elements per cell — an unbounded per-cell
    // collect_list would hold a hot series' whole bucket in one
    // aggregation buffer, a skew/OOM hazard the spill-capable window
    // sort does not have.
    val wSeq = Window.partitionBy(col(groupCol)).orderBy(col("bkt"))
    // xv.desc as the final tiebreak: with duplicate (ord, tie) keys
    // the selected tail must match what the pre-filter-era
    // array_sort-the-whole-cell + slice form chose (structs sort by
    // (ord, tie, xv), so the tail kept the xv-largest duplicates) —
    // without it the cross-cell carry would be nondeterministic under
    // key ties.
    val wCellDesc = Window.partitionBy(col(groupCol), col("bkt"))
      .orderBy(col("ord").desc, col("tie").desc, col("xv").desc)
    val tails = base
      .withColumn("rd", row_number().over(wCellDesc))
      .filter(col("rd") <= maxLag)
      .groupBy(col(groupCol), col("bkt"))
      .agg(array_sort(collect_list(struct(col("ord"), col("tie"), col("xv")))).as("vals"))
      .select(col(groupCol), col("bkt"),
        transform(col("vals"), s => s.getField("xv")).as("tail"))
    val carries = tails.select(col(groupCol), col("bkt"),
      concat((maxLag to 1 by -1).map(j =>
        coalesce(lag(col("tail"), j).over(wSeq), array())): _*).as("carry"))
    val tot = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("xv")).as("s"))
    // try_element_at(carry, li - k - 1): a negative index counts from
    // the END of the carry (the (k - li + 1)-th most recent value);
    // out of bounds — the series start — yields null exactly like
    // window lag (the try_ form: plain element_at THROWS on an
    // out-of-range index in Spark 4 regardless of the ANSI flag)
    val stitched = local.join(broadcast(carries), Seq(groupCol, "bkt"))
      .join(broadcast(tot), Seq(groupCol))
      .select(Seq(
        col(groupCol),
        (col("xv") * col("n") - col("s")).as("d")) ++
        (1 to maxLag).map { k =>
          (when(col("li") > k, col(s"cl$k"))
            .otherwise(try_element_at(col("carry"), col("li") - k - 1)) * col("n") - col("s"))
            .as(s"dl$k")
        }: _*)
    val dd = stitched.groupBy(col(groupCol)).agg(
      dsum(col("d"), col("d")).as("den"),
      (1 to maxLag).map(k => dsum(col(s"dl$k"), col("d")).as(s"num$k")): _*)
    val perLag = (1 to maxLag).map { k =>
      dd.select(col(groupCol), lit(k).as("lag"),
        round(col(s"num$k") / col("den"), 4).as("acf"))
    }
    perLag.reduce(_ unionByName _)
  }

  /** Per-group Gini coefficient, fully integer until the final ratio:
    * G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with x ascending. Within a
    * tie block Σ i·x is permutation-invariant (equal x factors out),
    * so no tie-break is needed for exactness.
    */
  def gini(df: DataFrame, groupCol: String, x: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(x, tieCol)
    df.select(col(groupCol), x.as("xv"), row_number().over(w).as("i"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum("xv").as("sx"), sum(col("i") * col("xv")).as("six"))
      .select(
        col(groupCol), col("n"),
        round((col("six") * 2 - (col("n") + 1) * col("sx")).cast("double") /
          (col("n") * col("sx")).cast("double"), 6).as("gini"))
  }

  /** Benford first-digit audit over a positive money column (Benford
    * 1938; the classic data-quality screen for fabricated values).
    * The leading digit comes from the cents-integer rendered as a
    * string — no float log in the digit extraction — and chi-square
    * contributions are emitted per digit so nothing sums doubles
    * across rows.
    */
  def benfordDigits(df: DataFrame, money: Column): DataFrame = {
    val cents = round(money * 100).cast("long")
    val digits = df.select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit") >= 1)
    val tot = digits.agg(count(lit(1)).as("tn"))
    val expected = log10(lit(1.0) + lit(1.0) / col("digit"))
    digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .crossJoin(tot)
      .select(
        col("digit"), col("n_obs"),
        round(expected, 6).as("benford_p"),
        round(pow(col("n_obs").cast("double") - col("tn") * expected, 2) /
          (col("tn") * expected), 4).as("chi2_contrib"))
  }

  /** Hill tail-index estimator per group (Hill 1975) over the top-k
    * order statistics: mean log-excess over the (k+1)-th value, and
    * alpha = its reciprocal — the heavy-tail screen for document-length
    * and degree distributions. Log-sum rounds at 4dp like the KL/LM
    * scores (SURVEY §5 discipline for irrational aggregates).
    */
  def hillTail(df: DataFrame, groupCol: String, x: Column, tieCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(x.desc, tieCol)
    val ranked = df.select(col(groupCol), x.cast("double").as("xv"), row_number().over(w).as("i"))
      .filter(col("i") <= k + 1)
    val ref = ranked.filter(col("i") === k + 1).select(col(groupCol), col("xv").as("xref"))
    ranked.filter(col("i") <= k).join(ref, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k"), sum(log(col("xv") / col("xref"))).as("lsum"))
      .select(
        col(groupCol), col("k"),
        round(col("lsum") / col("k"), 4).as("hill_mean_log"),
        // a perfectly flat tail (all top-k equal the reference order
        // statistic) has lsum = 0 exactly: α is undefined (NULL), and
        // ANSI Spark throws DIVIDE_BY_ZERO rather than emit Inf —
        // surfaced by the sf3 ladder rung on uniform synthetic sources
        when(col("lsum") > 0, round(col("k") / col("lsum"), 4)).as("tail_alpha"))
  }

  /** One-way ANOVA (Fisher 1925): F statistic and effect size η² for
    * an integer-valued response across k groups. Per-group sufficient
    * statistics (n, Σx exact longs; Σx² in DECIMAL(38,0) so the GRAND
    * total is still an exact decimal sum, not a sum of per-group
    * doubles); the between-group Σ s_g²/n_g folds in group-ascending
    * order (the bhFdrGate discipline) so the one irrational
    * accumulation is order-deterministic across engines, retries and
    * AQE. Two map-side-combined aggregations; k rows cross the second.
    */
  def anovaOneWay(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val per = df.select(col(groupCol).as("g"), v.as("x"))
      .groupBy("g").agg(
        count(lit(1)).as("ng"), sum("x").as("sg"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")).as("ssg"))
    val sbTerm = (col("sg").cast("double") * col("sg").cast("double") /
      col("ng").cast("double")).as("t")
    val tot = per.agg(
      count(lit(1)).as("k"), sum("ng").as("n"), sum("sg").as("s"),
      sum("ssg").cast("double").as("sst_raw"),
      aggregate(sort_array(collect_list(struct(col("g"), sbTerm))),
        lit(0.0), (a, x) => a + x.getField("t")).as("sb_raw"))
    val corr = col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
    val ssb = col("sb_raw") - corr
    val ssw = col("sst_raw") - col("sb_raw")
    val sst = col("sst_raw") - corr
    tot.select(
      col("k"), col("n"),
      round((ssb / (col("k") - 1).cast("double")) /
        (ssw / (col("n") - col("k")).cast("double")), 4).as("f_stat"),
      round(ssb / sst, 6).as("eta_sq"))
  }

  /** Laplace-noised count release — the MECHANISM of a differentially
    * private count publication (Dwork et al. 2006): each group's count
    * plus Laplace(1/ε)-shaped noise via the inverse CDF,
    * x = −(1/ε)·sign(u−½)·ln(1−2|u−½|). The uniform u is HASH-DERIVED
    * (md5 of the group key + seed, offset by ½ ulp so u ∈ (0,1)
    * strictly), which makes the output re-computable, testable and
    * engine-portable — and therefore NOT a DP guarantee: anyone who
    * knows the seed can subtract the noise. A production release must
    * swap `u` for true randomness at the release boundary; only then
    * may the output be labeled with an ε. Accordingly this surface
    * carries no epsilon column — `epsilon` here is just the noise
    * scale parameter. One aggregation, one map over group rows.
    */
  def laplaceNoisedCounts(df: DataFrame, groupCol: String, epsilon: Double, seed: Long): DataFrame = {
    val per = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n_true"))
    val u = (conv(substring(md5(concat(col("g").cast("string"), lit(":" + seed))), 1, 6),
      16, 10).cast("double") + 0.5) / 16777216.0
    val c = u - 0.5
    val noise = lit(-1.0 / epsilon) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    per.select(col("g").as(groupCol),
      round(col("n_true").cast("double") + noise, 4).as("released_count"))
  }

  /** Rank-biased overlap of two rankings of the same items (Webber,
    * Moffat & Zobel 2010), truncated at `depth`: RBO@k =
    * (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d — the top-weighted
    * ranking-similarity measure for comparing two orderings (old vs
    * new scorer, lexical vs semantic retrieval) that, unlike Kendall/
    * Spearman, tolerates non-conjoint tails. Overlap counts X_d are
    * exact integers (an item contributes from depth max(ra,rb)); the
    * 20-term geometric fold runs depth-ascending (sort_array +
    * aggregate). Each list head comes from a BOUNDED-HEAP top-k pass
    * (TopKPerKey with a constant key: map-side partial heaps, no
    * full-table sort, no global window) — ranks are then assigned
    * inside the ≤depth subset, where they equal the global ranks by
    * construction. The corpus is scanned twice and sorted never.
    */
  def rankBiasedOverlap(df: DataFrame, idCol: String, scoreA: Column, scoreB: Column,
                        tie: Column, depth: Int, p: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), scoreA.as("sa"), scoreB.as("sb"), tie.as("t"))
      .withColumn("__k", lit(1))
    def head(score: String, rank: String): DataFrame =
      TopK.perKey(base, Seq("__k"), struct(-col(score), col("t")), depth)
        .withColumn(rank,
          row_number().over(Window.orderBy(col(score).desc, col("t"))))
        .select(col("id"), col(rank))
    val ranked = head("sa", "ra").join(head("sb", "rb"), "id")
      .select(col("id"), greatest(col("ra"), col("rb")).cast("long").as("m"))
    val depths = df.sparkSession.range(1, depth + 1).toDF("d")
    val xd = depths.join(ranked, col("m") <= col("d"), "left")
      .groupBy("d").agg(count(col("id")).as("x"))
    xd.agg(sort_array(collect_list(struct(col("d"), col("x")))).as("arr"))
      .select(
        lit(depth).cast("long").as("depth"),
        lit(p).as("p"),
        round(aggregate(col("arr"), lit(0.0), (acc, e) =>
          acc + lit(1.0 - p) * pow(lit(p), e.getField("d").cast("double") - 1.0) *
            e.getField("x").cast("double") / e.getField("d").cast("double")), 4).as("rbo"))
  }

  /** Difference-in-differences estimator (Ashenfelter & Card 1985):
    * DiD = (ȳ_treated,post − ȳ_treated,pre) − (ȳ_control,post −
    * ȳ_control,pre) — the parallel-trends causal readout over a 2×2 of
    * exact cell sums. One aggregation, eight longs, closed form.
    */
  def diffInDiff(df: DataFrame, isTreated: Column, isPost: Column, v: Column): DataFrame = {
    val t = df.select(isTreated.as("tr"), isPost.as("po"), v.cast("long").as("x"))
    def cell(tr: Boolean, po: Boolean, f: Column) =
      sum(when(col("tr") === tr && col("po") === po, f).otherwise(lit(0L)))
    val agg = t.agg(
      cell(true, false, lit(1L)).as("n10"), cell(true, false, col("x")).as("s10"),
      cell(true, true, lit(1L)).as("n11"), cell(true, true, col("x")).as("s11"),
      cell(false, false, lit(1L)).as("n00"), cell(false, false, col("x")).as("s00"),
      cell(false, true, lit(1L)).as("n01"), cell(false, true, col("x")).as("s01"))
    def m(s: String, n: String) = col(s).cast("double") / col(n).cast("double")
    agg.select(
      col("n10"), col("n11"), col("n00"), col("n01"),
      round(m("s10", "n10"), 4).as("mean_treated_pre"),
      round(m("s11", "n11"), 4).as("mean_treated_post"),
      round(m("s00", "n00"), 4).as("mean_control_pre"),
      round(m("s01", "n01"), 4).as("mean_control_post"),
      round((m("s11", "n11") - m("s10", "n10")) - (m("s01", "n01") - m("s00", "n00")), 4)
        .as("did"))
  }

  /** Off-policy evaluation of a stochastic target policy from logged
    * (action, reward) data by inverse propensity scoring (Horvitz &
    * Thompson 1952; Li et al. 2011): behavior propensities are the
    * empirical action frequencies, so w = π(a)/p̂(a) and the IPS value
    * collapses to Σ_a π(a)·S_a/n_a over exact per-action sums. Also
    * reported: the self-normalized SNIPS value (Swaminathan & Joachims
    * 2015) and the effective sample size (Σw)²/Σw² — the diagnostic
    * that says whether the logged data supports the target policy at
    * all. One keyed aggregate; the per-action closed forms fold
    * action-ascending (sort_array + aggregate), so every double sum is
    * order-exact.
    */
  def ipsPolicyValue(df: DataFrame, actionCol: String, reward: Column,
                     target: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = target.toDF("a", "pi")
    val per = df.select(col(actionCol).as("a"), reward.cast("long").as("r"))
      .groupBy("a").agg(count(lit(1)).as("na"), sum("r").as("sa"))
    val n = per.agg(sum("na").as("n"))
    val terms = per.join(broadcast(tgt), "a").crossJoin(broadcast(n))
      .select(struct(col("a"),
        (col("pi") * col("sa").cast("double") / col("na").cast("double")).as("ips_t"),
        (col("pi") * col("n").cast("double")).as("w_t"),
        (col("pi") * col("pi") * col("n").cast("double") * col("n").cast("double") /
          col("na").cast("double")).as("w2_t"),
        col("n")).as("s"))
    def fold(field: String) =
      aggregate(col("arr"), lit(0.0), (acc, x) => acc + x.getField(field))
    terms.agg(sort_array(collect_list(col("s"))).as("arr"))
      .select(element_at(col("arr"), 1).getField("n").as("n"),
        fold("ips_t").as("ips"), fold("w_t").as("sw"), fold("w2_t").as("sw2"))
      .select(col("n"),
        round(col("ips"), 4).as("ips_value"),
        round(col("n").cast("double") * col("ips") / col("sw"), 4).as("snips_value"),
        round(col("sw") * col("sw") / col("sw2"), 4).as("ess"))
  }

  /** Distribution-free confidence interval for the median per group
    * (binomial order-statistic interval, normal approximation; Conover
    * 1999 §3.2): lo/hi are the ⌊(n−z√n)/2⌋-th and (n−lo+1)-th order
    * statistics — no bootstrap resampling, no distributional
    * assumption, one ranked window. The median itself is reported in
    * exact half-units (x_{⌈n/2⌉}+x_{⌊n/2⌋+1} summed as integers, then
    * one division) per the spearman half-rank discipline. z√n is a
    * product of IEEE-exact sqrt and a constant — bit-identical on any
    * engine — so the floor'd indices are engine-exact too.
    */
  def medianCi(df: DataFrame, groupCol: String, v: Column, z: Double = 1.96): DataFrame = {
    val t = df.select(col(groupCol).as("g"), v.cast("long").as("x"))
    val n = t.groupBy("g").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("g").orderBy("x")
    val ranked = t.withColumn("rn", row_number().over(w)).join(broadcast(n), "g")
    val kLo = greatest(lit(1L), floor((col("n").cast("double") -
      lit(z) * sqrt(col("n").cast("double"))) / 2.0).cast("long"))
    val kHi = least(col("n"), col("n") - kLo + 1)
    val mLo = expr("(n + 1) div 2") // ⌈n/2⌉ (Column./ would divide in doubles)
    val mHi = expr("n div 2 + 1")   // ⌊n/2⌋+1
    ranked
      .withColumn("k_lo", kLo).withColumn("k_hi", kHi)
      .withColumn("m_lo", mLo).withColumn("m_hi", mHi)
      .filter(col("rn") === col("k_lo") || col("rn") === col("k_hi") ||
        col("rn") === col("m_lo") || col("rn") === col("m_hi"))
      .groupBy("g", "n").agg(
        min(when(col("rn") === col("k_lo"), col("x"))).as("ci_lo"),
        min(when(col("rn") === col("k_hi"), col("x"))).as("ci_hi"),
        (min(when(col("rn") === col("m_lo"), col("x"))) +
          min(when(col("rn") === col("m_hi"), col("x")))).as("med2"))
      .select(col("g").as(groupCol), col("n"),
        round(col("med2").cast("double") / 2.0, 2).as("median"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Weighted median per group: the smallest value whose cumulative
    * weight reaches half the total (2·cumw ≥ W in exact longs — no
    * half-unit division). One value-ordered window over the per-
    * (group, value) weight histogram — domain-bounded, not
    * row-bounded — plus a min_by to pick the crossing.
    */
  def weightedMedian(df: DataFrame, groupCol: String, v: Column, weight: Column): DataFrame = {
    val h = df.select(col(groupCol).as("g"), v.cast("long").as("x"),
      weight.cast("long").as("w"))
      .groupBy("g", "x").agg(sum("w").as("w"))
    val wc = Window.partitionBy("g").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.groupBy("g").agg(sum("w").as("tw"))
    h.withColumn("cumw", sum("w").over(wc))
      .join(broadcast(tot), "g")
      .filter(col("cumw") * 2 >= col("tw"))
      .groupBy("g", "tw").agg(min("x").as("weighted_median"))
      .select(col("g").as(groupCol), col("tw").as("total_w"), col("weighted_median"))
  }

  /** k-anonymity audit (Sweeney 2002): group by the quasi-identifier
    * columns and flag every equivalence class smaller than k — the
    * classes a release must suppress or generalize before publication.
    * The structural complement of [[laplaceNoisedCounts]]: DP perturbs the
    * answer, k-anonymity gates the rows. One map-side-combined
    * aggregation; only (QI, count) rows shuffle, output is
    * class-bounded not row-bounded.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("suppressed", col("class_size") < k)

  /** Fano factor (variance-to-mean ratio of per-bin event counts;
    * Fano 1947) per group — the burstiness diagnostic: 1 ≈ Poisson
    * arrivals, >1 bursty, <1 regular. Bins are the OBSERVED distinct
    * `bin` values (empty bins contribute nothing — stated, since the
    * two conventions differ). Two aggregations over exact longs (count
    * per (group, bin), then n/Σc/Σc² per group — c² cannot overflow a
    * long until a single bin holds 3×10⁹ events); variance and mean
    * are closed forms of those sums, so the doubles are a pure
    * function of exact integers.
    */
  def fanoBurstiness(df: DataFrame, groupCol: String, bin: Column): DataFrame = {
    val perBin = df.select(col(groupCol).as("g"), bin.as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("c"))
    val per = perBin.groupBy("g").agg(
      count(lit(1)).as("n_bins"), sum("c").as("n_events"),
      sum(col("c") * col("c")).as("ss"))
    val n = col("n_bins").cast("double")
    val mean = col("n_events").cast("double") / n
    val variance = (col("ss").cast("double") -
      col("n_events").cast("double") * col("n_events").cast("double") / n) / (n - 1)
    per.filter(col("n_bins") > 1)
      .select(col("g").as(groupCol), col("n_bins"), col("n_events"),
        round(mean, 4).as("mean_per_bin"),
        round(variance / mean, 4).as("fano"))
  }

  /** Welch's unequal-variance t-test (Welch 1947) between the rows
    * where `isA` holds and the rest. `v` must be integer-valued (cast
    * upstream, e.g. cents): the six sufficient statistics (n, Σx, Σx²
    * per side) accumulate exactly — squares in DECIMAL(38,0) — and the
    * t statistic plus the Welch–Satterthwaite degrees of freedom are
    * closed forms of those integers, so both engines land on the same
    * doubles. One map-side-combined aggregation, one row out.
    */
  def welchT(df: DataFrame, isA: Column, v: Column): DataFrame = {
    val agg = df.select(isA.as("a"), v.as("x")).agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("a"), col("x")).otherwise(0L)).as("s1"),
      sum(when(col("a"), col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .otherwise(lit(0).cast("decimal(19,0)"))).cast("double").as("ss1"),
      sum(when(col("a"), 0L).otherwise(1L)).as("n2"),
      sum(when(col("a"), 0L).otherwise(col("x"))).as("s2"),
      sum(when(col("a"), lit(0).cast("decimal(19,0)"))
        .otherwise(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")))
        .cast("double").as("ss2"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val m1 = col("s1").cast("double") / n1
    val m2 = col("s2").cast("double") / n2
    val var1 = (col("ss1") - col("s1").cast("double") * col("s1").cast("double") / n1) / (n1 - 1)
    val var2 = (col("ss2") - col("s2").cast("double") * col("s2").cast("double") / n2) / (n2 - 1)
    val se2 = var1 / n1 + var2 / n2
    val dfW = se2 * se2 /
      (var1 * var1 / (n1 * n1 * (n1 - 1)) + var2 * var2 / (n2 * n2 * (n2 - 1)))
    agg.select(
      col("n1"), col("n2"),
      round(m1, 4).as("mean_a"),
      round(m2, 4).as("mean_b"),
      round((m1 - m2) / sqrt(se2), 4).as("t_stat"),
      round(dfW, 2).as("df_welch"))
  }

  /** Brown-Forsythe robust homogeneity-of-variance test (Brown &
    * Forsythe 1974): one-way ANOVA F on z = |x − median_g| — the
    * median-centered Levene (1960) variant that keeps its size under
    * non-normality. The answer to "are these groups' SPREADS equal",
    * the precondition the plain ANOVA/t family assumes.
    *
    * Exactness: F is scale-invariant, so the test runs on
    * z2 = |2x − (x_(⌈n/2⌉) + x_(⌊n/2⌋+1))| — twice the deviation from
    * the median, an INTEGER because the doubled median is the sum of
    * the two middle order statistics. No interpolated-median doubles
    * anywhere; the one irrational fold (Σ s_g²/n_g) runs
    * group-ascending like [[anovaOneWay]].
    *
    * Scale posture: rows collapse to the (group, value) histogram
    * first (map-side combinable); the median order statistics come
    * from cumulative counts over that histogram — windows bounded by
    * value cardinality, not row count (the spearman discipline) — and
    * the ANOVA sums are count-weighted on the same histogram, exactly
    * equal to the row-grain sums. Nothing row-grain ever sorts.
    */
  def brownForsythe(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val h = df.select(col(groupCol).as("g"), v.as("x"))
      .groupBy("g", "x").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("x"))
    val cum = h.select(col("g"), col("x"), col("c"), sum("c").over(w).as("cum"))
    val tot = h.groupBy("g").agg(sum("c").as("n"))
    val med2 = cum.join(broadcast(tot), "g")
      .groupBy("g").agg(
        min(when(col("cum") >= expr("(n + 1) div 2"), col("x"))).as("lo"),
        min(when(col("cum") >= expr("(n + 2) div 2"), col("x"))).as("hi"))
      .select(col("g"), (col("lo") + col("hi")).as("m2"))
    val z = h.join(broadcast(med2), "g")
      .select(col("g"), col("c"), abs(lit(2L) * col("x") - col("m2")).as("z2"))
    val per = z.groupBy("g").agg(
      sum("c").as("ng"), sum(col("c") * col("z2")).as("sg"),
      sum(col("c").cast("decimal(19,0)") * col("z2").cast("decimal(19,0)") *
        col("z2").cast("decimal(19,0)")).as("ssg"))
    val sbTerm = (col("sg").cast("double") * col("sg").cast("double") /
      col("ng").cast("double")).as("t")
    val agg2 = per.agg(
      count(lit(1)).as("k"), sum("ng").as("n"), sum("sg").as("s"),
      sum("ssg").cast("double").as("sst_raw"),
      aggregate(sort_array(collect_list(struct(col("g"), sbTerm))),
        lit(0.0), (a, x) => a + x.getField("t")).as("sb_raw"))
    val corr = col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
    val ssb = col("sb_raw") - corr
    val ssw = col("sst_raw") - col("sb_raw")
    agg2.select(
      col("k"), col("n"),
      round((ssb / (col("k") - 1).cast("double")) /
        (ssw / (col("n") - col("k")).cast("double")), 4).as("f_stat"))
  }

  /** Jarque-Bera normality test (Jarque & Bera 1980) per group:
    * sample skewness g1 = m3/m2^{3/2}, kurtosis g2 = m4/m2², and
    * JB = n/6·(g1² + (g2−3)²/4) — the one-aggregation "is this column
    * normal enough for the z/t family" gate a profiling pass runs
    * next to [[anovaOneWay]].
    *
    * Exactness: the four raw power sums Σx, Σx², Σx³, Σx⁴ accumulate
    * in DECIMAL (x integer-valued, cast upstream; x⁴ ≈ 1e20 per row at
    * cents scale, ~1e28 summed — well inside DECIMAL(38,0) ≡ DuckDB
    * HUGEINT), and the central-moment expansion runs on those exact
    * sums in one deterministic double expression. Purely map-side
    * combined; one row per group shuffles.
    */
  def jarqueBera(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val agg = df.select(col(groupCol).as("g"), v.as("x"))
      .withColumn("x2", col("x") * col("x"))
      .groupBy("g").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(d(col("x2"))).cast("double").as("s2"),
        sum(d(col("x2")) * d(col("x"))).cast("double").as("s3"),
        sum(d(col("x2")) * d(col("x2"))).cast("double").as("s4"))
    val n = col("n").cast("double")
    val m = col("s1").cast("double") / n
    val m2 = col("s2") / n - m * m
    val m3 = col("s3") / n - lit(3.0) * m * (col("s2") / n) + lit(2.0) * m * m * m
    val m4 = col("s4") / n - lit(4.0) * m * (col("s3") / n) +
      lit(6.0) * m * m * (col("s2") / n) - lit(3.0) * m * m * m * m
    // m2·√m2, not pow(m2, 1.5): sqrt is IEEE correctly-rounded in both
    // engines, pow is not — the only way the 6dp round can drift.
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2)
    agg.select(
      col("g").as(groupCol), col("n"),
      round(skew, 6).as("skewness"),
      round(kurt, 6).as("kurtosis"),
      round(n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 4).as("jb_stat"))
  }

  /** Grubbs' outlier statistic (Grubbs 1950) per group:
    * G = max(mean−min, max−mean)/s — how many sample standard
    * deviations the most extreme value sits from the mean, the
    * classical single-outlier screen on a numeric column (compare the
    * robust median/MAD gate, which flags MANY outliers; Grubbs asks
    * whether the single worst point is defensible). Closed form of
    * five sufficient statistics (n, Σx, Σx² exact, min, max); ties
    * between the two sides resolve to the HIGH side deterministically.
    * One map-side-combined aggregation.
    */
  def grubbs(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val agg = df.select(col(groupCol).as("g"), v.as("x"))
      .groupBy("g").agg(
        count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
          .cast("double").as("s2"),
        min("x").as("mn"), max("x").as("mx"))
    val n = col("n").cast("double")
    val mean = col("s1").cast("double") / n
    val sd = sqrt((col("s2") - col("s1").cast("double") * col("s1").cast("double") / n) /
      (n - 1))
    val devLow = mean - col("mn").cast("double")
    val devHigh = col("mx").cast("double") - mean
    agg.select(
      col("g").as(groupCol), col("n"),
      round(greatest(devLow, devHigh) / sd, 4).as("g_stat"),
      when(devLow > devHigh, col("mn")).otherwise(col("mx")).as("x_extreme"))
  }

  /** Two-feature multiple regression y = b1·x1 + b2·x2 + intercept per
    * group, solved from the normal equations' 2×2 closed form (Cramer)
    * on centered exact sums — the "does y still depend on x1 once x2
    * is controlled for" step up from [[olsFit]], still ONE map-side
    * combined aggregation with one row per group crossing the shuffle
    * (the design matrix never materializes; at 100 TB this is the only
    * shape a regression over the corpus can take short of an iterative
    * solver). Inputs integer-valued (cast upstream); R² from the
    * fitted-sum identity b1·Sx1y + b2·Sx2y over Syy.
    */
  def ols2(df: DataFrame, groupCol: String, x1: Column, x2: Column, y: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val agg = df.select(col(groupCol).as("g"), x1.as("a"), x2.as("b"), y.as("y"))
      .groupBy("g").agg(
        count(lit(1)).as("n"),
        sum("a").cast("double").as("sa"), sum("b").cast("double").as("sb"),
        sum("y").cast("double").as("sy"),
        sum(d(col("a")) * d(col("a"))).cast("double").as("saa"),
        sum(d(col("b")) * d(col("b"))).cast("double").as("sbb"),
        sum(d(col("a")) * d(col("b"))).cast("double").as("sab"),
        sum(d(col("a")) * d(col("y"))).cast("double").as("say"),
        sum(d(col("b")) * d(col("y"))).cast("double").as("sby"),
        sum(d(col("y")) * d(col("y"))).cast("double").as("syy"))
    val n = col("n").cast("double")
    val aa = col("saa") - col("sa") * col("sa") / n
    val bb = col("sbb") - col("sb") * col("sb") / n
    val ab = col("sab") - col("sa") * col("sb") / n
    val ay = col("say") - col("sa") * col("sy") / n
    val by = col("sby") - col("sb") * col("sy") / n
    val yy = col("syy") - col("sy") * col("sy") / n
    val det = aa * bb - ab * ab
    val b1 = (ay * bb - by * ab) / det
    val b2 = (by * aa - ay * ab) / det
    agg.select(
      col("g").as(groupCol), col("n"),
      round(b1, 6).as("b1"),
      round(b2, 6).as("b2"),
      round((col("sy") - b1 * col("sa") - b2 * col("sb")) / n, 6).as("intercept"),
      round((b1 * ay + b2 * by) / yy, 6).as("r2"))
  }

  /** Durbin-Watson first-order residual autocorrelation per group
    * (Durbin & Watson 1950) on an integer (x, y) series ordered by x.
    *
    * Exactness: residual differences never materialize — with
    * e_t − e_{t−1} = Δy − b·Δx, both DW terms expand over EXACT sums
    * (ΣΔy², ΣΔyΔx, ΣΔx² from one lag window; the OLS five from the
    * same aggregation), and the statistic is one double closed form.
    * Scale: the lag window partitions by group at whatever grain the
    * caller aggregated to (day-grain series stay calendar-bounded).
    */
  def durbinWatson(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val ord = Window.partitionBy("g").orderBy("x")
    val base = df.select(col(groupCol).as("g"), x.as("x"), y.as("y"))
      .withColumn("dx", col("x") - lag("x", 1).over(ord))
      .withColumn("dy", col("y") - lag("y", 1).over(ord))
    val agg = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
      sum(d(col("x")) * d(col("x"))).cast("double").as("sxx"),
      sum(d(col("x")) * d(col("y"))).cast("double").as("sxy"),
      sum(d(col("y")) * d(col("y"))).cast("double").as("syy"),
      sum(d(col("dy")) * d(col("dy"))).cast("double").as("sdd"),
      sum(d(col("dy")) * d(col("dx"))).cast("double").as("sdx"),
      sum(d(col("dx")) * d(col("dx"))).cast("double").as("sxx2"))
    val n = col("n").cast("double")
    val b = (col("sxy") * n - col("sx") * col("sy")) /
      (col("sxx") * n - col("sx") * col("sx"))
    val num = col("sdd") - lit(2.0) * b * col("sdx") + b * b * col("sxx2")
    val den = (col("syy") - col("sy") * col("sy") / n) -
      b * (col("sxy") - col("sx") * col("sy") / n)
    agg.select(col("g").as(groupCol), col("n"),
      round(b, 6).as("slope"), round(num / den, 6).as("dw"))
  }

  /** Chow structural-break F test (Chow 1960): did the regression
    * y ~ x change at x = breakX? Per-segment and pooled SSR from the
    * same one-pass conditional sums; F = ((SSRp − SSR1 − SSR2)/k) /
    * ((SSR1+SSR2)/(n−2k)) with k = 2 parameters.
    *
    * One aggregation at (group, segment) grain plus a group-grain
    * pooled pass — map-side combine does all the work; the SSR closed
    * form is written once and applied to all three sum rows so both
    * engines evaluate the identical expression tree.
    */
  def chowTest(df: DataFrame, groupCol: String, x: Column, y: Column,
               breakX: Long): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val seg = df.select(col(groupCol).as("g"), x.as("x"), y.as("y"))
      .withColumn("seg", (col("x") < breakX).cast("int"))
    def sums(in: DataFrame, by: Seq[String]): DataFrame =
      in.groupBy(by.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
        sum(d(col("x")) * d(col("x"))).cast("double").as("sxx"),
        sum(d(col("x")) * d(col("y"))).cast("double").as("sxy"),
        sum(d(col("y")) * d(col("y"))).cast("double").as("syy"))
    def ssr: Column = {
      val n = col("n").cast("double")
      (col("syy") - col("sy") * col("sy") / n) -
        ((col("sxy") * n - col("sx") * col("sy")) /
          (col("sxx") * n - col("sx") * col("sx"))) *
        (col("sxy") - col("sx") * col("sy") / n)
    }
    val perSeg = sums(seg, Seq("g", "seg")).withColumn("ssr", ssr)
      .groupBy("g").agg(
        sum(when(col("seg") === 1, col("ssr"))).as("ssr1"),
        sum(when(col("seg") === 0, col("ssr"))).as("ssr2"),
        sum(when(col("seg") === 1, col("n"))).as("n1"),
        sum(when(col("seg") === 0, col("n"))).as("n2"))
    val pooled = sums(seg, Seq("g")).withColumn("ssr_p", ssr)
      .select(col("g"), col("n"), col("ssr_p"))
    val f = ((col("ssr_p") - (col("ssr1") + col("ssr2"))) / lit(2.0)) /
      ((col("ssr1") + col("ssr2")) / (col("n").cast("double") - lit(4.0)))
    pooled.join(perSeg, "g").select(
      col("g").as(groupCol), col("n"), col("n1"), col("n2"),
      round(f, 6).as("f_chow"))
  }

  /** Lag-1 Granger causality (Granger 1969): does x's yesterday help
    * predict y's today beyond y's own yesterday? Restricted
    * (y ~ y₋₁) vs unrestricted (y ~ y₋₁ + x₋₁) SSR from the ols2
    * normal-equation moments; F = (SSR_r − SSR_u)/(SSR_u/(n−3)).
    *
    * The caller supplies the aligned series rows (one per (group,
    * t) with both y and x); lags ride one group-partitioned window.
    */
  def grangerLag1(df: DataFrame, groupCol: String, t: Column, y: Column,
                  xv: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val ord = Window.partitionBy("g").orderBy("t")
    val base = df.select(col(groupCol).as("g"), t.as("t"), y.as("y"), xv.as("xv"))
      .withColumn("yl", lag("y", 1).over(ord))
      .withColumn("xl", lag("xv", 1).over(ord))
      .filter(col("yl").isNotNull && col("xl").isNotNull)
    val agg = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum("yl").cast("double").as("sa"), sum("xl").cast("double").as("sb"),
      sum("y").cast("double").as("sy"),
      sum(d(col("yl")) * d(col("yl"))).cast("double").as("saa"),
      sum(d(col("xl")) * d(col("xl"))).cast("double").as("sbb"),
      sum(d(col("yl")) * d(col("xl"))).cast("double").as("sab"),
      sum(d(col("yl")) * d(col("y"))).cast("double").as("say"),
      sum(d(col("xl")) * d(col("y"))).cast("double").as("sby"),
      sum(d(col("y")) * d(col("y"))).cast("double").as("syy"))
    val n = col("n").cast("double")
    val aa = col("saa") - col("sa") * col("sa") / n
    val bb = col("sbb") - col("sb") * col("sb") / n
    val ab = col("sab") - col("sa") * col("sb") / n
    val ay = col("say") - col("sa") * col("sy") / n
    val by = col("sby") - col("sb") * col("sy") / n
    val yy = col("syy") - col("sy") * col("sy") / n
    val ssrR = yy - (ay * ay) / aa
    val det = aa * bb - ab * ab
    val b1 = (ay * bb - by * ab) / det
    val b2 = (by * aa - ay * ab) / det
    val ssrU = yy - (b1 * ay + b2 * by)
    val f = (ssrR - ssrU) / (ssrU / (n - lit(3.0)))
    // RAW doubles: the SSRs are large-magnitude, so rounding would
    // reintroduce the engines' divergent half-way conventions — the
    // operands are exact, so the closed forms are already bit-equal.
    agg.select(col("g").as(groupCol), col("n"),
      ssrR.as("ssr_restricted"),
      ssrU.as("ssr_unrestricted"),
      f.as("f_granger"))
  }

  /** Cronbach's alpha internal-consistency reliability (Cronbach
    * 1951) of integer-valued items over complete blocks:
    * α = k/(k−1) · (1 − Σvarᵢ/var_total). Since every variance shares
    * the same n, the ratio reduces to exact integer terms
    * Σᵢ(n·Σvᵢ² − (Σvᵢ)²) over (n·ΣT² − (ΣT)²) — one double division
    * at the end.
    */
  def cronbachAlpha(df: DataFrame, itemCol: String, blockCol: String,
                    v: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val cell = df.select(col(itemCol).as("item"), col(blockCol).as("blk"), v.as("v"))
    val kdf = cell.agg(countDistinct(col("item")).as("k"))
    val sized = cell.groupBy("blk").agg(count(lit(1)).as("ci"))
    val complete = cell.join(sized, "blk").crossJoin(kdf)
      .filter(col("ci") === col("k"))
    val items = complete.groupBy("item").agg(
      count(lit(1)).as("nb"), sum("v").as("si"),
      sum(d(col("v")) * d(col("v"))).as("sii"))
    val num = items.agg(
      max("nb").as("nb"),
      sum(col("nb").cast("decimal(10,0)") * col("sii") -
        d(col("si")) * d(col("si"))).as("num"),
      count(lit(1)).as("k"))
    val blocks = complete.groupBy("blk").agg(sum("v").as("tt"))
    val den = blocks.agg(
      sum("tt").as("st"),
      sum(d(col("tt")) * d(col("tt"))).as("stt"))
    val denom = (col("nb").cast("decimal(10,0)") * col("stt") -
      d(col("st")) * d(col("st"))).cast("double")
    val alpha = (col("k").cast("double") / (col("k") - 1).cast("double")) *
      (lit(1.0) - col("num").cast("double") / denom)
    num.crossJoin(den).select(
      col("k"), col("nb").as("n_blocks"), round(alpha, 6).as("alpha"))
  }

  /** Cochran-Armitage trend-in-proportions test (Cochran 1954;
    * Armitage 1955): is the case rate monotone in an ordered integer
    * dose? Z² = N(N·Σwr − R·Σwn)² / (R(N−R)(N·Σw²n − (Σwn)²)) —
    * a dose-histogram aggregation; every product stays exact in
    * DECIMAL(38,0) ≡ HUGEINT and only the final ratio is double.
    */
  def cochranArmitage(df: DataFrame, dose: Column, isCase: Column): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    val h = df.select(dose.cast("long").as("w"), isCase.cast("long").as("r"))
      .groupBy("w").agg(count(lit(1)).as("ni"), sum("r").as("ri"))
    val tot = h.agg(
      sum("ni").as("nn"), sum("ri").as("rr"),
      sum(col("w") * col("ni")).as("swn"),
      sum(col("w") * col("ri")).as("swr"),
      sum(col("w") * col("w") * col("ni")).as("sw2n"))
    val dcol = d38(col("nn")) * d38(col("swr")) - d38(col("rr")) * d38(col("swn"))
    val den = d38(col("rr")) * d38(col("nn") - col("rr")) *
      (d38(col("nn")) * d38(col("sw2n")) - d38(col("swn")) * d38(col("swn")))
    val z2 = col("nn").cast("double") * (dcol * dcol).cast("double") / den.cast("double")
    tot.select(col("nn").as("n"), col("rr").as("n_cases"),
      dcol.cast("long").as("trend_num"), round(z2, 6).as("z2_trend"))
  }

  /** Friedman rank test for k treatments over complete blocks
    * (Friedman 1937), tie-averaged ranks kept exact in half-rank
    * units: Q = 3·ΣR₂ⱼ²/(n·k·(k+1)) − 3·n·(k+1) with R₂ⱼ = 2·ΣRⱼ.
    * The rank window partitions by BLOCK (k rows each — perfectly
    * bounded); the cross-treatment Q is a k-row aggregate broadcast
    * back onto the per-treatment rows.
    */
  def friedmanTest(df: DataFrame, itemCol: String, blockCol: String,
                   v: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(19,0)")
    val cell = df.select(col(itemCol).as("item"), col(blockCol).as("blk"), v.as("v"))
    val kdf = cell.agg(countDistinct(col("item")).as("k"))
    val sized = cell.groupBy("blk").agg(count(lit(1)).as("ci"))
    val complete = cell.join(sized, "blk").crossJoin(kdf)
      .filter(col("ci") === col("k"))
    val ranked = complete.withColumn("r2",
      rank().over(Window.partitionBy("blk").orderBy("v")).cast("long") * 2 +
        count(lit(1)).over(Window.partitionBy("blk", "v")) - 1)
    val items = ranked.groupBy("item").agg(
      sum("r2").as("r2sum"), count(lit(1)).as("nb"), max("k").as("k"))
    val s = items.agg(
      sum(d(col("r2sum")) * d(col("r2sum"))).as("ss"),
      max("nb").as("nb"), max("k").as("k"))
    val nD = col("nb").cast("double")
    val kD = col("k").cast("double")
    val q = lit(3.0) * col("ss").cast("double") / (nD * kD * (kD + lit(1.0))) -
      lit(3.0) * nD * (kD + lit(1.0))
    items.select(col("item"), col("nb").as("n_blocks"), col("r2sum"))
      .crossJoin(s.select(round(q, 6).as("q_friedman")))
      .withColumn("mean_rank",
        round(col("r2sum").cast("double") / (col("n_blocks") * 2).cast("double"), 6))
  }

  /** Single-pass fixed-bound equi-width histogram quantiles: the
    * 100 TB shape for approximate percentiles — one map-side-combined
    * (group, bin) histogram, a 256-row-per-group cumulative walk, and
    * the quantile is the lower edge of the first bin whose cumulative
    * count reaches ⌈p·n⌉. Entirely integer-exact (bin indices and
    * edges are longs; ⌈a·n/b⌉ = ⌊(a·n + b − 1)/b⌋, and every
    * intermediate stays < 2⁵³ so the floor-of-double-division is
    * engine-exact).
    */
  def histoQuantiles(df: DataFrame, groupCol: String, v: Column,
                     lo: Long, hi: Long, bins: Int): DataFrame = {
    val bin = least(greatest(
      floor((v - lit(lo)).cast("double") * lit(bins.toDouble) / lit((hi - lo).toDouble)),
      lit(0.0)), lit((bins - 1).toDouble)).cast("long")
    val h = df.select(col(groupCol).as("g"), bin.as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum("cnt").over(wc))
      .withColumn("ntot", sum("cnt").over(Window.partitionBy("g")))
    def target(a: Int, bq: Int): Column =
      floor((col("ntot") * a + (bq - 1)).cast("double") / lit(bq.toDouble))
    def edge(bcol: Column): Column =
      (lit(lo) + floor(bcol.cast("double") * lit((hi - lo).toDouble) / lit(bins.toDouble)))
        .cast("long")
    cum.groupBy("g").agg(
      max("ntot").as("n"),
      min(when(col("cum") >= target(1, 2), col("b"))).as("b50"),
      min(when(col("cum") >= target(9, 10), col("b"))).as("b90"),
      min(when(col("cum") >= target(99, 100), col("b"))).as("b99"))
      .select(col("g").as(groupCol), col("n"),
        edge(col("b50")).as("p50_lo_c"),
        edge(col("b90")).as("p90_lo_c"),
        edge(col("b99")).as("p99_lo_c"))
  }

  /** Ljung-Box portmanteau test (Ljung & Box 1978): Q = n(n+2)·Σₖ
    * ρ̂ₖ²/(n−k) over lags 1..maxLag — the "is there ANY residual
    * autocorrelation" screen that q_acf's per-lag view feeds in
    * classical time-series diagnostics. Same exact-integer centering
    * as [[autocorrelation]] (dᵢ = n·xᵢ − S, DECIMAL(38,0) products);
    * the ρ̂ₖ ratios and the Q fold are one scalar double expression
    * tree at the end, written identically in the oracle so the doubles
    * agree bitwise.
    */
  def ljungBox(df: DataFrame, groupCol: String, orderCol: Column,
               x: Column, tieCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8, "maxLag in [1,8]")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("ord"), col("tie"))
    val all = Window.partitionBy(col(groupCol))
    val centered = df.select(col(groupCol), orderCol.as("ord"), tieCol.as("tie"), x.as("xv"))
      .select(Seq(
        col(groupCol),
        (col("xv") * count(lit(1)).over(all) - sum(col("xv")).over(all)).as("d")) ++
        (1 to maxLag).map(k =>
          (lag(col("xv"), k).over(w) * count(lit(1)).over(all) - sum(col("xv")).over(all))
            .as(s"dl$k")): _*)
    val dd = centered.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      (dsum(col("d"), col("d")).as("den") +:
        (1 to maxLag).map(k => dsum(col(s"dl$k"), col("d")).as(s"num$k"))): _*)
    val nD = col("n").cast("double")
    val q = (1 to maxLag).map { k =>
      (col(s"num$k") / col("den")) * (col(s"num$k") / col("den")) / (nD - lit(k))
    }.reduce(_ + _) * nD * (nD + lit(2))
    dd.select(col(groupCol), col("n"), lit(maxLag).as("lags"),
      when(col("den") > 0, q).as("q_lb"))
  }

  /** Theil's U forecast-quality ratio (Theil 1966, U₂ form) of the
    * seasonal-naive forecast (value 7 days earlier) against the naive
    * one (value 1 day earlier), per series: U = √(SSE₇/SSE₁). U < 1
    * means weekly seasonality genuinely helps — the go/no-go gate on
    * q_seasonal_baseline's model. Scored only on days where BOTH
    * reference days exist, so the two SSEs cover the identical row
    * set; squared errors accumulate in DECIMAL(38,0) (day-sums reach
    * ~1e9 cents at the widest rung; the square crosses 2⁶³).
    */
  def theilU(df: DataFrame, groupCol: String, dayCol: Column, v: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), dayCol.as("day"), v.as("v"))
    val lag1 = base.select(col("g"), (col("day") + 1).as("day"), col("v").as("v1"))
    val lag7 = base.select(col("g"), (col("day") + 7).as("day"), col("v").as("v7"))
    base.join(lag1, Seq("g", "day")).join(lag7, Seq("g", "day"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_days"),
        dsum(col("v") - col("v1"), col("v") - col("v1")).as("sse_naive"),
        dsum(col("v") - col("v7"), col("v") - col("v7")).as("sse_seasonal"))
      .select(col("g").as(groupCol), col("n_days"),
        col("sse_naive"), col("sse_seasonal"),
        when(col("sse_naive") > 0,
          sqrt(col("sse_seasonal") / col("sse_naive"))).as("theil_u"))
  }

  /** Herfindahl–Hirschman concentration (Herfindahl 1950; Hirschman
    * 1945) of actor activity within each group: HHI = Σᵤ(cᵤ/T)² =
    * Σcᵤ²/T², plus the effective actor count 1/HHI (the "how many
    * equal participants would look like this" rendering). Integer-
    * exact: per-actor counts are map-side-combinable longs, squares
    * accumulate in DECIMAL(38,0), two scalar divisions at the end.
    */
  def hhi(df: DataFrame, groupCol: String, actorCol: String): DataFrame = {
    val c = df.groupBy(col(groupCol).as("g"), col(actorCol).as("actor"))
      .agg(count(lit(1)).as("c"))
    c.groupBy("g")
      .agg(count(lit(1)).as("n_actors"), sum("c").as("total"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")).as("s2"))
      .select(col("g").as(groupCol), col("n_actors"), col("total"),
        (col("s2").cast("double") /
          (col("total").cast("decimal(19,0)") * col("total").cast("decimal(19,0)"))
            .cast("double")).as("hhi"),
        ((col("total").cast("decimal(19,0)") * col("total").cast("decimal(19,0)"))
          .cast("double") / col("s2").cast("double")).as("effective_n"))
  }

  /** Lorenz-curve deciles per group (Lorenz 1905): rank rows by value
    * ascending, cut into 10 equal-population buckets, and report each
    * bucket's share and the cumulative share at its upper edge — the
    * curve q_gini integrates. Ranking goes through [[GlobalRank]]
    * (range-partitioned two-pass row numbers + running sums), NOT an
    * `ORDER BY` window: the few-huge-groups shape is exactly the
    * single-task-sort pathology the repo retired in round 8.
    */
  def lorenzDeciles(df: DataFrame, groupCol: String, value: Column,
                    tieCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), value.cast("long").as("v"), tieCol.as("tb"))
    val ranked = GlobalRank.rowNumbers(base, Seq("g"), Seq(col("v"), col("tb")),
      "rn", running = Seq(("v", "cum_v"))).df
    val totals = base.groupBy("g").agg(count(lit(1)).as("n_g"), sum("v").as("tot_v"))
    ranked.join(broadcast(totals), "g")
      .select(col("g"), expr("((rn - 1) * 10) div n_g + 1").cast("int").as("decile"),
        col("v"), col("cum_v"), col("tot_v"))
      .groupBy("g", "decile")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("decile_v"),
        max("cum_v").as("cum_v"), max("tot_v").as("tot_v"))
      .select(col("g").as(groupCol), col("decile"), col("n_rows"),
        col("decile_v"), col("cum_v"),
        (col("cum_v").cast("double") / col("tot_v").cast("double")).as("cum_share"))
  }

  /** Binned Epanechnikov kernel density profile (Epanechnikov 1969;
    * Silverman 1986 §5 "binned KDE") per group at a fixed evaluation
    * grid: f̂(g) = 0.75·Σ_b cnt_b·(h²−(c_b−g)²)/(n·h³) over the bins
    * within one bandwidth. The 100 TB density shape: rows collapse to
    * the (group, bin) histogram map-side (the histoQuantiles
    * discipline), the grid is a broadcast literal, and every
    * kernel weight is an EXACT integer product (bin centers, grid
    * points, h are longs; the polynomial kernel never needs exp) —
    * one double division per output row.
    */
  def kdeProfile(df: DataFrame, groupCol: String, v: Column,
                 lo: Long, hi: Long, bins: Int, bandwidth: Long,
                 gridSteps: Int): DataFrame = {
    val spark = df.sparkSession
    val bin = least(greatest(
      floor((v - lit(lo)).cast("double") * lit(bins.toDouble) / lit((hi - lo).toDouble)),
      lit(0.0)), lit((bins - 1).toDouble)).cast("long")
    val h = df.select(col(groupCol).as("g"), bin.as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("cnt"))
      // integer bin center: lo + (2b+1)(hi-lo) div (2*bins) — `div`,
      // not `/`: Column `/` is double division and DuckDB CAST rounds
      // where Spark truncates, so only integer division is portable.
      .withColumn("c", expr(s"${lo}L + ((b * 2 + 1) * ${hi - lo}L) div ${2L * bins}L"))
    val n = df.select(col(groupCol).as("g")).groupBy("g").agg(count(lit(1)).as("n"))
    val grid = spark.range(0, gridSteps + 1)
      .select(expr(s"(id * ${hi - lo}L) div ${gridSteps.toLong}L + ${lo}L").as("grid_c"))
    h.join(broadcast(grid),
        abs(col("c") - col("grid_c")) < lit(bandwidth))
      .groupBy("g", "grid_c")
      .agg(sum(col("cnt").cast("decimal(19,0)") *
        ((lit(bandwidth).cast("decimal(19,0)") * lit(bandwidth).cast("decimal(19,0)")) -
          (col("c") - col("grid_c")).cast("decimal(19,0)") *
            (col("c") - col("grid_c")).cast("decimal(19,0)"))).as("ksum"))
      .join(broadcast(n), "g")
      .select(col("g").as(groupCol), col("grid_c"),
        (lit(0.75) * col("ksum").cast("double") /
          (col("n").cast("double") * lit(bandwidth.toDouble) *
            lit(bandwidth.toDouble) * lit(bandwidth.toDouble))).as("density"))
  }

  /** 2-D Mahalanobis outlier screen (Mahalanobis 1936): per group, the
    * most atypical (x, y) point under the group's own covariance,
    * d² = (B·dx² − 2C·dx·dy + A·dy²)/(AB − C²) with A = nΣx²−(Σx)²,
    * B = nΣy²−(Σy)², C = nΣxy−ΣxΣy and dx = n·x−Σx — the scaled form
    * whose every component is an exact integer (the 2×2 inverse is
    * closed-form; no linear algebra library). The winner is elected by
    * an equality join on the group max (map-side-combinable agg, no
    * row-grain sort), min-id on exact double ties.
    */
  def mahalanobisScreen(df: DataFrame, groupCol: String, x: Column, y: Column,
                        idCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), x.cast("long").as("xv"),
      y.cast("long").as("yv"), idCol.as("id"))
    val mom = base.groupBy("g").agg(
      count(lit(1)).as("n"), sum("xv").as("sx"), sum("yv").as("sy"),
      sum(col("xv").cast("decimal(19,0)") * col("xv").cast("decimal(19,0)")).as("sxx"),
      sum(col("yv").cast("decimal(19,0)") * col("yv").cast("decimal(19,0)")).as("syy"),
      sum(col("xv").cast("decimal(19,0)") * col("yv").cast("decimal(19,0)")).as("sxy"))
    val nD = col("n").cast("double")
    val aa = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val bb = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    val cc = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val withMom = base.join(broadcast(mom), "g")
    val dxs = (col("n") * col("xv") - col("sx")).cast("double")
    val dys = ((col("n").cast("decimal(19,0)") * col("yv").cast("decimal(19,0)")) -
      col("sy").cast("decimal(19,0)")).cast("double")
    val d2 = (bb * (dxs * dxs) - lit(2.0) * cc * (dxs * dys) + aa * (dys * dys)) /
      (aa * bb - cc * cc)
    // Single-pass argmax: the old peak-then-equality-join shape scanned
    // the scored rows TWICE (once for max(d2), once to re-derive d2 and
    // filter d2 === max_d2 — the d2 arithmetic is the expensive part).
    // max(struct(d2, -id)) picks the same row in one map-side-combinable
    // aggregation: largest d2 first, then largest -id = SMALLEST id —
    // exactly the old min(id)-among-max rows tiebreak, on the identical
    // per-row doubles, so the result is bit-for-bit unchanged.
    val best = withMom.select(col("g"), col("id"), d2.as("d2"))
      .groupBy("g")
      .agg(max(struct(col("d2"), (-col("id")).as("nid"))).as("m"))
    best
      .select(col("g"), (-col("m.nid")).as("outlier_id"), col("m.d2").as("max_d2"))
      .join(broadcast(mom.select(col("g"), col("n"))), "g")
      .select(col("g").as(groupCol), col("n"), col("outlier_id"), col("max_d2"))
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement of a
    * FIXED panel of `nRaters` raters over many items — the multi-rater
    * generalization of [[cohensKappa]]. From the (item, category)
    * rating rows: P̄ = (ΣΣn_ij² − N·n)/(N·n·(n−1)), P_e = Σ_j(Σ_i
    * n_ij)²/(N·n)², κ = (P̄−P_e)/(1−P_e) — integer sums end-to-end
    * (squares in DECIMAL(38,0)), one scalar double tree. Items with a
    * different rating count are EXCLUDED (the complete-blocks rule,
    * like cronbachAlpha).
    */
  def fleissKappa(ratings: DataFrame, itemCol: String, categoryCol: String,
                  nRaters: Int): DataFrame = {
    val cnt = ratings.groupBy(col(itemCol).as("item"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("nij"))
    val complete = cnt.groupBy("item").agg(sum("nij").as("tot"))
      .filter(col("tot") === nRaters).select("item")
    val kept = cnt.join(complete, "item")
    val perItem = kept.agg(
      countDistinct(col("item")).as("n_items"),
      sum(col("nij").cast("decimal(19,0)") * col("nij").cast("decimal(19,0)")).as("s2"))
    val perCat = kept.groupBy("cat").agg(sum("nij").as("mj"))
      .agg(sum(col("mj").cast("decimal(19,0)") * col("mj").cast("decimal(19,0)")).as("m2"))
    val nI = col("n_items").cast("double")
    val nR = lit(nRaters.toDouble)
    val pbar = (col("s2").cast("double") - nI * nR) / (nI * nR * (nR - lit(1.0)))
    val pe = col("m2").cast("double") / (nI * nR * (nI * nR))
    perItem.crossJoin(broadcast(perCat))
      .select(col("n_items"), lit(nRaters).as("n_raters"),
        round(pbar, 6).as("p_bar"), round(pe, 6).as("p_e"),
        round((pbar - pe) / (lit(1.0) - pe), 6).as("fleiss_kappa"))
  }

  /** Atkinson inequality index at ε = 1 (Atkinson 1970): A = 1 −
    * geomean/mean — the welfare-weighted member of the Gini/Lorenz
    * family (1 % transfer at the bottom moves A more than at the top).
    * Computed at DISTINCT-VALUE grain: the log sum runs over the value
    * histogram (Σ c·ln v, cardinality-bounded) not over rows, the
    * totals are exact integers, and the final form is one scalar
    * expression. Non-positive values are excluded (ln undefined) and
    * counted in the output.
    */
  def atkinson(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), v.cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    hist.groupBy("g").agg(
      sum(when(col("v") > 0, col("c")).otherwise(0L)).as("n"),
      sum(when(col("v") > 0, col("c") * col("v")).otherwise(0L)).as("sv"),
      sum(when(col("v") > 0, col("c").cast("double") * log(col("v").cast("double")))
        .otherwise(lit(0.0))).as("slog"),
      sum(when(col("v") <= 0, col("c")).otherwise(0L)).as("n_excluded"))
      .select(col("g").as(groupCol), col("n"), col("n_excluded"),
        round(lit(1.0) - exp(col("slog") / col("n").cast("double")) /
          (col("sv").cast("double") / col("n").cast("double")), 6).as("atkinson"))
  }

  /** Standardized mean difference covariate-balance check per stratum
    * (Austin 2009; Rosenbaum & Rubin 1983's balance diagnostic):
    * SMD = (x̄ₜ−x̄꜀)/√((s²ₜ+s²꜀)/2) — the causal-inference gate that a
    * stratification/matching actually balanced the covariate (|SMD| <
    * 0.1 is the usual bar). Exact integer moments per (stratum, arm),
    * one scalar double tree; NULL when both variances vanish.
    */
  def smdBalance(df: DataFrame, stratumCol: String, isTreated: Column,
                 x: Column): DataFrame = {
    val m = df.select(col(stratumCol).as("s"), isTreated.as("t"), x.cast("long").as("x"))
      .groupBy("s", "t")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")).as("sxx"))
    def arm(flag: Boolean, suffix: String) =
      m.filter(col("t") === flag)
        .select(col("s"), col("n").as(s"n$suffix"), col("sx").as(s"sx$suffix"),
          col("sxx").as(s"sxx$suffix"))
    def mean(sfx: String) = col(s"sx$sfx").cast("double") / col(s"n$sfx").cast("double")
    def variance(sfx: String) =
      (col(s"sxx$sfx").cast("double") -
        col(s"sx$sfx").cast("double") * col(s"sx$sfx").cast("double") /
          col(s"n$sfx").cast("double")) / (col(s"n$sfx") - 1).cast("double")
    arm(true, "_t").join(arm(false, "_c"), "s")
      .select(col("s").as(stratumCol), col("n_t"), col("n_c"),
        when(variance("_t") + variance("_c") > 0,
          (mean("_t") - mean("_c")) /
            sqrt((variance("_t") + variance("_c")) / lit(2.0))).as("smd"))
  }

  /** Youden's J optimal threshold (Youden 1950): over the DISTINCT-
    * score histogram, the cut t maximizing J = TPR−FPR for the rule
    * "positive iff score ≥ t". The argmax is decided by the EXACT
    * integer cross product TP·N₋ − FP·N₊ (no float tie), elected via
    * a one-row max join; ties break to the smallest threshold.
    * Score-histogram grain like [[aucRoc]] — never a row sort.
    */
  def youdenJ(df: DataFrame, isPos: Column, score: Column): DataFrame = {
    val hist = df.select(score.cast("long").as("v"), isPos.as("grp"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"), sum(when(col("grp"), 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("v"))
    val tot = hist.agg(sum("c1").as("p"), sum(col("c") - col("c1")).as("nn"))
    val cands = hist
      .withColumn("cumPos", sum("c1").over(w) - col("c1"))
      .withColumn("cumNeg", sum(col("c") - col("c1")).over(w) - (col("c") - col("c1")))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("p"), col("nn"),
        (col("p") - col("cumPos")).as("tp"),
        (col("nn") - col("cumNeg")).as("fp"))
      .withColumn("jnum",
        col("tp").cast("decimal(19,0)") * col("nn").cast("decimal(19,0)") -
          col("fp").cast("decimal(19,0)") * col("p").cast("decimal(19,0)"))
    val best = cands.agg(max("jnum").as("best_j"))
    cands.join(broadcast(best), col("jnum") === col("best_j"))
      .groupBy("jnum")
      .agg(min("v").as("threshold"), max("p").as("n_pos"), max("nn").as("n_neg"))
      .join(cands.select(col("v").as("threshold"), col("tp"), col("fp")), Seq("threshold"))
      .select(col("threshold"), col("n_pos"), col("n_neg"), col("tp"), col("fp"),
        (col("jnum").cast("double") /
          (col("n_pos").cast("decimal(19,0)") * col("n_neg").cast("decimal(19,0)"))
            .cast("double")).as("youden_j"))
  }

  /** Gini-impurity decision stump (Breiman et al. 1984 CART, one
    * node): the single threshold t on x minimizing the weighted child
    * impurity of the rule "left iff x < t" against a binary label —
    * the first split of every tree ensemble, as one relational pass.
    * Child impurity W = (nL²−posL²−negL²)/nL + (nR²−posR²−negR²)/nR
    * from exact DECIMAL squares over the distinct-value histogram;
    * the argmin is an equality join on the (engine-identical) double,
    * ties to the smallest threshold; gain = G_parent − W/n.
    */
  def giniStump(df: DataFrame, isPos: Column, x: Column): DataFrame = {
    val hist = df.select(x.cast("long").as("v"), isPos.as("grp"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"), sum(when(col("grp"), 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("v"))
    val tot = hist.agg(sum("c").as("n"), sum("c1").as("p"))
    def sq(c: Column) = c.cast("decimal(19,0)") * c.cast("decimal(19,0)")
    val cands = hist
      .withColumn("nl", sum("c").over(w) - col("c"))
      .withColumn("pl", sum("c1").over(w) - col("c1"))
      .crossJoin(broadcast(tot))
      .filter(col("nl") > 0 && col("nl") < col("n"))
      .select(col("v"), col("n"), col("p"), col("nl"), col("pl"),
        ((sq(col("nl")) - sq(col("pl")) - sq(col("nl") - col("pl"))).cast("double") /
          col("nl").cast("double") +
          (sq(col("n") - col("nl")) - sq(col("p") - col("pl")) -
            sq(col("n") - col("nl") - (col("p") - col("pl")))).cast("double") /
            (col("n") - col("nl")).cast("double")).as("wimp"))
    val best = cands.agg(min("wimp").as("best_w"))
    val gp = (lit(1.0) - (sq(col("n_pos")) + sq(col("n") - col("n_pos"))).cast("double") /
      sq(col("n")).cast("double"))
    cands.join(broadcast(best), col("wimp") === col("best_w"))
      .groupBy("wimp")
      .agg(min("v").as("threshold"), max("n").as("n"), max("p").as("n_pos"))
      .join(cands.select(col("v").as("threshold"), col("nl"), col("pl")), Seq("threshold"))
      .select(col("threshold"), col("n"), col("nl").as("n_left"),
        (col("n") - col("nl")).as("n_right"),
        round(gp, 6).as("gini_parent"),
        round(col("wimp") / col("n").cast("double"), 6).as("child_impurity"),
        round(gp - col("wimp") / col("n").cast("double"), 6).as("gain"))
  }

  /** Bland-Altman agreement of two paired measurements (Bland & Altman
    * 1986): mean difference (bias) and the 95% limits of agreement
    * mean ± 1.96·sd over the paired diffs — the method-comparison
    * standard. Diffs are exact integers; one scalar tree at the end.
    */
  def blandAltman(df: DataFrame, a: Column, b: Column): DataFrame = {
    val d = df.select((a.cast("long") - b.cast("long")).as("d"))
    val nD = col("n").cast("double")
    val mean = col("sd1").cast("double") / nD
    val sd = sqrt((col("sd2").cast("double") -
      col("sd1").cast("double") * col("sd1").cast("double") / nD) / (nD - lit(1.0)))
    d.agg(count(lit(1)).as("n"), sum("d").as("sd1"),
        sum(col("d").cast("decimal(19,0)") * col("d").cast("decimal(19,0)")).as("sd2"))
      .select(col("n"), mean.as("mean_diff"), sd.as("sd_diff"),
        (mean - lit(1.96) * sd).as("loa_lo"),
        (mean + lit(1.96) * sd).as("loa_hi"))
  }

  /** One-way intraclass correlation ICC(1,1) (Shrout & Fleiss 1979)
    * over complete blocks: subjects × k measurements, ICC =
    * (MSB−MSW)/(MSB+(k−1)·MSW) from the one-way ANOVA identities —
    * "how much of the variance is BETWEEN subjects". Complete blocks
    * only (the cronbachAlpha rule); exact integer sums throughout.
    */
  def iccOneWay(df: DataFrame, subjectCol: String, v: Column): DataFrame = {
    val base = df.select(col(subjectCol).as("s"), v.cast("long").as("v"))
    val per = base.groupBy("s").agg(count(lit(1)).as("k"), sum("v").as("r"))
    val kMax = per.agg(max("k").as("k"))
    val complete = per.join(broadcast(kMax), "k").select(col("s"), col("k"), col("r"))
    val kept = base.join(complete.select("s", "k"), "s")
    val g = kept.agg(count(lit(1)).as("nk"), sum("v").as("gt"),
      sum(col("v").cast("decimal(19,0)") * col("v").cast("decimal(19,0)")).as("svv"),
      max("k").as("k"))
    val rr = complete.agg(count(lit(1)).as("n_subj"),
      sum(col("r").cast("decimal(19,0)") * col("r").cast("decimal(19,0)")).as("srr"))
    val nD = col("n_subj").cast("double")
    val kD = col("k").cast("double")
    val msb = (col("srr").cast("double") / kD -
      col("gt").cast("double") * col("gt").cast("double") / (nD * kD)) / (nD - lit(1.0))
    val msw = (col("svv").cast("double") - col("srr").cast("double") / kD) /
      (nD * (kD - lit(1.0)))
    // RAW doubles, never re-rounded: msb/msw sit at ~e9 magnitude where
    // round(x, 6) lands on half-ulp boundaries that Spark and DuckDB
    // resolve differently (the Granger/Durbin-Watson discipline — exact
    // integer sufficient statistics in, one identical scalar expression
    // tree out, which is bit-identical across engines).
    g.crossJoin(broadcast(rr))
      .select(col("n_subj"), col("k"),
        msb.as("msb"), msw.as("msw"),
        ((msb - msw) / (msb + (kD - lit(1.0)) * msw)).as("icc"))
  }

  /** Cochran's Q test (Cochran 1950) for k related binary treatments
    * over n blocks: Q = (k−1)·[k·ΣCⱼ² − (ΣCⱼ)²]/(k·ΣRᵢ − ΣRᵢ²) — the
    * binary Friedman / multi-treatment McNemar. All-integer sums
    * (DECIMAL squares); blocks with every or no treatment positive
    * contribute zero variance but stay in, per the classic form.
    */
  def cochranQ(df: DataFrame, blockCol: String, treatmentCol: String,
               hit: Column): DataFrame = {
    // The grid must be EXPLICIT: a block with no row for a treatment
    // is an x = 0 cell, not a missing one (blocks × k rows, k tiny).
    val tDim = df.select(col(treatmentCol).as("t")).distinct()
    val blocks = df.select(col(blockCol).as("b")).distinct()
    val pos = df.filter(hit)
      .select(col(blockCol).as("b"), col(treatmentCol).as("t")).distinct()
      .withColumn("hitx", lit(1L))
    val x = blocks.crossJoin(broadcast(tDim))
      .join(pos, Seq("b", "t"), "left")
      .select(col("b"), col("t"), coalesce(col("hitx"), lit(0L)).as("x"))
    val rows = x.groupBy("b").agg(sum("x").as("r"), count(lit(1)).as("k"))
    val cols_ = x.groupBy("t").agg(sum("x").as("c"))
    val rAgg = rows.agg(count(lit(1)).as("n_blocks"), max("k").as("k"),
      sum("r").as("sr"),
      sum(col("r").cast("decimal(19,0)") * col("r").cast("decimal(19,0)")).as("srr"))
    val cAgg = cols_.agg(
      sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")).as("scc"))
    val kD = col("k").cast("double")
    rAgg.crossJoin(broadcast(cAgg))
      .select(col("n_blocks"), col("k"),
        when(kD * col("sr").cast("double") - col("srr").cast("double") > 0,
          (kD - lit(1.0)) *
            (kD * col("scc").cast("double") -
              col("sr").cast("double") * col("sr").cast("double")) /
            (kD * col("sr").cast("double") - col("srr").cast("double")))
          .as("q_cochran"))
  }

  /** Page's trend test for ordered alternatives (Page 1963): L =
    * Σⱼ j·Rⱼ over Friedman ranks with the FIXED hypothesized item
    * order, z = (L−μ)/σ with μ = N·k(k+1)²/4 and σ² =
    * N·k²(k+1)(k²−1)/144 — "do the treatments trend in THIS order",
    * strictly sharper than Friedman's any-difference alternative.
    * Same complete-block half-rank machinery (exact integers; ranks
    * in half-units so L is exact in halves).
    */
  def pageTrend(df: DataFrame, itemCol: String, blockCol: String, v: Column,
                itemOrder: Seq[String]): DataFrame = {
    val base = df.select(col(itemCol).as("item"), col(blockCol).as("blk"), v.as("v"))
    val k = itemOrder.size
    val sz = base.groupBy("blk").agg(count(lit(1)).as("ci"))
    val cp = base.join(sz.filter(col("ci") === k).select("blk"), "blk")
    val wb = Window.partitionBy("blk").orderBy("v")
    val tie = Window.partitionBy("blk", "v")
    val ranked = cp.select(col("item"), col("blk"),
      (rank().over(wb) * 2 + count(lit(1)).over(tie) - 1).as("r2"))
    val weightExpr = itemOrder.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (it, idx)) => when(col("item") === it, lit((idx + 1).toLong)).otherwise(acc)
    }
    val items = ranked.groupBy("item")
      .agg(sum("r2").as("r2sum"), count(lit(1)).as("nb"))
      .select(col("item"), col("r2sum"), col("nb"), weightExpr.as("wj"))
    val agg = items.agg(sum(col("wj") * col("r2sum")).as("l2"), max("nb").as("n_blocks"))
    val nD = col("n_blocks").cast("double")
    val kD = lit(k.toDouble)
    val lStat = col("l2").cast("double") / lit(2.0)
    val mu = nD * kD * (kD + 1) * (kD + 1) / lit(4.0)
    val sigma = sqrt(nD * kD * kD * (kD + 1) * (kD * kD - 1) / lit(144.0))
    agg.select(col("n_blocks"), lit(k).as("k"),
      lStat.as("l_stat"), ((lStat - mu) / sigma).as("z_l"))
  }

  /** Isotonic (monotone non-decreasing) calibration of binned rates
    * via the MINIMAX identity (Ayer et al. 1955; Barlow et al. 1972):
    * ŷᵢ = min_{j≥i} max_{l≤i} rate(l..j) — the closed form of PAVA,
    * relational-friendly at bin grain: prefix sums over ≤bins rows,
    * then a bins³-bounded interval lattice (broadcast) instead of the
    * sequential pooling loop. Interval rates are single divisions of
    * exact integer sums, so the min/max lattice is engine-exact.
    */
  def isotonicCalibration(df: DataFrame, conf: Column, label: Column,
                          bins: Int): DataFrame = {
    val per = df
      .select(least(floor(conf * bins), lit(bins - 1)).cast("int").as("bin"),
        label.cast("long").as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = per.select(col("bin"), col("n"), col("sy"),
      sum("n").over(w).as("cn"), sum("sy").over(w).as("cy"))
    val lo = pre.select(col("bin").as("l"), (col("cn") - col("n")).as("pn"),
      (col("cy") - col("sy")).as("py"))
    val hi = pre.select(col("bin").as("j"), col("cn").as("jn"), col("cy").as("jy"))
    val intervals = broadcast(lo).crossJoin(broadcast(hi)).filter(col("l") <= col("j"))
      .select(col("l"), col("j"),
        ((col("jy") - col("py")).cast("double") /
          (col("jn") - col("pn")).cast("double")).as("rate"))
    val mids = pre.select(col("bin").as("i"), col("n"), col("sy"))
    val iso = broadcast(mids).join(broadcast(intervals),
        col("l") <= col("i") && col("i") <= col("j"))
      .groupBy("i", "j").agg(max("rate").as("mx"),
        max("n").as("n"), max("sy").as("sy"))
      .groupBy("i").agg(min("mx").as("iso_rate"),
        max("n").as("n"), max("sy").as("sy"))
    iso.select(col("i").as("bin"), col("n"),
      (col("sy").cast("double") / col("n").cast("double")).as("raw_rate"),
      col("iso_rate"))
  }

  /** Theil inequality index with its between/within DECOMPOSITION
    * (Theil 1967; Shorrocks 1980): T = T_between + Σ_g s_g·T_g — the
    * member of the inequality family (Gini/Lorenz/Atkinson) that
    * decomposes EXACTLY by group, answering "how much corpus
    * inequality lives between sources vs inside them". Per group:
    * T_g = Σ(x/X_g)ln(x·n_g/X_g) at DISTINCT-VALUE grain (Σc·v·ln v
    * is cardinality-bounded like [[atkinson]]); the between term uses
    * only (X_g, n_g). Non-positive values excluded.
    */
  def theilIndex(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), v.cast("long").as("v"))
      .filter(col("v") > 0)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val per = hist.groupBy("g").agg(
      sum("c").as("n_g"), sum(col("c") * col("v")).as("x_g"),
      sum(col("c").cast("double") * col("v").cast("double") *
        log(col("v").cast("double"))).as("sxlx"))
    val tot = per.agg(sum("n_g").as("n"), sum("x_g").as("x"))
    val xgD = col("x_g").cast("double")
    val tWithin = col("sxlx") / xgD -
      log(xgD / col("n_g").cast("double"))
    val share = xgD / col("x").cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("g").as(groupCol), col("n_g"), col("x_g"),
        round(share, 6).as("x_share"),
        round(tWithin, 6).as("t_within"),
        round(share * log(share / (col("n_g").cast("double") / col("n").cast("double"))), 6)
          .as("t_between_term"),
        round(share * tWithin, 6).as("t_within_contrib"))
  }

  /** Blinder-Oaxaca twofold decomposition (Blinder 1973; Oaxaca 1973)
    * of a group gap in mean outcome, pooled-coefficient reference
    * (Neumark 1988): gap = ȳ_A − ȳ_B = (x̄_A − x̄_B)·β_pooled
    * [EXPLAINED by the covariate] + residual [UNEXPLAINED] — the
    * decomposition every disparity audit starts from. Single
    * regressor, exact integer moments per arm and pooled, one scalar
    * tree.
    */
  def oaxacaTwofold(df: DataFrame, isA: Column, x: Column, y: Column): DataFrame = {
    val base = df.select(isA.as("a"), x.cast("long").as("x"), y.cast("long").as("y"))
    val per = base.groupBy("a").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
    def arm(flag: Boolean, sfx: String) = per.filter(col("a") === flag)
      .select(col("n").as(s"n$sfx"), col("sx").as(s"sx$sfx"), col("sy").as(s"sy$sfx"))
    val pooled = base.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      dsum(col("x"), col("x")).as("sxx"), dsum(col("x"), col("y")).as("sxy"))
    val beta = (col("sxy") * col("n").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (col("sxx") * col("n").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    def mean(c: String, nn: String) = col(c).cast("double") / col(nn).cast("double")
    val gap = mean("sy_a", "n_a") - mean("sy_b", "n_b")
    val explained = (mean("sx_a", "n_a") - mean("sx_b", "n_b")) * col("beta_pooled")
    arm(true, "_a").crossJoin(broadcast(arm(false, "_b")))
      .crossJoin(broadcast(pooled.select(beta.as("beta_pooled"))))
      .select(col("n_a"), col("n_b"),
        round(col("beta_pooled"), 6).as("beta_pooled"),
        round(gap, 6).as("gap"),
        round(explained, 6).as("explained"),
        round(gap - explained, 6).as("unexplained"))
  }

  /** l-diversity audit (Machanavalli et al. 2007) — [[kAnonymityAudit]]'s
    * sibling on the SENSITIVE attribute: a quasi-identifier class is
    * safe only if it contains at least `l` DISTINCT sensitive values
    * (k-anonymity alone leaks when a whole class shares one diagnosis).
    * Exact distinct counts per class; the audit emits every class with
    * its size, diversity, and the suppression verdict.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String], sensitive: Column,
                      l: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("suppressed", col("l_div") < l)
}
