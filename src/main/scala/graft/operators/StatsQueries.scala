package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Oracle-checked queries for the classical-statistics layer
  * (Stats.scala, Graph.localClustering, TimeSeries.cdcApply /
  * attribution).
  *
  * Exactness contract per SURVEY.md §5: regression/correlation/rank
  * statistics flow through exact integer (long or DECIMAL(38,0) ≡
  * DuckDB HUGEINT) sums and only divide at the end; CUSUM argmax and
  * Gini are integer-exact throughout; the two log-based statistics
  * (Hill estimator; Benford expectations) round at 4dp like the
  * KL/perplexity family.
  */
object StatsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** lineitem regression pair: x = quantity (integral), y = price in
    * exact cents. Shared by the OLS/Pearson/Spearman trio.
    */
  private def xyPair(t: Tables): DataFrame =
    t.lineitem.select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))

  private def centsValue = round(col("value") * 100).cast("long")

  val queries: Map[String, Q] = Map(
    // #86b per-group OLS fit: does price scale linearly with quantity
    // within a return class (it should: r2 ≈ 1 line per part mix).
    "q_ols_fit" -> { (s, dir) =>
      Stats.olsFit(xyPair(Tables(s, dir)), "l_returnflag", col("x"), col("y"))
    },

    // #86c Pearson correlation from the same exact-sum machinery.
    "q_pearson" -> { (s, dir) =>
      Stats.pearson(xyPair(Tables(s, dir)), "l_returnflag", col("x"), col("y"))
    },

    // #86d Spearman rank correlation (tie-averaged ranks kept exact in
    // half-rank units).
    "q_spearman" -> { (s, dir) =>
      Stats.spearman(xyPair(Tables(s, dir)), "l_returnflag", col("x"), col("y"))
    },

    // First-order partial correlation r_xy·z (Yule 1907): the
    // quantity–price association with the discount rate partialled
    // out — nine exact sums, one aggregation.
    "q_partial_corr" -> { (s, dir) =>
      val t = Tables(s, dir).lineitem.select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"),
        round(col("l_discount") * 100).cast("long").as("z"))
      Stats.partialCorrelation(t, "l_returnflag", col("x"), col("y"), col("z"))
    },

    // #86e Mann-Whitney U: purchase vs click order values — the
    // nonparametric "did the distribution shift" test.
    "q_mannwhitney" -> { (s, dir) =>
      val ev = Tables(s, dir).events.filter(col("event_type").isin("purchase", "click"))
      Stats.mannWhitneyU(ev, col("event_type") === "purchase", col("value"))
    },

    // #86f two-proportion z per order priority vs the pooled rest
    // (the A/B experiment readout).
    "q_ab_test" -> { (s, dir) =>
      Stats.twoProportionZ(Tables(s, dir).orders, "o_orderpriority",
        col("o_orderstatus") === "F")
    },

    // #85c CUSUM change point per event series, integer-exact argmax.
    "q_cusum" -> { (s, dir) =>
      Stats.cusumChangePoint(Tables(s, dir).events, "event_type",
        col("ts"), centsValue, col("event_id"))
        .select(col("event_type"), col("n"), col("cp_index"),
          unix_millis(col("cp_at")).as("cp_ms"), col("cusum_stat"))
    },

    // #85d lag-1..3 autocorrelation per event series.
    "q_acf" -> { (s, dir) =>
      Stats.autocorrelation(Tables(s, dir).events, "event_type",
        col("ts"), centsValue, col("event_id"), maxLag = 3)
    },

    // #86g Gini concentration of document length per source —
    // corpus-inequality health metric, integer-exact.
    "q_gini" -> { (s, dir) =>
      Stats.gini(Tables(s, dir).documents, "source", col("n_chars"), col("doc_id"))
    },

    // #86h Benford first-digit audit over order totals.
    "q_benford" -> { (s, dir) =>
      Stats.benfordDigits(Tables(s, dir).orders, col("o_totalprice"))
    },

    // #86i Hill tail-index of document length per source (k = 10 top
    // order statistics at harness scale).
    "q_hill_tail" -> { (s, dir) =>
      Stats.hillTail(Tables(s, dir).documents, "source", col("n_chars"),
        col("doc_id"), k = 10)
    },

    // #79b local clustering coefficient over the word-adjacency graph
    // (same graph as q_triangles); vertices are word hashes, so the
    // oracle compares the relabeling-invariant (coef-bucket, degree,
    // triangle) aggregates.
    "q_clustering_coef" -> { (s, dir) =>
      val pairs = TextRank.adjacentPairRows(Tables(s, dir).documents, "text")
        .select(xxhash64(col("w1")).as("src"), xxhash64(col("w2")).as("dst"))
      Graph.localClustering(pairs, "src", "dst")
        .groupBy(floor(col("coef") * 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"), sum("deg").as("sum_deg"),
          sum("tri").as("sum_tri"))
    },

    // #80b CDC changelog apply: latest op per user wins; a user whose
    // latest event is the synthetic delete marker ('error') vanishes.
    "q_cdc_apply" -> { (s, dir) =>
      TimeSeries.cdcApply(Tables(s, dir).events, "user_id",
        Seq(col("ts"), col("event_id")), col("event_type") === "error")
        .select(col("user_id"), col("event_type").as("last_op"),
          round(col("value"), 2).as("last_value"),
          unix_millis(col("ts")).as("ts_ms"), col("n_changes"))
    },

    // #77b multi-touch attribution: last-touch + linear credit per
    // channel within a 48h lookback; linear shares exact in ppm.
    "q_attribution" -> { (s, dir) =>
      TimeSeries.attribution(Tables(s, dir).events, "user_id", "ts",
        "event_type", convType = "purchase",
        touchTypes = Seq("click", "view", "signup"),
        lookbackMs = 48L * 3600 * 1000)
    },

    // Time-DECAY multi-touch attribution: integer power-of-two
    // weights (half-life one day), per-conversion ppm shares by
    // integer division — no float anywhere.
    "q_attribution_decay" -> { (s, dir) =>
      TimeSeries.attributionDecay(Tables(s, dir).events, "user_id", "ts",
        "event_type", convType = "purchase",
        touchTypes = Seq("click", "view", "signup"),
        lookbackMs = 48L * 3600 * 1000, capDays = 30)
    },

    // Wald SPRT daily ledger (Wald 1945): cumulative LLR per variant
    // with the always-valid peek bounds — the sequential companion to
    // the fixed-horizon q_ab_test. Constants inlined identically into
    // both engines.
    "q_sprt" -> { (s, dir) =>
      val e = Tables(s, dir).events.select(
        concat(lit("v"), (col("user_id") % 3).cast("string")).as("variant"),
        (floor(col("ts").cast("long") / 86400) * 86400).cast("long").as("d"),
        (col("event_type") === "purchase").as("conv"))
      Stats.sprtLedger(e, "variant", col("d"), col("conv"),
        p0 = 0.18, p1 = 0.22, alpha = 0.05, beta = 0.2)
    },

    // Wald–Wolfowitz runs test per user: does the above/below-mean
    // sign sequence cluster or alternate? Integer dichotomization
    // (v·N > Σv), closed-form z mirrored op-for-op.
    "q_runs_test" -> { (s, dir) =>
      Stats.runsTest(
        Tables(s, dir).events.select(col("user_id"),
          col("ts").cast("long").as("sec"), col("event_id"),
          round(col("value") * 100).cast("long").as("c")),
        "user_id", Seq(col("sec"), col("event_id")), col("c"), minN = 20L)
    },

    // Functional-dependency violation screen (Potter's Wheel / Deequ
    // style): which candidate key→attribute dependencies actually
    // hold, with ppm violation rates — integer end to end.
    // NO Par.spread on fd_profile (r14 A/B): three FD aggregations
    // multiply the widened task count — cpu 2.9->10.4 s, wall floor
    // 0.95->1.45 s.
    "q_fd_profile" -> { (s, dir) =>
      DataOps.fdProfile(
        Tables(s, dir).lineitem.select("l_orderkey", "l_suppkey", "l_partkey"),
        Seq(("l_orderkey", "l_suppkey", "l_orderkey->l_suppkey"),
          ("l_partkey", "l_suppkey", "l_partkey->l_suppkey"),
          ("l_suppkey", "l_partkey", "l_suppkey->l_partkey")))
    },

    // #86n Welch's unequal-variance t-test: purchase vs click order
    // values, exact sufficient statistics.
    "q_welch_t" -> { (s, dir) =>
      val ev = Tables(s, dir).events.filter(col("event_type").isin("purchase", "click"))
      Stats.welchT(ev, col("event_type") === "purchase", centsValue)
    },

    // #85i peak-concurrency sweep line: users' per-day presence
    // intervals ([first ms, last ms] per user per epoch-day), global
    // running +1/−1 sum, per-day peak + first attainment.
    "q_concurrency" -> { (s, dir) =>
      val iv = Tables(s, dir).events
        .select(col("user_id"), unix_millis(col("ts")).as("ms"))
        .groupBy(col("user_id"), floor(col("ms") / lit(86400000L)).cast("long").as("d"))
        .agg(min("ms").as("s_ms"), max("ms").as("e_ms"))
      TimeSeries.peakConcurrency(iv, col("s_ms"), col("e_ms"))
    },

    // #91 mask-based format profiling of three string columns — the
    // schema-drift screen over heterogeneous sources.
    "q_format_profile" -> { (s, dir) =>
      val t = Tables(s, dir)
      DataOps.formatProfile(t.customer, "c_name")
        .unionByName(DataOps.formatProfile(t.orders, "o_orderpriority"))
        .unionByName(DataOps.formatProfile(t.events, "props"))
    },

    // #86o one-way ANOVA: does event value differ across event types?
    "q_anova" -> { (s, dir) =>
      Stats.anovaOneWay(Tables(s, dir).events, "event_type", centsValue)
    },

    // #92 Laplace-noised count release per source (hash-derived noise,
    // scale 1/0.5) — the MECHANISM of a DP count publication; the
    // deterministic form carries no epsilon label by design (see
    // Stats.laplaceNoisedCounts).
    "q_dp_release" -> { (s, dir) =>
      Stats.laplaceNoisedCounts(Tables(s, dir).documents, "source", epsilon = 0.5, seed = 23L)
    },

    // #92b k-anonymity audit on customer quasi-identifiers (nation,
    // market segment, 1000-unit balance bucket — cents-integer
    // arithmetic, offset so the div never sees a negative): classes
    // below k=5 are the ones a release must suppress.
    "q_k_anonymity" -> { (s, dir) =>
      val c = Tables(s, dir).customer.withColumn("bal_kbucket",
        expr("(cast(round(c_acctbal * 100) as bigint) + 1000000) div 100000"))
      Stats.kAnonymityAudit(c, Seq("c_nationkey", "c_mktsegment", "bal_kbucket"), k = 5L)
    },

    // #85c burstiness: Fano factor of daily event counts per type
    // (1 = Poisson, >1 bursty).
    "q_burstiness" -> { (s, dir) =>
      Stats.fanoBurstiness(Tables(s, dir).events, "event_type", to_date(col("ts")))
    },

    // #86p distribution-free median CI per event type (order-statistic
    // interval — no bootstrap, no normality assumption).
    "q_median_ci" -> { (s, dir) =>
      Stats.medianCi(Tables(s, dir).events, "event_type", centsValue)
    },

    // #86q weighted median of line price weighted by quantity.
    "q_weighted_median" -> { (s, dir) =>
      Stats.weightedMedian(Tables(s, dir).lineitem, "l_returnflag",
        round(col("l_extendedprice") * 100).cast("long"), col("l_quantity").cast("long"))
    },

    // #91 difference-in-differences: even-user cohort treated, second
    // half of the month is the post period.
    "q_did" -> { (s, dir) =>
      Stats.diffInDiff(Tables(s, dir).events,
        col("user_id") % 2 === 0, dayofmonth(col("ts")) >= 16, centsValue)
    },

    // #86r Kruskal-Wallis H across event types — the nonparametric
    // sibling of q_anova on the same half-rank histogram machinery.
    "q_kruskal" -> { (s, dir) =>
      Stats.kruskalWallis(Tables(s, dir).events, "event_type", centsValue)
    },

    // #86t Cliff's delta: the effect size q_mannwhitney's p-value
    // needs next to it (purchase values vs the rest).
    "q_cliffs_delta" -> { (s, dir) =>
      Stats.cliffsDelta(Tables(s, dir).events,
        col("event_type") === "purchase", centsValue)
    },

    // #91b off-policy IPS/SNIPS evaluation of a purchase-heavy target
    // policy against the logged uniform-ish behavior, with effective
    // sample size.
    "q_ips_eval" -> { (s, dir) =>
      Stats.ipsPolicyValue(Tables(s, dir).events, "event_type", centsValue,
        Seq("purchase" -> 0.6, "click" -> 0.1, "view" -> 0.1,
          "signup" -> 0.1, "error" -> 0.1))
    },

    // #91c CUPED variance reduction on the same arms as q_did;
    // covariate = props payload length (a synthetic stand-in for the
    // pre-experiment metric — the mechanics are what is exercised).
    "q_cuped" -> { (s, dir) =>
      Stats.cuped(Tables(s, dir).events, col("user_id") % 2 === 0,
        centsValue, length(col("props")).cast("long"))
    },

    // #42u2 leave-one-out target encoding of order priority against
    // order value — mean encoding with the self-leakage guard.
    "q_target_encode" -> { (s, dir) =>
      Stats.targetEncodeLoo(
        Tables(s, dir).orders.select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("y_cents")),
        "o_orderpriority", col("y_cents"))
        .select("o_orderkey", "o_orderpriority", "loo_enc")
    },

    // #86u Brown-Forsythe: are the event types' value SPREADS equal —
    // the variance-homogeneity precondition q_anova silently assumes,
    // run on the same cents column at histogram grain.
    "q_brown_forsythe" -> { (s, dir) =>
      Stats.brownForsythe(Tables(s, dir).events, "event_type", centsValue)
    },

    // #86v Jarque-Bera normality screen per event type (skewness,
    // kurtosis, JB) — one aggregation over exact power sums.
    "q_jarque_bera" -> { (s, dir) =>
      Stats.jarqueBera(Tables(s, dir).events, "event_type", centsValue)
    },

    // #86w Grubbs single-outlier statistic on order totals per
    // priority class: how many σ the worst order sits from its class
    // mean, and which endpoint it is.
    "q_grubbs" -> { (s, dir) =>
      Stats.grubbs(Tables(s, dir).orders, "o_orderpriority",
        round(col("o_totalprice") * 100).cast("long"))
    },

    // #86x two-feature regression: price on quantity AND discount
    // points per return class — does discount carry signal once
    // quantity is controlled for.
    "q_ols_multi" -> { (s, dir) =>
      Stats.ols2(Tables(s, dir).lineitem, "l_returnflag",
        col("l_quantity").cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
    },

    // #86y Kendall τ-b between quantity and discount points per
    // return class — bounded-cardinality pair (50 × 11 cells), the
    // regime the joint-histogram pair join is for.
    "q_kendall" -> { (s, dir) =>
      Stats.kendallTauB(Tables(s, dir).lineitem, "l_returnflag",
        col("l_quantity").cast("long"), round(col("l_discount") * 100).cast("long"))
    },

    // Somers' D with the binary deep-discount OUTCOME on the
    // tie-excluded axis — the scoring-industry Gini (2·AUC−1) of
    // quantity as a discount predictor, at joint-histogram grain like
    // q_kendall.
    "q_somers_d" -> { (s, dir) =>
      Stats.somersD(Tables(s, dir).lineitem, "l_returnflag",
        (round(col("l_discount") * 100) >= 5).cast("long"),
        col("l_quantity").cast("long"))
    },

    // Herfindahl concentration of per-user activity within each event
    // type: is any event stream dominated by few actors?
    "q_hhi" -> { (s, dir) =>
      Stats.hhi(Tables(s, dir).events, "event_type", "user_id")
    },

    // Lorenz curve of document length per source — the inequality
    // curve q_gini summarizes, decile by decile, ranked by GlobalRank
    // (no single-task sort).
    "q_lorenz" -> { (s, dir) =>
      Stats.lorenzDeciles(Tables(s, dir).documents, "source",
        col("n_chars"), col("doc_id"))
    },

    // 2-D Mahalanobis screen: the most atypical (quantity, price)
    // line per return class under the class's own covariance.
    "q_mahalanobis" -> { (s, dir) =>
      Stats.mahalanobisScreen(Tables(s, dir).lineitem, "l_returnflag",
        col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        (col("l_orderkey") * 100 + col("l_linenumber")).cast("long"))
    },

    // l-diversity audit on the same quasi-identifier classes as
    // q_k_anonymity, with market segment as the sensitive attribute.
    "q_l_diversity" -> { (s, dir) =>
      val c = Tables(s, dir).customer.withColumn("bal_kbucket",
        expr("(cast(round(c_acctbal * 100) as bigint) + 1000000) div 100000"))
      Stats.lDiversityAudit(c, Seq("c_nationkey", "bal_kbucket"),
        col("c_mktsegment"), l = 3L)
    },

    // Atkinson inequality (epsilon = 1) of document length per source
    // — the welfare-weighted member of the gini/lorenz family, at
    // value-histogram grain.
    "q_atkinson" -> { (s, dir) =>
      Stats.atkinson(Tables(s, dir).documents, "source", col("n_chars"))
    },

    // Covariate-balance SMD per priority stratum: did stratifying on
    // order priority balance order value across the F/other arms?
    "q_smd_balance" -> { (s, dir) =>
      Stats.smdBalance(Tables(s, dir).orders,
        "o_orderpriority", col("o_orderstatus") === "F",
        round(col("o_totalprice") * 100).cast("long"))
        .withColumnRenamed("o_orderpriority", "stratum")
    },

    // Youden's J optimal spend threshold for "is this a purchase" —
    // integer-exact argmax over the distinct-cents histogram.
    "q_youden" -> { (s, dir) =>
      Stats.youdenJ(Tables(s, dir).events,
        col("event_type") === "purchase", centsValue)
    },

    // Cochran's Q: do the five event types differ in their >=5.00
    // conversion rate across users (binary Friedman)?
    "q_cochran_q" -> { (s, dir) =>
      Stats.cochranQ(Tables(s, dir).events, "user_id", "event_type",
        centsValue >= 500L)
    },

    // Decision-stump split: the spend threshold best separating
    // purchases by Gini impurity — CART's first node as one pass.
    "q_stump_split" -> { (s, dir) =>
      Stats.giniStump(Tables(s, dir).events,
        col("event_type") === "purchase", centsValue)
    },

    // Theil index with its exact between/within decomposition: how
    // much document-length inequality lives between sources vs inside
    // them.
    "q_theil_index" -> { (s, dir) =>
      Stats.theilIndex(Tables(s, dir).documents, "source", col("n_chars"))
    },

    // Blinder-Oaxaca twofold decomposition of the F-vs-rest gap in
    // order value: how much does the priority mix explain?
    "q_oaxaca" -> { (s, dir) =>
      Stats.oaxacaTwofold(Tables(s, dir).orders,
        col("o_orderstatus") === "F",
        expr("cast(substring(o_orderpriority, 1, 1) as long)"),
        round(col("o_totalprice") * 100).cast("long"))
    },

    // Simpson's-paradox screen (Simpson 1951): per-group quantity →
    // discount slopes against the pooled slope, flagging sign flips —
    // the aggregation-bias sanity check before any pooled regression
    // is trusted.
    "q_simpson_flip" -> { (s, dir) =>
      val t = Tables(s, dir).lineitem
      val x = col("l_quantity").cast("long")
      val y = round(col("l_discount") * 100).cast("long")
      val per = Stats.olsFit(t, "l_returnflag", x, y)
        .select(col("l_returnflag"), col("n"), col("slope"))
      val pooled = Stats.olsFit(t.withColumn("__all", lit("all")), "__all", x, y)
        .select(col("slope").as("pooled_slope"))
      per.crossJoin(broadcast(pooled))
        .select(col("l_returnflag"), col("n"), col("slope"), col("pooled_slope"),
          ((col("slope") > 0) =!= (col("pooled_slope") > 0)).as("flipped"))
    }
  )

  /** Shared CTE: the regression pair in exact integers. */
  private val xyCte =
    """t AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem)""".stripMargin

  /** Shared CTE: the five exact sums feeding OLS/Pearson closed forms. */
  private val sumsCte =
    """s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |        sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
      |        sum(CAST(x AS HUGEINT) * x)::DOUBLE AS sxx,
      |        sum(CAST(x AS HUGEINT) * y)::DOUBLE AS sxy,
      |        sum(CAST(y AS HUGEINT) * y)::DOUBLE AS syy
      |      FROM t GROUP BY g)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ols_fit" ->
      s"""WITH $xyCte,
         |$sumsCte
         |SELECT g AS l_returnflag, n,
         |  round((sxy * n - sx * sy) / (sxx * n - sx * sx), 6) + 0.0 AS slope,
         |  round((sy - ((sxy * n - sx * sy) / (sxx * n - sx * sx)) * sx) / n, 6) + 0.0 AS intercept,
         |  round(((sxy * n - sx * sy) * (sxy * n - sx * sy)) /
         |        ((sxx * n - sx * sx) * (syy * n - sy * sy)), 6) + 0.0 AS r2
         |FROM s""".stripMargin,
    "q_pearson" ->
      s"""WITH $xyCte,
         |$sumsCte
         |SELECT g AS l_returnflag, n,
         |  round((sxy * n - sx * sy) /
         |        (sqrt(sxx * n - sx * sx) * sqrt(syy * n - sy * sy)), 6) + 0.0 AS pearson_r
         |FROM s""".stripMargin,
    "q_partial_corr" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(round(l_discount*100) AS BIGINT) AS z FROM lineitem),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |        sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy, sum(z)::DOUBLE AS sz,
        |        sum(CAST(x AS HUGEINT) * x)::DOUBLE AS sxx,
        |        sum(CAST(y AS HUGEINT) * y)::DOUBLE AS syy,
        |        sum(CAST(z AS HUGEINT) * z)::DOUBLE AS szz,
        |        sum(CAST(x AS HUGEINT) * y)::DOUBLE AS sxy,
        |        sum(CAST(x AS HUGEINT) * z)::DOUBLE AS sxz,
        |        sum(CAST(y AS HUGEINT) * z)::DOUBLE AS syz
        |      FROM t GROUP BY g),
        |r AS (SELECT g, n,
        |        (sxy * n - sx * sy) /
        |          (sqrt(sxx * n - sx * sx) * sqrt(syy * n - sy * sy)) AS rxy,
        |        (sxz * n - sx * sz) /
        |          (sqrt(sxx * n - sx * sx) * sqrt(szz * n - sz * sz)) AS rxz,
        |        (syz * n - sy * sz) /
        |          (sqrt(syy * n - sy * sy) * sqrt(szz * n - sz * sz)) AS ryz
        |      FROM s)
        |SELECT g AS l_returnflag, n, round(rxy, 6) + 0.0 AS r_xy,
        |  CASE WHEN sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) > 0
        |       THEN round((rxy - rxz * ryz) /
        |              sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6) + 0.0
        |  END AS r_xy_given_z
        |FROM r""".stripMargin,
    "q_spearman" ->
      s"""WITH $xyCte,
         |r AS (SELECT g,
         |        CAST(rank() OVER (PARTITION BY g ORDER BY x) * 2 +
         |             count(*) OVER (PARTITION BY g, x) - 1 AS BIGINT) AS x,
         |        CAST(rank() OVER (PARTITION BY g ORDER BY y) * 2 +
         |             count(*) OVER (PARTITION BY g, y) - 1 AS BIGINT) AS y
         |      FROM t),
         |${sumsCte.replace("FROM t ", "FROM r ")}
         |SELECT g AS l_returnflag, n,
         |  round((sxy * n - sx * sy) /
         |        (sqrt(sxx * n - sx * sx) * sqrt(syy * n - sy * sy)), 6) + 0.0 AS spearman_rho
         |FROM s""".stripMargin,
    "q_mannwhitney" ->
      """WITH t AS (SELECT value AS v, event_type = 'purchase' AS grp FROM events
        |           WHERE event_type IN ('purchase', 'click')),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM t GROUP BY v),
        |r AS (SELECT c1, c, sum(c) OVER (ORDER BY v) - c AS cumPrev FROM h),
        |a AS (SELECT CAST(sum(c1 * (cumPrev * 2 + c + 1)) AS BIGINT) AS r2sum1,
        |        CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c - c1) AS BIGINT) AS n2 FROM r)
        |SELECT n1, n2,
        |  round((r2sum1::DOUBLE - n1::DOUBLE * (n1::DOUBLE + 1)) / 2.0, 1) + 0.0 AS u_stat,
        |  round(((r2sum1::DOUBLE - n1::DOUBLE * (n1::DOUBLE + 1)) / 2.0 -
        |         n1::DOUBLE * n2::DOUBLE / 2.0) /
        |        sqrt(n1::DOUBLE * n2::DOUBLE * (n1::DOUBLE + n2::DOUBLE + 1) / 12.0), 4) + 0.0
        |    AS z_score
        |FROM a""".stripMargin,
    "q_ab_test" ->
      """WITH per AS (SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |      FROM orders GROUP BY g),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(conv) AS BIGINT) AS tconv FROM per),
        |sel AS (SELECT g, n, conv,
        |          conv::DOUBLE AS c1, n::DOUBLE AS n1,
        |          (tconv - conv)::DOUBLE AS c2, (tn - n)::DOUBLE AS n2
        |        FROM per, tot)
        |SELECT g AS o_orderpriority, n, conv,
        |  round(c1 / n1, 6) + 0.0 AS p_variant,
        |  round(c2 / n2, 6) + 0.0 AS p_rest,
        |  round((c1 / n1 - c2 / n2) /
        |        sqrt((c1 + c2) / (n1 + n2) * (1.0 - (c1 + c2) / (n1 + n2)) *
        |             (1.0 / n1 + 1.0 / n2)), 4) + 0.0 AS z_score
        |FROM sel""".stripMargin,
    "q_cusum" ->
      """WITH t AS (SELECT event_type AS g, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |s AS (SELECT g, ts,
        |        row_number() OVER w AS i,
        |        sum(x) OVER w * count(*) OVER (PARTITION BY g) -
        |          row_number() OVER w * sum(x) OVER (PARTITION BY g) AS dev,
        |        count(*) OVER (PARTITION BY g) AS n
        |      FROM t WINDOW w AS (PARTITION BY g ORDER BY ts, event_id)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY abs(dev) DESC, i) AS rn FROM s)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n, CAST(i AS INTEGER) AS cp_index,
        |       epoch_ms(ts) AS cp_ms,
        |       round(abs(dev)::DOUBLE / n::DOUBLE, 4) AS cusum_stat
        |FROM r WHERE rn = 1""".stripMargin,
    "q_acf" -> {
      val centered =
        """c AS (SELECT g,
          |        x * count(*) OVER (PARTITION BY g) - sum(x) OVER (PARTITION BY g) AS d,
          |        lag(x, 1) OVER w * count(*) OVER (PARTITION BY g) - sum(x) OVER (PARTITION BY g) AS dl1,
          |        lag(x, 2) OVER w * count(*) OVER (PARTITION BY g) - sum(x) OVER (PARTITION BY g) AS dl2,
          |        lag(x, 3) OVER w * count(*) OVER (PARTITION BY g) - sum(x) OVER (PARTITION BY g) AS dl3
          |      FROM t WINDOW w AS (PARTITION BY g ORDER BY ts, event_id))""".stripMargin
      s"""WITH t AS (SELECT event_type AS g, ts, event_id,
         |             CAST(round(value * 100) AS BIGINT) AS x FROM events),
         |$centered,
         |a AS (SELECT g, sum(CAST(d AS HUGEINT) * d)::DOUBLE AS den,
         |        sum(CAST(dl1 AS HUGEINT) * d)::DOUBLE AS num1,
         |        sum(CAST(dl2 AS HUGEINT) * d)::DOUBLE AS num2,
         |        sum(CAST(dl3 AS HUGEINT) * d)::DOUBLE AS num3
         |      FROM c GROUP BY g)
         |SELECT g AS event_type, 1 AS lag, round(num1 / den, 4) + 0.0 AS acf FROM a
         |UNION ALL
         |SELECT g AS event_type, 2 AS lag, round(num2 / den, 4) + 0.0 AS acf FROM a
         |UNION ALL
         |SELECT g AS event_type, 3 AS lag, round(num3 / den, 4) + 0.0 AS acf FROM a""".stripMargin
    },
    "q_gini" ->
      """WITH t AS (SELECT source AS g, n_chars AS x,
        |             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
        |           FROM documents)
        |SELECT g AS source, CAST(count(*) AS BIGINT) AS n,
        |  round((sum(i * x) * 2 - (count(*) + 1) * sum(x))::DOUBLE /
        |        (count(*) * sum(x))::DOUBLE, 6) + 0.0 AS gini
        |FROM t GROUP BY g""".stripMargin,
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
        |                    1, 1) AS INTEGER) AS digit FROM orders),
        |f AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d WHERE digit >= 1 GROUP BY digit),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS tn FROM f)
        |SELECT digit, n_obs,
        |  round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
        |  round(pow(n_obs::DOUBLE - tn * log10(1.0 + 1.0 / digit), 2) /
        |        (tn * log10(1.0 + 1.0 / digit)), 4) AS chi2_contrib
        |FROM f, t""".stripMargin,
    "q_hill_tail" ->
      """WITH r AS (SELECT source AS g, CAST(n_chars AS DOUBLE) AS xv,
        |             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS i
        |           FROM documents),
        |ref AS (SELECT g, xv AS xref FROM r WHERE i = 11),
        |a AS (SELECT r.g, CAST(count(*) AS BIGINT) AS k, sum(ln(xv / xref)) AS lsum
        |      FROM r JOIN ref USING (g) WHERE i <= 10 GROUP BY r.g)
        |SELECT g AS source, k, round(lsum / k, 4) + 0.0 AS hill_mean_log,
        |       CASE WHEN lsum > 0 THEN round(k / lsum, 4) + 0.0 END AS tail_alpha
        |FROM a""".stripMargin,
    "q_clustering_coef" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |p0 AS (SELECT unnest(list_transform(range(1, len(ws)),
        |         i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS u FROM w WHERE len(ws) >= 2),
        |e AS (SELECT DISTINCT least(u.w1, u.w2) AS a, greatest(u.w1, u.w2) AS b
        |      FROM p0 WHERE u.w1 <> u.w2),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
        |          (SELECT a AS v FROM e UNION ALL SELECT b FROM e) t GROUP BY v),
        |wed AS (SELECT e1.a AS wa, e1.b AS wb, e2.b AS wc FROM e e1 JOIN e e2 ON e2.a = e1.b),
        |tri0 AS (SELECT wa, wb, wc FROM wed JOIN e e3 ON e3.a = wed.wa AND e3.b = wed.wc),
        |tv AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM
        |         (SELECT wa AS v FROM tri0 UNION ALL SELECT wb FROM tri0
        |          UNION ALL SELECT wc FROM tri0) t GROUP BY v),
        |cc AS (SELECT d.v, d.deg, COALESCE(tv.tri, 0) AS tri,
        |         (COALESCE(tv.tri, 0) * 2)::DOUBLE / (d.deg * (d.deg - 1))::DOUBLE AS coef
        |       FROM deg d LEFT JOIN tv USING (v) WHERE d.deg >= 2)
        |SELECT CAST(floor(coef * 10) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_nodes,
        |       CAST(sum(deg) AS BIGINT) AS sum_deg, CAST(sum(tri) AS BIGINT) AS sum_tri
        |FROM cc GROUP BY bucket""".stripMargin,
    "q_cdc_apply" ->
      """WITH r AS (SELECT user_id, event_type, value, ts, event_id,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
        |           FROM events)
        |SELECT user_id, event_type AS last_op, round(value, 2) AS last_value,
        |       epoch_ms(ts) AS ts_ms, n_changes
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_welch_t" ->
      """WITH t AS (SELECT event_type = 'purchase' AS a,
        |             CAST(round(value * 100) AS BIGINT) AS x
        |           FROM events WHERE event_type IN ('purchase', 'click')),
        |s AS (SELECT CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN a THEN x ELSE 0 END) AS BIGINT) AS s1,
        |        sum(CASE WHEN a THEN CAST(x AS HUGEINT) * x ELSE 0 END)::DOUBLE AS ss1,
        |        CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |        CAST(sum(CASE WHEN a THEN 0 ELSE x END) AS BIGINT) AS s2,
        |        sum(CASE WHEN a THEN CAST(0 AS HUGEINT) ELSE CAST(x AS HUGEINT) * x END)::DOUBLE AS ss2
        |      FROM t),
        |d AS (SELECT n1, n2,
        |        s1::DOUBLE / n1::DOUBLE AS m1, s2::DOUBLE / n2::DOUBLE AS m2,
        |        (ss1 - s1::DOUBLE * s1::DOUBLE / n1::DOUBLE) / (n1::DOUBLE - 1) AS v1,
        |        (ss2 - s2::DOUBLE * s2::DOUBLE / n2::DOUBLE) / (n2::DOUBLE - 1) AS v2
        |      FROM s),
        |e AS (SELECT *, v1 / n1::DOUBLE + v2 / n2::DOUBLE AS se2 FROM d)
        |SELECT n1, n2, round(m1, 4) + 0.0 AS mean_a, round(m2, 4) + 0.0 AS mean_b,
        |  round((m1 - m2) / sqrt(se2), 4) + 0.0 AS t_stat,
        |  round(se2 * se2 /
        |        (v1 * v1 / (n1::DOUBLE * n1::DOUBLE * (n1::DOUBLE - 1)) +
        |         v2 * v2 / (n2::DOUBLE * n2::DOUBLE * (n2::DOUBLE - 1))), 2) + 0.0 AS df_welch
        |FROM e""".stripMargin,
    "q_concurrency" ->
      """WITH iv AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d,
        |              min(epoch_ms(ts)) AS s_ms, max(epoch_ms(ts)) AS e_ms
        |            FROM events GROUP BY user_id, d),
        |del AS (SELECT s_ms AS ms, CAST(1 AS BIGINT) AS delta FROM iv
        |        UNION ALL SELECT e_ms + 1, -1 FROM iv),
        |run AS (SELECT ms, delta, sum(delta) OVER (ORDER BY ms, delta
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM del),
        |wd AS (SELECT *, ms // 86400000 AS day,
        |         max(conc) OVER (PARTITION BY ms // 86400000) AS dmax FROM run)
        |SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrent,
        |       min(CASE WHEN conc = dmax THEN ms END) AS peak_ms,
        |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
        |FROM wd GROUP BY day""".stripMargin,
    "q_format_profile" -> {
      def profile(table: String, c: String): String =
        s"""SELECT '$c' AS "column",
           |  regexp_replace(regexp_replace(regexp_replace($c,
           |    '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g') AS mask,
           |  CAST(count(*) AS BIGINT) AS n,
           |  min($c) AS example_min, max($c) AS example_max
           |FROM $table GROUP BY mask""".stripMargin
      val collapse =
        """regexp_replace(regexp_replace(regexp_replace(mask,
          |    '9+', '9', 'g'), 'A+', 'A', 'g'), 'a+', 'a', 'g')""".stripMargin
      s"""WITH m AS (${profile("customer", "c_name")}
         |UNION ALL ${profile("orders", "o_orderpriority")}
         |UNION ALL ${profile("events", "props")})
         |SELECT "column", mask, $collapse AS mask_collapsed, n, example_min, example_max
         |FROM m""".stripMargin
    },
    "q_anova" ->
      """WITH t AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |per AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS sg,
        |          sum(CAST(x AS HUGEINT) * x) AS ssg
        |        FROM t GROUP BY g),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |          CAST(sum(sg) AS BIGINT) AS s, sum(ssg)::DOUBLE AS sst_raw,
        |          list_reduce(list(sg::DOUBLE * sg::DOUBLE / ng::DOUBLE ORDER BY g),
        |                      (a, b) -> a + b) AS sb_raw
        |        FROM per)
        |SELECT k, n,
        |  round(((sb_raw - s::DOUBLE * s::DOUBLE / n::DOUBLE) / (k - 1)::DOUBLE) /
        |        ((sst_raw - sb_raw) / (n - k)::DOUBLE), 4) + 0.0 AS f_stat,
        |  round((sb_raw - s::DOUBLE * s::DOUBLE / n::DOUBLE) /
        |        (sst_raw - s::DOUBLE * s::DOUBLE / n::DOUBLE), 6) + 0.0 AS eta_sq
        |FROM tot""".stripMargin,
    "q_dp_release" ->
      """WITH per AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_true
        |             FROM documents GROUP BY g),
        |u AS (SELECT g, n_true,
        |        ((('0x' || substr(md5(g || ':23'), 1, 6))::BIGINT::DOUBLE + 0.5)
        |          / 16777216.0) - 0.5 AS c
        |      FROM per)
        |SELECT g AS source,
        |  round(n_true::DOUBLE + (-2.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 4) + 0.0
        |    AS released_count
        |FROM u""".stripMargin,
    "q_cliffs_delta" ->
      """WITH t AS (SELECT event_type = 'purchase' AS grp,
        |             CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM t GROUP BY v),
        |r AS (SELECT c1, c,
        |        CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS cp
        |      FROM h),
        |a AS (SELECT CAST(sum(c1 * (cp * 2 + c + 1)) AS BIGINT) AS r2sum1,
        |        CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c - c1) AS BIGINT) AS n2
        |      FROM r)
        |SELECT n1, n2,
        |  round((r2sum1 - n1 * (n1 + 1) - n1 * n2)::DOUBLE / (n1 * n2)::DOUBLE, 4) + 0.0
        |    AS cliffs_delta
        |FROM a""".stripMargin,
    "q_cuped" ->
      """WITH t AS (SELECT user_id % 2 = 0 AS a, CAST(round(value * 100) AS BIGINT) AS y,
        |             CAST(length(props) AS BIGINT) AS x FROM events),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |        CAST(sum(y) AS BIGINT) AS sy,
        |        sum(CAST(x AS HUGEINT) * y)::DOUBLE AS sxy,
        |        sum(CAST(x AS HUGEINT) * x)::DOUBLE AS sxx,
        |        sum(CAST(y AS HUGEINT) * y)::DOUBLE AS syy,
        |        CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        CAST(sum(CASE WHEN a THEN y ELSE 0 END) AS BIGINT) AS sya,
        |        CAST(sum(CASE WHEN a THEN x ELSE 0 END) AS BIGINT) AS sxa
        |      FROM t),
        |c AS (SELECT *,
        |        sxy / n - (sx::DOUBLE / n) * (sy::DOUBLE / n) AS covxy,
        |        sxx / n - (sx::DOUBLE / n) * (sx::DOUBLE / n) AS varx,
        |        syy / n - (sy::DOUBLE / n) * (sy::DOUBLE / n) AS vary,
        |        sya::DOUBLE / na - (sy - sya)::DOUBLE / (n - na) AS raw_eff,
        |        sxa::DOUBLE / na - (sx - sxa)::DOUBLE / (n - na) AS x_gap
        |      FROM s)
        |SELECT na AS n_treat, n - na AS n_control,
        |  round(covxy / varx, 4) + 0.0 AS theta,
        |  round(raw_eff, 4) + 0.0 AS raw_effect,
        |  round(raw_eff - covxy / varx * x_gap, 4) + 0.0 AS cuped_effect,
        |  round(1.0 - covxy * covxy / (varx * vary), 4) + 0.0 AS var_ratio
        |FROM c""".stripMargin,
    "q_target_encode" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS y FROM orders),
        |s AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(y) AS BIGINT) AS sy FROM t GROUP BY 1)
        |SELECT o_orderkey, t.o_orderpriority,
        |  CASE WHEN n > 1 THEN (sy - y)::DOUBLE / (n - 1)::DOUBLE END AS loo_enc
        |FROM t JOIN s USING (o_orderpriority)""".stripMargin,
    "q_kruskal" ->
      """WITH t AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cgv FROM t GROUP BY 1, 2),
        |bv AS (SELECT v, CAST(sum(cgv) AS BIGINT) AS t FROM h GROUP BY v),
        |rv AS (SELECT v, t,
        |         CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t AS BIGINT) AS cp
        |       FROM bv),
        |pg AS (SELECT g, CAST(sum(cgv) AS BIGINT) AS ng,
        |         CAST(sum(cgv * (cp * 2 + rv.t + 1)) AS BIGINT) AS r2
        |       FROM h JOIN rv USING (v) GROUP BY g),
        |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tiesum FROM bv),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |          list_reduce(list(r2::DOUBLE * r2::DOUBLE / (4.0 * ng::DOUBLE) ORDER BY g),
        |                      (a, b) -> a + b) AS rss
        |        FROM pg)
        |SELECT k, n,
        |  round((12.0 / (n::DOUBLE * (n + 1)::DOUBLE) * rss - 3.0 * (n + 1)::DOUBLE)
        |        / (1.0 - tiesum::DOUBLE /
        |           (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)), 4) + 0.0 AS h_stat
        |FROM tot, ties""".stripMargin,
    "q_did" ->
      """WITH t AS (SELECT user_id % 2 = 0 AS tr, day(ts) >= 16 AS po,
        |             CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN tr AND NOT po THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |  CAST(sum(CASE WHEN tr AND NOT po THEN x ELSE 0 END) AS BIGINT) AS s10,
        |  CAST(sum(CASE WHEN tr AND po THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |  CAST(sum(CASE WHEN tr AND po THEN x ELSE 0 END) AS BIGINT) AS s11,
        |  CAST(sum(CASE WHEN NOT tr AND NOT po THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |  CAST(sum(CASE WHEN NOT tr AND NOT po THEN x ELSE 0 END) AS BIGINT) AS s00,
        |  CAST(sum(CASE WHEN NOT tr AND po THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |  CAST(sum(CASE WHEN NOT tr AND po THEN x ELSE 0 END) AS BIGINT) AS s01
        |FROM t)
        |SELECT n10, n11, n00, n01,
        |  round(s10::DOUBLE / n10::DOUBLE, 4) + 0.0 AS mean_treated_pre,
        |  round(s11::DOUBLE / n11::DOUBLE, 4) + 0.0 AS mean_treated_post,
        |  round(s00::DOUBLE / n00::DOUBLE, 4) + 0.0 AS mean_control_pre,
        |  round(s01::DOUBLE / n01::DOUBLE, 4) + 0.0 AS mean_control_post,
        |  round((s11::DOUBLE / n11::DOUBLE - s10::DOUBLE / n10::DOUBLE)
        |      - (s01::DOUBLE / n01::DOUBLE - s00::DOUBLE / n00::DOUBLE), 4) + 0.0 AS did
        |FROM a""".stripMargin,
    "q_ips_eval" ->
      """WITH t AS (SELECT event_type AS a, CAST(round(value * 100) AS BIGINT) AS r FROM events),
        |per AS (SELECT a, CAST(count(*) AS BIGINT) AS na, CAST(sum(r) AS BIGINT) AS sa
        |        FROM t GROUP BY a),
        |n AS (SELECT CAST(sum(na) AS BIGINT) AS n FROM per),
        |tgt AS (SELECT * FROM (VALUES ('purchase', 0.6), ('click', 0.1), ('view', 0.1),
        |                              ('signup', 0.1), ('error', 0.1)) AS v(a, pi)),
        |rows_ AS (SELECT per.a, na, sa, pi, n.n FROM per JOIN tgt USING (a), n),
        |f AS (SELECT max(n) AS n,
        |        list_reduce(list(pi * sa::DOUBLE / na::DOUBLE ORDER BY a),
        |                    (x, y) -> x + y) AS ips,
        |        list_reduce(list(pi * n::DOUBLE ORDER BY a), (x, y) -> x + y) AS sw,
        |        list_reduce(list(pi * pi * n::DOUBLE * n::DOUBLE / na::DOUBLE ORDER BY a),
        |                    (x, y) -> x + y) AS sw2
        |      FROM rows_)
        |SELECT n, round(ips, 4) + 0.0 AS ips_value,
        |  round(n::DOUBLE * ips / sw, 4) + 0.0 AS snips_value,
        |  round(sw * sw / sw2, 4) + 0.0 AS ess
        |FROM f""".stripMargin,
    "q_median_ci" ->
      """WITH t AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
        |r AS (SELECT t.g, x, row_number() OVER (PARTITION BY t.g ORDER BY x) AS rn, n.n
        |      FROM t JOIN n ON n.g = t.g),
        |kk AS (SELECT g, n,
        |         greatest(1, CAST(floor((n::DOUBLE - 1.96 * sqrt(n::DOUBLE)) / 2.0) AS BIGINT)) AS k_lo
        |       FROM n),
        |k2 AS (SELECT g, n, k_lo, least(n, n - k_lo + 1) AS k_hi,
        |         (n + 1) // 2 AS m_lo, n // 2 + 1 AS m_hi FROM kk),
        |s AS (SELECT r.g, r.n,
        |        min(CASE WHEN rn = k_lo THEN x END) AS ci_lo,
        |        min(CASE WHEN rn = k_hi THEN x END) AS ci_hi,
        |        min(CASE WHEN rn = m_lo THEN x END) + min(CASE WHEN rn = m_hi THEN x END) AS med2
        |      FROM r JOIN k2 ON k2.g = r.g GROUP BY r.g, r.n)
        |SELECT g AS event_type, n, round(med2::DOUBLE / 2.0, 2) + 0.0 AS median,
        |       CAST(ci_lo AS BIGINT) AS ci_lo, CAST(ci_hi AS BIGINT) AS ci_hi
        |FROM s""".stripMargin,
    "q_weighted_median" ->
      """WITH h AS (SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT g, x, w,
        |        sum(w) OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cumw,
        |        sum(w) OVER (PARTITION BY g) AS tw FROM h)
        |SELECT g AS l_returnflag, CAST(tw AS BIGINT) AS total_w,
        |       CAST(min(x) AS BIGINT) AS weighted_median
        |FROM c WHERE cumw * 2 >= tw GROUP BY g, tw""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000 AS bal_kbucket,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  count(*) < 5 AS suppressed
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,
    "q_burstiness" ->
      """WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS b,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |p AS (SELECT g, CAST(count(*) AS BIGINT) AS n_bins,
        |        CAST(sum(c) AS BIGINT) AS n_events, CAST(sum(c * c) AS BIGINT) AS ss
        |      FROM d GROUP BY g)
        |SELECT g AS event_type, n_bins, n_events,
        |  round(n_events::DOUBLE / n_bins::DOUBLE, 4) + 0.0 AS mean_per_bin,
        |  round(((ss::DOUBLE - n_events::DOUBLE * n_events::DOUBLE / n_bins::DOUBLE)
        |         / (n_bins - 1)::DOUBLE) / (n_events::DOUBLE / n_bins::DOUBLE), 4) + 0.0
        |    AS fano
        |FROM p WHERE n_bins > 1""".stripMargin,
    "q_attribution" ->
      """WITH conv AS (SELECT user_id AS u, ts AS cts, event_id AS conv_id FROM events
        |              WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id AS u, ts AS tts, event_id AS touch_id, event_type AS channel
        |        FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |p AS (SELECT conv.conv_id, tch.channel, tch.tts, tch.touch_id
        |      FROM conv JOIN tch USING (u)
        |      WHERE tch.tts < conv.cts AND tch.tts >= conv.cts - INTERVAL 172800 SECOND),
        |s AS (SELECT conv_id, channel,
        |        count(*) OVER (PARTITION BY conv_id) AS n_t,
        |        row_number() OVER (PARTITION BY conv_id ORDER BY tts DESC, touch_id DESC) AS rn
        |      FROM p)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch_convs,
        |       CAST(sum(1000000 // n_t) AS BIGINT) AS linear_credit_ppm
        |FROM s GROUP BY channel""".stripMargin,
    "q_attribution_decay" ->
      """WITH conv AS (SELECT user_id AS u, ts AS cts, event_id AS conv_id FROM events
        |              WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id AS u, ts AS tts, event_id AS touch_id, event_type AS channel
        |        FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |p AS (SELECT conv.conv_id, tch.channel,
        |        (CAST(floor(epoch(conv.cts)) AS BIGINT)
        |         - CAST(floor(epoch(tch.tts)) AS BIGINT)) // 86400 AS age_days
        |      FROM conv JOIN tch USING (u)
        |      WHERE tch.tts < conv.cts AND tch.tts >= conv.cts - INTERVAL 172800 SECOND),
        |w AS (SELECT conv_id, channel,
        |        (CAST(1 AS BIGINT) << CAST(greatest(0, 30 - age_days) AS INTEGER)) AS w
        |      FROM p),
        |s AS (SELECT conv_id, channel, w, sum(w) OVER (PARTITION BY conv_id) AS wsum FROM w)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum((1000000 * w) // wsum) AS BIGINT) AS decay_credit_ppm
        |FROM s GROUP BY channel""".stripMargin,
    "q_sprt" -> {
      val (c1, c2, up, lo) = Stats.sprtConstants(0.18, 0.22, 0.05, 0.2)
      s"""WITH t AS (SELECT concat('v', CAST(user_id % 3 AS VARCHAR)) AS variant,
         |         CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day,
         |         CAST(event_type = 'purchase' AS BIGINT) AS conv FROM events),
         |d AS (SELECT variant, day, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(conv) AS BIGINT) AS k
         |      FROM t GROUP BY 1, 2),
         |c AS (SELECT variant, day,
         |        sum(n) OVER (PARTITION BY variant ORDER BY day
         |          ROWS UNBOUNDED PRECEDING) AS cum_n,
         |        sum(k) OVER (PARTITION BY variant ORDER BY day
         |          ROWS UNBOUNDED PRECEDING) AS cum_k
         |      FROM d),
         |l AS (SELECT variant, day, CAST(cum_n AS BIGINT) AS cum_n,
         |        CAST(cum_k AS BIGINT) AS cum_k,
         |        ${c1} * CAST(cum_k AS DOUBLE)
         |          + ${c2} * CAST(cum_n - cum_k AS DOUBLE) AS llr
         |      FROM c)
         |SELECT variant, day, cum_n, cum_k, llr,
         |  CASE WHEN llr >= ${up} THEN 'reject_h0'
         |       WHEN llr <= ${lo} THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM l""".stripMargin
    },
    "q_runs_test" ->
      """WITH t AS (SELECT user_id AS k, CAST(round(value*100) AS BIGINT) AS v,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS o1, event_id AS o2 FROM events),
        |tot AS (SELECT CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS nv FROM t),
        |s AS (SELECT k, (v * nv > sv) AS above, o1, o2 FROM t, tot),
        |l AS (SELECT k, above, lag(above) OVER (PARTITION BY k ORDER BY o1, o2) AS prev FROM s),
        |r AS (SELECT k AS user_id,
        |        CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |        CAST(sum(CASE WHEN prev IS NULL OR prev <> above THEN 1 ELSE 0 END) AS BIGINT) AS runs
        |      FROM l GROUP BY k)
        |SELECT user_id, n1, n2, runs,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND
        |       CAST(2*n1*n2 AS DOUBLE) * CAST(2*n1*n2 - (n1+n2) AS DOUBLE)
        |         / CAST((n1+n2)*(n1+n2)*(n1+n2-1) AS DOUBLE) > 0
        |     THEN (CAST(runs AS DOUBLE)
        |            - (CAST(2*n1*n2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE) + 1.0))
        |          / sqrt(CAST(2*n1*n2 AS DOUBLE) * CAST(2*n1*n2 - (n1+n2) AS DOUBLE)
        |               / CAST((n1+n2)*(n1+n2)*(n1+n2-1) AS DOUBLE))
        |  END AS z_runs
        |FROM r WHERE n1 + n2 >= 20""".stripMargin,
    "q_fd_profile" ->
      """WITH a AS (SELECT l_orderkey AS k, count(DISTINCT l_suppkey) AS nd FROM lineitem GROUP BY 1),
        |b AS (SELECT l_partkey AS k, count(DISTINCT l_suppkey) AS nd FROM lineitem GROUP BY 1),
        |c AS (SELECT l_suppkey AS k, count(DISTINCT l_partkey) AS nd FROM lineitem GROUP BY 1),
        |u AS (
        |  SELECT 'l_orderkey->l_suppkey' AS fd, CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |    CAST(max(nd) AS BIGINT) AS max_distinct FROM a
        |  UNION ALL
        |  SELECT 'l_partkey->l_suppkey', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(nd) AS BIGINT) FROM b
        |  UNION ALL
        |  SELECT 'l_suppkey->l_partkey', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(nd) AS BIGINT) FROM c)
        |SELECT fd, n_keys, n_violating, max_distinct,
        |  (1000000 * n_violating) // n_keys AS violation_ppm
        |FROM u""".stripMargin,
    "q_brown_forsythe" ->
      """WITH t AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |h AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
        |cum AS (SELECT g, x, c,
        |          sum(c) OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM h),
        |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY g),
        |med AS (SELECT cum.g,
        |          min(CASE WHEN cum >= (nn.n + 1) // 2 THEN x END)
        |          + min(CASE WHEN cum >= (nn.n + 2) // 2 THEN x END) AS m2
        |        FROM cum JOIN nn ON nn.g = cum.g GROUP BY cum.g),
        |z AS (SELECT h.g, h.c, abs(2 * h.x - med.m2) AS z2 FROM h JOIN med ON med.g = h.g),
        |per AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng, CAST(sum(c * z2) AS BIGINT) AS sg,
        |          sum(CAST(c AS HUGEINT) * z2 * z2) AS ssg
        |        FROM z GROUP BY g),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |          CAST(sum(sg) AS BIGINT) AS s, sum(ssg)::DOUBLE AS sst_raw,
        |          list_reduce(list(sg::DOUBLE * sg::DOUBLE / ng::DOUBLE ORDER BY g),
        |                      (a, b) -> a + b) AS sb_raw
        |        FROM per)
        |SELECT k, n,
        |  round(((sb_raw - s::DOUBLE * s::DOUBLE / n::DOUBLE) / (k - 1)::DOUBLE) /
        |        ((sst_raw - sb_raw) / (n - k)::DOUBLE), 4) + 0.0 AS f_stat
        |FROM tot""".stripMargin,
    "q_jarque_bera" ->
      """WITH t AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |p AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s1,
        |        sum(CAST(x * x AS HUGEINT))::DOUBLE AS s2,
        |        sum(CAST(x * x AS HUGEINT) * x)::DOUBLE AS s3,
        |        sum(CAST(x * x AS HUGEINT) * (x * x))::DOUBLE AS s4
        |      FROM t GROUP BY g),
        |m AS (SELECT g, n, s1::DOUBLE / n::DOUBLE AS mu, s2, s3, s4 FROM p),
        |cm AS (SELECT g, n,
        |         s2 / n::DOUBLE - mu * mu AS m2,
        |         s3 / n::DOUBLE - 3.0 * mu * (s2 / n::DOUBLE) + 2.0 * mu * mu * mu AS m3,
        |         s4 / n::DOUBLE - 4.0 * mu * (s3 / n::DOUBLE)
        |           + 6.0 * mu * mu * (s2 / n::DOUBLE) - 3.0 * mu * mu * mu * mu AS m4
        |       FROM m),
        |sk AS (SELECT g, n, m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt FROM cm)
        |SELECT g AS event_type, n,
        |  round(skew, 6) + 0.0 AS skewness,
        |  round(kurt, 6) + 0.0 AS kurtosis,
        |  round(n::DOUBLE / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 4) + 0.0
        |    AS jb_stat
        |FROM sk""".stripMargin,
    "q_grubbs" ->
      """WITH t AS (SELECT o_orderpriority AS g, CAST(round(o_totalprice * 100) AS BIGINT) AS x
        |           FROM orders),
        |p AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s1,
        |        sum(CAST(x AS HUGEINT) * x)::DOUBLE AS s2,
        |        min(x) AS mn, max(x) AS mx
        |      FROM t GROUP BY g),
        |d AS (SELECT g, n, mn, mx,
        |        s1::DOUBLE / n::DOUBLE - mn::DOUBLE AS dev_lo,
        |        mx::DOUBLE - s1::DOUBLE / n::DOUBLE AS dev_hi,
        |        sqrt((s2 - s1::DOUBLE * s1::DOUBLE / n::DOUBLE) / (n - 1)::DOUBLE) AS sd
        |      FROM p)
        |SELECT g AS o_orderpriority, n,
        |  round(greatest(dev_lo, dev_hi) / sd, 4) + 0.0 AS g_stat,
        |  CAST(CASE WHEN dev_lo > dev_hi THEN mn ELSE mx END AS BIGINT) AS x_extreme
        |FROM d""".stripMargin,
    "q_ols_multi" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS a,
        |             CAST(round(l_discount * 100) AS BIGINT) AS b,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |           FROM lineitem),
        |p AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |        sum(a)::DOUBLE AS sa, sum(b)::DOUBLE AS sb, sum(y)::DOUBLE AS sy,
        |        sum(CAST(a AS HUGEINT) * a)::DOUBLE AS saa,
        |        sum(CAST(b AS HUGEINT) * b)::DOUBLE AS sbb,
        |        sum(CAST(a AS HUGEINT) * b)::DOUBLE AS sab,
        |        sum(CAST(a AS HUGEINT) * y)::DOUBLE AS say,
        |        sum(CAST(b AS HUGEINT) * y)::DOUBLE AS sby,
        |        sum(CAST(y AS HUGEINT) * y)::DOUBLE AS syy
        |      FROM t GROUP BY g),
        |c AS (SELECT g, n, sa, sb, sy,
        |        saa - sa * sa / n::DOUBLE AS aa, sbb - sb * sb / n::DOUBLE AS bb,
        |        sab - sa * sb / n::DOUBLE AS ab, say - sa * sy / n::DOUBLE AS ay,
        |        sby - sb * sy / n::DOUBLE AS by, syy - sy * sy / n::DOUBLE AS yy
        |      FROM p),
        |s AS (SELECT g, n, sa, sb, sy, ay, by, yy,
        |        (ay * bb - by * ab) / (aa * bb - ab * ab) AS b1,
        |        (by * aa - ay * ab) / (aa * bb - ab * ab) AS b2
        |      FROM c)
        |SELECT g AS l_returnflag, n,
        |  round(b1, 6) + 0.0 AS b1, round(b2, 6) + 0.0 AS b2,
        |  round((sy - b1 * sa - b2 * sb) / n::DOUBLE, 6) + 0.0 AS intercept,
        |  round((b1 * ay + b2 * by) / yy, 6) + 0.0 AS r2
        |FROM s""".stripMargin,
    "q_kendall" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS vx,
        |             CAST(round(l_discount * 100) AS BIGINT) AS vy
        |           FROM lineitem),
        |cells AS (SELECT g, vx, vy, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2, 3),
        |pr AS (SELECT a.g,
        |         CAST(sum(CASE WHEN a.vy < b.vy THEN a.c * b.c ELSE 0 END) AS BIGINT) AS nc,
        |         CAST(sum(CASE WHEN a.vy > b.vy THEN a.c * b.c ELSE 0 END) AS BIGINT) AS nd
        |       FROM cells a JOIN cells b ON b.g = a.g AND a.vx < b.vx GROUP BY a.g),
        |tx AS (SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS tx FROM
        |         (SELECT g, vx, sum(c) AS t FROM cells GROUP BY 1, 2) m GROUP BY g),
        |ty AS (SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS ty FROM
        |         (SELECT g, vy, sum(c) AS t FROM cells GROUP BY 1, 2) m GROUP BY g),
        |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n, sum(c) * (sum(c) - 1) // 2 AS n0
        |       FROM cells GROUP BY g)
        |SELECT nn.g AS l_returnflag, nn.n, pr.nc, pr.nd,
        |  CASE WHEN nn.n0 > tx.tx AND nn.n0 > ty.ty THEN
        |    round((pr.nc - pr.nd)::DOUBLE /
        |          (sqrt((nn.n0 - tx.tx)::DOUBLE) * sqrt((nn.n0 - ty.ty)::DOUBLE)), 6) + 0.0
        |  END AS tau_b
        |FROM nn JOIN tx ON tx.g = nn.g JOIN ty ON ty.g = nn.g JOIN pr ON pr.g = nn.g""".stripMargin,

    "q_somers_d" ->
      """WITH t AS (SELECT l_returnflag AS g,
        |             CAST(CASE WHEN round(l_discount * 100) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS vx,
        |             CAST(l_quantity AS BIGINT) AS vy
        |           FROM lineitem),
        |cells AS (SELECT g, vx, vy, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2, 3),
        |pr AS (SELECT a.g,
        |         CAST(sum(CASE WHEN a.vy < b.vy THEN a.c * b.c ELSE 0 END) AS BIGINT) AS nc,
        |         CAST(sum(CASE WHEN a.vy > b.vy THEN a.c * b.c ELSE 0 END) AS BIGINT) AS nd
        |       FROM cells a JOIN cells b ON b.g = a.g AND a.vx < b.vx GROUP BY a.g),
        |tx AS (SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS tx FROM
        |         (SELECT g, vx, sum(c) AS t FROM cells GROUP BY 1, 2) m GROUP BY g),
        |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n, sum(c) * (sum(c) - 1) // 2 AS n0
        |       FROM cells GROUP BY g)
        |SELECT nn.g AS l_returnflag, nn.n, pr.nc, pr.nd,
        |  CASE WHEN nn.n0 > tx.tx THEN
        |    round((pr.nc - pr.nd)::DOUBLE / (nn.n0 - tx.tx)::DOUBLE, 6) + 0.0
        |  END AS somers_d
        |FROM nn JOIN tx ON tx.g = nn.g JOIN pr ON pr.g = nn.g""".stripMargin,

    "q_hhi" ->
      """WITH c AS (SELECT event_type AS g, user_id, CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_actors, CAST(sum(c) AS BIGINT) AS total,
        |        sum(CAST(c AS HUGEINT)*c) AS s2 FROM c GROUP BY g)
        |SELECT g AS event_type, n_actors, total,
        |  CAST(s2 AS DOUBLE) / CAST(CAST(total AS HUGEINT)*total AS DOUBLE) AS hhi,
        |  CAST(CAST(total AS HUGEINT)*total AS DOUBLE) / CAST(s2 AS DOUBLE) AS effective_n
        |FROM s""".stripMargin,

    "q_theil_index" ->
      """WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        |           FROM documents WHERE n_chars > 0 GROUP BY 1, 2),
        |per AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g, CAST(sum(c*v) AS BIGINT) AS x_g,
        |          sum(CAST(c AS DOUBLE) * CAST(v AS DOUBLE) * ln(CAST(v AS DOUBLE))) AS sxlx
        |        FROM h GROUP BY g),
        |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(x_g) AS BIGINT) AS x FROM per)
        |SELECT g AS source, n_g, x_g,
        |  round(CAST(x_g AS DOUBLE) / CAST(x AS DOUBLE), 6) AS x_share,
        |  round(sxlx / CAST(x_g AS DOUBLE)
        |        - ln(CAST(x_g AS DOUBLE) / CAST(n_g AS DOUBLE)), 6) AS t_within,
        |  round(CAST(x_g AS DOUBLE) / CAST(x AS DOUBLE) *
        |        ln((CAST(x_g AS DOUBLE) / CAST(x AS DOUBLE)) /
        |           (CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS t_between_term,
        |  round(CAST(x_g AS DOUBLE) / CAST(x AS DOUBLE) *
        |        (sxlx / CAST(x_g AS DOUBLE)
        |         - ln(CAST(x_g AS DOUBLE) / CAST(n_g AS DOUBLE))), 6) AS t_within_contrib
        |FROM per, tot""".stripMargin,

    "q_oaxaca" ->
      """WITH t AS (SELECT o_orderstatus = 'F' AS a,
        |             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS y FROM orders),
        |per AS (SELECT a, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |          CAST(sum(y) AS BIGINT) AS sy FROM t GROUP BY a),
        |pl AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         sum(CAST(x AS HUGEINT)*x)::DOUBLE AS sxx,
        |         sum(CAST(x AS HUGEINT)*y)::DOUBLE AS sxy
        |       FROM t),
        |b AS (SELECT (sxy * CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (sxx * CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        AS beta_pooled FROM pl),
        |f AS (SELECT aa.n AS n_a, bb.n AS n_b, b.beta_pooled,
        |        CAST(aa.sy AS DOUBLE) / CAST(aa.n AS DOUBLE)
        |          - CAST(bb.sy AS DOUBLE) / CAST(bb.n AS DOUBLE) AS gap,
        |        (CAST(aa.sx AS DOUBLE) / CAST(aa.n AS DOUBLE)
        |          - CAST(bb.sx AS DOUBLE) / CAST(bb.n AS DOUBLE)) * b.beta_pooled AS explained
        |      FROM (SELECT * FROM per WHERE a) aa,
        |           (SELECT * FROM per WHERE NOT a) bb, b)
        |SELECT n_a, n_b, round(beta_pooled, 6) AS beta_pooled, round(gap, 6) AS gap,
        |  round(explained, 6) AS explained, round(gap - explained, 6) AS unexplained
        |FROM f""".stripMargin,

    "q_stump_split" ->
      """WITH t AS (SELECT CAST(round(value*100) AS BIGINT) AS v,
        |             event_type = 'purchase' AS grp FROM events),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM t GROUP BY v),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(c1) AS BIGINT) AS p FROM h),
        |cand AS (SELECT v, n, p,
        |           sum(c) OVER w - c AS nl, sum(c1) OVER w - c1 AS pl
        |         FROM h, tot WINDOW w AS (ORDER BY v)),
        |wi AS (SELECT v, n, p, nl, pl,
        |         CAST(CAST(nl AS HUGEINT)*nl - CAST(pl AS HUGEINT)*pl
        |              - CAST(nl - pl AS HUGEINT)*(nl - pl) AS DOUBLE) / CAST(nl AS DOUBLE)
        |         + CAST(CAST(n - nl AS HUGEINT)*(n - nl) - CAST(p - pl AS HUGEINT)*(p - pl)
        |              - CAST(n - nl - (p - pl) AS HUGEINT)*(n - nl - (p - pl)) AS DOUBLE)
        |           / CAST(n - nl AS DOUBLE) AS wimp
        |       FROM cand WHERE nl > 0 AND nl < n),
        |best AS (SELECT min(wimp) AS best_w FROM wi),
        |pick AS (SELECT wimp, min(v) AS threshold, max(n) AS n, max(p) AS n_pos
        |         FROM wi JOIN best ON wi.wimp = best.best_w GROUP BY wimp)
        |SELECT pick.threshold, pick.n, CAST(wi.nl AS BIGINT) AS n_left,
        |  CAST(pick.n - wi.nl AS BIGINT) AS n_right,
        |  round(1.0 - CAST(CAST(pick.n_pos AS HUGEINT)*pick.n_pos
        |        + CAST(pick.n - pick.n_pos AS HUGEINT)*(pick.n - pick.n_pos) AS DOUBLE)
        |      / CAST(CAST(pick.n AS HUGEINT)*pick.n AS DOUBLE), 6) AS gini_parent,
        |  round(pick.wimp / CAST(pick.n AS DOUBLE), 6) AS child_impurity,
        |  round((1.0 - CAST(CAST(pick.n_pos AS HUGEINT)*pick.n_pos
        |        + CAST(pick.n - pick.n_pos AS HUGEINT)*(pick.n - pick.n_pos) AS DOUBLE)
        |      / CAST(CAST(pick.n AS HUGEINT)*pick.n AS DOUBLE))
        |    - pick.wimp / CAST(pick.n AS DOUBLE), 6) AS gain
        |FROM pick JOIN wi ON wi.v = pick.threshold""".stripMargin,

    "q_simpson_flip" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
        |             CAST(round(l_discount * 100) AS BIGINT) AS y FROM lineitem),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |        sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
        |        sum(CAST(x AS HUGEINT)*x)::DOUBLE AS sxx,
        |        sum(CAST(x AS HUGEINT)*y)::DOUBLE AS sxy
        |      FROM t GROUP BY g),
        |per AS (SELECT g, n,
        |          round((sxy * n - sx * sy) / (sxx * n - sx * sx), 6) + 0.0 AS slope
        |        FROM s),
        |sp AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
        |         sum(CAST(x AS HUGEINT)*x)::DOUBLE AS sxx,
        |         sum(CAST(x AS HUGEINT)*y)::DOUBLE AS sxy
        |       FROM t),
        |pl AS (SELECT round((sxy * n - sx * sy) / (sxx * n - sx * sx), 6) + 0.0
        |         AS pooled_slope FROM sp)
        |SELECT per.g AS l_returnflag, per.n, per.slope, pl.pooled_slope,
        |  (per.slope > 0) <> (pl.pooled_slope > 0) AS flipped
        |FROM per CROSS JOIN pl""".stripMargin,

    "q_smd_balance" ->
      """WITH t AS (SELECT o_orderpriority AS s, o_orderstatus = 'F' AS t,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS x FROM orders),
        |m AS (SELECT s, t, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |        sum(CAST(x AS HUGEINT)*x) AS sxx FROM t GROUP BY 1, 2),
        |j AS (SELECT a.s, a.n AS n_t, a.sx AS sx_t, a.sxx AS sxx_t,
        |        b.n AS n_c, b.sx AS sx_c, b.sxx AS sxx_c
        |      FROM m a JOIN m b ON b.s = a.s AND a.t AND NOT b.t),
        |v AS (SELECT s, n_t, n_c,
        |        CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mt,
        |        CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mc,
        |        (CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE)*CAST(sx_t AS DOUBLE)/CAST(n_t AS DOUBLE))
        |          / CAST(n_t - 1 AS DOUBLE) AS vt,
        |        (CAST(sxx_c AS DOUBLE) - CAST(sx_c AS DOUBLE)*CAST(sx_c AS DOUBLE)/CAST(n_c AS DOUBLE))
        |          / CAST(n_c - 1 AS DOUBLE) AS vc
        |      FROM j)
        |SELECT s AS stratum, n_t, n_c,
        |  CASE WHEN vt + vc > 0 THEN (mt - mc) / sqrt((vt + vc) / 2.0) END AS smd
        |FROM v""".stripMargin,

    "q_youden" ->
      """WITH t AS (SELECT CAST(round(value*100) AS BIGINT) AS v,
        |             event_type = 'purchase' AS grp FROM events),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM t GROUP BY v),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS p,
        |          CAST(sum(c - c1) AS BIGINT) AS nn FROM h),
        |cand AS (SELECT v, p, nn,
        |           p - (sum(c1) OVER w - c1) AS tp,
        |           nn - (sum(c - c1) OVER w - (c - c1)) AS fp
        |         FROM h, tot WINDOW w AS (ORDER BY v)),
        |jn AS (SELECT v, p, nn, tp, fp,
        |         CAST(tp AS HUGEINT) * nn - CAST(fp AS HUGEINT) * p AS jnum FROM cand),
        |best AS (SELECT max(jnum) AS best_j FROM jn),
        |pick AS (SELECT jnum, min(v) AS threshold, max(p) AS n_pos, max(nn) AS n_neg
        |         FROM jn JOIN best ON jn.jnum = best.best_j GROUP BY jnum)
        |SELECT pick.threshold, pick.n_pos, pick.n_neg,
        |  CAST(jn.tp AS BIGINT) AS tp, CAST(jn.fp AS BIGINT) AS fp,
        |  CAST(pick.jnum AS DOUBLE) /
        |    CAST(CAST(pick.n_pos AS HUGEINT) * pick.n_neg AS DOUBLE) AS youden_j
        |FROM pick JOIN jn ON jn.v = pick.threshold""".stripMargin,

    "q_cochran_q" ->
      """WITH td AS (SELECT DISTINCT event_type AS t FROM events),
        |bl AS (SELECT DISTINCT user_id AS b FROM events),
        |pos AS (SELECT DISTINCT user_id AS b, event_type AS t FROM events
        |        WHERE CAST(round(value*100) AS BIGINT) >= 500),
        |x AS (SELECT bl.b, td.t,
        |        CASE WHEN pos.b IS NULL THEN 0 ELSE 1 END AS x
        |      FROM bl CROSS JOIN td
        |      LEFT JOIN pos ON pos.b = bl.b AND pos.t = td.t),
        |r AS (SELECT b, CAST(sum(x) AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS k
        |      FROM x GROUP BY b),
        |cc AS (SELECT t, CAST(sum(x) AS BIGINT) AS c FROM x GROUP BY t),
        |ra AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks, max(k) AS k,
        |         CAST(sum(r) AS BIGINT) AS sr, sum(CAST(r AS HUGEINT)*r) AS srr FROM r),
        |ca AS (SELECT sum(CAST(c AS HUGEINT)*c) AS scc FROM cc)
        |SELECT n_blocks, k,
        |  CASE WHEN CAST(k AS DOUBLE) * CAST(sr AS DOUBLE) - CAST(srr AS DOUBLE) > 0 THEN
        |    (CAST(k AS DOUBLE) - 1.0) *
        |      (CAST(k AS DOUBLE) * CAST(scc AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) /
        |      (CAST(k AS DOUBLE) * CAST(sr AS DOUBLE) - CAST(srr AS DOUBLE))
        |  END AS q_cochran
        |FROM ra, ca""".stripMargin,

    "q_mahalanobis" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS xv,
        |             CAST(round(l_extendedprice*100) AS BIGINT) AS yv,
        |             CAST(l_orderkey*100 + l_linenumber AS BIGINT) AS id FROM lineitem),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
        |        sum(CAST(xv AS HUGEINT)*xv) AS sxx,
        |        sum(CAST(yv AS HUGEINT)*yv) AS syy,
        |        sum(CAST(xv AS HUGEINT)*yv) AS sxy
        |      FROM t GROUP BY g),
        |s2 AS (SELECT t.g, t.id,
        |         ((CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
        |            * (CAST(n*xv - sx AS DOUBLE) * CAST(n*xv - sx AS DOUBLE))
        |          - 2.0 * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |            * (CAST(n*xv - sx AS DOUBLE) * CAST(CAST(n AS HUGEINT)*yv - sy AS DOUBLE))
        |          + (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |            * (CAST(CAST(n AS HUGEINT)*yv - sy AS DOUBLE) * CAST(CAST(n AS HUGEINT)*yv - sy AS DOUBLE)))
        |         / ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |            * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
        |            - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |            * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))) AS d2
        |       FROM t JOIN m ON m.g = t.g),
        |p AS (SELECT g, max(d2) AS max_d2 FROM s2 GROUP BY g),
        |j AS (SELECT s2.g, s2.id, p.max_d2 FROM s2 JOIN p ON p.g = s2.g AND s2.d2 = p.max_d2)
        |SELECT j.g AS l_returnflag, m.n, min(j.id) AS outlier_id, max(j.max_d2) AS max_d2
        |FROM j JOIN m ON m.g = j.g GROUP BY j.g, m.n""".stripMargin,

    "q_l_diversity" ->
      """WITH t AS (SELECT c_nationkey,
        |             (CAST(round(c_acctbal*100) AS BIGINT) + 1000000) // 100000 AS bal_kbucket,
        |             c_mktsegment FROM customer)
        |SELECT c_nationkey, bal_kbucket, CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
        |  count(DISTINCT c_mktsegment) < 3 AS suppressed
        |FROM t GROUP BY 1, 2""".stripMargin,

    "q_atkinson" ->
      """WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
        |             CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |s AS (SELECT g, CAST(sum(CASE WHEN v > 0 THEN c ELSE 0 END) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN v > 0 THEN c*v ELSE 0 END) AS BIGINT) AS sv,
        |        sum(CASE WHEN v > 0 THEN CAST(c AS DOUBLE) * ln(CAST(v AS DOUBLE)) ELSE 0.0 END) AS slog,
        |        CAST(sum(CASE WHEN v <= 0 THEN c ELSE 0 END) AS BIGINT) AS n_excluded
        |      FROM h GROUP BY g)
        |SELECT g AS source, n, n_excluded,
        |  round(1.0 - exp(slog / CAST(n AS DOUBLE)) /
        |    (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS atkinson
        |FROM s""".stripMargin,

    "q_lorenz" ->
      """WITH r AS (SELECT source, n_chars AS v,
        |        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |        sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source ORDER BY n_chars, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v,
        |        count(*) OVER (PARTITION BY source) AS n_g,
        |        sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source) AS tot_v
        |      FROM documents)
        |SELECT source, CAST((rn - 1) * 10 // n_g + 1 AS INT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(v) AS BIGINT) AS decile_v,
        |  CAST(max(cum_v) AS BIGINT) AS cum_v,
        |  CAST(max(cum_v) AS DOUBLE) / CAST(max(tot_v) AS DOUBLE) AS cum_share
        |FROM r GROUP BY 1, 2""".stripMargin
  )
}
