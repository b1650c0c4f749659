package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Oracle-checked queries for the econometrics / reliability /
  * screening-statistics batch (Stats durbinWatson→histoQuantiles,
  * Signal.activeStreaks/maxDrawdown, Graph.katzPaths).
  *
  * Exactness per SURVEY.md §5: every statistic flows through exact
  * integer sums (longs; DECIMAL(38,0) ≡ HUGEINT where products could
  * overflow) and the final closed form is one shared double
  * expression tree — where outputs are large-magnitude SSRs the RAW
  * double is emitted instead of a rounded one (the q_interpolate
  * half-way-point lesson).
  */
object EconQueries {
  type Q = (SparkSession, String) => DataFrame

  private def cents = round(col("value") * 100).cast("long")

  /** Day-grain integer-cent series per event type — the shared input
    * of the econometric tests. Day-grain means the series length is
    * calendar-bounded: partitions stay small at every corpus scale.
    */
  private def dailyCents(t: Tables): DataFrame =
    t.events.groupBy(col("event_type").as("g"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day"))
      .agg(sum(cents).as("v"))

  /** Fixed split point for the Chow test: 2024-01-16 as an epoch day,
    * the midpoint of the generated event window (a deployment date
    * hyperparameter, like the fixed histogram bounds elsewhere).
    */
  private val chowBreakDay = 19738L

  val queries: Map[String, Q] = Map(
    // Gaps-and-islands: longest consecutive-day activity streak per
    // user (retention's classic shape).
    "q_streaks" -> { (s, dir) =>
      Signal.activeStreaks(Tables(s, dir).events, "user_id", col("ts"))
        .withColumnRenamed("actor", "user_id")
    },

    // Maximum drawdown of the cumulative cent balance per
    // (event_type, user_id) series, rolled up per type.
    "q_drawdown" -> { (s, dir) =>
      Signal.maxDrawdown(Tables(s, dir).events, Seq("event_type", "user_id"),
          col("ts"), cents, col("event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_series"),
          max("max_dd_c").as("max_dd_c"),
          sum("max_dd_c").as("sum_dd_c"))
    },

    // Durbin-Watson residual autocorrelation of the daily-cents trend
    // per event series.
    "q_durbin_watson" -> { (s, dir) =>
      Stats.durbinWatson(dailyCents(Tables(s, dir)), "g", col("day"), col("v"))
        .withColumnRenamed("g", "event_type")
    },

    // Chow structural-break F: did the daily-cents trend change at
    // the fixed mid-window deployment date?
    "q_chow" -> { (s, dir) =>
      Stats.chowTest(dailyCents(Tables(s, dir)), "g", col("day"), col("v"),
          breakX = chowBreakDay)
        .withColumnRenamed("g", "event_type")
    },

    // Lag-1 Granger causality: does each series' yesterday improve
    // the purchase series' today beyond its own yesterday?
    "q_granger" -> { (s, dir) =>
      val d = dailyCents(Tables(s, dir))
      val y = d.filter(col("g") === "purchase").select(col("day"), col("v").as("yv"))
      val x = d.filter(col("g") =!= "purchase")
        .select(col("g").as("xg"), col("day"), col("v").as("xv"))
      Stats.grangerLag1(x.join(y, "day"), "xg", col("day"), col("yv"), col("xv"))
        .withColumnRenamed("xg", "event_type")
    },

    // Cronbach's alpha: are the five event series internally
    // consistent items of one daily-activity scale?
    "q_cronbach" -> { (s, dir) =>
      Stats.cronbachAlpha(dailyCents(Tables(s, dir)), "g", "day", col("v"))
    },

    // Cochran-Armitage trend: is the F-status rate monotone in the
    // ordered order-priority dose?
    "q_cochran_armitage" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      Stats.cochranArmitage(o,
        substring(col("o_orderpriority"), 1, 1).cast("long"),
        col("o_orderstatus") === "F")
    },

    // Friedman rank test: do the event series rank consistently
    // across day blocks?
    "q_friedman" -> { (s, dir) =>
      Stats.friedmanTest(dailyCents(Tables(s, dir)), "g", "day", col("v"))
        .withColumnRenamed("item", "event_type")
    },

    // Katz centrality as exact attenuated path counts over the
    // symmetrized supplier↔part graph (α = 1/8, 3 terms, ×512).
    "q_katz" -> { (s, dir) =>
      // shared memoized symmetric edge asset (GraphAssets)
      Graph.katzPaths(GraphAssets.supplierPartSym(Tables(s, dir)), "src", "dst",
        prepared = true)
    },

    // Single-pass fixed-bound histogram quantiles per return flag —
    // the 100 TB approximate-percentile shape, integer-exact.
    "q_histo_quantiles" -> { (s, dir) =>
      Stats.histoQuantiles(Tables(s, dir).lineitem, "l_returnflag",
        round(col("l_extendedprice") * 100).cast("long"),
        lo = 0L, hi = 10500000L, bins = 256)
    },

    // Ljung-Box portmanteau: is there ANY autocorrelation in the daily
    // series up to lag 4 (the whole-curve complement of q_acf's
    // per-lag view)?
    "q_ljung_box" -> { (s, dir) =>
      Stats.ljungBox(dailyCents(Tables(s, dir)), "g", col("day"), col("v"),
          col("v"), maxLag = 4)
        .withColumnRenamed("g", "event_type")
    },

    // Theil's U: does the weekly-seasonal forecast beat the naive one
    // (U < 1) on each series?
    "q_theil_u" -> { (s, dir) =>
      Stats.theilU(dailyCents(Tables(s, dir)), "g", col("day"), col("v"))
        .withColumnRenamed("g", "event_type")
    },

    // Binned Epanechnikov density profile of line price per return
    // flag — the smooth complement of q_histo_quantiles over the SAME
    // 256-bin histogram, evaluated at 22 grid points.
    "q_kde" -> { (s, dir) =>
      Stats.kdeProfile(Tables(s, dir).lineitem, "l_returnflag",
        round(col("l_extendedprice") * 100).cast("long"),
        lo = 0L, hi = 10500000L, bins = 256, bandwidth = 500000L, gridSteps = 21)
    },

    // Rich-club coefficient of the supplier-part graph at four degree
    // thresholds: do high-degree parts/suppliers interconnect more
    // than chance?
    "q_rich_club" -> { (s, dir) =>
      // shared memoized edge asset; the bipartite id offset makes the
      // directed-distinct form the least/greatest canonical form too
      Graph.richClub(GraphAssets.supplierPart(Tables(s, dir)), "src", "dst",
        ks = Seq(4L, 8L, 16L, 32L), prepared = true)
    },

    // ICC(1,1): how much daily-cents variance is BETWEEN days versus
    // within a day across the five event series (the reliability
    // companion of q_cronbach).
    "q_icc" -> { (s, dir) =>
      Stats.iccOneWay(dailyCents(Tables(s, dir)), "day", col("v"))
    },

    // Page's L: do the five series trend in alphabetical order within
    // each day block (the ordered-alternative sharpening of
    // q_friedman)?
    "q_page_trend" -> { (s, dir) =>
      Stats.pageTrend(dailyCents(Tables(s, dir)), "g", "day", col("v"),
        itemOrder = Seq("click", "error", "purchase", "signup", "view"))
    },

    // Binary-segmentation breakpoint: FIND the structural break
    // q_chow can only test at a fixed date — the split day minimizing
    // SSE_left + SSE_right per series.
    "q_breakpoint" -> { (s, dir) =>
      TimeSeries.binaryBreakpoint(dailyCents(Tables(s, dir)), "g",
        col("day"), col("v"))
        .withColumnRenamed("g", "event_type")
    })

  /** Shared oracle CTE: the day-grain cent series. */
  private val ddCte =
    """dd AS (SELECT event_type AS g, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
      |       FROM events GROUP BY 1, 2)""".stripMargin

  /** Shared oracle CTEs: complete day blocks of the k=5 items. */
  private val completeCte =
    s"""$ddCte,
       |kk AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS k FROM dd),
       |sz AS (SELECT day, CAST(count(*) AS BIGINT) AS ci FROM dd GROUP BY day),
       |cp AS (SELECT dd.g, dd.day, dd.v FROM dd
       |       JOIN sz ON sz.day = dd.day CROSS JOIN kk WHERE sz.ci = kk.k)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id AS actor,
        |             CAST(floor(epoch(ts)/86400) AS BIGINT) AS day FROM events),
        |i AS (SELECT actor, day,
        |        day - row_number() OVER (PARTITION BY actor ORDER BY day) AS island
        |      FROM d),
        |g AS (SELECT actor, island, CAST(count(*) AS BIGINT) AS len,
        |        min(day) AS start_day FROM i GROUP BY 1, 2),
        |p AS (SELECT actor, CAST(sum(len) AS BIGINT) AS n_active_days,
        |        CAST(count(*) AS BIGINT) AS n_streaks, max(len) AS max_streak
        |      FROM g GROUP BY 1)
        |SELECT p.actor AS user_id, p.n_active_days, p.n_streaks, p.max_streak,
        |  min(g.start_day) AS best_start_day
        |FROM p JOIN g ON g.actor = p.actor AND g.len = p.max_streak
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q_drawdown" ->
      """WITH b AS (SELECT event_type, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |             event_id AS tb, CAST(round(value*100) AS BIGINT) AS c FROM events),
        |r AS (SELECT event_type, user_id, t, tb,
        |        CAST(sum(c) OVER (PARTITION BY event_type, user_id ORDER BY t, tb
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM b),
        |pk AS (SELECT event_type, user_id, cum,
        |         CAST(max(cum) OVER (PARTITION BY event_type, user_id ORDER BY t, tb
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
        |       FROM r),
        |s AS (SELECT event_type, user_id, max(peak - cum) AS max_dd_c
        |      FROM pk GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_series,
        |  max(max_dd_c) AS max_dd_c, CAST(sum(max_dd_c) AS BIGINT) AS sum_dd_c
        |FROM s GROUP BY 1""".stripMargin,

    "q_durbin_watson" ->
      s"""WITH $ddCte,
         |l AS (SELECT g, day AS x, v AS y,
         |        day - lag(day) OVER (PARTITION BY g ORDER BY day) AS dx,
         |        v - lag(v) OVER (PARTITION BY g ORDER BY day) AS dy
         |      FROM dd),
         |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |        sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         |        sum(CAST(x AS HUGEINT)*x)::DOUBLE AS sxx,
         |        sum(CAST(x AS HUGEINT)*y)::DOUBLE AS sxy,
         |        sum(CAST(y AS HUGEINT)*y)::DOUBLE AS syy,
         |        sum(CAST(dy AS HUGEINT)*dy)::DOUBLE AS sdd,
         |        sum(CAST(dy AS HUGEINT)*dx)::DOUBLE AS sdx,
         |        sum(CAST(dx AS HUGEINT)*dx)::DOUBLE AS sxx2
         |      FROM l GROUP BY g),
         |bb AS (SELECT s.*, (sxy * n - sx * sy) / (sxx * n - sx * sx) AS b FROM s)
         |SELECT g AS event_type, n, round(b, 6) + 0.0 AS slope,
         |  round((sdd - 2.0 * b * sdx + b * b * sxx2) /
         |        ((syy - sy * sy / n) - b * (sxy - sx * sy / n)), 6) + 0.0 AS dw
         |FROM bb""".stripMargin,

    "q_chow" ->
      s"""WITH $ddCte,
         |t AS (SELECT g, day AS x, v AS y,
         |        CASE WHEN day < $chowBreakDay THEN 1 ELSE 0 END AS seg FROM dd),
         |s AS (SELECT g, seg, CAST(count(*) AS BIGINT) AS n,
         |        sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         |        sum(CAST(x AS HUGEINT)*x)::DOUBLE AS sxx,
         |        sum(CAST(x AS HUGEINT)*y)::DOUBLE AS sxy,
         |        sum(CAST(y AS HUGEINT)*y)::DOUBLE AS syy
         |      FROM t GROUP BY 1, 2),
         |e AS (SELECT g, seg, n,
         |        (syy - sy*sy/n) - ((sxy*n - sx*sy)/(sxx*n - sx*sx)) * (sxy - sx*sy/n) AS ssr
         |      FROM s),
         |tw AS (SELECT g, sum(CASE WHEN seg = 1 THEN ssr END) AS ssr1,
         |         sum(CASE WHEN seg = 0 THEN ssr END) AS ssr2,
         |         CAST(sum(CASE WHEN seg = 1 THEN n END) AS BIGINT) AS n1,
         |         CAST(sum(CASE WHEN seg = 0 THEN n END) AS BIGINT) AS n2
         |       FROM e GROUP BY g),
         |sp AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |        sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         |        sum(CAST(x AS HUGEINT)*x)::DOUBLE AS sxx,
         |        sum(CAST(x AS HUGEINT)*y)::DOUBLE AS sxy,
         |        sum(CAST(y AS HUGEINT)*y)::DOUBLE AS syy
         |       FROM t GROUP BY g),
         |ep AS (SELECT g, n,
         |        (syy - sy*sy/n) - ((sxy*n - sx*sy)/(sxx*n - sx*sx)) * (sxy - sx*sy/n) AS ssr_p
         |       FROM sp)
         |SELECT ep.g AS event_type, ep.n, tw.n1, tw.n2,
         |  round(((ssr_p - (ssr1 + ssr2)) / 2.0) / ((ssr1 + ssr2) / (n - 4.0)), 6) + 0.0 AS f_chow
         |FROM ep JOIN tw ON tw.g = ep.g""".stripMargin,

    "q_granger" ->
      s"""WITH $ddCte,
         |yv AS (SELECT day, v AS yv FROM dd WHERE g = 'purchase'),
         |xv AS (SELECT g AS xg, day, v AS xvv FROM dd WHERE g <> 'purchase'),
         |grid AS (SELECT xg, xv.day AS t, yv.yv AS y, xv.xvv FROM xv JOIN yv ON yv.day = xv.day),
         |l AS (SELECT xg, t, y,
         |        lag(y) OVER (PARTITION BY xg ORDER BY t) AS yl,
         |        lag(xvv) OVER (PARTITION BY xg ORDER BY t) AS xl
         |      FROM grid),
         |f AS (SELECT * FROM l WHERE yl IS NOT NULL AND xl IS NOT NULL),
         |s AS (SELECT xg, CAST(count(*) AS BIGINT) AS n,
         |        sum(yl)::DOUBLE AS sa, sum(xl)::DOUBLE AS sb, sum(y)::DOUBLE AS sy,
         |        sum(CAST(yl AS HUGEINT)*yl)::DOUBLE AS saa,
         |        sum(CAST(xl AS HUGEINT)*xl)::DOUBLE AS sbb,
         |        sum(CAST(yl AS HUGEINT)*xl)::DOUBLE AS sab,
         |        sum(CAST(yl AS HUGEINT)*y)::DOUBLE AS say,
         |        sum(CAST(xl AS HUGEINT)*y)::DOUBLE AS sby,
         |        sum(CAST(y AS HUGEINT)*y)::DOUBLE AS syy
         |      FROM f GROUP BY xg),
         |m AS (SELECT xg, n,
         |        saa - sa*sa/n AS aa, sbb - sb*sb/n AS bb, sab - sa*sb/n AS ab,
         |        say - sa*sy/n AS ay, sby - sb*sy/n AS by2, syy - sy*sy/n AS yy
         |      FROM s),
         |r AS (SELECT xg, n, yy - (ay*ay)/aa AS ssr_r,
         |        yy - (((ay*bb - by2*ab)/(aa*bb - ab*ab))*ay +
         |              ((by2*aa - ay*ab)/(aa*bb - ab*ab))*by2) AS ssr_u
         |      FROM m)
         |SELECT xg AS event_type, n, ssr_r AS ssr_restricted, ssr_u AS ssr_unrestricted,
         |  (ssr_r - ssr_u) / (ssr_u / (n - 3.0)) AS f_granger
         |FROM r""".stripMargin,

    "q_cronbach" ->
      s"""WITH $completeCte,
         |it AS (SELECT g, CAST(count(*) AS BIGINT) AS nb, CAST(sum(v) AS BIGINT) AS si,
         |         sum(CAST(v AS HUGEINT)*v) AS sii FROM cp GROUP BY g),
         |nm AS (SELECT max(nb) AS nb, sum(nb*sii - CAST(si AS HUGEINT)*si) AS num,
         |         CAST(count(*) AS BIGINT) AS k FROM it),
         |bl AS (SELECT day, CAST(sum(v) AS BIGINT) AS tt FROM cp GROUP BY day),
         |dn AS (SELECT CAST(sum(tt) AS BIGINT) AS st, sum(CAST(tt AS HUGEINT)*tt) AS stt FROM bl)
         |SELECT k, nb AS n_blocks,
         |  round((CAST(k AS DOUBLE) / CAST(k - 1 AS DOUBLE)) *
         |    (1.0 - CAST(num AS DOUBLE) / CAST(nb*stt - CAST(st AS HUGEINT)*st AS DOUBLE)), 6) + 0.0 AS alpha
         |FROM nm, dn""".stripMargin,

    "q_cochran_armitage" ->
      """WITH t AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r FROM orders),
        |h AS (SELECT w, CAST(count(*) AS BIGINT) AS ni, CAST(sum(r) AS BIGINT) AS ri
        |      FROM t GROUP BY w),
        |s AS (SELECT CAST(sum(ni) AS BIGINT) AS nn, CAST(sum(ri) AS BIGINT) AS rr,
        |        CAST(sum(w*ni) AS BIGINT) AS swn, CAST(sum(w*ri) AS BIGINT) AS swr,
        |        CAST(sum(w*w*ni) AS BIGINT) AS sw2n FROM h),
        |d2 AS (SELECT nn, rr,
        |         CAST(nn AS HUGEINT)*swr - CAST(rr AS HUGEINT)*swn AS d,
        |         CAST(rr AS HUGEINT)*(nn - rr) *
        |           (CAST(nn AS HUGEINT)*sw2n - CAST(swn AS HUGEINT)*swn) AS den
        |       FROM s)
        |SELECT nn AS n, rr AS n_cases, CAST(d AS BIGINT) AS trend_num,
        |  round(CAST(nn AS DOUBLE) * CAST(d*d AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0 AS z2_trend
        |FROM d2""".stripMargin,

    "q_friedman" ->
      s"""WITH $completeCte,
         |rk AS (SELECT g, day,
         |         CAST(rank() OVER (PARTITION BY day ORDER BY v) AS BIGINT) * 2 +
         |           count(*) OVER (PARTITION BY day, v) - 1 AS r2
         |       FROM cp),
         |it AS (SELECT g, CAST(sum(r2) AS BIGINT) AS r2sum, CAST(count(*) AS BIGINT) AS nb
         |       FROM rk GROUP BY g),
         |qq AS (SELECT sum(CAST(r2sum AS HUGEINT)*r2sum) AS ss, max(nb) AS nb,
         |         CAST(count(*) AS BIGINT) AS k FROM it)
         |SELECT it.g AS event_type, it.nb AS n_blocks, it.r2sum,
         |  round(3.0 * CAST(ss AS DOUBLE) /
         |      (CAST(qq.nb AS DOUBLE) * CAST(qq.k AS DOUBLE) * (CAST(qq.k AS DOUBLE) + 1.0)) -
         |    3.0 * CAST(qq.nb AS DOUBLE) * (CAST(qq.k AS DOUBLE) + 1.0), 6) + 0.0 AS q_friedman,
         |  round(CAST(r2sum AS DOUBLE) / CAST(it.nb * 2 AS DOUBLE), 6) + 0.0 AS mean_rank
         |FROM it, qq""".stripMargin,

    "q_katz" ->
      """WITH e AS (
        |  SELECT CAST(l_suppkey AS BIGINT) AS src, CAST(l_partkey + 1000000000 AS BIGINT) AS dst FROM lineitem
        |  UNION
        |  SELECT CAST(l_partkey + 1000000000 AS BIGINT) AS src, CAST(l_suppkey AS BIGINT) AS dst FROM lineitem
        |),
        |c1 AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS c1 FROM e GROUP BY 1),
        |c2 AS (SELECT e.dst AS id, CAST(sum(c1.c1) AS BIGINT) AS c2 FROM e JOIN c1 ON c1.id = e.src GROUP BY 1),
        |c3 AS (SELECT e.dst AS id, CAST(sum(c2.c2) AS BIGINT) AS c3 FROM e JOIN c2 ON c2.id = e.src GROUP BY 1)
        |SELECT c1.id, c1.c1, coalesce(c2.c2, 0) AS c2, coalesce(c3.c3, 0) AS c3,
        |  64*c1.c1 + 8*coalesce(c2.c2, 0) + coalesce(c3.c3, 0) AS katz512
        |FROM c1 LEFT JOIN c2 ON c2.id = c1.id LEFT JOIN c3 ON c3.id = c1.id""".stripMargin,

    "q_ljung_box" ->
      s"""WITH $ddCte,
         |l AS (SELECT g,
         |        v * count(*) OVER (PARTITION BY g) - sum(v) OVER (PARTITION BY g) AS d,
         |        lag(v, 1) OVER w * count(*) OVER (PARTITION BY g) - sum(v) OVER (PARTITION BY g) AS dl1,
         |        lag(v, 2) OVER w * count(*) OVER (PARTITION BY g) - sum(v) OVER (PARTITION BY g) AS dl2,
         |        lag(v, 3) OVER w * count(*) OVER (PARTITION BY g) - sum(v) OVER (PARTITION BY g) AS dl3,
         |        lag(v, 4) OVER w * count(*) OVER (PARTITION BY g) - sum(v) OVER (PARTITION BY g) AS dl4
         |      FROM dd WINDOW w AS (PARTITION BY g ORDER BY day, v)),
         |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |        sum(CAST(d AS HUGEINT)*d)::DOUBLE AS den,
         |        sum(CAST(dl1 AS HUGEINT)*d)::DOUBLE AS num1,
         |        sum(CAST(dl2 AS HUGEINT)*d)::DOUBLE AS num2,
         |        sum(CAST(dl3 AS HUGEINT)*d)::DOUBLE AS num3,
         |        sum(CAST(dl4 AS HUGEINT)*d)::DOUBLE AS num4
         |      FROM l GROUP BY g)
         |SELECT g AS event_type, n, CAST(4 AS INT) AS lags,
         |  CASE WHEN den > 0 THEN
         |    ((num1/den)*(num1/den)/(CAST(n AS DOUBLE) - 1) +
         |     (num2/den)*(num2/den)/(CAST(n AS DOUBLE) - 2) +
         |     (num3/den)*(num3/den)/(CAST(n AS DOUBLE) - 3) +
         |     (num4/den)*(num4/den)/(CAST(n AS DOUBLE) - 4))
         |    * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2) END AS q_lb
         |FROM s""".stripMargin,

    "q_theil_u" ->
      s"""WITH $ddCte,
         |j AS (SELECT a.g, a.v, b.v AS v1, c.v AS v7
         |      FROM dd a JOIN dd b ON b.g = a.g AND b.day = a.day - 1
         |                JOIN dd c ON c.g = a.g AND c.day = a.day - 7),
         |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days,
         |        sum(CAST(v - v1 AS HUGEINT)*(v - v1))::DOUBLE AS sse_naive,
         |        sum(CAST(v - v7 AS HUGEINT)*(v - v7))::DOUBLE AS sse_seasonal
         |      FROM j GROUP BY g)
         |SELECT g AS event_type, n_days, sse_naive, sse_seasonal,
         |  CASE WHEN sse_naive > 0 THEN sqrt(sse_seasonal / sse_naive) END AS theil_u
         |FROM s""".stripMargin,

    "q_breakpoint" ->
      s"""WITH $ddCte,
         |pre AS (SELECT g, day, v,
         |          CAST(count(*) OVER w AS BIGINT) AS nl,
         |          CAST(sum(v) OVER w AS BIGINT) AS syl,
         |          sum(CAST(v AS HUGEINT)*v) OVER w AS syyl
         |        FROM dd WINDOW w AS (PARTITION BY g ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sy,
         |          sum(CAST(v AS HUGEINT)*v) AS syy FROM dd GROUP BY g),
         |cand AS (SELECT pre.g, pre.day, pre.nl, tot.n,
         |           (CAST(syyl AS DOUBLE) - CAST(syl AS DOUBLE)*CAST(syl AS DOUBLE)/CAST(nl AS DOUBLE))
         |           + (CAST(syy - syyl AS DOUBLE)
         |              - CAST(sy - syl AS DOUBLE)*CAST(sy - syl AS DOUBLE)/CAST(n - nl AS DOUBLE))
         |             AS wsse,
         |           CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)
         |             AS sse_total
         |         FROM pre JOIN tot ON tot.g = pre.g
         |         WHERE nl >= 2 AND n - nl >= 2),
         |best AS (SELECT g, min(wsse) AS best_w FROM cand GROUP BY g),
         |pick AS (SELECT cand.g, min(day) AS break_day, max(n) AS n,
         |           max(wsse) AS wsse, max(sse_total) AS sse_total
         |         FROM cand JOIN best ON best.g = cand.g AND cand.wsse = best.best_w
         |         GROUP BY cand.g)
         |SELECT pick.g AS event_type, pick.break_day, cand.nl AS n_left,
         |  pick.n - cand.nl AS n_right,
         |  round(pick.sse_total, 4) AS sse_total,
         |  round(pick.wsse, 4) AS sse_split,
         |  round(pick.sse_total - pick.wsse, 4) AS reduction
         |FROM pick JOIN cand ON cand.g = pick.g AND cand.day = pick.break_day""".stripMargin,

    "q_icc" ->
      s"""WITH $ddCte,
         |per AS (SELECT day AS s, CAST(count(*) AS BIGINT) AS k, CAST(sum(v) AS BIGINT) AS r
         |        FROM dd GROUP BY day),
         |km AS (SELECT max(k) AS k FROM per),
         |comp AS (SELECT per.s, per.k, per.r FROM per JOIN km ON km.k = per.k),
         |kept AS (SELECT dd.day AS s, dd.v FROM dd JOIN comp ON comp.s = dd.day),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS nk, CAST(sum(v) AS BIGINT) AS gt,
         |        sum(CAST(v AS HUGEINT)*v) AS svv, CAST(max(1) AS BIGINT) AS one FROM kept),
         |rr AS (SELECT CAST(count(*) AS BIGINT) AS n_subj,
         |         sum(CAST(r AS HUGEINT)*r) AS srr, max(k) AS k FROM comp)
         |SELECT n_subj, k,
         |  (CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)
         |          - CAST(gt AS DOUBLE) * CAST(gt AS DOUBLE) /
         |            (CAST(n_subj AS DOUBLE) * CAST(k AS DOUBLE)))
         |        / (CAST(n_subj AS DOUBLE) - 1.0) AS msb,
         |  (CAST(svv AS DOUBLE) - CAST(srr AS DOUBLE) / CAST(k AS DOUBLE))
         |        / (CAST(n_subj AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)) AS msw,
         |  ((CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)
         |          - CAST(gt AS DOUBLE) * CAST(gt AS DOUBLE) /
         |            (CAST(n_subj AS DOUBLE) * CAST(k AS DOUBLE)))
         |        / (CAST(n_subj AS DOUBLE) - 1.0)
         |        - (CAST(svv AS DOUBLE) - CAST(srr AS DOUBLE) / CAST(k AS DOUBLE))
        |          / (CAST(n_subj AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)))
         |       / ((CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)
         |          - CAST(gt AS DOUBLE) * CAST(gt AS DOUBLE) /
         |            (CAST(n_subj AS DOUBLE) * CAST(k AS DOUBLE)))
         |        / (CAST(n_subj AS DOUBLE) - 1.0)
         |        + (CAST(k AS DOUBLE) - 1.0) *
         |          (CAST(svv AS DOUBLE) - CAST(srr AS DOUBLE) / CAST(k AS DOUBLE))
         |          / (CAST(n_subj AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))) AS icc
         |FROM g, rr""".stripMargin,

    "q_page_trend" ->
      s"""WITH $completeCte,
         |rk AS (SELECT g, day,
         |         CAST(rank() OVER (PARTITION BY day ORDER BY v) AS BIGINT) * 2 +
         |           count(*) OVER (PARTITION BY day, v) - 1 AS r2
         |       FROM cp),
         |it AS (SELECT g, CAST(sum(r2) AS BIGINT) AS r2sum, CAST(count(*) AS BIGINT) AS nb
         |       FROM rk GROUP BY g),
         |wtd AS (SELECT g, r2sum, nb,
         |          CASE g WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'purchase' THEN 3
         |                 WHEN 'signup' THEN 4 WHEN 'view' THEN 5 ELSE 0 END AS wj
         |        FROM it),
         |ag AS (SELECT CAST(sum(wj * r2sum) AS BIGINT) AS l2, max(nb) AS n_blocks FROM wtd)
         |SELECT n_blocks, CAST(5 AS INT) AS k,
         |  CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
         |  (CAST(l2 AS DOUBLE) / 2.0
         |    - CAST(n_blocks AS DOUBLE) * 5.0 * (5.0 + 1) * (5.0 + 1) / 4.0)
         |  / sqrt(CAST(n_blocks AS DOUBLE) * 5.0 * 5.0 * (5.0 + 1) * (5.0 * 5.0 - 1) / 144.0)
         |    AS z_l
         |FROM ag""".stripMargin,

    "q_kde" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(round(l_extendedprice*100) AS BIGINT) AS c FROM lineitem),
        |b AS (SELECT g, CAST(least(greatest(
        |        floor(CAST(c - 0 AS DOUBLE) * 256.0 / 10500000.0), 0.0), 255.0) AS BIGINT) AS b
        |      FROM t),
        |hh AS (SELECT g, b, CAST(count(*) AS BIGINT) AS cnt,
        |         0 + ((2*b + 1) * 10500000) // 512 AS cb
        |       FROM b GROUP BY g, b),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
        |gr AS (SELECT (range * 10500000) // 21 + 0 AS grid_c FROM range(0, 22)),
        |kk AS (SELECT g, grid_c,
        |         sum(CAST(cnt AS HUGEINT) *
        |             (CAST(500000 AS HUGEINT)*500000 - CAST(cb - grid_c AS HUGEINT)*(cb - grid_c))) AS ksum
        |       FROM hh JOIN gr ON abs(cb - grid_c) < 500000 GROUP BY 1, 2)
        |SELECT kk.g AS l_returnflag, grid_c,
        |  0.75 * CAST(ksum AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * 500000.0 * 500000.0 * 500000.0) AS density
        |FROM kk JOIN n ON n.g = kk.g""".stripMargin,

    "q_rich_club" ->
      """WITH e0 AS (SELECT least(CAST(l_suppkey AS BIGINT), CAST(l_partkey + 1000000000 AS BIGINT)) AS u,
        |              greatest(CAST(l_suppkey AS BIGINT), CAST(l_partkey + 1000000000 AS BIGINT)) AS v
        |            FROM lineitem),
        |e AS (SELECT DISTINCT u, v FROM e0 WHERE u <> v),
        |d AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM
        |        (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id),
        |ks AS (SELECT unnest(CAST([4, 8, 16, 32] AS BIGINT[])) AS k),
        |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
        |       FROM d CROSS JOIN ks WHERE deg > k GROUP BY k),
        |em AS (SELECT least(du.deg, dv.deg) AS md
        |       FROM e JOIN d du ON du.id = e.u JOIN d dv ON dv.id = e.v),
        |ek AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges
        |       FROM em CROSS JOIN ks WHERE md > k GROUP BY k)
        |SELECT nk.k, n_nodes, CAST(coalesce(n_edges, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN n_nodes > 1 THEN
        |    CAST(coalesce(n_edges, 0) * 2 AS DOUBLE) / CAST(n_nodes * (n_nodes - 1) AS DOUBLE)
        |  END AS phi
        |FROM nk LEFT JOIN ek ON ek.k = nk.k""".stripMargin,

    "q_histo_quantiles" ->
      """WITH t AS (SELECT l_returnflag AS g, CAST(round(l_extendedprice*100) AS BIGINT) AS c FROM lineitem),
        |b AS (SELECT g, CAST(least(greatest(
        |        floor(CAST(c - 0 AS DOUBLE) * 256.0 / 10500000.0), 0.0), 255.0) AS BIGINT) AS b
        |      FROM t),
        |h AS (SELECT g, b, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
        |cw AS (SELECT g, b, cnt,
        |         CAST(sum(cnt) OVER (PARTITION BY g ORDER BY b
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |         CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS ntot
        |       FROM h),
        |q AS (SELECT g, max(ntot) AS n,
        |        min(CASE WHEN cum >= floor(CAST(ntot*1 + 1 AS DOUBLE) / 2.0) THEN b END) AS b50,
        |        min(CASE WHEN cum >= floor(CAST(ntot*9 + 9 AS DOUBLE) / 10.0) THEN b END) AS b90,
        |        min(CASE WHEN cum >= floor(CAST(ntot*99 + 99 AS DOUBLE) / 100.0) THEN b END) AS b99
        |      FROM cw GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  CAST(0 + floor(CAST(b50 AS DOUBLE) * 10500000.0 / 256.0) AS BIGINT) AS p50_lo_c,
        |  CAST(0 + floor(CAST(b90 AS DOUBLE) * 10500000.0 / 256.0) AS BIGINT) AS p90_lo_c,
        |  CAST(0 + floor(CAST(b99 AS DOUBLE) * 10500000.0 / 256.0) AS BIGINT) AS p99_lo_c
        |FROM q""".stripMargin)
}
