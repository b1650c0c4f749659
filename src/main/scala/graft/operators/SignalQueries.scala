package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Oracle-checked queries for the interval/bar/arena layer
  * (Signal.scala, Arena.scala) plus the unpivot/mode relational
  * surface. Exactness per SURVEY.md §5: epoch-second and integer-cent
  * arithmetic everywhere, final float ratios rounded 4dp (6dp for the
  * correlation family) identically in the oracle SQL.
  */
object SignalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def cents = round(col("value") * 100).cast("long")

  /** Per-(contender, trial-day) integer score: event types compete on
    * total daily cents — the arena trial table feeding winMatrix.
    */
  private def dayScores(t: Tables): DataFrame =
    t.events.groupBy(col("event_type").as("m"),
        (floor(col("ts").cast("long") / 86400) * 86400).cast("long").as("trial"))
      .agg(sum(cents).as("s"))

  val queries: Map[String, Q] = Map(
    // Overlapping-interval islands: per supplier, shipments each
    // covering [shipdate, shipdate + quantity days) merge into busy
    // spans — the containment-safe form of sessionization.
    "q_interval_merge" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
        .withColumn("sd", col("l_shipdate").cast("timestamp").cast("long"))
      Signal.intervalIslands(li, "l_suppkey",
          col("sd"), col("sd") + col("l_quantity").cast("long") * 86400L,
          Seq(col("l_orderkey"), col("l_linenumber")))
        .withColumnRenamed("key", "l_suppkey")
    },

    // Daily OHLC bars per event series — open/close ride min_by/max_by
    // so the whole bar is one map-side-combinable aggregation.
    "q_ohlc" -> { (s, dir) =>
      Signal.ohlcBars(Tables(s, dir).events, "event_type", col("ts"), cents,
          col("event_id"), 86400L)
        .withColumnRenamed("key", "event_type")
    },

    // Time-weighted average per (series, user): cent×second products
    // in DECIMAL(38,0), one divide at the end.
    "q_twap" -> { (s, dir) =>
      Signal.twap(Tables(s, dir).events, Seq("event_type", "user_id"),
        col("ts"), cents, col("event_id"))
    },

    // Trailing 7-day distinct users per (series, day) — the DAU/WAU
    // ledger without a distinct-over-window.
    "q_sliding_distinct" -> { (s, dir) =>
      Signal.trailingDistinct(Tables(s, dir).events, "event_type",
          col("user_id"), col("ts"), days = 7)
        .withColumnRenamed("key", "event_type")
    },

    // Fixed-grid resampling with LINEAR interpolation between the
    // bracketing observations (two-sided complement of q_resample_ffill).
    "q_interpolate" -> { (s, dir) =>
      Signal.resampleInterpolate(Tables(s, dir).events, "user_id", "ts",
        "value", stepSeconds = 3600L)
    },

    // Arena win matrix: head-to-head record of event series on shared
    // trial days.
    "q_winrate" -> { (s, dir) =>
      Arena.winMatrix(dayScores(Tables(s, dir)))
    },

    // Bradley-Terry latent strengths from the same matches, 3 MM
    // rounds (Bradley & Terry 1952; Hunter 2004).
    "q_bradley_terry" -> { (s, dir) =>
      Arena.bradleyTerry(Arena.winMatrix(dayScores(Tables(s, dir))), iters = 3)
    },

    // Native melt: four lineitem measures unpivoted to (metric, v)
    // rows, re-aggregated per (flag, metric) — Spark's Dataset.unpivot
    // (the UNPIVOT/stack surface), integer units end to end.
    "q_unpivot" -> { (s, dir) =>
      val base = Tables(s, dir).lineitem.select(
        col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("quantity_c"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        round(col("l_discount") * 10000).cast("long").as("discount_bp"),
        round(col("l_tax") * 10000).cast("long").as("tax_bp"))
      base.unpivot(
          Array(col("l_returnflag")),
          Array(col("quantity_c"), col("price_c"), col("discount_bp"), col("tax_bp")),
          "metric", "v")
        .groupBy("l_returnflag", "metric")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
        .withColumn("mean",
          round(col("total").cast("double") / col("n").cast("double"), 4))
    },

    // Per-group mode with deterministic smallest-value tie-break, at
    // value-histogram grain (max_by over the (count, -value) struct —
    // no row-grain window).
    "q_mode" -> { (s, dir) =>
      val h = Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("v"))
        .agg(count(lit(1)).as("cnt"))
      h.groupBy("l_returnflag", "l_linestatus")
        .agg(
          max_by(col("v"), struct(col("cnt"), (-col("v")).as("nv"))).as("mode_v"),
          max(col("cnt")).as("mode_n"),
          count(lit(1)).as("n_distinct"),
          sum(col("cnt")).as("n"))
    })

  private val scCte =
    """sc AS (SELECT event_type AS m,
      |         CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS trial,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s
      |       FROM events GROUP BY 1, 2)""".stripMargin

  private val matCte =
    """mat AS (SELECT x.m AS a, y.m AS b, CAST(count(*) AS BIGINT) AS n,
      |          CAST(sum(CASE WHEN x.s > y.s THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
      |          CAST(sum(CASE WHEN x.s < y.s THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
      |          CAST(sum(CASE WHEN x.s = y.s THEN 1 ELSE 0 END) AS BIGINT) AS ties
      |        FROM sc x JOIN sc y ON x.trial = y.trial AND x.m < y.m
      |        GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_interval_merge" ->
      """WITH iv AS (SELECT l_suppkey AS key,
        |         CAST(floor(epoch(l_shipdate)) AS BIGINT) AS s,
        |         CAST(floor(epoch(l_shipdate)) AS BIGINT)
        |           + CAST(l_quantity AS BIGINT) * 86400 AS e,
        |         l_orderkey AS t1, l_linenumber AS t2 FROM lineitem),
        |f AS (SELECT key, s, e, t1, t2,
        |        max(e) OVER (PARTITION BY key ORDER BY s, e, t1, t2
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM iv),
        |isl AS (SELECT key, s, e,
        |          sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY key ORDER BY s, e, t1, t2
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |        FROM f),
        |g AS (SELECT key, island, min(s) AS is0, max(e) AS is1,
        |        CAST(count(*) AS BIGINT) AS niv
        |      FROM isl GROUP BY 1, 2)
        |SELECT key AS l_suppkey, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(niv) AS BIGINT) AS n_intervals,
        |  CAST(sum(is1 - is0) AS BIGINT) AS covered_s,
        |  CAST(max(is1 - is0) AS BIGINT) AS widest_s
        |FROM g GROUP BY 1""".stripMargin,
    "q_ohlc" ->
      """WITH e AS (SELECT event_type AS key,
        |         CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS slot,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id,
        |         CAST(round(value*100) AS BIGINT) AS c FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY key, slot
        |          ORDER BY sec, event_id) AS ra,
        |        row_number() OVER (PARTITION BY key, slot
        |          ORDER BY sec DESC, event_id DESC) AS rd
        |      FROM e)
        |SELECT key AS event_type, slot,
        |  max(CASE WHEN ra = 1 THEN c END) AS open_c,
        |  max(c) AS high_c, min(c) AS low_c,
        |  max(CASE WHEN rd = 1 THEN c END) AS close_c,
        |  CAST(count(*) AS BIGINT) AS volume,
        |  CAST(sum(c) AS BIGINT) AS turnover_c
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q_twap" ->
      """WITH e AS (SELECT event_type, user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id,
        |         CAST(round(value*100) AS BIGINT) AS c FROM events),
        |l AS (SELECT *, lead(sec) OVER (PARTITION BY event_type, user_id
        |        ORDER BY sec, event_id) AS nxt FROM e),
        |a AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |        max(sec) - min(sec) AS span_s,
        |        sum(CAST(nxt - sec AS HUGEINT) * c) AS wsum
        |      FROM l GROUP BY 1, 2)
        |SELECT event_type, user_id, n_obs, CAST(span_s AS BIGINT) AS span_s,
        |  round(wsum::DOUBLE / CAST(span_s AS DOUBLE), 4) AS twap_c
        |FROM a WHERE span_s > 0""".stripMargin,
    "q_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT event_type AS key, user_id,
        |         CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS d FROM events),
        |mx AS (SELECT max(d) AS mx FROM ud),
        |c AS (SELECT DISTINCT key, user_id, d + o.off * 86400 AS cd
        |      FROM ud CROSS JOIN (SELECT unnest(range(7)) AS off) o)
        |SELECT key AS event_type, cd AS day_slot, CAST(count(*) AS BIGINT) AS active
        |FROM c, mx WHERE cd <= mx GROUP BY 1, 2""".stripMargin,
    "q_interpolate" ->
      """WITH e AS (SELECT user_id AS key,
        |         CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS slot,
        |         CAST(round(value*100) AS BIGINT) AS c FROM events),
        |sa AS (SELECT key, slot, CAST(sum(c) AS HUGEINT) AS sc,
        |         CAST(count(*) AS HUGEINT) AS cn FROM e GROUP BY 1, 2),
        |sp AS (SELECT key, min(slot) AS s0, max(slot) AS s1 FROM e GROUP BY key),
        |g AS (SELECT key, unnest(range(s0, s1 + 3600, 3600)) AS slot FROM sp),
        |j AS (SELECT g.key, g.slot, sa.sc, sa.cn,
        |        CASE WHEN sa.sc IS NOT NULL THEN g.slot END AS os
        |      FROM g LEFT JOIN sa ON sa.key = g.key AND sa.slot = g.slot),
        |w AS (SELECT key, slot, sc, cn,
        |        last_value(sc IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS psc,
        |        last_value(cn IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pcn,
        |        last_value(os IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
        |        first_value(sc IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nsc,
        |        first_value(cn IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ncn,
        |        first_value(os IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns
        |      FROM j),
        |nd AS (SELECT key, slot, sc, cn,
        |         CASE WHEN sc IS NOT NULL THEN sc
        |              WHEN psc IS NOT NULL AND nsc IS NOT NULL
        |                THEN psc * ncn * CAST(ns - slot AS HUGEINT)
        |                   + nsc * pcn * CAST(slot - ps AS HUGEINT)
        |              ELSE coalesce(psc, nsc) END AS num,
        |         CASE WHEN sc IS NOT NULL THEN cn * 100
        |              WHEN psc IS NOT NULL AND nsc IS NOT NULL
        |                THEN pcn * ncn * CAST(ns - ps AS HUGEINT) * 100
        |              ELSE coalesce(pcn, ncn) * 100 END AS den
        |       FROM w)
        |SELECT key, slot,
        |  CAST(sc AS DOUBLE) / CAST(cn * 100 AS DOUBLE) AS v_obs,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS v_interp,
        |  sc IS NULL AS is_gap
        |FROM nd""".stripMargin,
    "q_winrate" ->
      s"""WITH $scCte,
         |$matCte
         |SELECT a, b, n, wins_a, wins_b, ties,
         |  CASE WHEN wins_a + wins_b > 0
         |       THEN round(CAST(wins_a AS DOUBLE) / CAST(wins_a + wins_b AS DOUBLE), 4)
         |  END AS win_rate_a
         |FROM mat""".stripMargin,
    "q_bradley_terry" ->
      s"""WITH $scCte,
         |$matCte,
         |sym AS (SELECT a AS i, b AS j, wins_a AS w, wins_a + wins_b AS ng FROM mat
         |        UNION ALL
         |        SELECT b AS i, a AS j, wins_b AS w, wins_a + wins_b AS ng FROM mat),
         |symf AS (SELECT * FROM sym WHERE ng > 0),
         |wins AS (SELECT i, sum(w)::DOUBLE AS wi, CAST(sum(ng) AS BIGINT) AS games
         |         FROM symf GROUP BY i),
         |p0 AS (SELECT i, 1.0::DOUBLE AS p FROM wins),
         |d1 AS (SELECT s.i, sum(CAST(s.ng AS DOUBLE) / (pi.p + pj.p)) AS den
         |       FROM symf s JOIN p0 pi ON pi.i = s.i JOIN p0 pj ON pj.i = s.j
         |       GROUP BY s.i),
         |r1 AS (SELECT w.i, w.wi / d.den AS praw FROM wins w JOIN d1 d ON d.i = w.i),
         |k1 AS (SELECT count(*)::DOUBLE / sum(praw) AS k FROM r1),
         |p1 AS (SELECT i, praw * k AS p FROM r1, k1),
         |d2 AS (SELECT s.i, sum(CAST(s.ng AS DOUBLE) / (pi.p + pj.p)) AS den
         |       FROM symf s JOIN p1 pi ON pi.i = s.i JOIN p1 pj ON pj.i = s.j
         |       GROUP BY s.i),
         |r2 AS (SELECT w.i, w.wi / d.den AS praw FROM wins w JOIN d2 d ON d.i = w.i),
         |k2 AS (SELECT count(*)::DOUBLE / sum(praw) AS k FROM r2),
         |p2 AS (SELECT i, praw * k AS p FROM r2, k2),
         |d3 AS (SELECT s.i, sum(CAST(s.ng AS DOUBLE) / (pi.p + pj.p)) AS den
         |       FROM symf s JOIN p2 pi ON pi.i = s.i JOIN p2 pj ON pj.i = s.j
         |       GROUP BY s.i),
         |r3 AS (SELECT w.i, w.wi / d.den AS praw FROM wins w JOIN d3 d ON d.i = w.i),
         |k3 AS (SELECT count(*)::DOUBLE / sum(praw) AS k FROM r3),
         |p3 AS (SELECT i, praw * k AS p FROM r3, k3)
         |SELECT w.i AS m, w.games, CAST(w.wi AS BIGINT) AS wins,
         |  round(p3.p, 4) AS strength
         |FROM wins w JOIN p3 ON p3.i = w.i""".stripMargin,
    "q_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'quantity_c' AS metric,
        |         CAST(round(l_quantity*100) AS BIGINT) AS v FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'price_c',
        |         CAST(round(l_extendedprice*100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount_bp',
        |         CAST(round(l_discount*10000) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax_bp',
        |         CAST(round(l_tax*10000) AS BIGINT) FROM lineitem)
        |SELECT l_returnflag, metric, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  round(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS mean
        |FROM m GROUP BY 1, 2""".stripMargin,
    "q_mode" ->
      """WITH h AS (SELECT l_returnflag, l_linestatus,
        |         CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS cnt
        |       FROM lineitem GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |        ORDER BY cnt DESC, v ASC) AS rn FROM h),
        |a AS (SELECT l_returnflag, l_linestatus,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(sum(cnt) AS BIGINT) AS n
        |      FROM h GROUP BY 1, 2)
        |SELECT a.l_returnflag, a.l_linestatus, r.v AS mode_v, r.cnt AS mode_n,
        |  a.n_distinct, a.n
        |FROM a JOIN r ON r.l_returnflag = a.l_returnflag
        | AND r.l_linestatus = a.l_linestatus AND r.rn = 1""".stripMargin)
}
