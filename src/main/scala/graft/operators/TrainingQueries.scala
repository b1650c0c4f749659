package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Oracle-checked queries for the dataset-assembly planning operators
  * (TrainingMix.scala). All use exact arithmetic the DuckDB twin
  * reproduces bit-for-bit: quarter-percentiles over small integers
  * interpolate exactly in doubles, and the mix weights multiply into
  * exact token targets.
  */
object TrainingQueries {
  type Q = (SparkSession, String) => DataFrame

  private def nTok = size(split(col("text"), " ")).cast("long")

  private val mixWeights = Map("src0" -> 0.2, "src1" -> 0.15)
  private val mixDefault = 0.0325
  private val mixBudget = 10000000L

  val queries: Map[String, Q] = Map(
    // Per-source unigram KL divergence from the corpus mixture — the
    // source-distinctiveness diagnostic behind mix reweighting.
    "q_source_kl" -> { (s, dir) =>
      TrainingMix.sourceKlDivergence(Tables(s, dir).documents, "source", "text")
    },

    // Symmetric, bounded companion to q_source_kl: per-source JSD from
    // the corpus unigram mixture (defined even at structural zeros).
    "q_source_jsd" -> { (s, dir) =>
      TrainingMix.sourceJsDivergence(Tables(s, dir).documents, "source", "text")
    },

    // Hellinger distance / Bhattacharyya coefficient per source — the
    // bounded METRIC member of the drift family (KL/JSD/PSI/EMD).
    "q_hellinger" -> { (s, dir) =>
      TrainingMix.sourceHellinger(Tables(s, dir).documents, "source", "text")
    },

    // Dunning G² keyness: which head-of-vocabulary terms characterize
    // each source against the rest of the corpus.
    "q_keyness" -> { (s, dir) =>
      TrainingMix.dunningKeyness(Tables(s, dir).documents, "source", "text")
    },

    // Burrows' Delta stylometric distance between every source pair
    // over the corpus top-30 terms — which sources write alike.
    "q_burrows_delta" -> { (s, dir) =>
      TrainingMix.burrowsDelta(Tables(s, dir).documents, "source", "text",
        topK = 30)
    },

    // Per-language bottom-quartile quality cut: every doc tagged with
    // its stratum's exact p25 token-count floor.
    "q_quality_cut" -> { (s, dir) =>
      TrainingMix.percentileCut(
        Tables(s, dir).documents.select(col("doc_id"), col("lang"), nTok.as("n_tokens")),
        stratumCol = "lang", scoreCol = "n_tokens", p = 0.25)
    },

    // Greedy per-source token-budget cut at score-histogram grain:
    // keep the best docs (char-length proxy) until 800 tokens per
    // source are spent, boundary bucket kept whole — integers only.
    "q_budget_cut" -> { (s, dir) =>
      TrainingMix.budgetCut(
        Tables(s, dir).documents.select(col("source"),
          length(col("text")).cast("long").as("score"), nTok.as("toks")),
        "source", col("score"), col("toks"), budgetPerSource = 800L)
    },

    // Curriculum interleave: 4 difficulty-quantile buckets per
    // language, scheduled round-robin across languages (easy tier of
    // every language first) — integer histogram bucketing, no ntile.
    "q_curriculum" -> { (s, dir) =>
      TrainingMix.curriculumInterleave(
        Tables(s, dir).documents.select(col("lang"), nTok.as("d")),
        "lang", col("d"), nBuckets = 4)
    },

    // Mixture schedule: token budget × per-source weight → epochs.
    "q_mix_plan" -> { (s, dir) =>
      TrainingMix.mixPlan(Tables(s, dir).documents, "source", nTok,
        weights = mixWeights, defaultWeight = mixDefault, budget = mixBudget)
    },

    // Temperature-2 mixture reweighting: p_s ∝ sqrt(n_s) flattens the
    // natural source distribution (sqrt = IEEE-exact across engines).
    "q_temperature_mix" -> { (s, dir) =>
      TrainingMix.temperatureMix(Tables(s, dir).documents, "source", nTok,
        budget = mixBudget)
    },

    // Padding economics of 64-token length buckets.
    "q_padding_waste" -> { (s, dir) =>
      TrainingMix.paddingWaste(Tables(s, dir).documents, nTok, bucketSize = 64)
    },

    // Canonical-doc election over the planted dup clusters: longest
    // doc wins, ties to smallest id.
    "q_canonical_pick" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val cc = Graph.connectedComponentsAll(CurationQueries.plantedEdges(d), "src", "dst", d, "doc_id")
      TrainingMix.electCanonical(cc, d, "doc_id", nTok)
    },

    // Incremental aggregate maintenance: yesterday's per-source state
    // plus today's delta re-aggregate from (key, partial) PAIRS — the
    // raw prior rows are never rescanned. The oracle computes the full
    // aggregate directly, so the hash-match PROVES the incremental
    // merge equals a from-scratch recompute.
    "q_incr_agg" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val prior = d.filter(pmod(col("doc_id"), lit(10)) < 8)
        .groupBy("source").agg(count(lit(1)).as("n"), sum(nTok).as("toks"))
      val delta = d.filter(pmod(col("doc_id"), lit(10)) >= 8)
        .groupBy("source").agg(count(lit(1)).as("n"), sum(nTok).as("toks"))
      prior.unionByName(delta).groupBy("source")
        .agg(sum(col("n")).as("n_docs"), sum(col("toks")).as("total_tokens"))
    },

    // #42ag2 incremental JOIN maintenance (the classic delta rule
    // ΔQ = ΔR⋈S for insert-only deltas; Blakeley et al. 1986): the
    // materialized orders⋈lineitem rollup is maintained as
    // base-join ∪ delta-join — only the delta (1/10 of orders here)
    // re-joins, the base result is reused as-is. The oracle computes
    // the MONOLITHIC join, so the hash-match IS the maintenance-
    // correctness proof. At 100 TB the delta join probes a bucketed
    // lineitem (Sinks.writeBucketed) and touches no base-result rows.
    "q_incr_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val li = t.lineitem.select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      def joined(o: org.apache.spark.sql.DataFrame) =
        o.select(col("o_orderkey"), col("o_orderpriority"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      val base = joined(t.orders.filter(col("o_orderkey") % 10 =!= 0))
      val delta = joined(t.orders.filter(col("o_orderkey") % 10 === 0))
      base.unionByName(delta).groupBy("o_orderpriority")
        .agg(sum(col("n")).as("n_items"), sum(col("cents")).as("total_cents"))
    },

    // ANALYZE-style corpus profile: one aggregation pass emits the
    // dataset card a training run is gated on — row count, per-column
    // null/distinct counts, value ranges, token totals. Exact distinct
    // (not approx) so the oracle matches; swap in approx_count_distinct
    // at 100 TB if the two-phase exact distinct ever dominates.
    // Poisson-bootstrap 95% CI on per-source mean document length:
    // error bars in one pass, weights from md5 hex thresholds so both
    // engines draw IDENTICAL resamples (no floats in the weighting).
    "q_bootstrap_ci" -> { (s, dir) =>
      DataOps.poissonBootstrapCi(Tables(s, dir).documents,
        "source", "doc_id", col("n_chars"), replicas = 50, seed = 7L)
        .orderBy("source")
    },

    "q_profile_stats" -> { (s, dir) =>
      Tables(s, dir).documents.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
        countDistinct(col("source")).as("d_source"),
        countDistinct(col("lang")).as("d_lang"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(nTok).as("total_tokens"),
        min(length(col("text"))).cast("long").as("min_chars"),
        max(length(col("text"))).cast("long").as("max_chars"))
    }
  )

  private def weightCase: String =
    "CASE source WHEN 'src0' THEN CAST(0.2 AS DOUBLE) WHEN 'src1' THEN CAST(0.15 AS DOUBLE) " +
      "ELSE CAST(0.0325 AS DOUBLE) END"

  /** The bootstrap weight CASE, rendered from the SAME hex thresholds
    * the Spark side uses (DataOps.poissonCdf) — zero drift possible.
    */
  private def bootstrapWeightCase(h: String): String =
    DataOps.poissonCdf.zipWithIndex
      .map { case (t, k) => s"WHEN $h < '$t' THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${DataOps.poissonCdf.length} END")

  val oracles: Map[String, String] = Map(
    // Same md5 buckets, same hex thresholds, same exact integer
    // replicate sums; quantile_cont ≡ Spark's percentile.
    "q_bootstrap_ci" ->
      s"""WITH x AS (SELECT d.source AS g, d.n_chars AS v, b.k AS b,
         |        substr(md5(d.doc_id::VARCHAR || ':' || b.k::VARCHAR || ':7'), 1, 8) AS h
         |      FROM documents d CROSS JOIN range(0, 50) b(k)),
         |rm AS (SELECT g, b, sum(${bootstrapWeightCase("h")} * v) AS sx,
         |              sum(${bootstrapWeightCase("h")}) AS sw
         |       FROM x GROUP BY g, b),
         |ci AS (SELECT g, round(quantile_cont(sx::DOUBLE / sw, 0.025), 6) AS lo95,
         |              round(quantile_cont(sx::DOUBLE / sw, 0.975), 6) AS hi95
         |       FROM rm WHERE sw > 0 GROUP BY g),
         |pt AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_rows,
         |              round(sum(n_chars)::DOUBLE / count(*), 6) AS mean
         |       FROM documents GROUP BY 1)
         |SELECT pt.g AS source, pt.n_rows, pt.mean, ci.lo95, ci.hi95
         |FROM pt JOIN ci USING (g)
         |ORDER BY source""".stripMargin,
    "q_source_kl" ->
      """WITH sw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |c AS (SELECT source, w, count(*) AS c_sw FROM sw GROUP BY 1, 2),
        |wt AS (SELECT w, sum(c_sw) AS c_w FROM c GROUP BY 1),
        |st AS (SELECT source, sum(c_sw) AS n_s FROM c GROUP BY 1),
        |n AS (SELECT sum(c_sw) AS n FROM c)
        |SELECT c.source, CAST(st.n_s AS BIGINT) AS n_tokens,
        |  round(sum((c.c_sw / CAST(st.n_s AS DOUBLE)) *
        |            log2((c.c_sw / CAST(st.n_s AS DOUBLE)) / (wt.c_w / CAST(n.n AS DOUBLE)))), 4)
        |    AS kl_bits
        |FROM c JOIN wt USING (w) JOIN st USING (source) CROSS JOIN n
        |GROUP BY c.source, st.n_s""".stripMargin,
    "q_hellinger" ->
      """WITH sw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |c AS (SELECT source, w, count(*) AS c_sw FROM sw GROUP BY 1, 2),
        |wt AS (SELECT w, sum(c_sw) AS c_w FROM c GROUP BY 1),
        |st AS (SELECT source, sum(c_sw) AS n_s FROM c GROUP BY 1),
        |n AS (SELECT sum(c_sw) AS n FROM c),
        |b AS (SELECT c.source, CAST(max(st.n_s) AS BIGINT) AS n_tokens,
        |        sum(sqrt((c.c_sw / CAST(st.n_s AS DOUBLE)) * (wt.c_w / CAST(n.n AS DOUBLE)))) AS bc
        |      FROM c JOIN wt USING (w) JOIN st USING (source) CROSS JOIN n
        |      GROUP BY c.source)
        |SELECT source, n_tokens,
        |  round(bc, 4) AS bhattacharyya_coef,
        |  round(sqrt(greatest(1.0 - bc, 0.0)), 4) AS hellinger
        |FROM b""".stripMargin,
    "q_keyness" ->
      """WITH sw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw FROM sw GROUP BY 1, 2),
        |wt AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM c GROUP BY 1),
        |st AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM c GROUP BY 1),
        |n AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n FROM c),
        |f AS (SELECT c.source, c.w, c.c_sw, wt.c_w, st.n_s, n.n
        |      FROM c JOIN wt USING (w) JOIN st USING (source) CROSS JOIN n
        |      WHERE wt.c_w >= greatest(50, n.n // 10000))
        |SELECT source, w AS term, c_sw AS c_in_source, c_w AS c_corpus,
        |  round(2.0 * (CAST(c_sw AS DOUBLE) *
        |      ln(CAST(c_sw AS DOUBLE) /
        |         (CAST(c_w AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))) +
        |    CASE WHEN c_w > c_sw THEN CAST(c_w - c_sw AS DOUBLE) *
        |      ln(CAST(c_w - c_sw AS DOUBLE) /
        |         (CAST(c_w AS DOUBLE) * CAST(n - n_s AS DOUBLE) / CAST(n AS DOUBLE)))
        |    ELSE 0.0 END), 4) AS g2,
        |  CAST(c_sw AS HUGEINT) * n > CAST(c_w AS HUGEINT) * n_s AS over
        |FROM f""".stripMargin,
    "q_burrows_delta" ->
      """WITH sw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw FROM sw GROUP BY 1, 2),
        |wt AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM c GROUP BY 1),
        |top AS (SELECT w FROM wt ORDER BY c_w DESC, w LIMIT 30),
        |st AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM c GROUP BY 1),
        |grid AS (SELECT top.w, st.source,
        |           CAST(coalesce(c.c_sw, 0) AS DOUBLE) / CAST(st.n_s AS DOUBLE) AS f
        |         FROM top CROSS JOIN st
        |         LEFT JOIN c ON c.w = top.w AND c.source = st.source),
        |stat AS (SELECT w, CAST(count(*) AS BIGINT) AS ns, sum(f) AS sf, sum(f*f) AS sff
        |         FROM grid GROUP BY w),
        |z AS (SELECT grid.w, grid.source,
        |        CASE WHEN sqrt((sff - sf*sf/CAST(ns AS DOUBLE)) / CAST(ns - 1 AS DOUBLE)) > 0
        |             THEN (f - sf/CAST(ns AS DOUBLE)) /
        |                  sqrt((sff - sf*sf/CAST(ns AS DOUBLE)) / CAST(ns - 1 AS DOUBLE))
        |             ELSE 0.0 END AS z
        |      FROM grid JOIN stat ON stat.w = grid.w)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  round(sum(abs(a.z - b.z)) / CAST(count(*) AS DOUBLE), 6) AS delta
        |FROM z a JOIN z b ON b.w = a.w AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "q_budget_cut" ->
      """WITH d AS (SELECT source, CAST(length(text) AS BIGINT) AS s,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tk FROM documents),
        |h AS (SELECT source, s, CAST(count(*) AS BIGINT) AS docs,
        |        CAST(sum(tk) AS BIGINT) AS btoks FROM d GROUP BY 1, 2),
        |c AS (SELECT *, coalesce(sum(btoks) OVER (PARTITION BY source ORDER BY s DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM h)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_buckets_kept,
        |  CAST(sum(docs) AS BIGINT) AS docs_kept,
        |  CAST(sum(btoks) AS BIGINT) AS tokens_kept,
        |  CAST(min(s) AS BIGINT) AS cutoff_score,
        |  CAST(800 AS BIGINT) AS budget,
        |  (1000000 * CAST(sum(btoks) AS BIGINT)) // 800 AS utilization_ppm
        |FROM c WHERE bef < 800 GROUP BY source""".stripMargin,
    "q_curriculum" ->
      """WITH d AS (SELECT lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dd FROM documents),
        |h AS (SELECT lang, dd, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(dd) AS BIGINT) AS toks FROM d GROUP BY 1, 2),
        |w AS (SELECT *, coalesce(sum(c) OVER (PARTITION BY lang ORDER BY dd
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
        |        sum(c) OVER (PARTITION BY lang) AS n FROM h),
        |b AS (SELECT lang, (cum_prev * 4) // n AS bucket, c, toks, dd FROM w),
        |g AS (SELECT lang, bucket, CAST(sum(c) AS BIGINT) AS n_docs,
        |        CAST(sum(toks) AS BIGINT) AS n_tokens,
        |        CAST(min(dd) AS BIGINT) AS min_difficulty,
        |        CAST(max(dd) AS BIGINT) AS max_difficulty
        |      FROM b GROUP BY 1, 2),
        |idx AS (SELECT lang,
        |          CAST(row_number() OVER (ORDER BY lang) - 1 AS INTEGER) AS stratum_index,
        |          CAST((SELECT count(DISTINCT lang) FROM g) AS BIGINT) AS n_strata
        |        FROM (SELECT DISTINCT lang FROM g))
        |SELECT g.lang, CAST(g.bucket AS BIGINT) AS bucket, n_docs, n_tokens,
        |  min_difficulty, max_difficulty, idx.stratum_index,
        |  CAST(g.bucket * idx.n_strata + idx.stratum_index AS BIGINT) AS schedule_pos
        |FROM g JOIN idx USING (lang)""".stripMargin,
    "q_source_jsd" ->
      """WITH sw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |c AS (SELECT source, w, count(*) AS c_sw FROM sw GROUP BY 1, 2),
        |wt AS (SELECT w, sum(c_sw) AS c_w FROM c GROUP BY 1),
        |st AS (SELECT source, sum(c_sw) AS n_s FROM c GROUP BY 1),
        |n AS (SELECT sum(c_sw) AS n FROM c),
        |fl AS (SELECT st.source, st.n_s, wt.w, wt.c_w, COALESCE(c.c_sw, 0) AS c0
        |       FROM wt CROSS JOIN st LEFT JOIN c ON c.source = st.source AND c.w = wt.w),
        |t AS (SELECT source, n_s, c0,
        |        CAST(c0 AS DOUBLE) / CAST(n_s AS DOUBLE) AS p,
        |        CAST(c_w AS DOUBLE) / CAST(n.n AS DOUBLE) AS q
        |      FROM fl, n),
        |u AS (SELECT source, n_s,
        |        ((CASE WHEN c0 > 0 THEN p * log2(p / ((p + q) / 2)) ELSE 0.0 END) +
        |         q * log2(q / ((p + q) / 2))) / 2 AS term
        |      FROM t)
        |SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
        |  round(sum(term), 4) + 0.0 AS jsd_bits
        |FROM u GROUP BY source, n_s""".stripMargin,
    "q_quality_cut" ->
      """WITH t AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |q AS (SELECT lang, quantile_cont(n_tokens, 0.25) AS thr FROM t GROUP BY lang)
        |SELECT t.lang, t.doc_id, t.n_tokens, round(q.thr, 4) AS threshold, t.n_tokens >= q.thr AS keep
        |FROM t JOIN q USING (lang)""".stripMargin,
    "q_mix_plan" ->
      s"""WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY source)
         |SELECT source, n_docs, n_tokens, $weightCase AS weight,
         |       CAST(round(10000000.0 * ($weightCase)) AS BIGINT) AS target_tokens,
         |       round(10000000.0 * ($weightCase) / n_tokens, 4) AS epochs
         |FROM t""".stripMargin,
    "q_temperature_mix" ->
      """WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |z AS (SELECT sum(n_tokens) AS tot, sum(sqrt(n_tokens)) AS z FROM t)
        |SELECT source, n_docs, n_tokens,
        |       round(CAST(n_tokens AS DOUBLE) / z.tot, 6) AS natural_share,
        |       round(sqrt(n_tokens) / z.z, 6) AS tempered_share,
        |       CAST(round(10000000.0 * sqrt(n_tokens) / z.z) AS BIGINT) AS target_tokens,
        |       round(10000000.0 * sqrt(n_tokens) / z.z / n_tokens, 4) AS epochs
        |FROM t, z""".stripMargin,
    "q_padding_waste" ->
      """WITH t AS (SELECT CAST((len(string_split(text, ' ')) // 64) * 64 AS BIGINT) AS bucket,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens,
        |       CAST(max(tok) AS BIGINT) AS max_tokens,
        |       round(CAST(1.0 AS DOUBLE) - sum(tok) / (count(*) * max(tok)), 4) AS waste_frac
        |FROM t GROUP BY bucket""".stripMargin,
    "q_incr_agg" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY source""".stripMargin,
    "q_incr_join" ->
      """WITH j AS (SELECT o_orderpriority, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM j GROUP BY o_orderpriority""".stripMargin,
    "q_profile_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
        |       CAST(count(DISTINCT source) AS BIGINT) AS d_source,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS d_lang,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |       CAST(min(length(text)) AS BIGINT) AS min_chars,
        |       CAST(max(length(text)) AS BIGINT) AS max_chars
        |FROM documents""".stripMargin,
    "q_canonical_pick" ->
      """WITH t AS (SELECT doc_id, (doc_id // 5) * 5 AS component,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |r AS (SELECT component, doc_id, n_tokens,
        |        row_number() OVER (PARTITION BY component ORDER BY n_tokens DESC, doc_id) AS rn,
        |        CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_docs,
        |        CAST(sum(n_tokens) OVER (PARTITION BY component) AS BIGINT) AS total_score
        |      FROM t)
        |SELECT CAST(component AS BIGINT) AS component, doc_id AS canonical_id, n_docs, total_score
        |FROM r WHERE rn = 1""".stripMargin
  )
}
