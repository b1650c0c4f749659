package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly planning operators — the steps between "curated
  * corpus" and "training run": per-domain quality thresholds, mixture
  * scheduling against a token budget, batch-padding economics, and
  * canonical-document election for near-dup clusters.
  *
  * All four are exact, shuffle-minimal aggregations: the per-stratum
  * statistics are tiny (one row per language / source / bucket /
  * cluster), so every plan is one hash aggregate plus, at most, one
  * broadcast join back to the corpus — nothing here re-shuffles
  * document payloads.
  */
object TrainingMix {

  /** Per-stratum exact-percentile floor: tag each row with its
    * stratum's p-th percentile of `scoreCol` and whether it clears it.
    * The reference pattern is per-domain quality cuts ("drop the
    * bottom quartile of each language"), where a single global
    * threshold would gut low-resource strata.
    *
    * Exact `percentile` (linear interpolation), not approx: the
    * per-stratum agg output is one row per stratum, so exactness costs
    * only the map-side digest; the join back is a broadcast.
    */
  def percentileCut(df: DataFrame, stratumCol: String, scoreCol: String, p: Double): DataFrame = {
    val thr = df.groupBy(stratumCol)
      .agg(percentile(col(scoreCol), lit(p)).as("__thr"))
    df.join(broadcast(thr), stratumCol)
      .withColumn("threshold", round(col("__thr"), 4))
      .withColumn("keep", col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Greedy per-source token-budget cut: each source keeps its
    * highest-quality documents until its token budget is spent —
    * the materialization step after [[mixPlan]] decides the budgets.
    *
    * BUCKET-ATOMIC at score-histogram grain: rows collapse to
    * (source, score) buckets with token/doc subtotals, the cumulative
    * token window runs over the per-source SCORE HISTOGRAM (bounded
    * by score cardinality, never rows — the spearman discipline), and
    * a bucket is kept iff strictly fewer than `budget` tokens precede
    * it (the boundary bucket is kept whole, so ties need no
    * ordering). Integers end-to-end; utilization is integer ppm.
    */
  def budgetCut(df: DataFrame, sourceCol: String, score: Column,
                tokens: Column, budgetPerSource: Long): DataFrame = {
    val h = df.groupBy(col(sourceCol), score.as("__s"))
      .agg(count(lit(1)).as("__docs"), sum(tokens).as("__toks"))
    val w = Window
      .partitionBy(sourceCol).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("__before", coalesce(sum(col("__toks")).over(w), lit(0L)))
      .filter(col("__before") < budgetPerSource)
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_buckets_kept"),
        sum(col("__docs")).as("docs_kept"),
        sum(col("__toks")).as("tokens_kept"),
        min(col("__s")).as("cutoff_score"))
      .withColumn("budget", lit(budgetPerSource))
      .withColumn("utilization_ppm",
        expr("(1000000 * tokens_kept) div budget"))
  }

  /** Curriculum interleave schedule: difficulty-quantile buckets
    * WITHIN each stratum, emitted in round-robin order across strata
    * (easy bucket of every stratum first, then the next tier) — the
    * "train easy→hard but keep every domain present in every phase"
    * ordering. Bucket assignment is the integer histogram rule
    * b = (cum_prev · nBuckets) div n over the per-stratum difficulty
    * histogram (cardinality-bounded, never a row-grain ntile); the
    * schedule position is bucket · n_strata + stratum_index with the
    * stratum index from a broadcast-sized dense rank. All integers.
    */
  def curriculumInterleave(df: DataFrame, stratumCol: String,
                           difficulty: Column, nBuckets: Int): DataFrame = {
    val h = df.groupBy(col(stratumCol).as("st"), difficulty.as("d"))
      .agg(count(lit(1)).as("c"), sum(difficulty).as("toks"))
    val w = Window
      .partitionBy("st").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = Window.partitionBy("st")
    val bucketed = h
      .withColumn("cum_prev", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("n", sum(col("c")).over(n))
      .withColumn("bucket", expr(s"(cum_prev * $nBuckets) div n"))
      .groupBy("st", "bucket")
      .agg(sum(col("c")).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("d")).as("min_difficulty"), max(col("d")).as("max_difficulty"))
    // stratum index without any window: one stratum-count-bounded
    // array, position from posexplode
    val idx = bucketed.select(col("st")).distinct()
      .agg(array_sort(collect_list(col("st"))).as("all"))
      .select(size(col("all")).cast("long").as("n_strata"),
        posexplode(col("all")).as(Seq("stratum_index", "st")))
    bucketed.join(broadcast(idx), Seq("st"))
      .select(col("st").as(stratumCol), col("bucket"), col("n_docs"),
        col("n_tokens"), col("min_difficulty"), col("max_difficulty"),
        col("stratum_index"),
        (col("bucket") * col("n_strata") + col("stratum_index"))
          .as("schedule_pos"))
  }

  /** Mixture scheduling: given target weights per source and a total
    * token budget, how many tokens each source owes and how many
    * epochs (repeats) of it that implies. epochs > 1 flags sources the
    * mix oversamples (upweighted domains); << 1 means heavy
    * downsampling. One aggregate over (source, n_tokens) — the corpus
    * contributes only its per-source token totals.
    */
  def mixPlan(df: DataFrame, sourceCol: String, tokensCol: Column,
              weights: Map[String, Double], defaultWeight: Double, budget: Long): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("n_tokens"))
      .withColumn("weight", w)
      .withColumn("target_tokens", round(lit(budget.toDouble) * col("weight")).cast("long"))
      .withColumn("epochs", round(lit(budget.toDouble) * col("weight") / col("n_tokens"), 4))
  }

  /** Temperature-based mixture reweighting (the multilingual-LM
    * sampling rule of Conneau & Lample 2019 §3.1, and the baseline
    * UniMax improves on): sampling share p_s ∝ n_s^alpha with
    * alpha ∈ (0,1] flattening the natural distribution so
    * head sources stop drowning tail sources. alpha is fixed at 0.5
    * (temperature 2, the common default) BECAUSE sqrt is IEEE-754
    * correctly rounded and therefore bit-identical across engines —
    * pow(x, alpha) for general alpha is not, and would make shares
    * oracle-fragile. Returns natural vs tempered share, target tokens
    * under `budget`, and implied epochs. One aggregate over per-source
    * totals; the normalizer rides along as a broadcast single-row
    * frame — no collect, corpus contributes only its totals.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, tokensCol: Column,
                     budget: Long): DataFrame = {
    val t = df.groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("n_tokens"))
    val z = t.agg(sum(col("n_tokens")).as("__tot"),
      sum(sqrt(col("n_tokens"))).as("__z"))
    val tempered = sqrt(col("n_tokens")) / col("__z")
    t.crossJoin(broadcast(z))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot"), 6).as("natural_share"),
        round(tempered, 6).as("tempered_share"),
        round(lit(budget.toDouble) * tempered).cast("long").as("target_tokens"),
        round(lit(budget.toDouble) * tempered / col("n_tokens"), 4).as("epochs"))
  }

  /** Length-bucketed batching economics: bucket documents by
    * floor(len / bucketSize), and report what padding every batch
    * drawn from that bucket wastes when padded to the bucket's longest
    * member. The decision input for choosing bucket granularity:
    * finer buckets cut waste but shrink batch-assembly pools.
    */
  def paddingWaste(df: DataFrame, tokensCol: Column, bucketSize: Int): DataFrame =
    df.select((floor(tokensCol / bucketSize) * bucketSize).cast("long").as("bucket"),
        tokensCol.cast("long").as("__t"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("sum_tokens"),
        max(col("__t")).as("max_tokens"))
      .withColumn("waste_frac",
        round(lit(1.0) - col("sum_tokens") / (col("n_docs") * col("max_tokens")), 4))

  /** Canonical-document election for duplicate clusters: given a
    * (id, component) mapping (from Graph.connectedComponents*) and a
    * per-document score, pick each cluster's best document — highest
    * score, ties to the smallest id.
    *
    * One aggregation keyed by component; the arg-max rides in a
    * min(struct(-score, id, ...)) so map-side partial aggregation
    * applies (a window would shuffle whole clusters to one task each
    * and gets no AQE skew handling — the giant boilerplate cluster is
    * exactly the skewed case).
    */
  /** Per-source unigram KL divergence from the corpus distribution,
    * KL(source ‖ corpus) = Σ_w p_s(w)·log2(p_s(w)/p_c(w)) — the
    * data-mix diagnostic that quantifies how DISTINCT each source's
    * vocabulary is (a near-zero source duplicates the corpus mixture
    * and adds little; a high-KL source shifts it). Every source word
    * is in the corpus by construction, so the ratio is never
    * division by zero.
    *
    * Shape: ONE corpus explode into (source, word) counts (map-side
    * combine); the corpus marginal aggregates that vocab×sources
    * table, not the corpus again; totals ride along broadcast. The
    * KL sum itself is a vocab-sized aggregation.
    */
  def sourceKlDivergence(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    // Eagerly materialized: four consumers (word marginal, source
    // totals, grand total, scoring join) read this table, and without
    // the checkpoint each one re-runs the corpus explode (the same
    // multi-consumer re-evaluation dHashNearDup documents as ~2x
    // wall). The table itself is vocab x sources-sized — cheap.
    val sw = docs
      .select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val wTot = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val sTot = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val n = sw.agg(sum(col("c_sw")).as("n"))
    sw.join(wTot, "w").join(sTot, "source").crossJoin(broadcast(n))
      .select(col("source"), col("n_s"),
        ((col("c_sw") / col("n_s")) *
          log2((col("c_sw") / col("n_s")) / (col("c_w") / col("n")))).as("term"))
      .groupBy("source")
      .agg(first(col("n_s")).as("n_tokens"), round(sum(col("term")), 4).as("kl_bits"))
  }

  /** Per-source Jensen-Shannon divergence from the corpus unigram
    * mixture (Lin 1991): JSD(Pₛ‖Q) = ½ΣPₛ·log2(Pₛ/M) + ½ΣQ·log2(Q/M)
    * with M = (Pₛ+Q)/2 — the SYMMETRIC, always-finite companion to
    * [[sourceKlDivergence]] (bounded in [0,1] bits, defined even when
    * a source misses vocabulary the corpus has; KL's log blows up at
    * structural zeros unless, as there, support is nested).
    *
    * Shape: the same ONE corpus explode into (source, word) counts;
    * the Q-side sum needs the FULL vocab per source, so the vocab
    * marginal cross-joins the (few) sources and left-joins the counts
    * — vocab×sources rows, corpus never re-read. Absent words
    * contribute only their Q-term (P=0 → P-term is 0 exactly).
    */
  def sourceJsDivergence(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val sw = docs
      .select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val wTot = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val sTot = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val n = sw.agg(sum(col("c_sw")).as("n"))
    val full = wTot.crossJoin(broadcast(sTot))
      .join(sw, Seq("source", "w"), "left")
      .crossJoin(broadcast(n))
      .withColumn("c0", coalesce(col("c_sw"), lit(0L)))
    val p = col("c0").cast("double") / col("n_s").cast("double")
    val q = col("c_w").cast("double") / col("n").cast("double")
    val m = (p + q) / 2
    val termP = when(col("c0") > 0, p * log2(p / m)).otherwise(lit(0.0))
    val termQ = q * log2(q / m)
    full
      .select(col("source"), col("n_s"), ((termP + termQ) / 2).as("term"))
      .groupBy("source")
      .agg(first(col("n_s")).as("n_tokens"), round(sum(col("term")), 4).as("jsd_bits"))
  }

  /** Per-source Hellinger distance and Bhattacharyya coefficient
    * (Bhattacharyya 1943; Hellinger 1909) from the corpus unigram
    * mixture: BC = Σ_w √(Pₛ(w)·Q(w)), H = √(1−BC) — the bounded
    * [0,1] METRIC companion to the KL/JSD pair (H is a true distance;
    * KL is not symmetric, JSD's √ is). Absent words contribute 0 to BC
    * exactly (P=0), so only the source's own support joins — one
    * corpus explode, vocab×sources-bounded downstream, same shape as
    * [[sourceKlDivergence]]. BC ≤ 1 by Cauchy-Schwarz but float
    * summation can land an ulp above, so 1−BC clamps at 0 before the
    * root.
    */
  def sourceHellinger(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val sw = docs
      .select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val wTot = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val sTot = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val n = sw.agg(sum(col("c_sw")).as("n"))
    sw.join(wTot, "w").join(sTot, "source").crossJoin(broadcast(n))
      .select(col("source"), col("n_s"),
        sqrt((col("c_sw") / col("n_s")) * (col("c_w") / col("n"))).as("term"))
      .groupBy("source")
      .agg(first(col("n_s")).as("n_tokens"), sum(col("term")).as("bc"))
      .select(col("source"), col("n_tokens"),
        round(col("bc"), 4).as("bhattacharyya_coef"),
        round(sqrt(greatest(lit(1.0) - col("bc"), lit(0.0))), 4).as("hellinger"))
  }

  /** Dunning log-likelihood keyness (Dunning 1993): for every term a
    * source uses, the G² statistic of its 2×2 contingency table
    * against the REST of the corpus — the corpus-linguistics standard
    * for "which words characterize this source" (χ² misbehaves on the
    * rare-word tail; G² does not). G² = 2·[a·ln(a/E₁) + b·ln(b/E₂)]
    * with a = in-source count, b = rest count, expectations from the
    * corpus marginal; `over` flags over- vs under-use by the EXACT
    * integer cross product a·n vs c_w·n_s (no float tie).
    *
    * Scale: one corpus explode into (source, term) counts; the G²
    * scoring row set is vocab×sources-bounded, and the corpus-
    * frequency floor max(50, n/10000) is SELF-SCALING (the
    * q_tfidf_pairs df-cap lesson) — output stays head-of-vocabulary
    * sized at any corpus size.
    */
  def dunningKeyness(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val sw = docs
      .select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val wTot = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val sTot = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val n = sw.agg(sum(col("c_sw")).as("n"))
    val scored = sw.join(wTot, "w").join(sTot, "source").crossJoin(broadcast(n))
      .filter(col("c_w") >= greatest(lit(50L), expr("n div 10000")))
    val a = col("c_sw").cast("double")
    val b = (col("c_w") - col("c_sw")).cast("double")
    val e1 = col("c_w").cast("double") * col("n_s").cast("double") / col("n").cast("double")
    val e2 = col("c_w").cast("double") *
      (col("n") - col("n_s")).cast("double") / col("n").cast("double")
    val g2 = lit(2.0) * (a * log(a / e1) +
      when(col("c_w") > col("c_sw"), b * log(b / e2)).otherwise(lit(0.0)))
    scored.select(col("source"), col("w").as("term"),
      col("c_sw").as("c_in_source"), col("c_w").as("c_corpus"),
      round(g2, 4).as("g2"),
      (col("c_sw").cast("decimal(19,0)") * col("n").cast("decimal(19,0)") >
        col("c_w").cast("decimal(19,0)") * col("n_s").cast("decimal(19,0)")).as("over"))
  }

  /** Burrows' Delta stylometric distance between sources (Burrows
    * 2002; Argamon 2008's z-score reading): over the corpus top-K
    * terms, z-score each source's relative frequency against the
    * across-source mean/sd, Delta(a,b) = mean |z_a − z_b| — the
    * authorship-attribution standard repurposed as a "which sources
    * write alike" corpus diagnostic. Top-K by the bounded-heap TopK
    * operator (never a vocab sort); the z/Delta lattice is
    * K×sources-bounded; terms a source never uses enter at f = 0
    * exactly (that absence IS stylometric signal).
    */
  def burrowsDelta(docs: DataFrame, sourceCol: String, textCol: String,
                   topK: Int): DataFrame = {
    val sw = docs
      .select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val wTot = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
      .withColumn("__g", lit(1))
    val top = TopK.perKey(wTot, Seq("__g"),
      struct((-col("c_w")).as("nc"), col("w").as("wt")), topK).select("w")
    val sTot = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val grid = broadcast(top).crossJoin(broadcast(sTot))
      .join(sw, Seq("source", "w"), "left")
      .select(col("w"), col("source"),
        (coalesce(col("c_sw"), lit(0L)).cast("double") /
          col("n_s").cast("double")).as("f"))
    val stats = grid.groupBy("w").agg(
      count(lit(1)).as("ns"), sum("f").as("sf"), sum(col("f") * col("f")).as("sff"))
    val mu = col("sf") / col("ns").cast("double")
    val sigma = sqrt((col("sff") - col("sf") * col("sf") / col("ns").cast("double")) /
      (col("ns") - 1).cast("double"))
    val zs = grid.join(broadcast(stats), "w")
      .select(col("w"), col("source"),
        when(sigma > 0, (col("f") - mu) / sigma).otherwise(lit(0.0)).as("z"))
    zs.as("a").join(zs.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(abs(col("a.z") - col("b.z"))) / count(lit(1)).cast("double"), 6)
          .as("delta"))
  }

  def electCanonical(components: DataFrame, docs: DataFrame,
                     idCol: String, scoreCol: Column): DataFrame = {
    // The score keeps its NATIVE numeric type: casting to long here
    // would truncate fractional quality scores, collapsing the arg-max
    // to ties broken by min-id regardless of score.
    val scored = docs.select(col(idCol).as("id"), scoreCol.as("__score"))
    components.join(scored, "id")
      .groupBy("component")
      .agg(
        min(struct((-col("__score")).as("neg"), col("id"))).as("__best"),
        count(lit(1)).as("n_docs"),
        sum(col("__score")).as("total_score"))
      .select(col("component"), col("__best.id").as("canonical_id"),
        col("n_docs"), col("total_score"))
  }

  /** UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    * distribute a token budget as uniformly as possible across
    * languages, capping each language at `epochsCap` passes over its
    * data. This is water-filling: languages smaller than the waterline
    * W are taken in full (capacity = n_tokens·epochsCap); the rest get
    * exactly W.
    *
    * The waterline pivot is found with INTEGER comparisons only —
    * sorted ascending by capacity, m = max{i : c_i·(n−i) ≤ B−cum_i} —
    * so the partition of languages into full/capped is engine-exact;
    * W itself is one closed-form division. Language count is tiny, so
    * the ordered scan is a broadcast-scale window, and the corpus is
    * touched once for the capacity aggregate.
    */
  def unimaxPlan(df: DataFrame, langCol: String, tokensCol: Column,
                 budget: Long, epochsCap: Int): DataFrame = {

    val caps = df.groupBy(col(langCol))
      .agg(sum(tokensCol).as("n_tokens"))
      .select(col(langCol), col("n_tokens"),
        (col("n_tokens") * epochsCap).as("capacity"))
    val w = Window.orderBy(col("capacity"), col(langCol))
    val all = Window.partitionBy()
    val scanned = caps
      .withColumn("i", row_number().over(w))
      .withColumn("cum", sum(col("capacity")).over(w))
      .withColumn("n", count(lit(1)).over(all))
    val pivots = scanned
      .withColumn("m", max(when(
        col("capacity") * (col("n") - col("i")) <= lit(budget) - col("cum"),
        col("i"))).over(all))
      .withColumn("cumM", max(when(col("i") === col("m"), col("cum"))).over(all))
    pivots.select(
      col(langCol), col("n_tokens"), col("capacity"),
      round(
        when(coalesce(col("m"), lit(0L)) === col("n"), col("capacity").cast("double"))
          .otherwise(least(
            col("capacity").cast("double"),
            (lit(budget) - coalesce(col("cumM"), lit(0L))).cast("double") /
              (col("n") - coalesce(col("m"), lit(0L))).cast("double"))), 2)
        .as("alloc_tokens"))
      .withColumn("epochs", round(col("alloc_tokens") / col("n_tokens"), 4))
  }
}
