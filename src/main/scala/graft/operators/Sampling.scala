package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data sampling and mixing — the dataset-assembly side of an
  * LLM pipeline: per-stratum rates and weighted source mixtures.
  *
  * Deterministic by construction: selection hashes the row's id with a
  * seed instead of consuming an RNG stream, so results are stable
  * across retries/partitionings (an RNG-based sample changes under AQE
  * re-planning; a hash-based one never does).
  */
object Sampling {

  /** Selection hash: first 8 hex chars of md5(id ":" seed) — a uniform
    * 32-bit bucket as a hex string. md5-prefix (not xxhash64) so the
    * EXACT same selection is computable by any engine with md5 — the
    * sample itself is oracle-checkable, not just its row count.
    */
  private def md5Bucket(id: org.apache.spark.sql.Column, seed: Long) =
    substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 8)

  /** `rate` as the hex threshold those buckets are compared against:
    * P(bucket < threshold) = rate over the 2^32 bucket space.
    */
  def hexThreshold(rate: Double): String = {
    val t = math.min(math.max((rate * 4294967296.0).toLong, 0L), 4294967295L)
    f"$t%08x"
  }

  /** Keep each row of stratum s with probability rates(s): hash-bucket
    * the id and compare against the stratum's threshold. Unknown strata
    * default to 0 (threshold "00000000" admits nothing). A rate >= 1.0
    * keeps the stratum unconditionally — the strict `<` against
    * "ffffffff" would otherwise drop the ~1-in-2^32 ids whose bucket is
    * exactly the max, which "keep all" must not.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String, rates: Map[String, Double], seed: Long): DataFrame = {
    val keep = rates.foldLeft(lit(false)) { case (acc, (s, r)) =>
      val cond =
        if (r >= 1.0) lit(true)
        else md5Bucket(col(idCol), seed) < lit(hexThreshold(r))
      when(col(stratumCol) === s, cond).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Weighted mixture of sources: per-source hash-rate downsampling
    * then union, tagging each row's origin. Rate >= 1.0 skips the hash
    * filter entirely (see stratified).
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], idCol: String, seed: Long): DataFrame =
    sources.map { case (name, df, rate) =>
      val kept =
        if (rate >= 1.0) df
        else df.filter(md5Bucket(col(idCol), seed) < lit(hexThreshold(rate)))
      kept.withColumn("source_name", lit(name))
    }.reduce(_ unionByName _)

  /** Deterministic train/val/test assignment: the id's md5 bucket
    * against cumulative fraction thresholds. A pure function of the id
    * — re-running on a grown corpus never moves an old row between
    * splits (the property RNG-based splitters lose), and any engine
    * with md5 reproduces the assignment exactly.
    * `fractions` are (name, fraction) in order; the last split takes
    * the remainder.
    */
  def assignSplit(df: DataFrame, idCol: String, fractions: Seq[(String, Double)], seed: Long): DataFrame = {
    val bucket = md5Bucket(col(idCol), seed)
    val expr = cumulativeThresholds(fractions).foldRight(lit(fractions.last._1): org.apache.spark.sql.Column) {
      case ((name, threshold), acc) => when(bucket < lit(threshold), name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** (name, hex threshold) per non-final split, from the RUNNING SUM of
    * the fractions. The single source of truth for split boundaries:
    * oracle SQL must embed these exact values rather than hex of a
    * hand-computed literal sum — float accumulation can land 1 ulp away
    * from the literal (0.8 + 0.1 vs 0.9), which is a different 2^-32
    * bucket and would flip any id landing in it.
    */
  def cumulativeThresholds(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    val cums = fractions.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    fractions.init.map(_._1).zip(cums.map(hexThreshold))
  }

  /** Neyman-allocation plan for a total sample `budget` over strata
    * (Neyman 1934): alloc_h ∝ N_h·σ_h — spend the budget where the
    * strata are big AND internally variable, the minimum-variance
    * allocation for estimating a population mean under stratified
    * sampling. The survey-sampling upgrade over proportional rates:
    * a huge-but-homogeneous stratum (boilerplate crawl) needs few
    * rows; a small-but-wild one (forum scrape) needs many.
    *
    * `value` must be INTEGER-VALUED: σ_h is computed from sum(v),
    * sum(v²), n — exact integer sums in double (magnitudes ≤ 2^53),
    * so the variance is a deterministic function of the data, immune
    * to the engine's aggregation order (a Welford-style stddev_samp
    * is NOT — its float path depends on row order). Association-
    * sensitive float work happens only in the strata-sized tail,
    * where shares round to 6 dp before the allocation rounds to a
    * whole row.
    *
    * Returns (stratum, n_rows, sigma, alloc): one corpus-wide
    * count/sum agg with map-side combine, then everything is
    * strata-sized. Singleton strata get σ = 0 (no estimable
    * variance → pure Neyman allocates nothing).
    */
  def neymanPlan(df: DataFrame, stratumCol: String, value: org.apache.spark.sql.Column,
                 budget: Long): DataFrame = {
    val stats = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(value.cast("double")).as("s1"),
        sum((value * value).cast("double")).as("s2"))
    val sigma = when(col("n_rows") > 1,
      sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n_rows")) / (col("n_rows") - 1),
        lit(0.0)))).otherwise(lit(0.0))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    // Degenerate corpus (every stratum zero-variance or singleton):
    // the share denominator is 0 and 0.0/0.0 = NaN, whose long cast
    // diverges between engines — guard to an all-zero allocation.
    val denom = sum(col("n_rows") * col("sigma")).over(w)
    stats
      .withColumn("sigma", round(sigma, 6))
      .withColumn("share",
        when(denom === 0, lit(0.0))
          .otherwise(round(col("n_rows") * col("sigma") / denom, 6)))
      .select(col("stratum"), col("n_rows"), col("sigma"),
        round(col("share") * budget, 0).cast("long").as("alloc"))
  }

  /** The rows the Neyman plan selects: each stratum hash-sampled at
    * rate alloc_h / N_h with the same engine-portable md5 bucketing as
    * [[stratified]], the per-stratum threshold computed IN-PLAN from
    * the broadcast-joined allocation (hex of floor(rate·2³²), the
    * Column twin of [[hexThreshold]]). Deterministic end-to-end: the
    * sample is a pure function of (data, budget, seed).
    */
  def neymanSample(df: DataFrame, stratumCol: String, idCol: String,
                   value: org.apache.spark.sql.Column, budget: Long, seed: Long): DataFrame = {
    val plan = neymanPlan(df, stratumCol, value, budget)
      .select(col("stratum").as(stratumCol), col("n_rows"), col("alloc"))
    val rate = least(col("alloc").cast("double") / col("n_rows"), lit(1.0))
    val threshold = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))), 8, "0")
    df.join(broadcast(plan), stratumCol)
      .filter(col("alloc") >= col("n_rows") ||
        md5Bucket(col(idCol), seed) < threshold)
      .drop("n_rows", "alloc")
  }

  /** EXACTLY k rows per stratum (rate-based sampling only hits k in
    * expectation): order each stratum by an md5 hash of the id (an
    * engine-portable deterministic "random" order) and keep the first
    * k via the bounded-heap TopKPerKey operator — a distributed
    * reservoir sample without reservoir state. Ties impossible
    * (md5 of distinct ids), so the sample is a pure function of the
    * id set.
    */
  def exactKPerStratum(df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame =
    TopK.perKey(
      df.withColumn("__h", md5(col(idCol).cast("string"))),
      Seq(stratumCol),
      struct(col("__h"), col(idCol)), k
    ).drop("__h")

  /** Class-balanced downsampling: every stratum keeps exactly the
    * MINORITY class's count, selected by the [[exactKPerStratum]]
    * md5-order reservoir — the classic class-rebalancing step before
    * training a classifier on skewed labels, deterministic and
    * engine-portable. The minority count is one class-count-bounded
    * aggregate collapsed to a driver scalar (the PageRank dangling-
    * mass pattern), so the bounded-heap TopKPerKey still gets its
    * plan-time k.
    */
  def classBalance(df: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val kMin = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .agg(min("n")).head.getLong(0).toInt
    exactKPerStratum(df, stratumCol, idCol, kMin)
  }

  /** Probability-proportional-to-size Poisson sampling (Hájek 1964;
    * the Horvitz–Thompson design): row i with positive integer weight
    * wᵢ is kept with inclusion probability πᵢ = min(1, k·wᵢ/W), so the
    * sample size is k in expectation and every certainty row
    * (k·wᵢ ≥ W) always survives — the survey-sampling complement of
    * the equal-probability samplers above, used to keep the heavy rows
    * a uniform sample would miss (HT estimate of any total: Σ yᵢ/πᵢ).
    *
    * Engine-portable and exact: the row's 24-bit md5 bucket u is kept
    * iff u < k·wᵢ·2²⁴ ÷ W — computed entirely in long arithmetic
    * (`div`, no doubles) and compared as zero-padded hex strings, the
    * [[hexThreshold]] discipline. W comes from one map-side-combined
    * aggregate broadcast back; the filter is then pure column algebra.
    * πᵢ is reported in exact parts-per-million (integer div) so the
    * output is float-free. The clamp divides BEFORE applying `least`
    * (floor is monotonic, so least(a,b) div W == least(a div W,
    * b div W) and W·1e6 div W == 1e6 exactly): the only product that
    * must fit in a long is k·wᵢ·1e6 — per-ROW bounded — never the
    * corpus-sized W·1e6, which overflows once ΣW crosses 9.2e12
    * (observed at the sf3 ladder rung on cents-weighted orders).
    */
  def ppsSample(df: DataFrame, idCol: String, weight: org.apache.spark.sql.Column,
                k: Long, seed: Long): DataFrame = {
    val w = weight.cast("long")
    val tot = df.agg(sum(w).as("__W"))
    val u6 = substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 6)
    // threshold = min(k·w·2^24 div W, 2^24) rendered as 7-char hex;
    // u gets a leading '0' so certainty rows ('1000000') always win
    val rawThresh = expr(s"($k * __w_l * 16777216) div __W")
    val thresh = lpad(lower(hex(least(rawThresh, lit(16777216L)))), 7, "0")
    df.withColumn("__w_l", w)
      .crossJoin(broadcast(tot))
      .filter(concat(lit("0"), u6) < thresh)
      .withColumn("pi_ppm", expr(s"least(($k * __w_l * 1000000) div __W, 1000000)"))
      .drop("__w_l", "__W")
  }

  /** Priority sampling (Duffield, Lund & Thorup 2007): EXACT-k
    * weighted sampling whose per-item weight estimates ŵ = max(w, τ)
    * give UNBIASED subset sums — the one-pass replacement for
    * "sample by weight then guess the inflation". Priority qᵢ =
    * wᵢ/uᵢ with uᵢ the item's md5 uniform (deterministic/AQE-stable
    * like every hash sampler here); keep the k largest priorities, τ
    * = the (k+1)-th. Selection runs through the bounded-heap TopK
    * operator — the corpus is never sorted; the only ordered pass is
    * the (k+1)-row head table.
    */
  def prioritySample(df: DataFrame, idCol: String,
                     weight: org.apache.spark.sql.Column, k: Int,
                     seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = conv(substring(md5(concat(col("id").cast("string"), lit(":" + seed))),
      1, 8), 16, 10).cast("long") + 1L
    val scored = df.select(col(idCol).as("id"), weight.cast("long").as("w"))
      .withColumn("pr",
        col("w").cast("double") * lit(4294967296.0) / u.cast("double"))
      // TopKPerKey requires a clustering key; the global head uses a
      // constant one (one final heap, partial heaps map-side).
      .withColumn("__g", lit(1))
    val head = TopK.perKey(scored, Seq("__g"),
      struct((-col("pr")).as("np"), col("id").as("tid")), k + 1).drop("__g")
    val wOrd = Window.orderBy(col("pr").desc, col("id"))
    val ranked = head.withColumn("rn", row_number().over(wOrd))
    val tau = ranked.filter(col("rn") === k + 1)
      .agg(max("pr").as("tau"))
    ranked.filter(col("rn") <= k)
      .crossJoin(broadcast(tau))
      // tau NULL (corpus ≤ k: everything kept, estimate = own weight)
      // is coalesced explicitly — engines disagree on NULL in greatest
      .select(col("id"), col("w"),
        round(greatest(col("w").cast("double"), coalesce(col("tau"), lit(0.0))), 4)
          .as("w_hat"))
  }
}
