package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-operations utilities around the harvest/curation lifecycle:
  * snapshot diffing (what changed between two harvest runs), column
  * histograms, and shuffle-key skew diagnostics — the checks an
  * operator of a 100 TB pipeline runs before trusting or re-planning
  * a load.
  */
object DataOps {

  /** Functional-dependency violation profiling (the Potter's Wheel /
    * Deequ-style schema screen): for each candidate FD det → dep,
    * how many determinant keys map to MORE than one dependent value,
    * and how bad the worst key is. One groupBy per candidate at
    * determinant grain (map-side combinable count-distinct via a
    * two-level aggregate); the per-FD summaries union to a
    * candidate-count-sized frame. Violation rate is integer
    * parts-per-million — engine-exact.
    */
  def fdProfile(df: DataFrame,
                candidates: Seq[(String, String, String)]): DataFrame = {
    val parts = candidates.map { case (det, dep, name) =>
      val perKey = df.groupBy(col(det).as("k"))
        .agg(countDistinct(col(dep)).as("nd"))
      perKey.agg(
        lit(name).as("fd"),
        count(lit(1)).as("n_keys"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("nd")).as("max_distinct"))
        .withColumn("violation_ppm", expr("(1000000 * n_violating) div n_keys"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Reliability diagram + Expected Calibration Error for a
    * probabilistic classifier (Naeini et al. 2015's ECE over an
    * equal-width confidence binning). The gate in front of
    * classifier-driven curation: a quality/language classifier whose
    * 0.9 bucket is right 60% of the time cannot be thresholded at
    * 0.9 — calibration is what licenses reading scores as
    * probabilities, and it is checked BEFORE the filter rollout, on
    * the (confidence, outcome) pairs of a labeled slice.
    *
    * Returns one row per non-empty bin: (bin, n, conf_avg, acc, gap)
    * plus the scalar `ece` = Σ_b (n_b/N)·|acc_b − conf_b| repeated on
    * each row. Scale shape: ONE count/sum aggregation over the corpus
    * with map-side combine; everything downstream (the window over
    * bins) runs on ≤ `bins` rows. Outputs round to 6 dp so both
    * engines agree to the digit; `conf` must be in [0, 1].
    *
    * Determinism caveat: unlike the exact-integer-sum discipline of
    * [[Sampling.neymanPlan]] / poissonBootstrapCi, `sum(c)` here is a
    * raw double accumulation over the corpus, so conf_avg/gap/ece
    * rest on 6-dp rounding rather than exact arithmetic — a sum
    * landing within ~1 ulp of a rounding boundary could in principle
    * differ across partition orders. For an exact variant,
    * pre-quantize conf to an integer grid (round(conf*1e6) as long)
    * upstream; the harness oracle (q_calibration) feeds
    * integer-ratio confidences, which keeps its sums exactly
    * representable.
    */
  def reliabilityDiagram(df: DataFrame, conf: Column, label: Column, bins: Int): DataFrame = {
    val per = df
      .select(least(floor(conf * bins), lit(bins - 1)).cast("int").as("bin"),
        conf.as("c"), label.cast("int").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"), sum(col("y")).as("sy"))
    val acc = col("sy").cast("double") / col("n")
    val cAvg = col("sc") / col("n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    per.select(col("bin"), col("n"),
        round(cAvg, 6).as("conf_avg"),
        round(acc, 6).as("acc"),
        round(abs(acc - cAvg), 6).as("gap"),
        round(sum(abs(acc - cAvg) * col("n")).over(w) / sum(col("n")).over(w), 6).as("ece"))
  }

  /** Murphy (1973) decomposition of the Brier score over the same
    * binning as [[reliabilityDiagram]]: BS ≈ REL − RES + UNC, with
    * REL = Σ_b n_b(p̄_b−ȳ_b)²/N (miscalibration — lower is better),
    * RES = Σ_b n_b(ȳ_b−ȳ)²/N (discrimination — HIGHER is better) and
    * UNC = ȳ(1−ȳ) the label entropy no forecaster can beat. The exact
    * (unbinned) Brier Σ(c−y)²/N is emitted alongside so the binning
    * residual is visible. One row out; bin-grain sums only (per-bin
    * n/Σc/Σy/Σc²/Σcy), so nothing row-grain crosses the final fold.
    */
  def brierDecomposition(df: DataFrame, conf: Column, label: Column, bins: Int): DataFrame = {
    val per = df
      .select(least(floor(conf * bins), lit(bins - 1)).cast("int").as("bin"),
        conf.as("c"), label.cast("int").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"), sum(col("y")).as("sy"),
        sum(col("c") * col("c")).as("scc"), sum(col("c") * col("y")).as("scy"))
    val g = per.agg(sum("n").as("nn"), sum("sy").as("syt"))
    val nD = col("nn").cast("double")
    val ybar = col("syt").cast("double") / nD
    per.crossJoin(broadcast(g))
      .agg(max("nn").as("n_rows_tmp"),
        sum((col("sc") - col("sy")) * (col("sc") - col("sy")) / col("n")).as("rel_num"),
        sum((col("sy") - col("n") * ybar) * (col("sy") - col("n") * ybar) / col("n"))
          .as("res_num"),
        sum(col("scc") - lit(2.0) * col("scy") + col("sy")).as("bs_num"),
        max(ybar).as("ybar"))
      .select(col("n_rows_tmp").as("n"),
        round(col("ybar"), 6).as("y_rate"),
        round(col("ybar") * (lit(1.0) - col("ybar")), 6).as("unc"),
        round(col("rel_num") / col("n_rows_tmp"), 6).as("rel"),
        round(col("res_num") / col("n_rows_tmp"), 6).as("res"),
        round(col("bs_num") / col("n_rows_tmp"), 6).as("brier"),
        round(col("rel_num") / col("n_rows_tmp") - col("res_num") / col("n_rows_tmp") +
          col("ybar") * (lit(1.0) - col("ybar")), 6).as("brier_binned"))
  }

  /** Per-group mean with a 95% Poisson-bootstrap confidence interval
    * (Chamandy et al. 2012, "Estimating uncertainty for massive data
    * streams") — error bars on corpus statistics in ONE pass over the
    * data, no resampling-with-replacement pass per replicate: each row
    * contributes to every replicate with an independent Poisson(1)
    * weight, which converges to the classic bootstrap and — unlike it
    * — needs no global row count or shuffle of the data itself.
    *
    * Engine-exact by construction: the Poisson weight comes from the
    * row's md5 bucket compared against PRE-RENDERED hex thresholds
    * (hex(floor(cdf·2³²)) — the [[Sampling.hexThreshold]] trick), so
    * the weight assignment involves no floating-point at all; replicate
    * sums are exact integers for integer-valued `value`; the only float
    * work is B means + one interpolated percentile over B values,
    * rounded 6 dp. Deterministic under retries/AQE like every hash-
    * keyed sampler here.
    *
    * Scale shape: the replicate explode costs B× scan compute but the
    * per-partition partial aggregation collapses it to (groups × B)
    * rows before the shuffle — nothing corpus-sized moves. Returns
    * (group, n_rows, mean, lo95, hi95).
    */
  def poissonBootstrapCi(df: DataFrame, groupCol: String, idCol: String,
                         value: Column, replicas: Int, seed: Long): DataFrame = {
    val bucket = substring(
      md5(concat(col(idCol).cast("string"), lit(":"), col("__b").cast("string"), lit(":" + seed))),
      1, 8)
    val w = DataOps.poissonCdf.zipWithIndex.foldRight(lit(DataOps.poissonCdf.length): Column) {
      case ((threshold, k), acc) => when(bucket < lit(threshold), k).otherwise(acc)
    }
    val reps = df
      .select(col(groupCol).as("g"), col(idCol), value.cast("long").as("v"))
      .withColumn("__b", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("__w", w.cast("long"))
      .groupBy("g", "__b")
      .agg(sum(col("__w") * col("v")).as("sx"), sum(col("__w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("g"), (col("sx").cast("double") / col("sw")).as("m"))
      .groupBy(col("g"))
      .agg(round(expr("percentile(m, 0.025)"), 6).as("lo95"),
        round(expr("percentile(m, 0.975)"), 6).as("hi95"))
    val point = df.select(col(groupCol).as("g"), value.cast("long").as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("v")).cast("double") / count(lit(1)), 6).as("mean"))
    point.join(reps, "g").select(col("g").as(groupCol),
      col("n_rows"), col("mean"), col("lo95"), col("hi95"))
  }

  /** Cumulative Poisson(1) CDF at k = 0..5, rendered as md5-bucket hex
    * thresholds — the single source of truth for the bootstrap weight
    * assignment, embedded verbatim in the DuckDB oracle so both
    * engines draw IDENTICAL weights (string compare, no floats).
    * P(k > 5) ≈ 6e-4 truncates to weight 6.
    */
  val poissonCdf: Seq[String] = {
    val e1 = math.exp(-1.0)
    val cdf = Seq(1.0, 2.0, 2.5, 8.0 / 3, 65.0 / 24, 163.0 / 60).map(_ * e1)
    cdf.map(Sampling.hexThreshold)
  }

  /** Row-level diff of two snapshots on a natural key: one row per key
    * with status added / removed / changed / unchanged ("changed"
    * compares the given payload columns null-safely). One full outer
    * join keyed on the natural key — both sides shuffle once; payload
    * comparison is a map-side expression.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      col(keyCol).as("key") +: lit(true).as("__o") +: compareCols.map(c => col(c).as(s"o_$c")): _*)
    val n = newSnap.select(
      col(keyCol).as("key") +: lit(true).as("__n") +: compareCols.map(c => col(c).as(s"n_$c")): _*)
    val anyChanged = compareCols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    o.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__o").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Population Stability Index between two corpus snapshots, per
    * group — the standard production drift gate (PSI < 0.1 stable,
    * 0.1-0.25 drifting, > 0.25 act): Σ_bins (p_new − p_old) ·
    * ln(p_new / p_old) over a fixed equal-width binning of `value`,
    * Laplace-smoothed (+0.5 per bin) so empty bins contribute finite
    * terms. A harvest pipeline runs this on every refresh to catch a
    * source silently changing shape (truncated documents, a new
    * boilerplate injector, a collapsed field) before the mix trains
    * on it.
    *
    * Scale shape: one (group, side, bin) count over the corpus, then
    * everything downstream is groups × bins × 2 rows; the bin grid is
    * enumerated with a sequence explode so zero-count bins smooth
    * instead of vanishing. Deterministic: fixed bounds (no min/max
    * pre-pass), and the PSI compares ROUNDED (4 dp) sums, which both
    * engines reproduce.
    */
  def psiDrift(df: DataFrame, groupCol: String, isNew: Column, value: Column,
               binWidth: Long, nBins: Int): DataFrame = {
    val bin = least(greatest(floor(value.cast("double") / binWidth).cast("long"), lit(0L)),
      lit(nBins - 1L))
    val sided = df.select(col(groupCol).as("g"), isNew.cast("boolean").as("nw"), bin.as("bin"))
    val counts = sided.groupBy("g", "nw", "bin").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("g", "nw").agg(sum(col("c")).as("t"))
    val grid = sided.select("g").distinct()
      .select(col("g"), explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"))
      .select(col("g"), col("bin"), explode(array(lit(false), lit(true))).as("nw"))
    val probs = grid.join(counts, Seq("g", "nw", "bin"), "left")
      .select(col("g"), col("nw"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
      .join(tot, Seq("g", "nw"))
      .select(col("g"), col("nw"), col("bin"),
        ((col("c") + 0.5) / (col("t") + 0.5 * nBins)).as("p"), col("t"))
    val o = probs.filter(!col("nw"))
      .select(col("g"), col("bin"), col("p").as("po"), col("t").as("told"))
    val nw = probs.filter(col("nw"))
      .select(col("g"), col("bin"), col("p").as("pn"), col("t").as("tnew"))
    o.join(nw, Seq("g", "bin"))
      .groupBy(col("g").as(groupCol))
      .agg(max(col("told")).as("n_old"), max(col("tnew")).as("n_new"),
        round(sum((col("pn") - col("po")) * log(col("pn") / col("po"))), 4).as("psi"))
  }

  /** Equi-width histogram of a numeric column with FIXED bounds (no
    * min/max pre-pass — deterministic and one aggregation): bucket i
    * covers [lo + i·step, lo + (i+1)·step); values outside clamp to
    * the edge buckets. Emits (bucket, n, lo/hi/avg of the bucket's
    * actual values).
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, step: Double, nBuckets: Int): DataFrame = {
    val raw = floor((col(valueCol) - lo) / step).cast("long")
    val b = least(greatest(raw, lit(0L)), lit(nBuckets - 1L))
    df.select(b.as("bucket"), col(valueCol).cast("double").as("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 4).as("v_min"),
        round(max(col("v")), 4).as("v_max"),
        round(avg(col("v")), 4).as("v_avg"))
  }

  /** SCD Type-2 merge: maintain a dimension's full change history as
    * validity intervals. `history` carries (key, payload...,
    * valid_from, valid_to) with valid_to NULL marking the open row;
    * `snapshot` is the new state of the world at time `t`. Changed
    * keys close their open row at t and open a new one; vanished keys
    * just close; new keys open; unchanged rows pass through — so
    * point-in-time queries (`valid_from <= x < valid_to`) keep
    * working across harvest runs. ONE full-outer join on the key (the
    * closed history is append-only and unions back untouched);
    * classification and the close/open row fan-out are map-side
    * (explode of a 2-element struct array).
    */
  def scd2Merge(history: DataFrame, snapshot: DataFrame, keyCol: String,
                compareCols: Seq[String], t: Long): DataFrame = {
    val open = history.filter(col("valid_to").isNull)
    val closed = history.filter(col("valid_to").isNotNull)
    // presence marker, NOT valid_from-is-null: an open row with a NULL
    // valid_from (unknown provenance) must still classify as present —
    // inferring presence from a payload column would silently drop it
    val o = open.select(
      col(keyCol).as("key") +: lit(true).as("__o") +: col("valid_from").as("o_from") +:
        compareCols.map(c => col(c).as(s"o_$c")): _*)
    val n = snapshot.select(
      col(keyCol).as("key") +: lit(true).as("__n") +:
        compareCols.map(c => col(c).as(s"n_$c")): _*)
    val changed = compareCols.map(c => !(col(s"o_$c") <=> col(s"n_$c"))).reduce(_ || _)
    val inOld = col("__o").isNotNull
    val inNew = col("__n").isNotNull
    def rowStruct(from: Column, to: Column, side: String) =
      struct(from.as("valid_from") +: to.as("valid_to") +:
        compareCols.map(c => col(s"${side}_$c").as(c)): _*)
    val merged = o.join(n, Seq("key"), "full_outer")
      .select(col("key"), explode(filter(array(
        // surviving/closing version of the OLD row
        when(inOld && inNew && !changed, rowStruct(col("o_from"), lit(null).cast("long"), "o"))
          .when(inOld && (!inNew || changed), rowStruct(col("o_from"), lit(t), "o")),
        // newly-opened version from the snapshot
        when(inNew && (!inOld || changed), rowStruct(lit(t), lit(null).cast("long"), "n"))
      ), x => x.isNotNull)).as("r"))
      .select(col("key") +: col("r.valid_from") +: col("r.valid_to") +:
        compareCols.map(c => col(s"r.$c").as(c)): _*)
    val closedNorm = closed.select(
      col(keyCol).as("key") +: col("valid_from") +: col("valid_to") +:
        compareCols.map(col): _*)
    closedNorm.unionByName(merged)
  }

  /** Equi-DEPTH histogram: bucket boundaries from exact interpolated
    * percentiles (one aggregation — the boundaries row is broadcast,
    * there is no global sort, which is what makes this shape survive
    * a 100 TB column where ntile() would pin a single partition),
    * then a map-side bucket assignment counting boundaries below each
    * value. Boundaries are rounded before comparison so interpolation
    * ulp-differences between engines cannot move a value across a
    * bucket edge.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    val fracs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val bounds = df.agg(
      expr(s"percentile($valueCol, array(${fracs.mkString(",")}))").as("__bs"))
      .select(transform(col("__bs"), b => round(b, 6)).as("__bs"))
    df.select(col(valueCol).cast("double").as("v"))
      .crossJoin(broadcast(bounds))
      .select(col("v"), size(filter(col("__bs"), b => b < round(col("v"), 6))).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 4).as("v_min"), round(max(col("v")), 4).as("v_max"))
  }

  /** Cross-source content-overlap matrix: for every pair of sources,
    * how many distinct content fingerprints they share, plus the
    * pairwise Jaccard — the corpus-governance report that tells you
    * two "independent" crawls are actually the same feed before you
    * double-weight them in a training mix. Shape: one distinct over
    * (source, fp), a fp-keyed self-join (fingerprint groups are
    * near-unique, so the join output is overlap-sized, never
    * corpus²), and a broadcast of the per-source totals — the matrix
    * itself is |sources|² rows.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String, fpCol: Column): DataFrame = {
    // distinct frame feeds both join sides and the totals: materialize
    // once (corpus-distinct-sized) instead of re-running the corpus
    // distinct per consumer
    val fps = df.select(col(sourceCol).as("source"), fpCol.as("fp")).distinct()
      .localCheckpoint(true)
    val sizes = fps.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("overlap"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("overlap"), col("n_a"), col("n_b"),
        round(col("overlap").cast("double") / (col("n_a") + col("n_b") - col("overlap")), 6)
          .as("jaccard"))
  }

  /** Robust outlier flags per group: |x − median| > k·MAD (median
    * absolute deviation) — the skew-immune alternative to mean/stddev
    * z-scores (one whale order inflates a stddev gate into passing
    * everything; the median/MAD gate doesn't move). Two exact
    * percentile aggregations (group-keyed shuffles of (group, value)
    * pairs) with the group-level stats broadcast back onto the rows.
    * MAD = 0 (>50% of the group identical) flags only exact
    * deviants, matching the convention that 0·k = 0 bounds.
    */
  def robustOutliers(df: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, k: Double): DataFrame = {
    val v = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(valueCol).cast("double").as("v"))
    val med = v.groupBy("grp").agg(expr("percentile(v, 0.5)").as("med"))
    val mad = v.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("v") - col("med")).as("ad"))
      .groupBy("grp").agg(expr("percentile(ad, 0.5)").as("mad"))
    v.join(broadcast(med), "grp").join(broadcast(mad), "grp")
      .select(col("grp"), col("id"), col("v"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        // both comparison operands rounded to 2dp: the interpolated
        // medians differ between engines at the 1-ulp level ((1-f)·lo
        // + f·hi vs lo + (hi-lo)·f), and an unrounded knife-edge
        // comparison would let that flip the boolean
        (round(abs(col("v") - col("med")), 2) > round(lit(k) * col("mad"), 2)).as("is_outlier"))
  }

  /** Per-group quantile normalization: percent_rank of each row's
    * value within its group (with the id as tiebreaker so ranks are a
    * total order and reproduce on any engine) — how quality scores
    * from differently-calibrated sources become comparable before a
    * global cut. One window over the group clustering.
    */
  def quantileNorm(df: DataFrame, groupCol: String, idCol: String,
                   valueCol: String): DataFrame = {
    df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(valueCol).cast("double").as("v"))
      .withColumn("q", round(percent_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(col("v"), col("id"))), 6))
      .select(col("grp"), col("id"), col("v"), col("q"))
  }

  /** Frequent co-occurrence pairs (market-basket / co-citation): for
    * items grouped into baskets, the top-k item pairs by joint
    * support. The self-join runs WITHIN basket (distinct (basket,
    * item) first, a < b orientation), so the blow-up unit is the
    * per-basket item count squared — bounded by basket size, never
    * corpus² — and the pair table aggregates with map-side combine
    * before the bounded top-k. Support = pair count / basket count
    * (broadcast single row).
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String, k: Int): DataFrame = {
    // same multi-consumer materialization as sourceOverlap's fps
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
      .localCheckpoint(true)
    // NO join hint, by measurement (round 10): the sf1 sensitivity
    // sweep flagged the planner's mid-scale auto-broadcast of the
    // corpus-scaled build side (5.0 s vs 2.7-2.9 s suppressed), but
    // both pin attempts REGRESSED the wide rung where the plan
    // actually matters — SHUFFLE_HASH 10.1+ s and MERGE 28-40 s vs
    // the unhinted 14-15 s at sf3 under identical interleaved weather
    // (the hint node breaks the self-join's exchange/sort reuse, so
    // the checkpointed table sorts TWICE). The planner's own
    // stats-based flip already picks the scale-correct sort-merge
    // join once the table outgrows the threshold; the sf1 broadcast
    // is a bounded mid-scale cost, not a 100 TB defect.
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("n"))
    val baskets = bi.select(col("b")).distinct().agg(count(lit(1)).as("n_baskets"))
    pairs.crossJoin(broadcast(baskets))
      .select(col("item_a"), col("item_b"), col("n"),
        round(col("n").cast("double") / col("n_baskets"), 6).as("support"))
      .orderBy(col("n").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** Shuffle-key skew diagnostic: the top-k heaviest keys of a column
    * with their row share — the number an engineer reads before
    * deciding on salting or AQE skew thresholds. One keyed count
    * (map-side combine), a broadcast single-row total, and a bounded
    * TakeOrderedAndProject for the top-k; never a full sort.
    */
  /** Mask-based format profiling (the Potter's-Wheel / Deequ pattern
    * screen): each value maps to a structural mask — digits→'9',
    * uppercase→'A', lowercase→'a', other characters kept — plus the
    * run-collapsed mask ('Aaaaaaaa#999999999' → 'Aa#9'), then one
    * count per mask with lexicographic min/max exemplars. The
    * data-profiling step that surfaces mixed formats, stray encodings
    * and schema drift in a string column BEFORE a parser hard-codes
    * one shape.
    *
    * Pure column algebra (three regexp passes) + one map-side-combined
    * aggregate; output is bounded by the mask domain (tiny), so at
    * 100 TB this is a scan-bound profile like the histogram family.
    */
  def formatProfile(df: DataFrame, column: String): DataFrame = {
    val mask = regexp_replace(regexp_replace(regexp_replace(
      col(column), "[0-9]", "9"), "[A-Z]", "A"), "[a-z]", "a")
    val collapsed = regexp_replace(regexp_replace(regexp_replace(
      col("mask"), "9+", "9"), "A+", "A"), "a+", "a")
    df.select(lit(column).as("column"), col(column), mask.as("mask"))
      .withColumn("mask_collapsed", collapsed)
      .groupBy("column", "mask", "mask_collapsed")
      .agg(count(lit(1)).as("n"),
        min(col(column)).as("example_min"),
        max(col(column)).as("example_max"))
  }

  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val total = df.select(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), round(col("cnt") / col("total"), 6).as("share"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
  }
}
