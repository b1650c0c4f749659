package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2 #36-37).
  *
  * Brute force is the exact baseline: probes × corpus with the probe side
  * broadcast — the corpus is never collected and never shuffled; each
  * executor scores its corpus partition against the broadcast probes, and
  * only (probe, id, sim) triples reach the top-k shuffle. The LSH variant
  * is the scale path: random-hyperplane sign buckets cut candidates by
  * ~2^planes before exact rerank.
  */
object VectorOps {

  /** Dot product of two float/double array columns (double math, left
    * fold — deterministic order). Native codegen expression; `dotHof`
    * is the bit-identical composed form kept for reference/tests.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VecDot(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Per-stratum centroid + cosine-to-centroid outlier scoring — the
    * embedding-space quality gate: a document whose vector sits far
    * from its own stratum's centroid is likely mislabeled or junk
    * (wrong-language page, binary noise with a text label).
    *
    * Scale shape: centroids come from a (stratum, dim) explode →
    * avg — the aggregate output is strata × dims rows (tiny), and
    * the reassembled centroid table broadcasts back, so the corpus
    * vectors are read twice but never shuffled. The similarity is
    * rounded to 4 and the flag compares the ROUNDED value, so the
    * outlier set is reproducible across engines and fold orders.
    */
  def centroidOutliers(corpus: DataFrame, stratumCol: String, idCol: String,
                       vecCol: String, simThreshold: Double): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val cent = corpus
      .select(col(stratumCol).as("__s"), posexplode(v).as(Seq("pos", "val")))
      .groupBy("__s", "pos").agg(avg(col("val")).as("m"))
      .groupBy("__s")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("centroid"))
    corpus.select(col(idCol), col(stratumCol), v.as("__v"))
      .join(broadcast(cent), col(stratumCol) === col("__s"))
      .withColumn("sim", round(cosine(col("__v"), col("centroid")), 4))
      .select(col(idCol), col(stratumCol), col("sim"),
        (col("sim") < simThreshold).as("is_outlier"))
  }

  /** Embedding-space drift between two snapshots per group: the
    * centroid of split A vs split B, compared by cosine and L2 — the
    * semantic companion of the value-space PSI/KS/EMD drift gates: a
    * source whose MEANING moved shows up here before any scalar
    * profile shifts. Same aggregate shape as [[centroidOutliers]]
    * (groups × dims rows, corpus never shuffles vectors) and the same
    * determinism posture: 4-dp rounding on the emitted comparisons
    * absorbs double-sum order.
    */
  def centroidDrift(corpus: DataFrame, groupCol: String, vecCol: String,
                    isA: Column): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val cent = corpus
      .select(col(groupCol).as("g"), isA.as("a"), posexplode(v).as(Seq("pos", "val")))
      .groupBy("g", "a", "pos").agg(avg(col("val")).as("m"))
      .groupBy("g", "a")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
    val counts = corpus.groupBy(col(groupCol).as("g")).agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA, 0L).otherwise(1L)).as("n_b"))
    val ca = cent.filter(col("a")).select(col("g"), col("c").as("u"))
    val cb = cent.filter(!col("a")).select(col("g"), col("c").as("w"))
    ca.join(cb, "g").join(broadcast(counts), "g")
      .select(col("g").as(groupCol), col("n_a"), col("n_b"),
        round(cosine(col("u"), col("w")), 4).as("centroid_cosine"),
        round(sqrt(aggregate(zip_with(col("u"), col("w"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t)), 4).as("centroid_l2"))
  }

  /** Exact top-k cosine neighbors for each probe row.
    * probes/corpus: (id, vec). Self-pairs excluded.
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms once per side, not per pair: the naive cosine-per-pair does
    // 3x the flops recomputing |a| and |b| for every combination.
    val p = probes.select(col("id").as("probe_id"), col("vec").as("pv"), l2norm(col("vec")).as("pn"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("nv"), l2norm(col("vec")).as("nn"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), (dot(col("pv"), col("nv")) / (col("pn") * col("nn"))).as("sim"))
    TopK.perKey(scored, Seq("probe_id"), struct(-col("sim"), col("neighbor_id")), k)
  }

  /** Deterministic ±1 random hyperplanes (no RNG at plan time).
    * Plane j's entries depend only on (j, d), so `hyperplanes(p, d)`
    * is a PREFIX of `hyperplanes(q, d)` for p < q — which is what
    * lets a count-scaled planes choice stay oracle-exact: the oracle
    * inlines the maximum plane set once and masks to the low
    * `planesFor(n)` bits (see [[bucketSqlDuckScaled]]).
    */
  def hyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(planes, dim) { (j, d) =>
      val x = (j * 1315423911L + d * 2654435761L) ^ (j * 97531L + d)
      if (((x >>> 13) & 1L) == 0L) 1.0 else -1.0
    }

  /** How many sign planes a corpus of `n` vectors needs: the smallest
    * planes count whose 2^planes buckets hold expected occupancy at or
    * under `targetOccupancy`, clamped to [minPlanes, maxPlanes].
    *
    * This is THE scale knob of the sign-bucket family: a fixed planes
    * count makes the in-bucket candidate set — hence
    * [[nearDupPairs]]'s self-join work — grow ~n²/2^planes, which is
    * exactly the term a 100× scale-up would die on. Scaling planes
    * with log2(n) holds expected occupancy (so candidate pairs stay
    * ~n·occupancy/2, linear in n) at the price of single-band sign-LSH
    * recall on NON-identical-direction near-dups (P[collide] =
    * (1−θ/π)^planes; exact-direction duplicates collide at any
    * planes). Callers who need recall at high planes add banding or
    * multi-probe on top — see [[lshTopK]].
    *
    * Integer-exact on purpose (no floating log2): a double log2 can
    * land a hair above an integer and push ceil() one plane too far
    * on one engine but not the other. The test here is the
    * overflow-free form `(n - 1) >> p < targetOccupancy`, which for
    * n ≥ 1 is algebraically identical to `targetOccupancy·2^p ≥ n`
    * (both say ceil(n/2^p) ≤ targetOccupancy) but cannot wrap Long
    * the way the shift-left form could at permitted non-default
    * bounds (targetOccupancy=16 at p≥60 shifted to 0/negative,
    * silently forcing maxPlanes — round-12 advice). The DuckDB
    * oracle keeps the shift-left spelling (its BIGINT math never
    * sees p near 60 because count(*)-derived p ≤ 16) — see the
    * q_dedup_embedding_scaled oracle's `pl` CTE; SemanticSelectSpec
    * pins the two forms equal across the whole clamp range.
    */
  def planesFor(n: Long, minPlanes: Int = 8, maxPlanes: Int = 16,
                targetOccupancy: Long = 16L): Int = {
    require(minPlanes >= 1 && maxPlanes >= minPlanes && maxPlanes <= 62 &&
      targetOccupancy >= 1, "planesFor: invalid bounds")
    (minPlanes to maxPlanes).find(p => ((n - 1) >> p) < targetOccupancy).getOrElse(maxPlanes)
  }

  /** Sign-bit bucket id for a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vec, typedlit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed self-join +
    * exact cosine threshold. Positive scaling preserves sign buckets,
    * so scaled/renormalized duplicates always collide. Shuffles
    * (bucket, id, vec) once; pairs form within buckets only.
    *
    * Two scale controls on the in-bucket candidate set (the term a
    * fixed-planes config grows ~n²/2^planes):
    *
    *   - planes should come from [[planesFor]] so EXPECTED occupancy
    *     stays constant as the corpus grows;
    *   - within a bucket, candidates are additionally pruned by a
    *     projection-slab grid: for unit vectors, cos(a,b) ≥ τ implies
    *     |u·â − u·b̂| ≤ |u|·sqrt(2−2τ) for ANY direction u (the chord
    *     bound), so members are sliced into slabs of exactly that
    *     width along two deterministic directions and a pair is only
    *     scored when it sits within one slab cell in BOTH (a 3×3
    *     stencil join, same shape as Layout.gridRadiusJoin). This is
    *     what bounds the DENSE-DIRECTIONAL-CLUSTER case that more
    *     planes cannot split (a cluster with angular spread ~0.3 rad
    *     loses only ~10% of its internal pairs per extra plane, but
    *     slices into spread/sqrt(2−2τ) slabs per direction here).
    *
    * Both controls are pure candidate pruning with an explicit margin
    * on the bound, so the RESULT SET — all same-bucket pairs with
    * cosine ≥ τ — is unchanged (spec-pinned against the unpruned
    * join), and the DuckDB oracles stay the plain bucket join.
    *
    * Domain: NONZERO vectors, enforced by the `nrm > 0` filter below.
    * Cosine is undefined for the zero vector (0/0 = NaN), and the two
    * engines' NaN-is-largest semantics would "pass" a NaN sim through
    * the ≥ τ gate in a plain bucket join while the slab cells here
    * would drop it (floor(NaN) is null) — i.e. without the filter,
    * "pure pruning" would hold only on corpora that happen to contain
    * no zero vector (round-12 verdict, wrong #3). Excluding zero
    * vectors on BOTH the pruned path and the oracle makes the
    * equivalence a theorem over the defined domain; SemanticSelectSpec
    * pins it with a planted zero vector.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double, planes: Int, dim: Int): DataFrame = {
    val hp = hyperplanes(planes + 2, dim)
    val (u1, u2) = (hp(planes), hp(planes + 1))
    // Slab width: |u| = sqrt(dim) for ±1 planes; the 1e-9 relative
    // margin absorbs double-arithmetic noise (~1e-11 absolute here)
    // so a boundary pair can never straddle two non-adjacent cells.
    val w = math.sqrt(dim) * math.sqrt(2.0 - 2.0 * threshold) * (1.0 + 1e-9)
    // The nrm > 0 domain filter sits BELOW the projection that divides
    // by nrm: under ANSI mode (the session default) a zero-norm row
    // would otherwise throw DIVIDE_BY_ZERO in the same Project that
    // computes nrm, before any same-level filter could remove it —
    // predicate pushdown keeps the filter below the division in every
    // optimized shape, so the division only ever sees surviving rows.
    val b = corpus.select(
      col("id"), col("vec"),
      lshBucket(col("vec"), hp.take(planes)).as("bucket"), l2norm(col("vec")).as("nrm"))
      .filter(col("nrm") > 0.0)
      .select(col("id"), col("vec"), col("bucket"), col("nrm"),
        floor(dot(col("vec"), typedlit(u1)) / (col("nrm") * lit(w))).cast("long").as("c1"),
        floor(dot(col("vec"), typedlit(u2)) / (col("nrm") * lit(w))).cast("long").as("c2"))
    // Left side explodes to the 3×3 neighbor stencil; the mirror
    // match (y exploded onto x) fails the id ordering filter, so each
    // qualifying pair survives exactly once.
    val xs = b
      .withColumn("d1", explode(typedlit(Seq(-1, 0, 1))))
      .withColumn("d2", explode(typedlit(Seq(-1, 0, 1))))
      .select(col("id"), col("vec"), col("nrm"), col("bucket"),
        (col("c1") + col("d1")).as("c1"), (col("c2") + col("d2")).as("c2"))
    xs.as("x").join(b.as("y"), Seq("bucket", "c1", "c2"))
      .filter(col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"),
        col("y.id").as("id_b"),
        (dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm"))).as("sim")
      )
      .filter(col("sim") >= threshold)
  }

  /** Approximate top-k: candidates share an LSH bucket, exact cosine
    * rerank within the bucket. Trades recall for a |bucket|-sized
    * candidate set instead of the full corpus.
    *
    * `multiProbe` > 0 also searches the buckets at Hamming distance 1
    * from the probe's bucket (flipping the `multiProbe`
    * least-significant plane bits) — the standard multi-probe LSH
    * recall boost: candidates grow ~(1+multiProbe)x while the corpus
    * side still shuffles once.
    */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int, planes: Int, dim: Int, multiProbe: Int = 0): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val base = lshBucket(col("vec"), hp)
    val probeBuckets = array_distinct(array(
      (Seq(base) ++ (0 until math.min(multiProbe, planes)).map(j => base.bitwiseXOR(lit(1L << j)))): _*
    ))
    val pb = probes.select(
      col("id").as("probe_id"), col("vec").as("pv"),
      explode(probeBuckets).as("bucket"), l2norm(col("vec")).as("pn"))
    val cb = corpus.select(
      col("id").as("neighbor_id"), col("vec").as("nv"),
      lshBucket(col("vec"), hp).as("bucket"), l2norm(col("vec")).as("nn"))
    val scored = cb.join(broadcast(pb), "bucket")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), (dot(col("pv"), col("nv")) / (col("pn") * col("nn"))).as("sim"))
      .distinct() // a neighbor can surface via several probe buckets
    TopK.perKey(scored, Seq("probe_id"), struct(-col("sim"), col("neighbor_id")), k)
  }

  /** SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): partition the embedding space into cells,
    * elect one representative per cell, and drop every other member
    * whose cosine to its representative reaches `tau` — removing
    * semantic (paraphrase-level) duplicates that lexical MinHash/
    * SimHash can't see. The paper partitions with k-means; here the
    * cells are the deterministic sign-LSH hyperplane buckets, which
    * (a) need no fit pass over the corpus and (b) make the partition
    * reproducible in any engine — so the whole operator is
    * oracle-checkable, unlike a k-means assignment. (The k-means cell
    * variant at higher recall = Ivf.kmeansCentroids assignment +
    * this same per-cell prune.)
    *
    * Scale shape: one shuffle of (cell, id, vec); representatives are
    * one row per non-empty cell, reduced via min_by and joined back on
    * the cell key — cost is corpus + cells, never corpus². At 100 TB
    * raise `planes` ~log2(corpus) to hold per-cell occupancy, exactly
    * like [[nearDupPairs]]. The keep flag compares the ROUNDED
    * similarity so the decision is engine-exact.
    */
  def semanticDedup(corpus: DataFrame, planes: Int, dim: Int, tau: Double): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val cells = corpus.select(col("id"), col("vec"), lshBucket(col("vec"), hp).as("cell"))
    val reps = cells.groupBy("cell")
      .agg(min_by(struct(col("id"), col("vec")), col("id")).as("rep"))
      .select(col("cell"), col("rep.id").as("rep_id"), col("rep.vec").as("rep_vec"))
    cells.join(reps, "cell")
      .select(col("id"), col("cell"), col("rep_id"),
        round(cosine(col("vec"), col("rep_vec")), 6).as("rep_sim"))
      .withColumn("keep", col("id") === col("rep_id") || col("rep_sim") < tau)
  }

  /** DuckDB SQL expression computing the same sign-bit bucket as
    * [[lshBucket]] over a DOUBLE[] column expression: the hyperplanes
    * are deterministic, so they inline as ±1 literals — which is what
    * lets the LSH queries be oracle-checked instead of rows-only.
    */
  def bucketSqlDuck(vExpr: String, planes: Int, dim: Int): String =
    hyperplanes(planes, dim).zipWithIndex.map { case (p, j) =>
      val lits = p.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product($vExpr, $lits::DOUBLE[]) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** [[bucketSqlDuck]] with a RUNTIME planes count: inlines all
    * `maxPlanes` hyperplanes and gates plane j's bit on
    * `j < planesExpr` — because [[hyperplanes]] is prefix-stable,
    * masking the low `planesFor(n)` bits of the maxPlanes bucket IS
    * the planesFor(n) bucket. This is what lets the count-scaled
    * config keep a DuckDB oracle: the oracle computes planes from
    * count(*) with the same integer rule and masks, instead of
    * needing the corpus size at SQL-authoring time.
    */
  def bucketSqlDuckScaled(vExpr: String, maxPlanes: Int, dim: Int, planesExpr: String): String =
    hyperplanes(maxPlanes, dim).zipWithIndex.map { case (p, j) =>
      val lits = p.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")
      s"(CASE WHEN $j < ($planesExpr) AND list_dot_product($vExpr, $lits::DOUBLE[]) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * out_k = dot(vec, s_k) / sqrt(outDim) over the deterministic ±1
    * rows of [[hyperplanes]] (Achlioptas 2001: ±1 entries satisfy the
    * JL lemma like Gaussians do, and stay integer-exact until the one
    * final division). The workhorse pre-step for ANN at scale: a
    * 64→16 projection cuts every downstream dot product 4× while
    * pairwise distances survive within 1±ε — the spec measures the
    * distortion; the projection itself is oracle-exact because the
    * matrix inlines as literals and both engines fold the dot product
    * in ascending element order.
    *
    * Scale shape: one codegen projection per row (outDim fused VecDot
    * expressions), no shuffle, no driver state; the matrix is plan-time
    * constant — nothing is broadcast at runtime.
    */
  def randomProject(df: DataFrame, vecCol: String, outDim: Int, dim: Int): DataFrame = {
    val hp = hyperplanes(outDim, dim)
    val scale = math.sqrt(outDim.toDouble)
    df.withColumn("proj",
      array(hp.map(p => round(dot(col(vecCol), typedlit(p)) / scale, 4)): _*))
  }

  /** Embedding-space benchmark decontamination — the semantic twin of
    * the n-gram decontaminate in TextDedup: drop every corpus document
    * whose embedding sits within cosine `tau` of ANY held-out
    * benchmark item, so paraphrased eval leakage (which lexical
    * n-gram overlap misses) leaves the training mix. Emits one row per
    * corpus doc: the max benchmark similarity, how many benchmark
    * items clear `tau`, and the keep flag.
    *
    * Scale shape: the benchmark side is small by construction (an eval
    * suite, not a corpus) and broadcasts whole; the corpus × benchmark
    * scoring is a BroadcastNestedLoopJoin whose output NEVER
    * materializes — the per-doc max/count partial-aggregates in the
    * same stage, map-side, so the only shuffle carries one row per
    * corpus doc (the final agg). That makes the operator a distributed
    * GEMM: compute-bound, corpus read once, nothing corpus-sized
    * moves. An exact max over the full benchmark — unlike an
    * LSH/IVF prefilter — can't false-keep a contaminated doc, which
    * is the property a decontamination gate is for.
    *
    * Engine-exactness: the keep decision compares the ROUNDED
    * similarity (6 dp), same as [[semanticDedup]], so the kept set
    * reproduces in any engine.
    */
  def decontaminateByEmbedding(corpus: DataFrame, bench: DataFrame, tau: Double): DataFrame = {
    val b = bench.select(col("id").as("bench_id"), col("vec").as("bv"), l2norm(col("vec")).as("bn"))
    val c = corpus.select(col("id"), col("vec").as("cv"), l2norm(col("vec")).as("cn"))
    c.crossJoin(broadcast(b))
      .select(col("id"),
        round(dot(col("cv"), col("bv")) / (col("cn") * col("bn")), 6).as("sim"))
      .groupBy("id")
      .agg(max(col("sim")).as("max_bench_sim"),
        sum(when(col("sim") >= tau, 1L).otherwise(0L)).as("n_bench_hits"))
      .select(col("id"), col("max_bench_sim"), col("n_bench_hits"),
        (col("max_bench_sim") < tau).as("keep"))
  }

  /** DuckDB twin of [[randomProject]]'s `proj` column (same inlined
    * ±1 literals, same rounding) over a DOUBLE[] column expression.
    * The `+ 0.0` is the house negative-zero guard: DuckDB's round
    * keeps -0.0 for small negatives where Spark's BigDecimal round
    * returns +0.0, and the driver compares stringified values.
    */
  def projectSqlDuck(vExpr: String, outDim: Int, dim: Int): String =
    projectColsSqlDuck(vExpr, outDim, dim).mkString("[", ", ", "]")

  /** Per-element DuckDB expressions for [[randomProject]] — one scalar
    * expression per output dimension. The driver's comparator sorts and
    * hashes SCALAR cells; an array column defeats its row sort, so the
    * oracle-checked q_jl_project emits each projection component as its
    * own DOUBLE column built from these.
    */
  def projectColsSqlDuck(vExpr: String, outDim: Int, dim: Int): Seq[String] = {
    val scale = math.sqrt(outDim.toDouble)
    hyperplanes(outDim, dim).map { p =>
      val lits = p.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")
      s"round(list_dot_product($vExpr, $lits::DOUBLE[]) / $scale, 4) + 0.0"
    }
  }

  /** Symmetric int8 scalar-quantization audit: per-vector absmax scale
    * (the faiss/SQ8 layout), q_i = round(x_i·127/absmax) clipped to
    * ±127, reporting the integer checksum Σq, the saturation count,
    * and the max reconstruction error — the metrics a vector-store
    * compaction is gated on. 4x memory cut before ANN serving.
    *
    * Pure codegen map pass (transform/aggregate over the array), no
    * shuffle; sums over q are integer-exact, and the error metric is a
    * MAX (order-free), so every emitted value is engine-portable.
    */
  def quantizeInt8Stats(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amaxed = corpus.select(col(idCol), v.as("__v"),
      array_max(transform(v, x => abs(x))).as("amax"))
    val q: Column = transform(col("__v"), x =>
      when(col("amax") === 0.0, lit(0L)).otherwise(
        least(greatest(round(x * lit(127.0) / col("amax")), lit(-127.0)), lit(127.0))
          .cast("long")))
    // The error metric is computed in its own projection, BEFORE the
    // output column that renames `amax` to its rounded form, so the
    // lambda's `amax` can never lateral-alias-resolve to the rounded
    // value (it must mirror the oracle's raw-amax reconstruction).
    amaxed.select(col(idCol), col("__v"), col("amax"), q.as("__q"))
      .withColumn("__err", array_max(zip_with(col("__v"), col("__q"), (x, qi) =>
        when(col("amax") === 0.0, lit(0.0)).otherwise(
          abs(x - qi.cast("double") * col("amax") / lit(127.0))))))
      .select(
        col(idCol),
        round(col("amax"), 6).as("amax"),
        aggregate(col("__q"), lit(0L), (a, x) => a + x).as("sum_q"),
        size(filter(col("__q"), x => abs(x) === 127L)).cast("long").as("n_sat"),
        round(col("__err"), 6).as("max_abs_err"))
  }

  /** Recall@k of truncated-dimension search vs the full vector — the
    * Matryoshka-representation question (Kusupati et al. 2022): how
    * much ANN quality survives keeping the first `dims` components?
    * Both rankings are exact brute force (same probe set, same k, same
    * tie order), so the hit count is integer-exact across engines.
    */
  def truncatedRecall(corpus: DataFrame, idCol: String, vecCol: String,
                      probeFilter: Column, k: Int, dims: Int): DataFrame = {
    val e = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val t = e.select(col("id"), slice(col("vec"), 1, dims).as("vec"))
    val full = bruteForceTopK(e.filter(probeFilter), e, k)
      .select(col("probe_id"), col("neighbor_id"))
    val trunc = bruteForceTopK(t.filter(probeFilter), t, k)
      .select(col("probe_id"), col("neighbor_id"))
    val hits = full.join(trunc, Seq("probe_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    // probe count stays in-plan (no driver action): one tiny agg row
    // cross-joined against the one-row hit count.
    val probes = full.agg(countDistinct(col("probe_id")).as("n_probes"))
    hits.crossJoin(probes).select(
      col("n_probes"), lit(k).as("k"), lit(dims).as("dims_kept"),
      col("n_hits"),
      round(col("n_hits").cast("double") / (col("n_probes") * k).cast("double"), 4)
        .as("recall"))
  }

  /** One Lloyd assignment step against given centroids (cid, cvec):
    * every vector to its nearest centroid by squared L2, ties to the
    * smallest cid. This is the IVF coarse quantizer's inner loop
    * (Ivf.scala) surfaced as a first-class operator with an
    * integer-exact per-cluster summary — identical double distances
    * from identical float inputs make the argmin engine-portable.
    *
    * Centroids broadcast; the corpus never shuffles until the final
    * (cid)-keyed aggregate, which is map-side combined.
    */
  /** Product-quantization code assignment (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the vector splits
    * into `m` contiguous subspaces of `subDim` dims; each subspace is
    * assigned to its nearest of the k codebook entries by squared L2
    * (ties to the smallest code). Emits one row per vector with the m
    * codes plus the total reconstruction distortion — the memory-
    * bound ANN path: a 64-dim float vector compresses to m bytes.
    *
    * The codebook here is the first k corpus vectors (deterministic,
    * engine-portable — same convention as kmeansAssign's seeds); a
    * real index would Lloyd-iterate per subspace first. Codebook
    * broadcasts (k·m tiny rows); the corpus is touched once in a
    * single map-side pass ending in a per-vector aggregate, so at
    * 100 TB the plan is scan + broadcast-join + one (id)-keyed
    * combine — no corpus self-join anywhere.
    */
  def pqAssign(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, subDim: Int, k: Int): DataFrame = {
    require(m == 4, "pqAssign emits fixed code0..code3 columns; m must be 4")
    val e = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val subIdx = explode(sequence(lit(0), lit(m - 1))).as("s")
    val subs = e.select(col("id"), subIdx, col("v"))
      .select(col("id"), col("s"),
        slice(col("v"), col("s") * subDim + 1, lit(subDim)).as("sv"))
    val cents = e.filter(col("id") < k)
      .select(col("id").as("cid"), subIdx, col("v"))
      .select(col("cid"), col("s").as("cs"),
        slice(col("v"), col("s") * subDim + 1, lit(subDim)).as("cv"))
    val d2 = aggregate(zip_with(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)
    val scored = subs.join(broadcast(cents), col("s") === col("cs"))
      .select(col("id"), col("s"), col("cid"), d2.as("d2"))
    // per-subspace argmin folded into ONE (id)-keyed aggregate: the
    // conditional struct-min is null outside its subspace, so the four
    // argmins ride a single map-side-combined shuffle instead of a
    // (id, s) pre-aggregate plus a second exchange
    def bestAt(s: Int) = min(when(col("s") === s, struct(col("d2"), col("cid"))))
    scored.groupBy("id").agg(
      bestAt(0).as("b0"), bestAt(1).as("b1"), bestAt(2).as("b2"), bestAt(3).as("b3"))
      // distortion sums the m per-subspace terms in fixed index order
      // so the double addition sequence matches the oracle's exactly
      .select(col("id").as(idCol),
        col("b0.cid").as("code0"), col("b1.cid").as("code1"),
        col("b2.cid").as("code2"), col("b3.cid").as("code3"),
        round(col("b0.d2") + col("b1.d2") + col("b2.d2") + col("b3.d2"), 6).as("distortion"))
  }

  /** IVF-PQ search (Jégou et al. 2011 §IV — the faiss IVFADC layout):
    * a coarse quantizer routes each corpus vector to one of `nlist`
    * inverted lists; per-subspace PQ codes compress it to `m` bytes;
    * a probe scans only its `nprobe` nearest lists and ranks
    * candidates by the asymmetric distance (ADC): the sum over
    * subspaces of d²(probe_sub, codebook[code]) — looked up, never
    * recomputed against the vector.
    *
    * Deterministic seed codebooks (first `nlist` / first `kCodes`
    * corpus vectors — the kmeansAssign/pqAssign convention) keep every
    * stage engine-portable; a production fit would Lloyd-iterate both
    * (Ivf.kmeansCentroids) without changing any plan shape.
    *
    * Scale shape: ALL small sides broadcast — coarse centroids
    * (nlist), PQ codebooks (m·kCodes), the probe panel (pinned — a
    * fixed query set over a growing corpus, the r6 lesson), and the
    * probes' ADC lookup tables (probes × m × kCodes). The corpus is
    * scored/encoded in ONE projection pass and shuffles only as
    * (id, list, m codes) rows; the ADC join touches just the probed
    * lists' code rows, and the four LUT joins add in fixed subspace
    * order so the double sum is bit-identical across engines.
    */
  def ivfPqSearch(corpus: DataFrame, idCol: String, vecCol: String,
                  probeFilter: Column, nlist: Int, nprobe: Int,
                  m: Int, subDim: Int, kCodes: Int, topK: Int): DataFrame = {
    require(m == 4, "ivfPqSearch sums fixed code0..code3 ADC terms; m must be 4")
    val e = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    // Seed codebooks come back to the driver — nlist·dim + kCodes·dim
    // doubles, bounded and tiny (the Ivf.kmeansCentroids convention) —
    // so corpus encoding is ONE pure codegen projection: no broadcast
    // join, no shuffle, nothing but the scan.
    def collectVecs(limit: Int): Seq[(Int, Seq[Double])] =
      e.filter(col("id") < limit).orderBy("id").collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val coarseC = collectVecs(nlist)
    val bookC = collectVecs(kCodes)
    // elementwise (x-y)^2 left fold — the SAME fp expression and order
    // the oracle's list_sum(list_transform(...)) evaluates, so argmin
    // ties cannot diverge between engines (the dot-product identity
    // would round differently)
    def d2To(vec: Column, c: Seq[Double]): Column =
      aggregate(zip_with(vec, typedlit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t)
    def argminTo(vec: Column, cands: Seq[(Int, Seq[Double])]): Column =
      least(cands.map { case (i, c) => struct(d2To(vec, c).as("d"), lit(i).as("i")) }: _*)
        .getField("i")
    def subVec(vec: Column, s: Int): Column = slice(vec, s * subDim + 1, subDim)
    def subBook(s: Int): Seq[(Int, Seq[Double])] =
      bookC.map { case (i, c) => (i, c.slice(s * subDim, (s + 1) * subDim)) }
    // one corpus projection: inverted-list id + the m PQ codes
    val codes = e.select(col("id"),
      argminTo(col("v"), coarseC).as("list"),
      argminTo(subVec(col("v"), 0), subBook(0)).as("code0"),
      argminTo(subVec(col("v"), 1), subBook(1)).as("code1"),
      argminTo(subVec(col("v"), 2), subBook(2)).as("code2"),
      argminTo(subVec(col("v"), 3), subBook(3)).as("code3"))
    val probes = e.filter(probeFilter).select(col("id").as("pid"), col("v"))
    // nprobe nearest lists per probe (probe panel is pinned/bounded)
    val listScores = explode(array(coarseC.map { case (i, c) =>
      struct(d2To(col("v"), c).as("d"), lit(i).as("lid"))
    }: _*)).as("sc")
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("sc.d"), col("sc.lid"))
    val probeLists = probes.select(col("pid"), listScores)
      .withColumn("rn", row_number().over(wl)).filter(col("rn") <= nprobe)
      .select(col("pid"), col("sc.lid").as("list"))
    // ADC lookup tables: d²(probe subspace, codebook entry) — probes ×
    // kCodes rows per subspace, broadcast
    def lutAt(s: Int): DataFrame = broadcast(
      probes.select(col("pid").as(s"p$s"),
        explode(array(subBook(s).map { case (i, c) =>
          struct(lit(i).as("cid"), d2To(subVec(col("v"), s), c).as("d"))
        }: _*)).as("lu"))
        .select(col(s"p$s"), col("lu.cid").as(s"c$s"), col("lu.d").as(s"d$s")))
    val cand = codes.join(broadcast(probeLists), "list")
      .join(lutAt(0), col("pid") === col("p0") && col("code0") === col("c0"))
      .join(lutAt(1), col("pid") === col("p1") && col("code1") === col("c1"))
      .join(lutAt(2), col("pid") === col("p2") && col("code2") === col("c2"))
      .join(lutAt(3), col("pid") === col("p3") && col("code3") === col("c3"))
      // fixed parenthesization: the oracle adds the four terms the same way
      .select(col("pid"), col("id"),
        (((col("d0") + col("d1")) + col("d2")) + col("d3")).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("adc"), col("id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("pid").as("probe_id"), col("id").as("neighbor_id"),
        col("rank"), round(col("adc"), 6).as("adc_dist"))
  }

  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame): DataFrame = {
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .select(col("id"), col("cid"),
        (dot(col("v"), col("v")) + dot(col("cvec"), col("cvec")) -
          lit(2.0) * dot(col("v"), col("cvec"))).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("d2"), col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"), sum("id").as("sum_ids"),
        min("id").as("min_id"), max("id").as("max_id"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein
    * 1998): greedily pick `selectK` of the query's `shortlistK`
    * nearest neighbors, each step maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the diversity-aware
    * re-ranking between retrieval and context assembly.
    *
    * Scale shape: the DISTRIBUTED work is shortlist generation (one
    * corpus scan — bruteForceTopK or an ANN index at 100 TB) and the
    * shortlistK² pairwise-similarity matrix (self-join of shortlistK
    * rows). The greedy loop itself runs on the driver over that
    * bounded k + k² collected set — selectK·shortlistK comparisons on
    * ≤ a few hundred doubles, the same bounded-driver-data contract
    * as the BPE argmax. Similarities stay raw doubles through every
    * comparison (bit-exact cross-engine per the q_ann_bruteforce
    * precedent); output rounds at 6 dp.
    */
  def mmrSelect(corpus: DataFrame, probe: DataFrame,
                shortlistK: Int, selectK: Int, lambda: Double): DataFrame = {
    val spark = corpus.sparkSession
    val shortlist = bruteForceTopK(probe, corpus, shortlistK)
      .select(col("neighbor_id").as("id"), col("sim").as("rel"))
    val slVecs = corpus.join(broadcast(shortlist.select(col("id"))), "id")
      .select(col("id"), col("vec"), l2norm(col("vec")).as("nrm"))
    val pairs = slVecs.as("a").join(broadcast(slVecs.as("b")),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        (dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm"))).as("s"))
    val rel = shortlist.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim = pairs.collect().flatMap { r =>
      val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      Seq((a, b) -> s, (b, a) -> s)
    }.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ rel.keys
    while (selected.size < selectK && remaining.nonEmpty) {
      // argmax of the MMR objective, id-ascending tiebreak (SortedSet
      // iteration order makes "first strict improvement wins" = min id)
      var bestId = -1L; var bestMmr = Double.NegativeInfinity; var bestRel = 0.0
      for (c <- remaining) {
        val maxPrev = if (selected.isEmpty) 0.0
          else selected.map(s => sim((c, s._1))).max
        val mmr = lambda * rel(c) - (1 - lambda) * maxPrev
        if (mmr > bestMmr) { bestId = c; bestMmr = mmr; bestRel = rel(c) }
      }
      selected += ((bestId, bestRel, bestMmr))
      remaining -= bestId
    }
    import spark.implicits._
    // same rounding as Spark's round()/DuckDB's round(): half away
    // from zero (math.rint's half-even would disagree on .5 exactly)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    selected.toSeq.zipWithIndex
      .map { case ((id, r, m), i) => (i + 1L, id, r6(r), r6(m)) }
      .toDF("sel_rank", "id", "relevance", "mmr_score")
  }

  /** Linear Centered Kernel Alignment (Kornblith et al. 2019,
    * arXiv:1905.00414) between the two halves of an embedding column:
    * CKA = ‖Cxy‖²_F / (‖Cxx‖_F·‖Cyy‖_F) over CENTERED cross-
    * covariances — the representation-similarity standard ("do these
    * two feature views encode the same structure"), feature-space
    * form so nothing is ever n×n.
    *
    * Shape: ONE corpus pass explodes each vector into its d² dim-pair
    * products (d = vector length, 64 here — d²·n rows, map-side-
    * combined into the d² gram cells; the corpus never re-reads and
    * no matrix library appears); means join in as a broadcast, the
    * three Frobenius norms fold d²-bounded frames. Every cell is
    * Σxy − n·μν with exact float→double widening; only the final
    * norms/ratio are rounded.
    */
  def linearCka(emb: DataFrame, vecCol: String, splitAt: Int): DataFrame = {
    val v = emb.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val pairs = v
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
    val gram = pairs.groupBy("i", "j").agg(sum(col("xi") * col("xj")).as("s"))
    val means = v.select(posexplode(col("v")).as(Seq("i", "xi")))
      .groupBy("i").agg(sum("xi").as("m"), count(lit(1)).as("n"))
    val cells = gram
      .join(broadcast(means.select(col("i"), col("m").as("mi"), col("n"))), "i")
      .join(broadcast(means.select(col("i").as("j"), col("m").as("mj"))), "j")
      .select(col("i"), col("j"),
        (col("s") - col("mi") * col("mj") / col("n").cast("double")).as("c"),
        col("n"))
    val block = when(col("i") < splitAt && col("j") < splitAt, "xx")
      .when(col("i") >= splitAt && col("j") >= splitAt, "yy")
      .when(col("i") < splitAt && col("j") >= splitAt, "xy")
      .otherwise("yx")
    cells.select(block.as("b"), (col("c") * col("c")).as("c2"), col("n"))
      .filter(col("b") =!= "yx")
      .groupBy("b").agg(sum("c2").as("f2"), max("n").as("n"))
      .groupBy()
      .agg(max("n").as("n"),
        sum(when(col("b") === "xy", col("f2"))).as("fxy"),
        sum(when(col("b") === "xx", col("f2"))).as("fxx"),
        sum(when(col("b") === "yy", col("f2"))).as("fyy"))
      .select(col("n"), lit(splitAt).as("d_split"),
        round(col("fxy") / (sqrt(col("fxx")) * sqrt(col("fyy"))), 4).as("cka"))
  }
}
