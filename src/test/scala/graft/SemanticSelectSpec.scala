package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, VectorOps}

/** Semantic dedup (SemDeDup-shaped) + DSIR importance resampling. */
class SemanticSelectSpec extends SparkSpec {
  import spark.implicits._

  test("semanticDedup: identical vector is pruned, orthogonal vector in same cell survives") {
    // Hand-built cell collision: v and 2v share every sign bucket and
    // have cosine exactly 1; w is made cell-colliding but far (cos < tau).
    val dim = 4
    val base = Seq.fill(dim)(1.0)
    val scaled = base.map(_ * 2.0)
    val near = Seq(1.0, 1.0, 1.0, 0.9)
    val df = Seq(
      (1L, base), (2L, scaled), (3L, near)
    ).toDF("id", "vec")
    val out = VectorOps.semanticDedup(df, planes = 2, dim = dim, tau = 0.999999)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((1L, true)))   // representative always kept
    // v and 2v share every sign bucket (same direction), so 2 is in
    // 1's cell with cosine exactly 1 -> pruned
    assert(out(2L)._1 == 1L && !out(2L)._2)
    // near's cosine to base is ~0.9987 < tau: survives whether it
    // landed in 1's cell or became its own cell's representative
    assert(out(3L)._2)
  }

  test("semanticDedup keeps exactly one representative per cell and never drops it") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val out = VectorOps.semanticDedup(e, planes = 6, dim = 64, tau = 0.99).cache()
    val byCell = out.groupBy("cell").agg(
      countDistinct("rep_id").as("n_reps"),
      sum(when(col("id") === col("rep_id") && col("keep"), 1L).otherwise(0L)).as("rep_kept"))
    assert(byCell.filter(col("n_reps") =!= 1L || col("rep_kept") =!= 1L).count() == 0)
    // rep is the min id of its cell
    val badRep = out.groupBy("cell").agg(min("id").as("min_id"), first("rep_id").as("rep_id"))
      .filter(col("min_id") =!= col("rep_id"))
    assert(badRep.count() == 0)
    out.unpersist()
  }

  test("planesFor: integer rule, clamps, and the occupancy bound it promises") {
    // Clamps.
    assert(VectorOps.planesFor(0L) == 8 && VectorOps.planesFor(1L) == 8)
    assert(VectorOps.planesFor(Long.MaxValue) == 16)
    // The rule: smallest p in [8,16] with 16·2^p >= n — checked
    // against a direct reference sweep, including the exact
    // boundaries (n = 16·2^p and n = 16·2^p + 1).
    for (p <- 8 to 15) {
      val cap = 16L << p
      assert(VectorOps.planesFor(cap) == p, s"n=$cap")
      assert(VectorOps.planesFor(cap + 1) == p + 1, s"n=${cap + 1}")
    }
    // Monotone in n.
    val sweep = Seq(1L, 100L, 4096L, 5000L, 66000L, 1000000L, 10000000L)
      .map(VectorOps.planesFor(_))
    assert(sweep == sweep.sorted)
    // The promise: expected occupancy n/2^p <= 16 whenever unclamped.
    for (n <- Seq(500L, 2200L, 22000L, 66000L, 900000L)) {
      val p = VectorOps.planesFor(n)
      if (p < 16) assert(n <= (16L << p), s"occupancy bound broken at n=$n p=$p")
    }
  }

  test("planesFor is overflow-free at permitted non-default bounds (r12 advice)") {
    // The shift-left spelling (targetOccupancy << p) wraps Long at
    // p >= 60 with occupancy 16 (2^4 · 2^60 = 2^64 ≡ 0), silently
    // forcing maxPlanes; the (n-1) >> p form cannot wrap. At the
    // widest permitted bounds the smallest plane count must win.
    assert(VectorOps.planesFor(1000L, minPlanes = 60, maxPlanes = 62) == 60)
    assert(VectorOps.planesFor(Long.MaxValue, minPlanes = 60, maxPlanes = 62) == 60)
    // ... and the two forms agree wherever the shift form is exact:
    // every p in the default clamp range, at both sides of each
    // boundary (the DuckDB oracle keeps the shift spelling, so this
    // equality is what keeps engine and oracle in lockstep).
    for (p <- 8 to 15; n <- Seq((16L << p) - 1, 16L << p, (16L << p) + 1)) {
      val shiftForm = (8 to 16).find(q => (16L << q) >= n).getOrElse(16)
      assert(VectorOps.planesFor(n) == shiftForm, s"forms diverge at n=$n")
    }
  }

  test("hyperplanes are prefix-stable — the property the scaled oracle's bit mask relies on") {
    assert(VectorOps.hyperplanes(8, 64) == VectorOps.hyperplanes(16, 64).take(8))
    assert(VectorOps.hyperplanes(11, 64) == VectorOps.hyperplanes(16, 64).take(11))
  }

  test("nearDupPairs at scaled planes: planted duplicates always found, occupancy stays bounded") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val variants = e.filter(col("id") % 10 === 0)
      .select((col("id") + 1000000).as("id"), transform(col("vec"), x => x * 1.5f).as("vec"))
    val corpus = e.unionByName(variants).cache()
    val n = corpus.count()
    val planted = corpus.filter(col("id") >= 1000000).count()
    val p = VectorOps.planesFor(n)
    // Every planted scaled copy is an EXACT-direction duplicate: it
    // shares all sign buckets with its original at ANY planes count,
    // so recall on the planted set must be 1.0 under the scaled config.
    val pairs = VectorOps.nearDupPairs(corpus, threshold = 0.99, planes = p, dim = 64).cache()
    val foundPlanted = pairs
      .filter(col("id_b") === col("id_a") + 1000000).count()
    assert(foundPlanted == planted, s"planted recall: $foundPlanted of $planted")
    // Occupancy record: max in-bucket pair count stays a small
    // multiple of the expected-occupancy promise (buckets are hash-
    // uniform only in expectation; 32x headroom on occupancy² covers
    // the tail without making the test weather-flaky).
    val hp = VectorOps.hyperplanes(p, 64)
    val occ = corpus.select(VectorOps.lshBucket(col("vec"), hp).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(occ <= 32L * math.max(16L, n / (1L << p)),
      s"max occupancy $occ at planes=$p, n=$n")
    pairs.unpersist(); corpus.unpersist()
  }

  test("nearDupPairs slab pruning is exact: identical result set to the unpruned bucket join") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val variants = e.filter(col("id") % 10 === 0)
      .select((col("id") + 1000000).as("id"), transform(col("vec"), x => x * 1.5f).as("vec"))
    val corpus = e.unionByName(variants).cache()
    for (planes <- Seq(4, 8)) {
      // Reference: the plain within-bucket self-join (what the DuckDB
      // oracle computes) with no slab stencil.
      val hp = VectorOps.hyperplanes(planes, 64)
      val b = corpus.select(col("id"), col("vec"),
        VectorOps.lshBucket(col("vec"), hp).as("bucket"),
        VectorOps.l2norm(col("vec")).as("nrm"))
      val plain = b.as("x").join(b.as("y"), Seq("bucket"))
        .filter(col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          (VectorOps.dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm"))).as("sim"))
        .filter(col("sim") >= 0.99)
      val pruned = VectorOps.nearDupPairs(corpus, threshold = 0.99, planes = planes, dim = 64)
      assert(pruned.unionAll(plain).groupBy("id_a", "id_b").count()
        .filter(col("count") =!= 2L).count() == 0,
        s"slab pruning changed the result set at planes=$planes")
      assert(pruned.count() == plain.count())
    }
    corpus.unpersist()
  }

  test("nearDupPairs zero-norm guard: a planted zero vector is excluded, not silently dropped by slab cells") {
    // Without the nrm > 0 guard, a zero vector would be dropped by the
    // SLAB path (floor(NaN) cells are null) while the plain bucket
    // join would emit its NaN-sim pairs (NaN >= tau is true under both
    // engines' NaN-is-largest semantics) — making "pure pruning"
    // corpus-dependent (r12 verdict, wrong #3). With the guard, the
    // domain is nonzero vectors on BOTH paths and the equivalence is
    // unconditional.
    val dim = 4
    val corpus = Seq(
      (1L, Seq(1.0, 1.0, 1.0, 1.0)),
      (2L, Seq(2.0, 2.0, 2.0, 2.0)),   // exact-direction dup of 1
      (3L, Seq(0.0, 0.0, 0.0, 0.0)),   // planted zero vector
      (4L, Seq(1.0, 1.0, 1.0, 0.9))
    ).toDF("id", "vec")
    val out = VectorOps.nearDupPairs(corpus, threshold = 0.99, planes = 2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the zero vector appears in NO pair, on either side
    assert(!out.exists { case (a, b) => a == 3L || b == 3L })
    // the real duplicate pair still surfaces (guard removed nothing else)
    assert(out.contains((1L, 2L)))
    // reference: plain bucket join under the same nonzero-domain guard
    val hp = VectorOps.hyperplanes(2, dim)
    val b = corpus.select(col("id"), col("vec"),
      VectorOps.lshBucket(col("vec"), hp).as("bucket"),
      VectorOps.l2norm(col("vec")).as("nrm"))
      .filter(col("nrm") > 0.0)
    val plain = b.as("x").join(b.as("y"), Seq("bucket"))
      .filter(col("x.id") < col("y.id"))
      .filter(VectorOps.dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")) >= 0.99)
      .select(col("x.id"), col("y.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == plain)
  }

  test("DSIR weights: an on-target document outscores an off-target one") {
    // target speaks 'alpha beta'; pool has one aligned + one disjoint doc
    val target = Seq((100L, "alpha beta alpha beta"), (101L, "beta alpha beta")).toDF("doc_id", "text")
    val source = Seq(
      (1L, "alpha beta alpha"),
      (2L, "gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val (wdf, h) = Dsir.importanceWeightsReleasable(source, target, "doc_id", "text", buckets = 64)
    try {
      val w = wdf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(w(1L) > w(2L))
      assert(w(1L) > 0.0)  // target-aligned: likelier under target than pool
      assert(w(2L) < 0.0)  // target-disjoint: penalized
    } finally h.release()
  }

  test("DSIR weights are finite for every pool document and deterministic across runs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(): Map[Long, Double] = {
      val (wdf, h) = Dsir.importanceWeightsReleasable(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 1024)
      try wdf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally h.release()
    }
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.size == docs.count())
    assert(a.values.forall(v => !v.isNaN && !v.isInfinity))
  }

  test("gumbelTopK: deterministic, correctly ranked, and weight-sensitive") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (w, h) = Dsir.importanceWeightsReleasable(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 1024)
    try {
      val sel = Dsir.gumbelTopK(w, "id", "weight", k = 20, seed = 17L).collect()
      assert(sel.length == 20)
      // ranks are 1..20 in descending noisy-key order
      val keys = sel.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("gumbel_key"))
      assert(keys.zip(keys.tail).forall { case (x, y) => x >= y })
      // same seed reproduces the exact selection; different seed shifts it
      val again = Dsir.gumbelTopK(w, "id", "weight", k = 20, seed = 17L)
        .select("id").as[Long].collect().toSet
      val other = Dsir.gumbelTopK(w, "id", "weight", k = 20, seed = 18L)
        .select("id").as[Long].collect().toSet
      assert(again == sel.map(_.getAs[Long]("id")).toSet)
      assert(other != again) // Gumbel noise actually depends on the seed
    } finally h.release()
  }

  test("NaiveBayes separates a toy two-class corpus and breaks ties deterministically") {
    import graft.operators.NaiveBayes
    val train = Seq(
      ("sport", "goal match team goal win"),
      ("sport", "team match score"),
      ("food", "bread cheese oven bake"),
      ("food", "cheese bread recipe")
    ).toDF("label", "text")
    val model = NaiveBayes.fit(train, "label", "text", buckets = 256)
    val out = NaiveBayes.predict(
      Seq((1L, "team goal score"), (2L, "bread oven cheese")).toDF("doc_id", "text"),
      model, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "sport", 2L -> "food"))
  }

  test("labelNoise flags the planted mislabel and spares consistent docs") {
    import graft.operators.NaiveBayes
    val docs = (1 to 10).map(i => (i.toLong, "en", "aaa bbb ccc ddd")) ++
      (11 to 20).map(i => (i.toLong, "fr", "xxx yyy zzz www")) :+
      ((99L, "en", "xxx yyy zzz www")) // text says fr, label says en
    val out = NaiveBayes.labelNoise(docs.toDF("doc_id", "lang", "text"),
      "doc_id", "lang", "text", margin = 0.5, buckets = 256).collect()
    assert(out.map(_.getAs[Long]("id")).toSet == Set(99L))
    assert(out.head.getAs[String]("predicted") == "fr")
    assert(out.head.getAs[Double]("noise_margin") > 0.5)
  }

  test("NaiveBayes learns a planted class signal at corpus volume") {
    import graft.operators.NaiveBayes
    // The synthetic documents' lang labels are independent of the text
    // (NB correctly degenerates to the prior argmax there), so plant a
    // weak marker: three class tokens against ~100 noise tokens/doc.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text", concat(col("text"),
        concat_ws("", array_repeat(concat(lit(" mk"), col("lang")), 6))))
    val pred = NaiveBayes.predict(docs,
      NaiveBayes.fit(docs, "lang", "text", buckets = 1024), "doc_id", "text", buckets = 1024)
    val joined = pred.join(docs.select(col("doc_id").as("id"), col("lang")), "id")
    val acc = joined.filter(col("predicted") === col("lang")).count().toDouble /
      joined.count().toDouble
    assert(acc > 0.95, s"NB should recover the planted class marker; accuracy $acc")
  }

  test("releasable variant tracks and releases its cache") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (w, handle) = Dsir.importanceWeightsReleasable(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 256)
    assert(w.count() > 0)
    handle.release() // must not throw; idempotent
    handle.release()
  }

  test("randomProject preserves norms in expectation and pairwise distances within JL distortion") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val p = VectorOps.randomProject(e, "embedding", outDim = 16, dim = 64)
      .select(col("vec_id"), col("embedding"), col("proj"))
    // E[||Pv||^2] = ||v||^2 for +-1/sqrt(k) projections; the mean ratio
    // over the corpus concentrates tightly even though any single row
    // can deviate ~1/sqrt(16)
    val ratios = p.select(
      (VectorOps.dot(col("proj"), col("proj")) /
        VectorOps.dot(col("embedding"), col("embedding"))).as("r"))
    val meanR = ratios.agg(avg(col("r"))).head().getDouble(0)
    assert(meanR > 0.85 && meanR < 1.15, s"mean norm ratio $meanR outside [0.85, 1.15]")
    // pairwise-distance distortion on consecutive-id pairs: the median
    // squared-distance ratio must sit near 1 (JL lemma)
    val a = p.select(col("vec_id").as("ia"), col("embedding").as("va"), col("proj").as("pa"))
    val b = p.select((col("vec_id") + 1).as("ia"), col("embedding").as("vb"), col("proj").as("pb"))
    val dr = a.join(b, "ia").select(
      ((VectorOps.dot(col("pa"), col("pa")) - lit(2) * VectorOps.dot(col("pa"), col("pb")) +
        VectorOps.dot(col("pb"), col("pb"))) /
        (VectorOps.dot(col("va"), col("va")) - lit(2) * VectorOps.dot(col("va"), col("vb")) +
          VectorOps.dot(col("vb"), col("vb")))).as("dr"))
    val medDr = dr.agg(expr("percentile(dr, 0.5)")).head().getDouble(0)
    assert(medDr > 0.7 && medDr < 1.3, s"median distance ratio $medDr outside [0.7, 1.3]")
    // deterministic: same matrix every run
    val again = VectorOps.randomProject(e, "embedding", outDim = 16, dim = 64)
      .select(col("vec_id"), col("proj"))
    assert(p.select(col("vec_id"), col("proj")).exceptAll(again).isEmpty)
  }
}
