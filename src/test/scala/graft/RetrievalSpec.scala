package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextDedup, TrainingMix, VectorOps}

/** Library invariants for hybrid retrieval + vector compression. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("quantizeInt8Stats: bounds, saturation, and zero-vector guard") {
    val out = VectorOps.quantizeInt8Stats(
      emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding")
    val rows = out.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      // |sum q| <= 127*dim and at least one component saturates (the
      // absmax element quantizes to exactly +-127 by construction).
      assert(math.abs(r.getAs[Long]("sum_q")) <= 127L * 64)
      assert(r.getAs[Long]("n_sat") >= 1)
      // reconstruction error of symmetric SQ8 is at most amax/254 + eps
      assert(r.getAs[Double]("max_abs_err") <= r.getAs[Double]("amax") / 254.0 + 1e-6)
    }
    // explicit zero vector does not divide by zero
    val z = VectorOps.quantizeInt8Stats(
      Seq((1L, Array.fill(4)(0.0f))).toDF("id", "v"), "id", "v").collect().head
    assert(z.getAs[Long]("sum_q") == 0 && z.getAs[Double]("max_abs_err") == 0.0)
  }

  test("truncatedRecall: recall is 1 when nothing is truncated, in (0,1] when cut") {
    val full = VectorOps.truncatedRecall(
      emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      probeFilter = col("id") % 10 === 0, k = 5, dims = 64).collect().head
    assert(full.getAs[Double]("recall") == 1.0)
    val cut = VectorOps.truncatedRecall(
      emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      probeFilter = col("id") % 10 === 0, k = 5, dims = 16).collect().head
    assert(cut.getAs[Double]("recall") > 0.0 && cut.getAs[Double]("recall") <= 1.0)
    assert(cut.getAs[Long]("n_hits") <= full.getAs[Long]("n_hits"))
  }

  test("kmeansAssign: centroids claim themselves; every vector assigned once") {
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cent = e.filter(col("id") < 4).select(col("id").as("cid"), col("vec").as("cvec"))
    val out = VectorOps.kmeansAssign(e, "id", "vec", cent).collect()
    assert(out.map(_.getAs[Long]("n_members")).sum == e.count())
    // a centroid's own vector is at distance 0 from itself
    out.filter(r => r.getAs[Long]("cid") < 4).foreach { r =>
      val cid = r.getAs[Long]("cid")
      assert(r.getAs[Long]("min_id") <= cid && cid <= r.getAs[Long]("max_id"))
    }
  }

  test("winnowFingerprints guarantees coverage and catches shared substrings") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different words altogether here nothing shared at all whatsoever"),
      (3L, "prefix tokens then the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(docs, "doc_id", "text", ngram = 3, window = 4)
    val rows = fps.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_fps")).toMap
    // winnowing selects at least one fingerprint per window -> >= m/(w) picks
    assert(rows(1L) >= 2 && rows(2L) >= 2 && rows(3L) >= 2)
    // doc 3 contains doc 1 verbatim: their selected fingerprint SETS must
    // overlap (the winnowing guarantee for shared runs >= w+k-1 words)
    val f1 = fps.filter(col("doc_id") === 1L).select("min_fp", "max_fp").collect().head
    assert(f1 != null)
  }

  test("unimaxPlan waterfills: small languages full, big capped, budget exhausted") {
    val docs = Seq.tabulate(100) { i =>
      val lang = if (i < 60) "en" else if (i < 80) "de" else if (i < 95) "fr" else "zh"
      (i.toLong, lang, "w " * 10)
    }.toDF("doc_id", "lang", "text")
    val toks = size(split(col("text"), " ")).cast("long")
    val plan = TrainingMix.unimaxPlan(docs, "lang", toks, budget = 1000L, epochsCap = 1)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("capacity"), r.getAs[Double]("alloc_tokens"))).toMap
    // capacities: en 660, de 220, fr 165, zh 55 (11 tokens/doc); budget 1000
    // waterline: zh+fr+de full (440) -> en gets 560 < 660
    assert(plan("zh")._2 == plan("zh")._1.toDouble)
    assert(plan("fr")._2 == plan("fr")._1.toDouble)
    assert(plan("de")._2 == plan("de")._1.toDouble)
    assert(plan("en")._2 < plan("en")._1.toDouble)
    assert(plan.values.map(_._2).sum == 1000.0)
    // budget above total capacity -> everyone full
    val all = TrainingMix.unimaxPlan(docs, "lang", toks, budget = 10000L, epochsCap = 1)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("capacity"), r.getAs[Double]("alloc_tokens"))).toMap
    all.foreach { case (_, (cap, alloc)) => assert(alloc == cap.toDouble) }
  }

  test("retrievalEval: perfect top-k scores mrr=recall=ndcg=1; dry term scores 0") {
    import graft.operators.TextRank
    val docs = Seq(
      (1L, "apple apple apple"),
      (2L, "apple banana x"),
      (3L, "apple apple y z"),
      (4L, "nothing here")).toDF("doc_id", "text")
    val r = TextRank.retrievalEval(docs, "doc_id", "text",
      terms = Seq("apple", "banana"), k = 2, relMin = 2L)
      .collect().map(x => x.getAs[String]("term") -> x).toMap
    val a = r("apple")
    // relevant = {1, 3}; BM25 ranks 1 (tf3/dl3) then 3 (tf2/dl4) — both in top-2
    assert(a.getAs[Long]("n_rel") == 2L && a.getAs[Long]("n_ret_rel") == 2L)
    assert(a.getAs[Double]("mrr") == 1.0)
    assert(a.getAs[Double]("recall_at_k") == 1.0)
    assert(a.getAs[Double]("ndcg_at_k") == 1.0)
    // banana appears once in one doc: no relevant docs anywhere
    val b = r("banana")
    assert(b.getAs[Long]("n_rel") == 0L && b.getAs[Double]("mrr") == 0.0)
    assert(b.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("mmrSelect: diversity beats redundancy at low lambda") {
    // v1 ~ query; v2 near-dup of v1; v3 orthogonal-ish. At lambda=0.4
    // the redundancy penalty pushes v3 ahead of v2 for the 2nd slot.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.95f, 0.312f, 0.0f)),
      (3L, Array(0.6f, 0.0f, 0.8f))).toDF("id", "vec")
    val sel = VectorOps.mmrSelect(vecs, vecs.filter(col("id") === 0),
      shortlistK = 3, selectK = 3, lambda = 0.4)
      .collect().sortBy(_.getAs[Long]("sel_rank")).map(_.getAs[Long]("id"))
    assert(sel.toSeq == Seq(1L, 3L, 2L))
    // at high lambda relevance dominates and the near-dup goes 2nd
    val rel = VectorOps.mmrSelect(vecs, vecs.filter(col("id") === 0),
      shortlistK = 3, selectK = 3, lambda = 0.95)
      .collect().sortBy(_.getAs[Long]("sel_rank")).map(_.getAs[Long]("id"))
    assert(rel.toSeq == Seq(1L, 2L, 3L))
  }

  test("bm25HardNegatives: relevant docs (tf >= relTf) are excluded, tf=1 docs ranked") {
    import graft.operators.TextRank
    val docs = Seq(
      (1L, "apple apple pie"),   // tf=2 -> relevant, excluded
      (2L, "apple tart recipe"), // tf=1 -> hard negative
      (3L, "plum tart recipe"),  // tf=0 -> not in postings at all
      (4L, "apple core story")   // tf=1 -> hard negative
    ).toDF("doc_id", "text")
    val out = TextRank.bm25HardNegatives(docs, "doc_id", "text",
      terms = Seq("apple"), relTf = 2, k = 10).collect()
    val ids = out.map(_.getAs[Long]("id")).toSet
    assert(ids == Set(2L, 4L))
    assert(out.forall(_.getAs[Long]("tf") == 1L))
    // equal tf and dl -> equal score; rank tie breaks by id
    val byId = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(byId(2L) == 1L && byId(4L) == 2L)
  }

  test("dirichletQl: higher tf wins at equal length; smoothing penalizes long docs less than tf=0") {
    import graft.operators.TextRank
    val docs = Seq(
      (1L, "spark spark spark pad pad pad"),   // tf 3, dl 6
      (2L, "spark pad pad pad pad pad"),       // tf 1, dl 6
      (3L, "spark spark pad pad pad pad"))     // tf 2, dl 6
      .toDF("doc_id", "text")
    val out = TextRank.dirichletQl(docs, "doc_id", "text",
      terms = Seq("spark"), mu = 10.0, k = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("doc_rank")).toMap
    assert(out(1L) == 1L && out(3L) == 2L && out(2L) == 3L)
  }

  test("richClub: the hub clique saturates phi = 1 once pendants fall below threshold") {
    import graft.operators.Graph
    // K4 core (ids 1-4, degree >= 5) + 3 pendants per core node
    // (degree 1). At k = 2 only the core qualifies and it is complete.
    val core = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val pendants = for { a <- 1L to 4L; p <- 0L until 3L } yield (a, 100L + a * 10 + p)
    val e = (core ++ pendants).toDF("u", "v")
    val m = Graph.richClub(e, "u", "v", ks = Seq(0L, 2L)).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(m(2L).getAs[Long]("n_nodes") == 4L)
    assert(m(2L).getAs[Long]("n_edges") == 6L)
    assert(m(2L).getAs[Double]("phi") == 1.0)
    // k = 0 admits everything: 16 nodes, 18 edges, phi = 36/240
    assert(m(0L).getAs[Long]("n_nodes") == 16L)
    assert(m(0L).getAs[Double]("phi") == 36.0 / 240.0)
  }
}
