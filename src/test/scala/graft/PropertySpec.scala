package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{Normalizers, PipedSetAgg, TextAnalysis}

/** Property-style checks over the normalizer/aggregate surface (raw
  * scalacheck generators; the scalatestplus bridge isn't in the
  * offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("normalizeOrcid and normalizePmid are idempotent") {
    val inputs = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 25)
    val df = inputs.map(s => "https://orcid.org/" + s).toDF("x")
    val once = df.select(Normalizers.normalizeOrcid(col("x")).as("y"))
    val twice = once.select(Normalizers.normalizeOrcid(col("y")).as("z"))
    assert(once.collect().map(_.getString(0)).toSeq == twice.collect().map(_.getString(0)).toSeq)

    val pm = samples(Gen.numStr.suchThat(_.nonEmpty), 25).map("MEDLINE:" + _).toDF("x")
    val p1 = pm.select(Normalizers.normalizePmid(col("x")).as("y"))
    val p2 = p1.select(Normalizers.normalizePmid(col("y")).as("z"))
    assert(p1.collect().map(_.getString(0)).toSeq == p2.collect().map(_.getString(0)).toSeq)
  }

  test("BLEU invariants on random token pairs: in [0,1], identity = 1, disjoint = 0") {
    import graft.operators.TextEval
    val wordGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e"))
    val pairs = samples(Gen.zip(wordGen, wordGen), 30).zipWithIndex
      .map { case ((r, c), i) => (i.toLong, r.mkString(" "), c.mkString(" ")) }
    val scored = TextEval.bleuPairs(pairs.toDF("id", "ref", "cand"), "id", "ref", "cand")
      .collect().map(_.getAs[Double]("bleu"))
    assert(scored.forall(b => b >= 0.0 && b <= 1.0))
    // identity pairs score exactly 1; disjoint-vocab pairs exactly 0
    val ident = pairs.map { case (i, r, _) => (i, r, r) }
    assert(TextEval.bleuPairs(ident.toDF("id", "ref", "cand"), "id", "ref", "cand")
      .collect().forall(_.getAs[Double]("bleu") == 1.0))
    val disjoint = pairs.map { case (i, r, _) => (i, r, "x y z w v x y z") }
    assert(TextEval.bleuPairs(disjoint.toDF("id", "ref", "cand"), "id", "ref", "cand")
      .collect().forall(_.getAs[Double]("bleu") == 0.0))
  }

  test("WER invariants on random token pairs: identity = 0, bounded by max length") {
    import graft.operators.TextEval
    val wordGen = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")))
    val pairs = samples(Gen.zip(wordGen, wordGen), 30).zipWithIndex
      .map { case ((r, c), i) => (i.toLong, r.mkString(" "), c.mkString(" ")) }
    val out = TextEval.werPairs(pairs.toDF("id", "ref", "cand"), "id", "ref", "cand")
      .collect()
    assert(out.forall { r =>
      val e = r.getAs[Long]("token_edits")
      e >= 0 && e <= math.max(r.getAs[Long]("n_ref"), r.getAs[Long]("n_cand"))
    })
    val ident = pairs.map { case (i, r, _) => (i, r, r) }
    assert(TextEval.werPairs(ident.toDF("id", "ref", "cand"), "id", "ref", "cand")
      .collect().forall(_.getAs[Long]("token_edits") == 0L))
  }

  test("containment bounds: in [0,1], >= jaccard, and 1 for any subset bag") {
    val wordGen = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e", "f", "gh", "i"))
    val pairs = samples(Gen.zip(wordGen, wordGen), 30)
      .map { case (w1, w2) => (w1.mkString(" "), (w1 ++ w2).mkString(" ")) }
    val df = pairs.toDF("frag", "sup")
    // frag's words are a prefix of sup, so every frag bigram that
    // stays inside the prefix is contained — but the general bound
    // tested is containment ∈ [0,1] and containment >= jaccard.
    val bad = df.select(
      TextAnalysis.containment(
        TextAnalysis.wordNgrams(col("frag"), 2), TextAnalysis.wordNgrams(col("sup"), 2)).as("c"),
      TextAnalysis.jaccard(
        TextAnalysis.wordNgrams(col("frag"), 2), TextAnalysis.wordNgrams(col("sup"), 2)).as("j")
    ).filter(col("c") < 0 || col("c") > 1 || col("c") < col("j")).count()
    assert(bad == 0)
    // a true subset (same bag both sides) is fully contained
    val full = Seq(("a b c d", "a b c d")).toDF("frag", "sup").select(
      TextAnalysis.containment(
        TextAnalysis.wordNgrams(col("frag"), 2), TextAnalysis.wordNgrams(col("sup"), 2)).as("c")
    ).head().getDouble(0)
    assert(full == 1.0)
  }

  test("ewmaLast lies within each key's [min, max] on random series") {
    val valGen = Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0))
    val series = samples(valGen, 20).zipWithIndex.flatMap { case (vs, k) =>
      vs.zipWithIndex.map { case (v, i) => (k.toLong, i.toLong, v) }
    }
    val df = series.toDF("k", "o", "v")
    val got = graft.operators.TimeSeries.ewmaLast(df, "k", Seq(col("o")), "v", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byKey = series.groupBy(_._1)
    for ((k, rows) <- byKey) {
      val vs = rows.map(_._3)
      assert(got(k) >= vs.min - 1e-4 && got(k) <= vs.max + 1e-4,
        s"key $k: ewma ${got(k)} outside [${vs.min}, ${vs.max}]")
    }
  }

  test("jaccard is symmetric and bounded on random word bags") {
    val wordGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "gh", "i"))
    val pairs = samples(Gen.zip(wordGen, wordGen), 30)
      .map { case (w1, w2) => (w1.mkString(" "), w2.mkString(" ")) }
    val df = pairs.toDF("x", "y")
    val bad = df.select(
      TextAnalysis.jaccard(TextAnalysis.wordNgrams(col("x"), 2), TextAnalysis.wordNgrams(col("y"), 2)).as("xy"),
      TextAnalysis.jaccard(TextAnalysis.wordNgrams(col("y"), 2), TextAnalysis.wordNgrams(col("x"), 2)).as("yx")
    ).filter(col("xy") =!= col("yx") || col("xy") < 0 || col("xy") > 1).count()
    assert(bad == 0)
  }

  test("PipedSetAgg UDAF equals collect_set formulation in SQL") {
    spark.udf.register("piped_set", org.apache.spark.sql.functions.udaf(PipedSetAgg))
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("orders_v")
    val diff = spark.sql(
      """SELECT o_custkey,
        |       piped_set(o_orderpriority) AS a,
        |       array_join(array_sort(collect_set(o_orderpriority)), '|') AS b
        |FROM orders_v GROUP BY o_custkey""".stripMargin)
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("slidingChunks covers every token exactly under varying sizes/strides") {
    import graft.operators.Curation
    // stride <= size: full coverage is only promised for overlapping
    // or back-to-back windows (stride > size is deliberate sampling)
    val cases = samples(
      Gen.choose(2, 40).flatMap(sz =>
        Gen.zip(Gen.choose(1, 120), Gen.const(sz), Gen.choose(1, sz))), 20)
    for ((n, size, stride) <- cases) {
      val toks = (1 to n).map(i => s"t$i")
      val chunks = Seq(toks.mkString(" ")).toDF("t")
        .select(explode(Curation.slidingChunks(split(col("t"), " "), size, stride)).as("u"))
        .select("u.chunk_text").as[String].collect()
      // coverage: the union of chunk tokens is exactly the input tokens
      assert(chunks.flatMap(_.split(" ")).toSet == toks.toSet, s"n=$n size=$size stride=$stride")
      // the first chunk starts at token 1; consecutive chunks advance by stride
      assert(chunks.head.startsWith("t1"), s"n=$n size=$size stride=$stride")
    }
  }

  test("packSequences: bins respect the budget given per-doc tokens under budget") {
    import graft.operators.Curation
    val docs = samples(Gen.choose(1L, 500L), 120).zipWithIndex
      .map { case (t, i) => (i.toLong, if (i % 2 == 0) "en" else "de", t) }
    val df = docs.toDF("doc_id", "lang", "n")
    val packed = Curation.packSequences(df, "doc_id", "lang", col("n"), budget = 1000L, nShards = 3)
    // every bin's token sum stays under budget + the largest member
    // (contiguous fill can overshoot by at most one document)
    val bad = packed.groupBy("lang", "shard", "bin")
      .agg(sum("n_tokens").as("s"), max("n_tokens").as("m"))
      .filter(col("s") >= lit(1000L) + col("m")).count()
    assert(bad == 0)
  }

  test("assignSplit partitions every id and respects cumulative thresholds for random fractions") {
    import graft.operators.Sampling
    val rnd = new scala.util.Random(3)
    val ids = Seq.fill(400)(rnd.nextLong().abs).distinct.toDF("id")
    for (trainFrac <- Seq(0.5, 0.7, 0.95)) {
      val rest = (1.0 - trainFrac) / 2
      val out = Sampling.assignSplit(ids, "id",
        Seq("a" -> trainFrac, "b" -> rest, "c" -> rest), seed = rnd.nextLong())
      // a partition: every row labeled, labels only from the declared set
      assert(out.filter(col("split").isNull).count() == 0)
      assert(out.count() == ids.count())
      val dist = out.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dist.keySet.subsetOf(Set("a", "b", "c")))
      // md5 buckets are uniform: the observed major fraction tracks the target
      val frac = dist.getOrElse("a", 0L).toDouble / ids.count()
      assert(math.abs(frac - trainFrac) < 0.12, s"train frac $frac vs $trainFrac")
    }
  }

  test("percentileCut keeps at least (1-p) of each stratum and tags every row") {
    import graft.operators.TrainingMix
    val rnd = new scala.util.Random(9)
    val rows = Seq.tabulate(300)(i => (i.toLong, if (i % 3 == 0) "x" else "y", rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "stratum", "score")
    val out = TrainingMix.percentileCut(df, "stratum", "score", 0.25)
    assert(out.count() == 300) // tag, not filter
    val kept = out.groupBy("stratum").agg(
      count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("k")).collect()
    kept.foreach { r =>
      val frac = r.getLong(2).toDouble / r.getLong(1)
      assert(frac >= 0.70, s"stratum ${r.getString(0)} kept only $frac") // >= 1-p minus tie slack
    }
  }

  test("paddingWaste fractions are in [0, 1) and sums are consistent") {
    import graft.operators.TrainingMix
    val rnd = new scala.util.Random(5)
    val toks = Seq.fill(500)((rnd.nextInt(500) + 1).toLong).toDF("tok")
    val out = TrainingMix.paddingWaste(toks, col("tok"), bucketSize = 64)
    val bad = out.filter(
      col("waste_frac") < 0 || col("waste_frac") >= 1 ||
        col("sum_tokens") > col("n_docs") * col("max_tokens") ||
        col("max_tokens") < col("bucket")).count()
    assert(bad == 0)
  }

  test("HLL union of per-source sketches estimates the global distinct within 5%") {
    val r = graft.operators.AnalyticsQueries.queries("q_hll_union")(spark, sfDir).head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("connectedComponents is idempotent: re-running on star edges is stable") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val cc1 = Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
    val starEdges = cc1.filter(col("id") =!= col("component"))
      .select(col("id").as("src"), col("component").as("dst"))
    val cc2 = Graph.connectedComponents(starEdges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val m1 = cc1.as[(Long, Long)].collect().toMap
    assert(cc2.forall { case (id, comp) => m1(id) == comp })
  }
}
