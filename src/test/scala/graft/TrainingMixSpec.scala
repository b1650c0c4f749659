package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, TrainingMix}

class TrainingMixSpec extends SparkSpec {
  import spark.implicits._

  test("sourceKlDivergence: identical distributions score 0, disjoint vocabularies score log2(mix)") {
    val df = Seq(
      ("a", "w w z z"), ("a", "w z"),      // a: w:3 z:3
      ("b", "w z w z w z")                 // b: w:3 z:3 — same distribution as a
    ).toDF("source", "text")
    val same = graft.operators.TrainingMix.sourceKlDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(same("a") == 0.0 && same("b") == 0.0)
    val dis = Seq(("a", "x x"), ("b", "y y")).toDF("source", "text")
    val got = graft.operators.TrainingMix.sourceKlDivergence(dis, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // each source's word has p_s = 1, p_c = 1/2 → KL = log2(2) = 1 bit
    assert(got("a") == 1.0 && got("b") == 1.0)
  }

  test("percentileCut computes per-stratum interpolated p25 and keeps ties at the floor") {
    // en scores 10,20,30,40 → p25 = 17.5; de scores 5,5,5 → p25 = 5 (ties keep)
    val df = Seq(
      ("a", "en", 10L), ("b", "en", 20L), ("c", "en", 30L), ("d", "en", 40L),
      ("e", "de", 5L), ("f", "de", 5L), ("g", "de", 5L)
    ).toDF("doc_id", "lang", "score")
    val out = TrainingMix.percentileCut(df, "lang", "score", 0.25)
      .select("doc_id", "threshold", "keep").as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("a") == (17.5, false))
    assert(out("b") == (17.5, true))
    assert(out("e") == (5.0, true) && out("g") == (5.0, true))
  }

  test("mixPlan turns weights and a budget into per-source epochs") {
    val df = Seq.tabulate(10)(i => (i.toLong, if (i < 6) "web" else "books", 100L))
      .toDF("id", "source", "tok")
    val out = TrainingMix.mixPlan(df, "source", col("tok"),
        weights = Map("web" -> 0.75), defaultWeight = 0.25, budget = 1200L)
      .select("source", "n_docs", "n_tokens", "target_tokens", "epochs")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // web: 600 tokens, target 900 → 1.5 epochs; books: 400, target 300 → 0.75
    assert(out("web") == (6L, 600L, 900L, 1.5))
    assert(out("books") == (4L, 400L, 300L, 0.75))
  }

  test("temperatureMix flattens shares: sqrt weighting, hand-computed 9:1 case") {
    // two sources, 900 vs 100 tokens: natural 0.9/0.1; sqrt gives
    // 30/(30+10)=0.75 and 10/40=0.25
    val df = Seq.tabulate(10)(i => (i.toLong, if (i < 5) "web" else "books", if (i < 5) 180L else 20L))
      .toDF("id", "source", "tok")
    val out = TrainingMix.temperatureMix(df, "source", col("tok"), budget = 1000L)
      .select("source", "n_tokens", "natural_share", "tempered_share", "target_tokens", "epochs")
      .as[(String, Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(out("web") == (900L, 0.9, 0.75, 750L, 0.8333))
    assert(out("books") == (100L, 0.1, 0.25, 250L, 2.5))
    // tempering always moves shares toward uniform
    assert(out("web")._3 < out("web")._2 && out("books")._3 > out("books")._2)
  }

  test("paddingWaste reports per-bucket padding against the bucket max") {
    val df = Seq(10L, 20L, 20L, 70L).toDF("tok")
    val out = TrainingMix.paddingWaste(df, col("tok"), bucketSize = 64)
      .select("bucket", "n_docs", "max_tokens", "waste_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // bucket 0: docs 10,20,20 padded to 20 → waste 1 - 50/60
    assert(out(0L) == (0L, 3L, 20L, 0.1667))
    assert(out(64L) == (64L, 1L, 70L, 0.0))
  }

  test("electCanonical picks highest score, ties to smallest id, across a skewed cluster") {
    val edges = ((1L to 999L).map(i => (i, i + 1)) :+ (2000L, 2001L)).toDF("src", "dst")
    val cc = Graph.connectedComponents(edges, "src", "dst")
    val docs = ((1L to 1000L) ++ Seq(2000L, 2001L)).map { id =>
      (id, if (id == 500L || id == 700L) 99L else 1L)
    }.toDF("doc_id", "score")
    val out = TrainingMix.electCanonical(cc, docs, "doc_id", col("score"))
      .select("component", "canonical_id", "n_docs")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 500L, 1000L)) // max score 99 twice; min id 500 wins
    assert(out(2000L) == (2000L, 2000L, 2L))
  }

  test("electCanonical respects fractional score differences (no long truncation)") {
    // Scores 0.2 < 0.7 < 0.9 would all truncate to 0 as longs and the
    // election would degenerate to min-id (doc 1); the real winner is 3.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val cc = Graph.connectedComponents(edges, "src", "dst")
    val docs = Seq((1L, 0.2), (2L, 0.7), (3L, 0.9)).toDF("doc_id", "score")
    val out = TrainingMix.electCanonical(cc, docs, "doc_id", col("score"))
      .select("component", "canonical_id", "total_score")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1)
    assert(out.head._2 == 3L)
    assert(math.abs(out.head._3 - 1.8) < 1e-9)
  }

  test("sourceJsDivergence: a source matching the corpus mixture scores 0") {
    // two sources with IDENTICAL unigram distributions -> each equals
    // the corpus mixture -> JSD exactly 0 for both
    val docs = Seq(
      ("a", "x y z x"), ("b", "x y z x"),
      ("a", "x y"), ("b", "x y")
    ).toDF("source", "text")
    val r = TrainingMix.sourceJsDivergence(docs, "source", "text")
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Double]("jsd_bits")).toMap
    assert(r("a") == 0.0 && r("b") == 0.0)
    // a source with vocabulary the corpus mixture dilutes scores > 0
    // and stays within the [0, 1]-bit JSD bound
    val skew = Seq(("a", "x x x x"), ("b", "y y y y")).toDF("source", "text")
    val r2 = TrainingMix.sourceJsDivergence(skew, "source", "text")
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Double]("jsd_bits")).toMap
    assert(r2("a") > 0.0 && r2("a") <= 1.0)
    assert(r2("a") == r2("b")) // symmetric construction
  }

  test("budgetCut keeps best-score buckets whole until the budget is crossed") {
    // scores 30/20/10 with 50 tokens each, budget 80: bucket 30 (0
    // before), bucket 20 (50 before) kept; bucket 10 (100 before) cut.
    val df = Seq(("s", 30L, 50L), ("s", 20L, 50L), ("s", 10L, 50L))
      .toDF("source", "score", "toks")
    val r = TrainingMix.budgetCut(df, "source", col("score"), col("toks"), 80L)
      .collect().head
    assert(r.getAs[Long]("n_buckets_kept") == 2L)
    assert(r.getAs[Long]("tokens_kept") == 100L) // boundary bucket whole
    assert(r.getAs[Long]("cutoff_score") == 20L)
    assert(r.getAs[Long]("utilization_ppm") == 1250000L) // overshoot visible
  }

  test("curriculumInterleave round-robins buckets across strata") {
    // two strata, difficulties 1..4 -> 4 one-value buckets each;
    // schedule: (b0,a)=0,(b0,b)=1,(b1,a)=2,...
    val df = (1 to 4).flatMap(d => Seq(("a", d.toLong), ("b", d.toLong)))
      .toDF("lang", "d")
    val rows = TrainingMix.curriculumInterleave(df, "lang", col("d"), nBuckets = 4)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("schedule_pos")).toMap
    assert(rows(("a", 0L)) == 0L && rows(("b", 0L)) == 1L)
    assert(rows(("a", 1L)) == 2L && rows(("b", 3L)) == 7L)
  }

  test("sourceHellinger: a source matching the mixture scores 0, disjoint support near 1") {
    import org.apache.spark.sql.functions.col
    // Two identically-distributed sources: each source's P equals the
    // corpus Q exactly -> BC = 1, H = 0.
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val h0 = TrainingMix.sourceHellinger(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hellinger")).toMap
    assert(h0("a") == 0.0 && h0("b") == 0.0)
    // Nearly-disjoint support: the mixture still CONTAINS the source
    // (Q ≥ P/2 for two equal sources), so H is ceilinged at
    // sqrt(1 - sqrt(1/2)) ≈ 0.541 — the score must press against it.
    val skew = Seq(("a", (Seq.fill(100)("aa") :+ "sh").mkString(" ")),
      ("b", (Seq.fill(100)("bb") :+ "sh").mkString(" "))).toDF("source", "text")
    val h1 = TrainingMix.sourceHellinger(skew, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hellinger")).toMap
    assert(h1("a") > 0.5 && h1("a") < 0.5412 && h1("a") == h1("b"), h1.toString)
  }

  test("dunningKeyness: an exclusive term is flagged over with positive G2; a proportional one scores 0") {
    import org.apache.spark.sql.functions.col
    // 'loan' only in a; 'base' appears in exact proportion to source sizes.
    val docs = Seq(
      ("a", (Seq.fill(60)("loan") ++ Seq.fill(40)("base")).mkString(" ")),
      ("b", Seq.fill(40)("base").mkString(" "))).toDF("source", "text")
    // Corpus floor: max(50, n/10000) = 50, so both terms clear it.
    val k = TrainingMix.dunningKeyness(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // Hand value: 2·60·ln(60/42.857) = 40.38 (b = 0 contributes 0).
    val loan = k(("a", "loan"))
    assert(loan.getAs[Boolean]("over") && math.abs(loan.getAs[Double]("g2") - 40.3767) < 1e-3)
    // base: 40 of 100 in a, 40 of 40 in b -> NOT proportional; check the
    // truly proportional case instead on equal-size sources.
    val prop = Seq(("a", Seq.fill(50)("w").mkString(" ")),
      ("b", Seq.fill(50)("w").mkString(" "))).toDF("source", "text")
    TrainingMix.dunningKeyness(prop, "source", "text").collect()
      .foreach(r => assert(r.getAs[Double]("g2") == 0.0, r.toString))
  }

  test("burrowsDelta: stylistic twins score (near) zero, the odd source out scores higher") {
    // a and b share a distribution; c leans on different function words.
    val mk = (w1: Int, w2: Int, w3: Int) =>
      (Seq.fill(w1)("alpha") ++ Seq.fill(w2)("beta") ++ Seq.fill(w3)("gamma")).mkString(" ")
    val docs = Seq(("a", mk(30, 20, 10)), ("b", mk(30, 20, 10)), ("c", mk(5, 10, 45)))
      .toDF("source", "text")
    val d = TrainingMix.burrowsDelta(docs, "source", "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("delta")).toMap
    assert(d(("a", "b")) == 0.0)
    assert(d(("a", "c")) > 1.0 && d(("a", "c")) == d(("b", "c")))
  }
}
