package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataOps, Graph, Linkage, Stats, TimeSeries}

/** Library-level invariants for the classical-statistics layer: each
  * test pins a closed-form answer on handcrafted data (the DuckDB
  * oracle proves engine parity separately; this proves the MATH).
  */
class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("olsFit recovers an exact line and r2 = 1") {
    // y = 3x + 7 exactly.
    val df = (1 to 20).map(i => ("g", i.toLong, 3L * i + 7)).toDF("g", "x", "y")
    val r = Stats.olsFit(df, "g", col("x"), col("y")).collect().head
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 7.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("pearson is +1 / -1 on perfectly correlated data") {
    val df = (1 to 10).map(i => ("up", i.toLong, 2L * i))
      .union((1 to 10).map(i => ("down", i.toLong, -5L * i + 100)))
      .toDF("g", "x", "y")
    val m = Stats.pearson(df, "g", col("x"), col("y")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pearson_r")).toMap
    assert(m("up") == 1.0 && m("down") == -1.0)
  }

  test("spearman is rank-based: monotone nonlinear data scores 1") {
    // y = x^3: nonlinear but strictly monotone -> rho = 1, while
    // pearson < 1 distinguishes the implementations.
    val df = (1 to 15).map(i => ("g", i.toLong, i.toLong * i * i)).toDF("g", "x", "y")
    val rho = Stats.spearman(df, "g", col("x"), col("y"))
      .collect().head.getAs[Double]("spearman_rho")
    assert(rho == 1.0)
    val r = Stats.pearson(df, "g", col("x"), col("y"))
      .collect().head.getAs[Double]("pearson_r")
    assert(r < 1.0)
  }

  test("mannWhitneyU matches the hand-computed U on a tiny sample") {
    // treatment {1,2}, control {3,4,5}: every control beats every
    // treatment -> U1 = 0; with ties none, z < 0.
    val df = Seq((true, 1.0), (true, 2.0), (false, 3.0), (false, 4.0), (false, 5.0))
      .toDF("t", "v")
    val r = Stats.mannWhitneyU(df, col("t"), col("v")).collect().head
    assert(r.getAs[Long]("n1") == 2 && r.getAs[Long]("n2") == 3)
    assert(r.getAs[Double]("u_stat") == 0.0)
    assert(r.getAs[Double]("z_score") < 0)
  }

  test("twoProportionZ flags the deviant variant") {
    val rows = (1 to 100).map(i => ("a", i <= 90)) ++ (1 to 100).map(i => ("b", i <= 10))
    val r = Stats.twoProportionZ(rows.toDF("v", "c"), "v", col("c")).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("z_score")).toMap
    assert(r("a") > 5 && r("b") < -5)
  }

  test("cusumChangePoint finds a planted level shift") {
    // 50 points at 10, then 50 at 20: CUSUM argmax lands on the shift.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 100).map { i =>
      ("s", new java.sql.Timestamp(ts0.getTime + i * 1000L), i.toLong,
        if (i <= 50) 10L else 20L)
    }
    val r = Stats.cusumChangePoint(rows.toDF("g", "ts", "id", "x"),
      "g", col("ts"), col("x"), col("id")).collect().head
    assert(r.getAs[Int]("cp_index") == 50, s"cp at ${r.getAs[Int]("cp_index")}")
  }

  test("cusumChangePoint (GlobalRank form) is row-identical to the window formulation; |dev| ties break to the smallest index") {
    // The scale rebuild (range-partitioned prefix sums + argmax agg,
    // no per-series window) must reproduce the window formulation
    // EXACTLY — including the (abs(dev) DESC, i ASC) tie-break the
    // oracle encodes. Groups engineered for both regimes:
    //   - "const": every dev = 0, all 400 rows tied -> cp_index 1;
    //   - "mirror": one spike makes |dev| tie at i=1 and i=2 -> 1;
    //   - "noisy": 4000 deterministic pseudo-random rows spanning many
    //     range partitions.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(i: Int) = new java.sql.Timestamp(ts0.getTime + i * 1000L)
    val rows =
      (1 to 400).map(i => ("const", t(i), i.toLong, 7L)) ++
        Seq(("mirror", t(1), 1L, 0L), ("mirror", t(2), 2L, 10L), ("mirror", t(3), 3L, 0L)) ++
        (1 to 4000).map(i => ("noisy", t(i), i.toLong, (i * 2654435761L % 997L) - 498L))
    val df = rows.toDF("g", "ts", "id", "x")
    val got = Stats.cusumChangePoint(df, "g", col("ts"), col("x"), col("id"))

    // independent window formulation (the pre-rebuild plan, inline)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("ts"), col("id"))
    val all = Window.partitionBy(col("g"))
    val expected = df
      .select(col("g"), col("ts"),
        row_number().over(w).as("i"),
        (sum(col("x")).over(w) * count(lit(1)).over(all) -
          row_number().over(w) * sum(col("x")).over(all)).as("dev"),
        count(lit(1)).over(all).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(abs(col("dev")).desc, col("i"))))
      .filter(col("rn") === 1)
      .select(col("g"), col("n"), col("i").as("cp_index"), col("ts").as("cp_at"),
        round(abs(col("dev")).cast("double") / col("n").cast("double"), 4).as("cusum_stat"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      s"got=${got.collect().toSeq} expected=${expected.collect().toSeq}")
    val byG = got.collect().map(r => r.getString(0) -> r.getAs[Int]("cp_index")).toMap
    assert(byG("const") == 1 && byG("mirror") == 1, s"tie-break: $byG")
    // bucket-width invariance: 60 s buckets put the 4000-row series
    // across ~67 cells (vs 2 hourly) — offsets must stitch identically
    val fine = Stats.cusumChangePoint(df, "g", col("ts"), col("x"), col("id"),
      bucketSeconds = 60L)
    assert(fine.exceptAll(expected).isEmpty && expected.exceptAll(fine).isEmpty,
      "bucketSeconds must not change the result")
  }

  test("autocorrelation rejects a non-positive bucketSeconds") {
    // 0 would floor-divide to null buckets (one cell per series — the
    // parallelism cap the bucketed rewrite exists to kill); negative
    // would invert bucket order and mis-stitch the lag carry.
    val df = Seq(("s", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1L))
      .toDF("g", "ts", "id", "x")
    for (bad <- Seq(0L, -3600L))
      intercept[IllegalArgumentException] {
        Stats.autocorrelation(df, "g", col("ts"), col("x"), col("id"),
          maxLag = 2, bucketSeconds = bad)
      }
  }

  test("autocorrelation of an alternating series is -1 at lag 1, +1 at lag 2") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 40).map { i =>
      ("s", new java.sql.Timestamp(ts0.getTime + i * 1000L), i.toLong,
        if (i % 2 == 0) 1L else -1L)
    }
    val m = Stats.autocorrelation(rows.toDF("g", "ts", "id", "x"),
      "g", col("ts"), col("x"), col("id"), maxLag = 2).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    assert(m(1) < -0.9 && m(2) > 0.9, s"acf $m")
  }

  test("autocorrelation (bucketed form) is row-identical to the window formulation across sparse cell boundaries") {
    // The scale rebuild (per-cell lag windows + carried tail arrays)
    // must reproduce the global-window lag EXACTLY, including lags
    // that reach across bucket boundaries and across MULTIPLE sparse
    // buckets. Groups engineered for the stitch paths:
    //   - "dense": 5000 rows at 1 s spacing -> ~2 hourly cells, every
    //     boundary row's lag crosses one cell;
    //   - "sparse": one row per 50 minutes -> with 60 s buckets every
    //     cell holds ONE row, so a lag-3 reads three cells back;
    //   - "start": 2 rows only, lags mostly null at series start.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(ms: Long) = new java.sql.Timestamp(ts0.getTime + ms)
    val rows =
      (1 to 5000).map(i => ("dense", t(i * 1000L), i.toLong, (i * 2654435761L % 991L) - 495L)) ++
        (1 to 40).map(i => ("sparse", t(i * 50L * 60L * 1000L), i.toLong, (i * 7919L % 101L) - 50L)) ++
        (1 to 2).map(i => ("start", t(i * 1000L), i.toLong, i.toLong))
    val df = rows.toDF("g", "ts", "id", "x")
    val maxLag = 3

    // independent window formulation (the pre-rebuild plan, inline)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("ts"), col("id"))
    val all = Window.partitionBy(col("g"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    val centered = df.select(Seq(
      col("g"),
      (col("x") * count(lit(1)).over(all) - sum(col("x")).over(all)).as("d")) ++
      (1 to maxLag).map(k =>
        (lag(col("x"), k).over(w) * count(lit(1)).over(all) - sum(col("x")).over(all))
          .as(s"dl$k")): _*)
    val dd = centered.groupBy(col("g")).agg(
      sum(dec(col("d")) * dec(col("d"))).cast("double").as("den"),
      (1 to maxLag).map(k =>
        sum(dec(col(s"dl$k")) * dec(col("d"))).cast("double").as(s"num$k")): _*)
    val expected = (1 to maxLag).map { k =>
      dd.select(col("g"), lit(k).as("lag"), round(col(s"num$k") / col("den"), 4).as("acf"))
    }.reduce(_ unionByName _)

    for (bs <- Seq(3600L, 60L)) {
      val got = Stats.autocorrelation(df, "g", col("ts"), col("x"), col("id"),
        maxLag, bucketSeconds = bs)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"bucketSeconds=$bs: got=${got.collect().toSeq} expected=${expected.collect().toSeq}")
    }
  }

  test("gini: equal values -> 0; extreme concentration -> near 1") {
    val eq = (1 to 50).map(i => ("eq", 100L, i.toLong))
    val conc = (1 to 49).map(i => ("conc", 0L, i.toLong)) :+ (("conc", 10000L, 50L))
    val m = Stats.gini((eq ++ conc).toDF("g", "x", "id"), "g", col("x"), col("id"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(m("eq") == 0.0)
    assert(m("conc") > 0.9)
  }

  test("benfordDigits covers digits with exact probabilities") {
    val df = (1 to 999).map(i => Tuple1(i.toDouble)).toDF("m")
    val rows = Stats.benfordDigits(df, col("m")).collect()
    assert(rows.map(_.getAs[Int]("digit")).sorted.toSeq == (1 to 9))
    val p1 = rows.find(_.getAs[Int]("digit") == 1).get.getAs[Double]("benford_p")
    assert(math.abs(p1 - math.log10(2.0)) < 1e-6)
    // 1..999 is uniform per leading digit block: digit 1 has 111 obs
    assert(rows.find(_.getAs[Int]("digit") == 1).get.getAs[Long]("n_obs") == 111)
  }

  test("hillTail estimates alpha ~ 1 for a pure Zipf tail") {
    // x_i = N/i is an exact Pareto(alpha=1) tail.
    val df = (1 to 200).map(i => ("g", (100000L / i), i.toLong)).toDF("g", "x", "id")
    val a = Stats.hillTail(df, "g", col("x"), col("id"), k = 20)
      .collect().head.getAs[Double]("tail_alpha")
    assert(a > 0.8 && a < 1.2, s"alpha $a")
  }

  test("localClustering: a triangle with a pendant vertex") {
    // K3 on {1,2,3} plus edge 3-4: coef(1)=coef(2)=1, coef(3)=1/3,
    // vertex 4 has deg 1 -> excluded.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val m = Graph.localClustering(e, "s", "d").collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Double]("coef")).toMap
    assert(m(1L) == 1.0 && m(2L) == 1.0)
    assert(math.abs(m(3L) - 1.0 / 3) < 1e-9)
    assert(!m.contains(4L))
  }

  test("cdcApply keeps the latest op and drops deleted keys") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(i: Int) = new java.sql.Timestamp(ts0.getTime + i * 1000L)
    val log = Seq(
      (1L, t(1), 1L, "set", 10.0), (1L, t(2), 2L, "set", 20.0),
      (2L, t(1), 3L, "set", 5.0), (2L, t(3), 4L, "del", 0.0),
      (3L, t(1), 5L, "del", 0.0), (3L, t(2), 6L, "set", 7.0)
    ).toDF("k", "ts", "event_id", "op", "v")
    val out = TimeSeries.cdcApply(log, "k", Seq(col("ts"), col("event_id")),
      col("op") === "del").collect()
    val m = out.map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(m == Map(1L -> 20.0, 3L -> 7.0)) // key 2's latest op is a delete
    assert(out.find(_.getAs[Long]("k") == 1L).get.getAs[Long]("n_changes") == 2)
  }

  test("attribution: last-touch goes to the latest channel, linear splits in ppm") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(i: Int) = new java.sql.Timestamp(ts0.getTime + i * 60000L)
    val ev = Seq(
      (1L, t(0), 1L, "ad"), (1L, t(1), 2L, "email"), (1L, t(2), 3L, "buy"),
      (2L, t(0), 4L, "email"), (2L, t(1), 5L, "buy")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeSeries.attribution(ev, "user_id", "ts", "event_type",
      convType = "buy", touchTypes = Seq("ad", "email"), lookbackMs = 3600000L)
      .collect().map(r => (r.getAs[String]("channel"),
        r.getAs[Long]("last_touch_convs"), r.getAs[Long]("linear_credit_ppm"))).toList
    val m = out.map(x => x._1 -> x).toMap
    assert(m("email")._2 == 2)              // latest touch for both conversions
    assert(m("ad")._2 == 0)
    assert(m("ad")._3 == 500000)            // half credit of conversion 1
    assert(m("email")._3 == 1500000)        // half + full
  }

  test("welchT: identical samples give t = 0; known shift has the right sign") {
    val same = ((1 to 10).map(i => (true, i.toLong)) ++ (1 to 10).map(i => (false, i.toLong)))
      .toDF("a", "x")
    val r0 = Stats.welchT(same, col("a"), col("x")).collect().head
    assert(r0.getAs[Double]("t_stat") == 0.0)
    assert(r0.getAs[Double]("mean_a") == r0.getAs[Double]("mean_b"))
    // A shifted +100 above B: t strongly positive, means exact
    val shift = ((1 to 10).map(i => (true, 100L + i)) ++ (1 to 10).map(i => (false, i.toLong)))
      .toDF("a", "x")
    val r1 = Stats.welchT(shift, col("a"), col("x")).collect().head
    assert(r1.getAs[Double]("t_stat") > 10.0)
    assert(r1.getAs[Double]("mean_a") - r1.getAs[Double]("mean_b") == 100.0)
    assert(r1.getAs[Double]("df_welch") > 1.0)
  }

  test("peakConcurrency: overlap peaks at 2, disjoint stays at 1, day rollup") {
    // [0,10] and [5,15] overlap on [5,10]; [20,25] is alone. All day 0.
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 25L)).toDF("s", "e")
    val r = TimeSeries.peakConcurrency(iv, col("s"), col("e")).collect().head
    assert(r.getAs[Long]("day") == 0L)
    assert(r.getAs[Long]("peak_concurrent") == 2L)
    assert(r.getAs[Long]("peak_ms") == 5L)   // first instant both are open
    assert(r.getAs[Long]("n_starts") == 3L)
    // end+1 semantics: touching intervals [0,5] and [5,9] DO overlap at 5
    val touch = Seq((0L, 5L), (5L, 9L)).toDF("s", "e")
    val r2 = TimeSeries.peakConcurrency(touch, col("s"), col("e")).collect().head
    assert(r2.getAs[Long]("peak_concurrent") == 2L)
  }

  test("formatProfile masks digits/upper/lower and collapses runs") {
    val df = Seq("Customer#000123", "Customer#000456", "x-9").toDF("v")
    val out = DataOps.formatProfile(df, "v").collect()
      .map(r => r.getAs[String]("mask") ->
        (r.getAs[String]("mask_collapsed"), r.getAs[Long]("n"), r.getAs[String]("example_min")))
      .toMap
    assert(out("Aaaaaaaa#999999") == (("Aa#9", 2L, "Customer#000123")))
    assert(out("a-9") == (("a-9", 1L, "x-9")))
  }

  test("linkPrediction: path predicts the closing edge, triangle predicts nothing") {
    // path 1-2-3: (1,3) share neighbor 2 and are not adjacent
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val p = Graph.linkPrediction(path, "s", "d", minCommon = 1L).collect()
    assert(p.length == 1)
    assert(p.head.getAs[Long]("pa") == 1L && p.head.getAs[Long]("pb") == 3L)
    assert(p.head.getAs[Long]("cn") == 1L)
    assert(p.head.getAs[Long]("pref_attach") == 1L) // deg(1)=deg(3)=1
    // triangle: every 2-hop pair is already an edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(Graph.linkPrediction(tri, "s", "d", minCommon = 1L).count() == 0L)
  }

  test("anovaOneWay: identical groups give F = 0; separated groups give F > 0") {
    val same = (Seq("a", "b").flatMap(g => Seq(1L, 2L, 3L).map(x => (g, x)))).toDF("g", "x")
    val r0 = Stats.anovaOneWay(same, "g", col("x")).collect().head
    assert(r0.getAs[Long]("k") == 2L && r0.getAs[Long]("n") == 6L)
    assert(r0.getAs[Double]("f_stat") == 0.0 && r0.getAs[Double]("eta_sq") == 0.0)
    val apart = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(101L, 102L, 103L).map(("b", _)))
      .toDF("g", "x")
    val r1 = Stats.anovaOneWay(apart, "g", col("x")).collect().head
    assert(r1.getAs[Double]("f_stat") > 1000.0)  // means 100 apart, sd 1
    assert(r1.getAs[Double]("eta_sq") > 0.99)
  }

  test("laplaceNoisedCounts: deterministic, bounded noise, no epsilon label") {
    val df = (1 to 50).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val rel = Stats.laplaceNoisedCounts(df, "g", epsilon = 0.5, seed = 23L)
    // the deterministic mechanism must NOT claim an epsilon on output
    assert(rel.columns.toSeq == Seq("g", "released_count"))
    val a = rel.collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("released_count")).toMap
    val b = Stats.laplaceNoisedCounts(df, "g", epsilon = 0.5, seed = 23L).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("released_count")).toMap
    assert(a == b)                       // hash-derived noise re-computes exactly
    // |noise| <= (1/eps)*ln(2^24) ~ 33.3 for a 24-bit uniform
    val counts = Map("g0" -> 16.0, "g1" -> 17.0, "g2" -> 17.0)
    counts.foreach { case (g, n) => assert(math.abs(a(g) - n) <= 34.0, s"$g: ${a(g)}") }
  }

  test("cliffsDelta: complete separation gives ±1, identical samples give 0") {
    val above = ((1 to 5).map(i => (true, 100L + i)) ++ (1 to 5).map(i => (false, i.toLong)))
      .toDF("grp", "v")
    assert(Stats.cliffsDelta(above, col("grp"), col("v"))
      .collect().head.getAs[Double]("cliffs_delta") == 1.0)
    val same = ((1 to 5).map(i => (true, i.toLong)) ++ (1 to 5).map(i => (false, i.toLong)))
      .toDF("grp", "v")
    assert(Stats.cliffsDelta(same, col("grp"), col("v"))
      .collect().head.getAs[Double]("cliffs_delta") == 0.0)
  }

  test("cuped: balanced covariate leaves the effect, theta recovers the slope exactly") {
    // y = 2x + 5*treated, x identical across arms -> theta = 2,
    // raw and adjusted effects both exactly 5
    val rows = (1 to 10).map(i => (true, 2L * i + 5, i.toLong)) ++
      (1 to 10).map(i => (false, 2L * i, i.toLong))
    val r = Stats.cuped(rows.toDF("a", "y", "x"), col("a"), col("y"), col("x"))
      .collect().head
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("raw_effect") == 5.0)
    assert(r.getAs[Double]("cuped_effect") == 5.0)
    assert(r.getAs[Double]("var_ratio") == 0.1592) // 1 - rho^2, hand-computed
  }

  test("targetEncodeLoo: own label excluded, singleton category is NULL") {
    val df = Seq(("A", 10L), ("A", 20L), ("A", 30L), ("B", 99L)).toDF("cat", "y")
    val out = Stats.targetEncodeLoo(df, "cat", col("y")).collect()
    val a = out.filter(_.getAs[String]("cat") == "A")
      .map(r => r.getAs[Long]("y") -> r.getAs[Double]("loo_enc")).toMap
    assert(a == Map(10L -> 25.0, 20L -> 20.0, 30L -> 15.0))
    assert(out.find(_.getAs[String]("cat") == "B").get.isNullAt(2))
  }

  test("kruskalWallis: identical groups give H = 0; separated groups match the closed form") {
    val same = Seq("a", "b").flatMap(g => Seq(1L, 2L, 3L).map((g, _))).toDF("g", "x")
    val r0 = Stats.kruskalWallis(same, "g", col("x")).collect().head
    assert(r0.getAs[Double]("h_stat") == 0.0)
    val apart = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(101L, 102L, 103L).map(("b", _)))
      .toDF("g", "x")
    val r1 = Stats.kruskalWallis(apart, "g", col("x")).collect().head
    // R = {6, 15}: H = 12/(6*7) * (36/3 + 225/3) - 3*7 = 87*2/7 - 21
    assert(math.abs(r1.getAs[Double]("h_stat") - (87.0 * 2 / 7 - 21.0)) < 1e-3)
  }

  test("mcnemar: discordant counts drive chi2; no discordants -> NULL") {
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(2)((false, false))
    val r = Stats.mcnemar(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    assert(r.getAs[Long]("n_a_only") == 3L && r.getAs[Long]("n_b_only") == 1L)
    assert(r.getAs[Double]("chi2") == 1.0) // (3-1)^2 / 4
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Stats.mcnemar(agree, col("a"), col("b")).collect().head.isNullAt(4))
  }

  test("fellegiSunter: smoothed m/u rates give the closed-form log2 weights") {
    // matches: 3 of 4 agree -> m = 3.5/5 = .7; non: 1 of 4 -> u = 1.5/5 = .3
    val pairs = (Seq((1L, 101L, true, true), (2L, 102L, true, true), (3L, 103L, true, true),
      (4L, 104L, false, true)) ++
      Seq((5L, 205L, true, false), (6L, 206L, false, false),
        (7L, 207L, false, false), (8L, 208L, false, false)))
      .toDF("id_a", "id_b", "ag_f", "truth")
    val r = Linkage.fellegiSunter(pairs, col("truth"), Seq("ag_f"))
      .collect().map(x => x.getAs[Long]("id_a") -> x.getAs[Double]("fs_weight")).toMap
    val agreeW = math.log(0.7 / 0.3) / math.log(2.0)
    assert(math.abs(r(1L) - agreeW) < 1e-3)      // agree -> +log2(m/u)
    assert(math.abs(r(4L) + agreeW) < 1e-3)      // disagree -> log2(.3/.7) = -agreeW
  }

  test("rankBiasedOverlap: identical rankings give 1 - p^k, disjoint heads give 0") {
    val items = (1 to 40).map(i => (i.toLong, i.toLong, i.toLong)).toDF("id", "x", "y")
    val same = Stats.rankBiasedOverlap(items, "id", col("x"), col("y"), col("id"),
      depth = 20, p = 0.9).collect().head
    assert(same.getAs[Double]("rbo") ==
      math.round((1.0 - math.pow(0.9, 20)) * 10000) / 10000.0)
    val rev = (1 to 40).map(i => (i.toLong, i.toLong, -i.toLong)).toDF("id", "x", "y")
    val disj = Stats.rankBiasedOverlap(rev, "id", col("x"), col("y"), col("id"),
      depth = 20, p = 0.9).collect().head
    assert(disj.getAs[Double]("rbo") == 0.0)
  }

  test("diffInDiff: constructed parallel-trends violation of exactly 10") {
    // treated: 10 -> 30, control: 10 -> 20  =>  DiD = 10
    val rows = Seq.fill(5)((true, false, 10L)) ++ Seq.fill(5)((true, true, 30L)) ++
      Seq.fill(5)((false, false, 10L)) ++ Seq.fill(5)((false, true, 20L))
    val df = rows.toDF("tr", "po", "x")
    val r = Stats.diffInDiff(df, col("tr"), col("po"), col("x")).collect().head
    assert(r.getAs[Double]("mean_treated_post") == 30.0)
    assert(r.getAs[Double]("did") == 10.0)
  }

  test("ipsPolicyValue: deterministic policy reduces to the action's mean; ESS = its support") {
    val df = Seq(("a", 10L), ("a", 20L), ("b", 0L), ("b", 40L)).toDF("act", "r")
    val r = Stats.ipsPolicyValue(df, "act", col("r"), Seq("a" -> 1.0)).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("ips_value") == 15.0)   // mean reward of action a
    assert(r.getAs[Double]("snips_value") == 15.0) // weights sum to n exactly
    assert(r.getAs[Double]("ess") == 2.0)          // only a's rows carry weight
  }

  test("sortedNeighborhood: adjacent near-names pair, distant names do not") {
    val recs = Seq((1L, "anna"), (2L, "annae"), (3L, "bob"), (4L, "zed")).toDF("id", "nm")
    val out = Linkage.sortedNeighborhood(recs, "id", "nm", window = 3, minJw = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(out.toSet == Set((1L, 2L)))
  }

  test("medianCi: 1..100 gives median 50.5 with order-statistic bounds 40/61") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "x")
    val r = Stats.medianCi(df, "g", col("x")).collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("median") == 50.5)
    // k_lo = floor((100 - 1.96*10)/2) = 40, k_hi = 100 - 40 + 1 = 61
    assert(r.getAs[Long]("ci_lo") == 40L && r.getAs[Long]("ci_hi") == 61L)
  }

  test("weightedMedian: heavy value pulls the median; uniform weights reduce to lower median") {
    val heavy = Seq(("h", 1L, 1L), ("h", 2L, 1L), ("h", 3L, 10L)).toDF("g", "x", "w")
    val r1 = Stats.weightedMedian(heavy, "g", col("x"), col("w")).collect().head
    assert(r1.getAs[Long]("total_w") == 12L && r1.getAs[Long]("weighted_median") == 3L)
    val unif = (1 to 4).map(i => ("u", i.toLong, 1L)).toDF("g", "x", "w")
    val r2 = Stats.weightedMedian(unif, "g", col("x"), col("w")).collect().head
    assert(r2.getAs[Long]("weighted_median") == 2L)
  }

  test("bellmanFord: cheap 2-hop path beats expensive direct edge; hop cap respected") {
    // 1 -10- 2, 1 -1- 3, 3 -1- 2  => dist(2) = 2 via 3, not 10 direct;
    // chain 2-4-5-6-7: node 6 is 4 edges via the expensive direct
    // (10+3=13) but 5 edges via the cheap route — at rounds = 4 the
    // ≤k-edges semantic returns 13; node 7 needs 5 edges, so absent
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L), (6L, 7L, 1L)
    ).toDF("s", "d", "w")
    val seed = Seq(1L).toDF("id")
    val r = Graph.bellmanFord(edges, "s", "d", "w", seed, rounds = 4)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("dist_w")).toMap
    assert(r(1L) == 0L && r(3L) == 1L && r(2L) == 2L)
    assert(r(4L) == 3L && r(5L) == 4L && r(6L) == 13L)
    assert(!r.contains(7L)) // needs 5 edges, rounds = 4
  }

  test("kAnonymityAudit: small classes flagged, large classes pass") {
    val df = ((1 to 10).map(i => ("us", "auto")) ++ Seq(("fr", "auto"), ("fr", "ship")))
      .toDF("country", "segment")
    val r = Stats.kAnonymityAudit(df, Seq("country", "segment"), k = 5L)
      .collect().map(x => (x.getAs[String]("country"), x.getAs[String]("segment")) ->
        (x.getAs[Long]("class_size"), x.getAs[Boolean]("suppressed"))).toMap
    assert(r(("us", "auto")) == (10L, false))
    assert(r(("fr", "auto")) == (1L, true))
    assert(r(("fr", "ship")) == (1L, true))
  }

  test("fanoBurstiness: constant bins give 0, bursty bins exceed 1, single bin dropped") {
    val rows =
      (1 to 4).flatMap(d => Seq.fill(3)(("steady", d))) ++      // 3 per bin -> var 0
      (Seq.fill(10)(("bursty", 1)) ++ Seq(("bursty", 2))) ++    // 10 + 1 -> fano >> 1
      Seq.fill(7)(("single", 1))                                // 1 bin -> filtered out
    val r = Stats.fanoBurstiness(rows.toDF("g", "d"), "g", col("d"))
      .collect().map(x => x.getAs[String]("g") -> x.getAs[Double]("fano")).toMap
    assert(r("steady") == 0.0)
    // mean 5.5, var ((100+1)-2*30.25)/1 = 40.5, fano = 40.5/5.5
    assert(math.abs(r("bursty") - 40.5 / 5.5) < 1e-4)
    assert(!r.contains("single"))
  }

  test("assortativity: a star graph is perfectly disassortative (r = -1)") {
    // K1,4: every edge joins the deg-4 hub to a deg-1 leaf
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("s", "d")
    val r = Graph.assortativity(star, "s", "d").collect().head
    assert(r.getAs[Long]("n_directed_edges") == 8L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("sprtLedger: overwhelming evidence crosses the Wald reject bound") {
    import graft.operators.Stats
    // p0=0.1 vs p1=0.9: five conversions in five trials on day 1 give
    // llr = 5·ln(9) ≈ 11 >> ln((1-0.2)/0.05) = ln(16) ≈ 2.77.
    val df = (1 to 5).map(_ => ("a", 1L, true)).toDF("v", "d", "c")
    val r = Stats.sprtLedger(df, "v", col("d"), col("c"),
      p0 = 0.1, p1 = 0.9, alpha = 0.05, beta = 0.2).collect().head
    assert(r.getAs[Long]("cum_n") == 5L && r.getAs[Long]("cum_k") == 5L)
    assert(r.getAs[Double]("llr") == 5.0 * math.log(0.9 / 0.1))
    assert(r.getAs[String]("decision") == "reject_h0")
    // all misses instead: llr = 5·ln(0.1/0.9) ≈ -11 -> accept_h0
    val df2 = (1 to 5).map(_ => ("a", 1L, false)).toDF("v", "d", "c")
    val r2 = Stats.sprtLedger(df2, "v", col("d"), col("c"),
      p0 = 0.1, p1 = 0.9, alpha = 0.05, beta = 0.2).collect().head
    assert(r2.getAs[String]("decision") == "accept_h0")
  }

  test("attributionDecay: a one-day-older touch earns exactly half the credit") {
    import graft.operators.TimeSeries
    import java.sql.Timestamp
    val t0 = 1700000000L
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val rows = Seq(
      (1L, 10L, "purchase", ts(t0)),
      (2L, 10L, "click", ts(t0 - 3600)),           // age 0 days -> w = 2^30
      (3L, 10L, "view", ts(t0 - 86400 - 3600)))    // age 1 day  -> w = 2^29
      .toDF("event_id", "user_id", "event_type", "ts")
    val m = TimeSeries.attributionDecay(rows, "user_id", "ts", "event_type",
        "purchase", Seq("click", "view"), lookbackMs = 172800000L, capDays = 30)
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Long]("decay_credit_ppm")).toMap
    assert(m("click") == 666666L) // (1e6·2^30) div (3·2^29)
    assert(m("view") == 333333L)
  }

  test("fdProfile: a held dependency reports zero violations, a broken one counts keys") {
    import graft.operators.DataOps
    val df = Seq((1L, 10L, 100L), (1L, 10L, 200L), (2L, 20L, 100L))
      .toDF("k", "dep_ok", "dep_bad")
    val m = DataOps.fdProfile(df, Seq(("k", "dep_ok", "ok"), ("k", "dep_bad", "bad")))
      .collect().map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_violating"), r.getAs[Long]("violation_ppm"))).toMap
    assert(m("ok") == ((0L, 0L)))
    assert(m("bad") == ((1L, 500000L))) // key 1 maps to {100,200}
  }

  test("runsTest: alternating sequence scores positive z, clustered negative") {
    import graft.operators.Stats
    // 24 values alternating far above/below the global mean -> 24
    // runs (max possible); clustered 12+12 -> 2 runs.
    val alt = (0 until 24).map(i => ("alt", i.toLong, if (i % 2 == 0) 100L else 0L))
    val clus = (0 until 24).map(i => ("clus", i.toLong, if (i < 12) 100L else 0L))
    val df = (alt ++ clus).toDF("k", "o", "v")
    val m = Stats.runsTest(df, "k", Seq(col("o"), lit(0)), col("v"), minN = 10L)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("runs"), r.getAs[Double]("z_runs"))).toMap
    assert(m("alt")._1 == 24L && m("alt")._2 > 3)
    assert(m("clus")._1 == 2L && m("clus")._2 < -3)
  }

  test("funnelWindowed: a stage outside the gap window breaks the chain") {
    import graft.operators.TimeSeries
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val rows = Seq(
      // user 1: view -> click 30min later -> purchase 30min after that (all in gap)
      (1L, "view", ts(1000)), (1L, "click", ts(1000 + 1800)),
      (1L, "purchase", ts(1000 + 3600)),
      // user 2: click arrives 2h after the view -> chain breaks at click
      (2L, "view", ts(1000)), (2L, "click", ts(1000 + 7200)),
      (2L, "purchase", ts(1000 + 7300)))
      .toDF("user_id", "event_type", "ts")
    val r = TimeSeries.funnelWindowed(rows, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), maxGapSeconds = 3600L).collect().head
    assert(r.getAs[Long]("n_keys") == 2L)
    assert(r.getAs[Long]("n_view") == 2L)
    assert(r.getAs[Long]("n_click") == 1L)
    assert(r.getAs[Long]("n_purchase") == 1L)
  }

  test("somersD with a binary outcome equals 2*AUC - 1 (the scoring Gini)") {
    // Deterministic score/label pairs with ties on both axes.
    val rows = (1 to 200).map { i =>
      ("g", (i % 17).toLong, if ((i * 7) % 10 < 4 == (i % 17 >= 9)) 1L else 0L)
    }
    val df = rows.toDF("g", "score", "y")
    val d = Stats.somersD(df, "g", col("y"), col("score"))
      .collect().head.getAs[Double]("somers_d")
    val auc = Stats.aucRoc(df, col("y") === 1, col("score"))
      .collect().head.getAs[Double]("auc")
    assert(math.abs(d - (2 * auc - 1)) < 2e-6, s"somers_d=$d auc=$auc")
    // Perfect separation -> D = 1 exactly.
    val perfect = (1 to 50).map(i => ("g", i.toLong, if (i > 25) 1L else 0L))
      .toDF("g", "score", "y")
    assert(Stats.somersD(perfect, "g", col("y"), col("score"))
      .collect().head.getAs[Double]("somers_d") == 1.0)
  }

  test("ljungBox: white-ish noise stays small, an AR(1) series explodes") {
    // Genuine MINSTD (Lehmer) noise vs a strongly autocorrelated
    // random walk of the same length. (A linear residue sequence
    // i·c mod p is a SAWTOOTH — lag-correlated — not noise.)
    var s0 = 12345L
    val noise = (1 to 300).map { i =>
      s0 = s0 * 48271L % 2147483647L; ("n", i.toLong, s0 % 1000L)
    }
    var s1 = 98765L
    var acc = 0L
    val walk = (1 to 300).map { i =>
      s1 = s1 * 48271L % 2147483647L; acc += s1 % 21L - 10L; ("w", i.toLong, acc)
    }
    val df = (noise ++ walk).toDF("g", "t", "v")
    val m = Stats.ljungBox(df, "g", col("t"), col("v"), col("v"), maxLag = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("q_lb")).toMap
    // chi2(4) 99th percentile is 13.28: noise must sit below any alarm
    // threshold while the walk is unambiguous.
    assert(m("n") < 13.0, s"noise Q=${m("n")}")
    assert(m("w") > 100.0, s"walk Q=${m("w")}")
  }

  test("theilU: an exactly 7-periodic series scores U = 0") {
    val df = (0 until 140).map(i => ("g", i.toLong, ((i % 7) * 100 + 50).toLong))
      .toDF("g", "day", "v")
    val r = Stats.theilU(df, "g", col("day"), col("v")).collect().head
    assert(r.getAs[Double]("sse_seasonal") == 0.0)
    assert(r.getAs[Double]("theil_u") == 0.0)
    // Days where day-1 or day-7 is missing never score.
    assert(r.getAs[Long]("n_days") == 133L)
  }

  test("hhi: monopoly scores 1, k equal actors score 1/k with effective_n = k") {
    val df = (Seq.fill(40)(("mono", "only")) ++
      (1 to 40).map(i => ("even", s"u${i % 8}"))).toDF("g", "actor")
    val m = Stats.hhi(df, "g", "actor").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("mono").getAs[Double]("hhi") == 1.0)
    assert(m("even").getAs[Double]("hhi") == 0.125)
    assert(m("even").getAs[Double]("effective_n") == 8.0)
  }

  test("lorenzDeciles: equal values give the diagonal; decile 10 closes at share 1") {
    val df = (1 to 100).map(i => ("g", 7L, i.toLong)).toDF("g", "v", "id")
    val r = Stats.lorenzDeciles(df, "g", col("v"), col("id"))
      .collect().map(x => x.getInt(1) -> x.getAs[Double]("cum_share")).toMap
    (1 to 10).foreach(d => assert(r(d) == d / 10.0, s"decile $d -> ${r(d)}"))
    // Skewed values: the curve must be convex (below the diagonal).
    val skew = (1 to 100).map(i => ("g", (i.toLong * i * i), i.toLong)).toDF("g", "v", "id")
    val s9 = Stats.lorenzDeciles(skew, "g", col("v"), col("id"))
      .collect().map(x => x.getInt(1) -> x.getAs[Double]("cum_share")).toMap
    assert(s9(9) < 0.9 && s9(10) == 1.0)
  }

  test("fleissKappa: unanimous panels score 1; a constant rater against a 50/50 split lands near 0") {
    // 3 raters, all agreeing on every item -> kappa = 1 exactly.
    val perfect = (1 to 60).flatMap(i => Seq.fill(3)((i.toLong, if (i % 2 == 0) "a" else "b")))
      .toDF("item", "cat")
    assert(Stats.fleissKappa(perfect, "item", "cat", 3)
      .collect().head.getAs[Double]("fleiss_kappa") == 1.0)
    // Two raters split every item, third always says "a": heavy
    // disagreement -> kappa well below chance-corrected agreement.
    val noisy = (1 to 60).flatMap(i =>
      Seq((i.toLong, "a"), (i.toLong, if (i % 2 == 0) "a" else "b"), (i.toLong, "b")))
      .toDF("item", "cat")
    val k = Stats.fleissKappa(noisy, "item", "cat", 3)
      .collect().head.getAs[Double]("fleiss_kappa")
    assert(k < 0.2, s"kappa=$k")
    // Incomplete items (wrong rating count) are excluded.
    val withPartial = perfect.union(Seq((999L, "a")).toDF("item", "cat"))
    assert(Stats.fleissKappa(withPartial, "item", "cat", 3)
      .collect().head.getAs[Long]("n_items") == 60L)
  }

  test("atkinson: equal values score 0, concentration scores high, zeros excluded") {
    val eq = (1 to 50).map(_ => ("g", 100L)).toDF("g", "v")
    assert(Stats.atkinson(eq, "g", col("v")).collect().head.getAs[Double]("atkinson") == 0.0)
    val skew = ((1 to 49).map(_ => ("g", 1L)) :+ (("g", 100000L))).toDF("g", "v")
    val r = Stats.atkinson(skew, "g", col("v")).collect().head
    assert(r.getAs[Double]("atkinson") > 0.8)
    val withZero = (eq.collect().map(x => (x.getString(0), x.getLong(1))).toSeq :+ (("g", 0L)))
      .toDF("g", "v")
    val z = Stats.atkinson(withZero, "g", col("v")).collect().head
    assert(z.getAs[Long]("n") == 50L && z.getAs[Long]("n_excluded") == 1L)
  }

  test("kdeProfile: densities are non-negative and integrate to ~1 over the grid") {
    val df = (1 to 2000).map(i => ("g", ((i * 7919) % 1000).toLong)).toDF("g", "v")
    val prof = Stats.kdeProfile(df, "g", col("v"), lo = 0L, hi = 1000L,
      bins = 64, bandwidth = 100L, gridSteps = 20).collect()
    assert(prof.forall(_.getAs[Double]("density") >= 0.0))
    // Riemann sum over the grid (step = 50) should approximate 1 —
    // loose bound, KDE mass leaks at the boundaries.
    val mass = prof.map(_.getAs[Double]("density")).sum * 50.0
    assert(mass > 0.7 && mass < 1.2, s"mass=$mass")
  }

  test("mahalanobisScreen finds the planted covariance-breaking point") {
    // Tight line y = 10x + noise-free, one point far OFF the line but
    // inside both marginal ranges (a univariate z-score would miss it).
    val rows = (1 to 100).map(i => ("g", i.toLong, 10L * i, i.toLong)) :+
      (("g", 20L, 800L, 999L))
    val df = rows.toDF("g", "x", "y", "id")
    val r = Stats.mahalanobisScreen(df, "g", col("x"), col("y"), col("id"))
      .collect().head
    assert(r.getAs[Long]("outlier_id") == 999L)
    assert(r.getAs[Long]("n") == 101L)
  }

  test("youdenJ: perfect separation finds the boundary threshold with J = 1") {
    val df = (1 to 100).map(i => (i.toLong, i > 60)).toDF("v", "y")
    val r = Stats.youdenJ(df, col("y"), col("v")).collect().head
    assert(r.getAs[Long]("threshold") == 61L)
    assert(r.getAs[Double]("youden_j") == 1.0)
    assert(r.getAs[Long]("tp") == 40L && r.getAs[Long]("fp") == 0L)
  }

  test("isotonicCalibration: output is monotone and pools the planted violator pair") {
    // Bin rates 0.1, 0.5, 0.3, 0.9 (bins 0..3 via conf midpoints):
    // PAVA pools bins 1-2 to (5+3)/(10+10) = 0.4.
    def bin(b: Int, pos: Int, n: Int) =
      (1 to n).map(i => (b * 0.1 + 0.05, i <= pos))
    val df = (bin(0, 1, 10) ++ bin(1, 5, 10) ++ bin(2, 3, 10) ++ bin(3, 9, 10))
      .toDF("c", "y")
    val iso = Stats.isotonicCalibration(df, col("c"), col("y"), bins = 10)
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("iso_rate")).toMap
    val ordered = iso.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted, s"not monotone: $ordered")
    assert(iso.values.toSeq.count(_ == 0.4) == 2, iso.toString)
    assert(ordered.head == 0.1 && ordered.last == 0.9)
  }

  test("cochranQ: identical treatments score 0; one dominant treatment scores high") {
    val same = (1 to 40).flatMap(u => Seq("a", "b", "c").map(t => (u.toLong, t, u % 2 == 0)))
      .toDF("u", "t", "hit")
    assert(Stats.cochranQ(same, "u", "t", col("hit"))
      .collect().head.getAs[Double]("q_cochran") == 0.0)
    val skew = (1 to 40).flatMap(u => Seq(("a", true), ("b", false), ("c", false))
      .map { case (t, h) => (u.toLong, t, h) }).toDF("u", "t", "hit")
    val q = Stats.cochranQ(skew, "u", "t", col("hit"))
      .collect().head.getAs[Double]("q_cochran")
    assert(q == 80.0, s"q=$q") // k=3: Q = 2*(3*1600-1600)/(3*40-40) = 80
  }

  test("smdBalance: a shifted treated arm scores the hand-computed SMD") {
    // control x = 0/2 alternating (var 40/39... sample var), treated = control + 10
    val ctrl = (1 to 40).map(i => ("s", false, (i % 2) * 2L))
    val trt = (1 to 40).map(i => ("s", true, (i % 2) * 2L + 10L))
    val r = Stats.smdBalance((ctrl ++ trt).toDF("s", "t", "x"), "s", col("t"), col("x"))
      .collect().head
    // identical variances v = (40*1 - 40*40/40... Sxx=20*4=80; sx=40
    // v = (80 - 40*40/40)/39 = 40/39; smd = 10/sqrt(40/39)
    assert(math.abs(r.getAs[Double]("smd") - 10.0 / math.sqrt(40.0 / 39.0)) < 1e-12)
  }

  test("iccOneWay: between-subject-only variance gives ICC 1; complete blocks enforced") {
    // each subject repeats its own constant k=3 times -> MSW = 0, ICC = 1
    val df = (1 to 30).flatMap(s => Seq.fill(3)((s.toLong, s.toLong * 10)))
      .union(Seq((999L, 5L))) // incomplete subject: dropped
      .toDF("s", "v")
    val r = Stats.iccOneWay(df, "s", col("v")).collect().head
    assert(r.getAs[Long]("n_subj") == 30L)
    assert(r.getAs[Double]("msw") == 0.0 && r.getAs[Double]("icc") == 1.0)
  }

  test("pageTrend: blocks ranked exactly in the hypothesized order maximize L") {
    // v strictly increasing in the item order within every block.
    val items = Seq("a", "b", "c", "d")
    val df = (1 to 25).flatMap(b => items.zipWithIndex.map { case (it, j) =>
      (it, b.toLong, (j + 1).toLong * 100 + b) })
      .toDF("item", "blk", "v")
    val r = Stats.pageTrend(df, "item", "blk", col("v"), items).collect().head
    // max L = N * sum j*j = 25 * (1+4+9+16) = 750
    assert(r.getAs[Double]("l_stat") == 750.0)
    assert(r.getAs[Double]("z_l") > 8.0)
  }

  test("blandAltman: a constant offset is pure bias with zero-width limits") {
    val df = (1 to 50).map(i => (i.toLong + 7, i.toLong)).toDF("a", "b")
    val r = Stats.blandAltman(df, col("a"), col("b")).collect().head
    assert(r.getAs[Double]("mean_diff") == 7.0)
    assert(r.getAs[Double]("sd_diff") == 0.0)
    assert(r.getAs[Double]("loa_lo") == 7.0 && r.getAs[Double]("loa_hi") == 7.0)
  }

  test("theilIndex: equal values score 0 within; equal-mean groups score 0 between") {
    val df = (1 to 40).map(i => (if (i % 2 == 0) "a" else "b", 100L)).toDF("g", "v")
    val rows = Stats.theilIndex(df, "g", col("v")).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("t_within") == 0.0)
      assert(r.getAs[Double]("t_between_term") == 0.0)
    }
    // concentrating one group's mass moves its within-term up
    val skew = ((1 to 19).map(_ => ("a", 1L)) :+ (("a", 10000L)))
      .union((1 to 20).map(_ => ("b", 100L))).toDF("g", "v")
    val m = Stats.theilIndex(skew, "g", col("v")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("t_within")).toMap
    assert(m("a") > 1.0 && m("b") == 0.0)
  }

  test("oaxacaTwofold: a gap fully mediated by x is fully explained") {
    // y = 100x exactly in both arms; arms differ only in their x mix.
    val a = (1 to 30).map(i => (true, (i % 3 + 3).toLong))   // x in 3..5
    val b = (1 to 30).map(i => (false, (i % 3 + 1).toLong))  // x in 1..3
    val df = (a ++ b).map { case (t, x) => (t, x, x * 100) }.toDF("t", "x", "y")
    val r = Stats.oaxacaTwofold(df, col("t"), col("x"), col("y")).collect().head
    assert(r.getAs[Double]("beta_pooled") == 100.0)
    assert(r.getAs[Double]("gap") == 200.0)
    assert(r.getAs[Double]("explained") == 200.0)
    assert(r.getAs[Double]("unexplained") == 0.0)
  }

  test("giniStump: a perfectly separable feature splits pure with gain = parent impurity") {
    val df = (1 to 100).map(i => (i.toLong, i >= 50)).toDF("v", "y")
    val r = Stats.giniStump(df, col("y"), col("v")).collect().head
    assert(r.getAs[Long]("threshold") == 50L)
    assert(r.getAs[Double]("child_impurity") == 0.0)
    assert(r.getAs[Double]("gain") == r.getAs[Double]("gini_parent"))
    assert(r.getAs[Long]("n_left") == 49L && r.getAs[Long]("n_right") == 51L)
  }

  test("brierDecomposition: Murphy identity holds and a perfect forecaster scores 0") {
    // Confidence equal to the bin's empirical rate -> REL 0 within
    // binning error; identity rel - res + unc = brier_binned is exact.
    val df = (1 to 400).map { i =>
      val p = (i % 10) / 10.0 + 0.05
      (p, (i * 13) % 100 < math.round(p * 100))
    }.toDF("c", "y")
    val r = DataOps.brierDecomposition(df, col("c"), col("y"), bins = 10)
      .collect().head
    val rel = r.getAs[Double]("rel"); val res = r.getAs[Double]("res")
    val unc = r.getAs[Double]("unc"); val bb = r.getAs[Double]("brier_binned")
    assert(math.abs(rel - res + unc - bb) < 1e-5)
    assert(rel < 0.01, s"well-calibrated forecast scored rel=$rel")
    // An always-right hard forecaster: brier 0, resolution = uncertainty.
    val hard = (1 to 100).map(i => (if (i % 4 == 0) 0.999 else 0.001, i % 4 == 0))
      .toDF("c", "y")
    val h = DataOps.brierDecomposition(hard, col("c"), col("y"), bins = 10)
      .collect().head
    assert(h.getAs[Double]("brier") < 1e-5)
    assert(math.abs(h.getAs[Double]("res") - h.getAs[Double]("unc")) < 1e-5)
  }
}
