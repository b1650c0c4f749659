package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation separates two dense cliques joined by one bridge edge") {
    // Two triangles {a,b,c} and {x,y,z} plus bridge c–x. Connected
    // components would merge everything; LPA keeps two communities
    // because majority vote inside each triangle beats the single
    // bridge neighbor.
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"),
      ("c", "x")
    ).toDF("u", "v")
    val got = Graph.labelPropagation(edges, "u", "v", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.keySet == Set("a", "b", "c", "x", "y", "z"))
    assert(Set(got("a"), got("b"), got("c")).size == 1, s"left clique split: $got")
    assert(Set(got("x"), got("y"), got("z")).size == 1, s"right clique split: $got")
    assert(got("a") != got("x"), s"bridge merged the cliques: $got")
  }

  test("kCore: cascade peel keeps the dense nucleus, empties a path, converges on real data") {
    // K4 on {1,2,3,4} with a pendant chain 4–5–6. A plain degree>=2
    // filter keeps 5 (it has two neighbors); the 2-core must NOT —
    // peeling 6 drops 5 below 2, the cascade the operator exists for.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("u", "v")
    val core = Graph.kCore(edges, "u", "v", k = 2, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(1L, 2L, 3L, 4L), s"2-core wrong: $core")
    assert(core.values.forall(_ == 3L), s"induced degrees wrong: $core")
    // A pure path's 2-core is EMPTY: endpoint peeling cascades through.
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L)).toDF("u", "v")
    assert(Graph.kCore(path, "u", "v", k = 2, rounds = 6).isEmpty)
    // Redundant directed duplicates + self-loops don't inflate degrees.
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val tri = Graph.kCore(dup, "u", "v", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"dedup wrong: $tri")
    // Convergence on the benchmark-shaped graph: one extra round is a
    // no-op (peeling is monotone, so equal sets == fixpoint).
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_suppkey").cast("long").as("src"),
      (pmod(col("l_partkey"), lit(300)) + 1000000000L).as("dst"))
    val r4 = Graph.kCore(li, "src", "dst", k = 5, rounds = 4)
    val r5 = Graph.kCore(li, "src", "dst", k = 5, rounds = 5)
    assert(r4.exceptAll(r5).isEmpty && r5.exceptAll(r4).isEmpty)
  }

  test("kTruss: support peel keeps triangle cohesion, drops hubs and bridges k-core keeps") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) + a pendant triangle
    // {5,6,7} (support 1 each) bridged by 4–5 (support 0).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L), (4L, 5L)
    ).toDF("u", "v")
    // 3-truss (support >= 1): both triangles survive with their exact
    // supports, the bridge is peeled round 1 (zero triangles).
    val t3 = Graph.kTruss(edges, "u", "v", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L)), s"3-truss wrong: $t3")
    assert(Set((1L, 2L), (2L, 3L), (3L, 4L)).forall(t3(_) == 2L), s"K4 supports: $t3")
    assert(Set((5L, 6L), (6L, 7L)).forall(t3(_) == 1L), s"triangle supports: $t3")
    // 4-truss (support >= 2): only K4 survives; the pendant triangle's
    // edges peel, and K4's supports are UNCHANGED by their removal.
    val t4 = Graph.kTruss(edges, "u", "v", k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) &&
      t4.values.forall(_ == 2L), s"4-truss wrong: $t4")
    // The CASCADE: in the triangle strip {1,2,3},{2,3,4},{3,4,5} only
    // the two SHARED edges have support 2; peeling the support-1 rim
    // at k=4 destroys every triangle, which starves the shared edges
    // next round — the strip's 4-truss cascades to empty.
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L))
      .toDF("u", "v")
    assert(Graph.kTruss(strip, "u", "v", k = 4, rounds = 3).isEmpty,
      "strip 4-truss should cascade to empty")
    // Directed duplicates and self-loops don't inflate support.
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val d3 = Graph.kTruss(dup, "u", "v", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d3 == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L), s"dedup wrong: $d3")
  }

  test("labelPropagation is deterministic under ties (min label wins) and pairs converge") {
    // A path a–m–z: m hears {a, z} plus its self-vote {m}, all tied;
    // the tie must break to the smallest label every run.
    val edges = Seq(("a", "m"), ("m", "z")).toDF("u", "v")
    val r1 = Graph.labelPropagation(edges, "u", "v", iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r1("m") == "a", s"tie not broken to min label: $r1")
    val r2 = Graph.labelPropagation(edges, "u", "v", iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r1 == r2)
    // The self-vote kills the synchronous two-cycle: an isolated pair
    // must settle on ONE shared label, not swap forever.
    val pair = Seq(("p", "q")).toDF("u", "v")
    val rp = Graph.labelPropagation(pair, "u", "v", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rp("p") == "p" && rp("q") == "p", s"pair did not converge: $rp")
  }

  test("modularity: two disjoint cliques at the true partition score exactly 1/2") {
    // K4 + K4, no bridges: L_c = m/2 and d_c = m each, so
    // Q = 2*(1/2 - 1/4) = 1/2 as an exact integer ratio.
    val cliques = (for {
      base <- Seq(0L, 10L); a <- 0 to 3; b <- (a + 1) to 3
    } yield (base + a, base + b)).toDF("id_a", "id_b")
    val truth = Seq(0L, 1L, 2L, 3L).map(i => (i, 0L))
      .union(Seq(10L, 11L, 12L, 13L).map(i => (i, 1L))).toDF("id", "label")
    val q = Graph.modularity(cliques, "id_a", "id_b", truth).collect().head
    assert(q.getAs[Long]("m") == 12L)
    assert(q.getAs[Long]("sum_internal") == 12L)
    assert(q.getAs[Double]("modularity") == 0.5)
    // Degenerate one-community labeling scores exactly 0.
    val one = (0 to 13).map(i => (i.toLong, 7L)).toDF("id", "label")
    assert(Graph.modularity(cliques, "id_a", "id_b", one)
      .collect().head.getAs[Double]("modularity") == 0.0)
    // The label-prop partition on this graph recovers the truth, so
    // the pipeline composition scores 1/2 too.
    val lp = Graph.labelPropagation(cliques, "id_a", "id_b", iters = 3)
    assert(Graph.modularity(cliques, "id_a", "id_b", lp)
      .collect().head.getAs[Double]("modularity") == 0.5)
  }
}
