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
}
