package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

class CountMinSpec extends SparkSpec {

  private lazy val toks = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(explode(split(lower(col("text")), " ")).as("term"))

  test("estimate never under-counts any key (one-sided error over the whole vocabulary)") {
    val sk = CountMin.sketch(toks, "term", depth = 4, width = 1024, seed = 7L)
    val est = CountMin.estimate(sk, toks.distinct(), "term", depth = 4, width = 1024, seed = 7L)
    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
    val under = est.join(exact, "term").filter(col("est") < col("exact_cnt")).count()
    assert(under == 0L, s"$under keys under-counted — violates the CMS guarantee")
  }

  test("sketch is mergeable: counter-wise sum over halves equals the whole-corpus sketch") {
    val (a, b) = (toks.filter(crc32(col("term")) % 2 === 0), toks.filter(crc32(col("term")) % 2 === 1))
    val merged = CountMin.sketch(a, "term", 4, 1024, 7L)
      .unionByName(CountMin.sketch(b, "term", 4, 1024, 7L))
      .groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))
    val whole = CountMin.sketch(toks, "term", 4, 1024, 7L)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("unseen keys estimate zero or only collision mass; top estimates find the true heavy hitters") {
    val sk = CountMin.sketch(toks, "term", depth = 4, width = 1024, seed = 7L)
    // a key absent from the corpus can only pick up collision mass,
    // bounded in expectation by n/width per depth; with min over 4
    // depths it must land far below the top exact counts
    val probe = spark.range(1).select(lit("__never_a_token__").as("term"))
    val phantom = CountMin.estimate(sk, probe, "term", 4, 1024, 7L)
      .head().getLong(1)
    val topExact = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(10)
      .collect().map(_.getLong(1))
    assert(phantom < topExact.min,
      s"phantom estimate $phantom not below top-10 exact counts ${topExact.min}")
    // the top-10 by estimate and top-10 by exact count agree as SETS
    // on a Zipf corpus (estimates only add small collision mass)
    val est = CountMin.estimate(sk, toks.distinct(), "term", 4, 1024, 7L)
    val topEst = est.orderBy(col("est").desc, col("term")).limit(10)
      .collect().map(_.getString(0)).toSet
    val topTrue = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(10)
      .collect().map(_.getString(0)).toSet
    assert((topEst intersect topTrue).size >= 8,
      s"heavy-hitter sets diverge: est=$topEst true=$topTrue")
  }
}
