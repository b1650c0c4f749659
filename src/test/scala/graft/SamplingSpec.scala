package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("stratified sampling is deterministic and rate-respecting") {
    val rates = Map("en" -> 0.8, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)
    val s1 = Sampling.stratified(docs, "lang", "doc_id", rates, seed = 42L)
    val s2 = Sampling.stratified(docs, "lang", "doc_id", rates, seed = 42L)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val en = docs.filter(col("lang") === "en").count().toDouble
    val enKept = s1.filter(col("lang") === "en").count().toDouble
    assert(enKept / en > 0.6 && enKept / en < 0.95, s"en keep rate ${enKept / en}")
    // different seed -> different selection
    val s3 = Sampling.stratified(docs, "lang", "doc_id", rates, seed = 43L)
    assert(s3.exceptAll(s1).count() > 0)
  }

  test("assignSplit covers every row, roughly respects fractions, and is growth-stable") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 11L)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count().toDouble
    assert(counts.values.sum == total.toLong) // partition, not filter
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9)
    assert(counts.keySet == Set("train", "val", "test"))
    // growth stability: assignments on a subset equal the full run's
    val sub = Sampling.assignSplit(docs.filter(col("doc_id") < 100), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 11L)
      .select("doc_id", "split")
    val full = split.filter(col("doc_id") < 100).select("doc_id", "split")
    assert(sub.exceptAll(full).isEmpty && full.exceptAll(sub).isEmpty)
  }

  test("mixture tags sources and applies per-source rates") {
    val m = Sampling.mixture(
      Seq(("a", docs.filter(col("doc_id") % 2 === 0), 1.0), ("b", docs.filter(col("doc_id") % 2 =!= 0), 0.0)),
      "doc_id", seed = 1L)
    val bySource = m.groupBy("source_name").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.getOrElse("b", 0L) == 0L)
    assert(bySource("a") == docs.filter(col("doc_id") % 2 === 0).count())
  }

  test("neymanPlan: alloc tracks N·σ, zero-variance and singleton strata get nothing") {
    import spark.implicits._
    // A: bimodal {0,10}×4 (σ=5.773503); B: constant (σ=0); C: two wild
    // rows {0,100} (σ=70.710678); D: singleton (no estimable variance)
    val df = (Seq.fill(2)(("A", 0L)) ++ Seq.fill(2)(("A", 10L)) ++
      Seq.fill(4)(("B", 7L)) ++ Seq(("C", 0L), ("C", 100L), ("D", 3L)))
      .toDF("src", "v")
    val plan = Sampling.neymanPlan(df, "src", col("v"), budget = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(plan("A")._2 == 5.773503 && plan("C")._2 == 70.710678)
    assert(plan("B")._3 == 0L && plan("D")._3 == 0L, s"zero-variance strata must get 0: $plan")
    assert(plan("C")._3 > plan("A")._3, s"budget must chase N*sigma: $plan")
    // allocations: A share 23.094012/164.515368 -> 1, C -> 9
    assert(plan("A")._3 == 1L && plan("C")._3 == 9L, plan.toString)
  }

  test("neymanSample realizes the plan: keep-all strata whole, deterministic, rate-respecting") {
    // budget >= corpus: every stratum's alloc >= n_rows -> identity sample
    val all = Sampling.neymanSample(docs.select("doc_id", "source", "n_chars"),
      "source", "doc_id", col("n_chars"), budget = 10000000L, seed = 42L)
    assert(all.count() == docs.count())
    // tight budget: realized per-stratum counts are binomial around
    // alloc — assert determinism and that no stratum exceeds its size
    val s1 = Sampling.neymanSample(docs.select("doc_id", "source", "n_chars"),
      "source", "doc_id", col("n_chars"), budget = 300L, seed = 42L)
    val s2 = Sampling.neymanSample(docs.select("doc_id", "source", "n_chars"),
      "source", "doc_id", col("n_chars"), budget = 300L, seed = 42L)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    assert(s1.count() < docs.count() && s1.count() > 0)
  }

  test("rate >= 1.0 strata carry no hash predicate at all (keep-all is unconditional)") {
    // The strict `<` against 'ffffffff' would drop an id whose bucket
    // is exactly the max — a rate-1.0 branch must not filter. Assert at
    // the plan level: the single-source mixture at rate 1.0 plans no
    // Filter, and the stratified keep-expression contains no md5 for
    // the rate-1.0 stratum's branch.
    val m = Sampling.mixture(Seq(("a", docs.select("doc_id"), 1.0)), "doc_id", seed = 1L)
    val filters = m.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.isEmpty, m.queryExecution.optimizedPlan.toString)

    val s = Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 1.0), seed = 42L)
    val cond = s.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.sql
    }.mkString
    assert(!cond.toLowerCase.contains("md5"), cond)
    assert(s.count() == docs.filter(col("lang") === "en").count())
  }

  test("classBalance: every class downsampled to exactly the minority count") {
    import spark.implicits._
    val df = ((1 to 5).map(i => (i.toLong, "big")) ++ Seq((10L, "small"), (11L, "small")))
      .toDF("id", "cls")
    val out = Sampling.classBalance(df, "cls", "id")
      .collect().groupBy(_.getAs[String]("cls")).view.mapValues(_.length).toMap
    assert(out == Map("big" -> 2, "small" -> 2))
  }

  test("ppsSample: certainty rows always kept at pi = 1e6 ppm, E[n] in range") {
    import spark.implicits._
    // one whale holding half the weight among 1000 minnows
    val rows = (1L to 1000L).map(i => (i, 10L)) :+ (9999L, 10000L)
    val df = rows.toDF("id", "w")
    val out = Sampling.ppsSample(df, "id", col("w"), k = 50L, seed = 3L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pi_ppm")).toMap
    // whale: k*w = 500000 >= W = 20000 -> certainty row, pi capped at 1.0
    assert(out.contains(9999L) && out(9999L) == 1000000L)
    // minnow pi = 50*10*1e6 div 20000 = 25000 ppm exactly
    out.collect { case (id, ppm) if id != 9999L => ppm }.foreach(p => assert(p == 25000L))
    // E[minnows] = 25; a 1000-trial binomial stays well inside [5, 60]
    assert(out.size - 1 >= 5 && out.size - 1 <= 60, s"sampled ${out.size - 1} minnows")
    // determinism: same seed, same sample
    val again = Sampling.ppsSample(df, "id", col("w"), k = 50L, seed = 3L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == out.keySet)
  }

  test("prioritySample: exact k kept, estimates floor at tau, k >= n degenerates to identity") {
    import spark.implicits._
    val t = (1L to 500L).map(i => (i, (i % 97) + 1)).toDF("id", "w")
    val out = Sampling.prioritySample(t, "id", col("w"), k = 64, seed = 7L).collect()
    assert(out.length == 64)
    // every estimate >= its own weight (w_hat = max(w, tau))
    assert(out.forall(r => r.getAs[Double]("w_hat") >= r.getAs[Long]("w").toDouble))
    // the floor tau is shared: the minimum w_hat repeats across small-w keeps
    val tau = out.map(_.getAs[Double]("w_hat")).min
    assert(out.count(_.getAs[Double]("w_hat") == tau) > 1)
    // deterministic under re-run
    val again = Sampling.prioritySample(t, "id", col("w"), k = 64, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("w_hat")).toMap
    assert(out.map(r => r.getLong(0) -> r.getAs[Double]("w_hat")).toMap == again)
    // k >= n keeps everything at its own weight (tau undefined -> 0)
    val tiny = (1L to 10L).map(i => (i, i * 3)).toDF("id", "w")
    val all = Sampling.prioritySample(tiny, "id", col("w"), k = 64, seed = 7L).collect()
    assert(all.length == 10)
    assert(all.forall(r => r.getAs[Double]("w_hat") == r.getAs[Long]("w").toDouble))
  }
}
