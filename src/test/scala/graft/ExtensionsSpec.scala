package graft

import org.apache.spark.sql.functions._

import graft.operators.{Salt, VectorOps}

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("RewriteDotProduct turns the HOF dot shape into VecDot") {
    // apply the rule directly to the analyzed plan (the shared session
    // was built without extensions; rule injection is exercised here)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(10)
    val df = e.select(VectorOps.dotHof(col("embedding"), col("embedding")).as("d"))
    val rewritten = graft.plans.RewriteDotProduct(df.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[graft.plans.VecDot])))
    assert(df.count() == 10)
  }

  test("TopK.perKey equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
    val native = graft.operators.TopK.perKey(
      li, Seq("l_partkey"),
      struct(-col("l_quantity"), col("l_orderkey"), col("l_linenumber")), 2)
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    val ref = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    assert(native.count() == ref.count())
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
    // physical plan contains the custom operators
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK") && plan.contains("PartialTopK"))
  }

  test("RewriteThresholdedLevenshtein: banded form in the plan, identical results, pinned -1 semantics") {
    // pin Spark's documented threshold semantics the rewrite relies on:
    // <= threshold -> the distance, above it -> -1
    val sem = Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"))
      .toDF("a", "b")
      .selectExpr("levenshtein(a, b, 2) AS t2", "levenshtein(a, b) AS full")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(sem.toSeq == Seq((-1, 3), (1, 1), (0, 0)), sem.toSeq.toString)

    val names = spark.read.parquet(s"$sfDir/customer.parquet").limit(300)
      .select(col("c_custkey").as("id"), col("c_name").as("nm"))
    val pairs = names.as("x").crossJoin(names.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.nm").as("na"), col("y.nm").as("nb"))
    val filtered = pairs.filter(expr("levenshtein(na, nb)") <= 2)
    // the rule fired: optimized filter carries the 3-arg thresholded form
    val rewritten = graft.plans.RewriteThresholdedLevenshtein(filtered.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.exists {
      case org.apache.spark.sql.catalyst.expressions.Levenshtein(_, _, Some(_)) => true
      case _ => false
    }), rewritten.toString.take(2000))
    // identical results: rewritten predicate vs driver-side full-DP check
    val got = filtered.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs.selectExpr("id_a", "id_b", "levenshtein(na, nb) AS d")
      .collect().filter(_.getInt(2) <= 2).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("saltedEquiJoin equals the plain join") {
    val big = spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_orderkey", "l_partkey", "l_quantity")
    val small = spark.read.parquet(s"$sfDir/part.parquet").select("p_partkey", "p_size")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = big.join(small, "l_partkey")
    val salted = Salt.saltedEquiJoin(big, small, "l_partkey", n = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
