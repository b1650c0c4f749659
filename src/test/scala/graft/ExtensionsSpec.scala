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
