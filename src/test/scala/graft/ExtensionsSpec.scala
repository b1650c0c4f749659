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
