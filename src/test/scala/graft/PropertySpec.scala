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
}
