package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Round-13 rewrite pins: the split-once projection restructures must
  * emit exactly the rows of the inline-HOF forms they replaced (the
  * inline forms re-evaluate `split` per lambda element — no CSE inside
  * higher-order-function lambdas — so the hot paths project the token
  * array once and reference it as an attribute).
  */
class OperatorRewriteSpec extends graft.SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("adjacentPairRows equals the inline-HOF bigram explode row-for-row") {
    // the pre-r13 formulation, verbatim: ws inlined into filter + lambda
    def ref(d: org.apache.spark.sql.DataFrame) = {
      val ws = split(lower(col("text")), " ")
      d.filter(size(ws) >= 2)
        .select(explode(transform(sequence(lit(1), size(ws) - 1, lit(1)),
          i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2")))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    }
    // synthetic edges the real corpus may not cover: single token (must
    // drop — sequence(1,0) throws rather than yield []), empty string,
    // double space (empty tokens are kept by the single-space split)
    val extra = Seq("solo", "", "a  b", "x y x y").toDF("text")
    for (d <- Seq(docs, extra)) {
      val got = TextRank.adjacentPairRows(d, "text").groupBy("w1", "w2").count()
      val want = ref(d).groupBy("w1", "w2").count()
      val mismatch = got.as("g").join(want.as("w"),
          col("g.w1") <=> col("w.w1") && col("g.w2") <=> col("w.w2"), "full_outer")
        .filter(!(col("g.count") <=> col("w.count")))
      assert(mismatch.count() == 0, mismatch.collect().take(5).mkString("; "))
    }
  }

  test("withProfileHits/predictFromHits/withLangPrediction equal the inline predictLang family") {
    val profiles = Seq("en", "de", "es", "fr").map(l => l -> TextAnalysis.langProfiles(l))
    // NULL text: tokenize -> NULL, hits -> NULL, argmax falls through to default
    val d = docs.select(col("text"))
      .unionByName(Seq(Option.empty[String]).toDF("text"))
      .unionByName(Seq("zzz qqq", "der die das the the the").toDF("text"))
    val hitsEq = TextAnalysis.withProfileHits(d, col("text"), profiles)
      .withColumn("ref_en", TextAnalysis.stopwordHits(col("text"), TextAnalysis.langProfiles("en")))
      .withColumn("ref_fr", TextAnalysis.stopwordHits(col("text"), TextAnalysis.langProfiles("fr")))
      .filter(!(col("hits_en") <=> col("ref_en")) || !(col("hits_fr") <=> col("ref_fr")))
    assert(hitsEq.count() == 0)
    val predEq = TextAnalysis.withLangPrediction(d, col("text"), profiles, "und", "pred")
      .withColumn("ref", TextAnalysis.predictLang(col("text"), profiles, "und"))
      .filter(!(col("pred") <=> col("ref")))
    assert(predEq.count() == 0, predEq.collect().take(5).mkString("; "))
    // predictFromHits over withProfileHits matches too (the composed form)
    val composed = TextAnalysis.withProfileHits(d, col("text"), profiles)
      .select(col("text"), TextAnalysis.predictFromHits(profiles, "und").as("pred"))
      .withColumn("ref", TextAnalysis.predictLang(col("text"), profiles, "und"))
      .filter(!(col("pred") <=> col("ref")))
    assert(composed.count() == 0)
  }
}
