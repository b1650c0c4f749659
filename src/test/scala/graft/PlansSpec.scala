package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{TextDedup, VectorOps}

/** The native codegen expressions must be bit-identical to the composed
  * HOF formulations they replace.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashSig equals the HOF minhash signature bit-for-bit") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .select(TextAnalysis.wordNgrams(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val diff = docs.select(
      TextDedup.minhashSignature(col("sh"), 64).as("fast"),
      TextDedup.minhashSignatureHof(col("sh"), 64).as("ref")
    ).filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("NgramShingles equals the HOF shingles on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val diff = docs.select(
      TextAnalysis.wordNgrams(col("text"), 3).as("fast"),
      TextAnalysis.wordNgramsHof(col("text"), 3).as("ref")
    ).filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("VecDot equals the HOF dot bit-for-bit on float embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .limit(500)
    val diff = pairs.select(
      VectorOps.dot(col("va"), col("vb")).as("fast"),
      VectorOps.dotHof(col("va"), col("vb")).as("ref")
    ).filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("SimHashBits equals the HOF simhash bits bit-for-bit") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val toks = docs.select(TextAnalysis.tokenize(col("text")).as("t"))
    val diff = toks.select(
      TextDedup.simhashBits(col("t")).as("fast"),
      TextDedup.simhashBitsHof(col("t")).as("ref")
    ).filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("native inverted index round-trips and matches HOF rebuild output") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val canon = docs.select(
      array_join(TextAnalysis.tokenize(col("text")), " ").as("canon"),
      TextAnalysis.rebuildInvertedIndex(TextAnalysis.buildInvertedIndex(col("text"))).as("nat"),
      TextAnalysis.rebuildInvertedIndexHof(TextAnalysis.buildInvertedIndexHof(col("text"))).as("hof")
    )
    assert(canon.filter(col("nat") =!= col("canon") || col("hof") =!= col("canon")).count() == 0)
  }

  test("VecDot interpreted eval path matches as well") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val v = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()(0).getDouble(0)
    assert(math.abs(v - 32.0) < 1e-12)
  }
}
