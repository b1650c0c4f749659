package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.TextDedup
import graft.sources.Tables
import graft.GraftSession

/** Dev profiler: stage-by-stage timings for the heavy operators. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val t = Tables(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    val docs = t.documents.select("doc_id", "text")
    val shingled = docs
      .select(col("doc_id").as("id"), TextAnalysis.wordNgrams(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)

    time("shingle-only")(shingled.count())
    time("shingle-again")(shingled.count())
    val sig = shingled.select(col("id"), TextDedup.minhashSignature(col("shingles"), 64).as("sig"))
    time("signatures")(sig.count())
    val banded = shingled.select(col("id"), explode(TextDedup.lshBands(TextDedup.minhashSignature(col("shingles"), 64), 16, 4)).as("b"))
    time("banded")(banded.count())
    val bandedS = banded.select(col("id"), col("b.band"), col("b.bh"))
    val cand = bandedS.as("x").join(bandedS.as("y"), Seq("band", "bh"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    time("candidates")(cand.count())
    time("full minhashNearDups")(TextDedup.minhashNearDups(docs, "doc_id", "text").count())
    spark.stop()
  }
}
