package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.sources.Tables
import graft.GraftSession

/** Dev profiler: phase timings for tfidfCosinePairs' candidate/verify
  * plan (round-13 shape: checkpoint-free pair aggregation + c_lo
  * bound-pruned refold tail — see TUNING.md round-13).
  */
object TfidfProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf1")
    val spark = GraftSession.local()
    val t = Tables(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    val docs = t.documents.select(col("doc_id"), col("text"))
    val tf = docs
      .select(col("doc_id").as("id"), explode(TextAnalysis.wordNgrams(col("text"), 3)).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    time("tf (checkpoint)")(tf.count())
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val dfAll = tf.groupBy("w").agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val wcum = Window.orderBy("df")
    val capRow = dfAll.groupBy("df").agg(count(lit(1)).as("nt"))
      .select(col("df"),
        sum(col("nt").cast("decimal(19,0)") * col("df").cast("decimal(19,0)") *
          col("df").cast("decimal(19,0)")).over(wcum).as("cum"))
      .crossJoin(broadcast(nDocs))
      .filter(col("cum") <= (lit(4600L) *
        floor(sqrt(col("nd").cast("double")) * sqrt(sqrt(col("nd").cast("double"))))
          .cast("long")).cast("decimal(38,0)"))
      .agg(greatest(coalesce(max("df"), lit(0L)), lit(2L)).as("cap"))
    val dfc = dfAll.crossJoin(broadcast(capRow)).filter(col("df") <= col("cap")).drop("cap")
    val wt = tf.join(broadcast(dfc), "w").crossJoin(broadcast(nDocs))
      .select(col("id"), col("w"),
        (col("tf") * (log((col("nd") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))).as("wt"))
      .localCheckpoint(true)
    time("wt (cap+checkpoint)")(wt.count())
    def sortedKeyNorms(postings: org.apache.spark.sql.DataFrame) = postings.groupBy("id")
      .agg(sort_array(collect_list(struct(col("w"), col("wt").as("t")))).as("arr"))
      .select(col("id"), graft.plans.SortedKeyDot(col("arr"), col("arr")).as("n2"))
    val norms = sortedKeyNorms(wt)
    time("norms")(norms.count())
    val post = wt.join(norms.hint("shuffle_hash"), "id")
    val pairAgg = post.as("x").join(post.as("y").hint("shuffle_hash"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        (col("x.wt") * col("y.wt")).as("p"),
        col("x.n2").as("na2"), col("y.n2").as("nb2"))
      .groupBy("id_a", "id_b").agg(
        count(lit(1)).as("k"), min("p").as("p1"), sum("p").as("sp"),
        min("na2").as("na2"), min("nb2").as("nb2"))
      .select(col("id_a"), col("id_b"), col("k"),
        round(when(col("k") === 1, col("p1")).otherwise(col("sp")) /
          (sqrt(col("na2")) * sqrt(col("nb2"))), 6).as("cosine"))
      .localCheckpoint(true)
    time("pairAgg (join+checkpoint)")(pairAgg.count())
    time("k>=3 tail size (unpruned)")(pairAgg.filter(col("k") >= 3).count())
    val topK = 50
    val cLo = pairAgg
      .select((col("cosine") -
        when(col("k") >= 3, lit(1e-6)).otherwise(lit(0.0))).as("lb"))
      .orderBy(col("lb").desc).limit(topK)
      .agg(coalesce(min("lb"), lit(-2.0)).as("c_lo"))
    val tailPairs = pairAgg.crossJoin(broadcast(cLo))
      .filter(col("k") >= 3 && col("cosine") + lit(1e-6) >= col("c_lo"))
      .select(col("id_a"), col("id_b"))
    time("tailPairs (c_lo pruned)")(tailPairs.count())
    time("full query")(graft.operators.TextRank.tfidfCosinePairs(docs, "doc_id", "text").count())
    time("full query again")(graft.operators.TextRank.tfidfCosinePairs(docs, "doc_id", "text").count())
    time("full query 3rd")(graft.operators.TextRank.tfidfCosinePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
