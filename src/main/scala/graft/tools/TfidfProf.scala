package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.sources.Tables
import graft.GraftSession

/** Dev profiler: phase timings for tfidfCosinePairs' candidate/verify
  * plan (round-10 restructure).
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
    def sortedFold(term: org.apache.spark.sql.Column) =
      aggregate(sort_array(collect_list(struct(col("w"), term.as("t")))),
        lit(0.0), (a, x) => a + x.getField("t"))
    val norms = wt.groupBy("id").agg(sortedFold(col("wt") * col("wt")).as("n2"))
    time("norms")(norms.count())
    val post = wt.join(norms.hint("shuffle_hash"), "id")
    val pp = post.as("x").join(post.as("y").hint("shuffle_hash"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("x.w").as("w"),
        (col("x.wt") * col("y.wt")).as("p"),
        col("x.n2").as("na2"), col("y.n2").as("nb2"))
      .localCheckpoint(true)
    time("pp (join+checkpoint)")(pp.count())
    val pairAgg = pp.select("id_a", "id_b", "p", "na2", "nb2")
      .groupBy("id_a", "id_b").agg(
        count(lit(1)).as("k"), min("p").as("p1"), sum("p").as("sp"),
        min("na2").as("na2"), min("nb2").as("nb2"))
      .localCheckpoint(true)
    time("pairAgg (checkpoint)")(pairAgg.count())
    val smallK = pairAgg.filter(col("k") <= 2)
      .select(col("id_a"), col("id_b"),
        when(col("k") === 1, col("p1")).otherwise(col("sp")).as("dot"),
        col("na2"), col("nb2"))
    val tailIds = pairAgg.filter(col("k") >= 3).select(col("id_a"), col("id_b"))
    time("tailIds")(tailIds.count())
    def mkTail(ids: org.apache.spark.sql.DataFrame) =
      pp.join(ids, Seq("id_a", "id_b"), "left_semi")
        .groupBy("id_a", "id_b")
        .agg(sortedFold(col("p")).as("dot"), min("na2").as("na2"), min("nb2").as("nb2"))
    time("tail shuffle_hash")(mkTail(tailIds.hint("shuffle_hash")).count())
    time("tail aqe-auto")(mkTail(tailIds).count())
    time("tail broadcast")(mkTail(broadcast(tailIds)).count())
    val tail = mkTail(tailIds.hint("shuffle_hash"))
    val cos = smallK.unionByName(tail)
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))), 6).as("cosine"))
    time("topk")(cos.orderBy(col("cosine").desc, col("id_a"), col("id_b")).limit(50).count())
    time("full query")(graft.operators.TextRank.tfidfCosinePairs(docs, "doc_id", "text").count())
    time("full query again")(graft.operators.TextRank.tfidfCosinePairs(docs, "doc_id", "text").count())
    time("full query 3rd")(graft.operators.TextRank.tfidfCosinePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
