package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 text retrieval (Robertson & Zaragoza 2009) — the lexical
  * search primitive an LLM data pipeline uses for targeted corpus
  * mining (find documents about X) and retrieval-based decontamination.
  *
  * Scale shape: the corpus explodes to (term, doc_id, tf) triples
  * FILTERED to the query's terms before any shuffle — document text
  * never moves, and the only shuffled rows are per-(query-term, doc)
  * counts. Document frequencies aggregate from those same triples
  * (query terms only, not a full corpus vocabulary), and corpus-level
  * stats (N, avg length) ride along as a broadcast single-row frame —
  * no driver-side collect anywhere. 100 TB of text scores a query
  * with one scan plus two narrow shuffles.
  */
object TextRank {

  /** Top-k documents for a bag-of-words query, scored with BM25.
    * Scores are rounded to 4 decimals BEFORE ranking (with doc id as
    * tiebreak): per-term scores are bit-exact across engines (integer
    * tf/df/N and an exact rational avglen feed ln and division
    * identically), but the per-document SUM of term scores is float
    * addition whose order an engine may choose freely — ranking on the
    * rounded value keeps the result reproducible.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tokens = split(lower(col(textCol)), " ")
    val base = docs.select(col(idCol).as("id"), size(tokens).cast("long").as("dl"),
      explode(tokens).as("term"))
    val hits = base.filter(col("term").isInCollection(query))
    val tfs = hits.groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(
      count(lit(1)).as("n"),
      avg(size(split(lower(col(textCol)), " "))).as("avglen"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val termScore = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avglen")))
    val scored = tfs
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), termScore.as("s"))
      .groupBy("id")
      .agg(sum(col("s")).as("score"))
      .select(col("id"), round(col("score"), 4).as("score"))
    import org.apache.spark.sql.expressions.Window
    // orderBy+limit plans TakeOrderedAndProject (per-partition top-k,
    // driver merge of k rows) — not a single-partition global sort;
    // the rank window then runs over only k rows.
    scored.orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
  }
}
