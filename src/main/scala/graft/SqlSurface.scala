package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Pure-SQL surface for the engine: registers the input tables and the
  * flagship PIPELINES as temp views, so a `spark.sql(...)`-only client
  * (a notebook, a JDBC gateway, Spark Connect) runs the rialto reports
  * and the curation/dedup chains without touching Scala — the
  * view-catalog complement of [[graft.plans.GraftFunctions]], which
  * already exposes the native expressions to SQL.
  *
  * Views are LAZY: registration builds logical plans only; each
  * `SELECT` plans and optimizes through Catalyst exactly like the
  * Column-API entry points (same pushdown, same broadcast choices —
  * it is literally the same plan underneath), so the SQL surface costs
  * nothing at 100 TB that the API surface doesn't.
  *
  * Mirrors the reference's publish step exposing report tables to
  * downstream SQL consumers (rialto_airflow/publish/publication.py —
  * there via Postgres tables; here as view definitions over the same
  * engine).
  */
object SqlSurface {

  /** Flagship pipeline view name → SparkEntry.queries key. */
  val pipelineViews: Map[String, String] = Map(
    "graft_report_publications" -> "q_report_publications",
    "graft_report_by_author" -> "q_report_by_author",
    "graft_report_by_dept" -> "q_report_by_dept",
    "graft_report_by_group" -> "q_report_by_group",
    "graft_orcid_stats" -> "q_orcid_stats",
    "graft_fuzzy_dedup" -> "q_fuzzy_dedup",
    "graft_curation_pipeline" -> "q_curation_pipeline")

  /** Base lake tables only — enough for ad-hoc SQL over the raw
    * views (and what q_sql_report's verbatim-ANSI twin needs; the
    * flagship-view registration below builds seven pipeline plans,
    * which is client-session setup, not per-query work).
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  /** Register base tables + flagship pipeline views over `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    pipelineViews.foreach { case (view, q) =>
      SparkEntry.queries(q)(spark, dir).createOrReplaceTempView(view)
    }
  }
}
