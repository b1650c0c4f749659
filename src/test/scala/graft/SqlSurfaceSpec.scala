package graft

/** The pure-SQL client's view of the engine: flagship pipelines as
  * registered views, composable with plain SQL and with the injected
  * graft_* functions — no Scala imports on the client side.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("flagship report via pure SQL matches the Column-API pipeline") {
    SqlSurface.register(spark, sfDir)
    val viaSql = spark.sql("SELECT * FROM graft_report_publications")
    val viaApi = SparkEntry.queries("q_report_publications")(spark, sfDir)
    assert(viaSql.columns.toSeq == viaApi.columns.toSeq)
    val s = viaSql.collect().map(_.toString).sorted
    val a = viaApi.collect().map(_.toString).sorted
    assert(s.length > 0 && s.sameElements(a))
  }

  test("SQL composes over pipeline views: filter, aggregate, join back to a base view") {
    SqlSurface.register(spark, sfDir)
    // dedup chain consumed as a plain table by a SQL-only client
    val n = spark.sql("SELECT count(*) AS n FROM graft_fuzzy_dedup")
      .collect()(0).getLong(0)
    assert(n > 0)
    // compose: join the curation pipeline's survivors back to the raw
    // documents view and aggregate — the everyday BI query shape
    val joined = spark.sql(
      """SELECT d.source, count(*) AS kept
        |FROM graft_curation_pipeline c JOIN documents d USING (doc_id)
        |GROUP BY d.source""".stripMargin).collect()
    assert(joined.nonEmpty && joined.map(_.getLong(1)).sum > 0)
  }

  test("verbatim-ANSI report (q_sql_report) hash-matches the Column-API twin") {
    val viaSql = SparkEntry.queries("q_sql_report")(spark, sfDir)
    val viaApi = SparkEntry.queries("q_report_publications")(spark, sfDir)
    assert(viaSql.columns.sorted.sameElements(viaApi.columns.sorted))
    val cols = viaApi.columns.sorted.toSeq
    val s = viaSql.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    val a = viaApi.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    assert(s.length > 0 && s.sameElements(a))
  }

  test("injected graft_* functions and views work in one SQL statement") {
    SqlSurface.register(spark, sfDir)
    // native codegen expression + base view in a single pure-SQL query
    val r = spark.sql(
      """SELECT max(graft_jaro_winkler(o_orderstatus, 'O')) AS best
        |FROM orders""".stripMargin).collect()(0).getDouble(0)
    assert(r == 1.0)
  }
}
