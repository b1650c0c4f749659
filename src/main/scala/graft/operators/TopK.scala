package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpr

import graft.plans.TopKPerKey

/** Public API for the custom TopKPerKey operator (plans/TopKPerKey):
  * the k rows with the smallest `orderBy` value per key, via two
  * bounded-heap passes instead of a full per-key sort.
  *
  * For "largest first" or tie-broken variants pass a composite, e.g.
  * `struct(-col("sim"), col("id"))` ≡ ORDER BY sim DESC, id ASC.
  * Requires a session built with GraftExtensions (GraftSession does
  * this).
  *
  * Rows whose `orderBy` evaluates to NULL are dropped, not ranked —
  * coalesce to a sentinel (e.g. `struct(lit(Double.MaxValue), ...)`)
  * to keep them with NULLS-LAST window semantics.
  */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Column, k: Int): DataFrame = {
    // Materialize the order expression through the normal API so the
    // analyzer resolves it, then reference only resolved attributes in
    // the custom node (lazy ColumnNode wrappers are Unevaluable).
    val tmp = df.withColumn("__graft_order", orderBy)
    val plan = tmp.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))
    GraftExpr.ofRows(
      df.sparkSession,
      TopKPerKey(k, keyCols.map(attr), attr("__graft_order"), plan)
    ).drop("__graft_order")
  }
}
