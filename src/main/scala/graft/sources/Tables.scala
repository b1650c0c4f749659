package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the engine's input tables (one parquet per table).
  *
  * Mirrors the reference's data model (see SURVEY.md §3): the rialto
  * pipeline reads per-source harvested records plus an authors dimension
  * (/root/reference/rialto_airflow/harvest_incremental/authors.py:19);
  * here every input is a columnar parquet scan so Catalyst can push
  * filters and prune columns all the way into the file reader.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts is TIMESTAMP(NANOS) in the driver testdata, surfaced as
    * long nanos (see GraftSession nanosAsLong) — converted here to a
    * Spark timestamp (microsecond precision) so downstream time logic
    * is uniform. Scaled copies (tools.ScaleUp) already store a true
    * timestamp; dispatch on the read type so both layouts work.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: double /1000 would round sub-microsecond bits
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] without timezone reads as TIMESTAMP_NTZ, which
        // time arithmetic (unix_millis, windows) rejects; the session
        // is pinned to UTC, so the cast re-tags the same wall-clock as
        // an instant without shifting it — identical to what the nanos
        // layout produced.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
