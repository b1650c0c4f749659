package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** authors.csv source — the rialto-orgs export loaded by
  * /root/reference/rialto_airflow/harvest_incremental/authors.py:19-66:
  * header validation, `true`/`false` booleans, pipe-delimited array
  * columns, empty strings → NULL for the id columns.
  *
  * Spark-first: the file is read once, schema-checked on the driver from
  * the header line only, and all per-row parsing is Column expressions.
  */
object AuthorsCsv {

  val requiredHeaders: Seq[String] = Seq(
    "sunetid", "first_name", "last_name", "orcidid", "role",
    "academic_council", "primary_school", "primary_department",
    "primary_division", "all_schools", "all_departments", "active"
  )

  /** Load + normalize. Throws when required headers are missing
    * (authors.py check_headers).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

    val missing = requiredHeaders.filterNot(raw.columns.contains)
    require(missing.isEmpty, s"Headers in $path are ${raw.columns.toSeq}, missing required: $missing")

    def toBool(c: String) = lower(trim(col(c))) === "true"
    def toArr(c: String) =
      when(col(c).isNull || col(c) === "", array().cast(ArrayType(StringType)))
        .otherwise(split(col(c), "\\|"))
    def emptyNull(c: String) = when(trim(col(c)) === "", lit(null)).otherwise(col(c))

    raw.select(
      col("sunetid").as("sunet"),
      emptyNull("cap_profile_id").as("cap_profile_id"),
      emptyNull("orcidid").as("orcid"),
      col("first_name"),
      col("last_name"),
      toBool("active").as("status"),
      toBool("academic_council").as("academic_council"),
      col("role"),
      toArr("all_schools").as("schools"),
      toArr("all_departments").as("departments"),
      col("primary_school"),
      col("primary_department").as("primary_dept"),
      col("primary_division")
    )
  }
}
