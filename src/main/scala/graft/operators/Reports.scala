package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalizers

/** Denormalized report builders — the Spark form of
  * /root/reference/rialto_airflow/publish/publication.py.
  *
  * Role-named inputs (rename your columns into these before calling):
  *   pubs:      one row per publication, `pub_id` + payload columns
  *   pubAuthor: association rows `pub_id`, `author_id`
  *   authors:   `author_id` + dimension columns (school, dept, ...)
  *   pubFunder: association rows `pub_id`, `funder_id`
  *   funders:   `funder_id`, boolean `federal`
  *
  * The reference streams Postgres cursors row-by-row into per-row
  * INSERTs; here each report is one plan: the funder-federal flag is
  * pre-aggregated per publication (a small shuffle keyed by pub_id),
  * then joined — authors/funders dims are broadcast-sized in practice.
  * `federally_funded = any(federal)` ≡ jsonb_agg_strict + any()
  * (publication.py:77,108) with any([]) == false.
  */
object Reports {

  /** Per-publication `federally_funded` flag. */
  def federallyFunded(pubFunder: DataFrame, funders: DataFrame): DataFrame =
    pubFunder
      .join(broadcast(funders), "funder_id")
      .groupBy("pub_id")
      .agg(bool_or(col("federal")).as("federally_funded"))

  /** Per-publication authored flags (harvest_incremental/distill.py
    * :72-87): `academic_council_authored` = any joined author flagged
    * academic_council (_academic_council), `faculty_authored` = any
    * author whose role is 'faculty' (_faculty_authored). Same engine
    * shape as [[federallyFunded]]: broadcast the author dim into the
    * association, one bool_or aggregation keyed by pub_id. Pubs with
    * no author rows get no row here — the caller left-joins and
    * coalesces to false, matching the reference's any([]) == False.
    * `authors` must carry boolean `academic_council` and string `role`.
    */
  def authoredFlags(pubAuthor: DataFrame, authors: DataFrame): DataFrame =
    pubAuthor
      .join(broadcast(authors), "author_id")
      .groupBy("pub_id")
      .agg(
        bool_or(col("academic_council")).as("academic_council_authored"),
        bool_or(col("role") === "faculty").as("faculty_authored"))

  /** publications report: pub grain, aggregated funder flag. */
  def publications(pubs: DataFrame, pubFunder: DataFrame, funders: DataFrame): DataFrame =
    pubs
      .join(federallyFunded(pubFunder, funders), Seq("pub_id"), "left")
      .withColumn("federally_funded", coalesce(col("federally_funded"), lit(false)))

  /** publications_by_<dim> report: pub × author-dim grain.
    * The distinct runs on the narrow (pub_id, dims) pairs BEFORE the
    * payload join — the pub payload is functionally dependent on
    * pub_id, so deduping wide rows would shuffle the payload for
    * nothing.
    */
  def publicationsByGroup(
      pubs: DataFrame,
      pubAuthor: DataFrame,
      authors: DataFrame,
      pubFunder: DataFrame,
      funders: DataFrame,
      groupCols: Seq[String]
  ): DataFrame = {
    val dims = pubAuthor
      .join(broadcast(authors), "author_id")
      .select((Seq("pub_id") ++ groupCols).map(col): _*)
      .distinct()
    publications(pubs, pubFunder, funders).join(dims, "pub_id")
  }

  /** publications_by_author report: pub × author grain with author-list
    * aggregates distilled from the association itself.
    */
  def publicationsByAuthor(
      pubs: DataFrame,
      pubAuthor: DataFrame,
      authors: DataFrame,
      pubFunder: DataFrame,
      funders: DataFrame
  ): DataFrame = {
    val authorAgg = pubAuthor
      .join(broadcast(authors), "author_id")
      .groupBy("pub_id")
      .agg(
        Normalizers.piped(array_sort(collect_set(col("author_name")))).as("author_list_names"),
        min(col("author_name")).as("first_author_name"),
        max(col("author_name")).as("last_author_name")
      )
    publications(pubs, pubFunder, funders)
      .join(authorAgg, Seq("pub_id"), "left")
  }
}
