package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticsQueries, CoreQueries, CurationQueries, DistillerQueries, DomainQueries, EconQueries, InferenceQueries, LlmQueries, PipelineQueries, RetrievalQueries, ScaleQueries, SignalQueries, StatsQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ DomainQueries.queries ++ LlmQueries.queries ++
      PipelineQueries.queries ++ AnalyticsQueries.queries ++ DistillerQueries.queries ++
      CurationQueries.queries ++ TrainingQueries.queries ++ ScaleQueries.queries ++
      StatsQueries.queries ++ RetrievalQueries.queries ++ InferenceQueries.queries ++ SignalQueries.queries ++ EconQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ DomainQueries.oracles ++ LlmQueries.oracles ++
      PipelineQueries.oracles ++ AnalyticsQueries.oracles ++ DistillerQueries.oracles ++
      CurationQueries.oracles ++ TrainingQueries.oracles ++ ScaleQueries.oracles ++
      StatsQueries.oracles ++ RetrievalQueries.oracles ++ InferenceQueries.oracles ++ SignalQueries.oracles ++ EconQueries.oracles
}
