package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output side of the engine — the reference "publishes" denormalized
  * tables and CSV downloads (publish/publication.py:382-456); at Spark
  * scale the equivalents are partitioned parquet datasets, bucketed
  * tables, and compressed CSV exports.
  */
object Sinks {

  /** Hive-style partitioned parquet: prunes at read time on the
    * partition columns — the layout you want for year/school-sliced
    * report consumption at 100 TB.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: co-locates join keys so repeated
    * joins on `bucketCol` skip the shuffle entirely.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Gzipped CSV download export (one directory per table, like the
    * reference's zip-of-csv downloads).
    */
  def writeCsvDownload(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("compression", "gzip")
      .csv(path)
}
