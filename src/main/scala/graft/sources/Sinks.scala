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

  /** Small-file compaction: rewrite a parquet dataset into
    * ceil(rows / rowsPerFile) files. Incremental appends at 100 TB
    * accumulate thousands of KB-sized files per partition; periodic
    * compaction keeps scan task counts sane.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String, rowsPerFile: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val df = spark.read.parquet(path)
    val oldCount = df.count()
    val files = math.max(1L, math.ceil(oldCount.toDouble / rowsPerFile).toLong).toInt
    val target = new Path(path)
    val tmp = new Path(path + "__compacting")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Verify the rewrite before the destructive swap, then use the
    // filesystem abstraction (recursive delete + rename, both checked)
    // so partitioned layouts and non-local filesystems both work.
    val newCount = spark.read.parquet(tmp.toString).count()
    if (newCount != oldCount) {
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"compact aborted: rewrite of $path has $newCount rows, expected $oldCount")
    }
    if (!fs.delete(target, true))
      throw new java.io.IOException(s"compact failed: could not delete $target")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"compact failed: could not rename $tmp to $target")
  }

  /** Z-order clustering write: sort by the bit-interleaved value of
    * two integer columns so range predicates on EITHER column touch
    * few files (parquet min/max skipping). Interleave is an unrolled
    * fixed-shift expression — pure codegen.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String, files: Int): Unit =
    df.repartitionByRange(files, zValue(org.apache.spark.sql.functions.col(colA),
        org.apache.spark.sql.functions.col(colB)))
      .sortWithinPartitions(zValue(org.apache.spark.sql.functions.col(colA),
        org.apache.spark.sql.functions.col(colB)))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** 62-bit Z-value: interleave the low 31 bits of two long columns.
    * 31 (not 32) bits per column keeps the result clear of the long
    * sign bit, so z-values sort monotonically for keys in [0, 2^31);
    * larger keys wrap into the same range (clustering degrades but
    * ordering stays non-negative and consistent).
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{shiftleft, shiftright}
    (0 until 31).map { i =>
      val abit = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i)
      val bbit = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
      abit + bbit
    }.reduce(_ + _)
  }
}
