package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-object media ingestion via Spark's `binaryFile` source — the
  * lake-side entry point for image/audio/video corpora stored as one
  * object per item (the layout crawlers and upload pipelines actually
  * produce): one row per object with (path, modificationTime, length,
  * content), bytes opaque until the Multimodal decode stage.
  *
  * 100 TB posture: the scan parallelizes by FILE, with
  * `spark.sql.files.maxPartitionBytes` packing many small objects
  * into each task; filters on path / length / modificationTime are
  * pushed into the file LISTING, so incremental ingest ("objects
  * since ts") and size gates ("under 10 MB") never open skipped
  * objects. The pathGlobFilter prunes before listing returns, which
  * is the only affordable place at billions of objects.
  */
object MediaFiles {

  /** Load every object under `dir` matching `glob` and normalize to
    * the Multimodal media contract: `media_id` parsed from the file
    * stem's trailing digits (the shard-writer convention), `kind`
    * stamped by the caller, `content` = raw bytes, plus the object's
    * `length` and `mtime` for size gates and incremental cursors.
    */
  def load(spark: SparkSession, dir: String, glob: String, kind: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z0-9]+$", 1).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col("content"),
        col("length"),
        col("modificationTime").as("mtime"))
}
