package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 #42): media as opaque
  * binary columns plus a typed metadata struct, with decode /
  * feature-extraction running per-partition.
  *
  * The Spark-side contract is real and tested: schema, partition-local
  * batch iteration, and output shape are what a production pipeline
  * uses. The actual byte decoding is STUBBED (no image/audio codecs in
  * this environment): `decodeStub` derives deterministic fake features
  * from the raw bytes. A real deployment replaces only the inner
  * function with a codec call — the distributed plumbing is unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true)
    )), nullable = true)
  ))

  /** STUB decode: a real implementation calls an image/audio codec per
    * batch here. The fake is deterministic — a byte histogram folded to
    * `dim` buckets, L1-normalized — so tests and oracles are stable.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val total = bytes.length.max(1).toFloat
      var d = 0
      while (d < dim) { hist(d) /= total; d += 1 }
    }
    hist
  }

  /** Per-partition feature extraction over (media_id, content) rows.
    * Partition-local iteration means one decoder/codec instance per
    * partition, batch-amortized — the mapInPandas shape in Scala form.
    */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
    ))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      // a real codec would be initialized once per partition here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val n = if (bytes == null) 0L else bytes.length.toLong
        Row(r.getAs[Long]("media_id"), n, decodeStub(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Resize stub for image-kind rows: the metadata transform is real
    * (target dims land in `meta`, a real codec would be called in the
    * partition loop), the payload "resample" is a deterministic prefix
    * of ceil(len × targetPixels/origPixels) bytes — so byte accounting
    * stays oracle-checkable end-to-end. Pure column algebra: resizing
    * a 100 TB image corpus is one map pass.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val origPixels = col("meta.width").cast("double") * col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(targetW.toDouble * targetH) / origPixels)
    val outLen = ceil(length(col("content")).cast("double") * scale).cast("int")
    media
      .filter(col("kind") === "image")
      .select(
        col("media_id"),
        struct(
          lit(targetW).as("width"), lit(targetH).as("height"),
          col("meta.format").as("format")).as("meta"),
        col("content").substr(lit(1), outLen).as("content"))
  }

  /** Frame sampling stub for video-kind rows: every `stride`-th byte
    * window stands in for a frame; the plumbing (explode to one row per
    * frame with an index) matches a real frame sampler.
    */
  def sampleFrames(media: DataFrame, stride: Int, frameBytes: Int): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        posexplode(
          transform(
            sequence(lit(0), greatest(ceil(length(col("content")) / stride) - 1, lit(0)).cast("int")),
            i => substring(col("content"), (i * stride + 1).cast("int"), lit(frameBytes))
          )
        ).as(Seq("frame_idx", "frame_bytes"))
      )
}
