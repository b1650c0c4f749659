package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 #42): media as opaque
  * binary columns plus a typed metadata struct, with decode /
  * feature-extraction running per-partition.
  *
  * IMAGE decode is REAL: javax.imageio ships PNG/JPEG codecs with the
  * JDK, so [[decodeImages]] reads true pixel data (proven by the
  * encode→decode round-trip oracle on q_image_decode). Audio/video
  * remain stubs — a bare JVM carries no codecs for them — with
  * `decodeStub` deriving deterministic fake features from raw bytes;
  * a real deployment replaces only that inner function, the
  * distributed plumbing is identical.
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

  /** REAL image decode via javax.imageio (PNG/JPEG — codecs in every
    * JDK). Emits (media_id, decode_ok, width, height, pixel_sum) where
    * pixel_sum = Σ blue-channel value over all pixels — for grayscale
    * content a deterministic checksum an oracle can recompute without
    * a codec. Null or undecodable content → decode_ok=false with null
    * dims, never an exception: one poisoned blob must not kill a
    * 100 TB decode pass. Partition-local map, no shuffle; ImageIO's
    * reader lookup is per-call but codec instances are JVM-cached.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true)
    ))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        if (img == null) Row(r.getAs[Long]("media_id"), false, null, null, null)
        else {
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
            y += 1
          }
          Row(r.getAs[Long]("media_id"), true, img.getWidth, img.getHeight, sum)
        }
      }
    }(enc)
  }

  /** Synthetic grayscale PNG per row — the encode half of the decode
    * round-trip proof (and a generator for codec-path tests). Pixel
    * (x, y) carries v = (id·31 + x·7 + y·13) mod 256 in all three
    * channels; PNG is lossless, so a correct decoder must read exactly
    * these values back and any oracle can recompute their sum as pure
    * arithmetic. `df` needs (idCol: long, wCol: int, hCol: int).
    */
  def synthGrayPng(df: DataFrame, idCol: String, wCol: String, hCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)
    ))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col(idCol).cast("long").as("media_id"),
        col(wCol).cast("int").as("w"), col(hCol).cast("int").as("h"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, "image", bos.toByteArray)
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
