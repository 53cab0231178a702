package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed batch-wise with `mapPartitions` (the Scala analogue
  * of the mapInPandas batch shape).
  *
  * Image rows carry REAL PNG payloads and go through a REAL codec —
  * `javax.imageio` ships in the JDK, no external dependency — so width,
  * height and mean pixel value come from decoded pixels. The payloads are
  * synthesized from a deterministic pixel formula, which makes the decoded
  * features independently computable by the driver's DuckDB oracle (the
  * PNG byte stream itself is encoder-dependent and is never asserted on).
  *
  * Audio/video rows keep the declared byte-level stub (no audio/video codec
  * exists in the JDK or this container): deterministic features over the
  * opaque payload bytes — length, mean byte, frame-sampling arithmetic,
  * content fingerprint — each oracle-checkable. The Spark-side contract
  * (binary column, typed features struct, partition-wise batching) is
  * identical for all three modalities.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Option[Int], height: Option[Int],
                           mean_pixel: Option[Double],
                           n_bytes: Option[Int], mean_byte: Option[Double],
                           frames_sampled: Option[Int], fingerprint: Option[String])

  /** Deterministic gray PNG: pixel(x, y) = (7x + 13y + doc_id) mod 256,
    * width = doc_id%16+1, height = doc_id%12+1. The formula (not the bytes)
    * is the oracle contract.
    */
  def encodePng(docId: Long): Array[Byte] = {
    val w = (docId % 16 + 1).toInt
    val h = (docId % 12 + 1).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((7L * x + 13L * y + docId) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real decode: PNG bytes → (width, height, mean pixel of band 0). */
  private def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val r = img.getRaster
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { sum += r.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (img.getWidth, img.getHeight, sum.toDouble / (img.getWidth.toLong * img.getHeight))
  }

  /** Byte-level features for modalities without a JDK codec (audio/video):
    * length, mean byte, one frame per 16-byte block with every 4th kept,
    * md5 content fingerprint.
    */
  private def byteFeatures(bytes: Array[Byte]): (Int, Double, Int, String) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val fp = md.map(b => f"${b & 0xFF}%02x").mkString
    val frames = (bytes.length / 16 + 3) / 4
    (bytes.length, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, frames, fp)
  }

  def decode(r: MediaRow): MediaFeatures = r.media_type match {
    case "image" =>
      val (w, h, mean) = decodeImage(r.payload)
      MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h),
        Some(BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
        None, None, None, None)
    case _ =>
      val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
      val (n, mean, frames, fp) = byteFeatures(bytes)
      MediaFeatures(r.doc_id, r.media_type, None, None, None,
        Some(n), Some(BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
        Some(frames), Some(fp))
  }

  /** Build a media table from documents — image rows get real encoded PNGs,
    * audio/video rows use text bytes as the opaque payload — then run the
    * batch decode over partitions. The decode is embarrassingly parallel;
    * the narrow `mapPartitions` keeps the batch shape a cluster needs (no
    * per-row task, no driver round-trips).
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        if (r.media_type == "image") r.copy(payload = encodePng(r.doc_id)) else r
      })
    media.mapPartitions(_.map(decode)).toDF()
      .orderBy("doc_id")
  }
}
