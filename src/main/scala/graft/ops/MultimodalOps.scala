package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed batch-wise with `mapPartitions` (the Scala analogue
  * of the mapInPandas batch shape). The actual codec is STUBBED with a
  * deterministic fake (no image/audio libraries in this container — see the
  * builder contract); everything Spark-side is real: schema, partition-wise
  * iteration, per-row feature structs, and the planner sees an ordinary
  * typed transformation.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           mean_byte: Double, frames_sampled: Int, fingerprint: String)

  /** Deterministic fake "decode + feature extract" for one media payload.
    * Real deployments replace this body with the codec call; the signature
    * and batch shape are the contract. Features are chosen to be
    * independently computable by the driver's DuckDB oracle (byte length,
    * mean byte value, arithmetic frame count, md5 content fingerprint).
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val fp = md.map(b => f"${b & 0xFF}%02x").mkString
    // "frame-sample": one frame per 16-byte block, every 4th block kept
    val frames = (bytes.length / 16 + 3) / 4
    MediaFeatures(r.doc_id, r.media_type, bytes.length,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, frames, fp)
  }

  /** Build a media table from documents (text bytes standing in for the
    * opaque payload), then run the batch decode over partitions.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 1).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast(IntegerType).as("height"))
      .as[MediaRow]
    media.mapPartitions(_.map(decodeStub)).toDF()
      .orderBy("doc_id")
  }
}
