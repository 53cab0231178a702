package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed batch-wise with `mapPartitions` (the Scala analogue
  * of the mapInPandas batch shape).
  *
  * Image rows carry REAL PNG payloads and go through a REAL codec —
  * `javax.imageio` ships in the JDK — so width, height and mean pixel come
  * from decoded pixels. Audio rows carry REAL WAV payloads decoded through
  * `javax.sound.sampled` (also JDK-resident): sample rate and channel
  * layout are parsed from the RIFF/fmt header and the PCM samples are read
  * back through the codec. Both payloads are synthesized from deterministic
  * sample formulas, which makes the DECODED features independently
  * computable by the driver's DuckDB oracle (the container byte streams are
  * encoder-dependent and never asserted on).
  *
  * Video rows carry a frame-packed container ("GVID": magic + frame count +
  * length-prefixed REAL PNG frames) — the JDK has no video codec, so the
  * container format is ours, but every frame goes through the REAL
  * `javax.imageio` codec: the decode walks the container, samples every 4th
  * frame, decodes it, and derives dimensions, mean pixel and a fingerprint
  * from DECODED pixel values (per-frame pixel formula = the oracle
  * contract, container bytes never asserted). The Spark-side contract
  * (binary column, typed features struct, partition-wise batching) is
  * identical for all three modalities.
  */
object MultimodalOps {

  // ImageIO's stream cache spools every read/write through a temp FILE by
  // default — pure disk overhead for the in-memory byte-array codecs here
  // (thousands of tiny PNG round-trips per corpus pass).
  ImageIO.setUseCache(false)

  // MessageDigest.getInstance does a provider lookup — per-thread reuse,
  // not per-row (the decode runs once per media row over the corpus).
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Option[Int], height: Option[Int],
                           mean_pixel: Option[Double],
                           sample_rate: Option[Int], n_samples: Option[Int],
                           mean_sample: Option[Double],
                           n_frames: Option[Int], frames_sampled: Option[Int],
                           fingerprint: Option[String])

  /** Deterministic gray PNG (frame `frame` of a clip; stills are frame 0):
    * pixel(x, y) = (7x + 13y + doc_id + 31·frame) mod 256,
    * width = doc_id%16+1, height = doc_id%12+1. The formula (not the
    * encoder's bytes) is the oracle contract.
    */
  def encodePng(docId: Long, frame: Int = 0): Array[Byte] = {
    val w = (docId % 16 + 1).toInt
    val h = (docId % 12 + 1).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((7L * x + 13L * y + docId + 31L * frame) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame-packed video container: "GVID" magic, int32 frame count, then
    * per frame an int32 length + REAL PNG bytes (each frame is
    * [[encodePng]] of (doc_id, frame)); nFrames = doc_id%12+2. The
    * per-frame pixel formula — not the container or PNG byte streams — is
    * the oracle contract.
    */
  def encodeVideo(docId: Long): Array[Byte] = {
    val n = (docId % 12 + 2).toInt
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVID")
    out.writeInt(n)
    var f = 0
    while (f < n) {
      val png = encodePng(docId, f)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    bos.toByteArray
  }

  val AudioRate = 8000

  /** Deterministic mono 8-bit PCM WAV: n_samples = doc_id%160+16,
    * sample(i) = (11·doc_id + 5i) mod 256 (unsigned), 8 kHz. The formula
    * (not the RIFF bytes) is the oracle contract.
    */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = (docId % 160 + 16).toInt
    val pcm = new Array[Byte](n)
    var i = 0
    while (i < n) { pcm(i) = ((11L * docId + 5L * i) % 256).toByte; i += 1 }
    // 8-bit WAV PCM is unsigned by spec (javax.sound encodes it as such).
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      AudioRate.toFloat, 8, 1, 1, AudioRate.toFloat, false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
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

  /** Real decode: WAV bytes → (sample rate from the parsed fmt chunk,
    * sample count, mean unsigned sample, md5 of the PCM hex string).
    */
  private def decodeAudio(payload: Array[Byte]): (Int, Int, Double, String) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val rate = in.getFormat.getSampleRate.toInt
    val pcm = in.readAllBytes()
    var sum = 0L
    var i = 0
    while (i < pcm.length) { sum += pcm(i) & 0xFF; i += 1 }
    val hex = pcm.map(b => f"${b & 0xFF}%02x").mkString
    val fp = mdLocal.get()
      .digest(hex.getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString
    (rate, pcm.length, if (pcm.isEmpty) 0.0 else sum.toDouble / pcm.length, fp)
  }

  /** Real per-frame decode: walk the GVID container, decode every 4th
    * frame through `javax.imageio`, and fold the DECODED pixels (frame,
    * row, column order) into dimensions, mean and an md5-of-pixel-hex
    * fingerprint → (width, height, n_frames, frames_sampled, mean_pixel,
    * fingerprint).
    */
  private def decodeVideo(payload: Array[Byte]): (Int, Int, Int, Int, Double, String) = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val n = in.readInt()
    val hex = new java.lang.StringBuilder()
    var w = 0; var h = 0
    var sum = 0L; var count = 0L; var sampled = 0
    var f = 0
    while (f < n) {
      val len = in.readInt()
      val frame = new Array[Byte](len)
      in.readFully(frame)
      if (f % 4 == 0) { // frame sampling: every 4th frame is decoded
        val img = ImageIO.read(new ByteArrayInputStream(frame))
        w = img.getWidth; h = img.getHeight
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = r.getSample(x, y, 0)
            sum += p; count += 1
            hex.append(f"$p%02x")
            x += 1
          }
          y += 1
        }
        sampled += 1
      }
      f += 1
    }
    val fp = mdLocal.get().digest(hex.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    (w, h, n, sampled, if (count == 0) 0.0 else sum.toDouble / count, fp)
  }

  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  def decode(r: MediaRow): MediaFeatures = r.media_type match {
    case "image" =>
      val (w, h, mean) = decodeImage(r.payload)
      MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), Some(round4(mean)),
        None, None, None, None, None, None)
    case "audio" =>
      val (rate, n, mean, fp) = decodeAudio(r.payload)
      MediaFeatures(r.doc_id, r.media_type, None, None, None,
        Some(rate), Some(n), Some(round4(mean)), None, None, Some(fp))
    case _ =>
      val (w, h, n, sampled, mean, fp) = decodeVideo(r.payload)
      MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), Some(round4(mean)),
        None, None, None, Some(n), Some(sampled), Some(fp))
  }

  /** Build a media table from documents — image rows get real encoded PNGs,
    * audio rows real encoded WAVs, video rows frame-packed containers of
    * real PNG frames — then run the batch decode over partitions. Every
    * modality round-trips through a REAL JDK codec. The decode is
    * embarrassingly parallel; the narrow `mapPartitions` keeps the batch
    * shape a cluster needs (no per-row task, no driver round-trips).
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
        lit(Array.empty[Byte]).as("payload"))
      // The documents table is one small parquet file → one input split, so
      // without this every codec round-trip of the corpus runs in a single
      // task while the other cores idle (input-parallelism skew, the
      // repartition-after-read fix). The encode/decode below is the whole
      // cost of the operator and is embarrassingly parallel.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        r.media_type match {
          case "image" => r.copy(payload = encodePng(r.doc_id))
          case "audio" => r.copy(payload = encodeWav(r.doc_id))
          case _ => r.copy(payload = encodeVideo(r.doc_id))
        }
      })
    // Barrier before the global sort: the range exchange's boundary sampling
    // would otherwise re-run the encode+decode of every payload a second
    // time (the codec work is the whole operator).
    graft.ops.CacheScope.persistUntilConsumed(
      media.mapPartitions(_.map(decode)).toDF())
      .orderBy("doc_id")
  }
}
