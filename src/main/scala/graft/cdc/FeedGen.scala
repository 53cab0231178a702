package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic change-feed generators (FIXTURES.md). No wall clock, no
  * RNG state — every value is a pure function of the event id and a fixed
  * seed (xxhash64), so any two runs produce byte-identical feeds and the
  * golden oracle can re-derive them independently.
  */
object FeedGen {

  val BaseTsMicros: Long = 1767225600000000L // 2026-01-01T00:00:00Z

  /** FIXTURES.md §1-3 synthetic feed: skewed conv_ids, I/U/D mix, duplicate
    * deliveries, bounded out-of-order batch placement, malformed lines, and
    * the three-phase schema-evolution script (`model` at 30%, `tokens` at
    * 50% widening at 70%, `score` int→double at 60%/80%).
    *
    * Returns the DataFrame of (batch, value) lines; also writes them as
    * text under `outDir/batch=N/` when outDir is set.
    */
  def synthetic(spark: SparkSession, outDir: Option[String], nEvents: Long,
                nConvs: Int = 100, turnsPerConv: Int = 20, nBatches: Int = 8,
                seed: Long = 42L, malformedEvery: Int = 499,
                duplicateEvery: Int = 97, filesPerBatch: Int = 1): DataFrame = {
    val df = spark.range(0, nEvents).toDF("id")
      .withColumn("lsn", col("id") + 1)

    def h(salt: String) = xxhash64(col("id"), lit(seed), lit(salt))
    def hmod(salt: String, m: Long) = pmod(h(salt), lit(m))

    // Zipf-ish skew: cube of a uniform → hot low conv ids (St7 bench profile).
    val u = hmod("conv", 1000000L).cast(DoubleType) / 1000000.0
    val ev = df
      .withColumn("conv", floor(pow(u, 3.0) * nConvs).cast(IntegerType))
      .withColumn("conv_id", concat(lit("conv-"), lpad(col("conv").cast(StringType), 8, "0")))
      .withColumn("turn_idx", hmod("turn", turnsPerConv).cast(IntegerType))
      .withColumn("op",
        when(hmod("op", 100L) < 8, "D")
          .when(hmod("op", 100L) < 30, "I")
          .otherwise("U"))
      .withColumn("role",
        element_at(array(lit("user"), lit("assistant"), lit("system"), lit("tool")),
          (hmod("role", 4L) + 1).cast(IntegerType)))
      // text deliberately exercises the reference's format detectors
      // (JSONSchemaGeneratorProcessor.java:616-626).
      .withColumn("text", concat(lit("msg lsn="), col("lsn"),
        when(pmod(col("id"), lit(7)) === 0, lit(" email=a@b.co"))
          .when(pmod(col("id"), lit(7)) === 1, lit(" date=2026-01-01"))
          .when(pmod(col("id"), lit(7)) === 2, lit(" https://x.example/z"))
          .when(pmod(col("id"), lit(7)) === 3, lit(" 123e4567-e89b-12d3-a456-426614174000"))
          .otherwise(lit(""))))
      .withColumn("tool", when(col("role") === "tool",
        concat(lit("tool-"), hmod("tool", 5L))).otherwise(lit(null).cast(StringType)))
      .withColumn("ts", date_format(
        timestamp_micros(lit(BaseTsMicros) + col("lsn") * 1000000L),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      // schema-evolution script (FIXTURES.md §3)
      .withColumn("model", when(col("lsn") > nEvents * 3 / 10,
        concat(lit("m-"), hmod("model", 5L))).otherwise(lit(null).cast(StringType)))
      .withColumn("tokens", when(col("lsn") > nEvents * 7 / 10, hmod("tok", 1000L) + 3000000000L)
        .when(col("lsn") > nEvents / 2, hmod("tok", 1000L))
        .otherwise(lit(null).cast(LongType)))
      .withColumn("score_i", when(col("lsn") > nEvents * 6 / 10, hmod("score", 10L))
        .otherwise(lit(null).cast(LongType)))
      .withColumn("score_d", when(col("lsn") > nEvents * 8 / 10,
        hmod("score", 100L).cast(DoubleType) / 10.0).otherwise(lit(null).cast(DoubleType)))

    val envelope = (after: org.apache.spark.sql.Column) =>
      to_json(struct(col("op"), col("lsn"), col("conv_id"), col("turn_idx"), after.as("after")))
    val basePayload = Seq(col("role"), col("text"), col("tool"), col("ts"), col("model"), col("tokens"))
    // score emitted as a JSON integer first, later as a fractional number →
    // exercises Long ⊔ Double widening (JSG:394-395, 512-515).
    val lineIntScore = envelope(struct(basePayload :+ col("score_i").as("score"): _*))
    val lineDblScore = envelope(struct(basePayload :+ col("score_d").as("score"): _*))
    val lineDelete = to_json(struct(col("op"), col("lsn"), col("conv_id"), col("turn_idx")))

    val withLine = ev.withColumn("value",
      when(col("op") === "D", lineDelete)
        .when(col("lsn") > nEvents * 8 / 10, lineDblScore)
        .otherwise(lineIntScore))
      // malformed lines → dead-letter route (JSG:293-298 precedent)
      .withColumn("value", when(pmod(col("id"), lit(malformedEvery)) === 0 && col("id") > 0,
        concat(lit("{\"op\":\"I\",\"lsn\":"), col("lsn"), lit(" BROKEN"))).otherwise(col("value")))
      // bounded out-of-order batch placement (watermark/ordering test)
      .withColumn("jitter", when(pmod(col("id"), lit(11)) === 0,
        (hmod("jit", 3L) - 1).cast(IntegerType)).otherwise(lit(0)))
      .withColumn("batch", greatest(lit(0), least(lit(nBatches - 1),
        (floor(col("id") * nBatches / nEvents) + col("jitter")).cast(IntegerType))))

    // duplicate deliveries of the same lsn (exactly-once test)
    val dups = withLine.filter(pmod(col("id"), lit(duplicateEvery)) === 0)
    val lines = withLine.unionByName(dups).select("batch", "value")

    outDir.foreach { dir =>
      // filesPerBatch > 1 spreads each batch dir over several text files so
      // the replay's scan parallelizes without relying on in-file splits.
      lines.repartition(nBatches * filesPerBatch, col("batch"),
          pmod(xxhash64(col("value")), lit(filesPerBatch.toLong)))
        .write.mode(SaveMode.Overwrite).partitionBy("batch").text(dir)
    }
    lines
  }

  /** Change feed derived from the driver's `events.parquet` — used by the
    * oracle-checked flagship query: the mapping below is intentionally
    * SQL-expressible so DuckDB can compute the converged table independently
    * (see SparkEntry.oracleSql("cdc_upsert_lww")).
    *
    *   lsn      = event_id
    *   conv_id  = 'conv-' || lpad(user_id, 4, '0')
    *   turn_idx = cast(json $.k of props) % 10
    *   op       = 'D' when event_type='error' else 'U' (upsert)
    *   after    = {role: event_type, text: event_type#event_id, value, ts}
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(spark, sfDir, corrupt = false)

  /** Same feed with deterministic corruption injected (dead-letter oracle):
    * `event_id % 97 == 0` → invalid op (envelope reject);
    * `event_id % 101 == 0` (not already envelope-corrupted) → the `after`
    * object replaced by a non-object payload (payload reject; only U rows
    * carry `after`, so D/error rows are unaffected). Both conditions are
    * pure functions of `event_id`, so the driver's DuckDB oracle computes
    * the expected dead-letter counts straight from events.parquet.
    */
  def fromEvents(spark: SparkSession, sfDir: String, corrupt: Boolean): DataFrame = {
    val lines = fromEventsWithId(spark, sfDir)
    if (!corrupt) lines.select("value")
    else lines.select(
      when(col("event_id") % 97 === 0,
        regexp_replace(col("value"), "\"op\":\"[UD]\"", "\"op\":\"X\""))
        .when(col("event_id") % 101 === 0,
          // keep the envelope's own closing brace: only the payload is broken
          regexp_replace(col("value"), "\"after\":\\{.*\\}$", "\"after\":\"XX\"}"))
        .otherwise(col("value")).as("value"))
  }

  /** The events-derived feed with the source `event_id` kept alongside each
    * line — for callers that stage the feed into deterministic phases (the
    * resume / exactly-once audit query splits it in two replays).
    */
  def fromEventsWithId(spark: SparkSession, sfDir: String): DataFrame = {
    // events.parquet is one row group, so without this the whole
    // parse+JSON-render pipeline below runs in ONE scan task; a round-robin
    // exchange of the raw rows (deterministic: sort-before-repartition) is
    // ~2 MB through the wire and lets the render use every core. Row→file
    // assignment shifts, which no oracle observes: every staged consumer's
    // result is a function of phase-level row SETS, not file placement.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val lines = ev.select(
      col("event_id"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast(StringType), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast(IntegerType) % 10).as("turn_idx"),
      col("event_type").as("role"),
      concat(col("event_type"), lit("#"), col("event_id").cast(StringType)).as("text"),
      col("value"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts_str"))
      .select(col("event_id"), to_json(struct(
        col("op"), col("lsn"), col("conv_id"), col("turn_idx"),
        when(col("op") =!= "D",
          struct(col("role"), col("text"), col("value"), col("ts_str").as("ts"))).as("after")))
        .as("value"))
    lines
  }

  def writeFeed(lines: DataFrame, dir: String, files: Int = 8): Unit =
    lines.select("value").repartition(files).write.mode(SaveMode.Overwrite).text(dir)
}
