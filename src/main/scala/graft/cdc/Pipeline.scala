package graft.cdc

import graft.table.IceLite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The Structured Streaming CDC pipeline: tail a JSONL change-feed directory,
  * apply each micro-batch to the icelite table via MergeApply inside
  * foreachBatch, checkpointed. The reference's continuous onTrigger pull loop
  * with resumable cursors (LDAP paged cookie loop
  * InsecureLDAPProcessor.java:541-585; HTTP pagination
  * InsecureInvokeHTTP.java:1291-1507) maps to the file source's offset log:
  * restart resumes from the checkpoint, and MergeApply's batchId-keyed
  * idempotent commits make the sink exactly-once under replay — the
  * epoch-tagged idempotent-sink recipe of the Structured Streaming paper
  * (Armbrust et al., "Structured Streaming: A Declarative API for Real-Time
  * Applications in Apache Spark", SIGMOD 2018, §prefix integrity).
  */
object Pipeline {

  /** `retainVersions`: when set, expired snapshots' data dirs are vacuumed
    * automatically every `vacuumEvery` commits during replay/tail (keeping
    * the last `retainVersions` snapshots readable for time travel). Off by
    * default — a long-running tail SHOULD set it, or the merge-on-read
    * table accumulates every superseded delta/base file forever.
    *
    * `merge`: `"lww"` (whole-row last-writer-wins, the default) or
    * `"patch"` (partial-update: per-attribute I/U/R/D via [[PatchApply]]'s
    * setter-LSN fold — the reference's MODIFY flow as a STREAMING job, with
    * the same checkpoint resume, dead letter, exactly-once and evolution).
    */
  case class Config(feedDir: String, tablePath: String, checkpointDir: String,
                    deadLetterDir: Option[String] = None,
                    lineageDir: Option[String] = None,
                    numBuckets: Int = 64,
                    maxFilesPerTrigger: Option[Int] = None,
                    policy: MergeApply.CompactionPolicy = MergeApply.CompactionPolicy(),
                    retainVersions: Option[Int] = None,
                    vacuumEvery: Int = 8,
                    merge: String = "lww") {
    require(merge == "lww" || merge == "patch", s"unknown merge mode: $merge")
    require(vacuumEvery > 0, s"vacuumEvery must be positive, got $vacuumEvery")
    def isPatch: Boolean = merge == "patch"
  }

  private def ensureTable(cfg: Config): Unit =
    if (!IceLite.exists(cfg.tablePath)) {
      if (cfg.isPatch) PatchApply.create(cfg.tablePath, numBuckets = cfg.numBuckets)
      else IceLite.create(cfg.tablePath, numBuckets = cfg.numBuckets)
      ()
    }

  /** Auto-vacuum hook: runs after a committed batch when the new snapshot
    * version crosses a `vacuumEvery` boundary. Safe alongside the live
    * writer: vacuum never touches dirs of versions above the loaded
    * snapshot (in-flight commits) nor dirs referenced by retained ones.
    */
  private def maybeVacuum(cfg: Config, r: MergeApply.ApplyResult): Unit =
    cfg.retainVersions.foreach { keep =>
      if (r.committed && r.version % cfg.vacuumEvery == 0)
        IceLite.vacuum(cfg.tablePath, keep)
    }

  /** Replay everything currently in the feed, then stop (Trigger.AvailableNow).
    * Safe to call repeatedly / after a crash: the checkpoint + committed
    * batchIds converge to the same final table state.
    */
  def replay(spark: SparkSession, cfg: Config): Seq[MergeApply.ApplyResult] = {
    ensureTable(cfg)
    val results = scala.collection.mutable.ArrayBuffer.empty[MergeApply.ApplyResult]

    var reader = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
    cfg.maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val raw = reader
      .option("recursiveFileLookup", "true")
      .text(cfg.feedDir)

    val q = raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val r = MergeApply.applyRaw(spark, cfg.tablePath, batch, batchId,
          cfg.deadLetterDir, cfg.lineageDir, cfg.policy, patch = cfg.isPatch)
        maybeVacuum(cfg, r)
        results.synchronized { results += r }
        ()
      }
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    results.toSeq
  }

  /** Per-op watermarked window metrics over raw feed lines — the
    * transformation behind [[tailMetrics]], factored out so the spec drives
    * it from a MemoryStream. Event time = the payload's `ts` field; lines
    * without a parseable event time (deletes, malformed) are excluded —
    * they are fully accounted in the apply path's lineage instead.
    */
  def opWindowMetrics(lines: org.apache.spark.sql.DataFrame,
                      windowLength: String = "1 minute",
                      delay: String = "2 minutes"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val parsed = Feed.parse(lines)
      .withColumn("event_ts", to_timestamp(get_json_object(col("after"), "$.ts")))
      .filter(col("event_ts").isNotNull)
    graft.streaming.WindowedStats
      .eventsPerWindow(parsed, "event_ts", delay, windowLength, Seq(col("op")))
      .select(col("window.start").as("w_start"), col("op"), col("n"),
        col("first_ts"), col("last_ts"))
  }

  /** Live-tail self-instrumentation (the streaming analogue of the
    * reference's per-response timing metrics,
    * InsecureInvokeHTTP.java:1378-1403): a SECOND streaming query over the
    * same feed, emitting watermarked per-op tumbling-window counts to
    * `<lineageDir>/windows` as finalized (append-mode) parquet. Window
    * state is bounded by the watermark, so it tails forever; it shares
    * nothing with the apply query beyond the source directory.
    */
  def tailMetrics(spark: SparkSession, cfg: Config,
                  windowLength: String = "1 minute", delay: String = "2 minutes",
                  intervalMs: Long = 1000L)
                 : org.apache.spark.sql.streaming.StreamingQuery = {
    val dir = cfg.lineageDir.getOrElse(
      throw new IllegalArgumentException("tailMetrics requires cfg.lineageDir"))
    var reader = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
    cfg.maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val raw = reader.option("recursiveFileLookup", "true").text(cfg.feedDir)
    opWindowMetrics(raw, windowLength, delay)
      .writeStream
      .format("parquet")
      .option("path", s"$dir/windows")
      .option("checkpointLocation", s"${cfg.checkpointDir}-metrics")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()
  }

  /** Live tail: same pipeline, continuous micro-batches (St1 — the
    * reference's unbounded onTrigger pull loop). Returns the running query;
    * caller owns its lifecycle. `onBatch` observes each apply result
    * (metrics hook).
    */
  def tail(spark: SparkSession, cfg: Config,
           intervalMs: Long = 1000L,
           onBatch: MergeApply.ApplyResult => Unit = _ => ())
          : org.apache.spark.sql.streaming.StreamingQuery = {
    ensureTable(cfg)
    var reader = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
    cfg.maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    reader.option("recursiveFileLookup", "true")
      .text(cfg.feedDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val r = MergeApply.applyRaw(spark, cfg.tablePath, batch, batchId,
          cfg.deadLetterDir, cfg.lineageDir, cfg.policy, patch = cfg.isPatch)
        maybeVacuum(cfg, r)
        onBatch(r)
        ()
      }
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()
  }
}
