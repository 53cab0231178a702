package graft

import graft.cdc.{FeedGen, Pipeline}
import graft.table.IceLite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the incremental read: after a staged two-phase
  * replay, measure `changesSince(vA)` against a full-table read — files
  * opened (the manifest zone-map pruning) and wall time. The claim under
  * test is the 100 TB one: an incremental consumer's cost tracks the CHANGED
  * data, not the table, because pre-cutoff entries are skipped without
  * opening a file. Run: `sbt "runMain graft.BenchChanges [sfDir]"`, or
  * `sbt "runMain graft.BenchChanges --synthetic [nEvents]"` for the
  * order-of-magnitude form (a FeedGen.synthetic feed — 120M events by
  * default, the sf1 scale the round-3 replay validated — staged 90/10 by
  * LSN into a 64-bucket table).
  */
object BenchChanges {
  def main(args: Array[String]): Unit = {
    val synthetic = args.headOption.contains("--synthetic")
    val spark = SparkSession.builder()
      .master("local[32]").appName("bench-changes")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/root/repo/target/bench-changes"
    val p = java.nio.file.Paths.get(base)
    if (java.nio.file.Files.exists(p))
      scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f)))

    // Phase 1: 90% of the feed (by LSN order); phase 2: the 10% tail — the
    // steady-state shape (a big table, a small new batch). Malformed lines
    // (null lsn, synthetic mode) ride in phase 1; they dead-letter either way.
    val (lines, cut, buckets, p1Files) =
      if (synthetic) {
        val nEvents = args.lift(1).map(_.toLong).getOrElse(120000000L)
        // Default keyspace (nEvents/200 convs × 20 turns) is CHURN-heavy:
        // every key is updated ~10× across the feed, so the 10% tail touches
        // ~half the table and the incremental read's cost tracks the
        // changed-ROW fraction. An optional third arg overrides nConvs; e.g.
        // nEvents/20 makes the feed INSERT-heavy (~1 event/key), the shape
        // where the tail is ~10% NEW keys and the manifest zone maps skip
        // whole pre-cutoff generations.
        val nConvs = args.lift(2).map(_.toInt)
          .getOrElse(math.max(1000, (nEvents / 200).toInt))
        // Optional fourth arg: phase-1 share in percent (default 90). 99
        // models the per-batch steady state — ONE small new batch against a
        // big converged table — where the incremental consumer's advantage
        // is the whole point.
        val cutPct = args.lift(3).map(_.toLong).getOrElse(90L)
        val l = FeedGen.synthetic(spark, None, nEvents,
            nConvs = nConvs, turnsPerConv = 20,
            nBatches = 10, filesPerBatch = 32)
          .select("value")
          .withColumn("_lsn", get_json_object(col("value"), "$.lsn").cast("long"))
        (l, nEvents * cutPct / 100, 64, 32)
      } else {
        val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
        val c = ev.agg(expr("percentile(event_id, 0.9)")).head.getDouble(0).toLong
        val l = FeedGen.fromEvents(spark, sfDir)
          .withColumn("_lsn", get_json_object(col("value"), "$.lsn").cast("long"))
        (l, c, 32, 16)
      }
    // Phase 1 replays as multiple micro-batches so the table carries real
    // commit history (delta generations), the steady-state layout an
    // incremental consumer prunes against.
    // Compaction deferred past this run's batches: the measurement is the
    // BETWEEN-compactions steady state (the overwhelming majority of
    // batches); the compaction-boundary case — where only the compacted
    // buckets pay a scan — is covered by IceLiteSpec.
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      numBuckets = buckets, maxFilesPerTrigger = Some(p1Files / 8),
      deadLetterDir = Some(s"$base/dead"),
      policy = graft.cdc.MergeApply.CompactionPolicy(
        factor = 1.0, minRows = 120000, maxDeltaFiles = 64))
    FeedGen.writeFeed(lines.filter(col("_lsn").isNull || col("_lsn") <= cut)
      .drop("_lsn"), s"$base/feed/p1", files = p1Files)
    val t1 = System.nanoTime()
    val p1Results = Pipeline.replay(spark, cfg)
    val p1Sec = (System.nanoTime() - t1) / 1e9
    val vA = IceLite.load(s"$base/table").version
    // Phase 2 runs inside a real write-audit-publish window: the audit
    // measurement below exercises the production gate, not a simulation.
    IceLite.beginStage(s"$base/table")
    FeedGen.writeFeed(lines.filter(col("_lsn") > cut).drop("_lsn"), s"$base/feed/p2",
      files = math.max(2, p1Files / 8))
    val t2 = System.nanoTime()
    val p2Results = Pipeline.replay(spark, cfg)
    val p2Sec = (System.nanoTime() - t2) / 1e9
    System.err.println(f"[bench-changes] p1 replay ${p1Sec}%.1fs, p2 replay ${p2Sec}%.1fs")

    // WAP audit gate: staged-net-change pass (zone-map-pruned to the staged
    // deltas) vs the naive full-table audit a gate WITHOUT incremental reads
    // would pay. Same constraints, same answer shape; the cost is the claim.
    val gateConstraints = Seq(
      "role_not_null" -> "role IS NOT NULL",
      "text_not_null" -> "text IS NOT NULL")
    val staged = graft.table.Audit.stagedViolations(spark, s"$base/table", gateConstraints)
    val headLive = IceLite.readSnapshot(spark, s"$base/table", IceLite.load(s"$base/table"))
    val fullGate = graft.table.Audit.violations(headLive, gateConstraints)
    val stagedFiles = staged.inputFiles.length
    val fullGateFiles = fullGate.inputFiles.length
    val ta = System.nanoTime(); staged.collect()
    val stagedSec = (System.nanoTime() - ta) / 1e9
    val tb = System.nanoTime(); fullGate.collect()
    val fullGateSec = (System.nanoTime() - tb) / 1e9
    println(f"[bench-audit] staged gate files=$stagedFiles ${stagedSec}%.2fs | " +
      f"full-table gate files=$fullGateFiles ${fullGateSec}%.2fs | " +
      f"file ratio ${fullGateFiles.toDouble / math.max(stagedFiles, 1)}%.1fx, " +
      f"time ratio ${fullGateSec / math.max(stagedSec, 1e-9)}%.1fx")
    IceLite.publish(s"$base/table")

    val snap = IceLite.load(s"$base/table")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val full = IceLite.readStored(spark, s"$base/table", snap)
    val inc = IceLite.changesSince(spark, s"$base/table", vA)
    val fullFiles = full.inputFiles.length
    val incFiles = inc.inputFiles.length
    val (fullRows, fullSec) = timed(full.count())
    val (incRows, incSec) = timed(inc.count())
    println(f"[bench-changes] table files=$fullFiles rows=$fullRows read=${fullSec}%.2fs | " +
      f"changesSince(v$vA) files=$incFiles rows=$incRows read=${incSec}%.2fs | " +
      f"file ratio ${fullFiles.toDouble / math.max(incFiles, 1)}%.1fx")

    // ---- classified CDF (versionDiff's shape) vs the naive full-state diff.
    // Engine: new side = changesSince (zone-map-pruned), before side = vA
    // read RESTRICTED to the touched keys' buckets. Naive: LWW-fold BOTH
    // full states and full-outer-join them — what a consumer without an
    // incremental cursor pays. When the tail's keys spread across all
    // buckets (the churn regime here) the bucket term cannot prune, so the
    // measured gap isolates the changed-side term; clustered-key tails
    // additionally drop the before-scan (IceLiteSpec pins that pruning).
    val changed = inc.select(col("conv_id"), col("turn_idx"),
      col(IceLite.DeletedCol).as("del"), col("text").as("new_text"))
    val snapA = IceLite.loadVersion(s"$base/table", f"v$vA%05d.json")
    val touched = changed
      .select(IceLite.bucketExprFor(snapA, col("conv_id")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val before = IceLite.readStored(spark, s"$base/table", snapA, Some(touched))
      .filter(!col(IceLite.DeletedCol))
      .select(col("conv_id"), col("turn_idx"), col("text").as("old_text"))
    val diff = changed.join(before, Seq("conv_id", "turn_idx"), "left_outer")
      .withColumn("change",
        when(!col("del") && col("old_text").isNull, "insert")
          .when(!col("del"), "update")
          .when(col("old_text").isNotNull, "delete"))
      .filter(col("change").isNotNull)
    val diffFiles = changed.inputFiles.length + before.inputFiles.length
    val (diffRows, diffSec) = timed(diff.count())
    val headLive2 = IceLite.readSnapshot(spark, s"$base/table", snap)
      .select(col("conv_id"), col("turn_idx"), col("text").as("new_text"))
    val aLive = IceLite.readAt(spark, s"$base/table", vA)
      .select(col("conv_id"), col("turn_idx"), col("text").as("old_text"))
    val naive = aLive.join(headLive2, Seq("conv_id", "turn_idx"), "full_outer")
      .withColumn("change",
        when(col("old_text").isNull && col("new_text").isNotNull, "insert")
          .when(col("old_text").isNotNull && col("new_text").isNull, "delete")
          .when(col("old_text") =!= col("new_text"), "update"))
      .filter(col("change").isNotNull)
    val naiveFiles = aLive.inputFiles.length + headLive2.inputFiles.length
    val (naiveRows, naiveSec) = timed(naive.count())
    println(f"[bench-vdiff] cdf files=$diffFiles (buckets ${touched.size}/${snapA.numBuckets}) " +
      f"rows=$diffRows ${diffSec}%.2fs | naive full-state diff files=$naiveFiles " +
      f"rows=$naiveRows ${naiveSec}%.2fs | time ratio ${naiveSec / math.max(diffSec, 1e-9)}%.1fx")

    // ---- snapshot export (migration): the fold ratio and the rebootstrap
    // cost vs the full-history replay this run already paid (p1+p2).
    val tx = System.nanoTime()
    val exported = graft.cdc.Feed.renderSnapshot(spark, s"$base/table")
    FeedGen.writeFeed(exported, s"$base/export", files = p1Files)
    val exportSec = (System.nanoTime() - tx) / 1e9
    val exportLines = spark.read.text(s"$base/export").count()
    val tr = System.nanoTime()
    Pipeline.replay(spark, Pipeline.Config(s"$base/export", s"$base/table2",
      s"$base/ckpt2", numBuckets = buckets, maxFilesPerTrigger = Some(p1Files)))
    val rebootSec = (System.nanoTime() - tr) / 1e9
    val historyEvents = (p1Results ++ p2Results).map(_.events).sum
    println(f"[bench-export] exported $exportLines live rows in ${exportSec}%.1fs, " +
      f"rebootstrap replay ${rebootSec}%.1fs | full-history replay was ${p1Sec + p2Sec}%.1fs " +
      f"over $historyEvents events | fold ${historyEvents.toDouble / math.max(exportLines, 1)}%.1fx, " +
      f"migration speedup ${(p1Sec + p2Sec) / math.max(exportSec + rebootSec, 1e-9)}%.1fx")
    spark.stop()
  }
}
