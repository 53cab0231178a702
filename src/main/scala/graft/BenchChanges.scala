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
  * opening a file. Run: `sbt "runMain graft.BenchChanges [sfDir]"`.
  */
object BenchChanges {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    // steady-state shape (a big table, a small new batch).
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val cut = ev.agg(expr("percentile(event_id, 0.9)")).head.getDouble(0).toLong
    val lines = FeedGen.fromEvents(spark, sfDir)
      .withColumn("_lsn", get_json_object(col("value"), "$.lsn").cast("long"))
    // Phase 1 replays as EIGHT micro-batches so the table carries real
    // commit history (8 delta generations), the steady-state layout an
    // incremental consumer prunes against.
    // Compaction deferred past this run's 9 batches: the measurement is the
    // BETWEEN-compactions steady state (the overwhelming majority of
    // batches); the compaction-boundary case — where only the compacted
    // buckets pay a scan — is covered by IceLiteSpec.
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      numBuckets = 32, maxFilesPerTrigger = Some(2),
      policy = graft.cdc.MergeApply.CompactionPolicy(
        factor = 1.0, minRows = 120000, maxDeltaFiles = 64))
    FeedGen.writeFeed(lines.filter(col("_lsn") <= cut).drop("_lsn"), s"$base/feed/p1", files = 16)
    Pipeline.replay(spark, cfg)
    val vA = IceLite.load(s"$base/table").version
    FeedGen.writeFeed(lines.filter(col("_lsn") > cut).drop("_lsn"), s"$base/feed/p2", files = 2)
    Pipeline.replay(spark, cfg)

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
    spark.stop()
  }
}
