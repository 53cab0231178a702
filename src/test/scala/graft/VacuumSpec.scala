package graft

import graft.cdc.MergeApply
import graft.cdc.MergeApply.CompactionPolicy
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class VacuumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(lsn: Long, conv: String, text: String): String =
    s"""{"op":"U","lsn":$lsn,"conv_id":"$conv","turn_idx":0,"after":{"text":"$text"}}"""

  test("vacuum removes data dirs of expired snapshots, keeps the live ones; reads unaffected") {
    val dir = TestSpark.freshDir("vacuum")
    IceLite.create(dir, numBuckets = 1)
    val eager = CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 1) // compact every batch
    MergeApply.applyRaw(spark, dir, Seq(ev(1, "a", "v1")).toDF("value"), 0L, policy = eager)
    MergeApply.applyRaw(spark, dir, Seq(ev(2, "a", "v2")).toDF("value"), 1L, policy = eager)
    MergeApply.applyRaw(spark, dir, Seq(ev(3, "b", "w")).toDF("value"), 2L, policy = eager)

    val before = Files.list(Paths.get(dir, "data")).iterator().asScala.map(_.getFileName.toString).toSet
    assert(before.size >= 3) // one base dir per compacting batch

    val deleted = IceLite.vacuum(dir, keepVersions = 1)
    assert(deleted.nonEmpty)
    val after = Files.list(Paths.get(dir, "data")).iterator().asScala.map(_.getFileName.toString).toSet
    val snap = IceLite.load(dir)
    val live = (snap.buckets ++ snap.deltas).map(_.dir.split("/")(1)).toSet
    assert(after == live, s"survivors must be exactly the referenced dirs: after=$after live=$live")

    val rows = IceLite.read(spark, dir).orderBy("conv_id").collect()
    assert(rows.map(r => (r.getString(0), r.getAs[String]("text"))).toSeq ==
      Seq(("a", "v2"), ("b", "w")))
  }

  test("vacuum racing a live commit: future (in-flight) data dirs survive") {
    val dir = TestSpark.freshDir("vacuum-race")
    IceLite.create(dir, numBuckets = 1)
    val eager = CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 1)
    MergeApply.applyRaw(spark, dir, Seq(ev(1, "a", "v1")).toDF("value"), 0L, policy = eager)
    MergeApply.applyRaw(spark, dir, Seq(ev(2, "a", "v2")).toDF("value"), 1L, policy = eager)
    // Simulate an in-flight writer that has written its data dir for the
    // NEXT version but not yet committed the snapshot.
    val snap = IceLite.load(dir)
    val futureDir = Paths.get(dir, "data", f"v${snap.version + 1}%05d-delta", "_bucket=0")
    Files.createDirectories(futureDir)
    Files.write(futureDir.resolve("part-0.parquet"), Array[Byte](1, 2, 3))

    IceLite.vacuum(dir, keepVersions = 1)
    assert(Files.exists(futureDir), "vacuum must never delete future versions' dirs")
    // the expired v1 dir IS gone
    val remaining = Files.list(Paths.get(dir, "data")).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(!remaining.exists(_.startsWith("v00001")), s"expired dir survived: $remaining")
  }

  test("pipeline auto-vacuum: retention keeps metadata+data bounded over a long tail") {
    import graft.cdc.{FeedGen, Pipeline}
    val base = TestSpark.freshDir("vacuum-pipeline")
    FeedGen.synthetic(spark, Some(s"$base/feed"), 3000, nConvs = 20,
      turnsPerConv = 10, nBatches = 12)
    val results = Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed", s"$base/table", s"$base/ckpt", numBuckets = 4,
      maxFilesPerTrigger = Some(1),
      policy = CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 1),
      retainVersions = Some(2), vacuumEvery = 4))
    assert(results.size >= 8 && results.forall(_.committed))
    // every batch compacted (eager policy) → without vacuum there would be
    // one v*-base dir per batch; retention keeps only the recent window
    val dirs = Files.list(Paths.get(s"$base/table", "data")).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(dirs.size < results.size,
      s"auto-vacuum should have expired old dirs: ${dirs.toSeq.sorted}")
    // and the converged table still matches the single-threaded oracle
    val lines = spark.read.textFile(s"$base/feed").collect().toSeq
    val oracle = GoldenOracle.converge(lines)
    val table = IceLite.read(spark, s"$base/table")
    assert(table.count() == oracle.size)
  }

  test("vacuum keepVersions=2 retains the previous snapshot's dirs (time travel window)") {
    val dir = TestSpark.freshDir("vacuum-keep2")
    IceLite.create(dir, numBuckets = 1)
    val eager = CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 1)
    MergeApply.applyRaw(spark, dir, Seq(ev(1, "a", "v1")).toDF("value"), 0L, policy = eager)
    MergeApply.applyRaw(spark, dir, Seq(ev(2, "a", "v2")).toDF("value"), 1L, policy = eager)
    IceLite.vacuum(dir, keepVersions = 2)
    // v1's base dir still present → time travel to v1 still reads
    val old = IceLite.loadVersion(dir, "v00001.json")
    val rows = IceLite.readSnapshot(spark, dir, old).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("text") == "v1")
  }
}
