package graft

import graft.cdc.MergeApply
import graft.cdc.MergeApply.CompactionPolicy
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite

/** Direct MergeApply tests: merge-on-read delta accounting, deterministic
  * compaction, crash-injection exactly-once, tombstone-vs-late-update.
  */
class MergeApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lines(ls: String*) = ls.toDF("value")

  private def ev(op: String, lsn: Long, conv: String, turn: Int, text: String = "t"): String =
    if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn}"""
    else s"""{"op":"$op","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn,"after":{"role":"user","text":"$text"}}"""

  private def rows(table: String): Map[(String, Int), String] =
    IceLite.read(spark, table).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> r.getAs[String]("text"))
      .toMap

  test("applyChanges (typed path) converges identically to applyRaw, evolution included") {
    val rawDir = TestSpark.freshDir("ma-typed-raw")
    val typedDir = TestSpark.freshDir("ma-typed")
    IceLite.create(rawDir, numBuckets = 4)
    IceLite.create(typedDir, numBuckets = 4)
    // Batch 0: (role, text) payload; batch 1 evolves — adds `score` (double)
    // and deletes one key; batch 2 replays batch 1 (exactly-once no-op).
    val raw0 = lines(ev("I", 1, "a", 0, "x"), ev("I", 2, "b", 1, "y"), ev("U", 3, "a", 0, "x2"))
    val raw1 = lines(
      """{"op":"U","lsn":4,"conv_id":"b","turn_idx":1,"after":{"role":"user","text":"y2","score":1.5}}""",
      """{"op":"D","lsn":5,"conv_id":"a","turn_idx":0}""")
    MergeApply.applyRaw(spark, rawDir, raw0, 0L)
    MergeApply.applyRaw(spark, rawDir, raw1, 1L)

    val typed0 = Seq(("I", 1L, "a", 0, "user", "x"), ("I", 2L, "b", 1, "user", "y"),
      ("U", 3L, "a", 0, "user", "x2"))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text")
    val typed1 = Seq(("U", 4L, "b", 1, Some("user"), Some("y2"), Some(1.5)),
      ("D", 5L, "a", 0, None, None, None))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "score")
    val t0 = MergeApply.applyChanges(spark, typedDir, typed0, 0L)
    assert(t0.committed && t0.events == 3 && t0.malformed == 0)
    val t1 = MergeApply.applyChanges(spark, typedDir, typed1, 1L)
    assert(t1.schemaChanged.contains("score"))
    assert(MergeApply.applyChanges(spark, typedDir, typed1, 1L).committed == false) // epoch replay
    val snapT = IceLite.load(typedDir)
    assert(snapT.schemaV == 3 && snapT.schema.fieldNames.contains("score"))
    def state(dir: String) = IceLite.read(spark, dir)
      .select("conv_id", "turn_idx", "role", "text")
      .collect().map(_.toSeq).toSet
    assert(state(typedDir) == state(rawDir))
    assert(IceLite.read(spark, typedDir).filter($"conv_id" === "b")
      .select("score").as[Double].head() == 1.5)
  }

  test("delta append path: batches write deltas, no base rewrite until threshold") {
    val dir = TestSpark.freshDir("ma-delta")
    IceLite.create(dir, numBuckets = 4)
    val lazyPolicy = CompactionPolicy(factor = 1e9, minRows = Long.MaxValue / 2, maxDeltaFiles = 1000)
    val r1 = MergeApply.applyRaw(spark, dir, lines(ev("I", 1, "a", 0, "x"), ev("I", 2, "b", 0, "y")), 0L,
      policy = lazyPolicy)
    assert(r1.committed && r1.deltaRows == 2 && r1.compactedBuckets == 0)
    val r2 = MergeApply.applyRaw(spark, dir, lines(ev("U", 3, "a", 0, "x2")), 1L, policy = lazyPolicy)
    assert(r2.deltaRows == 1 && r2.compactedBuckets == 0)
    val snap = IceLite.load(dir)
    assert(snap.buckets.isEmpty && snap.deltas.nonEmpty) // merge-on-read only
    assert(rows(dir) == Map(("a", 0) -> "x2", ("b", 0) -> "y")) // LWW across deltas
  }

  test("compaction: maxDeltaFiles bound triggers base rewrite and clears deltas") {
    val dir = TestSpark.freshDir("ma-compact")
    IceLite.create(dir, numBuckets = 1) // single bucket → every batch touches it
    val policy = CompactionPolicy(factor = 1e9, minRows = Long.MaxValue / 2, maxDeltaFiles = 2)
    MergeApply.applyRaw(spark, dir, lines(ev("I", 1, "a", 0, "v1")), 0L, policy = policy)
    MergeApply.applyRaw(spark, dir, lines(ev("U", 2, "a", 0, "v2")), 1L, policy = policy)
    assert(IceLite.load(dir).deltas.size == 2)
    // third delta would exceed maxDeltaFiles=2 → compacts instead
    val r3 = MergeApply.applyRaw(spark, dir, lines(ev("U", 3, "a", 0, "v3"), ev("I", 4, "b", 1, "w")), 2L,
      policy = policy)
    assert(r3.compactedBuckets == 1 && r3.deltaRows == 0)
    val snap = IceLite.load(dir)
    assert(snap.deltas.isEmpty && snap.buckets.size == 1)
    assert(snap.buckets.head.rows == 2) // a/0 LWW-merged + b/1
    assert(rows(dir) == Map(("a", 0) -> "v3", ("b", 1) -> "w"))
  }

  test("rows-based compaction threshold (minRows + factor × base)") {
    val dir = TestSpark.freshDir("ma-compact-rows")
    IceLite.create(dir, numBuckets = 1)
    val policy = CompactionPolicy(factor = 0.0, minRows = 3, maxDeltaFiles = 1000)
    MergeApply.applyRaw(spark, dir, lines(ev("I", 1, "a", 0), ev("I", 2, "b", 0)), 0L, policy = policy)
    assert(IceLite.load(dir).deltas.nonEmpty) // 2 < 3 → delta
    val r = MergeApply.applyRaw(spark, dir, lines(ev("I", 3, "c", 0)), 1L, policy = policy)
    assert(r.compactedBuckets == 1) // pending 2 + new 1 ≥ 3 → compact
    assert(IceLite.load(dir).deltas.isEmpty)
  }

  test("all-malformed batch: epoch still committed (exactly-once), no data written") {
    val dir = TestSpark.freshDir("ma-allbad")
    IceLite.create(dir, numBuckets = 2)
    val r = MergeApply.applyRaw(spark, dir,
      lines("not json at all", """{"op":"X","lsn":1,"conv_id":"a","turn_idx":0}"""), 0L,
      deadLetterDir = Some(s"$dir/_dead"))
    assert(r.committed && r.events == 2 && r.malformed == 2 && r.applied == 0)
    val snap = IceLite.load(dir)
    assert(snap.version == 1 && snap.hasBatch(0L) && snap.batchWatermark == 0L)
    assert(snap.buckets.isEmpty && snap.deltas.isEmpty)
    assert(spark.read.parquet(s"$dir/_dead").count() == 2)
    // replaying the committed empty epoch is a no-op
    assert(!MergeApply.applyRaw(spark, dir, lines("not json at all"), 0L).committed)
  }

  test("crash between data write and snapshot commit → replay converges (exactly-once)") {
    val dir = TestSpark.freshDir("ma-crash")
    IceLite.create(dir, numBuckets = 2)
    MergeApply.applyRaw(spark, dir, lines(ev("I", 1, "a", 0, "base")), 0L)
    val committedMeta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "meta", "_current")), "UTF-8")
    // Batch 1 fully applies...
    MergeApply.applyRaw(spark, dir, lines(ev("U", 2, "a", 0, "crashed")), 1L)
    // ...but we simulate a crash BEFORE the commit point by reverting the
    // _current pointer (data files of the uncommitted batch remain on disk).
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "meta", "_current"),
      committedMeta.getBytes("UTF-8"))
    assert(rows(dir) == Map(("a", 0) -> "base")) // readers never saw the crash
    // Replay of the same batch (same batchId, as foreachBatch would) —
    // deterministic paths mean stale files are overwritten, state converges.
    val r = MergeApply.applyRaw(spark, dir, lines(ev("U", 2, "a", 0, "crashed")), 1L)
    assert(r.committed)
    assert(rows(dir) == Map(("a", 0) -> "crashed"))
    // And a second replay of the now-committed batch is a no-op.
    val r2 = MergeApply.applyRaw(spark, dir, lines(ev("U", 2, "a", 0, "crashed")), 1L)
    assert(!r2.committed)
  }

  test("tombstone out-ranks a late lower-LSN update arriving in a later batch") {
    val dir = TestSpark.freshDir("ma-tomb")
    IceLite.create(dir, numBuckets = 2)
    MergeApply.applyRaw(spark, dir, lines(ev("I", 10, "a", 0, "alive")), 0L)
    MergeApply.applyRaw(spark, dir, lines(ev("D", 30, "a", 0)), 1L)
    assert(rows(dir).isEmpty)
    // late update with lsn 20 < 30 arrives after the delete → must stay dead
    MergeApply.applyRaw(spark, dir, lines(ev("U", 20, "a", 0, "zombie")), 2L)
    assert(rows(dir).isEmpty, "late lower-LSN update must lose to the tombstone")
    // but a genuinely newer update resurrects
    MergeApply.applyRaw(spark, dir, lines(ev("U", 40, "a", 0, "back")), 3L)
    assert(rows(dir) == Map(("a", 0) -> "back"))
  }

  test("compaction preserves tombstone arbitration (delete survives the base rewrite)") {
    val dir = TestSpark.freshDir("ma-tomb-compact")
    IceLite.create(dir, numBuckets = 1)
    val policy = CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 1000) // compact every batch
    MergeApply.applyRaw(spark, dir, lines(ev("I", 10, "a", 0)), 0L, policy = policy)
    MergeApply.applyRaw(spark, dir, lines(ev("D", 30, "a", 0)), 1L, policy = policy)
    assert(IceLite.load(dir).deltas.isEmpty) // tombstone now lives in the BASE
    MergeApply.applyRaw(spark, dir, lines(ev("U", 20, "a", 0, "zombie")), 2L, policy = policy)
    assert(rows(dir).isEmpty, "tombstone must survive compaction and beat the late update")
  }
}
