package graft

import graft.cdc.{Feed, FeedGen, Pipeline}
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the migration verb: [[Feed.renderSnapshot]] exports a table's live
  * rows as a folded bootstrap feed, and replaying that feed into a FRESH
  * table with a DIFFERENT bucket count reproduces the live view
  * bit-identically (values, LSNs and payload schema) — the export ∘ replay
  * path that moves a 10^10-row table across clusters or layout generations
  * in O(live rows), composing with the bootstrap-handoff tail for the
  * change stream.
  */
class SnapshotExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("export ∘ replay onto a different bucket count is bit-identical") {
    val base = TestSpark.freshDir("snapexport")
    val src = s"$base/src"
    FeedGen.writeFeed(FeedGen.fromEvents(spark, sf), s"$base/feed", files = 4)
    Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed", src, s"$base/ckpt", numBuckets = 16, maxFilesPerTrigger = Some(2)))

    val exported = Feed.renderSnapshot(spark, src)
    val liveCount = IceLite.read(spark, src).count()
    assert(exported.count() == liveCount, "export must be folded: one line per live key")

    val dst = s"$base/dst"
    FeedGen.writeFeed(exported, s"$base/feed2", files = 4)
    Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed2", dst, s"$base/ckpt2", numBuckets = 8, maxFilesPerTrigger = Some(2)))

    def stored(path: String) = {
      val snap = IceLite.load(path)
      IceLite.readStored(spark, path, snap)
        .filter(!col(IceLite.DeletedCol))
        .select("conv_id", "turn_idx", "role", "text", "value", "ts", IceLite.LsnCol)
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
          Option(r.get(4)), Option(r.get(5)), r.getLong(6))).toSet
    }
    assert(stored(dst) == stored(src), "live rows, values and LSNs must round-trip")

    val srcPayload = IceLite.load(src).payloadSchema.fields
      .map(f => f.name -> f.dataType).toSet
    val dstPayload = IceLite.load(dst).payloadSchema.fields
      .map(f => f.name -> f.dataType).toSet
    assert(dstPayload == srcPayload, "payload schema must survive the round-trip")
    assert(IceLite.load(dst).numBuckets == 8)
  }
}
