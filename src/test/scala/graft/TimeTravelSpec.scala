package graft

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot isolation as a READ API: `IceLite.readAt(version)` must return
  * a historical snapshot's live rows bit-for-bit no matter what the table
  * did afterwards — more deltas, a forced compaction (which REWRITES the
  * buckets old snapshots reference), schema evolution (readAt returns the
  * OLD schema) — because snapshots are immutable manifests over immutable
  * files. The retention boundary is explicit: `vacuum(keepVersions = k)`
  * keeps the last k snapshots readable and expires older ones.
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def line(op: String, lsn: Long, k: Int, txt: String) =
    if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"c-$k","turn_idx":0}"""
    else s"""{"op":"$op","lsn":$lsn,"conv_id":"c-$k","turn_idx":0,"after":{"role":"r","text":"$txt"}}"""

  test("readAt returns each historical snapshot unchanged through deltas, compaction, evolution, and vacuum retention") {
    import spark.implicits._
    val dir = TestSpark.freshDir("timetravel")
    IceLite.create(dir, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType))), numBuckets = 4)

    def liveRows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.select("conv_id", "text").as[(String, String)].collect().toSeq.sorted

    // v1: 30 inserts.
    MergeApply.applyRaw(spark, dir,
      (0 until 30).map(k => line("I", 100 + k, k, s"v0-$k")).toDF("value"), 0L)
    val v1 = IceLite.load(dir).version
    val at1 = liveRows(IceLite.read(spark, dir))

    // v2: overlapping updates + deletes.
    MergeApply.applyRaw(spark, dir,
      ((0 until 10).map(k => line("U", 200 + k, k, s"v1-$k")) ++
        (25 until 30).map(k => line("D", 220 + k, k, ""))).toDF("value"), 1L)
    val v2 = IceLite.load(dir).version
    val at2 = liveRows(IceLite.read(spark, dir))

    // v3: more updates under a FORCED full compaction — every bucket is
    // rewritten, so v1/v2's files are now referenced by old snapshots only.
    MergeApply.applyRaw(spark, dir,
      (5 until 15).map(k => line("U", 300 + k, k, s"v2-$k")).toDF("value"), 2L,
      policy = MergeApply.CompactionPolicy(factor = 0.0, minRows = 1))
    val v3 = IceLite.load(dir).version
    val at3 = liveRows(IceLite.read(spark, dir))

    // v4: schema evolution — a new `tool` column arrives.
    MergeApply.applyRaw(spark, dir, Seq(
      s"""{"op":"U","lsn":400,"conv_id":"c-1","turn_idx":0,"after":{"role":"r","text":"v3-1","tool":"grep"}}""")
      .toDF("value"), 3L)

    // Every historical read is bit-identical to what the live read showed
    // at that version, and pre-evolution snapshots carry the OLD schema.
    assert(liveRows(IceLite.readAt(spark, dir, v1)) === at1)
    assert(liveRows(IceLite.readAt(spark, dir, v2)) === at2)
    assert(liveRows(IceLite.readAt(spark, dir, v3)) === at3)
    assert(!IceLite.readAt(spark, dir, v1).columns.contains("tool"))
    assert(IceLite.read(spark, dir).columns.contains("tool"))

    // Retention: keep the last 2 snapshots → v3 still readable, v1 expired
    // (its files deleted), and the live read is untouched.
    val cur = IceLite.load(dir).version
    IceLite.vacuum(dir, keepVersions = cur - v3 + 1)
    assert(liveRows(IceLite.readAt(spark, dir, v3)) === at3)
    val expired = intercept[Exception] {
      IceLite.readAt(spark, dir, v1).collect()
    }
    assert(expired != null)
    assert(IceLite.read(spark, dir).count() === at3.size)
  }
}
