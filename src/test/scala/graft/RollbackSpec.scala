package graft

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Point-in-time recovery: `IceLite.rollback(toVersion)` commits a NEW
  * snapshot carrying the old state — data AND exactly-once epoch watermark —
  * so (1) the live read returns the old rows, (2) the rolled-back epochs are
  * no longer "committed" and a re-apply actually commits instead of
  * no-opping, converging to the pre-rollback final state bit-for-bit, and
  * (3) history is never rewritten: the rolled-over versions stay readable
  * via readAt and the version counter keeps climbing.
  */
class RollbackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def line(op: String, lsn: Long, k: Int, txt: String) =
    if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"c-$k","turn_idx":0}"""
    else s"""{"op":"$op","lsn":$lsn,"conv_id":"c-$k","turn_idx":0,"after":{"role":"r","text":"$txt"}}"""

  test("rollback restores state and epoch watermark; re-apply converges bit-identically") {
    import spark.implicits._
    val dir = TestSpark.freshDir("rollback")
    IceLite.create(dir, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType))), numBuckets = 4)

    def rows(): Seq[(String, String)] = IceLite.read(spark, dir)
      .select("conv_id", "text").as[(String, String)].collect().toSeq.sorted

    val b0 = (0 until 20).map(k => line("I", 100 + k, k, s"v0-$k"))
    val b1 = (5 until 12).map(k => line("U", 200 + k, k, s"v1-$k")) ++
      (15 until 20).map(k => line("D", 230 + k, k, ""))
    MergeApply.applyRaw(spark, dir, b0.toDF("value"), 0L)
    val v1 = IceLite.load(dir).version
    val at1 = rows()
    MergeApply.applyRaw(spark, dir, b1.toDF("value"), 1L)
    val v2 = IceLite.load(dir).version
    val finalRows = rows()
    assert(finalRows !== at1)

    // Roll back over batch 1: live state = batch-0 state, epoch 1 forgotten,
    // version strictly advances (history preserved, not rewritten).
    val rolled = IceLite.rollback(dir, v1)
    assert(rolled.version === v2 + 1)
    assert(rows() === at1)
    assert(IceLite.load(dir).hasBatch(0L))
    assert(!IceLite.load(dir).hasBatch(1L))

    // The rolled-over snapshot is still time-travel readable.
    assert(IceLite.readAt(spark, dir, v2)
      .select("conv_id", "text").as[(String, String)].collect().toSeq.sorted
      === finalRows)

    // Recovery: re-applying the rolled-back epoch COMMITS (the guard no
    // longer sees it) and converges to the pre-rollback state bit-for-bit;
    // re-applying the pre-rollback epoch still no-ops.
    val res0 = MergeApply.applyRaw(spark, dir, b0.toDF("value"), 0L)
    assert(!res0.committed, "pre-rollback epoch must still no-op")
    val res1 = MergeApply.applyRaw(spark, dir, b1.toDF("value"), 1L)
    assert(res1.committed, "rolled-back epoch must re-apply")
    assert(rows() === finalRows)

    // Guard rails: out-of-range targets refuse.
    intercept[IllegalArgumentException] {
      IceLite.rollback(dir, IceLite.load(dir).version + 1)
    }
  }

  test("changesBetween across a rollback fails loudly instead of returning an empty diff") {
    import spark.implicits._
    val dir = TestSpark.freshDir("rollback-changes")
    IceLite.create(dir, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType))), numBuckets = 2)
    MergeApply.applyRaw(spark, dir,
      (0 until 5).map(k => line("I", 100 + k, k, s"v0-$k")).toDF("value"), 0L) // v1
    MergeApply.applyRaw(spark, dir,
      (0 until 5).map(k => line("U", 200 + k, k, s"v1-$k")).toDF("value"), 1L) // v2
    IceLite.rollback(dir, 1) // v3, watermark back at v1's
    // A consumer checkpointed at v2 asks for the diff to v3: rows BELOW its
    // watermark changed, which an `_lsn > lo` window cannot express — the
    // silent alternative is an empty diff and permanent divergence.
    val e = intercept[IllegalArgumentException] {
      IceLite.changesBetween(spark, dir, 2, 3).collect()
    }
    assert(e.getMessage.contains("rollback"))
    // A cursor at-or-below the rollback target keeps working: v1 -> v3 is a
    // genuinely empty window (same watermark), not a regression.
    assert(IceLite.changesBetween(spark, dir, 1, 3).count() == 0)
  }
}
