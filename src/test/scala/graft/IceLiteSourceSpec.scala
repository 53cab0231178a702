package graft

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The icelite table as a Structured Streaming SOURCE (`format("icelite")`,
  * graft.table.IceLiteSource): offsets are snapshot versions owned by the
  * stream's checkpoint, each micro-batch is `changesBetween(lastSeen, head)`.
  * Pinned here: (1) the first run delivers the starting window's net change,
  * (2) a restart from the checkpoint delivers ONLY the new window, (3) a
  * restart with no new commits delivers nothing, (4) WAP staging is
  * invisible until publish, (5) a mid-stream widening is cast back to the
  * stream's fixed schema.
  */
class IceLiteSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def line(op: String, lsn: Long, k: Int, txt: String) =
    if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"c-$k","turn_idx":0}"""
    else s"""{"op":"$op","lsn":$lsn,"conv_id":"c-$k","turn_idx":0,"after":{"role":"r","text":"$txt"}}"""

  /** Drain everything available from the table stream into `sink`, one
    * AvailableNow run, resuming from `ckpt`. Returns batches delivered.
    */
  private def drain(dir: String, ckpt: String, sink: ArrayBuffer[Row]): Int = {
    var batches = 0
    val q = spark.readStream.format("icelite").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = df.collect()
        sink.synchronized { sink ++= rows; batches += 1 }
      }.start()
    q.awaitTermination()
    batches
  }

  private def keyText(rows: Seq[Row]): Set[(String, String, Boolean)] =
    rows.map(r => (r.getAs[String]("conv_id"),
      Option(r.getAs[String]("text")).getOrElse("∅"),
      r.getAs[Boolean]("_deleted"))).toSet

  test("stream delivers initial content, then only each new window on checkpointed restart") {
    import spark.implicits._
    val dir = TestSpark.freshDir("icesrc")
    val ckpt = TestSpark.freshDir("icesrc-ckpt")
    IceLite.create(dir, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType))), numBuckets = 4)
    MergeApply.applyRaw(spark, dir,
      (0 until 20).map(k => line("I", 100 + k, k, s"a-$k")).toDF("value"), 0L)

    val got = ArrayBuffer.empty[Row]
    drain(dir, ckpt, got)
    assert(keyText(got.toSeq) ==
      (0 until 20).map(k => (s"c-$k", s"a-$k", false)).toSet,
      "first run = net change of the starting window (the initial content)")

    // Window 2: overlapping updates + a delete; the restarted stream must
    // deliver exactly this net change, never the already-consumed window.
    got.clear()
    MergeApply.applyRaw(spark, dir,
      ((0 until 5).map(k => line("U", 200 + k, k, s"b-$k")) :+
        line("D", 230, 19, "")).toDF("value"), 1L)
    drain(dir, ckpt, got)
    assert(keyText(got.toSeq) ==
      ((0 until 5).map(k => (s"c-$k", s"b-$k", false)).toSet + (("c-19", "∅", true))),
      "restart delivers only the (lastSeen, head] net change, net delete included")

    // No new commits: nothing arrives.
    got.clear()
    drain(dir, ckpt, got)
    assert(got.isEmpty, "no new snapshot => no batch")
  }

  test("WAP staging is invisible to the stream until publish") {
    import spark.implicits._
    val dir = TestSpark.freshDir("icesrc-wap")
    val ckpt = TestSpark.freshDir("icesrc-wap-ckpt")
    IceLite.create(dir, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType))), numBuckets = 4)
    MergeApply.applyRaw(spark, dir,
      (0 until 5).map(k => line("I", 100 + k, k, s"a-$k")).toDF("value"), 0L)

    val got = ArrayBuffer.empty[Row]
    drain(dir, ckpt, got)
    assert(got.size == 5)

    IceLite.beginStage(dir)
    MergeApply.applyRaw(spark, dir,
      (0 until 5).map(k => line("U", 200 + k, k, s"staged-$k")).toDF("value"), 1L)
    got.clear()
    drain(dir, ckpt, got)
    assert(got.isEmpty, "staged-but-unpublished commits must not stream")

    IceLite.publish(dir)
    drain(dir, ckpt, got)
    assert(keyText(got.toSeq) ==
      (0 until 5).map(k => (s"c-$k", s"staged-$k", false)).toSet,
      "publish releases the staged window to the stream")
  }

  test("mid-run schema evolution fails the query with a restart instruction; the restart adopts it") {
    import spark.implicits._
    val dir = TestSpark.freshDir("icesrc-widen")
    val ckpt = TestSpark.freshDir("icesrc-widen-ckpt")
    // Payload starts with an inferred integer score; a later batch widens it.
    IceLite.create(dir, numBuckets = 4)
    MergeApply.applyRaw(spark, dir, Seq(
      s"""{"op":"I","lsn":1,"conv_id":"c-0","turn_idx":0,"after":{"text":"t0","score":7}}""")
      .toDF("value"), 0L)

    val got = ArrayBuffer.empty[Row]
    drain(dir, ckpt, got)
    assert(got.head.schema("score").dataType == org.apache.spark.sql.types.LongType)
    got.clear()

    // A stream whose schema was pinned pre-widening must FAIL on the evolved
    // window (silently casting 2.5 back to long would corrupt it), telling
    // the operator to restart. Pinned via a directly-constructed source —
    // the same object the running query would hold.
    val preWiden = IceLite.load(dir).schema
    MergeApply.applyRaw(spark, dir, Seq(
      s"""{"op":"U","lsn":2,"conv_id":"c-0","turn_idx":0,"after":{"text":"t1","score":2.5}}""")
      .toDF("value"), 1L)
    val pinned = new graft.table.IceLiteSource(
      spark.sqlContext, dir, startingVersion = 0, fixedSchema = preWiden)
    val head = pinned.getOffset.get
    val err = intercept[IllegalStateException] { pinned.getBatch(None, head) }
    assert(err.getMessage.contains("Restart the query"))

    // The restarted stream (same checkpoint) adopts the evolved schema and
    // delivers the widened window — nothing lost, nothing cast.
    drain(dir, ckpt, got)
    assert(got.size == 1)
    assert(got.head.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(got.head.getAs[Double]("score") == 2.5)
  }
}
