package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Gap sessionization, both forms. The batch form's exact values are pinned
  * by the `sessionize` DuckDB oracle; these pin the semantics (split rule,
  * aggregates) and the STREAMING state machine: sessions close on an
  * in-stream gap AND on the event-time timeout when a user goes quiet, the
  * per-user state never outlives its session, and batch/stream agree on the
  * same input.
  */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, min: Int = 0) = Timestamp.valueOf(f"2026-01-01 $h%02d:$min%02d:00")

  test("batch: sessions split exactly at the gap; aggregates per session") {
    val dir = TestSpark.freshDir("sess-batch")
    // user 1: events at 00:00, 01:00 (same session, gap 1h), 04:00 (new
    // session at gap > 2h), user 2: one event.
    val ev = Seq(
      (1L, 10L, ts(0), 1.0), (1L, 11L, ts(1), 2.0), (1L, 12L, ts(4), 4.0),
      (2L, 20L, ts(0), 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Sessionize.sessions(spark, dir, gapMicros = 2L * 3600 * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 0L, 2L, 3.0), (1L, 1L, 1L, 4.0), (2L, 0L, 1L, 8.0)))
    // Boundary exactness: a gap of EXACTLY the threshold does NOT split
    // (the rule is strictly greater, microsecond-integer compare).
    val ev2 = Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(2), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    ev2.write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Sessionize.sessions(spark, dir, gapMicros = 2L * 3600 * 1000000).count() == 1)
  }

  test("stream: gap closes a session mid-stream; watermark timeout closes the idle one") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessionize.stream(in.toDF().toDF("user_id", "ts", "value"),
      gapMicros = 2L * 3600 * 1000000, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    try {
      // Session A: two events an hour apart; then a > 2h jump to session B
      // IN THE SAME user — the jump must emit A without waiting for any
      // watermark. User 9 opens a session that only the timeout can close.
      in.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0), (9L, ts(1), 5.0))
      q.processAllAvailable()
      in.addData((1L, ts(5), 4.0))
      q.processAllAvailable()
      // User 1's session A closed by the GAP; the same trigger's watermark
      // (ts(5), delay 0) also fires user 9's event-time timeout (01:00+2h).
      val afterGap = spark.table("sess_out").as[Sessionize.Session].collect()
      assert(afterGap.map(s => (s.user_id, s.n_events, s.sum_value)).toSet ==
        Set((1L, 2L, 3.0), (9L, 1L, 5.0)))
      val a = afterGap.find(_.user_id == 1L).get
      assert(a.t_start == ts(0) && a.t_end == ts(1))

      // Advance event time far beyond last+gap for everyone: the state-store
      // timeouts fire and the two OPEN sessions (user 1's B, user 9's) flush.
      in.addData((7L, ts(23), 0.0))
      q.processAllAvailable()
      in.addData((7L, ts(23, 30), 0.0)) // one more trigger so timeouts run
      q.processAllAvailable()
      val flushed = spark.table("sess_out").as[Sessionize.Session].collect()
      assert(flushed.map(s => (s.user_id, s.n_events, s.sum_value)).toSet ==
        Set((1L, 2L, 3.0), (1L, 1L, 4.0), (9L, 1L, 5.0)))
    } finally q.stop()
  }

  test("stream: an out-of-order event inside the watermark lowers the session start") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessionize.stream(in.toDF().toDF("user_id", "ts", "value"),
      gapMicros = 2L * 3600 * 1000000, watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sess_ooo")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    try {
      in.addData((1L, ts(12), 1.0))
      q.processAllAvailable() // watermark now 11:30
      in.addData((1L, ts(11, 45), 2.0)) // late but inside the watermark
      q.processAllAvailable()
      in.addData((1L, ts(20), 0.0)) // > gap → closes the session
      q.processAllAvailable()
      val s = spark.table("sess_ooo").as[Sessionize.Session].collect()
        .find(x => x.user_id == 1L && x.n_events == 2L).get
      assert(s.t_start == ts(11, 45) && s.t_end == ts(12) && s.sum_value == 3.0)
    } finally q.stop()
  }

  test("batch and stream agree on the same input (sessions as sets)") {
    implicit val sc = spark.sqlContext
    val dir = TestSpark.freshDir("sess-parity")
    val rows = (0 until 60).map { i =>
      val user = i % 3L
      // per-user event times stride 40 min with a 3h jump every 7th event;
      // the +user skew keeps every timestamp GLOBALLY unique — a 0-second
      // watermark treats an equal-ts event in the NEXT micro-batch as late
      // and drops it, which is framework semantics, not what this test pins.
      val mins = (i / 3) * 40 + (i / 21) * 180 + (i % 3)
      (user, 100L + i, new Timestamp(ts(0).getTime + mins * 60000L), (i % 5).toDouble)
    }
    rows.toDF("user_id", "event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = Sessionize.sessions(spark, dir, gapMicros = 2L * 3600 * 1000000)
      .select("user_id", "n_events", "t_start", "t_end", "sum_value")
      .collect().map(_.toSeq).toSet

    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessionize.stream(in.toDF().toDF("user_id", "ts", "value"),
      gapMicros = 2L * 3600 * 1000000, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    try {
      // Deliver in three event-time-ordered slices (watermark must only move
      // forward), then flush the tail sessions via the timeout.
      rows.sortBy(_._3.getTime).grouped(20).foreach { g =>
        in.addData(g.map(r => (r._1, r._3, r._4)))
        q.processAllAvailable()
      }
      in.addData((99L, Timestamp.valueOf("2026-01-10 00:00:00"), 0.0))
      q.processAllAvailable()
      in.addData((99L, Timestamp.valueOf("2026-01-11 00:00:00"), 0.0))
      q.processAllAvailable()
      val stream = spark.table("sess_parity").as[Sessionize.Session]
        .filter(_.user_id != 99L)
        .collect().map(s => Seq(s.user_id, s.n_events, s.t_start, s.t_end, s.sum_value)).toSet
      assert(stream == batch, s"stream sessions != batch sessions:\n$stream\nvs\n$batch")
    } finally q.stop()
  }
}
