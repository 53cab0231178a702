package graft

import graft.streaming.WindowedStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Watermarked streaming ops over a MemoryStream source (St5):
  * dropDuplicatesWithinWatermark removes re-deliveries inside the horizon;
  * watermarked windowed counts finalize once the watermark passes.
  */
class WindowedStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2026-01-01 00:$min%02d:$sec%02d")

  test("dedupWithinWatermark drops re-delivered keys inside the horizon") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts")
    val out = WindowedStats.dedupWithinWatermark(df, "ts", "10 minutes", Seq("k"))
    in.addData(("a", ts(1)), ("a", ts(2)), ("b", ts(1)))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("dedup_out").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a", "b")) // duplicate 'a' within watermark dropped
  }

  test("eventsPerWindow: watermarked tumbling counts finalize after the watermark passes") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts")
    val out = WindowedStats.eventsPerWindow(df, "ts", "1 minute", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    try {
      in.addData(("a", ts(0, 10)), ("b", ts(1, 0)), ("c", ts(6, 0)))
      q.processAllAvailable()
      // advance the watermark far past the first window so it finalizes
      in.addData(("z", ts(30, 0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("win_out")
      .selectExpr("window.start", "n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows("2026-01-01 00:00:00.0") == 2L) // a + b in [00:00,00:05)
    assert(rows("2026-01-01 00:05:00.0") == 1L) // c in [00:05,00:10)
  }
}
