package graft

import graft.cdc.{MergeApply, Pipeline}
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Live-tail mode (Trigger.ProcessingTime — the reference's unbounded
  * onTrigger pull loop, St1): events appended to the feed while the query
  * runs are applied; the query survives idle polls; stop is clean.
  */
class TailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(lsn: Long, conv: String, text: String): String =
    s"""{"op":"U","lsn":$lsn,"conv_id":"$conv","turn_idx":0,"after":{"text":"$text"}}"""

  test("tail applies newly arriving files until stopped") {
    val base = TestSpark.freshDir("tail")
    val feed = s"$base/feed"
    Files.createDirectories(Paths.get(feed))
    Files.write(Paths.get(feed, "f1.jsonl"), ev(1, "a", "first").getBytes("UTF-8"))

    val applied = new java.util.concurrent.ConcurrentLinkedQueue[MergeApply.ApplyResult]()
    val q = Pipeline.tail(spark,
      Pipeline.Config(feed, s"$base/table", s"$base/ckpt", numBuckets = 2),
      intervalMs = 250, onBatch = r => { applied.add(r); () })
    try {
      def waitFor(cond: => Boolean, ms: Long = 30000): Unit = {
        val t0 = System.currentTimeMillis()
        while (!cond && System.currentTimeMillis() - t0 < ms) Thread.sleep(100)
        assert(cond, "condition not reached within timeout")
      }
      waitFor(applied.size() >= 1)
      // late arrival while the query is live
      Files.write(Paths.get(feed, "f2.jsonl"), ev(2, "a", "second").getBytes("UTF-8"))
      waitFor(IceLite.exists(s"$base/table") && {
        val rows = IceLite.read(spark, s"$base/table").collect()
        rows.length == 1 && rows.head.getAs[String]("text") == "second"
      })
    } finally q.stop()
  }

  test("opWindowMetrics: per-op watermarked window counts over feed lines (MemoryStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def line(op: String, lsn: Long, min: Int): String = {
      val after = if (op == "D") "" else
        s""","after":{"text":"t$lsn","ts":"2026-01-01T00:${f"$min%02d"}:00Z"}"""
      s"""{"op":"$op","lsn":$lsn,"conv_id":"c","turn_idx":0$after}"""
    }
    val in = MemoryStream[String]
    val out = Pipeline.opWindowMetrics(in.toDF().toDF("value"),
      windowLength = "5 minutes", delay = "1 minute")
    val q = out.writeStream.format("memory").queryName("op_win")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    try {
      in.addData(line("U", 1, 1), line("U", 2, 2), line("I", 3, 3),
        line("U", 4, 6), line("D", 5, 2) /* no event time → excluded */)
      q.processAllAvailable()
      in.addData(line("U", 6, 30)) // advance watermark → finalize earlier windows
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("op_win")
      .select("w_start", "op", "n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(rows(("2026-01-01 00:00:00.0", "U")) == 2L)
    assert(rows(("2026-01-01 00:00:00.0", "I")) == 1L)
    assert(rows(("2026-01-01 00:05:00.0", "U")) == 1L)
    assert(!rows.keySet.exists(_._2 == "D")) // deletes carry no event time
  }
}
