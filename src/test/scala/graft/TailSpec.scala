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
}
