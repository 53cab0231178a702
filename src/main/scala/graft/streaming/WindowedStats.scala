package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked streaming operators (SURVEY.md §2.9 St5) — the engine's CDC
  * path resolves duplicates exactly-once via LSN LWW inside foreachBatch
  * (strictly stronger than at-least-once dedup), but the library also
  * exposes the classic Structured Streaming state-bounded forms for
  * pipelines that consume the feed directly:
  *
  *  - [[dedupWithinWatermark]]: `withWatermark + dropDuplicates` — state is
  *    bounded by the event-time watermark, so it runs forever at
  *    10^10-event scale (an unbounded dedup set would not).
  *  - [[eventsPerWindow]]: watermarked tumbling-window counts (per-op
  *    metrics over the change stream, the streaming analogue of the
  *    reference's self-instrumented timings, e.g. `http.response.time`
  *    InsecureInvokeHTTP.java:1378-1403).
  */
object WindowedStats {

  /** Drop re-deliveries of the same key seen within the watermark horizon.
    * `eventTime` must be an event-time column of the streaming DataFrame.
    */
  def dedupWithinWatermark(stream: DataFrame, eventTimeCol: String, delay: String,
                           keys: Seq[String]): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Tumbling-window event counts with a watermark bounding window state. */
  def eventsPerWindow(stream: DataFrame, eventTimeCol: String, delay: String,
                      windowLength: String,
                      extraKeys: Seq[Column] = Nil): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLength) +: extraKeys: _*)
      .agg(count(lit(1)).as("n"), min(eventTimeCol).as("first_ts"), max(eventTimeCol).as("last_ts"))
}
