package graft

import graft.ops.CdcQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the snapshot-bootstrap + change-stream-handoff equivalence: replaying
  * a FOLDED consistent snapshot of the prefix (one `I` per live key at its
  * original LSN) followed by only the post-cutoff tail converges to the same
  * table as replaying the full history — and the bootstrap batch really is
  * O(live keys), not O(history).
  */
class BootstrapHandoffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("snapshot ∘ tail ≡ full-history replay, and the bootstrap is folded") {
    val handoff = CdcQueries.bootstrapHandoff(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        Option(r.get(4)))).toSet
    val full = CdcQueries.upsertFromEvents(spark, sf)
      .select("conv_id", "turn_idx", "role", "text", "value").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        Option(r.get(4)))).toSet
    assert(handoff == full)

    // The bootstrap feed (p0-snapshot) must be folded: one line per live
    // (conv_id, turn_idx) at the cutoff — strictly fewer lines than raw
    // prefix events whenever any key was updated more than once or deleted.
    val tag = sf.replaceAll("[^A-Za-z0-9.]", "_")
    val snapLines = spark.read.text(
      s"/root/repo/target/graft-work/bootstrap-$tag/feed/p0-snapshot").count()
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val half = ev.agg(floor(max(col("event_id")) / 2)).head.getLong(0)
    val prefixEvents = ev.filter(col("event_id") <= half).count()
    assert(snapLines < prefixEvents,
      s"bootstrap must fold history: $snapLines lines vs $prefixEvents prefix events")
    // and exactly the live-key count the LWW rule implies
    val liveKeys = ev.filter(col("event_id") <= half)
      .select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k"),
        col("event_type"), col("event_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("k"))
          .orderBy(col("event_id").desc)))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .count()
    assert(snapLines == liveKeys)
  }
}
