package graft

import graft.ops.CdcQueries
import org.scalatest.funsuite.AnyFunSuite

/** Pins the classified CDF (`cdc_version_diff`) against the definitionally
  * correct diff: full before/after table states compared key-by-key. The
  * operator must produce the identical classified set while reading only
  * the changed frame + the touched buckets of vA (never two full states).
  */
class VersionDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("classified diff equals the full before/after state comparison") {
    val got = CdcQueries.versionDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet

    // Reference: rebuild both converged states from events driver-side.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(s"$sf/events.parquet").select(
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast("int") % 10).as("turn_idx"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"))
    val half = ev.agg(floor(max(col("lsn")) / 2)).head.getLong(0)
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc)
    def state(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => (r.getString(1), r.getInt(2)) ->
        (r.getString(3), r.getString(4))).toMap
    val a = state(ev.filter(col("lsn") <= half)).filter(_._2._1 != "D")
    val b = state(ev)
    val touched = ev.filter(col("lsn") > half).select("conv_id", "turn_idx")
      .distinct().collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val expected = touched.flatMap { k =>
      val before = a.get(k).map(_._2)
      val after = b.get(k).filter(_._1 != "D").map(_._2)
      (before, after) match {
        case (None, Some(n))    => Some((k._1, k._2, "insert", None, Some(n)))
        case (Some(o), Some(n)) => Some((k._1, k._2, "update", Some(o), Some(n)))
        case (Some(o), None)    => Some((k._1, k._2, "delete", Some(o), None))
        case (None, None)       => None
      }
    }
    assert(got == expected)
    // the sf0.001 feed must exercise all three kinds or the test is vacuous
    assert(Set("insert", "update", "delete").subsetOf(got.map(_._3)))
  }
}
