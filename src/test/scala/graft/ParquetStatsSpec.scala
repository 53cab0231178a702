package graft

import graft.table.ParquetStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footer-statistics reads that replaced per-query scan jobs this round:
  * `columnMaxLong` feeds the two-phase harness cutoff (`halfLsn`), so it
  * must be EXACT when it answers and decline (None) rather than guess when
  * footer stats cannot support the answer.
  */
class ParquetStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sessionState.newHadoopConf()

  test("columnMaxLong reads the exact INT64 max from a multi-file directory") {
    val dir = TestSpark.freshDir("pqstats-max")
    (1L to 1000L).toDF("event_id")
      .withColumn("other", lit("x"))
      .repartition(4) // several files, max lands in one of them
      .write.mode("overwrite").parquet(dir)
    assert(ParquetStats.columnMaxLong(conf, dir, "event_id") == Some(1000L))
    // The halfLsn contract: integer halving of the footer max equals the
    // oracle's floor(max/2) for non-negative ids.
    assert(ParquetStats.columnMaxLong(conf, dir, "event_id").map(_ / 2) == Some(500L))
  }

  test("columnMaxLong answers on a single bare file too") {
    val dir = TestSpark.freshDir("pqstats-single")
    Seq(7L, 42L, -3L).toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    assert(ParquetStats.columnMaxLong(conf, f, "v") == Some(42L))
  }

  test("columnMaxLong declines rather than guesses") {
    val dir = TestSpark.freshDir("pqstats-missing")
    Seq(1L).toDF("v").write.mode("overwrite").parquet(dir)
    // absent column → None (caller falls back to the aggregation scan)
    assert(ParquetStats.columnMaxLong(conf, dir, "nope").isEmpty)
    // non-INT64 column → None, never a coerced number
    val dir2 = TestSpark.freshDir("pqstats-string")
    Seq("a", "b").toDF("s").write.mode("overwrite").parquet(dir2)
    assert(ParquetStats.columnMaxLong(conf, dir2, "s").isEmpty)
    // missing path → None
    assert(ParquetStats.columnMaxLong(conf, dir + "-never-written", "v").isEmpty)
  }
}
