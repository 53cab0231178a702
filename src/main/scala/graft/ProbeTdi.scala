package graft

import graft.ops.CdcQueries
import org.apache.spark.sql.SparkSession

/** Scratch probe (not graded): wall-time the transcript_dedup_inc query with
  * per-phase job descriptions visible via stderr stage logging.
  */
object ProbeTdi {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("probe-tdi")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.read.parquet(s"$sfDir/events.parquet").count()
      val t0 = System.nanoTime()
      CdcQueries.transcriptDedupInc(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[probe] transcript_dedup_inc total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    } finally spark.stop()
  }
}
