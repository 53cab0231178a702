package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not graded): cost anatomy of a tiny partitioned parquet
  * write at local[32] — task fan-out vs file count vs committer.
  */
object ProbeWrite {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("probe-write")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    val base = "/root/repo/target/probe-write"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    try {
      val df = spark.range(1500).select(
        col("id"), pmod(col("id"), lit(16)).cast("int").as("_bucket"),
        concat(lit("conv-"), col("id")).as("conv_id"),
        lit("text-payload-of-some-length").as("text"))
        .coalesce(1).sortWithinPartitions("_bucket", "conv_id")
        .persist()
      df.count()
      (1 to 3).foreach { i =>
        t(s"write partitionBy 16 files (lap $i)") {
          df.write.mode(SaveMode.Overwrite).partitionBy("_bucket")
            .parquet(s"$base/p$i")
        }
      }
      (1 to 3).foreach { i =>
        t(s"write single file (lap $i)") {
          df.write.mode(SaveMode.Overwrite).parquet(s"$base/s$i")
        }
      }
      val df64 = spark.range(25000).select(
        col("id"), pmod(col("id"), lit(64)).cast("int").as("_bucket"),
        concat(lit("b"), col("id") % 16, lit("|"), col("id"), lit("@conv-"), col("id")).as("conv_id"),
        lit("x").as("text"))
        .persist()
      df64.count()
      (1 to 3).foreach { i =>
        t(s"64dir coalesce1 25k rows (lap $i)") {
          df64.coalesce(1).sortWithinPartitions("_bucket", "conv_id")
            .write.mode(SaveMode.Overwrite).partitionBy("_bucket")
            .parquet(s"$base/c64-$i")
        }
      }
      (1 to 3).foreach { i =>
        t(s"64dir repart 25k rows (lap $i)") {
          df64.repartition(col("_bucket")).sortWithinPartitions("conv_id")
            .write.mode(SaveMode.Overwrite).partitionBy("_bucket")
            .parquet(s"$base/r64-$i")
        }
      }
      val df32 = spark.range(1500).select(
        col("id"), pmod(col("id"), lit(16)).cast("int").as("_bucket"),
        concat(lit("conv-"), col("id")).as("conv_id"),
        lit("text-payload-of-some-length").as("text"))
        .repartition(col("_bucket")).sortWithinPartitions("conv_id")
        .persist()
      df32.count()
      (1 to 3).foreach { i =>
        t(s"write repart16 partitionBy (lap $i)") {
          df32.write.mode(SaveMode.Overwrite).partitionBy("_bucket")
            .parquet(s"$base/r$i")
        }
      }
    } finally spark.stop()
  }
}
