package graft

import graft.cdc.{FeedGen, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not graded): break a two-phase staged-replay harness query
  * (the shape ~15 cdc_* sweep entries share) into its phases to see where
  * the ~4s goes at local[32].
  */
object ProbeHarness {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("probe-harness")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    try {
      spark.read.parquet(s"$sfDir/events.parquet").count()
      val base = "/root/repo/target/probe-harness"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val ev = spark.read.parquet(s"$sfDir/events.parquet").select(
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_id").as("lsn"),
        concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")).as("conv_id"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("turn_idx"),
        col("event_type").as("role"),
        concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"),
        col("value"))
      val half = t("halfLsn agg") {
        spark.read.parquet(s"$sfDir/events.parquet")
          .agg(floor(max(col("event_id")) / 2)).head.getLong(0)
      }
      val lines = ev.select(to_json(struct(col("op"), col("lsn"), col("conv_id"),
        col("turn_idx"),
        when(col("op") =!= "D",
          struct(col("role"), col("text"), col("value"))).as("after"))).as("value"))
      val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
        numBuckets = 16, maxFilesPerTrigger = Some(4))
      t("writeFeed p1") {
        FeedGen.writeFeed(lines.filter(col("lsn") <= half), s"$base/feed/p1", files = 4)
      }
      t("replay p1") { Pipeline.replay(spark, cfg) }
      t("writeFeed p2") {
        FeedGen.writeFeed(lines.filter(col("lsn") > half), s"$base/feed/p2", files = 4)
      }
      t("replay p2") { Pipeline.replay(spark, cfg) }
      t("changesSince read + noop") {
        graft.table.IceLite.changesSince(spark, s"$base/table", 2)
          .write.format("noop").mode("overwrite").save()
      }
      // Second lap, warm JVM: how much was first-lap codegen/JIT?
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      t("writeFeed p1 (lap2)") {
        FeedGen.writeFeed(lines.filter(col("lsn") <= half), s"$base/feed/p1", files = 4)
      }
      val r1 = t("replay p1 (lap2)") { Pipeline.replay(spark, cfg) }
      r1.foreach(r => System.err.println(
        s"[probe]   batch ${r.batchId}: total=${r.durationMs}ms scan=${r.scanMs} " +
          s"dead=${r.deadMs} write=${r.writeMs} compact=${r.compactMs}"))
      t("writeFeed p2 (lap2)") {
        FeedGen.writeFeed(lines.filter(col("lsn") > half), s"$base/feed/p2", files = 4)
      }
      val r2 = t("replay p2 (lap2)") { Pipeline.replay(spark, cfg) }
      r2.foreach(r => System.err.println(
        s"[probe]   batch ${r.batchId}: total=${r.durationMs}ms scan=${r.scanMs} " +
          s"dead=${r.deadMs} write=${r.writeMs} compact=${r.compactMs}"))
    } finally spark.stop()
  }
}
