package graft

import graft.cdc.{FeedGen, MergeApply, Pipeline}
import graft.ops.{CdcQueries, IncrementalDedup, TextOps}
import graft.table.{Audit, IceLite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not graded): phase anatomy of the two shared sweep builds
  * (`_shared_upsert_build`, `_shared_incdedup_build`) and the wap_publish
  * harness — the three heaviest non-tdi sweep items.
  */
object ProbeShared {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("probe-shared")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val base = "/root/repo/target/probe-shared"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    try {
      spark.read.parquet(s"$sfDir/events.parquet").count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()

      // ---- shared upsert build anatomy
      val feed = t("fromEvents plan+writeFeed") {
        FeedGen.writeFeed(FeedGen.fromEvents(spark, sfDir), s"$base/up/feed", files = 8)
      }
      val rs = t("replay 32b mfpt=4") {
        Pipeline.replay(spark, Pipeline.Config(
          s"$base/up/feed", s"$base/up/table", s"$base/up/ckpt",
          deadLetterDir = Some(s"$base/up/dead"), lineageDir = Some(s"$base/up/lineage"),
          numBuckets = 32, maxFilesPerTrigger = Some(4)))
      }
      rs.foreach(r => System.err.println(
        s"[probe]   batch ${r.batchId}: total=${r.durationMs}ms scan=${r.scanMs} " +
          s"dead=${r.deadMs} write=${r.writeMs} compact=${r.compactMs}"))

      // ---- shared incdedup build anatomy
      val cfg = IncrementalDedup.Config(s"$base/inc", numBuckets = 8)
      val corpus = t("withPlantedDups plan") {
        TextOps.withPlantedDups(spark, sfDir).select("doc_id", "text")
      }
      val half = t("half doc_id agg") {
        spark.read.parquet(s"$sfDir/documents.parquet")
          .agg(floor(max(col("doc_id")) / 2)).head.getLong(0)
      }
      val batches = Seq(
        corpus.filter(col("doc_id") < half),
        corpus.filter(col("doc_id") >= half && col("doc_id") < 100000L),
        corpus.filter(col("doc_id") >= 100000L))
      batches.zipWithIndex.foreach { case (b, i) =>
        t(s"applyBatch $i") { IncrementalDedup.applyBatch(spark, b, i.toLong, cfg) }
      }
      t("compactPairLog") { IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 1) }

      // ---- wap_publish anatomy
      t("wap total") {
        val wbase = s"$base/wap"
        val table = s"$wbase/table"
        val ev = spark.read.parquet(s"$sfDir/events.parquet").select(
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("event_id").as("lsn"),
          concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")).as("conv_id"),
          (get_json_object(col("props"), "$.k").cast("int") % 10).as("turn_idx"),
          col("event_type").as("role"),
          concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"),
          col("value"))
        val half2 = t("wap halfLsn") {
          spark.read.parquet(s"$sfDir/events.parquet")
            .agg(floor(max(col("event_id")) / 2)).head.getLong(0)
        }
        val lines = ev.select(to_json(struct(col("op"), col("lsn"), col("conv_id"),
          col("turn_idx"),
          when(col("op") =!= "D",
            struct(col("role"), col("text"), col("value"))).as("after"))).as("value"))
        val cfgW = Pipeline.Config(s"$wbase/feed", table, s"$wbase/ckpt",
          numBuckets = 16, maxFilesPerTrigger = Some(4))
        t("wap writeFeed p1") {
          FeedGen.writeFeed(lines.filter(col("lsn") <= half2), s"$wbase/feed/p1", files = 4)
        }
        t("wap replay p1") { Pipeline.replay(spark, cfgW) }
        t("wap beginStage") { IceLite.beginStage(table) }
        t("wap writeFeed p2") {
          FeedGen.writeFeed(lines.filter(col("lsn") > half2), s"$wbase/feed/p2", files = 4)
        }
        t("wap replay p2") { Pipeline.replay(spark, cfgW) }
        def tagged(df: org.apache.spark.sql.DataFrame, tag: String) = df.select(
          lit(tag).as("phase"), col("conv_id"), col("turn_idx"), col("role"),
          col("text"), col("value"), lit(null).cast("long").as("n"))
        val staged = tagged(IceLite.read(spark, table), "staged_view")
        val audit = t("wap audit plan") {
          Audit.stagedViolations(spark, table, Seq(
            "role_not_null" -> "role IS NOT NULL",
            "text_not_null" -> "text IS NOT NULL"))
            .select(lit("audit").as("phase"), col("constraint").as("conv_id"),
              lit(null).cast("int").as("turn_idx"), lit(null).cast("string").as("role"),
              lit(null).cast("string").as("text"), lit(null).cast("double").as("value"),
              col("violations").as("n"))
        }
        t("wap publish") { IceLite.publish(table) }
        val published = tagged(IceLite.read(spark, table), "published_view")
        t("wap union+sort+noop") {
          staged.unionByName(audit).unionByName(published)
            .orderBy("phase", "conv_id", "turn_idx")
            .write.format("noop").mode("overwrite").save()
        }
      }
    } finally spark.stop()
  }
}
