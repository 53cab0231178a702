package graft.ops

import graft.cdc.{Feed, FeedGen, Pipeline}
import graft.infer.SchemaInfer
import graft.table.IceLite
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Driver-facing CDC queries over the provided testdata. The flagship
  * (`upsertFromEvents`) runs the REAL pipeline — JSONL feed → Structured
  * Streaming replay → icelite MERGE — on a change feed derived from
  * `events.parquet` via a mapping deliberately chosen to be SQL-expressible,
  * so the driver's DuckDB oracle independently verifies the converged table.
  */
object CdcQueries {

  private val workRoot = "/root/repo/target/graft-work"

  private def freshDir(name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val p = Paths.get(workRoot, s"$name-$tag")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  /** Full CDC replay of the events-derived feed; returns the converged
    * conversations table (FeedGen.fromEvents documents the key mapping).
    */
  def upsertFromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("upsert", sfDir)
    FeedGen.writeFeed(FeedGen.fromEvents(spark, sfDir), s"$base/feed", files = 8)
    Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed", s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), lineageDir = Some(s"$base/lineage"),
      numBuckets = 32, maxFilesPerTrigger = Some(4)))
    IceLite.read(spark, s"$base/table")
      .select("conv_id", "turn_idx", "role", "text", "value", "ts")
      .orderBy("conv_id", "turn_idx")
  }

  /** The LWW dedup operator alone (SURVEY §2.5 J2): latest event per key —
    * window `row_number over (partition by key order by lsn desc)`.
    */
  def lwwLatestPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feed = eventsAsFeed(spark, sfDir)
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc)
    feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select("conv_id", "turn_idx", "role", "text", "value")
      .orderBy("conv_id", "turn_idx")
  }

  /** events.parquet under the change-feed mapping (columnar, no JSON hop). */
  private def eventsAsFeed(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet").select(
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_id").as("lsn"),
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 4, "0")).as("conv_id"),
      (get_json_object(col("props"), "$.k").cast("int") % 10).as("turn_idx"),
      col("event_type").as("role"),
      concat(col("event_type"), lit("#"), col("event_id").cast("string")).as("text"),
      col("value"))
  }

  /** Relationship routing (P5/St4): success / failure / retry counts. */
  def routeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("relationship",
        when(col("event_type") === "error", "retry")
          .when(col("value") >= 300.0, "failure")
          .otherwise("success"))
      .groupBy("relationship").agg(count(lit(1)).as("n"))
      .orderBy("relationship")
  }

  /** Dead-letter routing (St4): the events-derived feed with deterministic
    * corruption (FeedGen.fromEvents corrupt=true) replayed through the real
    * pipeline; reason counts are a pure function of event_id, so the
    * driver's DuckDB oracle derives them from events.parquet directly.
    */
  def deadLetterSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val base = freshDir("deadletter", sfDir)
    FeedGen.writeFeed(FeedGen.fromEvents(spark, sfDir, corrupt = true), s"$base/feed", files = 8)
    Pipeline.replay(spark, Pipeline.Config(
      s"$base/feed", s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), numBuckets = 8))
    spark.read.parquet(s"$base/dead")
      .groupBy("reason").agg(count(lit(1)).as("n")).orderBy("reason")
  }

  /** Schema inference as a query (JSG capability): infer the merged schema of
    * the events `props` JSON column, one row per field (rows-only check;
    * semantics unit-tested in SchemaInferSpec).
    */
  def inferPropsSchema(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/events.parquet")
      .select("props").as(Encoders.STRING)
    val partials = docs.mapPartitions(it => Iterator.single(SchemaInfer.inferAll(it).json))(Encoders.STRING)
      .collect()
    val merged = partials.foldLeft(new org.apache.spark.sql.types.StructType()) { (acc, j) =>
      graft.infer.SchemaMerge.mergeStruct(acc,
        org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[org.apache.spark.sql.types.StructType])
    }
    merged.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      .toDF("field", "type").orderBy("field")
  }
}
