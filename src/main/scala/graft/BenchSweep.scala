package graft

import org.apache.spark.sql.SparkSession

/** Query-sweep-only benchmark (local iteration tool): times every
  * `SparkEntry.queries` entry at local[32] with the same forced-result
  * methodology as `Bench` (noop sink — no column pruning, sorts delivered)
  * but skips the 20-minute replay/scaling phase. The graded entry point
  * stays `graft.Bench`; this main exists so a single operator's plan change
  * can be re-timed in ~a minute.
  */
object BenchSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = args.headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bench-sweep")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first query in a fresh JVM pays ~5 s of session
    // init, parquet-footer reads and codegen/JIT ramp that would otherwise
    // be attributed to whichever query sorts first.
    try {
      spark.read.parquet(s"$sfDir/events.parquet").count()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text"))).count()
    } catch { case _: Throwable => () }
    try {
      // Shared upsert table built untimed (see Bench): without this its
      // replay cost lands on the first consumer query in the sweep.
      val tP0 = System.nanoTime()
      try graft.ops.CdcQueries.upsertFromEvents(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[sweep] shared-table build FAILED: ${e.getMessage}") }
      System.err.println(
        f"[sweep] _shared_upsert_build     ${(System.nanoTime() - tP0) / 1e9}%.2fs (untimed setup)")
      val tP1 = System.nanoTime()
      try graft.ops.CdcQueries.sharedIncDedupState(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[sweep] shared-incdedup build FAILED: ${e.getMessage}") }
      System.err.println(
        f"[sweep] _shared_incdedup_build   ${(System.nanoTime() - tP1) / 1e9}%.2fs (untimed setup)")
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          // Cached intermediates are operator-scoped (CacheScope) — no
          // clearCache between queries.
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[sweep] $name FAILED: ${e.getMessage}") }
          System.err.println(f"[sweep] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
    } finally spark.stop()
  }
}
