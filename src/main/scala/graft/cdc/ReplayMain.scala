package graft.cdc

import graft.table.IceLite
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the CDC replay job (the north rule's
  * "runs via spark-submit" deliverable).
  *
  * Usage:
  *   ReplayMain <feedDir> <tableDir> <checkpointDir> [numBuckets] [maxFilesPerTrigger]
  *   ReplayMain --gen <feedDir> <nEvents> [nBatches]    (synthesize a feed)
  *
  * Local run: sbt "runMain graft.cdc.ReplayMain ..." (master defaults to
  * local[*]; on a cluster spark-submit injects the master).
  */
object ReplayMain {
  def main(args: Array[String]): Unit = {
    // Respect spark-submit's --master; fall back to env/local only when the
    // launcher did not provide one (sbt runMain).
    val submitted = new org.apache.spark.SparkConf().contains("spark.master")
    val base = SparkSession.builder()
    val withMaster =
      if (submitted && !sys.env.contains("SPARK_MASTER")) base
      else base.master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]"))
    val spark = withMaster
      .appName("graft-cdc-replay")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      // Scan parallelism = input splits; JSONL feeds compress well into few
      // files, so split fine (the parse+infer scan is the heaviest stage).
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", s"${8 * 1024 * 1024}"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "snappy"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.toList match {
      case "--gen" :: feedDir :: n :: rest =>
        val nBatches = rest.headOption.map(_.toInt).getOrElse(8)
        val filesPerBatch = rest.drop(1).headOption.map(_.toInt).getOrElse(1)
        FeedGen.synthetic(spark, Some(feedDir), n.toLong, nBatches = nBatches,
          nConvs = math.max(100, (n.toLong / 200).toInt), filesPerBatch = filesPerBatch)
        println(s"[gen] wrote feed: $feedDir events=$n batches=$nBatches files/batch=$filesPerBatch")

      case feedDir :: tableDir :: ckpt :: rest =>
        val numBuckets = rest.headOption.map(_.toInt).getOrElse(64)
        val mfpt = rest.drop(1).headOption.map(_.toInt)
        val policy = MergeApply.CompactionPolicy(
          factor = sys.env.getOrElse("SPARK_GRAFT_COMPACT_FACTOR", "0.3").toDouble,
          minRows = sys.env.getOrElse("SPARK_GRAFT_COMPACT_MINROWS", "20000").toLong,
          maxDeltaFiles = sys.env.getOrElse("SPARK_GRAFT_COMPACT_MAXFILES", "8").toInt)
        val t0 = System.nanoTime()
        val results = Pipeline.replay(spark, Pipeline.Config(
          feedDir, tableDir, ckpt,
          deadLetterDir = Some(s"$tableDir/_deadletter"),
          lineageDir = Some(s"$tableDir/_lineage"),
          numBuckets = numBuckets, maxFilesPerTrigger = mfpt, policy = policy,
          // "lww" (default) or "patch" — the partial-update pipeline from
          // the same spark-submit entry
          merge = sys.env.getOrElse("SPARK_GRAFT_MERGE", "lww")))
        val secs = (System.nanoTime() - t0) / 1e9
        results.foreach(r => println(s"[batch ${r.batchId}] committed=${r.committed} " +
          s"version=${r.version} events=${r.events} applied=${r.applied} " +
          s"malformed=${r.malformed} buckets=${r.touchedBuckets} " +
          s"deltaRows=${r.deltaRows} compacted=${r.compactedBuckets}(${r.compactedRows} rows) " +
          s"lsn=[${r.minLsn},${r.maxLsn}] schema='${r.schemaChanged}' ${r.durationMs}ms"))
        val events = results.map(_.events).sum
        println(f"[replay] batches=${results.size} events=$events in $secs%.2fs " +
          f"(${events / math.max(secs, 1e-9)}%.0f events/s)")
        val snap = IceLite.load(tableDir)
        println(s"[table] version=${snap.version} schemaV=${snap.schemaV} " +
          s"baseBuckets=${snap.buckets.size} baseRows=${snap.buckets.map(_.rows).sum} " +
          s"deltaFiles=${snap.deltas.size} deltaRows=${snap.deltas.map(_.rows).sum}")
        println("[table] schema: " + snap.schema.simpleString)
        IceLite.read(spark, tableDir).orderBy("conv_id", "turn_idx").show(5, truncate = false)

      case _ =>
        System.err.println("usage: ReplayMain <feedDir> <tableDir> <ckptDir> [numBuckets] [maxFilesPerTrigger] | --gen <feedDir> <nEvents> [nBatches]")
        sys.exit(2)
    }
    spark.stop()
  }
}
