package graft

import graft.cdc.FeedGen
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Scaling-pair diagnostic (local iteration tool): replays the standard
  * bench feed once at `n` cores and once at `xn` cores (interleaved, like
  * the graded `Bench` pairs) and prints the wall times and N→4N-style
  * efficiency ratio. Exists to probe which parallelism pair the single-box
  * sandbox can measure without memory-bandwidth oversubscription — see
  * BENCH.md's host co-tenancy analysis. Usage: runMain graft.BenchPair
  * [nCores] [xCores] [pairs].
  */
object BenchPair {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1)
    val x = args.lift(1).map(_.toInt).getOrElse(4 * n)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val work = "/root/repo/target/bench-work"
    val nEvents = 12000000L
    val feedDir = s"$work/feed-$nEvents"
    val warmFeed = s"$work/feed-warm"
    if (!Files.exists(Paths.get(feedDir)) || !Files.exists(Paths.get(warmFeed))) {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      try {
        FeedGen.synthetic(s, Some(feedDir), nEvents,
          nConvs = (nEvents / 200).toInt, turnsPerConv = 20,
          nBatches = 4, filesPerBatch = 32)
        FeedGen.synthetic(s, Some(warmFeed), 200000,
          nConvs = 1000, turnsPerConv = 20, nBatches = 1, filesPerBatch = 32)
      } finally s.stop()
    }
    (1 to reps).foreach { i =>
      val (_, ns) = Bench.replayAt(n, feedDir, warmFeed, s"$work/pair-n")
      val (ev, xs) = Bench.replayAt(x, feedDir, warmFeed, s"$work/pair-x")
      val ratio = (ns / xs) / (x.toDouble / n)
      System.err.println(f"[pair $i] N=$n ${ns}%.1fs, ${x}c ${xs}%.1fs, " +
        f"eff ${ratio}%.3f (${ev} events)")
    }
  }
}
