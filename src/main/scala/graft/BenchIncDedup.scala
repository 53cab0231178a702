package graft

import graft.ops.{IncrementalDedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Incremental-vs-whole-corpus dedup diagnostic (local iteration tool):
  * builds a deterministic corpus of `batches × batchSize` documents,
  * ingests it batch-by-batch through [[IncrementalDedup]] (timing each
  * batch), then times the corpus-wide MinHash-LSH dedup over the full
  * corpus — the cost a pipeline WITHOUT stored signature state would pay
  * on every arrival. Two things to read off the output:
  *
  *  - per-batch apply cost stays flat as stored state grows (the probe is
  *    a pruned raw scan + hash join, not a state-wide shuffle);
  *  - deduping the LAST batch incrementally costs a fraction of re-running
  *    the whole-corpus dedup, and the gap widens linearly with history —
  *    at 10^10 stored docs the whole-corpus re-run is simply unrunnable.
  *
  * Usage: runMain graft.BenchIncDedup [batches] [batchSize] [wholeonly]
  * (`wholeonly` skips the incremental loop — for timing the corpus-wide
  * re-dedup alone at larger sizes, to locate the crossover.)
  *
  * `tail <size>` appends a steady-state experiment: after the equal-size
  * state-building batches, six SMALL batches of `size` docs are applied,
  * alternating the state-side Bloom prune OFF/ON — the controlled A/B for
  * [[IncrementalDedup.Config.stateBloomFpp]] in the regime it targets
  * (tiny arrival probing a large stored state, the CDC steady state),
  * where the bloom build cost is O(batch) but the pruned exchange is
  * O(state).
  */
object BenchIncDedup {

  private def rmrf(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f)))

  /** Deterministic docs: 30 words from a 50k vocab seeded per doc; every
    * 25th doc REPEATS the text of a (never-itself-planted) counterpart one
    * batch earlier — cross-batch duplicates, the case only stored state can
    * catch. The counterpart has residue 1 mod 25, so the chain never
    * re-remaps (a planted doc's source always carries its own text).
    */
  private def corpus(spark: SparkSession, n: Int, batchSize: Int): DataFrame = {
    val src = when(col("id") % 25 === 0 && col("id") >= batchSize,
      col("id") - batchSize + 1).otherwise(col("id"))
    spark.range(n.toLong).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(xxhash64(src * 31 + j), lit(50000L)))): _*).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(6)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(100000)
    val n = batches * batchSize
    val work = "/root/repo/target/incdedup-bench"
    rmrf(Paths.get(work))
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-incdedup-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tailIdx = args.indexOf("tail")
    val tailBatches = if (tailIdx >= 0) 6 else 0
    val tailSize = if (tailIdx >= 0)
      args.lift(tailIdx + 1).map(_.toInt).getOrElse(100000) else 0
    try {
      val all = corpus(spark, n + tailBatches * tailSize, batchSize).persist()
      all.count() // materialize so generation cost is not timed
      val cfg = IncrementalDedup.Config(s"$work/state", stateBloomFpp = None)
      val wholeOnly = args.contains("wholeonly")
      (0 until (if (wholeOnly) 0 else batches)).foreach { b =>
        val batch = all.filter(col("doc_id") >= b.toLong * batchSize &&
          col("doc_id") < (b + 1).toLong * batchSize)
        val t0 = System.nanoTime()
        val kept = IncrementalDedup.applyBatch(spark, batch, b.toLong, cfg)
        System.err.println(f"[incdedup] batch $b%2d: ${(System.nanoTime() - t0) / 1e9}%6.2fs " +
          f"($kept survivors of $batchSize; stored state ${b.toLong * batchSize} docs)")
      }
      // Steady-state A/B: small arrivals against the full built state,
      // alternating the Bloom prune OFF (even) / ON (odd).
      (0 until tailBatches).foreach { tb =>
        val lo = n.toLong + tb.toLong * tailSize
        val batch = all.filter(col("doc_id") >= lo && col("doc_id") < lo + tailSize)
        val c = cfg.copy(stateBloomFpp = if (tb % 2 == 1) Some(0.005) else None)
        val t0 = System.nanoTime()
        val kept = IncrementalDedup.applyBatch(spark, batch, (batches + tb).toLong, c)
        System.err.println(f"[incdedup] tail $tb%2d bloom=${c.stateBloomFpp.isDefined}%-5s: " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2fs ($kept survivors of $tailSize; " +
          f"stored state ${n.toLong + tb.toLong * tailSize} docs)")
      }
      // The alternative a stateless pipeline pays on EVERY batch arrival:
      // whole-corpus candidate generation + verify over all n docs.
      val t0 = System.nanoTime()
      val pairs = TextOps.candidateJaccardOf(spark, all)
        .filter(col("jaccard") >= 0.5).count()
      System.err.println(f"[incdedup] whole-corpus dedup of $n docs: " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2fs ($pairs dup pairs)")
      all.unpersist()
    } finally spark.stop()
  }
}
