package graft

import graft.ops.PairMaintenance
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures [[PairMaintenance]] refresh cost as stored state grows with the
  * TOUCHED SET HELD CONSTANT — the steady-state question for dedup under
  * updates: what does a 1k-doc refresh cost against a 10k / 40k / 160k-doc
  * state? The operator's scaladoc records one deliberate trade (the
  * composite band@doc key buckets by full string, so the candidate probe
  * reads the live band index rather than a bk-pruned slice); this bench
  * makes the resulting state-proportional term VISIBLE rather than argued,
  * alongside the terms that stay flat. Run: `sbt "runMain graft.BenchPairMaint
  * [sizes...]"`.
  */
object BenchPairMaint {

  /** Deterministic ~24-word doc; every 20th doc is a near-dup of its
    * neighbor (same text minus the last word) so verified pairs exist at a
    * controlled ~5% rate.
    */
  private[graft] def corpus(spark: SparkSession, from: Long, n: Long): DataFrame = {
    val words = 24
    spark.range(from, from + n).toDF("i").select(
      concat(lit("d"), lpad(col("i").cast("string"), 8, "0")).as("doc_id"),
      when(col("i") % 20 =!= 0 || col("i") === from,
        concat_ws(" ", (0 until words).map(w =>
          concat(lit("w"), pmod(xxhash64(col("i"), lit(w)), lit(50000L)))): _*))
        .otherwise( // near-dup of doc i-1: same words, last one dropped
          concat_ws(" ", (0 until words - 1).map(w =>
            concat(lit("w"), pmod(xxhash64(col("i") - 1, lit(w)), lit(50000L)))): _*))
        .as("text"))
  }

  def main(args: Array[String]): Unit = {
    // `--legacy` pre-creates the band index WITHOUT the bucketSep prefix
    // transform (the pre-round-5 full-composite-key hash layout) so the two
    // index layouts run the IDENTICAL protocol — the measured A/B behind
    // BENCH.md's pair-maintenance section.
    val legacy = args.contains("--legacy")
    val sizeArgs = args.filterNot(_ == "--legacy")
    val sizes = if (sizeArgs.nonEmpty) sizeArgs.map(_.toLong).toSeq else Seq(10000L, 40000L, 160000L)
    val touched = 1000L
    val spark = SparkSession.builder()
      .master("local[32]").appName("bench-pairmaint")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      sizes.foreach { s =>
        val tag = if (legacy) "legacy" else "prefix"
        // Bucket count tracks state size (the rebucket story: ~300 docs per
        // bucket), so bucket-granular pruning — the prior-pairs read, the
        // docsigs slices — stays FLAT per touched doc as state grows instead
        // of proportional at a fixed bucket count. 10k→32, 40k→128, 160k→512.
        val stateBuckets = math.max(32, Integer.highestOneBit((s / 300).toInt))
        val cfg = PairMaintenance.Config(
          s"/root/repo/target/bench-pairmaint/state-$tag-$s", numBuckets = stateBuckets)
        if (legacy && !graft.table.IceLite.exists(s"${cfg.stateDir}/bandindex"))
          graft.table.IceLite.create(s"${cfg.stateDir}/bandindex",
            numBuckets = cfg.bandBuckets) // no bucketSep: full-composite hash
        val t0 = System.nanoTime()
        // Bootstrap: the whole corpus is the touched set once.
        val boot = corpus(spark, 0, s)
        PairMaintenance.refresh(spark, cfg, boot, boot.select("doc_id"),
          lsn = 1, epoch = 0)
        val tBoot = (System.nanoTime() - t0) / 1e9
        // Steady state: three 1k refreshes — half UPDATES of existing ids
        // (re-sign + band retraction), half new arrivals.
        val laps = (1 to 3).map { r =>
          val upd = corpus(spark, (r - 1) * touched * 7 % s, touched / 2)
          val fresh = corpus(spark, s + r * touched, touched / 2)
          val docs = upd.unionByName(fresh)
          val t1 = System.nanoTime()
          PairMaintenance.refresh(spark, cfg, docs, docs.select("doc_id"),
            lsn = r + 1L, epoch = r.toLong)
          (System.nanoTime() - t1) / 1e9
        }
        // The streaming steady state the prefix transform targets: a
        // 10-doc refresh touches ≤ ~2×16 band keys → ≤ ~32 of the 64 index
        // buckets new, but in practice far fewer per key — under the legacy
        // layout the probe scans the whole live index regardless.
        val smallLaps = (1 to 3).map { r =>
          val docs = corpus(spark, (s / 2 + r * 37) % s, 10)
          val t1 = System.nanoTime()
          PairMaintenance.refresh(spark, cfg, docs, docs.select("doc_id"),
            lsn = r + 10L, epoch = r + 10L)
          (System.nanoTime() - t1) / 1e9
        }
        // Deterministic prior-pairs read cost, from the manifest (like
        // BenchPairProbe): rows the pruned prior-pairs read OPENS for a
        // 10-doc touched set = manifest rows of the buckets those ids hash
        // to, vs the total pair-state rows a full scan would read. On the
        // oriented layout this stays flat as pair state grows; a legacy
        // table reads everything.
        val pSnap = graft.table.IceLite.load(s"${cfg.stateDir}/pairs")
        val probeDocs = corpus(spark, (s / 2 + 37) % s, 10)
        val probeBuckets = probeDocs
          .select(graft.table.IceLite.bucketExprFor(pSnap, col("doc_id")).as("b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val pairEntries = pSnap.buckets ++ pSnap.deltas
        val totalPairRows = pairEntries.map(_.rows).sum
        val openedPairRows =
          if (pSnap.bucketSep.contains("|"))
            pairEntries.filter(e => probeBuckets.contains(e.bucket)).map(_.rows).sum
          else totalPairRows
        val pairs = PairMaintenance.livePairs(spark, cfg).count()
        // The GC verb priced against the same state: rebuildIndex re-derives
        // the band index from live docsigs (two set-diffs over O(live state))
        // — the amortized cost of reclaiming crash-retry orphans.
        val t2 = System.nanoTime()
        PairMaintenance.rebuildIndex(spark, cfg, lsn = 99, epoch = 99)
        val tGc = (System.nanoTime() - t2) / 1e9
        val pairsAfter = PairMaintenance.livePairs(spark, cfg).count()
        require(pairsAfter == pairs, s"rebuildIndex must not move the pair view ($pairs -> $pairsAfter)")
        println(f"[pairmaint] layout=$tag state=$s%7d boot=$tBoot%7.1fs " +
          f"refresh1k=${laps.map(l => f"$l%.1f").mkString("/")}s " +
          f"median=${laps.sorted.apply(1)}%5.1fs " +
          f"refresh10=${smallLaps.map(l => f"$l%.1f").mkString("/")}s " +
          f"median10=${smallLaps.sorted.apply(1)}%5.1fs " +
          f"priorRead10=$openedPairRows/$totalPairRows rows " +
          f"livePairs=$pairs rebuildIndex=$tGc%5.1fs")
      }
    } finally spark.stop()
  }
}
