package graft

import graft.ops.{PairMaintenance, TextOps}
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Isolates the pair-maintenance CANDIDATE PROBE — the one term of a
  * refresh that grows with stored state — and measures it both ways on the
  * SAME stored band index: full scan (what the legacy full-composite-key
  * layout forces) vs bucket-pruned read (what the `bucketSep` prefix
  * transform enables). End-to-end refresh A/Bs drown this term in ~8-9 s of
  * fixed per-refresh cost (three state applies + commits + verify joins)
  * against a multi-second co-tenant noise floor; here the two reads run
  * back-to-back on identical files, and the manifest row counts give a
  * DETERMINISTIC rows-scanned ratio no noise can touch.
  *
  * Also prices the bucket-count lever: `IceLite.rebucket` (which carries
  * the transform forward) to a finer bucket count, then re-probes — at
  * 10^9-doc state this pair (transform + rebucket) is the recorded scale
  * path for small-refresh steady state.
  *
  * Run AFTER BenchPairMaint has built a prefix-layout state dir — the
  * default points at BenchPairMaint's default largest size (160000); for a
  * bigger state pass matching args to BOTH (`BenchPairMaint 640000`, then
  * `BenchPairProbe target/bench-pairmaint/state-prefix-640000`):
  * `sbt "runMain graft.BenchPairProbe [stateDir] [rebucketTo]"`.
  */
object BenchPairProbe {

  def main(args: Array[String]): Unit = {
    val stateDir = args.headOption
      .getOrElse("/root/repo/target/bench-pairmaint/state-prefix-160000")
    val rebucketTo = args.lift(1).map(_.toInt).getOrElse(1024)
    val bandIdx = s"$stateDir/bandindex"
    val numHashes = PairMaintenance.Config(stateDir).numHashes
    val spark = SparkSession.builder()
      .master("local[32]").appName("bench-pairprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      require(IceLite.exists(bandIdx), s"no band index at $bandIdx — run BenchPairMaint first")

      def probe(ks: Seq[Int]): Unit = {
        val snap = IceLite.load(bandIdx)
        require(snap.bucketSep.contains("@"), "probe bench needs the prefix layout")
        val entries = snap.buckets ++ snap.deltas
        val totalRows = entries.map(_.rows).sum
        ks.foreach { k =>
          // The touched docs' new band keys, exactly as refresh derives them.
          val docs = BenchPairMaint.corpus(spark, 1000, k.toLong)
          val sh = TextOps.shingleSetsOf(spark, docs)
          val newBands = sh.select(col("doc_id"), explode(
              PairMaintenance.bandKeys(spark, col("sh"), numHashes)).as("bk"))
            .select(col("bk"), col("doc_id").as("y")).persist()
          val nBks = newBands.select("bk").distinct().count()
          val touched = newBands.select(IceLite.bucketExpr(col("bk"), snap.numBuckets).as("b"))
            .distinct().collect().map(_.getInt(0)).toSet
          val sliceRows = entries.filter(e => touched.contains(e.bucket)).map(_.rows).sum
          def candidates(buckets: Option[Set[Int]]): (Long, Double) = {
            val t0 = System.nanoTime()
            val n = IceLite.readStored(spark, bandIdx, snap, buckets = buckets)
              .filter(!col(IceLite.DeletedCol))
              .select(col("bk"), col("doc_id").as("x"))
              .join(newBands, "bk")
              .filter(col("x") =!= col("y"))
              .select(least(col("x"), col("y")), greatest(col("x"), col("y")))
              .distinct().count()
            (n, (System.nanoTime() - t0) / 1e9)
          }
          val (nFull, tFull) = candidates(None)
          val (nPruned, tPruned) = candidates(Some(touched))
          require(nFull == nPruned,
            s"pruned probe must see the identical candidate set ($nFull != $nPruned)")
          newBands.unpersist()
          println(f"[pairprobe] buckets=${snap.numBuckets}%4d k=$k%4d bks=$nBks%5d " +
            f"touchedBuckets=${touched.size}%4d/${snap.numBuckets} " +
            f"rows=$sliceRows%10d/$totalRows%d (${sliceRows * 100.0 / totalRows}%5.1f%%) " +
            f"cands=$nFull%6d tFull=$tFull%6.2fs tPruned=$tPruned%6.2fs " +
            f"speedup=${tFull / tPruned}%4.1fx")
        }
      }

      val ks = Seq(1, 10, 100)
      probe(ks)
      val t0 = System.nanoTime()
      IceLite.rebucket(spark, bandIdx, rebucketTo)
      println(f"[pairprobe] rebucket -> $rebucketTo in ${(System.nanoTime() - t0) / 1e9}%.1fs " +
        "(transform carried forward)")
      probe(ks)
    } finally spark.stop()
  }
}
