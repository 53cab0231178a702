package graft

import graft.cdc.MergeApply
import graft.ops.{PairMaintenance, TextOps}
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-retry convergence for the maintained pair view. The three state
  * commits of one [[PairMaintenance.refresh]] run sequentially under one
  * epoch, so a crash can land after the docsigs commit and before the band
  * index sees it. On retry, `droppedBands` is derived from the ALREADY
  * updated stored signatures and comes out empty — the re-signed doc's
  * stale band rows stay live in the index forever. The class doc's claim is
  * that this residue is pure probe cost: the VIEW still converges (exact
  * verify grounds every candidate in live docsigs) and
  * [[PairMaintenance.rebuildIndex]] reclaims the dead rows. This spec
  * drives exactly that interleaving and asserts both halves.
  */
class PairMaintenanceRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def live(cfg: PairMaintenance.Config): Set[(String, String)] =
    PairMaintenance.livePairs(spark, cfg).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  private def liveIndex(cfg: PairMaintenance.Config): Set[(String, String)] = {
    val p = s"${cfg.stateDir}/bandindex"
    IceLite.read(spark, p).select("bk", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  /** The band set live docsigs implies — what the index SHOULD hold. */
  private def indexTruth(cfg: PairMaintenance.Config): Set[(String, String)] =
    IceLite.read(spark, s"${cfg.stateDir}/docsigs")
      .select(col("conv_id").as("doc_id"), explode(col("bks")).as("bk"))
      .select("bk", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("docsigs-only partial commit: retry converges, rebuildIndex reclaims orphans") {
    val cfg = PairMaintenance.Config(TestSpark.freshDir("pairmaint-recover"), numBuckets = 4)
    val docSigs = s"${cfg.stateDir}/docsigs"
    val bandIdx = s"${cfg.stateDir}/bandindex"
    val base = "alpha beta gamma delta epsilon zeta eta theta"

    // Epoch 0: bootstrap — A and its near-dup B pair up.
    PairMaintenance.refresh(spark, cfg,
      Seq("A" -> base, "B" -> (base + " iota")).toDF("doc_id", "text"),
      Seq("A", "B").toDF("doc_id"), lsn = 1, epoch = 0)
    assert(live(cfg) == Set(("A", "B")))
    val bootstrapIdx = liveIndex(cfg)
    assert(bootstrapIdx == indexTruth(cfg))

    // Epoch 1 intends: B rewritten to unrelated text. Simulate the crash —
    // commit ONLY the docsigs change (the same U row refresh derives),
    // leaving the band index one epoch behind.
    val newB = Seq("B" -> "totally different words nothing shared at all here")
    val sh = TextOps.shingleSetsOf(spark, newB.toDF("doc_id", "text"))
    val dsChanges = sh.select(col("doc_id"), col("sh"),
        transform(TextOps.minhashSignature(spark, col("sh"), cfg.numHashes),
          (v, i) => concat(lit("b"), i, lit("|"), v)).as("bks"))
      .select(lit("U").as("op"), lit(2L).as("lsn"), col("doc_id").as("conv_id"),
        lit(0).as("turn_idx"), col("sh"), col("bks"))
    MergeApply.applyChanges(spark, docSigs, dsChanges, batchId = 1L)
    assert(IceLite.load(docSigs).hasBatch(1L) && !IceLite.load(bandIdx).hasBatch(1L))

    // Full retry of epoch 1: the docsigs apply skips (same epoch), the
    // band index and pair commits run. The view must converge to the
    // from-scratch answer — (A,B) retracted, nothing else.
    PairMaintenance.refresh(spark, cfg, newB.toDF("doc_id", "text"),
      Seq("B").toDF("doc_id"), lsn = 2, epoch = 1)
    assert(IceLite.load(bandIdx).hasBatch(1L))
    assert(live(cfg).isEmpty, "retry must still retract the destroyed (A,B) pair")

    // The documented residue is real: B's pre-rewrite band rows are still
    // live (the retry's droppedBands was empty), so the index strictly
    // exceeds what live docsigs implies.
    val truth = indexTruth(cfg)
    val leaked = liveIndex(cfg)
    assert(truth.subsetOf(leaked) && leaked != truth,
      s"expected orphan band rows to survive the retry (leaked=${leaked.size}, truth=${truth.size})")
    assert((leaked -- truth).forall(_._2 == "B"), "only the re-signed doc may leak")

    // GC: rebuild reconciles the index to exactly the live-docsigs truth
    // and leaves the pair view untouched.
    PairMaintenance.rebuildIndex(spark, cfg, lsn = 3, epoch = 2)
    assert(liveIndex(cfg) == truth)
    assert(live(cfg).isEmpty)

    // Replaying the GC epoch is a no-op (exactly-once).
    PairMaintenance.rebuildIndex(spark, cfg, lsn = 3, epoch = 2)
    assert(liveIndex(cfg) == truth)

    // The reconciled state keeps maintaining correctly: D arrives as a
    // near-dup of the still-live A and pairs against state.
    PairMaintenance.refresh(spark, cfg,
      Seq("D" -> (base + " kappa")).toDF("doc_id", "text"),
      Seq("D").toDF("doc_id"), lsn = 4, epoch = 3)
    assert(live(cfg) == Set(("A", "D")))
  }
}
