package graft

import graft.cdc.MergeApply
import graft.ops.IncrementalDedup
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Exactly-once recovery when a crash lands between the two state-table
  * appends (they run as concurrent futures, so either can commit alone).
  * The round-4 guard checked only the sigindex epoch log: a retry after a
  * sigindex-only commit returned -1 and docsigs permanently missed the
  * batch's shingle sets — later batches' exact-Jaccard verify then silently
  * dropped those candidates and KEPT true duplicates. The guard now
  * requires BOTH tables to have the epoch; this spec drives exactly the
  * broken interleaving and asserts the retry heals the state.
  */
class IncrementalDedupRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // doc 12 is UNIQUE within batch 1 and doc 23 (batch 2) is its exact copy:
  // under the old bug, 12's shingle set never reaches docsigs, the (12, 23)
  // candidate fails the verify join, and 23 wrongly survives.
  private val batch0 = Seq(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "one two three four five six seven",
    3L -> "red green blue cyan magenta yellow black")
  private val batch1 = Seq(
    11L -> "red green blue cyan magenta yellow black",
    12L -> "lorem ipsum dolor sit amet consectetur")
  private val batch2 = Seq(
    21L -> "alpha beta gamma delta epsilon zeta",
    23L -> "lorem ipsum dolor sit amet consectetur")
  private val corpus = batch0 ++ batch1 ++ batch2

  test("a sigindex-only epoch commit is retried, not skipped; dedup converges") {
    import spark.implicits._
    val cfg = IncrementalDedup.Config(TestSpark.freshDir("incdedup-recover"), numBuckets = 4)
    val sigIndex = s"${cfg.stateDir}/sigindex"
    val docSigs = s"${cfg.stateDir}/docsigs"

    assert(IncrementalDedup.applyBatch(spark, batch0.toDF("doc_id", "text"), 0L, cfg) == 3L)

    // Simulate the crash: epoch 1 commits to sigindex IN FULL (the same
    // band rows applyBatch derives), docsigs never sees it — the exact
    // state a crash between the concurrent appends leaves behind.
    val sh1 = graft.ops.TextOps.shingleSetsOf(spark,
      batch1.toDF("doc_id", "text"))
    val bands1 = sh1.select(col("doc_id"),
        graft.ops.TextOps.minhashSignature(spark, col("sh"), cfg.numHashes).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")))
      .select(lit("U").as("op"), col("doc_id").as("lsn"),
        concat(lit("b"), col("pos"), lit("|"), col("col")).as("conv_id"),
        col("doc_id").cast("int").as("turn_idx"), col("doc_id"))
    MergeApply.applyChanges(spark, sigIndex, bands1, 1L)
    assert(IceLite.load(sigIndex).hasBatch(1L) && !IceLite.load(docSigs).hasBatch(1L))

    // The retry must RUN (not -1), drop 11 (dup of stored 3), and land
    // batch 1 in docsigs.
    val n1 = IncrementalDedup.applyBatch(spark, batch1.toDF("doc_id", "text"), 1L, cfg)
    assert(n1 == 1L, s"retry should run and keep only doc 12, got $n1")
    assert(IceLite.load(docSigs).hasBatch(1L), "retry did not heal docsigs")

    // Batch 2: 21 dups stored 1; 23 dups stored 12 — the pair the old bug
    // lost. Both must be dropped.
    val n2 = IncrementalDedup.applyBatch(spark, batch2.toDF("doc_id", "text"), 2L, cfg)
    assert(n2 == 0L, s"batch 2 must drop both docs (21~1, 23~12), kept $n2")
    val pairs = IncrementalDedup.dupPairs(spark, cfg)
      .distinct().as[(Long, Long)].collect().toSet
    assert(pairs == DedupReference.pairs(corpus, cfg.threshold),
      "pair log diverged from the corpus-wide reference")

    // Fully-committed epochs still no-op.
    assert(IncrementalDedup.applyBatch(spark, batch1.toDF("doc_id", "text"), 1L, cfg) == -1L)
  }
}
