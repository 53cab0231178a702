package graft

import graft.ops.IncrementalDedup
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Split-invariance of the incremental dedup (VERDICT r3 #7): for ANY corpus
  * and ANY split into doc_id-ordered consecutive batches, the surviving set
  * equals the whole-corpus brute-force rule — a doc survives iff it has no
  * ≥threshold-Jaccard partner with a smaller doc_id. Corpora are drawn from
  * a tiny vocabulary so near-duplicates actually occur; batch counts vary
  * 1..4 (1 = the batch operator degenerates to corpus-wide dedup).
  */
class IncrementalDedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference semantics, driver-side (shared: [[DedupReference]]). */
  private def referenceSurvivors(docs: Seq[(Long, String)], threshold: Double): Set[Long] =
    DedupReference.survivors(docs, threshold)

  /** Corpus-wide verified pair set (doc_a < doc_b, Jaccard ≥ threshold). */
  private def referencePairs(docs: Seq[(Long, String)], threshold: Double): Set[(Long, Long)] =
    DedupReference.pairs(docs, threshold)

  private val genCase: Gen[(Seq[(Long, String)], Int)] = for {
    n <- Gen.choose(30, 70)
    vocabSize <- Gen.choose(8, 14)
    lens <- Gen.listOfN(n, Gen.choose(1, 8))
    words <- Gen.listOfN(n * 8, Gen.choose(0, vocabSize - 1))
    nBatches <- Gen.choose(1, 4)
  } yield {
    val docs = lens.zipWithIndex.map { case (len, i) =>
      (i.toLong, (0 until len).map(j => s"w${words(i * 8 + j)}").mkString(" "))
    }
    (docs, nBatches)
  }

  private var caseN = 0

  test("any doc_id-ordered batch split yields the whole-corpus surviving set") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(genCase) { case (docs, nBatches) =>
      caseN += 1
      val dir = TestSpark.freshDir(s"incdedup-prop-$caseN")
      // Alternate the state-side Bloom prune so BOTH probe paths are held
      // to the same brute-force reference (the prune must be invisible).
      // bloomMinStateRows = 0 forces the bloom path at spec scale — the
      // production default's manifest-row floor would silently skip it.
      val cfg = IncrementalDedup.Config(dir, numBuckets = 4,
        stateBloomFpp = if (caseN % 2 == 0) None else Some(0.005),
        bloomMinStateRows = 0L)
      val per = math.max(1, (docs.size + nBatches - 1) / nBatches)
      docs.sortBy(_._1).grouped(per).zipWithIndex.foreach { case (batch, i) =>
        IncrementalDedup.applyBatch(spark, batch.toDF("doc_id", "text"), i.toLong, cfg)
      }
      val got = IncrementalDedup.survivors(spark, cfg)
        .select("doc_id").as[Long].collect().toSet
      val want = referenceSurvivors(docs, cfg.threshold)
      // The accumulated per-batch pair LOG must equal the corpus-wide
      // verified pair set regardless of the split (each pair discovered
      // exactly once, in its larger member's batch) — the invariant the
      // incremental cluster query builds on.
      val gotPairs = IncrementalDedup.dupPairs(spark, cfg)
        .as[(Long, Long)].collect().toSet
      val wantPairs = referencePairs(docs, cfg.threshold)
      (Prop(got == want) :|
        s"batches=$nBatches missing=${want -- got} extra=${got -- want} corpus=${docs.take(8)}...") &&
        (Prop(gotPairs == wantPairs) :|
          s"pairlog batches=$nBatches missing=${wantPairs -- gotPairs} extra=${gotPairs -- wantPairs}")
    }
    val n = sys.env.getOrElse("GRAFT_FUZZ_N", "6").toInt
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("replaying a committed batch is a no-op (exactly-once state appends)") {
    import spark.implicits._
    val dir = TestSpark.freshDir("incdedup-idem")
    val cfg = IncrementalDedup.Config(dir, numBuckets = 4)
    val b0 = Seq((0L, "a b c d e"), (1L, "a b c d e"), (2L, "x y z q r")).toDF("doc_id", "text")
    val n0 = IncrementalDedup.applyBatch(spark, b0, 0L, cfg)
    assert(n0 == 2) // doc 1 deduped against doc 0 in-batch
    assert(IncrementalDedup.applyBatch(spark, b0, 0L, cfg) == -1L) // epoch replayed
    val b1 = Seq((3L, "a b c d e f")).toDF("doc_id", "text") // near-dup of stored doc 0
    assert(IncrementalDedup.applyBatch(spark, b1, 1L, cfg) == 0)
    assert(IncrementalDedup.survivors(spark, cfg)
      .select("doc_id").as[Long].collect().toSet == Set(0L, 2L))
  }
}
