package graft

import graft.ops.IncrementalDedup
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite

/** The table-growth lifecycle of the incremental-dedup state: at 100 TB the
  * signature tables outgrow their creation-time bucket count, and
  * `IceLite.rebucket` is the sanctioned fix. This spec rebuckets BOTH state
  * tables between two batches and asserts the operator keeps deduping
  * correctly — `applyBatch` must take every bucket count from the loaded
  * snapshot (never from its Config, which only seeds table creation), so the
  * band probe, the docsigs probe, and the state appends all follow the new
  * count, and the cross-batch dups spanning the rebucket are still found.
  */
class IncrementalDedupRebucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "one two three four five six seven",
    3L -> "red green blue cyan magenta yellow black",
    4L -> "north south east west up down",
    5L -> "pack my box with five dozen liquor jugs",
    21L -> "red green blue cyan magenta yellow black",
    22L -> "alpha beta gamma delta epsilon zeta",
    23L -> "totally unrelated text with its own words",
    24L -> "pack my box with six dozen liquor jugs")

  test("rebucketing the state tables between batches preserves dedup semantics") {
    import spark.implicits._
    val state = TestSpark.freshDir("incdedup-rebucket")
    val cfg = IncrementalDedup.Config(state, numBuckets = 4)
    val (b1, b0) = corpus.partition(_._1 >= 20)

    val n0 = IncrementalDedup.applyBatch(spark, b0.toDF("doc_id", "text"), 0L, cfg)
    assert(n0 == b0.size, "batch 0 has no internal dups")

    // The corpus "grew": double both state tables' bucket counts. The new
    // snapshots re-hash every stored row under the new count.
    assert(IceLite.rebucket(spark, s"$state/sigindex", 8).numBuckets == 8)
    assert(IceLite.rebucket(spark, s"$state/docsigs", 8).numBuckets == 8)

    // Batch 1 carries dups against PRE-rebucket state (21 dups 3, 22 dups 1)
    // and a near-but-not-dup (24 vs 5). A stale bucket count anywhere in the
    // probe or append path would hash band keys to the wrong buckets and
    // silently miss these pairs.
    val n1 = IncrementalDedup.applyBatch(spark, b1.toDF("doc_id", "text"), 1L, cfg)
    assert(n1 >= 0)
    val got = IncrementalDedup.survivors(spark, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(got == DedupReference.survivors(corpus, cfg.threshold),
      s"post-rebucket survivors diverge: got $got")
    val gotPairs = IncrementalDedup.dupPairs(spark, cfg)
      .as[(Long, Long)].collect().toSet
    assert(gotPairs == DedupReference.pairs(corpus, cfg.threshold),
      s"post-rebucket pair log diverges: got $gotPairs")
  }
}
