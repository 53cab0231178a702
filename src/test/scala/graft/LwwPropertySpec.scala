package graft

import graft.cdc.MergeApply
import graft.cdc.MergeApply.CompactionPolicy
import graft.table.IceLite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based convergence tests (SURVEY.md §5.2 #3): for ANY event
  * sequence and ANY batching/ordering of delivery, the applied table equals
  * the single-threaded oracle; re-applying every batch is a no-op. Event
  * payloads vary per LSN so LWW mistakes can't hide behind identical rows.
  * Sizes kept small — each Spark apply is a full MERGE.
  */
class LwwPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class E(op: String, lsn: Long, conv: String, turn: Int) {
    def json: String =
      if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn}"""
      else s"""{"op":"$op","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn,"after":{"text":"v$lsn"}}"""
  }

  /** Events + a random batching of a random delivery permutation. */
  private val genCase: Gen[(List[E], List[List[E]])] = for {
    n <- Gen.choose(1, 28)
    ops <- Gen.listOfN(n, Gen.frequency(5 -> "U", 3 -> "I", 2 -> "D"))
    keys <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 2)))
    permSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
    nb <- Gen.choose(1, math.max(1, n / 3))
  } yield {
    val events = ops.zip(keys).zipWithIndex.map { case ((op, (c, t)), i) => E(op, i + 1L, c, t) }
    val shuffled = new scala.util.Random(permSeed).shuffle(events)
    val per = math.max(1, (n + nb - 1) / nb)
    (events, shuffled.grouped(per).toList)
  }

  private def oracle(events: List[E]): Map[(String, Int), String] = {
    val m = scala.collection.mutable.Map.empty[(String, Int), String]
    events.sortBy(_.lsn).foreach { e =>
      if (e.op == "D") m.remove((e.conv, e.turn)) else m((e.conv, e.turn)) = s"v${e.lsn}"
    }
    m.toMap
  }

  private def tableText(dir: String): Map[(String, Int), String] =
    IceLite.read(spark, dir).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> r.getAs[String]("text"))
      .toMap

  private var caseN = 0

  test("any batching/permutation of a feed converges to the LSN-order oracle; re-apply is idempotent") {
    val prop = Prop.forAllNoShrink(genCase) { case (events, batches) =>
      caseN += 1
      val dir = TestSpark.freshDir(s"lww-prop-$caseN")
      // alternate compaction policies so both code paths face the fuzz
      val policy =
        if (caseN % 2 == 0) CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 2)
        else CompactionPolicy(factor = 1e9, minRows = Long.MaxValue / 2, maxDeltaFiles = 1000)
      IceLite.create(dir, numBuckets = 2)
      batches.zipWithIndex.foreach { case (b, i) =>
        MergeApply.applyRaw(spark, dir, b.map(_.json).toDF("value"), i.toLong, policy = policy)
      }
      val once = tableText(dir)
      // replay every batch again with FRESH batchIds (worst case: checkpoint
      // lost); LWW must keep the state identical
      batches.zipWithIndex.foreach { case (b, i) =>
        MergeApply.applyRaw(spark, dir, b.map(_.json).toDF("value"), 1000L + i, policy = policy)
      }
      val twice = tableText(dir)
      val want = oracle(events)
      Prop(once == want) :| s"after first apply: got=$once want=$want" &&
        Prop(twice == want) :| s"after re-apply: got=$twice want=$want"
    }
    // GRAFT_FUZZ_N overrides the case count for extended one-off fuzz runs.
    val n = sys.env.getOrElse("GRAFT_FUZZ_N", "8").toInt
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }
}
