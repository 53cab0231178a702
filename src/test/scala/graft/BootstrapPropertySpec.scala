package graft

import graft.cdc.MergeApply
import graft.cdc.MergeApply.CompactionPolicy
import graft.table.IceLite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck form of the bootstrap-handoff equivalence: for ARBITRARY
  * feeds (random I/U/D mixes, keys, delivery permutations, batchings) and
  * an ARBITRARY cutoff, replaying the folded consistent snapshot of the
  * prefix (one `I` per live key at its original LSN) followed by only the
  * post-cutoff tail converges to the same table as replaying the whole
  * history — including the adversarial cases a fixed feed may miss: a key
  * deleted before the cutoff and revived after it, a key deleted after the
  * cutoff, interleaved duplicate deliveries inside the tail.
  */
class BootstrapPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class E(op: String, lsn: Long, conv: String, turn: Int) {
    def json: String =
      if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn}"""
      else s"""{"op":"$op","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn,"after":{"text":"v$lsn"}}"""
  }

  private val genCase: Gen[(List[E], Long, List[List[E]])] = for {
    n <- Gen.choose(1, 28)
    ops <- Gen.listOfN(n, Gen.frequency(5 -> "U", 3 -> "I", 2 -> "D"))
    keys <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 2)))
    cut <- Gen.choose(0, n)
    permSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
    nb <- Gen.choose(1, math.max(1, n / 3))
  } yield {
    val events = ops.zip(keys).zipWithIndex.map { case ((op, (c, t)), i) => E(op, i + 1L, c, t) }
    val tail = events.filter(_.lsn > cut)
    val shuffled = new scala.util.Random(permSeed).shuffle(tail)
    val per = math.max(1, (tail.size + nb - 1) / nb)
    (events, cut.toLong, shuffled.grouped(per).toList)
  }

  /** LSN-order state at the cutoff: key -> winning (lsn, text), live only. */
  private def stateAt(events: List[E], cut: Long): Map[(String, Int), (Long, String)] = {
    val m = scala.collection.mutable.Map.empty[(String, Int), (Long, String)]
    events.filter(_.lsn <= cut).sortBy(_.lsn).foreach { e =>
      if (e.op == "D") m.remove((e.conv, e.turn))
      else m((e.conv, e.turn)) = (e.lsn, s"v${e.lsn}")
    }
    m.toMap
  }

  private def tableText(dir: String): Map[(String, Int), String] =
    IceLite.read(spark, dir).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> r.getAs[String]("text"))
      .toMap

  private var caseN = 0

  test("snapshot ∘ tail ≡ full replay for arbitrary feeds, cutoffs and batchings") {
    val prop = Prop.forAllNoShrink(genCase) { case (events, cut, tailBatches) =>
      caseN += 1
      val dir = TestSpark.freshDir(s"bootstrap-prop-$caseN")
      val policy =
        if (caseN % 2 == 0) CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 2)
        else CompactionPolicy(factor = 1e9, minRows = Long.MaxValue / 2, maxDeltaFiles = 1000)
      IceLite.create(dir, numBuckets = 2)
      // Bootstrap epoch: the folded snapshot, one I per live key at its
      // original LSN.
      val snapshot = stateAt(events, cut).toList.map { case ((c, t), (l, _)) => E("I", l, c, t) }
      MergeApply.applyRaw(spark, dir, snapshot.map(_.json).toDF("value"), 0L, policy = policy)
      // Handoff: only post-cutoff events flow, in arbitrary order/batching.
      tailBatches.zipWithIndex.foreach { case (b, i) =>
        MergeApply.applyRaw(spark, dir, b.map(_.json).toDF("value"), i + 1L, policy = policy)
      }
      val got = tableText(dir)
      val want = stateAt(events, Long.MaxValue).map { case (k, (_, txt)) => k -> txt }
      Prop(got == want) :| s"cut=$cut got=$got want=$want"
    }
    val n = sys.env.getOrElse("GRAFT_FUZZ_N", "8").toInt
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }
}
