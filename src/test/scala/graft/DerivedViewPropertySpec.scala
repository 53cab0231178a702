package graft

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: for ANY feed and ANY LSN-contiguous split of its delivery into
  * stream-drain rounds, a derived view maintained through the icelite
  * streaming source with the materialized-view D/U rule (delete when the
  * window's final winner is deleted-or-fails-the-predicate) equals the view
  * recomputed from scratch — and an extra drain with no new commits changes
  * nothing. Round boundaries must respect LSN order (the changesSince
  * monotone-watermark contract, same restriction the driver queries stage
  * under); WITHIN a round, sub-batch order is free — the window fold
  * absorbs it.
  */
class DerivedViewPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class E(op: String, lsn: Long, conv: String, turn: Int, role: String) {
    def json: String =
      if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn}"""
      else s"""{"op":"$op","lsn":$lsn,"conv_id":"$conv","turn_idx":$turn,"after":{"role":"$role","text":"v$lsn"}}"""
  }

  private val genCase: Gen[(List[E], Int, Long)] = for {
    n <- Gen.choose(4, 24)
    ops <- Gen.listOfN(n, Gen.frequency(5 -> "U", 3 -> "I", 2 -> "D"))
    keys <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 2)))
    roles <- Gen.listOfN(n, Gen.oneOf("keep1", "keep2", "drop"))
    rounds <- Gen.choose(1, 3)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val events = ops.zip(keys).zip(roles).zipWithIndex.map {
      case (((op, (c, t)), r), i) => E(op, i + 1L, c, t, r)
    }
    (events, rounds, seed)
  }

  /** From-scratch view: LWW winner per key, live, predicate role != "drop". */
  private def oracle(events: List[E]): Map[(String, Int), (String, String)] = {
    val m = scala.collection.mutable.Map.empty[(String, Int), E]
    events.sortBy(_.lsn).foreach(e => m((e.conv, e.turn)) = e)
    m.collect { case (k, e) if e.op != "D" && e.role != "drop" =>
      k -> (e.role, s"v${e.lsn}")
    }.toMap
  }

  private def viewState(dir: String): Map[(String, Int), (String, String)] =
    IceLite.read(spark, dir).collect().map(r =>
      (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        (r.getAs[String]("role"), r.getAs[String]("text"))).toMap

  private def drainInto(baseDir: String, derived: String, ckpt: String): Unit = {
    val q = spark.readStream.format("icelite").load(baseDir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val changes = df.select(
          when(col(IceLite.DeletedCol) || col("role") === "drop", "D")
            .otherwise("U").as("op"),
          col(IceLite.LsnCol).as("lsn"), col("conv_id"), col("turn_idx"),
          col("role"), col("text"))
        MergeApply.applyChanges(spark, derived, changes, batchId = id)
        ()
      }.start()
    q.awaitTermination()
  }

  private var caseN = 0

  test("derived view through the stream equals the from-scratch view for any feed and round split") {
    val prop = Prop.forAllNoShrink(genCase) { case (events, rounds, seed) =>
      caseN += 1
      val base = TestSpark.freshDir(s"dvprop-$caseN")
      val derived = TestSpark.freshDir(s"dvprop-$caseN-view")
      val ckpt = TestSpark.freshDir(s"dvprop-$caseN-ckpt")
      IceLite.create(base, numBuckets = 2)
      IceLite.create(derived, numBuckets = 2)
      val rnd = new scala.util.Random(seed)
      // LSN-contiguous chunks per round; within a round, shuffled sub-batches.
      val per = math.max(1, (events.size + rounds - 1) / rounds)
      var nextBatch = 0L
      events.sortBy(_.lsn).grouped(per).foreach { chunk =>
        rnd.shuffle(chunk).grouped(math.max(1, chunk.size / 2)).foreach { sub =>
          MergeApply.applyRaw(spark, base, sub.map(_.json).toDF("value"), nextBatch)
          nextBatch += 1
        }
        drainInto(base, derived, ckpt)
      }
      val after = viewState(derived)
      drainInto(base, derived, ckpt) // no new commits: must change nothing
      val expected = oracle(events)
      Prop(after == expected && viewState(derived) == after) :|
        s"got $after expected $expected"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
