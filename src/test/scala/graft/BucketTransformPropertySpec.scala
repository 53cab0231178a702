package graft

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz for the `bucketSep` bucket-key transform: for ANY set of composite
  * "<prefix>@<suffix>" keys, ANY U/D event sequence and ANY batching, a
  * transformed table must (1) read identically to an untransformed table fed
  * the same batches — the transform changes LAYOUT, never content — and
  * (2) serve every prefix's bucket-pruned slice equal to the filtered full
  * read, which is the contract the pair-maintenance probe rests on.
  */
class BucketTransformPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class E(op: String, lsn: Long, key: String) {
    def json: String =
      if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"$key","turn_idx":0}"""
      else s"""{"op":"U","lsn":$lsn,"conv_id":"$key","turn_idx":0,"after":{"text":"v$lsn"}}"""
  }

  private val genCase: Gen[(List[String], List[List[E]])] = for {
    n <- Gen.choose(1, 30)
    prefixes <- Gen.listOfN(n, Gen.choose(0, 5).map(i => s"p$i"))
    suffixes <- Gen.listOfN(n, Gen.choose(0, 3).map(i => s"s$i"))
    ops <- Gen.listOfN(n, Gen.frequency(4 -> "U", 1 -> "D"))
    nb <- Gen.choose(1, math.max(1, n / 4))
  } yield {
    val keys = prefixes.zip(suffixes).map { case (p, s) => s"$p@$s" }
    val events = ops.zip(keys).zipWithIndex.map { case ((op, k), i) => E(op, i + 1L, k) }
    val per = math.max(1, (n + nb - 1) / nb)
    (keys.distinct, events.grouped(per).toList)
  }

  private def state(dir: String): Map[String, String] =
    IceLite.read(spark, dir).collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[String]("text")).toMap

  private var caseN = 0

  test("transform never changes content; every prefix slice equals the filtered full read") {
    val prop = Prop.forAllNoShrink(genCase) { case (keys, batches) =>
      caseN += 1
      val plain = TestSpark.freshDir(s"bsep-prop-plain-$caseN")
      val seped = TestSpark.freshDir(s"bsep-prop-seped-$caseN")
      IceLite.create(plain, numBuckets = 4)
      IceLite.create(seped, numBuckets = 4, bucketSep = Some("@"))
      for (dir <- Seq(plain, seped); (b, i) <- batches.zipWithIndex)
        MergeApply.applyRaw(spark, dir, b.map(_.json).toDF("value"), i.toLong)
      val full = state(seped)
      val slicesOk = keys.map(_.split("@")(0)).distinct.forall { p =>
        val snap = IceLite.load(seped)
        val b = spark.range(1).select(IceLite.bucketExpr(lit(p), snap.numBuckets))
          .collect()(0).getInt(0)
        val slice = IceLite.readStored(spark, seped, snap, Some(Set(b)))
          .filter(!col(IceLite.DeletedCol) && col("conv_id").startsWith(p + "@"))
          .collect().map(r => r.getAs[String]("conv_id") -> r.getAs[String]("text")).toMap
        slice == full.filter { case (k, _) => k.startsWith(p + "@") }
      }
      Prop(state(plain) == full) :| s"layouts diverged: plain=${state(plain)} seped=$full" &&
        Prop(slicesOk) :| "a prefix's pruned slice missed or invented rows"
    }
    val n = sys.env.getOrElse("GRAFT_FUZZ_N", "6").toInt
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }
}
