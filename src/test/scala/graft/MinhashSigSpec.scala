package graft

import graft.functions.MinhashSig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinhashSig: one-pass native signature vs the builtin composition. */
class MinhashSigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bit-exact with array_min(transform(sh, xxhash64(s, lit(h)))) per hash") {
    MinhashSig.register(spark)
    val df = spark.range(100).select(
      transform(sequence(lit(0), pmod(col("id"), lit(9))),
        i => xxhash64(col("id"), i)).as("sh"))
    val n = 16
    val ref = array((0 until n).map { h =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(h))))
    }: _*)
    val both = df.select(call_function("minhash_sig", col("sh"), lit(n)).as("fast"),
      ref.as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    assert(both.filter(col("fast") === col("slow")).count() == 100)
  }

  test("empty shingle set yields all-null signature (array_min parity)") {
    MinhashSig.register(spark)
    val df = spark.range(1)
      .select(array().cast("array<bigint>").as("sh"))
      .select(call_function("minhash_sig", col("sh"), lit(4)).as("sig"))
    val sig = df.head().getSeq[Any](0)
    assert(sig.size == 4 && sig.forall(_ == null))
  }
}
