package graft

import graft.functions.SimhashPack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimhashPack: one-pass native fold vs the per-bit fold it replaced. */
class SimhashPackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The previous implementation's semantics, verbatim: per bit b, sum ±1
    * over words on word-half bit (31 − b%32); half bit b%32 set when the
    * sum is positive.
    */
  private def reference(words: Seq[(Long, Long)]): (Long, Long) = {
    def bitSum(b: Int): Int = words.map { case (wl, wh) =>
      val field = if (b < 32) wl else wh
      if (((field >> (31 - (b % 32))) & 1L) == 1L) 1 else -1
    }.sum
    def half(bits: Range): Long =
      bits.map(b => if (bitSum(b) > 0) 1L << (b % 32) else 0L).reduce(_ | _)
    (half(0 until 32), half(32 until 64))
  }

  test("one-pass pack is bit-exact with the per-bit fold, through a plan") {
    SimhashPack.register(spark)
    // Deterministic word halves shaped like the md5-derived ones (32-bit
    // non-negative), including edge rows: empty doc, single word.
    val mk = transform(sequence(lit(0), pmod(col("id"), lit(7))),
      i => struct(
        pmod(xxhash64(col("id"), i, lit("lo")), lit(1L << 32)).as("wl"),
        pmod(xxhash64(col("id"), i, lit("hi")), lit(1L << 32)).as("wh")))
    val df = spark.range(50).select(col("id"),
      when(pmod(col("id"), lit(11)) === 0,
        array().cast("array<struct<wl:bigint,wh:bigint>>")).otherwise(mk).as("wx"))
    val packed = df.select(col("id"), col("wx"),
      call_function("simhash_pack", col("wx")).as("p"))
    packed.collect().foreach { r =>
      val words = r.getSeq[org.apache.spark.sql.Row](1)
        .map(w => (w.getLong(0), w.getLong(1)))
      val (lo, hi) = reference(words)
      val p = r.getSeq[Long](2)
      assert(p == Seq(lo, hi), s"id=${r.getLong(0)} words=$words")
    }
  }
}
