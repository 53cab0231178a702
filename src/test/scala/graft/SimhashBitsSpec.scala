package graft

import graft.functions.SimhashBits
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimhashBits: the fused text→fingerprint pass vs the two-stage layout it
  * replaced (md5-derived word halves via TextOps.simhashWordHalves, then a
  * per-bit ±1 fold).
  */
class SimhashBitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The per-bit fold, verbatim from the previous implementation. */
  private def fold(words: Seq[(Long, Long)]): (Long, Long) = {
    def bitSum(b: Int): Int = words.map { case (wl, wh) =>
      val field = if (b < 32) wl else wh
      if (((field >> (31 - (b % 32))) & 1L) == 1L) 1 else -1
    }.sum
    def half(bits: Range): Long =
      bits.map(b => if (bitSum(b) > 0) 1L << (b % 32) else 0L).reduce(_ | _)
    (half(0 until 32), half(32 until 64))
  }

  test("fused pass == md5 word-half layout + per-bit fold, incl. edges") {
    SimhashBits.register(spark)
    import spark.implicits._
    val texts = Seq(
      "The Quick Brown Fox Jumps over the lazy dog",
      "msg lsn=7 email=a@b.co",
      "single",
      "",
      "double  space trailing ",
      "a b c d e f g h")
    val df = spark.createDataset(texts).toDF("text")
      .repartition(2) // keep it out of ConvertToLocalRelation
      .select(col("text"),
        TextOps.simhashWordHalves(col("text")).as("wx"),
        call_function("simhash_bits", col("text")).as("fp"))
    df.collect().foreach { r =>
      val words = r.getSeq[org.apache.spark.sql.Row](1)
        .map(w => (w.getLong(0), w.getLong(1)))
      val (lo, hi) = fold(words)
      assert(r.getSeq[Long](2) == Seq(lo, hi), s"text='${r.getString(0)}'")
    }
  }
}
