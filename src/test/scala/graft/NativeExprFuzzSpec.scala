package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity fuzz for the native codegen expressions vs the builtin
  * compositions they replaced — 300 generated strings stressing the split
  * semantics (consecutive/leading/trailing spaces, empty words, short
  * texts, punctuation-heavy tokens, and NON-ASCII text — accented Latin,
  * Greek with case mappings, CJK multi-byte — so the `lower()` parity
  * contract is exercised beyond the ASCII fast path) in ONE DataFrame pass
  * per expression.
  */
class NativeExprFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def gen(): Seq[String] = {
    val rnd = new scala.util.Random(20260817L)
    val alphabets = Seq(
      "abcdefgh ", "AbC deF@. ", "x  y", " z ", "0123-=%$ ",
      "word word word word ",
      "Äß Éè Øå ", "ΣΩΦ σωφ ", "日本語 テスト ", "aÄ bΩ c語 ")
    (0 until 300).map { i =>
      val a = alphabets(i % alphabets.size)
      val len = rnd.nextInt(120)
      (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString
    } :+ "" :+ " " :+ "  " :+ "a" :+ "a b" :+ "a b c" :+
      "ÉCOLE ÀÉÎÖÜ çÇ" :+ "ΣΟΦΌΣ ΤΕΛΟΣ" :+ "straße GROẞ"
  }

  private def refShingles(text: Column): Column = {
    val w = split(lower(text), " ")
    val h = transform(w, x => xxhash64(x))
    val rolled = slice(zip_with(
      zip_with(h, slice(h, lit(2), size(h)), (a, b) => xxhash64(a, b)),
      slice(h, lit(3), size(h)), (ab, c) => xxhash64(ab, c)), lit(1), size(w) - 2)
    when(size(w) < 3, array(xxhash64(array_join(w, " ")))).otherwise(rolled)
  }

  test("ShingleHashes parity fuzz (306 generated strings)") {
    graft.functions.ShingleHashes.register(spark)
    import spark.implicits._
    val df = spark.createDataset(gen()).toDF("text").repartition(3)
      .select(call_function("shingle_hashes", col("text")).as("fast"),
        refShingles(col("text")).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("MinhashSig parity fuzz over the same shingle sets") {
    graft.functions.MinhashSig.register(spark)
    import spark.implicits._
    val df = spark.createDataset(gen()).toDF("text").repartition(3)
      .select(array_distinct(refShingles(col("text"))).as("sh"))
      .select(call_function("minhash_sig", col("sh"), lit(16)).as("fast"),
        array((0 until 16).map(h =>
          array_min(transform(col("sh"), s => xxhash64(s, lit(h))))): _*).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("SimhashBits parity fuzz vs word-half layout + per-bit fold") {
    graft.functions.SimhashBits.register(spark)
    import spark.implicits._
    def fold(words: Seq[(Long, Long)]): Seq[Long] = {
      def bitSum(b: Int): Int = words.map { case (wl, wh) =>
        val f = if (b < 32) wl else wh
        if (((f >> (31 - (b % 32))) & 1L) == 1L) 1 else -1
      }.sum
      def half(bits: Range): Long =
        bits.map(b => if (bitSum(b) > 0) 1L << (b % 32) else 0L).reduce(_ | _)
      Seq(half(0 until 32), half(32 until 64))
    }
    val rows = spark.createDataset(gen()).toDF("text").repartition(3)
      .select(graft.ops.TextOps.simhashWordHalves(col("text")).as("wx"),
        call_function("simhash_bits", col("text")).as("fp"))
      .collect()
    rows.foreach { r =>
      val words = r.getSeq[org.apache.spark.sql.Row](0).map(w => (w.getLong(0), w.getLong(1)))
      assert(r.getSeq[Long](1) == fold(words))
    }
  }

  test("RollingMinHash parity fuzz vs BigInt reference") {
    val texts = gen()
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      val expect =
        if (bytes.isEmpty) 0L
        else {
          val kk = math.min(16, bytes.length)
          (0 to bytes.length - kk).map { i =>
            bytes.slice(i, i + kk).foldLeft(BigInt(0))((h, b) =>
              (h * 31 + (b & 0xff)) mod 1000000007L)
          }.min.toLong
        }
      assert(graft.functions.RollingMinHash.minHash(bytes, 16, 31L, 1000000007L) == expect)
    }
  }
}
