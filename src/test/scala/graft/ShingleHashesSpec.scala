package graft

import graft.functions.ShingleHashes
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ShingleHashes: fused split+hash+roll vs the HOF composition it replaced. */
class ShingleHashesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The previous implementation, verbatim. */
  private def reference(text: Column): Column = {
    val w = split(lower(text), " ")
    val h = transform(w, x => xxhash64(x))
    val rolled = slice(zip_with(
      zip_with(h, slice(h, lit(2), size(h)), (a, b) => xxhash64(a, b)),
      slice(h, lit(3), size(h)), (ab, c) => xxhash64(ab, c)), lit(1), size(w) - 2)
    when(size(w) < 3, array(xxhash64(array_join(w, " ")))).otherwise(rolled)
  }

  test("bit-exact with the transform/zip_with composition, incl. edges") {
    ShingleHashes.register(spark)
    import spark.implicits._
    val texts = Seq(
      "The Quick Brown Fox Jumps Over THE lazy dog",
      "msg lsn=42 email=a@b.co https://x.example/z",
      "one two",            // < 3 words → whole-text hash
      "one",                // single word
      "",                   // empty text (one empty word)
      "double  space here", // consecutive spaces → empty word kept
      " leading and trailing ", // leading/trailing spaces → empty words
      "a b c",              // exactly 3 words → one shingle
      "a b c d e f g h i j k")
    // Through a real (non-local) plan so both paths run in executors.
    val df = spark.createDataset(texts).toDF("text")
      .repartition(2) // defeat ConvertToLocalRelation constant folding
      .select(col("text"),
        call_function("shingle_hashes", col("text")).as("fast"),
        reference(col("text")).as("slow"))
    val rows = df.collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"text='${r.getString(0)}'")
    }
  }

  test("shingle count: n-2 for n>=3 words, 1 otherwise") {
    val s3 = ShingleHashes.shingles(org.apache.spark.unsafe.types.UTF8String.fromString("a b c d"))
    assert(s3.numElements() == 2)
    val s1 = ShingleHashes.shingles(org.apache.spark.unsafe.types.UTF8String.fromString("ab"))
    assert(s1.numElements() == 1)
  }
}
