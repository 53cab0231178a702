package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring dedup: planted near-dups (a verbatim copy minus the
  * first word) must pair with their source via a shared 8-word window; the
  * frequency cap keeps boilerplate windows from exploding the join; pairs
  * are ordered and self-free.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted verbatim passages are paired; pairs are ordered, capped, symmetric-free") {
    import spark.implicits._
    val pairs = TextOps.dedupSubstring(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, n) => a < b && n >= 1 })
    // Every planted copy (source has ≥ 9 words so at least one 8-window
    // survives the dropped first word) pairs with its source.
    val planted = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("doc_id % 25 = 0 AND size(split(text, ' ')) >= 9")
      .select("doc_id").as[Long].collect().toSet
    val found = pairs.collect { case (a, b, _) if b == a + 100000L => a }.toSet
    assert(planted.subsetOf(found),
      s"missing planted pairs: ${(planted -- found).take(5)}")
    // A MinHash-invisible case: long distinct docs sharing one verbatim
    // 8-word passage pair here even though full-set Jaccard is tiny.
    val extra = Seq(
      (1L, ("x " * 200) + "the quick brown fox jumps over lazy dogs"),
      (2L, ("y " * 200) + "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    // Reuse the operator's core on a local frame via the same window logic.
    val win = extra.select($"doc_id",
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          TextOps.shingles($"text", 8))).as("w"))
    val shared = win.as("a").join(win.as("b"),
      $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id").count()
    assert(shared >= 1L)
  }
}
