package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-LM surprisal scoring: every doc scored, bits non-negative and
  * bounded by nbits(N) per token, and the score is a pure function of the
  * corpus (stable across runs — no sampling, no floats before the final
  * division).
  */
class LmSurprisalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("all docs scored; bits within [0, nbits]·n_tokens; deterministic") {
    import spark.implicits._
    val out = TextOps.lmSurprisal(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    val nDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(out.length.toLong === nDocs)
    out.foreach { case (_, n, bits, mean) =>
      assert(n > 0 && bits >= 0 && bits <= n * 64)
      assert(math.abs(mean - bits.toDouble / n) == 0.0)
    }
    val again = TextOps.lmSurprisal(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === again.toSeq)
    // The signal discriminates: scores are not all identical.
    assert(out.map(_._4).distinct.length > 1)
  }
}
