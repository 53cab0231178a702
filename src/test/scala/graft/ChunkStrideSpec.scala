package graft

import graft.ops.PackOps
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[PackOps.chunkStride]] against a from-scratch single-stream Scala
  * reference (cover semantics: starts 0, stride, …, smallest start whose
  * window reaches the document end), plus the structural invariants the
  * reference itself must satisfy — full coverage of every token position,
  * all-but-last chunks exactly `win` wide, and short docs yielding exactly
  * one chunk.
  */
class ChunkStrideSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Naive reference: (chunk_idx, chunk_tok, chunk_text) per doc. */
  private def refChunks(words: Array[String], win: Int, stride: Int)
      : Seq[(Long, Long, String)] = {
    val n = words.length
    val lastStart = math.max((n - win + stride - 1) / stride, 0)
    (0 to lastStart).map { i =>
      val s = i * stride
      val slice = words.slice(s, math.min(s + win, n))
      (i.toLong, slice.length.toLong, slice.mkString(" "))
    }
  }

  test("chunkStride equals the single-stream reference on sf0.001") {
    import spark.implicits._
    val win = 64; val stride = 48
    val got = PackOps.chunkStride(spark, sf, win, stride)
      .select("doc_id", "chunk_idx", "chunk_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        refChunks(text.split(" ", -1), win, stride)
          .map { case (i, t, c) => (id, i, t, c) }
      }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("cover invariants: every token covered, full-width interior chunks") {
    val gen = for {
      n <- Gen.choose(1, 300)
      win <- Gen.choose(1, 80)
      stride <- Gen.choose(1, win)
    } yield (n, win, stride)
    val prop = Prop.forAll(gen) { case (n, win, stride) =>
      val words = Array.tabulate(n)(i => s"w$i")
      val chunks = refChunks(words, win, stride)
      val covered = chunks.flatMap { case (i, t, _) =>
        (i * stride) until (i * stride + t) }.toSet
      val interiorFull = chunks.dropRight(1).forall(_._2 == win)
      val oneChunkWhenShort = n > win || chunks.length == 1
      val lastReachesEnd =
        chunks.last._1 * stride + chunks.last._2 == n
      covered == (0L until n.toLong).toSet && interiorFull &&
        oneChunkWhenShort && lastReachesEnd
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("Spark plan matches the reference at a non-default (win, stride)") {
    import spark.implicits._
    val win = 17; val stride = 5
    val got = PackOps.chunkStride(spark, sf, win, stride)
      .select("doc_id", "chunk_idx", "chunk_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        refChunks(text.split(" ", -1), win, stride)
          .map { case (i, t, c) => (id, i, t, c) }
      }.toSet
    assert(got == want)
  }
}
