package graft

import graft.functions.CmsSketch
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch Aggregator: the ≥-true-count guarantee holds for EVERY
  * vocab token, each depth row conserves total token mass, the fold is
  * partitioning-invariant (associative+commutative merge), and the buffer
  * equals a declaratively-recomputed cell table (the oracle's shape).
  */
class CmsSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  val depth = 4
  val hexChars = 3
  val width = 1 << (4 * hexChars)

  private def toks = spark.read.parquet(s"$sf/documents.parquet")
    .select(explode(split(lower(col("text")), " ")).as("tok"))
    .filter(length(col("tok")) > 0)

  private def sketchOf(parts: Int): Array[Long] = {
    val cms = udaf(new CmsSketch(depth, hexChars), org.apache.spark.sql.Encoders.STRING)
    toks.repartition(parts).agg(cms(col("tok"))).head.getSeq[Long](0).toArray
  }

  test("estimate >= true count for every vocab token; mass conserved per depth row") {
    import spark.implicits._
    val sketch = sketchOf(8)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c")).as[(String, Long)].collect()
    val n = vocab.map(_._2).sum
    (0 until depth).foreach { d =>
      assert(sketch.slice(d * width, (d + 1) * width).sum === n)
    }
    vocab.foreach { case (tok, c) =>
      assert(CmsSketch.estimate(sketch, tok, depth, hexChars) >= c, s"undercount for '$tok'")
    }
  }

  test("fold is partitioning-invariant (merge associativity over real partials)") {
    assert(sketchOf(1).toSeq === sketchOf(13).toSeq)
  }

  test("buffer equals the declaratively recomputed cell table (the oracle shape)") {
    import spark.implicits._
    val sketch = sketchOf(8)
    val depthsDf = spark.range(depth).select(col("id").cast("int").as("d"))
    val cells = toks.crossJoin(depthsDf)
      .groupBy(col("d"),
        substring(md5(concat(col("d").cast("string"), lit(":"), col("tok"))), 1, hexChars).as("cell"))
      .agg(count(lit(1)).as("cc"))
      .as[(Int, String, Long)].collect()
    cells.foreach { case (d, cellHex, cc) =>
      val idx = d * width + java.lang.Integer.parseInt(cellHex, 16)
      assert(sketch(idx) === cc, s"cell d=$d $cellHex")
    }
    // and every cell the recompute did NOT produce is zero
    val nonZero = sketch.count(_ != 0L)
    assert(nonZero === cells.length)
  }

  test("driver query shape: k rows, est >= true, ordered by token") {
    import spark.implicits._
    val out = TextOps.sketchTokenCms(spark, sf).as[(String, Long, Long)].collect()
    assert(out.length === 8)
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
    out.foreach { case (_, c, est) => assert(est >= c) }
  }
}
