package graft

import graft.ops.{CurateOps, PackOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[PackOps.shuffleOrder]] (256-bucket distributed rank) against the naive
  * single-window global rank it must equal, plus the permutation and
  * partitioning-invariance properties; [[CurateOps.splitAssign]]'s
  * disjoint-exhaustive assignment and its independence from the sampling
  * salt.
  */
class ShuffleSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("shuffleOrder equals the naive single-window rank") {
    import spark.implicits._
    val got = PackOps.shuffleOrder(docs, "doc_id")
      .as[(Long, Long)].collect().toMap
    val naive = docs
      .withColumn("_h", md5(concat(lit("shuf-"), col("doc_id").cast("string"))))
      .withColumn("pos",
        row_number().over(Window.orderBy(col("_h"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("pos").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("shuffleOrder is a permutation of 0..n-1, stable under repartitioning") {
    import spark.implicits._
    val base = PackOps.shuffleOrder(docs, "doc_id").as[(Long, Long)].collect()
    val n = docs.count()
    assert(base.map(_._2).sorted.toSeq == (0L until n))
    val reparted = PackOps.shuffleOrder(docs.repartition(7), "doc_id")
      .as[(Long, Long)].collect()
    assert(reparted.toMap == base.toMap)
    // the permutation actually permutes (identity order would mean the
    // hash never reordered anything)
    assert(base.toMap.toSeq.sortBy(_._1).map(_._2) != (0L until n))
  }

  test("splitAssign is disjoint-exhaustive with sane holdout fractions") {
    import spark.implicits._
    val rows = CurateOps.splitAssign(spark, sf)
      .as[(Long, String, String)].collect()
    assert(rows.length == docs.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    val byapp = rows.groupBy(_._3).view.mapValues(_.length.toDouble / rows.length)
    assert(byapp.keySet == Set("train", "val", "test"))
    // 16-bit hash over 500 ids: generous tolerance around 85/5/5+5
    assert(byapp("train") > 0.75 && byapp("train") < 0.95)
    assert(byapp("test") > 0.005 && byapp("test") < 0.12)
    assert(byapp("val") > 0.005 && byapp("val") < 0.12)
  }

  test("split membership is independent of the sampling salt") {
    import spark.implicits._
    // a doc surviving sampleStratified keeps the SAME split it has in the
    // full assignment — retuning mixture weights never moves holdouts
    val full = CurateOps.splitAssign(spark, sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val sampled = CurateOps.sampleStratified(spark, sf)
      .select(col("doc_id"),
        when(CurateOps.saltedHash16(col("doc_id"), "spl-") < CurateOps.SplitTestUpper, "test")
          .when(CurateOps.saltedHash16(col("doc_id"), "spl-") < CurateOps.SplitValUpper, "val")
          .otherwise("train").as("split"))
      .as[(Long, String)].collect()
    assert(sampled.nonEmpty)
    sampled.foreach { case (id, s) => assert(full(id) == s) }
  }
}
