package graft

import graft.ops.MixOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Domain-mixture resampling: the bucketed distributed rank must select
  * EXACTLY the rows the naive single-window rank selects (the oracle form),
  * per-domain counts must hit floor(w_d · T), and the selection must be a
  * pure function of ids (invariant under repartitioning).
  */
class MixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int): DataFrame = {
    val domains = Seq("a", "b", "c")
    (0 until n).map(i => (i.toLong, domains(i % 37 % 3))).toDF("doc_id", "dom")
  }

  /** The oracle form: one window rank per domain. */
  private def naive(df: DataFrame, weights: Map[String, Double]): Set[(Long, String)] = {
    val counts = df.filter(col("dom").isin(weights.keys.toSeq: _*))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    val t = weights.map { case (d, w) => counts.getOrElse(d, 0L).toDouble / w }.min
    val k = weights.map { case (d, w) => d -> math.floor(w * t).toLong }
    val kDf = k.toSeq.toDF("dom", "kd")
    val w = Window.partitionBy("dom")
      .orderBy(md5(concat(lit("mix-"), col("doc_id").cast("string"))), col("doc_id"))
    df.filter(col("dom").isin(weights.keys.toSeq: _*))
      .withColumn("rn", row_number().over(w))
      .join(kDf, "dom").filter(col("rn") <= col("kd"))
      .select("doc_id", "dom").as[(Long, String)].collect().toSet
  }

  test("bucketed rank selects exactly the naive window's rows; counts hit floor(w*T)") {
    val df = corpus(5000)
    val weights = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val got = MixOps.mixDomains(df, "doc_id", "dom", weights)
      .as[(Long, String)].collect().toSet
    assert(got === naive(df, weights))

    val byDom = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val counts = df.groupBy("dom").count().as[(String, Long)].collect().toMap
    val t = weights.map { case (d, w) => counts(d).toDouble / w }.min
    weights.foreach { case (d, w) =>
      assert(byDom.getOrElse(d, 0L) === math.floor(w * t).toLong, s"domain $d")
    }
    // Mixture ratios honor the weights (within floor rounding).
    assert(byDom("a") >= byDom("b") && byDom("b") >= byDom("c"))
  }

  test("selection is invariant under repartitioning and excludes unweighted domains") {
    val df = corpus(3000)
    val weights = Map("a" -> 0.7, "b" -> 0.3) // "c" unweighted → dropped
    val once = MixOps.mixDomains(df, "doc_id", "dom", weights)
      .as[(Long, String)].collect().toSet
    val again = MixOps.mixDomains(df.repartition(17), "doc_id", "dom", weights)
      .as[(Long, String)].collect().toSet
    assert(once === again)
    assert(once.forall(_._2 != "c"))
    assert(once === naive(df, weights))
  }

  test("a weighted domain with zero supply makes the mixture empty, not skewed") {
    val df = corpus(300).filter(col("dom") =!= "c")
    val got = MixOps.mixDomains(df, "doc_id", "dom",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(got.count() === 0L)
  }
}
