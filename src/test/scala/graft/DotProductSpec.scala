package graft

import graft.functions.DotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DotProduct: the native codegen Expression behind the similarity ops. */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("float×double, double×double, length mismatch, null elements") {
    DotProduct.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("f", "d")
      .select(
        call_function("dot_product", col("f"), col("d")).as("fd"),
        call_function("dot_product", col("d"), col("d")).as("dd"),
        // shorter side wins
        call_function("dot_product", col("f"), slice(col("d"), 1, 2)).as("short"),
        // null element counts as 0, not poison
        call_function("dot_product", col("f"),
          array(lit(1.0), lit(null).cast("double"), lit(2.0))).as("withNull"))
    val r = df.head()
    assert(r.getDouble(0) == 1 * 4 + 2 * 5 + 3 * 6.0)
    assert(r.getDouble(1) == 16 + 25 + 36.0)
    assert(r.getDouble(2) == 4 + 10.0)
    assert(r.getDouble(3) == 1 + 6.0)
  }

  test("matches the zip_with/aggregate composition it replaced, inside codegen") {
    DotProduct.register(spark)
    val df = spark.range(200).select(
      transform(sequence(lit(0), lit(63)),
        i => (rand(seed = 1) * 0 + i.cast("double") * 0.5 + col("id")).cast("double")).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => (i.cast("double") - col("id") * 0.25)).as("b"))
    val both = df.select(
      call_function("dot_product", col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("ref"))
    assert(both.filter(abs(col("fast") - col("ref")) > 1e-9).count() == 0)
    // Codegen assertion on a dot_product-only plan: the interpreted
    // aggregate/zip_with REFERENCE column above would knock the shared
    // Project out of whole-stage codegen — which is exactly why the native
    // expression exists.
    val fastOnly = df.select(call_function("dot_product", col("a"), col("b")).as("fast"))
    val plan = fastOnly.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\]]*dot_product""".r.findFirstIn(plan).isDefined, plan)
  }
}
