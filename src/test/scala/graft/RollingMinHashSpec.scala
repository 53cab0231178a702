package graft

import graft.functions.RollingMinHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RollingMinHash: the native codegen Expression behind doc_fingerprint. */
class RollingMinHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 16
  private val B = 31L
  private val M = 1000000007L

  /** Direct reference: min over windows of Σ byte·B^j mod M, computed with
    * BigInt so any modular-arithmetic slip in the fast loop would show.
    */
  private def reference(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) 0L
    else {
      val kk = math.min(K, bytes.length)
      (0 to bytes.length - kk).map { i =>
        bytes.slice(i, i + kk).foldLeft(BigInt(0))((h, b) => (h * B + (b & 0xff)) mod M)
      }.min.toLong
    }
  }

  test("fast loop matches the BigInt reference (long, short, empty)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 8,
      "msg lsn=42 email=a@b.co",
      "short", "", "exactly 16 chars",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaa") // degenerate: identical windows
    texts.foreach { t =>
      assert(RollingMinHash.minHash(t.getBytes("UTF-8"), K, B, M) == reference(t), s"text=$t")
    }
  }

  test("fingerprint is stable under append/prepend (winnowing property)") {
    val core = "the quick brown fox jumps over the lazy dog"
    val fp = RollingMinHash.minHash(core.getBytes, K, B, M)
    // Appending cannot raise the min; the core's windows are still present.
    val appended = RollingMinHash.minHash(s"$core and then some".getBytes, K, B, M)
    assert(appended <= fp)
  }

  test("expression evaluates through codegen in a plan; null propagates") {
    RollingMinHash.register(spark, K)
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // local relation at optimize time and bypass codegen entirely.
    val df = spark.range(3).select(
      when(col("id") === 0, lit("the quick brown fox"))
        .when(col("id") === 1, lit(""))
        .otherwise(lit(null).cast("string")).as("text"))
      .select(col("text"), expr("rolling_min_hash(text)").as("fp"))
      .orderBy("fp")
    val rows = df.collect().sortBy(r => Option(r.getString(0)).getOrElse("~null"))
    assert(rows(0).getLong(1) == 0L) // ""
    assert(rows(1).getLong(1) == reference("the quick brown fox"))
    assert(rows(2).isNullAt(1))
    // The expression must not break whole-stage codegen: its Project must
    // carry the `*(n)` codegen marker (AQE plan strings don't spell out
    // "WholeStageCodegen").
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\]]*rolling_min_hash""".r
      .findFirstIn(plan).isDefined, plan)
  }
}
