package graft

import graft.cdc.MergeApply
import graft.table.{Audit, IceLite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish: a staging window pins the `_published` ref while
  * the head keeps committing, so consumer reads get snapshot isolation from
  * unaudited data; `Audit` gates on the staged net change only; `publish`
  * fast-forwards the ref, `abortStage` rolls the head back to the published
  * content. Tables that never staged have no ref and behave as before.
  */
class WapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def line(op: String, lsn: Long, k: Int, txt: String) =
    if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"c-$k","turn_idx":0}"""
    else if (txt == null)
      s"""{"op":"$op","lsn":$lsn,"conv_id":"c-$k","turn_idx":0,"after":{"role":"r","text":null}}"""
    else s"""{"op":"$op","lsn":$lsn,"conv_id":"c-$k","turn_idx":0,"after":{"role":"r","text":"$txt"}}"""

  private def mkTable(name: String): String = {
    val dir = TestSpark.freshDir(name)
    IceLite.create(dir, StructType(Seq(
      StructField("role", StringType), StructField("text", StringType))), numBuckets = 4)
    dir
  }

  private def rows(dir: String): Seq[(String, String)] = {
    import spark.implicits._
    IceLite.read(spark, dir)
      .select("conv_id", "text").as[(String, String)].collect().toSeq.sorted
  }

  test("staging isolates readers; publish fast-forwards; later commits track the ref") {
    import spark.implicits._
    val dir = mkTable("wap-pub")
    val b0 = (0 until 12).map(k => line("I", 100 + k, k, s"v0-$k"))
    MergeApply.applyRaw(spark, dir, b0.toDF("value"), 0L)
    val at0 = rows(dir)

    val pinned = IceLite.beginStage(dir)
    assert(pinned === IceLite.load(dir).version)
    assert(IceLite.isStaging(dir))

    // Two staged commits: head advances, published view frozen at b0.
    MergeApply.applyRaw(spark, dir,
      (0 until 6).map(k => line("U", 200 + k, k, s"v1-$k")).toDF("value"), 1L)
    MergeApply.applyRaw(spark, dir,
      (6 until 9).map(k => line("D", 300 + k, k, "")).toDF("value"), 2L)
    assert(IceLite.load(dir).version === pinned + 2)
    assert(IceLite.publishedVersion(dir) === pinned)
    assert(rows(dir) === at0, "published view must not see staged commits")
    // Auditors read the staged head explicitly.
    assert(IceLite.readSnapshot(spark, dir, IceLite.load(dir)).count() === 9)

    // A passing audit over the staged net change only.
    val v = Audit.stagedViolations(spark, dir, Seq(
      "text_not_null" -> "text IS NOT NULL",
      "key_form" -> "conv_id LIKE 'c-%'"))
      .as[(String, Long)].collect().toMap
    assert(v === Map("text_not_null" -> 0L, "key_form" -> 0L))

    val pub = IceLite.publish(dir)
    assert(!IceLite.isStaging(dir))
    assert(IceLite.publishedVersion(dir) === pub.version)
    assert(rows(dir).size === 9)

    // Post-publish, ordinary commits advance the ref in lockstep.
    MergeApply.applyRaw(spark, dir,
      Seq(line("I", 400, 50, "late")).toDF("value"), 3L)
    assert(IceLite.publishedVersion(dir) === IceLite.load(dir).version)
    assert(rows(dir).exists(_._1 == "c-50"))
  }

  test("failing audit aborts: head restored to published content, window closed") {
    import spark.implicits._
    val dir = mkTable("wap-abort")
    MergeApply.applyRaw(spark, dir,
      (0 until 8).map(k => line("I", 100 + k, k, s"ok-$k")).toDF("value"), 0L)
    val at0 = rows(dir)

    IceLite.beginStage(dir)
    // Poisoned batch: three rows with null text.
    MergeApply.applyRaw(spark, dir,
      ((0 until 3).map(k => line("U", 200 + k, k, null)) :+
        line("U", 250, 5, "fine")).toDF("value"), 1L)
    val v = Audit.stagedViolations(spark, dir,
      Seq("text_not_null" -> "text IS NOT NULL"))
      .as[(String, Long)].collect().toMap
    assert(v("text_not_null") === 3L)

    val restored = IceLite.abortStage(dir)
    assert(!IceLite.isStaging(dir))
    assert(rows(dir) === at0)
    assert(IceLite.publishedVersion(dir) === restored.version)
    // The epoch watermark rolled back with the data: the corrected batch
    // re-applies under the same epoch id.
    assert(!IceLite.load(dir).hasBatch(1L))
    MergeApply.applyRaw(spark, dir,
      (0 until 3).map(k => line("U", 200 + k, k, s"fixed-$k")).toDF("value"), 1L)
    assert(rows(dir).count(_._2.startsWith("fixed-")) === 3)
  }

  test("vacuum retains the pinned published snapshot while the head runs ahead") {
    import spark.implicits._
    val dir = mkTable("wap-vacuum")
    MergeApply.applyRaw(spark, dir,
      (0 until 8).map(k => line("I", 100 + k, k, s"v0-$k")).toDF("value"), 0L)
    val at0 = rows(dir)
    IceLite.beginStage(dir)
    (1 to 4).foreach { b =>
      MergeApply.applyRaw(spark, dir,
        (0 until 8).map(k => line("U", 100L * (b + 1) + k, k, s"v$b-$k")).toDF("value"), b.toLong)
    }
    IceLite.vacuum(dir, keepVersions = 1)
    // The published (pinned) view must survive a newest-only vacuum.
    assert(rows(dir) === at0)
    // And the head too.
    assert(IceLite.readSnapshot(spark, dir, IceLite.load(dir))
      .filter(col("text").startsWith("v4-")).count() === 8)
  }

  test("audit scans only staged delta files — O(staged batch), never O(table)") {
    import spark.implicits._
    val dir = mkTable("wap-prune")
    MergeApply.applyRaw(spark, dir,
      (0 until 32).map(k => line("I", k + 1L, k, s"base-$k")).toDF("value"), 0L)
    IceLite.beginStage(dir)
    MergeApply.applyRaw(spark, dir,
      (0 until 3).map(k => line("U", 100 + k, k, s"staged-$k")).toDF("value"), 1L)
    val gate = Audit.stagedViolations(spark, dir,
      Seq("text_not_null" -> "text IS NOT NULL"))
    // Manifest-level LSN zone maps: the published-batch files are never
    // opened by the audit pass, only the staged version's deltas.
    assert(gate.inputFiles.nonEmpty && gate.inputFiles.forall(_.contains("v00002")),
      s"audit must open staged files only, opened: ${gate.inputFiles.mkString(", ")}")
    val counts = gate.as[(String, Long)].collect().toMap
    assert(counts("text_not_null") === 0L)
    IceLite.publish(dir)
  }

  test("audit violation semantics: NULL predicate counts as violation; empty stage passes") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("b", None), ("c", Some(-1)))
      .toDF("k", "n").withColumn("n", col("n").cast("int"))
    val v = Audit.violations(df, Seq("n_pos" -> "n > 0"))
      .as[(String, Long)].collect().toMap
    assert(v("n_pos") === 2L, "NULL and false both violate")
    val empty = Audit.violations(df.filter(lit(false)), Seq("n_pos" -> "n > 0"))
      .as[(String, Long)].collect().toMap
    assert(empty("n_pos") === 0L)
  }
}
