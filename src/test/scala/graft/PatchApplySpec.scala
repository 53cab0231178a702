package graft

import graft.cdc.{MergeApply, PatchApply}
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Partial-update merge semantics: I replaces (explicit nulls included),
  * U patches its non-null columns, D wipes everything before it; exact
  * under out-of-order cross-batch delivery; one fold serves batch reduce,
  * compaction and merge-on-read (split-order invariance).
  */
class PatchApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("role", StringType), StructField("text", StringType),
    StructField("score", DoubleType)))

  // (op, lsn, conv_id, turn_idx, role, text, score)
  type Ev = (String, Long, String, Int, Option[String], Option[String], Option[Double])

  private def changes(evs: Seq[Ev]): DataFrame =
    evs.toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "score")

  private def readRows(dir: String): Map[(String, Int), (Option[String], Option[String], Option[Double])] =
    PatchApply.read(spark, dir)
      .as[(String, Int, Option[String], Option[String], Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  private def drive(name: String, batches: Seq[Seq[Ev]],
                    policy: MergeApply.CompactionPolicy = MergeApply.CompactionPolicy())
  : String = {
    val dir = TestSpark.freshDir(name)
    PatchApply.create(dir, payload, numBuckets = 4)
    batches.zipWithIndex.foreach { case (b, i) =>
      val r = PatchApply.applyPatches(spark, dir, changes(b), i.toLong, policy = policy)
      assert(r.committed, s"batch $i must commit")
    }
    dir
  }

  test("U patches only its non-null columns; I replaces including explicit nulls") {
    val dir = drive("patch-basic", Seq(Seq(
      ("I", 1L, "c", 0, Some("user"), Some("hello"), Some(1.0)),
      ("U", 2L, "c", 0, None, Some("hello v2"), None), // text only
      ("U", 3L, "c", 0, None, None, Some(2.5))         // score only
    )))
    assert(readRows(dir) === Map(("c", 0) -> ((Some("user"), Some("hello v2"), Some(2.5)))))
    // A later I with an explicit null score CLEARS it (I sets every column).
    PatchApply.applyPatches(spark, dir, changes(Seq(
      ("I", 4L, "c", 0, Some("user"), Some("replaced"), None))), 10L)
    assert(readRows(dir) === Map(("c", 0) -> ((Some("user"), Some("replaced"), None))))
  }

  test("D wipes columns set before it; a later U revives with only its own columns") {
    val dir = drive("patch-delete", Seq(Seq(
      ("I", 1L, "c", 0, Some("user"), Some("secret"), Some(9.0)),
      ("D", 2L, "c", 0, None, None, None),
      ("U", 3L, "c", 0, None, Some("fresh"), None)
    )))
    // role and score were set before the delete: they must NOT leak through.
    assert(readRows(dir) === Map(("c", 0) -> ((None, Some("fresh"), None))))
  }

  test("out-of-order exactness: a late setter below the wipe boundary stays dead; " +
    "a late D below a newer U wipes older columns but not liveness") {
    // Batch 0 delivers the NEWER events, batch 1 the older ones.
    val dir = drive("patch-ooo", Seq(
      Seq(("D", 5L, "a", 0, None, None, None),
          ("U", 7L, "a", 0, None, Some("post-delete"), None),
          ("U", 9L, "b", 0, None, Some("newest text"), None)),
      Seq(("U", 3L, "a", 0, Some("stale role"), None, None),  // setter 3 < dlsn 5 → dead
          ("U", 2L, "b", 0, Some("old role"), None, Some(1.0)),
          ("D", 4L, "b", 0, None, None, None))                // late D: wipes lsn≤4 sets, row stays live via lsn 9
    ))
    assert(readRows(dir) === Map(
      ("a", 0) -> ((None, Some("post-delete"), None)),
      ("b", 0) -> ((None, Some("newest text"), None))))
  }

  test("R unsets its marked columns; the unset WINS arbitration over older setters") {
    val dir = drive("patch-remove", Seq(Seq(
      ("I", 1L, "c", 0, Some("user"), Some("hello"), Some(1.0)),
      ("R", 3L, "c", 0, None, Some("x"), None)))) // unset text at lsn 3 (marker discarded)
    assert(readRows(dir) === Map(("c", 0) -> ((Some("user"), None, Some(1.0)))))
    // A STALE setter below the unset arriving later cannot resurrect the
    // removed value — the R's null rode the setter-LSN arbitration.
    PatchApply.applyPatches(spark, dir, changes(Seq(
      ("U", 2L, "c", 0, None, Some("stale"), None))), 10L)
    assert(readRows(dir) === Map(("c", 0) -> ((Some("user"), None, Some(1.0)))))
    // A NEWER setter re-sets it; the other columns never moved.
    PatchApply.applyPatches(spark, dir, changes(Seq(
      ("U", 4L, "c", 0, None, Some("fresh"), None))), 11L)
    assert(readRows(dir) === Map(("c", 0) -> ((Some("user"), Some("fresh"), Some(1.0)))))
  }

  test("row whose latest op is D is gone") {
    val dir = drive("patch-gone", Seq(Seq(
      ("I", 1L, "c", 0, Some("user"), Some("x"), None),
      ("U", 2L, "c", 0, None, Some("y"), None),
      ("D", 3L, "c", 0, None, None, None))))
    assert(readRows(dir) === Map.empty)
  }

  test("split-order invariance: any batch split of the same events converges identically") {
    val evs: Seq[Ev] = (0 until 60).map { i =>
      val k = i % 7
      val op = if (i % 11 == 0) "D" else if (i % 5 == 0) "I"
        else if (i % 7 == 3) "R" else "U"
      def partial = op == "U" || op == "R" // these mark a column subset
      (op, i.toLong, s"c-$k", k % 3,
        if (!partial || i % 2 == 0) Some(s"r$i") else None,
        if (!partial || i % 3 == 0) Some(s"t$i") else None,
        if (!partial || i % 4 == 0) Some(i.toDouble) else None)
    }
    val whole = readRows(drive("patch-split-1", Seq(evs)))
    val byThree = readRows(drive("patch-split-3",
      Seq(evs.filter(_._2 % 3 == 0), evs.filter(_._2 % 3 == 1), evs.filter(_._2 % 3 == 2))))
    val reversed = readRows(drive("patch-split-r",
      evs.grouped(20).toSeq.reverse))
    assert(byThree === whole)
    assert(reversed === whole)
  }

  test("compaction folds patches into base and the read is unchanged") {
    val evs: Seq[Ev] = (0 until 40).map { i =>
      ("U", i.toLong, s"c-${i % 4}", 0, Some(s"r$i"),
        if (i % 2 == 0) Some(s"t$i") else None, None)
    }
    val lazyDir = drive("patch-compact-off", Seq(evs.take(20), evs.drop(20)))
    val eager = MergeApply.CompactionPolicy(factor = 0.0, minRows = 1, maxDeltaFiles = 1)
    val eagerDir = drive("patch-compact-on", Seq(evs.take(20), evs.drop(20)), eager)
    assert(IceLite.load(eagerDir).buckets.nonEmpty, "compaction must have produced base files")
    assert(readRows(eagerDir) === readRows(lazyDir))
  }

  test("schema evolution: a later batch's new column patches in; old rows read null") {
    val dir = drive("patch-evolve", Seq(Seq(
      ("I", 1L, "c", 0, Some("user"), Some("x"), Some(1.0)))))
    val withTool = Seq(("U", 2L, "c", 0, Option.empty[String], Option.empty[String],
      Option.empty[Double], Some("search")),
      ("I", 3L, "d", 0, Some("asst"), Some("y"), Some(2.0), Option.empty[String]))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "score", "tool")
    val r = PatchApply.applyPatches(spark, dir, withTool, 1L)
    assert(r.committed && r.schemaChanged.contains("tool"))
    val rows = PatchApply.read(spark, dir)
      .as[(String, Int, Option[String], Option[String], Option[Double], Option[String])]
      .collect().map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    assert(rows === Map(
      ("c", 0) -> ((Some("user"), Some("x"), Some(1.0), Some("search"))),
      ("d", 0) -> ((Some("asst"), Some("y"), Some(2.0), None))))
  }

  test("exactly-once: replaying a committed batch is a no-op") {
    val dir = drive("patch-once", Seq(Seq(
      ("I", 1L, "c", 0, Some("user"), Some("x"), None))))
    val v = IceLite.load(dir).version
    val r = PatchApply.applyPatches(spark, dir, changes(Seq(
      ("U", 99L, "c", 0, None, Some("MUST NOT APPLY"), None))), 0L)
    assert(!r.committed && IceLite.load(dir).version == v)
    assert(readRows(dir) === Map(("c", 0) -> ((Some("user"), Some("x"), None))))
  }

  test("applyPatches into a whole-row LWW table fails loudly, like its siblings") {
    // The mirror of applyChanges' / applyRaw's cross-semantics fences: a
    // patch write would append setter-LSN columns the stored schema never
    // lists while reads keep LWW-folding — silent corruption, so require.
    val dir = TestSpark.freshDir("patch-into-lww")
    IceLite.create(dir, payload, numBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      PatchApply.applyPatches(spark, dir,
        changes(Seq(("U", 1L, "c", 0, Some("user"), Some("x"), None))), 0L)
    }
    assert(e.getMessage.contains("mix merge semantics"))
    assert(IceLite.load(dir).version == 0, "the refused write must not commit")
  }

  test("an empty patch batch writes its lineage row (no epoch gaps in the log)") {
    val dir = TestSpark.freshDir("patch-empty-lineage")
    val lin = TestSpark.freshDir("patch-empty-lineage-log")
    PatchApply.create(dir, payload, numBuckets = 4)
    val r = PatchApply.applyPatches(spark, dir, changes(Nil), 0L,
      lineageDir = Some(lin))
    assert(r.committed)
    val logged = MergeApply.readLineage(spark, lin)
      .select("batch.batchId").as[Long].collect().toSeq
    assert(logged == Seq(0L),
      "one lineage row per micro-batch, empty batches included")
  }
}
