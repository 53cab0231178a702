package graft

import graft.cdc.MergeApply
import graft.cdc.MergeApply.CompactionPolicy
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite

/** The metadata tables (`metaSnapshots` / `metaFiles` — the Iceberg
  * `snapshots`/`files` analogues): every row must agree with the snapshot
  * state the engine itself loads, head/published flags must track the WAP
  * ref, and `metaFiles` must expose exactly the manifest entries (with
  * zone maps) a reader's pruning sees.
  */
class MetaTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def line(op: String, lsn: Long, k: Int) =
    if (op == "D") s"""{"op":"D","lsn":$lsn,"conv_id":"c-$k","turn_idx":0}"""
    else s"""{"op":"$op","lsn":$lsn,"conv_id":"c-$k","turn_idx":0,"after":{"text":"v$lsn"}}"""

  test("snapshots and files tables mirror the manifests, flags track head and published ref") {
    val dir = TestSpark.freshDir("metatables")
    IceLite.create(dir, numBuckets = 4)
    MergeApply.applyRaw(spark, dir,
      (0 until 20).map(k => line("I", 100 + k, k)).toDF("value"), 0L)
    // Second batch under a forced compaction so base AND delta kinds exist
    // across the history.
    MergeApply.applyRaw(spark, dir,
      (0 until 8).map(k => line("U", 200 + k, k)).toDF("value"), 1L,
      policy = CompactionPolicy(factor = 0.0, minRows = 1))

    val snaps = IceLite.metaSnapshots(spark, dir).collect()
    assert(snaps.map(_.getAs[Int]("version")).toSeq == Seq(0, 1, 2))
    val head = snaps.find(_.getAs[Boolean]("is_head")).get
    assert(head.getAs[Int]("version") == 2)
    assert(snaps.count(_.getAs[Boolean]("is_published")) == 1,
      "no WAP stage open: published == head")
    // Manifest row counts must agree with the loaded snapshot.
    val sn2 = IceLite.load(dir)
    assert(head.getAs[Long]("manifest_rows") ==
      (sn2.buckets ++ sn2.deltas).map(_.rows).sum)
    assert(head.getAs[Long]("max_lsn") == sn2.maxLsn)

    val files = IceLite.metaFiles(spark, dir).collect()
    assert(files.length == sn2.buckets.size + sn2.deltas.size)
    assert(files.count(_.getAs[String]("kind") == "base") == sn2.buckets.size)
    assert(files.map(_.getAs[Long]("rows")).sum ==
      (sn2.buckets ++ sn2.deltas).map(_.rows).sum)
    // Zone maps surface: post-compaction entries carry real LSN bounds.
    assert(files.forall(r => r.getAs[Long]("max_lsn") >= r.getAs[Long]("min_lsn")))

    // Historical files view = that snapshot's manifest, not the head's.
    val sn1 = IceLite.metaFiles(spark, dir, Some(1)).collect()
    val v1 = IceLite.loadVersion(dir, "v00001.json")
    assert(sn1.length == v1.buckets.size + v1.deltas.size)
    assert(sn1.forall(_.getAs[Int]("version") == 1))

    // WAP: an open stage moves head ahead of published and the flags split.
    IceLite.beginStage(dir)
    MergeApply.applyRaw(spark, dir,
      (0 until 3).map(k => line("U", 300 + k, k)).toDF("value"), 2L)
    val staged = IceLite.metaSnapshots(spark, dir).collect()
    val h = staged.find(_.getAs[Boolean]("is_head")).get
    val p = staged.find(_.getAs[Boolean]("is_published")).get
    assert(h.getAs[Int]("version") > p.getAs[Int]("version"))
    IceLite.publish(dir)
    val after = IceLite.metaSnapshots(spark, dir).collect()
    assert(after.find(_.getAs[Boolean]("is_head")).get.getAs[Int]("version") ==
      after.find(_.getAs[Boolean]("is_published")).get.getAs[Int]("version"))
  }
}
