package graft

import graft.table.IceLite
import graft.table.IceLite.{BucketEntry, Snapshot}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class IceLiteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("role", StringType), StructField("text", StringType)))

  test("create / load round-trip") {
    val dir = TestSpark.freshDir("icelite-create")
    val snap = IceLite.create(dir, payload, numBuckets = 8)
    val loaded = IceLite.load(dir)
    assert(loaded == snap)
    assert(loaded.schema.fieldNames.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "_lsn", "_deleted"))
    assert(loaded.payloadSchema.fieldNames.toSeq == Seq("role", "text"))
  }

  test("commit is atomic + versioned; time travel loads old snapshots") {
    val dir = TestSpark.freshDir("icelite-commit")
    val s0 = IceLite.create(dir, payload, numBuckets = 8)
    val s1 = s0.copy(version = 1, committedBatches = Set(0L))
    IceLite.commitSnapshot(dir, s1)
    assert(IceLite.load(dir).version == 1)
    assert(IceLite.loadVersion(dir, "v00000.json").version == 0)
  }

  test("bucket-pruned read opens ONLY the requested buckets' files (P3)") {
    val dir = TestSpark.freshDir("icelite-prune")
    IceLite.create(dir, payload, numBuckets = 8)
    val lines = (0 until 64).map(i =>
      s"""{"op":"U","lsn":$i,"conv_id":"c-$i","turn_idx":0,"after":{"role":"r","text":"t$i"}}""")
    graft.cdc.MergeApply.applyRaw(spark, dir, lines.toDF("value"), 0L)
    val snap = IceLite.load(dir)
    val touched = (snap.buckets ++ snap.deltas).map(_.bucket).toSet
    assert(touched.size >= 4) // 64 keys over 8 buckets: several populated
    val want = touched.take(2)
    val pruned = IceLite.readStored(spark, dir, snap, Some(want))
    val files = pruned.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f => want.exists(b => f.contains(s"_bucket=$b/"))),
      s"pruned read must open only buckets $want, opened: ${files.mkString(", ")}")
    val all = IceLite.readStored(spark, dir, snap).inputFiles
    assert(all.length > files.length, "full read must open strictly more files")
    // and the rows really are the requested buckets' keys
    val got = pruned.select("conv_id").as[String].collect().toSet
    val expect = (0 until 64).map(i => s"c-$i")
      .filter { c =>
        val b = Seq(c).toDF("c")
          .select(IceLite.bucketExpr(org.apache.spark.sql.functions.col("c"), 8))
          .head().getInt(0)
        want.contains(b)
      }.toSet
    assert(got == expect)
  }

  test("rebucket: 8 -> 32 buckets preserves state; pruned reads and MERGE follow the new count") {
    val dir = TestSpark.freshDir("icelite-rebucket")
    IceLite.create(dir, payload, numBuckets = 8)
    val lines = (0 until 64).map(i =>
      s"""{"op":"U","lsn":$i,"conv_id":"c-$i","turn_idx":0,"after":{"role":"r","text":"t$i"}}""")
    graft.cdc.MergeApply.applyRaw(spark, dir, lines.toDF("value"), 0L)
    val before = IceLite.read(spark, dir).orderBy("conv_id").collect().toSeq

    val snap = IceLite.rebucket(spark, dir, 32)
    assert(snap.numBuckets == 32 && snap.deltas.isEmpty)
    assert(IceLite.load(dir).numBuckets == 32)
    assert(IceLite.read(spark, dir).orderBy("conv_id").collect().toSeq == before)

    // Pruned read under the NEW layout: bucket ids computed with the new
    // count open only those buckets' files and serve exactly their keys.
    val bucketOf: String => Int = c => Seq(c).toDF("c")
      .select(IceLite.bucketExpr(org.apache.spark.sql.functions.col("c"), 32)).head().getInt(0)
    val want = Set(bucketOf("c-0"), bucketOf("c-1"))
    val pruned = IceLite.readStored(spark, dir, snap, Some(want))
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(f => want.exists(b => f.contains(s"_bucket=$b/"))))
    val got = pruned.select("conv_id").as[String].collect().toSet
    assert(got == (0 until 64).map(i => s"c-$i").filter(c => want.contains(bucketOf(c))).toSet)
    assert(Set("c-0", "c-1").subsetOf(got))

    // A MERGE after the rebucket loads the new snapshot and buckets by 32.
    val upd = Seq("""{"op":"U","lsn":100,"conv_id":"c-0","turn_idx":0,"after":{"role":"r","text":"updated"}}""")
    graft.cdc.MergeApply.applyRaw(spark, dir, upd.toDF("value"), 1L)
    val after = IceLite.load(dir)
    assert(after.deltas.forall(_.bucket == bucketOf("c-0")))
    assert(IceLite.read(spark, dir).filter($"conv_id" === "c-0")
      .select("text").as[String].head() == "updated")
    // Time travel: the pre-rebucket snapshot still reads under its own count.
    val old = IceLite.loadVersion(dir, f"v${snap.version - 1}%05d.json")
    assert(old.numBuckets == 8 &&
      IceLite.readSnapshot(spark, dir, old).orderBy("conv_id").collect().toSeq == before)
  }

  test("commit reclaims a crash-orphan version file (claimed but never swung)") {
    val dir = TestSpark.freshDir("icelite-orphan")
    val s0 = IceLite.create(dir, payload, numBuckets = 8)
    // Simulate a writer that crashed between claiming v00001.json and
    // swinging _current: the file exists (with the dead writer's token),
    // _current still points at v00000.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "meta", "v00001.json"),
      """{"writerToken":"dead-writer"}""".getBytes("UTF-8"))
    // The retry reclaims the orphan through the replace path and its
    // post-swing token verify passes (no live competitor).
    IceLite.commitSnapshot(dir, s0.copy(version = 1, committedBatches = Set(7L)))
    assert(IceLite.load(dir).committedBatches == Set(7L))
  }

  test("commit refuses when another writer advanced _current (optimistic CAS)") {
    val dir = TestSpark.freshDir("icelite-cas")
    val s0 = IceLite.create(dir, payload, numBuckets = 8)
    // Writer A and writer B both load v0 and build v1; A commits first.
    IceLite.commitSnapshot(dir, s0.copy(version = 1, committedBatches = Set(0L)))
    val b = s0.copy(version = 1, committedBatches = Set(99L))
    intercept[java.util.ConcurrentModificationException] {
      IceLite.commitSnapshot(dir, b)
    }
    assert(IceLite.load(dir).committedBatches == Set(0L)) // A's commit intact
  }

  test("committed-batch log is O(1): watermark advances, window stays bounded") {
    val s0 = Snapshot(0, 1, 8, Map(1 -> IceLite.fullSchema(payload)), Nil, Set.empty)
    // Sequential epochs (the Structured Streaming case): window stays empty.
    val seq = (0L to 99999L).foldLeft(s0)((s, id) => s.withBatch(id))
    assert(seq.batchWatermark == 99999L && seq.committedBatches.isEmpty)
    assert(seq.hasBatch(0L) && seq.hasBatch(99999L) && !seq.hasBatch(100000L))
    // Out-of-order epoch: retained in the window until the gap fills.
    val gap = s0.withBatch(0L).withBatch(2L)
    assert(gap.batchWatermark == 0L && gap.committedBatches == Set(2L))
    assert(gap.hasBatch(2L) && !gap.hasBatch(1L))
    val filled = gap.withBatch(1L)
    assert(filled.batchWatermark == 2L && filled.committedBatches.isEmpty)
    // Re-adding an already-watermarked epoch is a no-op.
    assert(filled.withBatch(1L) == filled)
    // Round-trips through snapshot JSON.
    val dir = TestSpark.freshDir("icelite-wm")
    IceLite.create(dir, payload, numBuckets = 8)
    IceLite.commitSnapshot(dir, gap.copy(version = 1))
    val loaded = IceLite.load(dir)
    assert(loaded.batchWatermark == 0L && loaded.committedBatches == Set(2L))
  }

  test("readStored groups by schema version and casts up (evolution-safe reads)") {
    val dir = TestSpark.freshDir("icelite-evo")
    IceLite.create(dir, payload, numBuckets = 4)
    // v1 files: (role,text); write one bucket under schema v1
    val df1 = Seq(("c1", 0, "user", "hi", 1L, false)).toDF(
      "conv_id", "turn_idx", "role", "text", "_lsn", "_deleted")
    df1.write.mode(SaveMode.Overwrite).parquet(s"$dir/data/v00001/_bucket=0")
    // schema v2 adds tokens long; a second bucket written under v2
    val payload2 = StructType(payload.fields :+ StructField("tokens", LongType))
    val df2 = Seq(("c2", 1, "assistant", "yo", 2L, false, 42L)).toDF(
      "conv_id", "turn_idx", "role", "text", "_lsn", "_deleted", "tokens")
      .select("conv_id", "turn_idx", "role", "text", "tokens", "_lsn", "_deleted")
    df2.write.mode(SaveMode.Overwrite).parquet(s"$dir/data/v00002/_bucket=1")
    val snap = Snapshot(2, 2, 4,
      Map(1 -> IceLite.fullSchema(payload), 2 -> IceLite.fullSchema(payload2)),
      Seq(BucketEntry("data/v00001/_bucket=0", 0, 1, 1, "c1", "c1"),
        BucketEntry("data/v00002/_bucket=1", 1, 1, 2, "c2", "c2")),
      Set(0L, 1L))
    IceLite.writeSnapshot(dir, snap)

    val rows = IceLite.read(spark, dir).orderBy("conv_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "c1" && rows(0).isNullAt(4))  // tokens null-filled
    assert(rows(1).getString(0) == "c2" && rows(1).getLong(4) == 42L)
  }

  test("changesSince: net per-key changes; LSN zone maps skip every pre-cutoff file") {
    val dir = TestSpark.freshDir("icelite-changes")
    IceLite.create(dir, payload, numBuckets = 8)
    val b0 = (0 until 32).map(i =>
      s"""{"op":"U","lsn":${i + 1},"conv_id":"c-$i","turn_idx":0,"after":{"role":"r","text":"t$i"}}""")
    graft.cdc.MergeApply.applyRaw(spark, dir, b0.toDF("value"), 0L)
    val vA = IceLite.load(dir).version
    assert(IceLite.load(dir).maxLsn == 32L) // high-watermark stamped at commit

    val b1 = Seq(
      """{"op":"U","lsn":33,"conv_id":"c-1","turn_idx":0,"after":{"role":"r","text":"updated"}}""",
      """{"op":"D","lsn":34,"conv_id":"c-2","turn_idx":0}""",
      """{"op":"U","lsn":35,"conv_id":"c-100","turn_idx":0,"after":{"role":"r","text":"new"}}""")
    graft.cdc.MergeApply.applyRaw(spark, dir, b1.toDF("value"), 1L)

    // Entry zone maps are exact per batch: v1 deltas span lsn 1..32, v2 33..35.
    val snap = IceLite.load(dir)
    assert(snap.maxLsn == 35L)
    val (v1e, v2e) = snap.deltas.partition(_.dir.startsWith("data/v00001"))
    assert(v1e.nonEmpty && v1e.forall(e => e.minLsn >= 1L && e.maxLsn <= 32L))
    assert(v2e.nonEmpty && v2e.forall(e => e.minLsn >= 33L && e.maxLsn <= 35L))

    val ch = IceLite.changesSince(spark, dir, vA)
    // Manifest-level pruning: no batch-0 file is even opened.
    assert(ch.inputFiles.nonEmpty && ch.inputFiles.forall(_.contains("v00002-delta")),
      s"zone maps must skip pre-cutoff files, opened: ${ch.inputFiles.mkString(", ")}")
    val rows = ch.orderBy("conv_id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("c-1", "c-100", "c-2"))
    assert(rows(0).getAs[String]("text") == "updated" && !rows(0).getAs[Boolean]("_deleted"))
    assert(rows(1).getAs[String]("text") == "new")
    assert(rows(2).getAs[Boolean]("_deleted")) // net delete survives as a tombstone row

    // Across a compaction boundary: the compacted bucket's base folds old
    // rows in; the cutoff filter still yields the exact net change set.
    val b2 = Seq(
      """{"op":"U","lsn":36,"conv_id":"c-3","turn_idx":0,"after":{"role":"r","text":"t3v2"}}""")
    graft.cdc.MergeApply.applyRaw(spark, dir, b2.toDF("value"), 2L,
      policy = graft.cdc.MergeApply.CompactionPolicy(factor = 0.0, minRows = 1))
    assert(IceLite.load(dir).buckets.nonEmpty) // the touched bucket compacted
    val ch2 = IceLite.changesSince(spark, dir, vA).orderBy("conv_id").collect()
    assert(ch2.map(_.getString(0)).toSeq == Seq("c-1", "c-100", "c-2", "c-3"))
    assert(ch2(3).getAs[String]("text") == "t3v2")
    // and consuming from the NEW snapshot sees only the last batch
    val vB = IceLite.load(dir).version - 1
    val ch3 = IceLite.changesSince(spark, dir, vB).collect()
    assert(ch3.map(_.getString(0)).toSeq == Seq("c-3"))

    // Historical window (vA, vB]: exactly batch 1's net changes — the later
    // c-3 update is OUTSIDE the window even though its bucket has since
    // compacted batch-1 rows into its base.
    val win = IceLite.changesBetween(spark, dir, vA, vB).orderBy("conv_id").collect()
    assert(win.map(_.getString(0)).toSeq == Seq("c-1", "c-100", "c-2"))
    assert(win(0).getAs[String]("text") == "updated" && win(2).getAs[Boolean]("_deleted"))

    // Cursor reads are vacuum-safe: expire every snapshot but the head and
    // consume from vA again — changesSince only ever opens live files.
    // (At this table's state vacuum may find nothing dir-granular to delete
    // — delta dirs still referenced by uncompacted buckets survive whole —
    // the property under test is that the cursor read never needs vA's data.)
    IceLite.vacuum(dir, keepVersions = 1)
    val chV = IceLite.changesSince(spark, dir, vA).orderBy("conv_id").collect()
    assert(chV.map(_.getString(0)).toSeq == Seq("c-1", "c-100", "c-2", "c-3"))
  }

  test("tombstones are dropped from public reads, kept in stored reads") {
    val dir = TestSpark.freshDir("icelite-tomb")
    IceLite.create(dir, payload, numBuckets = 4)
    val df = Seq(
      ("c1", 0, "user", "hi", 1L, false),
      ("c1", 1, "user", "bye", 2L, true)).toDF(
      "conv_id", "turn_idx", "role", "text", "_lsn", "_deleted")
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/data/v00001/_bucket=2")
    val snap = IceLite.load(dir).copy(version = 1,
      buckets = Seq(BucketEntry("data/v00001/_bucket=2", 2, 2, 1, "c1", "c1")))
    IceLite.writeSnapshot(dir, snap)
    assert(IceLite.read(spark, dir).count() == 1)
    assert(IceLite.readStored(spark, dir, IceLite.load(dir)).count() == 2)
    assert(IceLite.readStored(spark, dir, IceLite.load(dir), Some(Set(3))).count() == 0)
  }

  test("create over an existing table refuses instead of orphaning its state") {
    val dir = TestSpark.freshDir("create-twice")
    IceLite.create(dir, payload, numBuckets = 4)
    val e = intercept[IllegalArgumentException] { IceLite.create(dir, payload) }
    assert(e.getMessage.contains("already holds"))
    assert(IceLite.load(dir).version == 0, "the refused create must not touch _current")
  }

  test("nested-struct evolution: ADD COLUMN inside a struct; cross-version reads and old producers align by name") {
    import graft.cdc.MergeApply
    import org.apache.spark.sql.functions.{lit, struct}
    val dir = TestSpark.freshDir("nested-evolve")
    IceLite.create(dir, new StructType(), numBuckets = 2)
    def batch(conv: String, lsn: Long, meta: org.apache.spark.sql.Column) =
      Seq(("I", lsn, conv, 0)).toDF("op", "lsn", "conv_id", "turn_idx")
        .withColumn("meta", meta)
    // Writer v1: meta = struct<a>. Writer v2 ADDs meta.b. Writer v3 is the
    // OLD producer again (struct<a>) after the widen — both the read path
    // (alignTo) and the write path (alignColumn) must match struct fields
    // by NAME; Spark's Cast would reject the arity mismatch outright and
    // every cross-version read of the bucket would throw from then on.
    MergeApply.applyChanges(spark, dir, batch("c1", 1L, struct(lit(1L).as("a"))), 0L)
    MergeApply.applyChanges(spark, dir,
      batch("c2", 2L, struct(lit(2L).as("a"), lit("x").as("b"))), 1L)
    MergeApply.applyChanges(spark, dir, batch("c3", 3L, struct(lit(3L).as("a"))), 2L)
    val rows = IceLite.read(spark, dir)
      .select($"conv_id", $"meta.a", $"meta.b")
      .as[(String, Long, Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(rows == Map("c1" -> ((1L, None)), "c2" -> ((2L, Some("x"))), "c3" -> ((3L, None))))
  }

  test("equal-LSN tie resolves deterministically: delete beats upsert") {
    import graft.cdc.MergeApply
    val dir = TestSpark.freshDir("lww-tie")
    IceLite.create(dir, payload, numBuckets = 2)
    // One batch, one key, two rows tying on lsn: whether the key lives must
    // not depend on partition scheduling — the documented total order says
    // the delete wins (and the same rule holds re-folded after compaction).
    val b = Seq(
      ("U", 5L, "k", 0, "user", "text-v"),
      ("D", 5L, "k", 0, null, null))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text")
    MergeApply.applyChanges(spark, dir, b, 0L)
    assert(IceLite.read(spark, dir).count() == 0,
      "at equal LSN the delete must win on every run")
  }
}
