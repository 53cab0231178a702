package graft

import graft.cdc.{FeedGen, MergeApply, Pipeline}
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden-table replay tests — the north rule's own criterion: replaying the
  * change feed (including from a mid-stream checkpoint) converges to the same
  * final table state as a single-threaded oracle, per-turn text equality
  * under stable (conv_id, turn_idx) ordering (BASELINE.json:6).
  */
class PipelineGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 1500L

  private def genFeed(dir: String): Seq[String] = {
    FeedGen.synthetic(spark, Some(dir), N, nConvs = 40, turnsPerConv = 10, nBatches = 6)
    spark.read.textFile(dir).collect().toSeq
  }

  /** Table rows keyed for oracle comparison; ts normalized back to the feed's
    * ISO-second format.
    */
  private def tableState(tablePath: String): Map[(String, Int), Map[String, Any]] = {
    val df = IceLite.read(spark, tablePath)
    val cols = df.schema.fieldNames
    df.collect().map { r =>
      val m = cols.zipWithIndex.map { case (c, i) =>
        val v: Any = r.get(i) match {
          case t: java.sql.Timestamp =>
            t.toInstant.toString.replace(".000Z", "Z") // ISO seconds
          case other => other
        }
        c -> v
      }.toMap
      ((r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")), m)
    }.toMap
  }

  private def assertMatchesOracle(tablePath: String, lines: Seq[String]): Unit = {
    val oracle = GoldenOracle.converge(lines)
    val table = tableState(tablePath)
    assert(table.keySet == oracle.keySet,
      s"key sets differ: onlyTable=${(table.keySet -- oracle.keySet).take(5)} " +
        s"onlyOracle=${(oracle.keySet -- table.keySet).take(5)}")
    for ((k, orow) <- oracle) {
      val trow = table(k)
      for ((f, ov) <- orow) {
        val tv = trow.getOrElse(f, null)
        val ok = (ov, tv) match {
          case (null, null) => true
          case (a: Long, b: Long) => a == b
          case (a: Long, b: Double) => a.toDouble == b // widened column
          case (a: Double, b: Double) => a == b
          case (a, b) => String.valueOf(a) == String.valueOf(b)
        }
        assert(ok, s"key=$k field=$f oracle=$ov table=$tv")
      }
    }
  }

  test("full replay converges to the oracle (golden table)") {
    val base = TestSpark.freshDir("golden-full")
    val feed = s"$base/feed"
    val lines = genFeed(feed)
    val cfg = Pipeline.Config(feed, s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), lineageDir = Some(s"$base/lineage"),
      numBuckets = 8, maxFilesPerTrigger = Some(2))
    val results = Pipeline.replay(spark, cfg)
    assert(results.nonEmpty && results.forall(_.committed))
    assertMatchesOracle(s"$base/table", lines)

    // dead-letter routed the malformed lines (JSG:293-298 precedent)
    val dead = spark.read.parquet(s"$base/dead")
    assert(dead.count() == GoldenOracle.malformedCount(lines))
    // lineage has one row per applied batch with LSN-range→snapshot mapping
    // (clean run — after a crash the contract is best-effort, see readLineage)
    val lineage = MergeApply.readLineage(spark, s"$base/lineage")
    assert(lineage.count() == results.size)
    assert(lineage.select("batch.version").distinct().count() == results.size)
    // per-bucket apply metrics exist for skew diagnostics
    val buckets = lineage.select(explode(col("buckets")).as("b"))
    assert(buckets.count() >= results.size) // ≥1 touched bucket per batch
  }

  test("lineage read drops torn/partial lines (crash tolerance)") {
    // A crash mid-append can leave one torn trailing JSONL line; readLineage
    // must drop it instead of surfacing a _corrupt_record row.
    val base = TestSpark.freshDir("lineage-torn")
    val d = Paths.get(base, "batches")
    Files.createDirectories(d)
    Files.write(d.resolve("batches.jsonl"),
      ("""{"batch":{"batchId":0,"version":1},"buckets":[]}""" + "\n" +
        """{"batch":{"batchId":1,"version":2},"buckets":[]}""" + "\n" +
        """{"batch":{"batchId":2,"ver""").getBytes("UTF-8"))
    val rows = MergeApply.readLineage(spark, base)
    assert(rows.count() == 2)
    assert(!rows.columns.contains("_corrupt_record"))
  }

  test("schema evolution: model/tokens/score appear; score widened to double") {
    val base = TestSpark.freshDir("golden-evo")
    val feed = s"$base/feed"
    genFeed(feed)
    val cfg = Pipeline.Config(feed, s"$base/table", s"$base/ckpt", numBuckets = 8,
      maxFilesPerTrigger = Some(4))
    Pipeline.replay(spark, cfg)
    val snap = IceLite.load(s"$base/table")
    val s = snap.payloadSchema
    assert(s("model").dataType == StringType)
    assert(s("tokens").dataType == LongType)
    assert(s("score").dataType == DoubleType, s"score=${s("score").dataType}") // Long⊔Double
    assert(s("ts").dataType == TimestampType)
    assert(snap.schemaV > 1) // schema actually evolved mid-stream
  }

  test("exactly-once: re-running the finished stream is a no-op") {
    val base = TestSpark.freshDir("golden-idem")
    val feed = s"$base/feed"
    val lines = genFeed(feed)
    val cfg = Pipeline.Config(feed, s"$base/table", s"$base/ckpt", numBuckets = 8)
    Pipeline.replay(spark, cfg)
    val v1 = IceLite.load(s"$base/table").version
    Pipeline.replay(spark, cfg) // same checkpoint: no new data, no new commits
    assert(IceLite.load(s"$base/table").version == v1)
    assertMatchesOracle(s"$base/table", lines)
  }

  test("replay from mid-stream checkpoint converges (resume)") {
    val base = TestSpark.freshDir("golden-resume")
    val fullFeed = s"$base/feed"
    val lines = genFeed(fullFeed)

    // Stage 1: only the first half of the batch dirs are visible.
    val partial = s"$base/feed-partial"
    Files.createDirectories(Paths.get(partial))
    val batchDirs = Files.list(Paths.get(fullFeed)).iterator()
    val it = scala.jdk.CollectionConverters.IteratorHasAsScala(batchDirs).asScala
      .filter(p => p.getFileName.toString.startsWith("batch=")).toSeq.sortBy(_.toString)
    val (first, rest) = it.splitAt(it.size / 2)
    first.foreach { d =>
      val target = Paths.get(partial, d.getFileName.toString)
      Files.createDirectories(target)
      Files.list(d).forEach(f =>
        Files.copy(f, target.resolve(f.getFileName.toString)))
    }
    val cfg1 = Pipeline.Config(partial, s"$base/table", s"$base/ckpt", numBuckets = 8,
      maxFilesPerTrigger = Some(2))
    Pipeline.replay(spark, cfg1)

    // Stage 2: the rest arrives; resume from the same checkpoint.
    rest.foreach { d =>
      val target = Paths.get(partial, d.getFileName.toString)
      Files.createDirectories(target)
      Files.list(d).forEach(f =>
        Files.copy(f, target.resolve(f.getFileName.toString)))
    }
    Pipeline.replay(spark, cfg1)
    assertMatchesOracle(s"$base/table", lines)
  }

  test("bit-identical state across parallelism levels (the two-cluster-size rule)") {
    val base = TestSpark.freshDir("golden-par")
    val feed = s"$base/feed"
    genFeed(feed)
    def replayWith(shuffle: Int, table: String, mfpt: Option[Int]): Unit = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      try Pipeline.replay(spark, Pipeline.Config(feed, table, s"$table-ckpt",
        numBuckets = 8, maxFilesPerTrigger = mfpt))
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    replayWith(3, s"$base/tableA", Some(2))
    replayWith(7, s"$base/tableB", None) // different parallelism AND batching
    def stored(t: String): Set[String] = {
      val df = graft.table.IceLite.readStored(spark, t, graft.table.IceLite.load(t))
      // field ORDER may differ when batching changes schema-evolution
      // encounter order; the logical state must not.
      val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col _)
      df.select(cols.toSeq: _*).collect().map(_.toString).toSet
    }
    assert(stored(s"$base/tableA") == stored(s"$base/tableB"),
      "final stored state (incl. _lsn/_deleted) must not depend on parallelism or batching")
  }

  test("fresh-checkpoint re-replay over an existing table still converges (LWW idempotence)") {
    val base = TestSpark.freshDir("golden-rereplay")
    val feed = s"$base/feed"
    val lines = genFeed(feed)
    val cfg1 = Pipeline.Config(feed, s"$base/table", s"$base/ckpt1", numBuckets = 8)
    Pipeline.replay(spark, cfg1)
    // New checkpoint → new batchIds → events re-applied; LWW by LSN makes it
    // converge to the same state (permutation/replay invariance).
    val cfg2 = Pipeline.Config(feed, s"$base/table", s"$base/ckpt2", numBuckets = 8)
    Pipeline.replay(spark, cfg2)
    assertMatchesOracle(s"$base/table", lines)
  }
}
