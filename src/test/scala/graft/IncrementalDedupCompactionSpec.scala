package graft

import graft.ops.IncrementalDedup
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Pair-log folding: a long ingest writes one `duppairs/batch=<id>` dir per
  * batch; `compactPairLog` folds a prefix into one dir so the cluster-
  * maintenance read opens O(compactions) directories, not O(batches).
  * Covers the happy path and BOTH crash-recovery branches of the two-phase
  * swap (partial staging rebuilt; completed staging finishes the swap).
  */
class IncrementalDedupCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "one two three four five six seven",
    3L -> "red green blue cyan magenta yellow black",
    11L -> "red green blue cyan magenta yellow black",
    12L -> "lorem ipsum dolor sit amet consectetur",
    21L -> "alpha beta gamma delta epsilon zeta",
    22L -> "red green blue cyan magenta yellow black")

  private def applyAll(cfg: IncrementalDedup.Config): Unit = {
    import spark.implicits._
    Seq(corpus.filter(_._1 < 10), corpus.filter(d => d._1 >= 10 && d._1 < 20),
      corpus.filter(_._1 >= 20)).zipWithIndex.foreach { case (b, i) =>
      IncrementalDedup.applyBatch(spark, b.toDF("doc_id", "text"), i.toLong, cfg)
    }
  }

  private def pairSet(cfg: IncrementalDedup.Config): Set[(Long, Long)] = {
    import spark.implicits._
    IncrementalDedup.dupPairs(spark, cfg).distinct().as[(Long, Long)].collect().toSet
  }

  private def batchDirs(cfg: IncrementalDedup.Config): Set[String] = {
    val root = Paths.get(s"${cfg.stateDir}/duppairs")
    scala.util.Using.resource(Files.list(root))(
      _.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("batch=")).toSet)
  }

  test("folding a batch prefix preserves the pair set and bounds the dir count") {
    val cfg = IncrementalDedup.Config(TestSpark.freshDir("incdedup-compact"), numBuckets = 4)
    applyAll(cfg)
    val want = DedupReference.pairs(corpus, cfg.threshold)
    assert(pairSet(cfg) == want)
    assert(batchDirs(cfg) == Set("batch=0", "batch=1", "batch=2"))

    IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 1)
    assert(batchDirs(cfg) == Set("batch=1", "batch=2"), "prefix not folded")
    assert(pairSet(cfg) == want, "folding changed the pair set")

    // Idempotent: a re-run with nothing left to fold is a no-op.
    IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 1)
    assert(batchDirs(cfg) == Set("batch=1", "batch=2") && pairSet(cfg) == want)
  }

  test("crash recovery: partial staging is rebuilt; completed staging finishes the swap") {
    val cfg = IncrementalDedup.Config(TestSpark.freshDir("incdedup-compact-crash"), numBuckets = 4)
    applyAll(cfg)
    val want = DedupReference.pairs(corpus, cfg.threshold)
    val root = Paths.get(s"${cfg.stateDir}/duppairs")

    // Crash mid-phase-1: a staging dir without _SUCCESS must be discarded
    // and rebuilt from the intact sources.
    val staged = root.resolve(".compact-staging")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-garbage.parquet"), Array[Byte](1, 2, 3))
    IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 2)
    assert(batchDirs(cfg) == Set("batch=2") && pairSet(cfg) == want,
      "partial staging not recovered")

    // Crash between phase 1 and 2: staging complete (_SUCCESS present) FOR
    // THIS TARGET, sources still on disk. The re-run must skip the rebuild
    // and finish the swap without changing the pair set. Simulated by
    // copying the folded dir to the target-named staging (it IS a completed
    // phase-1 output for upTo=2).
    val staged2 = root.resolve(".compact-staging-2")
    Files.createDirectories(staged2)
    scala.util.Using.resource(Files.list(root.resolve("batch=2")))(
      _.iterator().asScala.foreach(f =>
        Files.copy(f, staged2.resolve(f.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)))
    assert(Files.exists(staged2.resolve("_SUCCESS")))
    IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 2)
    assert(batchDirs(cfg) == Set("batch=2") && pairSet(cfg) == want,
      "completed-staging recovery diverged")
  }

  test("a completed FOREIGN staging whose phase 2 already deleted sources is adopted") {
    val cfg = IncrementalDedup.Config(TestSpark.freshDir("incdedup-compact-foreign"),
      numBuckets = 4)
    applyAll(cfg)
    val want = DedupReference.pairs(corpus, cfg.threshold)
    val root = Paths.get(s"${cfg.stateDir}/duppairs")
    // Simulate compactPairLog(upToBatch=1) crashing MID-PHASE-2: its staging
    // is complete (_SUCCESS, holds batches 0+1 folded) and it already
    // deleted source batch=0 — the staging is now the ONLY copy of batch
    // 0's pairs. Build the staging as the real fold of batches 0..1.
    import spark.implicits._
    val stale = root.resolve(".compact-staging-1")
    spark.read.parquet(s"$root/batch=0", s"$root/batch=1")
      .select("doc_a", "doc_b").coalesce(1)
      .write.parquet(stale.toString)
    assert(Files.exists(stale.resolve("_SUCCESS")))
    def rmrf(p: java.nio.file.Path): Unit =
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.delete(f)))
    rmrf(root.resolve("batch=0")) // the crashed run's partial phase 2
    // A later fold with a DIFFERENT target must adopt (finish) that swap
    // first — discarding the staging would silently lose batch 0's pairs.
    IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 2)
    assert(batchDirs(cfg) == Set("batch=2"))
    assert(pairSet(cfg) == want,
      "pairs surviving only in the foreign completed staging must be preserved")
  }

  test("a completed LEGACY-named staging (unknown target) is left in place, never adopted") {
    val cfg = IncrementalDedup.Config(TestSpark.freshDir("incdedup-compact-stale"),
      numBuckets = 4)
    applyAll(cfg)
    val want = DedupReference.pairs(corpus, cfg.threshold)
    val root = Paths.get(s"${cfg.stateDir}/duppairs")
    // Simulate compactPairLog(upToBatch=0) crashing between phases: a
    // COMPLETE staging that folded batch 0 alone (legacy unsuffixed name —
    // the worst case, indistinguishable from any target without the stamp).
    val stale = root.resolve(".compact-staging")
    Files.createDirectories(stale)
    scala.util.Using.resource(Files.list(root.resolve("batch=0")))(
      _.iterator().asScala.foreach(f =>
        Files.copy(f, stale.resolve(f.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)))
    assert(Files.exists(stale.resolve("_SUCCESS")))
    // A later, WIDER fold must not adopt it: doing so would delete batches
    // 1-2 (never folded into that staging) and silently lose their pairs.
    IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 2)
    assert(batchDirs(cfg) == Set("batch=2"))
    assert(pairSet(cfg) == want,
      "pairs from batches the stale staging never covered must survive the fold")
  }

  test("folding an uncommitted batch id refuses (crash-retry would overwrite the fold)") {
    val cfg = IncrementalDedup.Config(TestSpark.freshDir("incdedup-compact-uncommitted"),
      numBuckets = 4)
    applyAll(cfg) // epochs 0..2 committed
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.compactPairLog(spark, cfg, upToBatch = 99)
    }
    assert(e.getMessage.contains("not fully committed"))
    assert(batchDirs(cfg) == Set("batch=0", "batch=1", "batch=2"),
      "the refused fold must not touch the log")
  }
}
