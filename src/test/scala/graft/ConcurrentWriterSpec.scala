package graft

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Multi-writer optimistic concurrency: two independent writers racing
  * commits on one table (overlapping keys, interleaved LSNs) converge to the
  * sequential twin's exact state; attempt-unique data dirs keep every
  * committed snapshot's files intact through lost attempts; vacuum reclaims
  * the losers' orphans; and occRetry deterministically absorbs a lost
  * snapshot CAS.
  */
class ConcurrentWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchDf(rows: Seq[(String, Long, String, Int, String, String)]): DataFrame =
    rows.toDF("op", "lsn", "conv_id", "turn_idx", "role", "text")

  // writer w, round r: 4 rows over the SAME 8 keys both writers fight for,
  // LSNs disjoint and interleaved across writers/rounds.
  private def rows(w: Int, r: Int): Seq[(String, Long, String, Int, String, String)] =
    (0 until 4).map { i =>
      val key = (w + r + i * 3) % 8
      val lsn = 1000L + r * 100 + i * 10 + w // unique per (w, r, i)
      val op = if (lsn % 7 == 0) "D" else "U"
      (op, lsn, s"c${key % 4}", key / 4, s"role$w", s"w$w-r$r-i$i")
    }

  test("two racing writers converge to the sequential twin; files intact; vacuum reclaims orphans") {
    val racedDir = TestSpark.freshDir("occ-raced")
    val seqDir = TestSpark.freshDir("occ-seq")
    IceLite.create(racedDir, numBuckets = 4)
    IceLite.create(seqDir, numBuckets = 4)
    val rounds = 3

    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(w: Int) = new Thread(() => {
      try (0 until rounds).foreach { r =>
        val df = batchDf(rows(w, r))
        barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
        MergeApply.occRetry(racedDir) {
          MergeApply.applyChanges(spark, racedDir, df, batchId = w * 100L + r)
        }
      } catch { case t: Throwable => failures.add(t) }
    }, s"spec-writer-$w")
    val ts = Seq(writer(0), writer(1))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")

    // every batch committed exactly once → exactly 6 serialized versions
    val snap = IceLite.load(racedDir)
    assert(snap.version === 2 * rounds)
    (0 until rounds).foreach { r =>
      assert(snap.hasBatch(r.toLong) && snap.hasBatch(100L + r))
    }
    // every referenced file exists (no lost attempt clobbered a winner)
    (snap.buckets ++ snap.deltas).foreach { e =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(racedDir, e.dir)), e.dir)
    }

    // sequential twin: same six batches, one writer, fixed order
    for (r <- 0 until rounds; w <- 0 to 1)
      MergeApply.applyChanges(spark, seqDir, batchDf(rows(w, r)), batchId = w * 100L + r)
    def state(dir: String) = IceLite.read(spark, dir)
      .select("conv_id", "turn_idx", "role", "text")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(state(racedDir) === state(seqDir))

    // vacuum reclaims lost attempts' orphan dirs, never referenced ones
    IceLite.vacuum(racedDir, keepVersions = 1)
    val head = IceLite.load(racedDir)
    (head.buckets ++ head.deltas).foreach { e =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(racedDir, e.dir)), e.dir)
    }
    val referenced = (head.buckets ++ head.deltas)
      .map(_.dir.split("/").take(2).mkString("/")).toSet
    scala.util.Using.resource(java.nio.file.Files.list(
        java.nio.file.Paths.get(racedDir, "data"))) { ls =>
      ls.iterator().forEachRemaining { p =>
        assert(referenced.contains(s"data/${p.getFileName}"),
          s"unreclaimed orphan ${p.getFileName}")
      }
    }
    assert(state(racedDir) === state(seqDir)) // still readable post-GC
  }

  test("occRetry absorbs a deterministic lost CAS and commits on the retry") {
    val dir = TestSpark.freshDir("occ-cas")
    IceLite.create(dir, numBuckets = 2)
    val mine = batchDf(Seq(("U", 10L, "a", 0, "user", "mine")))
    val other = batchDf(Seq(("U", 11L, "b", 0, "user", "other")))
    var attempts = 0
    val res = MergeApply.occRetry(dir) {
      attempts += 1
      if (attempts == 1) {
        val stale = IceLite.load(dir)
        MergeApply.applyChanges(spark, dir, other, batchId = 50L) // competitor lands
        IceLite.commitSnapshot(dir, stale.copy(version = stale.version + 1)) // real CME
      }
      MergeApply.applyChanges(spark, dir, mine, batchId = 1L)
    }
    assert(attempts === 2 && res.committed)
    val snap = IceLite.load(dir)
    assert(snap.hasBatch(1L) && snap.hasBatch(50L))
    val texts = IceLite.read(spark, dir).select("text").as[String].collect().sorted
    assert(texts.toSeq === Seq("mine", "other"))
  }

  test("occRetry rethrows non-conflict failures when the head did not move") {
    val dir = TestSpark.freshDir("occ-rethrow")
    IceLite.create(dir, numBuckets = 2)
    var attempts = 0
    val e = intercept[IllegalStateException] {
      MergeApply.occRetry(dir) { attempts += 1; throw new IllegalStateException("boom") }
    }
    assert(e.getMessage === "boom" && attempts === 1)
  }
}
