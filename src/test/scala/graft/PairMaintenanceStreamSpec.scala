package graft

import graft.ops.PairMaintenance
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The checkpointed streaming deployment of pair maintenance: each
  * micro-batch of document updates (upserts, rewrites, deletions) runs one
  * refresh, restart resumes from the offset log, and a full re-run of a
  * drained feed changes nothing. After every drain the live pair view must
  * equal the from-scratch pair set of the CURRENT documents — the same
  * oracle PairMaintenanceSpec holds the batch API to.
  */
class PairMaintenanceStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fromScratch(docs: Map[String, String]): Set[(String, String)] = {
    def shingles(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ").toSeq
      if (w.size <= 3) Set(w.mkString(" "))
      else (0 to w.size - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val ids = docs.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = shingles(docs(ids(i))); b = shingles(docs(ids(j)))
      if a.intersect(b).size.toDouble / a.union(b).size >= 0.5
    } yield (ids(i), ids(j))).toSet
  }

  private def live(cfg: PairMaintenance.Config): Set[(String, String)] =
    PairMaintenance.livePairs(spark, cfg).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  private def writeFeed(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, name))
  }

  test("stream: upsert, rewrite-retraction, delete, resume, idempotent re-run") {
    val base = TestSpark.freshDir("pairmaint-stream")
    val feed = s"$base/feed"
    val ckpt = s"$base/ckpt"
    val cfg = PairMaintenance.Config(s"$base/state")
    val t = "alpha beta gamma delta epsilon zeta eta theta"

    // File 1: A~B near-dups, C unrelated. A duplicate in-batch line for B
    // (lower lsn) must lose the within-batch fold.
    writeFeed(feed, "f1.jsonl", Seq(
      s"""{"doc_id":"A","text":"$t","lsn":1}""",
      s"""{"doc_id":"B","text":"junk to be superseded in-batch","lsn":1}""",
      s"""{"doc_id":"B","text":"$t iota","lsn":2}""",
      s"""{"doc_id":"C","text":"one two three four five six seven","lsn":1}"""))
    var docs = Map("A" -> t, "B" -> (t + " iota"),
      "C" -> "one two three four five six seven")
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 1)
    assert(live(cfg) == fromScratch(docs) && live(cfg) == Set(("A", "B")))

    // File 2 arrives later: B rewritten (pair retracted), D joins A, C deleted.
    // Resume must process ONLY the new file.
    writeFeed(feed, "f2.jsonl", Seq(
      s"""{"doc_id":"B","text":"totally different words nothing shared here","lsn":3}""",
      s"""{"doc_id":"D","text":"$t kappa","lsn":3}""",
      s"""{"doc_id":"C","deleted":true,"lsn":3}"""))
    docs = docs.updated("B", "totally different words nothing shared here")
      .+("D" -> (t + " kappa")) - "C"
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 1,
      "resume from checkpoint must drain exactly the one new file")
    assert(live(cfg) == fromScratch(docs) && live(cfg) == Set(("A", "D")))

    // Drained feed: a re-run triggers no batch and moves nothing.
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 0)
    assert(live(cfg) == Set(("A", "D")))

    // Fresh checkpoint = full replay. maxFilesPerTrigger=1 reproduces the
    // original epoch boundaries, so both refreshes re-derive their deltas
    // against already-committed epochs and every applyChanges no-ops — the
    // view is unchanged (crash-retry shape).
    assert(PairMaintenance.stream(spark, feed, s"$base/ckpt2", cfg,
      maxFilesPerTrigger = Some(1)) == 2)
    assert(live(cfg) == Set(("A", "D")))
  }
}
