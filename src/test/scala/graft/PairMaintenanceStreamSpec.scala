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

    // Fresh checkpoint = full replay under NEW epochs (the recreated
    // checkpoint pins its base ABOVE everything committed — see
    // streamBase). The refreshes re-apply for real against current state
    // and the view converges by VALUE: replaying f1 regresses B/C, f2
    // restores them, and the end state is unchanged.
    assert(PairMaintenance.stream(spark, feed, s"$base/ckpt2", cfg,
      maxFilesPerTrigger = Some(1)) == 2)
    assert(live(cfg) == Set(("A", "D")))
  }

  test("stream over bootstrapped state: the first micro-batch must apply, not collide") {
    val base = TestSpark.freshDir("pairmaint-boot-stream")
    val cfg = PairMaintenance.Config(s"$base/state")
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    import spark.implicits._
    // Batch bootstrap commits epoch 0 — the documented
    // refresh-then-stream deployment pattern.
    val boot = Seq("A" -> t, "C" -> "one two three four five six seven")
      .toDF("doc_id", "text")
    PairMaintenance.refresh(spark, cfg, boot, boot.select("doc_id"),
      lsn = 1, epoch = 0)
    assert(live(cfg) == Set.empty[(String, String)])
    // A fresh stream's first micro-batch gets batchId = 0; without the
    // checkpoint-pinned epoch base it would hit hasBatch(0) on all three
    // tables and silently drop the batch while the offset log advanced.
    val feed = s"$base/feed"
    writeFeed(feed, "f1.jsonl", Seq(s"""{"doc_id":"B","text":"$t iota","lsn":5}"""))
    assert(PairMaintenance.stream(spark, feed, s"$base/ckpt", cfg) == 1)
    assert(live(cfg) == Set(("A", "B")),
      "the first stream batch over bootstrapped state must apply, not no-op")
  }

  test("stream lsns ride above a high-lsn bootstrap (LWW regression guard)") {
    val base = TestSpark.freshDir("pairmaint-lsn-base")
    val cfg = PairMaintenance.Config(s"$base/state")
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    import spark.implicits._
    // Bootstrap on an arbitrary producer LSN scale.
    val boot = Seq("A" -> t, "B" -> (t + " iota")).toDF("doc_id", "text")
    PairMaintenance.refresh(spark, cfg, boot, boot.select("doc_id"),
      lsn = 1000, epoch = 0)
    assert(live(cfg) == Set(("A", "B")))
    // The stream rewrite must WIN the tables' LWW against the lsn-1000
    // bootstrap rows — a batchId-derived lsn (1) would silently lose and
    // the stale pair would survive.
    val feed = s"$base/feed"
    writeFeed(feed, "f1.jsonl", Seq(
      s"""{"doc_id":"B","text":"totally different words nothing shared here","lsn":1}"""))
    assert(PairMaintenance.stream(spark, feed, s"$base/ckpt", cfg) == 1)
    assert(live(cfg) == Set.empty[(String, String)],
      "the rewrite must retract the bootstrap-era pair despite its higher bootstrap lsn scale")
  }

  test("malformed upsert (no text, not a delete) is ignored, not a tombstone") {
    val base = TestSpark.freshDir("pairmaint-malformed")
    val cfg = PairMaintenance.Config(s"$base/state")
    val feed = s"$base/feed"
    val ckpt = s"$base/ckpt"
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    writeFeed(feed, "f1.jsonl", Seq(
      s"""{"doc_id":"A","text":"$t","lsn":1}""",
      s"""{"doc_id":"B","text":"$t iota","lsn":1}"""))
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 1)
    assert(live(cfg) == Set(("A", "B")))
    // A truncated / schema-drifted upsert line carries a doc_id but no
    // text: it must be DROPPED, not interpreted as a vanish that
    // tombstones A and retracts its pairs.
    writeFeed(feed, "f2.jsonl", Seq(s"""{"doc_id":"A","lang":"en","lsn":2}"""))
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 1)
    assert(live(cfg) == Set(("A", "B")),
      "a malformed upsert must not become a delete")
  }

  test("same-lsn tie (feed without lsn) resolves deterministically: delete beats upsert") {
    val base = TestSpark.freshDir("pairmaint-tie")
    val cfg = PairMaintenance.Config(s"$base/state")
    val feed = s"$base/feed"
    val ckpt = s"$base/ckpt"
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    // No lsn fields anywhere: every line folds at l = 0, so the in-batch
    // winner for A is decided purely by the documented total order
    // (delete > upsert at equal lsn) — not by partition scheduling.
    writeFeed(feed, "f1.jsonl", Seq(
      s"""{"doc_id":"A","text":"$t"}""",
      s"""{"doc_id":"A","deleted":true}""",
      s"""{"doc_id":"B","text":"$t iota"}"""))
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 1)
    assert(live(cfg) == Set.empty[(String, String)],
      "equal-lsn delete must beat the upsert on every run")
    // And A is genuinely dead, not latent: re-adding it revives the pair.
    writeFeed(feed, "f2.jsonl", Seq(s"""{"doc_id":"A","text":"$t"}"""))
    assert(PairMaintenance.stream(spark, feed, ckpt, cfg) == 1)
    assert(live(cfg) == Set(("A", "B")))
  }
}
