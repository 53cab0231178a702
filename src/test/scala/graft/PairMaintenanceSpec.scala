package graft

import graft.ops.PairMaintenance
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite

/** Dedup under UPDATES: the maintained pair view must ADD pairs a change
  * creates, REVOKE pairs a change destroys, and clean up after full
  * deletion — the semantics the append-only pipeline deliberately excludes.
  * Each refresh here plays one "touched set" against the state, and after
  * every round the live pair view must equal the from-scratch pair set of
  * the CURRENT documents.
  */
class PairMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

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

  test("update retracts a destroyed pair; deletion cleans its pairs; re-add restores") {
    val cfg = PairMaintenance.Config(TestSpark.freshDir("pairmaint"))
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    var docs = Map(
      "A" -> base,
      "B" -> (base + " iota"),          // near-dup of A
      "C" -> "one two three four five six seven") // unrelated

    // Round 1: bootstrap — pair (A,B) discovered.
    PairMaintenance.refresh(spark, cfg, docs.toSeq.toDF("doc_id", "text"),
      Seq("A", "B", "C").toDF("doc_id"), lsn = 1, epoch = 0)
    assert(live(cfg) == fromScratch(docs) && live(cfg) == Set(("A", "B")))

    // Round 2: B rewritten to unrelated text — (A,B) must be RETRACTED.
    docs = docs.updated("B", "totally different words nothing shared at all here")
    PairMaintenance.refresh(spark, cfg, Seq("B" -> docs("B")).toDF("doc_id", "text"),
      Seq("B").toDF("doc_id"), lsn = 2, epoch = 1)
    assert(live(cfg) == fromScratch(docs) && live(cfg).isEmpty,
      "rewriting B must revoke the stale (A,B) pair")

    // Round 3: D arrives as a near-dup of A — pair created against state.
    docs = docs + ("D" -> (base + " kappa"))
    PairMaintenance.refresh(spark, cfg, Seq("D" -> docs("D")).toDF("doc_id", "text"),
      Seq("D").toDF("doc_id"), lsn = 3, epoch = 2)
    assert(live(cfg) == fromScratch(docs) && live(cfg) == Set(("A", "D")))

    // Round 4: A deleted entirely — its pair must be revoked and its
    // signatures tombstoned (no ghost candidates later).
    docs = docs - "A"
    PairMaintenance.refresh(spark, cfg,
      spark.emptyDataset[(String, String)].toDF("doc_id", "text"),
      Seq("A").toDF("doc_id"), lsn = 4, epoch = 3)
    assert(live(cfg) == fromScratch(docs) && live(cfg).isEmpty,
      "deleting A must revoke (A,D)")

    // Round 5: E arrives near-identical to the DELETED A's text — the
    // tombstoned signatures must NOT resurrect a pair with the ghost.
    docs = docs + ("E" -> base)
    PairMaintenance.refresh(spark, cfg, Seq("E" -> docs("E")).toDF("doc_id", "text"),
      Seq("E").toDF("doc_id"), lsn = 5, epoch = 4)
    assert(live(cfg) == fromScratch(docs) && live(cfg) == Set(("D", "E")),
      "ghost A must not pair; live D must")

    // Replay of an already-committed epoch is a no-op (exactly-once).
    PairMaintenance.refresh(spark, cfg, Seq("E" -> docs("E")).toDF("doc_id", "text"),
      Seq("E").toDF("doc_id"), lsn = 5, epoch = 4)
    assert(live(cfg) == Set(("D", "E")))
  }
}
