package graft

import graft.ops.GraphOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components correctness: the large-star/small-star result must
  * equal a driver-side union-find over the same edge list, on shapes that
  * stress different convergence behavior (chains need multiple rounds;
  * stars, disjoint pairs, dense blocks converge fast) plus seeded random
  * graphs.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    // canonicalize: doc_a < doc_b, as the dedup pair operators emit
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
  }

  /** Driver-side oracle: plain union-find with path compression. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // normalize roots to the component MIN (union by min above keeps this,
    // but re-resolve after compression to be safe)
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(pairs: Seq[(Long, Long)], clue: String): Unit = {
    val got = GraphOps.connectedComponents(edgesDf(pairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(pairs).filter { case (k, v) => k != v }
    assert(got == want, s"[$clue] star edges != union-find components")
  }

  test("chain of 20 nodes (multi-round convergence)") {
    check((1L until 20L).map(i => (i, i + 1)), "chain")
  }

  test("two disjoint chains meeting a star and isolated pairs") {
    val chain1 = (100L until 110L).map(i => (i, i + 1))
    val chain2 = (200L to 205L).map(i => (i + 1, i))
    val star = (1L to 8L).map(i => (50L, 50L + i))
    val pairs = Seq((300L, 301L), (400L, 402L))
    check(chain1 ++ chain2 ++ star ++ pairs, "mixed")
  }

  test("dense block with duplicate and reversed edges") {
    val nodes = Seq(3L, 9L, 17L, 21L, 44L)
    val dense = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    check(dense ++ dense.take(5), "dense")
  }

  test("empty edge set") {
    assert(GraphOps.connectedComponents(edgesDf(Nil)).collect().isEmpty)
  }

  test("cluster profile: reliable checkpoint() dir — convergence unchanged") {
    // The checkpointDir knob swaps localCheckpoint for reliable
    // checkpoint(); the result must be the identical star-edge set on a
    // multi-round shape (a chain forces several large/small-star rounds,
    // so every cut path is exercised).
    val dir = "/root/repo/target/graft-work/cc-ckpt"
    val chain = (1L until 24L).map(i => (i, i + 1)) ++ Seq((500L, 501L))
    val local = GraphOps.connectedComponents(edgesDf(chain))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = GraphOps.connectedComponents(edgesDf(chain), checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local, "reliable-checkpoint CC diverged from localCheckpoint CC")
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0,
      "reliable checkpoint dir was never written")
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val m = 20 + rnd.nextInt(60)
      val pairs = (0 until m).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a == b) (a, b + n) else (a, b)
      }
      check(pairs, s"random-$trial")
    }
  }

  test("dedupCluster emits every planted dup with canon = base doc and size ≥ 2") {
    val out = GraphOps.dedupCluster(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val byDoc = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // planted dups (doc_id+100000) must cluster with their base doc
    byDoc.keys.filter(_ >= 100000L).foreach { d =>
      assert(byDoc(d)._1 == byDoc(d - 100000L)._1, s"dup $d split from base")
    }
    assert(out.forall(_.getLong(2) >= 2), "clusters must have ≥ 2 members")
    // canon rows are present and self-canonical
    val canons = out.map(_.getLong(1)).toSet
    canons.foreach(c => assert(byDoc(c)._1 == c, s"canon $c missing/non-self"))
  }
}
