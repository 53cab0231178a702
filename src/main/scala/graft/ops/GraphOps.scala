package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components + near-duplicate CLUSTERING.
  *
  * The pairwise dedup operators ([[TextOps.dedupMinhashLsh]] etc.) emit a
  * near-dup PAIR graph; a training-data pipeline then needs one canonical
  * representative per duplicate CLUSTER (keep the canon, drop the rest) —
  * which is connected components over that graph, since near-dup similarity
  * is not transitive pair-by-pair but dup groups are its transitive closure.
  * The reference has no graph operator (its per-record processors can't
  * express one); this is part of the §6 training-data battery.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
  * Beyond", SoCC 2014), the published shuffle-native CC algorithm:
  * converges in O(log² n) rounds (2 keyed shuffles per star step) versus
  * O(diameter) for naive min-label flooding — a path-shaped dup chain of
  * length 10⁶ needs ~40 rounds, not 10⁶. Crucially the formulation here is
  * pure `groupBy(min) + join` on the node key: no `collect_set` adjacency
  * materialization, so a 10⁷-degree hot node (every shingle-spam doc pairing
  * with everything) streams through partial min-aggregation map-side instead
  * of building a 10⁷-element array on one reducer. Both shuffles in a star
  * step hash by the same key, so Catalyst's ReuseExchange collapses them to
  * one exchange per side.
  *
  * Iterative Spark needs lineage truncation, not just caching — see
  * [[connectedComponents]] for why each round is an eager localCheckpoint.
  */
object GraphOps {

  /** Canonical star edges (node → its component minimum) for the undirected
    * graph given by `pairs` (columns `doc_a` < `doc_b`). Returns a frame
    * with columns (u, v), u > v, one row per non-minimum node.
    *
    * Each round's frontier is materialized with an EAGER `localCheckpoint`
    * — not a bare `persist`: a star step references its input ~6× (symmetric
    * closure, min-aggregate, join), so without lineage TRUNCATION the
    * logical plan grows ~6^rounds nodes and Catalyst analysis goes
    * exponential long before execution does (persist caches data, not the
    * plan). The checkpointed per-round blocks are O(star edges) = O(dup
    * docs), far smaller than the pair graph, and are reclaimed by Spark's
    * ContextCleaner once the round's frame goes out of scope.
    *
    * `checkpointDir` is the CLUSTER PROFILE knob: when set, every round cut
    * is a reliable `checkpoint()` into that directory (an HDFS/object-store
    * path on a real cluster) instead of `localCheckpoint` — executor-local
    * checkpoint blocks die with their executor, and losing one mid-run
    * forces a full-chain recompute that the truncated lineage can no longer
    * serve, so a long CC job on a real cluster MUST cut to reliable
    * storage. Algorithm and convergence are identical either way
    * (GraphOpsSpec runs both); note `SparkContext.setCheckpointDir` is
    * context-global, as Spark defines it.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    val cut: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        pairs.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
    // oriented u > v ("point at the smaller endpoint"), deduped
    var cur = cut(pairs
      .select(col("doc_b").as("u"), col("doc_a").as("v"))
      .distinct())
    var sig = checksum(cur)
    var round = 0
    while (round < maxRounds) {
      val next = cut(smallStar(cut(largeStar(cur))))
      val nsig = checksum(next)
      if (nsig == sig) {
        // checksum fixpoint — confirm exactly. Both frames are DISTINCT sets
        // and the checksum already matched their row counts, so equal counts
        // + one empty difference ⇒ set equality (no second probe needed);
        // both sides are checkpointed, so the probe runs cheap, once.
        if (next.exceptAll(cur).isEmpty) return next
        // astronomically unlikely (count+xor collision): keep iterating
      }
      cur = next
      sig = nsig
      round += 1
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds large/small-star rounds")
  }

  /** Order-insensitive edge-set fingerprint: (row count, XOR of per-edge
    * hashes). Used as the convergence check; a hit is re-verified exactly.
    */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Large-star: every node x connects its LARGER neighbors to
    * m(x) = min(Γ(x) ∪ {x}). Works on the symmetric closure; output stays
    * oriented u > v because m(x) ≤ x < larger-neighbor.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(least(first(col("u")), min(col("v"))).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node x connects its smaller-or-self closure
    * Γ⁻(x) ∪ {x} to m(x) = its minimum. Input and output oriented u > v, so
    * Γ⁻ is just the in-edges and m(x) = min(v) over them.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min(col("v")).as("m"))
    val viaNeighbors = edges.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = mins.select(col("u"), col("m").as("v"))
    viaNeighbors.union(self).distinct()
  }

  /** Near-duplicate cluster assignment over the planted-dup corpus: MinHash-
    * LSH candidates, exact-Jaccard verify at `threshold`, then connected
    * components — one row per clustered doc with its canonical (minimum)
    * doc_id and the cluster size. Docs with no ≥threshold partner are not
    * emitted (they are their own trivial cluster).
    */
  def dedupCluster(spark: SparkSession, sfDir: String,
                   threshold: Double = 0.5): DataFrame =
    clusterAssignments(TextOps.candidateJaccard(spark, sfDir)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b"))

  /** Cluster assignment rows `(doc_id, canon, cluster_sz)` for an arbitrary
    * near-dup pair graph (columns `doc_a` < `doc_b`) — the assembly stage
    * shared by the whole-corpus [[dedupCluster]] and the CDC-incremental
    * variant (CC over [[IncrementalDedup.dupPairs]]' accumulated pair log).
    */
  def clusterAssignments(pairs: DataFrame): DataFrame = {
    val stars = connectedComponents(pairs)
    val members = stars.select(col("u").as("doc_id"), col("v").as("canon"))
      .unionByName(stars.select(col("v").as("doc_id"), col("v").as("canon")).distinct())
    val sizes = members.groupBy("canon").agg(count(lit(1)).as("cluster_sz"))
    members.join(sizes, "canon")
      .select("doc_id", "canon", "cluster_sz")
      .orderBy("doc_id")
  }
}
