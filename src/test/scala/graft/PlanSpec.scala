package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the declarative operators must produce the
  * plans the 100 TB design depends on — parquet filter pushdown + column
  * pruning, broadcast joins for small dims, equi-joins (never nested-loop)
  * for LSH candidate generation, partial aggregation, whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** AQE's pre-execution string hides codegen spans; run the query so the
    * final adaptive plan (with WholeStageCodegen ids) is inspectable.
    */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("project_prune: filter pushed to parquet scan; only 3 columns read") {
    val p = plan("project_prune")
    assert(p.contains("PushedFilters:") && p.contains("LessThan(l_shipdate"),
      s"filter not pushed down:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double"),
      s"column pruning missing:\n$p")
    assert(!p.contains("l_quantity"), "reads columns the query never uses")
  }

  test("join_dim_broadcast: small dims broadcast, no shuffle join") {
    val p = plan("join_dim_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join should not sort-merge:\n$p")
  }

  test("q1_pricing_summary: partial aggregation before the shuffle + codegen") {
    val p = executedPlan("q1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"map-side partial aggregation missing:\n$p")
    // '*(n)' node prefixes are the WholeStageCodegen markers in plan strings
    assert(p.contains("WholeStageCodegen") || p.contains("*("), s"not codegen'd:\n$p")
  }

  test("dedup_minhash_lsh: band candidates come from an equi-join, not a nested loop") {
    val p = plan("dedup_minhash_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"LSH must never cross-join:\n$p")
  }

  test("dedup_simhash: block candidates equi-join, no cartesian product") {
    val p = plan("dedup_simhash")
    assert(!p.contains("CartesianProduct"), s"simhash must never cross-join:\n$p")
  }

  test("dedup_embedding: candidates from the LSH bucket equi-join, never O(n²)") {
    val p = plan("dedup_embedding")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"embedding dedup must not pair via nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join:\n$p")
  }

  test("sim_ann_ivf: centroid fan-out broadcast-bounded; candidates via cell equi-join") {
    val p = plan("sim_ann_ivf")
    // The n × nlist centroid ranking is a DELIBERATE cross join, but it must
    // be the broadcast form (corpus scan × tiny broadcast centroid set, cost
    // bounded by nlist) — never a shuffled CartesianProduct.
    assert(!p.contains("CartesianProduct"),
      s"centroid ranking must broadcast the centroid set, not cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the broadcast centroid fan-out:\n$p")
    // The probe → inverted-file candidate join keys on the cell id.
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a keyed cell equi-join:\n$p")
  }

  test("incremental dedup: batch-vs-state candidates and verify are keyed joins, no cartesian") {
    val dir = TestSpark.freshDir("plan-incdedup")
    val cfg = graft.ops.IncrementalDedup.Config(dir, numBuckets = 4)
    import spark.implicits._
    // Seed the state with one batch so batch 1 exercises the FULL path:
    // bucket-pruned state read + banded candidate join + docsigs verify join.
    graft.ops.IncrementalDedup.applyBatch(spark,
      (0L until 20L).map(i => (i, s"alpha beta gamma delta d$i")).toDF("doc_id", "text"), 0L, cfg)
    graft.ops.IncrementalDedup.applyBatch(spark,
      (20L until 40L).map(i => (i, s"alpha beta gamma delta d$i")).toDF("doc_id", "text"), 1L, cfg)
    val p = graft.ops.IncrementalDedup.survivors(spark, cfg).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"survivors read must stay narrow:\n$p")
    // The per-batch apply itself ran above; its joins are the same shapes
    // PlanSpec asserts for dedup_minhash_lsh (banded equi-join) — spot-check
    // the candidate stage in isolation:
    val bands = Seq(("b0|1", 1L), ("b0|1", 21L), ("b1|2", 5L)).toDF("bk", "doc_id")
    val cand = bands.select($"bk", $"doc_id".as("doc_a"))
      .join(bands.select($"bk", $"doc_id".as("doc_b")), "bk")
      .filter($"doc_a" < $"doc_b")
    val cp = cand.queryExecution.executedPlan.toString
    assert(!cp.contains("CartesianProduct") && !cp.contains("BroadcastNestedLoopJoin"),
      s"candidate join must be keyed:\n$cp")
  }

  test("dedup_cluster: no cartesian; cluster assembly reads the checkpointed star frontier") {
    val df = SparkEntry.queries("dedup_cluster")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cluster assembly must stay keyed:\n$p")
    // Lineage-truncation evidence: the plan must root at the checkpointed
    // star RDD, NOT re-embed the LSH pipeline + star-iteration chain (which
    // would both recompute the rounds and blow up Catalyst analysis).
    assert(p.contains("ExistingRDD"),
      s"star frontier not checkpoint-backed — iteration lineage leaked into the result plan:\n$p")
    assert(!p.contains("minhash_sig"),
      s"result plan re-embeds the LSH signature pipeline:\n$p")
    // The star step itself is the same keyed-join shape asserted for the
    // banded candidates: groupBy(min) + equi-join on the node key.
    import spark.implicits._
    val edges = Seq((5L, 1L), (7L, 1L), (9L, 5L)).toDF("u", "v")
    val mins = edges.groupBy("u").agg(org.apache.spark.sql.functions.min("v").as("m"))
    val step = edges.join(mins, "u").queryExecution.executedPlan.toString
    assert(!step.contains("CartesianProduct") && !step.contains("BroadcastNestedLoopJoin"),
      s"star step must join on the node key:\n$step")
  }

  test("seq_pack: global running sum WITHOUT a single-partition exchange") {
    val p = plan("seq_pack")
    // The naive Window.orderBy(doc_id) cumsum funnels the corpus through
    // ONE reducer; the two-phase prefix scan must never do that. (The final
    // presentation orderBy is a range exchange, not SinglePartition.)
    assert(!p.contains("Exchange SinglePartition"),
      s"global cumsum collapsed to one partition:\n$p")
    assert(p.contains("Window"), s"expected per-bucket window cumsum:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must join via broadcast:\n$p")
  }

  test("pagination_follow: every hop is an equi-join (frontier broadcast), no cartesian") {
    val p = plan("pagination_follow")
    assert(!p.contains("CartesianProduct"), s"chain walk must not cross-join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected equi-joins per hop:\n$p")
    // The seq <= maxPages prune must reach the window as a rank-limit:
    // WindowGroupLimitExec caps each chain's sort input map-side, making the
    // page-table build O(chains × maxPages) instead of O(events).
    assert(p.contains("WindowGroupLimit"),
      s"rank-limit pushdown (WindowGroupLimit) missing — page table built O(events):\n$p")
  }

  test("sim_cosine_topk: query side broadcast (small × huge corpus shape)") {
    val p = plan("sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set must be the broadcast side:\n$p")
  }

  test("curate_pipeline: one declarative plan, keyed joins only, benchmark set broadcast") {
    val p = plan("curate_pipeline")
    assert(!p.contains("CartesianProduct"), s"curation chain must never cross-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark n-gram set (MBs by definition) must broadcast:\n$p")
  }

  test("sample_stratified: a scan-level filter — no join, no aggregate, no width") {
    val p = plan("sample_stratified")
    // The md5-keyed sample is a stateless per-row predicate: at 100 TB it
    // must compose with the scan (zero shuffles besides the presentation
    // sort), never materialize per-stratum state.
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"hash sampling must be a pure filter:\n$p")
    assert(p.contains("Filter"), s"expected the scan-level rate filter:\n$p")
  }

  test("dedup_semantic: within-cell pairs via a cid equi-join, never a corpus cross-join") {
    val p = plan("dedup_semantic")
    // the centroid RANKING is a broadcast nested loop against nlist=16 rows
    // (bounded, same as sim_ann_ivf); the PAIR stage must be an equi-join
    // on the cell id — a shuffled cartesian would be the O(n²) killer.
    assert(!p.contains("CartesianProduct"), s"semantic dedup must never cross-join the corpus:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected the within-cell equi-join on cid:\n$p")
  }

  test("transcript_pack: global offsets WITHOUT a single-partition exchange") {
    val p = plan("transcript_pack")
    assert(!p.contains("Exchange SinglePartition"),
      s"transcript packing fell back to a global-order window:\n$p")
  }

  test("auth_token_chain / dns_shape: stateless codegen'd projections — no join, no aggregate") {
    // Both operators are pure per-row shaping; at 100 TB they must compose
    // with the scan (the only exchange is the presentation sort).
    for (q <- Seq("auth_token_chain", "dns_shape")) {
      val p = executedPlan(q) // AQE's pre-execution string hides codegen spans
      assert(!p.contains("Join") && !p.contains("HashAggregate"),
        s"$q must stay a pure projection:\n$p")
      assert(p.contains("WholeStageCodegen") || p.contains("*("),
        s"$q fell out of codegen:\n$p")
      assert(!p.contains("props"), s"$q reads columns it never uses:\n$p")
    }
  }

  test("ivf centroids: stratified sample via partial min_by aggregation, no sort or window") {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val p = graft.ops.VectorOps.ivfCentroids(vecs, 16)
      .queryExecution.executedPlan.toString
    // The sample must be a groupBy+min_by (map-side partials, nlist-row
    // shuffle) — never a global top-k of the corpus, and never a
    // per-stratum window sort (both shuffle the full corpus).
    assert(p.contains("partial"), s"centroid sample missing map-side partials:\n$p")
    assert(!p.contains("Window") && !p.contains("TakeOrdered"),
      s"centroid sample must not rank the corpus:\n$p")
  }

  test("agg_count_by_type: partial aggregation + single shuffle") {
    val p = plan("agg_count_by_type")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"map-side combine missing:\n$p")
  }
}
