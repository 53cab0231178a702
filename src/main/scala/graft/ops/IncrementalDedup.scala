package graft.ops

import graft.cdc.MergeApply
import graft.table.{IceLite, ParquetStats}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-batch near-duplicate dedup against STORED signature state — the
  * CDC-pipeline-native form of MinHash dedup a 100 TB ingest actually runs:
  * instead of re-deduping the whole corpus per run, each arriving batch is
  * deduped against a persistent signature store via the same banding
  * equi-join [[TextOps.dedupMinhashLsh]] uses corpus-wide, then appends its
  * own signatures for future batches. State lives in TWO icelite tables
  * (so the appends inherit idempotent epoch commits, schema handling and
  * merge-on-read exactly like the conversation table):
  *
  *  - `sigindex` — one row per (doc, band): key conv_id = "b<band>|<key>"
  *    (the banding join key — the table is hash-BUCKETED by it, so a
  *    batch-vs-state probe reads only the buckets the batch's band keys
  *    hash to), turn_idx = doc id, payload doc_id;
  *  - `docsigs` — one row per doc: key conv_id = doc id, payload the
  *    distinct hashed shingle set (for the exact-Jaccard verify of
  *    candidates, bucket-pruned by the candidate ids).
  *
  * Dedup rule: a document is DROPPED iff it has a verified near-duplicate
  * partner (exact shingle Jaccard ≥ `threshold` among LSH candidates) with
  * a SMALLER doc_id in the state or its own batch, and EVERY batch
  * document's signatures are appended — survivors and dropped alike. With
  * batches arriving in doc_id (LSN) order, every smaller id is visible at
  * decision time, so the surviving set is a pure function of the corpus —
  * independent of how the feed was split into batches
  * (IncrementalDedupPropertySpec proves this per random split; the driver's
  * DuckDB oracle recomputes it corpus-wide).
  *
  * Exactly-once: a batchId committed by BOTH state tables no-ops (each
  * table keeps its own epoch log; requiring both means a crash that lands
  * only one append is retried, not skipped), and the survivor output is
  * written to a deterministic per-batch directory with overwrite — a
  * crash-retry rewrites identical bytes instead of duplicating rows.
  *
  * Scale shape per batch: candidate generation is ONE equi-join of the
  * batch's band rows against the bucket-pruned state slice (never a scan of
  * all stored docs), the verify joins are keyed on doc id against the
  * bucket-pruned docsigs slice, and the state appends are O(batch) delta
  * writes. turn_idx carries the doc id and is int32 — one state shard
  * covers 2^31 docs; beyond that, shard the state dir by doc_id >> 31 (the
  * standard composite-key split for a fixed-width key column).
  */
object IncrementalDedup {

  /** `stateBloomFpp`: the banding probe builds a Bloom filter of the
    * batch's band keys and drops state rows that cannot match BEFORE the
    * candidate equi-join. Membership is tested for STATE keys against the
    * BATCH key set, and Bloom filters have no false negatives — a state key
    * equal to any batch key always passes — so the pruned join returns the
    * EXACT same candidate set (false positives only add rows the join
    * discards). Without it the join shuffles the whole state band slice —
    * the only per-batch cost term that grows with stored state; with it
    * the state side shrinks to matches + fpp before the exchange. Measured
    * (BenchIncDedup A/B, local[32]): at EQUAL 1M-doc batches vs 1–5M-doc
    * state the bloom build (O(batch) band keys) cancels the savings —
    * end-to-end neutral; in the STEADY STATE the knob targets (100k-doc
    * arrivals vs a 5M-doc state) the state-probe lap drops 10.3 s → 5.6 s
    * median (~1.8×), and the win grows with the state:batch ratio — at a
    * 10^10-doc state the unpruned exchange is simply unrunnable. `None`
    * disables (the pre-round-5 behavior).
    */
  case class Config(stateDir: String, numHashes: Int = 16, threshold: Double = 0.5,
                    numBuckets: Int = 32, stateBloomFpp: Option[Double] = Some(0.005),
                    bloomMinStateRows: Long = BloomMinStateRows)

  /** Manifest-row floor below which the state-probe Bloom filter is skipped:
    * the build is two jobs over the batch's band rows + a broadcast, and a
    * state slice under ~1M rows moves through the candidate exchange for
    * less than that (the BenchIncDedup A/B measured the filter neutral even
    * at a 1M:1M ratio — its win is the steady state where the slice dwarfs
    * the batch). Decided per batch from the snapshot's entry row counts —
    * no data read, deterministic, and any production-scale slice clears it.
    */
  val BloomMinStateRows = 1000000L

  private def sigIndexPath(cfg: Config) = s"${cfg.stateDir}/sigindex"
  private def docSigsPath(cfg: Config) = s"${cfg.stateDir}/docsigs"
  private def survivorsPath(cfg: Config) = s"${cfg.stateDir}/survivors"
  private def dupPairsPath(cfg: Config) = s"${cfg.stateDir}/duppairs"

  /** Dedup one `(doc_id, text)` batch against the stored state, write its
    * survivors to `survivors/batch=<id>/`, append its signatures. Batches
    * must arrive in ascending doc_id ranges (the LSN-ordered feed contract).
    * Returns the number of surviving documents (−1 for a replayed epoch).
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long, cfg: Config): Long = {
    val prof = sys.env.contains("GRAFT_PROF")
    var tLast = System.nanoTime()
    def lap(tag: String): Unit = if (prof) {
      val t = System.nanoTime()
      System.err.println(f"[prof] batch $batchId $tag%-12s ${(t - tLast) / 1e9}%6.2fs")
      tLast = t
    }
    val sigIndex = sigIndexPath(cfg)
    val docSigs = docSigsPath(cfg)
    if (!IceLite.exists(sigIndex)) IceLite.create(sigIndex, new StructType(), cfg.numBuckets)
    if (!IceLite.exists(docSigs)) IceLite.create(docSigs, new StructType(), cfg.numBuckets)
    val idxSnap = IceLite.load(sigIndex)
    // Exactly-once guard — the epoch is "replayed" only when BOTH state
    // tables committed it. The two appends run as concurrent futures, so a
    // crash can land either one alone; guarding on sigindex only would make
    // a retry skip the missing docsigs append forever, and later batches'
    // exact-Jaccard verify would silently lose those candidates. On a
    // partial replay the whole body re-runs: each table's applyChanges
    // no-ops via its own epoch log, the survivor/pair writes are
    // deterministic overwrites, and a doc whose signatures are already in
    // one state slice merely duplicates candidate/pair rows — tolerated by
    // every consumer (see [[dupPairs]]).
    if (idxSnap.hasBatch(batchId) && IceLite.load(docSigs).hasBatch(batchId))
      return -1L
    lap("snapshots")

    val sh = TextOps.shingleSetsOf(spark, batch.select("doc_id", "text")).persist()
    try {
      val sigs = sh.select(col("doc_id"),
        TextOps.minhashSignature(spark, col("sh"), cfg.numHashes).as("sig"))
      val bands = sigs.select(col("doc_id"), posexplode(col("sig")))
        .select(concat(lit("b"), col("pos"), lit("|"), col("col")).as("bk"), col("doc_id"))
        .persist()
      try {
        // ---- state band rows, bucket-pruned by the batch's band keys:
        // the collect is O(numBuckets) ints, never O(keys). Signature rows
        // are append-once immutable facts (a doc's sigs are written exactly
        // once, in its own batch), so the state slice is read RAW
        // (committed base+delta entries are key-disjoint until compaction
        // folds them) — no per-batch LWW merge-on-read shuffle of the
        // state slice, just scan + hash join.
        val stateSlice = readStateSlice(spark, sigIndex, idxSnap,
          bands.select(IceLite.bucketExprFor(idxSnap, col("bk")).as("b")))
        val stateBands = stateSlice.map { case (df, _) =>
          df.select(col("conv_id").as("bk"), col("doc_id")) }
        val stateBandRows = stateSlice.map(_._2).getOrElse(0L)
        lap("probe_bands")
        // ---- candidates: every (smaller id, batch id) pair sharing a band
        // key — state rows and the batch itself on the left, batch on the
        // right; one keyed equi-join, never all-pairs. The state side is
        // Bloom-pruned by the batch's band-key set first (see Config: no
        // false negatives ⇒ identical candidates, ~matches+fpp rows instead
        // of the whole state slice through the exchange).
        val pruned = stateBands.map { sb =>
          cfg.stateBloomFpp match {
            // Cost-based gate, decided from MANIFEST row counts (free, no
            // job): the bloom build costs one count + one aggregation over
            // the batch's band rows plus a broadcast; it pays when the state
            // slice through the exchange is large relative to that (measured
            // 1.8× at a 50:1 state:batch ratio, neutral at 1:1 — see Config
            // doc). Below the floor the two build jobs are pure overhead on
            // a slice the exchange moves in one task anyway.
            case Some(fpp) if stateBandRows >= cfg.bloomMinStateRows =>
              val bf = bands.stat.bloomFilter("bk", math.max(bands.count(), 1L), fpp)
              val bc = spark.sparkContext.broadcast(bf)
              val might = udf((s: String) => bc.value.mightContainString(s))
              sb.filter(might(col("bk")))
            case _ => sb
          }
        }
        val left = pruned.map(_.unionByName(bands)).getOrElse(bands)
        // Persisted: the docsigs bucket-id probe below is an action on this
        // frame, and the verify join consumes it again — without the barrier
        // the band equi-join runs twice per batch.
        val cands = left.select(col("bk"), col("doc_id").as("doc_a"))
          .join(bands.select(col("bk"), col("doc_id").as("doc_b")), "bk")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct().persist()
        try {
          // ---- exact-Jaccard verify; the stored side's shingle sets come
          // from docsigs, bucket-pruned by the candidate ids.
          val docSnap = IceLite.load(docSigs)
          // The sigindex append is independent of the verify chain (it
          // consumes only the persisted `bands`, and every state read here
          // is pinned to pre-batch snapshots), so it runs CONCURRENTLY with
          // the verify/survivor jobs — its commit latency hides under them
          // (guide §2.6 back-fill). The docsigs append stays AFTER the
          // survivor write: the exactly-once guard requires BOTH tables, so
          // a crash with only sigindex committed re-runs the whole batch
          // (sigindex's own epoch no-ops), while "both committed" still
          // implies the survivor dir was fully written.
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          val bandChanges = bands.select(
            lit("U").as("op"), col("doc_id").as("lsn"),
            col("bk").as("conv_id"), col("doc_id").cast(IntegerType).as("turn_idx"),
            col("doc_id"))
          val bandAppend = Future(MergeApply.applyChanges(spark, sigIndex, bandChanges, batchId))
          val stateSh = readStateSlice(spark, docSigs, docSnap,
            cands.select(IceLite.bucketExprFor(docSnap, col("doc_a").cast(StringType)).as("b")))
            .map { case (df, _) => df.select(col("doc_id"), col("sh")) }
          lap("probe_docs")
          val aSh = stateSh.map(_.unionByName(sh.select("doc_id", "sh"))).getOrElse(sh)
          val inter = size(array_intersect(col("sh_a"), col("sh_b")))
          // ---- verified near-dup PAIRS this batch discovered, written to a
          // deterministic per-batch dir (the batch-vs-state pair LOG: with
          // id-ordered batches every corpus pair is discovered exactly once,
          // in its larger member's batch, so the accumulated log equals the
          // corpus-wide verified pair set — [[dupPairs]] feeds the
          // incremental CLUSTER query, certified against the whole-corpus
          // dedup_cluster oracle). Materializing the log also runs the
          // verify join once; dropped docs and survivors derive from the
          // written files.
          val verified = cands
            .join(aSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
            .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
            .filter(inter.cast(DoubleType) / (size(col("sh_a")) + size(col("sh_b")) - inter)
              >= cfg.threshold)
            .select("doc_a", "doc_b")
          verified.write.mode(SaveMode.Overwrite)
            .parquet(s"${dupPairsPath(cfg)}/batch=$batchId")
          val dropped = spark.read.parquet(s"${dupPairsPath(cfg)}/batch=$batchId")
            .select(col("doc_b").as("doc_id")).distinct()
          val survivors = batch.select("doc_id").join(dropped, Seq("doc_id"), "left_anti")
          // Deterministic per-batch output dir + overwrite = idempotent under
          // crash-retry (re-derived from the same pinned snapshots).
          survivors.write.mode(SaveMode.Overwrite)
            .parquet(s"${survivorsPath(cfg)}/batch=$batchId")
          lap("survivors")
          // ---- docsigs append through the real MERGE path (delta append +
          // epoch commit; the epoch guard above makes the whole applyBatch
          // idempotent). Typed apply: the rows are already columnar, so no
          // JSON round-trip and no per-row inference. Runs only after the
          // survivor write so "both tables committed" keeps implying the
          // survivor dir is complete; the sigindex append has been running
          // alongside the verify chain since before the probe (see above).
          val docChanges = sh.select(
            lit("U").as("op"), col("doc_id").as("lsn"),
            col("doc_id").cast(StringType).as("conv_id"), lit(0).as("turn_idx"),
            col("doc_id"), col("sh"))
          MergeApply.applyChanges(spark, docSigs, docChanges, batchId)
          Await.result(bandAppend, Duration.Inf)
          lap("merge_state")
          // Survivor count from the just-written files' FOOTERS (exact row
          // counts, driver-side) — the read-back count job it replaces was a
          // per-batch fixed cost.
          val n = ParquetStats.dirStats(spark.sessionState.newHadoopConf(),
            s"${survivorsPath(cfg)}/batch=$batchId", "doc_id").rows
          lap("count")
          n
        } finally cands.unpersist()
      } finally bands.unpersist()
    } finally sh.unpersist()
  }

  /** Raw committed rows of the state buckets a probe frame's bucket ids
    * touch (None when the table is empty). The bucket-id collect is
    * O(numBuckets); the read opens only those buckets' files.
    */
  private def readStateSlice(spark: SparkSession, path: String,
                             snap: IceLite.Snapshot,
                             bucketIds: DataFrame): Option[(DataFrame, Long)] = {
    val entries = snap.buckets ++ snap.deltas
    if (entries.isEmpty) None
    else {
      val touched = bucketIds.distinct().collect().map(_.getInt(0)).toSet
      val hit = entries.filter(e => touched.contains(e.bucket))
      IceLite.readEntries(spark, path, snap, hit).map(df => (df, hit.map(_.rows).sum))
    }
  }

  /** Streaming form of the operator — the shape a 100 TB ingest actually
    * deploys: tail a JSONL document feed (one `{"doc_id":…,"text":…}`
    * object per line, files arriving in ascending doc_id ranges — the same
    * LSN-ordered contract as [[applyBatch]]), and dedup each micro-batch
    * against the stored state inside `foreachBatch`, checkpointed like
    * [[graft.cdc.Pipeline.replay]]. Restart resumes from the source offset
    * log, and a crash between the offset commit and the state commit is
    * absorbed by `applyBatch`'s epoch guard + deterministic overwrite dirs —
    * the streaming layer adds resume, the batch layer already carries
    * exactly-once. Epochs are `checkpoint-pinned base + batchId`
    * ([[IceLite.pinnedStreamBase]]): a fresh stream deployed over state
    * that batch [[applyBatch]] calls bootstrapped starts above their
    * committed epochs — colliding would make the guard swallow the first
    * micro-batches (and their survivor dirs would collide with the
    * bootstrap's) while the offset log advanced past the lost files.
    * The flip side of that pin: WIPING the checkpoint while keeping state
    * and feed re-processes every feed file under fresh epochs, appending a
    * second `survivors/batch=` dir per document — a redeployment that
    * means "continue" must keep the checkpoint; one that means "rebuild"
    * must clear the state dir (survivors included) with it.
    * Returns per-batch survivor counts (−1 = replayed epoch).
    */
  def stream(spark: SparkSession, feedDir: String, checkpointDir: String,
             cfg: Config, maxFilesPerTrigger: Option[Int] = None): Seq[Long] = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{StructField, StructType => ST}
    val (epochBase, _) = IceLite.pinnedStreamBase(checkpointDir,
      Seq(sigIndexPath(cfg), docSigsPath(cfg)))
    val results = scala.collection.mutable.ArrayBuffer.empty[Long]
    var reader = spark.readStream
      .schema(ST(Seq(StructField("value", StringType))))
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val q = reader.option("recursiveFileLookup", "true").text(feedDir)
      .writeStream
      .foreachBatch { (lines: DataFrame, batchId: Long) =>
        val docs = lines.select(
          get_json_object(col("value"), "$.doc_id").cast(LongType).as("doc_id"),
          get_json_object(col("value"), "$.text").as("text"))
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          // A retransmitted doc_id inside one micro-batch folds to a single
          // row (deterministically — max text on the freak disagreeing
          // retransmit) or its survivor row would be written twice.
          .groupBy("doc_id").agg(max(col("text")).as("text"))
        // The batch frame is bound to the stream's CLONED session (its
        // function registry was snapshotted at stream start) — register and
        // resolve against that session, not the outer one.
        val n = applyBatch(lines.sparkSession, docs, epochBase + batchId, cfg)
        results.synchronized { results += n }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    results.toSeq
  }

  /** All surviving documents so far: `(batch, doc_id)` with `batch` the
    * discovered partition of the per-batch survivor dirs.
    */
  def survivors(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(survivorsPath(cfg))
      .select(col("batch").cast(LongType).as("batch"), col("doc_id"))

  /** The accumulated verified near-dup pair log `(doc_a, doc_b)` — equal to
    * the corpus-wide verified pair set once all batches are applied (each
    * pair lands exactly once, in its larger member's batch). Duplicate rows
    * are tolerated by every consumer (the pair set feeds connected
    * components, where repeated edges are harmless) — which is what lets
    * [[compactPairLog]] stay crash-tolerant without a commit protocol.
    */
  def dupPairs(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(dupPairsPath(cfg)).select("doc_a", "doc_b")

  /** Fold all pair-log batch dirs ≤ `upToBatch` into the single
    * `batch=<upToBatch>` dir and delete the older ones — a long-running
    * ingest writes one small dir per batch, and without periodic folding
    * the cluster-maintenance read opens O(batches) directories.
    *
    * Two-phase and crash-tolerant: phase 1 writes the folded union to a
    * hidden staging dir (invisible to partition discovery; its `_SUCCESS`
    * marker is the completion flag), phase 2 deletes the source dirs and
    * renames staging into place. A re-run after ANY crash converges: a
    * partial staging dir (no `_SUCCESS`) is discarded and rebuilt from the
    * still-intact sources; a complete one skips the rebuild and finishes
    * the swap. The staging dir is NAMED for its `upToBatch` — a completed
    * staging left by a crashed run with a DIFFERENT target must not be
    * adopted (its fold covers a different source set; phase 2 would delete
    * batches it never folded), so a mismatched leftover is discarded and
    * rebuilt. Batches newer than `upToBatch` are untouched, so compaction
    * can run beside the NEXT applyBatch — the same append/compact
    * separation the icelite signature tables use.
    *
    * `upToBatch` must be a FULLY COMMITTED epoch (both state tables): a
    * crash-retry of a half-committed batch re-runs its deterministic
    * `batch=<id>` overwrite, which would replace a folded dir that
    * happened to land on the same id with that one batch's pairs alone.
    *
    * `outputPartitions` sizes the folded dir (default 1 suits the test
    * corpus; a 10⁹-doc log would keep it proportional to log volume).
    */
  def compactPairLog(spark: SparkSession, cfg: Config, upToBatch: Long,
                     outputPartitions: Int = 1): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dupPairsPath(cfg))
    if (!Files.exists(root)) return
    require(IceLite.exists(sigIndexPath(cfg)) &&
      IceLite.load(sigIndexPath(cfg)).hasBatch(upToBatch) &&
      IceLite.load(docSigsPath(cfg)).hasBatch(upToBatch),
      s"compactPairLog: batch $upToBatch is not fully committed — a crash-retry " +
        "of it would overwrite the folded dir with that one batch's pairs")
    def rmrf(p: Path): Unit = if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f)))
    def listOlds(): List[Path] =
      scala.util.Using.resource(Files.list(root))(_.iterator().asScala.toList)
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("batch=") &&
            scala.util.Try(n.stripPrefix("batch=").toLong).toOption.exists(_ <= upToBatch)
        }
    val staged = root.resolve(s".compact-staging-$upToBatch")
    // Stale stagings from other targets (crashed runs): WITHOUT `_SUCCESS`
    // their phase 1 never finished and the sources are intact — discard.
    // WITH `_SUCCESS` the crashed run may have died mid-phase-2, after
    // deleting some of its source dirs — the staging can then be the ONLY
    // copy of those batches' pairs, so it must be ADOPTED, not discarded:
    // its name encodes its own upToBatch, so finish its swap (delete olds
    // ≤ that target, rename into place) before starting this fold. A
    // legacy unsuffixed `.compact-staging` with `_SUCCESS` has an unknown
    // target and is left in place untouched (hidden dirs are invisible to
    // partition discovery, so it is inert) rather than risk either loss.
    scala.util.Using.resource(Files.list(root))(_.iterator().asScala.toList)
      .filter(_.getFileName.toString.startsWith(".compact-staging"))
      .filterNot(_ == staged).foreach { p =>
        val tgt = scala.util.Try(
          p.getFileName.toString.stripPrefix(".compact-staging-").toLong).toOption
        if (!Files.exists(p.resolve("_SUCCESS"))) rmrf(p)
        else tgt.foreach { t =>
          scala.util.Using.resource(Files.list(root))(_.iterator().asScala.toList)
            .filter { o =>
              val n = o.getFileName.toString
              n.startsWith("batch=") &&
                scala.util.Try(n.stripPrefix("batch=").toLong).toOption.exists(_ <= t)
            }.foreach(rmrf)
          Files.move(p, root.resolve(s"batch=$t"))
        }
      }
    if (!Files.exists(staged.resolve("_SUCCESS"))) {
      rmrf(staged) // partial staging from a crashed phase 1
      val olds = listOlds()
      if (olds.size <= 1) return // already folded (or nothing to fold)
      spark.read.parquet(olds.map(_.toString): _*).select("doc_a", "doc_b")
        .coalesce(outputPartitions)
        .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    }
    // Phase 2 — also the recovery path when phase 1 completed before a crash.
    listOlds().foreach(rmrf)
    Files.move(staged, root.resolve(s"batch=$upToBatch"))
  }
}
