package graft.ops

import graft.cdc.MergeApply
import graft.table.IceLite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained near-dup PAIR VIEW over a MUTABLE document set
  * — dedup under updates, with retraction. The append-only pipeline
  * ([[IncrementalDedup]]) accumulates a pair log that is exact for corpora
  * whose documents never change; when documents mutate (conversations
  * gaining turns, records rewritten), a maintained pair set must also
  * REVOKE pairs a change destroyed. State is three icelite tables whose own
  * LWW merge supplies the update/tombstone semantics — no append-only
  * raw-read fast path to violate:
  *
  *  - `docsigs`   key (doc_id, 0) → shingle set + band keys. Re-signing a
  *    doc upserts; a vanished doc tombstones.
  *  - `bandindex` key ("bk@doc", 0) → (bk, doc), BUCKETED by the bk prefix
  *    (icelite `bucketSep` transform) so the candidate probe prunes to the
  *    touched band keys' buckets. A re-signed doc's STALE bands are
  *    tombstoned using the band list stored in its own docsigs row (a
  *    bucket-pruned point read — never "scan the index for doc").
  *  - `pairs`     TWO oriented rows per pair — keys ("a|b", 0) and
  *    ("b|a", 0), canonical orientation flagged `fwd` — BUCKETED by the
  *    first endpoint (the `bucketSep` transform again), so the prior-pairs
  *    read below is a bucket-pruned point read like every other state
  *    access. U re-asserts, D retracts, both orientations in one commit.
  *
  * Per [[refresh]] with touched docs T: band T's new signatures, probe the
  * live band index for partners, exact-verify against live docsigs
  * (bucket-pruned by candidate ids), then diff against the PRIOR live pairs
  * involving T (bucket-pruned by T's ids) — re-found = U, missing = D. Every pair a change could
  * affect involves a T-doc and every verified candidate involves a T-doc,
  * so the diff is exactly the view delta; pair rows between untouched docs
  * are never rewritten. Exactly-once per refresh via the tables' batch
  * epochs.
  *
  * Crash-retry convergence: the three commits run SEQUENTIALLY under one
  * epoch, and a retry after a partial commit converges to the same pair
  * view as an uninterrupted run — but NOT by replaying byte-identical
  * deltas. If the crash lands after the docsigs commit, the retry reads
  * the already-updated stored rows, so `droppedBands` comes out empty and
  * the re-signed docs' STALE band rows stay live in the index. That
  * residue cannot corrupt the view: every candidate a stale band raises is
  * exact-verified against LIVE docsigs (a ghost partner has no live
  * signature and drops at the verify join; a surviving pair is correct by
  * definition), and the prior-pairs diff still emits every retraction. The
  * leak is pure probe-cost — dead index rows accumulate per crash — and is
  * reclaimed by [[rebuildIndex]], the amortized GC verb
  * (PairMaintenanceSpec drives the interleaving end-to-end).
  */
object PairMaintenance {

  /** `bandBuckets` sizes the band index separately from the other two state
    * tables: its rows are `numHashes`× more numerous and its reads prune by
    * BAND KEY (the `bucketSep` transform below), so more buckets = finer
    * probe pruning for small refreshes. Like every icelite bucket count it
    * can evolve later through `IceLite.rebucket`.
    */
  case class Config(stateDir: String, numHashes: Int = 16, threshold: Double = 0.5,
                    numBuckets: Int = 16, bandBuckets: Int = 64)

  private def docSigsPath(cfg: Config) = s"${cfg.stateDir}/docsigs"
  private def bandIdxPath(cfg: Config) = s"${cfg.stateDir}/bandindex"
  private def pairsPath(cfg: Config) = s"${cfg.stateDir}/pairs"

  /** Opt-in stderr phase timing (`GRAFT_TRACE=1`) — a refresh is many small
    * jobs and the split is invisible from the outside otherwise.
    */
  private val trace = sys.env.get("GRAFT_TRACE").contains("1")
  @inline private def timed[A](name: String)(f: => A): A =
    if (!trace) f
    else {
      val t0 = System.nanoTime(); val r = f
      val detail = r match {
        case a: MergeApply.ApplyResult =>
          s" (scan=${a.scanMs}ms write=${a.writeMs}ms compact=${a.compactMs}ms total=${a.durationMs}ms)"
        case _ => ""
      }
      System.err.println(f"[pairmaint] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs$detail")
      r
    }

  def init(cfg: Config): Unit = {
    if (!IceLite.exists(docSigsPath(cfg)))
      IceLite.create(docSigsPath(cfg), numBuckets = cfg.numBuckets)
    // The pairs table stores each pair as TWO ORIENTED rows (key "<x>|<y>"
    // for both endpoint orders, the canonical doc_a<doc_b orientation
    // flagged `fwd`), bucketed by the FIRST endpoint through the same
    // `bucketSep` prefix transform as the band index. "Prior live pairs
    // involving touched docs T" is then a bucket-pruned read of T's own
    // buckets — every pair involving a T-doc has an oriented row whose
    // bucket is that doc's — instead of a scan of the whole pair state,
    // which was the last state-proportional term in the refresh path.
    if (!IceLite.exists(pairsPath(cfg)))
      IceLite.create(pairsPath(cfg), numBuckets = cfg.numBuckets, bucketSep = Some("|"))
    // The band index BUCKETS by the band-key prefix of its composite
    // "<bk>@<doc>" row key (row identity stays per (bk, doc) — the
    // retraction algebra is untouched), so the candidate probe reads only
    // the buckets the touched band keys hash to instead of the whole live
    // index. This is the transform IncrementalDedup's sigindex gets for
    // free from integer doc ids (bare bk in conv_id, doc id in turn_idx);
    // string doc ids force the composite key, and the manifest-level
    // `bucketSep` restores the pruning.
    if (!IceLite.exists(bandIdxPath(cfg)))
      IceLite.create(bandIdxPath(cfg), numBuckets = cfg.bandBuckets, bucketSep = Some("@"))
  }

  /** Live pair set (doc_a < doc_b). On the oriented two-row layout (see
    * [[init]]) the canonical `fwd` rows alone ARE the pair set; legacy
    * single-row tables read as before.
    */
  def livePairs(spark: SparkSession, cfg: Config): DataFrame = {
    val p = pairsPath(cfg)
    val snap = IceLite.load(p)
    if (!snap.schema.fieldNames.contains("doc_a"))
      spark.emptyDataFrame.select(lit("").as("doc_a"), lit("").as("doc_b")).limit(0)
    else {
      val rows = IceLite.read(spark, p)
      (if (snap.schema.fieldNames.contains("fwd")) rows.filter(col("fwd")) else rows)
        .select("doc_a", "doc_b")
    }
  }

  private def bandRowKey(bk: Column, doc: Column): Column = concat(bk, lit("@"), doc)

  /** The band-key derivation shared by [[refresh]], the probe bench and the
    * layout specs: per-position MinHash values rendered as `b<i>|<v>` keys.
    * ONE definition — a drifted copy would silently join a disjoint key set
    * and measure (or maintain) nothing.
    */
  def bandKeys(spark: SparkSession, sh: Column, numHashes: Int): Column =
    transform(TextOps.minhashSignature(spark, sh, numHashes),
      (v, i) => concat(lit("b"), i, lit("|"), v))

  /** Index GC / recovery: re-derive the band index from LIVE docsigs and
    * reconcile — tombstone orphan rows (bands no live signature carries:
    * the residue of crash-retried refreshes, see the class doc) and assert
    * any missing ones. One O(live state) pass of two set-diffs, run
    * amortized like compaction, never per-refresh. Exactly-once via
    * `epoch`; the pair view is untouched (orphans were already harmless to
    * it — this reclaims probe cost only).
    */
  def rebuildIndex(spark: SparkSession, cfg: Config, lsn: Long, epoch: Long): Unit = {
    init(cfg)
    val docSigs = docSigsPath(cfg)
    val bandIdx = bandIdxPath(cfg)
    val dsSnap = IceLite.load(docSigs)
    if (!dsSnap.schema.fieldNames.contains("bks")) return // nothing ever signed
    val truth = IceLite.readStored(spark, docSigs, dsSnap)
      .filter(!col(IceLite.DeletedCol))
      .select(col("conv_id").as("doc_id"), explode(col("bks")).as("bk"))
      .select("bk", "doc_id")
    val biSnap = IceLite.load(bandIdx)
    val stored =
      if (!biSnap.schema.fieldNames.contains("bk"))
        truth.limit(0)
      else IceLite.readStored(spark, bandIdx, biSnap)
        .filter(!col(IceLite.DeletedCol)).select("bk", "doc_id")
    val orphans = stored.except(truth)
    val missing = truth.except(stored)
    val changes = missing.select(lit("U").as("op"), lit(lsn).as("lsn"),
        bandRowKey(col("bk"), col("doc_id")).as("conv_id"), lit(0).as("turn_idx"),
        col("bk"), col("doc_id"))
      .unionByName(orphans.select(lit("D").as("op"), lit(lsn).as("lsn"),
        bandRowKey(col("bk"), col("doc_id")).as("conv_id"), lit(0).as("turn_idx")),
        allowMissingColumns = true)
    MergeApply.applyChanges(spark, bandIdx, changes, batchId = epoch)
  }

  /** Streaming form — the deployment shape the `bucketSep`-pruned probe is
    * built for: tail a JSONL feed of document updates (one object per line:
    * `{"doc_id":…,"text":…}` upserts, `{"doc_id":…,"deleted":true}` removes;
    * optional `lsn` arbitrates multiple lines for one doc INSIDE a
    * micro-batch — across batches the micro-batch order is the arbitration,
    * exactly like the CDC pipeline's epoch-ordered feed) and run one
    * [[refresh]] per micro-batch under `foreachBatch`, checkpointed.
    * Restart resumes from the source offset log; a crash between the offset
    * commit and the state commits is absorbed by the refresh's per-table
    * epoch guards (a replayed epoch re-derives the same deltas and every
    * `applyChanges` no-ops — PairMaintenanceRecoverySpec pins the partial
    * interleavings). Epochs are `checkpoint-pinned base + batchId` (see
    * [[streamBase]]), so a fresh stream deployed OVER bootstrapped state
    * starts above every epoch the bootstrap refreshes committed instead of
    * colliding with them. Each micro-batch touches only its own docs, so
    * the steady-state cost is the measured small-refresh row of BENCH.md,
    * not the corpus.
    */
  def stream(spark: SparkSession, feedDir: String, checkpointDir: String,
             cfg: Config, maxFilesPerTrigger: Option[Int] = None): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType => ST}
    val (epochBase, lsnBase) = streamBase(checkpointDir, cfg)
    var batches = 0L
    var reader = spark.readStream
      .schema(ST(Seq(StructField("value", StringType))))
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val lineSchema = ST(Seq(StructField("doc_id", StringType),
      StructField("text", StringType), StructField("deleted", BooleanType),
      StructField("lsn", LongType)))
    val q = reader.option("recursiveFileLookup", "true").text(feedDir)
      .writeStream
      .foreachBatch { (lines: DataFrame, batchId: Long) =>
        val parsed = lines
          // ONE JSON parse per line (not one get_json_object per field —
          // the parse is the ingest term of the small-refresh steady state).
          .select(from_json(col("value"), lineSchema).as("j"))
          .select(col("j.doc_id").as("doc_id"), col("j.text").as("text"),
            coalesce(col("j.deleted"), lit(false)).as("deleted"),
            coalesce(col("j.lsn"), lit(0L)).as("l"))
          .filter(col("doc_id").isNotNull)
          // A non-delete line WITHOUT a text field is malformed, not a
          // vanish: dropping it here keeps its doc out of tIds, so a
          // truncated/schema-drifted upsert is ignored rather than silently
          // tombstoning the document.
          .filter(col("deleted") || col("text").isNotNull)
          // One state per doc per batch: the highest-lsn line wins (map-side
          // partial max_by — the same fold the table itself runs). The
          // ordering key is a TOTAL order (lsn, then delete-beats-upsert,
          // then text) so an lsn tie — e.g. a feed that omits lsn entirely —
          // resolves identically on every run and retry re-execution.
          .groupBy("doc_id")
          .agg(max_by(struct(col("text"), col("deleted")),
            struct(col("l"), col("deleted"), coalesce(col("text"), lit("")))).as("s"))
          .select(col("doc_id"), col("s.text").as("text"), col("s.deleted").as("deleted"))
          .persist()
        try {
          val docs = parsed.filter(!col("deleted") && col("text").isNotNull)
            .select("doc_id", "text")
          refresh(lines.sparkSession, cfg, docs, parsed.select("doc_id"),
            lsn = lsnBase + batchId + 1, epoch = epochBase + batchId)
        } finally parsed.unpersist()
        batches += 1
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches
  }

  /** Pin this checkpoint's (epoch, lsn) base ONCE, so `epoch = base +
    * batchId` (i) never collides with epochs the state tables committed
    * BEFORE this stream existed — a fresh stream over bootstrapped state
    * (the documented batch-`refresh`-then-`stream` pattern) must not see
    * `hasBatch` and silently drop its first micro-batches — and (ii) stays
    * REPLAY-STABLE: a restart of the same checkpoint re-reads the pinned
    * base from the file, so a replayed batchId maps to the epoch its first
    * attempt used and the per-table guards dedupe it. The lsn base is the
    * tables' LSN high-watermark for the same reason: stream lsns must sort
    * above whatever the bootstrap wrote, whatever its lsn scale was.
    * (Written tmp-then-rename next to the offset log; deleting the
    * checkpoint deletes the pin with it, and the recomputed base is again
    * above everything committed.)
    */
  private def streamBase(checkpointDir: String, cfg: Config): (Long, Long) =
    IceLite.pinnedStreamBase(checkpointDir,
      Seq(docSigsPath(cfg), bandIdxPath(cfg), pairsPath(cfg)))

  /** One maintenance round: `docs` = the CURRENT (doc_id, text) of every
    * touched document still present; `tIds` = every touched doc id
    * (present or vanished — ids in tIds but not in docs are tombstoned).
    * `lsn` must be monotone across refreshes; `epoch` keys exactly-once.
    *
    * Out-of-band batch refreshes MUST NOT run once a [[stream]] checkpoint
    * has pinned its epoch base over these state tables: a manual refresh
    * committing an epoch at or above `base + nextBatchId` would collide
    * with a future micro-batch, whose per-table `hasBatch` guard then
    * silently no-ops it while the stream's offset log advances past its
    * files. Bootstrap batch-refreshes belong BEFORE the stream's first
    * start (the pin is computed above everything committed at that point).
    */
  def refresh(spark: SparkSession, cfg: Config, docs0: DataFrame, tIds0: DataFrame,
              lsn: Long, epoch: Long): Unit = {
    init(cfg)
    val docSigs = docSigsPath(cfg)
    val bandIdx = bandIdxPath(cfg)
    val pairsT = pairsPath(cfg)
    // Persisted frames unpersist in the finally below: a mid-refresh
    // failure (commit conflict, executor error in the verify join) must
    // not leak cached blocks into the session across occRetry re-drives.
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def keep(df: DataFrame): DataFrame = { persisted += df.persist(); df }
    val docs = keep(docs0.select(col("doc_id"), col("text")))
    val tIds = keep(tIds0.select("doc_id").distinct())
    try {

      def slice(path: String, ids: DataFrame, idCol: String): DataFrame = {
        val snap = IceLite.load(path)
        val bs = ids.select(IceLite.bucketExprFor(snap, col(idCol)).as("b"))
          .distinct().collect().map(_.getInt(0)).toSet
        IceLite.readStored(spark, path, snap, buckets = Some(bs))
      }

      // New signatures + per-position band keys for the present touched docs.
      val sh = keep(TextOps.shingleSetsOf(spark, docs))
      val withBks = keep(sh.select(col("doc_id"), col("sh"),
        bandKeys(spark, col("sh"), cfg.numHashes).as("bks")))

      // ---- docsigs: stale bands from the touched docs' STORED rows
      // (bucket-pruned point reads), then upsert new rows / tombstone
      // vanished docs. An EMPTY state table (bootstrap refresh — the
      // manifest says so, no job) short-circuits the stored-bands read and
      // the except below: the two distinct-aggregates it would run over the
      // new band rows can produce nothing on an empty left side.
      val dsEmpty = { val s = IceLite.load(docSigs); (s.buckets ++ s.deltas).isEmpty }
      val stored =
        if (dsEmpty) None
        else Some(timed("slice docsigs")(slice(docSigs, tIds, "doc_id")))
      val emptyBands =
        spark.emptyDataFrame.select(lit("").as("bk"), lit("").as("doc_id")).limit(0)
      val noStoredBands = stored.forall(!_.columns.contains("bks"))
      val oldBands = stored match {
        case Some(df) if !noStoredBands => // empty state / pre-first-write schema otherwise
          df.filter(!col(IceLite.DeletedCol))
            .join(tIds.withColumnRenamed("doc_id", "conv_id"), Seq("conv_id"), "left_semi")
            .select(explode(col("bks")).as("bk"), col("conv_id").as("doc_id"))
        case _ => emptyBands
      }
      val vanished = tIds.join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
      val dsChanges = withBks.select(lit("U").as("op"), lit(lsn).as("lsn"),
          col("doc_id").as("conv_id"), lit(0).as("turn_idx"), col("sh"), col("bks"))
        .unionByName(vanished.select(lit("D").as("op"), lit(lsn).as("lsn"),
          col("doc_id").as("conv_id"), lit(0).as("turn_idx")), allowMissingColumns = true)

      // ---- bandindex: retract the bands the re-sign dropped, assert the new
      // ones. The two key sets are disjoint, so same-LSN arbitration never
      // ties.
      val newBands = withBks.select(explode(col("bks")).as("bk"), col("doc_id"))
      val droppedBands =
        if (noStoredBands) emptyBands else oldBands.except(newBands)
      val biChanges = newBands.select(lit("U").as("op"), lit(lsn).as("lsn"),
          bandRowKey(col("bk"), col("doc_id")).as("conv_id"), lit(0).as("turn_idx"),
          col("bk"), col("doc_id"))
        .unionByName(droppedBands.select(lit("D").as("op"), lit(lsn).as("lsn"),
          bandRowKey(col("bk"), col("doc_id")).as("conv_id"), lit(0).as("turn_idx")),
          allowMissingColumns = true)

      // The docsigs and bandindex commits are INDEPENDENT (biChanges derives
      // oldBands from the slice pinned ABOVE, not from the committed docsigs
      // state), so they run concurrently — one commit latency per refresh
      // instead of two. Crash semantics stay inside the documented residue
      // class: the new interleaving (bandindex committed, docsigs not) makes
      // a retry's band retractions no-op against the already-committed
      // epoch, leaving stale band rows live — exactly the probe-cost-only
      // residue the docsigs-first crash already produces (class doc;
      // PairMaintenanceRecoverySpec), reclaimed by [[rebuildIndex]]. The
      // pairs commit stays strictly AFTER both: its candidates read the
      // post-apply band index.
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val ds = Future(timed("apply docsigs")(
          MergeApply.applyChanges(spark, docSigs, dsChanges, batchId = epoch)))
        timed("apply bandindex")(
          MergeApply.applyChanges(spark, bandIdx, biChanges, batchId = epoch))
        Await.result(ds, Duration.Inf)
      }

      // ---- candidates: new bands vs the live index. The state side AFTER
      // the apply already holds the new rows, so touched×touched candidates
      // come from the same equi-join. On a `bucketSep`-transformed index
      // every partner row for a band key lives in that key's bucket, so the
      // probe reads ONLY the buckets the touched band keys hash to —
      // O(touched-bks / bandBuckets × state) instead of O(state) — and the
      // equi-join discards the co-bucketed non-touched bks. A 1k-doc
      // refresh still touches ~every bucket (measured — BENCH.md layout
      // A/B); the win is the streaming steady state of small refreshes,
      // where the scan term was the only state-proportional cost left.
      // Pre-transform state dirs load with bucketSep=None and keep the
      // full-scan probe (pruning by bare bk would be wrong under the
      // full-composite-key hash).
      val biSnap = IceLite.load(bandIdx)
      val biBuckets: Option[Set[Int]] =
        if (biSnap.bucketSep.contains("@"))
          Some(newBands.select(IceLite.bucketExpr(col("bk"), biSnap.numBuckets).as("b"))
            .distinct().collect().map(_.getInt(0)).toSet)
        else None
      val biLive = IceLite.readStored(spark, bandIdx, biSnap, buckets = biBuckets)
        .filter(!col(IceLite.DeletedCol))
        .select(col("bk"), col("doc_id"))
      val cands = biLive.select(col("bk"), col("doc_id").as("x"))
        .join(newBands.select(col("bk"), col("doc_id").as("y")), "bk")
        .filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("doc_a"),
          greatest(col("x"), col("y")).as("doc_b"))
        .distinct()
      keep(cands)

      // ---- exact verify against live docsigs, bucket-pruned by candidate ids.
      val candIds = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id"))).distinct()
      val shLive = timed("slice verify-sigs")(slice(docSigs, candIds, "doc_id"))
        .filter(!col(IceLite.DeletedCol))
        .select(col("conv_id").as("doc_id"), col("sh"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      val verified = cands
        .join(shLive.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(shLive.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .filter(inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter) >= cfg.threshold)
        .select("doc_a", "doc_b")
      keep(verified)

      // ---- pair view delta: prior live pairs involving T diffed against the
      // re-verified set — re-found = U, missing = D (the retraction). On the
      // oriented two-row layout (see [[init]]) the prior-pairs read opens
      // ONLY the touched docs' buckets — the pair-side analogue of the band
      // probe's `bucketSep` pruning; a pre-transform pairs dir (no
      // bucketSep) keeps the legacy single-row layout and its full read.
      val pSnap = IceLite.load(pairsT)
      val oriented = pSnap.bucketSep.contains("|")
      val pEmpty = (pSnap.buckets ++ pSnap.deltas).isEmpty
      val priorLive =
        if (pEmpty || !pSnap.schema.fieldNames.contains("doc_a")) verified.limit(0)
        else if (oriented)
          slice(pairsT, tIds, "doc_id")
            .filter(!col(IceLite.DeletedCol))
            // The slice is bucket-level: keep rows whose ORIENTED FIRST
            // endpoint (the one that chose the bucket) is actually touched.
            .withColumn("_e", when(col("fwd"), col("doc_a")).otherwise(col("doc_b")))
            .join(tIds.withColumnRenamed("doc_id", "_e"), Seq("_e"), "left_semi")
            .select("doc_a", "doc_b").distinct()
        else {
          val p = IceLite.readStored(spark, pairsT, pSnap)
            .filter(!col(IceLite.DeletedCol)).select("doc_a", "doc_b")
          p.join(tIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
            .unionByName(
              p.join(tIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
                .select("doc_a", "doc_b"))
            .distinct()
        }
      def pk(a: Column, b: Column) = concat(a, lit("|"), b)
      // Bootstrap short-circuit: an empty prior set can drop nothing — skip
      // the except's two distinct-aggregates over the verified side.
      val dropped = if (pEmpty) verified.limit(0) else priorLive.except(verified)
      val pChanges =
        if (oriented) {
          // Two oriented rows per pair, in ONE atomic commit — key sets of
          // the two orientations are disjoint, so arbitration never ties.
          def rows(df: DataFrame, op: String) =
            df.select(lit(op).as("op"), lit(lsn).as("lsn"),
                pk(col("doc_a"), col("doc_b")).as("conv_id"), lit(0).as("turn_idx"),
                col("doc_a"), col("doc_b"), lit(true).as("fwd"))
              .unionByName(df.select(lit(op).as("op"), lit(lsn).as("lsn"),
                pk(col("doc_b"), col("doc_a")).as("conv_id"), lit(0).as("turn_idx"),
                col("doc_a"), col("doc_b"), lit(false).as("fwd")))
          rows(verified, "U").unionByName(rows(dropped, "D"))
        } else
          verified.select(lit("U").as("op"), lit(lsn).as("lsn"),
              pk(col("doc_a"), col("doc_b")).as("conv_id"), lit(0).as("turn_idx"),
              col("doc_a"), col("doc_b"))
            .unionByName(dropped
              .select(lit("D").as("op"), lit(lsn).as("lsn"),
                pk(col("doc_a"), col("doc_b")).as("conv_id"), lit(0).as("turn_idx")),
              allowMissingColumns = true)
      timed("apply pairs")(
        MergeApply.applyChanges(spark, pairsT, pChanges, batchId = epoch))
    } finally persisted.foreach(_.unpersist())
  }
}
