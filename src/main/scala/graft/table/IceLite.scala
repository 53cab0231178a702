package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** `icelite` — a minimal from-scratch snapshot-based table format on
  * Parquet + a JSON commit log, built because this environment has no
  * Iceberg/Delta jars (SURVEY.md §7.0). It supplies exactly what the north
  * rule needs:
  *
  *  - **Atomic snapshot commits**: `meta/v%05d.json` written via temp+rename,
  *    then the `meta/_current` pointer swapped with an atomic move. Readers
  *    only ever see a fully-written snapshot.
  *  - **Idempotent epoch commits**: each snapshot carries the set of
  *    committed `batchId`s; re-applying an already-committed micro-batch is a
  *    no-op (exactly-once under foreachBatch retry — the reference precedent
  *    is NiFi's session commit semantics, `@SupportsBatching`).
  *  - **Schema evolution**: every bucket entry records the schema version it
  *    was written with; reads group buckets by schema version, read each
  *    group with its own schema, cast and `unionByName` up to the current
  *    schema (ADD COLUMN / Long→Double widening never force a table rewrite).
  *  - **Key-hash bucketing**: the table is laid out as `numBuckets` hash
  *    buckets of `conv_id` (`pmod(xxhash64(conv_id), n)`). Bucket stats
  *    (rows, min/max key) are kept in the snapshot for pruning and skew
  *    diagnostics.
  *  - **Merge-on-read deltas + deterministic compaction**: a MERGE appends
  *    per-bucket *delta* files (O(batch) work); reads LWW-merge base+deltas
  *    by max LSN; a bucket is compacted (base+deltas rewritten into a new
  *    base) only when its delta volume crosses a deterministic threshold.
  *    Per-batch cost is O(batch) amortized instead of O(table) — the
  *    property that makes the design hold at 10^10 events / 100 TB, where
  *    copy-on-write (rewrite every touched bucket every batch) would be
  *    O(table × batches).
  *  - **Time travel**: any `vN.json` can be loaded and read (golden-table
  *    checkpoint checks).
  *
  * Internal columns: `_lsn` (last-writer LSN that produced the row) and
  * `_deleted` (tombstone — deletes must out-rank late lower-LSN updates, so
  * they are retained as rows and filtered on read).
  */
object IceLite {

  val LsnCol = "_lsn"
  val DeletedCol = "_deleted"
  /** Partial-update internals ([[graft.cdc.PatchApply]] semantics): their
    * presence in a stored schema marks a PATCH table, and every generic
    * read path ([[readStored]], [[changesBetween]]) auto-selects the
    * per-column setter-LSN fold over whole-row LWW for it — a caller who
    * opens a patch table with the plain API gets the table's own merge,
    * never a silently-wrong whole-row arbitration.
    */
  val SetLsnCol = "_setlsn"
  val DelLsnCol = "_dlsn"
  val BucketCol = "_bucket"
  val KeyCols: Seq[String] = Seq("conv_id", "turn_idx")

  /** `minLsn`/`maxLsn` are the entry's LSN zone map (from the parquet
    * footers at write time, [[ParquetStats]]): the range of `_lsn` values
    * its rows span. Incremental readers ([[changesSince]]) skip every entry
    * whose `maxLsn` is at or below their cutoff without opening a file —
    * the manifest-level stats pruning Iceberg/Delta do with column bounds.
    * Entries from pre-stats snapshots default to the unknown range
    * (Long.MinValue, Long.MaxValue): never skipped, never wrong.
    */
  case class BucketEntry(dir: String, bucket: Int, rows: Long, schemaV: Int,
                         minKey: String, maxKey: String,
                         minLsn: Long = Long.MinValue, maxLsn: Long = Long.MaxValue)

  /** `buckets` = compacted base files; `deltas` = merge-on-read delta files
    * appended since each bucket's last compaction (LWW-merged with the base
    * on read, by `_lsn`).
    *
    * The committed-batch log is O(1), not O(history): `batchWatermark` means
    * every batchId ≤ it has committed, and `committedBatches` holds only the
    * out-of-order recent window above the watermark (normally empty —
    * Structured Streaming epochs are sequential, so each commit advances the
    * watermark and the window drains). At 10^10 events the snapshot stays
    * O(buckets) instead of growing one long per epoch forever.
    *
    * `maxLsn` is the table's LSN high-watermark: the highest `_lsn` any
    * committed batch applied. It is the cutoff [[changesSince]] readers use
    * (changes since snapshot vA = stored rows with `_lsn > vA.maxLsn`).
    * Pre-stats snapshots default to Long.MinValue — "everything changed",
    * the conservative reading.
    */
  case class Snapshot(version: Int, schemaV: Int, numBuckets: Int,
                      schemas: Map[Int, StructType],
                      buckets: Seq[BucketEntry],
                      committedBatches: Set[Long],
                      deltas: Seq[BucketEntry] = Nil,
                      batchWatermark: Long = -1L,
                      maxLsn: Long = Long.MinValue,
                      bucketSep: Option[String] = None) {
    /** Exactly-once check: has this epoch already committed? */
    def hasBatch(id: Long): Boolean = id <= batchWatermark || committedBatches.contains(id)
    /** Record an epoch: add to the window, then advance the watermark over
      * any now-contiguous prefix and prune the window below it.
      */
    def withBatch(id: Long): Snapshot = {
      var recent = if (id > batchWatermark) committedBatches + id else committedBatches
      var wm = batchWatermark
      while (recent.contains(wm + 1)) { wm += 1; recent -= wm }
      copy(committedBatches = recent.filter(_ > wm), batchWatermark = wm)
    }
    def schema: StructType = schemas(schemaV)
    /** Payload fields = stored schema minus keys and internal columns
      * (the LWW pair AND the patch-merge internals — user-visible columns
      * only, whichever merge semantics the table runs).
      */
    def payloadSchema: StructType =
      StructType(schema.fields.filterNot(f =>
        KeyCols.contains(f.name) || f.name == LsnCol || f.name == DeletedCol ||
          f.name == SetLsnCol || f.name == DelLsnCol))
  }

  private val mapper = new ObjectMapper()

  /** Hash bucket of a key column. The hash FUNCTION is fixed forever (bucket
    * pruning depends on it); the bucket COUNT is per-snapshot state and can
    * evolve through [[rebucket]] — every reader/writer derives buckets from
    * the `numBuckets` stamped in the snapshot it loaded, so a count change
    * is just another atomically-committed version.
    */
  def bucketExpr(convId: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(convId), lit(numBuckets.toLong)).cast(IntegerType)

  /** The column the table BUCKETS by — `conv_id` itself, or (when the
    * snapshot carries a `bucketSep` transform, fixed at [[create]] like the
    * hash function) its prefix before the first separator. Row identity is
    * always the full `(conv_id, turn_idx)` key; the transform only changes
    * which rows co-locate, so a table whose composite keys share a prefix
    * (the band index's `"<bk>@<doc>"`) can be bucket-pruned by that prefix
    * — Iceberg's partition-transform idea (`bucket(N, expr)`) reduced to the
    * one expr shape the engine's state tables need.
    */
  def bucketKeyExpr(snap: Snapshot, convId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    snap.bucketSep.map(s => substring_index(convId, s, 1)).getOrElse(convId)

  /** Row → bucket under the snapshot's own transform + count. Every writer
    * and every pruning reader must derive buckets through this (a row routed
    * under the wrong transform would be invisible to pruned reads forever).
    */
  def bucketExprFor(snap: Snapshot, convId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bucketExpr(bucketKeyExpr(snap, convId), snap.numBuckets)

  /** Key fields are non-nullable by construction. */
  def keySchema: Seq[StructField] =
    Seq(StructField("conv_id", StringType, nullable = false),
        StructField("turn_idx", IntegerType, nullable = false))

  def fullSchema(payload: StructType): StructType =
    StructType(keySchema ++ payload.fields :+
      StructField(LsnCol, LongType, nullable = false) :+
      StructField(DeletedCol, BooleanType, nullable = false))

  // ---------------------------------------------------------------- create

  def create(path: String, payload: StructType = new StructType(), numBuckets: Int = 64,
             bucketSep: Option[String] = None): Snapshot = {
    // Creating over a live table would swing _current back to an empty v0
    // WITHOUT the commit path's CAS/lock/token fences — a one-call
    // lost-update that orphans every committed snapshot. Fail loudly; a
    // caller that wants a clean slate deletes the directory first.
    require(!exists(path),
      s"$path already holds an icelite table — create would orphan its committed state")
    val metaDir = Paths.get(path, "meta")
    Files.createDirectories(metaDir)
    Files.createDirectories(Paths.get(path, "data"))
    val snap = Snapshot(0, 1, numBuckets, Map(1 -> fullSchema(payload)), Nil, Set.empty,
      bucketSep = bucketSep)
    writeSnapshot(path, snap)
    snap
  }

  def exists(path: String): Boolean = Files.exists(Paths.get(path, "meta", "_current"))

  /** Epoch/LSN base for a checkpointed streaming deployment whose
    * micro-batch epochs derive from `foreachBatch` batch ids: epochs must
    * be `base + batchId`, with `base` pinned ONCE per checkpoint. Pinning
    * gives the two properties the per-table exactly-once guards need:
    * a FRESH checkpoint over already-committed tables (batch-bootstrapped
    * state, a redeployment after a checkpoint wipe) starts ABOVE every
    * committed epoch instead of colliding with them — `hasBatch` would
    * otherwise silently swallow the first micro-batches while the offset
    * log advanced past their files — and a RESTART of the same checkpoint
    * re-reads the pinned file, so a replayed batchId maps to the epoch its
    * first attempt used and the guards dedupe it.
    *
    * Returns `(epochBase, lsnBase)`; `lsnBase` is the tables' LSN
    * high-watermark (floored at 0) for callers that also derive write lsns
    * from batch ids — those lsns must sort above whatever the bootstrap
    * wrote, whatever its lsn scale was. The pin is written tmp-then-rename
    * next to the offset log and dies with the checkpoint.
    */
  def pinnedStreamBase(checkpointDir: String, tables: Seq[String]): (Long, Long) = {
    val f = new java.io.File(checkpointDir, "graft-epoch-base")
    if (f.exists) {
      val Array(e, l) = new String(Files.readAllBytes(f.toPath), "UTF-8").trim.split(" ")
      (e.toLong, l.toLong)
    } else {
      val snaps = tables.filter(exists).map(load)
      val eBase = (snaps.map(s => math.max(s.batchWatermark,
        if (s.committedBatches.isEmpty) -1L else s.committedBatches.max)) :+ -1L).max + 1
      val lBase = math.max(0L, (snaps.map(_.maxLsn) :+ Long.MinValue).max)
      Files.createDirectories(f.toPath.getParent)
      val tmp = f.toPath.resolveSibling("graft-epoch-base.tmp")
      Files.write(tmp, s"$eBase $lBase".getBytes("UTF-8"))
      Files.move(tmp, f.toPath, StandardCopyOption.ATOMIC_MOVE)
      (eBase, lBase)
    }
  }

  // ------------------------------------------------------------------ load

  def load(path: String): Snapshot = {
    val cur = new String(Files.readAllBytes(Paths.get(path, "meta", "_current")), "UTF-8").trim
    loadVersion(path, cur)
  }

  /** Time travel: load a specific snapshot file (e.g. "v00002.json"). */
  def loadVersion(path: String, metaFile: String): Snapshot = {
    val root = mapper.readTree(Files.readAllBytes(Paths.get(path, "meta", metaFile)))
    val schemas = root.get("schemas").fields().asScala.map { e =>
      e.getKey.toInt -> DataType.fromJson(e.getValue.asText()).asInstanceOf[StructType]
    }.toMap
    def entry(b: com.fasterxml.jackson.databind.JsonNode): BucketEntry =
      BucketEntry(b.get("dir").asText(), b.get("bucket").asInt(), b.get("rows").asLong(),
        b.get("schemaV").asInt(), b.get("minKey").asText(), b.get("maxKey").asText(),
        if (b.has("minLsn")) b.get("minLsn").asLong() else Long.MinValue,
        if (b.has("maxLsn")) b.get("maxLsn").asLong() else Long.MaxValue)
    val buckets = root.get("buckets").elements().asScala.map(entry).toSeq
    val committed = root.get("committedBatches").elements().asScala.map(_.asLong()).toSet
    val watermark = if (root.has("batchWatermark")) root.get("batchWatermark").asLong() else -1L
    val deltas =
      if (root.has("deltas")) root.get("deltas").elements().asScala.map(entry).toSeq
      else Nil
    val tableMaxLsn = if (root.has("maxLsn")) root.get("maxLsn").asLong() else Long.MinValue
    val sep = if (root.has("bucketSep")) Some(root.get("bucketSep").asText()) else None
    Snapshot(root.get("version").asInt(), root.get("schemaV").asInt(),
      root.get("numBuckets").asInt(), schemas, buckets, committed, deltas, watermark,
      tableMaxLsn, sep)
  }

  // ---------------------------------------------------------------- commit

  /** Commit with optimistic concurrency: the table is single-writer (one
    * streaming driver), and this guard turns an accidental second writer
    * into a loud failure instead of silent lost updates. Four fences:
    *
    *  0. the whole claim → swing → verify sequence runs under an exclusive
    *     `meta/_commit.lock` FileChannel lock (plus a JVM-level monitor —
    *     `FileChannel.lock` throws rather than blocks on same-JVM overlap),
    *     so on any filesystem with working advisory locks, claim and swing
    *     are MUTUALLY EXCLUSIVE and the reclaim TOCTOU below cannot
    *     interleave at all;
    *  1. `_current` must still point at the snapshot the writer loaded;
    *  2. the version file is claimed with a no-replace rename (the
    *     filesystem-level CAS, Iceberg's commit rule);
    *  3. each attempt stamps a unique `writerToken` into the snapshot JSON
    *     and, AFTER swinging `_current`, re-reads the version file to check
    *     the token is its own — the loser of any claim/reclaim race throws
    *     instead of reporting a commit that never became visible.
    *
    * Fence 3 matters on filesystems where advisory locks are unreliable
    * (NFS, object-store gateways): there it NARROWS the reclaim race window
    * to the gap between the competitor's swing and its verify — writer A
    * claims `vNNNNN.json`; before A swings the pointer, writer B hits
    * FileAlreadyExists, sees `_current` still at the previous version (a
    * claimed-but-unswung file is indistinguishable from a crash orphan), and
    * reclaims with a replacing move. Both then swing the (same-named)
    * pointer; the file holds one writer's token, so that writer's verify
    * passes and the other throws conflict. Without fence 0 this is not a
    * strict exactly-one-winner guarantee (both moves can land before either
    * verify reads); with fence 0 the interleaving is impossible.
    *
    * Crash recovery: a retry after a crash between the version file write
    * and the `_current` swing finds the stale `vNNNNN.json` with `_current`
    * still at the previous version, and reclaims it through the same path
    * (the commit point is the pointer swing, so the stale file was never
    * committed; with no live competitor the token verify trivially passes).
    * A crash while holding `_commit.lock` releases it with the process.
    */
  def commitSnapshot(path: String, snap: Snapshot): Unit =
    withCommitLock(path)(metaDir => commitLocked(path, metaDir, snap))

  /** Run `body` holding the table's exclusive commit lock (same-JVM monitor
    * + `meta/_commit.lock` FileChannel lock — see [[commitSnapshot]] fences).
    * Ref updates ([[beginStage]]/[[publish]]) share it with commits so a ref
    * swing never interleaves a claim→swing→verify sequence.
    */
  private def withCommitLock[A](path: String)(body: Path => A): A = {
    val metaDir = Paths.get(path, "meta")
    val monitor = commitMonitors.computeIfAbsent(
      metaDir.toAbsolutePath.toString, _ => new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(metaDir.resolve("_commit.lock"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
      try {
        val flock = ch.lock()
        try body(metaDir)
        finally flock.release()
      } finally ch.close()
    }
  }

  /** Same-JVM writers must serialize BEFORE FileChannel.lock (which throws
    * OverlappingFileLockException on same-JVM overlap instead of waiting).
    */
  private val commitMonitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def commitLocked(path: String, metaDir: Path, snap: Snapshot): Unit = {
    def currentNow(): String =
      new String(Files.readAllBytes(metaDir.resolve("_current")), "UTF-8").trim
    val expected = f"v${snap.version - 1}%05d.json"
    def conflict(cur: String) = new java.util.ConcurrentModificationException(
      s"icelite commit conflict at $path: _current=$cur, expected $expected " +
        "(another writer committed since this batch loaded the snapshot)")
    if (currentNow() != expected) throw conflict(currentNow())

    val token = java.util.UUID.randomUUID().toString
    val name = f"v${snap.version}%05d.json"
    val tmp = metaDir.resolve(name + ".tmp")
    Files.write(tmp, snapshotBytes(snap, token))
    try Files.move(tmp, metaDir.resolve(name)) // no REPLACE: claims the version
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val cur2 = currentNow()
        // Pointer already moved → a competitor completed its commit.
        if (cur2 != expected) { Files.deleteIfExists(tmp); throw conflict(cur2) }
        // Pointer still at the previous version: crash orphan OR a live
        // competitor between claim and swing — can't tell here; reclaim and
        // let the post-swing token verify pick the single winner.
        Files.move(tmp, metaDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
    swingCurrent(metaDir, name)
    val committedToken =
      try {
        val n = mapper.readTree(Files.readAllBytes(metaDir.resolve(name)))
        if (n.has("writerToken")) n.get("writerToken").asText() else ""
      } catch { case _: Exception => "" }
    if (committedToken != token) throw new java.util.ConcurrentModificationException(
      s"icelite commit conflict at $path: lost the claim race for $name " +
        "(a concurrent writer reclaimed the version file; this commit never became visible)")
    // WAP ref maintenance (still under the commit lock): once a table has a
    // `_published` ref, every NON-staged commit fast-forwards it alongside
    // `_current`; while `_staging` exists the ref stays pinned, so published
    // readers keep snapshot isolation from the unaudited head. Tables that
    // never staged have no ref file and pay zero extra I/O here.
    if (Files.exists(metaDir.resolve(PublishedRef)) &&
        !Files.exists(metaDir.resolve(StagingMarker)))
      swingRef(metaDir, name)
  }

  /** Write snapshot JSON atomically and swing the `_current` pointer.
    * The atomic move is the commit point — a crash before it leaves the
    * previous snapshot intact and the batch uncommitted (it will be
    * replayed idempotently). Use [[commitSnapshot]] for guarded commits.
    */
  def writeSnapshot(path: String, snap: Snapshot): Unit = {
    val metaDir = Paths.get(path, "meta")
    val name = f"v${snap.version}%05d.json"
    val tmp = metaDir.resolve(name + ".tmp")
    Files.write(tmp, snapshotBytes(snap, ""))
    Files.move(tmp, metaDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    swingCurrent(metaDir, name)
  }

  private def swingCurrent(metaDir: Path, name: String): Unit = {
    val curTmp = metaDir.resolve("_current.tmp")
    Files.write(curTmp, name.getBytes("UTF-8"))
    Files.move(curTmp, metaDir.resolve("_current"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def snapshotBytes(snap: Snapshot, writerToken: String): Array[Byte] = {
    val root: ObjectNode = mapper.createObjectNode()
    if (writerToken.nonEmpty) root.put("writerToken", writerToken)
    root.put("version", snap.version)
    root.put("schemaV", snap.schemaV)
    root.put("numBuckets", snap.numBuckets)
    val sn = root.putObject("schemas")
    snap.schemas.toSeq.sortBy(_._1).foreach { case (v, s) => sn.put(v.toString, s.json) }
    def putEntries(field: String, entries: Seq[BucketEntry]): Unit = {
      val bn: ArrayNode = root.putArray(field)
      entries.sortBy(e => (e.bucket, e.dir)).foreach { b =>
        val o = bn.addObject()
        o.put("dir", b.dir); o.put("bucket", b.bucket); o.put("rows", b.rows)
        o.put("schemaV", b.schemaV); o.put("minKey", b.minKey); o.put("maxKey", b.maxKey)
        // The unknown range is elided, not serialized: a round-trip of a
        // pre-stats entry stays pre-stats instead of pinning sentinels.
        if (b.minLsn != Long.MinValue || b.maxLsn != Long.MaxValue) {
          o.put("minLsn", b.minLsn); o.put("maxLsn", b.maxLsn)
        }
      }
    }
    putEntries("buckets", snap.buckets)
    putEntries("deltas", snap.deltas)
    root.put("batchWatermark", snap.batchWatermark)
    if (snap.maxLsn != Long.MinValue) root.put("maxLsn", snap.maxLsn)
    snap.bucketSep.foreach(s => root.put("bucketSep", s))
    val cn = root.putArray("committedBatches")
    snap.committedBatches.toSeq.sorted.foreach(cn.add)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
  }

  // ---------------------------------------------------------------- vacuum

  /** Expire data directories referenced only by snapshots older than the
    * last `keepVersions` (Iceberg's expire_snapshots analogue): deletes any
    * top-level `data/vNNNNN-*` dir not referenced by a retained snapshot.
    * Metadata JSONs are kept (they are tiny and hold the committed-batch
    * log); time travel to an expired version will fail on data read, as in
    * any lakehouse after snapshot expiry. Returns the deleted dir names.
    *
    * Safe against an in-flight writer: dirs whose encoded version is GREATER
    * than the current snapshot's belong to an uncommitted (in-flight or
    * crashed) future commit — they are skipped, never deleted. Data dirs are
    * attempt-unique (`v<N>-<kind>-<token>`), so an unreferenced dir at
    * version ≤ current is PROVABLY dead: its attempt targeted a version some
    * other commit already took, so its own commit CAS can never succeed —
    * deleting it (even mid-write) only fails a write job that was doomed to
    * throw commit-conflict anyway (MergeApply.occRetry absorbs both forms).
    * Unparseable dir names are also left alone.
    */
  def vacuum(path: String, keepVersions: Int = 1): Seq[String] = {
    val cur = load(path)
    // The published ref must stay readable however far the staged head has
    // run ahead of it — retain its snapshot alongside the newest-K window.
    val keep = ((math.max(0, cur.version - keepVersions + 1) to cur.version)
      :+ publishedVersion(path)).distinct
    val retained = keep.flatMap { v =>
      try Some(loadVersion(path, f"v$v%05d.json")) catch { case _: Exception => None }
    }
    val referenced: Set[String] = retained.flatMap(s =>
      (s.buckets ++ s.deltas).map(_.dir.split("/").take(2).mkString("/"))).toSet
    val dataDir = Paths.get(path, "data")
    if (!Files.exists(dataDir)) return Nil
    val verRe = "^v(\\d+)".r
    // Directory streams are closed eagerly (Using): with auto-vacuum running
    // every few commits over a long tail, a leaked stream per vacuum would
    // accumulate file descriptors for the process lifetime.
    val victims = scala.util.Using.resource(Files.list(dataDir)) { ls =>
      ls.iterator().asScala
        .filter { p =>
          val name = p.getFileName.toString
          val ver = verRe.findFirstMatchIn(name).map(_.group(1).toInt)
          !referenced.contains(s"data/$name") && ver.exists(_ <= cur.version)
        }
        .toSeq
    }
    victims.foreach { p =>
      scala.util.Using.resource(Files.walk(p)) { w =>
        // sorted() drains the walk before the first delete, so deleting
        // during forEach never races the traversal.
        w.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      }
    }
    victims.map(_.getFileName.toString).sorted
  }

  // -------------------------------------------------------------- rebucket

  /** Bucket-count evolution: at 100 TB a table outgrows the bucket count it
    * was created with (per-bucket file sizes and compaction units balloon).
    * This is the deterministic full-compaction form of Iceberg's
    * partition-spec evolution: the stored state (LWW-merged, tombstones
    * retained) is rewritten once under the new bucket function and committed
    * as a single atomic snapshot stamping the new `numBuckets`; `deltas`
    * drain into the rewrite. Readers of older snapshots keep their own
    * stamped count (snapshot isolation — a concurrent reader of vN never
    * mixes the two bucket layouts), and every subsequent MERGE batch buckets
    * by the count in the snapshot it loads, so the switch needs no
    * coordination beyond the commit itself.
    *
    * Cost: O(table) once per rebucket. On a doubling schedule that is
    * O(log growth) rebuckets over a table's lifetime — the same amortized
    * shape as compaction, and each rewrite parallelizes per NEW bucket
    * (`salt` tasks per bucket when large, like compaction's salted rewrite).
    */
  /** Roll the table back to snapshot `toVersion` — point-in-time recovery
    * from a bad batch or bad deploy. Like Iceberg's rollback this never
    * rewrites history: it commits a NEW snapshot whose content (entries,
    * schema versions, epoch watermark, LSN high-watermark) is `toVersion`'s,
    * through the same locked CAS commit as any write, so concurrent-writer
    * protection and the version chain stay intact and [[readAt]] still sees
    * the rolled-over versions (until [[vacuum]] expires them). Because the
    * exactly-once epoch watermark rolls back WITH the data, re-replaying the
    * feed re-applies exactly the rolled-back epochs (pre-rollback epochs
    * no-op via the guard; re-applied ones write fresh version-named dirs,
    * never touching files older snapshots reference) and converges to
    * bit-identical state — the replay-from-any-checkpoint contract as an
    * operator-driven recovery verb.
    *
    * DOWNSTREAM incremental consumers ([[changesSince]] /
    * [[IceLiteSource]]) whose cursor sits ABOVE `toVersion` must reset and
    * re-read: their watermark window cannot express rows that moved
    * backward (the standard CDC-reader-vs-table-restore rule).
    * [[changesBetween]] fails loudly while the watermark regression is
    * visible; once the corrected feed re-advances the watermark past the
    * old cursor the divergence is undetectable from LSNs alone.
    */
  def rollback(path: String, toVersion: Int): Snapshot = {
    val cur = load(path)
    require(toVersion >= 0 && toVersion <= cur.version,
      s"rollback target v$toVersion out of range (current v${cur.version})")
    val target = loadVersion(path, f"v$toVersion%05d.json")
    val next = target.copy(version = cur.version + 1)
    commitSnapshot(path, next)
    next
  }

  // -------------------------------------------- write-audit-publish (refs)

  private val PublishedRef = "_published"
  private val StagingMarker = "_staging"

  private def currentName(metaDir: Path): String =
    new String(Files.readAllBytes(metaDir.resolve("_current")), "UTF-8").trim

  private def swingRef(metaDir: Path, name: String): Unit = {
    val tmp = metaDir.resolve(PublishedRef + ".tmp")
    Files.write(tmp, name.getBytes("UTF-8"))
    Files.move(tmp, metaDir.resolve(PublishedRef),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The version consumer reads resolve to: the `_published` ref when the
    * table has one (WAP mode has been used), else the head — so a table that
    * never staged behaves exactly as before the ref existed.
    */
  def publishedVersion(path: String): Int = {
    val metaDir = Paths.get(path, "meta")
    val f = metaDir.resolve(PublishedRef)
    val name = if (Files.exists(f)) new String(Files.readAllBytes(f), "UTF-8").trim
               else currentName(metaDir)
    name.stripPrefix("v").stripSuffix(".json").toInt
  }

  def loadPublished(path: String): Snapshot =
    loadVersion(path, f"v${publishedVersion(path)}%05d.json")

  def isStaging(path: String): Boolean =
    Files.exists(Paths.get(path, "meta", StagingMarker))

  /** Begin a write-audit-publish window (Iceberg WAP / Delta shallow-clone
    * staging analogue): pin the `_published` ref at the current head and
    * raise the `_staging` marker. Subsequent commits advance the head as
    * usual — same chain, same CAS, exactly-once watermark intact — but
    * consumer reads ([[read]], [[changesSince]]) stay at the pinned ref, so
    * unaudited data is invisible until [[publish]]. Audit queries read the
    * head explicitly ([[load]] + [[readSnapshot]], or [[Audit]]'s staged-
    * delta pass). Idempotent: re-entering an open window is a no-op.
    * Returns the pinned (published) version.
    */
  def beginStage(path: String): Int = withCommitLock(path) { metaDir =>
    if (!Files.exists(metaDir.resolve(PublishedRef)))
      swingRef(metaDir, currentName(metaDir))
    val m = metaDir.resolve(StagingMarker)
    if (!Files.exists(m)) Files.write(m, Array.emptyByteArray)
    publishedVersion(path)
  }

  /** Publish the staged head: fast-forward `_published` to `_current` and
    * close the staging window. Atomic from a reader's view — the ref swing
    * is one atomic move, and every snapshot it can point at is fully
    * committed. Also the no-staging no-op ("publish what's already live").
    */
  def publish(path: String): Snapshot = withCommitLock(path) { metaDir =>
    swingRef(metaDir, currentName(metaDir))
    Files.deleteIfExists(metaDir.resolve(StagingMarker))
    load(path)
  }

  /** Abort the staging window: the head is [[rollback]]ed to the published
    * snapshot's content (a NEW commit — history preserved, staged versions
    * stay inspectable until vacuum) and the window closes with `_published`
    * fast-forwarded to that restoring commit. Because rollback restores the
    * epoch watermark too, a corrected feed replays the aborted epochs from a
    * fresh checkpoint exactly as in [[rollback]]'s recovery contract.
    */
  def abortStage(path: String): Snapshot = {
    val pinned = publishedVersion(path)
    rollback(path, pinned) // staged window still open → ref stays pinned
    publish(path)
  }

  def rebucket(spark: SparkSession, path: String, newNumBuckets: Int): Snapshot = {
    require(newNumBuckets > 0, s"newNumBuckets must be positive, got $newNumBuckets")
    val snap = load(path)
    val newVersion = snap.version + 1
    // Attempt-unique dir (see MergeApply.reduceAndCommit): a rebucket racing
    // a live ingest writer toward the same version must not share its path;
    // the CAS loser's dir becomes an unreferenced orphan vacuum reclaims.
    val baseDir = f"data/v$newVersion%05d-rebucket-${java.util.UUID.randomUUID().toString.take(8)}"
    val stored = readStored(spark, path, snap)
      .withColumn(BucketCol, bucketExpr(bucketKeyExpr(snap, col("conv_id")), newNumBuckets))
    val rowsIn = (snap.buckets ++ snap.deltas).map(_.rows).sum
    val salt = math.max(1L, math.min(16L, rowsIn / 2000000L)).toInt
    stored.repartition(col(BucketCol), pmod(xxhash64(col("conv_id")), lit(salt)))
      .sortWithinPartitions("conv_id", "turn_idx")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(s"$path/$baseDir")
    val hconf = spark.sessionState.newHadoopConf()
    val entries = ParquetStats.bucketDirStats(hconf, s"$path/$baseDir", "conv_id").toSeq
      .map { case (b, st) =>
        BucketEntry(s"$baseDir/$BucketCol=$b", b, st.rows, snap.schemaV, st.minKey, st.maxKey,
          st.minLsn, st.maxLsn)
      }
    val newSnap = snap.copy(version = newVersion, numBuckets = newNumBuckets,
      buckets = entries, deltas = Nil)
    commitSnapshot(path, newSnap)
    newSnap
  }

  // ------------------------------------------------------------------ read

  /** Read the stored state (internal columns included) of the given buckets,
    * presented under the snapshot's current schema: last-writer-wins merge by
    * `_lsn` of each bucket's base + delta files (merge-on-read). Buckets with
    * no deltas skip the merge shuffle entirely — after compaction the common
    * case is a plain pruned parquet scan. Files written under older schema
    * versions are read with their own schema and cast up — missing columns
    * become nulls, widened columns are cast.
    */
  def readStored(spark: SparkSession, path: String, snap: Snapshot,
                 buckets: Option[Set[Int]] = None,
                 reduce: DataFrame => DataFrame = null): DataFrame = {
    // Default reducer = whatever the table's own schema calls for (LWW, or
    // the patch fold on a partial-update table) — an explicit reducer
    // always wins.
    val doReduce = Option(reduce).getOrElse(reduceFor(snap))
    def pick(es: Seq[BucketEntry]) =
      buckets.map(bs => es.filter(e => bs.contains(e.bucket))).getOrElse(es)
    val bases = pick(snap.buckets)
    val deltas = pick(snap.deltas)
    val target = snap.schema
    val dirtyBuckets = deltas.map(_.bucket).toSet
    val clean = readEntries(spark, path, snap, bases.filterNot(e => dirtyBuckets.contains(e.bucket)))
    val dirtyIn = bases.filter(e => dirtyBuckets.contains(e.bucket)) ++ deltas
    val dirty = readEntries(spark, path, snap, dirtyIn).map(doReduce)
    (clean, dirty) match {
      case (Some(c), Some(d)) => c.unionByName(d)
      case (Some(c), None) => c
      case (None, Some(d)) => d
      case (None, None) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
    }
  }

  /** Raw union of the given entries' files, aligned to the current schema
    * (no LWW merge — callers that need merged state use [[readStored]]).
    */
  private[graft] def readEntries(spark: SparkSession, path: String, snap: Snapshot,
                                 entries: Seq[BucketEntry]): Option[DataFrame] = {
    if (entries.isEmpty) None
    else Some(entries.groupBy(_.schemaV).map { case (v, es) =>
      val s = snap.schemas(v)
      val df = spark.read.schema(s).parquet(es.map(e => s"$path/${e.dir}"): _*)
      alignTo(df, snap.schema)
    }.reduce(_.unionByName(_)))
  }

  /** Last-writer-wins by `_lsn`: one row per (conv_id, turn_idx), the one
    * with the highest LSN. `max_by` hash-aggregates with map-side partial
    * aggregation, so a hot key collapses before the shuffle (skew-safe).
    *
    * The ordering key is a TOTAL order — `(_lsn, _deleted,
    * orderable payload)` — not `_lsn` alone: an equal-LSN tie (a malformed
    * producer, or a retry re-executing a batch under different partition
    * scheduling) must resolve identically on every run or replay does not
    * converge to bit-identical state. At equal LSN a delete beats an
    * upsert (the same documented rule as the ops-layer feed folds);
    * struct comparison short-circuits on `_lsn`, so the common unique-LSN
    * case pays one long compare. Map-typed payload columns are not
    * orderable in Spark and stay out of the key (rows tying on everything
    * else and differing only in a map remain arbitrary — no in-repo
    * payload has one).
    */
  private[graft] def lwwReduce(df: DataFrame): DataFrame = {
    val others = df.schema.fieldNames.filterNot(KeyCols.contains).toSeq
    val ord = Seq(col(LsnCol), col(DeletedCol)) ++
      df.schema.fields.filter(f => !KeyCols.contains(f.name) && f.name != LsnCol &&
        f.name != DeletedCol && orderableType(f.dataType)).map(f => col(f.name))
    df.groupBy(KeyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), struct(ord: _*)).as("_w"))
      .select(KeyCols.map(col) ++ others.map(n => col("_w").getField(n).as(n)): _*)
  }

  /** Types Spark can order (struct comparison rejects maps). */
  private def orderableType(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => orderableType(f.dataType))
    case a: ArrayType => orderableType(a.elementType)
    case _ => true
  }

  private[graft] def isPatchSchema(s: StructType): Boolean =
    s.fieldNames.contains(SetLsnCol)

  /** The partial-update fold (PatchApply semantics — see that object's
    * scaladoc for the design): per key one `groupBy`, per column the
    * `max_by((value, setterLsn), setterLsn)` winner gated by the wipe
    * boundary `_dlsn`; same shuffle shape and skew behavior as
    * [[lwwReduce]]. Payload columns derive from the frame's own schema, so
    * the one fold serves batch reduce, compaction merge and merge-on-read.
    */
  private[graft] def patchReduce(df: DataFrame): DataFrame = {
    val payload = df.schema.fieldNames.filterNot(n =>
      KeyCols.contains(n) || n == LsnCol || n == DeletedCol ||
        n == SetLsnCol || n == DelLsnCol).toSeq
    def setLsn(c: String): org.apache.spark.sql.Column =
      element_at(col(SetLsnCol), lit(c))
    // Same total-order rule as [[lwwReduce]]: ties on the lsn resolve by
    // value (and delete-beats-upsert for liveness), never by partition
    // scheduling. A row that never set column c gets a null-lsn ordering
    // field — nulls sort lowest, and the `> _dl` gate in the projection
    // nulls a null-lsn winner anyway, so the unset case is unchanged.
    val aggs =
      max(col(DelLsnCol)).as("_dl") +:
        max(col(LsnCol)).as("_l") +:
        max_by(col(DeletedCol), struct(col(LsnCol), col(DeletedCol))).as("_del") +:
        payload.map { c =>
          val ord =
            if (orderableType(df.schema(c).dataType)) struct(setLsn(c), col(c))
            else struct(setLsn(c))
          max_by(struct(col(c).as("v"), setLsn(c).as("l")), ord).as(s"_w_$c")
        }
    val entries = array(payload.map(c =>
      struct(lit(c).as("key"), col(s"_w_$c").getField("l").as("value"))): _*)
    df.groupBy(KeyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(
        KeyCols.map(col) ++
          payload.map(c => when(col(s"_w_$c").getField("l") > col("_dl"),
            col(s"_w_$c").getField("v")).as(c)) ++
          Seq(col("_l").as(LsnCol), col("_del").as(DeletedCol),
            map_from_entries(filter(entries,
              e => e.getField("value").isNotNull && e.getField("value") > col("_dl")))
              .as(SetLsnCol),
            col("_dl").as(DelLsnCol)): _*)
  }

  /** The merge-on-read reducer a snapshot's own schema calls for: the
    * patch fold on a partial-update table, whole-row LWW otherwise.
    */
  private[graft] def reduceFor(snap: Snapshot): DataFrame => DataFrame =
    if (isPatchSchema(snap.schema)) patchReduce else lwwReduce

  /** Live rows under the public schema (tombstones and internals dropped).
    * Resolves the PUBLISHED ref: during a write-audit-publish window this is
    * the last audited snapshot, not the staged head (which auditors read via
    * [[load]] + [[readSnapshot]]). Tables that never staged have no ref and
    * read the head, as always.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val snap = loadPublished(path)
    readSnapshot(spark, path, snap)
  }

  /** Time-travel read: live rows exactly as of snapshot `version` — the
    * Iceberg `VERSION AS OF` analogue. Snapshots are immutable and their
    * manifests list the data files by name, so later appends, compactions,
    * and rebuckets never disturb an old read (they write NEW dirs and a NEW
    * snapshot; the old files stay until [[vacuum]] expires them — the same
    * retention caveat as any table format's time travel). The result is
    * read under the OLD schema version, aligned the same way cross-version
    * unions are.
    */
  def readAt(spark: SparkSession, path: String, version: Int): DataFrame =
    readSnapshot(spark, path, loadVersion(path, f"v$version%05d.json"))

  def readSnapshot(spark: SparkSession, path: String, snap: Snapshot): DataFrame = {
    val publicCols = snap.schema.fieldNames.filterNot(n =>
      n == LsnCol || n == DeletedCol || n == SetLsnCol || n == DelLsnCol)
    readStored(spark, path, snap)
      .filter(!col(DeletedCol))
      .select(publicCols.toIndexedSeq.map(col): _*)
  }

  // --------------------------------------------------------- changes since

  /** Incremental consumption (the Delta-CDF / Iceberg-incremental-read
    * analogue): the NET change per key since snapshot `sinceVersion` — for
    * every key touched after vA's LSN high-watermark, the current LWW winner
    * (internal columns included: `_deleted=true` rows are net deletes).
    * A downstream consumer (a derived table, an index, a cache) applies this
    * frame instead of re-reading the whole table.
    *
    * Cost is O(changed data), not O(table): the per-entry LSN zone maps
    * ([[BucketEntry.minLsn]]) skip — at the MANIFEST level, no file opened —
    * every base and delta entry whose rows all predate the cutoff. Delta
    * entries are per-batch, so they prune exactly; a bucket compacted since
    * vA folds old rows into its new base, and only that bucket pays a scan
    * (the `_lsn > cutoff` filter is pushed to parquet and row groups prune
    * on the same footer stats). Between compactions — the overwhelming
    * majority of batches — an incremental read opens only post-vA delta
    * files.
    *
    * Contract: exact when LSN assignment is monotone with commit order at
    * key granularity (the transaction-log property — every post-vA winner
    * carries `_lsn > vA.maxLsn`). An out-of-order row below the cutoff never
    * appears (if it lost arbitration the state didn't change and that is
    * correct; if such a row WON, this read misses it — the same restriction
    * as Iceberg's append-only incremental scan; exact CDC under arbitrary
    * LSN disorder requires per-commit change files, Delta CDF's trade).
    * Pre-stats snapshots have `maxLsn = Long.MinValue`, degrading to a full
    * LWW diff — conservative, never wrong.
    */
  def changesSince(spark: SparkSession, path: String, sinceVersion: Int): DataFrame =
    changesBetween(spark, path, sinceVersion, publishedVersion(path))

  /** [[changesSince]] generalized to a historical window: the net change
    * per key between snapshots `sinceVersion` and `untilVersion` — rows of
    * vB's entries with `_lsn` in (vA.maxLsn, vB.maxLsn], LWW-folded, zone
    * maps pruning both ends. `changesSince(vA)` IS
    * `changesBetween(vA, current)`, which is vacuum-safe by construction
    * (it reads only the live snapshot's files); a historical `untilVersion`
    * needs that snapshot's data files still retained — the same expiry
    * caveat as any time-travel read after `vacuum`.
    */
  def changesBetween(spark: SparkSession, path: String,
                     sinceVersion: Int, untilVersion: Int): DataFrame = {
    val until = loadVersion(path, f"v$untilVersion%05d.json")
    val since = loadVersion(path, f"v$sinceVersion%05d.json")
    val lo = since.maxLsn
    // A [[rollback]] inside the window moves the LSN watermark BACKWARD:
    // rows below the cursor's watermark changed, which an `_lsn > lo`
    // window can never express — silently returning the empty diff would
    // leave every incremental consumer permanently diverged (stale
    // pre-rollback values, re-applied corrections never seen). Fail loudly
    // so the consumer resets its cursor (full re-read, like any CDC reader
    // crossing a table restore).
    require(until.maxLsn == Long.MinValue || until.maxLsn >= lo,
      s"$path: LSN watermark moved backward between v$sinceVersion (maxLsn=$lo) and " +
        s"v$untilVersion (maxLsn=${until.maxLsn}) — a rollback crossed this window; " +
        "incremental reads cannot express it, reset the cursor and re-read the snapshot")
    // A pre-stats `until` has no recorded watermark: take everything (the
    // conservative full upper bound), never an accidentally-empty window.
    val hi = if (until.maxLsn == Long.MinValue) Long.MaxValue else until.maxLsn
    val candidates = (until.buckets ++ until.deltas)
      .filter(e => e.maxLsn > lo && e.minLsn <= hi)
    // The window folds under the table's OWN merge (patch fold on a patch
    // table): the net change per key is then a net PARTIAL state there —
    // consumers apply it as a patch, exactly like any other arriving batch.
    readEntries(spark, path, until, candidates)
      .map(df => reduceFor(until)(df.filter(col(LsnCol) > lo && col(LsnCol) <= hi)))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], until.schema))
  }

  /** Cast/extend a DataFrame written under an older schema to `target`:
    * add missing columns as typed nulls, cast widened columns. Alignment
    * recurses BY NAME through structs (and arrays of structs): Spark's
    * `Cast` only handles struct→struct with equal field counts matched by
    * POSITION, so a nested ADD COLUMN (SchemaMerge widens nested structs
    * field-wise) would otherwise make every cross-version read of the
    * bucket throw from then on.
    */
  private[graft] def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val srcFields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      srcFields.get(f.name) match {
        case Some(st) => alignColumn(col(f.name), st, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** One column of [[alignTo]] — also what the typed write paths run on
    * their payload columns, where the same struct-arity limitation of
    * `Cast` would otherwise reject an old producer's rows after a nested
    * ADD COLUMN.
    */
  private[graft] def alignColumn(src: org.apache.spark.sql.Column, srcT: DataType,
                                 tgtT: DataType): org.apache.spark.sql.Column = (srcT, tgtT) match {
    case (s, t) if s == t => src
    case (s: StructType, t: StructType) =>
      val sub = t.fields.map { f =>
        s.fields.find(_.name == f.name) match {
          case Some(sf) => alignColumn(src.getField(f.name), sf.dataType, f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
      // struct() of the aligned fields is non-null even when the source
      // struct was null — preserve row-level null-ness explicitly.
      when(src.isNull, lit(null).cast(t))
        .otherwise(struct(sub.toIndexedSeq: _*))
    case (s: ArrayType, t: ArrayType) =>
      transform(src, x => alignColumn(x, s.elementType, t.elementType))
    case _ => src.cast(tgtT)
  }

  // ------------------------------------------------------ metadata tables

  /** Iceberg-style `snapshots` metadata table: one row per retained
    * snapshot manifest, oldest first, with head/published flags. Driver
    * builds it from the O(versions) tiny meta JSONs — the same cost class
    * as any snapshot load; never touches data files. Note [[vacuum]]
    * reclaims DATA of expired versions but keeps the manifests, so an
    * expired snapshot still lists here (its `manifest_rows` describe files
    * that may be gone — the usual table-format "metadata outlives expired
    * data" shape).
    */
  def metaSnapshots(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val head = load(path).version
    val pub = publishedVersion(path)
    val names = scala.util.Using.resource(Files.list(Paths.get(path, "meta"))) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d{5}\\.json")).toSeq.sorted
    }
    names.map(n => loadVersion(path, n)).map { sn =>
      (sn.version, sn.schemaV, sn.numBuckets, sn.buckets.size, sn.deltas.size,
        (sn.buckets ++ sn.deltas).map(_.rows).sum, sn.batchWatermark,
        sn.committedBatches.size,
        if (sn.maxLsn == Long.MinValue) None else Some(sn.maxLsn),
        sn.version == head, sn.version == pub)
    }.toDF("version", "schema_v", "num_buckets", "base_entries",
      "delta_entries", "manifest_rows", "batch_watermark", "pending_batches",
      "max_lsn", "is_head", "is_published")
  }

  /** `files` metadata table for one snapshot (default: the head): every
    * manifest entry with its kind, bucket, row count and zone maps — what
    * a reader's pruning sees, as a queryable frame.
    */
  def metaFiles(spark: SparkSession, path: String,
                version: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val sn = version.map(v => loadVersion(path, f"v$v%05d.json")).getOrElse(load(path))
    (sn.buckets.map(("base", _)) ++ sn.deltas.map(("delta", _))).map {
      case (kind, e) =>
        (sn.version, kind, e.bucket, e.dir, e.rows, e.schemaV, e.minKey, e.maxKey,
          if (e.minLsn == Long.MinValue) None else Some(e.minLsn),
          if (e.maxLsn == Long.MaxValue) None else Some(e.maxLsn))
    }.toDF("version", "kind", "bucket", "dir", "rows", "schema_v",
      "min_key", "max_key", "min_lsn", "max_lsn")
  }
}
