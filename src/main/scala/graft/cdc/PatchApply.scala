package graft.cdc

import graft.infer.SchemaMerge
import graft.table.IceLite
import graft.table.IceLite.Snapshot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Partial-update merge engine (the Paimon `partial-update` / Hudi
  * `PartialUpdateAvroPayload` semantics family, re-expressed as one Spark
  * hash-aggregate): an `I` event replaces the whole row (explicit nulls
  * included), a `U` event patches ONLY the columns it carries non-null, an
  * `R` UNSETS the columns it marks non-null (per-attribute REMOVE — the
  * unset participates in setter arbitration like any write, so a stale
  * pre-R setter arriving later cannot resurrect the removed value), and a
  * `D` tombstones the row and wipes every column set before it. The
  * reference's MODIFY op has exactly this shape — a NiFi ModifyLDAP flow
  * file carries only the attributes it changes, not the whole entry, with
  * a per-attribute ADD/REPLACE/REMOVE dispatch
  * (InsecureLDAPProcessor.java:880-1055; op dispatch 991-1004: REPLACE ≙
  * `U`, REMOVE ≙ `R`) — so the CDC engine's LWW whole-row arbitration is
  * the wrong merge for that op family; this is the right one.
  *
  * Exactness under LSN disorder — the design decision. A folded row cannot
  * carry just column VALUES: merging generation rows per-column needs to
  * know WHEN each column was last set, or a stale generation's column wins
  * ties it should lose and a late-arriving tombstone cannot wipe columns
  * set before it. Stored rows therefore carry two internal columns past the
  * LWW engine's (`_lsn`, `_deleted`):
  *
  *  - `_setlsn: map<string,long>` — per payload column, the LSN of its
  *    latest setter (an `I` sets every column; a `U` sets its non-null
  *    ones). The map form survives schema evolution untouched: a column
  *    added later is just a new key, no positional bitmask to migrate.
  *  - `_dlsn: long` — the latest delete LSN seen for the key
  *    (`Long.MinValue` when none): the wipe boundary. A setter at or below
  *    it is dead even if it arrives batches later.
  *
  * The fold (per key, one `groupBy` with map-side partial aggregation —
  * identical shuffle shape and skew behavior to [[IceLite.lwwReduce]]):
  * `dl = max(_dlsn)`; per column `c`, the winner is
  * `max_by((value, setLsn), setLsn)` with the value kept only when its
  * setter outruns `dl`; row liveness is plain LWW on the tombstone flag
  * (`max_by(_deleted, _lsn)` — a `U` after a `D` revives the row with only
  * its own columns). The same fold reduces a raw batch, merges batch
  * against stored generations at compaction, and serves merge-on-read —
  * associative and commutative over arbitrary batch splits, which is what
  * makes it exact under out-of-order delivery (PatchApplySpec proves
  * split-order invariance).
  *
  * Everything else — bucketing, delta append, deterministic compaction,
  * snapshot commit, exactly-once batch watermark, schema evolution — is the
  * shared [[MergeApply.reduceAndCommit]] machinery with this fold passed as
  * the reducer: the patch engine is a MERGE SEMANTICS, not a second table
  * format.
  */
object PatchApply {

  val SetLsnCol: String = IceLite.SetLsnCol
  val DelLsnCol: String = IceLite.DelLsnCol
  /** `_dlsn` sentinel for "no delete seen" (keeps the column non-null so
    * `max` needs no null handling and parquet stats stay usable).
    */
  val NoDelete: Long = Long.MinValue

  /** Stored schema of a patch table: the LWW full schema plus the two
    * patch-merge internals. Their presence is what flips every generic
    * IceLite read path ([[IceLite.readStored]], [[IceLite.changesBetween]])
    * to the patch fold automatically.
    */
  def patchFullSchema(payload: StructType): StructType =
    StructType(IceLite.fullSchema(payload).fields :+
      StructField(SetLsnCol, MapType(StringType, LongType), nullable = false) :+
      StructField(DelLsnCol, LongType, nullable = false))

  /** Payload fields of a patch snapshot (the generic [[Snapshot
    * .payloadSchema]] strips the patch internals too; kept as the
    * patch-path name for its call sites).
    */
  def payloadSchema(snap: Snapshot): StructType = snap.payloadSchema

  /** Create an empty patch table (same layout as [[IceLite.create]], stored
    * schema extended with the patch internals).
    */
  def create(path: String, payload: StructType = new StructType(),
             numBuckets: Int = 64): Snapshot = {
    val snap = IceLite.create(path, payload, numBuckets)
    // The patch internals ride the stored schema; committed as v1 on top of
    // create's v0 (commitSnapshot CAS-checks the predecessor).
    val patched = snap.copy(version = snap.version + 1,
      schemas = Map(1 -> patchFullSchema(payload)))
    IceLite.commitSnapshot(path, patched)
    patched
  }

  /** The patch fold over rows carrying (`keys`, payload, `_lsn`, `_deleted`,
    * `_setlsn`, `_dlsn`) — raw per-event rows and folded generation rows are
    * the same shape, so one reducer serves batch reduce, compaction merge
    * and merge-on-read. The implementation lives in [[IceLite.patchReduce]]
    * (the payload column set is derived from the frame's own schema) so the
    * generic table reads auto-select it without a table→cdc dependency.
    */
  def patchFold(df: DataFrame): DataFrame =
    IceLite.patchReduce(df)

  /** Apply one typed micro-batch of partial changes. Contract matches
    * [[MergeApply.applyChanges]] — columns `op` (I/U/R/D), `lsn`, `conv_id`,
    * `turn_idx`, payload — except payload nulls on a `U` mean "leave the
    * stored value alone" rather than "set null", and on an `R` row the
    * NON-null input columns name the attributes to unset (their values are
    * markers, discarded). Exactly-once, schema evolution, delta/compaction
    * and lineage are the shared machinery.
    */
  def applyPatches(spark: SparkSession, tablePath: String, changes0: DataFrame, batchId: Long,
                   lineageDir: Option[String] = None,
                   policy: MergeApply.CompactionPolicy = MergeApply.CompactionPolicy())
  : MergeApply.ApplyResult = {
    val t0 = System.nanoTime()
    val snap = IceLite.load(tablePath)
    // Mirror of applyChanges'/applyRaw's cross-semantics fences: a patch
    // write into a whole-row LWW table would append _setlsn/_dlsn columns
    // its stored schema never lists (reads keep LWW-folding and partial
    // rows then win whole-row, nulling the columns they left alone) — or,
    // if the payload drifts, flip the stored schema and strip every
    // pre-existing LWW row in the fold. Fail loudly instead.
    require(IceLite.isPatchSchema(snap.schema),
      s"$tablePath is a whole-row LWW table — applyPatches would mix merge semantics; " +
        "use MergeApply.applyChanges, or target a PatchApply.create'd table")
    if (snap.hasBatch(batchId)) {
      return MergeApply.ApplyResult(batchId, committed = false, snap.version,
        0, 0, 0, 0, 0, 0, 0, 0, 0, "", 0)
    }
    def ms(since: Long): Long = (System.nanoTime() - since) / 1000000

    val tScan0 = System.nanoTime()
    val observed = StructType(changes0.schema.fields
      .filterNot(f => MergeApply.reservedNames.contains(f.name) ||
        f.name == SetLsnCol || f.name == DelLsnCol)
      .map(f => f.copy(dataType = MergeApply.nullableForm(f.dataType), nullable = true)))
    val mergedPayload = SchemaMerge.mergeStruct(payloadSchema(snap), observed)
    val schemaDiff = SchemaMerge.diff(payloadSchema(snap), mergedPayload)
    val newSchemaV = if (schemaDiff.isEmpty) snap.schemaV else snap.schemaV + 1
    val schemas =
      if (schemaDiff.isEmpty) snap.schemas
      else snap.schemas + (newSchemaV -> patchFullSchema(mergedPayload))
    val withBucket = changes0
      .withColumn(IceLite.BucketCol, IceLite.bucketExprFor(snap, col("conv_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = withBucket.groupBy(col(IceLite.BucketCol))
        .agg(count(lit(1)).as("n"), min(col("lsn")).as("lo"), max(col("lsn")).as("hi"))
        .collect()
      val estRows = stats.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val events = stats.map(_.getLong(1)).sum
      val minLsn = if (stats.isEmpty) 0L else stats.map(_.getLong(2)).min
      val maxLsn = if (stats.isEmpty) 0L else stats.map(_.getLong(3)).max
      val tScan = ms(tScan0)

      if (estRows.isEmpty) {
        val newSnap = snap.copy(version = snap.version + 1, schemaV = newSchemaV,
          schemas = schemas).withBatch(batchId)
        IceLite.commitSnapshot(tablePath, newSnap)
        val res = MergeApply.ApplyResult(batchId, committed = true, newSnap.version,
          0, 0, 0, 0, 0, 0, 0, 0, 0, schemaDiff.toString, (System.nanoTime() - t0) / 1000000)
        // One lineage row per micro-batch, empty included — the same
        // contract as the applyChanges/applyRaw empty branches; a gap here
        // would make epoch audits over the lineage log under-count.
        lineageDir.foreach(MergeApply.writeLineage(spark, _, res, Nil))
        return res
      }

      val payloadNames = mergedPayload.fieldNames.toSeq
      def present(n: String): Column =
        if (changes0.schema.fieldNames.contains(n)) col(n) else lit(null)
      // Per-event patch row: an I sets every column (nulls included — its
      // map entry exists even when the value is null), a U sets its
      // non-null ones, an R sets its marked (non-null in the input) columns
      // to NULL — the null rides the same setter-LSN arbitration, so the
      // unset wins and stays winning over older setters — and a D sets
      // none and stamps the wipe boundary.
      val setEntries = array(payloadNames.map(n =>
        struct(lit(n).as("key"),
          when(col("op") === "I" || present(n).isNotNull, col("lsn")).as("value"))): _*)
      val changes = withBucket.select(
        Seq(col("conv_id"), col("turn_idx").cast(IntegerType).as("turn_idx")) ++
          payloadNames.map { n =>
            val aligned =
              if (changes0.schema.fieldNames.contains(n))
                IceLite.alignColumn(col(n), changes0.schema(n).dataType,
                  mergedPayload(n).dataType)
              else lit(null).cast(mergedPayload(n).dataType)
            when(col("op") === "R", lit(null).cast(mergedPayload(n).dataType))
              .otherwise(aligned).as(n)
          } ++
          Seq(col("lsn").as(IceLite.LsnCol), (col("op") === "D").as(IceLite.DeletedCol),
            when(col("op") === "D", typedLit(Map.empty[String, Long]))
              .otherwise(map_from_entries(filter(setEntries, e => e.getField("value").isNotNull)))
              .as(SetLsnCol),
            when(col("op") === "D", col("lsn")).otherwise(lit(NoDelete)).as(DelLsnCol)): _*)

      MergeApply.reduceAndCommit(spark, tablePath, snap, schemas, newSchemaV, changes,
        estRows, events, 0L, minLsn, maxLsn, schemaDiff.toString,
        batchId, policy, lineageDir, t0, tScan, 0L, patchFold)
    } finally withBucket.unpersist()
  }

  /** Live rows of a patch table under the public schema: merge-on-read with
    * the patch fold, tombstones and internals dropped. Since the generic
    * read auto-selects the patch fold from the stored schema, this IS
    * [[IceLite.read]] — kept as the patch-path name for its call sites.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    IceLite.read(spark, path)
}
