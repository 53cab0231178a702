package graft.table

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The icelite table as a first-class Structured Streaming SOURCE (the
  * Delta/Iceberg streaming-read analogue): downstream pipelines consume the
  * table's net changes with Spark-managed checkpointed offsets instead of
  * hand-carried version cursors —
  *
  * {{{
  * spark.readStream.format("icelite")
  *   .option("startingVersion", 0)   // default 0: initial content first
  *   .load(tablePath)
  *   .writeStream.option("checkpointLocation", ckpt)
  *   .trigger(Trigger.AvailableNow()).foreachBatch(apply _).start()
  * }}}
  *
  * Offsets are snapshot VERSIONS (a [[LongOffset]] of the published head);
  * each micro-batch is exactly [[IceLite.changesBetween]](lastSeen, head):
  * the net LWW (or patch) change per key in that window, manifest-pruned by
  * the LSN zone maps to O(changed data). The offset/batch split gives the
  * usual v1 exactly-once contract: a crash between sink commit and offset
  * commit replays the SAME (start, end] window, and snapshots being
  * immutable manifests over immutable files makes the replayed batch
  * bit-identical (retention caveat: replay needs the window's snapshots
  * still un-vacuumed — the same rule Delta/Iceberg streaming reads have).
  *
  * WAP isolation holds: the head offset is [[IceLite.publishedVersion]], so
  * a staging table streams nothing past its `_published` ref until
  * `publish` fast-forwards it — consumers never see unaudited data.
  *
  * The source schema is fixed at stream start (the published snapshot's
  * full schema, internal `_lsn`/`_deleted` columns included, so consumers
  * can apply net deletes). A running plan cannot change attributes, and
  * silently casting a widened column back would corrupt values — so a
  * mid-run schema evolution FAILS the query with a restart instruction
  * (Delta's contract for the same reason); the restarted stream re-pins
  * the evolved schema and resumes from the checkpointed offset, losing
  * nothing.
  *
  * Reference semantics: this is S3's "tail the paginated source from the
  * stored cursor" (`InsecureInvokeHTTP.java` pagination state) lifted to
  * table level — the cursor is the snapshot version and Spark owns it.
  */
class IceLiteSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "icelite"

  /** The schema [[sourceSchema]] resolved, pinned for the [[createSource]]
    * that follows on the SAME provider instance (Spark's DataSource holds
    * one instance across the two calls): createSource must use the schema
    * Spark ANALYZED the plan with, and a publish landing between the two
    * calls would otherwise let a second `loadPublished` pin a schema
    * differing from the plan's attributes.
    */
  @volatile private var analyzed: Option[StructType] = None

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val s = IceLite.loadPublished(IceLiteSource.pathOf(parameters)).schema
    analyzed = Some(s)
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = IceLiteSource.pathOf(parameters)
    val startingVersion = parameters.getOrElse("startingVersion", "0").toInt
    require(startingVersion >= 0, s"startingVersion must be >= 0, got $startingVersion")
    // `schema` here is Spark's USER-specified schema (None in the normal
    // readStream.format("icelite").load(path) flow). The table's own stored
    // schema is the only one the source can honor — sourceSchema ignores a
    // user schema when analyzing, so silently pinning one here would hand
    // the execution a schema the plan's attributes don't carry. Reject it
    // loudly instead. The loadPublished fallback only fires for callers
    // that construct the source outside readStream's
    // sourceSchema→createSource sequence on this instance.
    require(schema.isEmpty || analyzed.contains(schema.get),
      "the icelite source reads the table's own stored schema; drop .schema(...)")
    new IceLiteSource(sqlContext, path, startingVersion,
      analyzed.getOrElse(IceLite.loadPublished(path).schema))
  }
}

object IceLiteSource {
  private[table] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "icelite streaming source requires .load(<table path>)"))
}

class IceLiteSource(sqlContext: SQLContext, path: String,
                    startingVersion: Int, fixedSchema: StructType)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  override def schema: StructType = fixedSchema

  /** Robust across live and checkpoint-recovered offsets (a recovered v1
    * offset arrives as SerializedOffset wrapping the json this source
    * emitted): the json IS the version literal either way.
    */
  private def version(o: Offset): Int = o.json.trim.toInt

  /** The published head — one tiny meta read per trigger, no data I/O. */
  override def getOffset: Option[Offset] = {
    val head = latched.getOrElse(IceLite.publishedVersion(path))
    if (head <= startingVersion) None else Some(LongOffset(head.toLong))
  }

  // ---- Trigger.AvailableNow support (the FileStreamSource pattern: latch
  // the head once at query start, drain to it, stop — so the trigger's
  // "process everything available, then terminate" contract is exact even
  // when writers keep committing during the drain, and a restart with an
  // uncommitted batch recovers that batch and still drains to the latch).
  @volatile private var latched: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    latched = Some(IceLite.publishedVersion(path))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val lo = Option(startOffset).map(_.json.trim.toInt).getOrElse(startingVersion)
    val head = latched.getOrElse(IceLite.publishedVersion(path))
    if (head <= math.max(lo, startingVersion)) null else LongOffset(head.toLong)
  }

  override def reportLatestOffset(): OffsetV2 =
    LongOffset(IceLite.publishedVersion(path).toLong)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(version).getOrElse(startingVersion)
    val hi = version(end)
    val changes = IceLite.changesBetween(sqlContext.sparkSession, path, lo, hi)
    // Schema-drift rule, direction-aware. A window OLDER than the pinned
    // schema is fine — aligning old→fixed adds null columns and widens
    // types, both lossless — and it HAPPENS routinely: v1 restart recovery
    // re-invokes getBatch on the last committed (historical) window while
    // the pinned schema is the current head's. A window NEWER than the
    // pinned schema (the table evolved under this running stream) must FAIL
    // instead: casting evolved values back would silently corrupt them
    // (2.5 → 2), and a running plan cannot grow attributes. The test is
    // `merge(window, fixed) == fixed` — fixed already subsumes the window.
    def byName(s: StructType) = s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    val lossless =
      byName(graft.infer.SchemaMerge.mergeStruct(changes.schema, fixedSchema)) ==
        byName(fixedSchema)
    if (!lossless)
      throw new IllegalStateException(
        s"icelite stream source: table $path evolved its schema under a running " +
          s"stream (stream pinned ${fixedSchema.simpleString}, window carries " +
          s"${changes.schema.simpleString}). Restart the query: the checkpoint " +
          "resumes from the committed offset and the restarted stream adopts " +
          "the evolved schema — nothing is lost, nothing is silently cast.")
    StreamingShim.asStreamingFrame(IceLite.alignTo(changes, fixedSchema))
  }

  override def stop(): Unit = ()
}
