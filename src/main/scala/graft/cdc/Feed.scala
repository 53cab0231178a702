package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The binlog/WAL-shaped change-event envelope (FIXTURES.md §2):
  * `{"op":"I|U|D","lsn":<long>,"conv_id":"...","turn_idx":<int>,"after":{...}|null}`
  *
  * The envelope is fixed; `after` is open-ended (drives schema evolution) and
  * is therefore kept as a raw JSON string at this layer — its schema is
  * inferred per micro-batch (reference precedent: schema derived from content
  * per record, JSONSchemaGeneratorProcessor.java:313). This is also what lets
  * a Structured Streaming query survive mid-stream schema evolution: the
  * streaming DataFrame's schema is fixed at start, so only the envelope is
  * declared there and payload projection happens inside foreachBatch.
  */
object Feed {

  val RawCol = "_raw"

  /** Fixed envelope fields, parsed with from_json (malformed JSON → null →
    * dead letter). `after` is declared StringType: Spark's Jackson parser
    * captures a non-string JSON value targeted at a string field as its raw
    * JSON text — so ONE parse yields both the typed envelope and the opaque
    * payload (no second get_json_object pass over every line).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("lsn", LongType),
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("after", StringType)))

  /** `raw` must have a single string column `value` (text source shape).
    * Output: _raw, op, lsn, conv_id, turn_idx, after (raw JSON text or null).
    */
  def parse(raw: DataFrame): DataFrame = {
    raw.select(
      col("value").as(RawCol),
      from_json(col("value"), envelopeSchema).as("env")
    ).select(col(RawCol), col("env.op"), col("env.lsn"), col("env.conv_id"),
      col("env.turn_idx"), col("env.after"))
  }

  /** The envelope inverse: render a table's live rows back into the feed
    * format — a folded consistent snapshot (one `I` line per live key, each
    * carrying its original `_lsn`) that [[Pipeline.replay]] can bootstrap a
    * NEW table from ([[graft.ops.CdcQueries.bootstrapHandoff]]'s input
    * contract). This is the migration verb: export ∘ replay moves a table
    * across clusters, bucket counts, or layout generations in O(live rows)
    * while preserving LWW arbitration against any change stream that hands
    * off at the export watermark. Timestamp columns are rendered in the
    * ingest path's own micro-second format (the session zone is UTC
    * everywhere) so a round-trip is bit-identical, not millis-truncated.
    */
  def renderSnapshot(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String): DataFrame = {
    import graft.table.IceLite
    val snap = IceLite.loadPublished(tablePath)
    val afterCols = snap.payloadSchema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case TimestampType =>
          date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as(f.name)
        case _ => col(f.name)
      }
    }
    IceLite.readStored(spark, tablePath, snap)
      .filter(!col(IceLite.DeletedCol))
      .select(to_json(struct(
        lit("I").as("op"), col(IceLite.LsnCol).as("lsn"),
        col("conv_id"), col("turn_idx"),
        struct(afterCols: _*).as("after"))).as("value"))
  }
}
