package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge into Spark's `private[sql]` surface, used by the icelite v1
  * streaming source ([[graft.table.IceLiteSource]]).
  *
  * A v1 `Source.getBatch` must return a DataFrame whose logical plan is
  * flagged `isStreaming = true` — `MicroBatchExecution` asserts it before
  * grafting the batch plan in place of the stream's leaf. A frame built
  * from a batch parquet read carries `isStreaming = false` on its leaves,
  * and the only supported way to re-flag it is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true)`
  * — the exact pattern the built-in socket and rate v1 sources use. That
  * method is `private[sql]`, hence this one-function shim living under
  * `org.apache.spark.sql`.
  *
  * The wrapped plan is physically planned HERE (`toRdd`), so the batch's
  * own optimizations — manifest-level zone-map pruning, parquet filter
  * pushdown, the table's merge fold — all still apply; the stream sees the
  * result as one opaque scan, which is also what pins determinism: the
  * file list is resolved when the micro-batch is constructed, not when it
  * runs.
  */
object StreamingShim {
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    spark.internalCreateDataFrame(classic.queryExecution.toRdd, classic.schema,
      isStreaming = true)
  }
}
