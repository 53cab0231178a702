package graft.infer

import org.apache.spark.sql.types._

/** Deterministic schema-merge lattice for CDC schema evolution — the
  * reference's conflict rules (JSONSchemaGeneratorProcessor.java) lifted to
  * Spark types:
  *
  *  - `NULL ⊔ T = T` (null detection `JSG:398-399`)
  *  - `INTEGER ⊔ NUMBER = NUMBER` → `Long ⊔ Double = Double` (the reference
  *    distinguishes integral vs non-integral at `JSG:394-395` and degrades to
  *    the less specific type on conflict, `JSG:512-515`)
  *  - `Date ⊔ Timestamp = Timestamp` (format refinement `JSG:618-621` —
  *    date is a refinement of date-time's prefix)
  *  - new field → added as nullable (ADD COLUMN)
  *  - struct/array merge recursively, field-wise
  *  - anything else incompatible → `String` (the UNKNOWN universal fallback,
  *    `JSG:130,401`)
  *
  * The lattice is commutative, associative, and idempotent on types modulo
  * struct-field order (left operand's field order wins; new fields append in
  * first-seen order) — property-tested in SchemaMergeSpec.
  */
object SchemaMerge {

  def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (NullType, t) => t
    case (t, NullType) => t
    case (x: StructType, y: StructType) => mergeStruct(x, y)
    case (x: ArrayType, y: ArrayType) =>
      ArrayType(merge(x.elementType, y.elementType), x.containsNull || y.containsNull)
    case (x, y) if x == y => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (IntegerType, LongType) | (LongType, IntegerType) => LongType
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) => DoubleType
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType // UNKNOWN fallback, JSG:130
  }

  /** Field-wise struct merge: left's field order, new fields appended in
    * first-seen order, all fields nullable (CDC rows may omit any field).
    * `format` metadata survives only when both sides agree.
    */
  def mergeStruct(a: StructType, b: StructType): StructType = {
    val aNames = a.fieldNames.toSet
    val merged = a.fields.map { fa =>
      b.find(_.name == fa.name) match {
        case Some(fb) =>
          val meta = if (fa.metadata == fb.metadata) fa.metadata else Metadata.empty
          StructField(fa.name, merge(fa.dataType, fb.dataType), nullable = true, meta)
        case None => fa.copy(nullable = true)
      }
    }
    val added = b.fields.filterNot(f => aNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ added)
  }

  /** Schema diff for lineage/metrics: columns added and types widened going
    * from `old` to `merged` (merged must be merge(old, observed)).
    */
  def diff(old: StructType, merged: StructType): SchemaDiff = {
    val oldNames = old.fieldNames.toSet
    val added = merged.fields.filterNot(f => oldNames.contains(f.name)).map(_.name).toSeq
    val widened = merged.fields.flatMap { f =>
      old.find(_.name == f.name).collect {
        case of if of.dataType != f.dataType =>
          s"${f.name}: ${of.dataType.simpleString}->${f.dataType.simpleString}"
      }
    }.toSeq
    SchemaDiff(added, widened)
  }
}

case class SchemaDiff(addedColumns: Seq[String], widenedColumns: Seq[String]) {
  def isEmpty: Boolean = addedColumns.isEmpty && widenedColumns.isEmpty
}
