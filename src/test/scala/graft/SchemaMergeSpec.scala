package graft

import graft.infer.SchemaMerge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaMergeSpec extends AnyFunSuite {

  test("lattice point rules") {
    assert(SchemaMerge.merge(NullType, LongType) == LongType)
    assert(SchemaMerge.merge(LongType, DoubleType) == DoubleType)   // JSG:394-395
    assert(SchemaMerge.merge(DateType, TimestampType) == TimestampType)
    assert(SchemaMerge.merge(LongType, BooleanType) == StringType)  // UNKNOWN fallback JSG:130
    assert(SchemaMerge.merge(StringType, StringType) == StringType)
    assert(SchemaMerge.merge(
      ArrayType(LongType), ArrayType(DoubleType)) == ArrayType(DoubleType, containsNull = true))
  }

  test("struct merge: add column, widen, conflict→string, order stable") {
    val a = StructType(Seq(
      StructField("x", LongType), StructField("y", StringType)))
    val b = StructType(Seq(
      StructField("y", BooleanType), StructField("x", DoubleType), StructField("z", LongType)))
    val m = SchemaMerge.mergeStruct(a, b)
    assert(m.fieldNames.toSeq == Seq("x", "y", "z")) // left order + appended new
    assert(m("x").dataType == DoubleType)
    assert(m("y").dataType == StringType)
    assert(m("z").dataType == LongType)
    assert(m.fields.forall(_.nullable))
  }

  // ---- exhaustive property tests over a representative lattice sample ----
  private val types: Seq[DataType] = Seq(
    NullType, StringType, LongType, DoubleType, BooleanType, DateType, TimestampType,
    ArrayType(LongType, containsNull = true), ArrayType(StringType, containsNull = true),
    StructType(Seq(StructField("a", LongType, nullable = true))),
    StructType(Seq(StructField("a", DoubleType, nullable = true),
      StructField("b", StringType, nullable = true))))

  /** Canonical form: struct field order is presentation-only, ignore it. */
  private def canon(dt: DataType): String = dt match {
    case s: StructType =>
      s.fields.map(f => f.name + ":" + canon(f.dataType)).sorted.mkString("struct<", ",", ">")
    case a: ArrayType => s"array<${canon(a.elementType)}>"
    case other => other.simpleString
  }

  test("merge is commutative (modulo field order) — exhaustive") {
    for (a <- types; b <- types)
      assert(canon(SchemaMerge.merge(a, b)) == canon(SchemaMerge.merge(b, a)),
        s"comm failed for $a ⊔ $b")
  }

  test("merge is associative — exhaustive") {
    for (a <- types; b <- types; c <- types)
      assert(canon(SchemaMerge.merge(SchemaMerge.merge(a, b), c)) ==
        canon(SchemaMerge.merge(a, SchemaMerge.merge(b, c))),
        s"assoc failed for $a, $b, $c")
  }

  test("merge is idempotent — exhaustive") {
    for (a <- types)
      assert(canon(SchemaMerge.merge(a, a)) == canon(a))
  }

  test("diff reports added and widened columns") {
    val old = StructType(Seq(StructField("x", LongType)))
    val nw = SchemaMerge.mergeStruct(old,
      StructType(Seq(StructField("x", DoubleType), StructField("y", StringType))))
    val d = SchemaMerge.diff(old, nw)
    assert(d.addedColumns == Seq("y"))
    assert(d.widenedColumns == Seq("x: bigint->double"))
  }
}
