package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash sign-sum fold as ONE native codegen pass: input is the
  * materialized per-word hash halves `array<struct<wl:long, wh:long>>`
  * (md5-derived — see TextOps.simhashWordHalves, whose layout the DuckDB
  * oracle reproduces nibble-wise), output `[lo, hi]` — two 32-bit halves
  * with bit b set when the ±1 sum of that bit position over all words is
  * positive. Replaces 64 separate interpreted `aggregate` folds (one per
  * bit, each a full pass over the word array outside whole-stage codegen)
  * with a single compiled loop keeping 64 counters. Bit layout is identical
  * to the fold it replaced: half bit b ← word-half bit (31 − b); the
  * dedup_simhash oracle (which recomputes fingerprints from text in SQL)
  * proves bit-exactness end-to-end.
  */
case class SimhashPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_pack"

  override def nullSafeEval(input: Any): Any =
    SimhashPack.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashPack.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashPack =
    copy(child = newChild)
}

object SimhashPack {

  def pack(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val s = words.getStruct(i, 2)
        val wl = s.getLong(0)
        val wh = s.getLong(1)
        var b = 0
        while (b < 32) {
          if (((wl >>> (31 - b)) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((wh >>> (31 - b)) & 1L) == 1L) counts(32 + b) += 1 else counts(32 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) lo |= 1L << b
      if (counts(32 + b) > 0) hi |= 1L << b
      b += 1
    }
    new GenericArrayData(Array(lo, hi))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_pack", exprs => SimhashPack(exprs.head), "built-in")
}
