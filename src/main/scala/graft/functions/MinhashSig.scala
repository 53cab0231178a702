package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a hashed-shingle set (`array<long>`) in ONE
  * native codegen pass: for each of `numHashes` seeded hash functions, the
  * minimum over the shingles. Bit-exact with the
  * `array((0 until n).map(h => array_min(transform(sh, s => xxhash64(s,
  * lit(h))))))` composition it replaces — Spark's `xxhash64(s, lit(h))`
  * folds as `hashInt(h, hashLong(s, 42))`, reproduced here via the same
  * `XXH64` primitives (parity spec asserts equality against the builtin) —
  * but evaluated as one compiled loop instead of `numHashes` interpreted
  * passes over the array (higher-order functions sit outside whole-stage
  * codegen). Empty input yields an all-null signature, matching
  * `array_min` of an empty array.
  */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSig.sig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  def sig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes)) // all null
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = XXH64.hashLong(shingles.getLong(i), 42L)
        var k = 0
        while (k < numHashes) {
          val v = XXH64.hashInt(k, base)
          if (v < out(k)) out(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(Long.box(_): Any))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinhashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
}
