package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The WHOLE 64-bit SimHash fingerprint — lowercase, split on spaces, md5
  * per word, ±1 sign-sum fold over 64 bit positions — fused into one native
  * codegen pass over the text. Replaces the two-stage
  * `simhashWordHalves` (interpreted `transform` with md5+conv+substring per
  * word) → persist → `SimhashPack` pipeline AND the persist barrier it
  * needed: no per-word struct array is materialized at all.
  *
  * Bit-exact with that pipeline (parity spec): word half wl = hex chars 1-8
  * of md5(word) = first 4 digest bytes big-endian (unsigned), wh = chars
  * 9-16 = bytes 4-8; half bit b ← word-half bit (31 − b); bit set when the
  * ±1 sum is positive. The dedup_simhash DuckDB oracle recomputes the
  * fingerprints from text nibble-wise, so end-to-end bit-exactness is
  * driver-verified too. Split keeps empty segments (Spark split limit -1);
  * lowercase is `UTF8String.toLowerCase` — the exact evaluation of Spark's
  * `lower()` — so the fingerprint matches the HOF composition for any
  * input, ASCII or not (fuzzed in NativeExprFuzzSpec).
  */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    SimhashBits.bits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashBits.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {

  // MessageDigest.getInstance does a provider lookup — per-thread reuse, not
  // per-row (this runs once per document over the whole corpus).
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def bits(text: UTF8String): ArrayData = {
    // Spark-identical lowercase (see ShingleHashes.shingles).
    val bytes = text.toLowerCase.getBytes
    var i = 0
    val md = mdLocal.get()
    val counts = new Array[Int](64)
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // wl = digest bytes 0-3 big-endian (md5-hex chars 1-8), wh = 4-7.
        val wl = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val wh = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((wl >>> (31 - b)) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((wh >>> (31 - b)) & 1L) == 1L) counts(32 + b) += 1 else counts(32 + b) -= 1
          b += 1
        }
        start = i + 1
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
      "simhash_bits", exprs => SimhashBits(exprs.head), "built-in")
}
