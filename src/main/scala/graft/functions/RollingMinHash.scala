package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
  * the minimum over all k-byte windows of a polynomial hash
  * `Σ byte·base^j mod m` — stable under small appends/prepends, and a pure
  * function of the text, so an independent engine reproduces it with plain
  * modular arithmetic (the DuckDB oracle does exactly that).
  *
  * A native Catalyst `Expression` WITH codegen, not a UDF and not an
  * `md5(substr)` composition: fingerprinting runs over every document of a
  * corpus, and the per-window `md5` variant measured 3.7 s on the 5.2k-doc
  * sf0.1 sweep (~10M interpreted md5+substring calls) where this expression
  * runs the whole corpus in a tight long-arithmetic loop. Texts shorter
  * than `k` hash as one whole-text window; empty text hashes to 0.
  */
case class RollingMinHash(child: Expression, k: Int, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash.minHash(input.asInstanceOf[UTF8String].getBytes, k, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash.minHash($c.getBytes(), $k, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {

  /** Min of Horner-evaluated polynomial hashes over all k-byte windows;
    * O(len·k) long ops in one JIT-compiled loop, no allocation. (A
    * constant-time rolling update per window is possible but the Horner
    * recompute keeps the definition identical to the oracle's SQL and is
    * already memory-bandwidth-bound at these k.)
    */
  def minHash(bytes: Array[Byte], k: Int, base: Long, mod: Long): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    var min = Long.MaxValue
    var i = 0
    val last = n - kk
    while (i <= last) {
      var h = 0L
      var j = 0
      while (j < kk) {
        h = (h * base + (bytes(i + j) & 0xffL)) % mod
        j += 1
      }
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Register `rolling_min_hash(text)` in the session's function registry —
    * the public bridge into a plan while Spark 4 keeps its
    * Column↔Expression utils `private[sql]`; call it via
    * `expr("rolling_min_hash(col)")`.
    */
  def register(spark: SparkSession, k: Int = 16,
               base: Long = 31L, mod: Long = 1000000007L): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_min_hash", exprs => RollingMinHash(exprs.head, k, base, mod), "built-in")
}
