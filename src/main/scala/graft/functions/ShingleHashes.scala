package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word 3-shingles of a lowercased text in ONE native codegen pass —
  * the candidate-generation front of the MinHash/Jaccard dedup pipeline.
  * Bit-exact with the composition it replaces (parity spec):
  *
  * {{{
  *   w      = split(lower(text), " ")              // Spark split: keeps
  *                                                 // empty segments, limit -1
  *   h      = transform(w, x => xxhash64(x))
  *   rolled = slice(zip_with(zip_with(h, slice(h, 2, …), xxhash64),
  *                           slice(h, 3, …), xxhash64), 1, size(w) - 2)
  *   out    = size(w) < 3 ? array(xxhash64(array_join(w, " "))) : rolled
  * }}}
  *
  * reproduced through the same `XXH64` primitives Spark's `xxhash64` folds
  * through: word hash = `hashUnsafeBytes(utf8, 42)`; pair/triple combine =
  * `hashLong(b, hashLong(a, 42))`. The HOF form evaluates interpreted
  * (outside whole-stage codegen) and materializes four intermediate arrays
  * per document; this is one loop over the text bytes. Lowercasing is
  * `UTF8String.toLowerCase` — the exact evaluation of Spark's `lower()` —
  * so parity holds for ANY input, not just ASCII (the fuzz spec includes
  * non-ASCII cases); splitting on the raw 0x20 byte is UTF-8-safe because
  * multi-byte sequences never contain it.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L

  private def hashBytes(b: Array[Byte], from: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
      len, Seed)

  /** xxhash64(a, b) over two long columns = fold of hashLong with seed 42. */
  private def combine(a: Long, b: Long): Long =
    XXH64.hashLong(b, XXH64.hashLong(a, Seed))

  def shingles(text: UTF8String): ArrayData = {
    // Spark-identical lowercase (UTF8String.toLowerCase has an ASCII fast
    // path internally; no manual byte map that would diverge on non-ASCII).
    val bytes = text.toLowerCase.getBytes
    // Split on ' ' keeping empty segments (Spark split limit -1 semantics).
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < 3) {
      // Whole (lowercased) text joined by " " is the text itself.
      return new GenericArrayData(Array(hashBytes(bytes, 0, bytes.length)))
    }
    val wordHash = new Array[Long](nWords)
    var w = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        wordHash(w) = hashBytes(bytes, start, i - start)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nWords - 2)
    var s = 0
    while (s < nWords - 2) {
      out(s) = combine(combine(wordHash(s), wordHash(s + 1)), wordHash(s + 2))
      s += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs.head), "built-in")
}
