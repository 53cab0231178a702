package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch over a token stream as a typed [[Aggregator]] — the
  * §2.10 custom-aggregation tier the built-ins genuinely cannot express: a
  * FIXED-SIZE mergeable frequency summary. A token-frequency `groupBy`
  * shuffles |vocab| keys (at 100 TB: billions of rows, skewed by stopwords);
  * this aggregator reduces every partition to one `depth × width` Long
  * buffer (default 4 × 4096 = 128 KiB), merged cell-wise — so the exchange
  * moves O(partitions) buffers, never vocab keys, and a hot stopword costs
  * exactly one array increment per occurrence (perfect map-side combine, no
  * skewed reduce key at all). Estimates carry the standard CMS guarantee:
  * never under the true count, over by at most ~N·e/width per depth row with
  * probability 1−e^−depth (Cormode & Muthukrishnan 2005).
  *
  * Determinism / oracle reproducibility: cell of `token` at depth `d` is the
  * first `hexChars` hex chars of md5("d:token") parsed base-16 — the same
  * md5-prefix idiom the repo's sampling/banding oracles use, so DuckDB
  * recomputes every cell bit-identically (`substr(md5(d || ':' || tok), 1,
  * h)`) with no float or engine-specific hash anywhere.
  *
  * Reference tie-in: the reference's per-record attribute pipelines have no
  * aggregation tier at all; this is the training-data battery's corpus
  * statistics member (vocabulary heavy-hitters for tokenizer/quality work)
  * at the only shape that survives 10^12-token corpora.
  */
class CmsSketch(val depth: Int = 4, val hexChars: Int = 3)
    extends Aggregator[String, Array[Long], Array[Long]] {
  // 7 hex chars = 2^28 cells/row — past that the Int shift wraps (1 << 32
  // is 1 on the JVM) and cell() would parse 8+ hex chars into a sign bit.
  require(depth >= 1 && hexChars >= 1 && hexChars <= 7,
    s"CmsSketch: need depth >= 1 and 1 <= hexChars <= 7, got depth=$depth hexChars=$hexChars")
  val width: Int = 1 << (4 * hexChars)

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(buf: Array[Long], token: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CmsSketch.cell(d, token, hexChars)) += 1L
      d += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CmsSketch {
  // MessageDigest is not thread-safe and getInstance per token is hot-path
  // allocation; one instance per executor thread.
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 — bit-identical to Spark's `md5()` and DuckDB's
    * `md5()` (all three are MD5 over UTF-8 bytes, lowercase hex render).
    */
  def md5Hex(s: String): String = {
    val dig = md5.get()
    dig.reset()
    val bytes = dig.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Cell index of `token` at depth `d`: first `hexChars` hex chars of
    * md5("d:token") base-16 — a uniform hash prefix, reproducible verbatim
    * in DuckDB as `substr(md5(d || ':' || tok), 1, hexChars)`.
    */
  def cell(d: Int, token: String, hexChars: Int): Int =
    java.lang.Integer.parseInt(md5Hex(d.toString + ":" + token).substring(0, hexChars), 16)

  /** CMS point query: min over depths of the token's cell — never below the
    * true count.
    */
  def estimate(sketch: Array[Long], token: String, depth: Int, hexChars: Int): Long = {
    val width = 1 << (4 * hexChars)
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch(d * width + cell(d, token, hexChars))
      if (v < best) best = v
      d += 1
    }
    best
  }
}
