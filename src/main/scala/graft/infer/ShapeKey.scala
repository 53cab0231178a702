package graft.infer

/** Single-pass JSON shape scanner — the cheap front half of the per-batch
  * inference scan (MergeApply.scanBatch). For a conforming document it emits
  * a canonical SHAPE KEY (key order, nesting, and per-value type tags,
  * including the string format classes SchemaInfer's type mapping depends
  * on) such that **equal shape keys imply equal
  * `SchemaInfer.inferDocument` results** — so a batch with a handful of
  * distinct payload shapes pays the full Jackson tree parse only once per
  * shape instead of once per document.
  *
  * The scanner is STRICT: it returns `false` (→ caller falls back to the
  * Jackson path) for anything it cannot prove is JSON whose inference the
  * key captures — it never decides validity on its own, so dead-letter
  * semantics are bit-identical to the Jackson-only path.
  *
  * Value tags: `i` integral, `n` non-integral number, `b` boolean, `z` null,
  * `d` date string, `t` date-time string, `u`/`e`/`r` uuid/email/uri
  * format-tagged strings, `s` plain string (mirrors SchemaInfer.inferString
  * / formatMetadata, JSG:614-633). Array element tags are recorded only for
  * the first `maxArraySamples` elements — the same sampling bound inference
  * itself uses (JSG:181-187,490); the rest are validated but untagged.
  */
object ShapeKey {

  private val MaxDepth = 40

  // Reuses SchemaInfer's regexes where a manual check would be error-prone.
  private val EmailRe = java.util.regex.Pattern
    .compile("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")

  /** Scan `s`; on success append the shape key to `sb` and return true. */
  def scan(s: String, sb: java.lang.StringBuilder, maxArraySamples: Int): Boolean = {
    if (s == null) return false
    val scanner = new Scanner(s, sb, maxArraySamples)
    val ok = scanner.value(0, record = true)
    ok && !scanner.failed && { scanner.skipWs(); scanner.pos == s.length }
  }

  private final class Scanner(s: String, sb: java.lang.StringBuilder, maxSamples: Int) {
    var pos = 0
    var failed = false
    private val len = s.length
    // scratch for decoding escaped strings before format classification
    private var scratch: java.lang.StringBuilder = null

    def skipWs(): Unit = {
      while (pos < len && {
        val c = s.charAt(pos)
        c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }) pos += 1
    }

    private def fail(): Boolean = { failed = true; false }

    def value(depth: Int, record: Boolean): Boolean = {
      if (depth > MaxDepth) return fail()
      skipWs()
      if (pos >= len) return fail()
      s.charAt(pos) match {
        case '{' => obj(depth, record)
        case '[' => arr(depth, record)
        case '"' => string(record, asKey = false)
        case 't' => literal("true", if (record) 'b' else ' ', record)
        case 'f' => literal("false", if (record) 'b' else ' ', record)
        case 'n' => literal("null", if (record) 'z' else ' ', record)
        case c if c == '-' || (c >= '0' && c <= '9') => number(record)
        case _ => fail()
      }
    }

    private def obj(depth: Int, record: Boolean): Boolean = {
      pos += 1 // '{'
      if (record) sb.append('{')
      skipWs()
      if (pos < len && s.charAt(pos) == '}') { pos += 1; if (record) sb.append('}'); return true }
      var first = true
      while (true) {
        if (!first) {
          skipWs()
          if (pos >= len || s.charAt(pos) != ',') return fail()
          pos += 1
          if (record) sb.append(',')
        }
        first = false
        skipWs()
        if (pos >= len || s.charAt(pos) != '"') return fail()
        if (!string(record, asKey = true)) return fail()
        skipWs()
        if (pos >= len || s.charAt(pos) != ':') return fail()
        pos += 1
        if (record) sb.append(':')
        if (!value(depth + 1, record)) return fail()
        skipWs()
        if (pos < len && s.charAt(pos) == '}') { pos += 1; if (record) sb.append('}'); return true }
      }
      true
    }

    private def arr(depth: Int, record: Boolean): Boolean = {
      pos += 1 // '['
      if (record) sb.append('[')
      skipWs()
      if (pos < len && s.charAt(pos) == ']') { pos += 1; if (record) sb.append(']'); return true }
      var i = 0
      while (true) {
        if (i > 0) {
          skipWs()
          if (pos >= len || s.charAt(pos) != ',') return fail()
          pos += 1
          if (record && i < maxSamples) sb.append(',')
        }
        if (!value(depth + 1, record && i < maxSamples)) return fail()
        i += 1
        skipWs()
        if (pos < len && s.charAt(pos) == ']') { pos += 1; if (record) sb.append(']'); return true }
      }
      true
    }

    private def literal(lit: String, tag: Char, record: Boolean): Boolean = {
      if (!s.startsWith(lit, pos)) return fail()
      pos += lit.length
      if (record) sb.append(tag)
      true
    }

    /** Strict JSON number; tag 'i' (integral) / 'n' (has . or exponent). */
    private def number(record: Boolean): Boolean = {
      val start = pos
      if (s.charAt(pos) == '-') pos += 1
      if (pos >= len) return fail()
      // int part: 0 | [1-9][0-9]*
      if (s.charAt(pos) == '0') pos += 1
      else if (s.charAt(pos) >= '1' && s.charAt(pos) <= '9') {
        while (pos < len && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') pos += 1
      } else return fail()
      var integral = true
      if (pos < len && s.charAt(pos) == '.') {
        integral = false
        pos += 1
        if (pos >= len || s.charAt(pos) < '0' || s.charAt(pos) > '9') return fail()
        while (pos < len && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') pos += 1
      }
      if (pos < len && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        integral = false
        pos += 1
        if (pos < len && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        if (pos >= len || s.charAt(pos) < '0' || s.charAt(pos) > '9') return fail()
        while (pos < len && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') pos += 1
      }
      if (pos == start) return fail()
      if (record) sb.append(if (integral) 'i' else 'n')
      true
    }

    /** String scan with escape validation. Keys are recorded raw (quotes
      * included); values are recorded as their format-class tag.
      */
    private def string(record: Boolean, asKey: Boolean): Boolean = {
      val start = pos
      pos += 1 // opening quote
      var hasEscape = false
      while (pos < len) {
        val c = s.charAt(pos)
        if (c == '"') {
          val inner = if (!hasEscape) null else decode(start + 1, pos)
          if (inner == null && hasEscape) return fail()
          pos += 1
          if (record) {
            if (asKey) sb.append(s, start, pos) // raw slice incl. quotes
            else {
              val v: CharSequence = if (hasEscape) inner else s.subSequence(start + 1, pos - 1)
              sb.append(classify(v))
            }
          }
          return true
        } else if (c == '\\') {
          hasEscape = true
          pos += 1
          if (pos >= len) return fail()
          s.charAt(pos) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => pos += 1
            case 'u' =>
              if (pos + 4 >= len) return fail()
              var k = 1
              while (k <= 4) {
                val h = s.charAt(pos + k)
                if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F')))
                  return fail()
                k += 1
              }
              pos += 5
            case _ => return fail()
          }
        } else if (c < 0x20) return fail() // raw control char: invalid JSON
        else pos += 1
      }
      fail() // unterminated
    }

    /** Decode the escaped string body s[from,to) (used only for format
      * classification — must match Jackson's decoding).
      */
    private def decode(from: Int, to: Int): String = {
      if (scratch == null) scratch = new java.lang.StringBuilder(32)
      scratch.setLength(0)
      var i = from
      while (i < to) {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => scratch.append('"'); i += 1
            case '\\' => scratch.append('\\'); i += 1
            case '/' => scratch.append('/'); i += 1
            case 'b' => scratch.append('\b'); i += 1
            case 'f' => scratch.append('\f'); i += 1
            case 'n' => scratch.append('\n'); i += 1
            case 'r' => scratch.append('\r'); i += 1
            case 't' => scratch.append('\t'); i += 1
            case 'u' =>
              scratch.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 5
            case _ => return null
          }
        } else { scratch.append(c); i += 1 }
      }
      scratch.toString
    }

    // ---- format classification, mirroring SchemaInfer.inferString +
    // formatMetadata exactly (same patterns, same precedence) ----

    private def digits(v: CharSequence, from: Int, to: Int): Boolean = {
      var i = from
      while (i < to) { val c = v.charAt(i); if (c < '0' || c > '9') return false; i += 1 }
      true
    }

    private def isDate(v: CharSequence): Boolean =
      v.length == 10 && digits(v, 0, 4) && v.charAt(4) == '-' &&
        digits(v, 5, 7) && v.charAt(7) == '-' && digits(v, 8, 10)

    private def isDateTime(v: CharSequence): Boolean =
      v.length >= 19 && digits(v, 0, 4) && v.charAt(4) == '-' &&
        digits(v, 5, 7) && v.charAt(7) == '-' && digits(v, 8, 10) &&
        (v.charAt(10) == 'T' || v.charAt(10) == ' ') &&
        digits(v, 11, 13) && v.charAt(13) == ':' &&
        digits(v, 14, 16) && v.charAt(16) == ':' && digits(v, 17, 19)

    private def hexChars(v: CharSequence, from: Int, to: Int): Boolean = {
      var i = from
      while (i < to) {
        val c = v.charAt(i)
        if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
          return false
        i += 1
      }
      true
    }

    private def isUuid(v: CharSequence): Boolean =
      v.length == 36 && v.charAt(8) == '-' && v.charAt(13) == '-' &&
        v.charAt(18) == '-' && v.charAt(23) == '-' &&
        hexChars(v, 0, 8) && hexChars(v, 9, 13) && hexChars(v, 14, 18) &&
        hexChars(v, 19, 23) && hexChars(v, 24, 36)

    private def isUri(v: CharSequence): Boolean = {
      val str = v.toString
      (str.startsWith("http://") && str.length > 7) ||
        (str.startsWith("https://") && str.length > 8) ||
        (str.startsWith("ftp://") && str.length > 6)
    }

    private def hasAt(v: CharSequence): Boolean = {
      var i = 0
      while (i < v.length) { if (v.charAt(i) == '@') return true; i += 1 }
      false
    }

    private def isTerm(c: Char): Boolean =
      c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

    /** Java-regex `$`/`.` line-terminator semantics, replicated: the
      * reference patterns are `$`-anchored and none of their elements can
      * match a line terminator, so a match allows exactly ONE trailing
      * terminator sequence and no interior ones. Strip the trailing
      * sequence; any terminator left means every format pattern fails
      * (plain string).
      */
    private def classify(v0: CharSequence): Char = {
      var end = v0.length
      if (end > 0 && v0.charAt(end - 1) == '\n' && end > 1 && v0.charAt(end - 2) == '\r') end -= 2
      else if (end > 0 && isTerm(v0.charAt(end - 1))) end -= 1
      val v = v0.subSequence(0, end)
      var i = 0
      while (i < v.length) { if (isTerm(v.charAt(i))) return 's'; i += 1 }
      if (isDate(v)) 'd'
      else if (isDateTime(v)) 't'
      else if (isUuid(v)) 'u'
      else if (hasAt(v) && EmailRe.matcher(v).matches()) 'e'
      else if (isUri(v)) 'r'
      else 's'
    }
  }
}
