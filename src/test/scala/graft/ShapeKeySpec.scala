package graft

import graft.infer.{SchemaInfer, ShapeKey}
import org.scalatest.funsuite.AnyFunSuite

/** The ShapeKey contract: (1) a scanner-accepted document is valid JSON that
  * Jackson also accepts, and (2) equal shape keys imply equal
  * SchemaInfer.inferDocument results — including the string-format
  * subtleties (date/date-time/uuid/email/uri, Java regex line-terminator
  * semantics) and the array sampling bound.
  */
class ShapeKeySpec extends AnyFunSuite {

  private def key(s: String): Option[String] = {
    val sb = new java.lang.StringBuilder
    if (ShapeKey.scan(s, sb, SchemaInfer.DefaultMaxArraySamples)) Some(sb.toString) else None
  }

  test("accepted documents are Jackson-valid; keys capture inference exactly") {
    val docs = Seq(
      """{"a":1,"b":"x"}""",
      """{"a":2,"b":"y"}""",                       // same shape as above
      """{"a":1.5,"b":"x"}""",                     // double ≠ long
      """{"a":1e3,"b":"x"}""",                     // exponent → double
      """{"b":"x","a":1}""",                       // field order differs
      """{"a":1,"b":"2026-01-02"}""",              // date
      """{"a":1,"b":"2026-01-02T10:11:12Z"}""",    // date-time
      """{"a":1,"b":"2026-01-02t10:11:12"}""",     // NOT date-time (lowercase t)
      """{"a":1,"b":"123e4567-e89b-12d3-a456-426614174000"}""", // uuid
      """{"a":1,"b":"user@example.com"}""",        // email
      """{"a":1,"b":"https://x.example/z"}""",     // uri
      """{"a":1,"b":"HTTPS://x.example/z"}""",     // NOT uri (case-sensitive)
      """{"a":1,"b":"plain text"}""",
      """{"a":true,"b":null}""",
      """{"a":[1,2,3],"b":{"c":"z"}}""",
      """{"a":[1,2,3,4,5,6,"x"],"b":1}""",         // 7th element beyond sample
      """{"a":[1,2,3,4,5,6,false],"b":1}""",       // differs only past the bound
      """{"a":[],"b":[["x"],["y"]]}""",
      """{"t":"line1\nline2"}""",                  // escaped newline
      """{"t":"2026-01-02\n"}""",                  // trailing \n: $ still matches → date
      """{"t":"2026-01-02\nx"}""",                 // interior terminator → plain
      """{"t":"user@example.com\n"}""",            // trailing \n email
      """{"t":"ABC"}""",                      // unicode escape
      """{ "a" : 1 , "b" : [ 1 , 2 ] }"""          // whitespace
    )
    val keyed = docs.flatMap(d => key(d).map(k => (d, k)))
    // every doc above is scanner-representable
    assert(keyed.size == docs.size, s"scanner rejected: ${docs.filter(key(_).isEmpty)}")
    for (((d1, k1), i) <- keyed.zipWithIndex; (d2, k2) <- keyed.drop(i + 1)) {
      val s1 = SchemaInfer.inferDocument(d1)
      val s2 = SchemaInfer.inferDocument(d2)
      assert(s1.isDefined && s2.isDefined, s"Jackson rejected a scanner-accepted doc: $d1 / $d2")
      if (k1 == k2)
        assert(s1 == s2, s"equal keys but different inference:\n  $d1 -> ${s1.get.toDDL}\n  $d2 -> ${s2.get.toDDL}")
    }
    // spot-check intended equalities/inequalities
    assert(key(docs(0)) == key(docs(1)))          // same shape
    assert(key(docs(0)) != key(docs(2)))          // long vs double
    assert(key(docs(0)) != key(docs(4)))          // field order
    assert(key(docs(15)) == key(docs(16)))        // divergence past the sample bound is invisible
  }

  test("non-canonical / invalid / unsupported input falls back (returns false)") {
    val fallback = Seq(
      """{"a":01}""",            // leading zero: invalid JSON
      """{"a":1""",              // truncated
      """{"a":1}x""",            // trailing garbage (Jackson readTree tolerates → must not key it)
      """{"a":+1}""",            // plus sign: invalid
      """{"a":.5}""",            // missing int part
      """{"a":1,}""",            // trailing comma
      """{"a" 1}""",             // missing colon
      """{"a":"\q"}""",          // bad escape
      """{"a":"unterminated""",  // unterminated string
      "{\"a\":\"raw\nnewline\"}", // raw control char in string
      null
    )
    fallback.foreach(d => assert(key(d).isEmpty, s"scanner should have rejected: $d"))
  }

  test("non-object roots are keyable and consistently inference-invalid") {
    // valid JSON the scanner CAN certify, but inference rejects (non-object
    // root): equal keys → both None, so the shape cache records them as
    // dead-letter shapes after a single Jackson call.
    val roots = Seq("""[1,2]""", """[3,4]""", """"str"""", "7")
    roots.foreach { d =>
      assert(key(d).isDefined, s"scanner should key valid JSON root: $d")
      assert(SchemaInfer.inferDocument(d).isEmpty, s"inference must reject non-object root: $d")
    }
    assert(key(roots(0)) == key(roots(1)))
  }

  test("scanner validity never contradicts Jackson on accepted docs (fuzz)") {
    // deterministic pseudo-random JSON-ish strings: mutate valid docs
    val base = """{"role":"assistant","text":"msg email=a@b.co","ts":"2026-01-01T00:02:03Z","tokens":423,"score":1.5,"flags":[true,null,2]}"""
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val chars = base.toCharArray
      val n = rnd.nextInt(3)
      (0 until n).foreach { _ =>
        chars(rnd.nextInt(chars.length)) = "{}[]\",:0123456789abcTZ.-\\ ".charAt(rnd.nextInt(26))
      }
      val doc = new String(chars)
      key(doc).foreach { _ =>
        // scanner accepted → Jackson must parse it (validity never diverges)
        assert(SchemaInfer.inferDocument(doc).isDefined,
          s"scanner accepted a doc Jackson rejects: $doc")
      }
    }
  }
}
