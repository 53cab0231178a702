package graft

import graft.infer.{SchemaInfer, SchemaMerge}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixtures pinned to the reference's schema generator behavior
  * (JSONSchemaGeneratorProcessor.java; README examples as golden specs —
  * FIXTURES.md §4).
  */
class SchemaInferSpec extends AnyFunSuite {

  private def infer(json: String): StructType = SchemaInfer.inferDocument(json).get

  test("flat object: string/integer/number/boolean/null types (JSG:388-401)") {
    val s = infer("""{"name":"John","age":30,"height":1.82,"active":true,"nick":null}""")
    assert(s("name").dataType == StringType)
    assert(s("age").dataType == LongType)       // integral → Long (JSG:394)
    assert(s("height").dataType == DoubleType)  // non-integral → Double (JSG:395)
    assert(s("active").dataType == BooleanType)
    assert(s("nick").dataType == NullType)      // null detection (JSG:398)
  }

  test("format detection: date/date-time become typed, email/uuid/uri tagged (JSG:614-633)") {
    val s = infer(
      """{"d":"2026-01-01","dt":"2026-01-01T12:00:00Z",
        |"e":"john@example.com","u":"123e4567-e89b-12d3-a456-426614174000",
        |"uri":"https://example.com/a","plain":"hello"}""".stripMargin.replace("\n", ""))
    assert(s("d").dataType == DateType)
    assert(s("dt").dataType == TimestampType)
    assert(s("e").dataType == StringType && s("e").metadata.getString("format") == "email")
    assert(s("u").dataType == StringType && s("u").metadata.getString("format") == "uuid")
    assert(s("uri").dataType == StringType && s("uri").metadata.getString("format") == "uri")
    assert(s("plain").dataType == StringType && !s("plain").metadata.contains("format"))
  }

  test("nested object with array of objects (README nested example)") {
    val s = infer("""{"user":{"name":"a","tags":["x","y"]},"items":[{"id":1},{"id":2}]}""")
    val user = s("user").dataType.asInstanceOf[StructType]
    assert(user("tags").dataType == ArrayType(StringType, containsNull = true))
    val items = s("items").dataType.asInstanceOf[ArrayType]
    assert(items.elementType.asInstanceOf[StructType]("id").dataType == LongType)
  }

  test("mixed-type array degrades to fallback type (JSG:512-515)") {
    val s = infer("""{"a":[1,"two",3]}""")
    assert(s("a").dataType == ArrayType(StringType, containsNull = true))
  }

  test("int+double array widens to double") {
    val s = infer("""{"a":[1,2.5]}""")
    assert(s("a").dataType == ArrayType(DoubleType, containsNull = true))
  }

  test("empty array → generic (Null) items, widened on merge (JSG:538-541)") {
    val s = infer("""{"a":[]}""")
    assert(s("a").dataType == ArrayType(NullType, containsNull = true))
    val merged = SchemaMerge.mergeStruct(s, infer("""{"a":[4]}"""))
    assert(merged("a").dataType == ArrayType(LongType, containsNull = true))
  }

  test("array sampling bound: only first maxArraySamples elements inspected (JSG:490)") {
    // 6th element is a string but default sample=5 → stays Long
    val s = infer("""{"a":[1,2,3,4,5,"surprise"]}""")
    assert(s("a").dataType == ArrayType(LongType, containsNull = true))
    val s2 = SchemaInfer.inferDocument("""{"a":[1,2,3,4,5,"surprise"]}""", maxArraySamples = 6).get
    assert(s2("a").dataType == ArrayType(StringType, containsNull = true))
  }

  test("malformed JSON / non-object root → None (dead-letter, JSG:293-298)") {
    assert(SchemaInfer.inferDocument("""{"a": BROKEN""").isEmpty)
    assert(SchemaInfer.inferDocument("""[1,2]""").isEmpty)
    assert(SchemaInfer.inferDocument(null).isEmpty)
  }

  test("inferAll merges across documents") {
    val s = SchemaInfer.inferAll(Seq(
      """{"a":1}""", """{"a":2.5,"b":"x"}""", """not json""", """{"c":"2026-01-01"}"""))
    assert(s("a").dataType == DoubleType)
    assert(s("b").dataType == StringType)
    assert(s("c").dataType == DateType)
  }
}
