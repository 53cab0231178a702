package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.JsonSchemaRender
import org.scalatest.funsuite.AnyFunSuite

/** Pins the rendered JSON-Schema documents to the reference's README
  * examples (nifi-json-schema-generator/README.md:66-99 flat,
  * README.md:113-134 nested) and the dialect headers (JSG:91-120).
  */
class JsonSchemaRenderSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private def parse(s: String) = mapper.readTree(s)

  test("flat object → draft-07 schema with integer/boolean/email-format (README:66-99)") {
    val doc = """{"name":"John Doe","age":30,"email":"john@example.com","active":true}"""
    val got = parse(JsonSchemaRender.forDocument(doc).get)
    assert(got.get("$schema").asText() == "http://json-schema.org/draft-07/schema#")
    assert(got.get("type").asText() == "object")
    val p = got.get("properties")
    assert(p.get("name").get("type").asText() == "string")
    assert(p.get("age").get("type").asText() == "integer")
    assert(p.get("email").get("type").asText() == "string")
    assert(p.get("email").get("format").asText() == "email")
    assert(p.get("active").get("type").asText() == "boolean")
  }

  test("nested object with array of objects keeps structure (README:113-134)") {
    val doc =
      """{"person":{"name":"John","contacts":[
        |{"type":"email","value":"john@example.com"},
        |{"type":"phone","value":"555-1234"}]}}""".stripMargin
    val got = parse(JsonSchemaRender.forDocument(doc).get)
    val person = got.get("properties").get("person")
    assert(person.get("type").asText() == "object")
    val contacts = person.get("properties").get("contacts")
    assert(contacts.get("type").asText() == "array")
    val items = contacts.get("items")
    assert(items.get("type").asText() == "object")
    assert(items.get("properties").get("type").get("type").asText() == "string")
    assert(items.get("properties").get("value").get("type").asText() == "string")
  }

  test("format detection: date / date-time / uuid / uri (JSG:614-633)") {
    val doc =
      """{"d":"2023-05-12","dt":"2023-05-12T13:45:00Z",
        |"u":"123e4567-e89b-12d3-a456-426614174000","link":"https://example.com"}""".stripMargin
    val p = parse(JsonSchemaRender.forDocument(doc).get).get("properties")
    assert(p.get("d").get("type").asText() == "string" && p.get("d").get("format").asText() == "date")
    assert(p.get("dt").get("type").asText() == "string" && p.get("dt").get("format").asText() == "date-time")
    assert(p.get("u").get("format").asText() == "uuid")
    assert(p.get("link").get("format").asText() == "uri")
  }

  test("dialect headers; empty array → unconstrained items; null type; malformed → None") {
    val doc = """{"xs":[],"n":null,"mixed":[1,"a"]}"""
    for ((d, uri) <- JsonSchemaRender.Dialects) {
      assert(parse(JsonSchemaRender.forDocument(doc, d).get).get("$schema").asText() == uri)
    }
    val p = parse(JsonSchemaRender.forDocument(doc).get).get("properties")
    assert(p.get("xs").get("type").asText() == "array")
    assert(!p.get("xs").get("items").fieldNames().hasNext) // {} — JSG:538-541
    assert(p.get("n").get("type").asText() == "null")
    // mixed-type array → untyped item schema (JSG:533-536)
    assert(!p.get("mixed").get("items").has("type"))
    assert(JsonSchemaRender.forDocument("not json").isEmpty)
    assert(JsonSchemaRender.forDocument("[1,2]").isEmpty) // non-object root
  }

  test("required lists non-null present fields when requireAllFields (JSG:447-449,477-479)") {
    val doc = """{"a":1,"b":null,"c":"x"}"""
    val got = parse(JsonSchemaRender.forDocument(doc,
      JsonSchemaRender.Options(requireAllFields = true)).get)
    val req = got.get("required")
    assert(req != null && req.size() == 2)
    val names = (0 until req.size()).map(req.get(_).asText()).toSet
    assert(names == Set("a", "c"))
  }

  test("value-derived constraints: maxLength ≤100 (JSG:629-632), integer minimum (JSG:589-598)") {
    val long101 = "x" * 101
    val doc = s"""{"s":"short","big":"$long101","pos":5,"neg":-3}"""
    val p = parse(JsonSchemaRender.forDocument(doc).get).get("properties")
    assert(p.get("s").get("maxLength").asInt() == 100)
    assert(!p.get("big").has("maxLength")) // outlier rule
    assert(p.get("pos").get("minimum").asLong() == 0L)
    assert(p.get("neg").get("minimum").asLong() == Long.MinValue)
  }

  test("examples: primitive 'example', array 'examples' first-of-large (JSG:638-651)") {
    val doc = """{"s":"hello","n":7,"big":[1,2,3,4],"small":[1,2]}"""
    val p = parse(JsonSchemaRender.forDocument(doc,
      JsonSchemaRender.Options(includeExamples = true)).get).get("properties")
    assert(p.get("s").get("example").asText() == "hello")
    assert(p.get("n").get("example").asInt() == 7)
    assert(p.get("big").get("examples").get(0).asInt() == 1)   // size>2 → first element
    assert(p.get("small").get("examples").get(0).isArray)      // size≤2 → whole array
  }

  test("inferFieldTypes=false renders everything as string (JSG type inference toggle)") {
    val doc = """{"a":1,"b":true,"xs":[1,2],"ss":["x","y"]}"""
    val p = parse(JsonSchemaRender.forDocument(doc,
      JsonSchemaRender.Options(inferFieldTypes = false)).get).get("properties")
    assert(p.get("a").get("type").asText() == "string")
    assert(p.get("b").get("type").asText() == "string")
    // Sampled item types are compared against the COERCED type ("string"),
    // and only items 1..n-1 are compared — item 0 never is (JSG:518-536):
    // [1,2] degrades to an UNTYPED items schema, but [1] (empty loop) and
    // [1,"x"] (item 1 IS a string) both stay typed "string".
    assert(!p.get("xs").get("items").has("type"))
    assert(p.get("ss").get("items").get("type").asText() == "string")
    def items(doc: String) = parse(JsonSchemaRender.forDocument(doc,
      JsonSchemaRender.Options(inferFieldTypes = false)).get)
      .get("properties").get("xs").get("items")
    assert(items("""{"xs":[1]}""").get("type").asText() == "string")
    assert(items("""{"xs":[1,"x"]}""").get("type").asText() == "string")
    assert(!items("""{"xs":[1,2]}""").has("type"))
  }
}
