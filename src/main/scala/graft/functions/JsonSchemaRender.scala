package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.infer.SchemaInfer
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** JSON-Schema document generation — the reference's primary output artifact
  * (JSONSchemaGeneratorProcessor.java). Two surfaces:
  *
  *  - [[forDocument]]: per-record schema document, a faithful re-expression
  *    of the reference's tree walk: object `required` lists (JSG:428-480),
  *    sampled array item schemas with the consistency degrade (JSG:485-552),
  *    string format detection + `maxLength` (JSG:614-633), integer
  *    `minimum` (JSG:589-598), `example`/`examples` (JSG:638-651), dialect
  *    headers (JSG:91-120, draft-07 default :118).
  *  - [[render]]: a Spark `StructType` (e.g. the evolved table schema) as a
  *    JSON-Schema document — structural + format metadata only.
  */
object JsonSchemaRender {

  /** Dialect → `$schema` URI (JSG:91-120; default draft-07 `JSG:118`). */
  val Dialects: Map[String, String] = Map(
    "draft-07" -> "http://json-schema.org/draft-07/schema#",
    "2019-09" -> "https://json-schema.org/draft/2019-09/schema",
    "2020-12" -> "https://json-schema.org/draft/2020-12/schema")

  /** Mirrors the reference's SchemaContext properties (JSG:150-196). */
  case class Options(dialect: String = "draft-07",
                     inferFieldTypes: Boolean = true,
                     requireAllFields: Boolean = false,
                     includeExamples: Boolean = false,
                     maxArraySamples: Int = SchemaInfer.DefaultMaxArraySamples,
                     pretty: Boolean = false)

  private val mapper = new ObjectMapper()

  /** JSON-Schema document for one JSON record. `None` for malformed input or
    * a non-object root (dead-letter precedent JSG:293-298).
    */
  def forDocument(json: String, opts: Options): Option[String] = {
    if (json == null) return None
    val node = try mapper.readTree(json) catch { case _: Exception => return None }
    if (node == null || !node.isObject) return None
    val root = mapper.createObjectNode()
    root.put("$schema", Dialects.getOrElse(opts.dialect, Dialects("draft-07")))
    analyze(root, node, opts)
    Some(if (opts.pretty) mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
         else mapper.writeValueAsString(root))
  }

  def forDocument(json: String, dialect: String = "draft-07",
                  pretty: Boolean = false): Option[String] =
    forDocument(json, Options(dialect = dialect, pretty = pretty))

  // JSG:122-141 type names via detection order JSG:388-401.
  private def typeName(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isIntegralNumber) "integer"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else "string" // UNKNOWN fallback, JSG:130

  private def analyze(into: ObjectNode, n: JsonNode, opts: Options): Unit = typeName(n) match {
    case "object" => analyzeObject(into, n, opts)
    case "array" => analyzeArray(into, n, opts)
    case t => analyzePrimitive(into, n, t, opts)
  }

  /** JSG:428-480: properties + required (present && non-null fields). */
  private def analyzeObject(into: ObjectNode, n: JsonNode, opts: Options): Unit = {
    into.put("type", "object")
    val props = into.putObject("properties")
    val required = mapper.createArrayNode()
    n.fields().asScala.foreach { e =>
      val fieldSchema = props.putObject(e.getKey)
      if (opts.requireAllFields && !e.getValue.isNull) required.add(e.getKey)
      analyze(fieldSchema, e.getValue, opts)
    }
    if (required.size() > 0) into.set[ObjectNode]("required", required)
  }

  /** JSG:485-552: first item as template; inconsistent sampled types degrade
    * to an unconstrained item schema; empty array → generic items.
    */
  private def analyzeArray(into: ObjectNode, n: JsonNode, opts: Options): Unit = {
    into.put("type", "array")
    val items = into.putObject("items")
    val itemCount = math.min(n.size(), opts.maxArraySamples)
    if (itemCount > 0) {
      val firstType = typeName(n.get(0))
      val consistent = (1 until itemCount).forall(i => typeName(n.get(i)) == firstType)
      if (firstType == "object" || firstType == "array") {
        if (consistent) analyze(items, n.get(0), opts)
        // else: unconstrained items (JSG:512-515)
      } else {
        // With inferFieldTypes=false the reference sets itemType to the
        // COERCED type ("string") and compares only items 1..n-1 against it
        // — item 0's actual type is never checked (JSG:518-536). So [1]
        // (empty loop) and [1,"x"] both emit items typed "string", while
        // [1,2] degrades to untyped items.
        val target = if (opts.inferFieldTypes) firstType else "string"
        val matchesTarget =
          if (opts.inferFieldTypes) consistent
          else (1 until itemCount).forall(i => typeName(n.get(i)) == target)
        if (matchesTarget) items.put("type", target)
      } // else: mixed simple types → untyped items (JSG:533-536)
    } // else: empty array → generic item schema (JSG:538-541)
    if (opts.includeExamples && n.size() > 0) {
      val example = if (n.size() > 2) n.get(0) else n
      into.set[ObjectNode]("examples", mapper.createArrayNode().add(example))
    }
  }

  /** JSG:557-584 + numeric/string constraints + example. */
  private def analyzePrimitive(into: ObjectNode, n: JsonNode, t: String, opts: Options): Unit = {
    into.put("type", if (opts.inferFieldTypes) t else "string")
    t match {
      case "integer" => // JSG:589-598
        into.put("minimum", if (n.asLong() < 0) Long.MinValue else 0L)
      case "string" if n.isTextual => stringConstraints(into, n.asText())
      case _ =>
    }
    if (opts.includeExamples && !n.isNull) {
      if (n.isTextual) into.put("example", n.asText())
      else if (n.isInt) into.put("example", n.asInt())
      else if (n.isLong) into.put("example", n.asLong())
      else if (n.isDouble || n.isFloat) into.put("example", n.asDouble())
      else if (n.isBoolean) into.put("example", n.asBoolean())
    }
  }

  /** JSG:614-633: first-match format tag + maxLength for strings ≤100. */
  private def stringConstraints(into: ObjectNode, v: String): Unit = {
    if (v.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"))
      into.put("format", "uuid")
    else if (v.matches("\\d{4}-\\d{2}-\\d{2}")) into.put("format", "date")
    else if (v.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}.*")) into.put("format", "date-time")
    else if (v.matches("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}")) into.put("format", "email")
    else if (v.toLowerCase.startsWith("http://") || v.toLowerCase.startsWith("https://"))
      into.put("format", "uri")
    if (v.nonEmpty && v.length <= 100) into.put("maxLength", 100)
  }

  // ------------------------------------------------- StructType rendering

  def render(schema: StructType, dialect: String = "draft-07",
             pretty: Boolean = false): String = {
    val root = mapper.createObjectNode()
    root.put("$schema", Dialects.getOrElse(dialect, Dialects("draft-07")))
    emitStruct(schema, root)
    if (pretty) mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    else mapper.writeValueAsString(root)
  }

  private def emitStruct(s: StructType, into: ObjectNode): Unit = {
    into.put("type", "object")
    val props = into.putObject("properties")
    s.fields.foreach { f =>
      val fn = props.putObject(f.name)
      emitType(f.dataType, fn)
      // format tag for strings that stayed StringType (uuid/email/uri,
      // JSG:622-626); date/date-time became typed and re-emit as
      // string+format below (JSG:618-621).
      if (f.metadata.contains("format"))
        fn.put("format", f.metadata.getString("format"))
    }
  }

  private def emitType(dt: DataType, into: ObjectNode): Unit = dt match {
    case st: StructType => emitStruct(st, into)
    case ArrayType(elem, _) =>
      into.put("type", "array")
      elem match {
        case NullType => into.putObject("items") // unconstrained items, JSG:538-541
        case e => emitType(e, into.putObject("items"))
      }
    case LongType | IntegerType | ShortType | ByteType => into.put("type", "integer")
    case DoubleType | FloatType | _: DecimalType => into.put("type", "number")
    case BooleanType => into.put("type", "boolean")
    case NullType => into.put("type", "null") // JSG:398-399
    case DateType =>
      into.put("type", "string"); into.put("format", "date") // JSG:618-619
    case TimestampType =>
      into.put("type", "string"); into.put("format", "date-time") // JSG:620-621
    case _ => into.put("type", "string") // UNKNOWN fallback, JSG:130
  }
}
