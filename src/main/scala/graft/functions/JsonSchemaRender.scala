package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.infer.SchemaInfer
import org.apache.spark.sql.types._

/** Render an inferred Spark schema as a JSON-Schema document — the
  * reference's actual output artifact (JSONSchemaGeneratorProcessor.java:
  * schema assembly 356-382, type emission 557-584, format tags 614-633,
  * dialect headers 91-120 with draft-07 default :118).
  *
  * Structural + format semantics are carried over exactly; value-derived
  * annotations (examples :638-651, maxLength :629-632, minimum :589-598)
  * are inference-time statistics the engine does not retain and are
  * deliberately out of scope.
  */
object JsonSchemaRender {

  /** Dialect → `$schema` URI (JSG:91-120; default draft-07 `JSG:118`). */
  val Dialects: Map[String, String] = Map(
    "draft-07" -> "http://json-schema.org/draft-07/schema#",
    "2019-09" -> "https://json-schema.org/draft/2019-09/schema",
    "2020-12" -> "https://json-schema.org/draft/2020-12/schema")

  private val mapper = new ObjectMapper()

  /** JSON-Schema document for one JSON record: infer (JSG semantics) then
    * render. `None` for malformed/non-object input (dead-letter precedent
    * JSG:293-298). `pretty` mirrors the Pretty Print property (JSG:316-321).
    */
  def forDocument(json: String, dialect: String = "draft-07",
                  pretty: Boolean = false): Option[String] =
    SchemaInfer.inferDocument(json).map(render(_, dialect, pretty))

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
