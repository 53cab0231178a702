package graft.infer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** JSON-document → Spark `StructType` inference, re-expressing the reference
  * schema generator's semantics (JSONSchemaGeneratorProcessor.java — "JSG")
  * as a pure function over Jackson trees:
  *
  *  - type lattice per `JSG:122-141` / detection per `JSG:388-401`:
  *    object→Struct, array→Array, textual→String (with format refinement),
  *    integral→Long, non-integral number→Double, boolean→Boolean,
  *    null→NullType, anything else→String (the UNKNOWN fallback `JSG:130`).
  *  - string format detection per `JSG:614-633`: `date` (\d{4}-\d{2}-\d{2})
  *    → DateType, ISO `date-time` prefix → TimestampType; uuid/email/uri stay
  *    String but are tagged in field metadata (`format` key).
  *  - array element inference is sample-bounded (`maxArraySamples`, default 5,
  *    `JSG:181-187,490`); inconsistent element types degrade to the merged /
  *    fallback type (`JSG:512-515`), empty arrays → ArrayType(NullType)
  *    (`JSG:538-541`) which widens on merge.
  *
  * Pure, deterministic, driver- or executor-side (no Spark context needed) —
  * used per micro-batch on a bounded sample of change-event payloads.
  */
object SchemaInfer {

  val DefaultMaxArraySamples = 5

  private val mapper = new ObjectMapper()

  // Format-detection regexes, per JSG:616-626.
  private val UuidRe = "(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val DateTimeRe = "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}.*$".r
  private val EmailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$".r
  private val UriRe = "^(https?|ftp)://.+$".r

  /** Infer the Spark type of a single JSON value node. */
  def inferValue(node: JsonNode, maxArraySamples: Int = DefaultMaxArraySamples): DataType = {
    if (node == null || node.isNull) NullType
    else if (node.isObject) inferObject(node, maxArraySamples)
    else if (node.isArray) inferArray(node, maxArraySamples)
    else if (node.isTextual) inferString(node.asText())
    else if (node.isIntegralNumber) LongType
    else if (node.isNumber) DoubleType
    else if (node.isBoolean) BooleanType
    else StringType // UNKNOWN fallback, JSG:130
  }

  private def inferObject(node: JsonNode, maxArraySamples: Int): StructType = {
    val fields = node.fields().asScala.map { e =>
      val dt = inferValue(e.getValue, maxArraySamples)
      StructField(e.getKey, dt, nullable = true, metadata = formatMetadata(e.getValue))
    }.toArray
    StructType(fields)
  }

  private def inferArray(node: JsonNode, maxArraySamples: Int): ArrayType = {
    val n = math.min(node.size(), maxArraySamples)
    if (n == 0) ArrayType(NullType, containsNull = true) // JSG:538-541
    else {
      // Merge sampled element types; inconsistent types degrade via the merge
      // lattice (worst case StringType) — JSG:512-515.
      var elem: DataType = NullType
      var i = 0
      while (i < n) {
        elem = SchemaMerge.merge(elem, inferValue(node.get(i), maxArraySamples))
        i += 1
      }
      ArrayType(elem, containsNull = true)
    }
  }

  private def inferString(s: String): DataType = s match {
    case DateRe()     => DateType
    case DateTimeRe() => TimestampType
    case _            => StringType
  }

  /** `format` tag for strings that stay StringType (uuid/email/uri), JSG:616-626. */
  private def formatMetadata(node: JsonNode): Metadata = {
    if (node != null && node.isTextual) {
      val s = node.asText()
      val fmt =
        if (UuidRe.findFirstIn(s).isDefined) Some("uuid")
        else if (EmailRe.findFirstIn(s).isDefined) Some("email")
        else if (UriRe.findFirstIn(s).isDefined) Some("uri")
        else None
      fmt.map(f => new MetadataBuilder().putString("format", f).build())
        .getOrElse(Metadata.empty)
    } else Metadata.empty
  }

  /** Infer the schema of one JSON document (must be an object at top level).
    * Returns None for malformed JSON or non-object roots — callers route
    * those to the dead-letter branch (parse-failure precedent JSG:293-298).
    */
  def inferDocument(json: String, maxArraySamples: Int = DefaultMaxArraySamples): Option[StructType] = {
    if (json == null) return None
    try {
      val node = mapper.readTree(json)
      if (node != null && node.isObject) Some(inferObject(node, maxArraySamples)) else None
    } catch { case _: Exception => None }
  }

  /** Fold inference over many documents (a bounded sample) into one merged
    * schema. Deterministic given input order; associative via SchemaMerge.
    */
  def inferAll(docs: IterableOnce[String], maxArraySamples: Int = DefaultMaxArraySamples): StructType = {
    docs.iterator.foldLeft(new StructType()) { (acc, doc) =>
      inferDocument(doc, maxArraySamples) match {
        case Some(s) => SchemaMerge.mergeStruct(acc, s)
        case None    => acc
      }
    }
  }
}
