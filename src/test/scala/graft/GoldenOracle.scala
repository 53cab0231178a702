package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Single-threaded reference applier (FIXTURES.md §2 "Oracle"): a HashMap of
  * key → row image, events applied in global LSN order; whole-row replace on
  * I/U (after is a full row image), delete on D, malformed lines skipped.
  * Independent of all engine code paths.
  */
object GoldenOracle {

  private val mapper = new ObjectMapper()
  private val validOps = Set("I", "U", "D")

  case class Event(op: String, lsn: Long, convId: String, turnIdx: Int,
                   after: Option[Map[String, Any]])

  def parseLine(line: String): Option[Event] = {
    try {
      val n = mapper.readTree(line)
      if (n == null || !n.isObject) return None
      val op = Option(n.get("op")).filter(_.isTextual).map(_.asText()).orNull
      val lsn = Option(n.get("lsn")).filter(_.isIntegralNumber).map(_.asLong())
      val conv = Option(n.get("conv_id")).filter(_.isTextual).map(_.asText())
      val turn = Option(n.get("turn_idx")).filter(_.isIntegralNumber).map(_.asInt())
      if (op == null || !validOps.contains(op) || lsn.isEmpty || conv.isEmpty || turn.isEmpty)
        return None
      val after = Option(n.get("after")).filter(_.isObject).map(toMap)
      if (op != "D" && after.isEmpty) return None
      Some(Event(op, lsn.get, conv.get, turn.get, after))
    } catch { case _: Exception => None }
  }

  private def toMap(n: JsonNode): Map[String, Any] =
    n.fields().asScala.map { e =>
      val v: Any = e.getValue match {
        case x if x.isNull => null
        case x if x.isTextual => x.asText()
        case x if x.isIntegralNumber => x.asLong()
        case x if x.isNumber => x.asDouble()
        case x if x.isBoolean => x.asBoolean()
        case x => x.toString
      }
      e.getKey -> v
    }.toMap

  /** Final converged state: key → row image of the winning (max-LSN) event. */
  def converge(lines: Seq[String]): Map[(String, Int), Map[String, Any]] = {
    val events = lines.flatMap(parseLine).sortBy(_.lsn)
    val state = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Map[String, Any]]
    events.foreach { e =>
      val k = (e.convId, e.turnIdx)
      if (e.op == "D") state.remove(k) else state(k) = e.after.get
    }
    state.toMap
  }

  def malformedCount(lines: Seq[String]): Int = lines.count(l => parseLine(l).isEmpty)
}
