package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Success-status-code spec parser, pinned to the reference's semantics
  * (InsecureInvokeHTTP.java:1421-1445): a comma list of `lo-hi` ranges and
  * exact codes; exact matches compare the TRIMMED token against the code's
  * string form; null/empty spec defaults to 2xx (:1442-1444). Driver-side
  * config parse → a single codegen'd Column predicate (SURVEY.md P4/F11).
  */
object StatusRange {

  case class Spec(ranges: Seq[(Int, Int)], exacts: Seq[Int]) {
    def matches(code: Int): Boolean =
      ranges.exists { case (lo, hi) => code >= lo && code <= hi } || exacts.contains(code)
  }

  /** "200-299, 304" → Spec(Seq((200,299)), Seq(304)). NumberFormatException
    * propagates like the reference's Integer.parseInt (:1430-1431).
    */
  def parse(spec: String): Spec = {
    if (spec == null || spec.trim.isEmpty) return Spec(Seq((200, 299)), Nil)
    val tokens = spec.split(",").map(_.trim).filter(_.nonEmpty)
    val (rangeTok, exactTok) = tokens.partition(_.contains("-"))
    Spec(
      rangeTok.toSeq.map { r =>
        val parts = r.split("-")
        (parts(0).trim.toInt, parts(1).trim.toInt)
      },
      exactTok.toSeq.map(_.toInt))
  }

  /** Column predicate: `code` matches the spec (routing predicate P4). */
  def predicate(code: Column, spec: Spec): Column = {
    val rangePreds = spec.ranges.map { case (lo, hi) => code.between(lo, hi) }
    val exactPred = if (spec.exacts.nonEmpty) Some(code.isin(spec.exacts: _*)) else None
    (rangePreds ++ exactPred).reduceOption(_ || _).getOrElse(lit(false))
  }

  def predicate(code: Column, spec: String): Column = predicate(code, parse(spec))
}
