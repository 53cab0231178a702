package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Commit-gate data-quality constraints for the write-audit-publish flow
  * (the "A" of WAP — Delta CHECK-constraint / Deequ-verification analogue,
  * run between [[IceLite.beginStage]] and [[IceLite.publish]]).
  *
  * A constraint is a named SQL boolean expression over the table's public
  * columns; a row VIOLATES it when the predicate is not TRUE (`NULL` counts
  * as a violation — unknown does not pass a gate). The scan is one
  * aggregate pass computing every constraint's violation count together.
  *
  * At 100 TB the load-bearing choice is WHAT gets scanned:
  * [[stagedViolations]] audits only the staged NET CHANGE —
  * `IceLite.changesBetween(published, head)` live rows, manifest-pruned by
  * LSN zone maps to the staged delta files — so the audit costs
  * O(staged batch), never O(table). Rows the stage didn't touch were
  * audited by the window that published them.
  */
object Audit {

  /** Violation counts for each named predicate over `df`: one narrow
    * aggregate pass, returned long-form as (constraint, violations) in
    * constraint-name order.
    */
  def violations(df: DataFrame, constraints: Seq[(String, String)]): DataFrame = {
    require(constraints.nonEmpty, "at least one constraint")
    val aggs = constraints.map { case (name, pred) =>
      sum(when(coalesce(expr(pred), lit(false)), 0L).otherwise(1L)).as(name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // count over empty input is the usual SQL null — an empty stage has
    // zero violations, not unknown.
    val pairs = constraints.flatMap { case (name, _) =>
      Seq(lit(name), coalesce(col(name), lit(0L)))
    }
    wide.select(explode(map(pairs: _*)).as(Seq("constraint", "violations")))
      .orderBy("constraint")
  }

  /** Audit the OPEN staging window of the table at `path`: constraint
    * violation counts over the live rows of the staged net change
    * (published → head). Deletes are not data-quality subjects and are
    * excluded; a stage with no changes passes vacuously.
    */
  def stagedViolations(spark: SparkSession, path: String,
                       constraints: Seq[(String, String)]): DataFrame = {
    val staged = IceLite.changesBetween(
      spark, path, IceLite.publishedVersion(path), IceLite.load(path).version)
    violations(staged.filter(!col(IceLite.DeletedCol)), constraints)
  }
}
