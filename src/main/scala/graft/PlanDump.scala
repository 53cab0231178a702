package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` of named `SparkEntry.queries` entries to
  * `plans/<tag>/<query>_<suffix>.txt` — the plan-evidence artifact the
  * optimization rounds commit alongside before/after bench numbers.
  * Usage: `sbt "runMain graft.PlanDump <tag> <suffix> q1,q2,..."`.
  * Same session config as the bench sweep so plans match what it times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dir = Paths.get(s"/root/repo/plans/$tag")
      Files.createDirectories(dir)
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(dir.resolve(s"${name}_$suffix.txt"), plan.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $name ($suffix): ${plan.length} chars")
      }
    } finally spark.stop()
  }
}
