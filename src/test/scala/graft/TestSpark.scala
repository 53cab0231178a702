package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val workRoot = "/root/repo/target/test-work"

  /** Fresh (deleted) per-test working directory. */
  def freshDir(name: String): String = {
    val p = Paths.get(workRoot, name)
    deleteRecursively(p)
    Files.createDirectories(p)
    p.toString
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }
  }
}
