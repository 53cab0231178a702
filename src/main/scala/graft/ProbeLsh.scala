package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not graded): stage-by-stage timing of the minhash-LSH
  * pipeline to locate where its sweep seconds actually go.
  */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("probe-lsh")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    try {
      // Warmup like the sweep.
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      t("corpus count") {
        TextOps.withPlantedDups(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val corpus = TextOps.withPlantedDups(spark, sfDir)
      t("shingleSets noop") {
        TextOps.shingleSetsOf(spark, corpus).write.format("noop").mode("overwrite").save()
      }
      val sh = t("shingleSets persist+count") {
        val d = TextOps.shingleSetsOf(spark, corpus).persist(); d.count(); d
      }
      val sigs = t("sigs from cached sh") {
        val s = sh.select(col("doc_id"),
          TextOps.minhashSignature(spark, col("sh"), 16).as("sig")).persist()
        s.count(); s
      }
      t("band self-join distinct") {
        val banded = sigs.select(col("doc_id"), posexplode(col("sig")))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
        val l = banded.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
        val r = banded.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
        l.join(r, Seq("band", "band_key")).filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
          .write.format("noop").mode("overwrite").save()
      }
      t("full candidateJaccard noop") {
        TextOps.candidateJaccard(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      t("full dedupMinhashLsh noop") {
        TextOps.dedupMinhashLsh(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      t("full dedupMinhashLsh again") {
        TextOps.dedupMinhashLsh(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    } finally spark.stop()
  }
}
