package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data domain mixing: exact, deterministic resampling of a corpus
  * to a target domain mixture (the data-mixing step in front of training —
  * the GPT-3 §2.2 / DoReMi-style weighted blend, realized as subsampling).
  *
  * Given weights w_d over a domain column, the largest total consistent with
  * the mixture and the per-domain supply is T = min_d(n_d / w_d); each
  * domain keeps its k_d = floor(w_d · T) docs. WHICH docs is deterministic:
  * the k_d lowest by (md5("mix-" || doc_id), doc_id) within the domain — so
  * the sample is reproducible across runs, partitionings and engines (the
  * DuckDB oracle re-derives it with a plain window rank).
  *
  * The 100 TB shape is the rank: a global per-domain sort would shuffle the
  * whole corpus into |domains| hot partitions. Instead the hash's first two
  * hex chars split every domain into 256 uniform RANGE buckets (a hash
  * prefix, so bucket order == hash order): per-(domain, bucket) counts are
  * one tiny aggregate (≤ |domains|·256 rows, driver-side cumulated), buckets
  * wholly below each domain's k_d-boundary are kept with NO ranking at all,
  * and only the single boundary bucket per domain — ~1/256 of the domain —
  * pays a window rank, partitioned by (domain, bucket) so no partition ever
  * exceeds n_d/256 expected rows. Selection is identical to the naive
  * single-window form (MixSpec proves equality); only the cost differs.
  */
object MixOps {

  private def mixHash(docId: Column): Column =
    md5(concat(lit("mix-"), docId.cast("string")))

  /** Resample `docs` to the `weights` mixture over `domainCol` (weights are
    * used as given — only their ratios matter). Returns the selected rows
    * (id column + domain column). Domains absent from `weights` are dropped;
    * a weighted domain with zero supply makes T = 0 (empty mixture — the
    * mixture is unachievable, and silently dropping the domain would skew
    * the blend).
    */
  def mixDomains(docs: DataFrame, idCol: String, domainCol: String,
                 weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = docs.sparkSession
    // Persisted across the two passes that need it (the bucket-count
    // aggregate below, then the keep/boundary joins the returned frame
    // runs): without the barrier the full input is scanned and hashed
    // twice. The release listener is registered at the END of this method —
    // after the internal collect — so the scope covers the CALLER's first
    // consuming action, not the operator's own aggregate (the returned
    // frame is lazy, so try/finally would drop the cache too early).
    val inDomain = docs.filter(col(domainCol).isin(weights.keys.toSeq: _*))
      .select(col(idCol), col(domainCol),
        mixHash(col(idCol)).as("_h"),
        conv(substring(mixHash(col(idCol)), 1, 2), 16, 10).cast("int").as("_b"))
      .persist()

    // One tiny aggregate: per-(domain, bucket) counts, cumulated driver-side
    // (≤ |domains|·256 rows — O(1) in the corpus).
    val bucketCounts: Map[(String, Int), Long] = inDomain
      .groupBy(domainCol, "_b").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val perDomain: Map[String, Long] =
      bucketCounts.groupMapReduce(_._1._1)(_._2)(_ + _)
    val t = weights.map { case (d, w) => perDomain.getOrElse(d, 0L).toDouble / w }.min
    val k = weights.map { case (d, w) => d -> math.floor(w * t).toLong }

    // Per domain: buckets wholly below the boundary (kept unranked) and the
    // boundary bucket's residual take.
    val fullBuckets = Seq.newBuilder[(String, Int)]
    val boundary = Seq.newBuilder[(String, Int, Long)]
    k.foreach { case (d, kd) =>
      var cum = 0L
      var b = 0
      while (cum < kd && b < 256) {
        val c = bucketCounts.getOrElse((d, b), 0L)
        if (cum + c <= kd) { if (c > 0) fullBuckets += ((d, b)); cum += c }
        else { boundary += ((d, b, kd - cum)); cum = kd }
        b += 1
      }
    }
    import spark.implicits._
    val fullDf = broadcast(fullBuckets.result().toDF(domainCol, "_b"))
    val keepWhole = inDomain.join(fullDf, Seq(domainCol, "_b"), "left_semi")
    val boundaryRows = boundary.result()
    val ranked =
      if (boundaryRows.isEmpty) None
      else {
        val bDf = broadcast(boundaryRows.toDF(domainCol, "_b", "_take"))
        val w = Window.partitionBy(col(domainCol), col("_b"))
          .orderBy(col("_h"), col(idCol))
        Some(inDomain.join(bDf, Seq(domainCol, "_b"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= col("_take"))
          .select(col(idCol), col(domainCol), col("_h"), col("_b")))
      }
    CacheScope.releaseWhenConsumed(inDomain)
    ranked.fold(keepWhole)(keepWhole.unionByName(_))
      .select(col(idCol), col(domainCol))
  }

  /** The default driver-query mixture over documents.parquet's `lang`. */
  val LangWeights: Seq[(String, Double)] = Seq(
    "en" -> 0.40, "fr" -> 0.15, "es" -> 0.15, "de" -> 0.15, "zh" -> 0.15)

  def mixLangs(spark: SparkSession, sfDir: String): DataFrame =
    mixDomains(spark.read.parquet(s"$sfDir/documents.parquet"),
      "doc_id", "lang", LangWeights.toMap)
      .orderBy("lang", "doc_id")
}
