package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a large-scale training-data pipeline runs after
  * dedup: benchmark decontamination, repetition filtering, PII scrubbing and
  * deterministic stratified sampling. Like the rest of the battery these are
  * pure `functions._` compositions (whole-stage codegen, no UDFs) over the
  * `documents` table, and every planted positive is a pure function of
  * `doc_id` so the DuckDB oracle reproduces the full output bit-for-bit.
  *
  * Scale shapes (the 100 TB reading):
  *  - [[decontaminate]]: the benchmark n-gram set is small by definition
  *    (heldout eval suites are MBs, not TBs) → broadcast semi-join against
  *    the corpus n-gram stream; the corpus side is one narrow scan + explode,
  *    never shuffled on its own size.
  *  - [[repetitionStats]]: per-(doc, gram) counting is two keyed shuffles on
  *    (doc_id, gram) then doc_id — both keys are fine-grained, no skew: a
  *    single document's grams land in one reducer only for the second stage,
  *    bounded by document length.
  *  - [[piiScrub]]: stateless per-row regex rewrite, zero shuffles.
  *  - [[sampleStratified]]: stateless per-row filter on a pure hash of the
  *    key — zero shuffles, survives any scale and stays reproducible under
  *    re-partitioning, unlike `rand()`-based sampling.
  */
object CurateOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Benchmark decontamination (the GPT-3 appendix-C / PaLM procedure):
    * flag every training document that shares any word `k`-gram with the
    * heldout benchmark set, so eval prompts can be excluded from training.
    *
    * The benchmark here is derived deterministically from the corpus — for
    * every `doc_id % 40 == 0` the 8-word span at words 3..10 becomes a
    * benchmark entry — so each such doc is contaminated by construction and
    * any OTHER doc containing the same 5-word run is flagged too (the
    * corpus' small vocabulary makes a handful of accidental collisions
    * likely, and the oracle reproduces them exactly).
    *
    * Output: one row per contaminated doc — (doc_id, n_hits) where n_hits
    * counts the distinct contaminated `k`-grams in the doc.
    */
  def decontaminate(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val d = docs(spark, sfDir)
    // Barrier before the global sort: its boundary-sampling pass would
    // re-run the corpus-side k-gram explode + join otherwise.
    CacheScope.persistUntilConsumed(decontaminateOf(spark, d, d, k))
      .orderBy("doc_id")
  }

  /** [[decontaminate]] over an arbitrary `(doc_id, text)` corpus, with the
    * benchmark set derived from `benchSource` (every doc_id % 40 == 0 row's
    * words 3..10). Unordered — composition sites order the final output.
    */
  def decontaminateOf(spark: SparkSession, corpus: DataFrame, benchSource: DataFrame,
                      k: Int = 5): DataFrame = {
    val benchSpan = array_join(slice(split(lower(col("text")), " "), 3, 8), " ")
    val benchGrams = benchSource.filter(col("doc_id") % 40 === 0)
      .select(explode(array_distinct(TextOps.shingles(benchSpan, k))).as("gram"))
      .distinct()
    val trainGrams = corpus.select(col("doc_id"),
      explode(array_distinct(TextOps.shingles(col("text"), k))).as("gram"))
    trainGrams.join(broadcast(benchGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with planted repetitive documents: for every
    * `doc_id % 50 == 0`, a copy at `doc_id + 500000` whose text is the
    * doc's first three words repeated 12 times — a deterministic
    * high-repetition offender every repetition metric must catch.
    */
  def withPlantedRepeats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"), col("text"))
    val w3 = slice(split(col("text"), " "), 1, 3)
    val planted = d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        array_join(flatten(array_repeat(w3, 12)), " ").as("text"))
    d.unionByName(planted)
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1): per document,
    * the duplicate-word fraction, the share of all word 2-grams taken by the
    * most frequent 2-gram, and the fraction of 2-gram occurrences whose gram
    * occurs more than once — plus the keep/drop verdict at the classic
    * thresholds (top2_share ≤ 0.18 and dup2_frac ≤ 0.5).
    *
    * Runs over [[withPlantedRepeats]], so the drop set provably contains
    * every planted offender while the natural corpus mostly passes.
    */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame =
    // Barrier before the global sort (see [[decontaminate]]): the sampling
    // pass re-ran both gram-explode branches of the stats join otherwise.
    CacheScope.persistUntilConsumed(
      repetitionStatsOf(spark, withPlantedRepeats(spark, sfDir)))
      .orderBy("doc_id")

  /** [[repetitionStats]] over an arbitrary `(doc_id, text)` corpus (unordered). */
  def repetitionStatsOf(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val words = split(lower(col("text")), " ")
    val rowStats = corpus.select(
      col("doc_id"),
      size(words).as("n_words"),
      round(lit(1.0) - size(array_distinct(words)).cast(DoubleType) / size(words), 4)
        .as("dup_word_frac"))
    val gramCounts = corpus
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max(col("c")).as("top_c"),
        sum(col("c")).as("tot"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_c"))
    val top2 = round(col("top_c").cast(DoubleType) / col("tot"), 4)
    val dup2 = round(col("dup_c").cast(DoubleType) / col("tot"), 4)
    rowStats.join(gramCounts, "doc_id")
      .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
        top2.as("top2_share"), dup2.as("dup2_frac"),
        (top2 <= 0.18 && dup2 <= 0.5).as("keep"))
  }

  /** Deterministically planted PII: every `doc_id % 10 == 0` gains an email
    * address, every `doc_id % 15 == 0` a phone number (both at
    * `doc_id % 30 == 0`) — the same doc_ids, amended text.
    */
  def withPlantedPii(spark: SparkSession, sfDir: String): DataFrame =
    withPlantedPiiOf(docs(spark, sfDir))

  /** The PII planting rule over an arbitrary `(doc_id, text)` corpus. */
  def withPlantedPiiOf(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      piiPlantedText(col("doc_id"), col("text")).as("text"))

  /** Text with the PII planting rule applied — pure column expression, so
    * composition sites can keep their other columns. */
  def piiPlantedText(docId: Column, text: Column): Column = {
    val id = docId.cast(StringType)
    val withEmail = when(docId % 10 === 0,
      concat(text, lit(" contact user"), id, lit("@example.com for details")))
      .otherwise(text)
    // % 10000 keeps the padded id at exactly 4 digits — lpad never hits its
    // (engine-specific) truncation path.
    when(docId % 15 === 0,
      concat(withEmail, lit(" or call 555-"),
        lpad((docId % 10000).cast(StringType), 4, "0")))
      .otherwise(withEmail)
  }

  /** Emails redacted first, then phones — the phone pass never sees a digit
    * run inside an address. */
  def scrubbedText(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Both engines' regex dialects (Java util.regex / RE2) agree on these. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{4}"

  /** PII scrubbing: redact emails then phone numbers with typed
    * placeholders, reporting per-doc counts — the pre-training privacy
    * rewrite, as a stateless codegen'd scan (regexp_replace is global in
    * both engines; emails are replaced FIRST so the phone count can never
    * see a digit run inside an address).
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val withPii = withPlantedPii(spark, sfDir)
    val deEmailed = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    // Barrier before the global sort (see [[decontaminate]]): the sampling
    // pass re-ran the whole regex scan otherwise.
    CacheScope.persistUntilConsumed(withPii.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
      regexp_count(deEmailed, lit(PhoneRe)).as("n_phones"),
      regexp_replace(deEmailed, PhoneRe, "<PHONE>").as("scrubbed")))
      .orderBy("doc_id")
  }

  /** Per-language sampling rates as a fraction of 2^16 — the training-mix
    * weights of [[sampleStratified]]. */
  val StratumRates: Seq[(String, Int)] = Seq(
    "en" -> 52429, // 0.80
    "fr" -> 32768, // 0.50
    "de" -> 32768, // 0.50
    "es" -> 16384, // 0.25
    "zh" -> 6554)  // 0.10

  /** Deterministic stratified sampling for training-data mixture weighting:
    * keep a document iff the first 16 bits of md5("smp-" || doc_id) fall
    * under its language's rate. Hash-based (not `rand()`): the sample is a
    * pure function of the key — stable across reruns, partitionings and
    * engines (the DuckDB oracle recomputes the identical sample), and at
    * 100 TB it is a zero-shuffle scan-level filter that composes with
    * partition pruning.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(stratumHash(col("doc_id")) < stratumRate(col("lang")))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** First 16 bits of md5("smp-" || doc_id) as a long in [0, 65536). */
  def stratumHash(docId: Column): Column = saltedHash16(docId, "smp-")

  /** First 16 bits of md5(salt || id) as a long in [0, 65536). */
  def saltedHash16(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast(StringType))), 1, 4), 16, 10)
      .cast(LongType)

  /** Holdout boundaries as fractions of 2^16: hash < 3277 → test (~5%),
    * < 9830 → val (~10%), else train (~85%). */
  val SplitTestUpper = 3277
  val SplitValUpper = 9830

  /** Deterministic train/val/test split assignment: the disjoint-exhaustive
    * counterpart of [[sampleStratified]] (every document gets exactly one
    * split; nothing is dropped). Hash-keyed on md5("spl-" || doc_id) with a
    * salt distinct from the sampling salt, so holdout membership is
    * independent of sampling survival — a doc's split never changes when
    * mixture weights are retuned. Zero-shuffle scan-level map, reproducible
    * under any repartitioning and engine (the DuckDB oracle recomputes the
    * identical assignment).
    */
  def splitAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val h = saltedHash16(col("doc_id"), "spl-")
    docs(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        when(h < SplitTestUpper, "test")
          .when(h < SplitValUpper, "val")
          .otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** The per-language rate from [[StratumRates]] (0 for unknown strata). */
  def stratumRate(lang: Column): Column =
    StratumRates.foldRight(lit(0)) { case ((l, r), els) =>
      when(lang === l, lit(r)).otherwise(els)
    }

  /** The full curation chain a training-data ingest runs, composed into ONE
    * declarative job: (1) near-dup drop — any doc with a ≥0.5-Jaccard
    * partner of smaller doc_id (the same survivor rule as
    * [[graft.ops.IncrementalDedup]], candidates from MinHash-LSH banding);
    * (2) benchmark decontamination; (3) Gopher repetition filter;
    * (4) PII scrub; (5) deterministic stratified sampling. Output: one row
    * per surviving doc with the md5 fingerprint of its scrubbed text.
    *
    * Every stage composes as a keyed semi/anti join or a stateless filter on
    * doc_id — Catalyst sees one plan and shares the corpus scan; nothing is
    * collected to the driver. The DuckDB oracle rebuilds the identical chain
    * as one CTE stack.
    */
  def curatePipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = TextOps.withPlantedDups(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val dropped = TextOps.candidateJaccardOf(spark, corpus)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val contaminated = decontaminateOf(spark, corpus, docs(spark, sfDir))
      .select("doc_id")
    val kept = repetitionStatsOf(spark, corpus)
      .filter(col("keep")).select("doc_id")
    // Barrier before the global sort (see [[decontaminate]]): the sampling
    // pass re-ran the corpus scan, the three filter joins and the scrub-md5
    // projection otherwise.
    CacheScope.persistUntilConsumed(corpus
      .join(dropped, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(kept, Seq("doc_id"), "left_semi")
      .filter(stratumHash(col("doc_id")) < stratumRate(col("lang")))
      .select(col("doc_id"), col("lang"),
        md5(scrubbedText(piiPlantedText(col("doc_id"), col("text")))).as("fp")))
      .orderBy("doc_id")
  }
}
