package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data text operators over the `documents` table: exact and
  * near-duplicate detection (MinHash-LSH, SimHash, n-gram Jaccard), language
  * ID, quality scoring, token counting, fingerprinting. All deterministic
  * (xxhash64-based, fixed seeds), all shuffle-conscious:
  *
  *  - dedup operators never do an O(n²) cross join — candidates come from an
  *    equi-join on LSH band keys / simhash blocks (the standard banding
  *    trick), which Spark executes as a hash join on the band key. At 100 TB
  *    the band join is the only shuffle and it is keyed, salted by band id.
  *  - everything is `functions._` composition (codegen'd); no Scala UDFs in
  *    the hot paths.
  */
object TextOps {

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** The documents table plus deterministic planted near-duplicates: for
    * every doc_id % 25 == 0 we add a copy (doc_id + 100000) with the first
    * word dropped — so near-dup detectors have known positives to find,
    * given the base corpus is fully distinct.
    */
  def withPlantedDups(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val planted = d.filter(col("doc_id") % 25 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat_ws(" ", slice(split(col("text"), " "), 2, 100000)))
    d.unionByName(planted)
  }

  /** Exact dedup by content hash (hash-groupBy — one keyed shuffle). */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .orderBy("fp")

  /** Word k-shingles of the lowercased text. */
  def shingles(text: Column, k: Int): Column = {
    val words = split(lower(text), " ")
    transform(sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => array_join(slice(words, i + 1, lit(k)), " "))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the doc's shingles.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(h))))
    }: _*)

  /** (doc_id, sig) with the minhash signature MATERIALIZED (persisted):
    * Catalyst's CollapseProject would otherwise inline the shingle array
    * into all `numHashes` hash lambdas (recomputing it 16×), and the LSH
    * band self-join would re-evaluate the whole pipeline on both sides.
    */
  private def minhashSigs(spark: SparkSession, sfDir: String, numHashes: Int): DataFrame =
    withPlantedDups(spark, sfDir)
      .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .persist()

  /** MinHash + LSH banding near-dup candidates: signature of `numHashes`
    * minhashes split into `bands` bands; docs sharing any band key are
    * candidates; candidates scored by estimated Jaccard (signature overlap).
    */
  def dedupMinhashLsh(spark: SparkSession, sfDir: String,
                      numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSigs(spark, sfDir, numHashes)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), lit("band")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val l = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / numHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard on LSH candidates (verify stage of the dedup
    * pipeline): intersection/union of 3-shingle sets.
    */
  def dedupNgramJaccard(spark: SparkSession, sfDir: String,
                        threshold: Double = 0.4): DataFrame = {
    val cands = dedupMinhashLsh(spark, sfDir, threshold = 0.0)
    val sh = withPlantedDups(spark, sfDir)
      .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
      .persist()
    cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash over word hashes: sign-sum of each bit position,
    * expressed with aggregate over the word array (codegen, no UDF).
    * Near-dups = pairs sharing a 16-bit block (Hamming ≤ small) — block
    * equi-join, then exact popcount filter.
    */
  def simhash(text: Column): Column = {
    // hash each word once, then fold each (static) bit position separately —
    // shift amounts must be Scala Ints for shiftright
    val hashes = transform(split(lower(text), " "), w => xxhash64(w))
    val bits = (0 until 64).map { b =>
      val bitSum = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  def dedupSimhash(spark: SparkSession, sfDir: String, maxHamming: Int = 8): DataFrame = {
    val d = withPlantedDups(spark, sfDir)
      .select(col("doc_id"), simhash(col("text")).as("sh")).persist()
    // 4 blocks of 16 bits: Hamming ≤ 3 guarantees a shared block; we use the
    // block join for candidates and exact popcount for the verdict.
    val blocked = d.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "block_key")
    val l = blocked.select(col("block"), col("block_key"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = blocked.select(col("block"), col("block_key"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("block", "block_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Quality scoring: length, word count, punctuation ratio, stopword ratio
    * (InsecureInvokeHTTP-style per-record classification, SQL-parity form).
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    docs(spark, sfDir).select(
      col("doc_id"),
      col("n_chars"),
      size(words).as("n_words"),
      round(size(filter(words, w => w.isInCollection(EnStopwords))).cast(DoubleType) /
        size(words), 4).as("stopword_ratio"),
      round(regexp_count(col("text"), lit("[.,;:!?]")).cast(DoubleType) /
        col("n_chars"), 4).as("punct_ratio"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("re_tokens"))
      .orderBy("doc_id")

  /** Document fingerprinting by rolling window hashes (winnowing-style):
    * hash every k-char window of the text, keep the minimum — a content
    * fingerprint stable under small appends/prepends, plus the window count.
    * Pure `transform`/`sequence` composition (codegen'd, no UDF); md5 as the
    * window hash so an independent engine (DuckDB) reproduces it bit-exact.
    */
  def docFingerprint(spark: SparkSession, sfDir: String, k: Int = 16): DataFrame = {
    val nWin = greatest(length(col("text")) - (k - 1), lit(1))
    docs(spark, sfDir).select(
      col("doc_id"),
      nWin.as("n_windows"),
      array_min(transform(sequence(lit(1), nWin),
        i => md5(col("text").substr(i, lit(k))))).as("fp"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: English stopword density (n-gram heuristic in
    * its simplest deterministic SQL-parity form).
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(lower(col("text")), " ")
    docs(spark, sfDir).select(
      col("doc_id"), col("lang"),
      when(size(filter(words, w => w.isInCollection(EnStopwords))) >= 2, "en")
        .otherwise("unk").as("pred"))
      .orderBy("doc_id")
  }
}
