package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-data assembly: documents are concatenated
  * in doc_id order and sliced into fixed token-budget training windows
  * (GPT-style concat-and-slice packing — a document may straddle two
  * windows). Each doc's placement is determined by its GLOBAL token start
  * offset, i.e. the exclusive running sum of token counts in doc order.
  *
  * The scale-critical part is HOW the running sum is computed. The naive
  * `Window.orderBy(doc_id)` global cumulative sum forces an
  * `Exchange SinglePartition` — every row through ONE reducer, the worst
  * possible 100 TB plan. This operator runs the textbook two-phase
  * distributed prefix scan instead:
  *
  *  1. split the doc_id domain into `parts` contiguous RANGE buckets
  *     (so bucket asc + doc_id asc IS the global order);
  *  2. per-bucket token totals — one small aggregate, `parts` rows to the
  *     driver (O(parts), independent of corpus size);
  *  3. exclusive prefix over those totals → per-bucket start offsets,
  *     broadcast back;
  *  4. per-bucket window cumsum (parallel across buckets) + bucket offset.
  *
  * PlanSpec asserts the plan contains no SinglePartition exchange.
  */
object PackOps {

  /** (doc_id, n_tok, start_off, pack_first, pack_last) for every document:
    * `start_off` its global token offset, `pack_first`/`pack_last` the
    * fixed-`budget` training windows its tokens land in.
    */
  def seqPack(spark: SparkSession, sfDir: String, budget: Long = 512L,
              parts: Int = 32): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    packOver(docs, budget, parts).withColumnRenamed("id", "doc_id")
  }

  /** Stride chunking — the dual of [[seqPack]]: instead of concatenating
    * short documents into fixed windows, split each LONG document into
    * overlapping fixed-width token windows (HuggingFace
    * `return_overflowing_tokens`-style: window `win`, hop `stride`,
    * overlap `win - stride`). Cover semantics: chunk starts are
    * 0, stride, 2·stride, … up to the smallest start whose window reaches
    * the end of the document, so every token lands in ≥1 chunk, every
    * chunk except possibly the last is exactly `win` tokens, and a
    * document shorter than `win` yields exactly one chunk.
    *
    * 100 TB shape: stateless per-document explode — zero shuffles, whole-
    * stage codegen throughout, fan-out bounded by ⌈n_tok/stride⌉ per row.
    * Chunk boundaries depend only on (doc text, win, stride), so the op is
    * reproducible under any repartitioning.
    */
  def chunkStride(spark: SparkSession, sfDir: String,
                  win: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && win >= stride,
      s"chunkStride: need 1 <= stride <= win, got win=$win stride=$stride")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .withColumn("n_tok", size(col("words")).cast(LongType))
    docs
      // last chunk start = smallest multiple of stride with start+win >= n
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        greatest(floor((col("n_tok") - win + stride - 1) / stride), lit(0L)))))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(
        col("doc_id"), col("chunk_idx"),
        least(lit(win.toLong), col("n_tok") - col("start_tok")).as("chunk_tok"),
        array_join(slice(col("words"),
          (col("start_tok") + 1).cast(IntegerType), lit(win)), " ").as("chunk_text"))
  }

  /** Deterministic global training shuffle: assign every row a contiguous
    * position 0..n-1 in md5-hash order — the "shuffle the corpus once,
    * reproducibly" step in front of packing. Hash-keyed (not `rand()`): the
    * permutation is a pure function of the id, stable across reruns,
    * partitionings and engines (the DuckDB oracle is the naive single-window
    * `row_number() OVER (ORDER BY md5, id)`).
    *
    * The 100 TB shape avoids that naive form's global sort into ONE
    * partition: the hash's first two hex chars split the corpus into 256
    * uniform RANGE buckets (a hash prefix, so bucket asc + hash asc IS the
    * global hash order); per-bucket counts are one tiny aggregate (≤256 rows,
    * driver-cumulated exactly like [[packOver]]'s prefix scan), and each
    * bucket ranks independently — no partition ever exceeds ~n/256 expected
    * rows and the plan has no SinglePartition exchange.
    */
  def shuffleOrder(docs: DataFrame, idCol: String, salt: String = "shuf-"): DataFrame = {
    val spark = docs.sparkSession
    val h = md5(concat(lit(salt), col(idCol).cast(StringType)))
    // Persisted across the two passes (bucket-count aggregate, then the
    // ranked output the caller consumes) — same scope rule as MixOps.
    val withH = docs.select(col(idCol)).withColumn("_h", h)
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast(IntegerType))
      .persist()
    val counts = withH.groupBy("_b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix = (0 until 256).map(counts.getOrElse(_, 0L))
      .scanLeft(0L)(_ + _).dropRight(1)
    import spark.implicits._
    val offsets = broadcast(prefix.zipWithIndex
      .map { case (off, b) => (b, off) }.toDF("_b", "_off"))
    val inBucket = Window.partitionBy("_b").orderBy(col("_h"), col(idCol))
    val out = withH.join(offsets, "_b")
      .withColumn("pos", col("_off") + row_number().over(inBucket) - 1)
      .select(col(idCol), col("pos"))
    CacheScope.releaseWhenConsumed(withH)
    out
  }

  /** Driver form of [[shuffleOrder]] over documents.parquet. */
  def shuffleDocs(spark: SparkSession, sfDir: String): DataFrame =
    shuffleOrder(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")

  /** The reusable packing core: `items` is any `(id: Long, n_tok: Long)`
    * frame whose GLOBAL concatenation order is ascending `id`. Returns one
    * row per item with its exclusive global token offset and the fixed-
    * `budget` windows it lands in. The two-phase distributed prefix scan
    * documented above lives here so every "pack this ordered corpus" caller
    * ([[seqPack]] over documents, transcript packing over converged
    * conversations) shares the no-SinglePartition plan shape.
    */
  def packOver(items: DataFrame, budget: Long = 512L, parts: Int = 32): DataFrame = {
    val spark = items.sparkSession
    // contiguous ranges: bucket = id / width keeps (bucket, id) ordered
    // exactly like id alone
    val maxRow = items.agg(max("id")).head()
    if (maxRow.isNullAt(0)) // empty corpus: max is NULL, not a plan error
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq("id", "n_tok", "start_off", "pack_first", "pack_last")
          .map(StructField(_, LongType))))
    val maxId = maxRow.getLong(0)
    require(maxId >= 0, s"packOver: id domain must be non-negative, max is $maxId")
    val width = maxId / parts + 1
    // A negative id would land in a bucket outside 0..parts-1 and be
    // SILENTLY dropped by the offsets join below — fail loudly instead:
    // the guard expression is NULL when the id is in domain (coalesce then
    // passes the id through) and throws from the executor otherwise.
    val idGuard = assert_true(col("id") >= 0,
      concat(lit("packOver: negative id "), col("id")))
    val bucketed = items.withColumn("bkt",
      (coalesce(idGuard.cast(LongType), col("id")) / width).cast(IntegerType))
    val partials = bucketed.groupBy("bkt").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bucketTotals = (0 until parts).map(partials.getOrElse(_, 0L))
    val exclusivePrefix = bucketTotals.scanLeft(0L)(_ + _).dropRight(1)
    import spark.implicits._
    val offsets = exclusivePrefix.zipWithIndex
      .map { case (off, i) => (i, off) }.toDF("bkt", "bucket_off")
    val inBucket = Window.partitionBy("bkt").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), "bkt")
      .withColumn("start_off",
        col("bucket_off") + coalesce(sum("n_tok").over(inBucket), lit(0L)))
      .select(col("id"), col("n_tok"), col("start_off"),
        floor(col("start_off") / budget).as("pack_first"),
        floor((col("start_off") + col("n_tok") - 1) / budget).as("pack_last"))
      .orderBy("id")
  }
}
