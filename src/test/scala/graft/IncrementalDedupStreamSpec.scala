package graft

import graft.ops.IncrementalDedup
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The streaming deployment shape of the incremental dedup: a JSONL
  * document feed tailed through Structured Streaming, each micro-batch
  * deduped against the stored signature state inside foreachBatch,
  * checkpointed. Asserts the three properties the CDC pipeline already
  * guarantees for the conversation table, now for the dedup state:
  *  - the streamed survivors equal the driver-side brute-force rule;
  *  - a restart from the checkpoint replays nothing (source offsets);
  *  - a file appended after the first run is picked up as exactly one new
  *    batch, deduped against everything streamed before it.
  */
class IncrementalDedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def referenceSurvivors(docs: Seq[(Long, String)], threshold: Double): Set[Long] =
    DedupReference.survivors(docs, threshold)

  /** Tiny fixed corpus with planted near-dups across the batch boundaries:
    * doc 12 duplicates doc 3 (cross-file), doc 21 duplicates doc 12
    * (chained, third file vs second), doc 22 near-duplicates doc 21.
    */
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "one two three four five six seven",
    3L -> "red green blue cyan magenta yellow black",
    4L -> "north south east west up down",
    12L -> "red green blue cyan magenta yellow black",
    13L -> "lorem ipsum dolor sit amet consectetur",
    14L -> "alpha beta gamma delta epsilon zeta",
    21L -> "red green blue cyan magenta yellow black",
    22L -> "red green blue cyan magenta yellow white",
    23L -> "totally unrelated text with its own words")

  private def writeFeedFile(dir: String, name: String, docs: Seq[(Long, String)]): Unit = {
    val lines = docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5) // distinct mtimes keep the file source's arrival order
  }

  test("streamed dedup matches the brute-force rule; checkpoint resume replays nothing") {
    val feed = TestSpark.freshDir("incdedup-stream-feed")
    val ckpt = TestSpark.freshDir("incdedup-stream-ckpt")
    val state = TestSpark.freshDir("incdedup-stream-state")
    val cfg = IncrementalDedup.Config(state, numBuckets = 4)

    val phase1 = corpus.filter(_._1 < 20)
    writeFeedFile(feed, "batch-000.jsonl", phase1.filter(_._1 < 10))
    writeFeedFile(feed, "batch-001.jsonl", phase1.filter(_._1 >= 10))

    // One file per trigger → the two files arrive as two ordered batches.
    val r1 = IncrementalDedup.stream(spark, feed, ckpt, cfg, maxFilesPerTrigger = Some(1))
    assert(r1.size == 2 && r1.forall(_ >= 0), s"expected 2 applied batches, got $r1")
    import spark.implicits._
    val got1 = IncrementalDedup.survivors(spark, cfg).select("doc_id").as[Long].collect().toSet
    assert(got1 == referenceSurvivors(phase1, cfg.threshold),
      s"phase-1 survivors diverge: got $got1")

    // Restart from the same checkpoint with no new files: nothing replays.
    val r2 = IncrementalDedup.stream(spark, feed, ckpt, cfg, maxFilesPerTrigger = Some(1))
    assert(r2.isEmpty, s"checkpoint resume must replay nothing, got $r2")

    // Append a third file: exactly one new batch, deduped against the
    // stored state (doc 21 dups doc 12 from file 2; doc 22 near-dups 21).
    writeFeedFile(feed, "batch-002.jsonl", corpus.filter(_._1 >= 20))
    val r3 = IncrementalDedup.stream(spark, feed, ckpt, cfg, maxFilesPerTrigger = Some(1))
    assert(r3.size == 1 && r3.head >= 0, s"expected exactly one new batch, got $r3")
    val got3 = IncrementalDedup.survivors(spark, cfg).select("doc_id").as[Long].collect().toSet
    assert(got3 == referenceSurvivors(corpus, cfg.threshold),
      s"post-append survivors diverge: got $got3")
  }

  test("stream over batch-bootstrapped state: first micro-batch applies, not -1") {
    val feed = TestSpark.freshDir("incdedup-boot-feed")
    val ckpt = TestSpark.freshDir("incdedup-boot-ckpt")
    val state = TestSpark.freshDir("incdedup-boot-state")
    val cfg = IncrementalDedup.Config(state, numBuckets = 4)
    import spark.implicits._
    // Bootstrap through the BATCH API — commits epochs 0 and 1 into the
    // state tables before any stream exists.
    val phase1 = corpus.filter(_._1 < 20)
    IncrementalDedup.applyBatch(spark,
      phase1.filter(_._1 < 10).toDF("doc_id", "text"), 0L, cfg)
    IncrementalDedup.applyBatch(spark,
      phase1.filter(_._1 >= 10).toDF("doc_id", "text"), 1L, cfg)
    // A fresh stream's first micro-batch gets batchId = 0; without the
    // checkpoint-pinned epoch base the guard would see hasBatch(0), return
    // -1 and the feed file's documents would be lost while the offset log
    // advanced.
    writeFeedFile(feed, "batch-002.jsonl", corpus.filter(_._1 >= 20))
    val r = IncrementalDedup.stream(spark, feed, ckpt, cfg, maxFilesPerTrigger = Some(1))
    assert(r.size == 1 && r.head >= 0,
      s"the first stream batch over bootstrapped state must apply, got $r")
    val got = IncrementalDedup.survivors(spark, cfg).select("doc_id").as[Long].collect().toSet
    assert(got == referenceSurvivors(corpus, cfg.threshold),
      s"bootstrapped-then-streamed survivors diverge: got $got")
  }
}
