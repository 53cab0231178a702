package graft

import graft.cdc.{FeedGen, MergeApply, PatchApply, Pipeline}
import graft.table.IceLite
import org.scalatest.funsuite.AnyFunSuite

/** The partial-update engine as a STREAMING job (`Pipeline.Config(merge =
  * "patch")`): the same JSONL feed path — checkpoint resume, dead letter,
  * exactly-once epochs, schema evolution — applying per-attribute I/U/R/D
  * instead of whole-row LWW. Pinned against the typed [[PatchApply
  * .applyPatches]] twin on the same change set, plus the JSONL-specific
  * semantics a typed frame cannot express being exercised: explicit JSON
  * null on a U means leave-alone, and an R's `after` keys name the unset
  * columns.
  */
class PatchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(dir: String): Map[(String, Int), (Option[String], Option[String], Option[Double])] =
    PatchApply.read(spark, dir)
      .as[(String, Int, Option[String], Option[String], Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("streaming patch replay == typed applyPatches; resume, dead letter, evolution, exactly-once") {
    val base = TestSpark.freshDir("patch-stream")

    // Phase 1: I/U/R mix incl. a U carrying an EXPLICIT JSON null (leave
    // alone), an R unsetting text, and two malformed lines (bad op / bad
    // payload) that must dead-letter, not apply.
    val p1 = Seq(
      """{"op":"I","lsn":1,"conv_id":"c","turn_idx":0,"after":{"role":"user","text":"hello","score":1.5}}""",
      """{"op":"U","lsn":2,"conv_id":"c","turn_idx":0,"after":{"text":"hello v2","score":null}}""",
      """{"op":"R","lsn":3,"conv_id":"c","turn_idx":0,"after":{"text":"x"}}""",
      """{"op":"I","lsn":4,"conv_id":"d","turn_idx":1,"after":{"role":"asst","text":"yo","score":2.0}}""",
      """{"op":"X","lsn":5,"conv_id":"c","turn_idx":0,"after":{"text":"bad op"}}""",
      """{"op":"U","lsn":6,"conv_id":"c","turn_idx":0,"after":"not an object"}""")
    // Phase 2 (resume): a new column patches in (evolution), a D, a revive.
    val p2 = Seq(
      """{"op":"U","lsn":7,"conv_id":"c","turn_idx":0,"after":{"tool":"search"}}""",
      """{"op":"D","lsn":8,"conv_id":"d","turn_idx":1}""",
      """{"op":"U","lsn":9,"conv_id":"d","turn_idx":1,"after":{"text":"revived"}}""")

    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), numBuckets = 4, merge = "patch")
    FeedGen.writeFeed(p1.toDF("value"), s"$base/feed/p1", files = 2)
    Pipeline.replay(spark, cfg)
    FeedGen.writeFeed(p2.toDF("value"), s"$base/feed/p2", files = 1)
    Pipeline.replay(spark, cfg) // resume: only p2 is new
    assert(Pipeline.replay(spark, cfg).isEmpty, "third replay must find nothing (exactly-once)")

    // Expected state: c/0 keeps role (R only unset text; U's explicit null
    // score left it alone → 1.5), gains tool; d/1 was deleted then revived
    // with only text.
    val got = PatchApply.read(spark, s"$base/table")
      .as[(String, Int, Option[String], Option[String], Option[Double], Option[String])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got === Map(
      ("c", 0) -> ((Some("user"), None, Some(1.5), Some("search"))),
      ("d", 1) -> ((None, Some("revived"), None, None))))

    // Dead letter got exactly the two malformed lines.
    val dead = spark.read.parquet(s"$base/dead").select("reason").as[String].collect().sorted
    assert(dead.toSeq == Seq("envelope", "payload"))

    // Typed twin on the same (valid) change set — batch path, one batch —
    // must converge to the identical table.
    val typedDir = TestSpark.freshDir("patch-stream-typed")
    PatchApply.create(typedDir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType))),
      numBuckets = 4)
    val typed = Seq(
      ("I", 1L, "c", 0, Some("user"), Some("hello"), Some(1.5), Option.empty[String]),
      ("U", 2L, "c", 0, None, Some("hello v2"), None, None), // typed U cannot carry explicit null
      ("R", 3L, "c", 0, None, Some("x"), None, None),
      ("I", 4L, "d", 1, Some("asst"), Some("yo"), Some(2.0), None),
      ("U", 7L, "c", 0, None, None, None, Some("search")),
      ("D", 8L, "d", 1, None, None, None, None),
      ("U", 9L, "d", 1, None, Some("revived"), None, None))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "score", "tool")
    PatchApply.applyPatches(spark, typedDir, typed, 0L)
    val twin = PatchApply.read(spark, typedDir)
      .as[(String, Int, Option[String], Option[String], Option[Double], Option[String])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(twin === got, "streaming JSONL path and typed path must converge identically")
  }

  test("generic IceLite reads auto-select the patch fold on a patch table") {
    val base = TestSpark.freshDir("patch-autofold")
    val p1 = Seq(
      """{"op":"I","lsn":1,"conv_id":"c","turn_idx":0,"after":{"role":"user","text":"orig","score":1.0}}""")
    val p2 = Seq( // two partial patches to the SAME key in one window
      """{"op":"U","lsn":2,"conv_id":"c","turn_idx":0,"after":{"text":"patched"}}""",
      """{"op":"U","lsn":3,"conv_id":"c","turn_idx":0,"after":{"score":2.0}}""")
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      numBuckets = 2, merge = "patch")
    FeedGen.writeFeed(p1.toDF("value"), s"$base/feed/p1", files = 1)
    Pipeline.replay(spark, cfg)
    val vA = IceLite.load(s"$base/table").version
    FeedGen.writeFeed(p2.toDF("value"), s"$base/feed/p2", files = 1)
    Pipeline.replay(spark, cfg)

    // Plain IceLite.read (no patch-aware caller): whole-row LWW would
    // return only lsn-3's columns (text null); the auto-selected patch
    // fold must merge base + both deltas per column.
    val live = IceLite.read(spark, s"$base/table")
      .as[(String, Int, Option[String], Option[String], Option[Double])]
      .collect().toSet
    assert(live == Set(("c", 0, Some("user"), Some("patched"), Some(2.0))))

    // changesSince folds the window under the patch semantics: the net
    // change is a net PARTIAL state (both patched columns set, role — not
    // touched in the window — null), applied downstream as a patch.
    val ch = IceLite.changesSince(spark, s"$base/table", vA)
      .select("conv_id", "turn_idx", "role", "text", "score")
      .as[(String, Int, Option[String], Option[String], Option[Double])]
      .collect().toSet
    assert(ch == Set(("c", 0, None, Some("patched"), Some(2.0))))

    // readAt time-travels with the right fold too.
    val at = IceLite.readAt(spark, s"$base/table", vA)
      .as[(String, Int, Option[String], Option[String], Option[Double])]
      .collect().toSet
    assert(at == Set(("c", 0, Some("user"), Some("orig"), Some(1.0))))
  }

  test("a writer aimed at an existing patch table auto-runs patch semantics") {
    val base = TestSpark.freshDir("patch-autowrite")
    PatchApply.create(s"$base/table", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))),
      numBuckets = 2)
    val lines = Seq(
      """{"op":"I","lsn":1,"conv_id":"c","turn_idx":0,"after":{"role":"user","text":"orig"}}""",
      """{"op":"U","lsn":2,"conv_id":"c","turn_idx":0,"after":{"text":"patched"}}""",
      """{"op":"R","lsn":3,"conv_id":"c","turn_idx":0,"after":{"role":"x"}}""")
    // DEFAULT config — merge flag forgotten — must still run patch
    // semantics (the table's own schema decides): role unset by R, text
    // patched, the U's missing role NOT nulled by whole-row LWW.
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt", numBuckets = 2)
    FeedGen.writeFeed(lines.toDF("value"), s"$base/feed/p1", files = 1)
    Pipeline.replay(spark, cfg)
    val got = IceLite.read(spark, s"$base/table")
      .as[(String, Int, Option[String], Option[String])].collect().toSet
    assert(got == Set(("c", 0, None, Some("patched"))))

    // The typed whole-row path refuses a patch table loudly.
    val ex = intercept[IllegalArgumentException] {
      MergeApply.applyChanges(spark, s"$base/table",
        Seq(("U", 9L, "c", 0, Some("r"), Some("t")))
          .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text"), 99L)
    }
    assert(ex.getMessage.contains("PatchApply.applyPatches"))
  }

  test("lww mode still rejects R (dead-lettered, not applied)") {
    val base = TestSpark.freshDir("patch-stream-lww-r")
    val lines = Seq(
      """{"op":"I","lsn":1,"conv_id":"c","turn_idx":0,"after":{"text":"keep"}}""",
      """{"op":"R","lsn":2,"conv_id":"c","turn_idx":0,"after":{"text":"x"}}""")
    val cfg = Pipeline.Config(s"$base/feed", s"$base/table", s"$base/ckpt",
      deadLetterDir = Some(s"$base/dead"), numBuckets = 2) // default lww
    FeedGen.writeFeed(lines.toDF("value"), s"$base/feed/p1", files = 1)
    Pipeline.replay(spark, cfg)
    val live = IceLite.read(spark, s"$base/table")
      .select("conv_id", "text").as[(String, String)].collect().toSet
    assert(live == Set(("c", "keep")))
    val dead = spark.read.parquet(s"$base/dead").count()
    assert(dead == 1L, "the R line must dead-letter under lww")
  }
}
