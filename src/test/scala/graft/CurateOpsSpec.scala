package graft

import graft.ops.CurateOps
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the curation battery (the DuckDB oracle pins exact values;
  * these pin the SEMANTIC claims: planted positives are caught, scrubbing
  * leaves no residue, the sample is deterministic, the benchmark join is a
  * broadcast).
  */
class CurateOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("decontaminate flags every benchmark-source doc, via a broadcast join") {
    val out = CurateOps.decontaminate(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark n-gram set must broadcast, got:\n$plan")
    val flagged = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sources = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id % 40 = 0").select("doc_id").collect().map(_.getLong(0))
    assert(sources.nonEmpty)
    sources.foreach { id =>
      assert(flagged.contains(id), s"benchmark-source doc $id not flagged")
      assert(flagged(id) >= 1)
    }
  }

  test("repetitionStats drops every planted repeat and keeps most of the corpus") {
    val rows = CurateOps.repetitionStats(spark, sfDir).collect()
    val planted = rows.filter(_.getLong(0) >= 500000L)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(!r.getBoolean(5), s"planted repeat ${r.getLong(0)} not dropped")
      assert(r.getDouble(3) > 0.18, s"planted top2_share ${r.getDouble(3)}")
    }
    val base = rows.filter(_.getLong(0) < 500000L)
    val keptFrac = base.count(_.getBoolean(5)).toDouble / base.length
    assert(keptFrac > 0.8, s"only $keptFrac of the natural corpus kept")
  }

  test("piiScrub leaves no matchable PII and counts every planted instance") {
    val rows = CurateOps.piiScrub(spark, sfDir).collect()
    val email = CurateOps.EmailRe.r
    val phone = CurateOps.PhoneRe.r
    rows.foreach { r =>
      val (id, nEmails, nPhones, scrubbed) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
      assert(email.findFirstIn(scrubbed).isEmpty, s"doc $id: residual email")
      assert(phone.findFirstIn(scrubbed).isEmpty, s"doc $id: residual phone")
      if (id % 10 == 0) {
        assert(nEmails >= 1); assert(scrubbed.contains("<EMAIL>"))
      }
      if (id % 15 == 0) {
        assert(nPhones >= 1); assert(scrubbed.contains("<PHONE>"))
      }
    }
  }

  test("sampleStratified is deterministic and respects the mixture ordering") {
    val a = CurateOps.sampleStratified(spark, sfDir).collect()
    val b = CurateOps.sampleStratified(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val total = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    def frac(l: String) = sampled.getOrElse(l, 0).toDouble / total(l)
    // Loose per-stratum bounds around the configured rates (0.8/0.5/0.25/0.1).
    assert(frac("en") > 0.65 && frac("en") <= 1.0, s"en ${frac("en")}")
    assert(frac("zh") < 0.25, s"zh ${frac("zh")}")
    assert(frac("en") > frac("es") && frac("es") > frac("zh"))
  }
}
