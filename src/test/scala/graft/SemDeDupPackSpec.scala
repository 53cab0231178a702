package graft

import graft.ops.{CdcQueries, PackOps, VectorOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side references for the round-5 operators:
  * [[VectorOps.dedupSemantic]] is re-derived from scratch (md5 strata,
  * centroid sample, nearest-cell assignment, the SemDeDup keep-rule) over
  * the collected sf0.001 corpus, and [[PackOps.packOver]]'s distributed
  * prefix scan is checked against the naive single-stream cumulative sum.
  */
class SemDeDupPackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def r4(x: Double): Double =
    // the engines' round-half-up over the shortest decimal repr (matches
    // Spark round() / DuckDB round() on these magnitudes)
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("dedupSemantic == from-scratch SemDeDup over the collected corpus") {
    val nlist = 16
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

    // centroid sample: per md5 stratum (first 4 hex chars as int, mod
    // nlist), the vector minimizing (md5hex, vec_id)
    val withH = vecs.map { case (id, v) => (id, v, md5hex(id.toString)) }
    val cents = withH.groupBy { case (_, _, h) => Integer.parseInt(h.substring(0, 4), 16) % nlist }
      .values.map(_.minBy { case (id, _, h) => (h, id) })
      .map { case (id, v, _) => (id, v) }.toSeq

    // nearest-cell assignment with the engines' round(·,4)+cid tie-break,
    // carrying the centroid cosine the keep-rule ranks by
    val asn = vecs.map { case (id, v) =>
      val (cid, ccos) = cents.map { case (cid, cv) => (cid, r4(cos(v, cv))) }
        .minBy { case (cid, c) => (-c, cid) }
      (id, v, cid, ccos)
    }

    // SemDeDup keep-rule: b dropped iff a cell-mate a with pair-cos >= tau
    // ranks before it (LOWER centroid similarity first, id tie-break);
    // kept_by = the ranking-first such a.
    val tau = 0.30
    val expected = asn.flatMap { case (bId, bv, bCid, bCcos) =>
      val quals = asn.filter { case (aId, av, aCid, aCcos) =>
        aCid == bCid &&
          // "ranks before b" is irreflexive, so a == b can never qualify
          (aCcos < bCcos || (aCcos == bCcos && aId < bId)) &&
          r4(cos(av, bv)) >= tau
      }
      if (quals.isEmpty) None
      else {
        val a = quals.minBy { case (aId, _, _, aCcos) => (aCcos, aId) }
        Some((bId, a._1, r4(cos(a._2, bv))))
      }
    }.sortBy(_._1)

    val got = VectorOps.dedupSemantic(spark, sf, tau = tau, nlist = nlist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected.toSeq, s"got ${got.size} drops, expected ${expected.size}")
    assert(expected.nonEmpty, "degenerate test: no semantic duplicates at tau")
    // the top-ranked member of every cell is never dropped
    val dropped = expected.map(_._1).toSet
    val cellBest = asn.groupBy(_._3).values.map(_.minBy { case (id, _, _, c) => (c, id) })
    cellBest.foreach { case (id, _, _, _) => assert(!dropped.contains(id)) }
  }

  test("packOver == naive single-stream cumulative sum (documents corpus)") {
    val got = PackOps.seqPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val naive = got.sortBy(_._1).scanLeft((0L, 0L)) { case ((off, acc), (_, n, _, _, _)) =>
      (acc, acc + n) // (this doc's start, running total after it)
    }.drop(1).map(_._1)
    got.sortBy(_._1).zip(naive).foreach { case ((id, n, off, pf, pl), expOff) =>
      assert(off == expOff, s"doc $id start_off $off != naive $expOff")
      assert(pf == off / 512 && pl == (off + n - 1) / 512, s"doc $id window math")
    }
  }

  test("transcript_pack: contiguous exclusive offsets over the converged table") {
    val rows = CdcQueries.transcriptPack(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array((c1, n1, o1, _, _), (c2, _, o2, _, _)) =>
        assert(c1 < c2, "output must be conv_id ordered")
        assert(o2 == o1 + n1, s"$c2 offset $o2 != $o1 + $n1 (prefix-scan continuity)")
      case _ =>
    }
    rows.foreach { case (c, n, o, pf, pl) =>
      assert(n > 0, s"$c has no live turns")
      assert(pf == o / 512 && pl == (o + n - 1) / 512, s"$c window math")
    }
  }

  test("packOver: empty corpus yields empty frame; negative ids fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "n_tok")
    assert(PackOps.packOver(empty).collect().isEmpty)
    val neg = Seq((-3L, 10L), (1L, 5L)).toDF("id", "n_tok")
    val ex = intercept[Exception] { PackOps.packOver(neg).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative id")), s"unexpected failure: $ex")
  }
}
