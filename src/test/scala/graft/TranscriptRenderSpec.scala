package graft

import graft.ops.CdcQueries
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side reference for `transcript_render`: the rendered-conversation
  * hash, the per-turn spans and the loss mask are re-derived from scratch
  * over the collected converged table (the same LWW state the query reads),
  * so a bug in the window/aggregate plumbing cannot hide behind the shared
  * SQL derivation.
  */
class TranscriptRenderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private def chatRole(role: String): String = role match {
    case "purchase" => "assistant"
    case "signup"   => "system"
    case _          => "user"
  }

  private def segment(role: String, text: String): String =
    s"<|im_start|>${chatRole(role)}\n$text<|im_end|>\n"

  test("spans, loss mask and conversation hash match a from-scratch render") {
    val out = CdcQueries.transcriptRender(spark, sf).collect()
    assert(out.nonEmpty)

    // Independent reference: collect the converged table, assemble every
    // conversation in turn order, derive spans/hash/mask driver-side.
    val conv = CdcQueries.upsertFromEvents(spark, sf)
      .select("conv_id", "turn_idx", "role", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    val expected = conv.groupBy(_._1).flatMap { case (cid, turns) =>
      val ordered = turns.sortBy(_._2).toSeq
      val rendered = ordered.map(t => segment(t._3, t._4)).mkString
      val hash = md5hex(rendered)
      var off = 0L
      ordered.map { case (_, tIdx, role, text) =>
        val seg = segment(role, text)
        val row = (cid, tIdx, chatRole(role), off, off + seg.length,
          if (chatRole(role) == "assistant") 1 else 0, hash)
        off += seg.length
        row
      }
    }.toSet

    val got = out.map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getInt(5), r.getString(6))).toSet
    assert(got == expected)
  }

  test("spans are contiguous and zero-based per conversation") {
    val rows = CdcQueries.transcriptRender(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (cid, turns) =>
      val ordered = turns.sortBy(_._2)
      assert(ordered.head._3 == 0L, s"$cid first span must start at 0")
      ordered.sliding(2).foreach {
        case Array((_, _, _, e0), (_, _, s1, _)) =>
          assert(e0 == s1, s"$cid spans must be contiguous")
        case _ =>
      }
      ordered.foreach { case (_, _, s, e) => assert(e > s) }
    }
  }
}
