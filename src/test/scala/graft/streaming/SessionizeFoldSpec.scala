package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Permutation-invariance of the streaming fold: `step` sorts its group
  * iterator by (event-time micros, value) — a total order up to fully
  * interchangeable events — so equal-timestamp batches must produce
  * identical emissions and identical parked state REGARDLESS of the
  * framework's iterator order (task scheduling is not deterministic; the
  * engine's other folds all pin an explicit total order, VERDICT r5 #3).
  */
class SessionizeFoldSpec extends AnyFunSuite {

  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }
  private def ev(us: Long, v: Double) = Sessionize.SEvent(1L, ts(us), v)

  private val gap = 1000L // micros

  /** Run one `step` over the events and return (emitted, parked state). */
  private def run(events: Seq[Sessionize.SEvent])
      : (Seq[Sessionize.Session], Option[Sessionize.OpenSession]) = {
    val st = TestGroupState.create[Sessionize.OpenSession](
      optionalState = org.apache.spark.api.java.Optional.empty[Sessionize.OpenSession](),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)),
      hasTimedOut = false)
    val out = Sessionize.step(gap)(1L, events.iterator, st).toSeq
    (out, if (st.exists) Some(st.get) else None)
  }

  test("equal-ts permutations emit identical sessions and park identical state") {
    // Two equal-ts pairs (one inside a session, one AT a would-be boundary)
    // plus a gap jump: the shapes where arrival order could flip a sum, a
    // boundary, or the parked state.
    val events = Seq(
      ev(0L, 1.0), ev(0L, 2.5), ev(500L, 0.25),
      ev(2000L, 4.0), ev(2000L, 0.125), ev(2600L, 8.0))
    val reference = run(events)
    assert(reference._1.nonEmpty && reference._2.nonEmpty)
    events.permutations.foreach { perm =>
      assert(run(perm) == reference,
        s"fold diverged for arrival order ${perm.map(_.value)}")
    }
  }

  test("equal-ts AND equal-value events are interchangeable, not dropped") {
    val events = Seq(ev(0L, 1.0), ev(0L, 1.0), ev(100L, 2.0))
    val (out, parked) = run(events)
    assert(out.isEmpty)
    assert(parked.contains(Sessionize.OpenSession(0L, 100L, 3L, 4.0)))
  }
}
