package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Operator-owned persist lifecycles.
  *
  * Several operators need a persist BARRIER on an intermediate frame — the
  * LSH signature/shingle sets (Catalyst's CollapseProject would otherwise
  * inline the expensive expression into every downstream lambda) and the
  * pagination frontier levels (each hop must read the previous level's
  * materialization, not re-execute its join prefix). Those operators return
  * LAZY DataFrames, so a `try/finally unpersist` inside the operator would
  * drop the cache before the caller ever runs an action; round 3 instead
  * leaned on the bench harness calling `spark.catalog.clearCache()` between
  * queries, which leaks cached blocks for any embedding caller that doesn't.
  *
  * [[persistUntilConsumed]] scopes the lifecycle to the operator itself: the
  * intermediate is persisted, and a one-shot [[QueryExecutionListener]]
  * unpersists it as soon as any action whose ANALYZED plan contains this
  * frame's plan completes (success or failure). The analyzed plan is
  * inspected pre-cache-substitution, so the match is exactly the subtree
  * relation the cache manager itself keys on (`sameResult`). Listener
  * dispatch is async on the listener bus — the unpersist lands after the
  * consuming job has finished, never mid-job.
  *
  * Properties:
  *  - an operator's intermediates are released after the FIRST consuming
  *    action (a second action on the same result recomputes without the
  *    barrier — correct, just not re-accelerated; every caller in this repo
  *    consumes each operator result exactly once);
  *  - actions that do NOT consume the frame (other queries in a sweep,
  *    metadata probes like a `head` on an unrelated frame) don't release it;
  *  - if the returned frame is never consumed, the listener gives up after
  *    [[MaxMisses]] non-matching actions and releases the cache anyway — a
  *    long-lived embedding session that builds operator results it never
  *    consumes would otherwise accumulate both cached blocks and listeners
  *    (each leaked listener walks every subsequent action's analyzed plan).
  *    An abandoned frame consumed AFTER the cap merely recomputes without
  *    the barrier — a performance bound, never a correctness one.
  */
object CacheScope {

  /** Non-matching completed actions tolerated before an unconsumed frame's
    * cache + listener are force-released. Every operator in this repo
    * consumes its result within a handful of actions; 512 is two orders of
    * margin while still bounding the leak for embedding callers.
    */
  val MaxMisses = 512

  def persistUntilConsumed(df: DataFrame,
                           level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    releaseWhenConsumed(df)
  }

  /** Registers the one-shot release listener WITHOUT persisting — for
    * operators that persist a frame themselves mid-iteration (e.g. the
    * connected-components loop, whose final frontier is already cached when
    * the loop exits) and only need the consumption-scoped unpersist.
    */
  def releaseWhenConsumed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = df.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
      private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
      private def maybeRelease(qe: QueryExecution): Unit = {
        val consumed =
          try qe.analyzed.exists(p => p.sameResult(target))
          catch { case _: Throwable => false }
        val giveUp = !consumed && misses.incrementAndGet() >= MaxMisses
        if ((consumed || giveUp) && released.compareAndSet(false, true)) {
          df.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    df
  }
}
