package graft

import graft.ops.{CacheScope, PageOps, TextOps, VectorOps}
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Operator-owned persist lifecycles: every operator that persists an
  * intermediate must release it once its result is consumed — no reliance on
  * a caller-side `clearCache()` between queries (round-3 advice).
  */
class CacheScopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def persistedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Listener dispatch is async — poll until the persisted-RDD set returns
    * to the pre-operator baseline (or time out).
    */
  private def awaitReleased(baseline: Set[Int], what: String): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!persistedIds.subsetOf(baseline) && System.nanoTime() < deadline) Thread.sleep(50)
    assert(persistedIds.subsetOf(baseline),
      s"$what left persisted RDDs behind: ${persistedIds -- baseline}")
  }

  test("dedup/ANN/pagination operators release their persist barriers when consumed") {
    val sf = "/root/testdata/sf0.001"
    val baseline = persistedIds
    Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "dedup_minhash_lsh" -> (() => TextOps.dedupMinhashLsh(spark, sf)),
      "dedup_simhash" -> (() => TextOps.dedupSimhash(spark, sf)),
      "dedup_embedding" -> (() => VectorOps.dedupEmbedding(spark, sf)),
      "pagination_follow" -> (() => PageOps.paginationFollow(spark, sf))
    ).foreach { case (name, q) =>
      q().write.format("noop").mode("overwrite").save()
      awaitReleased(baseline, name)
    }
  }

  test("an unrelated action does not release the barrier; the consuming one does") {
    import spark.implicits._
    val df = CacheScope.persistUntilConsumed(
      (1 to 100).toDF("x").select(org.apache.spark.sql.functions.col("x") * 2 as "y"))
    assert(df.storageLevel != StorageLevel.NONE)
    spark.range(5).count() // unrelated action — must NOT trigger the release
    Thread.sleep(500)
    assert(df.storageLevel != StorageLevel.NONE, "unrelated action released the barrier")
    assert(df.filter($"y" > 0).count() == 100) // consuming action (superplan of df)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (df.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline) Thread.sleep(50)
    assert(df.storageLevel == StorageLevel.NONE, "consuming action did not release the barrier")
  }
}
