package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Storage-lifecycle assertion for the iterative connected-components loop: every
 * iteration localCheckpoint()s two frames, and without explicit release the loop
 * accumulates O(iterations × |nodes|) block-manager storage (round-3 verdict item #1).
 * After the query's action completes, only the FINAL labels checkpoint may remain
 * persisted (the returned frame still reads it); every superseded iteration frame and
 * the loop-local caches must be gone.
 */
class DedupLifecycleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_components releases superseded checkpoints and loop caches") {
    val spark = graft.SparkTestSession.spark
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = graft.SparkEntry.queries("dedup_components")(spark, dir)
    assert(out.count() > 0)
    val after = spark.sparkContext.getPersistentRDDs.size
    // allowance: the final labels checkpoint (1). Anything more means the loop leaked —
    // pre-fix this sat at ~2 frames per iteration plus the pairs/edges caches.
    assert(after - before <= 1,
      s"expected <=1 surviving persistent RDD (final labels), got ${after - before}")
    spark.catalog.clearCache()
  }
}
