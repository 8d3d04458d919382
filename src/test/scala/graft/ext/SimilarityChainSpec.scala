package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * The trained-ANN composition claim (r6 verdict #5): training the IVF cells with a Lloyd
 * round and probing nprobe=2 must BUY something measurable over the untrained seed index
 * probing nprobe=1 — same integer-L2 metric, same queries, same k, ONLY the index varies.
 * The oracle row (`simsearch_ivf_trained`) pins the numbers; this spec pins the
 * INEQUALITY, which a hash gate alone cannot express.
 */
class SimilarityChainSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("trained nprobe=2 IVF recall >= untrained nprobe=1 recall, and >= 60% floor") {
    val spark = graft.SparkTestSession.spark
    spark.catalog.clearCache()
    val trained = graft.SparkEntry.queries("simsearch_ivf_trained")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val baseline = Similarity.ivfRecallInteger(spark, dir, trained = false, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(trained.nonEmpty && trained.keySet == baseline.keySet)
    trained.foreach { case (q, bp) =>
      assert(bp >= 6000L, s"query $q: trained recall $bp bp below the 60% floor")
    }
    val meanTrained = trained.values.sum / trained.size
    val meanBase = baseline.values.sum / baseline.size
    assert(meanTrained >= meanBase,
      s"trained nprobe=2 must not LOSE to untrained nprobe=1: $meanTrained bp < $meanBase bp")
    spark.catalog.clearCache()
  }

  test("recall curve is monotone non-decreasing in nprobe per query, with floors") {
    val spark = graft.SparkTestSession.spark
    spark.catalog.clearCache()
    // rows: (nprobe, q_id, k, hits, recall_bp)
    val curve = graft.SparkEntry.queries("simsearch_recall_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val nprobes = curve.keys.map(_._1).toSeq.distinct.sorted
    val qids = curve.keys.map(_._2).toSeq.distinct.sorted
    assert(nprobes == Seq(1L, 2L, 4L) && qids.size == 3, s"unexpected grid: $nprobes × $qids")
    for (q <- qids; Seq(lo, hi) <- nprobes.sliding(2)) {
      assert(curve((lo, q)) <= curve((hi, q)),
        s"query $q: recall fell from $lo probes (${curve((lo, q))} bp) to $hi (${curve((hi, q))} bp)")
    }
    // floors: probing half the cells (4 of 8) must reach 80% on every query; the curve's
    // nprobe=2 point must agree with the single-point simsearch_ivf_trained gate's floor
    qids.foreach { q =>
      assert(curve((4L, q)) >= 8000L, s"query $q: nprobe=4 recall ${curve((4L, q))} bp < 80%")
      assert(curve((2L, q)) >= 6000L, s"query $q: nprobe=2 recall ${curve((2L, q))} bp < 60%")
    }
    // sweep consistency: the curve's nprobe=2 slice IS the single-point chain's result
    val single = Similarity.ivfRecallInteger(spark, dir, trained = true, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    qids.foreach(q => assert(curve((2L, q)) == single(q),
      s"query $q: curve nprobe=2 ${curve((2L, q))} bp != single-point ${single(q)} bp"))
    spark.catalog.clearCache()
  }
}
