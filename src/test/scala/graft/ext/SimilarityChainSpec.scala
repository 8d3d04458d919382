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
}
