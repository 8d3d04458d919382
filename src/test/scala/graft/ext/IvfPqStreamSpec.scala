package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `simsearch_stream_ivfpq` (per-batch IVFADC-R serving) rests on:
 *
 *  1. BATCH INVARIANCE — the server is stateless per batch and the index is frozen
 *     pre-stream, so splitting the arrival feed into two waves must produce exactly
 *     the rows of one all-at-once wave. This is what makes the static oracle valid.
 *  2. BATCH-CHAIN EQUIVALENCE — with the feed set to the fixed query ids (0,1,2) and
 *     nprobe = |cells|, the per-batch plan must reproduce [[Similarity.ivfPqRanked]]
 *     (the batch IVFADC-R chain) row for row: the streaming rewrite changes WHEN the
 *     work happens, never WHAT is computed. Composed with IvfPqSpec's degeneration
 *     (ivfPqRanked at nprobe=8 ≡ simsearch_pq_rerank), this chains the server all the
 *     way back to the flat PQ ground truth.
 *  3. SERVING RECALL vs THE EXACT STREAM — against `simsearch_stream`'s exact top-k
 *     on the same arrival feed, recall@10 must hold the cell-scatter floor at both
 *     nprobe points (the index quality itself — tiny K=4 codebook, fixed R=30
 *     shortlist — bounds recall, and tests 1-2 prove serving adds no loss on top).
 */
class IvfPqStreamSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("two-wave serving is row-identical to one all-at-once wave") {
    val s = spark
    import s.implicits._
    val feed = graft.engine.Tables(s, dir, "embeddings")
      .filter($"vec_id" % 50 === 7).select($"vec_id")
      .as[Long].collect().toSeq.sorted
    assert(feed.size >= 2, "the spec needs a splittable arrival feed")
    val (w1, w2) = feed.partition(_ % 100 < 50)
    val split = Similarity.ivfPqStream(s, dir, Similarity.IvfNProbe, Seq(w1, w2))
      .collect().map(_.toSeq).toSeq
    val once = Similarity.ivfPqStream(s, dir, Similarity.IvfNProbe, Seq(feed))
      .collect().map(_.toSeq).toSeq
    assert(split === once, "a stateless frozen-index server must be batch-invariant")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("nprobe = |cells| on the fixed query feed reproduces the batch IVFADC-R chain") {
    val s = spark
    val served = Similarity.ivfPqStream(s, dir, nprobe = 8, Seq(Seq(0L, 1L, 2L)))
      .collect().map(_.toSeq).toSeq
    val batch = Similarity.ivfPqRanked(s, dir, nprobe = 8)
      .collect().map(_.toSeq).toSeq
    assert(served === batch,
      "the per-batch serving plan must compute exactly the batch chain's rows")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("serving recall@10 vs the exact stream: scatter floor holds at both nprobe points") {
    val s = spark
    import s.implicits._
    val exact = graft.SparkEntry.queries("simsearch_stream")(s, dir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "the exact stream must produce rows at sf0.001")
    val feed = graft.engine.Tables(s, dir, "embeddings")
      .filter($"vec_id" % 50 === 7).select($"vec_id")
      .as[Long].collect().toSeq.sorted
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.ivfPqStream(s, dir, nprobe, Seq(feed))
        .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    // Recall here is bounded by the INDEX (deliberately tiny K=4 codebook, fixed
    // R=30 shortlist), not by the serving layer — tests 1-2 prove serving computes
    // exactly the batch chain, so it cannot add loss. Measured points on this
    // near-random corpus: r2 ≈ 0.24 ≈ nprobe/|cells| (true neighbors scatter
    // uniformly across cells), r8 ≈ 0.23 — NOT monotone in nprobe: at full coverage
    // the coarse ADC ranks the WHOLE corpus into the fixed-depth shortlist and
    // truncates true neighbors that a cell-restricted shortlist kept (the classic
    // IVFADC nprobe×R interaction; the corpus-wide quality/cost curve lives in
    // simsearch_recall_curve). The spec pins the scatter floor at both points so the
    // cell gate can never silently starve the candidate set.
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    assert(r2 >= 2.0 / 8 - 0.05, s"nprobe=2 recall $r2 fell below the cell-scatter floor")
    assert(r8 >= 0.15, s"full-coverage recall@10 collapsed to $r8 (ADC floor breached)")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
