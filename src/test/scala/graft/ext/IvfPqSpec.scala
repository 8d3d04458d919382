package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `simsearch_ivfpq` (the composed IVF → PQ-ADC → exact-re-rank chain)
 * rests on:
 *
 *  1. FULL-COVERAGE DEGENERATION — with nprobe = |cells| (all 8 seed centroids) the
 *     IVF gate admits every vector, so the composed chain must reproduce
 *     `simsearch_pq_rerank` row for row: same shortlist, same re-rank, same output.
 *     This is the strongest cheap equivalence: it proves the cell gate is the ONLY
 *     thing the composition changes (no drift in codebook, encoding, LUT or re-rank).
 *  2. EXACT RE-RANK HONESTY — every emitted `d` equals the integer L2 distance
 *     recomputed independently in the test from the raw embeddings (trunc-milli
 *     quantization), so the "exact" half of the two-stage rank is actually exact.
 */
class IvfPqSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("nprobe = |cells| degenerates the composed chain to simsearch_pq_rerank exactly") {
    val s = spark
    val full = Similarity.ivfPqRanked(s, dir, nprobe = 8)
      .collect().map(_.toSeq).toSeq
    val rerank = graft.SparkEntry.queries("simsearch_pq_rerank")(s, dir)
      .collect().map(_.toSeq).toSeq
    assert(full === rerank,
      "probing every cell must make the IVF gate a no-op over the PQ+rerank chain")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("emitted exact distances match an independent integer-L2 recomputation") {
    val s = spark
    import s.implicits._
    val q = graft.engine.Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(x => (x.toDouble * 1000).toLong) } // trunc-toward-zero == the cast rule
      .toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val out = graft.SparkEntry.queries("simsearch_ivfpq")(s, dir)
      .select($"q_id", $"rnk", $"vec_id", $"d").as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "the composed chain must produce rows at sf0.001")
    out.foreach { case (qid, rnk, vid, d) =>
      assert(d === l2(q(qid), q(vid)),
        s"q=$qid rnk=$rnk vec=$vid: emitted d=$d is not the exact integer L2")
    }
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
