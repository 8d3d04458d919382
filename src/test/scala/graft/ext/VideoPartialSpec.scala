package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `dedup_video_partial` rests on:
 *
 *  1. SPLICE CONTAINER FIDELITY — a container built around an explicit frame list
 *     ([[Multimodal.aviContainer]]) decodes to exactly those frames, so a splice's
 *     frame f is byte-identical to the source's own slice-f — the guarantee that
 *     lets the oracle compute splice signatures straight off the source bytes.
 *  2. SIGNATURE ORDER-SENSITIVITY — unlike the near-dup envelope, the (flen, s0, s1)
 *     signature moves under a byte swap of unequal bytes (s1 is offset-weighted),
 *     so "matching signature" means matching content, not matching histogram sums.
 *  3. FULL BRUTE-FORCE EQUALITY at sf0.001 — an independent driver-side
 *     reimplementation (slice math, signatures, df cap, distinct-per-clip, shared
 *     count, bar) reproduces the engine's ENTIRE output row set; and every splice
 *     pairs with both of its sources whenever the expected shared-rare-signature
 *     count clears the bar — computed from raw bytes, not assumed.
 */
class VideoPartialSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark

  private def sig(p: Array[Byte]): (Long, Long, Long) = {
    var s0 = 0L; var s1 = 0L; var i = 0
    while (i < p.length) { val v = (p(i) & 0xff).toLong; s0 += v; s1 += (i + 1L) * v; i += 1 }
    (p.length.toLong, s0, s1)
  }

  test("explicit-frame container round-trips the frame list byte-for-byte") {
    val frames = IndexedSeq(
      Array.tabulate(37)(i => (i * 7).toByte),
      Array.empty[Byte],
      Array.tabulate(4)(i => (200 + i).toByte),
      Array.tabulate(11)(i => (i * i).toByte))
    val bytes = Multimodal.aviContainer(frames, frames.map(_.length).max)
    val got = Multimodal.sampleFramesOne(7L, bytes, 1).toVector
    assert(got.map(_.frame_idx) === (0 until 4))
    got.zip(frames).foreach { case (fr, exp) =>
      assert(fr.payload.sameElements(exp), s"frame ${fr.frame_idx} not byte-identical")
    }
  }

  test("the frame signature is order-sensitive where the near-dup envelope is not") {
    val a = Array.tabulate(24)(i => (i * 5).toByte)
    val b = a.clone(); b(0) = a(1); b(1) = a(0) // swap two unequal bytes
    assert(sig(a)._2 === sig(b)._2, "s0 is a histogram sum — invariant under permutation")
    assert(sig(a)._3 !== sig(b)._3, "s1 must move when unequal bytes change offsets")
  }

  test("brute-force equality at sf0.001; splices pair with both sources past the bar") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.engine.Tables(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> t.getBytes("UTF-8") }.toMap
    // independent reimplementation off the raw bytes
    def slices(p: Array[Byte]) = Multimodal.aviFrameSlices(p, 10)
    val spliceOf: Map[Long, (Long, Long)] = docs.keys.toSeq.sorted
      .filter(d => d % 7 == 3 && docs.contains(d + 1))
      .map(d => (d + 2000000L) -> ((d, d + 1)))
      .toMap
    val sigsByClip: Map[Long, Set[(Long, Long, Long)]] = {
      val orig = docs.map { case (d, p) => d -> slices(p).map(sig).filter(_._1 > 0).toSet }
      val spl = spliceOf.map { case (sid, (d, e)) =>
        sid -> (slices(docs(d)).take(5) ++ slices(docs(e)).drop(5)).map(sig).filter(_._1 > 0).toSet
      }
      orig ++ spl
    }
    val df = sigsByClip.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val rare = df.filter(_._2 <= 4).keySet
    val expected = (for {
      (a, sa) <- sigsByClip.toSeq
      (b, sb) <- sigsByClip.toSeq
      if a < b
      shared = (sa & sb & rare).size
      if shared >= 3
    } yield (a, b, shared.toLong)).toSet
    val got = graft.SparkEntry.queries("dedup_video_partial")(s, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected, "engine output must equal the brute-force pair set")
    // the planted guarantee, derived (not assumed) from the bytes: a splice pairs
    // with each source whenever their shared rare signatures clear the bar
    spliceOf.foreach { case (sid, (d, e)) =>
      Seq(d, e).foreach { src =>
        val shared = (sigsByClip(sid) & sigsByClip(src) & rare).size
        if (shared >= 3)
          assert(got.contains((src, sid, shared.toLong)),
            s"splice $sid must pair with source $src at $shared shared frames")
      }
    }
    // and the construction is not vacuous at this scale: most splices DO clear it
    val clearing = spliceOf.count { case (sid, (d, _)) =>
      (sigsByClip(sid) & sigsByClip(d) & rare).size >= 3 }
    assert(clearing > spliceOf.size / 2,
      s"only $clearing of ${spliceOf.size} splices clear the bar against source A")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
