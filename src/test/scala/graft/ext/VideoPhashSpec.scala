package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `dedup_video_phash` rests on:
 *
 *  1. BRUTE-FORCE EQUALITY — the fingerprint computed through the REAL container
 *     round-trip (encodeAvi → chunk-walk decode → per-frame segment sums) equals an
 *     independent reimplementation straight off the raw bytes' slice math, on random
 *     payloads of random lengths (validates the codec round-trip AND the bit rule).
 *  2. SEGMENT-MEMBERSHIP DUALITY — byte offset o of an flen-byte frame lives in
 *     segment (6o+5)/flen, the exact dual of the balanced-partition boundary rule
 *     [s·flen/6, (s+1)·flen/6) — the identity both the copy perturbation and the
 *     oracle replay stand on.
 *  3. PLANTED-PAIR GUARANTEE — a within-frame-segment byte permutation keeps the
 *     fingerprint (per-segment sums unchanged) while visibly changing the payload;
 *     and the invariance is not vacuous: moving brightness ACROSS a segment boundary
 *     moves the fingerprint.
 *  4. END-TO-END at sf0.001: every planted (doc, doc+1M) pair surfaces in one
 *     distance-0 star cluster.
 */
class VideoPhashSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark

  private def fingerprint(payloads: Seq[(Long, Array[Byte])]): Map[Long, Seq[Long]] = {
    val s = spark
    import s.implicits._
    val media = s.createDataset(payloads.map { case (id, p) => Multimodal.MediaRow(id, p) })
    Multimodal.videoFingerprintBands(Multimodal.encodeAvi(media, nFrames = 10))
      .collect().map(h => h.doc_id -> Seq(h.band_0, h.band_1, h.band_2, h.band_3)).toMap
  }

  /** Independent reference: frames as raw slice math (no container), segment sums by
    * the balanced-partition boundaries, the cross-multiplied mean-threshold rule. */
  private def expectedBands(p: Array[Byte]): Seq[Long] = {
    val len = p.length
    val chunk = math.max(1, len / 10)
    val bits = new Array[Int](64)
    for (f <- 0 until 10) {
      val from = math.min(f * chunk, len)
      val to = math.min(from + chunk, len)
      val flen = to - from
      if (flen > 0) {
        val framesum = (from until to).map(i => (p(i) & 0xff).toLong).sum
        for (seg <- 0 until 6) {
          val b0 = seg * flen / 6
          val b1 = (seg + 1) * flen / 6
          if (b1 > b0) {
            val segsum = (b0 until b1).map(o => (p(from + o) & 0xff).toLong).sum
            if (segsum * flen >= framesum * (b1 - b0)) bits(f * 6 + seg) = 1
          }
        }
      }
    }
    (0 until 4).map(b => (0 until 16).foldLeft(0L) { (acc, j) =>
      if (bits(16 * b + j) == 1) acc | (1L << j) else acc
    })
  }

  test("codec round-trip fingerprint equals the raw-slice brute force on random payloads") {
    val rnd = new scala.util.Random(20260815L)
    val payloads = (1L to 40L).map { id =>
      val len = rnd.nextInt(301) // 0..300 spans empty docs, sub-frame docs, multi-frame
      id -> Array.fill(len)(rnd.nextInt(256).toByte)
    }
    val got = fingerprint(payloads)
    payloads.foreach { case (id, p) =>
      assert(got(id) === expectedBands(p), s"fingerprint mismatch for payload $id len=${p.length}")
    }
  }

  test("segment membership (6o+5)/flen is the exact dual of the boundary partition") {
    for (flen <- 1 to 60; o <- 0 until flen) {
      val s = (6 * o + 5) / flen
      assert(s >= 0 && s < 6, s"flen=$flen o=$o: segment $s out of range")
      assert(s * flen / 6 <= o && o < (s + 1) * flen / 6,
        s"flen=$flen o=$o: segment $s boundaries do not contain o")
    }
  }

  test("in-segment swap keeps the fingerprint; cross-segment brightness move breaks it") {
    // one frame-sized doc (len 120 -> chunk 12, every frame 12 bytes, 2-byte segments);
    // frame 0 = all dark except a bright byte in segment 5
    val payload = new Array[Byte](120)
    payload(10) = 255.toByte
    val swapped = payload.clone() // swap positions 10,11: both in frame 0 segment 5
    swapped(10) = payload(11); swapped(11) = payload(10)
    assert(!swapped.sameElements(payload), "the swap must visibly change the payload")
    val moved = payload.clone() // brightness crosses from segment 5 into segment 0
    moved(10) = 0.toByte; moved(0) = 255.toByte
    val fps = fingerprint(Seq((1L, payload), (2L, swapped), (3L, moved)))
    assert(fps(1L) === fps(2L), "in-segment permutation must not move the fingerprint")
    assert(fps(1L) !== fps(3L), "a cross-segment brightness move must move the fingerprint")
  }

  test("end-to-end at sf0.001: every planted pair lands in one distance-0 cluster") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("dedup_video_phash")(s, dir)
      .as[(Long, Long, Long)].collect()
    val docs = graft.engine.Tables(s, dir, "documents")
      .select($"doc_id").as[Long].collect()
    val canon = out.filter(_._3 == 0L).map(r => r._2 -> r._1).toMap
    def root(d: Long): Long = canon.getOrElse(d, d)
    docs.foreach { d =>
      assert(root(d) === root(d + 1000000L),
        s"planted twin of doc $d not in its distance-0 cluster")
    }
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
