package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `dedup_audio_fingerprint` rests on:
 *
 *  1. PLANTED-PAIR GUARANTEE — the fingerprint reads only per-window energies, which
 *     are permutation-invariant within a window, so the in-window pair-swapped copy
 *     has an IDENTICAL fingerprint despite a visibly different payload; and the
 *     invariance is not vacuous: moving energy ACROSS windows moves the fingerprint.
 *  2. END-TO-END at sf0.001: every planted (doc, doc+1M) pair surfaces at distance 0.
 *  3. Edge rules: an empty payload fingerprints to all-zero bands; a sub-window
 *     payload still fingerprints (single window replicated across the grid).
 */
class AudioFingerprintSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark

  private def fingerprint(payloads: Seq[(Long, Array[Byte])]): Map[Long, Seq[Long]] = {
    val s = spark
    import s.implicits._
    val media = s.createDataset(payloads.map { case (id, p) => Multimodal.MediaRow(id, p) })
    Multimodal.audioFingerprintBands(
        Multimodal.encodeWav(media, _ => 8000), win = 64)
      .collect().map(h => h.doc_id -> Seq(h.band_0, h.band_1, h.band_2, h.band_3)).toMap
  }

  test("in-window pair swap keeps the fingerprint; cross-window energy move breaks it") {
    // 4 windows of 64 bytes with distinct energy profiles
    val payload = Array.tabulate(256) { i =>
      val w = i / 64
      (128 + (if (w % 2 == 0) (i % 64) - 32 else ((i * 11) % 90) - 45)).toByte
    }
    val swapped = Array.tabulate(256)(i => payload(i ^ 1))
    assert(!swapped.sameElements(payload), "the swap must visibly change the payload")
    // move loudness across a window boundary: saturate window 0's first byte from
    // window 3's budget — energies of two windows change
    val moved = payload.clone()
    moved(0) = 255.toByte
    moved(255) = 128.toByte
    val fps = fingerprint(Seq((1L, payload), (2L, swapped), (3L, moved)))
    assert(fps(1L) === fps(2L), "in-window permutation must not move the fingerprint")
    assert(fps(1L) !== fps(3L), "a cross-window energy move must move the fingerprint")
  }

  test("edge rules: empty payload -> zero bands; sub-window payload fingerprints") {
    val fps = fingerprint(Seq(
      (1L, Array.empty[Byte]),
      (2L, Array.tabulate(10)(i => (100 + i * 9).toByte))))
    assert(fps(1L) === Seq(0L, 0L, 0L, 0L))
    // one window replicated across the grid: every threshold bit is 1 (g_k*32 == tot)
    // and every delta bit is 1 (g_k == g_{k-1}) -> all four bands saturate
    assert(fps(2L) === Seq(65535L, 65535L, 65535L, 65535L))
  }

  test("end-to-end at sf0.001: every planted pair lands in one distance-0 cluster") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("dedup_audio_fingerprint")(s, dir)
      .as[(Long, Long, Long)].collect()
    val docs = graft.engine.Tables(s, dir, "documents")
      .select($"doc_id").as[Long].collect()
    // star semantics: (canon, member, 0) edges define the exact-fingerprint clusters;
    // a planted (d, d+1M) pair must share a canon — identical fingerprints by the
    // in-window-permutation invariance
    val canon = out.filter(_._3 == 0L).map(r => r._2 -> r._1).toMap
    def root(d: Long): Long = canon.getOrElse(d, d)
    docs.foreach { d =>
      assert(root(d) === root(d + 1000000L),
        s"planted twin of doc $d not in its distance-0 cluster")
    }
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
