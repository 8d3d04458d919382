package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `dedup_audio_partial` rests on (the VideoPartialSpec discipline at
 * WAV-window granularity):
 *
 *  1. WINDOW-ALIGNED SPLICE FIDELITY — the splice payload is samples 0..cut-1 of
 *     source A followed by samples cut.. of source B, with the cut on a window
 *     boundary and the B side keeping its ABSOLUTE offsets, so every splice window is
 *     byte-identical to a source window; the WAV round-trip preserves it sample for
 *     sample. This is what lets the oracle compute splice signatures straight off the
 *     source bytes.
 *  2. WINDOW-RELATIVE ORDER-SENSITIVITY — the s1 moment weights offsets WITHIN the
 *     window, so it moves under an in-window swap of unequal bytes (which the audio
 *     near-dup energy fingerprint is deliberately blind to) yet stays slice-stable
 *     across the splice (weights don't depend on the window's absolute position).
 *  3. FULL BRUTE-FORCE EQUALITY at sf0.001 — an independent driver-side
 *     reimplementation (window slices, signatures, the RELATIVE df cap,
 *     distinct-per-clip, shared count, bar) reproduces the engine's ENTIRE output
 *     row set; and every splice pairs with both of its sources whenever the expected
 *     shared-rare-window count clears the bar — computed from raw bytes, not assumed.
 */
class AudioPartialSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark
  private val Win = Multimodal.AudioWin
  private val Cut = Multimodal.AudioSpliceWindows * Multimodal.AudioWin

  private def windowSigs(p: Array[Byte]): Set[(Long, Long, Long)] =
    p.grouped(Win).map { w =>
      var s0 = 0L; var s1 = 0L; var i = 0
      while (i < w.length) { val v = (w(i) & 0xff).toLong; s0 += v; s1 += (i + 1L) * v; i += 1 }
      (w.length.toLong, s0, s1)
    }.filter(_._1 > 0).toSet

  test("the WAV round-trip preserves samples, so window sigs compute off raw bytes") {
    val s = spark
    import s.implicits._
    val p = Array.tabulate(333)(i => (i * 13 + 7).toByte)
    val media = Seq(Multimodal.MediaRow(5L, p)).toDS()
    val wav = Multimodal.encodeWav(media, id => 8000 + (id % 8).toInt * 1000)
    val got = Multimodal.audioWindowSigs(wav, Win).collect()
      .map(f => (f.flen, f.s0, f.s1)).toSet
    assert(got === windowSigs(p), "decoded window sigs must equal the raw-byte sigs")
  }

  test("s1 is order-sensitive in-window and position-stable across windows") {
    val a = Array.tabulate(Win)(i => (i * 5).toByte)
    val b = a.clone(); b(0) = a(1); b(1) = a(0) // swap two unequal bytes
    assert(windowSigs(a) !== windowSigs(b),
      "an in-window swap of unequal bytes must move the signature")
    // the same 64 bytes produce the same signature wherever the window sits —
    // exactly why a window-aligned splice inherits its sources' signatures
    val shifted = Array.fill(Win)(0.toByte) ++ a
    assert(windowSigs(shifted).contains(windowSigs(a).head))
  }

  test("brute-force equality at sf0.001; splices pair with both sources past the bar") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.engine.Tables(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> t.getBytes("UTF-8") }.toMap
    val spliceOf: Map[Long, (Long, Long)] = docs.keys.toSeq.sorted
      .filter { d =>
        d % 7 == 3 && docs.contains(d + 1) &&
          docs(d).length >= Cut && docs(d + 1).length > Cut
      }
      .map(d => (d + 2000000L) -> ((d, d + 1)))
      .toMap
    val sigsByClip: Map[Long, Set[(Long, Long, Long)]] =
      docs.map { case (d, p) => d -> windowSigs(p) } ++
        spliceOf.map { case (sid, (d, e)) =>
          sid -> windowSigs(docs(d).take(Cut) ++ docs(e).drop(Cut))
        }
    val cap = math.max(Multimodal.VideoSigMaxDf.toLong,
      (docs.size + spliceOf.size + Multimodal.VideoSigRareDenom - 1) /
        Multimodal.VideoSigRareDenom)
    val df = sigsByClip.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val rare = df.filter(_._2 <= cap).keySet
    val expected = (for {
      (a, sa) <- sigsByClip.toSeq
      (b, sb) <- sigsByClip.toSeq
      if a < b
      shared = (sa & sb & rare).size
      if shared >= Multimodal.AudioMinSharedWindows
    } yield (a, b, shared.toLong)).toSet
    val got = graft.SparkEntry.queries("dedup_audio_partial")(s, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected, "engine output must equal the brute-force pair set")
    spliceOf.foreach { case (sid, (d, e)) =>
      Seq(d, e).foreach { src =>
        val shared = (sigsByClip(sid) & sigsByClip(src) & rare).size
        if (shared >= Multimodal.AudioMinSharedWindows)
          assert(got.contains((src, sid, shared.toLong)),
            s"splice $sid must pair with source $src at $shared shared windows")
      }
    }
    val clearing = spliceOf.count { case (sid, (d, _)) =>
      (sigsByClip(sid) & sigsByClip(d) & rare).size >= Multimodal.AudioMinSharedWindows }
    assert(clearing > spliceOf.size / 2,
      s"only $clearing of ${spliceOf.size} splices clear the bar against source A")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
