package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `text_winnow_fingerprint` / `dedup_winnow_pairs` rest on
 * (Schleimer–Wilkerson–Aiken winnowing, SIGMOD'03):
 *
 *  1. THE MATCH GUARANTEE — any shared substring of length >= w + k - 1 between two
 *     documents shares at least one SELECTED fingerprint, regardless of where the
 *     substring sits in either document (the position-robustness a whole-document
 *     hash lacks).
 *  2. THE RIGHTMOST TIE RULE — on a constant document every gram hashes identically,
 *     so each window must select its RIGHTMOST position: selections are exactly
 *     positions w-1 .. nh-1.
 *  3. EDGE SIZES — a document shorter than k emits nothing; one with fewer than w
 *     gram hashes winnows over a single window and emits exactly one selection.
 *  4. DENSITY — selections per document stay near the scheme's expected 2/(w+1) of
 *     gram positions (loose band; guards against accidentally emitting every gram or
 *     only one).
 */
class WinnowSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def fps(docs: (Long, String)*): Map[Long, Set[(Long, Long)]] =
    TextOps.winnowFingerprints(spark, docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSet }

  /** Independent O(n·w) brute-force reference — no deque, no packing, straight from
    * the SWA definition (min hash per window, rightmost position on ties). */
  private def ref(text: String): Set[(Long, Long)] = {
    val cps = text.codePoints().toArray
    val nh = cps.length - (TextOps.WinnowK - 1)
    if (nh <= 0) return Set.empty
    val hs = (0 until nh).map { i =>
      (0 until TextOps.WinnowK).foldLeft(0L)((a, t) =>
        (a * TextOps.WinnowB + cps(i + t)) % TextOps.WinnowM)
    }
    val w = math.min(TextOps.WinnowW, nh)
    (0 to nh - w).map { j =>
      val win = (j until j + w).map(i => (hs(i), i))
      val m = win.map(_._1).min
      (win.filter(_._1 == m).map(_._2).max.toLong, m)
    }.toSet
  }


  test("shared substring of length >= w + k - 1 shares a selected fingerprint") {
    val shared = "zqxwvyjkpf" // w + k - 1 = 9 <= 10 chars, absent from the padding
    val pads = Seq(
      ("left pad words before ", " and trailing tail"),
      ("", " other suffix content here"),
      ("completely different preamble text goes on a while ", ""))
    val docs = pads.zipWithIndex.map { case ((l, r), ix) =>
      (ix.toLong, l + shared + r)
    }
    val out = fps(docs: _*)
    val valueSets = docs.map { case (id, _) => out(id).map(_._2) }
    for (Seq(a, b) <- valueSets.combinations(2))
      assert(a.intersect(b).nonEmpty,
        "documents sharing a >= w+k-1 substring must share a selected fingerprint value")
  }

  test("constant text selects the rightmost position of every window") {
    val n = 20
    val doc = "a" * n
    val nh = n - (TextOps.WinnowK - 1)
    val out = fps((1L, doc))(1L)
    assert(out.map(_._2).size === 1, "constant text has one gram hash value")
    assert(out.map(_._1) ===
      ((TextOps.WinnowW - 1).toLong until nh.toLong).toSet,
      "each window must keep its RIGHTMOST minimal position")
  }

  test("shorter than k emits nothing; fewer than w grams emit exactly one selection") {
    val tiny = "abcd" // < k = 6
    val small = "abcdefgh" // nh = 3 < w = 4
    val out = fps((1L, tiny), (2L, small), (3L, ""))
    assert(!out.contains(1L) && !out.contains(3L))
    assert(out(2L).size === 1, "a single short window emits exactly one fingerprint")
  }

  test("native winnow_select equals an independent brute-force reference, incl. multibyte") {
    val rnd = new scala.util.Random(7)
    val multibyte = "héllo wörld — 日本語のテキスト 𝄞𝄞𝄞 clef run αβγδε mixed ascii tail"
    val texts = Seq(
      multibyte,
      "aaaaaaaaaaaaaaaa",                    // all-tie stress
      "ababababababab",                      // periodic ties
      multibyte + multibyte,                 // repeated content re-selection
      Seq.fill(200)(('a' + rnd.nextInt(4)).toChar).mkString, // tiny alphabet, many ties
      Seq.fill(300)((0x3040 + rnd.nextInt(90)).toChar).mkString) // hiragana block
    val out = fps(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out.getOrElse(i.toLong, Set.empty) === ref(t),
        s"engine selection diverges from brute force on text #$i")
    }
  }

  test("property: 120 random unicode strings match the brute-force reference (seed 2026)") {
    // seeded generator over hostile ranges: ASCII, Latin-1, CJK, and ASTRAL code
    // points (surrogate pairs in the JVM string — the code-point/code-unit trap),
    // plus tiny alphabets for tie storms and lengths straddling every edge (0, <k,
    // =k, <k+w, long)
    val rnd = new scala.util.Random(2026)
    val pools = Seq(
      ('a' to 'z').map(_.toInt),
      (0x20 to 0xFF).toSeq,
      (0x4E00 to 0x4E80).toSeq,
      Seq(0x1D11E, 0x1F600, 0x10348, 0x20000), // astral: surrogate pairs
      Seq('a'.toInt, 'b'.toInt))               // 2-symbol tie storm
    def gen(): String = {
      val pool = pools(rnd.nextInt(pools.size))
      val len = Seq(0, 3, 6, 8, 9, 40, 200)(rnd.nextInt(7))
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(pool(rnd.nextInt(pool.size))))
      sb.toString
    }
    val texts = Seq.fill(120)(gen())
    val out = fps(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out.getOrElse(i.toLong, Set.empty) === ref(t),
        s"divergence on generated text #$i: ${t.take(40)}")
    }
  }

  test("selection density stays near 2/(w+1)") {
    // deterministic pseudo-random text: varied grams, no engineered structure
    val rnd = new scala.util.Random(42)
    val text = Seq.fill(120)(('a' + rnd.nextInt(26)).toChar).mkString
    val nh = text.length - (TextOps.WinnowK - 1)
    val got = fps((1L, text))(1L).size.toDouble / nh
    val expect = 2.0 / (TextOps.WinnowW + 1)
    assert(got > expect * 0.5 && got < expect * 2.0,
      s"density $got far from the expected ~$expect")
  }
}
