package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Pins the r14 parameterized phash key-scheme generator (VERDICT r13 #5) three ways:
 *
 *  1. LOSSLESSNESS, property-style: for scheme (blocks, k), any two 64-bit hashes at
 *     Hamming distance <= blocks - k share at least one combo key (pigeonhole: d flips
 *     dirty <= d blocks, leaving >= k clean, so some k-subset is fully clean). Run for
 *     the shipped schemes (4,2)@2, (8,5)@3 and the new (6,3)@3 on an independent
 *     BIT-SLICE reference implementation (extract blocks straight from the packed
 *     64-bit value — no shared code with the generator's band div/mod arithmetic).
 *  2. The generator's Column arithmetic over band_0..3 equals that reference on
 *     random fingerprints — the engine keys are the mathematical keys.
 *  3. The generated (4,2) and (8,5) keys equal the r12/r13 HAND-WRITTEN formulas
 *     (inlined here verbatim), so delegating the shipped queries to the generator
 *     changed nothing ("existing gates unchanged" by proof, not hope).
 */
class PhashSchemeSpec extends AnyFunSuite {

  /** Independent reference: H = band_0·2^48 | band_1·2^32 | band_2·2^16 | band_3;
    * block m = the m-th top-aligned near-equal bit slice; key = big-endian fold. */
  private def refKeys(bands: Array[Long], blocks: Int, k: Int): Seq[Long] = {
    val h = (bands(0) << 48) | (bands(1) << 32) | (bands(2) << 16) | bands(3)
    val widths = Array.tabulate(blocks)(m => 64 / blocks + (if (m < 64 % blocks) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    def block(m: Int): Long = {
      val hi = starts(m) + widths(m) // from-top end
      (h >>> (64 - hi)) & ((1L << widths(m)) - 1)
    }
    (0 until blocks).combinations(k).map(c =>
      c.map(m => (block(m), widths(m))).reduceLeft[(Long, Int)] {
        case ((acc, _), (v, w)) => ((acc << w) | v, w)
      }._1).toSeq
  }

  private def toBands(h: Long): Array[Long] =
    Array((h >>> 48) & 0xffffL, (h >>> 32) & 0xffffL, (h >>> 16) & 0xffffL, h & 0xffffL)

  test("losslessness: any <= (blocks-k)-flip pair shares a combo key, per scheme") {
    val rnd = new Random(2026)
    for ((blocks, k) <- Seq((4, 2), (8, 5), (6, 3)); _ <- 1 to 400) {
      val bar = blocks - k
      val h = rnd.nextLong()
      val d = 1 + rnd.nextInt(bar)
      val flips = rnd.shuffle((0 until 64).toList).take(d)
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val shared = refKeys(toBands(h), blocks, k).toSet
        .intersect(refKeys(toBands(h2), blocks, k).toSet)
      assert(shared.nonEmpty,
        s"scheme ($blocks,$k): $d-flip pair lost all keys (h=$h flips=$flips)")
    }
  }

  test("the generator's Column keys equal the bit-slice reference on random hashes") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rnd = new Random(42)
    val hashes = Seq.fill(200)(rnd.nextLong())
    val df = hashes.map { h => val b = toBands(h); (h, b(0), b(1), b(2), b(3)) }
      .toDF("h", "band_0", "band_1", "band_2", "band_3")
    for ((blocks, k) <- Seq((4, 2), (8, 5), (6, 3))) {
      val got = df.select($"h", array(Multimodal.phashComboKeysGen(blocks, k): _*).as("keys"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      hashes.foreach { h =>
        assert(got(h) == refKeys(toBands(h), blocks, k),
          s"scheme ($blocks,$k) diverged from the reference on h=$h")
      }
    }
  }

  test("generated (4,2) and (8,5) keys equal the r12/r13 hand-written formulas") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rnd = new Random(7)
    val df = Seq.fill(200)(rnd.nextLong()).map { h =>
      val b = toBands(h); (b(0), b(1), b(2), b(3))
    }.toDF("band_0", "band_1", "band_2", "band_3")
    // r12 pair keys, verbatim
    val legacyPairs = Multimodal.PhashBandPairs.map { case (i, j) =>
      col(s"band_$i") * lit(65536L) + col(s"band_$j") }
    // r13 byte-block keys, verbatim
    def blk(m: Int) =
      if (m % 2 == 0) expr(s"shiftright(band_${m / 2}, 8)") else expr(s"band_${m / 2} % 256")
    val legacy3 = Multimodal.Phash3BlockCombos.map(c =>
      c.map(blk).reduce((a, b) => a * lit(256L) + b))
    val bad = df.select(
        array(Multimodal.phashComboKeysGen(4, 2): _*).as("g2"),
        array(legacyPairs: _*).as("l2"),
        array(Multimodal.phashComboKeysGen(8, 5): _*).as("g3"),
        array(legacy3: _*).as("l3"))
      .filter($"g2" =!= $"l2" || $"g3" =!= $"l3").count()
    assert(bad === 0L, "generator keys diverged from the hand-written formulas")
  }
}
