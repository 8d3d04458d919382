package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `dedup_image_phash` rests on:
 *
 *  1. BANDED CANDIDATES ARE LOSSLESS AT THE VERIFY BAR — with a 64-bit hash split
 *     into 4×16-bit bands and candidate keys on PAIRS of bands (32-bit keys, the r12
 *     scale fix: single 16-bit keys birthday-collide quadratically at corpus scale),
 *     any pair within Hamming [[Multimodal.PhashMaxHamming]] (= 2) dirties at most 2
 *     bands, leaving a fully-clean band PAIR (pigeonhole), so the pair-key equi-join
 *     plus popcount verify finds EXACTLY the brute-force Hamming <= 2 pair set.
 *  2. PLANTED NEAR-DUPS ARE HASH-INVARIANT — perturbing only NON-sampled rows of the
 *     pixel grid cannot change the aHash (the 8×8 nearest-neighbor grid never reads
 *     those rows), while perturbing a SAMPLED row hard enough does: the fingerprint is
 *     sensitive to what it claims to sample and blind to what it skips.
 *  3. THE WIDENED SCHEME IS LOSSLESS AT 3 — `dedup_image_phash3` keys on C(8,5)
 *     byte-block subsets (Manku-style), so <= 3 flipped bits leave a clean 5-subset
 *     and the d=3-spread pairs invisible to the pair keys must surface.
 *  4. END-TO-END at sf0.001: every planted (d, d+1M) pair surfaces at distance 0, in
 *     both variants.
 */
class ImagePhashSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  /** Brute-force Hamming <= bar pairs over explicit 4-band hashes. */
  private def brute(hashes: Map[Long, Seq[Long]], bar: Int): Set[(Long, Long)] =
    (for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq if a < b
      d = ha.zip(hb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= bar
    } yield (a, b)).toSet

  /** The queries' candidate+verify plan over the same explicit hashes, for either key
    * scheme ([[Multimodal.phashPairKeys]] / [[Multimodal.phash3ComboKeys]]). */
  private def banded(hashes: Map[Long, Seq[Long]],
      keys: Seq[org.apache.spark.sql.Column], bar: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = hashes.toSeq.map { case (id, bs) => (id, bs(0), bs(1), bs(2), bs(3)) }
      .toDF("doc_id", "band_0", "band_1", "band_2", "band_3")
    val bands = df.select($"doc_id", posexplode(array(keys: _*)).as(Seq("ci", "cv")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val ham = (0 until 4)
      .map(b => bit_count(col(s"ha.band_$b").bitwiseXOR(col(s"hb.band_$b"))))
      .reduce(_ + _)
    cand.join(df.as("ha"), $"doc_a" === col("ha.doc_id"))
      .join(df.as("hb"), $"doc_b" === col("hb.doc_id"))
      .filter(ham <= bar)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
  }

  test("band-pair candidate join + verify equals brute force at Hamming <= 2") {
    // distances engineered around the bar: 0 (identical), 1 and 2 (must pair — the
    // d=2 case dirties TWO bands, so only the remaining clean pair key finds it, the
    // pigeonhole's exact boundary), 3 spread across three bands (must NOT pair — and
    // is also invisible to the pair join: no clean pair remains), 3 concentrated in
    // one band (candidate via clean pairs, killed by verify)
    val base = Seq(0xAAAAL, 0x5555L, 0xF0F0L, 0x0F0FL)
    val hashes = Map[Long, Seq[Long]](
      1L -> base,
      2L -> base,                                           // d=0
      3L -> Seq(0xAAABL, 0x5555L, 0xF0F0L, 0x0F0FL),        // d=1
      4L -> Seq(0xAAABL, 0x5554L, 0xF0F0L, 0x0F0FL),        // d=2, two bands dirty
      5L -> Seq(0xAAABL, 0x5554L, 0xF0F1L, 0x0F0FL),        // d=3, spread
      6L -> Seq(0xAAAAL ^ 0x7L, 0x5555L, 0xF0F0L, 0x0F0FL), // d=3, one band
      7L -> Seq(0x1234L, 0x9876L, 0x4321L, 0x6789L))        // unrelated
    val bf = brute(hashes, Multimodal.PhashMaxHamming)
    assert(banded(hashes, Multimodal.phashPairKeys, Multimodal.PhashMaxHamming) === bf)
    assert(bf.contains((1L, 2L)) && bf.contains((1L, 3L)) && bf.contains((1L, 4L)))
    assert(!bf.contains((1L, 5L)) && !bf.contains((1L, 6L)) && !bf.contains((1L, 7L)))
  }

  test("C(8,5) block-key candidate join + verify equals brute force at Hamming <= 3") {
    // the widened scheme's whole point: d=3 SPREAD ACROSS THREE BANDS — invisible to
    // the pair keys (no clean band pair survives) — must pair here (<= 3 flipped bits
    // dirty <= 3 of the 8 byte-blocks, leaving a clean 5-subset); d=4 spread across
    // four bands must not (killed by verify, and can dirty 4 blocks)
    val base = Seq(0xAAAAL, 0x5555L, 0xF0F0L, 0x0F0FL)
    val hashes = Map[Long, Seq[Long]](
      1L -> base,
      2L -> Seq(0xAAABL, 0x5554L, 0xF0F1L, 0x0F0FL),        // d=3, three bands dirty
      3L -> Seq(0xAAABL, 0x5554L, 0xF0F1L, 0x0F0EL),        // d=4, four bands dirty
      4L -> Seq(0xAAAAL ^ 0x7L, 0x5555L, 0xF0F0L, 0x0F0FL), // d=3, one band (lo byte)
      5L -> Seq(0xAAAAL ^ 0x700L, 0x5555L, 0xF0F0L, 0x0F0FL), // d=3, one band (hi byte)
      6L -> Seq(0x1234L, 0x9876L, 0x4321L, 0x6789L))        // unrelated
    val bf = brute(hashes, Multimodal.Phash3MaxHamming)
    assert(banded(hashes, Multimodal.phash3ComboKeys, Multimodal.Phash3MaxHamming) === bf)
    assert(bf.contains((1L, 2L)), "d=3 spread must pair under the widened keys")
    assert(bf.contains((1L, 4L)) && bf.contains((1L, 5L)))
    assert(!bf.contains((1L, 3L)) && !bf.contains((1L, 6L)))
  }

  test("aHash ignores non-sampled-row perturbation and sees sampled-row change") {
    import spark.implicits._
    // 16 rows of 8 bytes: h=16, sampled rows = {0,2,4,...,14}; rows 1,3,.. are skipped
    val payload = Array.tabulate(128)(i => ((i * 7 + 3) % 251).toByte)
    val unsampledPerturbed = payload.clone()
    for (j <- payload.indices if (j / 8) % 2 == 1)
      unsampledPerturbed(j) = ((unsampledPerturbed(j) + 1) & 0xff).toByte
    val sampledPerturbed = payload.clone()
    for (j <- 0 until 8) sampledPerturbed(j) = 255.toByte // row 0 is sampled
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, payload),
      Multimodal.MediaRow(2L, unsampledPerturbed),
      Multimodal.MediaRow(3L, sampledPerturbed)))
    val out = Multimodal.avgHashBands(Multimodal.encodeBmp(media, width = 8))
      .collect().map(h => h.doc_id -> Seq(h.band_0, h.band_1, h.band_2, h.band_3)).toMap
    assert(out(1L) === out(2L), "non-sampled-row perturbation must not move the hash")
    assert(out(1L) !== out(3L), "a saturated sampled row must move the hash")
  }

  test("(6,3) generator keys: candidate join + verify equals brute force at Hamming <= 3") {
    // same boundary cases as the (8,5) test — the generator scheme must agree with
    // brute force at the SAME bar; the 33-bit keys only change candidate cost
    val base = Seq(0xAAAAL, 0x5555L, 0xF0F0L, 0x0F0FL)
    val hashes = Map[Long, Seq[Long]](
      1L -> base,
      2L -> Seq(0xAAABL, 0x5554L, 0xF0F1L, 0x0F0FL),        // d=3, three bands dirty
      3L -> Seq(0xAAABL, 0x5554L, 0xF0F1L, 0x0F0EL),        // d=4, four bands dirty
      4L -> Seq(0xAAAAL ^ 0x7L, 0x5555L, 0xF0F0L, 0x0F0FL), // d=3, one band
      5L -> Seq(0x1234L, 0x9876L, 0x4321L, 0x6789L))        // unrelated
    val bf = brute(hashes, Multimodal.Phash33MaxHamming)
    assert(banded(hashes, Multimodal.phashComboKeysGen(6, 3),
      Multimodal.Phash33MaxHamming) === bf)
    assert(bf.contains((1L, 2L)) && bf.contains((1L, 4L)))
    assert(!bf.contains((1L, 3L)) && !bf.contains((1L, 5L)))
  }

  for (q <- Seq("dedup_image_phash", "dedup_image_phash3", "dedup_image_phash33"))
    test(s"end-to-end at sf0.001: every planted pair surfaces at distance 0 ($q)") {
      import spark.implicits._
      val dir = "/root/testdata/sf0.001"
      val out = graft.SparkEntry.queries(q)(spark, dir)
        .as[(Long, Long, Long)].collect()
      val docs = graft.engine.Tables(spark, dir, "documents")
        .select($"doc_id").as[Long].collect()
      val planted = out.filter(r => r._2 == r._1 + 1000000L).map(r => (r._1, r._3)).toMap
      docs.foreach { d =>
        assert(planted.get(d).contains(0L), s"planted pair for doc $d missing or nonzero")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

  test("canonical clusters: closure of the pair graph, canon = min member, planted twins co-cluster") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val clusters = graft.SparkEntry.queries("dedup_image_canonical")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val pairs = graft.SparkEntry.queries("dedup_image_phash")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select($"doc_id").as[Long].collect()
    val all = docs ++ docs.map(_ + 1000000L)
    // independent union-find closure of the DOC-level pair output
    val parent = scala.collection.mutable.Map(all.map(d => d -> d): _*)
    def root(d: Long): Long = { var x = d; while (parent(x) != x) x = parent(x); x }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (root(a), root(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = all.groupBy(root).map { case (_, ms) =>
      (ms.min, ms.length.toLong, ms.max) }.toSet
    assert(clusters.toSet === expected,
      "canonical clusters must be exactly the connected components of the pair graph")
    assert(clusters.map(_._2).sum === all.length.toLong, "members must partition the corpus")
    docs.foreach(d => assert(root(d) === root(d + 1000000L), s"twin of $d not co-clustered"))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
