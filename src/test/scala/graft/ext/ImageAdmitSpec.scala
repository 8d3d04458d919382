package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the claims `dedup_image_admit_stream` (streaming image admission against the
 * corpus perceptual-hash index) rests on:
 *
 *  1. PLANTED GUARANTEE at sf0.001 — every twin (the aHash-invariant non-sampled-row
 *     perturbation of an existing image) is flagged near_dup at distance 0, and its
 *     match_hid is exactly the canonical id of its source's fingerprint value,
 *     recomputed independently here from the existing corpus.
 *  2. DECISION SHAPE — every feed doc answers exactly once; fresh docs are admitted
 *     unless a corpus value sits within the Hamming bar (spot-checked: admitted docs
 *     have null match columns, near_dups carry ham <= 2).
 */
class ImageAdmitSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("twins flag near_dup at distance 0 with the source value's canonical id") {
    val s = spark
    import s.implicits._
    val out = graft.SparkEntry.queries("dedup_image_admit_stream")(s, dir)
      .as[(Long, String, Option[Long], Option[Long])].collect()
    val docs = graft.engine.Tables(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val existing = docs.filter(_._1 % 5 != 0)
    // independent canonical map: existing fingerprints -> min doc_id, via the engine's
    // own hash function over unperturbed payloads (the twin's hash equals its source's)
    val exHash = {
      val media = s.createDataset(existing.map { case (d, t) =>
        Multimodal.MediaRow(d, t.getBytes("UTF-8")) })
      Multimodal.avgHashBands(Multimodal.encodeBmp(media, width = 8))
        .collect().map(h => h.doc_id -> (h.band_0, h.band_1, h.band_2, h.band_3)).toMap
    }
    val canon = exHash.toSeq.groupBy(_._2).map { case (v, ds) => v -> ds.map(_._1).min }
    val byId = out.map(r => r._1 -> r).toMap
    val feedIds = docs.filter(_._1 % 5 == 0).map(_._1) ++
      existing.filter(_._1 % 9 == 2).map(_._1 + 2000000L)
    assert(out.length === feedIds.length, "every feed doc must answer exactly once")
    existing.filter(_._1 % 9 == 2).foreach { case (d, _) =>
      val r = byId(d + 2000000L)
      assert(r._2 === "near_dup" && r._4 === Some(0L),
        s"twin of $d must flag near_dup at distance 0, got $r")
      assert(r._3 === Some(canon(exHash(d))),
        s"twin of $d must match its source value's canonical ${canon(exHash(d))}, got $r")
    }
    out.foreach { r =>
      if (r._2 == "admitted") assert(r._3.isEmpty && r._4.isEmpty, s"admitted row carries a match: $r")
      else assert(r._4.exists(_ <= 2), s"near_dup row outside the Hamming bar: $r")
    }
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
