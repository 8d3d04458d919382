package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the two properties that make `dedup_bloom_admit` sound and worthwhile:
 *
 *  1. NO FALSE NEGATIVES — every fingerprint that was put into the sketch must probe
 *     positive, because the query admits bloom-misses WITHOUT the exact-confirm join;
 *     a false negative would emit a duplicate as "admitted". This also guards the
 *     build/probe byte-path agreement (`stat.bloomFilter` puts UTF-8 bytes;
 *     `mightContainString` must probe the same bytes).
 *  2. PRUNING IS REAL — genuinely-new rows must overwhelmingly MISS the sketch (≈fpp
 *     survives), because the whole point is that provably-unseen rows skip the join.
 *     If everything probed positive the operator would be a slower exact join.
 *
 * Plus the end invariant: the emitted decisions equal the plain exact left join — the
 * sketch prunes, it never decides.
 */
class DedupBloomSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bloom sketch has no false negatives over the existing corpus") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val (_, exIdx, bloom) = Dedup.bloomAdmitParts(spark, dir)
    val fps = exIdx.select($"fp").as[String].collect()
    assert(fps.nonEmpty)
    val misses = fps.filterNot(bloom.mightContainString)
    assert(misses.isEmpty,
      s"${misses.length}/${fps.length} inserted fingerprints probed NEGATIVE — " +
        "a false negative admits a duplicate without confirmation")
  }

  test("bloom prunes most genuinely-new rows off the confirm join") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val (incoming, exIdx, bloom) = Dedup.bloomAdmitParts(spark, dir)
    val seen = exIdx.select($"fp").as[String].collect().toSet
    val newFps = incoming.select(org.apache.spark.sql.functions.md5($"text").as("fp"))
      .as[String].collect().filterNot(seen)
    assert(newFps.nonEmpty)
    val falsePos = newFps.count(bloom.mightContainString)
    // at fpp=0.03 expect ~3% of new rows to survive; allow generous headroom (20%)
    assert(falsePos.toDouble / newFps.length < 0.2,
      s"$falsePos/${newFps.length} new fingerprints probed positive — sketch is not pruning")
  }

  test("emitted decisions equal the plain exact left join") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val got = graft.SparkEntry.queries("dedup_bloom_admit")(spark, dir)
      .as[(Long, String, Option[Long])].collect().toSeq
    val (incoming, exIdx, _) = Dedup.bloomAdmitParts(spark, dir)
    val expect = incoming
      .withColumn("fp", org.apache.spark.sql.functions.md5($"text"))
      .join(exIdx, Seq("fp"), "left_outer")
      .select($"doc_id",
        org.apache.spark.sql.functions.when($"ex_id".isNotNull, "exact_dup")
          .otherwise("admitted").as("status"),
        $"ex_id".as("match_id"))
      .orderBy($"doc_id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got == expect)
    assert(got.exists(_._2 == "exact_dup") && got.exists(_._2 == "admitted"))
  }
}
