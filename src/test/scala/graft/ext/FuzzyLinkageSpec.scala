package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The skew-hardened fuzzy-linkage candidate join (r10 verdict "what's wrong" #1):
 * length-band sub-blocking must be LOSSLESS vs the plain blocked self-join (including
 * pairs whose lengths straddle a band boundary), a hot block that is length-DIVERSE
 * must pass because bands split it, and the residual irreducible case — one block full
 * of same-length names past the cap — must raise the named guard error instead of
 * straggling silently.
 */
class FuzzyLinkageSpec extends AnyFunSuite {

  private def namesDf(rows: Seq[(String, String)]): DataFrame = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    rows.toDF("name", "block")
  }

  /** The unguarded plain blocked join — the semantics oracle. */
  private def naive(names: DataFrame, maxDist: Int): Set[(String, String, String, Int)] = {
    names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .select(col("a.block"), col("a.name"), col("b.name"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
  }

  private def banded(names: DataFrame, maxDist: Int,
                     cap: Long): Set[(String, String, String, Int)] =
    Dedup.fuzzyBlockedPairs(names, maxDist, cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet

  test("length-band sub-blocking is lossless, including cross-band-boundary pairs") {
    // lengths 7 vs 8 and 3 vs 4 straddle the width-4 band boundary at Levenshtein <= 3:
    // a band join WITHOUT the neighbor-band explode would silently drop those pairs
    val rows = Seq(
      ("almond rose", "rose"), ("almondy rose", "rose"),   // len 11 vs 12, dist 1
      ("alm rose", "rose"), ("al rose", "rose"),           // len 8 vs 7 (bands 2 vs 1)
      ("x t", "t"), ("xy t", "t"), ("xyzz t", "t"),        // len 3/4/6 chain
      ("deep violet", "violet"), ("pale violet", "violet"),
      ("unrelatedlongname rose", "rose"))
    val names = namesDf(rows)
    val expected = naive(names, maxDist = 3)
    assert(expected.exists { case (_, a, b, _) => a.length != b.length },
      "fixture must exercise cross-length pairs")
    assert(banded(names, maxDist = 3, cap = 1000L) === expected)
  }

  test("a hot block that spreads across length bands passes under the cap") {
    // 12 names share one block (40% of corpus mass in VERDICT's adversarial regime) but
    // span lengths 4..26 — banding splits them so no (block, band) group exceeds cap=4
    val hot = (1 to 12).map(i => ("x" * i + " hub", "hub"))
    val cold = Seq(("a rose", "rose"), ("b rose", "rose"), ("c lily", "lily"))
    val names = namesDf(hot ++ cold)
    val expected = naive(names, maxDist = 3)
    assert(banded(names, maxDist = 3, cap = 4L) === expected)
  }

  test("an irreducible same-length hot block raises the named guard error") {
    // 10 same-length names in one block: every one lands in the SAME (block, band)
    // group, so with cap=4 the guard must raise loudly, naming the hot block
    val clones = (0 until 10).map(i => (s"name$i hub", "hub"))
    val names = namesDf(clones)
    val e = intercept[Exception] {
      Dedup.fuzzyBlockedPairs(names, maxDist = 3, blockCap = 4L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("fuzzy linkage") && m.contains("hub")),
      s"expected the guard's message naming the block, got: $e")
  }
}
