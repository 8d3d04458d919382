package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The Misra–Gries candidate pass on a SKEWED stream — the regime the oracle-gated
 * `events_heavy_hitters` run can't reach (the driver testdata's user distribution is
 * near-uniform, so no eviction wave ever fires there): capacity is respected under
 * pressure, the φ-heavy key always survives, and the sketch genuinely prunes.
 */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  // 40k-element stream over 4 partitions: key 7 carries ~40% of the mass, keys
  // 100..109 ~1% each, the tail is all-distinct (keys 10000+)
  private def skewed = {
    import spark.implicits._
    val heavy = Seq.fill(16000)(7L)
    val medium = (0 until 10).flatMap(i => Seq.fill(400)(100L + i))
    val tail = (0 until 20000).map(i => 10000L + i)
    spark.createDataset(scala.util.Random.shuffle(heavy ++ medium ++ tail).toList)
      .repartition(4)
  }

  test("capacity bound holds per partition and the sketch prunes the tail") {
    import spark.implicits._
    val cap = 50
    val perPart = MisraGries.candidates(skewed, cap)
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.forall(_ <= cap), s"partition emitted more than $cap candidates: ${perPart.toSeq}")
    val nCands = MisraGries.candidates(skewed, cap).distinct().count()
    assert(nCands < 1000L, s"sketch failed to prune: $nCands candidates from 20011 distinct keys")
  }

  test("every phi-heavy key survives; exact recount equals the naive answer") {
    import spark.implicits._
    val cap = 50L
    val ds = skewed.cache()
    try {
      val n = ds.count()
      val cands = MisraGries.candidates(ds, cap).distinct().toDF("k")
      val exact = ds.toDF("k").join(broadcast(cands), Seq("k"))
        .groupBy($"k").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * cap > n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val naive = ds.toDF("k").groupBy($"k").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * cap > n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(exact === naive)
      assert(naive.contains(7L), "the 40% key must be phi-heavy at cap 50")
    } finally ds.unpersist()
  }
}
