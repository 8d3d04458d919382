package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based pin of the Misra–Gries guarantee the heavy-hitters two-pass relies on:
 * for RANDOM streams (mixed skew profiles, random partitioning, random capacity), every
 * key with global count > N/capacity appears in the union of per-partition candidate
 * summaries — the superset property that makes the exact recount lossless. The seed is
 * logged; set GRAFT_MG_SEED to reproduce a failure exactly.
 */
class MisraGriesPropSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("random streams: phi-heavy keys always survive the per-partition summaries") {
    import spark.implicits._
    val seed = sys.env.get("GRAFT_MG_SEED").map(_.toLong)
      .getOrElse(scala.util.Random.nextLong())
    info(s"GRAFT_MG_SEED=$seed")
    val rnd = new scala.util.Random(seed)

    val streamGen: Gen[(List[Long], Int, Int)] = for {
      nHeavy <- Gen.choose(0, 4)
      heavyKeys <- Gen.listOfN(nHeavy, Gen.choose(0L, 50L))
      heavyReps <- Gen.choose(50, 400)
      tailSize <- Gen.choose(0, 2000)
      // tail keys from a band overlapping the heavy range — collisions intended
      tail <- Gen.listOfN(tailSize, Gen.choose(0L, 5000L))
      cap <- Gen.choose(5, 60)
      parts <- Gen.choose(1, 8)
    } yield (heavyKeys.flatMap(k => List.fill(heavyReps)(k)) ++ tail, cap, parts)

    (1 to 25).foreach { i =>
      val params = Gen.Parameters.default
      val genSeed = rng.Seed(rnd.nextLong())
      val (stream, cap, parts) = streamGen.apply(params, genSeed)
        .getOrElse(fail(s"generator exhausted at case $i"))
      if (stream.nonEmpty) {
        val n = stream.size.toLong
        val shuffled = new scala.util.Random(rnd.nextLong()).shuffle(stream)
        val ds = spark.createDataset(shuffled).repartition(parts)
        val cands = MisraGries.candidates(ds, cap).distinct().collect().toSet
        val exactHeavy = shuffled.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
          .filter { case (_, c) => c * cap > n }.keySet
        val missed = exactHeavy -- cands
        assert(missed.isEmpty,
          s"case $i (n=$n cap=$cap parts=$parts): phi-heavy keys $missed missing " +
            s"from ${cands.size} candidates [seed=$seed]")
      }
    }
  }
}
