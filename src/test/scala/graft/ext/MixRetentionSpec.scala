package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r7 curation operators — properties the DuckDB oracle
  * (which replays the same algebra) cannot independently witness. */
class MixRetentionSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("corpus_mix_temperature: quotas exhaust the budget exactly and boost small sources") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val mix = graft.SparkEntry.queries("corpus_mix_temperature")(spark, dir).cache()
    try {
      val rows = mix.collect()
      assert(rows.map(_.getAs[Long]("quota")).sum === 10000L,
        "largest-remainder allocation must exhaust the budget exactly")
      // sqrt temperature flattens the distribution: the smallest source's share of the
      // budget must exceed its share of documents, the largest source's must shrink
      val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
      val smallest = rows.minBy(_.getAs[Long]("n_docs"))
      val largest = rows.maxBy(_.getAs[Long]("n_docs"))
      if (smallest.getAs[Long]("n_docs") != largest.getAs[Long]("n_docs")) {
        assert(smallest.getAs[Long]("quota") / 10000.0 > smallest.getAs[Long]("n_docs") / n,
          "temperature sampling must upsample the smallest source")
        assert(largest.getAs[Long]("quota") / 10000.0 < largest.getAs[Long]("n_docs") / n,
          "temperature sampling must downsample the largest source")
      }
    } finally mix.unpersist()
  }

  test("text_mix_weighted: every complete round carries exactly `wgt` docs per source") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val mix = graft.SparkEntry.queries("text_mix_weighted")(spark, dir).cache()
    try {
      // per (source, round) contribution: wgt docs in every round except the source's
      // final (possibly partial) one — this is the "ratio holds at every prefix" claim
      val counts = mix.groupBy($"source", $"wgt", $"round")
        .agg(count(lit(1)).as("n"), max($"src_rank").as("max_rank"))
      val lastRound = mix.groupBy($"source").agg(max($"round").as("last_round"))
      val bad = counts.join(lastRound, "source")
        .filter(($"round" < $"last_round" && $"n" =!= $"wgt") || $"n" > $"wgt")
      assert(bad.isEmpty, s"complete rounds must carry exactly wgt docs:\n${bad.collect().mkString("\n")}")
      // ranks are dense per source: max rank == doc count
      val dense = mix.groupBy($"source").agg(count(lit(1)).as("n"), max($"src_rank").as("mx"))
        .filter($"n" =!= $"mx")
      assert(dense.isEmpty, "per-source ranks must be dense 1..n")
    } finally mix.unpersist()
  }

  test("events_retention: offset-0 cells partition the user base (sum = distinct users)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val ret = graft.SparkEntry.queries("events_retention")(spark, dir)
    assert(ret.filter($"weeks_since" < 0).isEmpty, "offsets are measured from the cohort week")
    // every user is active in their own first week, so the weeks_since=0 cells hold each
    // user exactly once — their sum must equal the distinct-user total
    val cohortSum = ret.filter($"weeks_since" === 0)
      .agg(sum($"active_users")).as[Long].head()
    val users = graft.engine.Tables(spark, dir, "events")
      .select($"user_id").distinct().count()
    assert(cohortSum == users, s"offset-0 cells sum to $cohortSum, expected $users")
  }
}
