package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural properties of `graph_pagerank` the value-hash oracle can't state: the
 * damped floor, no mass creation under floor division, and the hub-ranks-highest
 * ordering on the real bipartite graph.
 */
class PageRankSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val S = 1000000000000L

  private lazy val ranks =
    graft.SparkEntry.queries("graph_pagerank")(spark, dir).cache()

  test("every rank sits on or above the damped floor; floor division never creates mass") {
    import spark.implicits._
    val floor = S * 15L / 100L
    assert(ranks.filter($"rank" < floor).count() === 0L)
    val agg = ranks.agg(sum($"rank").as("total"), count(lit(1)).as("n")).collect().head
    // teleport adds 15% of S per node per round; flow is bounded by the mass present, so
    // the damped fixed point can never exceed the initial uniform mass N*S (floors only
    // leak mass downward)
    assert(agg.getAs[Long]("total") <= agg.getAs[Long]("n") * S)
  }

  test("the highest-degree node outranks the median node") {
    import spark.implicits._
    // recompute degrees the same way the query builds them
    val raw = Tables(spark, dir, "events")
      .select($"user_id".as("u"),
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .filter($"k".isNotNull).distinct()
    val deg = raw.groupBy($"k").agg(count(lit(1)).as("deg"))
    val topTopic = deg.orderBy($"deg".desc, $"k").first()
    val topRank = ranks.filter($"kind" === "k" && $"id" === topTopic.getAs[Long]("k"))
      .first().getAs[Long]("rank")
    val medianish = ranks.filter($"kind" === "k")
      .agg(percentile_approx($"rank", lit(0.5), lit(1000))).first().getLong(0)
    assert(topRank >= medianish,
      s"top-degree topic rank $topRank should be >= median topic rank $medianish")
  }
}
