package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the incremental connected-components construction behind
 * `dedup_components_incremental`: prior clusters enter the new pass as STAR EDGES
 * (member → prior label) instead of their full pair graph, and the result must be
 * EXACTLY the full recompute — star edges preserve connectivity classes, and min-label
 * propagation finds the same global min through a star as through the original edges
 * (the prior label IS the old component's min, so the new min is min(old label, new
 * attachments' ids), which the star reaches in one hop).
 *
 * The corpus-scale equivalence is oracle-gated: the query shares dedup_components'
 * DuckDB closure SQL verbatim and both pass at the driver's sf0.01 gate (472 identical
 * components there; the in-tree end-to-end test below runs at sf0.001, 476 components).
 */
class DedupIncrementalCcSpec extends AnyFunSuite {

  private def pairsOf(p: (Long, Long)*) = {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(p.map(x => Row(x._1, x._2)), 2),
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))
  }

  private def labelSets(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    Dedup.propagateLabels(spark, pairsOf(pairs: _*))
      .as[(Long, Long)].collect().toMap
  }

  /** Run the incremental shape by hand: prior labels over oldPairs, then star ∪ newPairs. */
  private def incremental(oldPairs: Seq[(Long, Long)],
                          newPairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val star = labelSets(oldPairs).toSeq.collect { case (id, l) if id != l => (l, id) }
    labelSets(star ++ newPairs)
  }

  test("a new node bridging two prior components takes the global min label") {
    // prior: {1,2} and {10,11}; increment: 100 touches 2 and 11 → one component, min 1
    val full = labelSets(Seq((1L, 2L), (10L, 11L), (2L, 100L), (11L, 100L)))
    val inc = incremental(Seq((1L, 2L), (10L, 11L)), Seq((2L, 100L), (11L, 100L)))
    assert(inc === full)
    assert(inc.values.toSet === Set(1L))
  }

  test("untouched prior components survive star-compression byte-identically") {
    // prior: a 4-path {1..4} (3 edges, star re-enters as 3 edges to label 1) and a
    // triangle {20,21,22}; increment attaches only to the path
    val oldP = Seq((1L, 2L), (2L, 3L), (3L, 4L), (20L, 21L), (21L, 22L), (20L, 22L))
    val full = labelSets(oldP ++ Seq((4L, 50L)))
    val inc = incremental(oldP, Seq((4L, 50L)))
    assert(inc === full)
    assert(inc(22L) === 20L, "untouched triangle keeps its prior label")
  }

  test("star compression carries |V_old| edges, not |E_old|") {
    // a K6 clique: 15 old-old pairs compress to 5 star edges; equality still holds
    val ids = (1L to 6L)
    val clique = for (a <- ids; b <- ids if a < b) yield (a, b)
    val prior = labelSets(clique)
    val star = prior.toSeq.collect { case (id, l) if id != l => (l, id) }
    assert(clique.size === 15 && star.size === 5)
    assert(incremental(clique, Seq((6L, 7L))) === labelSets(clique ++ Seq((6L, 7L))))
  }

  test("end-to-end at sf0.001: incremental output equals the full recompute frame") {
    val spark = graft.SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val full = Dedup.queries("dedup_components")(spark, dir).collect().toSeq
    val inc = Dedup.queries("dedup_components_incremental")(spark, dir).collect().toSeq
    assert(inc === full)
  }
}
