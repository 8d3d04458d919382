package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/**
 * Sketch-vs-exact validation for the HLL distinct-count path: approx_count_distinct at
 * rsd=0.02 must land within the sketch's error bound of the exact count_distinct answer
 * per group. A sketch can't hash-match a DuckDB oracle, so this spec IS its correctness
 * gate (the registry entry is rows/schema-gated).
 */
class SketchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  test("events_distinct_users_approx lands within the HLL error bound of the exact count") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    def collect(name: String): Map[String, Long] =
      graft.SparkEntry.queries(name)(spark, dir)
        .as[(String, Long)].collect().toMap
    val exact = collect("events_distinct_users")
    val approx = collect("events_distinct_users_approx")
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (tpe, n) =>
      // 5 standard errors at rsd=0.02 → ±10%; HLL++ bias correction keeps real error
      // far inside this at these cardinalities
      val tol = math.max(5.0 * 0.02 * n, 1.0)
      assert(math.abs(approx(tpe) - n) <= tol,
        s"$tpe: approx ${approx(tpe)} vs exact $n exceeds ±$tol")
    }
  }
}
