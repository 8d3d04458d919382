package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Sketch-vs-exact validation for the approx quantile production path: percentile_approx
 * guarantees each returned value is an actual column element whose rank is within
 * n/accuracy of the target rank. A sketch can't hash-match a DuckDB oracle, so this spec
 * IS its correctness gate: for every lang and percentile, the approx value must lie
 * within the value range spanned by the guaranteed rank window of the exact sorted data.
 */
class TextApproxSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"
  private val Accuracy = 10000

  test("text_len_quantiles_approx lands inside the sketch's rank window of the exact answer") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val lens = graft.engine.Tables(spark, dir, "documents")
      .select($"lang", length($"text").cast("long").as("len"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    val approx = graft.SparkEntry.queries("text_len_quantiles_approx")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(approx.map(_._1).toSet === lens.keySet)

    approx.foreach { case (lang, n, p50, p90, p99) =>
      val sorted = lens(lang)
      assert(n === sorted.length.toLong)
      val slack = n.toDouble / Accuracy + 1 // sketch rank bound plus index rounding
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (p, got) =>
        val target = math.ceil(p * n).toLong
        val lo = sorted(((target - slack).max(1) - 1).toInt)
        val hi = sorted(((target + slack).min(n) - 1).toInt)
        assert(got >= lo && got <= hi,
          s"$lang p$p: $got outside value window [$lo,$hi] (rank target $target ± $slack)")
      }
    }
  }
}
