package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bounds of the `simsearch_quantize_int8` scalar codec the value-hash oracle can't
 * state: every reconstruction error is within the quantization-step bound derived from
 * the per-dimension trained ranges.
 */
class SimQuantSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-vector reconstruction error respects the step bound sum(rng/255 + 1)") {
    import spark.implicits._
    // recompute the codec's per-dim ranges exactly as the query trains them
    val q = graft.engine.Tables(spark, dir, "embeddings")
      .select($"vec_id",
        transform($"embedding", x => (x.cast("double") * 1000).cast("long")).as("qv"))
    val bound = q.select(posexplode($"qv").as(Seq("pos", "v")))
      .groupBy($"pos").agg((greatest(max($"v") - min($"v"), lit(1L))).as("rng"))
      .agg(sum(expr("rng div 255 + 1")).as("b")).collect().head.getLong(0)
    val out = graft.SparkEntry.queries("simsearch_quantize_int8")(spark, dir)
    val worst = out.agg(max($"err_sum")).collect().head.getLong(0)
    assert(worst <= bound, s"err_sum $worst exceeds the codec step bound $bound")
    // a 64-dim checksum of in-range codes can never exceed 255 * (1+..+64)
    val maxCk = out.agg(max($"code_checksum")).collect().head.getLong(0)
    assert(maxCk <= 255L * (64L * 65L / 2L) && maxCk >= 0L)
  }
}
