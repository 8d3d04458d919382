package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * The broadcast-side cardinality guards (r6 verdict #7): a pathological corpus whose
 * "small" side (boilerplate segments, benchmark shingles) outgrows the broadcast bound
 * must fail LOUDLY at execution, not OOM the driver mid-broadcast; an in-bound side
 * must pass through byte-identical (the oracle gates prove the production bound).
 */
class BroadcastGuardSpec extends AnyFunSuite {

  test("guardBroadcast raises once the frame exceeds the bound") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("seg")
    val e = intercept[Exception] {
      TextOps.guardBroadcast(df, "seg", max = 2L, "test segment set").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("broadcast bound")),
      s"expected the guard's message, got: $e")
  }

  test("guardBroadcast passes an in-bound frame through unchanged") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("seg")
    val out = TextOps.guardBroadcast(df, "seg", max = 10L, "test segment set")
      .as[String].collect().sorted
    assert(out.toSeq == Seq("a", "b", "c"))
  }
}
