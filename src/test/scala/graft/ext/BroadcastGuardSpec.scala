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

  /** The media admission gates' corpus-index build (VERDICT r15 #1): a fingerprint
    * corpus whose DISTINCT value count exceeds the cap must fail with the GATE'S NAME
    * (the production path is [[Multimodal.mediaAdmitIndex]] at
    * [[Multimodal.MediaAdmitMaxIndexValues]]; the cap is a constant — the guard wiring
    * is what can regress, so it's exercised at a spec-sized cap). */
  test("mediaAdmitIndex fails loudly with the gate's name past the value cap") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val hashes = (1L to 5L).map(i => (i, i, i, i, i))
      .toDF("doc_id", "band_0", "band_1", "band_2", "band_3")
    val e = intercept[Exception] {
      // the guarded build localCheckpoints (an action) — the raise fires here
      Multimodal.mediaAdmitIndex(hashes, cap = 3L, "image admission gate")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
        m.contains("image admission gate") && m.contains("broadcast bound")),
      s"expected the named guard message, got: $e")
    // and an in-cap index passes through: one row per distinct value, min doc_id
    val ok = Multimodal.mediaAdmitIndex(hashes, cap = 10L, "image admission gate")
    try assert(ok.count() === 5L)
    finally Dedup.releaseLocalCheckpoint(ok)
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
