package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Proves — from Spark's own progress metrics, not by argument — that the
 * `dedup_winnow_admit_stream` plan is STATELESS: the stream-static broadcast join plus
 * the in-row `winnow_select` decision holds no state store at all, so admission cost
 * per micro-batch is the batch's own scan and nothing accumulates across batches (the
 * property that lets the gate run forever at ingest rates where any keyed state would
 * eventually dominate).
 */
class WinnowAdmitStateSpec extends AnyFunSuite {

  test("the admission plan reports zero state operators across micro-batches") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    graft.functions.WinnowSelect.ensureRegistered(spark)
    val rareRow = Seq(Seq(1L, 2L, 3L)).toDF("rare_fps").localCheckpoint()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.STRING),
        spark)
    val query = Dedup.winnowAdmitPlan(rareRow)(input.toDS()).writeStream
      .format("memory").queryName("winnow_admit_state_sink").outputMode("append").start()
    try {
      input.addData(Seq((1L, "some incoming document text"), (2L, "another one here")))
      query.processAllAvailable()
      input.addData(Seq((3L, "a second batch arrives later")))
      query.processAllAvailable()
      val progresses = query.recentProgress
      assert(progresses.nonEmpty, "expected at least one progress record")
      progresses.foreach { p =>
        assert(p.stateOperators.isEmpty,
          s"expected a stateless plan, found state operators: ${p.json}")
      }
    } finally query.stop()
    assert(spark.table("winnow_admit_state_sink").count() === 3)
    Dedup.releaseLocalCheckpoint(rareRow)
  }
}
