package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transaction assembly e2e + checkpoint resume (A1/A2/A5 analogues). */
class StreamingSpec extends AnyFunSuite {

  private def ev(scn: Long, xid: String, op: String, redo: String = ""): RedoEvent =
    RedoEvent.simple(scn, xid, op, sqlRedo = redo)

  test("MemoryStream -> assembleStreaming -> memory sink emits only committed txns") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val input = MemoryStream[RedoEvent](Encoders.product[RedoEvent], spark)
    // timeout disabled: with ProcessingTimeTimeout every micro-batch "requires another
    // batch", so processAllAvailable would never see the no-new-data signal
    val query = TxnAssembler.assembleStreaming(input.toDS(), abandonedTxnTimeout = None)
      .writeStream.format("memory").queryName("txn_out").outputMode("append")
      .start()
    // batch 1: one committed txn, one still open
    input.addData(
      ev(1, "a", RedoEvent.Start), ev(2, "a", RedoEvent.Insert, "i1"),
      ev(3, "a", RedoEvent.Commit),
      ev(4, "b", RedoEvent.Start), ev(5, "b", RedoEvent.Insert, "i2"))
    query.processAllAvailable()
    val after1 = spark.table("txn_out").as[CommittedDml].collect()
    assert(after1.map(_.xid).toSet == Set("a"))
    // batch 2: commit the open txn, roll back a third
    input.addData(
      ev(6, "b", RedoEvent.Commit),
      ev(7, "c", RedoEvent.Start), ev(8, "c", RedoEvent.Insert, "i3"),
      ev(9, "c", RedoEvent.Rollback))
    query.processAllAvailable()
    val after2 = spark.table("txn_out").as[CommittedDml].collect()
    assert(after2.map(_.xid).toSet == Set("a", "b"))
    assert(after2.filter(_.xid == "b").head.commitScn == 6L)
    query.stop()
  }

  test("droppedTxns accumulator counts buffer-cap overflow drops") {
    val spark = graft.SparkTestSession.spark
    val acc = spark.sparkContext.longAccumulator("graft-dropped-txns")
    val input = MemoryStream[RedoEvent](Encoders.product[RedoEvent], spark)
    val q = TxnAssembler.assembleStreaming(input.toDS(), abandonedTxnTimeout = None,
        maxBufferedRows = 1, droppedTxns = Some(acc))
      .writeStream.format("memory").queryName("drop_out").outputMode("append").start()
    input.addData(
      ev(1, "t", RedoEvent.Start),
      ev(2, "t", RedoEvent.Insert, "a"), ev(3, "t", RedoEvent.Insert, "b"),
      ev(4, "t", RedoEvent.Commit))
    q.processAllAvailable()
    assert(spark.table("drop_out").isEmpty) // overflowed txn dropped whole
    assert(acc.value == 1L)
    q.stop()
  }

  test("watermark + tumbling window aggregation emits closed windows only") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(java.sql.Timestamp, Double)](
      Encoders.tuple(Encoders.TIMESTAMP, Encoders.scalaDouble), spark)
    val agg = input.toDS().toDF("ts", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute"))
      .agg(count(lit(1)).as("cnt"), sum($"value").as("total"))
    val query = agg.writeStream.format("memory").queryName("win_out").outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    input.addData((t(10), 1.0), (t(20), 2.0), (t(70), 4.0))
    query.processAllAvailable()
    // advance watermark far past the first two windows
    input.addData((t(600), 8.0))
    query.processAllAvailable()
    input.addData((t(1200), 16.0))
    query.processAllAvailable()
    val rows = spark.table("win_out")
      .select(col("window.start").cast("long").as("start"), col("cnt"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // closed: [0,60) and [60,120) (by t(600)), then [600,660) (by t(1200));
    // the t(1200) window itself is still open
    assert(rows.toList == List((0L, 2L, 3.0), (60L, 1L, 4.0), (600L, 1L, 8.0)))
    query.stop()
  }

  test("checkpoint restart mid-transaction resumes without loss or duplicates") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outDir = Files.createTempDirectory("graft-resume-out").toString
    val input = MemoryStream[RedoEvent](Encoders.product[RedoEvent], spark)
    // memory sink refuses checkpoint recovery; the parquet sink is the fault-tolerant path
    def start() = TxnAssembler.assembleStreaming(input.toDS(), abandonedTxnTimeout = None)
      .writeStream.format("parquet").outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    input.addData(ev(1, "t", RedoEvent.Start), ev(2, "t", RedoEvent.Insert, "first-half"))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(outDir).isEmpty) // txn still open, nothing emitted

    // restart from the same checkpoint: state (the open buffer) must be restored
    val q2 = start()
    input.addData(ev(3, "t", RedoEvent.Insert, "second-half"), ev(4, "t", RedoEvent.Commit))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir).as[CommittedDml].collect().sortBy(_.scn)
    assert(out.map(_.sqlRedo).toList == List("first-half", "second-half"))
    assert(out.forall(_.commitScn == 4L))
  }
}
