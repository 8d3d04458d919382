package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** A24 status listener + the bucketed co-located join pattern (100 TB posture). */
class StatusBucketSpec extends AnyFunSuite {

  test("StatusListener writes RUNNING/PROGRESS/STOPPED lines (A24)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val path = Files.createTempFile("graft-status", ".jsonl").toString
    val listener = new StatusListener(path)
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[RedoEvent](Encoders.product[RedoEvent], spark)
      val q = TxnAssembler.assembleStreaming(input.toDS(), abandonedTxnTimeout = None)
        .writeStream.format("memory").queryName("status_out").outputMode("append").start()
      input.addData(RedoEvent.simple(1, "x", RedoEvent.Start),
        RedoEvent.simple(2, "x", RedoEvent.Insert, sqlRedo = "i"),
        RedoEvent.simple(3, "x", RedoEvent.Commit))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      // listener events are async; wait briefly for the STOPPED line
      val deadline = System.currentTimeMillis() + 10000
      def lines() = scala.io.Source.fromFile(path).getLines().toList
      while (System.currentTimeMillis() < deadline && !lines().exists(_.contains("\"STOPPED\"")))
        Thread.sleep(100)
      val all = lines()
      assert(all.exists(_.contains("\"RUNNING\"")), all.mkString("\n"))
      assert(all.exists(_.contains("\"PROGRESS\"")), all.mkString("\n"))
      assert(all.exists(_.contains("\"STOPPED\"")), all.mkString("\n"))
    } finally spark.streams.removeListener(listener)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-warehouse").toString
    // simulate the big-fact join: bucket both sides on the join key at write time,
    // then the join plans without any shuffle (the 100 TB co-location strategy)
    val facts = (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "payload")
    val dims  = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "grp")
    facts.write.format("parquet").option("path", s"$wh/t_facts")
      .bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_facts")
    dims.write.format("parquet").option("path", s"$wh/t_dims")
      .bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_dims")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("t_facts").join(spark.table("t_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS t_facts")
      spark.sql("DROP TABLE IF EXISTS t_dims")
    }
  }
}
