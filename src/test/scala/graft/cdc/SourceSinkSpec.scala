package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RedoEventSource
import graft.sinks.RoutedSink

/** A1/A2 source decode round-trip, A6 offset skip, A22 routed sink, A14 invalidation. */
class SourceSinkSpec extends AnyFunSuite {

  test("Kafka wire round-trip: toKafkaValue -> fromKafka preserves every field") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val events = Seq(
      RedoEvent.simple(10, "x1", RedoEvent.Insert, sqlRedo = """insert into "A"."T"("C") values ('v')""")
        .copy(seq = 7, info = "some info", csf = true),
      RedoEvent.simple(11, "x2", RedoEvent.Commit).copy(seq = 8,
        commitTimestamp = Some(new java.sql.Timestamp(123456789L))))
    val wire = RedoEventSource.toKafkaValue(events.toDS())
    val decoded = RedoEventSource.fromKafka(wire).collect().sortBy(_.scn)
    assert(decoded.toList == events.sortBy(_.scn))
  }

  test("afterOffset drops records at or before the stored (scn, commitScn, rowId) (A6)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = Seq(
      (4L, 0L, "R1"), (5L, 0L, "R1"), (5L, 0L, "R2"), (5L, 1L, "R0"), (6L, 0L, "R0"))
      .toDF("scn", "commitScn", "rowId")
    val kept = rows.filter(RedoEventSource.afterOffset(5L, 0L, "R1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(kept == Set((5L, 0L, "R2"), (5L, 1L, "R0"), (6L, 0L, "R0")))
  }

  test("RoutedSink.writeBatch partitions the lake by topic; DDL invalidation reports tables") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft-sink").toString
    val enveloped = Seq(
      (1L, "INSERT", "T1", "DB1.APP.T1"),
      (2L, "INSERT", "T2", "DB1.APP.T2"),
      (3L, "DDL", "T2", "DB1.APP._GENERIC_DDL"))
      .toDF("scn", "operation", "table_name", "topic")
    val invalidated = RoutedSink.applyDdlInvalidations(enveloped, "/root/testdata/sf0.001")
    assert(invalidated == Seq("T2"))
    RoutedSink.writeBatch(enveloped, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toList == List("topic=DB1.APP.T1", "topic=DB1.APP.T2", "topic=DB1.APP._GENERIC_DDL"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.filter(col("topic") === "DB1.APP.T1").count() == 1)
  }
}
