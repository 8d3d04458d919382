package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RedoEventSource
import graft.sinks.RoutedSink

object SourceSinkSpec {
  /** Envelope-shaped row for the streaming sink test. */
  final case class Env(scn: Long, row_id: String, operation: String, seq: Long,
                       table_name: String, topic: String)
}

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

  test("seq-based resume keeps boundary-SCN records the rowId-lexicographic skip loses (A6)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // Delivery order within scn=5 was R2 then R1 (seq 10, 11); the crash happened after
    // delivering (5,0,"R2") @ seq=10, so (5,0,"R1") @ seq=11 was NEVER delivered. The
    // triple-lexicographic fallback drops it ("R1" <= "R2" — a lost committed change);
    // the seq predicate, equivalent to the reference's skip-until-match over the
    // deterministic replay, keeps exactly the undelivered suffix.
    val rows = Seq(
      (4L, 0L, "R9", 9L), (5L, 0L, "R2", 10L), (5L, 0L, "R1", 11L), (6L, 0L, "R0", 12L))
      .toDF("scn", "commitScn", "rowId", "seq")
    val bySeq = RedoEventSource
      .resolveResume(Some((5L, 0L, "R2")), None, resetOffset = false,
        sys.error("tip"), storedSeq = Some(10L))
      .predicate
    assert(rows.filter(bySeq).collect().map(_.getLong(3)).sorted.toList == List(11L, 12L))
    val byTriple = RedoEventSource
      .resolveResume(Some((5L, 0L, "R2")), None, resetOffset = false, sys.error("tip"))
      .predicate
    // the documented parity-fallback loss, pinned so the caveat stays honest
    assert(rows.filter(byTriple).collect().map(_.getLong(3)).sorted.toList == List(12L))
  }

  test("resolveResume: the reference's override ladder (A5, Task:137-192)") {
    import RedoEventSource.{resolveResume, ResumePosition}
    val stored = Some((100L, 90L, "R5"))
    var tipAsked = 0
    def tip: Long = { tipAsked += 1; 777L }
    // posture 1: stored offset resumes with the boundary skip; the tip is never computed
    assert(resolveResume(stored, None, resetOffset = false, tip) ==
      ResumePosition(100L, 90L, "R5", skipBoundary = true))
    assert(tipAsked == 0)
    // posture 2: start.scn OVERRIDES the stored offset, reads inclusive (skipRecord=false)
    assert(resolveResume(stored, Some(42L), resetOffset = false, tip) ==
      ResumePosition(42L, 0L, "", skipBoundary = false))
    // posture 3: reset.offset beats both and starts from the current tip
    assert(resolveResume(stored, Some(42L), resetOffset = true, tip) ==
      ResumePosition(777L, 0L, "", skipBoundary = false))
    // no stored offset at all -> current tip
    assert(resolveResume(None, None, resetOffset = false, tip) ==
      ResumePosition(777L, 0L, "", skipBoundary = false))
    // CdcConfig wiring + predicate compile
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val cfg = CdcConfig("DB1", Seq("APP" -> "*"), startScn = Some(5L))
    val pos = cfg.resume(stored, tip)
    assert(pos == ResumePosition(5L, 0L, "", skipBoundary = false))
    val rows = Seq((4L, 0L, "R1"), (5L, 0L, "R1"), (6L, 0L, "R1"))
      .toDF("scn", "commitScn", "rowId")
    assert(rows.filter(pos.predicate).collect().map(_.getLong(0)).sorted.toList == List(5L, 6L))
    // strict boundary variant: parity with the reference's `WHERE scn > ?` desupport-CM
    // mining query (OracleConnectorSQL2.java:6) skips the boundary SCN itself (ADVICE r3)
    val strict = pos.copy(inclusive = false)
    assert(rows.filter(strict.predicate).collect().map(_.getLong(0)).sorted.toList == List(6L))
  }

  test("CdcConfig validates heartbeatTable OWNER.TABLE shape and startScn positivity") {
    intercept[IllegalArgumentException] {
      CdcConfig("DB1", Seq("APP" -> "*"), heartbeatTable = Some("HEARTBEAT"))
    }
    intercept[IllegalArgumentException] {
      CdcConfig("DB1", Seq("APP" -> "*"), startScn = Some(0L))
    }
    // well-formed config passes
    CdcConfig("DB1", Seq("APP" -> "*"), heartbeatTable = Some("APP.HB"), startScn = Some(1L))
  }

  test("dedupByIdentity kills replays but keeps independent same-op changes (seq discriminator)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = Seq(
      // two INDEPENDENT updates to one row at one SCN (distinct seq) — both must survive
      (5L, "RA", "UPDATE", 1L, "set A"),
      (5L, "RA", "UPDATE", 2L, "set B"),
      // a true replay of the first (same identity incl. seq) — must collapse
      (5L, "RA", "UPDATE", 1L, "set A"),
      (6L, "RB", "INSERT", 3L, "ins"))
      .toDF("scn", "row_id", "operation", "seq", "sql_redo")
    val out = RoutedSink.dedupByIdentity(rows).collect()
    assert(out.length == 3)
    assert(out.count(r => r.getAs[Long]("scn") == 5L && r.getAs[String]("operation") == "UPDATE") == 2)
    // without a seq column the triple is the best available identity
    val noSeq = RoutedSink.dedupByIdentity(rows.drop("seq").distinct())
    assert(noSeq.count() == 2)
  }

  test("RoutedSink.start: streaming foreachBatch delivers deduped, topic-partitioned output") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = Files.createTempDirectory("graft-routed-out").toString
    val ckpt = Files.createTempDirectory("graft-routed-ckpt").toString
    val input = MemoryStream[SourceSinkSpec.Env](
      Encoders.product[SourceSinkSpec.Env], spark)
    val enveloped = input.toDS()
      .toDF("scn", "row_id", "operation", "seq", "table_name", "topic")
    val q = RoutedSink.start(enveloped, out, ckpt, "/root/testdata/sf0.001")
    input.addData(
      SourceSinkSpec.Env(1L, "RA", "INSERT", 1L, "T1", "DB1.APP.T1"),
      SourceSinkSpec.Env(1L, "RA", "INSERT", 1L, "T1", "DB1.APP.T1"), // replay inside the batch
      SourceSinkSpec.Env(2L, "RB", "INSERT", 2L, "T2", "DB1.APP.T2"))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 2) // replay deduped
    // idempotent default: batchId-keyed layout, topics nested under the batch partition
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toList == List("batch_id=0"))
    val topics = new java.io.File(s"$out/batch_id=0").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(topics.toList == List("topic=DB1.APP.T1", "topic=DB1.APP.T2"))
  }

  test("topic-partitioned lake reads PRUNE to the requested topic's partition") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft-prune-out").toString
    RoutedSink.writeBatch(
      Seq((1L, "INSERT", "DB1.APP.T1"), (2L, "INSERT", "DB1.APP.T2"),
        (3L, "INSERT", "DB1.APP.T3")).toDF("scn", "operation", "topic"), out)
    val one = spark.read.parquet(out).filter($"topic" === "DB1.APP.T2")
    assert(one.count() == 1)
    // the consumer-side scale claim of the topic layout: a per-table reader touches ONE
    // partition directory, not the whole lake — the filter must land in PartitionFilters
    // (directory-level pruning), not PushedFilters (row-group level, all files listed)
    val scanLine = one.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("topic"),
      s"topic filter must prune at the partition level: $scanLine")
    assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*topic[^\\]]*\\].*"),
      s"expected topic inside PartitionFilters: $scanLine")
  }

  test("writeBatchIdempotent: a replayed batch rewrites its partition, new batches append") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft-idem").toString
    def batch(scns: Long*) = scns.toSeq
      .map(s => (s, "INSERT", "T1", "DB1.APP.T1")).toDF("scn", "operation", "table_name", "topic")
    RoutedSink.writeBatchIdempotent(batch(1, 2), out, batchId = 0)
    // restart between sink write and checkpoint commit: batch 0 replays VERBATIM
    RoutedSink.writeBatchIdempotent(batch(1, 2), out, batchId = 0)
    assert(spark.read.parquet(out).count() == 2) // rewritten, not doubled
    RoutedSink.writeBatchIdempotent(batch(3), out, batchId = 1)
    val back = spark.read.parquet(out)
    assert(back.count() == 3) // a NEW batch appends its own partition
    assert(back.select("scn").as[Long].collect().sorted.toList == List(1L, 2L, 3L))
  }

  test("compactBatches folds batch_id partitions, dedups across batches, leaves newer batches") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compact-base").toString
    val compacted = Files.createTempDirectory("graft-compact-out").toString
    def batch(rows: (Long, String)*) = rows.toSeq
      .map { case (s, t) => (s, s"R$s", "INSERT", s, t, "T1") }
      .toDF("scn", "row_id", "operation", "seq", "topic", "table_name")
    RoutedSink.writeBatchIdempotent(batch(1L -> "DB1.APP.T1", 2L -> "DB1.APP.T2"), base, 0)
    // cross-batch replay: scn=2 re-delivered verbatim in batch 1 (at-least-once restart) —
    // the per-batch overwrite can't see it; compaction's identity dedup must collapse it
    RoutedSink.writeBatchIdempotent(batch(2L -> "DB1.APP.T2", 3L -> "DB1.APP.T1"), base, 1)
    RoutedSink.writeBatchIdempotent(batch(4L -> "DB1.APP.T1"), base, 2)
    assert(RoutedSink.compactBatches(spark, base, compacted, upTo = 1) == 2)
    // folded batch partitions removed; the batch above upTo untouched
    val dirs = new java.io.File(base).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toList == List("batch_id=2"))
    val back = spark.read.parquet(compacted)
    assert(back.select("scn").as[Long].collect().sorted.toList == List(1L, 2L, 3L))
    assert(!back.columns.contains("batch_id"))
    val topics = new java.io.File(compacted).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(topics.toList == List("topic=DB1.APP.T1", "topic=DB1.APP.T2"))
    // re-run is a no-op: nothing left at or below the fold point
    assert(RoutedSink.compactBatches(spark, base, compacted, upTo = 1) == 0)
    // crash recovery: a failure between the append and the partition deletes leaves the
    // folded batch dirs behind — simulate by re-writing batch 0 verbatim; the re-run must
    // anti-join against the compacted base and append NOTHING new (not duplicate)
    RoutedSink.writeBatchIdempotent(batch(1L -> "DB1.APP.T1", 2L -> "DB1.APP.T2"), base, 0)
    assert(RoutedSink.compactBatches(spark, base, compacted, upTo = 1) == 1)
    val afterRerun = spark.read.parquet(compacted)
    assert(afterRerun.select("scn").as[Long].collect().sorted.toList == List(1L, 2L, 3L))
    // cross-compaction-run replay: scn=3 re-delivered in a LATER batch, folded by a later
    // run — the anti-join must collapse it too
    RoutedSink.writeBatchIdempotent(batch(3L -> "DB1.APP.T1", 5L -> "DB1.APP.T1"), base, 3)
    assert(RoutedSink.compactBatches(spark, base, compacted, upTo = 3) == 2)
    val afterRun2 = spark.read.parquet(compacted)
    assert(afterRun2.select("scn").as[Long].collect().sorted.toList == List(1L, 2L, 3L, 4L, 5L))
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
