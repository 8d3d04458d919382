package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CdcPipeline.stream wiring + A4/A21/A25 branches + buffer cap. */
class PipelineSpec extends AnyFunSuite {

  private val config = CdcConfig(
    dbAlias = "DB1",
    whitelist = Seq("APP" -> "*"),
    heartbeatTable = Some("APP.HB"))

  private def ev(scn: Long, xid: String, op: String, owner: String = "APP", table: String = "T1",
                 redo: String = "", info: String = ""): RedoEvent =
    RedoEvent.simple(scn, xid, op, owner = owner, table = table, sqlRedo = redo)
      .copy(info = info)

  test("stream(batch): filters, CSF, assembly, parse, envelope, routing compose") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val events = Seq(
      ev(1, "x1", RedoEvent.Start),
      // CSF-split INSERT: two fragments, same (xid, scn, rowId)
      ev(2, "x1", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID","N") val""")
        .copy(csf = true, rowId = "RA", seq = 2),
      ev(2, "x1", RedoEvent.Insert, redo = """ues (1,'a')""")
        .copy(rowId = "RA", seq = 3),
      // filtered out: non-whitelisted owner
      ev(3, "x1", RedoEvent.Insert, owner = "SYS", redo = "insert into t values (1)"),
      // filtered out: temp-table redo
      ev(4, "x1", RedoEvent.Insert, redo = "insert ... temporary tables ..."),
      // DELETE survives
      ev(5, "x1", RedoEvent.Delete, redo = """delete from "APP"."T1" where "ID" = 0"""),
      ev(6, "x1", RedoEvent.Commit),
      // rolled-back txn vanishes
      ev(7, "x2", RedoEvent.Start),
      ev(8, "x2", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (9)"""),
      ev(9, "x2", RedoEvent.Rollback))
    val out = CdcPipeline.stream(events.toDS(), config, streaming = false)
      .collect().sortBy(_.getAs[Long]("scn"))
    assert(out.length == 2)
    val ins = out.head
    assert(ins.getAs[String]("operation") == "INSERT")
    assert(ins.getAs[Map[String, String]]("data") == Map("ID" -> "1", "N" -> "a"))
    assert(ins.getAs[Map[String, String]]("before") == null)
    assert(ins.getAs[String]("topic") == "DB1.APP.T1")
    assert(ins.getAs[Long]("commit_scn") == 6L)
    val del = out.last
    assert(del.getAs[String]("operation") == "DELETE")
    assert(del.getAs[Map[String, String]]("data") == null)
    assert(del.getAs[Map[String, String]]("before") == Map("ID" -> "0"))
  }

  test("stream(streaming=true): full pipeline over MemoryStream, CSF fused ACROSS micro-batches") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cfg = CdcConfig("DB1", Seq("APP" -> "*"), abandonedTxnTimeout = None)
    val input = MemoryStream[RedoEvent](Encoders.product[RedoEvent], spark)
    val query = CdcPipeline.stream(input.toDS(), cfg, streaming = true)
      .writeStream.format("memory").queryName("pipe_out").outputMode("append").start()
    // batch 1: txn opens, first CSF fragment arrives — nothing can be emitted yet
    input.addData(
      ev(1, "x1", RedoEvent.Start),
      ev(2, "x1", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID","N") val""")
        .copy(csf = true, rowId = "RA", seq = 2))
    query.processAllAvailable()
    assert(spark.table("pipe_out").isEmpty)
    // batch 2: the fragment's terminator + an independent DELETE + COMMIT
    input.addData(
      ev(2, "x1", RedoEvent.Insert, redo = """ues (1,'a')""").copy(rowId = "RA", seq = 3),
      ev(5, "x1", RedoEvent.Delete, redo = """delete from "APP"."T1" where "ID" = 0"""),
      ev(6, "x1", RedoEvent.Commit))
    query.processAllAvailable()
    val out = spark.table("pipe_out").collect().sortBy(_.getAs[Long]("scn"))
    query.stop()
    assert(out.length == 2)
    assert(out.head.getAs[String]("operation") == "INSERT")
    assert(out.head.getAs[Map[String, String]]("data") == Map("ID" -> "1", "N" -> "a"))
    assert(out.head.getAs[Long]("commit_scn") == 6L)
    assert(out.last.getAs[Map[String, String]]("before") == Map("ID" -> "0"))
  }

  test("temp-table skip is HEAD-fragment-anchored: data containing the phrase survives (ADVICE r4)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val events = Seq(
      ev(1, "x1", RedoEvent.Start),
      // 3-fragment INSERT whose MIDDLE fragment contains the phrase inside a DATA value:
      // the reference checks only the head cursor row before its CSF concat loop
      // (LogMinerThread2.java:263), so this legitimate statement must fuse and SURVIVE —
      // the r3 fused-text check silently dropped it
      ev(2, "x1", RedoEvent.Insert, redo = """insert into "APP"."T1"("N") values ('a """)
        .copy(csf = true, rowId = "RA", seq = 2),
      ev(2, "x1", RedoEvent.Insert, redo = "temporary tables b ")
        .copy(csf = true, rowId = "RA", seq = 3),
      ev(2, "x1", RedoEvent.Insert, redo = "c')").copy(rowId = "RA", seq = 4),
      // a run whose HEAD fragment carries the phrase drops whole — never corrupting the
      // fuse (no partial-run leakage downstream)
      ev(3, "x1", RedoEvent.Insert, redo = """alter ... temporary tables ('x """)
        .copy(csf = true, rowId = "RB", seq = 5),
      ev(3, "x1", RedoEvent.Insert, redo = "y')").copy(rowId = "RB", seq = 6),
      ev(4, "x1", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (7)"""),
      ev(5, "x1", RedoEvent.Commit))
    val out = CdcPipeline.stream(events.toDS(), config, streaming = false)
      .collect().sortBy(_.getAs[Long]("scn"))
    assert(out.length == 2)
    assert(out.head.getAs[Map[String, String]]("data") == Map("N" -> "a temporary tables b c"))
    assert(out.last.getAs[Map[String, String]]("data") == Map("ID" -> "7"))
  }

  test("typedTableView casts the dynamic payload into the table's parquet types") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val events = Seq(
      ev(1, "x1", RedoEvent.Start),
      ev(2, "x1", RedoEvent.Insert, table = "NATION",
        redo = """insert into "APP"."NATION"("N_NATIONKEY","N_NAME","N_REGIONKEY") values (7,'NATION_7',2)"""),
      ev(3, "x1", RedoEvent.Commit))
    val enveloped = CdcPipeline.stream(events.toDS(),
      CdcConfig("DB1", Seq("APP" -> "*")), streaming = false)
    val typed = CdcPipeline.typedTableView(enveloped, "/root/testdata/sf0.001", "APP", "NATION")
    val row = typed.collect().head
    assert(typed.schema("n_nationkey").dataType == org.apache.spark.sql.types.IntegerType)
    assert(row.getAs[Int]("n_nationkey") == 7)
    assert(row.getAs[String]("n_name") == "NATION_7")
    assert(row.getAs[Int]("n_regionkey") == 2)
  }

  test("deadLetters captures unparsable DML (A25)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val frame = Seq(
      (1L, "x", "APP", "T1", "not parseable at all", "INSERT"),
      (2L, "x", "APP", "T1", """insert into "APP"."T1"("ID") values (1)""", "INSERT"))
      .toDF("scn", "xid", "seg_owner", "table_name", "sql_redo", "operation")
      .withColumn("parsed", ParseRedo.parse(org.apache.spark.sql.functions.col("sql_redo")))
    val dlq = CdcPipeline.deadLetters(frame).collect()
    assert(dlq.map(_.getAs[Long]("scn")).toList == List(1L))
  }

  test("heartbeats extracts HEARTBEAT_TIME from the after-image (A21)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val enveloped = Seq(
      (1L, "APP", "HB", "r1", Map("ID" -> "1", "HEARTBEAT_TIME" -> "2020-01-01 00:00:00")),
      (2L, "APP", "T1", "r2", Map("ID" -> "2")))
      .toDF("scn", "seg_owner", "table_name", "row_id", "data")
    val hb = CdcPipeline.heartbeats(enveloped, "APP.HB").collect()
    assert(hb.length == 1 && hb.head.getAs[String]("heartbeat_time") == "2020-01-01 00:00:00")
  }

  test("sequenceGaps flags RBASQN jumps > 1 (A4)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val events = Seq(1L, 1L, 2L, 2L, 5L, 6L, 9L).toDF("rbasqn")
    val gaps = CdcPipeline.sequenceGaps(events).collect().sortBy(_.getAs[Long]("last_seen"))
    assert(gaps.map(g => (g.getAs[Long]("last_seen"), g.getAs[Long]("next_seen"),
      g.getAs[Long]("missing_cnt"))).toList == List((2L, 5L, 2L), (6L, 9L, 2L)))
  }

  test("transaction buffer cap drops the overflowed txn whole, others unaffected") {
    val events = Iterator(
      RedoEvent.simple(1, "big", RedoEvent.Start),
      RedoEvent.simple(2, "big", RedoEvent.Insert, sqlRedo = "a"),
      RedoEvent.simple(3, "big", RedoEvent.Insert, sqlRedo = "b"),
      RedoEvent.simple(4, "big", RedoEvent.Insert, sqlRedo = "c"),
      RedoEvent.simple(5, "big", RedoEvent.Commit))
    val (out, state) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty, events, maxBufferedRows = 2)
    assert(out.isEmpty && state.isEmpty) // overflowed at 3rd insert -> dropped whole
    val okEvents = Iterator(
      RedoEvent.simple(1, "ok", RedoEvent.Start),
      RedoEvent.simple(2, "ok", RedoEvent.Insert, sqlRedo = "a"),
      RedoEvent.simple(3, "ok", RedoEvent.Commit))
    val (out2, _) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty, okEvents, maxBufferedRows = 2)
    assert(out2.length == 1)
  }

  test("dml.types filters POST-assembly: excluding DELETE cannot create phantom rows") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // txn x1: INSERT RA is savepoint-rolled-back by its compensating DELETE (rollback=1,
    // same rowId); INSERT RB commits. With dml.types = INSERT a PRE-assembly filter
    // would drop the compensating DELETE, pair elimination would never fire, and the
    // rolled-back INSERT RA would emit as a phantom row.
    val events = Seq(
      ev(1, "x1", RedoEvent.Start),
      ev(2, "x1", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (1)""")
        .copy(rowId = "RA", seq = 1),
      ev(3, "x1", RedoEvent.Delete, redo = """delete from "APP"."T1" where "ID" = 1""")
        .copy(rowId = "RA", rollback = true, seq = 2),
      ev(4, "x1", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (2)""")
        .copy(rowId = "RB", seq = 3),
      // txn x2: a committed (non-rollback) DELETE — excluded from the OUTPUT by
      // dml.types, but only after assembly
      ev(5, "x2", RedoEvent.Start),
      ev(6, "x2", RedoEvent.Delete, redo = """delete from "APP"."T1" where "ID" = 9""")
        .copy(rowId = "RC", seq = 4),
      ev(7, "x2", RedoEvent.Commit),
      ev(8, "x1", RedoEvent.Commit))
    val cfg = config.copy(dmlTypes = Seq(RedoEvent.Insert))
    val out = CdcPipeline.stream(events.toDS(), cfg, streaming = false).collect()
    assert(out.map(_.getAs[String]("row_id")).toList == List("RB"))
    assert(out.forall(_.getAs[String]("operation") == RedoEvent.Insert))
  }

  test("stream(batch) forwards the droppedTxns accumulator (overflow observable)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val events = Seq(
      ev(1, "big", RedoEvent.Start),
      ev(2, "big", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (1)"""),
      ev(3, "big", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (2)"""),
      ev(4, "big", RedoEvent.Insert, redo = """insert into "APP"."T1"("ID") values (3)"""),
      ev(5, "big", RedoEvent.Commit))
    val acc = spark.sparkContext.longAccumulator("droppedTxnsBatch")
    val out = CdcPipeline.stream(events.toDS(), config.copy(maxBufferedRows = 2),
      streaming = false, droppedTxns = Some(acc)).collect()
    assert(out.isEmpty && acc.value == 1L)
  }

  test("A26: fromMap parses the reference's property surface (Config2:41-64)") {
    val cfg = CdcConfig.fromMap(Map(
      "db.name.alias" -> "DB1",
      "table.whitelist" -> "GRAFT.ORDERS, GRAFT.*",
      "table.blacklist" -> "SYS.AUD$",
      "dml.types" -> "insert,update",
      "parse.dml.data" -> "true",
      "map.unescaped.strings" -> "TRUE",
      "start.scn" -> "12345",
      "heartbeat.table" -> "APP.HB",
      "db.hostname" -> "ignored-connection-key", // unknown/connection keys are ignored
      "some.unknown.key" -> "also-ignored"))
    assert(cfg.dbAlias == "DB1")
    assert(cfg.whitelist == Seq("GRAFT" -> "ORDERS", "GRAFT" -> "*"))
    assert(cfg.blacklist == Seq("SYS" -> "AUD$"))
    assert(cfg.dmlTypes == Seq("INSERT", "UPDATE"))
    assert(cfg.unescapeStrings && cfg.parseDmlData && !cfg.resetOffset)
    assert(cfg.startScn.contains(12345L) && cfg.heartbeatTable.contains("APP.HB"))
  }

  test("A26: fromMap defaults match the reference (empty start.scn/dml.types; unescape=false)") {
    val cfg = CdcConfig.fromMap(Map(
      "db.name.alias" -> "DB1", "table.whitelist" -> "APP.*",
      "start.scn" -> "", "dml.types" -> "")) // Type.STRING default "" = unset (Config:55,57)
    assert(cfg.startScn.isEmpty)
    assert(cfg.dmlTypes == Seq("INSERT", "UPDATE", "DELETE", "DDL"))
    assert(!cfg.unescapeStrings) // the reference's only boolean default (Config:58, false)
    assert(cfg.parseDmlData && cfg.abandonedTxnTimeout.isDefined)
  }

  test("A26: fromMap fails fast on malformed values, with the key named") {
    def msg(props: Map[String, String]): String =
      intercept[IllegalArgumentException](CdcConfig.fromMap(props)).getMessage
    val base = Map("db.name.alias" -> "DB1", "table.whitelist" -> "APP.*")
    assert(msg(base - "db.name.alias").contains("db.name.alias"))
    assert(msg(base + ("table.whitelist" -> "NODOT")).contains("table.whitelist"))
    assert(msg(base + ("start.scn" -> "abc")).contains("start.scn"))
    assert(msg(base + ("reset.offset" -> "yes")).contains("reset.offset"))
    // validation layered below fromMap still applies (empty whitelist, Connector:31-34)
    assert(msg(base + ("table.whitelist" -> "")).contains("whitelist"))
  }
}
