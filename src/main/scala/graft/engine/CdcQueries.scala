package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc._

/**
 * End-to-end CDC slices, oracle-gated: redo events are synthesized *deterministically from
 * the testdata tables* (so DuckDB can compute the expected result directly from the same
 * tables), pushed through the real pipeline stages — [[RedoSqlParser]] via
 * [[ParseRedo.parse]], [[TxnAssembler.assembleBatch]] (groupByKey(xid) shuffle + state
 * machine + rollback-pair elimination), [[CdcPipeline]] filters/envelope/routing,
 * [[Catalog]] typed casts — and reduced to an aggregate the oracle reproduces with plain
 * arithmetic. A green hash means the whole chain (generate → parse → assemble → project)
 * is correct, not just one operator.
 */
object CdcQueries {

  /**
   * Event script for one order-keyed transaction (shared by the batch and streaming
   * reconstruct queries): START, INSERT, an update+partial-rollback pair for %7 keys (must
   * cancel, A20), a surviving status update for %5 keys, then COMMIT — or ROLLBACK for %10
   * keys (txn must vanish).
   */
  private def txnEvents(k: Long, st: String): Seq[RedoEvent] = {
    val xid = s"tx$k"
    val rid = f"ROW$k%012d"
    def ev(off: Long, op: String, redo: String = "", rb: Boolean = false) =
      RedoEvent(scn = k * 10 + off, commitScn = 0L, xid = xid, rowId = rid, operation = op,
        timestamp = new java.sql.Timestamp(0L), commitTimestamp = None,
        segOwner = "GRAFT", tableName = "ORDERS", sqlRedo = redo, csf = false,
        rollback = rb, info = "", rbasqn = 1L, seq = k * 10 + off)
    val ins = ev(1, RedoEvent.Insert,
      s"""insert into "GRAFT"."ORDERS"("O_ORDERKEY","O_ORDERSTATUS") values ($k,'$st')""")
    val rolledBackPair =
      if (k % 7 == 0) Seq(
        ev(2, RedoEvent.Update,
          s"""update "GRAFT"."ORDERS" set "O_ORDERSTATUS" = 'X' where "O_ORDERKEY" = $k"""),
        ev(3, RedoEvent.Update,
          s"""update "GRAFT"."ORDERS" set "O_ORDERSTATUS" = '$st' where "O_ORDERKEY" = $k""",
          rb = true))
      else Seq.empty
    val survivingUpdate =
      if (k % 5 == 0) Seq(ev(4, RedoEvent.Update,
        s"""update "GRAFT"."ORDERS" set "O_ORDERSTATUS" = 'U' where "O_ORDERKEY" = $k"""))
      else Seq.empty
    val terminal = ev(6, if (k % 10 == 0) RedoEvent.Rollback else RedoEvent.Commit)
    Seq(ev(0, RedoEvent.Start), ins) ++ rolledBackPair ++ survivingUpdate :+ terminal
  }

  /** Envelope row shape fed to the streaming apply harness. */
  final case class MergeEnvRow(commit_scn: Long, scn: Long, seq: Long, operation: String,
                               data: Map[String, String], before: Map[String, String])

  /**
   * Shared merge-script envelope (batch apply + streaming apply): a set-to-NULL update
   * for %6 FIRST (the explicit null must survive later folds unless %9 re-sets the
   * column — ADVICE r4), updates for %3, a later multi-column update for %9, deletes for
   * %10, inserts of NEW keys for %4, then an update of a freshly-inserted key for %8 —
   * rendered to real redo SQL, parsed, and enveloped with (commit_scn, seq) extras.
   * commit_scn is constant so the apply operators' scn/seq ordering fallback is exercised.
   */
  // private[graft]: StreamScale drives the same envelope feed at derived scales (r7 #2)
  private[graft] def mergeEnvelope(s: SparkSession, dir: String,
                            keyFilter: Column): org.apache.spark.sql.DataFrame =
    CdcPipeline.envelope(
      mergeScript(s, dir, keyFilter).withColumn("parsed", ParseRedo.parse(col("sql_redo"))),
      "DB1", extra = Seq(col("commit_scn"), col("seq")))

  /** The raw (pre-parse, pre-envelope) orders merge script — factored so the
    * multi-table gate can union it with [[customerScript]] into ONE wire stream. */
  private def mergeScript(s: SparkSession, dir: String,
                          keyFilter: Column): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val base = Tables.par(s, dir, "orders").select($"o_orderkey".cast("long").as("k")).filter(keyFilter)
    // ONE orders scan: every key derives all its script ops in a single explode (a
    // per-branch union would scan + parse-project the table six times)
    def op(flt: Column, scnOff: Int, op: String, redo: Column) =
      when(flt, struct(lit(scnOff).as("off"), lit(op).as("operation"), redo.as("sql_redo")))
    val ops = array(
      op($"k" % 6 === 0, 0, RedoEvent.Update,
        concat(lit("update \"GRAFT\".\"ORDERS\" set \"O_ORDERPRIORITY\" = NULL where \"O_ORDERKEY\" = "), $"k")),
      op($"k" % 3 === 0, 1, RedoEvent.Update,
        concat(lit("update \"GRAFT\".\"ORDERS\" set \"O_ORDERSTATUS\" = 'Z' where \"O_ORDERKEY\" = "), $"k")),
      op($"k" % 9 === 0, 3, RedoEvent.Update,
        concat(lit("update \"GRAFT\".\"ORDERS\" set \"O_ORDERSTATUS\" = 'Y', \"O_ORDERPRIORITY\" = '9-PRIO' where \"O_ORDERKEY\" = "), $"k")),
      op($"k" % 10 === 0, 5, RedoEvent.Delete,
        concat(lit("delete from \"GRAFT\".\"ORDERS\" where \"O_ORDERKEY\" = "), $"k")),
      op($"k" % 4 === 0, 2, RedoEvent.Insert,
        concat(lit("insert into \"GRAFT\".\"ORDERS\"(\"O_ORDERKEY\",\"O_ORDERSTATUS\",\"O_ORDERPRIORITY\") values ("),
          $"k" + 10000000L, lit(",'N','NEW')"))),
      op($"k" % 8 === 0, 4, RedoEvent.Update,
        concat(lit("update \"GRAFT\".\"ORDERS\" set \"O_ORDERSTATUS\" = 'M' where \"O_ORDERKEY\" = "), $"k" + 10000000L)))
    val script = base
      .select($"k", explode(filter(ops, _.isNotNull)).as("o"))
      .select(
        ($"k" * 10 + $"o.off").as("scn"), lit(1L).as("commit_scn"),
        ($"k" * 10 + $"o.off").as("seq"), lit("x").as("xid"), lit("r").as("row_id"),
        lit("GRAFT").as("seg_owner"), lit("ORDERS").as("table_name"),
        $"o.operation".as("operation"), $"o.sql_redo".as("sql_redo"), lit("").as("info"))
    script
  }

  /** A deterministic customer-table script (same wire shape as [[mergeScript]]): segment
    * update for %5 keys, delete for %7 (the delete ord sits AFTER the update, so a
    * %35 key is gone), insert of a fresh key for %11. */
  private def customerScript(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val base = Tables.par(s, dir, "customer").select($"c_custkey".cast("long").as("k"))
    def op(flt: Column, scnOff: Int, op: String, redo: Column) =
      when(flt, struct(lit(scnOff).as("off"), lit(op).as("operation"), redo.as("sql_redo")))
    val ops = array(
      op($"k" % 5 === 0, 0, RedoEvent.Update,
        concat(lit("update \"GRAFT\".\"CUSTOMER\" set \"C_MKTSEGMENT\" = 'LLMSEG' where \"C_CUSTKEY\" = "), $"k")),
      op($"k" % 7 === 0, 1, RedoEvent.Delete,
        concat(lit("delete from \"GRAFT\".\"CUSTOMER\" where \"C_CUSTKEY\" = "), $"k")),
      op($"k" % 11 === 0, 2, RedoEvent.Insert,
        concat(lit("insert into \"GRAFT\".\"CUSTOMER\"(\"C_CUSTKEY\",\"C_MKTSEGMENT\") values ("),
          $"k" + 20000000L, lit(",'NEWSEG')"))))
    base
      .select($"k", explode(filter(ops, _.isNotNull)).as("o"))
      .select(
        ($"k" * 10 + $"o.off").as("scn"), lit(1L).as("commit_scn"),
        ($"k" * 10 + $"o.off").as("seq"), lit("x").as("xid"), lit("r").as("row_id"),
        lit("GRAFT").as("seg_owner"), lit("CUSTOMER").as("table_name"),
        $"o.operation".as("operation"), $"o.sql_redo".as("sql_redo"), lit("").as("info"))
  }

  /** Committed envelopes -> final per-key state -> count by final status (shared reducer
    * of the batch and streaming reconstruct queries). */
  private def reconstructStatus(committed: DataFrame): DataFrame = {
    val s = committed.sparkSession
    import s.implicits._
    committed
      .select($"scn", ParseRedo.parse($"sqlRedo").as("p"))
      .select($"scn",
        col("p.data").getItem("O_ORDERKEY").cast("long").as("k"),
        col("p.data").getItem("O_ORDERSTATUS").as("st"))
      .groupBy($"k").agg(max_by($"st", $"scn").as("status"))
      .groupBy($"status").agg(count(lit(1)).as("cnt"))
      .orderBy($"status")
  }

  /** [[reconstructStatus]] without the final sort — the gated batch form re-sorts
    * ABOVE its scale gate (a join above a Sort un-sorts the output). */
  private def reconstructStatusUnsorted(committed: DataFrame): DataFrame = {
    val s = committed.sparkSession
    import s.implicits._
    committed
      .select($"scn", ParseRedo.parse($"sqlRedo").as("p"))
      .select($"scn",
        col("p.data").getItem("O_ORDERKEY").cast("long").as("k"),
        col("p.data").getItem("O_ORDERSTATUS").as("st"))
      .groupBy($"k").agg(max_by($"st", $"scn").as("status"))
      .groupBy($"status").agg(count(lit(1)).as("cnt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A12+A16+A13: render INSERT redo from nation, parse it back, catalog-cast to types.
    // Oracle: the nation table itself — exact round-trip.
    "cdc_parse_roundtrip" -> { (s, dir) =>
      import s.implicits._
      val schema = Catalog.schemaOf(s, dir, "nation")
      Tables(s, dir, "nation")
        .select(concat(
          lit("insert into \"GRAFT\".\"NATION\"(\"N_NATIONKEY\",\"N_NAME\",\"N_REGIONKEY\") values ("),
          $"n_nationkey", lit(",'"), $"n_name", lit("',"), $"n_regionkey", lit(")")).as("sql_redo"))
        .select(ParseRedo.parse($"sql_redo").as("parsed"))
        .select(Catalog.castProjection(col("parsed.data"), schema): _*)
        .orderBy($"n_nationkey")
    },
    // A7+A12+A16: CSF continuation reassembly, oracle-gated — the same INSERT redo as
    // cdc_parse_roundtrip but split into 3 fragments sharing (xid, scn, rowId), csf=true on
    // all but the last (the reference's cursor contract, OracleSourceTask2.java:277-281,
    // LogMinerThread2.java:265-269), pushed through Csf.fuse -> parse -> catalog cast.
    // Oracle: the nation table itself — a green hash proves fuse byte-exactly restores
    // every statement.
    "cdc_csf_fuse" -> { (s, dir) =>
      import s.implicits._
      val schema = Catalog.schemaOf(s, dir, "nation")
      val frags = Tables(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("k"),
          concat(
            lit("insert into \"GRAFT\".\"NATION\"(\"N_NATIONKEY\",\"N_NAME\",\"N_REGIONKEY\") values ("),
            $"n_nationkey", lit(",'"), $"n_name", lit("',"), $"n_regionkey", lit(")")).as("redo"))
        .as[(Long, String)]
        .flatMap { case (k, redo) =>
          val (cut1, cut2) = (redo.length / 3, 2 * redo.length / 3)
          val parts = Seq(redo.substring(0, cut1), redo.substring(cut1, cut2), redo.substring(cut2))
          parts.zipWithIndex.map { case (p, i) =>
            RedoEvent(scn = k, commitScn = 0L, xid = s"tx$k", rowId = f"R$k%010d",
              operation = RedoEvent.Insert, timestamp = new java.sql.Timestamp(0L),
              commitTimestamp = None, segOwner = "GRAFT", tableName = "NATION", sqlRedo = p,
              csf = i < parts.length - 1, rollback = false, info = "", rbasqn = 1L,
              seq = k * 10 + i)
          }
        }
      Csf.fuse(frags)
        .select(ParseRedo.parse($"sqlRedo").as("parsed"))
        .select(Catalog.castProjection(col("parsed.data"), schema): _*)
        .orderBy($"n_nationkey")
    },
    // A19+A20+A12: one transaction per order — START, INSERT, (update+partial-rollback pair
    // for %7 keys: must cancel), (surviving status update for %5 keys), COMMIT unless %10.
    // Reconstruct final per-key state from committed envelopes; aggregate by final status.
    // count-gated (r17): the batch assembly shuffles the feed-sized wire history on
    // xid — ~250 GB at sf100 — and was killed by the disk watchdog (>50 GB written in
    // 70 s); past the knee the query raises a named error pointing at the STREAMING
    // assembler (cdc_txn_reconstruct_stream's operator; the file-fed full-chain form
    // is graft.CdcThroughput, 183k events/s sustained at the same corpus a decade up).
    // Gate below the final 1-row-per-status sort (a join above a Sort un-sorts).
    "cdc_txn_reconstruct" -> { (s, dir) =>
      import s.implicits._
      val events = Tables.par(s, dir, "orders").select($"o_orderkey", $"o_orderstatus")
        .as[(Long, String)]
        .flatMap { case (k, st) => txnEvents(k, st) }
      ScaleGuard.gate(
        reconstructStatusUnsorted(TxnAssembler.assembleBatch(events).toDF()),
        s, dir, "cdc_txn_reconstruct")
        .orderBy($"status")
    },
    // A19 via the STREAMING path (flatMapGroupsWithState + state store), same oracle as
    // cdc_txn_reconstruct: events drive a MemoryStream in two micro-batches SPLIT
    // MID-TRANSACTION (every txn's START+INSERT in batch 1, its terminal in batch 2), so a
    // green hash proves open buffers carry across batch boundaries in state — batch/stream
    // parity under the oracle, not just in ScalaTest (reference semantics
    // LogMinerThread2.java:158-298).
    "cdc_txn_reconstruct_stream" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      // %4 subsample: this query is the batch/stream PARITY gate (the full-volume
      // throughput path is cdc_txn_reconstruct); MemoryStream encodes its feed on the
      // driver, so the harness — not the operator — would otherwise dominate the bench
      val rows = Tables(s, dir, "orders").select($"o_orderkey", $"o_orderstatus")
        .filter($"o_orderkey" % 4 === 0)
        .as[(Long, String)].collect() // driver-side feed is inherent to MemoryStream
      val all = rows.flatMap { case (k, st) => txnEvents(k, st) }
      val (opening, closing) = all.partition(e => e.seq % 10 <= 1) // START+INSERT vs rest
      val out = StreamGate.runTwoBatches(s, Encoders.product[RedoEvent],
          "cdc_txn_stream_sink", opening.toSeq, closing.toSeq) { ds =>
        TxnAssembler.assembleStreaming(ds, abandonedTxnTimeout = None).toDF()
      }
      reconstructStatus(out)
    },
    // VERDICT r5 #5 — the bounded-buffer OVERFLOW drop path, oracle-gated (the deliberate
    // deviation from the reference's unbounded trnCollection, SURVEY §7 hard-part 2): one
    // txn per order key with 1 + k%13 DML rows, cap maxBufferedRows = 8 — txns with more
    // than 8 rows (k%13 >= 8) must drop WHOLE at COMMIT (never emit truncated). Output:
    // histogram of surviving txn sizes (the survivor-set assertion) plus a txn_rows = -1
    // row counting dropped txns, computed DECLARATIVELY as input-xids ANTI-JOIN
    // surviving-xids — the same number the droppedTxns accumulator reports
    // (TxnAssemblerSpec pins accumulator == anti-join count on a small set).
    "cdc_txn_overflow" -> { (s, dir) =>
      import s.implicits._
      def mk(k: Long, off: Long, op: String, redo: String = "", rid: String = "r") =
        RedoEvent(scn = k * 100 + off, commitScn = 0L, xid = s"tx$k", rowId = rid,
          operation = op, timestamp = new java.sql.Timestamp(0L), commitTimestamp = None,
          segOwner = "GRAFT", tableName = "ORDERS", sqlRedo = redo, csf = false,
          rollback = false, info = "", rbasqn = 1L, seq = k * 100 + off)
      val events = Tables.par(s, dir, "orders").select($"o_orderkey".cast("long")).as[Long]
        .flatMap { k =>
          val n = 1 + (k % 13).toInt
          val dmls = (1 to n).map(i => mk(k, i.toLong, RedoEvent.Insert,
            s"""insert into "GRAFT"."ORDERS"("O_ORDERKEY","LINE") values ($k,$i)""",
            rid = f"R$k%09d$i%02d"))
          (mk(k, 0, RedoEvent.Start) +: dmls) :+ mk(k, 99, RedoEvent.Commit)
        }
      val committed = TxnAssembler.assembleBatch(events, maxBufferedRows = 8).toDF().cache()
      val sizes = committed.groupBy($"xid").agg(count(lit(1)).as("txn_rows"))
        .groupBy($"txn_rows").agg(count(lit(1)).as("txn_cnt"))
      // input xid universe straight from the key table (every txn has >=1 DML by
      // construction) — re-running the event synthesis + a distinct just to recover it
      // would double the synthesis work
      val allXids = Tables(s, dir, "orders")
        .select(concat(lit("tx"), $"o_orderkey".cast("long")).as("xid"))
      val dropped = allXids
        .join(committed.select($"xid").distinct(), Seq("xid"), "left_anti")
        .agg(lit(-1L).as("txn_rows"), count(lit(1)).as("txn_cnt"))
      sizes.union(dropped).orderBy($"txn_rows")
    },
    // A19's ABANDONED-TRANSACTION eviction, oracle-gated (r8 verdict #3; the deliberate
    // deviation from the reference's unbounded trnCollection, LogMinerThread2.java:81):
    // one txn per %4 order key opens (START + 2 DML) in batch 1 at event time t0(k); only
    // %3 keys COMMIT in batch 2; a far-future commit in batch 3 pushes the WATERMARK past
    // every open txn's t0 + 1 h, so the event-time timeout sweeps each surviving buffer to
    // the DLQ side as an AbandonedTxn record. The clock is the watermark — a pure function
    // of the feed — so the evicted set is deterministic and the oracle can count it from
    // the key table: committed = %3 keys (2 DML rows each), abandoned = the rest (2
    // buffered rows each). Drop-vs-DLQ semantics: README §CDC.
    "cdc_txn_timeout" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      def mk(k: Long, off: Long, op: String, tsMs: Long, redo: String = "") =
        RedoEvent(scn = k * 100 + off, commitScn = 0L, xid = s"tx$k", rowId = f"R$k%09d$off%02d",
          operation = op, timestamp = new java.sql.Timestamp(tsMs), commitTimestamp = None,
          segOwner = "GRAFT", tableName = "ORDERS", sqlRedo = redo, csf = false,
          rollback = false, info = "", rbasqn = 1L, seq = k * 100 + off)
      val keys = Tables(s, dir, "orders").filter($"o_orderkey" % 4 === 0)
        .select($"o_orderkey".cast("long")).as[Long].collect().toSeq // MemoryStream feed
      // event times fold into a <17 min window so no txn's t0 + 1 h timeout can fall
      // behind the batch-1 watermark (premature eviction would race the batch-2 COMMITs);
      // the +1 s floor keeps every event strictly above the INITIAL watermark (0) — a row
      // at exactly the watermark is filtered as late and its txn silently never opens
      def t0(k: Long) = (k % 997 + 1) * 1000L
      val opens = keys.flatMap { k =>
        Seq(mk(k, 0, RedoEvent.Start, t0(k)),
          mk(k, 1, RedoEvent.Insert, t0(k),
            s"""insert into "GRAFT"."ORDERS"("O_ORDERKEY") values ($k)"""),
          mk(k, 2, RedoEvent.Update, t0(k),
            s"""update "GRAFT"."ORDERS" set "O_ORDERSTATUS" = 'X' where "O_ORDERKEY" = $k"""))
      }
      // COMMIT event times sit ABOVE the batch-1 watermark (max t0): with delay 0 an
      // event-time-timeout fMGWS drops late input, so a commit behind the watermark would
      // never reach its buffer and the txn would (correctly, but unintendedly here) age out
      val commits = keys.filter(_ % 3 == 0).map(k => mk(k, 99, RedoEvent.Commit, 1057000L))
      // COMMIT for an unseen xid: advances the watermark, opens no buffer, emits nothing
      val pusher = Seq(mk(-1L, 0, RedoEvent.Commit, 997000L + 3600000L + 86400000L))
      val out = StreamGate.runBatches(s, Encoders.product[RedoEvent],
          "cdc_txn_timeout_sink", Seq(opens, commits, pusher)) { ds =>
        TxnAssembler.assembleStreamingEvicting(ds,
          watermarkDelay = "0 seconds", abandonTimeout = "1 hour").toDF()
      }
      val committed = out.filter($"committed".isNotNull)
        .agg(count(lit(1)).as("dml_rows"), countDistinct($"committed.xid").as("txns"))
        .select(lit("committed").as("kind"), $"dml_rows", $"txns")
      val abandoned = out.filter($"abandoned".isNotNull)
        .agg(sum($"abandoned.bufferedRows").cast("long").as("dml_rows"),
          count(lit(1)).as("txns"))
        .select(lit("abandoned").as("kind"), $"dml_rows", $"txns")
      abandoned.unionByName(committed).orderBy($"kind")
    },
    // A8+A9+A10+A11+A15+A22: the filter/routing stack over a stream synthesized from events.
    "cdc_filters_routing" -> { (s, dir) =>
      import s.implicits._
      // NOT floored (r20): the routing predicates are cheap per row — the closing
      // pair measured the floor exchange as a consistent +0.2 s net tax here
      // (0.40 -> 0.63 min at reps=7), unlike the parse-heavy synthesis chains
      val stream = Tables(s, dir, "events").select(
        $"event_id",
        when($"event_id" % 11 === 0, "DDL")
          .when($"event_id" % 11 === 1, "UPDATE")
          .when($"event_id" % 11 === 2 || $"event_id" % 11 === 3, "DELETE")
          .otherwise("INSERT").as("operation"),
        when($"event_id" % 13 === 0, "INTERNAL DDL some internal op").otherwise("").as("info"),
        when($"event_id" % 17 === 0, "alter ... temporary tables ...")
          .otherwise("insert into t values (1)").as("sql_redo"),
        when($"event_id" % 2 === 0, "APP").otherwise("OTHER").as("seg_owner"),
        when($"event_id" % 19 === 0, "BAD NAME!")
          .otherwise(concat_ws("", lit("T"), $"event_id" % 5)).as("table_name"))
      stream
        .filter(CdcPipeline.tempTableFilter())
        .filter(CdcPipeline.internalDdlFilter())
        .filter(CdcPipeline.validTableName())
        .filter(CdcPipeline.whitelist(Seq("APP" -> "T0", "APP" -> "T1", "APP" -> "T2", "OTHER" -> "*")))
        // A11's OTHER half: the blacklist carves an exception out of the wildcard grant
        // (Utils:147-151's appended `and not (...)`) — this is the predicate's only
        // DATA-path gate (PipelineSpec covers only its config parse)
        .filter(CdcPipeline.blacklist(Seq("OTHER" -> "T3")))
        .filter(CdcPipeline.operationFilter(Seq("INSERT", "UPDATE", "DDL")))
        .withColumn("topic", CdcPipeline.topic("DB1"))
        .groupBy($"operation", $"topic").agg(count(lit(1)).as("cnt"))
        .orderBy($"operation", $"topic")
    },
    // A1/A2: the source boundary, oracle-gated — events rendered to the Kafka wire shape
    // (JSON value + binary key) and decoded back; a green hash proves the codec preserves
    // every field bit-exactly (OracleSourceTask2.java:300-304 hand-off analogue).
    "cdc_wire_roundtrip" -> { (s, dir) =>
      import s.implicits._
      val events = Tables(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("k"), $"n_name", $"n_regionkey")
        .as[(Long, String, Int)]
        .map { case (k, name, reg) =>
          RedoEvent(scn = k, commitScn = k + 1, xid = s"tx$k", rowId = f"R$k%06d",
            operation = RedoEvent.Insert, timestamp = new java.sql.Timestamp(k * 1000L),
            commitTimestamp = Some(new java.sql.Timestamp(k * 2000L)),
            segOwner = "GRAFT", tableName = "NATION",
            sqlRedo = s"""insert into "GRAFT"."NATION"("N_NATIONKEY","N_NAME","N_REGIONKEY") values ($k,'$name',$reg)""",
            csf = false, rollback = k % 2 == 0, info = "", rbasqn = k % 3, seq = k)
        }
      graft.sources.RedoEventSource.fromKafka(
        graft.sources.RedoEventSource.toKafkaValue(events)).toDF()
        .select($"scn", $"commitScn".as("commit_scn"), $"xid", $"rowId".as("row_id"),
          unix_millis($"timestamp").as("ts_ms"),
          unix_millis($"commitTimestamp").as("commit_ts_ms"),
          $"segOwner".as("seg_owner"), $"tableName".as("table_name"),
          $"sqlRedo".as("sql_redo"),
          $"rollback".cast("int").as("rb"), $"rbasqn", $"seq")
        .orderBy($"scn")
    },
    // A6: boundary-record skip, oracle-gated — the strictly-after-offset predicate over a
    // synthesized (scn, commitScn, rowId) triple space (Task:258-264).
    "cdc_offset_skip" -> { (s, dir) =>
      import s.implicits._
      val triples = Tables(s, dir, "orders").select(
        ($"o_orderkey" % 100).cast("long").as("scn"),
        ($"o_orderkey" % 7).cast("long").as("commitScn"),
        concat(lit("R"), $"o_orderkey" % 5).as("rowId"))
      triples.filter(graft.sources.RedoEventSource.afterOffset(50L, 3L, "R2"))
        .groupBy($"scn").agg(count(lit(1)).as("cnt"))
        .orderBy($"scn")
    },
    // A25: dead-letter extraction, oracle-gated — unparsable DML must land in the DLQ
    // frame, parseable DML must not (Thread:305-308 made observable).
    "cdc_dead_letters" -> { (s, dir) =>
      import s.implicits._
      val frame = Tables(s, dir, "part")
        .select($"p_partkey".cast("long").as("scn"), lit("x").as("xid"),
          lit("APP").as("seg_owner"), lit("T1").as("table_name"),
          lit(RedoEvent.Insert).as("operation"),
          when($"p_partkey" % 3 === 0, concat(lit("garbage "), $"p_partkey"))
            .otherwise(concat(lit("insert into \"APP\".\"T1\"(\"ID\") values ("),
              $"p_partkey", lit(")"))).as("sql_redo"))
      CdcPipeline.deadLetters(frame.withColumn("parsed", ParseRedo.parse($"sql_redo")))
        .select($"scn", $"sql_redo")
        .orderBy($"scn")
    },
    // A4: sequence-gap detection, oracle-gated — RBASQN values synthesized with holes
    // (multiples of 7 and 11 removed), gaps > 1 must be flagged with their widths
    // (LogMinerThread2.java:144-147).
    "cdc_seq_gaps" -> { (s, dir) =>
      import s.implicits._
      val seqs = Tables(s, dir, "events")
        .filter($"event_id" % 7 =!= 0 && $"event_id" % 11 =!= 0)
        .select($"event_id".as("rbasqn"))
      CdcPipeline.sequenceGaps(seqs).orderBy($"last_seen")
    },
    // A21: heartbeat branch, oracle-gated — INSERTs on the configured heartbeat table
    // route to the .HEARTBEAT topic and surface HEARTBEAT_TIME from the after-image
    // (Thread:198-211,334-338).
    "cdc_heartbeat" -> { (s, dir) =>
      import s.implicits._
      val redo = Tables(s, dir, "customer")
        .filter($"c_custkey" % 3 === 0)
        .select(
          $"c_custkey".cast("long").as("scn"), lit("hb").as("xid"), lit("r").as("row_id"),
          lit("APP").as("seg_owner"), lit("HB").as("table_name"),
          lit(RedoEvent.Insert).as("operation"),
          concat(lit("insert into \"APP\".\"HB\"(\"ID\",\"HEARTBEAT_TIME\") values ("),
            $"c_custkey", lit(",'2024-01-01 00:00:"),
            lpad($"c_custkey" % 60, 2, "0"), lit("')")).as("sql_redo"),
          lit("").as("info"))
      val env = CdcPipeline.envelope(
        redo.withColumn("parsed", ParseRedo.parse($"sql_redo")), "DB1",
        heartbeatTable = Some("APP.HB"))
      CdcPipeline.heartbeats(env, "APP.HB")
        .select($"scn", $"heartbeat_time")
        .orderBy($"scn")
    },
    // THE COMPOSED PIPELINE, oracle-gated end to end: wire bytes → fromKafka decode →
    // filter stack → streaming transaction assembly (flatMapGroupsWithState) with
    // cross-micro-batch CSF fusion → parse → envelope → sink-side identity dedup. The feed
    // is cut so EVERY transaction splits mid-flight (START+INSERT in batch 1, COMMIT in
    // batch 2), %3 keys' INSERT statements split mid-STATEMENT across the cut (the carried
    // fragment run must fuse), %7 keys add non-whitelisted noise that must vanish, and %5
    // keys' INSERTs are REDELIVERED verbatim in batch 2 (same offset — Kafka at-least-once)
    // for RoutedSink.dedupByIdentity to kill. A green hash proves the full wiring, not the
    // stages individually (reference dataflow OracleSourceTask2.java:207-304 entire).
    "cdc_pipeline_e2e" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      val (cfg, batches) = pipelineE2eFeed(s, dir)
      val enc = Encoders.tuple(Encoders.BINARY, Encoders.BINARY, Encoders.scalaLong)
      val out = StreamGate.runBatches(s, enc, "cdc_pipeline_e2e_sink", batches) { ds =>
        CdcPipeline.stream(
          graft.sources.RedoEventSource.fromKafka(ds.toDF("key", "value", "offset")),
          cfg, streaming = true)
      }
      graft.sinks.RoutedSink.dedupByIdentity(out)
        .select(col("data").getItem("O_ORDERSTATUS").as("status"))
        .groupBy($"status").agg(count(lit(1)).as("cnt"))
        .orderBy($"status")
    },
    // A26 STOP/DRAIN/RESTART, oracle-gated (r6 verdict #3 — the last unit-only component):
    // the restart twin of cdc_pipeline_e2e. The SAME wire feed and the SAME mid-transaction
    // / mid-CSF-run cut, but the streaming query is gracefully STOPPED after draining batch
    // 1 (reference Task:372-393 cancel-cursor + END_LOGMNR; Task:228 drain window) and a
    // NEW query resumes from the file checkpoint for batch 2. Every split transaction's
    // START+INSERT state and every carried CSF head fragment must come back from the
    // checkpointed state store — the oracle is the SAME final state as the uninterrupted
    // run, so a green hash proves "stop mid-stream, checkpoint intact, restart resumes
    // exactly", not just that the query re-starts.
    "cdc_pipeline_restart" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      val (cfg, batches) = pipelineE2eFeed(s, dir)
      val enc = Encoders.tuple(Encoders.BINARY, Encoders.BINARY, Encoders.scalaLong)
      val out = StreamGate.runBatchesWithRestarts(s, enc, batches) { ds =>
        CdcPipeline.stream(
          graft.sources.RedoEventSource.fromKafka(ds.toDF("key", "value", "offset")),
          cfg, streaming = true)
      }
      graft.sinks.RoutedSink.dedupByIdentity(out)
        .select(col("data").getItem("O_ORDERSTATUS").as("status"))
        .groupBy($"status").agg(count(lit(1)).as("cnt"))
        .orderBy($"status")
    },
    // Envelope-apply (MERGE/upsert) — the consumer's last mile: a deterministic event
    // script over orders (updates for %3, a later multi-column update for %9, deletes for
    // %10, inserts of NEW keys for %4, then an update of a freshly-inserted key for %8)
    // rendered to real redo SQL, parsed, enveloped, and replayed onto the orders snapshot
    // by [[EnvelopeApply]] in (commit_scn, scn, seq) order. commit_scn is constant so the
    // comparator's scn/seq fallback is exercised. Oracle: DuckDB computes the same final
    // state with CASE arithmetic — a green hash proves insert/overlay/tombstone/resurrect
    // fold semantics AND the pk-metadata-driven join, end to end.
    "cdc_apply_merge" -> { (s, dir) =>
      import s.implicits._
      val snapshot = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val schema = Catalog.withKeyMetadata(snapshot.schema, Set("o_orderkey"))
      EnvelopeApply(snapshot, mergeEnvelope(s, dir, lit(true)), schema).orderBy($"o_orderkey")
    },
    // The single-shuffle HOF-FOLD apply (the default through r6; r7 flipped the default
    // to the native EnvelopeFold aggregate, which cdc_apply_merge now exercises) over
    // the SAME merge script and oracle as cdc_apply_merge: a green hash here plus the
    // 300-scenario property spec pins applyFolded ≡ applyPrefolded ≡ applyNative.
    "cdc_apply_merge_folded" -> { (s, dir) =>
      import s.implicits._
      val snapshot = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val schema = Catalog.withKeyMetadata(snapshot.schema, Set("o_orderkey"))
      EnvelopeApply.applyFolded(snapshot, mergeEnvelope(s, dir, lit(true)), schema)
        .orderBy($"o_orderkey")
    },
    // MULTI-TABLE ROUTING -> APPLY — the realistic consumer in one pass: ONE mixed wire
    // stream (orders + customer scripts unioned pre-parse), parsed and enveloped ONCE,
    // split by the A22 topic column, each branch applied onto its own snapshot with its
    // own pk metadata, summaries unioned. Proves the generic (schema-dynamic) envelope
    // carries every table through the same plumbing and only the table boundary is
    // typed. The envelope caches because both branches consume it (the parse is the
    // expensive part); at 100 TB the split is a partition-pruned write per topic.
    "cdc_apply_merge_multitable" -> { (s, dir) =>
      import s.implicits._
      val raw = mergeScript(s, dir, lit(true)).unionByName(customerScript(s, dir))
      val env = CdcPipeline.envelope(
        raw.withColumn("parsed", ParseRedo.parse($"sql_redo")), "DB1",
        extra = Seq($"commit_scn", $"seq")).cache()
      val oSnap = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val cSnap = Tables(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val oFin = EnvelopeApply(oSnap, env.filter($"topic" === "DB1.GRAFT.ORDERS"),
        Catalog.withKeyMetadata(oSnap.schema, Set("o_orderkey")))
      val cFin = EnvelopeApply(cSnap, env.filter($"topic" === "DB1.GRAFT.CUSTOMER"),
        Catalog.withKeyMetadata(cSnap.schema, Set("c_custkey")))
      oFin.agg(count(lit(1)).as("n_rows"), min($"o_orderkey").as("min_key"),
          max($"o_orderkey").as("max_key"),
          countDistinct($"o_orderstatus").as("n_vals"))
        .select(lit("ORDERS").as("tbl"), $"n_rows", $"min_key", $"max_key", $"n_vals")
        .unionByName(
          cFin.agg(count(lit(1)).as("n_rows"), min($"c_custkey").as("min_key"),
              max($"c_custkey").as("max_key"),
              countDistinct($"c_mktsegment").as("n_vals"))
            .select(lit("CUSTOMER").as("tbl"), $"n_rows", $"min_key", $"max_key", $"n_vals"))
        .orderBy($"tbl")
    },
    // The declarative BOUNDED-state apply (single-scan explode_outer + two-level rollup;
    // the default for the first half of r7) over the same script and oracle — keeps the
    // pure-Column-algebra twin oracle-gated now that the default is the imperative
    // aggregate.
    // count-gated (r17): prefold materializes per-key prefolded state at ~3× the
    // native fold's shuffle footprint and was disk-killed at sf100 where the default
    // cdc_apply_merge completed in 190 s — past the knee it raises a named error
    // pointing at cdc_apply_merge. Gate below the re-applied final sort.
    "cdc_apply_merge_prefold" -> { (s, dir) =>
      import s.implicits._
      val snapshot = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val schema = Catalog.withKeyMetadata(snapshot.schema, Set("o_orderkey"))
      ScaleGuard.gate(
        EnvelopeApply.applyPrefolded(snapshot, mergeEnvelope(s, dir, lit(true)), schema),
        s, dir, "cdc_apply_merge_prefold")
        .orderBy($"o_orderkey")
    },
    // VERDICT r5 #3 — the reference's FULL dictionary chain in one gated query: dictionary
    // views (literal frames stand in for dba_tab_cols/constraints/cons_columns/ind_columns/
    // indexes) → the faithful dcc/duq dictionary query (Catalog.pkUqDictionary, the same
    // shared plan b3_dictionary_pkuq gates) → per-column pk flags stamped as
    // StructField.metadata (withKeyMetadataFromDictionary) → the keys drive EnvelopeApply's
    // MERGE (Utils:156-252 → models/Column.java:19-20 → apply). The hidden SYS_NC column
    // and the non-P check constraint must be filtered by the dictionary query, or the key
    // set is wrong and the hash diverges. Oracle: identical final state to cdc_apply_merge.
    "cdc_apply_merge_dict" -> { (s, dir) =>
      import s.implicits._
      val snapshot = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val tabCols = Seq(
        ("GRAFT", "ORDERS", "O_ORDERKEY", 1L, "NO", "NO"),
        ("GRAFT", "ORDERS", "O_ORDERSTATUS", 2L, "NO", "NO"),
        ("GRAFT", "ORDERS", "O_ORDERPRIORITY", 3L, "NO", "NO"),
        ("GRAFT", "ORDERS", "SYS_NC00004$", 4L, "YES", "NO"))
        .toDF("owner", "table_name", "column_name", "column_id", "hidden_column", "virtual_column")
      val constraints = Seq(
        ("GRAFT", "PK_ORDERS", "ORDERS", "P"), ("GRAFT", "CK_ORDERS", "ORDERS", "C"))
        .toDF("owner", "constraint_name", "table_name", "constraint_type")
      val consCols = Seq(
        ("GRAFT", "PK_ORDERS", "ORDERS", "O_ORDERKEY"),
        ("GRAFT", "CK_ORDERS", "ORDERS", "O_ORDERSTATUS"))
        .toDF("owner", "constraint_name", "table_name", "column_name")
      val indCols = Seq(("GRAFT", "IX_ORDERS", "ORDERS", "O_ORDERKEY"))
        .toDF("table_owner", "index_name", "table_name", "column_name")
      val indexes = Seq(("GRAFT", "IX_ORDERS", "UNIQUE"))
        .toDF("owner", "index_name", "uniqueness")
      val dict = Catalog.pkUqDictionary(tabCols, constraints, consCols, indCols, indexes)
      val schema = Catalog.withKeyMetadataFromDictionary(snapshot.schema, dict, "GRAFT", "orders")
      EnvelopeApply(snapshot, mergeEnvelope(s, dir, lit(true)), schema).orderBy($"o_orderkey")
    },
    // The STREAMING envelope-apply — replica maintenance as a keyed-state operator
    // (flatMapGroupsWithState, one row-image per live key): the %7 slice of the same merge
    // script is cut so key histories STRADDLE the micro-batch boundary (update then later
    // update, insert then update, update then delete), the per-key fold carries in state,
    // and the latest emission per key merges onto the full snapshot. Same semantics as the
    // batch fold, proven by an oracle conditioned on the %7 slice.
    "cdc_apply_merge_stream" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      val snapshot = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val schema = Catalog.withKeyMetadata(snapshot.schema, Set("o_orderkey"))
      val rows = mergeEnvelope(s, dir, $"k" % 7 === 0)
        .select($"commit_scn", $"scn", $"seq", $"operation", $"data", $"before")
        .as[MergeEnvRow].collect().toSeq // driver-side feed is inherent to MemoryStream
      val (b1, b2) = rows.partition(_.scn % 10 <= 2)
      val out = StreamGate.runBatches(s, Encoders.product[MergeEnvRow],
          "cdc_apply_merge_stream_sink", Seq(b1, b2)) { ds =>
        EnvelopeApply.applyStreaming(ds.toDF(), schema).toDF()
      }
      EnvelopeApply.applyChanges(snapshot, EnvelopeApply.latestChanges(out, schema), schema)
        .orderBy($"o_orderkey")
    },
    // A5, oracle-gated: the full resume-resolution ladder (OracleSourceTask2.java:137-192)
    // compiled to predicates over one synthesized (scn, commitScn, rowId) triple space and
    // reduced in a single scan (conditional aggregates, stacked to one row per posture):
    //   1. stored offset           -> boundary-record skip (strictly-after triple compare);
    //   2. start.scn override      -> inclusive from the configured SCN (Task:168-173);
    //   3. reset.offset beats both -> from the database tip;
    //   4. no position at all      -> from the database tip (Task:182-192);
    //   5. the CM-desupport parity posture (inclusive = false): strictly after start.scn.
    // The tip is a driver-side scalar lookup (the reference's SELECT current_scn; here the
    // B5-shaped MIN/MAX over the same data so DuckDB recomputes it), and `currentScn` is
    // by-name: postures 1/2 pass a thrower, proving the tip is only queried when needed.
    "cdc_resume_ladder" -> { (s, dir) =>
      import s.implicits._
      import graft.sources.RedoEventSource
      val triples = Tables(s, dir, "orders").select(
        ($"o_orderkey" % 100).cast("long").as("scn"),
        ($"o_orderkey" % 7).cast("long").as("commitScn"),
        concat(lit("R"), $"o_orderkey" % 5).as("rowId"),
        ($"o_orderkey" % 1000).cast("long").as("seq"))
      val tip: Long = triples.agg(max($"scn")).head().getLong(0) - 29
      def noTip: Long = sys.error("resume ladder consulted the DB tip when a position exists")
      val postures: Seq[(String, Column)] = Seq(
        // a checkpoint that kept the order key resumes loss-free on seq alone — the
        // triple in the same stored offset is carried but not consulted
        "0_stored_seq" ->
          RedoEventSource.resolveResume(Some((50L, 3L, "R2")), None, resetOffset = false,
            noTip, storedSeq = Some(800L)).predicate,
        "1_stored_offset" ->
          RedoEventSource.resolveResume(Some((50L, 3L, "R2")), None, resetOffset = false, noTip).predicate,
        "2_start_scn_override" ->
          RedoEventSource.resolveResume(Some((50L, 3L, "R2")), Some(60L), resetOffset = false, noTip).predicate,
        "3_reset_offset" ->
          RedoEventSource.resolveResume(Some((50L, 3L, "R2")), Some(60L), resetOffset = true, tip).predicate,
        "4_fresh_from_tip" ->
          RedoEventSource.resolveResume(None, None, resetOffset = false, tip).predicate,
        "5_cm_exclusive" ->
          RedoEventSource.ResumePosition(60L, 0L, "", skipBoundary = false, inclusive = false).predicate)
      val aggs = postures.flatMap { case (n, p) =>
        // count(when(...)) not sum: a zero-match posture must read 0 like the oracle's
        // count(*), never NULL
        Seq(count(when(p, 1)).as(s"c_$n"), min(when(p, $"scn")).as(s"m_$n")) }
      val stacked = postures.map { case (n, _) =>
        struct(lit(n).as("resume_case"), col(s"c_$n").as("cnt"), col(s"m_$n").as("min_scn")) }
      triples.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(stacked: _*)).as("r"))
        .select($"r.*")
        .orderBy($"resume_case")
    },
    // A14, oracle-gated: schema-cache invalidation on DDL, end to end. Two "micro-batch"
    // windows of redo (the foreachBatch discipline — DDLs are collected on the driver,
    // which evicts + advances the dictionary; DML is cast with the CURRENT cached schema):
    // window 1 INSERTs (S_SUPPKEY, S_NAME) under dictionary v1; window 2 opens with
    // `alter table add S_TIER number(4,0)` and then UPDATEs that SET the new column. If
    // eviction failed, window 2 would still project with the cached v1 schema, s_tier
    // would vanish, and the hash would diverge — the A14 contract is what the oracle
    // checks. The new column's type comes through the NUMBER ladder (precision 4 ->
    // ShortType), so A16's dictionary typing is gated here too.
    "cdc_schema_evolution" -> { (s, dir) =>
      import s.implicits._
      val dictV1 = Seq(("S_SUPPKEY", "NUMBER", 9, 0), ("S_NAME", "VARCHAR2", 0, 0))
      val dictV2 = dictV1 :+ (("S_TIER", "NUMBER", 4, 0))
      var dict = dictV1 // the live dictionary; the DDL below advances it (driver-side)
      Catalog.invalidate("evo", "SUPP") // deterministic when re-run within one JVM
      def window(events: DataFrame): DataFrame = {
        val sawDdl = events.filter($"operation" === "DDL").limit(1).count() > 0
        if (sawDdl) { dict = dictV2; Catalog.invalidate("evo", "SUPP") }
        val schema = Catalog.schemaOfDictionary("evo", "SUPP")(Catalog.schemaFromTabCols(dict))
        events.filter($"operation" =!= "DDL")
          .withColumn("p", ParseRedo.parse($"sql_redo"))
          .select(col("operation") +: Catalog.castProjection(col("p.data"), schema): _*)
      }
      val supp = Tables(s, dir, "supplier").select($"s_suppkey".cast("long").as("k"), $"s_name")
      val w1 = supp.select(lit("INSERT").as("operation"),
        concat(lit("insert into \"GRAFT\".\"SUPP\"(\"S_SUPPKEY\",\"S_NAME\") values ("),
          $"k", lit(",'"), $"s_name", lit("')")).as("sql_redo"))
      val w2 = Seq(("DDL", "alter table \"GRAFT\".\"SUPP\" add \"S_TIER\" number(4,0)"))
        .toDF("operation", "sql_redo")
        .union(supp.filter($"k" % 2 === 0).select(lit("UPDATE").as("operation"),
          concat(lit("update \"GRAFT\".\"SUPP\" set \"S_TIER\" = "), $"k" % 5,
            lit(" where \"S_SUPPKEY\" = "), $"k").as("sql_redo")))
      window(w1).unionByName(window(w2), allowMissingColumns = true)
        .orderBy($"s_suppkey", $"operation")
    },
    // A24, oracle-gated: the run-status side channel. A real streaming query (MemoryStream,
    // two drained micro-batches sized by the customer table) runs with [[StatusListener]]
    // attached; the JSONL status feed it writes is then read back and reduced to its
    // deterministic core — one RUNNING line, one PROGRESS line per data batch with the
    // exact fed row counts, one STOPPED line (idle-tick PROGRESS lines with zero input
    // rows are monitoring noise and are filtered; the listener bus is async, so the gate
    // polls briefly for the terminal line). DuckDB recomputes the batch sizes.
    "cdc_status_feed" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      import java.nio.file.Files
      val keys = Tables(s, dir, "customer").filter($"c_custkey" % 4 === 0)
        .select($"c_custkey".cast("long")).as[Long]
        .collect().toSeq // driver-side feed is inherent to MemoryStream
      val (b1, b2) = keys.partition(_ % 8 == 0)
      val path = Files.createTempFile("graft-status", ".jsonl")
      val sinkName = "cdc_status_feed_sink"
      val listener = new StatusListener(path.toString)
      // the listener hears EVERY query on the session bus — the gate must key on THIS
      // query's id (resolved from its RUNNING line by name) or a stray query still
      // winding down from an earlier bench entry would contaminate the counts
      val idOf = """"id":"([^"]+)"""".r
      def feed(): Vector[String] =
        new String(Files.readAllBytes(path), "UTF-8").linesIterator.toVector
      def ourId(ls: Vector[String]): Option[String] =
        ls.find(l => l.contains(""""event":"RUNNING"""") && l.contains(s""""name":"$sinkName""""))
          .flatMap(idOf.findFirstMatchIn(_)).map(_.group(1))
      def stopped(ls: Vector[String]): Boolean = ourId(ls).exists(id =>
        ls.exists(l => l.contains(""""event":"STOPPED"""") && l.contains(s""""id":"$id"""")))
      s.streams.addListener(listener)
      try {
        StreamGate.runBatches(s, Encoders.scalaLong, sinkName, Seq(b1, b2))(ds => ds.toDF("k"))
        // generous: the bus normally delivers in ms, but the round's gate can run on a
        // heavily contended machine and a missed STOPPED line would read as a hash miss
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!stopped(feed()) && System.nanoTime() < deadline) Thread.sleep(50)
      } finally s.streams.removeListener(listener)
      // the feed is read EAGERLY (it is a driver-local few-hundred-byte file) so the temp
      // file can be deleted before returning — the result frame must not keep a lazy
      // dependency on it
      val lines =
        try {
          val ls = feed()
          val id = ourId(ls)
          ls.filter(l => id.exists(i => l.contains(s""""id":"$i"""")))
        } finally Files.deleteIfExists(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("numInputRows", org.apache.spark.sql.types.StringType)))
      s.read.schema(schema).json(s.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
        .filter($"event" =!= "PROGRESS" || coalesce($"numInputRows".cast("long"), lit(0L)) > 0)
        .groupBy($"event")
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum($"numInputRows".cast("long")), lit(0L)).as("input_rows"))
        .withColumnRenamed("event", "status_event")
        .orderBy($"status_event")
    },
    // A18: envelope null rules per operation + routing, from customer-derived redo.
    "cdc_envelope" -> { (s, dir) =>
      import s.implicits._
      val redo = Tables.par(s, dir, "customer").select(
        $"c_custkey",
        when($"c_custkey" % 4 === 0, "DELETE")
          .when($"c_custkey" % 4 === 1, "INSERT")
          .when($"c_custkey" % 4 === 2, "UPDATE")
          .otherwise("DDL").as("operation"),
        when($"c_custkey" % 4 === 0,
            concat(lit("delete from \"GRAFT\".\"CUSTOMER\" where \"C_CUSTKEY\" = "), $"c_custkey"))
          .when($"c_custkey" % 4 === 1,
            concat(lit("insert into \"GRAFT\".\"CUSTOMER\"(\"C_CUSTKEY\",\"C_NAME\") values ("),
              $"c_custkey", lit(",'"), $"c_name", lit("')")))
          .when($"c_custkey" % 4 === 2,
            concat(lit("update \"GRAFT\".\"CUSTOMER\" set \"C_NAME\" = '"), $"c_name",
              lit("' where \"C_CUSTKEY\" = "), $"c_custkey"))
          .otherwise(lit("alter table \"GRAFT\".\"CUSTOMER\" add \"C_EXTRA\" number"))
          .as("sql_redo"),
        $"c_custkey".cast("long").as("scn"), lit("x").as("xid"), lit("r").as("row_id"),
        lit("GRAFT").as("seg_owner"), lit("CUSTOMER").as("table_name"), lit("").as("info"))
      val enveloped = CdcPipeline.envelope(
        redo.withColumn("parsed", ParseRedo.parse($"sql_redo")), "DB1")
      enveloped
        .groupBy($"operation", $"topic")
        .agg(count(lit(1)).as("cnt"),
          sum($"data".isNull.cast("int")).cast("long").as("null_data_cnt"),
          sum($"before".isNull.cast("int")).cast("long").as("null_before_cnt"))
        .orderBy($"operation")
    },
    // SCD2 HISTORY — the dimension-table consumer the apply family's FINAL-state queries
    // deliberately collapse: instead of folding the envelope to one row per key, keep
    // EVERY committed version as a validity interval. The reference connector's users
    // build exactly this downstream of the topic (type-2 slowly-changing dimensions);
    // here it runs over the same mergeEnvelope script the apply gates use, so the oracle
    // can reconstruct it with plain arithmetic. Spark shape: base snapshot rows become
    // version 0, envelope rows version N; per-column state is a running
    // last(..., ignoreNulls) over the (key, scn) window with a struct wrap so an explicit
    // SET NULL (the %6 update) is a real overlay, not a skipped null; valid_to comes from
    // lead() over the SAME sorted frame WITH delete markers still present (a DELETE
    // closes the last version but emits no row). One shuffle on the key — the per-key
    // sort window is the canonical SCD2 build and survives 100× (history depth per key is
    // bounded by that key's change count, not corpus size).
    "cdc_scd2_history" -> { (s, dir) =>
      scd2HistoryProjection(scd2Versions(s, dir))
    },
    // INCREMENTAL SCD2 MAINTENANCE (r11 verdict #2) — cdc_scd2_history's 100 TB
    // posture: a dimension history is never rebuilt whole; the day's delta of committed
    // envelopes folds onto the PERSISTED version frame. Delta here = the late ops of
    // the %13 key cohort (an in-order per-key suffix — see scd2DeltaCond); the prior
    // frame is built without them, persisted to parquet (the artifact yesterday's run
    // hands over), re-read, and folded via scd2IncrementalFold: broadcast key
    // anti/semi-joins split the frame, and ONLY the affected cohort re-windows.
    // Equality with the full rebuild is the operator's definition, so the gate is
    // cdc_scd2_history's oracle VERBATIM. graft.engine.Scd2IncrBench isolates the
    // fold's cost from the in-query prior build.
    //
    // PRIOR-FRAME REUSE (r17): the r11–r16 form REBUILT and re-wrote the prior frame
    // inside every run, which the sf100 probe measured as the dominant term — 324 s
    // against the full rebuild's own 151 s (the query paid rebuild + parquet write +
    // fold, 2.1× the thing it exists to avoid). In production yesterday's history
    // EXISTS; the query now rebuilds ONLY when the persisted artifact is missing or
    // its input fingerprint (count + scn/key/crc32 sums of the non-delta input — one
    // scan, partial aggs, no shuffle, no write) doesn't match, so a stale artifact
    // from a different dataset generation can never silently serve. Output is
    // byte-identical either way; the oracle is unchanged. Steady-state cost becomes
    // fingerprint scan + delta fold — the daily-maintenance posture the operator
    // models (sf100: 324 s → 58 s steady-state).
    "cdc_scd2_incremental" -> { (s, dir) =>
      import s.implicits._
      val in = scd2Input(s, dir)
      val nonDelta = in.filter(!scd2DeltaCond)
      // fingerprint the SOURCE table, not the derived script: scd2Input derives
      // deterministically from `orders` (fixed code), so orders-identity implies
      // script-identity, and a 3-column columnar scan of orders is an order of
      // magnitude cheaper than regenerating 3x-the-rows envelope maps just to hash
      // them. Every term pmod-bounded BEFORE the sum (ANSI mode overflows a raw sum
      // at derived-scale key magnitudes: keys reach ~1e11 at sf100); count + two
      // independent residue sums make accidental cross-dataset collision negligible.
      // The format-version token covers CODE staleness, not just data staleness
      // (ADVICE r17 #3): the data terms only fingerprint source identity, so a
      // persisted artifact written by an older derivation/schema would still match
      // them after a code change and silently serve. Bump the token whenever the
      // scd2 derivation (scd2Input, Scd2.versionFrame, Scd2Cols) or the prior-frame
      // parquet schema changes — the mismatch forces a rebuild.
      val fp = Scd2PriorFormatVersion + "," + Tables(s, dir, "orders").agg(
          count(lit(1)).cast("long"),
          sum(pmod($"o_orderkey".cast("long"), lit(999983L))).cast("long"),
          sum(pmod(crc32(concat_ws("|", $"o_orderkey", $"o_orderstatus",
            $"o_orderpriority")), lit(1000033L))).cast("long"))
        .collect()(0).toSeq.map(String.valueOf).mkString(",")
      val path = scd2PriorPath(dir)
      val fpFile = new java.io.File(path + ".fingerprint")
      val stale = !fpFile.exists() ||
        new String(java.nio.file.Files.readAllBytes(fpFile.toPath), "UTF-8") != fp
      if (stale) {
        Scd2.versionFrame(nonDelta, "o_orderkey", Scd2Cols)
          .write.mode("overwrite").parquet(path)
        java.nio.file.Files.write(fpFile.toPath, fp.getBytes("UTF-8"))
      }
      scd2HistoryProjection(scd2IncrementalFold(
        s.read.parquet(path), in.filter(scd2DeltaCond)))
    },
    // MULTI-MASTER CONFLICT DETECTION — the reconciliation report a bidirectional /
    // multi-site CDC deployment needs: two sites replay the same key space (site A =
    // the %2 slice of the merge script, site B = the %3 slice with its scn clock skewed
    // +5), and a key BOTH sites wrote is a conflict, resolved last-writer-wins by
    // (scn, site) with the deterministic site-A tiebreak. Plan: per-site one
    // partial-agg max per key (no raw-event join), then an inner equi join of the two
    // tiny per-key summaries — at 100 TB the conflict set is bounded by the overlap, and
    // nothing replays raw history.
    "cdc_conflict_detect" -> { (s, dir) =>
      import s.implicits._
      def lastWrite(keyFilter: Column, scnOffset: Long) =
        mergeEnvelope(s, dir, keyFilter)
          .select(
            coalesce($"data".getItem("O_ORDERKEY"), $"before".getItem("O_ORDERKEY"))
              .cast("long").as("o_orderkey"),
            ($"scn".cast("long") + scnOffset).as("scn"))
          .groupBy($"o_orderkey").agg(max($"scn").as("last_scn"))
      val a = lastWrite($"k" % 2 === 0, 0L)
      val b = lastWrite($"k" % 3 === 0, 5L)
      a.select($"o_orderkey", $"last_scn".as("a_last_scn"))
        .join(b.select($"o_orderkey", $"last_scn".as("b_last_scn")), Seq("o_orderkey"))
        .select($"o_orderkey", $"a_last_scn", $"b_last_scn",
          when($"a_last_scn" >= $"b_last_scn", "A").otherwise("B").as("winner"))
        .orderBy($"o_orderkey")
    },
    // STREAMING SCD2 — the dimension history maintained CONTINUOUSLY by keyed state
    // (cdc/Scd2Stream): per-key open version in the store (state bounded by column
    // count, closures emitted and evicted), fed the %7 slice of the same merge script
    // across a mid-key batch cut, changelog-only semantics (no base snapshot: columns
    // are NULL until an op sets them). Oracle: the script's version intervals with
    // NULL-until-set states, computed per key with plain arithmetic.
    "cdc_scd2_stream" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Encoders
      val rows = mergeEnvelope(s, dir, $"k" % 7 === 0)
        .select($"commit_scn", $"scn", $"seq", $"operation", $"data", $"before")
        .as[MergeEnvRow].collect().toSeq // driver-side feed is inherent to MemoryStream
      val (b1, b2) = rows.partition(_.scn % 10 <= 2)
      val out = StreamGate.runBatches(s, Encoders.product[MergeEnvRow],
          "cdc_scd2_stream_sink", Seq(b1, b2)) { ds =>
        Scd2Stream.versions(ds).toDF()
      }
      Scd2Stream.latestVersions(out)
        .orderBy($"o_orderkey", $"valid_from_scn")
    },
    // TIME-TRAVEL READ — the table AS OF a fixed SCN, the query the SCD2 history exists
    // to answer: keep only versions at or before the cut, take the newest per key, drop
    // keys whose newest record is the delete marker. A mid-stream cut is a CONSISTENT
    // point in time: low keys (scn = key*10+off) show fully-applied state, high keys
    // still show the base snapshot — exactly what a replica looked like mid-apply.
    "cdc_asof_snapshot" -> { (s, dir) =>
      import s.implicits._
      val wDesc = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderkey").orderBy($"scn".desc)
      scd2Versions(s, dir)
        .filter($"scn" <= AsOfScn)
        .withColumn("rn", row_number().over(wDesc))
        .filter($"rn" === 1 && $"operation" =!= RedoEvent.Delete)
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
        .orderBy($"o_orderkey")
    },
    // CROSS-TABLE CONSISTENT AS-OF (r10 verdict #5) — real time-travel reads a
    // transactionally consistent CUT across tables, not one table at a time: ONE mixed
    // wire stream (orders + customer scripts, the cdc_apply_merge_multitable feed),
    // parsed and enveloped once, then the SINGLE scn cut is applied BEFORE the topic
    // split — so by construction no table can reflect a commit past the cut that
    // another table misses. Each branch applies its <=cut envelope onto its snapshot;
    // output is ROW-LEVEL (both tables normalized to (tbl, key, v1, v2) and unioned),
    // so the oracle checks every key of both tables at the cut, not just summaries.
    // The cut lands mid-apply in BOTH tables at every sf (key*10-scale scns), which is
    // exactly the state a consistent multi-table replica shows mid-replay.
    "cdc_asof_multitable" -> { (s, dir) =>
      import s.implicits._
      val raw = mergeScript(s, dir, lit(true)).unionByName(customerScript(s, dir))
      val env = CdcPipeline.envelope(
        raw.withColumn("parsed", ParseRedo.parse($"sql_redo")), "DB1",
        extra = Seq($"commit_scn", $"seq"))
        .filter($"scn".cast("long") <= AsOfMultiCut) // the ONE cut, before the split
        .cache()
      val oSnap = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      val cSnap = Tables(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val oFin = EnvelopeApply(oSnap, env.filter($"topic" === "DB1.GRAFT.ORDERS"),
        Catalog.withKeyMetadata(oSnap.schema, Set("o_orderkey")))
      val cFin = EnvelopeApply(cSnap, env.filter($"topic" === "DB1.GRAFT.CUSTOMER"),
        Catalog.withKeyMetadata(cSnap.schema, Set("c_custkey")))
      oFin.select(lit("ORDERS").as("tbl"), $"o_orderkey".cast("long").as("key"),
          $"o_orderstatus".as("v1"), $"o_orderpriority".as("v2"))
        .unionByName(cFin.select(lit("CUSTOMER").as("tbl"),
          $"c_custkey".cast("long").as("key"),
          $"c_mktsegment".as("v1"), lit(null).cast("string").as("v2")))
        .orderBy($"tbl", $"key")
    },
    // SCD2 LATE-EVENT RESTATEMENT (r10 verdict #6) — an out-of-order commit (scn strictly
    // inside an already-closed interval: the %11 keys get a status='L' update at off 2,
    // BETWEEN the off-1 and off-3 versions, appended at the END of the feed) must
    // restate history: the enclosing interval splits, valid_to/valid_from re-knit, and
    // every later version's ordinal shifts. The batch builder re-sorts per key inside
    // Scd2.versionFrame, so ARRIVAL position cannot matter — that is the restatement
    // contract this gate pins (the streaming builder can NOT reopen closures; its
    // divergence is documented at cdc/Scd2Stream.scala and the batch rebuild is the
    // correction path).
    "cdc_scd2_restate" -> { (s, dir) =>
      import s.implicits._
      val late = Tables(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("k")).filter($"k" % 11 === 0)
        .select($"k".as("o_orderkey"), ($"k" * 10 + 2).as("scn"),
          lit(RedoEvent.Update).as("operation"),
          map(lit("O_ORDERSTATUS"), lit("L")).as("data"))
      scd2HistoryProjection(
        Scd2.versionFrame(scd2Input(s, dir).unionByName(late), "o_orderkey", Scd2Cols))
    },
  )

  /** SCN cut of `cdc_asof_multitable` — mid-apply in BOTH tables: scns are key*10+off,
    * so at every sf keys below ~750 are applied and the rest still read as their base
    * snapshots (customer key space is 10x smaller than orders, hence the low cut).
    * Shared with the oracle so the gates cannot drift. */
  private val AsOfMultiCut = 7500L

  /** SCN cut of `cdc_asof_snapshot` — mid-stream at sf0.01 (orders keys 0..14999 emit
    * script scns up to ~150005, so keys below 7500 are fully applied and the rest still
    * read as the base snapshot). Shared with the oracle so the gates cannot drift. */
  private val AsOfScn = 75000L

  /** The shared SCD2 version frame behind `cdc_scd2_history` and `cdc_asof_snapshot`:
    * base snapshot rows (version 0) unioned with the committed mergeEnvelope ops, each
    * row carrying the FULL overlaid state at that point (running struct-wrapped
    * last(ignoreNulls) per column, so an explicit SET NULL — the %6 update — is a real
    * overlay) plus the lead-closed interval end. Delete markers are still present:
    * callers decide whether they close intervals (history) or kill keys (as-of). */
  private def scd2Input(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val env = mergeEnvelope(s, dir, lit(true))
      .select(
        coalesce($"data".getItem("O_ORDERKEY"), $"before".getItem("O_ORDERKEY"))
          .cast("long").as("o_orderkey"),
        $"scn".cast("long").as("scn"), $"operation", $"data")
    // base scn = -1: key 0 exists in orders, so a 0 base would TIE with its %6
    // update's scn (0*10+0) and make the window order nondeterministic
    val base = Tables(s, dir, "orders")
      .select($"o_orderkey".cast("long").as("o_orderkey"),
        lit(-1L).as("scn"), lit("BASE").as("operation"),
        map(lit("O_ORDERSTATUS"), $"o_orderstatus",
          lit("O_ORDERPRIORITY"), $"o_orderpriority").as("data"))
    base.unionByName(env)
  }

  private def scd2Versions(s: SparkSession, dir: String): DataFrame =
    Scd2.versionFrame(scd2Input(s, dir), "o_orderkey", Scd2Cols)

  /** Column pairs every orders SCD2 build materializes. */
  private val Scd2Cols =
    Seq("o_orderstatus" -> "O_ORDERSTATUS", "o_orderpriority" -> "O_ORDERPRIORITY")

  /** Delta membership for `cdc_scd2_incremental`: the late ops (scn offset >= 3) of the
    * %13 key cohort — a per-key SUFFIX of the op sequence, the in-order daily-delta
    * contract (an op landing BEHIND an already-closed interval is restatement —
    * `cdc_scd2_restate`'s correction path — not maintenance). */
  private def scd2DeltaCond: Column =
    col("operation") =!= "BASE" && col("o_orderkey") % 13 === 0 && col("scn") % 10 >= 3

  /** Prior-frame FORMAT version for `cdc_scd2_incremental`'s fingerprint (ADVICE r17
    * #3): bump on any change to the scd2 derivation code or the persisted frame's
    * schema, so artifacts written by an older binary can never match and silently
    * serve. v2 = the r18 bump that introduced the token (v1 = the unversioned r17
    * artifacts, which v2 deliberately invalidates once). */
  private[engine] val Scd2PriorFormatVersion = "scd2prior-v2"

  /** Where the incremental-SCD2 query persists (and re-reads) the prior version frame —
    * in production, yesterday's history table; the parquet round-trip makes the fold
    * start from a real persisted artifact, which is also what Scd2IncrBench times. */
  private[engine] def scd2PriorPath(dir: String): String =
    new java.io.File("target/graft_scd2_prior/" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")).getAbsolutePath

  /** Fold a delta of committed envelope ops onto a persisted SCD2 version frame,
    * touching only affected keys: the frame keeps its INPUT columns (key, scn,
    * operation, data) precisely so maintenance can re-derive per-version state without
    * replaying raw history — affected keys' rows re-enter [[Scd2.versionFrame]] with
    * the delta appended and re-window as a cohort; untouched keys pass through
    * byte-identically via an anti-join. The delta key set is broadcast (a daily delta
    * is small against a 100 TB dimension history), so the persisted frame never
    * shuffles; the window sort runs over delta keys' rows only. Equality with the full
    * rebuild is definitional (versionFrame is per-key), which is why the query shares
    * `cdc_scd2_history`'s oracle verbatim. */
  private[engine] def scd2IncrementalFold(prior: DataFrame, delta: DataFrame,
      cols: Seq[(String, String)] = Scd2Cols): DataFrame = {
    val affected = delta.select(col("o_orderkey")).distinct()
    val untouched = prior.join(broadcast(affected), Seq("o_orderkey"), "left_anti")
    untouched.unionByName(
      scd2CohortRebuild(prior, delta, cols).select(untouched.columns.map(col).toSeq: _*))
  }

  /** The fold's REWRITE branch alone — the rows a merge-on-read history table would
    * physically write for the day's delta (untouched keys stay as-is on disk; the
    * logical pass-through union above exists for the whole-table equality gate).
    * [[Scd2IncrBench]] times this separately: it is the production write cost. */
  private[engine] def scd2CohortRebuild(prior: DataFrame, delta: DataFrame,
      cols: Seq[(String, String)] = Scd2Cols): DataFrame = {
    val inCols = Seq("o_orderkey", "scn", "operation", "data").map(col)
    val affected = delta.select(col("o_orderkey")).distinct()
    Scd2.versionFrame(
      prior.join(broadcast(affected), Seq("o_orderkey"), "left_semi").select(inCols: _*)
        .unionByName(delta.select(inCols: _*)),
      "o_orderkey", cols)
  }

  /** [[Scd2IncrBench]]'s inputs: the prior version frame (pre-persist) and the delta
    * op slice, split by the same scd2DeltaCond the registered query uses. */
  private[engine] def scd2IncrBenchInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val in = scd2Input(s, dir)
    (Scd2.versionFrame(in.filter(!scd2DeltaCond), "o_orderkey", Scd2Cols),
      in.filter(scd2DeltaCond))
  }

  /** The full whole-table version frame, for [[Scd2IncrBench]]'s displaced-cost timing
    * and equality gate. */
  private[engine] def scd2FullVersions(s: SparkSession, dir: String): DataFrame =
    scd2Versions(s, dir)

  /** The shared history projection of `cdc_scd2_history`/`_incremental`: delete markers
    * close intervals then vanish; surviving versions get per-key ordinals. */
  private def scd2HistoryProjection(vf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    vf.filter(col("operation") =!= RedoEvent.Delete)
      .select(col("o_orderkey"), col("scn").as("valid_from_scn"), col("valid_to_scn"),
        row_number().over(Window.partitionBy(col("o_orderkey")).orderBy(col("scn")))
          .cast("long").as("ver"),
        col("o_orderstatus"), col("o_orderpriority"),
        col("valid_to_scn").isNull.cast("int").as("is_current"))
      .orderBy(col("o_orderkey"), col("valid_from_scn"))
  }

  /** The e2e pipeline feed shared by cdc_pipeline_e2e and cdc_pipeline_restart — both
    * gate against the SAME oracle (the uninterrupted run's final state), so the feed is
    * structural (one builder), not two copies that can drift.
    *
    * Returns the parsed config and the wire batches: batch 1 = START + head/single INSERT
    * of every transaction (cut mid-transaction AND mid-CSF-run), batch 2 = the rest plus
    * at-least-once redeliveries of %5 keys' complete single INSERTs at their original
    * offsets (head fragments excluded — a real redelivery replays the whole run, and
    * duplicating only the head would corrupt run-splitting). */
  private def pipelineE2eFeed(s: org.apache.spark.sql.SparkSession, dir: String)
      : (CdcConfig, Seq[Seq[(Array[Byte], Array[Byte], Long)]]) = {
    import s.implicits._
    import org.apache.spark.sql.Encoders
    // config arrives as the reference's property map (A26 parse surface in the gated
    // path, not just in its spec); NoTimeout posture for the drained-batch harness
    val cfg = CdcConfig.fromMap(Map(
      "db.name.alias" -> "DB1", "table.whitelist" -> "GRAFT.*",
      // explicit: fromMap's reference-parity default is FALSE, while this pipeline has
      // always run the unescaping posture — never flip semantics via an implicit default
      "map.unescaped.strings" -> "true"))
      .copy(abandonedTxnTimeout = None)
    val script: Seq[RedoEvent] = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus")
      // %8 subsample: this is the WIRING/parity gate (throughput is cdc_txn_reconstruct);
      // MemoryStream encodes the feed on the driver, so the harness would otherwise
      // dominate the bench
      .filter($"o_orderkey" % 8 === 0)
      .as[(Long, String)].collect().toSeq
      .flatMap { case (k, st) =>
        val redo = s"""insert into "GRAFT"."ORDERS"("O_ORDERKEY","O_ORDERSTATUS") values ($k,'$st')"""
        def ev(off: Long, scn: Long, op: String, sql: String = "") =
          RedoEvent(scn = scn, commitScn = 0L, xid = s"tx$k", rowId = f"R$k%012d",
            operation = op, timestamp = new java.sql.Timestamp(0L), commitTimestamp = None,
            segOwner = "GRAFT", tableName = "ORDERS", sqlRedo = sql, csf = false,
            rollback = false, info = "", rbasqn = 1L, seq = k * 10 + off)
        val insert =
          if (k % 3 == 0) { // CSF split: fragments share (xid, scn, rowId), head csf=true
            val cut = redo.length / 2
            Seq(ev(1, k * 10 + 1, RedoEvent.Insert, redo.substring(0, cut)).copy(csf = true),
              ev(2, k * 10 + 1, RedoEvent.Insert, redo.substring(cut)))
          } else Seq(ev(1, k * 10 + 1, RedoEvent.Insert, redo))
        val noise =
          if (k % 7 == 0)
            Seq(ev(3, k * 10 + 3, RedoEvent.Insert, "insert into t values (1)")
              .copy(segOwner = "SYS", tableName = "T"))
          else Nil
        (ev(0, k * 10, RedoEvent.Start) +: insert) ++ noise :+ ev(6, k * 10 + 6, RedoEvent.Commit)
      }
    val wire = graft.sources.RedoEventSource
      .toKafkaValue(s.createDataset(script)(Encoders.product[RedoEvent]))
      .as[(Array[Byte], Array[Byte], Long)].collect().toSeq
    // cut mid-transaction AND mid-CSF-run: seq%10 <= 1 is START + head/single INSERT
    val (b1, b2) = wire.partition(_._3 % 10 <= 1)
    val dups = wire.filter(w => w._3 % 10 == 1 && (w._3 / 10) % 5 == 0 && (w._3 / 10) % 3 != 0)
    (cfg, Seq(b1, b2 ++ dups))
  }

  /** The merge script's final state — shared by cdc_apply_merge, _folded and _dict:
    * the three queries' whole premise is gating against the IDENTICAL final state, so the
    * identity is structural (one string), not three copies that can drift. */
  private val applyMergeOracleSql =
      """WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus, o_orderpriority
        |              FROM orders),
        |surv AS (
        |  SELECT k AS o_orderkey,
        |    CASE WHEN k % 9 = 0 THEN 'Y' WHEN k % 3 = 0 THEN 'Z'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN k % 9 = 0 THEN '9-PRIO' WHEN k % 6 = 0 THEN NULL
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM base WHERE k % 10 <> 0),
        |ins AS (
        |  SELECT k + 10000000 AS o_orderkey,
        |    CASE WHEN k % 8 = 0 THEN 'M' ELSE 'N' END AS o_orderstatus,
        |    'NEW' AS o_orderpriority
        |  FROM base WHERE k % 4 = 0)
        |SELECT * FROM surv UNION ALL SELECT * FROM ins ORDER BY o_orderkey""".stripMargin

  /** The merge script's FULL version history, recomputed with plain arithmetic: base
    * version + one row per surviving envelope op, analytic per-version state (the %6
    * NULL carries into the %3 'Z' version; the %9 double-update resets both columns)
    * and lead-closed intervals (delete markers close the last version, then vanish).
    * Shared VERBATIM by `cdc_scd2_history` and `cdc_scd2_incremental` — the incremental
    * fold's correctness claim is exact equality with the full rebuild. */
  private lazy val scd2HistoryOracleSql =
    """WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus AS st0,
      |                     o_orderpriority AS pr0 FROM orders),
      |v AS (
      |  SELECT k AS key, cast(-1 AS BIGINT) AS scn, 'V' AS kind, st0 AS st, pr0 AS pr FROM base
      |  UNION ALL
      |  SELECT k, k*10+0, 'V', st0, NULL FROM base WHERE k % 6 = 0
      |  UNION ALL
      |  SELECT k, k*10+1, 'V', 'Z', CASE WHEN k % 6 = 0 THEN NULL ELSE pr0 END
      |  FROM base WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k, k*10+3, 'V', 'Y', '9-PRIO' FROM base WHERE k % 9 = 0
      |  UNION ALL
      |  SELECT k, k*10+5, 'D', NULL, NULL FROM base WHERE k % 10 = 0
      |  UNION ALL
      |  SELECT k+10000000, k*10+2, 'V', 'N', 'NEW' FROM base WHERE k % 4 = 0
      |  UNION ALL
      |  SELECT k+10000000, k*10+4, 'V', 'M', 'NEW' FROM base WHERE k % 8 = 0
      |),
      |w AS (SELECT key, scn, kind, st, pr,
      |        lead(scn) OVER (PARTITION BY key ORDER BY scn) AS valid_to
      |      FROM v)
      |SELECT key AS o_orderkey, scn AS valid_from_scn, valid_to AS valid_to_scn,
      |  row_number() OVER (PARTITION BY key ORDER BY scn) AS ver,
      |  st AS o_orderstatus, pr AS o_orderpriority,
      |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM w WHERE kind = 'V'
      |ORDER BY o_orderkey, valid_from_scn""".stripMargin

  val oracle: Map[String, String] = Map(
    "cdc_parse_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "cdc_csf_fuse" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "cdc_txn_reconstruct" ->
      """SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        | cast(count(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderkey % 10 <> 0
        |GROUP BY 1 ORDER BY status""".stripMargin,
    "cdc_txn_reconstruct_stream" ->
      """SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        | cast(count(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderkey % 4 = 0
        |GROUP BY 1 ORDER BY status""".stripMargin,
    "cdc_wire_roundtrip" ->
      """WITH n AS (SELECT cast(n_nationkey AS BIGINT) AS k, n_name, n_regionkey FROM nation)
        |SELECT k AS scn, k + 1 AS commit_scn,
        | 'tx' || k AS xid,
        | 'R' || lpad(cast(k AS VARCHAR), 6, '0') AS row_id,
        | k * 1000 AS ts_ms, k * 2000 AS commit_ts_ms,
        | 'GRAFT' AS seg_owner, 'NATION' AS table_name,
        | 'insert into "GRAFT"."NATION"("N_NATIONKEY","N_NAME","N_REGIONKEY") values ('
        |   || k || ',''' || n_name || ''',' || n_regionkey || ')' AS sql_redo,
        | cast(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS INTEGER) AS rb,
        | k % 3 AS rbasqn, k AS seq
        |FROM n ORDER BY scn""".stripMargin,
    "cdc_offset_skip" ->
      """WITH t AS (SELECT o_orderkey % 100 AS scn, o_orderkey % 7 AS commitScn,
        |                  'R' || (o_orderkey % 5) AS rowId FROM orders)
        |SELECT scn, cast(count(*) AS BIGINT) AS cnt FROM t
        |WHERE scn > 50 OR (scn = 50 AND commitScn > 3)
        |   OR (scn = 50 AND commitScn = 3 AND rowId > 'R2')
        |GROUP BY scn ORDER BY scn""".stripMargin,
    "cdc_dead_letters" ->
      """SELECT p_partkey AS scn, 'garbage ' || p_partkey AS sql_redo
        |FROM part WHERE p_partkey % 3 = 0 ORDER BY scn""".stripMargin,
    // survivors keep ALL their rows (1 + k%13 ≤ 8); overflowing txns (k%13 ≥ 8) vanish
    // whole and are counted — never emitted truncated
    "cdc_txn_overflow" ->
      """WITH k AS (SELECT cast(o_orderkey AS BIGINT) AS k FROM orders),
        |surv AS (SELECT 1 + k % 13 AS txn_rows, cast(count(*) AS BIGINT) AS txn_cnt
        |         FROM k WHERE k % 13 < 8 GROUP BY 1),
        |drp AS (SELECT cast(-1 AS BIGINT) AS txn_rows, cast(count(*) AS BIGINT) AS txn_cnt
        |        FROM k WHERE k % 13 >= 8)
        |SELECT * FROM drp UNION ALL SELECT * FROM surv ORDER BY txn_rows""".stripMargin,
    // committed = %3 keys of the %4 universe (2 surviving DML each); abandoned = the rest,
    // evicted by the watermark-clock timeout with their 2 buffered rows reported
    "cdc_txn_timeout" ->
      """WITH keys AS (SELECT cast(o_orderkey AS BIGINT) AS k FROM orders
        |              WHERE o_orderkey % 4 = 0)
        |SELECT 'abandoned' AS kind, cast(2 * count(*) AS BIGINT) AS dml_rows,
        |       cast(count(*) AS BIGINT) AS txns FROM keys WHERE k % 3 <> 0
        |UNION ALL
        |SELECT 'committed' AS kind, cast(2 * count(*) AS BIGINT) AS dml_rows,
        |       cast(count(*) AS BIGINT) AS txns FROM keys WHERE k % 3 = 0
        |ORDER BY kind""".stripMargin,
    "cdc_seq_gaps" ->
      """WITH s AS (SELECT DISTINCT event_id AS rbasqn FROM events
        |           WHERE event_id % 7 <> 0 AND event_id % 11 <> 0),
        |l AS (SELECT rbasqn, lag(rbasqn) OVER (ORDER BY rbasqn) AS prev FROM s)
        |SELECT prev AS last_seen, rbasqn AS next_seen, rbasqn - prev - 1 AS missing_cnt
        |FROM l WHERE prev IS NOT NULL AND rbasqn - prev > 1 ORDER BY last_seen""".stripMargin,
    "cdc_heartbeat" ->
      """SELECT c_custkey AS scn,
        | '2024-01-01 00:00:' || lpad(cast(c_custkey % 60 AS VARCHAR), 2, '0') AS heartbeat_time
        |FROM customer WHERE c_custkey % 3 = 0 ORDER BY scn""".stripMargin,
    "cdc_filters_routing" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 11 = 0 THEN 'DDL' WHEN event_id % 11 = 1 THEN 'UPDATE'
        |       WHEN event_id % 11 IN (2,3) THEN 'DELETE' ELSE 'INSERT' END AS operation,
        |  CASE WHEN event_id % 13 = 0 THEN 'INTERNAL DDL some internal op' ELSE '' END AS info,
        |  CASE WHEN event_id % 17 = 0 THEN 'alter ... temporary tables ...'
        |       ELSE 'insert into t values (1)' END AS sql_redo,
        |  CASE WHEN event_id % 2 = 0 THEN 'APP' ELSE 'OTHER' END AS seg_owner,
        |  CASE WHEN event_id % 19 = 0 THEN 'BAD NAME!'
        |       ELSE 'T' || cast(event_id % 5 AS VARCHAR) END AS table_name
        | FROM events)
        |SELECT operation,
        |  upper('DB1.' || seg_owner || '.' ||
        |        CASE WHEN operation = 'DDL' THEN '_GENERIC_DDL' ELSE table_name END) AS topic,
        |  cast(count(*) AS BIGINT) AS cnt
        |FROM e
        |WHERE sql_redo NOT LIKE '%temporary tables%'
        |  AND NOT (operation = 'DDL' AND info LIKE 'INTERNAL DDL%')
        |  AND regexp_full_match(table_name, '[\w.-]+')
        |  AND ((seg_owner = 'APP' AND table_name IN ('T0','T1','T2')) OR seg_owner = 'OTHER')
        |  AND NOT (seg_owner = 'OTHER' AND table_name = 'T3')
        |  AND operation IN ('INSERT','UPDATE','DDL')
        |GROUP BY 1, 2 ORDER BY operation, topic""".stripMargin,
    // every whitelisted transaction commits exactly one INSERT per key: noise filtered,
    // CSF fused (an unfused statement would not parse → null status), redelivery deduped
    "cdc_pipeline_e2e" ->
      """SELECT o_orderstatus AS status, cast(count(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderkey % 8 = 0
        |GROUP BY 1 ORDER BY status""".stripMargin,
    // the stop/drain/restart run must land on the SAME final state as the uninterrupted
    // cdc_pipeline_e2e — checkpoint recovery changes nothing observable
    "cdc_pipeline_restart" ->
      """SELECT o_orderstatus AS status, cast(count(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderkey % 8 = 0
        |GROUP BY 1 ORDER BY status""".stripMargin,
    // the merge-script outcome restricted to the %7 keys the stream feeds; all other
    // snapshot keys pass through untouched
    "cdc_apply_merge_stream" ->
      """WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus, o_orderpriority
        |              FROM orders),
        |surv AS (
        |  SELECT k AS o_orderkey,
        |    CASE WHEN k % 7 = 0 AND k % 9 = 0 THEN 'Y'
        |         WHEN k % 7 = 0 AND k % 3 = 0 THEN 'Z'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN k % 7 = 0 AND k % 9 = 0 THEN '9-PRIO'
        |         WHEN k % 7 = 0 AND k % 6 = 0 THEN NULL
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM base WHERE NOT (k % 7 = 0 AND k % 10 = 0)),
        |ins AS (
        |  SELECT k + 10000000 AS o_orderkey,
        |    CASE WHEN k % 8 = 0 THEN 'M' ELSE 'N' END AS o_orderstatus,
        |    'NEW' AS o_orderpriority
        |  FROM base WHERE k % 7 = 0 AND k % 4 = 0)
        |SELECT * FROM surv UNION ALL SELECT * FROM ins ORDER BY o_orderkey""".stripMargin,
    // same final state as cdc_apply_merge — the fold plan must change nothing
    "cdc_apply_merge_folded" -> applyMergeOracleSql,
    "cdc_apply_merge_prefold" -> applyMergeOracleSql,
    "cdc_apply_merge_multitable" ->
      """WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus, o_orderpriority
        |              FROM orders),
        |surv AS (
        |  SELECT k AS o_orderkey,
        |    CASE WHEN k % 9 = 0 THEN 'Y' WHEN k % 3 = 0 THEN 'Z'
        |         ELSE o_orderstatus END AS o_orderstatus
        |  FROM base WHERE k % 10 <> 0),
        |ins AS (
        |  SELECT k + 10000000 AS o_orderkey,
        |    CASE WHEN k % 8 = 0 THEN 'M' ELSE 'N' END AS o_orderstatus
        |  FROM base WHERE k % 4 = 0),
        |ofin AS (SELECT * FROM surv UNION ALL SELECT * FROM ins),
        |cbase AS (SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment FROM customer),
        |csurv AS (SELECT k AS c_custkey,
        |    CASE WHEN k % 5 = 0 THEN 'LLMSEG' ELSE c_mktsegment END AS c_mktsegment
        |  FROM cbase WHERE k % 7 <> 0),
        |cins AS (SELECT k + 20000000 AS c_custkey, 'NEWSEG' AS c_mktsegment
        |  FROM cbase WHERE k % 11 = 0),
        |cfin AS (SELECT * FROM csurv UNION ALL SELECT * FROM cins)
        |SELECT 'CUSTOMER' AS tbl, cast(count(*) AS BIGINT) AS n_rows,
        |  min(c_custkey) AS min_key, max(c_custkey) AS max_key,
        |  cast(count(DISTINCT c_mktsegment) AS BIGINT) AS n_vals FROM cfin
        |UNION ALL
        |SELECT 'ORDERS' AS tbl, cast(count(*) AS BIGINT) AS n_rows,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  cast(count(DISTINCT o_orderstatus) AS BIGINT) AS n_vals FROM ofin
        |ORDER BY tbl""".stripMargin,
    // same final state as cdc_apply_merge — the dictionary path must change nothing
    "cdc_apply_merge_dict" -> applyMergeOracleSql,
    "cdc_apply_merge" -> applyMergeOracleSql,
    "cdc_resume_ladder" ->
      """WITH t AS (SELECT cast(o_orderkey % 100 AS BIGINT) AS scn,
        |                  cast(o_orderkey % 7 AS BIGINT) AS cs,
        |                  'R' || (o_orderkey % 5) AS rid,
        |                  cast(o_orderkey % 1000 AS BIGINT) AS seq FROM orders),
        |tip AS (SELECT max(scn) - 29 AS cur FROM t)
        |SELECT * FROM (
        |  SELECT '0_stored_seq' AS resume_case, cast(count(*) AS BIGINT) AS cnt,
        |         min(scn) AS min_scn FROM t WHERE seq > 800
        |  UNION ALL
        |  SELECT '1_stored_offset' AS resume_case, cast(count(*) AS BIGINT) AS cnt,
        |         min(scn) AS min_scn FROM t
        |  WHERE scn > 50 OR (scn = 50 AND cs > 3) OR (scn = 50 AND cs = 3 AND rid > 'R2')
        |  UNION ALL
        |  SELECT '2_start_scn_override', cast(count(*) AS BIGINT), min(scn) FROM t WHERE scn >= 60
        |  UNION ALL
        |  SELECT '3_reset_offset', cast(count(*) AS BIGINT), min(scn) FROM t
        |  WHERE scn >= (SELECT cur FROM tip)
        |  UNION ALL
        |  SELECT '4_fresh_from_tip', cast(count(*) AS BIGINT), min(scn) FROM t
        |  WHERE scn >= (SELECT cur FROM tip)
        |  UNION ALL
        |  SELECT '5_cm_exclusive', cast(count(*) AS BIGINT), min(scn) FROM t WHERE scn > 60
        |) ORDER BY resume_case""".stripMargin,
    "cdc_schema_evolution" ->
      """WITH k AS (SELECT cast(s_suppkey AS INTEGER) AS k, s_name FROM supplier)
        |SELECT 'INSERT' AS operation, k AS s_suppkey, s_name,
        |       cast(NULL AS SMALLINT) AS s_tier FROM k
        |UNION ALL
        |SELECT 'UPDATE', k, NULL, cast(k % 5 AS SMALLINT) FROM k WHERE k % 2 = 0
        |ORDER BY s_suppkey, operation""".stripMargin,
    "cdc_status_feed" ->
      """WITH c AS (SELECT cast(count(*) AS BIGINT) AS total FROM customer WHERE c_custkey % 4 = 0)
        |SELECT * FROM (
        |  SELECT 'PROGRESS' AS status_event, cast(2 AS BIGINT) AS cnt, total AS input_rows FROM c
        |  UNION ALL SELECT 'RUNNING', cast(1 AS BIGINT), cast(0 AS BIGINT) FROM c
        |  UNION ALL SELECT 'STOPPED', cast(1 AS BIGINT), cast(0 AS BIGINT) FROM c
        |) ORDER BY status_event""".stripMargin,
    "cdc_envelope" ->
      """WITH c AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'DELETE' WHEN c_custkey % 4 = 1 THEN 'INSERT'
        |       WHEN c_custkey % 4 = 2 THEN 'UPDATE' ELSE 'DDL' END AS operation FROM customer)
        |SELECT operation,
        |  CASE WHEN operation = 'DDL' THEN 'DB1.GRAFT._GENERIC_DDL' ELSE 'DB1.GRAFT.CUSTOMER' END AS topic,
        |  cast(count(*) AS BIGINT) AS cnt,
        |  cast(sum(CASE WHEN operation IN ('DELETE','DDL') THEN 1 ELSE 0 END) AS BIGINT) AS null_data_cnt,
        |  cast(sum(CASE WHEN operation IN ('INSERT','DDL') THEN 1 ELSE 0 END) AS BIGINT) AS null_before_cnt
        |FROM c GROUP BY 1, 2 ORDER BY operation""".stripMargin,
    "cdc_scd2_history" -> scd2HistoryOracleSql,
    // the incremental fold is DEFINED by producing exactly the full rebuild's answer
    // (versionFrame is per-key, so a per-cohort rebuild from full per-key input equals
    // the whole-table rebuild) — same oracle, verbatim
    "cdc_scd2_incremental" -> scd2HistoryOracleSql,
    // both tables' final states recomputed with CASE arithmetic AT THE SAME CUT: an op
    // applies iff its scn (key*10+off) is at or below the shared cut — the consistency
    // claim is that no per-table arithmetic ever reads a different cut
    "cdc_asof_multitable" ->
      s"""WITH ob AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus, o_orderpriority
         |            FROM orders),
         |cb AS (SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment FROM customer),
         |osurv AS (
         |  SELECT k AS key,
         |    CASE WHEN k % 9 = 0 AND k*10+3 <= $AsOfMultiCut THEN 'Y'
         |         WHEN k % 3 = 0 AND k*10+1 <= $AsOfMultiCut THEN 'Z'
         |         ELSE o_orderstatus END AS v1,
         |    CASE WHEN k % 9 = 0 AND k*10+3 <= $AsOfMultiCut THEN '9-PRIO'
         |         WHEN k % 6 = 0 AND k*10 <= $AsOfMultiCut THEN NULL
         |         ELSE o_orderpriority END AS v2
         |  FROM ob WHERE NOT (k % 10 = 0 AND k*10+5 <= $AsOfMultiCut)),
         |oins AS (
         |  SELECT k + 10000000 AS key,
         |    CASE WHEN k % 8 = 0 AND k*10+4 <= $AsOfMultiCut THEN 'M' ELSE 'N' END AS v1,
         |    'NEW' AS v2
         |  FROM ob WHERE k % 4 = 0 AND k*10+2 <= $AsOfMultiCut),
         |csurv AS (
         |  SELECT k AS key,
         |    CASE WHEN k % 5 = 0 AND k*10 <= $AsOfMultiCut THEN 'LLMSEG'
         |         ELSE c_mktsegment END AS v1
         |  FROM cb WHERE NOT (k % 7 = 0 AND k*10+1 <= $AsOfMultiCut)),
         |cins AS (SELECT k + 20000000 AS key, 'NEWSEG' AS v1 FROM cb
         |         WHERE k % 11 = 0 AND k*10+2 <= $AsOfMultiCut)
         |SELECT 'ORDERS' AS tbl, key, v1, v2 FROM osurv
         |UNION ALL SELECT 'ORDERS', key, v1, v2 FROM oins
         |UNION ALL SELECT 'CUSTOMER', key, v1, CAST(NULL AS VARCHAR) FROM csurv
         |UNION ALL SELECT 'CUSTOMER', key, v1, CAST(NULL AS VARCHAR) FROM cins
         |ORDER BY tbl, key""".stripMargin,
    // the history arithmetic plus the late %11 'L' row at scn k*10+2: its state carries
    // the priority as of off 1 (NULL if the %6 explicit-null fired, else base), later
    // versions shift ordinals — lead()/row_number() over the scn-sorted set restate
    // automatically, which is exactly what the gate pins
    "cdc_scd2_restate" ->
      """WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus AS st0,
        |                     o_orderpriority AS pr0 FROM orders),
        |v AS (
        |  SELECT k AS key, cast(-1 AS BIGINT) AS scn, 'V' AS kind, st0 AS st, pr0 AS pr FROM base
        |  UNION ALL
        |  SELECT k, k*10+0, 'V', st0, NULL FROM base WHERE k % 6 = 0
        |  UNION ALL
        |  SELECT k, k*10+1, 'V', 'Z', CASE WHEN k % 6 = 0 THEN NULL ELSE pr0 END
        |  FROM base WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, k*10+2, 'V', 'L', CASE WHEN k % 6 = 0 THEN NULL ELSE pr0 END
        |  FROM base WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT k, k*10+3, 'V', 'Y', '9-PRIO' FROM base WHERE k % 9 = 0
        |  UNION ALL
        |  SELECT k, k*10+5, 'D', NULL, NULL FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k+10000000, k*10+2, 'V', 'N', 'NEW' FROM base WHERE k % 4 = 0
        |  UNION ALL
        |  SELECT k+10000000, k*10+4, 'V', 'M', 'NEW' FROM base WHERE k % 8 = 0
        |),
        |w AS (SELECT key, scn, kind, st, pr,
        |        lead(scn) OVER (PARTITION BY key ORDER BY scn) AS valid_to
        |      FROM v)
        |SELECT key AS o_orderkey, scn AS valid_from_scn, valid_to AS valid_to_scn,
        |  row_number() OVER (PARTITION BY key ORDER BY scn) AS ver,
        |  st AS o_orderstatus, pr AS o_orderpriority,
        |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM w WHERE kind = 'V'
        |ORDER BY o_orderkey, valid_from_scn""".stripMargin,
    // per-site last scn from the script arithmetic: a key's highest off is 5 (delete,
    // %10), else 4/%8-insert-update... the envelope's per-key max scn is key*10 + the
    // largest matching off; inserted keys (k+10M) belong to their own key space
    "cdc_conflict_detect" ->
      s"""WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k FROM orders),
         |offs AS (
         |  SELECT k, 0 AS off FROM base WHERE k % 6 = 0
         |  UNION ALL SELECT k, 1 FROM base WHERE k % 3 = 0
         |  UNION ALL SELECT k, 3 FROM base WHERE k % 9 = 0
         |  UNION ALL SELECT k, 5 FROM base WHERE k % 10 = 0
         |),
         |ins AS (
         |  SELECT k, k + 10000000 AS key, 2 AS off FROM base WHERE k % 4 = 0
         |  UNION ALL SELECT k, k + 10000000, 4 FROM base WHERE k % 8 = 0
         |),
         |allops AS (
         |  SELECT k AS src, k AS key, off FROM offs
         |  UNION ALL SELECT k, key, off FROM ins
         |),
         |a AS (SELECT key AS o_orderkey, max(src*10 + off) AS a_last_scn
         |      FROM allops WHERE src % 2 = 0 GROUP BY key),
         |b AS (SELECT key AS o_orderkey, max(src*10 + off) + 5 AS b_last_scn
         |      FROM allops WHERE src % 3 = 0 GROUP BY key)
         |SELECT a.o_orderkey, a.a_last_scn, b.b_last_scn,
         |  CASE WHEN a.a_last_scn >= b.b_last_scn THEN 'A' ELSE 'B' END AS winner
         |FROM a JOIN b ON a.o_orderkey = b.o_orderkey
         |ORDER BY a.o_orderkey""".stripMargin,
    // the %7 slice's version intervals with NULL-until-set changelog states: status is
    // set by off1 ('Z') and off3 ('Y'); priority ONLY by off3 ('9-PRIO') or the insert
    // ('NEW'); the off0 explicit-NULL and never-seen both read as NULL
    "cdc_scd2_stream" ->
      """WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k FROM orders
        |              WHERE o_orderkey % 7 = 0),
        |v AS (
        |  SELECT k AS key, k*10+0 AS scn, 'V' AS kind,
        |         CAST(NULL AS VARCHAR) AS st, CAST(NULL AS VARCHAR) AS pr
        |  FROM base WHERE k % 6 = 0
        |  UNION ALL
        |  SELECT k, k*10+1, 'V', 'Z', NULL FROM base WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, k*10+3, 'V', 'Y', '9-PRIO' FROM base WHERE k % 9 = 0
        |  UNION ALL
        |  SELECT k, k*10+5, 'D', NULL, NULL FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k+10000000, k*10+2, 'V', 'N', 'NEW' FROM base WHERE k % 4 = 0
        |  UNION ALL
        |  SELECT k+10000000, k*10+4, 'V', 'M', 'NEW' FROM base WHERE k % 8 = 0
        |),
        |w AS (SELECT key, scn, kind, st, pr,
        |        lead(scn) OVER (PARTITION BY key ORDER BY scn) AS valid_to
        |      FROM v)
        |SELECT key AS o_orderkey, scn AS valid_from_scn, valid_to AS valid_to_scn,
        |  st AS o_orderstatus, pr AS o_orderpriority,
        |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
        |FROM w WHERE kind = 'V'
        |ORDER BY o_orderkey, valid_from_scn""".stripMargin,
    // the same version list cut at the as-of scn; newest surviving record per key wins,
    // keys whose newest record is the delete marker vanish
    "cdc_asof_snapshot" ->
      s"""WITH base AS (SELECT cast(o_orderkey AS BIGINT) AS k, o_orderstatus AS st0,
         |                     o_orderpriority AS pr0 FROM orders),
         |v AS (
         |  SELECT k AS key, cast(-1 AS BIGINT) AS scn, 'V' AS kind, st0 AS st, pr0 AS pr FROM base
         |  UNION ALL
         |  SELECT k, k*10+0, 'V', st0, NULL FROM base WHERE k % 6 = 0
         |  UNION ALL
         |  SELECT k, k*10+1, 'V', 'Z', CASE WHEN k % 6 = 0 THEN NULL ELSE pr0 END
         |  FROM base WHERE k % 3 = 0
         |  UNION ALL
         |  SELECT k, k*10+3, 'V', 'Y', '9-PRIO' FROM base WHERE k % 9 = 0
         |  UNION ALL
         |  SELECT k, k*10+5, 'D', NULL, NULL FROM base WHERE k % 10 = 0
         |  UNION ALL
         |  SELECT k+10000000, k*10+2, 'V', 'N', 'NEW' FROM base WHERE k % 4 = 0
         |  UNION ALL
         |  SELECT k+10000000, k*10+4, 'V', 'M', 'NEW' FROM base WHERE k % 8 = 0
         |),
         |sel AS (SELECT key, scn, kind, st, pr,
         |          row_number() OVER (PARTITION BY key ORDER BY scn DESC) AS rn
         |        FROM v WHERE scn <= 75000)
         |SELECT key AS o_orderkey, st AS o_orderstatus, pr AS o_orderpriority
         |FROM sel WHERE rn = 1 AND kind = 'V'
         |ORDER BY o_orderkey""".stripMargin,
  )
}
