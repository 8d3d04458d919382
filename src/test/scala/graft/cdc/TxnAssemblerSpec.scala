package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** A19/A20 state machine semantics (LogMinerThread2.java:158-298). */
class TxnAssemblerSpec extends AnyFunSuite {

  private def dml(scn: Long, op: String = RedoEvent.Insert, rb: Boolean = false,
                  rowId: String = ""): RedoEvent =
    RedoEvent.simple(scn, "x1", op, sqlRedo = s"insert into T(ID) values ($scn)",
      rollback = rb, rowId = if (rowId.isEmpty) s"R$scn" else rowId)

  private def ctl(scn: Long, op: String): RedoEvent = RedoEvent.simple(scn, "x1", op)

  test("COMMIT emits buffered DML stamped with commitScn, in order (Thread:158-232)") {
    val (out, state) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty,
      Iterator(ctl(1, RedoEvent.Start), dml(2), dml(3), ctl(9, RedoEvent.Commit)))
    assert(out.map(_.scn) == List(2L, 3L))
    assert(out.forall(_.commitScn == 9L))
    assert(state.isEmpty)
  }

  test("ROLLBACK discards the buffer (Thread:234-239)") {
    val (out, state) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty,
      Iterator(ctl(1, RedoEvent.Start), dml(2), ctl(3, RedoEvent.Rollback)))
    assert(out.isEmpty && state.isEmpty)
  }

  test("orphan DML without START opens a buffer implicitly (Thread:292-297)") {
    val (out, state) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty,
      Iterator(dml(2), dml(3), ctl(4, RedoEvent.Commit)))
    assert(out.map(_.scn) == List(2L, 3L))
    assert(state.isEmpty)
  }

  test("open transaction carries state across calls (micro-batch boundary)") {
    val (out1, state1) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty,
      Iterator(ctl(1, RedoEvent.Start), dml(2)))
    assert(out1.isEmpty && state1.nonEmpty)
    val (out2, state2) = TxnAssembler.step(state1.get, Iterator(dml(3), ctl(4, RedoEvent.Commit)))
    assert(out2.map(_.scn) == List(2L, 3L) && state2.isEmpty)
  }

  test("DDL events buffer and emit at COMMIT like DML (Thread:247-249)") {
    val (out, _) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty,
      Iterator(ctl(1, RedoEvent.Start), dml(2), dml(3, RedoEvent.Ddl), ctl(4, RedoEvent.Commit)))
    assert(out.map(_.operation) == List("INSERT", "DDL"))
  }

  test("rollback row cancels the same-rowId predecessor, not an interleaved row") {
    // change A (rowId RA), change B (rowId RB), rollback of A (rowId RA):
    // positional pairing (the reference) would kill B; rowId pairing kills A.
    val events = Iterator(
      ctl(1, RedoEvent.Start),
      dml(2, rowId = "RA"), dml(3, rowId = "RB"), dml(4, rb = true, rowId = "RA"),
      ctl(5, RedoEvent.Commit))
    val (out, _) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty, events)
    assert(out.map(_.scn) == List(3L))
  }

  test("rollback row with unknown rowId falls back to nearest alive predecessor (Thread:163-185)") {
    val events = Iterator(
      ctl(1, RedoEvent.Start),
      dml(2, rowId = "RA"), dml(3, rb = true, rowId = "RZ"),
      ctl(4, RedoEvent.Commit))
    val (out, _) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty, events)
    assert(out.isEmpty)
  }

  test("leading rollback row does not throw (reference would: remove(-1))") {
    val events = Iterator(dml(2, rb = true), ctl(3, RedoEvent.Commit))
    val (out, _) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty, events)
    assert(out.isEmpty)
  }

  test("property: pair elimination model equivalence (1000 seeded interleavings)") {
    // Model: process rows left-to-right keeping a stack-like alive list; a rollback row
    // removes itself and its target (same rowId preferred, else nearest alive predecessor).
    def model(rows: List[RedoEvent]): List[RedoEvent] = {
      val alive = scala.collection.mutable.ListBuffer.empty[RedoEvent]
      rows.foreach { r =>
        if (r.rollback) {
          val idx = alive.lastIndexWhere(_.rowId == r.rowId) match {
            case -1 => alive.size - 1
            case i  => i
          }
          if (idx >= 0) alive.remove(idx)
        } else alive += r
      }
      alive.toList
    }
    val rnd = new Random(13)
    for (_ <- 1 to 1000) {
      val rows = (1 to rnd.nextInt(12)).map { i =>
        dml(i.toLong, rb = rnd.nextInt(4) == 0, rowId = s"R${rnd.nextInt(4)}")
      }.toList
      assert(TxnAssembler.eliminateRollbackPairs(rows).map(_.scn) == model(rows).map(_.scn),
        s"\nrows=${rows.map(r => (r.scn, r.rollback, r.rowId))}")
    }
  }

  test("same-SCN events keep redo order via seq (ADVICE: SCN collision)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // three updates share scn=5; seq carries the true order
    val events = Seq(
      RedoEvent.simple(1, "x1", RedoEvent.Start).copy(seq = 1),
      RedoEvent.simple(5, "x1", RedoEvent.Insert, sqlRedo = "a").copy(seq = 2, rowId = "R1"),
      RedoEvent.simple(5, "x1", RedoEvent.Update, sqlRedo = "b").copy(seq = 3, rowId = "R1"),
      RedoEvent.simple(5, "x1", RedoEvent.Update, sqlRedo = "c").copy(seq = 4, rowId = "R1"),
      RedoEvent.simple(9, "x1", RedoEvent.Commit).copy(seq = 5))
    val out = TxnAssembler.assembleBatch(events.toDS()).collect().toList.sortBy(_.scn)
    assert(out.map(_.sqlRedo) == List("a", "b", "c"))
  }

  test("assembleBatch overflow: oversized txn drops whole, droppedTxns == anti-join count") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // tx1: 3 rows (cap 2 → overflow, drop whole); tx2: 2 rows (at cap → survives intact)
    val e1 = Seq(ctl(1, RedoEvent.Start), dml(2), dml(3), dml(4), ctl(5, RedoEvent.Commit))
    val e2 = Seq(
      RedoEvent.simple(6, "x2", RedoEvent.Start),
      RedoEvent.simple(7, "x2", RedoEvent.Insert, sqlRedo = "a", rowId = "RA"),
      RedoEvent.simple(8, "x2", RedoEvent.Insert, sqlRedo = "b", rowId = "RB"),
      RedoEvent.simple(9, "x2", RedoEvent.Commit))
    val acc = spark.sparkContext.longAccumulator("droppedTxns")
    val out = TxnAssembler.assembleBatch((e1 ++ e2).toDS(), maxBufferedRows = 2,
      droppedTxns = Some(acc)).collect()
    // survivor set: x2 complete, x1 absent entirely (never truncated)
    assert(out.map(_.xid).toSet == Set("x2") && out.length == 2)
    // the accumulator reports the same count the declarative anti-join (cdc_txn_overflow's
    // dropped row) computes: input DML xids minus surviving xids
    val inputXids = (e1 ++ e2).filter(_.operation == RedoEvent.Insert).map(_.xid).toSet
    assert(acc.value == (inputXids -- out.map(_.xid).toSet).size.toLong)
    assert(acc.value == 1L)
  }

  test("overflow transition clears buffered rows (dead weight in the state store)") {
    // once past the cap the txn is guaranteed to drop whole at COMMIT, so the buffer must
    // not keep (or re-serialize into streaming state every micro-batch) the rows it will
    // never emit — the runaway-transaction memory the cap exists to bound
    val evs = Seq(ctl(1, RedoEvent.Start), dml(2), dml(3), dml(4))
    val (emitted, carry) = TxnAssembler.step(TxnAssembler.TxnBuffer.empty,
      evs.iterator, maxBufferedRows = 2)
    assert(emitted.isEmpty)
    val buf = carry.get
    assert(buf.overflowed && buf.started && buf.rows.isEmpty)
    // a later COMMIT still counts the drop exactly once
    var drops = 0
    val (out2, carry2) = TxnAssembler.step(buf,
      Seq(dml(5), ctl(6, RedoEvent.Commit)).iterator, maxBufferedRows = 2, () => drops += 1)
    assert(out2.isEmpty && carry2.isEmpty && drops == 1)
  }

  test("event-time eviction: abandoned buffers emit DLQ records when the watermark passes") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.Encoders
    def at(scn: Long, xid: String, op: String, tsMs: Long, redo: String = "") =
      RedoEvent.simple(scn, xid, op, sqlRedo = redo, rowId = s"R$scn")
        .copy(timestamp = new java.sql.Timestamp(tsMs), seq = scn)
    // x1 commits; x2 (2 DML) and x3 (1 DML) never see a terminal — the far-future COMMIT
    // for the unseen xid "wm" only advances the watermark past t0 + 1h
    val batch1 = Seq(
      at(1, "x1", RedoEvent.Start, 1000L), at(2, "x1", RedoEvent.Insert, 1000L, "a"),
      at(3, "x2", RedoEvent.Start, 2000L), at(4, "x2", RedoEvent.Insert, 2000L, "b"),
      at(5, "x2", RedoEvent.Update, 2000L, "c"),
      at(6, "x3", RedoEvent.Insert, 3000L, "d"))
    val batch2 = Seq(at(7, "x1", RedoEvent.Commit, 60000L))
    val batch3 = Seq(at(8, "wm", RedoEvent.Commit, 3600000L + 86400000L))
    val acc = spark.sparkContext.longAccumulator("abandoned")
    val out = graft.engine.StreamGate.runBatches(spark, Encoders.product[RedoEvent],
        "txn_evict_spec_sink", Seq(batch1, batch2, batch3)) { ds =>
      TxnAssembler.assembleStreamingEvicting(ds, watermarkDelay = "0 seconds",
        abandonTimeout = "1 hour", droppedTxns = Some(acc)).toDF()
    }.collect()
    val committed = out.filter(!_.isNullAt(0)).map(_.getStruct(0))
    val abandoned = out.filter(!_.isNullAt(1)).map(_.getStruct(1))
    assert(committed.map(_.getString(0)).toSet == Set("x1"), "only x1 committed")
    assert(abandoned.map(r => r.getString(0) -> r.getInt(1)).toSet ==
      Set("x2" -> 2, "x3" -> 1),
      "open buffers must surface as DLQ records with their buffered-row counts")
    assert(acc.value == 2L, "the monitoring accumulator counts each eviction once")
  }

  test("assembleBatch: multiple transactions, rollback txn dropped") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val e1 = Seq(ctl(1, RedoEvent.Start), dml(2), ctl(3, RedoEvent.Commit))
    val e2 = Seq(
      RedoEvent.simple(4, "x2", RedoEvent.Start),
      RedoEvent.simple(5, "x2", RedoEvent.Insert, sqlRedo = "x"),
      RedoEvent.simple(6, "x2", RedoEvent.Rollback))
    val out = TxnAssembler.assembleBatch((e1 ++ e2).toDS()).collect()
    assert(out.map(_.xid).toSet == Set("x1"))
    assert(out.length == 1 && out.head.scn == 2L)
  }
}
