package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based CDC ROUND-TRIP oracle (SURVEY §5 item 4; r7 verdict #4): generate random
 * DML programs against an in-memory source-of-truth table, render them as LogMiner-style
 * redo strings (the reference's literal forms: quoted identifiers, `''` escaping
 * Utils:286-292, `TIMESTAMP '…'` literals Utils:468, `IS NULL` before-images Utils:268),
 * push the rendered events through the FULL pipeline — CSF fusion, transaction assembly
 * with COMMIT/ROLLBACK and partial-rollback pair elimination, the native redo parser, the
 * envelope projection, and the native envelope-fold apply — and compare the resulting
 * replica against the model state. This exercises parser + assembler + fold JOINTLY: a
 * bug in any stage's composition (not just its isolated contract) diverges the replica.
 *
 * All ≥300 scenarios run in ONE Spark job: scenario `s` owns key band [s·100, s·100+7],
 * SCN band s·100000 and xids "s.t.1", so transactions never interfere and the whole
 * generated corpus flows through one assembly + one apply — the operators are exercised
 * at a realistic multi-transaction batch shape, not one micro-case at a time.
 *
 * The generation seed is LOGGED on every run; set GRAFT_ROUNDTRIP_SEED to reproduce a
 * failure exactly.
 */
class CdcRoundTripSpec extends AnyFunSuite {

  private val Scenarios = 300

  // ---- model -------------------------------------------------------------

  private final case class Row0(name: String, salCents: Long, cnt: Int, hired: String,
                                note: Option[String])
  private sealed trait Op
  private final case class Ins(id: Long, row: Row0) extends Op
  private final case class Upd(id: Long, before: Row0, after: Row0, sets: List[String]) extends Op
  private final case class Del(id: Long, before: Row0) extends Op
  /** pair=true: the op is emitted and immediately compensated with a rollback=1 partner
    * (same ROW_ID) — the assembler must eliminate BOTH (A20), so the model ignores it. */
  private final case class OpE(op: Op, pair: Boolean)
  private final case class Txn(withStart: Boolean, ops: List[OpE], commit: Boolean)
  private final case class Scenario(sid: Int, initial: Map[Long, Row0], txns: List[Txn],
                                    finalState: Map[Long, Row0])

  // ---- generators --------------------------------------------------------

  private val genName: Gen[String] = for {
    n  <- Gen.chooseNum(1, 14)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      // the hostile characters: quote (doubles to '' on the wire), double quote,
      // keyword-ish separators the tokenizer must keep inside the literal
      2 -> Gen.oneOf('\'', '"', ' ', ',', '(', ')', '=', '.', '-')))
  } yield cs.mkString

  private val genHired: Gen[String] = for {
    mo <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
    h  <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59); se <- Gen.chooseNum(0, 59)
  } yield f"2024-$mo%02d-$d%02d $h%02d:$mi%02d:$se%02d"

  private val genRow: Gen[Row0] = for {
    nm <- genName
    sal <- Gen.chooseNum(-99999L, 99999L) // rendered as a 2-decimal literal, incl. "-0.05"
    c  <- Gen.chooseNum(-1000, 1000)
    hd <- genHired
    nt <- Gen.option(genName) // None → NULL literal / IS NULL predicate / SET NULL
  } yield Row0(nm, sal, c, hd, nt)

  private def genUpd(id: Long, before: Row0): Gen[Upd] = for {
    row2 <- genRow
    cols <- Gen.atLeastOne(List("NAME", "SAL", "CNT", "HIRED", "NOTE"))
  } yield {
    val cs = cols.toList
    val after = before.copy(
      name     = if (cs.contains("NAME")) row2.name else before.name,
      salCents = if (cs.contains("SAL")) row2.salCents else before.salCents,
      cnt      = if (cs.contains("CNT")) row2.cnt else before.cnt,
      hired    = if (cs.contains("HIRED")) row2.hired else before.hired,
      note     = if (cs.contains("NOTE")) row2.note else before.note)
    Upd(id, before, after, cs)
  }

  private def genOps(pending: Map[Long, Row0], ids: Seq[Long], n: Int)
      : Gen[(List[OpE], Map[Long, Row0])] =
    if (n == 0) Gen.const((Nil, pending))
    else {
      val freeIds = ids.filterNot(pending.contains)
      val liveIds = pending.keys.toSeq.sorted
      val choices = List.newBuilder[(Int, Gen[Op])]
      if (freeIds.nonEmpty)
        choices += 4 -> (for { id <- Gen.oneOf(freeIds); r <- genRow } yield Ins(id, r): Op)
      if (liveIds.nonEmpty) {
        choices += 4 -> (for { id <- Gen.oneOf(liveIds); u <- genUpd(id, pending(id)) } yield u: Op)
        choices += 2 -> (for { id <- Gen.oneOf(liveIds) } yield Del(id, pending(id)): Op)
      }
      for {
        op   <- Gen.frequency(choices.result(): _*)
        pair <- Gen.frequency(4 -> false, 1 -> true)
        next = if (pair) pending
               else op match {
                 case Ins(id, r)       => pending + (id -> r)
                 case Upd(id, _, a, _) => pending + (id -> a)
                 case Del(id, _)       => pending - id
               }
        rest <- genOps(next, ids, n - 1)
      } yield (OpE(op, pair) :: rest._1, rest._2)
    }

  private def genTxns(state: Map[Long, Row0], ids: Seq[Long], n: Int)
      : Gen[(List[Txn], Map[Long, Row0])] =
    if (n == 0) Gen.const((Nil, state))
    else for {
      withStart <- Gen.frequency(9 -> true, 1 -> false) // orphan-DML path (Thread:292-297)
      nOps      <- Gen.chooseNum(1, 6)
      opsP      <- genOps(state, ids, nOps)
      commit    <- Gen.frequency(4 -> true, 1 -> false) // ROLLBACK drops whole txn
      newState = if (commit) opsP._2 else state
      rest <- genTxns(newState, ids, n - 1)
    } yield (Txn(withStart, opsP._1, commit) :: rest._1, rest._2)

  private def genScenario(sid: Int): Gen[Scenario] = {
    val ids = (0 until 8).map(i => sid * 100L + i)
    for {
      maybeRows <- Gen.listOfN(ids.size, Gen.option(genRow))
      initial = ids.zip(maybeRows).collect { case (id, Some(r)) => id -> r }.toMap
      nTxn <- Gen.chooseNum(1, 3)
      txns <- genTxns(initial, ids, nTxn)
    } yield Scenario(sid, initial, txns._1, txns._2)
  }

  private val genAll: Gen[List[Scenario]] =
    (0 until Scenarios).foldRight(Gen.const(List.empty[Scenario])) { (sid, acc) =>
      for { s <- genScenario(sid); rest <- acc } yield s :: rest
    }

  // ---- redo rendering (the reference's literal forms) --------------------

  private def escq(s: String) = s.replace("'", "''")
  private def lits(id: Long, r: Row0): List[(String, Option[String])] = List(
    "ID"    -> Some(id.toString),
    "NAME"  -> Some(s"'${escq(r.name)}'"),
    "SAL"   -> Some(java.math.BigDecimal.valueOf(r.salCents, 2).toPlainString),
    "CNT"   -> Some(r.cnt.toString),
    "HIRED" -> Some(s"TIMESTAMP '${r.hired}'"), // prefix stripped per Utils:467-469
    "NOTE"  -> r.note.map(v => s"'${escq(v)}'"))
  private def whereOf(id: Long, r: Row0): String =
    lits(id, r).map { case (c, v) =>
      v.fold(s""""$c" IS NULL""")(l => s""""$c" = $l""") // IS NULL rewrite input, Utils:268
    }.mkString(" where ", " and ", "")
  private def insertSql(id: Long, r: Row0): String = {
    val ls = lits(id, r)
    s"""insert into "GRAFT"."PROP"(${ls.map(c => s""""${c._1}"""").mkString(",")})""" +
      s""" values (${ls.map(_._2.getOrElse("NULL")).mkString(",")})"""
  }
  private def updateSql(id: Long, before: Row0, after: Row0, sets: List[String]): String = {
    val am = lits(id, after).toMap
    val setSql = sets.map(c => s""""$c" = ${am(c).getOrElse("NULL")}""").mkString(", ")
    s"""update "GRAFT"."PROP" set $setSql""" + whereOf(id, before)
  }
  private def deleteSql(id: Long, before: Row0): String =
    s"""delete from "GRAFT"."PROP"""" + whereOf(id, before)

  // ---- event stream rendering -------------------------------------------

  private def eventsOf(sc: Scenario): Vector[RedoEvent] = {
    val out = Vector.newBuilder[RedoEvent]
    var scn = sc.sid * 100000L
    var seq = sc.sid * 1000000L
    var rid = 0
    def nextScn(): Long = { scn += 1; scn }
    def nextSeq(): Long = { seq += 1; seq }
    def emit(xid: String, op: String, sql: String, rowId: String, rb: Boolean): Unit = {
      val s0 = nextScn()
      // deterministic CSF coverage: every 4th statement arrives split in 3 fragments
      // (mid-token splits included — exactly what the LogMiner cursor produces, A7)
      val fragments =
        if (!rb && s0 % 4 == 0 && sql.length > 6) {
          val t = sql.length / 3
          List(sql.substring(0, t), sql.substring(t, 2 * t), sql.substring(2 * t))
        } else List(sql)
      fragments.zipWithIndex.foreach { case (f, i) =>
        out += RedoEvent(s0, 0L, xid, rowId, op, new Timestamp(s0), None, "GRAFT", "PROP",
          f, csf = i < fragments.size - 1, rollback = rb, info = "", rbasqn = 1L,
          seq = nextSeq())
      }
    }
    def control(xid: String, op: String): Unit = {
      val s0 = nextScn()
      out += RedoEvent(s0, s0, xid, "", op, new Timestamp(s0), Some(new Timestamp(s0)),
        "", "", "", csf = false, rollback = false, info = "", rbasqn = 1L, seq = nextSeq())
    }
    sc.txns.zipWithIndex.foreach { case (t, ti) =>
      val xid = s"${sc.sid}.$ti.1"
      if (t.withStart) control(xid, RedoEvent.Start)
      t.ops.foreach { oe =>
        rid += 1
        val rowId = s"R${sc.sid}_$rid"
        val (op1, sql1) = oe.op match {
          case Ins(id, r)       => (RedoEvent.Insert, insertSql(id, r))
          case Upd(id, b, a, s) => (RedoEvent.Update, updateSql(id, b, a, s))
          case Del(id, b)       => (RedoEvent.Delete, deleteSql(id, b))
        }
        emit(xid, op1, sql1, rowId, rb = false)
        if (oe.pair) {
          // Oracle emits the compensating INVERSE operation with ROLLBACK=1 and the SAME
          // ROW_ID (Thread:163-185); if elimination ever failed, these statements are
          // VALID DML whose effect would visibly corrupt the replica — a sensitive probe,
          // not an inert marker
          val (op2, sql2) = oe.op match {
            case Ins(id, r)       => (RedoEvent.Delete, deleteSql(id, r))
            case Upd(id, b, a, s) => (RedoEvent.Update, updateSql(id, a, b, s))
            case Del(id, b)       => (RedoEvent.Insert, insertSql(id, b))
          }
          emit(xid, op2, sql2, rowId, rb = true)
        }
      }
      control(xid, if (t.commit) RedoEvent.Commit else RedoEvent.Rollback)
    }
    out.result()
  }

  // ---- the round trip ----------------------------------------------------

  private val schema = Catalog.withKeyMetadata(StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("sal", DoubleType), StructField("cnt", IntegerType),
    StructField("hired", TimestampType), StructField("note", StringType))), Set("id"))

  // snapshot hired goes through to_timestamp INSIDE the session (UTC) — never through
  // JVM-default-timezone Timestamp.valueOf, which would skew on a non-UTC machine
  private def snapshotOf(scenarios: List[Scenario]): DataFrame = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    scenarios.flatMap(sc => sc.initial.toSeq.map { case (id, r) =>
        (id, r.name, java.math.BigDecimal.valueOf(r.salCents, 2).doubleValue, r.cnt,
          r.hired, r.note.orNull)
      }).toDF("id", "name", "sal", "cnt", "hired_s", "note")
      .withColumn("hired", to_timestamp(col("hired_s")))
      .select("id", "name", "sal", "cnt", "hired", "note")
  }

  private def compareToModel(replica: DataFrame, scenarios: List[Scenario],
                             seedLong: Long): Unit = {
    val got = replica.select(col("id"), col("name"), col("sal"), col("cnt"),
        date_format(col("hired"), "yyyy-MM-dd HH:mm:ss").as("hired"), col("note"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3),
        r.getString(4), r.getString(5)))
      .sortBy(_._1)
    val expected = scenarios.flatMap(sc => sc.finalState.toSeq.map { case (id, r) =>
        (id, r.name, java.math.BigDecimal.valueOf(r.salCents, 2).doubleValue, r.cnt,
          r.hired, r.note.orNull)
      }).sortBy(_._1)
    val gotM = got.toVector.groupBy(_._1); val expM = expected.toVector.groupBy(_._1)
    val badIds = (gotM.keySet ++ expM.keySet).filter(id => gotM.get(id) != expM.get(id))
    assert(badIds.isEmpty, {
      val sample = badIds.toSeq.sorted.take(5).map { id =>
        s"id=$id (scenario ${id / 100}):\n  replica = ${gotM.get(id)}\n  model   = ${expM.get(id)}"
      }.mkString("\n")
      s"replica diverged from model on ${badIds.size} keys (seed $seedLong):\n$sample"
    })
    assert(got.length == expected.size)
  }

  private def generate(n: Int): (List[Scenario], Long) = {
    val seedLong = sys.env.get("GRAFT_ROUNDTRIP_SEED").map(_.toLong)
      .getOrElse(new java.util.Random().nextLong())
    val gen = (0 until n).foldRight(Gen.const(List.empty[Scenario])) { (sid, acc) =>
      for { s <- genScenario(sid); rest <- acc } yield s :: rest
    }
    (gen.pureApply(Gen.Parameters.default, rng.Seed(seedLong)), seedLong)
  }

  test(s"$Scenarios random DML programs round-trip through parse+assemble+fold to the model state") {
    val spark = graft.SparkTestSession.spark
    val (scenarios, seedLong) = generate(Scenarios)
    info(s"round-trip seed = $seedLong (set GRAFT_ROUNDTRIP_SEED to reproduce)")
    val events = scenarios.flatMap(eventsOf)
    info(s"generated ${events.size} redo events over ${scenarios.map(_.txns.size).sum} transactions")
    val config = CdcConfig("GRAFTDB", Seq(("GRAFT", "PROP")))
    val enveloped = CdcPipeline.stream(spark.createDataset(events)(
        org.apache.spark.sql.Encoders.product[RedoEvent]), config, streaming = false)
      .filter(col("seg_owner") === "GRAFT" && col("table_name") === "PROP")
    compareToModel(EnvelopeApply(snapshotOf(scenarios), enveloped, schema), scenarios, seedLong)
  }

  // ---- SCD2 history oracle ------------------------------------------------

  /** The model's FULL version history per key: the ordered committed versions (initial
    * row, then every committed non-pair INSERT/UPDATE value) and whether the key ends
    * deleted. Rollback transactions and A20 pairs contribute nothing. */
  private def modelHistory(scenarios: List[Scenario])
      : Map[Long, (Vector[Row0], Boolean)] = {
    val hist = scala.collection.mutable.Map.empty[Long, Vector[Row0]]
    val live = scala.collection.mutable.Set.empty[Long]
    scenarios.foreach { sc =>
      sc.initial.foreach { case (id, r) => hist(id) = Vector(r); live += id }
      sc.txns.foreach { t =>
        if (t.commit) t.ops.foreach { oe =>
          if (!oe.pair) oe.op match {
            case Ins(id, r)       => hist(id) = hist.getOrElse(id, Vector.empty) :+ r; live += id
            case Upd(id, _, a, _) => hist(id) = hist(id) :+ a
            case Del(id, _)       => live -= id
          }
        }
      }
    }
    hist.toMap.map { case (id, v) => id -> (v, !live.contains(id)) }
  }

  /** Row0 rendered to the envelope's parsed string forms (name unescaped, sal as the
    * plain 2-decimal literal, hired with the TIMESTAMP prefix stripped). */
  private def renderedVersion(r: Row0): (String, String, String, String, String) =
    (r.name, java.math.BigDecimal.valueOf(r.salCents, 2).toPlainString, r.cnt.toString,
      r.hired, r.note.orNull)

  test("SCD2 history over the generated programs matches the model version-for-version") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val (scenarios, seedLong) = generate(150)
    info(s"scd2 history seed = $seedLong (set GRAFT_ROUNDTRIP_SEED to reproduce)")
    val events = scenarios.flatMap(eventsOf)
    val config = CdcConfig("GRAFTDB", Seq(("GRAFT", "PROP")))
    val env = CdcPipeline.stream(spark.createDataset(events)(
        org.apache.spark.sql.Encoders.product[RedoEvent]), config, streaming = false)
      .filter(col("seg_owner") === "GRAFT" && col("table_name") === "PROP")
      .select(coalesce(col("data").getItem("ID"), col("before").getItem("ID"))
          .cast("long").as("k"),
        col("scn").cast("long").as("scn"), col("operation"), col("data"))
    val base = scenarios.flatMap(sc => sc.initial.toSeq.map { case (id, r) =>
        val (nm, sal, cnt, hired, note) = renderedVersion(r)
        (id, nm, sal, cnt, hired, note)
      }).toDF("k", "nm", "sal", "cnt", "hired", "note")
      .select($"k", lit(-1L).as("scn"), lit("BASE").as("operation"),
        map(lit("NAME"), $"nm", lit("SAL"), $"sal", lit("CNT"), $"cnt",
          lit("HIRED"), $"hired", lit("NOTE"), $"note").as("data"))
    val frame = Scd2.versionFrame(base.unionByName(env), "k",
      Seq("name" -> "NAME", "sal" -> "SAL", "cnt" -> "CNT",
        "hired" -> "HIRED", "note" -> "NOTE"))
    val got = frame.filter($"operation" =!= RedoEvent.Delete)
      .select($"k", $"scn", $"valid_to_scn", $"name", $"sal", $"cnt", $"hired", $"note")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        val versions = sorted.map(r =>
          (r.getString(3), r.getString(4), r.getString(5), r.getString(6),
            r.getString(7))).toVector
        // deleted ⟺ every surviving version is closed (the delete marker closed the last)
        val deleted = sorted.forall(!_.isNullAt(2))
        k -> (versions, deleted)
      }
    val expected = modelHistory(scenarios).map { case (k, (vs, del)) =>
      k -> (vs.map(renderedVersion), del)
    }
    val badKeys = (got.keySet ++ expected.keySet).filter(k => got.get(k) != expected.get(k))
    assert(badKeys.isEmpty, {
      val sample = badKeys.toSeq.sorted.take(3).map { k =>
        s"k=$k:\n  engine = ${got.get(k)}\n  model  = ${expected.get(k)}"
      }.mkString("\n")
      s"SCD2 history diverged on ${badKeys.size} keys (seed $seedLong):\n$sample"
    })
  }

  test("the STREAMING path round-trips too: transactions straddle micro-batch cuts") {
    val spark = graft.SparkTestSession.spark
    val n = 120 // streaming harness per-batch overhead; still >100 joint scenarios
    val (scenarios, seedLong) = generate(n)
    info(s"streaming round-trip seed = $seedLong (set GRAFT_ROUNDTRIP_SEED to reproduce)")
    val events = scenarios.flatMap(eventsOf)
    // three arbitrary cuts over the (scenario-banded) event order: transactions WILL
    // straddle them, so assembly state (and any open CSF run) must carry across batches
    val cutSize = math.max(1, (events.size + 2) / 3)
    val batches = events.grouped(cutSize).toSeq
    // NoTimeout: a processing-time timeout never lets processAllAvailable settle
    val config = CdcConfig("GRAFTDB", Seq(("GRAFT", "PROP")), abandonedTxnTimeout = None)
    val out = graft.engine.StreamGate.runBatches(spark,
        org.apache.spark.sql.Encoders.product[RedoEvent], "roundtrip_stream_sink",
        batches) { ds =>
      CdcPipeline.stream(ds, config, streaming = true)
        .filter(col("seg_owner") === "GRAFT" && col("table_name") === "PROP")
    }
    compareToModel(EnvelopeApply(snapshotOf(scenarios), out, schema), scenarios, seedLong)
  }
}
