package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.RedoEvent

/** Direct buffer-level tests of the [[EnvelopeFold]] TypedImperativeAggregate — the
  * DataFrame property suite (EnvelopeApplySpec) proves end-to-end equivalence with the
  * declarative folds, but exercises serialize/deserialize/merge only through whatever
  * partial-aggregation split the local planner happens to choose. These pin the
  * codepaths explicitly, including the corners a lucky split never hits. */
class EnvelopeFoldSpec extends AnyFunSuite {

  private def agg = EnvelopeFold(null, null, null, null, null)

  private def upd(b: EnvelopeFoldBuffer, cs: Long, scn: Long, seq: Long, op: String,
                  data: Map[String, String]): EnvelopeFoldBuffer = {
    // drive update() through a literal-child clone so the expression tree evaluates
    // exactly as it would against a real InternalRow
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
    import org.apache.spark.sql.types.{MapType, StringType}
    val mapV = if (data == null) null
      else ArrayBasedMapData(
        data.keys.map(k => UTF8String.fromString(k)).toArray[Any],
        data.values.map(v => if (v == null) null else UTF8String.fromString(v)).toArray[Any])
    val e = EnvelopeFold(Literal(cs), Literal(scn), Literal(seq),
      Literal(UTF8String.fromString(op), StringType),
      Literal(mapV, MapType(StringType, StringType, valueContainsNull = true)))
    e.update(b, InternalRow.empty)
  }

  private def evalRow(b: EnvelopeFoldBuffer) =
    agg.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]

  private def roundtrip(b: EnvelopeFoldBuffer): EnvelopeFoldBuffer =
    agg.deserialize(agg.serialize(b))

  test("serialize/deserialize roundtrips unicode keys, null values, and boundary state") {
    var b = new EnvelopeFoldBuffer
    b = upd(b, 1, 1, 1, RedoEvent.Insert, Map("CAFÉ☕" -> "naïve-ü", "NULLED" -> null))
    b = upd(b, 1, 2, 1, RedoEvent.Update, Map("CAFÉ☕" -> "后来-更新"))
    val r = roundtrip(b)
    assert(r.hasLast && r.hasB && r.winners.size() == 2)
    val w = r.winners.get(UTF8String.fromString("CAFÉ☕"))
    assert(w.v.toString == "后来-更新" && w.scn == 2)
    assert(r.winners.get(UTF8String.fromString("NULLED")).v == null)
    // the roundtripped buffer folds on identically
    val r2 = upd(r, 2, 1, 1, RedoEvent.Delete, null)
    val row = evalRow(r2)
    assert(row.getBoolean(0), "last event DELETE => deleted")
  }

  test("empty buffer (zero events) evals to (not deleted, empty map, not replaced)") {
    val row = evalRow(roundtrip(new EnvelopeFoldBuffer))
    assert(!row.getBoolean(0))
    assert(row.getMap(1).numElements() == 0)
    assert(!row.getBoolean(2))
  }

  test("merge with disjoint columns unions winners; boundary from one side prunes the other") {
    // side A: an UPDATE at ord (1,1,1) setting X — pre-boundary once merged
    var a = new EnvelopeFoldBuffer
    a = upd(a, 1, 1, 1, RedoEvent.Update, Map("X" -> "old"))
    // side B: an INSERT at ord (1,5,1) setting Y — the boundary
    var bb = new EnvelopeFoldBuffer
    bb = upd(bb, 1, 5, 1, RedoEvent.Insert, Map("Y" -> "new"))
    val m = agg.merge(a, roundtrip(bb))
    val row = evalRow(m)
    assert(!row.getBoolean(0) && row.getBoolean(2), "insert => replaced, not deleted")
    val keys = (0 until row.getMap(1).numElements())
      .map(i => row.getMap(1).keyArray().getUTF8String(i).toString)
    assert(keys == Seq("Y"), s"pre-boundary X must be pruned at merge, got $keys")
  }

  test("merge order does not matter (commutative on disjoint and overlapping keys)") {
    def mk(evs: Seq[(Long, Long, Long, String, Map[String, String])]): EnvelopeFoldBuffer =
      evs.foldLeft(new EnvelopeFoldBuffer) { case (b, (cs, scn, seq, op, d)) =>
        upd(b, cs, scn, seq, op, d)
      }
    val evs1 = Seq[(Long, Long, Long, String, Map[String, String])](
      (1L, 1L, 1L, RedoEvent.Insert, Map("A" -> "1", "B" -> "2")),
      (1L, 3L, 1L, RedoEvent.Update, Map("B" -> null)))
    val evs2 = Seq[(Long, Long, Long, String, Map[String, String])](
      (1L, 2L, 1L, RedoEvent.Update, Map("A" -> "9", "C" -> "7")),
      (1L, 4L, 1L, RedoEvent.Update, Map("C" -> "8")))
    val ab = evalRow(agg.merge(mk(evs1), roundtrip(mk(evs2))))
    val ba = evalRow(agg.merge(mk(evs2), roundtrip(mk(evs1))))
    assert(ab.getBoolean(0) == ba.getBoolean(0) && ab.getBoolean(2) == ba.getBoolean(2))
    def entries(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
      (0 until r.getMap(1).numElements()).map { i =>
        val k = r.getMap(1).keyArray().getUTF8String(i).toString
        val v = if (r.getMap(1).valueArray().isNullAt(i)) null
          else r.getMap(1).valueArray().getUTF8String(i).toString
        k -> v
      }.toMap
    assert(entries(ab) == entries(ba))
    // and the merged result equals folding all events into one buffer
    assert(entries(ab) == entries(evalRow(mk(evs1 ++ evs2))))
  }

  test("envelope_fold is reachable from pure SQL via GraftExtensions") {
    val spark = graft.SparkTestSession.spark // built .withExtensions(new GraftExtensions)
    import spark.implicits._
    Seq(
      (1L, 1L, 1L, 1L, RedoEvent.Insert, Map("A" -> "x")),
      (1L, 1L, 2L, 1L, RedoEvent.Update, Map("A" -> "y")),
      (2L, 1L, 1L, 1L, RedoEvent.Delete, null.asInstanceOf[Map[String, String]]))
      .toDF("k", "commit_scn", "scn", "seq", "operation", "data")
      .createOrReplaceTempView("env_sql_test")
    val rows = spark.sql(
      """SELECT k, envelope_fold(commit_scn, scn, seq, operation, data) AS f
        |FROM env_sql_test GROUP BY k ORDER BY k""".stripMargin)
      .selectExpr("k", "f.deleted", "f.m['A']", "f.replaced").collect()
    assert(rows(0).getBoolean(1) == false && rows(0).getString(2) == "y"
      && rows(0).getBoolean(3) == true) // the INSERT is the boundary => replaced
    assert(rows(1).getBoolean(1) == true)
  }

  test("non-DML ops count as the last event (twin alignment) but fold no data") {
    var b = new EnvelopeFoldBuffer
    b = upd(b, 1, 1, 1, RedoEvent.Insert, Map("A" -> "1"))
    b = upd(b, 9, 9, 9, "COMMIT", Map("A" -> "evil"))
    val row = evalRow(b)
    assert(!row.getBoolean(0))
    assert(row.getMap(1).valueArray().getUTF8String(0).toString == "1",
      "a non-DML op's payload must not become a winner")
    // the declarative twins treat a trailing unknown op as not-a-DELETE; the native
    // fold must agree or `deleted` diverges on envelopes carrying DDL rows
    var d = new EnvelopeFoldBuffer
    d = upd(d, 1, 1, 1, RedoEvent.Delete, null)
    d = upd(d, 1, 2, 1, "DDL", null)
    assert(!evalRow(d).getBoolean(0), "trailing non-DML clears deleted, matching the twins")
    assert(evalRow(d).getBoolean(2), "the DELETE boundary itself is unaffected")
  }
}
