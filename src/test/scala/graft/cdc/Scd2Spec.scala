package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural invariants of the `cdc_scd2_history` query (CdcQueries) that the value-hash
 * oracle can't state directly: interval chaining, current-row uniqueness, and the
 * explicit-SET-NULL overlay. Runs on the sf0.001 driver testdata like the other e2e specs.
 */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val hist =
    graft.SparkEntry.queries("cdc_scd2_history")(spark, dir).cache()

  test("intervals chain per key: each valid_to equals the next version's valid_from") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderkey").orderBy($"valid_from_scn")
    val broken = hist
      .withColumn("next_from", lead($"valid_from_scn", 1).over(w))
      // non-final versions must close exactly at the next version's start; the FINAL
      // version may stay open (null) or be closed by a delete marker (> its own start)
      .filter(($"next_from".isNotNull && ($"valid_to_scn".isNull || $"valid_to_scn" =!= $"next_from")) ||
        ($"next_from".isNull && $"valid_to_scn".isNotNull && $"valid_to_scn" <= $"valid_from_scn"))
      .count()
    assert(broken === 0L)
  }

  test("at most one current version per key; deleted keys have zero") {
    import spark.implicits._
    val perKey = hist.groupBy($"o_orderkey")
      .agg(sum($"is_current").as("cur"), max($"o_orderkey").as("k"))
    assert(perKey.filter($"cur" > 1).count() === 0L)
    // %10 keys are deleted by the script (and no other op resurrects an original key)
    val deleted = perKey.filter($"k" % 10 === 0 && $"k" < 10000000L)
    assert(deleted.count() > 0L, "the sf dir should contain %10 keys")
    assert(deleted.filter($"cur" =!= 0).count() === 0L)
  }

  test("explicit SET NULL overlays and survives until re-set (%6 vs %9 keys)") {
    import spark.implicits._
    // a %6 key that is NOT %9 and NOT deleted: its current version carries NULL priority
    val nulled = hist.filter($"is_current" === 1 &&
      $"o_orderkey" % 6 === 0 && $"o_orderkey" % 9 =!= 0 &&
      $"o_orderkey" % 10 =!= 0 && $"o_orderkey" < 10000000L)
    assert(nulled.count() > 0L)
    assert(nulled.filter($"o_orderpriority".isNotNull).count() === 0L)
    // a %18 key (both %6 and %9, not deleted): the later %9 update re-sets it to 9-PRIO
    val reset = hist.filter($"is_current" === 1 &&
      $"o_orderkey" % 18 === 0 && $"o_orderkey" % 10 =!= 0 && $"o_orderkey" < 10000000L)
    assert(reset.count() > 0L)
    assert(reset.filter($"o_orderpriority" =!= "9-PRIO" || $"o_orderpriority".isNull).count() === 0L)
  }

  test("as-of snapshot: applied below the cut, base above it, deleted keys absent") {
    import spark.implicits._
    // sf0.001 keys are 0..1499, so every script scn (key*10+off <= 15005) is below the
    // 75000 cut: the as-of read must equal the fully-applied final state
    val asof = graft.SparkEntry.queries("cdc_asof_snapshot")(spark, dir).cache()
    // %10 keys were deleted before the cut
    assert(asof.filter($"o_orderkey" % 10 === 0 && $"o_orderkey" < 10000000L).count() === 0L)
    // a %3-not-%9-not-deleted key reads its 'Z' update
    val z = asof.filter($"o_orderkey" === 3L).collect()
    assert(z.length === 1 && z.head.getAs[String]("o_orderstatus") === "Z")
    // an inserted key (%4 source) exists with its insert state
    val ins = asof.filter($"o_orderkey" === 10000004L).collect()
    assert(ins.length === 1 && ins.head.getAs[String]("o_orderstatus") === "N")
  }

  test("as-of at a post-stream scn EQUALS the envelope-apply final state (cross-operator)") {
    import spark.implicits._
    // sf0.001's largest script scn is 14,995 < the 75,000 cut, so the time-travel read
    // covers the whole stream — it must land on EXACTLY the state the independent
    // apply-merge fold (native TypedImperativeAggregate) computes from the same envelope
    val asof = graft.SparkEntry.queries("cdc_asof_snapshot")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val fold = graft.SparkEntry.queries("cdc_apply_merge")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(asof === fold,
      s"as-of(∞) and apply-merge diverge: ${asof.size} vs ${fold.size} rows")
  }

  test("streaming SCD2: a version opened in batch 1 is closed by batch 2 (keyed-state carry)") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("cdc_scd2_stream")(spark, dir).cache()
    // the harness cuts batches at scn%10<=2: off-1 versions open in batch 1; off-5
    // deletes arrive in batch 2. A %7∧%3∧%10 key's 'Z' version must therefore be CLOSED
    // by state carried across the cut (k=210 at sf0.001: 210%7=0, %3=0, %10=0, %6=0)
    val k210 = out.filter($"o_orderkey" === 210L).orderBy($"valid_from_scn").collect()
    assert(k210.nonEmpty, "key 210 must appear in the %7 slice")
    val z = k210.find(_.getAs[String]("o_orderstatus") == "Z")
    assert(z.isDefined, s"key 210 must carry a 'Z' version: ${k210.mkString(";")}")
    assert(z.get.getAs[Long]("valid_to_scn") === 2105L,
      "the batch-1 'Z' version must be closed by the batch-2 delete at scn 2105")
    assert(k210.forall(_.getAs[Int]("is_current") == 0),
      "a deleted key has no current version")
  }

  test("late-event restatement: an out-of-order commit splits the closed interval (r10 #6)") {
    import spark.implicits._
    // key 33 (%11, %3, not %6/%9/%10): in-order history is base(-1) -> 'Z'(331, OPEN).
    // The restate feed appends a LATE status='L' update at scn 332 — the 'Z' version
    // must close at 332, 'L' becomes current, ordinals shift. cdc_scd2_history (without
    // the late op) must still show 'Z' open: the restatement is the delta.
    val restated = graft.SparkEntry.queries("cdc_scd2_restate")(spark, dir)
      .filter($"o_orderkey" === 33L).orderBy($"valid_from_scn").collect()
    assert(restated.map(_.getAs[Long]("valid_from_scn")).toSeq === Seq(-1L, 331L, 332L))
    val z = restated(1)
    assert(z.getAs[String]("o_orderstatus") === "Z" && z.getAs[Long]("valid_to_scn") === 332L,
      s"the late op must close the 'Z' interval: ${restated.mkString(";")}")
    val l = restated(2)
    assert(l.getAs[String]("o_orderstatus") === "L" && l.getAs[Int]("is_current") === 1 &&
      l.getAs[Long]("ver") === 3L)
    val inOrder = hist.filter($"o_orderkey" === 33L).orderBy($"valid_from_scn").collect()
    assert(inOrder.last.getAs[String]("o_orderstatus") === "Z" &&
      inOrder.last.getAs[Int]("is_current") === 1)
  }

  test("versionFrame is arrival-order independent (the batch restatement contract)") {
    import spark.implicits._
    def frame(rows: Seq[(Long, Long, String, Map[String, String])]) =
      Scd2.versionFrame(
        rows.toDF("o_orderkey", "scn", "operation", "data"),
        "o_orderkey", Seq("st" -> "S", "pr" -> "P"))
        .orderBy($"o_orderkey", $"scn").collect().map(_.toString).toSeq
    val inOrder = Seq(
      (1L, -1L, "BASE", Map("S" -> "a", "P" -> "p")),
      (1L, 10L, "UPDATE", Map("S" -> "b")),
      (1L, 15L, "UPDATE", Map("S" -> "late")), // the mid-interval commit
      (1L, 20L, "UPDATE", Map("P" -> "q")))
    val shuffled = Seq(inOrder(3), inOrder(0), inOrder(2), inOrder(1))
    assert(frame(inOrder) === frame(shuffled))
  }

  test("version counts match the script arithmetic for a spot key") {
    import spark.implicits._
    // key 12: %6 (prio NULL), %3 ('Z'), %4 (spawns 10000012) — base + 2 updates = 3 rows
    val k12 = hist.filter($"o_orderkey" === 12L).orderBy($"valid_from_scn").collect()
    assert(k12.map(_.getAs[Long]("valid_from_scn")).toSeq === Seq(-1L, 120L, 121L))
    assert(k12.last.getAs[String]("o_orderstatus") === "Z")
    assert(k12.last.getAs[String]("o_orderpriority") == null)
    // its spawned key: insert at 122, no %8 update (12 % 8 != 0) — one current row
    val spawned = hist.filter($"o_orderkey" === 10000012L).collect()
    assert(spawned.length === 1 && spawned.head.getAs[Int]("is_current") === 1)
  }
}
