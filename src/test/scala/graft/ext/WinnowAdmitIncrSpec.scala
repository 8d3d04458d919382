package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The incremental winnow-admission index's defining invariant (r14, VERDICT r13 #4):
 * folding the admitted wave's fingerprint counts into the existing index yields
 * EXACTLY the df counts a full re-fingerprint of (existing ∪ admitted) would compute —
 * the delta fold displaces the corpus re-winnow without changing a single count. Plus
 * the semantic point of the fold: a near-dup twin of a doc admitted in wave 1 is
 * caught in wave 2, which the r13 frozen index could never do.
 */
class WinnowAdmitIncrSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("the folded index equals a full recompute over existing ∪ admitted") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val docs = graft.engine.Tables(spark, dir, "documents").select($"doc_id", $"text")
    val existing = docs.filter($"doc_id" % 5 =!= 0)
    val feed = docs.filter($"doc_id" % 5 === 0)
      .union(existing.filter($"doc_id" % 7 === 1)
        .select(($"doc_id" + 2000000L).as("doc_id"),
          concat($"text", lit(" graftdup")).as("text")))
    val wave1 = feed.filter($"doc_id" % 2 === 0)
    val index0 = Dedup.winnowDfCounts(spark, existing)
    val (dec1, index1) = Dedup.winnowAdmitWave(spark, wave1, index0)
    val admittedDocs = wave1
      .join(dec1.filter($"status" === "admitted").select($"doc_id"), "doc_id")
    val full = Dedup.winnowDfCounts(spark, existing.unionByName(admittedDocs))
    // multiset equality via the pair-count trick: every (fp, df) row must appear in
    // BOTH frames (count 2 after the union-groupBy), never in just one
    val diff = index1.unionByName(full).groupBy($"fp", $"df")
      .agg(count(lit(1)).as("c")).filter($"c" =!= 2).count()
    assert(diff === 0L, s"folded index diverged from full recompute on $diff (fp, df) rows")
    assert(dec1.count() > 0 && index1.count() > index0.count() * 0 /* non-empty */)
  }

  test("the streaming foreachBatch fold makes exactly the batch fold's decisions") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val batch = graft.SparkEntry.queries("dedup_winnow_admit_incremental")(spark, dir)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    val stream = graft.SparkEntry.queries("dedup_winnow_admit_stream_incr")(spark, dir)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    assert(stream.toSeq === batch.toSeq,
      "micro-batch-folded decisions must be bit-identical to the two-wave batch fold")
  }

  test("wave 2 catches a twin of a doc ADMITTED in wave 1; a frozen index misses it") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus material that shares nothing at all")
    ).toDF("doc_id", "text")
    val fresh = "an entirely new document arriving in the first admission wave"
    val wave1 = Seq((10L, fresh)).toDF("doc_id", "text")
    val wave2 = Seq((11L, fresh + " tail")).toDF("doc_id", "text") // near-dup twin
    val index0 = Dedup.winnowDfCounts(spark, existing)
    val (dec1, index1) = Dedup.winnowAdmitWave(spark, wave1, index0)
    assert(dec1.collect().head.getString(1) === "admitted",
      "the fresh doc must pass the wave-1 screen")
    // folded index: the twin shares the admitted doc's now-indexed rare fingerprints
    val (dec2folded, _) = Dedup.winnowAdmitWave(spark, wave2, index1)
    assert(dec2folded.collect().head.getString(1) === "near_dup",
      "the folded index must catch the admitted doc's twin")
    // frozen index (the r13 posture): the same twin sails through
    val (dec2frozen, _) = Dedup.winnowAdmitWave(spark, wave2, index0)
    assert(dec2frozen.collect().head.getString(1) === "admitted",
      "the frozen index cannot know about wave-1 admissions — that is the r13 gap")
  }
}
