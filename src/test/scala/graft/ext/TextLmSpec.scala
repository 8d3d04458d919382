package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantics of the `text_lm_score` bigram model that the value-hash oracle can't state:
 * score bounds, and the fluency ordering the filter exists for (formulaic text must
 * outscore text the corpus model has never seen).
 */
class TextLmSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("scores are bounded: 0 < lm_bp_avg <= 10000; deterministic bigram counts") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("text_lm_score")(spark, "/root/testdata/sf0.001")
    val rows = out.agg(min($"lm_bp_avg").as("lo"), max($"lm_bp_avg").as("hi"),
      sum($"n_bigrams").as("nb"), count(lit(1)).as("n")).collect().head
    assert(rows.getAs[Long]("lo") > 0L)
    assert(rows.getAs[Long]("hi") <= 10000L)
    assert(rows.getAs[Long]("n") > 0L && rows.getAs[Long]("nb") > 0L)
  }

  test("a doc made of the corpus's dominant bigram outscores an all-unique-bigram doc") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("lmspec").toString
    // 8 docs repeat "alpha beta" (the dominant continuation of 'alpha'); one "fluent" doc
    // is pure repetition of it; one "disfluent" doc pairs alpha with a fresh token each
    // time, so every bigram is rare under the trained model
    val docs =
      (0 until 8).map(i => (i.toLong, "alpha beta " * 6, "en", "s", 0L)) :+
        (100L, Seq.fill(6)("alpha beta").mkString(" "), "en", "s", 0L) :+
        (101L, (0 until 6).map(i => s"alpha uniq$i").mkString(" "), "en", "s", 0L)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_lm_score")(spark, dir)
      .filter($"doc_id" >= 100L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_bp_avg")).toMap
    assert(out(100L) > out(101L),
      s"fluent doc must outscore disfluent: ${out(100L)} vs ${out(101L)}")
  }
}
