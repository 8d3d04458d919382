package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the `dedup_winnow_admit_persist` restart contract: folding the admission index
 * through a parquet write + fresh read between waves must not change a single
 * decision vs the in-session fold (`dedup_winnow_admit_incremental`). The two share
 * their oracle SQL; this spec additionally pins ENGINE-side row equality, so a
 * persistence bug that happened to cancel out in the oracle comparison (e.g. a df
 * type widening both sides coerce) still fails here.
 */
class WinnowAdmitPersistSpec extends AnyFunSuite {

  private def spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("persisted-index decisions equal the in-session fold's, row for row") {
    val s = spark
    val persisted = graft.SparkEntry.queries("dedup_winnow_admit_persist")(s, dir)
      .collect().map(_.toSeq).toSeq
    val inSession = graft.SparkEntry.queries("dedup_winnow_admit_incremental")(s, dir)
      .collect().map(_.toSeq).toSeq
    assert(persisted.nonEmpty, "the gate must decide rows at sf0.001")
    assert(persisted === inSession,
      "a parquet round-trip of the index must be decision-invariant")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("the persisted artifact is a real (fp, df) index a fresh reader can fold") {
    val s = spark
    import s.implicits._
    graft.SparkEntry.queries("dedup_winnow_admit_persist")(s, dir)
      .write.mode("overwrite").format("noop").save()
    val idx = s.read.parquet(Dedup.admitIndexPath(dir))
    assert(idx.columns.sorted === Array("df", "fp"))
    val n = idx.count()
    assert(n > 0, "the persisted index must carry the folded fingerprint counts")
    // df values are the folded counts: all positive, and the index is fp-unique
    assert(idx.filter($"df" <= 0).count() === 0)
    assert(idx.select($"fp").distinct().count() === n)
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
