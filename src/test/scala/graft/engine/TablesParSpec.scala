package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Gates for [[Tables.par]] — the scan-parallelism floor (r20, optimization guide §2.5):
  * the driver testdata's single-file single-row-group parquet plans ONE scan task, so the
  * floor round-robin-repartitions up to the session's default parallelism. The floor must
  * (a) actually raise the planned parallelism, (b) never change the row multiset, and
  * (c) be a NO-OP when the scan already plans at least that many partitions. */
class TablesParSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("par floors planned partitions at defaultParallelism on a single-file input") {
    val plain = Tables(spark, dir, "documents")
    val floored = Tables.par(spark, dir, "documents")
    assert(plain.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "precondition: the driver testdata should plan fewer scan splits than cores " +
        "(single file, single row group) — if this ever fails the floor is obsolete")
    assert(floored.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("par is row-identical to apply (same multiset, only distribution changes)") {
    val plain = Tables(spark, dir, "documents").orderBy("doc_id").collect()
    val floored = Tables.par(spark, dir, "documents").orderBy("doc_id").collect()
    assert(plain.toSeq == floored.toSeq)
  }

  test("the floor exchange is ROUND-ROBIN, never a key partitioning") {
    // PlanAuditSpec's key-shuffle counts exclude RoundRobinPartitioning on this
    // contract: the floor redistributes rows without imposing a key layout, so it can
    // never masquerade as (or replace) a semantic exchange
    val plan = Tables.par(spark, dir, "documents").queryExecution.executedPlan.toString()
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected the floor's round-robin exchange in:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"the floor must not introduce a key partitioning:\n$plan")
  }
}
