package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Harness for ORACLE-GATING a streaming plan: drive it through a MemoryStream in two
 * micro-batches (the cut is what proves state carries across batch boundaries), collect the
 * append-mode output in a memory sink, return it as a batch frame for the hash gate.
 *
 * The state-store instance count is pinned low for the harness: it is fixed at query start
 * from spark.sql.shuffle.partitions, and a wide setting pays per-partition checkpoint-file
 * churn on every micro-batch for a driver-fed stream (restored in the finally; a production
 * stream sizes this to the executor count instead).
 *
 * Plans with stateful operators must use timeouts compatible with processAllAvailable
 * (NoTimeout — a processing-time timeout makes every micro-batch "require another batch",
 * so the no-new-data signal never fires; see TxnAssembler).
 */
object StreamGate {

  def runTwoBatches[T](spark: SparkSession, enc: Encoder[T], sink: String,
                       batch1: Seq[T], batch2: Seq[T])
                      (plan: Dataset[T] => DataFrame): DataFrame =
    runBatches(spark, enc, sink, Seq(batch1, batch2))(plan)

  /** N-micro-batch variant: each element of `batches` is drained fully before the next is
    * fed, so the watermark observed at batch k+1's start is exactly batch k's high mark —
    * what a state-eviction gate needs to be deterministic. */
  def runBatches[T](spark: SparkSession, enc: Encoder[T], sink: String,
                    batches: Seq[Seq[T]])
                   (plan: Dataset[T] => DataFrame): DataFrame = {
    val input = MemoryStream[T](enc, spark)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val query =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        plan(input.toDS()).writeStream
          .format("memory").queryName(sink).outputMode("append").start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    spark.table(sink)
  }

  /** Two-input variant for stream-stream operators: each side gets its own MemoryStream
    * and its two batches are interleaved (left1, right1, drain, left2, right2, drain) so
    * both sides' watermarks advance together. */
  def runTwoInputs[L, R](spark: SparkSession, encL: Encoder[L], encR: Encoder[R],
                         sink: String,
                         left1: Seq[L], right1: Seq[R], left2: Seq[L], right2: Seq[R],
                         statePartitions: Int = 8)
                        (plan: (Dataset[L], Dataset[R]) => DataFrame): DataFrame = {
    val leftIn = MemoryStream[L](encL, spark)
    val rightIn = MemoryStream[R](encR, spark)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val query =
      try {
        // stream-stream joins open FOUR state stores per side per partition; a driver-fed
        // harness wants the minimum instance count, a production job sizes to executors
        spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
        plan(leftIn.toDS(), rightIn.toDS()).writeStream
          .format("memory").queryName(sink).outputMode("append").start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      leftIn.addData(left1)
      rightIn.addData(right1)
      query.processAllAvailable()
      leftIn.addData(left2)
      rightIn.addData(right2)
      query.processAllAvailable()
    } finally query.stop()
    spark.table(sink)
  }
}
