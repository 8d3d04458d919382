package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Regression pins for the streaming-state boundedness claims BASELINE.md's round-8
 * measurements rest on (r7 verdict #2). The measured sf0.1/sf1 numbers live in
 * BASELINE.md; these assert the INVARIANTS at sf0.001 so a refactor that silently turns
 * bounded state into history-shaped state (the reference's `trnCollection` failure mode,
 * LogMinerThread2.java:81) fails the suite, not the next scale run.
 */
class StreamScaleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("apply state rows are bounded by live keys: 4x history leaves them IDENTICAL") {
    val spark = graft.SparkTestSession.spark
    val h0 = StreamScale.applyWorkload(spark, dir, hist = 0)
    spark.catalog.clearCache()
    val h4 = StreamScale.applyWorkload(spark, dir, hist = 4)
    spark.catalog.clearCache()
    assert(h4.events > h0.events * 2,
      s"the history knob must materially grow the event count: ${h0.events} -> ${h4.events}")
    assert(h4.finalRows == h0.finalRows,
      s"state rows grew with HISTORY (${h0.finalRows} -> ${h4.finalRows}) — the bounded-" +
        "by-live-keys claim is broken")
    // peak is cut-sensitive: a key deleted in a LATER micro-batch counts in an earlier
    // batch's state, and the 4-way cut lands on different rows when history inflates the
    // feed — so peak may wobble by a few tombstone-transit keys, but must never grow with
    // the history volume itself (that would read as ~2x here)
    assert(h4.peakRows <= h0.peakRows + 16,
      s"peak state grew with history: ${h0.peakRows} -> ${h4.peakRows}")
    // emissions are one-per-(key, touching batch): the inflated feed moves the 4-way cut,
    // so a key's events may straddle one more batch boundary and re-emit — emission count
    // may grow slightly, but never shrink and never anywhere near the event inflation
    assert(h4.outRows >= h0.outRows && h4.outRows <= h0.outRows + h0.finalRows,
      s"emission count moved implausibly: ${h0.outRows} -> ${h4.outRows}")
  }

  test("SCD2 state is one open version per live key: 4x history leaves it IDENTICAL") {
    val spark = graft.SparkTestSession.spark
    val h0 = StreamScale.scd2Workload(spark, dir, hist = 0)
    spark.catalog.clearCache()
    val h4 = StreamScale.scd2Workload(spark, dir, hist = 4)
    spark.catalog.clearCache()
    assert(h4.events > h0.events * 2,
      s"the history knob must materially grow the event count: ${h0.events} -> ${h4.events}")
    assert(h4.finalRows == h0.finalRows,
      s"SCD2 state grew with HISTORY (${h0.finalRows} -> ${h4.finalRows}) — closures " +
        "must evict, not accumulate")
    // history becomes OUTPUT (closed versions), never state: emissions must grow
    assert(h4.outRows > h0.outRows,
      s"extra updates must emit closed versions: ${h0.outRows} -> ${h4.outRows}")
    assert(h4.peakRows <= h0.peakRows + 16,
      s"peak state grew with history: ${h0.peakRows} -> ${h4.peakRows}")
  }

  test("transaction-assembly state drains to ZERO at COMMIT; peak equals open txns") {
    val spark = graft.SparkTestSession.spark
    val m = StreamScale.txnWorkload(spark, dir)
    assert(m.finalRows == 0L,
      s"${m.finalRows} transaction buffers survived COMMIT — unbounded-state regression")
    // the harness opens every transaction in batch 1, so the peak is exactly the txn count
    assert(m.peakRows * 2 == m.outRows,
      s"peak state ${m.peakRows} should be the open-txn count (= half the ${m.outRows} emitted rows)")
  }

  test("session-window state is watermark-evicted down to the sentinel session") {
    val spark = graft.SparkTestSession.spark
    val m = StreamScale.sessionWorkload(spark, dir)
    assert(m.finalRows <= 1L,
      s"${m.finalRows} sessions retained after the far-future sentinel — eviction regressed")
    assert(m.peakRows > 1L, "the harness should have held open sessions mid-run")
  }

  test("dedup-within-watermark state is bounded by live keys and drained by expiry") {
    val spark = graft.SparkTestSession.spark
    val h1 = StreamScale.dedupWmWorkload(spark, dir, hist = 1)
    spark.catalog.clearCache()
    val h4 = StreamScale.dedupWmWorkload(spark, dir, hist = 4)
    spark.catalog.clearCache()
    assert(h4.events > h1.events,
      s"the replay knob must grow the event count: ${h1.events} -> ${h4.events}")
    // 4x the replay volume, identical peak: state rows track the KEY SET, not the feed
    assert(h4.peakRows == h1.peakRows,
      s"dedup state grew with REPLAY VOLUME (${h1.peakRows} -> ${h4.peakRows}) — the " +
        "bounded-by-live-keys claim is broken")
    // the pusher's expiry sweep must drain every original key; only the pusher survives
    assert(h1.finalRows <= 1L && h4.finalRows <= 1L,
      s"state retained after the expiry sweep (${h1.finalRows}/${h4.finalRows}) — " +
        "dropDuplicatesWithinWatermark eviction regressed")
    // replays were suppressed: emissions are the originals plus the pusher only
    assert(h4.outRows == h1.outRows,
      s"replay rounds changed the emission count (${h1.outRows} -> ${h4.outRows})")
  }

  test("stream-stream join buffers both sides then watermark-evicts all real rows") {
    val spark = graft.SparkTestSession.spark
    val m = StreamScale.joinWorkload(spark, dir)
    assert(m.peakRows > 2L, "the harness should have buffered both sides mid-run")
    // after the sentinels advance both watermarks, the 24h interval excludes every real
    // row; only the two sentinels (and nothing proportional to the feed) may remain
    assert(m.finalRows <= 2L,
      s"${m.finalRows} join-state rows survived the far-future sentinels — the " +
        "time-range eviction the 100 TB posture rests on regressed")
  }
}
