package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.median's even-count behavior: `sorted(size/2)` alone picks the UPPER
  * middle, which for reps=2 is the MAX — one contention spike would then poison the
  * recorded number, the exact failure median-of-K exists to prevent. */
class BenchMedianSpec extends AnyFunSuite {
  test("median: odd count takes the middle, even count averages the two middles") {
    assert(Bench.median(Seq(3.0)) == 3.0)
    assert(Bench.median(Seq(9.0, 1.0, 2.0)) == 2.0)
    // reps=2 with a spike: must NOT report the spike
    assert(Bench.median(Seq(1.2, 14.0)) == 7.6)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }
}
