package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-rep calibration-spin contention detector (r8 verdict #1): BENCH_r08 was
  * stamped degraded:false while a sustained uniform host slowdown inflated medians 3-4×
  * past their minimums (cdc_apply_merge_dict min 2.14 s / med 37.68 s in one run). The
  * spin is a fixed-work probe, so its wall time IS the slowdown factor — these tests pin
  * the trip logic and prove the probe actually detects an injected busy co-process.
  */
class BenchSpinSpec extends AnyFunSuite {

  test("spinTripped: flat series and sub-threshold jitter do not trip") {
    assert(!Bench.spinTripped(Nil))
    assert(!Bench.spinTripped(Seq(0.2)))
    assert(!Bench.spinTripped(Seq(0.20, 0.21, 0.19, 0.22)))
    // ratio >2x but absolute gap below the 0.2s GC-noise guard: no trip
    assert(!Bench.spinTripped(Seq(0.05, 0.12)))
  }

  test("spinTripped: a burst rep >2x the fastest with material gap trips") {
    // the r8 failure shape: most reps healthy, a sustained window 3-4x slower
    assert(Bench.spinTripped(Seq(0.20, 0.21, 0.75, 0.68, 0.20)))
    // uniform-from-the-start slowdown still trips as soon as one healthy rep exists
    assert(Bench.spinTripped(Seq(0.21, 0.80, 0.80, 0.80)))
  }

  test("calibrationSpin detects an injected busy co-process (degraded provably fires)") {
    // calibrate the probe length to ~0.25 s of HEALTHY wall time on THIS machine under
    // its CURRENT ambient load: the trip condition needs ratio >2x AND absolute gap
    // >0.2 s, so a fixed-length probe fails spuriously whenever the box is fast enough
    // (or ambient load weakens the injected contention enough) that a real 2-3x slowdown
    // lands under the 0.2 s gap guard — measured in-tree: 3.0x with a 0.185 s gap on a
    // loaded host. With a ~0.25 s healthy rep, any >=2x slowdown gaps >=0.25 s by
    // construction.
    val iters0 = 50000000L
    Bench.calibrationSpin(iters0) // JIT warmup, same as Bench.main's throwaway
    val t0 = (1 to 3).map(_ => Bench.calibrationSpin(iters0)).min
    val iters = math.max(iters0, (iters0 * 0.25 / t0).toLong)
    val cores = Runtime.getRuntime.availableProcessors()

    // one detection round: healthy min on either side of the burner window (under
    // `sbt test` other suites can spike the machine during the FIRST baseline window,
    // inflating it enough to mask the injected contention — a healthy rep on either
    // side restores the exact shape spinTripped is specified against)
    def round(): (Double, Double) = {
      val baseline = (1 to 5).map(_ => Bench.calibrationSpin(iters)).min
      // saturate the box at ~4x oversubscription: with 4N runnable spinners per core
      // the probe thread's CPU share drops to ~1/4, so its fixed work takes ~4x wall
      // time — comfortably past the 2x trip with margin for scheduler variance
      @volatile var stop = false
      val burners = (1 to cores * 4).map { _ =>
        val t = new Thread(() => {
          var h = 1L
          while (!stop) h = h * 6364136223846793005L + 1442695040888963407L
          if (h == 0L) println("") // keep the loop live
        })
        t.setDaemon(true)
        t.start()
        t
      }
      val loaded =
        try (1 to 3).map(_ => Bench.calibrationSpin(iters)).min
        finally { stop = true; burners.foreach(_.join(2000)) }
      val baselineAfter = (1 to 3).map(_ => Bench.calibrationSpin(iters)).min
      (math.min(baseline, baselineAfter), loaded)
    }

    // the EXACT degraded condition Bench.main applies to the per-rep spin series: a
    // run whose series contains both healthy and contended reps must stamp
    // degraded:true. Up to 3 attempts: when the FULL SUITE saturates all cores for a
    // whole attempt, ambient slows healthy and loaded alike and the injected ratio
    // washes out (measured: 1.1x under a concurrent Spark-suite burst) — a later
    // attempt normally lands in a quiet window.
    val tripped = (1 to 3).exists { i =>
      val (healthy, loaded) = round()
      info(f"attempt $i: baseline=$healthy%.3fs loaded=$loaded%.3fs ratio=${loaded / healthy}%.1fx")
      Bench.spinTripped(Seq(healthy, loaded))
    }
    if (!tripped) {
      // distinguish "detector broken" from "environment unmeasurable": on a host whose
      // ambient load already saturates the cores there is no quiet window to compare
      // against, and the property cannot be evaluated — cancel loudly instead of
      // failing spuriously (or worse, weakening the assertion)
      val load1 = scala.util.Try(
        scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble)
        .getOrElse(0.0)
      if (load1 > cores * 0.75)
        cancel(f"ambient load $load1%.1f saturates $cores cores — injected-contention ratio unmeasurable in this window")
      else
        fail("injected 4x oversubscription must trip spinTripped in 3 attempts on a quiet host")
    }
  }
}
