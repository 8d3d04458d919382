package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * The INCREMENTAL media admission gates (VERDICT r15 #2/#4): the index must FOLD —
 * a twin of a doc admitted in wave 1 must flag near_dup in wave 2 against the wave-1
 * doc itself (which only enters the index through the fold; the stateless gate's
 * frozen index can never catch it) — and the persisted variant's parquet round-trip
 * must be decision-invariant (restart hand-off ≡ in-session fold).
 */
class ImageAdmitIncrSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("persist round-trip decisions ≡ in-stream fold decisions") {
    val spark = graft.SparkTestSession.spark
    val incr = Multimodal.queries("dedup_image_admit_stream_incr")(spark, dir).collect()
    val pers = Multimodal.queries("dedup_image_admit_persist")(spark, dir).collect()
    assert(incr.length > 0)
    assert(incr.toSeq == pers.toSeq,
      "the parquet write + fresh read must not change a single decision")
  }

  test("the fold is load-bearing: a wave-2 twin of a wave-1 admission flags against it") {
    val spark = graft.SparkTestSession.spark
    val rows = Multimodal.queries("dedup_image_admit_stream_incr")(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // +4000001 arrivals are twins of wave-1 FRESH docs (orig % 10 == 0): whenever the
    // orig was ADMITTED in wave 1, the twin must flag near_dup in wave 2 with
    // match_hid = orig at distance 0 — orig enters the index ONLY through the fold
    val foldCatches = rows.filter { r =>
      val d = r.getLong(0)
      d % Dedup.CopyIdShift >= 4000000L && {
        val orig = d - 4000001L
        byId.get(orig).exists(o =>
          o.getLong(1) == 1L && o.getString(2) == "admitted") &&
          r.getLong(1) == 2L && r.getString(2) == "near_dup" &&
          !r.isNullAt(3) && r.getLong(3) == orig && r.getLong(4) == 0L
      }
    }
    val admittedOrigs = rows.count { r =>
      val d = r.getLong(0)
      d % 10 == 0 && d % Dedup.CopyIdShift < 1000000L &&
        r.getLong(1) == 1L && r.getString(2) == "admitted"
    }
    assert(admittedOrigs > 0, "the feed must contain wave-1 admitted fold sources")
    assert(foldCatches.length > 0,
      s"no wave-2 twin flagged against its wave-1 source ($admittedOrigs admitted origs)")
    // and EVERY admitted orig's twin is caught — the fold misses nothing, though the
    // twin may match an even-lower hid if an identical-value doc admitted alongside
    val missed = rows.filter { r =>
      val d = r.getLong(0)
      d % 10 == 0 && d % Dedup.CopyIdShift < 1000000L &&
        r.getLong(1) == 1L && r.getString(2) == "admitted" &&
        byId.get(d + 4000001L).exists(_.getString(2) != "near_dup")
    }
    assert(missed.isEmpty,
      s"wave-2 twins of admitted wave-1 docs sailed through: ${missed.take(5).toSeq}")
  }
}
