package graft.engine

import org.apache.spark.sql.Dataset

/**
 * Per-partition Misra–Gries frequent-items summary (Misra & Gries 1982, "Finding
 * repeated elements") — the candidate-generation half of the exact heavy-hitters
 * two-pass in `events_heavy_hitters` (Temporal).
 *
 * Each partition keeps at most `capacity` counters: a resident key increments its
 * counter; a non-resident key inserts while there is room, otherwise EVERY counter
 * decrements by one (the arriving key's implicit 1 cancels too) and zeroed counters
 * evict. Each decrement-all removes `capacity` units of stream mass, so there are at
 * most n_p/capacity of them — O(n_p) total work, O(capacity) state, one pass.
 *
 * Guarantee used by the caller: a key with partition count > n_p/capacity cannot be
 * decremented to zero by every eviction wave, so it survives in that partition's
 * summary. Hence the UNION over partitions is a superset of every key with GLOBAL
 * count > N/capacity (pigeonhole across partitions), and an exact recount restricted
 * to the union loses nothing.
 *
 * This is one of the rare genuinely-imperative per-partition loops (like the
 * Multimodal codecs): the bounded counter map with decrement-all eviction has no
 * Column-algebra equivalent that avoids shuffling the full key cardinality — which is
 * the entire point of the sketch.
 */
object MisraGries {

  /** Surviving candidate keys of every partition (with multiplicity across partitions —
    * callers `distinct()` before broadcasting). */
  def candidates(keys: Dataset[Long], capacity: Long): Dataset[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val cap = capacity.toInt
    keys.mapPartitions { it =>
      val m = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { k =>
        if (m.contains(k)) m(k) += 1L
        else if (m.size < cap) m(k) = 1L
        else {
          // decrement-all over a key snapshot (LongMap must not mutate mid-iteration)
          val ks = m.keysIterator.toArray
          var i = 0
          while (i < ks.length) {
            val v = m(ks(i))
            if (v == 1L) m.subtractOne(ks(i)) else m(ks(i)) = v - 1L
            i += 1
          }
        }
      }
      m.keysIterator.toArray.iterator
    }
  }
}
