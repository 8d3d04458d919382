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

  /** One Misra–Gries fold step over a bounded counter map — shared by the batch
    * per-partition pass and the streaming per-shard state merge (feeding micro-batches
    * sequentially into the SAME map is, by construction, MG over the concatenated shard
    * stream, so the survival guarantee carries across batch boundaries unchanged). */
  private def foldInto(m: scala.collection.mutable.LongMap[Long],
                       it: Iterator[Long], cap: Int): Unit =
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

  /** Surviving candidate keys of every partition (with multiplicity across partitions —
    * callers `distinct()` before broadcasting). */
  def candidates(keys: Dataset[Long], capacity: Long): Dataset[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val cap = capacity.toInt
    keys.mapPartitions { it =>
      val m = scala.collection.mutable.LongMap.empty[Long]
      foldInto(m, it, cap)
      m.keysIterator.toArray.iterator
    }
  }

  /** Keyed state of the STREAMING sketch: one bounded counter map per shard plus a
    * per-invocation version (the terminal reduce keeps only each shard's newest
    * emission — earlier micro-batches' candidate sets are superseded, not additive). */
  final case class MgShardState(counts: Map[Long, Long], ver: Int)

  /** One emitted candidate: `shard`'s summary as of invocation `ver` contains `user_id`. */
  final case class MgEmit(shard: Int, user_id: Long, ver: Int)

  /** Streaming Misra–Gries candidates over a `(shard, key)` stream — the skew-proof
    * sibling of the windowed leaderboard (r10 verdict #4): each shard's
    * flatMapGroupsWithState group folds its micro-batch into the bounded counter map
    * (state = at most `capacity` counters per shard, NEVER key cardinality) and re-emits
    * its full current summary stamped with an invocation version.
    *
    * Guarantee: shards are keyed BY the item key (`hash(key) -> shard`), so a key's whole
    * stream lands in one shard and the single-stream MG bound applies per shard: any key
    * with count > n_shard/capacity >= N_total/capacity survives that shard's final
    * summary. The union of final summaries is therefore a superset of every global
    * phi=1/capacity heavy hitter, and the caller's exact recount loses nothing. */
  def streamCandidates(keys: Dataset[(Int, Long)], capacity: Long): Dataset[MgEmit] = {
    val spark = keys.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val cap = capacity.toInt
    keys.groupByKey(_._1).flatMapGroupsWithState[MgShardState, MgEmit](
      OutputMode.Append, GroupStateTimeout.NoTimeout) { (shard, it, state) =>
      val m = scala.collection.mutable.LongMap.empty[Long]
      state.getOption.foreach(_.counts.foreach { case (k, v) => m(k) = v })
      foldInto(m, it.map(_._2), cap)
      val ver = state.getOption.map(_.ver).getOrElse(0) + 1
      state.update(MgShardState(m.toMap, ver))
      m.keysIterator.toArray.iterator.map(k => MgEmit(shard, k, ver))
    }
  }
}
