package graft.cdc

import org.apache.spark.sql.Dataset

/**
 * A7 — continuation-row (CSF) reassembly. LogMiner splits a long redo statement across
 * consecutive rows with CSF=1 on every fragment but the last; the reference concatenates
 * SQL_REDO while the cursor reports CSF=1 (OracleSourceTask2.java:277-281,
 * LogMinerThread2.java:265-269).
 *
 * Fragments of one statement share (xid, scn, rowId) and are ordered by the monotonic
 * `seq`, so the fuse is a keyed group concat — one shuffle on the fragment key. When the
 * upstream producer already fuses fragments (the common Kafka deployment), this stage is a
 * no-op pass-through and can be skipped.
 */
object Csf {

  def fuse(events: Dataset[RedoEvent]): Dataset[RedoEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.xid, e.scn, e.rowId))
      .mapGroups { (_, it) =>
        val sorted = it.toVector.sortBy(_.seq)
        if (sorted.length == 1) sorted.head
        else sorted.head.copy(
          sqlRedo = sorted.map(_.sqlRedo).mkString,
          csf = false)
      }
  }
}
