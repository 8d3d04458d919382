package graft.cdc

import java.sql.Timestamp

/**
 * One record off the redo stream — the projection the reference reads from `v$logmnr_contents`
 * (OracleConnectorSQL2.java:5-6; fields consumed OracleSourceTask2.java:254-283 and
 * LogMinerThread2.java:144-155,249-262).
 *
 * In production this is the decoded value of a Kafka message; in tests it is built directly
 * or rendered by [[RedoGen]].
 */
final case class RedoEvent(
    scn: Long,
    commitScn: Long,
    xid: String,
    rowId: String,
    operation: String, // INSERT|UPDATE|DELETE|DDL|START|COMMIT|ROLLBACK
    timestamp: Timestamp,
    commitTimestamp: Option[Timestamp],
    segOwner: String,
    tableName: String,
    sqlRedo: String,
    csf: Boolean,          // continuation flag: statement continues in the next event
    rollback: Boolean,     // partial-rollback marker (ROLLBACK column, LogMinerThread2.java:250)
    info: String,          // "INTERNAL DDL ..." filter input
    rbasqn: Long,          // redo log sequence#, gap detection (LogMinerThread2.java:144-148)
    seq: Long = 0L)        // monotonic redo-order key (RS_ID/SSN analogue / Kafka offset):
                           // total order within a transaction even when SCNs collide —
                           // Oracle assigns one SCN to many changes; the reference relies on
                           // cursor order (LogMinerThread2.java:163-185), we sort by this

object RedoEvent {
  val Insert   = "INSERT"
  val Update   = "UPDATE"
  val Delete   = "DELETE"
  val Ddl      = "DDL"
  val Start    = "START"
  val Commit   = "COMMIT"
  val Rollback = "ROLLBACK"
  val DmlOps: Set[String] = Set(Insert, Update, Delete)

  def simple(scn: Long, xid: String, op: String, owner: String = "GRAFT", table: String = "T",
             sqlRedo: String = "", rollback: Boolean = false, rowId: String = ""): RedoEvent =
    RedoEvent(scn, 0L, xid, if (rowId.isEmpty) s"AAA$scn" else rowId, op,
      new Timestamp(scn * 1000L), None, owner, table, sqlRedo, csf = false,
      rollback = rollback, info = "", rbasqn = 1L, seq = scn)
}

/** A DML row stamped with its transaction's commit metadata (models/DMLRow.java:5-34).
  * `seq` carries the source's monotonic redo-order key through to the sink: it is the only
  * discriminator between two INDEPENDENT same-operation changes to one row at one SCN
  * (legal in Oracle redo, see RedoEvent.seq), and it is replay-stable (a redelivered record
  * keeps its offset) — so (scn, rowId, operation, seq) is the true change identity. */
final case class CommittedDml(
    xid: String,
    scn: Long,
    commitScn: Long,
    timestamp: Timestamp,
    commitTimestamp: Timestamp,
    operation: String,
    segOwner: String,
    tableName: String,
    rowId: String,
    sqlRedo: String,
    seq: Long = 0L)
