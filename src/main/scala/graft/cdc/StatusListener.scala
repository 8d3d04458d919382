package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * A24 — run-status side channel. The reference inserts a run row into
 * `TM2_LOGMINER_OFFSET` at start and calls `SP2_UPD_SERVER_STATUS('RUNNING'|'FAILED')` on
 * transitions (OracleSqlUtils2.java:121-146,164-178; OracleSourceTask2.java:197-205,315-367).
 * Spark's native analogue is a [[StreamingQueryListener]]; status and progress land as
 * JSON lines in a driver-local file (swap for a JDBC/Delta append in production). The
 * streaming checkpoint stays the source of truth for resume — this is monitoring only.
 */
final class StatusListener(path: String) extends StreamingQueryListener {

  // full JSON string escaping ([[graft.JsonText]]) — terminated-query events carry
  // multi-line stack traces, and a raw newline would split the JSONL record exactly on
  // the FAILED lines
  private def esc(s: String): String = graft.JsonText.escape(s)

  private def append(kind: String, fields: (String, String)*): Unit = {
    val body = fields.map { case (k, v) => s""""$k":"${esc(v)}"""" }.mkString(",")
    val line = s"""{"event":"$kind",$body}""" + "\n"
    Files.write(Paths.get(path), line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    append("RUNNING", "id" -> e.id.toString, "name" -> String.valueOf(e.name), "ts" -> e.timestamp)

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    append("PROGRESS", "id" -> e.progress.id.toString,
      "batchId" -> e.progress.batchId.toString,
      "numInputRows" -> e.progress.numInputRows.toString,
      "ts" -> e.progress.timestamp)

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    append(if (e.exception.isDefined) "FAILED" else "STOPPED",
      "id" -> e.id.toString, "error" -> e.exception.getOrElse(""))
}
