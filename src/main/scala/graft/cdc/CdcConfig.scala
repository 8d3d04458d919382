package graft.cdc

/**
 * A26 — engine configuration (reference OracleSourceConnectorConfig2.java:41-64, 17 keys).
 * Connection/JDBC keys disappear (the source is a Kafka/parquet/memory stream); what remains
 * are the semantic knobs. Validation mirrors Connector:27-34 (db name + whitelist required).
 *
 * @param dbAlias             topic prefix ({db.name.alias}, Config:19)
 * @param whitelist           (owner, table) pairs, "*" table wildcard (table.whitelist, Config:21)
 * @param blacklist           same shape, negated (table.blacklist, Config:27)
 * @param dmlTypes            operations to emit (dml.types, Config:28)
 * @param parseDmlData        build data/before payloads (parse.dml.data, Config:25)
 * @param heartbeatTable      "OWNER.TABLE" routed to the heartbeat branch (Config:31)
 * @param unescapeStrings     unescape doubled quotes in literals (map.unescaped.strings, Config:29)
 * @param abandonedTxnTimeout eviction timeout for open transactions (our documented
 *                            deviation from the reference's unbounded state)
 * @param maxBufferedRows     per-transaction buffer cap (100 TB posture: one runaway bulk
 *                            transaction must not OOM an executor)
 * @param startScn            resume override: mine from this SCN instead of the stored
 *                            offset (start.scn, Config:24; applied Task:168-173)
 * @param resetOffset         resume override: discard the stored offset and start from the
 *                            current tip (reset.offset, Config:30; applied Task:175-192) —
 *                            beats startScn, matching the reference's override order
 */
final case class CdcConfig(
    dbAlias: String,
    whitelist: Seq[(String, String)],
    blacklist: Seq[(String, String)] = Nil,
    dmlTypes: Seq[String] = Seq(RedoEvent.Insert, RedoEvent.Update, RedoEvent.Delete, RedoEvent.Ddl),
    parseDmlData: Boolean = true,
    heartbeatTable: Option[String] = None,
    unescapeStrings: Boolean = true,
    abandonedTxnTimeout: Option[String] = Some("1 hour"),
    maxBufferedRows: Int = 1 << 20,
    startScn: Option[Long] = None,
    resetOffset: Boolean = false) {
  require(dbAlias.nonEmpty, "dbAlias must be set (reference Connector:27-30)")
  require(whitelist.nonEmpty, "whitelist must be set (reference Connector:31-34)")
  require(heartbeatTable.forall(_.matches("[^.]+\\.[^.]+")),
    s"heartbeatTable must be OWNER.TABLE, got: ${heartbeatTable.getOrElse("")}")
  require(startScn.forall(_ > 0L), "startScn must be positive when set (Task:168-173)")

  /** The resolved resume posture given a stored offset and the current tip (A5). */
  def resume(stored: Option[(Long, Long, String)], currentScn: => Long)
      : graft.sources.RedoEventSource.ResumePosition =
    graft.sources.RedoEventSource.resolveResume(stored, startScn, resetOffset, currentScn)
}
