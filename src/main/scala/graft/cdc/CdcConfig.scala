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

  /** The resolved resume posture given a stored offset and the current tip (A5). Pass the
    * checkpointed order key as `storedSeq` so the boundary skip is the loss-free
    * `seq > boundary` form rather than the triple-lexicographic parity fallback. */
  def resume(stored: Option[(Long, Long, String)], currentScn: => Long,
             storedSeq: Option[Long] = None)
      : graft.sources.RedoEventSource.ResumePosition =
    graft.sources.RedoEventSource.resolveResume(stored, startScn, resetOffset, currentScn,
      storedSeq)
}

object CdcConfig {

  /**
   * A26 — the reference's string-properties parse surface
   * (OracleSourceConnectorConfig2.java:41-64): CSV `OWNER.TABLE` / `OWNER.*` lists for
   * `table.whitelist`/`table.blacklist`, CSV `dml.types` (empty = all), STRING-typed
   * `start.scn` with `""` meaning unset (Config:55 defines it as Type.STRING, default ""),
   * boolean `parse.dml.data` / `reset.offset` / `map.unescaped.strings` (the last
   * defaulting FALSE, Config:58 — the only boolean the reference defaults). Connection
   * keys (`db.hostname`, `db.user`, ...) and unknown keys are ignored, as Kafka's
   * `AbstractConfig` ignores unconfigured keys. Malformed values fail fast with the key
   * name — a config typo must kill the job at start, not mis-capture silently.
   */
  def fromMap(props: Map[String, String]): CdcConfig = {
    def bool(key: String, dflt: Boolean): Boolean =
      props.get(key).map(_.trim.toLowerCase(java.util.Locale.ROOT)).map {
        case "true" => true
        case "false" => false
        case v => throw new IllegalArgumentException(s"$key must be true/false, got: $v")
      }.getOrElse(dflt)
    def tableList(key: String): Seq[(String, String)] =
      props.get(key).map(_.trim).filter(_.nonEmpty).toSeq
        .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .map { entry =>
          entry.split("\\.") match {
            case Array(owner, table) => (owner, table)
            case _ => throw new IllegalArgumentException(
              s"$key entries must be OWNER.TABLE or OWNER.*, got: $entry")
          }
        }
    val startScn = props.get("start.scn").map(_.trim).filter(_.nonEmpty).map { v =>
      try v.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"start.scn must be numeric, got: $v")
      }
    }
    val knownOps = Seq(RedoEvent.Insert, RedoEvent.Update, RedoEvent.Delete, RedoEvent.Ddl)
    val dmlTypes = props.get("dml.types").map(_.trim).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toUpperCase(java.util.Locale.ROOT)).filter(_.nonEmpty))
      .getOrElse(knownOps)
    // a typo'd operation would silently exclude a whole DML class from capture — the
    // exact silent mis-capture this parse surface promises to prevent
    dmlTypes.find(!knownOps.contains(_)).foreach(bad =>
      throw new IllegalArgumentException(
        s"dml.types must be among ${knownOps.mkString(",")}, got: $bad"))
    CdcConfig(
      dbAlias = props.getOrElse("db.name.alias",
        throw new IllegalArgumentException("db.name.alias must be set (Connector:27-30)")),
      whitelist = tableList("table.whitelist"),
      blacklist = tableList("table.blacklist"),
      dmlTypes = dmlTypes,
      parseDmlData = bool("parse.dml.data", dflt = true),
      heartbeatTable = props.get("heartbeat.table").map(_.trim).filter(_.nonEmpty),
      unescapeStrings = bool("map.unescaped.strings", dflt = false),
      startScn = startScn,
      resetOffset = bool("reset.offset", dflt = false))
  }
}
