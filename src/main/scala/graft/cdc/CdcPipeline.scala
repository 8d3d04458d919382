package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The CDC dataflow as pure Column algebra: the reference's per-record filter/route/envelope
 * stages (Layer A) as composable predicates over a redo-event DataFrame with columns
 * `scn, commit_scn, row_id, xid, operation, timestamp, seg_owner, table_name, sql_redo,
 * info, ...`.
 *
 * Each stage cites its reference behavior; all are narrow codegen'd expressions that
 * Catalyst pushes into the scan (predicate pushdown replaces the reference's hand-built
 * WHERE fragment, OracleSourceConnectorUtils2.java:132-154).
 */
object CdcPipeline {

  /** A8 (Task:275): drop records whose redo mentions temporary tables. */
  val tempTableFilter: Column = !col("sql_redo").contains("temporary tables")

  /** A9 (Task:276): drop internal DDL (INFO starts with 'INTERNAL DDL'). */
  val internalDdlFilter: Column =
    !(col("operation") === RedoEvent.Ddl && col("info").startsWith("INTERNAL DDL"))

  /** A10 (Task:296-300): keep only configured operation types. */
  def operationFilter(types: Seq[String]): Column = col("operation").isin(types: _*)

  /** A15 (Utils:374-376): topic-safe table names only. */
  val validTableName: Column = col("table_name").rlike("^[\\w.-]+$")

  /**
   * A11 (Utils:132-154): whitelist of (owner, table) pairs; table "*" is a per-owner
   * wildcard. Folds to a single boolean Column that Catalyst pushes to the source scan.
   */
  def whitelist(patterns: Seq[(String, String)]): Column =
    patterns.map {
      case (owner, "*")   => col("seg_owner") === owner
      case (owner, table) => col("seg_owner") === owner && col("table_name") === table
    }.reduceOption(_ || _).getOrElse(lit(true))

  /** A11 blacklist variant: whitelist negated (Utils:147-151). */
  def blacklist(patterns: Seq[(String, String)]): Column = !whitelist(patterns)

  /**
   * A22 (Task:286, Thread:273-276, Schema:66): per-event target topic
   * `{alias}.{owner}.{table}` uppercased; DDL routes to `{alias}.{owner}._GENERIC_DDL`.
   */
  def topic(dbAlias: String): Column =
    upper(concat_ws(".", lit(dbAlias), col("seg_owner"),
      when(col("operation") === RedoEvent.Ddl, lit("_GENERIC_DDL")).otherwise(col("table_name"))))

  /**
   * A18 (Utils:361-434): envelope projection over a frame that already has a `parsed`
   * struct column (from [[ParseRedo.parse]]). Null rules per operation (Utils:389-415):
   * INSERT -> data only; UPDATE -> both (data = before overlaid with SET, done by the
   * parser); DELETE -> before only; DDL and unparsable -> both null.
   */
  def envelope(df: DataFrame, dbAlias: String): DataFrame = {
    val op = col("operation")
    df.select(
      col("scn"), col("xid"), col("row_id"), col("seg_owner"), col("table_name"),
      col("operation"), col("sql_redo"),
      when(op.isin(RedoEvent.Insert, RedoEvent.Update) && col("parsed.ok"), col("parsed.data"))
        .as("data"),
      when(op.isin(RedoEvent.Update, RedoEvent.Delete) && col("parsed.ok"), col("parsed.before"))
        .as("before"),
      topic(dbAlias).as("topic"))
  }
}
