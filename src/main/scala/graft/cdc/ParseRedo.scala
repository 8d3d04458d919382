package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/**
 * Spark surface of [[RedoSqlParser]] (A12): a deterministic scalar UDF producing the parsed
 * struct `(operation, owner, table, data, before, ok)` with `data`/`before` as
 * `map<string,string>` — exactly the `parseSql` output shape of the reference
 * (OracleSourceConnectorUtils2.java:270-271,354-357).
 *
 * SQL-NULL column values are omitted from the maps (a map<string,string> cannot hold null
 * values); the envelope projection reintroduces them as typed nulls via [[Catalog]] casts —
 * same observable behavior as the reference's null struct fields (Utils:392,397,405).
 *
 * A UDF (not a Catalyst Expression) is deliberate: the parse is a pure per-row string
 * transform dominated by tokenizer work, and `asNondeterministic` is NOT set, so Catalyst
 * still prunes/pushes around it. Marked for a CodegenFallback Expression upgrade if the
 * parse ever shows up in profiles.
 */
object ParseRedo {

  final case class Parsed(
      operation: String,
      owner: String,
      table: String,
      data: Map[String, String],
      before: Map[String, String],
      ok: Boolean)

  private val empty = Parsed("", "", "", Map.empty, Map.empty, ok = false)

  /**
   * Marked nondeterministic ON PURPOSE (it is pure): CollapseProject inlines deterministic
   * expressions into every field reference, so `parsed.data` + `parsed.before` + `parsed.ok`
   * would each re-run the whole parse per row. The nondeterministic flag pins the UDF to a
   * single evaluation per row (3-4x less parse work in the envelope path).
   */
  def mkParseUdf(unescape: Boolean): UserDefinedFunction = udf { (sqlRedo: String) =>
    if (sqlRedo == null) empty
    else RedoSqlParser.parseOpt(sqlRedo, unescape) match {
      case Some(p) => Parsed(p.operation, p.owner, p.table, p.dataMap, p.beforeMap, ok = true)
      case None    => empty
    }
  }.asNondeterministic()

  val parseUdf: UserDefinedFunction = mkParseUdf(unescape = true)
  private val parseUdfNoUnescape: UserDefinedFunction = mkParseUdf(unescape = false)

  /** `parse(sql_redo)` as a column: struct(operation, owner, table, data, before, ok).
    * `unescape` maps the reference's map.unescaped.strings knob (Config:29). */
  def parse(sqlRedo: Column, unescape: Boolean = true): Column =
    if (unescape) parseUdf(sqlRedo) else parseUdfNoUnescape(sqlRedo)
}
