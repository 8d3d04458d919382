package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The generic batch SCD2 version-frame builder behind `cdc_scd2_history` /
 * `cdc_asof_snapshot` (CdcQueries) and the property-based history oracle
 * (CdcRoundTripSpec): given one frame of base rows and committed envelope ops, attach to
 * every row the FULL overlaid state at that point plus its lead-closed interval end.
 *
 * Overlay semantics are the envelope's three-way rule per column: data-map key present
 * with a value → set; present with NULL → explicit null (a struct wrap keeps
 * `last(ignoreNulls)` from skipping it); absent → carry. Delete markers stay in the
 * frame — callers decide whether they close intervals (history), kill keys (as-of), or
 * mark model deletions (the property oracle).
 */
object Scd2 {

  /**
   * @param union  rows `(keyCol: long, scn: long, operation: string,
   *               data: map<string,string>)` — base rows (all columns present in `data`)
   *               unioned with committed envelope ops; scns unique per key
   * @param keyCol the key column name
   * @param cols   `(outputColumn, dataMapKey)` pairs to materialize as state
   */
  def versionFrame(union: DataFrame, keyCol: String,
                   cols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wState = Window.partitionBy(col(keyCol)).orderBy(col("scn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(col(keyCol)).orderBy(col("scn"))
    def stateOf(k: String): Column =
      last(when(map_contains_key(col("data"), k), struct(col("data").getItem(k).as("v"))),
        ignoreNulls = true).over(wState).getField("v")
    cols.foldLeft(union) { case (df, (out, key)) => df.withColumn(out, stateOf(key)) }
      .withColumn("valid_to_scn", lead(col("scn"), 1).over(wLead))
  }
}
