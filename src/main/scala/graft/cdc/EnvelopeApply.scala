package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Envelope-apply (MERGE/upsert): replay a CDC envelope stream onto a table snapshot,
 * producing the table's final state — the consumer-side last mile the reference's
 * dictionary PK flags exist for (OracleConnectorSQL2.java:13 CTEs dcc/duq;
 * models/Column.java:19-20): without the key there is no way to apply an UPDATE/DELETE
 * to a replica. Envelope null rules per operation are the reference's
 * (Utils:389-415): INSERT/UPDATE carry `data`, DELETE carries only `before`.
 *
 * Spark shape (100 TB posture): ONE shuffle — events group on the PK extracted from the
 * payload maps, fold to per-key final state with a native `aggregate` over the
 * `(commit_scn, scn, seq)`-sorted event list (per-key event cardinality is bounded by
 * change volume per key, the same bound as any keyed-state CDC applier), then a single
 * co-partitioned full-outer join against the snapshot on the same key. No window over
 * the whole stream, no driver-side state; every step is codegen'd Column algebra.
 */
object EnvelopeApply {

  /**
   * @param snapshot  current table state, columns = `schema` (keys unique)
   * @param enveloped [[CdcPipeline.envelope]] output for ONE table, with `commit_scn`
   *                  and `seq` passthrough columns (ordering is `(commit_scn, scn, seq)`,
   *                  the reference's commit-ordered emission, LogMinerThread2.java:158-298)
   * @param schema    table schema carrying pk flags ([[Catalog.withKeyMetadata]])
   */
  def apply(snapshot: DataFrame, enveloped: DataFrame, schema: StructType): DataFrame = {
    val pk = Catalog.keyColumns(schema)
    require(pk.nonEmpty, "schema carries no pk metadata — see Catalog.withKeyMetadata")

    // PK lives in `data` for INSERT/UPDATE and only in `before` for DELETE
    val keyCols = pk.map { p =>
      Catalog.castValue(
        coalesce(col("data").getItem(p.toUpperCase), col("before").getItem(p.toUpperCase)),
        schema(p).dataType).as(p)
    }
    val keyed = enveloped.select(
      keyCols :+ struct(col("commit_scn"), col("scn"), col("seq"),
        col("operation"), col("data")).as("e"): _*)

    // total order within a key; struct<..., map> is not orderable, so sort_array is out —
    // a comparator lambda over the ordering fields keeps the map payload along for free
    def cmp(name: String)(l: Column, r: Column): Column =
      when(l.getField(name) < r.getField(name), -1)
        .when(l.getField(name) > r.getField(name), 1).otherwise(0)
    val byCommitOrder = (l: Column, r: Column) => {
      val c1 = cmp("commit_scn")(l, r)
      val c2 = cmp("scn")(l, r)
      when(c1 =!= 0, c1).otherwise(when(c2 =!= 0, c2).otherwise(cmp("seq")(l, r)))
    }

    val emptyMap = map().cast(MapType(StringType, StringType))
    def state(deleted: Column, m: Column) = struct(deleted.as("deleted"), m.as("m"))
    // fold the ordered events into (deleted, column map): INSERT replaces wholesale,
    // UPDATE overlays (its data is already before+SET per the parser, so set columns
    // win), DELETE tombstones; an INSERT after a DELETE resurrects the key
    val folded = aggregate(
      array_sort(collect_list(col("e")), byCommitOrder),
      state(lit(false), emptyMap),
      (acc, e) => {
        val data = coalesce(e.getField("data"), emptyMap)
        val overlaid = map_zip_with(acc.getField("m"), data, (_, v1, v2) => coalesce(v2, v1))
        when(e.getField("operation") === RedoEvent.Insert, state(lit(false), data))
          .when(e.getField("operation") === RedoEvent.Delete, state(lit(true), emptyMap))
          .otherwise(state(lit(false), overlaid))
      })
    val changes = keyed.groupBy(pk.map(col): _*).agg(folded.as("f"))

    // snapshot ⟗ changes on the pk: tombstoned keys drop, changed columns overlay the
    // snapshot value, untouched keys pass through, new keys materialize from the fold
    snapshot.as("s").join(changes.as("c"), pk, "full_outer")
      .filter(!coalesce(col("c.f.deleted"), lit(false)))
      .select(schema.fields.toSeq.map { f =>
        if (pk.contains(f.name)) col(f.name)
        else coalesce(
          Catalog.castValue(col("c.f.m").getItem(f.name.toUpperCase), f.dataType),
          col(s"s.${f.name}")).as(f.name)
      }: _*)
  }
}
