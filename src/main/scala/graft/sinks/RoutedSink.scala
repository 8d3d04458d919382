package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.cdc.Catalog

/**
 * A22 (sink side) — routed delivery of the enveloped change stream. The reference hands
 * each record to Kafka Connect with a per-table topic (OracleSourceTask2.java:300-304);
 * here the `topic` column drives either the Kafka sink directly (it honors a `topic`
 * column natively) or a parquet lake layout partitioned by topic.
 *
 * A14 wiring note: DDL handling happens per micro-batch on the driver BEFORE the typed
 * casts of that batch are planned — matching the reference's evict-then-reload-on-next-DML
 * order (OracleSourceConnectorUtils2.java:368-378).
 */
object RoutedSink {

  /** One batch to a topic-partitioned parquet lake (append). */
  def writeBatch(enveloped: DataFrame, baseDir: String): Unit =
    enveloped.write.mode("append").partitionBy("topic").parquet(baseDir)

  /**
   * Exactly-once posture (SURVEY §7 hard-part 5): the change identity is
   * `(SCN, ROW_ID, OPERATION, seq)` — the reference's offset triple (Task:413-420) plus the
   * monotonic redo-order key. `seq` matters: Oracle legally emits two independent
   * same-operation changes to one row at one SCN (the case CSF run-splitting preserves), and
   * only `seq` tells them apart, while a REPLAYED record keeps its seq — so the dedup kills
   * redelivery without ever collapsing distinct changes. A replayed micro-batch (restart
   * between sink write and checkpoint commit) can re-deliver rows; dropping duplicates on
   * the identity inside the batch, and MERGEing on it at the lake boundary, makes
   * redelivery harmless. The parquet lake here is append-only, so this dedup covers the
   * within-batch replay; a transactional table format (or Kafka's idempotent producer keyed
   * the same way) carries the cross-batch guarantee.
   */
  def dedupByIdentity(enveloped: DataFrame): DataFrame =
    enveloped.dropDuplicates(
      Seq("scn", "row_id", "operation") ++
        (if (enveloped.columns.contains("seq")) Seq("seq") else Nil))

  /**
   * A14 — apply DDL invalidations of one micro-batch: every table named by a DDL event is
   * evicted from the schema catalog so the next DML against it reloads fresh metadata.
   * Returns the invalidated table names (driver-side; DDL cardinality per batch is tiny).
   */
  def applyDdlInvalidations(enveloped: DataFrame, sfDir: String): Seq[String] = {
    val tables = enveloped
      .filter(enveloped("operation") === graft.cdc.RedoEvent.Ddl)
      .select("table_name").distinct().collect()
      .map((r: Row) => r.getString(0)).toSeq
    tables.foreach(t => Catalog.invalidate(sfDir, t.toLowerCase))
    tables
  }

  /**
   * Streaming delivery: foreachBatch doing DDL invalidation then the routed write.
   *
   * DELIVERY GUARANTEE (ADVICE r3): this wiring is AT-LEAST-ONCE, not exactly-once.
   * [[dedupByIdentity]] deduplicates within one micro-batch frame only; a restart between
   * the parquet append and the checkpoint commit replays the batch and appends its rows a
   * second time — the append-only lake has no transactional boundary to reject them.
   * Closing that gap needs cross-batch idempotence at the sink: batchId-keyed staging
   * directories promoted atomically, a transactional table format MERGEing on the change
   * identity, or Kafka's idempotent producer keyed the same way. Downstream consumers of
   * this lake must either tolerate duplicates or apply the identity dedup at read time.
   */
  def start(enveloped: DataFrame, baseDir: String, checkpoint: String, sfDir: String): StreamingQuery = {
    val writer: DataStreamWriter[Row] = enveloped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyDdlInvalidations(batch, sfDir)
        writeBatch(dedupByIdentity(batch), baseDir)
      }
    writer.start()
  }
}
