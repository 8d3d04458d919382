package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{RedoEvent, TxnAssembler}

/**
 * Multi-partition Kafka ordering contract (r10 verdict #3): BASELINE.md claims per-XID
 * order survives "whenever the producer keys by XID" — one transaction lives in one
 * partition, Kafka guarantees order only within a partition, and per-partition offsets
 * OVERLAP across partitions (each starts at 0). The golden capture
 * `golden_kafka_frames_multipart.jsonl` pins exactly that adversarial shape: three
 * concurrent transactions pinned to partitions 0/1/2, frames interleaved in a scrambled
 * global arrival order (per-partition order preserved — the only thing Kafka promises),
 * one transaction's INSERT split as a CSF run, one rolled back. Decode + assembly must
 * reconstruct every committed transaction exactly — fused statements, commit stamping,
 * rollback discard — with no cross-partition contamination from the colliding offsets.
 */
class KafkaMultiPartitionSpec extends AnyFunSuite {

  private val goldenPath = "src/test/resources/golden_kafka_frames_multipart.jsonl"
  private val XidA = "10.1.100"
  private val XidB = "20.2.200"
  private val XidC = "30.3.300"
  private val InsA = "insert into \"GRAFT\".\"ORDERS\"(\"ID\",\"STATUS\") values (1,'A')"
  private val InsB = "insert into \"GRAFT\".\"ORDERS\"(\"ID\",\"STATUS\") values (2,'B')"

  private def goldenFrames: DataFrame = {
    val spark = graft.SparkTestSession.spark
    spark.read
      .schema(StructType(Seq(
        StructField("key_b64", StringType), StructField("value_b64", StringType),
        StructField("topic", StringType), StructField("partition", IntegerType),
        StructField("offset", LongType), StructField("timestamp_ms", LongType),
        StructField("timestampType", IntegerType))))
      .json(goldenPath)
      .select(unbase64(col("key_b64")).as("key"), unbase64(col("value_b64")).as("value"),
        col("topic"), col("partition"), col("offset"),
        timestamp_millis(col("timestamp_ms")).as("timestamp"), col("timestampType"))
  }

  test("frames keyed by XID land on one partition each; offsets collide across partitions") {
    val perXid = goldenFrames
      .select(col("key").cast("string").as("xid"), col("partition"), col("offset"))
      .collect().groupBy(_.getString(0))
    assert(perXid.keySet === Set(XidA, XidB, XidC))
    // the keyed-producer contract: each transaction's frames share ONE partition
    perXid.foreach { case (xid, rows) =>
      assert(rows.map(_.getInt(1)).distinct.length === 1, s"$xid spans partitions")
    }
    // and the fixture is adversarial: offset 0 exists in EVERY partition, so any code
    // treating the offset as a global order key would interleave transactions wrongly
    assert(perXid.values.map(_.map(_.getLong(2)).min).toSeq === Seq(0L, 0L, 0L))
  }

  test("partition-parallel decode + batch assembly reconstructs each transaction in per-XID order") {
    val decoded = RedoEventSource.fromKafka(goldenFrames)
    val out = TxnAssembler.assembleBatch(decoded).collect()
    val byXid = out.groupBy(_.xid).map { case (x, rows) =>
      x -> rows.sortBy(r => (r.scn, r.seq)).toSeq
    }
    // rolled-back C emits nothing; A and B emit exactly their DML
    assert(byXid.keySet === Set(XidA, XidB))
    val a = byXid(XidA)
    assert(a.map(_.operation) === Seq("INSERT", "UPDATE"))
    assert(a.head.sqlRedo === InsA, "the CSF run must fuse back to the full statement")
    assert(a.forall(_.commitScn === 110L), "commit stamping from A's own COMMIT")
    val b = byXid(XidB)
    assert(b.map(_.operation) === Seq("INSERT", "UPDATE"))
    assert(b.head.sqlRedo === InsB)
    assert(b.forall(_.commitScn === 111L))
  }

  test("streaming assembly across a mid-transaction batch cut matches the batch answer") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    val decoded = RedoEventSource.fromKafka(goldenFrames).collect().toSeq
    // batch 1 = each partition's first two frames IN PARTITION ORDER (every transaction
    // is cut mid-flight, A mid-CSF-run); batch 2 = the rest — the keyed state must carry
    // open buffers and the open fragment run across the micro-batch boundary
    val firstTwo = decoded.groupBy(_.xid).values.flatMap(_.sortBy(_.seq).take(2)).toSeq
    val rest = decoded.diff(firstTwo)
    val streamed = graft.engine.StreamGate.runBatches(
        spark, Encoders.product[RedoEvent], "kafka_multipart_sink",
        Seq(firstTwo, rest)) { ds =>
      TxnAssembler.assembleStreaming(ds, abandonedTxnTimeout = None).toDF()
    }.collect().map(_.toString).sorted.toSeq
    val batch = TxnAssembler.assembleBatch(RedoEventSource.fromKafka(goldenFrames))
      .toDF().collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
