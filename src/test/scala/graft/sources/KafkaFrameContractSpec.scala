package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.RedoEvent

/**
 * A1/A2 golden-frame CONTRACT test (r7 verdict #7): no broker exists in this sandbox, so
 * the one seam a real `spark.readStream.format("kafka")` wiring would cross — the binary
 * frame shape `RedoEventSource.fromKafka` decodes — is pinned against a golden capture
 * committed at `src/test/resources/golden_kafka_frames.jsonl` (base64 wire bytes). The
 * frames carry the EXACT column set and types the Kafka source produces
 * (key/value binary, topic string, partition int, offset long, timestamp, timestampType),
 * so swapping the parquet/MemoryStream test feed for a genuine Kafka source is a config
 * change, not a code change. A change to the wire format breaks this suite loudly instead
 * of surfacing as a production decode failure.
 */
class KafkaFrameContractSpec extends AnyFunSuite {

  private val goldenPath = "src/test/resources/golden_kafka_frames.jsonl"

  /** The exact schema `spark.readStream.format("kafka")` exposes (Kafka source docs). */
  private val kafkaSourceSchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

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

  private def ts(ms: Long) = new Timestamp(ms)
  private val expected = Seq(
    RedoEvent(1001L, 1005L, "7.33.4021", "AAAR5TAAEAAAACXAAA", "INSERT",
      ts(1768471200000L), Some(ts(1768471205000L)), "GRAFT", "CUSTOMER",
      "insert into \"GRAFT\".\"CUSTOMER\"(\"ID\",\"NAME\") values ('1','O''Brien')",
      csf = false, rollback = false, info = "", rbasqn = 7L, seq = 100L),
    RedoEvent(1010L, 1010L, "7.33.4021", "", "COMMIT",
      ts(1768471206000L), None, "", "", "",
      csf = false, rollback = false, info = "", rbasqn = 7L, seq = 101L),
    RedoEvent(1011L, 0L, "8.12.900", "AAAR5TAAEAAAACXAAB", "UPDATE",
      ts(1768471207000L), None, "GRAFT", "ORDERS",
      "update \"GRAFT\".\"ORDERS\" set \"STATUS\" = 'P' where \"ID\" = ",
      csf = true, rollback = false, info = "", rbasqn = 8L, seq = 102L))

  test("golden frames carry the Kafka source's exact column set and types") {
    assert(goldenFrames.schema == kafkaSourceSchema,
      s"fixture drifted from the Kafka source schema:\n${goldenFrames.schema.treeString}")
  }

  test("fromKafka decodes the golden frames; corrupt/identity-less frames are dropped") {
    val decoded = RedoEventSource.fromKafka(goldenFrames).collect().sortBy(_.seq).toSeq
    // offsets 103 (not JSON) and 104 (missing scn) must be dropped, never throw (A25)
    assert(decoded.map(_.seq) == Seq(100L, 101L, 102L))
    assert(decoded == expected)
  }

  test("toKafkaValue round-trips to the golden wire bytes (key = xid, value = JSON)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rendered = RedoEventSource.toKafkaValue(spark.createDataset(expected))
      .collect().map(r => (r.getAs[Long]("offset"),
        new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).sortBy(_._1)
    val golden = goldenFrames.filter(col("offset") < 103)
      .collect().map(r => (r.getAs[Long]("offset"),
        new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).sortBy(_._1)
    rendered.zip(golden).foreach { case (a, b) =>
      assert(a == b, s"wire drift at offset ${b._1}:\n  rendered: $a\n  golden:   $b")
    }
  }
}
