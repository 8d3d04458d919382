package graft.cdc

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/**
 * Table catalog: per-table schema metadata driving the typed projection of parsed redo
 * payloads (reference A13/A16, OracleSourceConnectorUtils2.java:156-252 dictionary load and
 * :436-465 `reSetValue` re-typing).
 *
 * Schemas are inferred lazily from parquet footers (our dictionary analogue of the
 * `dba_tab_cols` query, OracleConnectorSQL2.java:13) and cached; a DDL event evicts the
 * entry so the next DML reloads (A14, Utils:368-371). The cache is driver-side; the
 * resulting cast projection is a plain `Column` list that ships with the plan, so executors
 * never consult the catalog — the 100 TB-safe pattern (broadcast-by-plan, no per-row lookup).
 */
object Catalog {

  private val cache = TrieMap.empty[String, StructType]

  /**
   * Primary-key columns of the testdata lake's tables — the dictionary content a real
   * deployment loads via the B3 query (`SQL:13` CTE `dcc`); here the key knowledge is
   * declared since parquet footers carry no constraint metadata.
   */
  val testdataPks: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "events"     -> Seq("event_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /**
   * SURVEY §1.2: PK / unique-index membership carried as `StructField.metadata`
   * `{"pk":true,"uq":true}` — the Spark shape of the reference's per-column flags
   * (OracleConnectorSQL2.java:13 CTEs `dcc`/`duq`; models/Column.java:19-20). A MERGE /
   * upsert sink built off the envelope reads the key from here.
   */
  def withKeyMetadata(schema: StructType, pkCols: Set[String],
                      uqCols: Set[String] = Set.empty): StructType =
    StructType(schema.fields.map { f =>
      val b = new MetadataBuilder().withMetadata(f.metadata)
      if (pkCols.contains(f.name)) b.putBoolean("pk", true)
      if (uqCols.contains(f.name)) b.putBoolean("uq", true)
      f.copy(metadata = b.build())
    })

  /** Columns of a schema flagged pk (resp. uq) in their metadata. */
  def keyColumns(schema: StructType, flag: String = "pk"): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(flag) && f.metadata.getBoolean(flag) => f.name
    }

  /** Load (and cache) a table's schema from its parquet footer, with pk metadata from the
    * key dictionary ([[testdataPks]]). */
  def schemaOf(spark: SparkSession, sfDir: String, table: String): StructType =
    cache.getOrElseUpdate(s"$sfDir/$table",
      withKeyMetadata(spark.read.parquet(s"$sfDir/$table.parquet").schema,
        testdataPks.getOrElse(table, Nil).toSet))

  /** A14: DDL for a table evicts its cached schema; next access reloads. */
  def invalidate(sfDir: String, table: String): Unit = cache.remove(s"$sfDir/$table")

  /**
   * The Oracle NUMBER precision ladder (Utils:191-241): dictionary (type, precision, scale)
   * to Spark type. Mirrors the reference's choices including NUMBER-with-scale -> double
   * (lossy; the reference picks FLOAT64 deliberately, Utils:194-195).
   */
  def oracleTypeToSpark(dataType: String, precision: Int, scale: Int): DataType =
    dataType.toUpperCase match {
      case "NUMBER" =>
        // reference condition verbatim (Utils:194): scale>0 OR precision==0 -> FLOAT64 —
        // an unconstrained NUMBER (precision 0, scale 0) can hold fractions, so double
        if (scale > 0 || precision == 0) DoubleType
        else if (precision <= 2) ByteType
        else if (precision <= 4) ShortType
        else if (precision <= 9) IntegerType
        else LongType
      case "CHAR" | "VARCHAR" | "VARCHAR2" | "NCHAR" | "NVARCHAR" | "NVARCHAR2" | "LONG" | "CLOB" =>
        StringType
      case t if t == "DATE" || t.startsWith("TIMESTAMP") => TimestampType
      case _ => StringType
    }

  /**
   * Catalog-driven typed projection (A16): pull each schema column out of a parsed
   * `map<string,string>` payload column (keys are the redo statement's UPPERCASE quoted
   * identifiers) and cast to the table type. Timestamp literals keep the reference's
   * timezone-suffix truncation at '+' (Utils:456).
   */
  def castProjection(payload: Column, schema: StructType): Seq[Column] =
    schema.fields.toSeq.map { f =>
      castValue(payload.getItem(f.name.toUpperCase), f.dataType).as(f.name)
    }

  /** One string payload value -> the table type (the per-field rule of [[castProjection]],
    * shared with [[EnvelopeApply]]). */
  def castValue(raw: Column, dt: DataType): Column = dt match {
    case TimestampType => to_timestamp(regexp_replace(raw, "\\+.*$", ""))
    case _             => raw.cast(dt)
  }
}
