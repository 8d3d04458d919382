package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata dirs (TESTDATA.md).
  *
  * `events.ts` is TIMESTAMP(NANOS), which Spark 4 refuses at schema inference unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` (the column then reads as LongType, nanos
  * since epoch). That conf is set ONCE at session construction by every entry point
  * (Bench/Verify/BenchOne/Explain/SparkTestSession) — a table loader mutating shared
  * session state as a read side effect is action-at-a-distance, so it does not happen here.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Canonical `ts` representation is nanos-since-epoch LongType (historical driver dirs
    // wrote TIMESTAMP(NANOS), read as LongType under nanosAsLong). Micros dirs appear two
    // ways — GenScale-derived dirs as TIMESTAMP (LTZ), and the round-10 driver testdata as
    // TIMESTAMP_NTZ (pyarrow timestamp[us], isAdjustedToUTC=false) — so normalize BOTH on
    // read: every query (and every `ts div 1000` in the suite) sees ONE type at every
    // scale. The NTZ wall-clock is reinterpreted in the session zone (every entry point
    // pins UTC), which is the instant the driver wrote. withColumn keeps the column's
    // position, so schema order is unchanged.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.find(f => f.name == "ts" &&
        (f.dataType == TimestampType || f.dataType == TimestampNTZType)) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(df("ts").cast(TimestampType)) * 1000L)
      case None => df
    }
  }

  /** Money as integer cents — THE cross-engine determinism invariant for currency math
    * (see the Relational/Temporal file headers): summing doubles is order-dependent, so
    * Spark's partial aggregates and DuckDB's serial fold would drift in the last bits;
    * integer cents make the sum exact and the oracle hash stable. One shared definition —
    * a per-file copy could drift (e.g. one side gaining half-even rounding) and the
    * oracle gates of the two query families would silently disagree. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.round(c * 100).cast("long")
}

/** Bucketed-table layout for the co-located join demo (`q_bucketed_join`): writes a
  * testdata table ONCE per (session, sf dir) bucketed + sorted on its join key into a
  * tmpdir warehouse, registers it in the session catalog, and reuses it on every later
  * call — the organize-on-write that lets fact-fact joins run with zero exchanges.
  *
  * 8 buckets matches the suite's shuffle parallelism at test scale; a production layout
  * picks bucket count from target file size (~SF × rows/8 per bucket file). The write is
  * serialized JVM-wide: parallel test suites share one SparkSession, and two racing
  * saveAsTable calls to the same path would corrupt the layout.
  */
object BucketedTables {
  private val lock = new Object
  private val NumBuckets = 8

  def ensure(spark: SparkSession, sfDir: String, table: String, key: String): String =
    lock.synchronized {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_${table}_b$tag"
      if (!spark.catalog.tableExists(name)) {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$tag/$name"
        Tables(spark, sfDir, table).write
          .bucketBy(NumBuckets, key).sortBy(key)
          .option("path", path).mode("overwrite")
          .format("parquet").saveAsTable(name)
      }
      name
    }
}
