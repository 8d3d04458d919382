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
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Money as integer cents — THE cross-engine determinism invariant for currency math
    * (see the Relational/Temporal file headers): summing doubles is order-dependent, so
    * Spark's partial aggregates and DuckDB's serial fold would drift in the last bits;
    * integer cents make the sum exact and the oracle hash stable. One shared definition —
    * a per-file copy could drift (e.g. one side gaining half-even rounding) and the
    * oracle gates of the two query families would silently disagree. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.round(c * 100).cast("long")
}
