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
}
