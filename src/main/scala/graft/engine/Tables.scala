package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata dirs (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is TIMESTAMP(NANOS), which Spark 4 refuses at schema inference without
      // this legacy conf; with it the column reads as LongType (nanos since epoch).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
