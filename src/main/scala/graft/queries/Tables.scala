package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table loader for the harness testdata (TESTDATA.md). */
object Tables {
  /** events.parquet carries TIMESTAMP(NANOS) which Spark only reads via
    * the nanosAsLong legacy mode (set per-read here, not session-wide).
    * The long is truncated to micros to match DuckDB's µs timestamps. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      spark.read
        .option("inferTimestampNTZ", "false")
        .parquet(path) // relies on spark.sql.legacy.parquet.nanosAsLong=true
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(path)
  }
}
