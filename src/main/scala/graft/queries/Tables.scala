package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared table loader for the harness testdata (TESTDATA.md). */
object Tables {
  /** events.parquet has shipped in two physical `ts` encodings over time:
    * TIMESTAMP(NANOS) — which Spark can only read as a raw Long via the
    * `spark.sql.legacy.parquet.nanosAsLong=true` session flag — and the
    * standard TIMESTAMP(MICROS), which arrives as TIMESTAMP or
    * TIMESTAMP_NTZ depending on the file's isAdjustedToUTC bit. Rather
    * than assume one encoding (which breaks every events query the day
    * the upstream writer changes), branch on the dtype that actually
    * arrived and normalize all paths to a session-zone TIMESTAMP at
    * microsecond precision — exactly what DuckDB's µs oracle sees.
    * Sessions keep nanosAsLong=true; it is inert for non-nanos files. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) via nanosAsLong: truncate to µs
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case other =>
          throw new IllegalStateException(
            s"events.ts arrived as unsupported dtype $other from $path; " +
              "expected TIMESTAMP(NANOS)-as-long, TIMESTAMP, or TIMESTAMP_NTZ")
      }
    } else spark.read.parquet(path)
  }
}
