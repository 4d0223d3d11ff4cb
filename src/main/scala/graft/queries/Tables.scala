package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared table loader for the harness testdata (TESTDATA.md). */
object Tables {
  /** Normalize an events frame's `ts` column to a session-zone TIMESTAMP at
    * microsecond precision, whatever physical encoding the file shipped with.
    *
    * events.parquet has shipped in two physical `ts` encodings over time:
    * TIMESTAMP(NANOS) — which Spark can only read as a raw Long via the
    * `spark.sql.legacy.parquet.nanosAsLong=true` session flag — and the
    * standard TIMESTAMP(MICROS), which arrives as TIMESTAMP or
    * TIMESTAMP_NTZ depending on the file's isAdjustedToUTC bit. Rather
    * than assume one encoding (which breaks every events query the day
    * the upstream writer changes), branch on the dtype that actually
    * arrived — exactly what DuckDB's µs oracle sees. Sessions keep
    * nanosAsLong=true; it is inert for non-nanos files.
    *
    * Works on both batch and streaming frames (dispatch is on the static
    * schema, no job is triggered).
    *
    * Known ambiguity (documented, not detectable without a footer read):
    * under nanosAsLong=true a genuine plain-BIGINT `ts` column written as
    * epoch micros or millis would also arrive as LongType and be divided
    * by 1000 here. The current writers only emit TIMESTAMP-annotated
    * columns, so LongType ⇒ nanos holds; if a future writer emits raw
    * int64 epochs, this dispatch needs a parquet-footer logical-type
    * probe instead of a dtype branch.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) via nanosAsLong: truncate to µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        // cast(NTZ -> TIMESTAMP) reinterprets the wall-clock value in the
        // session time zone; that matches the (UTC) oracle only when the
        // session zone is UTC. Fail loudly rather than silently shift
        // instants under a non-UTC session.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC" || tz == "Etc/UTC",
          s"events.ts arrived as TIMESTAMP_NTZ; normalizing it via cast " +
            s"requires spark.sql.session.timeZone=UTC, but the session " +
            s"zone is '$tz' — the cast would shift every instant")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported dtype $other; " +
            "expected TIMESTAMP(NANOS)-as-long, TIMESTAMP, or TIMESTAMP_NTZ")
    }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val raw = spark.read.parquet(path)
    if (name == "events") normalizeEventsTs(raw) else raw
  }
}
