package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming extension (SURVEY §2.11: absent in the reference;
  * the natural Spark extension over the `events` table). Every builder
  * works on BOTH a stream (`readStream`) and a batch frame — the same
  * declarative plan, so batch runs of the identical code are
  * oracle-checkable while the streaming path carries watermarks + state.
  *
  * Scale notes: windowed/session aggregation state is keyed by
  * (window, keys) and bounded by the watermark; dedup state is bounded
  * by dropDuplicatesWithinWatermark. No unbounded state anywhere.
  */
object Streams {

  /** Tumbling (or sliding) event-time window aggregation with a
    * late-data watermark. Defaults to an order-independent agg set
    * (count/min/max) — deterministic under any partitioning. */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      slide: Option[String] = None,
      keys: Seq[String] = Nil,
      aggs: Seq[Column] = Seq(count(lit(1)).as("n_events"))): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    val win = slide match {
      case Some(sl) => window(col(tsCol), windowDuration, sl)
      case None => window(col(tsCol), windowDuration)
    }
    withWm
      .groupBy(win +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Session windows: events separated by more than `gap` start a new
    * session per key. State is closed (and emitted) once the watermark
    * passes the gap. */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      gap: String,
      keys: Seq[String],
      aggs: Seq[Column] = Seq(count(lit(1)).as("n_events"))): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    withWm
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  /** Streaming exact dedup with BOUNDED state: duplicates arriving
    * within the watermark horizon are dropped; state for older keys is
    * reclaimed. (The streaming twin of the batch D1/D2 operators.) */
  def streamingDedup(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keys: Seq[String]): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)
}
