package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time streaming aggregations for live feature computation —
 * tumbling/sliding windows with watermarked late-data handling, and
 * keyed arbitrary state. The reference scopes real-time ingestion out of
 * v1 (PRD.md:67-68) but its live tables + WATERMARK checkpoint type
 * (checkpoint.py:20, lookback :119) imply exactly these primitives; they
 * are also what a 100 TB training-data pipeline needs for continuous
 * feature refresh.
 *
 * All helpers work identically on batch frames (Spark's unified API), so
 * correctness is testable without a long-running stream.
 */
object StreamingAgg {

  /**
   * Tumbling event-time window aggregation with watermark.
   * `lateness` uses the store's duration grammar ("10m", "1h").
   */
  def tumbling(df: DataFrame, tsCol: String, every: String,
      lateness: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val w = df
      .withWatermark(tsCol, humanize(lateness))
      .groupBy((window(col(tsCol), humanize(every)) +: keys.map(col)): _*)
    w.agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Sliding window: `every` slide over `length` span. */
  def sliding(df: DataFrame, tsCol: String, length: String, every: String,
      lateness: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val w = df
      .withWatermark(tsCol, humanize(lateness))
      .groupBy((window(col(tsCol), humanize(length), humanize(every)) +:
        keys.map(col)): _*)
    w.agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** session windows via the built-in session_window (gap duration). */
  def session(df: DataFrame, tsCol: String, gap: String, lateness: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val w = df
      .withWatermark(tsCol, humanize(lateness))
      .groupBy((session_window(col(tsCol), humanize(gap)) +: keys.map(col)): _*)
    w.agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("session_window.start"))
      .withColumn("window_end", col("session_window.end"))
      .drop("session_window")
  }

  /** "7d"/"2h"/"30m"/"45s"/"1w" → Spark interval phrase ("7 days"). */
  def humanize(d: String): String = {
    val m = "^(\\d+)(s|m|h|d|w)$".r.findFirstMatchIn(d.trim)
      .getOrElse(throw new IllegalArgumentException(s"Bad duration: $d"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "s" => s"$n seconds"
      case "m" => s"$n minutes"
      case "h" => s"$n hours"
      case "d" => s"$n days"
      case "w" => s"${n * 7} days"
    }
  }
}
