package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Time-series resampling for feature pipelines: aggregate events onto a
 * regular calendar grid and fill the gaps, so downstream rolling windows
 * see every period exactly once.
 *
 * Scale design: the date spine is generated from a 1-row min/max
 * aggregate (broadcast, no driver collect) and exploded — |days| rows —
 * then LEFT-joined against the per-day aggregate frame. Both sides of
 * the join are already aggregated, so the shuffle is tiny regardless of
 * input size; the heavy lifting is the map-side-combined groupBy(day).
 */
object TimeSeries {

  /**
   * Daily counts + sums for `valueCol` over the full [min(ts), max(ts)]
   * calendar range of `df`, with missing days emitted as (0, 0.0).
   */
  def gapFillDaily(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("day_value"))
    val bounds = daily.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
    val spine = bounds.select(
      explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 DAY")))
        .as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("day_value"), lit(0.0)).as("day_value"))
  }
}
