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

  /**
   * Per-entity forward fill (LOCF): each NULL value takes the most
   * recent non-null observation of the same entity; leading NULLs stay
   * NULL. Entity-partitioned window — parallelism scales with entities.
   */
  def forwardFill(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, outCol: String = "v_ffill"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(outCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /**
   * Per-entity linear interpolation of NULL observations: each NULL
   * value at a known timestamp becomes the straight line between the
   * nearest non-null observations before and after it; boundary NULLs
   * (no neighbor on one side) stay NULL — no extrapolation. Windows are
   * partitioned by the entity keys, so parallelism scales with
   * entities. Both carried fields (neighbor ts and value) come from
   * rows selected by the SAME `value IS NOT NULL` condition, so they
   * always belong to one observation.
   */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, outCol: String = "v_interp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.TimestampType
    val v = col(valueCol).cast("double")
    val t: Column =
      if (df.schema(tsCol).dataType == TimestampType) unix_micros(col(tsCol))
      else col(tsCol).cast("double")
    val wPrev = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val pv = last(when(v.isNotNull, v), ignoreNulls = true).over(wPrev)
    val pt = last(when(v.isNotNull, t), ignoreNulls = true).over(wPrev)
    val nv = first(when(v.isNotNull, v), ignoreNulls = true).over(wNext)
    val nt = first(when(v.isNotNull, t), ignoreNulls = true).over(wNext)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        // equal neighbor timestamps (duplicate-ts series) → midpoint,
        // not an ANSI divide-by-zero
        .when(pv.isNotNull && nv.isNotNull && nt === pt, (pv + nv) / 2.0)
        .when(pv.isNotNull && nv.isNotNull,
          pv + (nv - pv) * (t - pt) / (nt - pt)))
  }

  /**
   * Per-entity rolling z-score anomaly flags — the streaming-drift
   * operator's batch/backfill sibling for POINT anomalies: each
   * observation is scored against the trailing `window` observations of
   * ITS OWN entity (mean/stddev over the `window` rows strictly BEFORE
   * it — the current value never deflates its own baseline). Rows with
   * fewer than 2 prior observations or a zero/degenerate baseline
   * spread report NULL score and no flag (no ANSI division by zero).
   *
   * Entity-partitioned windows: parallelism scales with entities, the
   * same stance as every TimeSeries op here; the tie order at equal
   * timestamps is pinned by `tieCols` for engine-replayable output.
   */
  def rollingAnomaly(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, window: Int = 7, z: Double = 3.0,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2, "window must cover at least 2 observations")
    val order = (col(tsCol) +: tieCols.map(col)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(-window, -1)
    val v = col(valueCol).cast("double")
    val mu = avg(v).over(w)
    val sd = stddev_samp(v).over(w)
    val n = count(v).over(w)
    val score = when(n >= 2 && sd.isNotNull && sd > 0.0, (v - mu) / sd)
    df.withColumn("roll_mean", mu)
      .withColumn("roll_std", sd)
      .withColumn("zscore", score)
      .withColumn("anomaly", coalesce(abs(score) > z, lit(false)))
  }
}
