package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming experiment guardrail: per event-time window, the
 * sample-ratio-mismatch χ² of observed arm counts against the DECLARED
 * allocation (the batch [[graft.analysis.AnalysisPlanner.srmCheck]]
 * formula), one row per closed window — the "did the ramp break
 * overnight" alarm that pages before any metric readout would.
 *
 * Streaming constraints shape the plan exactly like
 * [[StreamingDrift]]: one `groupBy(window)` aggregation with the arm
 * counts as conditional aggregates (the declared arm list is a small
 * compile-time constant) and the expected ratios as literals — no
 * stream-static join, state O(windows in flight × arms). Works
 * identically on a static frame for backtesting. Rows flag
 * `srm = χ² > chi2Threshold` (default 3.841 = χ²₀.₉₅ at dof 1;
 * pick per your arm count).
 */
object StreamingGuardrail {

  def monitor(stream: DataFrame, tsCol: String, armCol: String,
      expected: Map[String, Double], windowLen: String,
      lateness: String, chi2Threshold: Double = 3.841): DataFrame = {
    require(expected.nonEmpty, "expected allocation is empty")
    val ssum = expected.values.sum
    val ratios = expected.toSeq.map { case (a, r) => a -> r / ssum }
    val isStreaming = stream.isStreaming
    val withWm =
      if (isStreaming)
        stream.withWatermark(tsCol, StreamingAgg.humanize(lateness))
      else stream
    val armCounts = ratios.zipWithIndex.map { case ((a, _), i) =>
      sum(when(col(armCol) === a, 1L).otherwise(0L)).as(s"__o$i")
    }
    val agged = withWm
      .where(col(armCol).isin(ratios.map(_._1): _*))
      .groupBy(window(col(tsCol), StreamingAgg.humanize(windowLen)))
      .agg(armCounts.head, armCounts.tail: _*)
    val n = ratios.indices.map(i => col(s"__o$i")).reduce(_ + _)
      .cast("double")
    val chi2 = ratios.zipWithIndex.map { case ((_, r), i) =>
      pow(col(s"__o$i").cast("double") - lit(r) * n, 2.0) / (lit(r) * n)
    }.reduce(_ + _)
    val outCols =
      Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        n.cast("long").as("n")) ++
      ratios.zipWithIndex.map { case ((a, _), i) =>
        col(s"__o$i").as(s"n_$a") } ++
      Seq(chi2.as("chi2_stat"),
        lit(ratios.size - 1).cast("long").as("dof"),
        (chi2 > chi2Threshold).as("srm"))
    agged.select(outCols: _*)
  }
}
