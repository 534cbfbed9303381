package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming distribution-drift monitor: each tumbling event-time window
 * of the stream is histogrammed over the BASELINE's fixed bin edges and
 * scored against the baseline proportions (PSI / KL, same clamped
 * formulas as the batch [[graft.analysis.AnalysisPlanner.drift]]) —
 * one row per window, ready for an alert rule
 * (e.g. `graft.alerts.Condition.psiGt`).
 *
 * Streaming constraints shape the plan: a streaming query allows ONE
 * aggregation, so the per-bin counts are conditional aggregates of a
 * single `groupBy(window)` pass (bins is a small compile-time
 * constant), and the baseline travels as literals (KiB) rather than a
 * stream-static join. State is O(windows in flight × bins).
 */
object StreamingDrift {

  /** Fixed bin edges + per-bin proportions of the reference data. */
  final case class DriftBaseline(lo: Double, hi: Double,
      props: Seq[Double])

  /** Compute the baseline from a static frame (`bins` proportions; the
    * collect is `bins` doubles). */
  def baselineOf(df: DataFrame, valueCol: String, bins: Int): DriftBaseline = {
    val v = col(valueCol).cast("double")
    val b = df.agg(min(v).as("lo"), max(v).as("hi")).collect()(0)
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val bucket = bucketOf(v, lo, hi, bins)
    val counts = df.groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble.max(1.0)
    DriftBaseline(lo, hi,
      (0 until bins).map(i => counts.getOrElse(i.toLong, 0L) / total))
  }

  private def bucketOf(v: Column, lo: Double, hi: Double,
      bins: Int): Column =
    if (hi <= lo) lit(0L)
    else greatest(lit(0L),
      least(floor((v - lit(lo)) / lit(hi - lo) * bins), lit(bins - 1L)))

  /**
   * One output row per closed window: `window_start`, `window_end`,
   * `n`, `psi`, `kl`. Works identically on a static frame (batch
   * backtesting of the monitor) and a streaming one.
   */
  def monitor(stream: DataFrame, tsCol: String, valueCol: String,
      baseline: DriftBaseline, windowLen: String,
      lateness: String): DataFrame = {
    val bins = baseline.props.size
    val v = col(valueCol).cast("double")
    val bucket = bucketOf(v, baseline.lo, baseline.hi, bins)
    val isStreaming = stream.isStreaming
    val withWm =
      if (isStreaming)
        stream.withWatermark(tsCol, StreamingAgg.humanize(lateness))
      else stream
    val binAggs = (0 until bins).map(i =>
      sum(when(bucket === i, 1L).otherwise(0L)).as(s"__b$i"))
    val agg = withWm
      .groupBy(window(col(tsCol), StreamingAgg.humanize(windowLen)))
      .agg(binAggs.head, binAggs.tail: _*)
    val eps = 1e-9
    val n = (0 until bins).map(i => col(s"__b$i")).reduce(_ + _)
    def q(i: Int): Column =
      greatest(col(s"__b$i") / n.cast("double"), lit(eps))
    def p(i: Int): Column = lit(math.max(baseline.props(i), eps))
    val psi = (0 until bins)
      .map(i => (p(i) - q(i)) * log(p(i) / q(i))).reduce(_ + _)
    val kl = (0 until bins)
      .map(i => p(i) * log(p(i) / q(i))).reduce(_ + _)
    agg.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      n.as("n"), psi.as("psi"), kl.as("kl"))
  }

  /** Per-category baseline for CATEGORICAL drift monitoring: the top
    * `maxCategories` categories by baseline count (ties break
    * lexically), with everything else folded into one OTHER bucket —
    * the fold is what keeps streaming state bounded however large the
    * label space grows at 100 TB. */
  final case class CatDriftBaseline(categories: Seq[String],
      props: Seq[Double], otherProp: Double)

  def categoricalBaselineOf(df: DataFrame, catCol: String,
      maxCategories: Int = 32): CatDriftBaseline = {
    require(maxCategories >= 1, "maxCategories >= 1")
    val nn = df.where(col(catCol).isNotNull)
    val top = nn.groupBy(col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(desc("__n"), col("__c")).limit(maxCategories)
      .collect()
    val total = math.max(1.0,
      nn.agg(count(lit(1))).head().getLong(0).toDouble)
    val cats = top.map(_.getString(0)).toSeq
    val props = top.map(_.getLong(1) / total).toSeq
    CatDriftBaseline(cats, props, math.max(0.0, 1.0 - props.sum))
  }

  /**
   * Categorical twin of [[monitor]]: each window's category mix
   * (exact categories — the [[graft.analysis.AnalysisPlanner.categoricalDrift]]
   * batch semantics, where numeric bins are meaningless) scored
   * against the baseline proportions. Baseline categories travel as
   * literals; unseen/overflow categories score through the OTHER
   * bucket. One row per closed window:
   * (window_start, window_end, n, psi, kl). Works identically on a
   * static frame (batch backtesting) and a stream.
   */
  def categoricalMonitor(stream: DataFrame, tsCol: String,
      catCol: String, baseline: CatDriftBaseline, windowLen: String,
      lateness: String): DataFrame = {
    val k = baseline.categories.size
    val c = col(catCol).cast("string")
    val withWm =
      if (stream.isStreaming)
        stream.withWatermark(tsCol, StreamingAgg.humanize(lateness))
      else stream
    val catAggs = baseline.categories.zipWithIndex.map { case (cat, i) =>
      sum(when(c === cat, 1L).otherwise(0L)).as(s"__c$i")
    } :+ sum(when(c.isNotNull && !c.isin(baseline.categories: _*), 1L)
      .otherwise(0L)).as("__other")
    val agg = withWm
      .groupBy(window(col(tsCol), StreamingAgg.humanize(windowLen)))
      .agg(catAggs.head, catAggs.tail: _*)
    val eps = 1e-9
    val n = ((0 until k).map(i => col(s"__c$i")) :+ col("__other"))
      .reduce(_ + _)
    def q(i: Int): Column =
      greatest(col(s"__c$i") / n.cast("double"), lit(eps))
    val qOther = greatest(col("__other") / n.cast("double"), lit(eps))
    def p(i: Int): Column = lit(math.max(baseline.props(i), eps))
    val pOther = lit(math.max(baseline.otherProp, eps))
    val terms = (0 until k).map(i => (p(i), q(i))) :+ ((pOther, qOther))
    val psi = terms.map { case (pp, qq) =>
      (pp - qq) * log(pp / qq) }.reduce(_ + _)
    val kl = terms.map { case (pp, qq) =>
      pp * log(pp / qq) }.reduce(_ + _)
    agg.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      n.as("n"), psi.as("psi"), kl.as("kl"))
  }

  /**
   * Attach an [[graft.alerts.Alert]] to a monitor stream: every emitted
   * window's metrics are evaluated against the alert's condition (with
   * its cooldown/history semantics) via `foreachBatch`; each window's
   * score row is tiny, so the per-batch collect is bounded by windows
   * touched per micro-batch. Returns the started query.
   */
  def alertOn(monitorDf: DataFrame, alert: graft.alerts.Alert,
      checkpointDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      outputMode: String = "append")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // default "append": evaluate each window ONCE, when the watermark
    // closes it — partial-window scores in "update" mode can both fire
    // spuriously on small-n skew and then cooldown-suppress the real
    // closed-window alert; use "update" only for low-latency monitors
    // whose condition tolerates partial windows
    val w0 = monitorDf.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
    val w = trigger.fold(w0)(w0.trigger)
    w
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(col("window_start"), col("n"), col("psi"), col("kl"))
          .collect()
          .foreach { r =>
            alert.check(Map(
              "psi" -> r.getAs[Double]("psi"),
              "kl" -> r.getAs[Double]("kl"),
              "n" -> r.getAs[Long]("n").toDouble))
          }
        ()
      }
      .start()
  }
}
