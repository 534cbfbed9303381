package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Statistical process control — the monitoring layer a production
 * feature pipeline runs over its own metric streams (reference
 * observability surface, `raise_/transforms/observability.py`, which
 * mocks its drift/alert numbers; these are the real control-chart
 * readouts). Every chart reduces the corpus to the calendar-bounded
 * per-day subgroup frame in ONE pass; the sequential charts (CUSUM,
 * EWMA) then run their recursions driver-side over that BOUNDED frame
 * (the [[TimeSeries.holtLinear]] discipline — never over raw rows),
 * while the memoryless charts (X̄, capability) stay fully declarative.
 */
object Spc {

  private val MaxDays = 4000

  /** Per-day subgroup frame: (__t date, __n, __m mean, __sd sample sd). */
  private def daySubgroups(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.where(col(tsCol).isNotNull && v.isNotNull)
      .groupBy(to_date(col(tsCol)).as("__t"))
      .agg(count(lit(1)).cast("double").as("__n"), avg(v).as("__m"),
        stddev_samp(v).as("__sd"))
  }

  /**
   * X̄ control chart with pooled sigma: per-day subgroup means against
   * center ± `sigmas`·σ̂/√n_t, where the center is the grand mean and
   * σ̂ the overall sample standard deviation (the pooled-σ variant —
   * engine-replayable, no tabulated c4/A2 constants). Returns one row
   * per day: (day, n, xbar, center, ucl, lcl, out_of_control).
   *
   * Scale shape: one corpus pass to the calendar-bounded day frame +
   * one 1-row moments reduce broadcast back — no window, no driver
   * state.
   */
  def xbarChart(df: DataFrame, tsCol: String, valueCol: String,
      sigmas: Double = 3.0): DataFrame = {
    require(sigmas > 0, "xbarChart: sigmas > 0")
    val v = col(valueCol).cast("double")
    val days = daySubgroups(df, tsCol, valueCol)
    val tot = broadcast(df
      .where(col(tsCol).isNotNull && v.isNotNull)
      .agg(avg(v).as("__mu"), stddev_samp(v).as("__sigma")))
    val half = lit(sigmas) * col("__sigma") / sqrt(col("__n"))
    days.crossJoin(tot).select(
      col("__t").as("day"), col("__n").cast("long").as("n"),
      col("__m").as("xbar"), col("__mu").as("center"),
      (col("__mu") + half).as("ucl"), (col("__mu") - half).as("lcl"),
      (col("__m") > col("__mu") + half ||
        col("__m") < col("__mu") - half).as("out_of_control"))
  }

  /**
   * Tabular CUSUM chart on standardized daily means: z_t =
   * (x̄_t − μ)·√n_t/σ̂ (μ, σ̂ pooled over all values), S⁺_t =
   * max(0, S⁺_{t−1} + z_t − k), S⁻_t = max(0, S⁻_{t−1} − z_t − k),
   * signal when either exceeds `h` — the standard small-persistent-
   * shift detector that a ±3σ Shewhart chart misses. Returns one row
   * per day: (day, z, s_hi, s_lo, signal).
   *
   * Scale shape: the recursion is inherently sequential, so it runs
   * DRIVER-SIDE over the calendar-bounded day frame (≤4000 rows, the
   * [[TimeSeries.holtLinear]] discipline), never over raw rows.
   */
  def cusumChart(df: DataFrame, tsCol: String, valueCol: String,
      k: Double = 0.5, h: Double = 4.0): DataFrame = {
    require(k >= 0 && h > 0, "cusumChart: k >= 0, h > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val mu = df.where(col(tsCol).isNotNull && v.isNotNull)
      .agg(avg(v), stddev_samp(v)).head()
    val (m0, s0) = (mu.getDouble(0), mu.getDouble(1))
    require(s0 > 0, "cusumChart: zero overall variance")
    val days = daySubgroups(df, tsCol, valueCol)
      .orderBy("__t").limit(MaxDays + 1).collect()
    require(days.length <= MaxDays,
      s"cusumChart: > $MaxDays days; pre-aggregate to a coarser calendar")
    var sHi = 0.0
    var sLo = 0.0
    days.map { r =>
      val z = (r.getDouble(2) - m0) * math.sqrt(r.getDouble(1)) / s0
      sHi = math.max(0.0, sHi + z - k)
      sLo = math.max(0.0, sLo - z - k)
      (r.getDate(0), z, sHi, sLo, sHi > h || sLo > h)
    }.toSeq.toDF("day", "z", "s_hi", "s_lo", "signal")
  }

  /**
   * EWMA control chart on daily means: z_t = λ·x̄_t + (1−λ)·z_{t−1}
   * seeded at the grand mean, with time-varying limits
   * μ ± L·σ̂·√(λ/(2−λ)·(1−(1−λ)^{2t}))/√n̄ (n̄ the average subgroup
   * size — the standard equal-n approximation, documented). Returns
   * one row per day: (day, xbar, ewma, ucl, lcl, out_of_control).
   * Driver recursion over the bounded day frame, like [[cusumChart]].
   */
  def ewmaChart(df: DataFrame, tsCol: String, valueCol: String,
      lambda: Double = 0.2, bigL: Double = 3.0): DataFrame = {
    require(lambda > 0 && lambda <= 1, "ewmaChart: lambda in (0,1]")
    require(bigL > 0, "ewmaChart: L > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val mu = df.where(col(tsCol).isNotNull && v.isNotNull)
      .agg(avg(v), stddev_samp(v)).head()
    val (m0, s0) = (mu.getDouble(0), mu.getDouble(1))
    require(s0 > 0, "ewmaChart: zero overall variance")
    val days = daySubgroups(df, tsCol, valueCol)
      .orderBy("__t").limit(MaxDays + 1).collect()
    require(days.length <= MaxDays,
      s"ewmaChart: > $MaxDays days; pre-aggregate to a coarser calendar")
    val nBar = days.map(_.getDouble(1)).sum / days.length
    var z = m0
    days.zipWithIndex.map { case (r, i) =>
      val t = i + 1
      z = lambda * r.getDouble(2) + (1 - lambda) * z
      val w = s0 / math.sqrt(nBar) * bigL * math.sqrt(
        lambda / (2 - lambda) *
          (1 - math.pow(1 - lambda, 2.0 * t)))
      (r.getDate(0), r.getDouble(2), z, m0 + w, m0 - w,
        z > m0 + w || z < m0 - w)
    }.toSeq.toDF("day", "xbar", "ewma", "ucl", "lcl", "out_of_control")
  }

  /**
   * p-chart: the ATTRIBUTE control chart for daily defect PROPORTIONS
   * (error-event rate, null rate, failed-check rate) — center p̄ =
   * total defects / total rows, limits p̄ ± `sigmas`·√(p̄(1−p̄)/n_t)
   * clamped to [0, 1]. Fully declarative: one conditional day-frame
   * pass + a 1-row totals broadcast. Returns one row per day:
   * (day, n, n_defect, p, center, ucl, lcl, out_of_control).
   */
  def pChart(df: DataFrame, tsCol: String, defect: Column,
      sigmas: Double = 3.0): DataFrame = {
    require(sigmas > 0, "pChart: sigmas > 0")
    val d = when(defect, 1.0).otherwise(0.0)
    val days = df.where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__t"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(d).as("__d"))
      .localCheckpoint() // day frame feeds totals AND the readout
    val tot = broadcast(days.agg(
      (sum(col("__d")) / sum(col("__n"))).as("__pbar")))
    val half = lit(sigmas) *
      sqrt(col("__pbar") * (lit(1.0) - col("__pbar")) / col("__n"))
    val ucl = least(col("__pbar") + half, lit(1.0))
    val lcl = greatest(col("__pbar") - half, lit(0.0))
    days.crossJoin(tot).select(
      col("__t").as("day"), col("__n").cast("long").as("n"),
      col("__d").cast("long").as("n_defect"),
      (col("__d") / col("__n")).as("p"), col("__pbar").as("center"),
      ucl.as("ucl"), lcl.as("lcl"),
      (col("__d") / col("__n") > ucl || col("__d") / col("__n") < lcl)
        .as("out_of_control"))
  }

  /**
   * c-chart: the attribute chart for daily defect COUNTS under a
   * Poisson model — center c̄ = mean daily count, limits
   * c̄ ± `sigmas`·√c̄ (lcl clamped at 0). The right chart when the
   * opportunity size per day is constant-ish and you track raw
   * incident counts. Returns one row per day:
   * (day, c, center, ucl, lcl, out_of_control).
   */
  def cChart(df: DataFrame, tsCol: String, defect: Column,
      sigmas: Double = 3.0): DataFrame = {
    require(sigmas > 0, "cChart: sigmas > 0")
    val days = df.where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__t"))
      .agg(sum(when(defect, 1.0).otherwise(0.0)).as("__c"))
      .localCheckpoint()
    val tot = broadcast(days.agg(avg(col("__c")).as("__cbar")))
    val ucl = col("__cbar") + lit(sigmas) * sqrt(col("__cbar"))
    val lcl = greatest(col("__cbar") - lit(sigmas) * sqrt(col("__cbar")),
      lit(0.0))
    days.crossJoin(tot).select(
      col("__t").as("day"), col("__c").cast("long").as("c"),
      col("__cbar").as("center"), ucl.as("ucl"), lcl.as("lcl"),
      (col("__c") > ucl || col("__c") < lcl).as("out_of_control"))
  }

  /**
   * Process capability against spec limits [lsl, usl]: Cp =
   * (USL−LSL)/6σ̂ (potential), Cpk = min(USL−μ, μ−LSL)/3σ̂ (actual,
   * penalizes off-center), plus the OBSERVED out-of-spec fraction —
   * the honest companion (Cp/Cpk assume normality; the count does
   * not). Returns ONE row: (n, mean, stddev, cp, cpk, frac_below,
   * frac_above). One conditional-aggregation corpus pass.
   */
  def processCapability(df: DataFrame, valueCol: String, lsl: Double,
      usl: Double): DataFrame = {
    require(lsl < usl, "processCapability: lsl < usl")
    val v = col(valueCol).cast("double")
    df.where(v.isNotNull).agg(
        count(lit(1)).as("n"), avg(v).as("mean"),
        stddev_samp(v).as("stddev"),
        avg((v < lsl).cast("double")).as("frac_below"),
        avg((v > usl).cast("double")).as("frac_above"))
      .select(col("n"), col("mean"), col("stddev"),
        when(col("stddev") > 0, lit(usl - lsl) / (col("stddev") * 6))
          .as("cp"),
        when(col("stddev") > 0,
          least(lit(usl) - col("mean"), col("mean") - lit(lsl)) /
            (col("stddev") * 3)).as("cpk"),
        col("frac_below"), col("frac_above"))
  }

  /**
   * Western Electric run rules per key over the daily-mean chart
   * ([[xbarChart]] zones: center = the key's pooled mean, zone width
   * σ̂/√n_t per day): R1 — a point beyond 3σ; R2 — ≥2 of the last 3
   * points beyond 2σ on the SAME side; R3 — ≥4 of the last 5 beyond
   * 1σ same side; R4 — 8 consecutive points on one side of center.
   * Rolling windows may be partial at the series head (a 2-point
   * series can already violate R2 — intended: the evidence is there).
   * Returns one row per (key, rule): (key, rule, n_days, n_flagged).
   *
   * Scale shape: one corpus pass to per-(key, day) subgroups, one
   * per-key moments reduce joined back broadcast, three key-partitioned
   * rolling-count windows over calendar-bounded frames.
   */
  def runRules(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val days = df
      .where(col(tsCol).isNotNull && v.isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"), to_date(col(tsCol)).as("__t"))
      // daily mean rounded to 6: the zone comparisons must not flip on
      // cross-engine float-summation noise
      .agg(count(lit(1)).cast("double").as("__n"),
        round(avg(v), 6).as("__m"))
    val tot = df
      .where(col(tsCol).isNotNull && v.isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"))
      .agg(avg(v).as("__mu"), stddev_samp(v).as("__sigma"))
    val half = col("__sigma") / sqrt(col("__n"))
    def beyond(k: Int, above: Boolean) =
      if (above) (col("__m") > col("__mu") + lit(k.toDouble) * half)
        .cast("long")
      else (col("__m") < col("__mu") - lit(k.toDouble) * half).cast("long")
    val flagged = days.join(broadcast(tot), Seq("__g"))
      .withColumn("__a3", beyond(3, above = true))
      .withColumn("__b3", beyond(3, above = false))
      .withColumn("__a2", beyond(2, above = true))
      .withColumn("__b2", beyond(2, above = false))
      .withColumn("__a1", beyond(1, above = true))
      .withColumn("__b1", beyond(1, above = false))
      .withColumn("__a0", (col("__m") > col("__mu")).cast("long"))
      .withColumn("__b0", (col("__m") < col("__mu")).cast("long"))
    def rolling(c: String, rows: Int) =
      sum(col(c)).over(Window.partitionBy("__g").orderBy("__t")
        .rowsBetween(-(rows - 1), 0))
    val rules = flagged
      .withColumn("__r1", (col("__a3") + col("__b3") >= 1).cast("long"))
      .withColumn("__r2",
        (rolling("__a2", 3) >= 2 || rolling("__b2", 3) >= 2)
          .cast("long"))
      .withColumn("__r3",
        (rolling("__a1", 5) >= 4 || rolling("__b1", 5) >= 4)
          .cast("long"))
      .withColumn("__r4",
        (rolling("__a0", 8) >= 8 || rolling("__b0", 8) >= 8)
          .cast("long"))
    rules.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_days"), sum(col("__r1")).as("__v1"),
        sum(col("__r2")).as("__v2"), sum(col("__r3")).as("__v3"),
        sum(col("__r4")).as("__v4"))
      .select(col("__g").as(keyCol), col("n_days"),
        expr("stack(4, 'R1', __v1, 'R2', __v2, 'R3', __v3, 'R4', __v4)")
          .as(Seq("rule", "n_flagged")))
      .select(col(keyCol), col("rule"), col("n_days"), col("n_flagged"))
  }
}
