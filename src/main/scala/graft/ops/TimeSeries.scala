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
   * Classical seasonal-trend decomposition (moving-average STL-lite)
   * of per-key daily series: trend = centered (2·halfWindow+1)-day
   * rolling mean (NULL where the window is incomplete — no one-sided
   * bias at the edges), seasonal = the per-(key, phase) mean of the
   * detrended series re-centered to sum to zero per key (phase =
   * day-offset mod `period` from a FIXED epoch — engine-portable,
   * unlike locale day-of-week numbering), remainder = y − trend −
   * seasonal. The anomaly-detection / forecasting preprocessor:
   * remainder is what [[rollingAnomaly]]-style alarms should score
   * once a series has weekly structure.
   *
   * Scale contract: input rolls up to (key, day) grain first, so the
   * key-partitioned ordered windows run over bounded series
   * (the [[theilSen]]/[[cusum]] stance); the seasonal frame is
   * ≤ keys×period rows and joins back by equi-key.
   */
  def decompose(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, period: Int = 7, halfWindow: Int = 3): DataFrame = {
    require(period >= 2 && halfWindow >= 1, "period/halfWindow too small")
    import org.apache.spark.sql.expressions.Window
    import graft.analysis.PrefixSum
    val gs = keyCols.map(col)
    val daily = df
      .groupBy(gs :+ to_date(col(tsCol)).as("day"): _*)
      .agg(sum(col(valueCol).cast("double")).as("y"))
    val w = Window.partitionBy(gs: _*).orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    val span = 2 * halfWindow + 1
    val trended = daily
      .withColumn("trend",
        when(count(lit(1)).over(w) === span, avg(col("y")).over(w)))
      .withColumn("__phase",
        pmod(datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01"))),
          lit(period)))
      .localCheckpoint() // seasonal means + the final join both read it
    val s0 = trended.where(col("trend").isNotNull)
      .groupBy(gs :+ col("__phase"): _*)
      .agg(avg(col("y") - col("trend")).as("__s0"))
    val sMean =
      if (keyCols.isEmpty) s0.agg(avg(col("__s0")).as("__sm"))
      else s0.groupBy(gs: _*).agg(avg(col("__s0")).as("__sm"))
    val seasonal =
      (if (keyCols.isEmpty) s0.crossJoin(broadcast(sMean))
       else PrefixSum.joinNullSafe(s0, sMean, keyCols,
         broadcastRight = true))
        .select(gs ++ Seq(col("__phase"),
          (col("__s0") - col("__sm")).as("seasonal")): _*)
    PrefixSum.joinNullSafe(trended, seasonal, keyCols :+ "__phase", "left")
      .select(gs ++ Seq(col("day"), col("y"), col("trend"),
        col("seasonal"),
        (col("y") - col("trend") - col("seasonal")).as("remainder")): _*)
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

  /**
   * Per-entity trailing-window Pearson correlation between two value
   * columns — "is the historical x↔y relationship holding right now"
   * (feature-vs-target stability, pair-trading style co-movement,
   * sensor cross-checks). The correlation is Spark's `corr` AGGREGATE
   * evaluated over an entity-partitioned sliding frame — the co-moment
   * (Welford-style) update, numerically stable for large-offset series
   * like epoch timestamps, where the naive Σx²−(Σx)²/n sufficient-
   * statistics formula catastrophically cancels (measured: |corr| >
   * 1.00003 on epoch-seconds windows). Degenerate windows (fewer than
   * 2 pairwise-complete observations, or zero variance → NaN) report
   * NULL, never a division error.
   */
  def rollingCorrelation(df: DataFrame, keyCols: Seq[String], tsCol: String,
      xCol: String, yCol: String, window: Int = 7,
      tieCols: Seq[String] = Nil, outCol: String = "roll_corr")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2, "window must cover at least 2 observations")
    val order = (col(tsCol) +: tieCols.map(col)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(window - 1), 0)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val c = corr(x, y).over(w)
    df.withColumn(outCol, when(c.isNotNull && !isnan(c), c))
  }

  /**
   * Per-entity exponentially weighted moving average (span form:
   * α = 2/(span+1), adjust=false semantics —
   * `ewma_t = α·x_t + (1−α)·ewma_{t−1}`). The recursion is inherently
   * sequential per entity, so it runs as a `repartition(entities) +
   * sortWithinPartitions + mapPartitions` streaming fold — the same
   * genuine-kernel pattern as the kendall Fenwick pass: one shuffle to
   * co-locate each entity's rows contiguously in time order, then a
   * single O(rows) pass with O(1) state per entity. NULL observations
   * carry the previous EWMA forward unchanged.
   *
   * (A window-function formulation Σ α(1−α)^(t−i)·x_i needs pow() per
   * pair — O(n²) per entity — or an unstable (1−α)^(−i) prefix trick
   * that overflows past ~10³ rows; the sequential fold is both exact
   * and cheaper.)
   */
  def ewma(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, span: Int, outCol: String = "ewma",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(span >= 1, "span must be >= 1")
    val alpha = 2.0 / (span + 1.0)
    val spark = df.sparkSession
    // pre-cast the value once so the kernel reads one double column
    val prepared = df.withColumn("__x", col(valueCol).cast("double"))
    val sorted = prepared
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(
        (keyCols.map(col) :+ col(tsCol)) ++ tieCols.map(col): _*)
    val keyIdx = keyCols.map(c => sorted.columns.indexOf(c))
    val xIdx = sorted.columns.indexOf("__x")
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.DoubleType, nullable = true))
    val result = sorted.rdd.mapPartitions { it =>
      // entity runs are contiguous after the sort: reset on key change
      var curKey: Seq[Any] = null
      var state: java.lang.Double = null
      it.map { row =>
        val k = keyIdx.map(row.get)
        if (curKey == null || k != curKey) { curKey = k; state = null }
        if (!row.isNullAt(xIdx)) {
          val x = row.getDouble(xIdx)
          state = if (state == null) x else alpha * x + (1 - alpha) * state
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+
          (if (state == null) null else state.doubleValue()))
      }
    }
    spark.createDataFrame(result, outSchema).drop("__x")
  }

  /**
   * Seasonality profile: per (segment, hour-of-day) event count, mean
   * value, and multiplicative lift vs the segment's overall mean —
   * the day-shape fingerprint that feeds staffing/alerting baselines
   * and "is this hour anomalous" features. Two keyed aggregations +
   * one segment-keyed broadcast join of the (≤ segments)-row totals
   * frame; the heavy pass is the map-side-combined groupBy. Hours are
   * session-timezone (UTC under [[graft.GraftSession]]).
   */
  def seasonalityProfile(df: DataFrame, tsCol: String, valueCol: String,
      segmentCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val byHour = df
      .groupBy(col(segmentCol).as("segment"), hour(col(tsCol)).as("hod"))
      .agg(count(lit(1)).as("n"), avg(v).as("mean_value"))
    val overall = df.groupBy(col(segmentCol).as("segment"))
      .agg(avg(v).as("__om"))
    byHour.join(broadcast(overall), "segment")
      .withColumn("lift", col("mean_value") / col("__om"))
      .drop("__om")
  }

  /**
   * Theil–Sen robust trend per key: the median of all pairwise slopes
   * (y_j − y_i)/(x_j − x_i), x_i < x_j, plus the companion median
   * intercept med(y − slope·x) — the outlier-resistant replacement
   * for per-group OLS on metric series.
   *
   * Scale contract: the pair self-join is O(T²) PER KEY where T is
   * the series length, so inputs are expected to be already-rolled-up
   * series (daily/hourly grids — T in the hundreds), not raw events;
   * `maxPoints` (deterministic keep-first-by-x, key-partitioned rank)
   * hard-bounds the fan-out for pathological keys. Slope and
   * intercept medians run through the bucketed prefix-sum percentile
   * path — grouped, distributed, no per-key window over the pair
   * frame.
   */
  def theilSen(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String, maxPoints: Int = 2048): DataFrame = {
    import graft.analysis.{AnalysisPlanner, PrefixSum}
    val keyed = df.select(keyCols.map(col) :+
      col(xCol).cast("double").as("__x") :+
      col(yCol).cast("double").as("__y"): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(col("__x"))))
      .where(col("__rk") <= maxPoints)
      .drop("__rk")
      // the rolled-up series (≤ maxPoints rows per key) feeds the
      // self-join's l-side, r-side, AND the residual pass — without
      // materialization the caller's corpus aggregation would rely on
      // optimizer-dependent exchange reuse to avoid re-executing three
      // times (the q202/q205 rule: checkpoint ANY small aggregate
      // feeding multiple report branches)
      .localCheckpoint()
    val joinCond = keyCols.map(k => col(s"l.$k") <=> col(s"r.$k"))
      .reduce(_ && _) && col("l.__x") < col("r.__x")
    // dx = 0 can't survive the join, but the guard must still be in the
    // EXPRESSION: the optimizer infers isnotnull(slope) into the join
    // condition, where ANSI mode would otherwise raise DIVIDE_BY_ZERO
    // on an equal-x pair before the x< filter runs
    val dx = col("r.__x") - col("l.__x")
    val slopes = keyed.as("l").join(keyed.as("r"), joinCond)
      .select(keyCols.map(k => col(s"l.$k")) :+
        when(dx =!= 0, (col("r.__y") - col("l.__y")) / dx)
          .as("__slope"): _*)
    val slopeMed = AnalysisPlanner.exactPercentiles(slopes, "__slope",
      Seq("slope" -> 0.5), keyCols)
    val resid = PrefixSum.joinNullSafe(keyed, slopeMed, keyCols,
        broadcastRight = true)
      .select(keyCols.map(col) :+
        (col("__y") - col("slope") * col("__x")).as("__r"): _*)
    val interceptMed = AnalysisPlanner.exactPercentiles(resid, "__r",
      Seq("intercept" -> 0.5), keyCols)
    PrefixSum.joinNullSafe(slopeMed, interceptMed, keyCols)
  }

  /**
   * Two-sided CUSUM mean-shift monitor per key — the sequential
   * change detector that catches small persistent drifts a
   * threshold-per-point rule misses. Values are standardized against
   * the per-key mean/std (one grouped aggregate broadcast back), then
   * the classic recursions `C⁺_t = max(0, C⁺_{t−1} + z_t − k)` and
   * `C⁻_t = max(0, C⁻_{t−1} − z_t − k)` are computed WITHOUT a
   * sequential loop via the running-minimum identity
   * `C⁺_t = S_t − min_{j≤t} S_j` with `S_t = Σ(z−k)` (and the
   * mirrored sum for C⁻): two ordered window passes — a cumulative
   * sum and a running min — per side. `alarm` fires when either side
   * exceeds `h` (both in σ units; the conventional k=0.5, h=4 detect
   * ~1σ shifts).
   *
   * Scale contract: input is a rolled-up series per key (daily grid —
   * points in the hundreds), so the key-partitioned ordered windows
   * run over bounded partitions, the same stance as [[theilSen]] and
   * [[ewma]]; raw events aggregate to the grid first.
   */
  def cusum(df: DataFrame, keyCols: Seq[String], xCol: String,
      valueCol: String, k: Double = 0.5, h: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.analysis.PrefixSum
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(avg(col(valueCol).cast("double")).as("__mu"),
        stddev_samp(col(valueCol).cast("double")).as("__sd"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(xCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    PrefixSum.joinNullSafe(df, stats, keyCols, broadcastRight = true)
      .withColumn("z", when(col("__sd") > 0,
        (col(valueCol).cast("double") - col("__mu")) / col("__sd"))
        .otherwise(lit(0.0)))
      .withColumn("__sp", sum(col("z") - lit(k)).over(cum))
      .withColumn("__sn", sum(-col("z") - lit(k)).over(cum))
      // running min over an EXPANDED frame including a leading 0 —
      // C_t must never go negative, so the prefix min is floored at
      // the empty-prefix value 0
      .withColumn("cusum_pos",
        col("__sp") - least(lit(0.0), min(col("__sp")).over(cum)))
      .withColumn("cusum_neg",
        col("__sn") - least(lit(0.0), min(col("__sn")).over(cum)))
      .withColumn("alarm",
        col("cusum_pos") > h || col("cusum_neg") > h)
      .drop("__mu", "__sd", "__sp", "__sn")
  }

  /**
   * Durbin–Watson statistic per key over a series ordered by `xCol`:
   * DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ_t e_t², the canonical first-order
   * serial-correlation check on regression residuals (DW ≈ 2 means no
   * autocorrelation, → 0 positive, → 4 negative). Pass residuals in
   * `valueCol` — compose with [[graft.ops.Regression.groupedOls]] to
   * detrend first. Returns one row per key: (keys…, n, dw) with NULL
   * dw for keys with < 2 points or an all-zero series.
   *
   * Scale shape: one keyed window (lag 1 over partitionBy(keys)) and
   * one grouped aggregation — no corpus-wide window, no driver state.
   * Per-key series length bounds the window partition, exactly like
   * [[ewma]]/[[cusum]].
   */
  def durbinWatson(df: DataFrame, keyCols: Seq[String], xCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "durbinWatson: no key columns")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(xCol))
    val e = col(valueCol).cast("double")
    df.withColumn("__lag", lag(e, 1).over(w))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(pow(e - col("__lag"), 2.0)).as("__num"),
        sum(e * e).as("__den"))
      .select(keyCols.map(col) ++ Seq(col("n"),
        when(col("__den") > 0, col("__num") / col("__den")).as("dw")): _*)
  }

  /**
   * Raw periodogram of a regular series at the Fourier frequencies
   * k/n, k = 1..maxFreq: I(k) = (2/n)·[(Σ_t x̃_t cos(2πkt/n))² +
   * (Σ_t x̃_t sin(2πkt/n))²] over the demeaned series x̃ — the
   * spectral view of seasonality (a daily series with a weekly cycle
   * spikes at k ≈ n/7). `xCol` must be a 0-based regular integer index
   * (or anything castable to one, e.g. a day offset); returns maxFreq
   * rows (freq, period, power) where period = n/k in `xCol` units.
   *
   * Scale shape: the mean and n ride one 1-row broadcast aggregate;
   * the k frequencies are a broadcast-exploded Range, so the work is
   * n·maxFreq map-side trig terms into ONE partial-aggregatable
   * groupBy(freq) — no window, no driver state. A DFT by brute sums
   * is the right distributed shape when maxFreq ≪ n (spectral peaks,
   * not full spectra); an FFT's butterfly is serial-depth log n and
   * buys nothing at this output size.
   */
  def periodogram(df: DataFrame, xCol: String, valueCol: String,
      maxFreq: Int = 30): DataFrame = {
    require(maxFreq >= 1, "periodogram: maxFreq >= 1")
    val s = df.select(col(xCol).cast("double").as("__t"),
      col(valueCol).cast("double").as("__x"))
    val stats = s.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("__n"), (col("__sx") / col("__n")).as("__m"),
        (col("__sxx") - col("__sx") * col("__sx") / col("__n"))
          .as("__den"))
    val freqs = df.sparkSession.range(1, maxFreq + 1)
      .select(col("id").cast("double").as("__k"))
    val ang = lit(2.0 * math.Pi) * col("__k") * col("__t") / col("__n")
    s.join(broadcast(stats))
      .crossJoin(broadcast(freqs))
      .groupBy(col("__k").cast("long").as("freq"))
      .agg(max(col("__n")).as("__nn"), max(col("__den")).as("__d"),
        sum((col("__x") - col("__m")) * cos(ang)).as("__c"),
        sum((col("__x") - col("__m")) * sin(ang)).as("__s"))
      .select(col("freq"), (col("__nn") / col("freq")).as("period"),
        ((col("__c") * col("__c") + col("__s") * col("__s")) *
          lit(2.0) / col("__nn")).as("power"),
        // scale-free share of total variance — O(1) regardless of the
        // series' magnitude, so a fixed rounding grid is meaningful
        when(col("__d") > 0,
          (col("__c") * col("__c") + col("__s") * col("__s")) / col("__d"))
          .as("power_frac"))
  }

  /**
   * Normalized spectral entropy of a daily series — ONE number for
   * "how concentrated is this series' periodicity": the Shannon
   * entropy of the [[periodogram]]'s power distribution over the
   * first `maxFreq` Fourier frequencies, divided by ln(maxFreq)
   * (1 = white-noise flat, → 0 = a single pure cycle), plus the
   * dominant frequency and its power share. The feature-store-ready
   * scalar summary of the spectral view. Returns ONE row:
   * (n_freqs, spectral_entropy, peak_freq, peak_period, peak_share).
   *
   * Scale shape: [[periodogram]]'s one grouped trig scan, then pure
   * algebra on the maxFreq-row frame (a broadcast normalization sum
   * and a max_by reduce).
   */
  def spectralEntropy(df: DataFrame, xCol: String, valueCol: String,
      maxFreq: Int = 10): DataFrame = {
    val pg = periodogram(df, xCol, valueCol, maxFreq)
      .localCheckpoint() // normalization + entropy + peak read it
    val tot = broadcast(pg.agg(sum(col("power_frac")).as("__tp")))
    val p = col("power_frac") / col("__tp")
    pg.crossJoin(tot)
      .agg(count(lit(1)).as("n_freqs"),
        (-sum(when(p > 0, p * log(p)).otherwise(lit(0.0))) /
          log(lit(maxFreq.toDouble))).as("spectral_entropy"),
        max_by(col("freq"), struct(col("power_frac"),
          (-col("freq")))).as("peak_freq"),
        max_by(col("period"), struct(col("power_frac"),
          (-col("freq")))).as("peak_period"),
        (max(col("power_frac")) / max(col("__tp"))).as("peak_share"))
  }

  /**
   * Fisher's g test for hidden periodicity: is the LARGEST
   * [[periodogram]] ordinate bigger than white noise would produce?
   * g = max_k I(k) / Σ_k I(k) over the first `maxFreq` Fourier
   * frequencies, with the EXACT null p-value
   * p = Σ_{j=1..⌊1/g⌋} (−1)^{j−1}·C(m,j)·(1−jg)^{m−1} — the
   * significance companion to [[spectralEntropy]]'s concentration
   * score (entropy says "how peaked", Fisher's g says "peaked enough
   * to believe"). Returns 1 row: (n_freqs, peak_freq, g_stat,
   * p_value).
   *
   * Scale shape: one [[periodogram]] trig scan; everything after runs
   * on the maxFreq-row frame. The p-value series unrolls at PLAN time
   * (maxFreq is a constant, binomials are exact literals), so the
   * whole tail is literal column algebra — no lgamma, no explode.
   */
  def fisherG(df: DataFrame, xCol: String, valueCol: String,
      maxFreq: Int = 10): DataFrame = {
    require(maxFreq >= 2 && maxFreq <= 60,
      "fisherG: maxFreq in [2, 60] (p-value terms unroll per frequency)")
    val pg = periodogram(df, xCol, valueCol, maxFreq)
    val m = maxFreq
    // exact binomials C(m, j) as plan-time literals (m ≤ 60 keeps
    // them inside exact-double range)
    val binom = new Array[Double](m + 1)
    binom(0) = 1.0
    for (j <- 1 to m) binom(j) = binom(j - 1) * (m - j + 1) / j
    val base = pg.agg(
      count(lit(1)).as("n_freqs"),
      max_by(col("freq"), struct(col("power"), -col("freq")))
        .as("peak_freq"),
      max(col("power")).as("__mx"),
      sum(col("power")).as("__tot"))
    val g = when(col("__tot") > 0, col("__mx") / col("__tot"))
    // p = Σ_{j·g ≤ 1} (−1)^{j−1} C(m,j) (1−jg)^{m−1}, clamped to [0,1]
    val p = (1 to m).map { j =>
      when(lit(j.toDouble) * g <= 1,
        lit(if (j % 2 == 1) binom(j) else -binom(j)) *
          pow(lit(1.0) - lit(j.toDouble) * g, m - 1))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    base.select(col("n_freqs"), col("peak_freq"), g.as("g_stat"),
      least(greatest(p, lit(0.0)), lit(1.0)).as("p_value"))
  }

  /**
   * Mann–Kendall monotone-trend test per key over the daily mean
   * series — the nonparametric "is this metric drifting" companion
   * to [[theilSen]] (which gives the slope; MK gives the evidence):
   * S = Σ_{i<j} sgn(x_j − x_i) over day pairs, with the tie-corrected
   * null variance Var = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 and the
   * continuity-corrected z = (S − sgn(S))/√Var. Returns one row per
   * key: (key…, n_days, s_stat, var_s, z).
   *
   * Scale shape: [[theilSen]]'s — the corpus reduces to per-key DAILY
   * frames first, so the pair self-join is O(days²) per key over
   * day-bounded series (≈66k pairs/year — report algebra, not corpus
   * work), keyed on the entity so hot keys parallelize across keys;
   * ties come from one (key, value) groupBy.
   */
  def mannKendall(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mannKendall: keyCols required")
    import graft.analysis.PrefixSum
    val v = col(valueCol).cast("double")
    val daily = df.where(v.isNotNull && col(tsCol).isNotNull)
      .groupBy(keyCols.map(col) :+ to_date(col(tsCol)).as("__d"): _*)
      .agg(avg(v).as("__x"))
      .localCheckpoint() // both pair-join sides + the tie frame read it
    val l = daily.select(keyCols.map(col) :+ col("__d").as("__dl") :+
      col("__x").as("__xl"): _*)
    val r = daily.select(keyCols.map(col) :+ col("__d").as("__dr") :+
      col("__x").as("__xr"): _*)
    val sFrame = PrefixSum.joinNullSafe(l, r, keyCols)
      .where(col("__dl") < col("__dr"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(signum(col("__xr") - col("__xl"))).as("s_stat"))
    val ties = daily.groupBy(keyCols.map(col) :+ col("__x"): _*)
      .agg(count(lit(1)).cast("double").as("__t"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__t")).as("__n"),
        sum(col("__t") * (col("__t") - 1) *
          (lit(2.0) * col("__t") + 5)).as("__tt"))
    PrefixSum.joinNullSafe(sFrame, ties, keyCols)
      .select(keyCols.map(col) ++ Seq(
        col("__n").cast("long").as("n_days"), col("s_stat"),
        ((col("__n") * (col("__n") - 1) * (lit(2.0) * col("__n") + 5) -
          col("__tt")) / 18).as("var_s")): _*)
      .withColumn("z",
        when(col("var_s") > 0 && col("s_stat") =!= 0,
          (col("s_stat") - signum(col("s_stat"))) / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
  }

  /**
   * Hurst exponent by rescaled-range (R/S) analysis of a daily
   * series — the long-memory diagnostic: H ≈ 0.5 for a random walk's
   * increments (no memory), H → 1 for trending/persistent series,
   * H → 0 for mean-reverting/anti-persistent ones. For each block
   * size k the series splits into consecutive COMPLETE blocks of k
   * days; each block contributes R/S = (max − min of the cumulative
   * within-block deviation) / (population sd); H is the OLS slope of
   * ln(mean R/S) on ln k across the block sizes. Returns ONE row:
   * (n_days, n_sizes, hurst) — compare block-size count ≥ 3 before
   * trusting the slope.
   *
   * Scale shape: one daily groupBy; the block-size grid explodes the
   * (≤days)-row frame |sizes|×; block means are a (k, block) groupBy
   * joined back by equi-key; the cumulative-deviation window is
   * partitioned by (k, block) — ≤ k rows per partition BY
   * CONSTRUCTION, never a whole-series window; the final regression
   * is algebra over the |sizes|-row frame.
   */
  def hurstExponent(df: DataFrame, tsCol: String, valueCol: String,
      blockSizes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.analysis.PrefixSum
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 4),
      "hurstExponent: block sizes >= 4")
    val v = col(valueCol).cast("double")
    val daily = df.where(v.isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d")).agg(avg(v).as("__x"))
    val idx = daily
      .crossJoin(broadcast(daily.agg(min(col("__d")).as("__d0"),
        count(lit(1)).as("__nd"))))
      .select(datediff(col("__d"), col("__d0")).as("__i"), col("__x"),
        col("__nd"))
    val grid = idx.select(col("__i"), col("__x"), col("__nd"),
      explode(array(blockSizes.map(lit): _*)).as("__k"))
      .withColumn("__b", floor(col("__i") / col("__k")))
    val blockN = grid.groupBy("__k", "__b")
      .agg(count(lit(1)).as("__bn"), avg(col("__x")).as("__bm"),
        stddev_pop(col("__x")).as("__bs"))
    val complete = PrefixSum.joinNullSafe(grid, blockN,
        Seq("__k", "__b"))
      .where(col("__bn") === col("__k") && col("__bs") > 0)
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rs = complete
      .withColumn("__cum", sum(col("__x") - col("__bm")).over(w))
      .groupBy("__k", "__b")
      .agg(((max(col("__cum")) - min(col("__cum"))) / max(col("__bs")))
        .as("__rs"), max(col("__nd")).as("__nd"))
    val perK = rs.groupBy("__k")
      .agg(avg(col("__rs")).as("__mrs"), count(lit(1)).as("__nb"),
        max(col("__nd")).as("__nd"))
      .where(col("__mrs") > 0)
    perK.agg(max(col("__nd")).cast("long").as("n_days"),
        count(lit(1)).as("n_sizes"),
        count(lit(1)).cast("double").as("__m"),
        sum(log(col("__k"))).as("__slk"),
        sum(log(col("__mrs"))).as("__slr"),
        sum(log(col("__k")) * log(col("__k"))).as("__slkk"),
        sum(log(col("__k")) * log(col("__mrs"))).as("__slkr"))
      .select(col("n_days"), col("n_sizes"),
        ((col("__m") * col("__slkr") - col("__slk") * col("__slr")) /
          (col("__m") * col("__slkk") - col("__slk") * col("__slk")))
          .as("hurst"))
  }

  /**
   * Engle–Granger cointegration screen between two daily series: do
   * x and y share a long-run equilibrium (their spread mean-reverts)
   * even though each drifts? Step 1 fits the hedge ratio
   * y ~ a + b·x (closed-form OLS from one moments row); step 2 runs
   * the Dickey–Fuller-style regression Δe_t ~ α + ρ·e_{t−1} on the
   * residual spread and reports ρ and its t statistic (strongly
   * negative t ⇒ the spread snaps back ⇒ cointegrated; compare to
   * the Engle–Granger critical values, ≈ −3.37 at 5%). Everything
   * is sufficient-stats column algebra — both fits replay exactly in
   * any engine. Returns ONE row:
   * (n, hedge_ratio, intercept, rho, df_t).
   *
   * Scale shape: one conditional daily aggregation; step 1 is a
   * 1-row moments reduce broadcast back as literals-by-join; step 2
   * is a day-keyed lag self-join ([[grangerCausality]]'s shape) and
   * a second 1-row reduce. No window, nothing driver-side.
   */
  def cointegration(df: DataFrame, tsCol: String, valueCol: String,
      xCond: Column, yCond: Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val daily = df
      .where(v.isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(avg(when(xCond, v)).as("__x"), avg(when(yCond, v)).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint() // step-1 moments + residual frame + lag join
    val m1 = broadcast(daily.agg(count(lit(1)).cast("double").as("__n1"),
      sum(col("__x")).as("__sx1"), sum(col("__y")).as("__sy1"),
      sum(col("__x") * col("__x")).as("__sxx1"),
      sum(col("__x") * col("__y")).as("__sxy1")))
    val b = (col("__n1") * col("__sxy1") - col("__sx1") * col("__sy1")) /
      (col("__n1") * col("__sxx1") - col("__sx1") * col("__sx1"))
    val a = (col("__sy1") - b * col("__sx1")) / col("__n1")
    val resid = daily.crossJoin(m1)
      .select(col("__d"), (col("__y") - a - b * col("__x")).as("__e"),
        col("__n1"), b.as("__b"), a.as("__a"))
      .localCheckpoint() // both sides of the lag join read it
    val frame = resid.as("t")
      .join(resid.select(date_add(col("__d"), 1).as("__d"),
        col("__e").as("__el")).as("p"), Seq("__d"))
      .select((col("__e") - col("__el")).as("__de"), col("__el"),
        col("__n1"), col("__b"), col("__a"))
    frame.agg(max(col("__n1")).cast("long").as("n"),
        max(col("__b")).as("hedge_ratio"), max(col("__a")).as("intercept"),
        count(lit(1)).cast("double").as("__n2"),
        sum(col("__el")).as("__sl"), sum(col("__de")).as("__sd"),
        sum(col("__el") * col("__el")).as("__sll"),
        sum(col("__el") * col("__de")).as("__sld"),
        sum(col("__de") * col("__de")).as("__sdd"))
      .select(col("n"), col("hedge_ratio"), col("intercept"),
        ((col("__n2") * col("__sld") - col("__sl") * col("__sd")) /
          (col("__n2") * col("__sll") - col("__sl") * col("__sl")))
          .as("rho"),
        // t = rho / se(rho) with se² = (RSS/(n−2)) / Sxx_centered
        (((col("__n2") * col("__sld") - col("__sl") * col("__sd")) /
          (col("__n2") * col("__sll") - col("__sl") * col("__sl"))) /
          sqrt(((col("__sdd") -
            (col("__sd") * col("__sd") / col("__n2")) -
            (((col("__n2") * col("__sld") - col("__sl") * col("__sd")) /
              (col("__n2") * col("__sll") - col("__sl") * col("__sl"))) *
              (col("__sld") - col("__sl") * col("__sd") / col("__n2")))) /
            (col("__n2") - 2)) /
            (col("__sll") - col("__sl") * col("__sl") / col("__n2"))))
          .as("df_t"))
  }

  /**
   * Bivariate Granger causality (lag-1): does yesterday's x series
   * improve predicting today's y beyond y's own yesterday? The
   * restricted model y_t ~ (1, y_{t−1}) is nested in the unrestricted
   * y_t ~ (1, y_{t−1}, x_{t−1}); the readout is the incremental-RSS
   * F statistic F = (RSS_r − RSS_u) / (RSS_u/(n−3)) on (1, n−3) dof
   * plus x's lag coefficient — the standard "leading indicator"
   * screen between two metric series (do clicks lead purchases?).
   * Both OLS fits are solved in CLOSED FORM from one moments row
   * (2×2 and Cramer 3×3, pure column algebra — the q293/q299
   * discipline), so any engine replays them exactly. Returns ONE
   * row: (n, beta_xlag, rss_restricted, rss_unrestricted, f_stat).
   *
   * Scale shape: two daily conditional aggregations in ONE grouped
   * scan, a day-keyed self-join for the lag (equi-join on d−1, no
   * unpartitioned window), one 1-row moments reduce; every fit
   * is algebra on that row.
   */
  def grangerCausality(df: DataFrame, tsCol: String, valueCol: String,
      xCond: Column, yCond: Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val daily = df
      .where(v.isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(avg(when(xCond, v)).as("__x"), avg(when(yCond, v)).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint() // both sides of the lag self-join read it
    val frame = daily.as("t")
      .join(daily.select(date_add(col("__d"), 1).as("__d"),
          col("__x").as("__xl"), col("__y").as("__yl")).as("p"),
        Seq("__d"))
      .select(col("__y"), col("__yl"), col("__xl"))
    val m = frame.agg(count(lit(1)).cast("double").as("n"),
      sum(col("__y")).as("sy"), sum(col("__y") * col("__y")).as("syy"),
      sum(col("__yl")).as("sl"), sum(col("__yl") * col("__yl")).as("sll"),
      sum(col("__xl")).as("sx"), sum(col("__xl") * col("__xl")).as("sxx"),
      sum(col("__yl") * col("__y")).as("sly"),
      sum(col("__xl") * col("__y")).as("sxy"),
      sum(col("__yl") * col("__xl")).as("slx"))
    val bR = (col("n") * col("sly") - col("sl") * col("sy")) /
      (col("n") * col("sll") - col("sl") * col("sl"))
    val aR = (col("sy") - bR * col("sl")) / col("n")
    // Cramer 3x3 for (a, b, c) on (1, ylag, xlag)
    val det = col("n") * (col("sll") * col("sxx") - col("slx") * col("slx")) -
      col("sl") * (col("sl") * col("sxx") - col("slx") * col("sx")) +
      col("sx") * (col("sl") * col("slx") - col("sll") * col("sx"))
    val dA = col("sy") * (col("sll") * col("sxx") - col("slx") * col("slx")) -
      col("sl") * (col("sly") * col("sxx") - col("slx") * col("sxy")) +
      col("sx") * (col("sly") * col("slx") - col("sll") * col("sxy"))
    val dB = col("n") * (col("sly") * col("sxx") - col("slx") * col("sxy")) -
      col("sy") * (col("sl") * col("sxx") - col("slx") * col("sx")) +
      col("sx") * (col("sl") * col("sxy") - col("sly") * col("sx"))
    val dC = col("n") * (col("sll") * col("sxy") - col("sly") * col("slx")) -
      col("sl") * (col("sl") * col("sxy") - col("sly") * col("sx")) +
      col("sy") * (col("sl") * col("slx") - col("sll") * col("sx"))
    val aU = dA / det; val bU = dB / det; val cU = dC / det
    val rssR = col("syy") - aR * col("sy") - bR * col("sly")
    val rssU = col("syy") - aU * col("sy") - bU * col("sly") -
      cU * col("sxy")
    m.select(col("n").cast("long").as("n"), cU.as("beta_xlag"),
      rssR.as("rss_restricted"), rssU.as("rss_unrestricted"),
      when(col("n") > 3 && rssU > 0,
        (rssR - rssU) / (rssU / (col("n") - 3))).as("f_stat"))
  }

  /**
   * Runs test (up–down variant) per key over the daily mean series:
   * is the series a random scatter, or does it trend/oscillate? Each
   * consecutive day pair contributes an UP or DOWN sign (exact-tie
   * pairs are dropped — no center estimate, no cross-engine float
   * boundary: every sign is a comparison of two data values); R =
   * number of maximal same-sign runs. Against randomness the null
   * moments are E[R] = (2n−1)/3 and Var[R] = (16n−29)/90 with n the
   * effective series length (signs + 1): too FEW runs ⇒ trending,
   * too MANY ⇒ oscillating — z carries the direction. Returns one
   * row per key: (key…, n_days, n_signs, runs, expected_runs, z).
   *
   * Scale shape: one daily groupBy, two stacked lag windows BOTH
   * partitioned by the key over day-bounded series (the
   * [[durbinWatson]] adjacency shape), one grouped reduce.
   */
  def runsTest(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "runsTest: keyCols required")
    val daily = df
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(keyCols.map(col) :+ to_date(col(tsCol)).as("__d"): _*)
      .agg(avg(col(valueCol).cast("double")).as("__x"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__d"))
    val signs = daily
      .withColumn("__prev", lag(col("__x"), 1).over(w))
      .withColumn("__s",
        when(col("__x") > col("__prev"), 1)
          .when(col("__x") < col("__prev"), -1))
      .withColumn("__nd",
        count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .where(col("__s").isNotNull)
    val runs = signs
      .withColumn("__ps", lag(col("__s"), 1).over(w))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("__nd")).as("n_days"),
        count(lit(1)).as("n_signs"),
        (lit(1L) + coalesce(sum(when(col("__ps").isNotNull &&
          col("__s") =!= col("__ps"), 1L)), lit(0L))).as("runs"))
    val nEff = (col("n_signs") + 1).cast("double")
    runs.select(keyCols.map(col) ++ Seq(col("n_days"), col("n_signs"),
      col("runs"),
      ((lit(2.0) * nEff - 1) / 3).as("expected_runs"),
      when(nEff >= 3,
        (col("runs") - (lit(2.0) * nEff - 1) / 3) /
          sqrt((lit(16.0) * nEff - 29) / 90)).as("z")): _*)
  }

  /**
   * Page–Hinkley mean-shift detector per key over the daily mean
   * series — the sequential companion to the retrospective
   * [[changepoint]]: it answers "WHEN would an online monitor have
   * fired", not "where does the series split best". The classic
   * one-sided (upward) form: with running mean x̄_t of the first t
   * days, the cumulative deviation m_t = Σ_{i≤t}(x_i − x̄_i − δ)
   * drifts down under stability (δ is the tolerated slack) and climbs
   * on a sustained upward shift; an alarm fires whenever
   * m_t − min_{i≤t} m_i > λ. Returns one row per key:
   * (key…, n_days, n_alarm_days, first_alarm_date, max_ph) with
   * max_ph = max_t(m_t − min_{i≤t} m_i), the detector's closest
   * approach to (or excursion past) the λ fence.
   *
   * Scale shape: one map-side-combined daily groupBy, then three
   * stacked windows ALL partitioned by the same key (running mean,
   * cumulative m, prefix min) over day-count-bounded per-key series —
   * one shuffle total, no unpartitioned window, nothing driver-side.
   */
  def pageHinkley(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, delta: Double = 0.0,
      lambda: Double = 10.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "pageHinkley: keyCols required")
    val daily = df
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(keyCols.map(col) :+ to_date(col(tsCol)).as("__d"): _*)
      .agg(avg(col(valueCol).cast("double")).as("__x"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ph = daily
      .withColumn("__mean", avg(col("__x")).over(w))
      .withColumn("__m",
        sum(col("__x") - col("__mean") - lit(delta)).over(w))
      .withColumn("__gap", col("__m") - min(col("__m")).over(w))
    ph.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_days"),
        coalesce(sum(when(col("__gap") > lambda, 1L)), lit(0L))
          .as("n_alarm_days"),
        min(when(col("__gap") > lambda, col("__d")))
          .as("first_alarm_date"),
        max(col("__gap")).as("max_ph"))
  }

  /** The daily-mean series both unit-root tests reduce: (__t epoch-day,
    * __x) — the corpus collapses to ≤|calendar| rows in ONE grouped
    * pass, so everything after is calendar-sized. */
  private def dailySeries(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(avg(col(valueCol).cast("double")).as("__x"))
      .select(datediff(col("__d"), lit("1970-01-01")).as("__t"),
        col("__x"))

  /** Daily EVENT-COUNT series (__t epoch-day, __y count): the
    * integer-valued sibling of [[dailySeries]] — counts are exact in
    * any summation order, so rank- and argmin-based tests over them
    * are engine-deterministic (daily MEANS are not: fp association
    * could flip a rank tie or an argmin between engines). */
  private def dailyCounts(df: DataFrame, tsCol: String): DataFrame =
    df.where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).cast("double").as("__y"))
      .select(datediff(col("__d"), lit("1970-01-01")).as("__t"),
        col("__y"))

  /**
   * Single-changepoint detection (AMOC, at-most-one-change, SSE
   * cost): the split of the daily count series minimizing
   * SSE_left + SSE_right — "WHEN did this metric's level shift", the
   * first question after a drift alarm fires. Both SSEs come from ONE
   * prefix-moments pass over the calendar-sized frame; the argmin is
   * a TakeOrdered over ≤|days| candidates (ties → earliest day).
   * Returns 1 row: (n_days, change_day, n_left, n_right, mean_left,
   * mean_right, sse_total, sse_split, reduction_share).
   */
  def amocChangepoint(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol)
    val pre = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__y2", col("__y") * col("__y")),
        "__t", Seq("__y" -> "__exs", "__y2" -> "__exs2"))
      .withColumn("__s", col("__exs") + col("__y"))
      .withColumn("__s2", col("__exs2") + col("__y2"))
    val idx = graft.analysis.PrefixSum.exclusive(
        pre.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi"))
      .withColumn("__i", col("__exi") + 1)
    // "__tsum", not "__S": the case-insensitive resolver would clash
    // with the prefix frame's "__s" across the crossJoin (q346 lesson)
    val tot = broadcast(daily.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__y")).as("__tsum"),
      sum(col("__y") * col("__y")).as("__tsum2")))
    val cand = idx.crossJoin(tot)
      .where(col("__i") < col("__n")) // a split needs a right side
      .withColumn("__sseL",
        col("__s2") - col("__s") * col("__s") / col("__i"))
      .withColumn("__sseR",
        (col("__tsum2") - col("__s2")) -
          (col("__tsum") - col("__s")) * (col("__tsum") - col("__s")) /
            (col("__n") - col("__i")))
      .withColumn("__sse", col("__sseL") + col("__sseR"))
    cand.orderBy(col("__sse"), col("__t")).limit(1)
      .select(col("__n").cast("long").as("n_days"),
        to_date(lit("1970-01-01")).as("__epoch"), col("__t"),
        col("__i").cast("long").as("n_left"),
        (col("__n") - col("__i")).cast("long").as("n_right"),
        (col("__s") / col("__i")).as("mean_left"),
        ((col("__tsum") - col("__s")) / (col("__n") - col("__i")))
          .as("mean_right"),
        (col("__tsum2") - col("__tsum") * col("__tsum") / col("__n"))
          .as("sse_total"),
        col("__sse").as("sse_split"))
      .withColumn("change_day", date_add(col("__epoch"), col("__t")))
      .withColumn("reduction_share", when(col("sse_total") > 0,
        (col("sse_total") - col("sse_split")) / col("sse_total")))
      .select(col("n_days"), col("change_day"), col("n_left"),
        col("n_right"), col("mean_left"), col("mean_right"),
        col("sse_total"), col("sse_split"), col("reduction_share"))
  }

  /**
   * Pettitt changepoint test on the daily count series — the
   * RANK-based (distribution-free) companion to [[amocChangepoint]]:
   * U_t = 2·S_t − t(n+1) with S_t the prefix sum of midranks; the
   * change point maximizes |U_t| and
   * p ≈ 2·exp(−6K²/(n³+n²)) attaches the classical approximation.
   * Midranks from the value-count frame, day positions and prefix
   * rank sums from [[graft.analysis.PrefixSum]] — no global window.
   * Returns 1 row: (n_days, change_day, k_stat, p_approx).
   */
  def pettittTest(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val vc = daily.groupBy(col("__y").as("__v"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val mr = graft.analysis.PrefixSum.exclusive(
        vc, "__v", Seq("__c" -> "__ex"))
      .select(col("__v"), (col("__ex") + (col("__c") + 1) / 2.0)
        .as("__r"))
    val ranked = daily.join(mr, daily("__y") === mr("__v"))
      .select(col("__t"), col("__r"))
    val pre = graft.analysis.PrefixSum.exclusive(
        ranked.withColumn("__one", lit(1.0)), "__t",
        Seq("__r" -> "__exr", "__one" -> "__exi"))
      .withColumn("__S", col("__exr") + col("__r"))
      .withColumn("__i", col("__exi") + 1)
    val tot = broadcast(daily.agg(count(lit(1)).cast("double").as("__n")))
    val u = pre.crossJoin(tot)
      .where(col("__i") < col("__n"))
      .withColumn("__U",
        lit(2.0) * col("__S") - col("__i") * (col("__n") + 1))
    u.orderBy(abs(col("__U")).desc, col("__t")).limit(1)
      .select(col("__n").cast("long").as("n_days"),
        date_add(to_date(lit("1970-01-01")), col("__t"))
          .as("change_day"),
        abs(col("__U")).as("k_stat"),
        least(lit(1.0), lit(2.0) * exp(lit(-6.0) * col("__U") *
          col("__U") / (col("__n") * col("__n") * col("__n") +
            col("__n") * col("__n")))).as("p_approx"))
  }

  /**
   * Cox–Stuart trend sign test on the daily count series: pair day i
   * with day i + ⌈n/2⌉, count strictly positive vs negative
   * differences — the assumption-free "is this metric trending at
   * all" gate (monotone in ANY shape trips it; oscillation does not).
   * z is the binomial normal approximation on the non-tied pairs.
   * Returns 1 row: (n_days, n_pairs, n_up, n_down, z_stat).
   */
  def coxStuart(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val idx = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi"))
      .withColumn("__i", (col("__exi") + 1).cast("long"))
      .select(col("__i"), col("__y"))
    val n = idx.count()
    val c = (n + 1) / 2 // ⌈n/2⌉; odd n leaves the middle day unpaired
    val late = idx.select((col("__i") - c).as("__i"),
      col("__y").as("__y2"))
    val pairs = idx.join(late, Seq("__i"))
      .select((col("__y2") - col("__y")).as("__d"))
      .where(col("__d") =!= 0.0)
    pairs.agg(count(lit(1)).cast("double").as("__m"),
        sum(when(col("__d") > 0, 1.0).otherwise(0.0)).as("__up"))
      .select(lit(n).as("n_days"),
        col("__m").cast("long").as("n_pairs"),
        col("__up").cast("long").as("n_up"),
        (col("__m") - col("__up")).cast("long").as("n_down"),
        when(col("__m") > 0,
          (col("__up") - col("__m") / 2) / sqrt(col("__m") / 4))
          .as("z_stat"))
  }

  /**
   * Wald–Wolfowitz runs test on the daily count series vs its median:
   * too FEW runs = level shifts / trending, too MANY = oscillation —
   * the randomness screen on a KPI sequence. Days equal to the median
   * drop (the standard convention); runs count via consecutive-rank
   * pairing (one equi-join, no window over the calendar).
   * Returns 1 row: (n_days, n_above, n_below, n_runs, z_stat).
   */
  def runsTest(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    // r14: the median rides as a broadcast 1-row frame instead of a
    // serial driver head() — the whole machinery here is over the
    // ≤|days| daily frame, so the composed plan is report-sized and
    // the removed action was pure serialization
    val medF = broadcast(graft.analysis.AnalysisPlanner
      .percentilesFromCounts(
        daily.groupBy(col("__y").as("__v"))
          .agg(count(lit(1)).as("__c")),
        Seq(("m", 0.5)), Nil)
      .select(col("m").as("__med")))
    val signed = daily.crossJoin(medF)
      .where(col("__y") =!= col("__med"))
      .withColumn("__sgn",
        when(col("__y") > col("__med"), 1.0).otherwise(0.0))
      .drop("__med")
    val idx = graft.analysis.PrefixSum.exclusive(
        signed.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi"))
      .withColumn("__i", (col("__exi") + 1).cast("long"))
      .select(col("__i"), col("__sgn"))
      .localCheckpoint() // both sides of the consecutive join read it
    val nxt = idx.select((col("__i") - 1).as("__i"),
      col("__sgn").as("__sgn2"))
    val changes = idx.join(nxt, Seq("__i"))
      .agg(sum(when(col("__sgn") =!= col("__sgn2"), 1.0)
        .otherwise(0.0)).as("__ch"))
    val cnt = idx.agg(sum(col("__sgn")).as("__na"),
      (count(lit(1)) - sum(col("__sgn"))).as("__nb"))
    cnt.crossJoin(broadcast(changes))
      .withColumn("__n", col("__na") + col("__nb"))
      .withColumn("__R", col("__ch") + 1)
      .select(col("__n").cast("long").as("n_days"),
        col("__na").cast("long").as("n_above"),
        col("__nb").cast("long").as("n_below"),
        col("__R").cast("long").as("n_runs"), {
          val e = lit(2.0) * col("__na") * col("__nb") / col("__n") + 1
          val vr = lit(2.0) * col("__na") * col("__nb") *
            (lit(2.0) * col("__na") * col("__nb") - col("__n")) /
            (col("__n") * col("__n") * (col("__n") - 1))
          when(vr > 0, (col("__R") - e) / sqrt(vr)).as("z_stat")
        })
  }

  /**
   * Partial autocorrelation at lags 1–3 of the daily MEAN series via
   * Durbin–Levinson over [[Evaluation.acf]]'s estimates — the "is it
   * AR(1) or genuinely higher-order" readout that raw ACF can't give
   * (an AR(1)'s ACF decays forever; its PACF cuts off at 1).
   * Returns 1 row: (n_days, r1, r2, r3, pacf1, pacf2, pacf3).
   */
  def pacf3(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = dailySeries(df, tsCol, valueCol).localCheckpoint()
    val a = Evaluation.acf(daily, "__t", "__x", maxLag = 3)
    val row = a.agg(
      max(when(col("lag") === 1, col("acf"))).as("r1"),
      max(when(col("lag") === 2, col("acf"))).as("r2"),
      max(when(col("lag") === 3, col("acf"))).as("r3"))
    val nd = broadcast(daily.agg(count(lit(1)).as("n_days")))
    row.crossJoin(nd)
      .withColumn("pacf1", col("r1"))
      .withColumn("__p22",
        (col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1")))
      .withColumn("__p21", col("r1") * (lit(1.0) - col("__p22")))
      .withColumn("pacf2", col("__p22"))
      .withColumn("pacf3",
        (col("r3") - col("__p21") * col("r2") - col("__p22") * col("r1")) /
          (lit(1.0) - col("__p21") * col("r1") - col("__p22") * col("r2")))
      .select(col("n_days"), col("r1"), col("r2"), col("r3"),
        col("pacf1"), col("pacf2"), col("pacf3"))
  }

  /**
   * Dickey–Fuller unit-root test (with intercept, lag 0) on the DAILY
   * mean series of a metric: regress Δx_t on x_{t−1}; the t-statistic
   * of the slope is the DF statistic (compare against the
   * Dickey–Fuller, NOT normal, critical values — ~−2.86 at 5% for the
   * constant-only form). A metric that mean-reverts (stationary)
   * shows a strongly negative DF; a random-walk metric hovers near 0
   * — the "is this KPI drifting or just noisy" readout. Consecutive
   * calendar days pair via an equi-join on t−1 (the [[Evaluation.acf]]
   * convention — gaps drop pairs rather than faking continuity).
   * Returns (n_days, n_pairs, gamma, se_gamma, df_stat).
   */
  def dickeyFuller(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = dailySeries(df, tsCol, valueCol)
      .localCheckpoint() // both join sides + the day count read it
    val lagged = daily.select((col("__t") + 1).as("__t"),
      col("__x").as("__xl"))
    val pairs = daily.join(lagged, Seq("__t"))
      .select(col("__xl").as("__z"), (col("__x") - col("__xl")).as("__dy"))
    val nDays = broadcast(daily.agg(count(lit(1)).as("n_days")))
    pairs.agg(count(lit(1)).cast("double").as("__np"),
        sum(col("__z")).as("__sz"), sum(col("__z") * col("__z")).as("__szz"),
        sum(col("__dy")).as("__sd"), sum(col("__z") * col("__dy")).as("__szd"),
        sum(col("__dy") * col("__dy")).as("__sdd"))
      .withColumn("__sxx",
        col("__szz") - col("__sz") * col("__sz") / col("__np"))
      .withColumn("__sxy",
        col("__szd") - col("__sz") * col("__sd") / col("__np"))
      .withColumn("gamma", when(col("__sxx") > 0,
        col("__sxy") / col("__sxx")))
      .withColumn("__sse", col("__sdd") -
        col("__sd") * col("__sd") / col("__np") -
        col("gamma") * col("__sxy"))
      .withColumn("se_gamma", when(col("__np") > 2 && col("__sxx") > 0,
        sqrt(col("__sse") / (col("__np") - 2) / col("__sxx"))))
      .crossJoin(nDays)
      .select(col("n_days"), col("__np").cast("long").as("n_pairs"),
        col("gamma"), col("se_gamma"),
        when(col("se_gamma") > 0, col("gamma") / col("se_gamma"))
          .as("df_stat"))
  }

  /**
   * KPSS level-stationarity statistic (short-run variance, l = 0) on
   * the daily mean series: η = Σ S_t² / (n²·σ̂²) over partial sums
   * S_t of the demeaned series — the COMPLEMENT of [[dickeyFuller]]
   * (KPSS's null is stationarity; DF's null is the unit root; a
   * metric failing BOTH is genuinely ambiguous, failing only one is a
   * verdict). Partial sums ride [[graft.analysis.PrefixSum]] over the
   * calendar-sized daily frame — no single-partition window even
   * here, the everywhere-discipline. Compare η against 0.463 (5%).
   * Returns (n_days, sigma2, kpss_stat).
   */
  def kpssLevel(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = dailySeries(df, tsCol, valueCol)
      .localCheckpoint() // the mean probe + the prefix pass read it
    val m = broadcast(daily.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__x")).as("__mu")))
    val dm = daily.crossJoin(m)
      .select(col("__t"), (col("__x") - col("__mu")).as("__e"),
        col("__n"))
    val pre = graft.analysis.PrefixSum.exclusive(
      dm, "__t", Seq("__e" -> "__exs"))
      .withColumn("__S", col("__exs") + col("__e")) // inclusive S_t
    pre.agg(max(col("__n")).as("__nn"),
        (sum(col("__e") * col("__e")) / max(col("__n"))).as("sigma2"),
        sum(col("__S") * col("__S")).as("__ss2"))
      .select(col("__nn").cast("long").as("n_days"), col("sigma2"),
        when(col("sigma2") > 0,
          col("__ss2") / (col("__nn") * col("__nn") * col("sigma2")))
          .as("kpss_stat"))
  }

  /** Inclusive prefix moments of the daily-count series ordered by
    * epoch day: for each day, (index __i and running Σt, Σy, Σt², Σty,
    * Σy² over days ≤ it). Every sum is of exact integers (epoch days
    * and counts), so the running values are bit-identical in ANY
    * engine and ANY association order — which is what makes the
    * argmax/argmin split searches built on them engine-deterministic
    * (the q414 discipline). Checkpointed: several candidate scans read
    * it. */
  private def countMoments(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol)
      .withColumn("__tv", col("__t").cast("double"))
      .withColumn("__one", lit(1.0))
      .withColumn("__tt", col("__tv") * col("__tv"))
      .withColumn("__ty", col("__tv") * col("__y"))
      .withColumn("__yy", col("__y") * col("__y"))
    graft.analysis.PrefixSum.exclusive(daily, "__t",
        Seq("__one" -> "__xi", "__tv" -> "__xt", "__y" -> "__xy",
          "__tt" -> "__xtt", "__ty" -> "__xty", "__yy" -> "__xyy"))
      .select(col("__t"), col("__y"),
        (col("__xi") + 1).as("__i"),
        (col("__xt") + col("__tv")).as("__st"),
        (col("__xy") + col("__y")).as("__sy"),
        (col("__xtt") + col("__tt")).as("__stt"),
        (col("__xty") + col("__ty")).as("__sty"),
        (col("__xyy") + col("__yy")).as("__syy"))
      .localCheckpoint()
  }

  /** OLS SSE of y ~ a + b·t on a segment, from that segment's raw
    * moment sums: SSE = Syy − Sty²/Stt (centered). NULL-guarded for
    * degenerate segments (Stt = 0: a single distinct day). */
  private def sseOf(c: Column, st: Column, sy: Column, stt: Column,
      sty: Column, syy: Column): Column = {
    val sxx = stt - st * st / c
    val sxy = sty - st * sy / c
    val syyC = syy - sy * sy / c
    when(sxx > 0, syyC - sxy * sxy / sxx)
  }

  /**
   * Quandt likelihood-ratio (sup-F) structural-break test on the daily
   * event-count series, linear-trend model: at every candidate split k
   * (15%-trimmed), fit y = a + b·t separately to days ≤ k and > k and
   * compute F_k = ((SSE_pooled − SSE_L − SSE_R)/2)/((SSE_L+SSE_R)/(n−4));
   * the statistic is sup F with the break date at the argmax —
   * "did the TREND change, and when", where [[amocChangepoint]] only
   * sees a level shift. All segment fits come from ONE pass of
   * inclusive prefix moments (integer-exact, so the argmax is
   * engine-deterministic; ties → earliest day); candidates are a
   * calendar-sized frame, TakeOrdered(1). Returns 1 row: (n_days,
   * break_day, f_stat, sse_pooled, sse_split).
   */
  def qlrSupF(df: DataFrame, tsCol: String): DataFrame = {
    val m = countMoments(df, tsCol)
    val tot = broadcast(m.orderBy(col("__i").desc).limit(1)
      .select(col("__i").as("__n"), col("__st").as("__tst"),
        col("__sy").as("__tsy"), col("__stt").as("__tstt"),
        col("__sty").as("__tsty"), col("__syy").as("__tsyy")))
    val cand = m.crossJoin(tot)
      .where(col("__i") >= ceil(col("__n") * 0.15) &&
        col("__i") <= floor(col("__n") * 0.85) &&
        col("__i") >= 3 && col("__n") - col("__i") >= 3)
      .withColumn("__sseL", sseOf(col("__i"), col("__st"), col("__sy"),
        col("__stt"), col("__sty"), col("__syy")))
      .withColumn("__sseR", sseOf(col("__n") - col("__i"),
        col("__tst") - col("__st"), col("__tsy") - col("__sy"),
        col("__tstt") - col("__stt"), col("__tsty") - col("__sty"),
        col("__tsyy") - col("__syy")))
      .withColumn("__sseP", sseOf(col("__n"), col("__tst"),
        col("__tsy"), col("__tstt"), col("__tsty"), col("__tsyy")))
      .withColumn("__sseS", col("__sseL") + col("__sseR"))
      .withColumn("__f",
        when(col("__sseS") > 0 && col("__n") > 4,
          ((col("__sseP") - col("__sseS")) / 2) /
            (col("__sseS") / (col("__n") - 4))))
      .where(col("__f").isNotNull)
    cand.orderBy(col("__f").desc, col("__t")).limit(1)
      .select(col("__n").cast("long").as("n_days"),
        date_add(to_date(lit("1970-01-01")), col("__t").cast("int"))
          .as("break_day"),
        col("__f").as("f_stat"), col("__sseP").as("sse_pooled"),
        col("__sseS").as("sse_split"))
  }

  /**
   * CUSUM-of-squares stability statistic on the daily event-count
   * series: with e the residuals of the full-sample y ~ a + b·t fit,
   * W_k = Σ_{i≤k} e² / Σ e² should climb the diagonal k/n under
   * parameter stability; the statistic is max_k |W_k − k/n| — the
   * VARIANCE-stability companion to [[qlrSupF]]'s mean/trend break
   * (Brown–Durbin–Evans shape on OLS residuals). Only the max rides
   * out (its location is fp-graded, so no argmax is reported — the
   * deterministic-argmax discipline). Returns 1 row: (n_days,
   * cusum_sq_stat).
   */
  def cusumSquares(df: DataFrame, tsCol: String): DataFrame = {
    val m = countMoments(df, tsCol)
    val tot = broadcast(m.orderBy(col("__i").desc).limit(1)
      .select(col("__i").as("__n"), col("__st").as("__tst"),
        col("__sy").as("__tsy"), col("__stt").as("__tstt"),
        col("__sty").as("__tsty")))
    // slope/intercept from exact integer moments (bit-identical in
    // any engine); per-day residuals and their squares follow suit.
    // m carries the per-day __y, so NO second corpus scan here
    val daily = m.select("__t", "__y").crossJoin(tot)
      .withColumn("__b",
        (col("__tsty") - col("__tst") * col("__tsy") / col("__n")) /
          (col("__tstt") - col("__tst") * col("__tst") / col("__n")))
      .withColumn("__a",
        (col("__tsy") - col("__b") * col("__tst")) / col("__n"))
      .withColumn("__e2",
        pow(col("__y") - col("__a") - col("__b") * col("__t"), 2))
      .withColumn("__one", lit(1.0))
    val pre = graft.analysis.PrefixSum.exclusive(
        daily.select("__t", "__e2", "__one", "__n"), "__t",
        Seq("__e2" -> "__xe", "__one" -> "__xi"))
    val totE = broadcast(daily.agg(sum(col("__e2")).as("__te")))
    pre.crossJoin(totE)
      .withColumn("__w",
        (col("__xe") + col("__e2")) / col("__te") -
          (col("__xi") + 1) / col("__n"))
      .agg(max(col("__n")).cast("long").as("n_days"),
        max(abs(col("__w"))).as("cusum_sq_stat"))
  }

  /**
   * Goldfeld–Quandt heteroskedasticity test on the daily event-count
   * series ordered by time: OLS y ~ a + b·t fit separately to the
   * FIRST 40% and LAST 40% of days (middle 20% dropped, the classical
   * trimming), F = (SSE_last/df)/(SSE_first/df) with df = m − 2 —
   * "is the series getting noisier around its trend". Both fits come
   * from the same inclusive prefix-moment pass (integer-exact
   * segment boundaries and moments). Returns 1 row: (n_days, n_each,
   * sse_first, sse_last, gq_f).
   */
  def goldfeldQuandt(df: DataFrame, tsCol: String): DataFrame = {
    val m = countMoments(df, tsCol)
    val tot = broadcast(m.orderBy(col("__i").desc).limit(1)
      .select(col("__i").as("__n"), col("__st").as("__tst"),
        col("__sy").as("__tsy"), col("__stt").as("__tstt"),
        col("__sty").as("__tsty"), col("__syy").as("__tsyy")))
    val withN = m.crossJoin(tot)
      .withColumn("__m", floor(col("__n") * 0.4))
    val left = withN.where(col("__i") === col("__m"))
      .select(col("__n"), col("__m"),
        sseOf(col("__m"), col("__st"), col("__sy"), col("__stt"),
          col("__sty"), col("__syy")).as("sse_first"))
    val right = withN.where(col("__i") === col("__n") - col("__m"))
      .select(col("__n").as("__n2"),
        sseOf(col("__m"), col("__tst") - col("__st"),
          col("__tsy") - col("__sy"), col("__tstt") - col("__stt"),
          col("__tsty") - col("__sty"), col("__tsyy") - col("__syy"))
          .as("sse_last"))
    left.crossJoin(broadcast(right))
      .select(col("__n").cast("long").as("n_days"),
        col("__m").cast("long").as("n_each"),
        col("sse_first"), col("sse_last"),
        when(col("sse_first") > 0 && col("__m") > 2,
          (col("sse_last") / (col("__m") - 2)) /
            (col("sse_first") / (col("__m") - 2))).as("gq_f"))
  }

  /**
   * Engle's ARCH LM test (lag 1) on the daily-mean series: residuals
   * e from the full-sample y ~ a + b·t fit, then the R² of
   * e²_t ~ c + φ·e²_{t−1} over consecutive-day pairs gives
   * LM = n_pairs·R² ~ χ²(1) under no-ARCH — "does today's volatility
   * predict tomorrow's", the conditional-heteroskedasticity screen
   * beside [[goldfeldQuandt]]'s unconditional one. Returns 1 row:
   * (n_pairs, r2, lm_stat).
   */
  def archLm(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = dailySeries(df, tsCol, valueCol)
      .localCheckpoint() // the fit + both pair sides read it
    val fit = broadcast(daily.agg(
        count(lit(1)).cast("double").as("__n"),
        sum(col("__t").cast("double")).as("__tst"),
        sum(col("__x")).as("__tsy"),
        sum(col("__t").cast("double") * col("__t")).as("__tstt"),
        sum(col("__t").cast("double") * col("__x")).as("__tsty")))
    val resid = daily.crossJoin(fit)
      .withColumn("__b",
        (col("__tsty") - col("__tst") * col("__tsy") / col("__n")) /
          (col("__tstt") - col("__tst") * col("__tst") / col("__n")))
      .withColumn("__a",
        (col("__tsy") - col("__b") * col("__tst")) / col("__n"))
      .withColumn("__e2",
        pow(col("__x") - col("__a") - col("__b") * col("__t"), 2))
      .select("__t", "__e2")
    val lagged = resid.select((col("__t") + 1).as("__t"),
      col("__e2").as("__el"))
    resid.join(lagged, Seq("__t"))
      .agg(count(lit(1)).cast("double").as("__np"),
        sum(col("__el")).as("__sx"), sum(col("__e2")).as("__sy"),
        sum(col("__el") * col("__el")).as("__sxx"),
        sum(col("__el") * col("__e2")).as("__sxy"),
        sum(col("__e2") * col("__e2")).as("__syy2"))
      .select(col("__np").cast("long").as("n_pairs"), {
        val sxx = col("__sxx") - col("__sx") * col("__sx") / col("__np")
        val sxy = col("__sxy") - col("__sx") * col("__sy") / col("__np")
        val syy = col("__syy2") - col("__sy") * col("__sy") / col("__np")
        when(sxx > 0 && syy > 0, sxy * sxy / (sxx * syy)).as("r2")
      })
      .withColumn("lm_stat", col("n_pairs") * col("r2"))
  }

  /**
   * Lo–MacKinlay variance-ratio test on the daily event-count series:
   * VR(q) = Var(q-day overlapping differences)/(q·Var(1-day
   * differences)) with the homoskedastic normal approximation
   * z = (VR−1)/√(2(2q−1)(q−1)/(3qT)) — VR ≈ 1 for a random walk,
   * < 1 under mean reversion, > 1 under momentum. Differences of
   * integer counts keep every moment exact. Both difference frames
   * come from index-shift joins of the SAME checkpointed daily frame.
   * Returns 1 row: (n_days, q, vr, z_stat).
   */
  def varianceRatio(df: DataFrame, tsCol: String,
      q: Int = 5): DataFrame = {
    require(q >= 2, "varianceRatio: q >= 2")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    def diffs(lag: Int): DataFrame =
      daily.join(daily.select((col("__t") + lag).as("__t"),
          col("__y").as("__yl")), Seq("__t"))
        .select((col("__y") - col("__yl")).as("__d"))
    val d1 = diffs(1).agg(count(lit(1)).cast("double").as("__n1"),
      sum(col("__d")).as("__s1"), sum(col("__d") * col("__d")).as("__ss1"))
    val dq = diffs(q).agg(count(lit(1)).cast("double").as("__nq"),
      sum(col("__d")).as("__sq"), sum(col("__d") * col("__d")).as("__ssq"))
    val nd = broadcast(daily.agg(count(lit(1)).cast("double").as("__nn")))
    d1.crossJoin(dq).crossJoin(nd)
      .select(col("__nn").cast("long").as("n_days"),
        lit(q).as("q"), {
          val v1 = (col("__ss1") - col("__s1") * col("__s1") / col("__n1")) /
            (col("__n1") - 1)
          val vq = (col("__ssq") - col("__sq") * col("__sq") / col("__nq")) /
            (col("__nq") - 1)
          when(v1 > 0, vq / (lit(q.toDouble) * v1)).as("vr")
        })
      .withColumn("z_stat",
        (col("vr") - 1) / sqrt(lit(2.0 * (2 * q - 1) * (q - 1)) /
          (lit(3.0 * q) * col("n_days"))))
  }

  /**
   * Change-of-level HOMOGENEITY panel on the daily event-count
   * series — Buishand's range statistic R/√n (max minus min of the
   * cumulative deviations S_k = Σ_{i≤k}(y_i − ȳ), scaled by the
   * sample sd) and the SNHT statistic T = max_k [k·z̄₁² + (n−k)·z̄₂²]
   * with its break day — the climate-literature pair for "did the
   * level shift somewhere", complementary to [[amocChangepoint]]'s
   * SSE form. S_k and both means derive from integer-exact prefix
   * sums, so the SNHT argmax is engine-deterministic (ties →
   * earliest day). Returns 1 row: (n_days, buishand_r, snht_t,
   * snht_break_day).
   */
  def homogeneityPanel(df: DataFrame, tsCol: String): DataFrame = {
    val m = countMoments(df, tsCol)
    val tot = broadcast(m.orderBy(col("__i").desc).limit(1)
      .select(col("__i").as("__n"), col("__sy").as("__tsy"),
        col("__syy").as("__tsyy")))
    val base = m.crossJoin(tot)
      .withColumn("__sk", col("__sy") - col("__i") * col("__tsy") / col("__n"))
      .withColumn("__s2",
        (col("__tsyy") - col("__tsy") * col("__tsy") / col("__n")) /
          col("__n")) // population variance, the Buishand convention
      .localCheckpoint() // range reduce + SNHT argmax read it
    val range = base.agg(max(col("__n")).as("__nn"),
      max(col("__s2")).as("__v"),
      max(col("__sk")).as("__mx"), min(col("__sk")).as("__mn"))
    // ANSI-guard: a constant series (zero variance) has no z-scores —
    // the panel then reports NULL stats rather than NaN
    val snht = base.where(col("__i") < col("__n") && col("__s2") > 0)
      .withColumn("__z1", (col("__sy") / col("__i") -
        col("__tsy") / col("__n")) / sqrt(col("__s2")))
      .withColumn("__z2", ((col("__tsy") - col("__sy")) /
        (col("__n") - col("__i")) -
        col("__tsy") / col("__n")) / sqrt(col("__s2")))
      .withColumn("__tk", col("__i") * col("__z1") * col("__z1") +
        (col("__n") - col("__i")) * col("__z2") * col("__z2"))
      .orderBy(col("__tk").desc, col("__t")).limit(1)
      .select(col("__tk").as("snht_t"),
        date_add(to_date(lit("1970-01-01")), col("__t").cast("int"))
          .as("snht_break_day"))
    // LEFT join so a degenerate (constant) series still yields its
    // 1-row panel with NULL snht columns instead of zero rows
    range.join(broadcast(snht), lit(true), "left")
      .select(col("__nn").cast("long").as("n_days"),
        when(col("__v") > 0, (col("__mx") - col("__mn")) /
          (sqrt(col("__v")) * sqrt(col("__nn")))).as("buishand_r"),
        col("snht_t"), col("snht_break_day"))
  }

  /**
   * Bartels rank test of randomness (the rank von Neumann ratio) on
   * the daily event-count series: with R_i the midranks of the daily
   * counts, RVN = Σ(R_i − R_{i+1})² / Σ(R_i − R̄)² ≈ 2 under
   * randomness (small → positive serial dependence, large →
   * alternation), z = (RVN − 2)/√(4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²)).
   * The nonparametric serial-dependence screen beside [[acf]] —
   * rank-based, so spikes don't dominate. Midranks come from the
   * value-count + [[graft.analysis.PrefixSum]] frame (integer-exact
   * halves); consecutive days pair by INDEX (calendar gaps close
   * rank-neighbors up). Returns 1 row: (n_days, rvn, z_stat).
   */
  def bartelsRank(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol)
      .withColumn("__one", lit(1.0))
      .localCheckpoint() // ONE corpus scan; the prefix pass reads it twice
    val indexed = graft.analysis.PrefixSum.exclusive(daily, "__t",
        Seq("__one" -> "__xi"))
      .withColumn("__i", col("__xi") + 1)
      .select("__t", "__i", "__y")
      .localCheckpoint() // rank join + both pair sides read it
    val vc = indexed.groupBy(col("__y").as("__yv"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val ranks = graft.analysis.PrefixSum.exclusive(vc, "__yv",
        Seq("__c" -> "__ex"))
      .select(col("__yv"), (col("__ex") + (col("__c") + 1) / 2.0).as("__r"))
    val ranked = indexed.join(ranks, col("__y") === col("__yv"))
      .select("__i", "__r")
    val nxt = ranked.select((col("__i") - 1).as("__i"), col("__r").as("__rn"))
    val num = ranked.join(nxt, Seq("__i"))
      .agg(sum(pow(col("__r") - col("__rn"), 2)).as("__num"))
    val den = ranked.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("__r")).as("__sr"), sum(col("__r") * col("__r")).as("__srr"))
    num.crossJoin(den)
      .select(col("__n").cast("long").as("n_days"), {
        val d = col("__srr") - col("__sr") * col("__sr") / col("__n")
        when(d > 0, col("__num") / d).as("rvn")
      })
      .withColumn("z_stat", {
        val n = col("n_days").cast("double")
        (col("rvn") - 2) / sqrt(lit(4.0) * (n - 2) *
          (lit(5.0) * n * n - n * 2 - 9) /
          (lit(5.0) * n * (n + 1) * (n - 1) * (n - 1)))
      })
  }

  /**
   * Randomness panel on the daily event-count series: the
   * TURNING-POINT test (count of strict local peaks/troughs;
   * E = 2(n−2)/3, Var = (16n−29)/90) and the DIFFERENCE-SIGN test
   * (count of strict daily increases; E = (n−1)/2, Var = (n+1)/12) —
   * the two classical quick screens for serial structure, one
   * sensitive to smoothness, the other to trend. Strict inequalities
   * on integer counts make both counts engine-exact (plateaus count
   * as neither). Neighbors pair by index, so calendar gaps close up.
   * Returns 1 row: (n_days, turning_points, tp_z, n_increases,
   * ds_z).
   */
  def randomnessPanel(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol)
      .withColumn("__one", lit(1.0))
      .localCheckpoint() // ONE corpus scan; the prefix pass reads it twice
    val indexed = graft.analysis.PrefixSum.exclusive(daily, "__t",
        Seq("__one" -> "__xi"))
      .withColumn("__i", col("__xi") + 1)
      .select("__i", "__y")
      .localCheckpoint() // three shifted join sides read it
    val prev = indexed.select((col("__i") + 1).as("__i"),
      col("__y").as("__yp"))
    val nxt = indexed.select((col("__i") - 1).as("__i"),
      col("__y").as("__yn"))
    val tp = indexed.join(prev, Seq("__i")).join(nxt, Seq("__i"))
      .agg(sum(when((col("__y") > col("__yp") && col("__y") > col("__yn")) ||
          (col("__y") < col("__yp") && col("__y") < col("__yn")), 1.0)
          .otherwise(0.0)).as("__tp"))
    val ds = indexed.join(prev, Seq("__i"))
      .agg(sum(when(col("__y") > col("__yp"), 1.0).otherwise(0.0))
        .as("__up"))
    val nd = broadcast(indexed.agg(count(lit(1)).cast("double").as("__n")))
    tp.crossJoin(ds).crossJoin(nd)
      .select(col("__n").cast("long").as("n_days"),
        col("__tp").cast("long").as("turning_points"),
        ((col("__tp") - lit(2.0) * (col("__n") - 2) / 3) /
          sqrt((lit(16.0) * col("__n") - 29) / 90)).as("tp_z"),
        col("__up").cast("long").as("n_increases"),
        ((col("__up") - (col("__n") - 1) / 2) /
          sqrt((col("__n") + 1) / 12)).as("ds_z"))
  }

  /**
   * Siegel repeated-medians slope of the daily event-count series —
   * the 50%-breakdown robust trend estimate (Theil–Sen's 29% is the
   * weaker cousin): for every day i, the median over j≠i of the
   * pairwise slopes (y_j−y_i)/(t_j−t_i), then the median of those
   * per-day medians. Both medians use the lower-median DISC
   * convention (an actual slope value); slopes divide exact integer
   * counts by exact integer day gaps, so every order statistic is
   * engine-deterministic. Returns 1 row: (n_days, n_pairs,
   * siegel_slope).
   *
   * Scale shape: the pair frame is |days|² (calendar-bounded, NOT
   * corpus-bounded — ~534k rows for two years); per-day medians ride
   * a window PARTITIONED by day (≤|days| rows per group), the final
   * median rides the value-count + [[graft.analysis.PrefixSum]]
   * frame. No unpartitioned window anywhere.
   */
  def siegelSlopes(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val b = daily.select(col("__t").as("__tj"), col("__y").as("__yj"))
    val pairs = daily.join(b, col("__t") =!= col("__tj"))
      .withColumn("__slope",
        (col("__yj") - col("__y")) / (col("__tj") - col("__t")))
    val wI = Window.partitionBy("__t").orderBy("__slope")
    val perI = pairs
      .withColumn("__rn", row_number().over(wI))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy("__t")))
      .where(col("__rn") === ceil(col("__m") / 2.0))
      .select(col("__slope").as("__med"))
    val vc = perI.groupBy("__med")
      .agg(count(lit(1)).cast("double").as("__c"))
    val tots = broadcast(daily.agg(
      count(lit(1)).as("__nd"),
      (count(lit(1)) * (count(lit(1)) - 1)).as("__np")))
    val tw = broadcast(vc.agg(sum(col("__c")).as("__tw")))
    graft.analysis.PrefixSum.exclusive(vc, "__med", Seq("__c" -> "__bef"))
      .crossJoin(tw).crossJoin(tots)
      .where(col("__bef") < ceil(col("__tw") / 2.0) &&
        col("__bef") + col("__c") >= ceil(col("__tw") / 2.0))
      .select(col("__nd").as("n_days"), col("__np").as("n_pairs"),
        col("__med").as("siegel_slope"))
  }

  /**
   * Seasonal Mann–Kendall trend test: [[mannKendall]] run within each
   * calendar month-of-year as its own season (Hirsch–Slack form,
   * no cross-season pairs — so a strong annual cycle can't fake a
   * trend), then S = Σ S_m and Var = Σ Var_m combine across seasons
   * into one continuity-corrected z. Returns 1 row: (n_seasons,
   * n_days, s_stat, var_s, z).
   */
  def seasonalMannKendall(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val perSeason = mannKendall(
      df.withColumn("__season", month(col(tsCol))),
      Seq("__season"), tsCol, valueCol)
    perSeason.agg(count(lit(1)).as("n_seasons"),
        sum(col("n_days")).as("n_days"),
        sum(col("s_stat")).as("s_stat"),
        sum(col("var_s")).as("var_s"))
      .withColumn("z",
        when(col("var_s") > 0 && col("s_stat") =!= 0,
          (col("s_stat") - signum(col("s_stat"))) / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
  }

  /**
   * Holt's linear (double) exponential smoothing over the daily
   * event-count series — the classic level+trend forecaster behind
   * capacity-planning readouts: level ℓ_t = α·y_t + (1−α)(ℓ_{t−1} +
   * b_{t−1}), trend b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}, seeded
   * ℓ₁ = y₁, b₁ = y₂ − y₁. Emits the one-step-ahead in-sample SSE
   * and the h-step forecasts ℓ_n + h·b_n. Returns one row per
   * forecast step h = 1..horizon:
   * (h, n_days, level, trend, forecast, sse, rmse).
   *
   * Scale shape: the corpus reduces to the calendar-sized daily
   * count frame (integer-exact, engine-deterministic); the recursion
   * — inherently sequential, O(|days|) — runs driver-side over that
   * BOUNDED aggregate (the [[graft.analysis.AnalysisPlanner.stuartMaxwell]]
   * bounded-solve idiom), never over raw rows.
   */
  def holtLinear(df: DataFrame, tsCol: String, alpha: Double,
      beta: Double, horizon: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "holtLinear: alpha, beta in (0,1)")
    require(horizon >= 1 && horizon <= 366, "holtLinear: horizon 1..366")
    // Fail loudly rather than truncate: a silent limit(N) here would
    // diverge from any exact oracle on a longer-than-N calendar.
    // Collecting N+1 rows detects overflow without a second scan.
    val days = dailyCounts(df, tsCol).orderBy("__t").limit(4001).collect()
    require(days.length <= 4000,
      "holtLinear: series spans > 4000 days; driver recursion is " +
        "bounded at 4000 — pre-aggregate to a coarser calendar")
    require(days.length >= 3, "holtLinear: need >= 3 days")
    val y = days.map(_.getDouble(1))
    var level = y(0)
    var trend = y(1) - y(0)
    var sse = 0.0
    for (t <- 1 until y.length) {
      val pred = level + trend
      sse += (y(t) - pred) * (y(t) - pred)
      val l1 = alpha * y(t) + (1 - alpha) * pred
      trend = beta * (l1 - level) + (1 - beta) * trend
      level = l1
    }
    val rmse = math.sqrt(sse / (y.length - 1))
    (1 to horizon).map(h => (h.toLong, y.length.toLong, level, trend,
        level + h * trend, sse, rmse))
      .toDF("h", "n_days", "level", "trend", "forecast", "sse", "rmse")
  }

  /**
   * Holt–Winters additive seasonal smoothing over the daily
   * event-count series — [[holtLinear]] plus a season-length-`period`
   * additive component: ℓ_t = α(y_t − s_{t−m}) + (1−α)(ℓ+b),
   * b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b, s_t = γ(y_t − ℓ_t) + (1−γ)s_{t−m},
   * seeded from the first two seasons (ℓ₀ = mean of season 1,
   * b₀ = (mean₂ − mean₁)/m, s_i⁰ = y_i − mean₁). Forecast
   * ŷ_{n+h} = ℓ_n + h·b_n + s_{n+h−m}. Returns one row per step
   * h = 1..horizon: (h, n_days, level, trend, seasonal, forecast,
   * sse, rmse) — sse over the post-seed one-step predictions.
   *
   * Scale shape: driver recursion over the BOUNDED daily frame (the
   * [[holtLinear]] discipline, ≤4000-day loud cap); the oracle
   * replays the recursion as a recursive CTE carrying the m-element
   * seasonal state as a list.
   */
  def holtWinters(df: DataFrame, tsCol: String, alpha: Double,
      beta: Double, gamma: Double, period: Int = 7,
      horizon: Int = 7): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1 &&
      gamma > 0 && gamma < 1, "holtWinters: alpha, beta, gamma in (0,1)")
    require(period >= 2 && period <= 366, "holtWinters: period 2..366")
    require(horizon >= 1 && horizon <= period,
      "holtWinters: horizon 1..period")
    val days = dailyCounts(df, tsCol).orderBy("__t").limit(4001).collect()
    require(days.length <= 4000,
      "holtWinters: series spans > 4000 days; pre-aggregate")
    require(days.length >= 2 * period,
      s"holtWinters: need >= ${2 * period} days (two seasons)")
    val y = days.map(_.getDouble(1))
    val m1 = y.take(period).sum / period
    val m2 = y.slice(period, 2 * period).sum / period
    var level = m1
    var trend = (m2 - m1) / period
    val seas = Array.tabulate(period)(i => y(i) - m1)
    var sse = 0.0
    for (t <- period until y.length) {
      val sOld = seas(t % period)
      val pred = level + trend + sOld
      sse += (y(t) - pred) * (y(t) - pred)
      val l1 = alpha * (y(t) - sOld) + (1 - alpha) * (level + trend)
      trend = beta * (l1 - level) + (1 - beta) * trend
      seas(t % period) = gamma * (y(t) - l1) + (1 - gamma) * sOld
      level = l1
    }
    val n = y.length
    val rmse = math.sqrt(sse / (n - period))
    (1 to horizon).map { h =>
      val s = seas((n + h - 1) % period)
      (h.toLong, n.toLong, level, trend, s, level + h * trend + s,
        sse, rmse)
    }.toDF("h", "n_days", "level", "trend", "seasonal", "forecast",
      "sse", "rmse")
  }

  /**
   * Croston's method for INTERMITTENT series (many zero days): two
   * exponential smoothers — demand size z (updated only on non-zero
   * days) and inter-demand interval p — give the demand-rate forecast
   * z/p that a plain EWMA systematically underestimates right after
   * each quiet stretch. SBA variant emitted alongside (the
   * Syntetos–Boylan (1 − α/2) bias correction). Returns ONE row:
   * (n_days, n_demand_days, z_hat, p_hat, forecast, forecast_sba).
   *
   * Scale shape: the same bounded-daily-frame driver recursion as
   * [[holtLinear]]; the oracle replays it as a recursive CTE over the
   * (calendar-bounded) day sequence.
   */
  def croston(df: DataFrame, tsCol: String, demand: Column,
      alpha: Double = 0.1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alpha > 0 && alpha < 1, "croston: alpha in (0,1)")
    val days = df.where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(sum(when(demand, 1.0).otherwise(0.0)).as("__y"))
      .orderBy("__d").limit(4001).collect()
    require(days.length <= 4000,
      "croston: series spans > 4000 days; pre-aggregate")
    val y = days.map(_.getDouble(1))
    val firstIdx = y.indexWhere(_ > 0)
    require(firstIdx >= 0, "croston: no demand days")
    var z = y(firstIdx) // seed: first non-zero demand
    var p = firstIdx + 1.0 // seed: first interval length
    var gap = 0
    var nd = 0L
    for (t <- firstIdx until y.length) {
      gap += 1
      if (y(t) > 0) {
        nd += 1
        if (t > firstIdx) { // seeds consume the first demand
          z = alpha * y(t) + (1 - alpha) * z
          p = alpha * gap + (1 - alpha) * p
        }
        gap = 0
      }
    }
    val f = z / p
    Seq((y.length.toLong, nd, z, p, f, f * (1 - alpha / 2)))
      .toDF("n_days", "n_demand_days", "z_hat", "p_hat", "forecast",
        "forecast_sba")
  }

  /**
   * Gumbel extreme-value fit on the daily block maxima of `valueCol`
   * by the method of moments — β = s·√6/π, μ = m̄ − γβ (γ the
   * Euler–Mascheroni constant) — plus the T-period return levels
   * μ − β·ln(−ln(1 − 1/T)): "what daily peak should capacity expect
   * once per month / quarter / year". Block maxima (a per-day max)
   * are engine-exact — no summation-order sensitivity — and the two
   * moments reduce them in one pass. Returns one row per requested
   * return period T: (t_period, n_blocks, mu, beta, return_level).
   *
   * Scale shape: one groupBy(day) max, one 1-row moments reduce, the
   * bounded T list cross-joined on literals.
   */
  /**
   * Generalized-Pareto peaks-over-threshold fit — the EVT companion
   * to [[gumbelBlockMaxima]] that uses EVERY extreme observation, not
   * one per block: exceedances y = x − u over the exact-DISC
   * `thresholdQ` quantile follow GPD(ξ, σ), fit by the method of
   * moments (ξ = ½(1 − m²/s²), σ = ½m(m²/s² + 1)) — deterministic,
   * no likelihood iteration. Return levels per `returnPeriods`
   * observations: x_T = u + σ/ξ·((λT)^ξ − 1) with λ the exceedance
   * rate (ξ → 0 degenerates to the exponential form u + σ·ln(λT),
   * guarded). Returns one row per period:
   * (t_period, threshold, n_exceed, exceed_rate, xi, sigma,
   * return_level).
   *
   * Scale shape: one value-count pass for the threshold
   * ([[graft.analysis.AnalysisPlanner.exactPercentilesDisc]]), one
   * conditional moments pass over the exceedances, the bounded period
   * list cross-joined on literals.
   */
  def gpdPotFit(df: DataFrame, valueCol: String,
      thresholdQ: Double = 0.95,
      returnPeriods: Seq[Int] = Seq(1000, 10000, 100000)): DataFrame = {
    require(thresholdQ > 0 && thresholdQ < 1, "gpdPotFit: q in (0,1)")
    require(returnPeriods.nonEmpty && returnPeriods.forall(_ >= 2),
      "gpdPotFit: return periods >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(valueCol).cast("double")
    val base = df.where(x.isNotNull).select(x.as("__x"))
      .localCheckpoint() // threshold probe + moments share one frame
    val u = graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(base, "__x", Seq("__u" -> thresholdQ), Nil)
      .head().getAs[Double]("__u")
    val y = col("__x") - lit(u)
    val mom = base.agg(count(lit(1)).cast("double").as("__n"),
      sum(when(col("__x") > u, 1.0).otherwise(0.0)).as("__ne"),
      avg(when(col("__x") > u, y)).as("__m"),
      var_samp(when(col("__x") > u, y)).as("__s2"))
    val r = col("__m") * col("__m") / col("__s2")
    val xi = (lit(1.0) - r) / 2
    val sigma = col("__m") * (r + 1) / 2
    val lam = col("__ne") / col("__n")
    returnPeriods.toDF("t_period").crossJoin(broadcast(mom))
      .select(col("t_period"), lit(u).as("threshold"),
        col("__ne").cast("long").as("n_exceed"),
        lam.as("exceed_rate"), xi.as("xi"), sigma.as("sigma"),
        when(abs(xi) > 1e-9, lit(u) + sigma / xi *
          (pow(lam * col("t_period"), xi) - 1))
          .otherwise(lit(u) + sigma * log(lam * col("t_period")))
          .as("return_level"))
      .orderBy("t_period")
  }

  def gumbelBlockMaxima(df: DataFrame, tsCol: String, valueCol: String,
      returnPeriods: Seq[Int] = Seq(30, 90, 365)): DataFrame = {
    require(returnPeriods.nonEmpty && returnPeriods.forall(_ >= 2),
      "gumbelBlockMaxima: return periods >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val maxima = df
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(max(col(valueCol).cast("double")).as("__m"))
    val mom = maxima.agg(count(lit(1)).as("n_blocks"),
      avg(col("__m")).as("__mean"), stddev_samp(col("__m")).as("__sd"))
    val euler = 0.5772156649015329
    val beta = col("__sd") * math.sqrt(6.0) / math.Pi
    val mu = col("__mean") - lit(euler) * beta
    returnPeriods.toDF("t_period").crossJoin(broadcast(mom))
      .select(col("t_period"), col("n_blocks"), mu.as("mu"),
        beta.as("beta"),
        (mu - beta * log(-log(lit(1.0) - lit(1.0) / col("t_period"))))
          .as("return_level"))
      .orderBy("t_period")
  }

  /**
   * Trend/seasonal strength (Wang–Smith–Hyndman) per key from the
   * [[decompose]] STL-lite components: F_trend = max(0,
   * 1 − Var(R)/Var(T+R)) and F_seasonal = max(0, 1 − Var(R)/Var(S+R))
   * over complete-window days — the forecastability screen (≈0 noise,
   * →1 strongly structured). Returns one row per key: (key, n_days,
   * var_remainder, f_trend, f_seasonal).
   */
  def stlStrength(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, period: Int = 7,
      halfWindow: Int = 3): DataFrame = {
    val dec = decompose(df, keyCols, tsCol, valueCol, period, halfWindow)
      .where(col("remainder").isNotNull)
    dec.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_days"),
        var_samp(col("remainder")).as("var_remainder"),
        var_samp(col("y") - col("seasonal")).as("__vtr"),
        var_samp(col("y") - col("trend")).as("__vsr"))
      .select(keyCols.map(col) ++ Seq(col("n_days"),
        col("var_remainder"),
        when(col("__vtr") > 0, greatest(lit(0.0),
          lit(1.0) - col("var_remainder") / col("__vtr"))).as("f_trend"),
        when(col("__vsr") > 0, greatest(lit(0.0),
          lit(1.0) - col("var_remainder") / col("__vsr")))
          .as("f_seasonal")): _*)
  }

  /**
   * Overdispersion panel: per-key Fano factor of daily counts
   * (var/mean — 1 for Poisson arrivals, ≫1 for bursty ones) plus the
   * cross-key Taylor's-law exponent (OLS slope of ln var on ln mean —
   * ≈1 Poisson, ≈2 clustered). Explicit variance-from-sums formulas
   * keep every number engine-identical from the integer count sums.
   * Returns one row per key: (key, n_days, mean_daily, var_daily,
   * fano, taylor_slope) — the slope repeats per row (it is the
   * cross-key fit).
   *
   * Scale shape: one corpus groupBy (key, day), one per-key reduce,
   * one ≤|keys|-row broadcast fit joined back.
   */
  def fanoTaylor(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"), to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).cast("double").as("__y"))
    val per = daily.groupBy("__g")
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__y")).as("__s1"), sum(col("__y") * col("__y")).as("__s2"))
      .withColumn("__m", col("__s1") / col("__n"))
      .withColumn("__v",
        (col("__s2") - col("__n") * col("__m") * col("__m")) /
          (col("__n") - 1))
      .localCheckpoint() // read per-key AND for the cross-key fit
    val fit = broadcast(per
      .where(col("__v") > 0 && col("__m") > 0)
      .agg(count(lit(1)).cast("double").as("__k"),
        avg(log(col("__m"))).as("__xb"), avg(log(col("__v"))).as("__yb"),
        sum(log(col("__m")) * log(col("__m"))).as("__xx"),
        sum(log(col("__m")) * log(col("__v"))).as("__xy"))
      .select(((col("__xy") - col("__k") * col("__xb") * col("__yb")) /
        (col("__xx") - col("__k") * col("__xb") * col("__xb")))
        .as("taylor_slope")))
    per.crossJoin(fit)
      .select(col("__g").as(keyCol), col("__n").cast("long").as("n_days"),
        col("__m").as("mean_daily"), col("__v").as("var_daily"),
        when(col("__m") > 0, col("__v") / col("__m")).as("fano"),
        col("taylor_slope"))
  }

  /**
   * Interval load curve: the number of intervals [startCol, endCol]
   * active on each calendar day, from +1/−1 daily net changes prefix-
   * summed in date order — the work-in-progress / concurrency readout
   * (Little's-law L) without exploding each interval into its days.
   * Integer-exact in any engine. Returns one row per day with any
   * start or end: (day, started, ended, active).
   *
   * Scale shape: one union+groupBy(day) corpus pass, then a
   * calendar-bounded distributed prefix sum
   * ([[graft.analysis.PrefixSum]] — no single-partition window).
   */
  def intervalLoadCurve(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val starts = df.where(col(startCol).isNotNull)
      .select(to_date(col(startCol)).as("day"), lit(1L).as("__s"),
        lit(0L).as("__e"))
    val ends = df.where(col(endCol).isNotNull)
      .select(to_date(col(endCol)).as("day"), lit(0L).as("__s"),
        lit(1L).as("__e"))
    val daily = starts.unionByName(ends)
      .groupBy("day")
      .agg(sum(col("__s")).as("started"), sum(col("__e")).as("ended"))
      .withColumn("__net", col("started") - col("ended"))
    graft.analysis.PrefixSum.exclusive(daily, "day",
        Seq("__net" -> "__before"))
      .select(col("day"), col("started"), col("ended"),
        (col("__before") + col("__net")).cast("long").as("active"))
  }

  /**
   * Theta-method forecast (Assimakopoulos & Nikolopoulos 2000, the
   * θ ∈ {0, 2} special case that won M3) over the daily event-count
   * series: OLS trend line ℓ(t) = a + b·t on the index t = 1..n, the
   * θ=2 line z_t = 2·y_t − ℓ(t), SES(α) over z (s₁ = z₁), and
   * x̂(n+h) = ½·(ℓ(n+h) + s_n) — half trend extrapolation, half
   * smoothed double-curvature level. Returns one row per step
   * h = 1..horizon: (h, n_days, intercept, drift, ses_level, forecast).
   *
   * Scale shape: driver recursion over the BOUNDED daily count frame
   * (the [[holtLinear]] discipline — loud ≤4000-day cap); integer
   * counts and index sums make a and b bit-identical in any engine,
   * and the SES recursion replays as a recursive CTE.
   */
  def thetaForecast(df: DataFrame, tsCol: String, alpha: Double = 0.2,
      horizon: Int = 7): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alpha > 0 && alpha < 1, "thetaForecast: alpha in (0,1)")
    require(horizon >= 1 && horizon <= 366, "thetaForecast: horizon 1..366")
    val days = dailyCounts(df, tsCol).orderBy("__t").limit(4001).collect()
    require(days.length <= 4000,
      "thetaForecast: series spans > 4000 days; pre-aggregate")
    require(days.length >= 3, "thetaForecast: need >= 3 days")
    val y = days.map(_.getDouble(1))
    val n = y.length
    // exact-sum OLS on the 1-based index: every term is an integer-
    // valued double, so a and b match any engine bit-for-bit
    val tb = (1 to n).map(_.toDouble).sum / n
    val yb = y.sum / n
    val sxy0 = y.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    val sxx0 = (1 to n).map(i => i.toDouble * i).sum
    val b = (sxy0 - n * tb * yb) / (sxx0 - n * tb * tb)
    val a = yb - b * tb
    var s = 2 * y(0) - (a + b * 1)
    for (t <- 2 to n) {
      val z = 2 * y(t - 1) - (a + b * t)
      s = alpha * z + (1 - alpha) * s
    }
    (1 to horizon).map(h => (h.toLong, n.toLong, a, b, s,
        0.5 * ((a + b * (n + h)) + s)))
      .toDF("h", "n_days", "intercept", "drift", "ses_level", "forecast")
  }

  /**
   * Circular (hour-of-day) statistics per key: the Rayleigh uniformity
   * test on event timestamps mapped to angles θ = 2π·(hour +
   * minute/60)/24 — mean resultant length R̄ = |Σe^{iθ}|/n, Rayleigh
   * z = n·R̄² (large z ⇒ a preferred time of day), the mean direction
   * converted back to hours, and circular variance 1 − R̄. A plain
   * mean of hour-of-day is wrong at the midnight wrap; this is the
   * standard fix. One row per key: (key, n, mean_hour, resultant_r,
   * rayleigh_z, circ_variance).
   *
   * Scale shape: one map-side-combined groupBy accumulating the two
   * trig sums — nothing else.
   */
  def circularHourStats(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val theta = (hour(col(tsCol)).cast("double") +
      minute(col(tsCol)).cast("double") / 60.0) *
      lit(2.0 * math.Pi / 24.0)
    df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(cos(theta)).as("__c"), sum(sin(theta)).as("__s"))
      .withColumn("resultant_r",
        sqrt(col("__c") * col("__c") + col("__s") * col("__s")) /
          col("__n"))
      .select(col(keyCol), col("__n").cast("long").as("n"),
        ((atan2(col("__s"), col("__c")) * lit(24.0 / (2.0 * math.Pi)) +
          24.0) % 24.0).as("mean_hour"),
        col("resultant_r"),
        (col("__n") * col("resultant_r") * col("resultant_r"))
          .as("rayleigh_z"),
        (lit(1.0) - col("resultant_r")).as("circ_variance"))
  }

  /**
   * Savitzky–Golay smoothing (window 7, quadratic/cubic) of each key's
   * daily event-count series + residual outlier flags: the classic
   * least-squares-preserving convolution with EXACT integer weights
   * (−2, 3, 6, 7, 6, 3, −2)/21 — identical arithmetic in any engine,
   * no fitted coefficients. Days whose |raw − smooth| exceeds
   * `k`·(the key's residual sd) flag as outliers; edge days
   * (incomplete window) emit NULL smooth and never flag. Returns one
   * row per (key, day): (key, day, y, smooth, resid, is_outlier).
   *
   * Scale shape: one corpus pass to the calendar-bounded per-key day
   * frame, key-partitioned centered ROWS windows, one per-key sd
   * reduce joined back broadcast.
   */
  def savitzkyGolay(df: DataFrame, keyCol: String, tsCol: String,
      k: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "savitzkyGolay: k > 0")
    val daily = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
    val w = Window.partitionBy("__g").orderBy("day").rowsBetween(-3, 3)
    val wSeq = Window.partitionBy("__g").orderBy("day")
    val weights = Seq(-2.0, 3.0, 6.0, 7.0, 6.0, 3.0, -2.0)
    val lagged = weights.zipWithIndex.foldLeft(daily) { case (acc, (c, i)) =>
      val off = i - 3
      val v = if (off < 0) lag(col("y"), -off).over(wSeq)
        else if (off > 0) lead(col("y"), off).over(wSeq)
        else col("y")
      acc.withColumn(s"__w$i", v * lit(c))
    }
    val smoothed = lagged
      .withColumn("__cnt", count(col("y")).over(w))
      .withColumn("smooth",
        when(col("__cnt") === 7,
          (0 until 7).map(i => col(s"__w$i")).reduce(_ + _) / 21.0))
      .withColumn("resid", col("y") - col("smooth"))
      .drop((0 until 7).map(i => s"__w$i"): _*)
      .localCheckpoint() // read again for the per-key sd join
    val sd = smoothed.groupBy("__g")
      .agg(stddev_samp(col("resid")).as("__sd"))
    smoothed.join(broadcast(sd), Seq("__g"))
      .select(col("__g").as(keyCol), col("day"), col("y"), col("smooth"),
        col("resid"),
        when(col("resid").isNotNull && col("__sd") > 0,
          abs(col("resid")) > lit(k) * col("__sd")).as("is_outlier"))
  }

  /**
   * Generalized ESD outlier sweep (Rosner 1983) over the daily
   * event-count series: `rounds` sequential passes, each computing the
   * remaining sample's mean/sd, reporting R = max|x−x̄|/s, and removing
   * that extreme (ties broken by earliest day) before the next pass —
   * the masking-proof multi-outlier test a single Grubbs pass fails
   * on. Returns one row per round: (round, n_used, mean, sd, r_stat,
   * removed_value, removed_day).
   *
   * Scale shape: driver rounds over the BOUNDED daily count frame
   * (the [[holtLinear]] ≤4000-day discipline); integer counts keep
   * mean/sd bit-comparable across engines.
   */
  def esdOutliers(df: DataFrame, tsCol: String,
      rounds: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rounds >= 1 && rounds <= 10, "esdOutliers: rounds 1..10")
    val days = dailyCounts(df, tsCol).orderBy("__t").limit(4001).collect()
    require(days.length <= 4000,
      "esdOutliers: series spans > 4000 days; pre-aggregate")
    require(days.length >= rounds + 3,
      s"esdOutliers: need >= ${rounds + 3} days")
    var remaining = days.map(r => (r.getInt(0), r.getDouble(1))).toVector
    val out = (1 to rounds).map { round =>
      val n = remaining.length
      val m = remaining.map(_._2).sum / n
      val sd = math.sqrt(
        remaining.map { case (_, v) => (v - m) * (v - m) }.sum / (n - 1))
      val victim = remaining.maxBy { case (t, v) =>
        (math.abs(v - m), -t.toDouble) // max deviation, earliest day
      }
      remaining = remaining.filterNot(_ == victim)
      (round.toLong, n.toLong, m, sd,
        math.abs(victim._2 - m) / sd, victim._2,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          victim._1.toLong)))
    }
    out.toDF("round", "n_used", "mean", "sd", "r_stat", "removed_value",
      "removed_day")
  }

  /**
   * Permutation entropy (order 3) of each key's daily-total series:
   * the Shannon entropy of the ordinal-pattern distribution over
   * (v_t, v_{t+1}, v_{t+2}) windows, normalized by ln 6 so 1.0 is
   * white noise and 0.0 a monotone ramp — the standard
   * complexity-of-dynamics screen (Bandt & Pompe 2002). Ties rank by
   * time index (earlier day first), expressed as `<=` comparisons —
   * bit-identical in any engine. Daily sums are rounded to 6 decimals
   * BEFORE comparison so float summation order can't flip a pattern.
   * One row per key: (key, n_windows, n_patterns, perm_entropy).
   *
   * Scale shape: one map-side-combined corpus groupBy (key, day), two
   * leads over calendar-bounded per-key frames, one ≤6-cell-per-key
   * pattern count.
   */
  def permutationEntropy(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull &&
        col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"), to_date(col(tsCol)).as("__d"))
      .agg(round(sum(col(valueCol)), 6).as("__a"))
    val w = Window.partitionBy("__g").orderBy("__d")
    val ab = col("__a") <= col("__b")
    val bc = col("__b") <= col("__c")
    val ac = col("__a") <= col("__c")
    val pats = daily
      .withColumn("__b", lead(col("__a"), 1).over(w))
      .withColumn("__c", lead(col("__a"), 2).over(w))
      .where(col("__b").isNotNull && col("__c").isNotNull)
      .withColumn("__pat",
        when(ab && bc, 0)
          .when(ab && !bc && ac, 1)
          .when(!ab && bc && ac, 2)
          .when(ab && !bc && !ac, 3)
          .when(!ab && bc && !ac, 4)
          .otherwise(5))
    val cnt = pats.groupBy("__g", "__pat")
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = cnt.groupBy("__g").agg(sum(col("__n")).as("__tn"))
    cnt.join(tot, Seq("__g"))
      .groupBy(col("__g").as(keyCol))
      .agg(max(col("__tn")).cast("long").as("n_windows"),
        count(lit(1)).as("n_patterns"),
        (-sum((col("__n") / col("__tn")) *
          log(col("__n") / col("__tn")))
          / math.log(6.0)).as("perm_entropy"))
  }

  /**
   * Sample entropy SampEn(m=2, r) of the daily event-count series —
   * the regularity/complexity readout permutation entropy can't give
   * (it sees only ORDINAL patterns; SampEn sees amplitudes): the
   * negative log of the conditional probability that two windows
   * matching for 2 days (Chebyshev distance ≤ r = rFactor·σ) still
   * match on the 3rd. Templates span consecutive CALENDAR days (a gap
   * day breaks the window).
   *
   * Scale shape: the corpus collapses to the calendar-sized daily
   * frame in one grouped pass; template pairs come from a BANDED
   * equi-join on ⌊y/r⌋ buckets (a pair within r on the first
   * coordinate must be in the same or adjacent bucket, so the probe
   * side fans out ×3 and exact Chebyshev filtering runs inside
   * bucket-local candidates) — never an all-pairs cartesian, the
   * LSH-candidate discipline applied to a numeric series.
   * Returns (n_days, n_templates, r, b_count, a_count,
   * sample_entropy).
   */
  def sampleEntropy(df: DataFrame, tsCol: String,
      rFactor: Double = 0.2): DataFrame = {
    require(rFactor > 0, "sampleEntropy: rFactor must be positive")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    // tolerance r from the population σ of the daily counts (1 row)
    val rRow = broadcast(daily.agg(
      (sqrt(avg(col("__y") * col("__y")) - avg(col("__y")) * avg(col("__y")))
        * lit(rFactor)).as("__r"),
      count(lit(1)).as("n_days")))
    val t1 = daily.select((col("__t") - 1).as("__t"), col("__y").as("__y1"))
    val t2 = daily.select((col("__t") - 2).as("__t"), col("__y").as("__y2"))
    // (t, y0, y1, y2): y0/y1 form the m=2 template, y2 the extension;
    // the standard convention counts BOTH over i ≤ N−m, so templates
    // without an extension day are excluded from both counts
    val tpl = daily.join(t1, Seq("__t")).join(t2, Seq("__t"))
      .crossJoin(rRow)
      .where(col("__r") > 0)
      .select(col("__t"), col("__y").as("__y0"), col("__y1"), col("__y2"),
        col("__r"), col("n_days"),
        floor(col("__y") / col("__r")).as("__bkt"))
      .localCheckpoint()
    val probe = tpl.select(col("__t").as("__tb"), col("__y0").as("__b0"),
        col("__y1").as("__b1"), col("__y2").as("__b2"),
        explode(array(col("__bkt") - 1, col("__bkt"), col("__bkt") + 1))
          .as("__bkt"))
    val pairs = tpl.join(probe, Seq("__bkt"))
      .where(col("__t") < col("__tb") &&
        greatest(abs(col("__y0") - col("__b0")),
          abs(col("__y1") - col("__b1"))) <= col("__r"))
    pairs.agg(
        max(col("n_days")).as("n_days"),
        max(col("__r")).as("r"),
        count(lit(1)).as("b_count"),
        sum(when(greatest(abs(col("__y0") - col("__b0")),
            abs(col("__y1") - col("__b1")),
            abs(col("__y2") - col("__b2"))) <= col("__r"), 1L)
          .otherwise(0L)).as("a_count"))
      .crossJoin(broadcast(tpl.agg(count(lit(1)).as("n_templates"))))
      .select(col("n_days"), col("n_templates"), col("r"),
        col("b_count"), col("a_count"),
        when(col("a_count") > 0 && col("b_count") > 0,
          -log(col("a_count").cast("double") / col("b_count")))
          .as("sample_entropy"))
  }

  /**
   * Local-level Kalman filter over the daily event-count series —
   * the probabilistic sibling of [[holtLinear]] (no trend state, but
   * an evolving variance and an exact one-step-ahead likelihood):
   * predict P⁻ = P + q, gain K = P⁻/(P⁻ + r), update
   * ℓ += K(y − ℓ), P = (1−K)P⁻; the innovation variance S = P⁻ + r
   * feeds the Gaussian negative log-likelihood that model selection
   * (choosing q/r) reads. Driver recursion over the BOUNDED daily
   * frame — the [[holtLinear]] loud-cap discipline; the oracle
   * replays the identical recursion as a recursive CTE.
   * Returns 1 row: (n_days, level, p_var, k_gain, sse, rmse,
   * neg_loglik).
   */
  def kalmanLevel(df: DataFrame, tsCol: String, q: Double,
      r: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(q > 0 && r > 0, "kalmanLevel: q and r must be positive")
    val days = dailyCounts(df, tsCol).orderBy("__t").limit(4001).collect()
    require(days.length <= 4000,
      "kalmanLevel: series spans > 4000 days; driver recursion is " +
        "bounded at 4000 — pre-aggregate to a coarser calendar")
    require(days.length >= 2, "kalmanLevel: need >= 2 days")
    val y = days.map(_.getDouble(1))
    var level = y(0)
    var p = r
    var kLast = 0.0
    var sse = 0.0
    var nll = 0.0
    for (t <- 1 until y.length) {
      val pp = p + q
      val k = pp / (pp + r)
      val s = pp + r
      val e = y(t) - level
      sse += e * e
      nll += 0.5 * (math.log(2 * math.Pi * s) + e * e / s)
      level = level + k * e
      p = (1 - k) * pp
      kLast = k
    }
    Seq((y.length.toLong, level, p, kLast, sse,
        math.sqrt(sse / (y.length - 1)), nll))
      .toDF("n_days", "level", "p_var", "k_gain", "sse", "rmse",
        "neg_loglik")
  }

  /**
   * Phillips–Perron unit-root test on the daily mean series: the same
   * y_t = α + ρ·y_{t−1} regression as [[dickeyFuller]], but the test
   * statistics are corrected NON-parametrically for serial
   * correlation in u_t with a Bartlett-kernel long-run variance
   * λ² = γ₀ + 2Σ_{j≤L}(1 − j/(L+1))γ_j over the OLS residuals —
   * no lagged-difference terms enter the regression (Hamilton 1994,
   * §17.6 forms, with Sxx the centered lag sum of squares):
   * Z_ρ = n(ρ̂−1) − (λ²−γ₀)·n²/(2·Sxx),
   * Z_τ = √(γ₀/λ²)·t_ρ − (λ²−γ₀)·n/(2·λ·√Sxx).
   * Residual autocovariances come from `lags` calendar-shift
   * self-joins of the calendar-sized residual frame — no windows,
   * no cartesians. Returns (n_days, n_pairs, rho, t_rho, gamma0,
   * lambda2, z_rho, z_tau).
   */
  def phillipsPerron(df: DataFrame, tsCol: String, valueCol: String,
      lags: Int = 4): DataFrame = {
    require(lags >= 1 && lags <= 30, "phillipsPerron: lags in 1..30")
    val daily = dailySeries(df, tsCol, valueCol).localCheckpoint()
    val lagged = daily.select((col("__t") + 1).as("__t"),
      col("__x").as("__xl"))
    val pairs = daily.join(lagged, Seq("__t"))
      .select(col("__t"), col("__x"), col("__xl")).localCheckpoint()
    val st = broadcast(pairs.agg(
        count(lit(1)).cast("double").as("__np"),
        sum(col("__xl")).as("__sl"), sum(col("__x")).as("__sy"),
        sum(col("__xl") * col("__xl")).as("__sll"),
        sum(col("__xl") * col("__x")).as("__sly"))
      .withColumn("__sxx", col("__sll") - col("__sl") * col("__sl") / col("__np"))
      .withColumn("__sxy", col("__sly") - col("__sl") * col("__sy") / col("__np"))
      .withColumn("rho", col("__sxy") / col("__sxx"))
      .withColumn("alpha",
        (col("__sy") - col("rho") * col("__sl")) / col("__np")))
    val resid = pairs.crossJoin(st)
      .select(col("__t"),
        (col("__x") - col("alpha") - col("rho") * col("__xl")).as("__u"))
      .localCheckpoint()
    // γ_j via calendar-shift self-joins (j = 0 is a plain aggregate)
    val gammas = (1 to lags).map { j =>
      val sh = resid.select((col("__t") + j).as("__t"), col("__u").as("__uj"))
      resid.join(sh, Seq("__t"))
        .agg(sum(col("__u") * col("__uj")).as(s"__g$j"))
    }
    val g0 = resid.agg(sum(col("__u") * col("__u")).as("__g0"),
      count(lit(1)).cast("double").as("__nu"))
    val folded = gammas.foldLeft(g0.crossJoin(st))((acc, g) =>
      acc.crossJoin(broadcast(g)))
    val nDays = broadcast(daily.agg(count(lit(1)).as("n_days")))
    val lamExpr = (1 to lags).map(j =>
      lit(2.0 * (1.0 - j.toDouble / (lags + 1))) * col(s"__g$j") / col("__np"))
      .foldLeft(col("__g0") / col("__np"))(_ + _)
    folded.crossJoin(nDays)
      .withColumn("gamma0", col("__g0") / col("__np"))
      .withColumn("lambda2", lamExpr)
      .withColumn("__s2",
        (col("__g0") - lit(0.0)) / (col("__np") - 2)) // SSE = Σu² (OLS resid)
      .withColumn("__se_rho", sqrt(col("__s2") / col("__sxx")))
      .withColumn("t_rho", (col("rho") - 1) / col("__se_rho"))
      .select(col("n_days"), col("__np").cast("long").as("n_pairs"),
        col("rho"), col("t_rho"), col("gamma0"), col("lambda2"),
        (col("__np") * (col("rho") - 1) -
          (col("lambda2") - col("gamma0")) * col("__np") * col("__np") /
            (lit(2.0) * col("__sxx"))).as("z_rho"),
        (sqrt(col("gamma0") / col("lambda2")) * col("t_rho") -
          (col("lambda2") - col("gamma0")) * col("__np") /
            (lit(2.0) * sqrt(col("lambda2")) * sqrt(col("__sxx"))))
          .as("z_tau"))
  }

  /**
   * AR(2) fit by Yule–Walker on the daily event-count series, with the
   * in-sample one-step backtest (RMSE/MAE/MASE vs the naive lag-1
   * walk) and the h = 1..3 closed-form forecast fan — the "is this AR
   * structure worth anything" readout the bare Yule–Walker
   * coefficients don't give. Autocovariances come from calendar-shift
   * self-joins (biased /n estimators, the YW convention); forecasts
   * unroll the recursion ŷ_{n+h} = μ + φ₁(ŷ_{n+h−1}−μ) + φ₂(ŷ_{n+h−2}−μ)
   * from the last two observed days. One bounded 1-row stats collect;
   * everything else stays frame-side. Returns rows h = 1..3:
   * (h, n_days, phi1, phi2, mean_daily, forecast, rmse, mae, mase).
   */
  def arForecast(df: DataFrame, tsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val mu = broadcast(daily.agg(avg(col("__y")).as("__mu"),
      count(lit(1)).cast("double").as("__n")))
    val dm = daily.crossJoin(mu)
      .select(col("__t"), (col("__y") - col("__mu")).as("__z"),
        col("__y"))
      .localCheckpoint()
    def shifted(j: Int) = dm.select((col("__t") + j).as("__t"),
      col("__z").as(s"__z$j"), col("__y").as(s"__y$j"))
    val c0 = broadcast(dm.agg(sum(col("__z") * col("__z")).as("__s0")))
    val c1 = broadcast(dm.join(shifted(1), Seq("__t"))
      .agg(sum(col("__z") * col("__z1")).as("__s1")))
    val c2 = broadcast(dm.join(shifted(2), Seq("__t"))
      .agg(sum(col("__z") * col("__z2")).as("__s2")))
    val phis = mu.crossJoin(c0).crossJoin(c1).crossJoin(c2)
      .select(col("__mu"), col("__n"),
        (col("__s0") / col("__n")).as("__c0"),
        (col("__s1") / col("__n")).as("__c1"),
        (col("__s2") / col("__n")).as("__c2"))
      .select(col("__mu"), col("__n"), col("__c0"),
        ((col("__c1") * (col("__c0") - col("__c2"))) /
          (col("__c0") * col("__c0") - col("__c1") * col("__c1")))
          .as("phi1"),
        ((col("__c0") * col("__c2") - col("__c1") * col("__c1")) /
          (col("__c0") * col("__c0") - col("__c1") * col("__c1")))
          .as("phi2"))
    val phiB = broadcast(phis)
    // one-step in-sample backtest over consecutive-day triples
    val triples = dm.join(shifted(1), Seq("__t")).join(shifted(2), Seq("__t"))
    val bt = triples.crossJoin(phiB)
      .select(col("__y"),
        (col("__mu") + col("phi1") * col("__z1") +
          col("phi2") * col("__z2")).as("__pred"),
        col("__y1"))
      .agg(
        sqrt(avg((col("__y") - col("__pred")) * (col("__y") - col("__pred"))))
          .as("rmse"),
        avg(abs(col("__y") - col("__pred"))).as("mae"),
        avg(abs(col("__y") - col("__y1"))).as("__mae_naive"))
    // bounded tail collect: the last two observed days seed the fan
    val tail = daily.orderBy(col("__t").desc).limit(2).collect()
    require(tail.length == 2, "arForecast: need >= 2 days")
    val (yN, yN1) = (tail(0).getDouble(1), tail(1).getDouble(1))
    val stats = phiB.crossJoin(broadcast(bt)).head()
    val muV = stats.getAs[Double]("__mu")
    val p1 = stats.getAs[Double]("phi1")
    val p2 = stats.getAs[Double]("phi2")
    val f1 = muV + p1 * (yN - muV) + p2 * (yN1 - muV)
    val f2 = muV + p1 * (f1 - muV) + p2 * (yN - muV)
    val f3 = muV + p1 * (f2 - muV) + p2 * (f1 - muV)
    val mase = stats.getAs[Double]("mae") / stats.getAs[Double]("__mae_naive")
    Seq((1L, f1), (2L, f2), (3L, f3))
      .toDF("h", "forecast")
      .withColumn("n_days", lit(stats.getAs[Double]("__n")).cast("long"))
      .withColumn("phi1", lit(p1)).withColumn("phi2", lit(p2))
      .withColumn("mean_daily", lit(muV))
      .withColumn("rmse", lit(stats.getAs[Double]("rmse")))
      .withColumn("mae", lit(stats.getAs[Double]("mae")))
      .withColumn("mase", lit(mase))
      .select("h", "n_days", "phi1", "phi2", "mean_daily", "forecast",
        "rmse", "mae", "mase")
  }

  /**
   * Engle–Granger error-correction model between two daily series of
   * the same corpus (x = Σ`xCol`, y = Σ`yCol` per day): step 1 fits
   * the long-run levels regression y = a + b·x and takes its residual
   * e (the cointegrating error); step 2 regresses Δy_t on
   * [1, e_{t−1}, Δx_t] — γ on the lagged error is the ADJUSTMENT
   * SPEED (how fast y snaps back to the long-run line; a
   * significantly negative γ is the error-correction evidence that
   * the [[dickeyFuller]]-style cointegration residual test alone
   * doesn't quantify). Both steps are closed-form OLS over
   * calendar-sized aggregate frames (the 2-regressor step via 3×3
   * normal-equation determinants). Daily MEANS (not sums) keep the
   * normal-equation products at unit scale so the difference-of-
   * products shapes stay far from fp cancellation. Returns 1 row:
   * (n_days, n_ecm, alpha_lr, beta_lr, gamma_adj, t_gamma,
   * delta_x_coef, r2_ecm).
   */
  def engleGrangerEcm(df: DataFrame, tsCol: String, xCol: String,
      yCol: String): DataFrame = {
    val daily = df.where(col(tsCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(avg(col(xCol).cast("double")).as("__x"),
        avg(col(yCol).cast("double")).as("__y"))
      .select(datediff(col("__d"), lit("1970-01-01")).as("__t"),
        col("__x"), col("__y"))
      .localCheckpoint()
    val lr = broadcast(daily.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .withColumn("beta_lr",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .withColumn("alpha_lr",
        (col("__sy") - col("beta_lr") * col("__sx")) / col("__n")))
    val withE = daily.crossJoin(lr)
      .select(col("__t"), col("__x"), col("__y"),
        (col("__y") - col("alpha_lr") - col("beta_lr") * col("__x"))
          .as("__e"))
    val prev = withE.select((col("__t") + 1).as("__t"),
      col("__x").as("__xp"), col("__y").as("__yp"), col("__e").as("__ep"))
    val ecmRows = withE.join(prev, Seq("__t"))
      .select((col("__y") - col("__yp")).as("__dy"),
        col("__ep"), (col("__x") - col("__xp")).as("__dx"))
    // 3×3 normal equations for Δy ~ 1 + e_{t-1} + Δx
    val m = ecmRows.agg(count(lit(1)).cast("double").as("n"),
      sum(col("__ep")).as("s1"), sum(col("__dx")).as("s2"),
      sum(col("__ep") * col("__ep")).as("s11"),
      sum(col("__ep") * col("__dx")).as("s12"),
      sum(col("__dx") * col("__dx")).as("s22"),
      sum(col("__dy")).as("sy"),
      sum(col("__ep") * col("__dy")).as("s1y"),
      sum(col("__dx") * col("__dy")).as("s2y"),
      sum(col("__dy") * col("__dy")).as("syy"))
    val withDet = m
      .withColumn("det",
        col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
          col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s12") - col("s11") * col("s2")))
      .withColumn("c0",
        (col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
          col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
          col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))) /
          col("det"))
      .withColumn("gamma_adj",
        (col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
          col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))) /
          col("det"))
      .withColumn("delta_x_coef",
        (col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
          col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
          col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))) /
          col("det"))
      .withColumn("rss",
        col("syy") - lit(2.0) * (col("c0") * col("sy") +
          col("gamma_adj") * col("s1y") + col("delta_x_coef") * col("s2y")) +
          (col("c0") * col("c0") * col("n") +
            col("gamma_adj") * col("gamma_adj") * col("s11") +
            col("delta_x_coef") * col("delta_x_coef") * col("s22") +
            lit(2.0) * col("c0") * col("gamma_adj") * col("s1") +
            lit(2.0) * col("c0") * col("delta_x_coef") * col("s2") +
            lit(2.0) * col("gamma_adj") * col("delta_x_coef") * col("s12")))
      .withColumn("tss", col("syy") - col("sy") * col("sy") / col("n"))
      // var(γ) = s²·[(X'X)⁻¹]₁₁ with the e-coefficient cofactor
      .withColumn("__inv11",
        (col("n") * col("s22") - col("s2") * col("s2")) / col("det"))
      .withColumn("t_gamma", when(col("n") > 3 && col("__inv11") > 0,
        col("gamma_adj") /
          sqrt(col("rss") / (col("n") - 3) * col("__inv11"))))
    val nDays = broadcast(daily.agg(count(lit(1)).as("n_days")))
    withDet.crossJoin(nDays)
      .crossJoin(lr.select(col("alpha_lr"), col("beta_lr")))
      .select(col("n_days"), col("n").cast("long").as("n_ecm"),
        col("alpha_lr"), col("beta_lr"), col("gamma_adj"), col("t_gamma"),
        col("delta_x_coef"),
        when(col("tss") > 0, lit(1.0) - col("rss") / col("tss"))
          .as("r2_ecm"))
  }

  /**
   * Extremal index by runs declustering: exceedances of the daily
   * count series over its exact-disc `thresholdQ` quantile are grouped
   * into clusters separated by ≥ `runGap` non-exceedance days;
   * θ̂ = clusters/exceedances is the reciprocal mean cluster size —
   * θ < 1 means extremes ARRIVE IN BURSTS, so [[gpdPotFit]]-style
   * return levels computed from raw exceedance counts overstate
   * effective independence. A cluster STARTS at an exceedance with no
   * exceedance in the previous `runGap` calendar days — pure
   * calendar-shift joins, no sequence materialization.
   * Returns 1 row: (n_days, threshold, n_exceed, n_clusters,
   * extremal_index, mean_cluster_size).
   */
  def extremalIndex(df: DataFrame, tsCol: String,
      thresholdQ: Double = 0.95, runGap: Int = 2): DataFrame = {
    require(thresholdQ > 0.5 && thresholdQ < 1,
      "extremalIndex: thresholdQ in (0.5, 1)")
    require(runGap >= 1 && runGap <= 30, "extremalIndex: runGap 1..30")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val thr = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(daily, "__y", Seq("__thr" -> thresholdQ),
        Nil))
    val exc = daily.crossJoin(thr)
      .where(col("__y") > col("__thr"))
      .select(col("__t")).localCheckpoint()
    val shifted = (1 to runGap).map(j =>
      exc.select((col("__t") + j).as("__t"), lit(1).as(s"__p$j")))
    val starts = shifted.foldLeft(
        exc.select(col("__t")))((acc, s) => acc.join(s, Seq("__t"), "left"))
      .where((1 to runGap).map(j => col(s"__p$j").isNull).reduce(_ && _))
    val nd = broadcast(daily.agg(count(lit(1)).as("n_days")))
    val counts = exc.agg(count(lit(1)).as("n_exceed"))
      .crossJoin(broadcast(starts.agg(count(lit(1)).as("n_clusters"))))
    counts.crossJoin(nd).crossJoin(thr)
      .select(col("n_days"), col("__thr").as("threshold"),
        col("n_exceed"), col("n_clusters"),
        when(col("n_exceed") > 0,
          col("n_clusters").cast("double") / col("n_exceed"))
          .as("extremal_index"),
        when(col("n_clusters") > 0,
          col("n_exceed").cast("double") / col("n_clusters"))
          .as("mean_cluster_size"))
  }

  /**
   * Mean-residual-life curve: e(u) = E[X − u | X > u] at a ladder of
   * exact-disc quantile thresholds — the classic threshold-selection
   * diagnostic for [[gpdPotFit]] (for a GPD tail the curve is LINEAR
   * in u above a valid threshold; curvature below marks where the
   * asymptotics start). One row per threshold: (q, threshold,
   * n_exceed, mean_excess).
   *
   * Scale shape: one exact-percentile row broadcast, one conditional
   * aggregate per threshold folded into a single grouped pass over a
   * |thresholds|-fold fan-out.
   */
  def meanResidualLife(df: DataFrame, valueCol: String,
      qs: Seq[Double] = Seq(0.5, 0.75, 0.9, 0.95, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      "meanResidualLife: quantiles in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__x")).localCheckpoint()
    val named = qs.zipWithIndex.map { case (q, i) => (s"__t$i", q) }
    val thr = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(base, "__x", named, Nil))
    val lev = broadcast(named.map { case (n, q) => (n, q) }
      .toDF("__tn", "q"))
    val long = thr.selectExpr(
      s"stack(${named.size}, " +
        named.map { case (n, _) => s"'$n', $n" }.mkString(", ") +
        ") as (__tn, threshold)")
    base.crossJoin(broadcast(long.join(lev, Seq("__tn"))))
      .where(col("__x") > col("threshold"))
      .groupBy("q", "threshold")
      .agg(count(lit(1)).as("n_exceed"),
        avg(col("__x") - col("threshold")).as("mean_excess"))
  }

  /**
   * MA(1) method-of-moments fit to the DIFFERENCED daily mean series —
   * the moving-average mirror of [[graft.ops.Regression.yuleWalkerAr2]]'s AR side: for an
   * invertible MA(1), ρ₁ = θ/(1+θ²), so θ = (1 − √(1−4ρ₁²))/(2ρ₁)
   * (the |θ| < 1 root) and σ²_ε = γ₀/(1+θ²). |ρ₁| ≥ 0.5 means no
   * real invertible MA(1) exists — reported, not hidden. Differencing
   * first is the standard guard against level nonstationarity.
   * Returns 1 row: (n_diffs, rho1, invertible, theta, sigma2_innov).
   */
  def ma1Fit(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = dailySeries(df, tsCol, valueCol).localCheckpoint()
    val diffs = daily
      .join(daily.select((col("__t") + 1).as("__t"),
        col("__x").as("__xp")), Seq("__t"))
      .select(col("__t"), (col("__x") - col("__xp")).as("__d"))
      .localCheckpoint()
    val mu = broadcast(diffs.agg(avg(col("__d")).as("__mu"),
      count(lit(1)).cast("double").as("__n")))
    val dm = diffs.crossJoin(mu)
      .select(col("__t"), (col("__d") - col("__mu")).as("__z"))
      .localCheckpoint()
    val g0 = dm.agg(sum(col("__z") * col("__z")).as("__s0"))
    val g1 = broadcast(dm
      .join(dm.select((col("__t") + 1).as("__t"), col("__z").as("__zp")),
        Seq("__t"))
      .agg(coalesce(sum(col("__z") * col("__zp")), lit(0.0)).as("__s1")))
    val rho1 = col("__s1") / col("__s0")
    val inv = abs(rho1) < 0.5
    val theta = when(inv && rho1 =!= 0,
      (lit(1.0) - sqrt(lit(1.0) - lit(4.0) * rho1 * rho1)) /
        (lit(2.0) * rho1))
      .when(rho1 === 0, lit(0.0))
    g0.crossJoin(g1).crossJoin(mu)
      .select(col("__n").cast("long").as("n_diffs"),
        when(col("__s0") > 0, rho1).as("rho1"), inv.as("invertible"),
        theta.as("theta"),
        when(col("__s0") > 0,
          (col("__s0") / col("__n")) / (lit(1.0) + theta * theta))
          .as("sigma2_innov"))
  }

  /**
   * Haar wavelet energy decomposition of the daily event-count series:
   * at each dyadic level j (block of 2ʲ consecutive rank positions)
   * the detail coefficient is (mean of first half − mean of second
   * half)/2 per complete block; the per-level energy Σd² localizes
   * WHERE in timescale the variance lives — the wavelet companion to
   * [[periodogram]] (frequency) and [[dfa]] (scaling). Returns one row
   * per level with the shared total: (level, block_size, n_blocks,
   * energy, energy_share).
   *
   * Scale shape: ranks ride [[graft.analysis.PrefixSum]]; per-(level,
   * block) halves are conditional sums in ONE grouped pass over a
   * |levels|-fold fan-out; shares from a broadcast 1-row total.
   */
  def haarEnergy(df: DataFrame, tsCol: String,
      levels: Int = 4): DataFrame = {
    require(levels >= 1 && levels <= 16, "haarEnergy: levels in 1..16")
    val spark = df.sparkSession
    import spark.implicits._
    val daily = dailyCounts(df, tsCol)
    val pre = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__k0"))
      .select((col("__k0") + 1).as("__k"), col("__y"))
      .localCheckpoint()
    val lv = broadcast((1 to levels).map(j => (j, 1L << j)).toDF("level", "block_size"))
    val blocks = pre.crossJoin(lv)
      .groupBy(col("level"), col("block_size"),
        floor((col("__k") - 1) / col("block_size")).as("__b"))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(pmod(col("__k") - 1, col("block_size")) <
          col("block_size") / 2, col("__y")).otherwise(lit(0.0)))
          .as("__s1"),
        sum(when(pmod(col("__k") - 1, col("block_size")) >=
          col("block_size") / 2, col("__y")).otherwise(lit(0.0)))
          .as("__s2"))
      .where(col("__cnt") === col("block_size"))
    val perLevel = blocks
      .select(col("level"), col("block_size"),
        (((col("__s1") - col("__s2")) / col("block_size")) *
          ((col("__s1") - col("__s2")) / col("block_size"))).as("__d2"))
      .groupBy("level", "block_size")
      .agg(count(lit(1)).as("n_blocks"), sum(col("__d2")).as("energy"))
      .localCheckpoint()
    val tot = broadcast(perLevel.agg(sum(col("energy")).as("__te")))
    perLevel.crossJoin(tot)
      .select(col("level"), col("block_size"), col("n_blocks"),
        col("energy"),
        when(col("__te") > 0, col("energy") / col("__te"))
          .as("energy_share"))
  }

  /**
   * Diebold–Mariano equal-predictive-accuracy test between the two
   * zero-parameter daily forecasters every monitor compares first —
   * naive (yesterday) vs seasonal-naive (same weekday last week) —
   * on squared error, with a Bartlett-HAC (L = 2) variance for the
   * loss-differential series (the d_t are autocorrelated by
   * construction; the plain t-test is anti-conservative). DM < 0
   * favors the naive, > 0 the seasonal. Returns 1 row: (n_common,
   * mse_naive, mse_snaive, mean_loss_diff, dm_stat).
   *
   * Scale shape: calendar-shift joins (t−1, t−7) onto the daily frame,
   * one moment aggregate, γ_j via two more shift joins on the
   * differential — all calendar-sized, no window.
   */
  def dieboldMariano(df: DataFrame, tsCol: String,
      hacLags: Int = 2): DataFrame = {
    require(hacLags >= 0 && hacLags <= 30, "dieboldMariano: lags 0..30")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    def shifted(j: Int, nm: String) =
      daily.select((col("__t") + j).as("__t"), col("__y").as(nm))
    val diffs = daily
      .join(shifted(1, "__p1"), Seq("__t"))
      .join(shifted(7, "__p7"), Seq("__t"))
      .select(col("__t"),
        ((col("__y") - col("__p1")) * (col("__y") - col("__p1")) -
          (col("__y") - col("__p7")) * (col("__y") - col("__p7")))
          .as("__d"),
        ((col("__y") - col("__p1")) * (col("__y") - col("__p1")))
          .as("__e1"),
        ((col("__y") - col("__p7")) * (col("__y") - col("__p7")))
          .as("__e7"))
      .localCheckpoint()
    val mo = broadcast(diffs.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__e1")).as("mse_naive"), avg(col("__e7")).as("mse_snaive"),
      avg(col("__d")).as("__db")))
    val cent = diffs.crossJoin(mo)
      .select(col("__t"), (col("__d") - col("__db")).as("__u"))
      .localCheckpoint()
    val g0 = cent.agg(sum(col("__u") * col("__u")).as("__g0"))
    val gammas = (1 to hacLags).map { j =>
      val sh = cent.select((col("__t") + j).as("__t"),
        col("__u").as("__uj"))
      broadcast(cent.join(sh, Seq("__t"))
        .agg(coalesce(sum(col("__u") * col("__uj")), lit(0.0))
          .as(s"__g$j")))
    }
    val folded = gammas.foldLeft(g0.crossJoin(mo))(_ crossJoin _)
    val lrv = (1 to hacLags).map(j =>
      lit(2.0 * (1.0 - j.toDouble / (hacLags + 1))) * col(s"__g$j") /
        col("__n"))
      .foldLeft(col("__g0") / col("__n"))(_ + _)
    folded
      .select(col("__n").cast("long").as("n_common"),
        col("mse_naive"), col("mse_snaive"),
        col("__db").as("mean_loss_diff"),
        when(lrv > 0, col("__db") / sqrt(lrv / col("__n"))).as("dm_stat"))
  }

  /**
   * Pesaran–Timmermann directional-accuracy test of the momentum rule
   * "tomorrow moves the way today moved" on the daily count series:
   * compares the sign hit rate p̂ against the no-skill rate
   * p* = P_up·P̂_up + (1−P_up)(1−P̂_up) with the classic variance
   * correction — pure sign counts, the nonparametric sanity check
   * behind every direction-of-change claim. Ties (Δ = 0) count as
   * "down". Returns 1 row: (n_pairs, hit_rate, p_star, pt_stat).
   */
  def pesaranTimmermann(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    def shifted(j: Int, nm: String) =
      daily.select((col("__t") + j).as("__t"), col("__y").as(nm))
    // actual = sign(y_t − y_{t−1}); predicted = sign(y_{t−1} − y_{t−2})
    val sg = daily
      .join(shifted(1, "__p1"), Seq("__t"))
      .join(shifted(2, "__p2"), Seq("__t"))
      .select((col("__y") > col("__p1")).as("__a"),
        (col("__p1") > col("__p2")).as("__f"))
    val a = sg.agg(count(lit(1)).cast("double").as("__n"),
      avg(when(col("__a") === col("__f"), 1.0).otherwise(0.0)).as("__ph"),
      avg(when(col("__a"), 1.0).otherwise(0.0)).as("__py"),
      avg(when(col("__f"), 1.0).otherwise(0.0)).as("__px"))
    val ps = col("__py") * col("__px") +
      (lit(1.0) - col("__py")) * (lit(1.0) - col("__px"))
    val vh = ps * (lit(1.0) - ps) / col("__n")
    val vs = (lit(2.0) * col("__py") - 1) * (lit(2.0) * col("__py") - 1) *
      col("__px") * (lit(1.0) - col("__px")) / col("__n") +
      (lit(2.0) * col("__px") - 1) * (lit(2.0) * col("__px") - 1) *
        col("__py") * (lit(1.0) - col("__py")) / col("__n") +
      lit(4.0) * col("__py") * col("__px") * (lit(1.0) - col("__py")) *
        (lit(1.0) - col("__px")) / (col("__n") * col("__n"))
    a.select(col("__n").cast("long").as("n_pairs"),
      col("__ph").as("hit_rate"), ps.as("p_star"),
      when(vh - vs > 0, (col("__ph") - ps) / sqrt(vh - vs)).as("pt_stat"))
  }

  /**
   * Depth-2 binary segmentation of the daily count series — the
   * multi-changepoint extension of [[amocChangepoint]]: find the
   * SSE-minimizing root split, then the best split INSIDE each
   * resulting segment, all against the same prefix-moment frame with
   * segment-relative sums (prefix(hi) − prefix(lo)). Up to 3 rows
   * (`segment` ∈ root/left/right; a side shorter than 2 days emits no
   * row), each with the segment's SSE before/after its split and the
   * reduction share — the "did a second change happen" read after a
   * drift alarm.
   *
   * Scale shape: ONE [[graft.analysis.PrefixSum]] pass; each argmin is
   * a distributed TakeOrdered over ≤ |days| candidates; the root row
   * rides a broadcast 1-row frame into the side scans. No window, no
   * driver loop.
   */
  def binarySegmentation(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol)
    val pre = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__y2", col("__y") * col("__y"))
          .withColumn("__one", lit(1.0)),
        "__t", Seq("__y" -> "__exs", "__y2" -> "__exs2",
          "__one" -> "__exi"))
      .withColumn("__s", col("__exs") + col("__y"))
      .withColumn("__s2", col("__exs2") + col("__y2"))
      .withColumn("__i", col("__exi") + 1)
      .localCheckpoint()
    val tot = broadcast(daily.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__y")).as("__tsum"),
      sum(col("__y") * col("__y")).as("__tsum2")))
    val cand = pre.crossJoin(tot)
    val rootSse = (col("__s2") - col("__s") * col("__s") / col("__i")) +
      ((col("__tsum2") - col("__s2")) -
        (col("__tsum") - col("__s")) * (col("__tsum") - col("__s")) /
          (col("__n") - col("__i")))
    val root = broadcast(cand.where(col("__i") < col("__n"))
      .withColumn("__sse", rootSse)
      .orderBy(col("__sse"), col("__t")).limit(1)
      .select(col("__t").as("__t0"), col("__i").as("__i0"),
        col("__s").as("__s0"), col("__s2").as("__s20"),
        col("__sse").as("__sse0")))
    def row(seg: String, frame: DataFrame): DataFrame =
      frame.select(lit(seg).as("segment"),
        date_add(to_date(lit("1970-01-01")), col("__t").cast("int"))
          .as("change_day"),
        col("__nseg").cast("long").as("n_seg"),
        col("__before").as("sse_before"), col("__after").as("sse_after"),
        when(col("__before") > 0,
          (col("__before") - col("__after")) / col("__before"))
          .as("reduction_share"))
    val rootRow = row("root", cand.crossJoin(root)
      .where(col("__t") === col("__t0"))
      .withColumn("__nseg", col("__n"))
      .withColumn("__before",
        col("__tsum2") - col("__tsum") * col("__tsum") / col("__n"))
      .withColumn("__after", col("__sse0")))
    val leftRow = row("left", cand.crossJoin(root)
      .where(col("__i") < col("__i0"))
      .withColumn("__after",
        (col("__s2") - col("__s") * col("__s") / col("__i")) +
          ((col("__s20") - col("__s2")) -
            (col("__s0") - col("__s")) * (col("__s0") - col("__s")) /
              (col("__i0") - col("__i"))))
      .orderBy(col("__after"), col("__t")).limit(1)
      .withColumn("__nseg", col("__i0"))
      .withColumn("__before",
        col("__s20") - col("__s0") * col("__s0") / col("__i0")))
    val rightRow = row("right", cand.crossJoin(root)
      .where(col("__i") > col("__i0") && col("__i") < col("__n"))
      .withColumn("__after",
        ((col("__s2") - col("__s20")) -
          (col("__s") - col("__s0")) * (col("__s") - col("__s0")) /
            (col("__i") - col("__i0"))) +
          ((col("__tsum2") - col("__s2")) -
            (col("__tsum") - col("__s")) * (col("__tsum") - col("__s")) /
              (col("__n") - col("__i"))))
      .orderBy(col("__after"), col("__t")).limit(1)
      .withColumn("__nseg", col("__n") - col("__i0"))
      .withColumn("__before",
        (col("__tsum2") - col("__s20")) -
          (col("__tsum") - col("__s0")) * (col("__tsum") - col("__s0")) /
            (col("__n") - col("__i0"))))
    rootRow.unionAll(leftRow).unionAll(rightRow)
  }

  /**
   * Binary transfer entropy between the daily event-count series X and
   * the daily mean-value series Y — the DIRECTIONAL, model-free
   * complement of [[grangerCausality]]: with states binarized at each
   * series' (rounded) mean, TE(X→Y) = Σ p(y′,y,x)·
   * ln[ p(y′,y,x)·p(y) / (p(y,x)·p(y′,y)) ] over consecutive calendar
   * days — how much yesterday's X state reduces uncertainty about
   * today's Y beyond Y's own history. Reported in both directions
   * (nats); TE ≥ 0, and ≈ 0 means no predictive flow.
   *
   * Scale shape: corpus → calendar-sized daily frame in one grouped
   * pass; one calendar-shift self-join builds the (x,y,x′,y′) triples;
   * every probability is a grouped count over ≤ 8 state cells.
   * Returns 1 row: (n_transitions, te_x_to_y, te_y_to_x).
   */
  def transferEntropy(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).cast("double").as("__x"),
        avg(col(valueCol).cast("double")).as("__yv"))
      .select(datediff(col("__d"), lit("1970-01-01")).as("__t"),
        col("__x"), col("__yv"))
      .localCheckpoint()
    val mu = broadcast(daily.agg(round(avg(col("__x")), 6).as("__mx"),
      round(avg(col("__yv")), 6).as("__my")))
    val st = daily.crossJoin(mu)
      .select(col("__t"), (col("__x") > col("__mx")).as("__sx"),
        (col("__yv") > col("__my")).as("__sy"))
      .localCheckpoint()
    val nxt = st.select((col("__t") - 1).as("__t"),
      col("__sx").as("__sxn"), col("__sy").as("__syn"))
    val cells = st.join(nxt, Seq("__t"))
      .groupBy("__sx", "__sy", "__sxn", "__syn")
      .agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint()
    val total = broadcast(cells.agg(sum(col("__c")).as("__nn")))
    // TE(a→b) over states (b′, b, a); all marginals come from the
    // ≤16-cell frame — tiny grouped sums
    def teFrame(aCol: String, bCol: String, bnCol: String,
        out: String): DataFrame = {
      val tri = cells.groupBy(col(aCol).as("__a"), col(bCol).as("__b"),
          col(bnCol).as("__bn"))
        .agg(sum(col("__c")).as("__n3"))
      val mB = tri.groupBy("__b").agg(sum(col("__n3")).as("__nb"))
      val mAB = tri.groupBy("__a", "__b").agg(sum(col("__n3")).as("__nab"))
      val mBBn = tri.groupBy("__b", "__bn")
        .agg(sum(col("__n3")).as("__nbbn"))
      tri.join(mB, Seq("__b")).join(mAB, Seq("__a", "__b"))
        .join(mBBn, Seq("__b", "__bn"))
        .crossJoin(total)
        .agg(coalesce(sum(
          col("__n3") / col("__nn") *
            log((col("__n3") * col("__nb")) /
              (col("__nab") * col("__nbbn")))), lit(0.0)).as(out))
    }
    teFrame("__sx", "__sy", "__syn", "te_x_to_y")
      .crossJoin(broadcast(teFrame("__sy", "__sx", "__sxn", "te_y_to_x")))
      .crossJoin(total)
      .select(col("__nn").cast("long").as("n_transitions"),
        col("te_x_to_y"), col("te_y_to_x"))
  }

  /**
   * GPH (Geweke–Porter-Hudak) log-periodogram estimate of the
   * long-memory parameter d of the daily mean series — the canonical
   * "is this series fractionally integrated" readout that complements
   * [[hurstExponent]]'s R/S slope: regress log I(λ_j) on log(4 sin²(λ_j/2))
   * over the first m = ⌊√n⌋ Fourier frequencies; d̂ = −slope, with the
   * OLS slope standard error and fit R². Days are indexed by calendar
   * offset from the first observed day (gap days contribute no term,
   * mirrored by the oracle).
   *
   * Scale shape: corpus → calendar-sized daily frame in one grouped
   * pass; the Fourier sums are ONE groupBy over a broadcast
   * daily × ⌊√n⌋-frequency product (≈ n^1.5 cheap trig rows), the OLS
   * a 1-row aggregate; the only collect is a bounded 1-row stats row.
   * Returns 1 row: (n_days, n_freqs, d_hat, se_d, r2).
   */
  def gphLongMemory(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = dailySeries(df, tsCol, valueCol).localCheckpoint()
    val st = daily.agg(count(lit(1)).cast("double").as("n"),
      avg(col("__x")).as("mu"), min(col("__t")).as("t0")).head()
    val n = st.getDouble(0)
    require(n >= 16, "gphLongMemory: need >= 16 days")
    val mu = st.getDouble(1)
    val t0 = st.getAs[Number](2).longValue
    val m = math.floor(math.sqrt(n)).toInt
    val freqs = broadcast(
      df.sparkSession.range(1, m + 1L).toDF("j"))
    val pts = daily.crossJoin(freqs)
      .select(col("j"),
        ((col("__x") - mu) *
          cos(lit(2 * math.Pi) * col("j") * (col("__t") - t0) / n))
          .as("__c"),
        ((col("__x") - mu) *
          sin(lit(2 * math.Pi) * col("j") * (col("__t") - t0) / n))
          .as("__s"))
      .groupBy("j")
      .agg(sum(col("__c")).as("__a"), sum(col("__s")).as("__b"))
      .select(
        log((col("__a") * col("__a") + col("__b") * col("__b")) /
          lit(2 * math.Pi * n)).as("__ly"),
        log(lit(4.0) * pow(sin(lit(math.Pi) * col("j") / n), 2))
          .as("__lx"))
      .where(col("__ly").isNotNull)
    val ols = pts.agg(count(lit(1)).cast("double").as("__k"),
      sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
      sum(col("__lx") * col("__lx")).as("__sxx"),
      sum(col("__lx") * col("__ly")).as("__sxy"),
      sum(col("__ly") * col("__ly")).as("__syy"))
    val sxxC = col("__sxx") - col("__sx") * col("__sx") / col("__k")
    val sxyC = col("__sxy") - col("__sx") * col("__sy") / col("__k")
    val syyC = col("__syy") - col("__sy") * col("__sy") / col("__k")
    val slope = sxyC / sxxC
    ols.select(lit(n).cast("long").as("n_days"),
      col("__k").cast("long").as("n_freqs"),
      (-slope).as("d_hat"),
      when(col("__k") > 2 && sxxC > 0,
        sqrt((syyC - slope * sxyC) / (col("__k") - 2) / sxxC))
        .as("se_d"),
      when(sxxC > 0 && syyC > 0, sxyC * sxyC / (sxxC * syyC)).as("r2"))
  }

  /**
   * Detrended fluctuation analysis (DFA-1) of the daily event-count
   * series: integrate the demeaned counts into a profile, split the
   * RANK-indexed profile into complete boxes of each size, linearly
   * detrend each box (closed-form OLS residual SS), and regress
   * log F(s) on log s — the scaling exponent α that generalizes
   * [[hurstExponent]] to nonstationary series (α ≈ 0.5 uncorrelated, > 0.5
   * persistent). Boxes index by rank, so calendar gaps just compress.
   *
   * Scale shape: profile and ranks ride ONE [[graft.analysis
   * .PrefixSum]] pass (no single-partition window); per-(size, box)
   * closed-form detrending is a grouped aggregate; the log-log OLS is
   * a |sizes|-row aggregate. Returns one row per box size with the
   * shared (alpha, r2) fit columns: (s, n_boxes, fluctuation, alpha,
   * r2).
   */
  def dfa(df: DataFrame, tsCol: String,
      boxSizes: Seq[Int] = Seq(4, 8, 16, 32, 64)): DataFrame = {
    require(boxSizes.nonEmpty && boxSizes.forall(_ >= 3),
      "dfa: box sizes must be >= 3")
    val spark = df.sparkSession
    import spark.implicits._
    val daily = dailyCounts(df, tsCol)
    val muRow = broadcast(daily.agg(avg(col("__y")).as("__mu")))
    val dm = daily.crossJoin(muRow)
      .select(col("__t"), (col("__y") - col("__mu")).as("__dy"),
        lit(1L).as("__one"))
    val pre = graft.analysis.PrefixSum.exclusive(dm, "__t",
      Seq(("__one", "__k0"), ("__dy", "__xp")))
    val prof = pre.select((col("__k0") + 1).cast("double").as("__k"),
      (col("__xp") + col("__dy")).as("__v")).localCheckpoint()
    val sizes = broadcast(boxSizes.toDF("s"))
    val boxes = prof.crossJoin(sizes)
      .groupBy(col("s"), floor((col("__k") - 1) / col("s")).as("__b"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col("__k")).as("__sk"), sum(col("__v")).as("__sv"),
        sum(col("__k") * col("__k")).as("__skk"),
        sum(col("__k") * col("__v")).as("__skv"),
        sum(col("__v") * col("__v")).as("__svv"))
      .where(col("__cnt") === col("s"))
    val sxx = col("__skk") - col("__sk") * col("__sk") / col("__cnt")
    val sxy = col("__skv") - col("__sk") * col("__sv") / col("__cnt")
    val syy = col("__svv") - col("__sv") * col("__sv") / col("__cnt")
    val f = boxes
      .select(col("s"), (syy - sxy * sxy / sxx).as("__sse"))
      .groupBy("s")
      .agg(count(lit(1)).as("n_boxes"),
        sqrt(sum(col("__sse")) / (count(lit(1)) * col("s")))
          .as("fluctuation"))
      .where(col("fluctuation") > 0)
      .localCheckpoint()
    val ols = broadcast(f.agg(count(lit(1)).cast("double").as("__k"),
        sum(log(col("s"))).as("__sx"),
        sum(log(col("fluctuation"))).as("__sy"),
        sum(log(col("s")) * log(col("s"))).as("__sxx"),
        sum(log(col("s")) * log(col("fluctuation"))).as("__sxy"),
        sum(log(col("fluctuation")) * log(col("fluctuation"))).as("__syy"))
      .select(col("__k"),
        ((col("__sxy") - col("__sx") * col("__sy") / col("__k")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__k")))
          .as("alpha"),
        ((col("__sxy") - col("__sx") * col("__sy") / col("__k")) *
          (col("__sxy") - col("__sx") * col("__sy") / col("__k")) /
          ((col("__sxx") - col("__sx") * col("__sx") / col("__k")) *
            (col("__syy") - col("__sy") * col("__sy") / col("__k"))))
          .as("r2")))
    f.crossJoin(ols)
      .select(col("s"), col("n_boxes"), col("fluctuation"),
        col("alpha"), col("r2"))
  }

  /**
   * Syntetos–Boylan intermittent-demand classification per key: ADI
   * (average inter-demand interval in `periodDays` buckets, the
   * span/occupancy approximation) × CV² (squared coefficient of
   * variation of nonzero period demand) quadrants — smooth /
   * intermittent / erratic / lumpy, the routing decision between
   * [[holtLinear]]-style smoothing and [[croston]]. Keys with
   * fewer than 2 demand periods are excluded (CV² undefined).
   *
   * Scale shape: two map-side-combined groupBys (key × period, then
   * key) and a 4-row class rollup — no window, no collect.
   * Returns (demand_class, n_keys, avg_adi, avg_cv2) per quadrant.
   */
  def demandClasses(df: DataFrame, keyCol: String, tsCol: String,
      qtyCol: String, periodDays: Int = 7, adiCut: Double = 1.32,
      cv2Cut: Double = 0.49): DataFrame = {
    require(periodDays >= 1, "demandClasses: periodDays must be >= 1")
    val perPeriod = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(qtyCol).isNotNull)
      .groupBy(col(keyCol).as("__key"),
        floor(datediff(to_date(col(tsCol)), lit("1970-01-01")) /
          periodDays).as("__w"))
      .agg(sum(col(qtyCol).cast("double")).as("__q"))
      .where(col("__q") > 0)
    val perKey = perPeriod.groupBy("__key")
      .agg(count(lit(1)).cast("double").as("__nw"),
        (max(col("__w")) - min(col("__w")) + 1).cast("double").as("__span"),
        avg(col("__q")).as("__mq"), var_samp(col("__q")).as("__vq"))
      .where(col("__nw") >= 2 && col("__mq") > 0)
      .select(col("__key"), (col("__span") / col("__nw")).as("__adi"),
        (col("__vq") / (col("__mq") * col("__mq"))).as("__cv2"))
    perKey
      .select(col("__adi"), col("__cv2"),
        when(col("__adi") < adiCut && col("__cv2") < cv2Cut, "smooth")
          .when(col("__adi") >= adiCut && col("__cv2") < cv2Cut,
            "intermittent")
          .when(col("__adi") < adiCut, "erratic")
          .otherwise("lumpy").as("demand_class"))
      .groupBy("demand_class")
      .agg(count(lit(1)).as("n_keys"), avg(col("__adi")).as("avg_adi"),
        avg(col("__cv2")).as("avg_cv2"))
  }

  /**
   * Turning-points randomness test on the daily event-count series —
   * the cheapest IID check there is: count interior days that are a
   * strict local peak or trough among their two calendar neighbors.
   * Under randomness E[T] = 2m/3 over m evaluated triples and
   * Var[T] = (16n − 29)/90 with n = m + 2 (the classic contiguous
   * formula; gap days simply contribute no triple, mirrored exactly by
   * the oracle). A series with too FEW turning points trends; too MANY
   * oscillates (negative serial correlation).
   *
   * Scale shape: corpus → calendar-sized daily frame in one grouped
   * pass; triples via two calendar-shift equi-joins (the
   * [[sampleEntropy]] discipline) — no window, no sequence
   * materialization. Returns 1 row: (n_days, n_triples,
   * turning_points, expected_tp, variance_tp, z).
   */
  def turningPoints(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val t1 = daily.select((col("__t") - 1).as("__t"), col("__y").as("__y1"))
    val t2 = daily.select((col("__t") - 2).as("__t"), col("__y").as("__y2"))
    val agg = daily.join(t1, Seq("__t")).join(t2, Seq("__t"))
      .agg(count(lit(1)).as("n_triples"),
        coalesce(sum(when(
          (col("__y1") > col("__y") && col("__y1") > col("__y2")) ||
          (col("__y1") < col("__y") && col("__y1") < col("__y2")), 1L)
          .otherwise(0L)), lit(0L)).as("turning_points"))
    val nd = broadcast(daily.agg(count(lit(1)).as("n_days")))
    agg.crossJoin(nd)
      .withColumn("expected_tp", lit(2.0) * col("n_triples") / 3)
      .withColumn("variance_tp",
        (lit(16.0) * (col("n_triples") + 2) - 29) / 90)
      .select(col("n_days"), col("n_triples"), col("turning_points"),
        col("expected_tp"), col("variance_tp"),
        when(col("variance_tp") > 0,
          (col("turning_points") - col("expected_tp")) /
            sqrt(col("variance_tp"))).as("z"))
  }

  /**
   * Chatterjee's rank correlation ξ (2020) of `yCol` on `xCol` per
   * group — the modern dependence coefficient that is 0 iff
   * independent and 1 iff y is a measurable function of x, catching
   * NON-monotone dependence every classic correlation misses
   * (Pearson/Spearman/Kendall all read ~0 on y = (x - x̄)²). Ties-aware
   * form: ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)) with
   * r_i = #{j : y_j ≤ y_i}, l_i = #{j : y_j ≥ y_i}, rows ordered by
   * (x, tieCols) — the tie order is DETERMINISTIC (not randomized as
   * in the paper) so both engines walk the identical sequence.
   *
   * Scale shape: three partitioned windows per group (two y-rank
   * range frames + one x-order lead) and a single groupBy — no
   * global window, no pair join; a group's rows stream through one
   * task exactly like every other per-key series op here.
   * Returns one row per group: (group, n, sum_abs_dr, xi).
   */
  def chatterjeeXi(df: DataFrame, keyCol: String, xCol: String,
      yCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(keyCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(keyCol).as("__g"), col(xCol).as("__x"),
        col(yCol).cast("double").as("__y"),
        struct(tieCols.map(col): _*).as("__tb"))
    val wAsc = Window.partitionBy(col("__g")).orderBy(col("__y"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("__g")).orderBy(col("__y").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wX = Window.partitionBy(col("__g"))
      .orderBy(col("__x").asc, col("__tb").asc)
    val ranked = base
      .withColumn("__r", count(lit(1)).over(wAsc))
      .withColumn("__l", count(lit(1)).over(wDesc))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("__g"))))
      .withColumn("__rn", lead(col("__r"), 1).over(wX))
    ranked.groupBy(col("__g").as(keyCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(abs(col("__rn") - col("__r"))), lit(0L))
          .as("sum_abs_dr"),
        sum(col("__l") * (col("__n") - col("__l"))).as("__den"))
      .select(col(keyCol), col("n"), col("sum_abs_dr"),
        when(col("__den") > 0,
          lit(1.0) - col("n") * col("sum_abs_dr") /
            (lit(2.0) * col("__den"))).as("xi"))
  }

  /**
   * Watson's U² circular-uniformity test of time-of-day per group —
   * the rotation-invariant cumulative companion to the Rayleigh test
   * ([[circularHourStats]]): Rayleigh only sees a FIRST-moment
   * preferred direction and is blind to bimodal clocks (9am+9pm
   * spikes cancel); U² = Σ(u_(i) − (2i−1)/(2n))² + 1/(12n) −
   * n(ū − ½)² catches any departure from uniform-on-the-circle.
   * u = fraction-of-day in [0,1); the tie-block sum is permutation
   * invariant, so ties in u cannot break engine parity.
   *
   * Scale shape: one partitioned rank window + one groupBy per
   * group — no global sort. Returns (group, n, mean_u, u2_stat).
   */
  def watsonU2(df: DataFrame, keyCol: String, tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val base = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__g"),
        (pmod(unix_micros(col(tsCol)), lit(dayUs)).cast("double") /
          lit(dayUs.toDouble)).as("__u"),
        struct(tieCols.map(col): _*).as("__tb"))
    val wU = Window.partitionBy(col("__g"))
      .orderBy(col("__u").asc, col("__tb").asc)
    val idx = base.withColumn("__i", row_number().over(wU))
    idx.groupBy(col("__g").as(keyCol))
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__u")).as("mean_u"),
        sum(col("__u") * col("__u")).as("__suu"),
        sum(col("__u") * col("__i")).as("__sui"),
        sum(col("__u")).as("__su"))
      // Σ(u_i − (2i−1)/(2n))² expanded so only Σu², Σu·i, Σu and the
      // closed-form Σ(2i−1)²/(4n²) = (4n²−1)/(12n) remain
      .select(col(keyCol), col("__n").cast("long").as("n"),
        col("mean_u"),
        (col("__suu") - (lit(2.0) * col("__sui") - col("__su")) /
            col("__n") +
          (lit(4.0) * col("__n") * col("__n") - 1) / (lit(12.0) *
            col("__n")) +
          lit(1.0) / (lit(12.0) * col("__n")) -
          col("__n") * (col("mean_u") - lit(0.5)) *
            (col("mean_u") - lit(0.5))).as("u2_stat"))
  }

  /**
   * Barndorff-Nielsen–Shephard jump diagnostic per day: realized
   * variance RV = Σr² vs bipower variation BV = (π/2)·Σ|r_t||r_{t−1}|
   * over the intraday hourly-mean return series. BV is robust to a
   * single jump while RV is not, so jump_share = 1 − BV/RV isolates
   * the discontinuous part of the day's variance — "was today's spike
   * one shock or genuine volatility".
   *
   * Scale shape: corpus → (day, hour) grid in one grouped pass
   * (≤ 24 rows/day), then per-day lag windows — partitioned by day,
   * never global. Returns one row per day with ≥ `minReturns`
   * returns: (day, n_rets, rv, bv, jump_share).
   */
  def bnsJumpTest(df: DataFrame, tsCol: String, valueCol: String,
      minReturns: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"),
        hour(col(tsCol)).as("__h"))
      .agg(avg(col(valueCol).cast("double")).as("__x"))
    val wD = Window.partitionBy(col("day")).orderBy(col("__h"))
    val rets = hourly
      .withColumn("__r", col("__x") - lag(col("__x"), 1).over(wD))
      .withColumn("__ar", abs(col("__r")) *
        abs(lag(col("__r"), 1).over(wD)))
      .where(col("__r").isNotNull)
    rets.groupBy("day")
      .agg(count(lit(1)).as("n_rets"),
        sum(col("__r") * col("__r")).as("rv"),
        (lit(math.Pi / 2) * coalesce(sum(col("__ar")), lit(0.0)))
          .as("bv"))
      .where(col("n_rets") >= minReturns)
      .withColumn("jump_share",
        when(col("rv") > 0, lit(1.0) - col("bv") / col("rv")))
  }

  /**
   * Records test on the daily event-count series: the count of upper
   * (strict running-max) and lower (strict running-min) records vs
   * the iid expectation E[R_n] = H_n, Var[R_n] = H_n − H_n⁽²⁾ — a
   * trend test that needs NO distributional assumptions and reacts
   * to exactly the "is this metric still setting new highs" question
   * dashboards ask. The first day counts as a record (the k=1 term
   * of H_n); ties do NOT extend a record (strict inequality).
   *
   * Scale shape: corpus → calendar-sized daily frame; records via a
   * reduced×reduced earlier-day pair join (≤|calendar|² — bounded by
   * the calendar forever, the [[sampleEntropy]] discipline); harmonic
   * numbers from a PrefixSum row index, no global window. Returns
   * 1 row: (n_days, upper_records, lower_records, expected, variance,
   * z_upper, z_lower).
   */
  def recordsTest(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val prev = daily.select(col("__t").as("__s"), col("__y").as("__ys"))
    val rec = daily.join(prev, col("__s") < col("__t"), "left")
      .groupBy(col("__t"), col("__y"))
      .agg(max(col("__ys")).as("__mx"), min(col("__ys")).as("__mn"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("__mx").isNull || col("__mx") < col("__y"), 1L)
          .otherwise(0L)).as("upper_records"),
        sum(when(col("__mn").isNull || col("__mn") > col("__y"), 1L)
          .otherwise(0L)).as("lower_records"))
    val idx = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi"))
      .withColumn("__i", col("__exi") + 1)
    val h = broadcast(idx.agg(
      sum(lit(1.0) / col("__i")).as("expected"),
      sum(lit(1.0) / col("__i") - lit(1.0) / (col("__i") * col("__i")))
        .as("variance")))
    rec.crossJoin(h)
      .select(col("n_days"), col("upper_records"), col("lower_records"),
        col("expected"), col("variance"),
        when(col("variance") > 0,
          (col("upper_records") - col("expected")) /
            sqrt(col("variance"))).as("z_upper"),
        when(col("variance") > 0,
          (col("lower_records") - col("expected")) /
            sqrt(col("variance"))).as("z_lower"))
  }

  /**
   * Cochrane–Orcutt AR(1)-corrected trend regression on the daily
   * event-count series: a naive OLS trend's standard error (and often
   * its slope) is distorted by serially-correlated residuals — the
   * norm, not the exception, in daily product metrics. Two-step CO:
   * (1) OLS y on t, residuals e; (2) ρ̂ = Σe_t·e_{t−1}/Σe²_{t−1} over
   * CONSECUTIVE calendar days (gap days contribute no pair, mirrored
   * exactly by the oracle); (3) re-fit OLS on the quasi-differenced
   * pairs (y_t − ρ̂y_{t−1}) ~ (t − ρ̂(t−1)), intercept recovered as
   * α-star over (1 − ρ̂).
   *
   * Scale shape: corpus → calendar frame; residuals are a map-only
   * projection against ONE broadcast 1-row stats frame; pairs via a
   * calendar-shift equi-join. Returns 1 row: (n_days, n_pairs,
   * slope_ols, rho, slope_co, intercept_co).
   */
  def cochraneOrcutt(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val st = broadcast(daily.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__t").cast("double")).as("__st"),
      sum(col("__y")).as("__sy"),
      sum(col("__t").cast("double") * col("__t")).as("__stt"),
      sum(col("__t").cast("double") * col("__y")).as("__sty")))
    val b = (col("__n") * col("__sty") - col("__st") * col("__sy")) /
      (col("__n") * col("__stt") - col("__st") * col("__st"))
    val res = daily.crossJoin(st)
      .withColumn("__b", b)
      .withColumn("__a", (col("__sy") - b * col("__st")) / col("__n"))
      .select(col("__t"), col("__y"), col("__b"), col("__a"),
        (col("__y") - col("__a") - col("__b") *
          col("__t").cast("double")).as("__e"))
    val prev = res.select((col("__t") + 1).as("__t"),
      col("__y").as("__y1"), col("__e").as("__e1"))
    val pairs = res.join(prev, Seq("__t")).localCheckpoint()
    val rho = broadcast(pairs.agg(
      count(lit(1)).as("__np"),
      (sum(col("__e") * col("__e1")) / sum(col("__e1") * col("__e1")))
        .as("__rho"),
      max(col("__b")).as("__bols")))
    val tr = pairs.crossJoin(rho)
      .select(col("__np"), col("__rho"), col("__bols"),
        (col("__y") - col("__rho") * col("__y1")).as("__ys"),
        (col("__t").cast("double") - col("__rho") *
          (col("__t") - 1).cast("double")).as("__xs"))
    val fit = tr.groupBy(col("__np"), col("__rho"), col("__bols"))
      .agg(count(lit(1)).cast("double").as("__m"),
        sum(col("__xs")).as("__sx"), sum(col("__ys")).as("__sy2"),
        sum(col("__xs") * col("__xs")).as("__sxx"),
        sum(col("__xs") * col("__ys")).as("__sxy"))
    val bco = (col("__m") * col("__sxy") - col("__sx") * col("__sy2")) /
      (col("__m") * col("__sxx") - col("__sx") * col("__sx"))
    val nd = broadcast(daily.agg(count(lit(1)).as("n_days")))
    fit.crossJoin(nd)
      .select(col("n_days"), col("__np").as("n_pairs"),
        col("__bols").as("slope_ols"), col("__rho").as("rho"),
        bco.as("slope_co"),
        when(abs(lit(1.0) - col("__rho")) > 1e-12,
          ((col("__sy2") - bco * col("__sx")) / col("__m")) /
            (lit(1.0) - col("__rho"))).as("intercept_co"))
  }

  /**
   * MOSUM level-stability scan of the daily event-count series:
   * moving sums W_i over `h`-day windows compared to the global-mean
   * expectation, M_i = (W_i − h·ȳ)/(σ̂√h) — the fixed-bandwidth
   * companion to CUSUM that LOCALIZES a level shift instead of just
   * detecting one. The windows slide over OBSERVED days in calendar
   * order (an index shift, not a calendar shift, so gaps don't empty
   * windows).
   *
   * Determinism: W_i is a sum of integer counts — exact in any
   * association order — and h·ȳ is one fixed double, so the peak
   * window and the exceedance count are bit-stable across engines by
   * construction (a residual-based MOSUM would hang the argmax on
   * last-bit float noise).
   *
   * Scale shape: calendar frame + PrefixSum index/cumsum + one
   * index-shift equi-join; the peak is a TakeOrdered over ≤|days|
   * windows. Returns 1 row: (n_days, h, mean_y, sigma, n_windows,
   * max_abs_mosum, peak_t, n_above_2).
   */
  def mosumTest(df: DataFrame, tsCol: String, h: Int = 15): DataFrame = {
    require(h >= 2, s"MOSUM window h must be >= 2, got $h")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val st = broadcast(daily.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("__y")).as("__my"),
      var_samp(col("__y")).as("__v")))
    val idx = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi", "__y" -> "__exc"))
      .select(col("__t"), (col("__exi") + 1).as("__i"),
        (col("__exc") + col("__y")).as("__c"))
      .localCheckpoint()
    val prevC = idx.select((col("__i") + h).as("__i"),
      col("__c").as("__cprev"))
    val win = idx.where(col("__i") >= h)
      .join(prevC, Seq("__i"), "left")
      .select(col("__t"),
        (col("__c") - coalesce(col("__cprev"), lit(0.0))).as("__w"))
    val scored = win.crossJoin(st)
      .select(col("__t"), col("__w"), col("__n"), col("__my"),
        col("__v"),
        abs(col("__w") - lit(h.toDouble) * col("__my")).as("__dev"))
    val peak = scored.orderBy(col("__dev").desc, col("__t").asc).limit(1)
      .select(col("__t").as("peak_t"), col("__dev").as("__peakdev"),
        col("__n"), col("__my"), col("__v"))
    val agg = broadcast(scored.agg(
      count(lit(1)).as("n_windows"),
      coalesce(sum(when(col("__dev") / (sqrt(col("__v")) *
        sqrt(lit(h.toDouble))) > 2.0, 1L).otherwise(0L)), lit(0L))
        .as("n_above_2")))
    peak.crossJoin(agg)
      .select(col("__n").cast("long").as("n_days"),
        lit(h).as("h"), col("__my").as("mean_y"),
        sqrt(col("__v")).as("sigma"), col("n_windows"),
        (col("__peakdev") / (sqrt(col("__v")) *
          sqrt(lit(h.toDouble)))).as("max_abs_mosum"),
        col("peak_t"), col("n_above_2"))
  }

  /**
   * Keenan's one-degree test for nonlinearity of the daily count
   * series against an AR(2) null: fit y_t ~ (y_{t−1}, y_{t−2}), then
   * regress the squared fitted values on the same lags, and test
   * whether THEIR residuals still explain the AR residuals — the
   * cheapest credible answer to "is a linear AR model even the right
   * family", run before anyone trusts q367's Yule-Walker forecast.
   * F = η·(n − 2m − 2)/(RSS₀ − η), η = (Σêû)²/Σû², m = 2; triples
   * come from consecutive calendar days only (gaps drop them, oracle
   * mirrored).
   *
   * Scale shape: calendar frame → two calendar-shift equi-joins →
   * THREE sufficient-stats aggregations (each a 1-row frame,
   * broadcast back); no window, no collect. Returns 1 row:
   * (n_triples, b1, b2, eta, f_stat).
   */
  def keenanTest(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val l1 = daily.select((col("__t") + 1).as("__t"),
      col("__y").as("__y1"))
    val l2 = daily.select((col("__t") + 2).as("__t"),
      col("__y").as("__y2"))
    val tri = daily.join(l1, Seq("__t")).join(l2, Seq("__t"))
      .localCheckpoint()
    // centered 2-regressor OLS sufficient stats of target ~ (y1, y2):
    // S11 = Σy1² − (Σy1)²/n and friends — the same algebra the oracle
    // spells out, so coefficient bits match exactly on integer inputs
    def fit2(frame: DataFrame, target: Column): DataFrame = {
      val a = frame.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__y1")).as("__s1"), sum(col("__y2")).as("__s2"),
        sum(target).as("__sy"),
        sum(col("__y1") * col("__y1")).as("__s11"),
        sum(col("__y2") * col("__y2")).as("__s22"),
        sum(col("__y1") * col("__y2")).as("__s12"),
        sum(target * col("__y1")).as("__sy1"),
        sum(target * col("__y2")).as("__sy2"))
      val c11 = col("__s11") - col("__s1") * col("__s1") / col("__n")
      val c22 = col("__s22") - col("__s2") * col("__s2") / col("__n")
      val c12 = col("__s12") - col("__s1") * col("__s2") / col("__n")
      val cy1 = col("__sy1") - col("__sy") * col("__s1") / col("__n")
      val cy2 = col("__sy2") - col("__sy") * col("__s2") / col("__n")
      val det = c11 * c22 - c12 * c12
      val b1 = (cy1 * c22 - cy2 * c12) / det
      val b2 = (cy2 * c11 - cy1 * c12) / det
      a.select(b1.as("__b1"), b2.as("__b2"),
        ((col("__sy") - b1 * col("__s1") - b2 * col("__s2")) /
          col("__n")).as("__b0"))
    }
    val f1 = broadcast(fit2(tri, col("__y")))
    val withF = tri.crossJoin(f1)
      .select(col("__t"), col("__y"), col("__y1"), col("__y2"),
        col("__b1"), col("__b2"),
        (col("__b0") + col("__b1") * col("__y1") +
          col("__b2") * col("__y2")).as("__f"))
      .withColumn("__e", col("__y") - col("__f"))
      .withColumn("__g", col("__f") * col("__f"))
      .localCheckpoint()
    val f2 = broadcast(fit2(
      withF.select(col("__y1"), col("__y2"), col("__g")), col("__g"))
      .select(col("__b1").as("__c1"), col("__b2").as("__c2"),
        col("__b0").as("__c0")))
    val fin = withF.crossJoin(f2)
      .select(col("__b1"), col("__b2"), col("__e"),
        (col("__g") - col("__c0") - col("__c1") * col("__y1") -
          col("__c2") * col("__y2")).as("__u"))
      .agg(count(lit(1)).cast("double").as("__n"),
        max(col("__b1")).as("b1"), max(col("__b2")).as("b2"),
        sum(col("__e") * col("__u")).as("__seu"),
        sum(col("__u") * col("__u")).as("__suu"),
        sum(col("__e") * col("__e")).as("__see"))
    val eta = col("__seu") * col("__seu") / col("__suu")
    fin.select(col("__n").cast("long").as("n_triples"),
      col("b1"), col("b2"), eta.as("eta"),
      when(col("__see") - eta > 0,
        eta * (col("__n") - 6) / (col("__see") - eta)).as("f_stat"))
  }

  /**
   * Hjorth descriptors of the daily event-count series — activity
   * (variance), mobility (RMS frequency: sd of the first difference
   * over sd of the signal) and complexity (bandwidth: mobility of the
   * derivative over mobility of the signal) — the EEG-era 3-number
   * summary that separates "noisy", "trending" and "oscillating"
   * series long before a periodogram is warranted. Differences pair
   * CONSECUTIVE calendar days only (gaps drop pairs/triples, oracle
   * mirrored); variances are spelled out as (Σv² − (Σv)²/n)/(n − 1)
   * so both engines run identical arithmetic on exact integer sums.
   *
   * Scale shape: calendar frame + two calendar-shift equi-joins +
   * three 1-row reduces. Returns 1 row: (n_days, n_d1, n_d2,
   * activity, mobility, complexity).
   */
  def hjorthParams(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    def varOf(frame: DataFrame, c: String, n: String, v: String) =
      broadcast(frame.agg(count(lit(1)).cast("double").as(n),
        ((sum(col(c) * col(c)) - sum(col(c)) * sum(col(c)) /
          count(lit(1))) / (count(lit(1)) - 1)).as(v)))
    val prev = daily.select((col("__t") + 1).as("__t"),
      col("__y").as("__y1"))
    val d1 = daily.join(prev, Seq("__t"))
      .select(col("__t"), (col("__y") - col("__y1")).as("__d"))
      .localCheckpoint()
    val d1prev = d1.select((col("__t") + 1).as("__t"),
      col("__d").as("__d1"))
    val d2 = d1.join(d1prev, Seq("__t"))
      .select((col("__d") - col("__d1")).as("__e"))
    val v0 = varOf(daily, "__y", "__n0", "__v0")
    val v1 = varOf(d1, "__d", "__n1", "__v1")
    val v2 = varOf(d2, "__e", "__n2", "__v2")
    v0.crossJoin(v1).crossJoin(v2)
      .select(col("__n0").cast("long").as("n_days"),
        col("__n1").cast("long").as("n_d1"),
        col("__n2").cast("long").as("n_d2"),
        col("__v0").as("activity"),
        when(col("__v0") > 0, sqrt(col("__v1") / col("__v0")))
          .as("mobility"),
        when(col("__v0") > 0 && col("__v1") > 0,
          sqrt(col("__v2") / col("__v1")) /
            sqrt(col("__v1") / col("__v0"))).as("complexity"))
  }

  /**
   * Mincer–Zarnowitz calibration of the seasonal-naive forecast
   * f_t = y_{t−lag} for the daily count series: OLS y ~ a + b·f plus
   * the joint F test of (a, b) = (0, 1) — the standard "is this
   * forecast UNBIASED and EFFICIENT" audit; an intercept ≠ 0 means
   * systematic bias, a slope < 1 means the forecast over-reacts. The
   * restricted RSS is Σ(y − f)² (the naive forecast's own SSE), so
   * F = ((RSS₀ − RSS)/2)/(RSS/(n − 2)) also reads as "how much error
   * a calibration layer would remove".
   *
   * Scale shape: calendar frame + one lag-shift equi-join + two
   * 1-row sufficient-stats reduces (coefficients broadcast back for
   * the residual pass). Returns 1 row: (n_pairs, intercept, slope,
   * rss_naive, rss_ols, f_stat).
   */
  def mincerZarnowitz(df: DataFrame, tsCol: String,
      lagDays: Int = 7): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1, got $lagDays")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val lagf = daily.select((col("__t") + lagDays).as("__t"),
      col("__y").as("__f"))
    val pairs = daily.join(lagf, Seq("__t")).localCheckpoint()
    val st = broadcast(pairs.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__f")).as("__sf"), sum(col("__y")).as("__sy"),
      sum(col("__f") * col("__f")).as("__sff"),
      sum(col("__f") * col("__y")).as("__sfy")))
    val b = (col("__n") * col("__sfy") - col("__sf") * col("__sy")) /
      (col("__n") * col("__sff") - col("__sf") * col("__sf"))
    val withc = pairs.crossJoin(st)
      .withColumn("__b", b)
      .withColumn("__a", (col("__sy") - b * col("__sf")) / col("__n"))
    withc.agg(max(col("__n")).as("__n"), max(col("__a")).as("__a"),
        max(col("__b")).as("__b"),
        sum((col("__y") - col("__f")) * (col("__y") - col("__f")))
          .as("__rss0"),
        sum((col("__y") - col("__a") - col("__b") * col("__f")) *
          (col("__y") - col("__a") - col("__b") * col("__f")))
          .as("__rss"))
      .select(col("__n").cast("long").as("n_pairs"),
        col("__a").as("intercept"), col("__b").as("slope"),
        col("__rss0").as("rss_naive"), col("__rss").as("rss_ols"),
        when(col("__rss") > 0 && col("__n") > 2,
          ((col("__rss0") - col("__rss")) / 2) /
            (col("__rss") / (col("__n") - 2))).as("f_stat"))
  }

  /**
   * Relative-distribution summary of the SECOND half of the calendar
   * against the first: each late-period day's count maps to its
   * mid-mass empirical CDF position F̂_ref in the early period, and
   * the frame reports the mean relative rank (location: > ½ = the
   * metric runs higher now) and the median relative polarization
   * MRP = 4·E|F̂ − ½| − 1 (shape: > 0 = late days live in the early
   * period's TAILS — divergence even when the mean moved nowhere).
   * The split day is the discrete median of observed days, so both
   * halves and all CDF inputs are exact integers on both engines.
   *
   * Scale shape: calendar frame, one union cell frame + PrefixSum
   * for ref-below counts, two 1-row reduces. Returns 1 row:
   * (n_ref, n_cmp, split_t, mean_rel_rank, mrp).
   */
  def relativeDistribution(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val medT = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(daily, "__t", Seq("__med" -> 0.5), Nil))
    val marked = daily.crossJoin(medT)
      .select(col("__y"), (col("__t") <= col("__med")).as("__ref"),
        col("__med"))
    val cells = marked.groupBy("__y")
      .agg(sum(when(col("__ref"), 1.0).otherwise(0.0)).as("__cr"),
        sum(when(!col("__ref"), 1.0).otherwise(0.0)).as("__cc"))
    val tot = broadcast(cells.agg(sum(col("__cr")).as("__nr"),
      sum(col("__cc")).as("__nc")))
    val cdf = graft.analysis.PrefixSum
      .exclusive(cells, "__y", Seq("__cr" -> "__below"))
      .crossJoin(tot)
      .select(col("__cc"), col("__nr"), col("__nc"),
        ((col("__below") + lit(0.5) * col("__cr")) / col("__nr"))
          .as("__F"))
    val sp = broadcast(marked.agg(max(col("__med")).as("split_t")))
    cdf.agg(max(col("__nr")).as("__nr"), max(col("__nc")).as("__nc"),
        (sum(col("__cc") * col("__F")) / max(col("__nc")))
          .as("mean_rel_rank"),
        (lit(4.0) * sum(col("__cc") * abs(col("__F") - lit(0.5))) /
          max(col("__nc")) - 1).as("mrp"))
      .crossJoin(sp)
      .select(col("__nr").cast("long").as("n_ref"),
        col("__nc").cast("long").as("n_cmp"), col("split_t"),
        col("mean_rel_rank"), col("mrp"))
  }

  /**
   * Temporal (semi)variogram of the daily event-count series:
   * γ(h) = ½·E[(y_t − y_{t+h})²] and the robust madogram
   * ν(h) = ½·E|y_t − y_{t+h}| per lag h = 1..maxLag — the
   * geostatistics read of temporal structure: a γ that keeps rising
   * means long-range trend, an early sill gives the decorrelation
   * horizon, and γ(1)/γ(∞) is the nugget share. Pairs use calendar
   * lags (gap days contribute none, oracle mirrored); counts are
   * integers so every reported moment is exact-sum arithmetic.
   *
   * Scale shape: calendar frame × maxLag lag ids (explode), ONE
   * calendar-shift equi-join, one groupBy(h). Returns maxLag rows:
   * (h, n_pairs, semivariance, madogram).
   */
  def variogram(df: DataFrame, tsCol: String,
      maxLag: Int = 10): DataFrame = {
    require(maxLag >= 1 && maxLag <= 120,
      s"variogram: maxLag in [1, 120], got $maxLag")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val lagged = daily
      .select(col("__t"), col("__y"),
        explode(sequence(lit(1), lit(maxLag))).as("h"))
      .select((col("__t") + col("h")).as("__t"), col("h"),
        col("__y").as("__y0"))
    lagged.join(daily, Seq("__t"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_pairs"),
        (sum((col("__y") - col("__y0")) * (col("__y") - col("__y0")))
          / (lit(2.0) * count(lit(1)))).as("semivariance"),
        (sum(abs(col("__y") - col("__y0"))) /
          (lit(2.0) * count(lit(1)))).as("madogram"))
  }

  /**
   * Recurrence quantification of the daily count series: pairs of
   * days closer than ε = 10% of the observed range count as
   * recurrences; RR is their share of all day pairs and DET the
   * share of recurrences sitting on a diagonal line of length ≥ 2
   * (today≈day-X AND tomorrow≈day-X+1) — determinism in the
   * dynamical sense: high-RR/low-DET is unstructured noise, high
   * DET means the series revisits whole TRAJECTORIES, the signature
   * of periodic regimes that survives where the ACF washes out.
   *
   * Scale shape: reduced×reduced upper-triangle pair join (≤
   * |calendar|², the [[sampleEntropy]] discipline) + one shifted
   * self-join of the recurrent set. All comparisons are on exact
   * integers vs one exact-derived ε. Returns 1 row: (n_days, eps,
   * n_pairs, n_recurrent, recurrence_rate, n_on_diagonal,
   * determinism).
   */
  def recurrenceQuant(df: DataFrame, tsCol: String,
      epsShare: Double = 0.1): DataFrame = {
    require(epsShare > 0 && epsShare < 1,
      s"recurrenceQuant: epsShare in (0,1), got $epsShare")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val eps = broadcast(daily.agg(
      ((max(col("__y")) - min(col("__y"))) * epsShare).as("__eps"),
      count(lit(1)).as("n_days")))
    val b = daily.select(col("__t").as("__s"), col("__y").as("__ys"))
    val pairs = daily.crossJoin(eps)
      .join(b, col("__s") < col("__t"))
      .select(col("__t"), col("__s"), col("__eps"), col("n_days"),
        (abs(col("__y") - col("__ys")) <= col("__eps")).as("__rec"))
      .localCheckpoint()
    val rec = pairs.where(col("__rec"))
      .select(col("__t"), col("__s")).localCheckpoint()
    val nxt = rec.select((col("__t") - 1).as("__t"),
      (col("__s") - 1).as("__s"), lit(1).as("__hasNext"))
    val prv = rec.select((col("__t") + 1).as("__t"),
      (col("__s") + 1).as("__s"), lit(1).as("__hasPrev"))
    val onDiag = rec
      .join(nxt, Seq("__t", "__s"), "left")
      .join(prv, Seq("__t", "__s"), "left")
      .agg(coalesce(sum(when(col("__hasNext").isNotNull ||
        col("__hasPrev").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as("n_on_diagonal"))
    val tot = pairs.agg(max(col("n_days")).as("n_days"),
      max(col("__eps")).as("eps"), count(lit(1)).as("n_pairs"),
      coalesce(sum(when(col("__rec"), 1L).otherwise(0L)), lit(0L))
        .as("n_recurrent"))
    tot.crossJoin(broadcast(onDiag))
      .select(col("n_days"), col("eps"), col("n_pairs"),
        col("n_recurrent"),
        when(col("n_pairs") > 0, col("n_recurrent").cast("double") /
          col("n_pairs")).as("recurrence_rate"),
        col("n_on_diagonal"),
        when(col("n_recurrent") > 0,
          col("n_on_diagonal").cast("double") / col("n_recurrent"))
          .as("determinism"))
  }

  /**
   * Band-averaged cross-spectral coherence between two event types'
   * daily count series: DFT sums at Fourier frequencies j/n (j < n/2,
   * capped at `maxFreq`), cross- and auto-spectra averaged over
   * `bandWidth`-frequency bands, coherence² = |S̄xy|²/(S̄xx·S̄yy) per
   * band — "do these two metrics share a cycle, and in which
   * frequency range", which the time-domain cross-correlation (q*)
   * smears across all lags. Raw (unsmoothed) coherence is
   * identically 1; the band average IS the estimator.
   *
   * Scale shape: the two series join on shared days (inner), the
   * day×frequency expansion is |days|×maxFreq rows, ONE groupBy(j)
   * then ONE groupBy(band). Returns ≤ maxFreq/bandWidth rows:
   * (band, n_freqs, f_lo, f_hi, coherence2).
   */
  def crossCoherence(df: DataFrame, tsCol: String, keyCol: String,
      typeA: String, typeB: String, maxFreq: Int = 40,
      bandWidth: Int = 5): DataFrame = {
    require(maxFreq >= bandWidth && bandWidth >= 2,
      s"crossCoherence: maxFreq >= bandWidth >= 2")
    def series(t: String) =
      dailyCounts(df.where(col(keyCol) === t), tsCol)
    val joined = series(typeA)
      .join(series(typeB).withColumnRenamed("__y", "__y2"), Seq("__t"))
      .localCheckpoint()
    val idx = graft.analysis.PrefixSum.exclusive(
        joined.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi"))
      .withColumn("__i", col("__exi"))
    val n = broadcast(joined.agg(count(lit(1)).cast("double").as("__n")))
    val byFreq = idx.crossJoin(n)
      .select(col("__i"), col("__y"), col("__y2"), col("__n"),
        explode(sequence(lit(1), lit(maxFreq))).as("j"))
      .where(col("j") < col("__n") / 2)
      .withColumn("__w",
        lit(2 * math.Pi) * col("j") / col("__n") * col("__i"))
      .groupBy("j")
      .agg(max(col("__n")).as("__n"),
        sum(col("__y") * cos(col("__w"))).as("__ax"),
        sum(col("__y") * sin(col("__w"))).as("__bx"),
        sum(col("__y2") * cos(col("__w"))).as("__ay"),
        sum(col("__y2") * sin(col("__w"))).as("__by"))
    val spec = byFreq.select(col("j"), col("__n"),
      (col("__ax") * col("__ay") + col("__bx") * col("__by"))
        .as("__cre"),
      (col("__bx") * col("__ay") - col("__ax") * col("__by"))
        .as("__cim"),
      (col("__ax") * col("__ax") + col("__bx") * col("__bx"))
        .as("__sxx"),
      (col("__ay") * col("__ay") + col("__by") * col("__by"))
        .as("__syy"))
    spec.groupBy(ceil(col("j") / bandWidth).as("band"))
      .agg(count(lit(1)).as("n_freqs"),
        (min(col("j")) / max(col("__n"))).as("f_lo"),
        (max(col("j")) / max(col("__n"))).as("f_hi"),
        ((avg(col("__cre")) * avg(col("__cre")) +
          avg(col("__cim")) * avg(col("__cim"))) /
          (avg(col("__sxx")) * avg(col("__syy")))).as("coherence2"))
  }

  /**
   * Day-of-week-adjusted trend of the daily count series: the raw
   * OLS slope confounds growth with weekly seasonality whenever the
   * observation window isn't a whole number of weeks; partialling
   * the 7 dow means out of BOTH sides (Frisch–Waugh) gives the
   * seasonality-honest slope, and dow_r2 reports how much of the
   * variance the weekly cycle owned. Dow comes from epoch-day
   * arithmetic ((t + 4) mod 7), identical on both engines.
   *
   * Scale shape: calendar frame + one ≤7-row dow-means reduce
   * (broadcast back) + two 1-row reduces. Returns 1 row: (n_days,
   * slope_raw, slope_adj, dow_r2).
   */
  def dowAdjustedTrend(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol)
      .withColumn("__w", pmod(col("__t") + 4, lit(7)))
      .localCheckpoint()
    val dow = broadcast(daily.groupBy("__w")
      .agg(avg(col("__y")).as("__my"),
        avg(col("__t").cast("double")).as("__mt")))
    val st = broadcast(daily.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__t").cast("double")).as("__st"), sum(col("__y")).as("__sy"),
      sum(col("__t").cast("double") * col("__t")).as("__stt"),
      sum(col("__t").cast("double") * col("__y")).as("__sty"),
      sum(col("__y") * col("__y")).as("__syy")))
    val adj = daily.join(dow, Seq("__w"))
      .select((col("__y") - col("__my")).as("__ry"),
        (col("__t").cast("double") - col("__mt")).as("__rt"))
      .agg(sum(col("__ry") * col("__rt")).as("__srty"),
        sum(col("__rt") * col("__rt")).as("__srtt"),
        sum(col("__ry") * col("__ry")).as("__sryy"))
    adj.crossJoin(st)
      .select(col("__n").cast("long").as("n_days"),
        ((col("__n") * col("__sty") - col("__st") * col("__sy")) /
          (col("__n") * col("__stt") - col("__st") * col("__st")))
          .as("slope_raw"),
        when(col("__srtt") > 0, col("__srty") / col("__srtt"))
          .as("slope_adj"),
        when(col("__syy") - col("__sy") * col("__sy") / col("__n") > 0,
          lit(1.0) - col("__sryy") /
            (col("__syy") - col("__sy") * col("__sy") / col("__n")))
          .as("dow_r2"))
  }

  /**
   * Prewhitened cross-correlation between two event types' daily
   * series: each series is demeaned, AR(1)-filtered with its own
   * lag-1 coefficient, and only THEN cross-correlated at lags
   * −maxLag..maxLag — the Box–Jenkins discipline that kills the
   * spurious CCF spikes two autocorrelated series always show (raw
   * CCF between two independent trending series reads ~0.8; the
   * prewhitened one reads noise). Denominator is the global
   * √(Σfx²·Σfy²), the standard CCF normalization.
   *
   * Scale shape: two calendar frames inner-joined, AR(1) filters via
   * one calendar-shift join, lag products via a lag-id explode +
   * one equi-join. Returns 2·maxLag+1 rows: (lag, n_pairs, ccf) —
   * positive lag = the first series LEADS.
   */
  def prewhitenedCcf(df: DataFrame, tsCol: String, keyCol: String,
      typeA: String, typeB: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60,
      s"prewhitenedCcf: maxLag in [1, 60], got $maxLag")
    def series(t: String) =
      dailyCounts(df.where(col(keyCol) === t), tsCol)
    val joined = series(typeA)
      .join(series(typeB).withColumnRenamed("__y", "__y2"), Seq("__t"))
      .localCheckpoint()
    val mm = broadcast(joined.agg(avg(col("__y")).as("__mx"),
      avg(col("__y2")).as("__my")))
    val dem = joined.crossJoin(mm)
      .select(col("__t"), (col("__y") - col("__mx")).as("__x"),
        (col("__y2") - col("__my")).as("__z"))
      .localCheckpoint()
    val prev = dem.select((col("__t") + 1).as("__t"),
      col("__x").as("__x1"), col("__z").as("__z1"))
    val pairs = dem.join(prev, Seq("__t")).localCheckpoint()
    val rho = broadcast(pairs.agg(
      (sum(col("__x") * col("__x1")) / sum(col("__x1") * col("__x1")))
        .as("__rx"),
      (sum(col("__z") * col("__z1")) / sum(col("__z1") * col("__z1")))
        .as("__rz")))
    val filt = pairs.crossJoin(rho)
      .select(col("__t"),
        (col("__x") - col("__rx") * col("__x1")).as("__fx"),
        (col("__z") - col("__rz") * col("__z1")).as("__fz"))
      .localCheckpoint()
    val den = broadcast(filt.agg(
      sqrt(sum(col("__fx") * col("__fx")) *
        sum(col("__fz") * col("__fz"))).as("__den")))
    val lagged = filt.select(col("__t"), col("__fz"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .select((col("__t") - col("lag")).as("__t"), col("lag"),
        col("__fz").as("__fzl"))
    filt.join(lagged, Seq("__t"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__fx") * col("__fzl")).as("__num"))
      .crossJoin(den)
      .select(col("lag"), col("n_pairs"),
        when(col("__den") > 0, col("__num") / col("__den")).as("ccf"))
  }

  /**
   * Forecast-baseline tournament on a holdout tail of the daily
   * count series: mean / naive-last / drift / seasonal-naive each
   * forecast the final `horizon` days, graded by MAE, RMSE and MASE
   * (MAE over the TRAIN one-step naive MAE — the scale-free metric
   * that makes "is the fancy model worth it" answerable). Any
   * pipeline that ships a forecast should lose to none of these
   * four; this is the table that proves it. Seasonal-naive uses the
   * actual value `season` days back (rolling convention); test days
   * whose lookback falls in a calendar gap are dropped from that
   * method only (n_test says so).
   *
   * Scale shape: calendar frame, one broadcast train-stats row,
   * calendar-shift joins for naive lags, one (method × day) explode
   * of the horizon-sized test frame. Returns 4 rows: (method,
   * n_test, mae, rmse, mase).
   */
  def forecastTournament(df: DataFrame, tsCol: String,
      horizon: Int = 14, season: Int = 7): DataFrame = {
    require(horizon >= 2 && season >= 1,
      "forecastTournament: horizon >= 2, season >= 1")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val bounds = broadcast(daily.agg(
      (max(col("__t")) - horizon).as("__split")))
    val train = daily.crossJoin(bounds)
      .where(col("__t") <= col("__split")).localCheckpoint()
    val tstat = broadcast(train.agg(
      avg(col("__y")).as("__mean"),
      max(col("__t")).as("__lastT"), min(col("__t")).as("__firstT")))
    val edges = broadcast(train.crossJoin(tstat)
      .agg(max(when(col("__t") === col("__lastT"), col("__y")))
        .as("__last"),
        max(when(col("__t") === col("__firstT"), col("__y")))
          .as("__first"),
        max(col("__lastT")).as("__lastT"),
        max(col("__firstT")).as("__firstT"),
        max(col("__mean")).as("__mean")))
    val naivePairs = train.select((col("__t") + 1).as("__t"),
      col("__y").as("__y1"))
    val maeNaive = broadcast(train.join(naivePairs, Seq("__t"))
      .agg(avg(abs(col("__y") - col("__y1"))).as("__maeTr")))
    val lagS = daily.select((col("__t") + season).as("__t"),
      col("__y").as("__ys"))
    val test = daily.crossJoin(bounds)
      .where(col("__t") > col("__split"))
      .join(lagS, Seq("__t"), "left")
      .crossJoin(edges)
      .select(col("__t"), col("__y"), col("__ys"), col("__mean"),
        col("__last"), col("__first"), col("__lastT"),
        col("__firstT"))
    val drift = col("__last") + (col("__last") - col("__first")) /
      (col("__lastT") - col("__firstT")).cast("double") *
      (col("__t") - col("__lastT")).cast("double")
    val melted = test.select(col("__y"), explode(array(
      struct(lit("1_mean").as("method"), col("__mean").as("fc")),
      struct(lit("2_naive").as("method"), col("__last").as("fc")),
      struct(lit("3_drift").as("method"), drift.as("fc")),
      struct(lit("4_snaive").as("method"), col("__ys").as("fc"))))
      .as("__m"))
      .select(col("__y"), col("__m.method").as("method"),
        col("__m.fc").as("__fc"))
      .where(col("__fc").isNotNull)
    melted.groupBy("method")
      .agg(count(lit(1)).as("n_test"),
        avg(abs(col("__y") - col("__fc"))).as("mae"),
        sqrt(avg((col("__y") - col("__fc")) *
          (col("__y") - col("__fc")))).as("rmse"))
      .crossJoin(maeNaive)
      .select(col("method"), col("n_test"), col("mae"), col("rmse"),
        when(col("__maeTr") > 0, col("mae") / col("__maeTr"))
          .as("mase"))
  }

  /**
   * Kulldorff-style temporal scan over the daily count series: every
   * window of 1..maxWidth consecutive OBSERVED days is scored by the
   * Poisson log-likelihood ratio c·ln(c/μ) + (C−c)·ln((C−c)/(C−μ))
   * (zero unless c > μ), and the maximum localizes the hottest
   * burst with VARIABLE width — what fixed-h MOSUM (q607) and CUSUM
   * can't do in one pass. LLR is rounded to 1e-9 before the argmax
   * so a last-bit ln() wobble can't flip the peak between engines;
   * ties break (end day, width) ascending.
   *
   * Scale shape: calendar frame + PrefixSum cumulative counts, a
   * width explode (|days|·maxWidth rows) + ONE index equi-join, a
   * TakeOrdered(1) peak. Returns 1 row: (n_days, total, n_windows,
   * peak_llr, peak_end_t, peak_width, peak_count, n_above_6).
   */
  def temporalScan(df: DataFrame, tsCol: String,
      maxWidth: Int = 14): DataFrame = {
    require(maxWidth >= 1 && maxWidth <= 120,
      s"temporalScan: maxWidth in [1, 120], got $maxWidth")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val idx = graft.analysis.PrefixSum.exclusive(
        daily.withColumn("__one", lit(1.0)), "__t",
        Seq("__one" -> "__exi", "__y" -> "__exc"))
      .select(col("__t"), (col("__exi") + 1).as("__i"),
        (col("__exc") + col("__y")).as("__cum"))
      .localCheckpoint()
    val tot = broadcast(daily.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("__y")).as("__ctot")))
    val wide = idx
      .withColumn("__w", explode(sequence(lit(1), lit(maxWidth))))
      .where(col("__i") >= col("__w"))
      .select(col("__t"), col("__i"), col("__cum"), col("__w"),
        (col("__i") - col("__w")).as("__j"))
    val prevC = idx.select(col("__i").as("__j"),
      col("__cum").as("__cprev"))
    val scored = wide.join(prevC, Seq("__j"), "left")
      .crossJoin(tot)
      .select(col("__t"), col("__w"), col("__n"), col("__ctot"),
        (col("__cum") - coalesce(col("__cprev"), lit(0.0))).as("__c"),
        (col("__ctot") * col("__w") / col("__n")).as("__mu"))
      .select(col("__t"), col("__w"), col("__n"), col("__ctot"),
        col("__c"),
        round(when(col("__c") > col("__mu") && col("__c") < col("__ctot"),
          col("__c") * log(col("__c") / col("__mu")) +
            (col("__ctot") - col("__c")) *
            log((col("__ctot") - col("__c")) / (col("__ctot") - col("__mu"))))
          .otherwise(lit(0.0)), 9).as("__llr"))
      .localCheckpoint()
    val peak = scored
      .orderBy(col("__llr").desc, col("__t").asc, col("__w").asc)
      .limit(1)
      .select(col("__n").cast("long").as("n_days"),
        col("__ctot").as("total"), col("__llr").as("peak_llr"),
        col("__t").as("peak_end_t"), col("__w").as("peak_width"),
        col("__c").as("peak_count"))
    val agg = broadcast(scored.agg(count(lit(1)).as("n_windows"),
      coalesce(sum(when(col("__llr") >= 6.0, 1L).otherwise(0L)),
        lit(0L)).as("n_above_6")))
    peak.crossJoin(agg)
      .select(col("n_days"), col("total"), col("n_windows"),
        col("peak_llr"), col("peak_end_t"), col("peak_width"),
        col("peak_count"), col("n_above_6"))
  }

  /**
   * Theil forecast-error decomposition for the seasonal-naive
   * forecast f = y_{t−lag}: MSE splits exactly into bias share
   * UM = (f̄−ȳ)²/MSE, variance share US = (σ_f−σ_y)²/MSE and
   * covariance share UC = 2(1−r)σ_fσ_y/MSE — the "WHY is the
   * forecast wrong" companion to q616's Mincer–Zarnowitz "IS it
   * wrong": UM says recalibrate the level, US the amplitude, UC is
   * irreducible timing noise. Also reports Theil's U1. Population
   * σ's, per the original decomposition.
   *
   * Scale shape: calendar frame + one lag-shift equi-join + ONE
   * sufficient-stats reduce. Returns 1 row: (n_pairs, mse, um, us,
   * uc, theil_u1).
   */
  def forecastErrorDecomposition(df: DataFrame, tsCol: String,
      lagDays: Int = 7): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1, got $lagDays")
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val lagf = daily.select((col("__t") + lagDays).as("__t"),
      col("__y").as("__f"))
    val a = daily.join(lagf, Seq("__t"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__y")).as("__sy"), sum(col("__f")).as("__sf"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__f") * col("__f")).as("__sff"),
        sum(col("__f") * col("__y")).as("__sfy"),
        sum((col("__f") - col("__y")) * (col("__f") - col("__y")))
          .as("__sse"))
    val n = col("__n")
    val my = col("__sy") / n
    val mf = col("__sf") / n
    val vy = col("__syy") / n - my * my
    val vf = col("__sff") / n - mf * mf
    val cfy = col("__sfy") / n - mf * my
    val mse = col("__sse") / n
    val sy = sqrt(vy)
    val sf = sqrt(vf)
    val r = cfy / (sf * sy)
    a.select(n.cast("long").as("n_pairs"), mse.as("mse"),
      when(mse > 0, (mf - my) * (mf - my) / mse).as("um"),
      when(mse > 0, (sf - sy) * (sf - sy) / mse).as("us"),
      when(mse > 0 && vf > 0 && vy > 0,
        lit(2.0) * (lit(1.0) - r) * sf * sy / mse).as("uc"),
      when(sqrt(col("__syy") / n) + sqrt(col("__sff") / n) > 0,
        sqrt(mse) / (sqrt(col("__syy") / n) + sqrt(col("__sff") / n)))
        .as("theil_u1"))
  }

  /**
   * Sen's slope with the Gilbert/Kendall distribution-free CI: the
   * median of all pairwise slopes of the daily count series, with
   * confidence bounds at order-statistic ranks (M ± z·√V)/2,
   * V = n(n−1)(2n+5)/18 — the trend estimate + error bar that
   * ignores outliers and needs no residual model, completing the
   * q168 Theil–Sen point estimate with the CI practitioners actually
   * quote (Gilbert 1987). Pairwise slopes are exact ratios of
   * integers, so the rank picks are engine-deterministic.
   *
   * Scale shape: reduced×reduced upper-triangle pair join
   * (≤|calendar|², the [[sampleEntropy]] discipline), slope value
   * cells + [[PrefixSum]], three index picks. Returns 1 row:
   * (n_days, n_pairs, sen_slope, ci_lo, ci_hi).
   */
  def senSlopeCi(df: DataFrame, tsCol: String,
      z: Double = 1.959964): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val b = daily.select(col("__t").as("__s"), col("__y").as("__ys"))
    val slopes = daily.join(b, col("__s") < col("__t"))
      .select(((col("__y") - col("__ys")) /
        (col("__t") - col("__s")).cast("double")).as("__sl"))
    val cells = slopes.groupBy("__sl").agg(count(lit(1)).as("__c"))
    val pre = graft.analysis.PrefixSum.exclusive(cells, "__sl",
      Seq("__c" -> "__cb"))
    val nd = broadcast(daily.agg(count(lit(1)).cast("double")
      .as("__nd")))
    val tot = broadcast(pre.agg(sum(col("__c")).cast("double")
      .as("__m")))
    val marked = pre.crossJoin(tot).crossJoin(nd)
    val m = col("__m")
    val v = col("__nd") * (col("__nd") - 1) *
      (lit(2.0) * col("__nd") + 5) / 18.0
    val kMed = ceil(m * 0.5)
    val kLo = greatest(lit(1.0), floor((m - lit(z) * sqrt(v)) / 2))
    val kHi = least(m, ceil((m + lit(z) * sqrt(v)) / 2 + 1))
    def pick(k: Column) =
      max(when(col("__cb") <= k - 1 &&
        k - 1 < col("__cb") + col("__c"), col("__sl")))
    marked.agg(max(col("__nd")).cast("long").as("n_days"),
      max(m).cast("long").as("n_pairs"),
      pick(kMed).as("sen_slope"), pick(kLo).as("ci_lo"),
      pick(kHi).as("ci_hi"))
  }

  /**
   * Poisson rate ratio of weekday vs weekend event intensity with
   * the log-normal CI: RR = (c₁/d₁)/(c₂/d₂), ln RR ± z·√(1/c₁+1/c₂)
   * — the exposure-honest "how much busier are weekdays" readout
   * (raw count ratios ignore that there are 2.5× more weekdays).
   * Exposures are OBSERVED days of each kind; dow from epoch-day
   * arithmetic, identical on both engines.
   *
   * Scale shape: calendar frame + ONE reduce. Returns 1 row:
   * (days_wd, days_we, events_wd, events_we, rate_wd, rate_we,
   * rate_ratio, ci_lo, ci_hi).
   */
  def weekdayRateRatio(df: DataFrame, tsCol: String,
      z: Double = 1.959964): DataFrame = {
    val daily = dailyCounts(df, tsCol)
      .withColumn("__wd", pmod(col("__t") + 4, lit(7)).between(1, 5))
    val a = daily.agg(
      sum(when(col("__wd"), 1L).otherwise(0L)).as("days_wd"),
      sum(when(!col("__wd"), 1L).otherwise(0L)).as("days_we"),
      coalesce(sum(when(col("__wd"), col("__y"))), lit(0.0))
        .as("events_wd"),
      coalesce(sum(when(!col("__wd"), col("__y"))), lit(0.0))
        .as("events_we"))
    val rwd = col("events_wd") / col("days_wd")
    val rwe = col("events_we") / col("days_we")
    val se = sqrt(lit(1.0) / col("events_wd") +
      lit(1.0) / col("events_we"))
    val ok = col("days_wd") > 0 && col("days_we") > 0 &&
      col("events_wd") > 0 && col("events_we") > 0
    a.select(col("days_wd"), col("days_we"), col("events_wd"),
      col("events_we"),
      when(col("days_wd") > 0, rwd).as("rate_wd"),
      when(col("days_we") > 0, rwe).as("rate_we"),
      when(ok, rwd / rwe).as("rate_ratio"),
      when(ok, exp(log(rwd / rwe) - lit(z) * se)).as("ci_lo"),
      when(ok, exp(log(rwd / rwe) + lit(z) * se)).as("ci_hi"))
  }

  /**
   * AR(1)-adjusted effective sample size of the daily count series:
   * n_eff = n·(1−ρ̂₁)/(1+ρ̂₁) and the variance inflation factor
   * (1+ρ̂₁)/(1−ρ̂₁) — the "how many INDEPENDENT days do I actually
   * have" correction every daily-metric t-test silently needs
   * (ρ₁ = 0.5 cuts 90 days to 30). ρ̂₁ over consecutive calendar
   * pairs on demeaned counts, the q606/q635 convention.
   *
   * Scale shape: calendar frame + one calendar-shift join + two
   * 1-row reduces. Returns 1 row: (n_days, rho1, n_eff,
   * variance_inflation, se_inflation).
   */
  def effectiveSampleSize(df: DataFrame, tsCol: String): DataFrame = {
    val daily = dailyCounts(df, tsCol).localCheckpoint()
    val mm = broadcast(daily.agg(avg(col("__y")).as("__my"),
      count(lit(1)).cast("double").as("__n")))
    val dem = daily.crossJoin(mm)
      .select(col("__t"), (col("__y") - col("__my")).as("__z"),
        col("__n"))
    val prev = dem.select((col("__t") + 1).as("__t"),
      col("__z").as("__z1"))
    // a constant series demeans to all-zero lags: guard the 0/0 (ANSI
    // DIVIDE_BY_ZERO) — rho1/n_eff come back NULL instead of crashing
    val a = dem.join(prev, Seq("__t"))
      .agg(max(col("__n")).as("__n"),
        when(sum(col("__z1") * col("__z1")) =!= 0,
          sum(col("__z") * col("__z1")) / sum(col("__z1") * col("__z1")))
          .as("__rho"))
    val rho = col("__rho")
    val ok = rho > -1 && rho < 1
    a.select(col("__n").cast("long").as("n_days"), rho.as("rho1"),
      when(ok, col("__n") * (lit(1.0) - rho) / (lit(1.0) + rho))
        .as("n_eff"),
      when(ok, (lit(1.0) + rho) / (lit(1.0) - rho))
        .as("variance_inflation"),
      when(ok, sqrt((lit(1.0) + rho) / (lit(1.0) - rho)))
        .as("se_inflation"))
  }

  /**
   * Laplace trend test for the event stream as a point process: with
   * event offsets u_i from the window start over span T, under a
   * homogeneous Poisson process Σu/n is T/2 in expectation, and
   * z = (ū − T/2)/(T·√(1/12n)) reads sign-directly as "events are
   * drifting later (+) or earlier (−)". The MIL-HDBK-189 companion
   * 2·Σln(T/u) (χ² with 2n df, u = 0 offsets excluded and counted)
   * answers the same question with power against power-law NHPP
   * intensities. The two together are the reliability-growth pair.
   *
   * Scale shape: two 1-row reduces (bounds broadcast, then moment
   * sums) — map-only otherwise. Returns 1 row: (n, t_span_seconds,
   * laplace_z, milhdbk_chi2, n_zero_offset).
   */
  def laplaceTrend(df: DataFrame, tsCol: String): DataFrame = {
    val base = df.where(col(tsCol).isNotNull)
      .select(unix_micros(col(tsCol)).as("__u"))
    val bounds = broadcast(base.agg(min(col("__u")).as("__lo"),
      max(col("__u")).as("__hi")))
    val off = base.crossJoin(bounds)
      .select((col("__u") - col("__lo")).cast("double").as("__o"),
        (col("__hi") - col("__lo")).cast("double").as("__T"))
    off.agg(count(lit(1)).cast("double").as("__n"),
        max(col("__T")).as("__T"), sum(col("__o")).as("__so"),
        coalesce(sum(when(col("__o") > 0,
          log(col("__T") / col("__o")))), lit(0.0)).as("__sl"),
        sum(when(col("__o") === 0, 1L).otherwise(0L))
          .as("n_zero_offset"))
      .select(col("__n").cast("long").as("n"),
        (col("__T") / 1000000.0).as("t_span_seconds"),
        when(col("__T") > 0,
          (col("__so") / col("__n") - col("__T") / 2) /
            (col("__T") * sqrt(lit(1.0) / (lit(12.0) * col("__n")))))
          .as("laplace_z"),
        (lit(2.0) * col("__sl")).as("milhdbk_chi2"),
        col("n_zero_offset"))
  }
}
