package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Financial-style risk diagnostics over per-key daily series: drawdown
 * profiles, risk-adjusted return panels (Sharpe/Sortino), and VaR
 * backtesting (Kupiec proportion-of-failures + Christoffersen
 * independence). The reference's analytics surface stops at
 * distribution/drift statistics (raise_/analytics/analysis.py); these
 * extend the same one-scan-then-tiny-frame discipline to the
 * equity-curve diagnostics a metrics pipeline needs.
 *
 * Scale design: ONE map-side-combined corpus groupBy (key, day) is the
 * only full-data shuffle; every window function below it runs over
 * per-key frames bounded by the calendar (|days| rows per key), so the
 * post-aggregation stages cost the same at 100 TB as at 100 MB.
 *
 * Cross-engine determinism: daily sums are rounded to 6 decimals BEFORE
 * any comparison (peak flags, return signs, VaR violations) — float
 * summation order differs between engines, and an unrounded `v >= runmax`
 * on raw sums could flip a flag on a last-bit tie.
 */
object Risk {

  private def dailyByKey(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull && col(tsCol).isNotNull &&
        col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"), to_date(col(tsCol)).as("__d"))
      .agg(round(sum(col(valueCol)), 6).as("__v"))

  /**
   * Drawdown profile of each key's daily-total series treated as a
   * level curve: running-peak drawdown dd_t = 1 − v_t/runmax_t, the
   * maximum drawdown, the longest underwater spell (consecutive days
   * strictly below the running peak), and the underwater fraction.
   * Returns one row per key: (key, n_days, peak_value, max_drawdown,
   * longest_underwater, frac_underwater).
   */
  def drawdown(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = dailyByKey(df, keyCol, tsCol, valueCol)
    val wRun = Window.partitionBy("__g").orderBy("__d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = daily
      .withColumn("__rm", max(col("__v")).over(wRun))
      .withColumn("__dd",
        when(col("__rm") > 0, lit(1.0) - col("__v") / col("__rm"))
          .otherwise(lit(0.0)))
      .withColumn("__pk", when(col("__v") >= col("__rm"), 1L).otherwise(0L))
      // gaps-and-islands: the running peak count names the underwater
      // island each non-peak day belongs to
      .withColumn("__isl", sum(col("__pk")).over(wRun))
    val runs = flagged.groupBy("__g", "__isl")
      .agg(sum(lit(1L) - col("__pk")).as("__uw"))
      .groupBy("__g").agg(max(col("__uw")).as("longest_underwater"))
    flagged.groupBy("__g")
      .agg(count(lit(1)).as("n_days"), max(col("__v")).as("peak_value"),
        max(col("__dd")).as("max_drawdown"),
        avg(lit(1L) - col("__pk")).as("frac_underwater"))
      .join(runs, Seq("__g"))
      .withColumnRenamed("__g", keyCol)
  }

  /**
   * Risk-adjusted daily-return panel per key: simple returns
   * r_t = v_t/v_{t−1} − 1 on the rounded daily totals (previous day
   * must be > 0), then Sharpe = mean/sd, Sortino = mean/downside
   * deviation (root mean squared NEGATIVE return over all n — the
   * full-sample convention, so a loss-free series has Sortino NULL),
   * win rate, and the best/worst day. One row per key.
   */
  def riskAdjusted(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val rets = dailyReturns(df, keyCol, tsCol, valueCol)
    rets.groupBy(col("__g").as(keyCol))
      .agg(count(lit(1)).as("n_ret"), avg(col("__r")).as("mean_ret"),
        stddev_samp(col("__r")).as("sd_ret"),
        sqrt(avg(when(col("__r") < 0, col("__r") * col("__r"))
          .otherwise(0.0))).as("downside_dev"),
        avg(when(col("__r") > 0, 1.0).otherwise(0.0)).as("win_rate"),
        max(col("__r")).as("best_day"), min(col("__r")).as("worst_day"))
      .withColumn("sharpe",
        when(col("sd_ret") > 0, col("mean_ret") / col("sd_ret")))
      .withColumn("sortino",
        when(col("downside_dev") > 0, col("mean_ret") / col("downside_dev")))
  }

  /** Daily simple returns per key, rounded to 6 decimals (comparison
    * substrate for [[riskAdjusted]] and [[varBacktest]]). */
  private def dailyReturns(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = dailyByKey(df, keyCol, tsCol, valueCol)
    val wLag = Window.partitionBy("__g").orderBy("__d")
    daily
      .withColumn("__pv", lag(col("__v"), 1).over(wLag))
      .where(col("__pv") > 0)
      .withColumn("__r", round(col("__v") / col("__pv") - 1.0, 6))
      .select(col("__g"), col("__d"), col("__r"))
  }

  /**
   * Market-model (CAPM-style) decomposition of each key's daily
   * returns against the pooled "market" return: β = cov(r_k, r_m)/
   * var(r_m), α = r̄_k − β·r̄_m, and R² — which series just ride the
   * aggregate and which move on their own. Same rounded-daily-sum
   * return substrate as [[riskAdjusted]]; the market series sums ALL
   * keys' values per day. One row per key: (key, n_days, beta, alpha,
   * r2).
   *
   * Scale shape: one corpus groupBy (key, day) + one groupBy (day)
   * for the market, a day-keyed join, calendar-bounded moments.
   */
  def marketBeta(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyByKey(df, keyCol, tsCol, valueCol)
      .localCheckpoint() // per-key side AND the market roll-up
    val market = daily.groupBy("__d")
      .agg(round(sum(col("__v")), 6).as("__mv"))
    val wK = Window.partitionBy("__g").orderBy("__d")
    // the market's previous day comes from a calendar-adjacency
    // self-join, NOT an unpartitioned lag window (a constant-partition
    // window folds to an empty partitionSpec and fails the scale lint)
    val mRet = market.as("m1")
      .join(market.as("m2"),
        col("m1.__d") === date_add(col("m2.__d"), 1))
      .where(col("m2.__mv") > 0)
      .select(col("m1.__d").as("__d"),
        round(col("m1.__mv") / col("m2.__mv") - 1.0, 6).as("__rm"))
    val kRet = daily
      .withColumn("__pv", lag(col("__v"), 1).over(wK))
      .where(col("__pv") > 0)
      .select(col("__g"), col("__d"),
        round(col("__v") / col("__pv") - 1.0, 6).as("__rk"))
    kRet.join(mRet, Seq("__d"))
      .groupBy(col("__g").as(keyCol))
      .agg(count(lit(1)).as("n_days"),
        avg(col("__rk")).as("__mk"), avg(col("__rm")).as("__mm"),
        covar_samp(col("__rk"), col("__rm")).as("__cov"),
        var_samp(col("__rm")).as("__vm"),
        var_samp(col("__rk")).as("__vk"))
      .withColumn("beta",
        when(col("__vm") > 0, col("__cov") / col("__vm")))
      .withColumn("alpha", col("__mk") - col("beta") * col("__mm"))
      .withColumn("r2",
        when(col("__vm") > 0 && col("__vk") > 0,
          col("__cov") * col("__cov") / (col("__vm") * col("__vk"))))
      .select(col(keyCol), col("n_days"), col("beta"), col("alpha"),
        col("r2"))
  }

  /**
   * In-sample VaR backtest per key at tail probability `p` (default
   * 0.05): VaR is the ⌈p·n⌉-th smallest daily return (an exact order
   * statistic — identical rule in any engine, no interpolation), a
   * violation is a day with r < VaR, and the panel reports Kupiec's
   * proportion-of-failures LR plus Christoffersen's independence LR
   * over the violation indicator's Markov transitions. Zero-count LR
   * terms contribute 0 (the x·ln(x/n) → 0 limit), so degenerate series
   * stay finite. One row per key: (key, n_ret, var_p, n_viol,
   * viol_rate, lr_pof, lr_ind).
   */
  def varBacktest(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, p: Double = 0.05): DataFrame = {
    require(p > 0 && p < 1, s"varBacktest: p must be in (0,1), got $p")
    val rets = dailyReturns(df, keyCol, tsCol, valueCol)
    val wOrd = Window.partitionBy("__g").orderBy("__r")
    val wN = Window.partitionBy("__g")
    // k-th order statistic: row_number ties pick an arbitrary ROW but
    // the VALUE at rank k is the k-th smallest either way
    val withVar = rets
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wN))
      .withColumn("__k", ceil(lit(p) * col("__n")).cast("long"))
      .withColumn("__var",
        max(when(col("__rn") === col("__k"), col("__r"))).over(wN))
      .withColumn("__i", when(col("__r") < col("__var"), 1L).otherwise(0L))
    val wDay = Window.partitionBy("__g").orderBy("__d")
    val trans = withVar
      .withColumn("__pi", lag(col("__i"), 1).over(wDay))
    def safeLog(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      when(num > 0 && den > 0, num * log(num / den)).otherwise(0.0)
    val agg = trans.groupBy(col("__g").as(keyCol))
      .agg(count(lit(1)).as("n_ret"), max(col("__var")).as("var_p"),
        sum(col("__i")).as("n_viol"),
        sum(when(col("__pi") === 0 && col("__i") === 0, 1L)
          .otherwise(0L)).as("__n00"),
        sum(when(col("__pi") === 0 && col("__i") === 1, 1L)
          .otherwise(0L)).as("__n01"),
        sum(when(col("__pi") === 1 && col("__i") === 0, 1L)
          .otherwise(0L)).as("__n10"),
        sum(when(col("__pi") === 1 && col("__i") === 1, 1L)
          .otherwise(0L)).as("__n11"))
    val x = col("n_viol").cast("double")
    val n = col("n_ret").cast("double")
    val n00 = col("__n00").cast("double"); val n01 = col("__n01").cast("double")
    val n10 = col("__n10").cast("double"); val n11 = col("__n11").cast("double")
    val nt = n00 + n01 + n10 + n11
    agg
      .withColumn("viol_rate", x / n)
      // Kupiec POF: −2[ (n−x)ln(1−p) + x·ln p − (n−x)ln(1−x/n) − x·ln(x/n) ]
      .withColumn("lr_pof",
        lit(-2.0) * ((n - x) * math.log(1 - p) + x * math.log(p)
          - safeLog(n - x, n) - safeLog(x, n)))
      // Christoffersen: LR of the 1st-order Markov fit vs the pooled rate
      .withColumn("lr_ind",
        lit(2.0) * (safeLog(n01, n00 + n01) + safeLog(n00, n00 + n01)
          + safeLog(n11, n10 + n11) + safeLog(n10, n10 + n11)
          - safeLog(n01 + n11, nt) - safeLog(n00 + n10, nt)))
      .drop("__n00", "__n01", "__n10", "__n11")
  }

  /**
   * Cornish–Fisher modified VaR per key — the moment-based complement
   * of [[varBacktest]]'s historical quantile: expand the Gaussian
   * z-quantile by the series' own skew S and excess kurtosis K,
   * w = z + (z²−1)S/6 + (z³−3z)K/24 − (2z³−5z)S²/36, and report
   * VaR_p = −(μ + σ·w) at 95% and 99% next to the plain Gaussian
   * VaR — fat-tailed/asymmetric series separate the two. Same
   * rounded-daily-sum return substrate as [[riskAdjusted]].
   *
   * Scale shape: the corpus collapses to per-key daily sums, a
   * key-partitioned lag, then ONE raw-moment aggregate per key (Σr^1..4
   * — central moments from raw sums, no second pass). One row per key.
   */
  def cornishFisherVar(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val rets = dailyReturns(df, keyCol, tsCol, valueCol)
    val m = rets.groupBy(col("__g").as(keyCol))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__r")).as("__s1"),
        sum(col("__r") * col("__r")).as("__s2"),
        sum(col("__r") * col("__r") * col("__r")).as("__s3"),
        sum(col("__r") * col("__r") * col("__r") * col("__r")).as("__s4"))
      .where(col("__n") >= 4)
    val mu = col("__s1") / col("__n")
    val m2 = col("__s2") / col("__n") - mu * mu
    val m3 = col("__s3") / col("__n") -
      lit(3.0) * mu * col("__s2") / col("__n") + lit(2.0) * mu * mu * mu
    val m4 = col("__s4") / col("__n") -
      lit(4.0) * mu * col("__s3") / col("__n") +
      lit(6.0) * mu * mu * col("__s2") / col("__n") -
      lit(3.0) * mu * mu * mu * mu
    val sd = when(m2 > 0, sqrt(m2))
    val sk = when(m2 > 0, m3 / pow(m2, lit(1.5)))
    val ku = when(m2 > 0, m4 / (m2 * m2) - 3)
    def w(z: Double) = lit(z) + (lit(z) * lit(z) - 1) * sk / 6 +
      (lit(z) * lit(z) * lit(z) - lit(3.0) * lit(z)) * ku / 24 -
      (lit(2.0) * lit(z) * lit(z) * lit(z) - lit(5.0) * lit(z)) *
        sk * sk / 36
    val z95 = -1.6448536269514722
    val z99 = -2.3263478740408408
    m.select(col(keyCol), col("__n").cast("long").as("n_ret"),
      mu.as("mean_ret"), sd.as("sd_ret"), sk.as("skew"),
      ku.as("kurt_excess"),
      (-(mu + sd * lit(z95))).as("var95_gauss"),
      (-(mu + sd * w(z95))).as("var95_cf"),
      (-(mu + sd * lit(z99))).as("var99_gauss"),
      (-(mu + sd * w(z99))).as("var99_cf"))
  }
}
