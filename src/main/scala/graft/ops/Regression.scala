package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Closed-form linear models over DataFrames — the missing "fit a
 * small interpretable model on a huge frame" piece between the
 * bivariate estimators (theilSen, retentionDecay, rddEstimate) and
 * out-of-scope iterative training (reference inference contract,
 * raise_/transforms/inference.py — model EXECUTION is pluggable
 * there; this is model FITTING for the handful-of-features case).
 *
 * Scale design: one aggregation pass accumulates the normal-equation
 * sufficient statistics (X'X upper triangle + X'y + moments of y, a
 * (F+1)(F+2)/2-term single scan with map-side partial aggregation);
 * the F×F solve happens on the driver via Gaussian elimination with
 * partial pivoting (F is tens at most — the cost is nanoseconds; the
 * DATA never leaves the executors unaggregated). Scoring/residuals
 * are a map-only projection against the broadcast coefficient row.
 */
object Regression {

  /**
   * Ordinary (or ridge, lambda > 0) least squares of `targetCol` on
   * `features` with intercept: one row per coefficient
   * (term, coef) — "(intercept)" first, features in call order —
   * plus the fit diagnostics repeated on every row (n, r2, mse).
   * Rows with a NULL target or any NULL feature are dropped (the
   * standard complete-case contract). Ridge shrinks the feature
   * block only, never the intercept.
   */
  def linearRegression(df: DataFrame, features: Seq[String],
      targetCol: String, lambda: Double = 0.0): DataFrame = {
    require(features.nonEmpty, "linearRegression: no features")
    require(features.size <= 64, "linearRegression: at most 64 features")
    require(lambda >= 0, "linearRegression: lambda >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val y = col(targetCol).cast("double")
    val xs = features.map(f => col(f).cast("double"))
    val complete = df.where(
      (y.isNotNull +: xs.map(_.isNotNull)).reduce(_ && _))
    // design vector with the intercept's constant-1 leading term
    val terms = lit(1.0) +: xs
    val p = terms.size
    val aggs =
      (for (i <- 0 until p; j <- i until p)
        yield sum(terms(i) * terms(j)).as(s"__xx_${i}_$j")) ++
        (0 until p).map(i => sum(terms(i) * y).as(s"__xy_$i")) ++
        Seq(sum(y * y).as("__yy"), count(lit(1)).as("__n"))
    val row = complete.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    require(n > p, s"linearRegression: $n rows for $p terms")
    // dense symmetric system (driver-side: p ≤ 65)
    val a = Array.ofDim[Double](p, p)
    for (i <- 0 until p; j <- i until p) {
      val v = row.getAs[Double](s"__xx_${i}_$j")
      a(i)(j) = v; a(j)(i) = v
    }
    for (i <- 1 until p) a(i)(i) += lambda // ridge: skip the intercept
    val b = Array.tabulate(p)(i => row.getAs[Double](s"__xy_$i"))
    val coef = solve(a, b)
    // diagnostics from the same sufficient stats: RSS = y'y − 2β'X'y
    // + β'X'Xβ, computed against the UNpenalized moments
    val xy = Array.tabulate(p)(i => row.getAs[Double](s"__xy_$i"))
    val yy = row.getAs[Double]("__yy")
    var rss = yy
    for (i <- 0 until p) {
      rss -= 2.0 * coef(i) * xy(i)
      for (j <- 0 until p) {
        val xx = row.getAs[Double](s"__xx_${math.min(i, j)}_${math.max(i, j)}")
        rss += coef(i) * coef(j) * xx
      }
    }
    val sy = row.getAs[Double]("__xy_0") // Σ 1·y
    val tss = yy - sy * sy / n
    val r2 = if (tss > 0) 1.0 - rss / tss else Double.NaN
    val names = "(intercept)" +: features
    names.zipWithIndex.map { case (t, i) =>
      (t, coef(i), n, r2, rss / n)
    }.toDF("term", "coef", "n", "r2", "mse")
  }

  /**
   * Map-only scoring against a fitted coefficient frame: adds
   * `outCol` = β₀ + Σ βᵢ·xᵢ. The coefficient frame is collected
   * (≤65 rows) and inlined as literals — scoring is pure codegen
   * arithmetic, no join at all.
   */
  def predict(df: DataFrame, coefs: DataFrame, features: Seq[String],
      outCol: String = "prediction"): DataFrame = {
    val m = coefs.select("term", "coef").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expr0 = features.foldLeft(lit(m("(intercept)"))) { (acc, f) =>
      acc + lit(m(f)) * col(f).cast("double")
    }
    df.withColumn(outCol, expr0)
  }

  /**
   * Per-group bivariate OLS — slope/intercept/r²/n for every key in
   * one grouped aggregation (closed form from the five moments; no
   * driver involvement at all, unlike [[linearRegression]]'s solve).
   * The fit-a-trend-per-entity primitive: per-user spend trajectories,
   * per-series drift, per-segment elasticity. Groups with fewer than
   * 2 distinct x values report NULL slope/intercept/r².
   */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedOls: no group columns")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val m = df.where(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
        sum(y * y).as("__syy"))
    val n = col("n").cast("double")
    val vx = col("__sxx") - col("__sx") * col("__sx") / n
    val vy = col("__syy") - col("__sy") * col("__sy") / n
    val cxy = col("__sxy") - col("__sx") * col("__sy") / n
    val slope = when(vx > 0, cxy / vx)
    m.select(groupCols.map(col) ++ Seq(col("n"),
      slope.as("slope"),
      when(vx > 0, (col("__sy") - cxy / vx * col("__sx")) / n)
        .as("intercept"),
      when(vx > 0 && vy > 0, cxy * cxy / (vx * vy)).as("r2")): _*)
  }

  /**
   * Logistic regression of a binary `targetCol` on `features` with
   * intercept, by a FIXED number of Newton–Raphson (IRLS) steps from
   * β = 0 — the deterministic distributed GLM: every iteration is ONE
   * aggregation scan collecting the gradient Σ xᵢ(yᵢ − μᵢ) and Hessian
   * Σ μᵢ(1−μᵢ)xᵢxᵢᵀ as sufficient statistics (p(p+3)/2 + 2 sums), the
   * (p+1)×(p+1) solve is driver-side exactly like [[linearRegression]].
   * A fixed iteration count (not a convergence test) keeps the
   * computation a pure function of the data — replayable by any engine
   * — and Newton's quadratic convergence makes 4 steps plenty for
   * well-scaled features. Returns one row per coefficient
   * (term, coef) plus diagnostics repeated per row
   * (n, log_loss, iterations); log-loss is the mean negative
   * log-likelihood at the FINAL β (one extra scan).
   *
   * 100 TB stance: iterations × one map-side-combined aggregation over
   * the corpus; model state is p+1 doubles broadcast as literals into
   * each scan. No per-row UDF — μ is column algebra, codegen'd.
   */
  def logisticRegression(df: DataFrame, features: Seq[String],
      targetCol: Column, iterations: Int = 4): DataFrame = {
    val y = when(targetCol, 1.0).otherwise(0.0)
    newtonGlm(df, features, y, targetCol.isNotNull, iterations,
      mu = z => lit(1.0) / (lit(1.0) + exp(-z)),
      w = (z, mu) => mu * (lit(1.0) - mu),
      // mean negative log-likelihood in the safe log1p(exp) form:
      // −[y·z − log(1+eᶻ)]
      loss = z => log1p(exp(-abs(z))) + when(z > 0, (lit(1.0) - y) * z)
        .otherwise(-y * z),
      what = "logisticRegression")
  }

  /**
   * Poisson (log-link) regression of a count `targetCol` on `features`
   * with intercept — the GLM for event-rate modeling (orders per
   * customer, events per session), by the same FIXED-Newton contract
   * as [[logisticRegression]]: μ = exp(β'x), per iteration one
   * sufficient-stats scan (gradient Σx(y−μ), Hessian Σμxx'), driver
   * p×p solve, β replayable by any engine. Scale features to O(1) so
   * exp stays bounded. Returns (term, coef) rows with diagnostics
   * (n, log_loss, iterations); log_loss is the mean of μ − y·z (the
   * NLL up to the data-only ln y! constant).
   */
  def poissonRegression(df: DataFrame, features: Seq[String],
      targetCol: Column, iterations: Int = 4): DataFrame = {
    val y = targetCol.cast("double")
    newtonGlm(df, features, y, y.isNotNull && y >= 0, iterations,
      mu = z => exp(z),
      w = (z, mu) => mu,
      loss = z => exp(z) - y * z,
      what = "poissonRegression")
  }

  /**
   * Two-component 1-D Gaussian mixture by a FIXED number of EM steps —
   * the "is this metric bimodal, and where are the modes?" model
   * (latency distributions, mixed user populations, contaminated
   * metrics). Everything is deterministic: initialization is
   * μ = min + (max−min)/4 and min + 3(max−min)/4 with the pooled
   * sample σ and π = ½ (pure functions of the data, no RNG, no
   * kmeans++), and each EM step is ONE aggregation scan — the E-step
   * responsibilities are column algebra with the current parameters
   * inlined as literals, the M-step is six sums. Variances are floored
   * at 1e−12 against component collapse. Returns 2 rows
   * (component, weight, mean, std) with the final mean log-likelihood
   * and n repeated on both.
   *
   * The GLM-family scan discipline ([[logisticRegression]]): state is
   * 6 doubles on the driver; the corpus is scanned iterations+2 times
   * (init moments, EM steps, final log-likelihood), each map-side
   * combined, no join, no UDF.
   */
  def gaussianMixture1D(df: DataFrame, valueCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "gaussianMixture1D: iterations >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(valueCol).cast("double")
    val complete = df.where(x.isNotNull)
    val init = complete.agg(min(x).as("__mn"), max(x).as("__mx"),
      stddev_samp(x).as("__sd"), count(lit(1)).as("__n")).head()
    val n = init.getAs[Long]("__n")
    require(n >= 4, s"gaussianMixture1D: $n rows")
    val mn = init.getAs[Double]("__mn"); val mx = init.getAs[Double]("__mx")
    var mu1 = mn + (mx - mn) / 4; var mu2 = mn + 3 * (mx - mn) / 4
    var v1 = math.max(math.pow(init.getAs[Double]("__sd"), 2), 1e-12)
    var v2 = v1
    var p1 = 0.5
    def dens(m: Double, v: Double, pi: Double) =
      lit(pi / math.sqrt(v)) * exp((x - lit(m)) * (x - lit(m)) /
        lit(-2.0 * v))
    for (_ <- 1 to iterations) {
      val a = dens(mu1, v1, p1)
      val b = dens(mu2, v2, 1 - p1)
      val r = a / (a + b)
      val row = complete.agg(sum(r).as("__r1"), sum(r * x).as("__rx1"),
        sum(r * x * x).as("__rxx1"), sum((lit(1.0) - r) * x).as("__rx2"),
        sum((lit(1.0) - r) * x * x).as("__rxx2")).head()
      val r1 = row.getAs[Double]("__r1"); val r2 = n - r1
      mu1 = row.getAs[Double]("__rx1") / r1
      mu2 = row.getAs[Double]("__rx2") / r2
      v1 = math.max(row.getAs[Double]("__rxx1") / r1 - mu1 * mu1, 1e-12)
      v2 = math.max(row.getAs[Double]("__rxx2") / r2 - mu2 * mu2, 1e-12)
      p1 = r1 / n
    }
    val c = 1.0 / math.sqrt(2 * math.Pi)
    val ll = complete.agg(avg(log(
      dens(mu1, v1, p1 * c) + dens(mu2, v2, (1 - p1) * c))).as("__ll"))
      .head().getAs[Double]("__ll")
    Seq((1, p1, mu1, math.sqrt(v1), n, ll, iterations),
      (2, 1 - p1, mu2, math.sqrt(v2), n, ll, iterations))
      .toDF("component", "weight", "mean", "std", "n", "log_lik",
        "iterations")
  }

  /**
   * Huber robust regression by FIXED IRLS rounds: iteration 0 is
   * plain OLS; each later round reweights rows by
   * w = min(1, δ/|residual|) (the Huber ψ — quadratic near zero,
   * linear in the tails) and re-solves weighted least squares — the
   * multi-feature robust fit that [[graft.ops.TimeSeries.theilSen]]'s
   * bivariate pairwise-slope construction can't reach. `delta` is the
   * ABSOLUTE residual half-width of the quadratic zone (caller-scaled:
   * pick ~1.345·σ of a clean fit; a data-driven scale would make the
   * weights order-dependent and break replay). Returns the
   * [[linearRegression]] row shape (term, coef, n, iterations) plus
   * mean ABSOLUTE residual at the final β (the robust loss readout).
   *
   * Per iteration ONE weighted sufficient-stats scan with β inlined as
   * literals + a driver p×p solve — the [[logisticRegression]] scan
   * discipline.
   */
  def huberRegression(df: DataFrame, features: Seq[String],
      targetCol: String, delta: Double, iterations: Int = 3)
      : DataFrame = {
    require(features.nonEmpty, "huberRegression: no features")
    require(features.size <= 32, "huberRegression: at most 32 features")
    require(delta > 0, "huberRegression: delta > 0")
    require(iterations >= 1, "huberRegression: iterations >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val y = col(targetCol).cast("double")
    val xs = features.map(f => col(f).cast("double"))
    val complete = df.where(
      (y.isNotNull +: xs.map(_.isNotNull)).reduce(_ && _))
    val terms = lit(1.0) +: xs
    val p = terms.size
    var beta: Array[Double] = null
    var n = 0L
    for (it <- 0 until iterations) {
      val w: Column =
        if (it == 0) lit(1.0)
        else {
          val r = y - terms.zip(beta).map { case (t, b) => t * lit(b) }
            .reduce(_ + _)
          least(lit(1.0), lit(delta) / greatest(abs(r), lit(1e-300)))
        }
      val aggs =
        (for (i <- 0 until p; j <- i until p)
          yield sum(w * terms(i) * terms(j)).as(s"__xx_${i}_$j")) ++
          (0 until p).map(i => sum(w * terms(i) * y).as(s"__xy_$i")) ++
          Seq(count(lit(1)).as("__n"))
      val row = complete.agg(aggs.head, aggs.tail: _*).head()
      n = row.getAs[Long]("__n")
      require(n > p, s"huberRegression: $n rows for $p terms")
      val a = Array.ofDim[Double](p, p)
      for (i <- 0 until p; j <- i until p) {
        val v = row.getAs[Double](s"__xx_${i}_$j")
        a(i)(j) = v; a(j)(i) = v
      }
      val b = Array.tabulate(p)(i => row.getAs[Double](s"__xy_$i"))
      beta = solve(a, b)
    }
    val rF = y - terms.zip(beta).map { case (t, b) => t * lit(b) }
      .reduce(_ + _)
    val mar = complete.agg(avg(abs(rF)).as("__m")).head()
      .getAs[Double]("__m")
    val names = "(intercept)" +: features
    names.zipWithIndex.map { case (t, i) =>
      (t, beta(i), n, mar, iterations)
    }.toDF("term", "coef", "n", "mean_abs_resid", "iterations")
  }

  /** Shared fixed-iteration Newton/IRLS GLM core: per iteration ONE
    * aggregation scan (p(p+3)/2 + 2 sums) with the current β inlined
    * as literals, driver-side (p+1)×(p+1) solve; one final scan for
    * the mean loss at the fitted β. */
  private def newtonGlm(df: DataFrame, features: Seq[String], y: Column,
      keep: Column, iterations: Int, mu: Column => Column,
      w: (Column, Column) => Column, loss: Column => Column,
      what: String): DataFrame = {
    require(features.nonEmpty, s"$what: no features")
    require(features.size <= 32, s"$what: at most 32 features")
    require(iterations >= 1, s"$what: iterations >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val xs = features.map(f => col(f).cast("double"))
    val complete = df.where((keep +: xs.map(_.isNotNull)).reduce(_ && _))
    val terms = lit(1.0) +: xs
    val p = terms.size
    var beta = Array.fill(p)(0.0)
    var n = 0L
    for (_ <- 1 to iterations) {
      // z = β'x with the current coefficients inlined as literals
      val z = terms.zip(beta).map { case (t, b) => t * lit(b) }
        .reduce(_ + _)
      val m = mu(z)
      val ww = w(z, m)
      val aggs =
        (for (i <- 0 until p; j <- i until p)
          yield sum(ww * terms(i) * terms(j)).as(s"__h_${i}_$j")) ++
          (0 until p).map(i => sum(terms(i) * (y - m)).as(s"__g_$i")) ++
          Seq(count(lit(1)).as("__n"))
      val row = complete.agg(aggs.head, aggs.tail: _*).head()
      n = row.getAs[Long]("__n")
      require(n > p, s"$what: $n rows for $p terms")
      val h = Array.ofDim[Double](p, p)
      for (i <- 0 until p; j <- i until p) {
        val v = row.getAs[Double](s"__h_${i}_$j")
        h(i)(j) = v; h(j)(i) = v
      }
      val g = Array.tabulate(p)(i => row.getAs[Double](s"__g_$i"))
      val step = solve(h, g)
      beta = Array.tabulate(p)(i => beta(i) + step(i))
    }
    val zF = terms.zip(beta).map { case (t, b) => t * lit(b) }
      .reduce(_ + _)
    val nll = complete.agg(avg(loss(zF)).as("__ll"))
      .head().getAs[Double]("__ll")
    val names = "(intercept)" +: features
    names.zipWithIndex.map { case (t, i) =>
      (t, beta(i), n, nll, iterations)
    }.toDF("term", "coef", "n", "log_loss", "iterations")
  }

  /**
   * Leave-one-group-out influence of each group on a corpus-level
   * bivariate OLS fit — the data-valuation question "which segment is
   * dragging the trend?": for every key of `groupCol`, refit
   * y ~ x on ALL data minus that group's rows, purely by subtracting
   * the group's sufficient statistics from the global ones (closed
   * form, no per-group rescan, no driver solve). Returns one row per
   * group: (group, n, slope_full, slope_loo, delta_slope,
   * delta_intercept) — delta = full − without-group, so a positive
   * delta_slope means the group pulls the slope UP.
   *
   * Scale shape: ONE grouped aggregation for the per-group moments,
   * the global moments as their 1-row rollup crossJoined back
   * (broadcast) — two scans of nothing beyond the grouped frame.
   */
  def leaveOneGroupOut(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val per = df.where(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("__sx"),
        sum(y).as("__sy"), sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
      .localCheckpoint() // feeds the global rollup AND the per-group delta
    val glob = per.agg(sum(col("__n")).as("__gn"),
      sum(col("__sx")).as("__gsx"), sum(col("__sy")).as("__gsy"),
      sum(col("__sxx")).as("__gsxx"), sum(col("__sxy")).as("__gsxy"))
    def fit(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column) = {
      val vx = sxx - sx * sx / n
      val cxy = sxy - sx * sy / n
      val slope = when(vx > 0, cxy / vx)
      (slope, when(vx > 0, (sy - cxy / vx * sx) / n))
    }
    val (slF, icF) = fit(col("__gn"), col("__gsx"), col("__gsy"),
      col("__gsxx"), col("__gsxy"))
    val (slL, icL) = fit(col("__gn") - col("__n"),
      col("__gsx") - col("__sx"), col("__gsy") - col("__sy"),
      col("__gsxx") - col("__sxx"), col("__gsxy") - col("__sxy"))
    per.crossJoin(broadcast(glob))
      .select(col("group"), col("__n").cast("long").as("n"),
        slF.as("slope_full"), slL.as("slope_loo"),
        (slF - slL).as("delta_slope"), (icF - icL).as("delta_intercept"))
  }

  /**
   * K-fold cross-validated bivariate OLS with deterministic hash
   * folds: rows land in fold = PortableHash(hashCols) mod k, each
   * fold's model is fit on the OTHER k−1 folds purely by subtracting
   * the fold's sufficient statistics from the global ones (the
   * [[leaveOneGroupOut]] trick — no per-fold refit scan), and every
   * row is scored by the model that did NOT see it. Returns one row
   * per fold: (fold, n_train, n_test, slope, intercept, mse_oof) —
   * the honest generalization readout for the trend-fit family
   * (aggregate mse_oof over folds for the usual CV score).
   *
   * Scale shape: one grouped aggregation to the k-row fold-moments
   * frame (localCheckpointed — global rollup + coefficient frame),
   * coefficients via column algebra on that tiny frame, then ONE
   * broadcast join of the ≤k-row coefficient frame back onto the
   * corpus for the out-of-fold residuals — two corpus scans total,
   * independent of k.
   */
  def crossValidatedOls(df: DataFrame, hashCols: Seq[Column],
      xCol: String, yCol: String, folds: Int = 5): DataFrame = {
    require(folds >= 2, "crossValidatedOls: folds >= 2")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val withFold = df.where(x.isNotNull && y.isNotNull)
      .withColumn("__fold",
        pmod(graft.functions.PortableHash.bucket(hashCols), lit(folds)))
    val per = withFold.groupBy("__fold")
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("__sx"),
        sum(y).as("__sy"), sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
      .localCheckpoint() // global rollup + per-fold coefficient frame
    val glob = per.agg(sum(col("__n")).as("__gn"),
      sum(col("__sx")).as("__gsx"), sum(col("__sy")).as("__gsy"),
      sum(col("__sxx")).as("__gsxx"), sum(col("__sxy")).as("__gsxy"))
    val tn = col("__gn") - col("__n")
    val tsx = col("__gsx") - col("__sx")
    val tsy = col("__gsy") - col("__sy")
    val vx = (col("__gsxx") - col("__sxx")) - tsx * tsx / tn
    val cxy = (col("__gsxy") - col("__sxy")) - tsx * tsy / tn
    val coefs = per.crossJoin(broadcast(glob))
      .select(col("__fold"), col("__n").cast("long").as("n_test"),
        (tn.cast("long")).as("n_train"),
        when(vx > 0, cxy / vx).as("slope"),
        when(vx > 0, (tsy - cxy / vx * tsx) / tn).as("intercept"))
    withFold.join(broadcast(coefs), Seq("__fold"))
      .groupBy(col("__fold").as("fold"))
      .agg(first(col("n_train")).as("n_train"),
        first(col("n_test")).as("n_test"),
        first(col("slope")).as("slope"),
        first(col("intercept")).as("intercept"),
        avg(pow(y - (col("intercept") + col("slope") * x), 2.0))
          .as("mse_oof"))
  }

  /** Gaussian elimination with partial pivoting (driver-side, tiny). */
  /**
   * Cameron–Trivedi overdispersion test after a Poisson fit: is
   * Var(y|x) > E(y|x), which breaks every Poisson standard error
   * and says "use negative binomial"? Fit μ = exp(α+βx) by
   * [[poissonRegression]]'s fixed-Newton contract, then regress
   * z = ((y−μ)² − y)/μ on μ WITHOUT intercept: the slope α̂ estimates
   * the NB2 dispersion and t = α̂/se(α̂) ~ N(0,1) under
   * equidispersion (one-sided: large positive t ⇒ overdispersed).
   * Returns ONE row: (n, mu_mean, alpha, t_stat).
   *
   * Scale shape: the Newton scans + ONE auxiliary moments scan with
   * the fitted (α, β) inlined as literals; the no-intercept fit and
   * its t are 1-row algebra. Single-feature by design so the oracle
   * replays everything (the q287 discipline).
   */
  def overdispersionTest(df: DataFrame, xCol: String, targetCol: Column,
      iterations: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fit = poissonRegression(df, Seq(xCol), targetCol, iterations)
      .collect().map(r => r.getAs[String]("term") ->
        r.getAs[Double]("coef")).toMap
    val a = fit("(intercept)"); val b = fit(xCol)
    val y = targetCol.cast("double")
    val x = col(xCol).cast("double")
    val mu = exp(lit(a) + lit(b) * x)
    val z = ((y - mu) * (y - mu) - y) / mu
    df.where(y.isNotNull && y >= 0 && x.isNotNull)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(mu).as("__smu"), sum(mu * mu).as("__smu2"),
        sum(mu * z).as("__smz"), sum(z * z).as("__szz"))
      .select(col("__n").cast("long").as("n"),
        (col("__smu") / col("__n")).as("mu_mean"),
        (col("__smz") / col("__smu2")).as("alpha"),
        // t = α / √(s²/Σμ²), s² = Σ(z−αμ)²/(n−1) expanded in moments
        ((col("__smz") / col("__smu2")) /
          sqrt(((col("__szz") -
            col("__smz") * col("__smz") / col("__smu2")) /
            (col("__n") - 1)) / col("__smu2"))).as("t_stat"))
  }

  /**
   * Breusch–Pagan heteroscedasticity test for the bivariate OLS
   * y ~ x: does the residual VARIANCE depend on x (which silently
   * invalidates the fit's standard errors)? The auxiliary regression
   * e² ~ x yields LM = n·R²_aux ~ χ²(1) under homoscedasticity. The
   * main fit is closed-form from one moments scan (two driver
   * doubles); the auxiliary moments come from ONE second scan with
   * (a, b) inlined as literals — and the oracle replays both stages
   * as plain CTE algebra, no literals needed on its side. Returns
   * ONE row: (n, slope, intercept, r2_aux, lm_stat).
   */
  def breuschPagan(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df.where(x.isNotNull && y.isNotNull)
    val m = base.agg(count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * x).as("sxx"),
      sum(x * y).as("sxy")).head()
    val n = m.getAs[Double]("n")
    require(n > 3, "breuschPagan: need > 3 rows")
    val b = (n * m.getAs[Double]("sxy") -
      m.getAs[Double]("sx") * m.getAs[Double]("sy")) /
      (n * m.getAs[Double]("sxx") -
        m.getAs[Double]("sx") * m.getAs[Double]("sx"))
    val a = (m.getAs[Double]("sy") - b * m.getAs[Double]("sx")) / n
    val e2 = (y - lit(a) - lit(b) * x) * (y - lit(a) - lit(b) * x)
    base.agg(count(lit(1)).cast("double").as("__n"),
        sum(x).as("__sx"), sum(e2).as("__se"),
        sum(x * x).as("__sxx"), sum(x * e2).as("__sxe"),
        sum(e2 * e2).as("__see"))
      .select(col("__n").cast("long").as("n"), lit(b).as("slope"),
        lit(a).as("intercept"),
        // R² of e² ~ x from centered moments
        ((col("__sxe") - col("__sx") * col("__se") / col("__n")) *
          (col("__sxe") - col("__sx") * col("__se") / col("__n")) /
          ((col("__sxx") - col("__sx") * col("__sx") / col("__n")) *
            (col("__see") - col("__se") * col("__se") / col("__n"))))
          .as("r2_aux"))
      .withColumn("lm_stat", lit(n) * col("r2_aux"))
  }

  /**
   * White's heteroskedasticity test — [[breuschPagan]]'s
   * specification-robust sibling: the auxiliary regression adds the
   * SQUARED regressor (e² ~ x + x²), so variance that grows
   * non-linearly in x (which BP's linear auxiliary misses) still
   * rejects. LM = n·R²_aux on χ²(2). Two-regressor R² is the closed
   * 2×2 normal-equations form on centered moments — pure Column
   * algebra, no driver solve. Same two-stage shape as BP: one moments
   * scan collects (a, b) as literals, one second scan reduces the
   * auxiliary moments. Returns ONE row:
   * (n, slope, intercept, r2_aux, lm_stat, df).
   */
  def whiteTest(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df.where(x.isNotNull && y.isNotNull)
    val m = base.agg(count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * x).as("sxx"),
      sum(x * y).as("sxy")).head()
    val n = m.getAs[Double]("n")
    require(n > 4, "whiteTest: need > 4 rows")
    val b = (n * m.getAs[Double]("sxy") -
      m.getAs[Double]("sx") * m.getAs[Double]("sy")) /
      (n * m.getAs[Double]("sxx") -
        m.getAs[Double]("sx") * m.getAs[Double]("sx"))
    val a = (m.getAs[Double]("sy") - b * m.getAs[Double]("sx")) / n
    val e2 = (y - lit(a) - lit(b) * x) * (y - lit(a) - lit(b) * x)
    val w = x * x
    val s = base.agg(count(lit(1)).cast("double").as("__n"),
      sum(x).as("__su"), sum(w).as("__sw"), sum(e2).as("__se"),
      sum(x * x).as("__suu"), sum(w * w).as("__sww"),
      sum(x * w).as("__suw"), sum(x * e2).as("__sue"),
      sum(w * e2).as("__swe"), sum(e2 * e2).as("__see"))
    def c(sab: Column, sa: Column, sb: Column) =
      sab - sa * sb / col("__n")
    val cuu = c(col("__suu"), col("__su"), col("__su"))
    val cww = c(col("__sww"), col("__sw"), col("__sw"))
    val cuw = c(col("__suw"), col("__su"), col("__sw"))
    val cue = c(col("__sue"), col("__su"), col("__se"))
    val cwe = c(col("__swe"), col("__sw"), col("__se"))
    val cee = c(col("__see"), col("__se"), col("__se"))
    val det = cuu * cww - cuw * cuw
    val ess = (cue * (cww * cue - cuw * cwe) +
      cwe * (cuu * cwe - cuw * cue)) / det
    s.select(col("__n").cast("long").as("n"), lit(b).as("slope"),
        lit(a).as("intercept"),
        when(det =!= 0 && cee > 0, ess / cee).as("r2_aux"))
      .withColumn("lm_stat", lit(n) * col("r2_aux"))
      .withColumn("df", lit(2L))
  }

  /**
   * Ramsey RESET specification test: is y ~ x MISSING curvature? The
   * auxiliary regression adds the squared fitted value ŷ², and
   * F = (RSS₁ − RSS₂)/(RSS₂/(n−3)) on (1, n−3) asks whether it
   * bought anything — the standard "should this feature enter
   * non-linearly" gate before shipping a linear transform. Same
   * two-stage literal shape as [[whiteTest]]; both RSS are closed
   * forms on centered moments of (x, z = (a+bx)², y). Returns ONE
   * row: (n, slope, intercept, rss1, rss2, f_stat).
   */
  def resetTest(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df.where(x.isNotNull && y.isNotNull)
    val m = base.agg(count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * x).as("sxx"),
      sum(x * y).as("sxy")).head()
    val n = m.getAs[Double]("n")
    require(n > 3, "resetTest: need > 3 rows")
    val b = (n * m.getAs[Double]("sxy") -
      m.getAs[Double]("sx") * m.getAs[Double]("sy")) /
      (n * m.getAs[Double]("sxx") -
        m.getAs[Double]("sx") * m.getAs[Double]("sx"))
    val a = (m.getAs[Double]("sy") - b * m.getAs[Double]("sx")) / n
    val z = (lit(a) + lit(b) * x) * (lit(a) + lit(b) * x)
    val s = base.agg(count(lit(1)).cast("double").as("__n"),
      sum(x).as("__su"), sum(z).as("__sw"), sum(y).as("__se"),
      sum(x * x).as("__suu"), sum(z * z).as("__sww"),
      sum(x * z).as("__suw"), sum(x * y).as("__sue"),
      sum(z * y).as("__swe"), sum(y * y).as("__see"))
    def c(sab: Column, sa: Column, sb: Column) =
      sab - sa * sb / col("__n")
    val cuu = c(col("__suu"), col("__su"), col("__su"))
    val cww = c(col("__sww"), col("__sw"), col("__sw"))
    val cuw = c(col("__suw"), col("__su"), col("__sw"))
    val cue = c(col("__sue"), col("__su"), col("__se"))
    val cwe = c(col("__swe"), col("__sw"), col("__se"))
    val cee = c(col("__see"), col("__se"), col("__se"))
    val det = cuu * cww - cuw * cuw
    val rss1 = cee - cue * cue / cuu
    val rss2 = cee - (cue * (cww * cue - cuw * cwe) +
      cwe * (cuu * cwe - cuw * cue)) / det
    s.select(col("__n").cast("long").as("n"), lit(b).as("slope"),
      lit(a).as("intercept"), rss1.as("rss1"),
      when(det =!= 0, rss2).as("rss2"),
      when(det =!= 0 && rss2 > 0,
        (rss1 - rss2) / (rss2 / (col("__n") - 3))).as("f_stat"))
  }

  /**
   * Breusch–Godfrey serial-correlation LM test (lag 1, grouped) over
   * a residual frame — the regression-framework upgrade of the
   * Durbin–Watson readout (valid with the regressor present in the
   * auxiliary, where DW's bounds go fuzzy): within each group,
   * regress e_t on (x_t, e_{t−1}) over the lag-aligned rows and emit
   * LM = n_aux·R²_aux on χ²(1). The lag is a group-partitioned window
   * over the (calendar-bounded) per-group series; the two-regressor
   * R² is the same closed 2×2 form as [[whiteTest]], reduced per
   * group in one pass. Returns one row per group:
   * (groups…, n, r2_aux, lm_stat, df).
   */
  def breuschGodfrey(df: DataFrame, groupCols: Seq[String],
      orderCol: String, residCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "breuschGodfrey: need group columns (partitioned window)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    val u = col(orderCol).cast("double")
    val e = col(residCol).cast("double")
    val lagged = df
      .withColumn("__pr", lag(e, 1).over(w))
      .where(col("__pr").isNotNull)
    val v = col("__pr")
    val s = lagged.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(u).as("__su"), sum(v).as("__sw"), sum(e).as("__se"),
        sum(u * u).as("__suu"), sum(v * v).as("__sww"),
        sum(u * v).as("__suw"), sum(u * e).as("__sue"),
        sum(v * e).as("__swe"), sum(e * e).as("__see"))
    def c(sab: Column, sa: Column, sb: Column) =
      sab - sa * sb / col("__n")
    val cuu = c(col("__suu"), col("__su"), col("__su"))
    val cww = c(col("__sww"), col("__sw"), col("__sw"))
    val cuw = c(col("__suw"), col("__su"), col("__sw"))
    val cue = c(col("__sue"), col("__su"), col("__se"))
    val cwe = c(col("__swe"), col("__sw"), col("__se"))
    val cee = c(col("__see"), col("__se"), col("__se"))
    val det = cuu * cww - cuw * cuw
    val r2 = (cue * (cww * cue - cuw * cwe) +
      cwe * (cuu * cwe - cuw * cue)) / det / cee
    s.select(groupCols.map(col) :+
      col("__n").cast("long").as("n") :+
      when(det =!= 0 && cee > 0, r2).as("r2_aux") :+
      when(det =!= 0 && cee > 0, col("__n") * r2).as("lm_stat") :+
      lit(1L).as("df"): _*)
  }

  /**
   * Chow structural-break test: does the y ~ x relationship CHANGE
   * between two regimes (before/after a launch, segment A vs B)?
   * F = [(RSS_pooled − RSS_a − RSS_b)/2] / [(RSS_a + RSS_b)/(n−4)]
   * on (2, n−4) dof — the known-breakpoint INFERENCE companion to
   * the search-for-the-break [[graft.ops.TimeSeries]] changepoint.
   * Every RSS is closed-form from ONE conditional-moments scan
   * (the pooled sums are the two sides' sums added — no extra pass),
   * so the oracle replays it as pure algebra. Returns ONE row:
   * (n_a, n_b, rss_pooled, rss_a, rss_b, f_stat).
   */
  def chowTest(df: DataFrame, xCol: String, yCol: String,
      regimeA: Column): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val t = when(regimeA, 1.0).otherwise(0.0)
    val m = df.where(x.isNotNull && y.isNotNull)
      .agg(sum(t).as("na"), sum(lit(1.0) - t).as("nb"),
        sum(t * x).as("sxa"), sum((lit(1.0) - t) * x).as("sxb"),
        sum(t * y).as("sya"), sum((lit(1.0) - t) * y).as("syb"),
        sum(t * x * x).as("sxxa"), sum((lit(1.0) - t) * x * x).as("sxxb"),
        sum(t * x * y).as("sxya"), sum((lit(1.0) - t) * x * y).as("sxyb"),
        sum(t * y * y).as("syya"), sum((lit(1.0) - t) * y * y).as("syyb"))
    def rss(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
        syy: Column): Column = {
      val cxx = sxx - sx * sx / n
      val cxy = sxy - sx * sy / n
      val cyy = syy - sy * sy / n
      cyy - cxy * cxy / cxx
    }
    val rA = rss(col("na"), col("sxa"), col("sya"), col("sxxa"),
      col("sxya"), col("syya"))
    val rB = rss(col("nb"), col("sxb"), col("syb"), col("sxxb"),
      col("sxyb"), col("syyb"))
    val nT = col("na") + col("nb")
    val rP = rss(nT, col("sxa") + col("sxb"), col("sya") + col("syb"),
      col("sxxa") + col("sxxb"), col("sxya") + col("sxyb"),
      col("syya") + col("syyb"))
    // guard: a regime with < 3 rows has no slope to compare — every
    // downstream division is conditional so ANSI mode never trips
    val ok = col("na") >= 3 && col("nb") >= 3
    m.select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        when(ok, rP).as("rss_pooled"), when(ok, rA).as("rss_a"),
        when(ok, rB).as("rss_b"),
        when(ok && nT > 4 && rA + rB > 0,
          ((rP - rA - rB) / 2) / ((rA + rB) / (nT - 4))).as("f_stat"))
  }

  /**
   * Deming (errors-in-variables) regression of y on x: both variables
   * carry measurement error, with `lambda` = Var(ε_y)/Var(ε_x) (1 =
   * orthogonal regression) — the method-comparison fit (two assays of
   * the same quantity) where OLS attenuates the slope. Closed form on
   * centered moments: with u = c_yy − λ·c_xx,
   * slope = (u + √(u² + 4λ·c_xy²)) / (2·c_xy). Returns ONE row:
   * (n, lambda, slope, intercept, pearson_r). Degenerate x⟂y
   * (c_xy = 0) reports NULL slope/intercept — the sign of the limit
   * is undefined there (the chowTest guard convention).
   *
   * Scale shape: ONE moments scan, everything after is 1-row algebra.
   */
  def deming(df: DataFrame, xCol: String, yCol: String,
      lambda: Double = 1.0): DataFrame = {
    require(lambda > 0, "deming: lambda > 0")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val m = df.where(x.isNotNull && y.isNotNull)
      .agg(count(lit(1)).cast("double").as("n"), sum(x).as("sx"),
        sum(y).as("sy"), sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    val n = col("n")
    val cxx = col("sxx") - col("sx") * col("sx") / n
    val cyy = col("syy") - col("sy") * col("sy") / n
    val cxy = col("sxy") - col("sx") * col("sy") / n
    val u = cyy - lit(lambda) * cxx
    val slope = when(cxy =!= 0,
      (u + sqrt(u * u + lit(4 * lambda) * cxy * cxy)) / (lit(2.0) * cxy))
    m.select(n.cast("long").as("n"), lit(lambda).as("lambda"),
      slope.as("slope"),
      (col("sy") / n - slope * col("sx") / n).as("intercept"),
      when(cxx > 0 && cyy > 0, cxy / sqrt(cxx * cyy)).as("pearson_r"))
  }

  /**
   * Two-stage least squares with one instrument: the Wald/IV estimator
   * β_IV = c_zy / c_zx for outcome y, endogenous regressor x and
   * instrument z — the causal slope when x is confounded but z moves x
   * and touches y only through x. Reports the OLS slope beside it
   * (the attenuation/confounding contrast) and the first-stage F
   * (weak-instrument diagnostic, F = (n−2)·R²₁/(1−R²₁) of x ~ z).
   * Returns ONE row:
   * (n, beta_iv, intercept_iv, beta_ols, first_stage_f).
   *
   * Scale shape: ONE moments scan; all three fits are algebra on it.
   */
  def ivTwoStage(df: DataFrame, yCol: String, xCol: String,
      zCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val z = col(zCol).cast("double")
    val m = df.where(x.isNotNull && y.isNotNull && z.isNotNull)
      .agg(count(lit(1)).cast("double").as("n"), sum(x).as("sx"),
        sum(y).as("sy"), sum(z).as("sz"), sum(x * x).as("sxx"),
        sum(z * z).as("szz"), sum(x * z).as("sxz"),
        sum(z * y).as("szy"), sum(x * y).as("sxy"))
    val n = col("n")
    val cxx = col("sxx") - col("sx") * col("sx") / n
    val czz = col("szz") - col("sz") * col("sz") / n
    val cxz = col("sxz") - col("sx") * col("sz") / n
    val czy = col("szy") - col("sz") * col("sy") / n
    val cxy = col("sxy") - col("sx") * col("sy") / n
    val beta = when(cxz =!= 0, czy / cxz)
    val r2first = when(cxx > 0 && czz > 0, cxz * cxz / (cxx * czz))
    m.select(n.cast("long").as("n"), beta.as("beta_iv"),
      (col("sy") / n - beta * col("sx") / n).as("intercept_iv"),
      when(cxx > 0, cxy / cxx).as("beta_ols"),
      when(n > 2 && r2first < 1,
        (n - 2) * r2first / (lit(1.0) - r2first)).as("first_stage_f"))
  }

  /**
   * Durbin–Wu–Hausman specification test for one endogenous regressor
   * and one instrument — "is IV even needed?": under exogeneity both
   * OLS and IV estimate the same slope, so
   * H = (β_IV − β_OLS)² / (V̂(β_IV) − V̂(β_OLS)) ~ χ²(1); a large H
   * says x is endogenous (trust [[ivTwoStage]]), a small one says OLS
   * is fine and strictly more efficient. Variances use each
   * estimator's own residual σ²: V_OLS = σ²_OLS/C_xx,
   * V_IV = σ²_IV·C_zz/C_xz². A non-positive variance gap (sampling
   * noise) reports NULL, the repo's degenerate-input convention.
   * Returns ONE row: (n, beta_ols, beta_iv, hausman_stat).
   *
   * Scale shape: ONE moments scan (the [[ivTwoStage]] scan + Σy²);
   * everything else is 1-row algebra.
   */
  def hausmanIvOls(df: DataFrame, yCol: String, xCol: String,
      zCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val z = col(zCol).cast("double")
    val m = df.where(x.isNotNull && y.isNotNull && z.isNotNull)
      .agg(count(lit(1)).cast("double").as("n"), sum(x).as("sx"),
        sum(y).as("sy"), sum(z).as("sz"), sum(x * x).as("sxx"),
        sum(z * z).as("szz"), sum(x * z).as("sxz"),
        sum(z * y).as("szy"), sum(x * y).as("sxy"),
        sum(y * y).as("syy"))
    val n = col("n")
    val cxx = col("sxx") - col("sx") * col("sx") / n
    val czz = col("szz") - col("sz") * col("sz") / n
    val cxz = col("sxz") - col("sx") * col("sz") / n
    val czy = col("szy") - col("sz") * col("sy") / n
    val cxy = col("sxy") - col("sx") * col("sy") / n
    val cyy = col("syy") - col("sy") * col("sy") / n
    val bOls = when(cxx > 0, cxy / cxx)
    val bIv = when(cxz =!= 0, czy / cxz)
    val s2Ols = (cyy - bOls * cxy) / (n - 2)
    val s2Iv = (cyy - lit(2.0) * bIv * cxy + bIv * bIv * cxx) / (n - 2)
    val vOls = s2Ols / cxx
    val vIv = s2Iv * czz / (cxz * cxz)
    m.select(n.cast("long").as("n"), bOls.as("beta_ols"),
      bIv.as("beta_iv"),
      when(n > 2 && vIv > vOls,
        pow(bIv - bOls, 2) / (vIv - vOls)).as("hausman_stat"))
  }

  /**
   * Oaxaca–Blinder decomposition of a two-group outcome gap with one
   * covariate: gap = ȳ_A − ȳ_B splits into the part EXPLAINED by
   * different covariate levels (priced at B's coefficients,
   * b_B·(x̄_A − x̄_B)) and the UNEXPLAINED remainder
   * ((a_A − a_B) + (b_A − b_B)·x̄_A) — the fairness/audit
   * decomposition ("how much of the spend gap is order-size mix?").
   * Both group fits are closed-form from ONE conditional-moments scan
   * (the chowTest discipline). Returns ONE row:
   * (n_a, n_b, mean_a, mean_b, gap, explained, unexplained).
   */
  def oaxacaBlinder(df: DataFrame, xCol: String, yCol: String,
      groupA: Column): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val t = when(groupA, 1.0).otherwise(0.0)
    val m = df.where(x.isNotNull && y.isNotNull)
      .agg(sum(t).as("na"), sum(lit(1.0) - t).as("nb"),
        sum(t * x).as("sxa"), sum((lit(1.0) - t) * x).as("sxb"),
        sum(t * y).as("sya"), sum((lit(1.0) - t) * y).as("syb"),
        sum(t * x * x).as("sxxa"), sum((lit(1.0) - t) * x * x).as("sxxb"),
        sum(t * x * y).as("sxya"), sum((lit(1.0) - t) * x * y).as("sxyb"))
    val (na, nb) = (col("na"), col("nb"))
    val cxxA = col("sxxa") - col("sxa") * col("sxa") / na
    val cxyA = col("sxya") - col("sxa") * col("sya") / na
    val cxxB = col("sxxb") - col("sxb") * col("sxb") / nb
    val cxyB = col("sxyb") - col("sxb") * col("syb") / nb
    val ok = na >= 3 && nb >= 3 && cxxA > 0 && cxxB > 0
    val bA = cxyA / cxxA
    val bB = cxyB / cxxB
    val mxA = col("sxa") / na
    val mxB = col("sxb") / nb
    val myA = col("sya") / na
    val myB = col("syb") / nb
    val aA = myA - bA * mxA
    val aB = myB - bB * mxB
    m.select(na.cast("long").as("n_a"), nb.cast("long").as("n_b"),
      when(na > 0, myA).as("mean_a"), when(nb > 0, myB).as("mean_b"),
      when(na > 0 && nb > 0, myA - myB).as("gap"),
      when(ok, bB * (mxA - mxB)).as("explained"),
      when(ok, (aA - aB) + (bA - bB) * mxA).as("unexplained"))
  }

  /**
   * Split conformal prediction interval for a 1-feature OLS fit:
   * distribution-free finite-sample coverage — fit on the md5-hash
   * half of the data ([[graft.functions.PortableHash]], so the split
   * is engine-replayable), take q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
   * absolute calibration residual, and ŷ ± q̂ covers a fresh point
   * with probability ≥ 1−α NO MATTER the error distribution (Vovk;
   * Lei et al. 2018) — the honest-uncertainty wrapper a feature
   * pipeline puts around any point forecast. Returns ONE row:
   * (n_fit, n_cal, intercept, slope, q_hat, coverage_cal,
   * interval_width).
   *
   * Scale shape: one fit-side moments scan (1-row broadcast), one
   * calibration-side residual pass reduced to distinct |residual|
   * counts, [[graft.analysis.PrefixSum]] for the order statistic —
   * never a global sort. NOTE the distinct-|residual| frame is
   * corpus-sized for continuous y — [[splitConformalApprox]] is the
   * documented 100 TB opt-out.
   */
  def splitConformal(df: DataFrame, xCol: String, yCol: String,
      hashCols: Seq[String], alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "splitConformal: alpha in (0,1)")
    val (fit, res) = conformalResiduals(df, xCol, yCol, hashCols)
    val vc = res.groupBy("__r")
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // prefix + total + coverage reuse one reduce
    val tot = broadcast(vc.agg(sum(col("__c")).cast("double").as("__m")))
    val marked = graft.analysis.PrefixSum
      .exclusive(vc, "__r", Seq("__c" -> "__cb")).crossJoin(tot)
    // q̂ = value at 1-based rank ⌈(m+1)(1−α)⌉ (clamped to m)
    val k = least(ceil((col("__m") + 1) * lit(1.0 - alpha)), col("__m"))
    val qhat = broadcast(marked
      .where(col("__cb") < k && k <= col("__cb") + col("__c"))
      .agg(max(col("__r")).as("q_hat"), max(col("__m")).as("__m2")))
    val cov = vc.crossJoin(qhat)
      .agg(max(col("__m2")).as("__mm"), max(col("q_hat")).as("__q"),
        (sum(when(col("__r") <= col("q_hat"), col("__c")).otherwise(0L))
          .cast("double") / max(col("__m2"))).as("coverage_cal"))
    fit.crossJoin(broadcast(cov)).select(
      col("__n").cast("long").as("n_fit"),
      col("__mm").cast("long").as("n_cal"),
      col("__ic").as("intercept"), col("__sl").as("slope"),
      col("__q").as("q_hat"), col("coverage_cal"),
      (col("__q") * 2).as("interval_width"))
  }

  /** Shared fit/residual construction for the conformal pair: the
    * 1-row OLS moments frame from the hash-half fit split, and the
    * calibration-side |residual| rows carrying the fit columns. */
  private def conformalResiduals(df: DataFrame, xCol: String,
      yCol: String, hashCols: Seq[String]): (DataFrame, DataFrame) = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val b = graft.functions.PortableHash.bucket(hashCols.map(col))
    val half = graft.functions.PortableHash.M / 2
    val base = df.where(x.isNotNull && y.isNotNull)
    val fit = base.where(b < half)
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("__sx"),
        sum(y).as("__sy"), sum(x * x).as("__sxx"),
        sum(x * y).as("__sxy"))
      .withColumn("__sl",
        (col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")))
      .withColumn("__ic",
        col("__sy") / col("__n") - col("__sl") * col("__sx") / col("__n"))
    val res = base.where(b >= half).crossJoin(broadcast(fit))
      .select(col("__n"), col("__sl"), col("__ic"),
        abs(y - (col("__ic") + col("__sl") * x)).as("__r"))
    (fit, res)
  }

  /**
   * Sketch opt-out for [[splitConformal]] — the same caveat
   * [[graft.analysis.AnalysisPlanner.kendallTauBinned]] documents for
   * concordance: the exact path's distinct-|residual| frame is
   * corpus-sized for continuous y, so its PrefixSum order statistic
   * rides a corpus-scale shuffle at 100 TB. Here q̂ comes from
   * `approx_percentile` (a mergeable KLL-style sketch, one reduce, no
   * distinct-value frame; `accuracy` trades memory for rank error —
   * OpsExtSpec pins the q̂/coverage tolerance vs the exact path), and
   * calibration coverage is one conditional re-aggregation against
   * that q̂. Declared queries keep the exact path — this is the
   * documented scale toggle. Output schema matches [[splitConformal]].
   */
  def splitConformalApprox(df: DataFrame, xCol: String, yCol: String,
      hashCols: Seq[String], alpha: Double = 0.1,
      accuracy: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha < 1, "splitConformalApprox: alpha in (0,1)")
    require(accuracy >= 100, "splitConformalApprox: accuracy >= 100")
    val (fit, res) = conformalResiduals(df, xCol, yCol, hashCols)
    // the exact path targets 1-based rank ⌈(m+1)(1−α)⌉; the sketch
    // percentile is the matching (finite-sample-conservative) rank/m.
    // m comes from one 1-row bounded collect (the GLM literal-state
    // discipline) because percentile_approx's percentage must fold.
    val m = res.agg(count(lit(1))).head().getLong(0)
    require(m > 0, "splitConformalApprox: empty calibration split")
    val p = math.min(1.0, math.ceil((m + 1) * (1.0 - alpha)) / m)
    val qhat = broadcast(res.agg(
      percentile_approx(col("__r"), lit(p), lit(accuracy)).as("q_hat")))
    val cov = broadcast(res.crossJoin(qhat)
      .agg(max(col("q_hat")).as("__q"),
        (sum(when(col("__r") <= col("q_hat"), 1.0).otherwise(0.0)) /
          lit(m.toDouble)).as("coverage_cal")))
    fit.crossJoin(cov).select(
      col("__n").cast("long").as("n_fit"), lit(m).as("n_cal"),
      col("__ic").as("intercept"), col("__sl").as("slope"),
      col("__q").as("q_hat"), col("coverage_cal"),
      (col("__q") * 2).as("interval_width"))
  }

  /**
   * Difference-in-differences on a 2×2 (arm × period) design: the
   * causal workhorse for "did the change move the metric beyond the
   * control arm's drift" — DiD = (ȳ_t,post − ȳ_t,pre) −
   * (ȳ_c,post − ȳ_c,pre), with the unpooled SE
   * √(Σ s²_cell/n_cell) over the four cells and t = DiD/SE. The
   * parallel-trends assumption is the caller's (pre-period slope
   * checks live in the time-series ops). Returns ONE row:
   * (n, mean_c_pre, mean_c_post, mean_t_pre, mean_t_post, did, se,
   * t_stat).
   *
   * Scale shape: one conditional-aggregation corpus pass — the four
   * cells ride as when()-guarded sums, never a re-scan per cell.
   */
  def differenceInDifferences(df: DataFrame, yCol: String,
      treated: Column, post: Column): DataFrame = {
    val y = col(yCol).cast("double")
    def cell(c: Column) = (
      sum(when(c, y)),
      sum(when(c, y * y)),
      sum(when(c, 1.0).otherwise(0.0)))
    val cells = Seq(!treated && !post, !treated && post,
      treated && !post, treated && post)
    val aggs = cells.zipWithIndex.flatMap { case (c, i) =>
      val (s1, s2, n) = cell(c)
      Seq(s1.as(s"__s$i"), s2.as(s"__q$i"), n.as(s"__n$i"))
    }
    val m = df.where(y.isNotNull).agg(aggs.head, aggs.tail: _*)
    def mean(i: Int) = col(s"__s$i") / col(s"__n$i")
    // per-cell variance of the MEAN: s²/n with sample variance
    def varMean(i: Int) =
      (col(s"__q$i") - col(s"__s$i") * col(s"__s$i") / col(s"__n$i")) /
        (col(s"__n$i") - 1) / col(s"__n$i")
    val did = (mean(3) - mean(2)) - (mean(1) - mean(0))
    val se = sqrt(varMean(0) + varMean(1) + varMean(2) + varMean(3))
    m.select(
      (col("__n0") + col("__n1") + col("__n2") + col("__n3"))
        .cast("long").as("n"),
      mean(0).as("mean_c_pre"), mean(1).as("mean_c_post"),
      mean(2).as("mean_t_pre"), mean(3).as("mean_t_post"),
      did.as("did"), se.as("se"),
      when(se > 0, did / se).as("t_stat"))
  }

  /**
   * Sharp regression-discontinuity estimate by local linear fits: a
   * WLS line on each side of the cutoff within bandwidth h, weighted
   * by the triangular kernel w = 1 − |x−c|/h, both fits centered at
   * the cutoff so the jump is the intercept difference
   * τ = a_right − a_left (Imbens & Lemieux 2008's recommended
   * estimator; rows at x = c count as treated). Returns ONE row:
   * (n_left, n_right, intercept_left, intercept_right, slope_left,
   * slope_right, effect).
   *
   * Scale shape: one conditional-aggregation pass — the two sides'
   * weighted sufficient statistics (Σw, Σwx, Σwy, Σwx², Σwxy) ride
   * as when()-guarded sums of ONE scan; the WLS closed forms are
   * 1-row algebra.
   */
  def rddLocalLinear(df: DataFrame, xCol: String, yCol: String,
      cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0, "rddLocalLinear: bandwidth > 0")
    val x0 = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val xc = x0 - lit(cutoff)
    val w = lit(1.0) - abs(xc) / lit(bandwidth)
    val in = x0.isNotNull && y.isNotNull && abs(xc) < lit(bandwidth)
    val right = x0 >= lit(cutoff)
    def side(c: Column, tag: String) = Seq(
      sum(when(c, 1L).otherwise(0L)).as(s"__n$tag"),
      sum(when(c, w).otherwise(lit(0.0))).as(s"__w$tag"),
      sum(when(c, w * xc)).as(s"__wx$tag"),
      sum(when(c, w * y)).as(s"__wy$tag"),
      sum(when(c, w * xc * xc)).as(s"__wxx$tag"),
      sum(when(c, w * xc * y)).as(s"__wxy$tag"))
    val aggs = side(in && !right, "l") ++ side(in && right, "r")
    val m = df.agg(aggs.head, aggs.tail: _*)
    def fit(tag: String) = {
      val (sw, swx, swy, swxx, swxy) = (col(s"__w$tag"), col(s"__wx$tag"),
        col(s"__wy$tag"), col(s"__wxx$tag"), col(s"__wxy$tag"))
      val den = sw * swxx - swx * swx
      val b = when(den =!= 0.0, (sw * swxy - swx * swy) / den)
      val a = (swy - b * swx) / sw
      (a, b)
    }
    val (al, bl) = fit("l")
    val (ar, br) = fit("r")
    m.select(col("__nl").as("n_left"), col("__nr").as("n_right"),
      al.as("intercept_left"), ar.as("intercept_right"),
      bl.as("slope_left"), br.as("slope_right"),
      (ar - al).as("effect"))
  }

  /**
   * AR(2) fit by Yule–Walker from the lag-1/lag-2 autocorrelations of
   * a daily series: φ₁ = r₁(1 − r₂)/(1 − r₁²),
   * φ₂ = (r₂ − r₁²)/(1 − r₁²), innovation variance
   * σ² = c₀·(1 − φ₁r₁ − φ₂r₂) — the minimal parametric step past the
   * raw ACF (q147): "is this series momentum (φ₁>0, φ₂≈0) or
   * oscillation (φ₂<0)?". r₁/r₂ come from the EXISTING
   * [[graft.ops.Evaluation.acf]] operator over the daily mean series
   * (same biased-denominator estimator, same calendar-gap handling);
   * the rest is 1-row algebra on a variance reduce of the day-bounded
   * frame. Returns ONE row: (n_days, r1, r2, phi1, phi2, sigma2).
   */
  def yuleWalkerAr2(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(avg(col(valueCol).cast("double")).as("__x"))
      .select(datediff(col("__d"), lit("1970-01-01")).as("__t"),
        col("__x"))
      .localCheckpoint() // acf's base/lag reads + the variance reduce
    // r1/r2 ride the EXISTING acf operator (composition over
    // duplication — identical estimator, identical gap handling)
    val a = Evaluation.acf(daily, "__t", "__x", maxLag = 2)
    val r1 = broadcast(a.where(col("lag") === 1)
      .agg(max(col("acf")).as("r1")))
    val r2 = broadcast(a.where(col("lag") === 2)
      .agg(max(col("acf")).as("r2")))
    val c0 = daily.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("__n"), ((col("__sxx") -
        col("__sx") * col("__sx") / col("__n")) / col("__n")).as("__c0"))
    c0.crossJoin(r1).crossJoin(r2)
      .withColumn("phi1", when(col("r1") * col("r1") =!= 1,
        col("r1") * (lit(1.0) - col("r2")) /
          (lit(1.0) - col("r1") * col("r1"))))
      .withColumn("phi2", when(col("r1") * col("r1") =!= 1,
        (col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1"))))
      .select(col("__n").cast("long").as("n_days"), col("r1"),
        col("r2"), col("phi1"), col("phi2"),
        (col("__c0") * (lit(1.0) - col("phi1") * col("r1") -
          col("phi2") * col("r2"))).as("sigma2"))
  }

  private[graft] def solve(a0: Array[Array[Double]],
      b0: Array[Double]): Array[Double] = {
    val p = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (k <- 0 until p) {
      var piv = k
      for (i <- k + 1 until p)
        if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i
      require(math.abs(a(piv)(k)) > 1e-12,
        "linearRegression: singular design matrix (collinear features)")
      if (piv != k) {
        val t = a(k); a(k) = a(piv); a(piv) = t
        val tb = b(k); b(k) = b(piv); b(piv) = tb
      }
      for (i <- k + 1 until p) {
        val f = a(i)(k) / a(k)(k)
        b(i) -= f * b(k)
        for (j <- k until p) a(i)(j) -= f * a(k)(j)
      }
    }
    val x = new Array[Double](p)
    for (i <- p - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until p) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  /**
   * Per-key daily-trend OLS with Newey–West (Bartlett-kernel) HAC
   * standard errors: y is the rounded daily mean of `valueCol`, x the
   * integer day index since the key's first day, and the slope's
   * variance uses S = γ̂₀ + 2·Σ_{l≤L} (1−l/(L+1))·γ̂_l over the score
   * series u_t = (x_t − x̄)·e_t — the serial-correlation-robust se a
   * plain OLS se understates on trending, autocorrelated series.
   * Returns one row per key: (key, n_days, slope, intercept, se_ols,
   * se_hac, hac_ratio).
   *
   * Scale shape: one map-side-combined corpus groupBy (key, day); OLS
   * stats from one grouped reduce joined back (broadcast — one row per
   * key); L lag windows over calendar-bounded per-key frames. Rounded
   * daily means + integer x keep both engines on the same floats.
   */
  def neweyWestTrend(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 16,
      s"neweyWestTrend: 1..16 lags, got $maxLag")
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull &&
        col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__g"), to_date(col(tsCol)).as("__d"))
      .agg(round(avg(col(valueCol).cast("double")), 6).as("__y"))
    val indexed = daily
      .withColumn("__x",
        datediff(col("__d"),
          min(col("__d")).over(Window.partitionBy("__g")))
          .cast("double"))
      .localCheckpoint() // calendar-bounded; read by fit AND the score pass
    val fit = indexed.groupBy("__g")
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__x")).as("__xb"), avg(col("__y")).as("__yb"),
        sum(col("__x") * col("__x")).as("__sxx0"),
        sum(col("__x") * col("__y")).as("__sxy0"))
      .withColumn("__sxx",
        col("__sxx0") - col("__n") * col("__xb") * col("__xb"))
      .withColumn("__sxy",
        col("__sxy0") - col("__n") * col("__xb") * col("__yb"))
      .withColumn("slope", col("__sxy") / col("__sxx"))
      .withColumn("intercept",
        col("__yb") - col("slope") * col("__xb"))
      .select("__g", "__n", "__xb", "__sxx", "slope", "intercept")
    val scored = indexed.join(broadcast(fit), Seq("__g"))
      .withColumn("__e",
        col("__y") - col("intercept") - col("slope") * col("__x"))
      .withColumn("__u", (col("__x") - col("__xb")) * col("__e"))
    val wLag = Window.partitionBy("__g").orderBy("__d")
    val withLags = (1 to maxLag).foldLeft(scored) { (acc, l) =>
      acc.withColumn(s"__u$l", lag(col("__u"), l).over(wLag))
    }
    val gammaCols = (col("__u") * col("__u")).as("__gl0") +:
      (1 to maxLag).map(l =>
        (col("__u") * col(s"__u$l")).as(s"__gl$l"))
    val gAgg = withLags
      .select(col("__g") +: (col("__e") * col("__e")).as("__e2") +:
        gammaCols: _*)
      .groupBy("__g")
      .agg(sum(col("__e2")).as("__sse"),
        sum(col("__gl0")).as("__gam0") +:
          (1 to maxLag).map(l =>
            sum(coalesce(col(s"__gl$l"), lit(0.0))).as(s"__gam$l")): _*)
    val s = (1 to maxLag).foldLeft(col("__gam0")) { (acc, l) =>
      acc + lit(2.0 * (1.0 - l.toDouble / (maxLag + 1))) *
        col(s"__gam$l")
    }
    fit.join(gAgg, Seq("__g"))
      .select(col("__g").as(keyCol),
        col("__n").cast("long").as("n_days"),
        col("slope"), col("intercept"),
        when(col("__n") > 2 && col("__sxx") > 0,
          sqrt(col("__sse") / (col("__n") - 2) / col("__sxx")))
          .as("se_ols"),
        when(col("__sxx") > 0, sqrt(s / (col("__sxx") * col("__sxx"))))
          .as("se_hac"))
      .withColumn("hac_ratio",
        when(col("se_ols") > 0, col("se_hac") / col("se_ols")))
  }

  /**
   * Deterministic RANSAC line fit — the breakdown-robust complement of
   * [[huberRegression]] (Huber down-weights outliers; RANSAC IGNORES
   * them: up to ~50% arbitrary contamination cannot move the fit).
   * Candidate models come from SYSTEMATIC point pairs (anchor ranks
   * spread evenly over the x-order, partner = anchor + n/3 — a
   * deterministic, engine-replayable stand-in for random sampling);
   * each candidate's consensus is the count of points within
   * `inlierSigma`·σ_y of its line (threshold rounded to 6 so both
   * engines select identical inlier sets); the winner is refit by OLS
   * on its inliers. Requires `xCol` values distinct (a time index).
   *
   * Scale shape: ranks ride [[graft.analysis.PrefixSum]]; candidates
   * are a ≤`candidates`-row broadcast; consensus counting is ONE
   * grouped pass over points × candidates; the refit is a 1-row
   * aggregate. Returns 1 row: (n_points, n_candidates, best_inliers,
   * slope_cand, icept_cand, slope_refit, icept_refit).
   */
  def ransacLine(df: DataFrame, xCol: String, yCol: String,
      inlierSigma: Double = 1.0, candidates: Int = 16): DataFrame = {
    require(inlierSigma > 0, "ransacLine: inlierSigma must be positive")
    require(candidates >= 1 && candidates <= 1024,
      "ransacLine: candidates in 1..1024")
    val pts0 = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    val pts = graft.analysis.PrefixSum.exclusive(
        pts0.withColumn("__one", lit(1.0)), "__x",
        Seq("__one" -> "__exi"))
      .withColumn("__r", col("__exi") + 1)
      .localCheckpoint()
    val st = pts.agg(count(lit(1)).cast("double").as("n"),
      round(sqrt(avg(col("__y") * col("__y")) -
        avg(col("__y")) * avg(col("__y"))) * inlierSigma, 6).as("thr"))
      .head()
    val n = st.getDouble(0)
    require(n >= 6, "ransacLine: need >= 6 points")
    val thr = st.getDouble(1)
    val gap = math.max(1L, (n / 3).toLong)
    val step = math.max(1L, ((n - gap) / candidates).toLong)
    val spark = df.sparkSession
    val anchors = spark.range(0, candidates.toLong).toDF("__k")
      .select(col("__k"), (col("__k") * step + 1).as("__ra"),
        (col("__k") * step + 1 + gap).as("__rb"))
      .where(col("__rb") <= n)
    val slope = (col("__yb") - col("__ya")) / (col("__xb") - col("__xa"))
    val cand = broadcast(anchors
      .join(pts.select(col("__r").as("__ra"), col("__x").as("__xa"),
        col("__y").as("__ya")), Seq("__ra"))
      .join(pts.select(col("__r").as("__rb"), col("__x").as("__xb"),
        col("__y").as("__yb")), Seq("__rb"))
      .where(col("__xb") =!= col("__xa"))
      .select(col("__k"), slope.as("__m"),
        (col("__ya") - slope * col("__xa")).as("__c")))
    val consensus = pts.crossJoin(cand)
      .where(abs(col("__y") - (col("__m") * col("__x") + col("__c"))) <=
        lit(thr))
      .groupBy("__k", "__m", "__c")
      .agg(count(lit(1)).as("__inl"))
    val best = broadcast(consensus
      .orderBy(col("__inl").desc, col("__k")).limit(1))
    val refit = pts.crossJoin(best)
      .where(abs(col("__y") - (col("__m") * col("__x") + col("__c"))) <=
        lit(thr))
      .agg(count(lit(1)).cast("double").as("__nf"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        max(col("__m")).as("__m"), max(col("__c")).as("__c"),
        max(col("__inl")).as("__inl"))
    val sl = (col("__nf") * col("__sxy") - col("__sx") * col("__sy")) /
      (col("__nf") * col("__sxx") - col("__sx") * col("__sx"))
    refit.select(lit(n).cast("long").as("n_points"),
      lit(candidates).as("n_candidates"),
      col("__inl").as("best_inliers"),
      col("__m").as("slope_cand"), col("__c").as("icept_cand"),
      sl.as("slope_refit"),
      ((col("__sy") - sl * col("__sx")) / col("__nf")).as("icept_refit"))
  }

  /**
   * Fama–MacBeth two-pass panel regression of `yCol` on `xCol`:
   * stage 1 fits an independent cross-sectional OLS slope/intercept
   * within every period (closed form from the per-period sufficient
   * statistics); stage 2 treats the T period-slopes as a sample and
   * reports their mean with the classic FM standard error
   * sd(γ̂)/√T — the panel-data answer to "is this exposure priced"
   * that is robust to arbitrary cross-sectional correlation, which a
   * single pooled OLS understates badly.
   *
   * Periods with fewer than `minPerPeriod` rows or a degenerate
   * (zero-variance) regressor are dropped from BOTH stages, exactly
   * as the oracle's HAVING clause drops them.
   *
   * Scale shape: ONE groupBy(period) pass accumulates the five OLS
   * sufficient statistics with map-side combine; stage 2 is an
   * aggregate over the T-row slope frame. No window, no join, no
   * collect. Returns 1 row: (n_periods, mean_slope, fm_se_slope,
   * t_slope, mean_intercept).
   */
  def famaMacbeth(df: DataFrame, periodCol: Column, xCol: String,
      yCol: String, minPerPeriod: Int = 3): DataFrame = {
    val per = df.where(periodCol.isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(periodCol.as("__p"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col(xCol).cast("double")).as("__sx"),
        sum(col(yCol).cast("double")).as("__sy"),
        sum(col(xCol).cast("double") * col(xCol).cast("double"))
          .as("__sxx"),
        sum(col(xCol).cast("double") * col(yCol).cast("double"))
          .as("__sxy"))
      .where(col("__n") >= minPerPeriod &&
        col("__n") * col("__sxx") - col("__sx") * col("__sx") > 0)
    val slope = (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
      (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
    val fits = per.select(slope.as("__b"),
      ((col("__sy") - slope * col("__sx")) / col("__n")).as("__a"))
    fits.agg(count(lit(1)).cast("double").as("__t"),
        avg(col("__b")).as("mean_slope"),
        stddev_samp(col("__b")).as("__sdb"),
        avg(col("__a")).as("mean_intercept"))
      .select(col("__t").cast("long").as("n_periods"),
        col("mean_slope"),
        when(col("__t") > 1, col("__sdb") / sqrt(col("__t")))
          .as("fm_se_slope"),
        when(col("__t") > 1 && col("__sdb") > 0,
          col("mean_slope") / (col("__sdb") / sqrt(col("__t"))))
          .as("t_slope"),
        col("mean_intercept"))
  }
}
