package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.PrefixSum

/**
 * Survival regression beyond the Kaplan–Meier / log-rank / RMST
 * readouts in [[graft.analysis.AnalysisPlanner]]: Cox proportional
 * hazards, the standard "how does a covariate shift the hazard"
 * model (time-to-conversion vs engagement, churn vs spend). The
 * reference's analytics surface stops at descriptive statistics
 * (raise_/analytics/client.py mocks execution); this implements the
 * real distributed fit.
 */
object Survival {

  /**
   * Cox proportional-hazards fit with ONE covariate and Breslow tie
   * handling, by a FIXED number of Newton–Raphson rounds from β = 0 —
   * the same deterministic-replay contract as
   * [[Regression.logisticRegression]]: no line search, no convergence
   * test, so any engine (the DuckDB oracle included) reproduces every
   * iterate bit-for-bit-at-6-decimals.
   *
   * Per round, with the current β inlined as a literal:
   *   1. one corpus aggregation to the per-distinct-duration frame
   *      (d_t = events at t, Σ x over events at t, and the weight
   *      sums w0 = Σ e^{βx}, w1 = Σ x e^{βx}, w2 = Σ x² e^{βx} over
   *      EVERYONE observed at t — censored rows leave the risk set at
   *      their duration too);
   *   2. risk-set suffix sums S_k(t) = Σ_{dur ≥ t} w_k as
   *      (1-row total) − (exclusive [[PrefixSum]]) — never a
   *      single-partition window;
   *   3. a 1-row rollup of the score U = Σ_t (Σx_events − d·S1/S0)
   *      and information I = Σ_t d·(S2/S0 − (S1/S0)²), then
   *      β ← β + U/I on the driver (one double of state).
   *
   * The last Newton scan's information (evaluated at the β entering
   * the final round — the point where a converged fit would sit
   * anyway) also yields the usual asymptotic se(β) = 1/√I and
   * z = β/se. Scale the covariate to O(1) (or log
   * it) so e^{βx} stays bounded — same contract as the GLM family.
   *
   * Returns one row: (n, n_events, beta, hazard_ratio, se, z,
   * iterations). Scale shape: iterations corpus scans, each a
   * map-side-combined groupBy to a ≤distinct-durations frame; all
   * Newton algebra runs on that tiny frame.
   */
  def coxPH(df: DataFrame, durationCol: String, eventCol: String,
      xCol: String, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "coxPH: iterations >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
        col(durationCol).cast("double").as("__dur"),
        col(eventCol).cast("double").as("__ev"),
        col(xCol).cast("double").as("__x"))
      .where(col("__dur").isNotNull && col("__ev").isNotNull &&
        col("__x").isNotNull)
    var beta = 0.0
    var lastI = 0.0
    var n = 0L; var nEvents = 0L
    for (_ <- 1 to iterations) {
      val w = exp(lit(beta) * col("__x"))
      val perT = base.groupBy("__dur").agg(
        sum("__ev").as("__d"),
        sum(col("__ev") * col("__x")).as("__sxe"),
        sum(w).as("__w0"), sum(col("__x") * w).as("__w1"),
        sum(col("__x") * col("__x") * w).as("__w2"),
        count(lit(1)).as("__cnt"))
      val pre = PrefixSum.exclusive(perT, "__dur",
        Seq(("__w0", "__p0"), ("__w1", "__p1"), ("__w2", "__p2")))
      val tot = broadcast(perT.agg(
        sum("__w0").as("__t0"), sum("__w1").as("__t1"),
        sum("__w2").as("__t2"), sum("__d").as("__td"),
        sum("__cnt").as("__tn")))
      val s0 = col("__t0") - col("__p0")
      val s1 = col("__t1") - col("__p1")
      val s2 = col("__t2") - col("__p2")
      val row = pre.crossJoin(tot)
        .agg(
          sum(when(col("__d") > 0,
            col("__sxe") - col("__d") * s1 / s0)).as("__u"),
          sum(when(col("__d") > 0,
            col("__d") * (s2 / s0 - (s1 / s0) * (s1 / s0)))).as("__i"),
          max(col("__td")).as("__ne"), max(col("__tn")).as("__n"))
        .head()
      val u = row.getAs[Double]("__u")
      lastI = row.getAs[Double]("__i")
      nEvents = row.getAs[Double]("__ne").toLong
      n = row.getAs[Long]("__n")
      require(lastI > 0, "coxPH: zero information (constant covariate?)")
      beta = beta + u / lastI
    }
    val se = 1.0 / math.sqrt(lastI)
    Seq((n, nEvents, beta, math.exp(beta), se, beta / se, iterations))
      .toDF("n", "n_events", "beta", "hazard_ratio", "se", "z",
        "iterations")
  }

  /**
   * Weibull duration fit by log-moment matching: ln T ~ Gumbel with
   * sd π/(k√6) and mean ln λ − γ/k, so k̂ = π/(s_lnT·√6) and
   * λ̂ = exp(m_lnT + γ/k̂) — one closed-form pass, no iterative MLE.
   * Emits the implied median λ(ln 2)^{1/k} and p90 λ(ln 10)^{1/k}
   * next to the exact-DISC observed quantiles, so the fit grades
   * itself. Returns ONE row: (n, k_shape, lambda_scale, fit_median,
   * obs_median, fit_p90, obs_p90).
   *
   * Scale shape: one log-moments reduce + one exact-percentile pass
   * (value-count PrefixSum), both distributed.
   */
  def weibullFit(df: DataFrame, durationCol: String): DataFrame = {
    val t = col(durationCol).cast("double")
    val base = df.where(t.isNotNull && t > 0).select(t.as("__t"))
      .localCheckpoint() // moments AND the observed-quantile pass
    val gamma = 0.5772156649015329
    val mom = base.agg(count(lit(1)).cast("double").as("__n"),
        avg(log(col("__t"))).as("__m"),
        stddev_samp(log(col("__t"))).as("__s"))
      .withColumn("__k", lit(math.Pi) / (col("__s") * lit(math.sqrt(6.0))))
      .withColumn("__lam", exp(col("__m") + lit(gamma) / col("__k")))
    val obs = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(base, "__t",
        Seq("__om" -> 0.5, "__o9" -> 0.9), Nil))
    mom.crossJoin(obs).select(
      col("__n").cast("long").as("n"), col("__k").as("k_shape"),
      col("__lam").as("lambda_scale"),
      (col("__lam") * pow(lit(math.log(2.0)), lit(1.0) / col("__k")))
        .as("fit_median"),
      col("__om").as("obs_median"),
      (col("__lam") * pow(lit(math.log(10.0)), lit(1.0) / col("__k")))
        .as("fit_p90"),
      col("__o9").as("obs_p90"))
  }

  /**
   * Proportional-hazards TREND diagnostic from null-model (β = 0)
   * Schoenfeld-type score residuals: at each event, r = x −
   * mean(x | risk set); a nonzero correlation of r with event TIME
   * means the covariate's effect drifts — the assumption [[coxPH]]
   * silently makes, tested without any iterative fit (the β = 0 score
   * form needs no Newton steps, so the oracle replays it exactly).
   * Returns 1 row: (n, n_events, corr_time, t_stat) with t on
   * n_events − 2 df.
   *
   * Scale shape: risk-set means are suffix sums (total − PrefixSum
   * exclusive prefix) over the duration-grouped frame; residual rows
   * come from one join of the event subjects against that ≤|distinct
   * durations| frame; the correlation is a 1-row aggregate.
   */
  def phScoreTrend(df: DataFrame, durationCol: String, eventCol: String,
      xCol: String): DataFrame = {
    val base = df.select(
        col(durationCol).cast("double").as("__dur"),
        col(eventCol).cast("double").as("__ev"),
        col(xCol).cast("double").as("__x"))
      .where(col("__dur").isNotNull && col("__ev").isNotNull &&
        col("__x").isNotNull)
      .localCheckpoint()
    val perT = base.groupBy("__dur")
      .agg(count(lit(1)).cast("double").as("__cnt"),
        sum(col("__x")).as("__sx"))
    val pre = PrefixSum.exclusive(perT, "__dur",
      Seq("__cnt" -> "__pc", "__sx" -> "__px"))
    val tot = broadcast(base.agg(
      count(lit(1)).cast("double").as("__tc"), sum(col("__x")).as("__tx")))
    val rm = pre.crossJoin(tot)
      .select(col("__dur"),
        ((col("__tx") - col("__px")) / (col("__tc") - col("__pc")))
          .as("__rm"))
    val ev = base.where(col("__ev") > 0)
      .join(rm, Seq("__dur"))
      .select(col("__dur").as("__t"), (col("__x") - col("__rm")).as("__r"))
    val a = ev.agg(count(lit(1)).cast("double").as("__k"),
      sum(col("__t")).as("__st"), sum(col("__r")).as("__sr"),
      sum(col("__t") * col("__t")).as("__stt"),
      sum(col("__t") * col("__r")).as("__str"),
      sum(col("__r") * col("__r")).as("__srr"))
    val num = col("__k") * col("__str") - col("__st") * col("__sr")
    val den = sqrt((col("__k") * col("__stt") - col("__st") * col("__st")) *
      (col("__k") * col("__srr") - col("__sr") * col("__sr")))
    val corr = when(den > 0, num / den)
    a.crossJoin(tot)
      .select(col("__tc").cast("long").as("n"),
        col("__k").cast("long").as("n_events"),
        corr.as("corr_time"),
        when(den > 0 && col("__k") > 2 && abs(num / den) < 1,
          (num / den) * sqrt((col("__k") - 2) /
            (lit(1.0) - (num / den) * (num / den)))).as("t_stat"))
  }

  /**
   * Actuarial life table (grouped-interval survival) — the classic
   * demography estimator Kaplan–Meier generalizes: durations are
   * binned into fixed `intervalDays` intervals and censored subjects
   * count as half-exposed in their exit interval, q̂_k =
   * d_k / (n_k − c_k/2), Ŝ_k = Π_{j≤k}(1 − q̂_j). The grouped form is
   * what survives at 100 TB: the corpus collapses to ≤ |intervals|
   * rows in ONE groupBy, and the cumulative reads ride
   * [[graft.analysis.PrefixSum]] — no single-partition window, no
   * per-subject ordering.
   *
   * Returns one row per occupied interval, ordered by `interval`:
   * (interval, day_start, n_risk, n_event, n_censored, q, surv) where
   * `surv` is the survival through the END of the interval. q is NULL
   * (and surv carries the last defined value's product semantics:
   * exact 0 once a q hits 1) when the effective denominator is empty.
   */
  def lifeTable(df: DataFrame, durationCol: String, eventCol: String,
      intervalDays: Int): DataFrame = {
    require(intervalDays >= 1, "lifeTable: intervalDays must be >= 1")
    val base = df
      .where(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(durationCol).cast("double") >= 0)
      .select(floor(col(durationCol).cast("double") / intervalDays)
        .cast("long").as("interval"),
        col(eventCol).cast("boolean").as("__e"))
    val per = base.groupBy("interval").agg(
      sum(when(col("__e"), 1L).otherwise(0L)).as("n_event"),
      sum(when(!col("__e"), 1L).otherwise(0L)).as("n_censored"))
    val tot = broadcast(base.agg(count(lit(1)).as("__n")))
    // r14: both dependent prefix passes (exit counts → log survival
    // factors + zero flags) share ONE bucketing shuffle via
    // exclusiveChain instead of two full machineries over the same
    // interval-ordered frame — identical arithmetic.
    val cum = PrefixSum.exclusiveChain(
      per.withColumn("__out", col("n_event") + col("n_censored")),
      "interval", Seq(
        ((d: org.apache.spark.sql.DataFrame) => d,
          Seq(("__out", "__cum"))),
        ((d: org.apache.spark.sql.DataFrame) => d.crossJoin(tot)
          .withColumn("n_risk", col("__n") - col("__cum"))
          .withColumn("q",
            when(col("n_risk") - col("n_censored") / lit(2.0) > 0,
              col("n_event") /
                (col("n_risk") - col("n_censored") / lit(2.0))))
          // log-space cumulative product; a q = 1 (or undefined-q)
          // interval zeroes/freezes survival from there on, tracked by
          // a flag prefix instead of ln(0)
          .withColumn("__ln1q",
            when(col("q").isNotNull && col("q") < 1,
              log(lit(1.0) - col("q"))).otherwise(lit(0.0)))
          .withColumn("__zflag",
            when(col("q").isNull || col("q") >= 1, 1L).otherwise(0L)),
          Seq(("__ln1q", "__lnpre"), ("__zflag", "__zpre")))))
    cum.select(col("interval"),
        (col("interval") * intervalDays).as("day_start"),
        col("n_risk"), col("n_event"), col("n_censored"), col("q"),
        when(col("__zpre") + col("__zflag") > 0, lit(0.0))
          .otherwise(exp(col("__lnpre") + col("__ln1q"))).as("surv"))
  }

  /**
   * Gompertz hazard fit over entity lifetimes derived from an event
   * stream: lifetime = days between an entity's first and last event,
   * the discrete hazard ladder h_k = d_k/n_k comes from the lifetime
   * life table, and ln h_k is regressed on k — Gompertz' law
   * h(t) = a·e^{bt} holds whenever attrition accelerates with age, so
   * (slope b, doubling time ln2/b) is the "is churn risk compounding"
   * readout a bare Kaplan–Meier curve hides. Only interior ladder
   * points (d_k > 0 AND n_k > d_k) enter the fit: h = 0 has no log
   * and the terminal h = 1 point is a boundary artifact.
   *
   * Scale shape: one groupBy(entity) → lifetime frame, value-level
   * counts + PrefixSum for at-risk suffix totals, OLS on the
   * ≤|distinct lifetimes| ladder. Returns 1 row: (n_entities,
   * n_points, intercept, slope, hazard_doubling_days).
   */
  def gompertzHazard(df: DataFrame, idCol: String,
      tsCol: String): DataFrame = {
    val life = df.where(col(idCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(idCol))
      .agg(datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol))))
        .cast("double").as("__l"))
    val lc = life.groupBy("__l")
      .agg(count(lit(1)).cast("double").as("__d"))
      .localCheckpoint()
    val tot = broadcast(lc.agg(sum(col("__d")).as("__ntot")))
    val ladder = graft.analysis.PrefixSum
      .exclusive(lc, "__l", Seq("__d" -> "__ex"))
      .crossJoin(tot)
      .select(col("__l"), col("__d"),
        (col("__ntot") - col("__ex")).as("__n"))
      .where(col("__d") > 0 && col("__n") > col("__d"))
      .select(col("__l"), log(col("__d") / col("__n")).as("__lh"))
    val fit = ladder.agg(count(lit(1)).cast("double").as("__m"),
      sum(col("__l")).as("__sk"), sum(col("__lh")).as("__sh"),
      sum(col("__l") * col("__l")).as("__skk"),
      sum(col("__l") * col("__lh")).as("__skh"))
    // a degenerate ladder (0 or 1 interior points, or a single distinct
    // lifetime) zeroes the OLS denominator — NULL fit, not an ANSI
    // DIVIDE_BY_ZERO (hit at tiny SF where users have few events)
    val den = col("__m") * col("__skk") - col("__sk") * col("__sk")
    val b = when(den =!= 0,
      (col("__m") * col("__skh") - col("__sk") * col("__sh")) / den)
    fit.crossJoin(tot)
      .select(col("__ntot").cast("long").as("n_entities"),
        col("__m").cast("long").as("n_points"),
        when(col("__m") > 0,
          (col("__sh") - b * col("__sk")) / col("__m")).as("intercept"),
        b.as("slope"),
        when(b > 0, lit(math.log(2.0)) / b)
          .as("hazard_doubling_days"))
  }
}
