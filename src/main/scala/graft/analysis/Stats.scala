package graft.analysis

/**
 * Scalar statistical functions for p-values / CIs, implemented from the
 * standard continued-fraction and series expansions (Lanczos log-gamma,
 * regularized incomplete beta/gamma). Pure driver-side math — the
 * distributed part of every test is the single aggregation pass in
 * [[AnalysisPlanner.statTest]]; these finish the job on the 1-row result.
 *
 * Reference semantics: raise_/analytics/analysis.py:249-306 declares the
 * tests (p_value / effect_size / confidence_interval outputs); the math
 * here supplies the real computation the reference mocks.
 */
object Stats {

  /** Lanczos approximation, |error| < 2e-10 for x > 0. */
  def logGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) via Lentz continued fraction. */
  def incompleteBeta(a: Double, b: Double, x: Double): Double = {
    require(x >= 0.0 && x <= 1.0, s"x out of range: $x")
    if (x == 0.0) 0.0
    else if (x == 1.0) 1.0
    else {
      val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
      val front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
      // use the symmetry that converges fastest
      if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(a, b, x) / a
      else 1.0 - incompleteBeta(b, a, 1.0 - x)
    }
  }

  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-14
    val fpmin = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  /** Regularized lower incomplete gamma P(a, x). */
  def gammaP(a: Double, x: Double): Double = {
    require(a > 0.0 && x >= 0.0)
    if (x == 0.0) 0.0
    else if (x < a + 1.0) {
      // series
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var i = 0
      while (i < 500 && math.abs(del) >= math.abs(sum) * 1e-15) {
        ap += 1.0
        del *= x / ap
        sum += del
        i += 1
      }
      sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else 1.0 - gammaQcf(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) by continued fraction. */
  private def gammaQcf(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    var break = false
    while (i <= 300 && !break) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) break = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - logGamma(a)) * h
  }

  /** Standard normal CDF via erfc-style rational approximation (~1e-12). */
  def normalCdf(z: Double): Double = {
    // Cody-style via incomplete gamma: Phi(z) = 0.5*(1 + sign(z)*P(1/2, z^2/2))
    val p = gammaP(0.5, z * z / 2.0)
    if (z >= 0) 0.5 * (1.0 + p) else 0.5 * (1.0 - p)
  }

  /** Two-sided p-value for Student t with df degrees of freedom. */
  def tTestPValue(t: Double, df: Double): Double =
    incompleteBeta(df / 2.0, 0.5, df / (df + t * t))

  /** Upper-tail p-value for chi-square. */
  def chi2PValue(chi2: Double, dof: Double): Double =
    1.0 - gammaP(dof / 2.0, chi2 / 2.0)

  /** Upper-tail p-value for the F distribution. */
  def fTestPValue(f: Double, d1: Double, d2: Double): Double =
    if (f <= 0) 1.0 else incompleteBeta(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))

  /** Two-sided p-value for a standard-normal statistic (Mann-Whitney z). */
  def zTestPValue(z: Double): Double = 2.0 * (1.0 - normalCdf(math.abs(z)))

  /**
   * Asymptotic two-sample KS p-value: Q_KS(lambda) with
   * lambda = (sqrt(ne) + 0.12 + 0.11/sqrt(ne)) * D, ne = n1*n2/(n1+n2).
   */
  def ksPValue(d: Double, n1: Long, n2: Long): Double = {
    val ne = n1.toDouble * n2 / (n1 + n2).toDouble
    val lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    var sum = 0.0
    var j = 1
    while (j <= 100) {
      val term = 2.0 * math.pow(-1.0, j - 1) * math.exp(-2.0 * j * j * lam * lam)
      sum += term
      if (math.abs(term) < 1e-12) return math.max(0.0, math.min(1.0, sum))
      j += 1
    }
    math.max(0.0, math.min(1.0, sum))
  }

  /** Welch CI for the mean difference at the given confidence level. */
  def welchConfidenceInterval(
      meanDiff: Double, se: Double, df: Double,
      level: Double = 0.95): (Double, Double) = {
    val tCrit = inverseTCdf((1.0 + level) / 2.0, df)
    (meanDiff - tCrit * se, meanDiff + tCrit * se)
  }

  /**
   * Inverse standard-normal CDF by bisection on [[normalCdf]] —
   * deterministic (no library dependency), ~1e-13 accurate, used to
   * turn a StatTest confidenceLevel into the z critical value that
   * the in-plan CI expressions (and their oracle SQL twins) embed as
   * a shared literal.
   */
  def inverseNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1)
    var lo = -40.0
    var hi = 40.0
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2.0
      if (normalCdf(mid) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2.0
  }

  /** Inverse Student-t CDF by bisection on the (monotone) CDF. */
  def inverseTCdf(p: Double, df: Double): Double = {
    require(p > 0 && p < 1)
    def cdf(t: Double): Double = {
      val ib = incompleteBeta(df / 2.0, 0.5, df / (df + t * t))
      if (t >= 0) 1.0 - 0.5 * ib else 0.5 * ib
    }
    var lo = -1e3
    var hi = 1e3
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2.0
      if (cdf(mid) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2.0
  }
}
