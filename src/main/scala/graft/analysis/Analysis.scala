package graft.analysis

/**
 * Declarative analysis specs — the 8 analysis operators of the reference
 * feature store (see `/root/reference/raise_/analytics/analysis.py` and the
 * SQL semantics in `raise_/PRD.md` §11, PRD.md:960-1070). Each spec is a
 * plain ADT; [[AnalysisPlanner]] lowers a spec to a Spark `DataFrame`
 * program and Catalyst does the rest.
 */
sealed trait Analysis {
  def kind: String
}

/**
 * Metrics over one feature, optionally grouped / time-windowed / rolling.
 * Ref: analysis.py:29-92; SQL: PRD.md:972-994.
 *
 * Supported metrics (analysis.py:64-69): count, sum, avg/mean, min, max,
 * stddev, variance, median, null_rate, null_count, distinct_count,
 * p50/p75/p90/p95/p99 (any pNN).
 */
final case class Aggregation(
    feature: String,
    metrics: Seq[String] = Seq("count", "avg"),
    window: Option[String] = None, // e.g. "7d"; anchored to max(timeColumn)
    groupBy: Seq[String] = Nil,
    rolling: Boolean = false,
    periods: Option[Int] = None,
    filter: Option[String] = None,
    timeColumn: String = "ts",
    // DATE-typed partition column equal to date(timeColumn), when the
    // table is day-partitioned — lets the window predicate prune
    // partitions, not just row groups (see AnalysisPlanner.applyTimeWindow)
    timePartitionColumn: Option[String] = None)
    extends Analysis {
  val kind = "aggregation"
  require(metrics.nonEmpty, "aggregation requires at least one metric")
  require(!rolling || periods.exists(_ > 0), "rolling aggregation requires periods > 0")
  metrics.foreach(m =>
    require(Aggregation.supportedMetrics(m) || m.matches("p\\d{1,2}"),
      s"Unsupported metric: $m"))
}

object Aggregation {
  val supportedMetrics: Set[String] = Set(
    "count", "sum", "avg", "mean", "min", "max", "stddev", "variance",
    "median", "null_rate", "null_count", "distinct_count")
}

/**
 * Distribution analysis: histogram / percentiles / moments / cdf.
 * Ref: analysis.py:95-148; SQL: PRD.md:996-1013.
 */
final case class Distribution(
    feature: String,
    bins: Int = 20,
    segmentBy: Option[String] = None,
    sampleSize: Option[Long] = None,
    // hash-sample key cols — SET an entity/row-identity key. Empty falls
    // back to the feature itself, which is VALUE-CLUSTERED (all rows
    // sharing a value kept/dropped together): biased for low-cardinality
    // or skewed features; only parity-safe for integer-typed keys.
    sampleKeys: Seq[String] = Nil,
    filter: Option[String] = None,
    outputs: Seq[String] = Seq("histogram")) // histogram|percentiles|stats|cdf
    extends Analysis {
  val kind = "distribution"
  require(bins > 0, "bins must be > 0")
}

/**
 * Pairwise correlation over ≥2 features. Ref: analysis.py:151-195.
 * method ∈ pearson | spearman (kendall: sampled, see planner notes).
 */
final case class Correlation(
    features: Seq[String],
    method: String = "pearson",
    sampleSize: Option[Long] = None,
    // hash-sample key cols — SET an entity/row-identity key; the empty
    // fallback (the feature columns) is value-clustered, see Distribution
    sampleKeys: Seq[String] = Nil,
    filter: Option[String] = None)
    extends Analysis {
  val kind = "correlation"
  require(features.size >= 2, "Correlation requires at least 2 features")
  require(Set("pearson", "spearman", "kendall")(method), s"Unknown method: $method")
}

/**
 * Compare two versions/segments of one feature: statistics diff +
 * distribution drift (PSI/KL). Ref: analysis.py:198-246, PRD.md:658-676.
 * The two sides are supplied as filter predicates on the same frame
 * (version columns / snapshots reduce to this form).
 */
final case class VersionDiff(
    feature: String,
    sideA: String, // SQL predicate selecting version A rows
    sideB: String,
    bins: Int = 10)
    extends Analysis {
  val kind = "version_diff"
}

/**
 * Statistical tests: A/B or version compare.
 * Ref: analysis.py:249-306; tests table PRD.md:1029-1036.
 * test ∈ welch | ttest | mannwhitney | chi2 | ks | anova |
 *        ztest_proportions (feature = 0/1 success indicator).
 */
final case class StatTest(
    feature: String,
    test: String,
    segmentBy: String,
    control: String,
    treatment: String,
    bins: Int = 10, // for chi2 binning of continuous features
    // Compare two snapshot VERSIONS of the group instead of two segment
    // values (analysis.py:272 compare_versions) — resolved by
    // FeatureGroupData.analyze into a union frame labeled with
    // [[StatTest.versionCol]]; the planner then tests version-a vs
    // version-b rows. Accepts "v3" or "3".
    compareVersions: Option[(String, String)] = None,
    // Two-sided CI level on the effect (analysis.py:273); welch/ttest
    // and ztest emit (confidence_level, ci_lo, ci_hi).
    confidenceLevel: Double = 0.95,
    // Pre-test row filter (analysis.py:274) — routed through snapshot
    // segment pruning like Aggregation.filter.
    filter: Option[String] = None)
    extends Analysis {
  val kind = "stat_test"
  require(Set("welch", "ttest", "mannwhitney", "chi2", "ks", "anova",
    "ztest", "ztest_proportions")(test),
    s"Unknown test: $test")
  require(segmentBy.nonEmpty || compareVersions.isDefined,
    "Either segmentBy or compareVersions must be specified") // analysis.py:287-289
  require(segmentBy.isEmpty || (control.nonEmpty && treatment.nonEmpty),
    "segment_by requires control and treatment values") // analysis.py:285-286
  require(confidenceLevel > 0 && confidenceLevel < 1,
    s"confidenceLevel in (0, 1), got $confidenceLevel")
}

object StatTest {
  /** Label column the compare-versions union frame carries. */
  val versionCol = "__version"

  /** "3" and "v3" both mean version 3; labels are canonically "v3". */
  def normVersion(v: String): String =
    if (v.startsWith("v")) v else "v" + v
}

/** Row inspection. Ref: analysis.py:309-362. */
final case class RecordLookup(
    features: Seq[String] = Nil, // empty = all
    filter: Option[String] = None,
    sample: Option[Long] = None,
    sampleKeys: Seq[String] = Nil, // hash-sample key cols (empty = projection)
    limit: Int = 100,
    orderBy: Seq[String] = Nil,
    descending: Boolean = false)
    extends Analysis {
  val kind = "record_lookup"
}

/**
 * Data-quality profile: completeness / validity / uniqueness / freshness /
 * outliers. Ref: analysis.py:365-414.
 */
final case class DataQuality(
    features: Seq[String],
    keyColumns: Seq[String] = Nil,
    timeColumn: Option[String] = None,
    outlierSigma: Double = 3.0)
    extends Analysis {
  val kind = "data_quality"
}

/**
 * Drift between a current window and a baseline.
 * Ref: analysis.py:417-470. metrics ⊆ {psi, kl_divergence, js_divergence,
 * wasserstein, ks_statistic}.
 */
final case class Drift(
    feature: String,
    baselineFilter: String,
    currentFilter: String,
    metrics: Seq[String] = Seq("psi", "kl_divergence"),
    bins: Int = 10)
    extends Analysis {
  val kind = "drift"
  metrics.foreach(m => require(Drift.supported(m), s"Unknown drift metric: $m"))
}

object Drift {
  val supported: Set[String] =
    Set("psi", "kl_divergence", "js_divergence", "wasserstein", "ks_statistic")
}
