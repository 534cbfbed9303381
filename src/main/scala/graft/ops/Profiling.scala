package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Schema-semantics profiling — the discovery side of data quality
 * (reference quality catalogue, raise_/transforms/quality.py:22-96,
 * checks DECLARED keys and references; these operators FIND them):
 * per-column uniqueness / candidate-key scoring and functional-
 * dependency validation between column pairs.
 */
object Profiling {

  /**
   * Per-column uniqueness profile: row count, exact distinct count,
   * null count, distinct ratio over non-null rows, and a candidate-key
   * flag (all values distinct, no nulls). One aggregation pass;
   * Catalyst rewrites the k count-distincts into a single Expand-based
   * aggregate, so the input is scanned once (the Expand multiplies
   * rows k× through ONE shuffle — the standard exact-distinct cost;
   * use the HLL sketch profile in [[Sketches]] when approximate is
   * acceptable at very large k).
   */
  def uniquenessProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "uniquenessProfile: no columns")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        countDistinct(col(c)).as(s"__d$i"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__z$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__d$i").as("n_distinct"), col(s"__z$i").as("n_nulls"))
    }
    row.select(explode(array(perCol: _*)).as("s"))
      .select(col("s.column"), col("s.n_rows"), col("s.n_distinct"),
        col("s.n_nulls"),
        (col("s.n_distinct").cast("double") /
          greatest(col("s.n_rows") - col("s.n_nulls"), lit(1L)))
          .as("distinct_ratio"),
        (col("s.n_nulls") === 0 &&
          col("s.n_distinct") === col("s.n_rows")).as("is_candidate_key"))
  }

  /**
   * Functional-dependency check det → dep: does every determinant
   * value map to exactly one dependent value? Returns one row with
   * group counts, violating-group/row counts, and the holds ratio.
   * Two keyed aggregations (det-grouped, then a 1-row rollup) — the
   * det groupBy is the only shuffle and is map-side combined.
   */
  def functionalDependency(df: DataFrame, detCol: String,
      depCol: String): DataFrame = {
    val g = df.groupBy(col(detCol).as("__det"))
      .agg(count(lit(1)).as("__n"), countDistinct(col(depCol)).as("__d"))
    g.agg(count(lit(1)).as("n_groups"),
        sum(when(col("__d") > 1, 1L).otherwise(0L)).as("violating_groups"),
        sum(when(col("__d") > 1, col("__n")).otherwise(0L))
          .as("violating_rows"),
        sum(col("__n")).as("n_rows"))
      .select(lit(detCol).as("determinant"), lit(depCol).as("dependent"),
        col("n_groups"), col("violating_groups"), col("violating_rows"),
        col("n_rows"),
        (lit(1.0) - col("violating_groups").cast("double") /
          col("n_groups")).as("holds_ratio"))
  }

  /**
   * Exact φ-heavy hitters: every value of `keyCols` holding at least
   * `phi` of the rows, with count and share. Two aggregations — the
   * keyed count (map-side combined, the one shuffle) and a 1-row total
   * broadcast back onto it. At 100 TB this is the exact path; the
   * approximate rescan-free alternative at extreme key cardinality is
   * the sketch profile in [[Sketches]] — this operator's output is the
   * ground truth those estimates are graded against.
   */
  def heavyHitters(df: DataFrame, keyCols: Seq[String],
      phi: Double): DataFrame = {
    require(phi > 0 && phi <= 1, "phi must be in (0, 1]")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).cast("double").as("__tot"))
    counts.join(broadcast(total))
      .where(col("cnt").cast("double") >= lit(phi) * col("__tot"))
      .withColumn("share", col("cnt") / col("__tot"))
      .drop("__tot")
  }

  /**
   * k-anonymity risk profile over quasi-identifier columns — the
   * re-identification readout a privacy review asks for before a
   * dataset ships: rows whose QI combination is shared by fewer than
   * k individuals are linkable. Collapses the corpus to equivalence
   * classes (one grouped count — the only full-width shuffle), then
   * aggregates classes to a group-size histogram: one row per
   * distinct class size with the number of classes, rows covered, the
   * at-risk flag (size < riskK), and each size's share of all rows.
   * The histogram is at most #distinct-class-sizes rows — KB at any
   * corpus scale; `min(k)` over it is the dataset's k-anonymity.
   */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String],
      riskK: Int = 5): DataFrame = {
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    val total = df.agg(count(lit(1)).cast("double").as("__tot"))
    classes.groupBy(col("__sz").as("k"))
      .agg(count(lit(1)).as("n_classes"), sum(col("__sz")).as("n_rows"))
      .join(broadcast(total))
      .withColumn("at_risk", col("k") < riskK)
      .withColumn("row_share", col("n_rows") / col("__tot"))
      .drop("__tot")
  }

  /**
   * l-diversity profile — the sensitive-attribute companion to
   * [[kAnonymityProfile]]: within each quasi-identifier class, how
   * many DISTINCT sensitive values appear (l) and how evenly
   * (entropy). A class can be k-anonymous yet leak the sensitive
   * attribute outright when l = 1. Returns one row per observed l:
   * (l, n_classes, n_rows, at_risk, avg_entropy) with
   * at_risk = l < riskL and entropy from the join-free identity
   * H = ln(sz) − (Σ c·ln c)/sz. Two keyed aggregations over
   * (QI, sensitive) cells — never over raw rows twice.
   */
  def lDiversityProfile(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, riskL: Int = 3): DataFrame = {
    require(qiCols.nonEmpty, "lDiversityProfile: no QI columns")
    val cells = df
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).cast("double").as("__c"))
    val perClass = cells.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("l"), sum(col("__c")).as("__sz"),
        (log(sum(col("__c"))) -
          sum(col("__c") * log(col("__c"))) / sum(col("__c")))
          .as("__h"))
    perClass.groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("__sz")).cast("long").as("n_rows"),
        avg(col("__h")).as("avg_entropy"))
      .withColumn("at_risk", col("l") < riskL)
  }

  /**
   * t-closeness profile: per quasi-identifier class, the total
   * variation distance between the class's sensitive-value
   * distribution and the global one — the strongest of the classic
   * syntactic privacy triple (a class can be l-diverse yet skewed
   * enough to leak). TVD over present values plus the mass of absent
   * ones: ½·Σ_present|p−q| + ½·(1 − Σ_present q). Returns 1 row:
   * (n_classes, max_tvd, avg_tvd, classes_over, rows_over) with
   * `over` = TVD > t. Cell counts, one broadcast of the
   * ≤|values|-row global distribution, two rollups.
   */
  def tClosenessProfile(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double = 0.5): DataFrame = {
    require(qiCols.nonEmpty, "tClosenessProfile: no QI columns")
    val cells = df
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint() // feeds global dist, class sizes, AND the join
    val global = cells.groupBy(col(sensitiveCol).as("__sv"))
      .agg(sum(col("__c")).as("__g"))
      .crossJoin(broadcast(cells.agg(sum(col("__c")).as("__tot"))))
      .select(col("__sv"), (col("__g") / col("__tot")).as("__q"))
    val szs = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c")).as("__sz"))
    val perClass = graft.analysis.PrefixSum
      .joinNullSafe(cells, szs, qiCols)
      .join(broadcast(global), col(sensitiveCol) <=> col("__sv"))
      .groupBy(qiCols.map(col): _*)
      .agg(max(col("__sz")).as("__sz"),
        sum(abs(col("__c") / col("__sz") - col("__q"))).as("__sabs"),
        sum(col("__q")).as("__qpres"))
      .select(col("__sz"),
        (lit(0.5) * (col("__sabs") + lit(1.0) - col("__qpres")))
          .as("__tvd"))
    perClass.agg(count(lit(1)).as("n_classes"),
      max(col("__tvd")).as("max_tvd"), avg(col("__tvd")).as("avg_tvd"),
      sum(when(col("__tvd") > t, 1L).otherwise(0L)).as("classes_over"),
      sum(when(col("__tvd") > t, col("__sz")).otherwise(lit(0.0)))
        .cast("long").as("rows_over"))
  }

  /**
   * HBOS — histogram-based outlier score (Goldstein & Dengel 2012):
   * per feature, an equal-width histogram over [min, max]; a row's
   * score is Σ_f log(N / n_bin_f(row)) — high when the row sits in
   * sparse bins across features. The linear-time, embarrassingly
   * parallel multivariate anomaly baseline (no pairwise distances, no
   * model fit): each feature costs one 1-row bounds aggregate + one
   * ≤bins-row histogram, and scoring is F BROADCAST hash joins on the
   * bin index — no explode, no row-id regroup shuffle, map-only over
   * the corpus. NULL features contribute 0 (a row is scored on the
   * features it has). Appends `hbos_score`; row set unchanged.
   *
   * Determinism: bin index is the clamped ⌊(v−lo)/(hi−lo)·bins⌋ grid —
   * the same literal float arithmetic any engine replays (the q04
   * histogram contract).
   */
  def hbosScore(df: DataFrame, features: Seq[String],
      bins: Int = 10): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(bins >= 2, "need at least 2 bins")
    features.zipWithIndex.foldLeft(df) { case (acc, (f, i)) =>
      val v = col(f).cast("double")
      val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"),
        count(v).cast("double").as("__n"))
      val binOf = when(col("__hi") <= col("__lo"), lit(0L)).otherwise(
        least(greatest(floor((v - col("__lo")) /
          (col("__hi") - col("__lo")) * bins), lit(0L)), lit(bins - 1L))
          .cast("long"))
      val hist = df.crossJoin(broadcast(bounds))
        .where(v.isNotNull)
        .groupBy(binOf.as(s"__b$i"))
        .agg(count(lit(1)).cast("double").as(s"__c$i"),
          max(col("__n")).as(s"__n$i"))
      val withBin = acc.crossJoin(broadcast(bounds))
        .withColumn(s"__b$i", when(v.isNotNull, binOf))
        .drop("__lo", "__hi", "__n")
      val prev = if (acc.columns.contains("hbos_score")) col("hbos_score")
        else lit(0.0)
      withBin.join(broadcast(hist), Seq(s"__b$i"), "left")
        .withColumn("hbos_score",
          prev + coalesce(log(col(s"__n$i") / col(s"__c$i")), lit(0.0)))
        .drop(s"__b$i", s"__c$i", s"__n$i")
    }.select(df.columns.map(col) :+ col("hbos_score"): _*)
  }

  /**
   * Benford's-law conformity of a measure column — the fraud/anomaly
   * screen for "organically grown" magnitudes (amounts, populations,
   * file sizes): the first significant digit d of such data follows
   * P(d) = log₁₀(1 + 1/d). Returns exactly 9 rows (digit, n, observed,
   * expected) — absent digits surface as n=0, not missing rows — with
   * the two standard conformity scores repeated on each: MAD (mean
   * |obs−exp|; Nigrini's thresholds: <0.006 close, >0.015 noncompliant)
   * and the χ² statistic N·Σ(obs−exp)²/exp (8 df).
   *
   * One corpus aggregation (digit extraction is map-side arithmetic:
   * d = ⌊v/10^⌊log₁₀ v⌋⌋ on |v|>0); everything after runs on the
   * checkpointed ≤9-row digit frame.
   */
  /**
   * Information-gain ranking of categorical features against a label:
   * IG(f) = H(label) − H(label | f) in nats — the entropy-based
   * feature-selection screen (which columns are worth encoding /
   * which leak the target). All features melt into ONE
   * (feature, value, label) frame via a map-side explode, so the
   * corpus is scanned once regardless of feature count; everything
   * after runs on joint-count aggregates (state bounded by distinct
   * (feature, value, label) triples). NULL feature values form their
   * own bucket — a null-heavy column's predictive mass is real.
   * Returns (feature, h_label, h_cond, info_gain), one row per
   * feature.
   */
  def informationGain(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    val lab = col(labelCol).cast("string")
    val melted = df.where(lab.isNotNull)
      .select(explode(array(featureCols.map(f =>
        struct(lit(f).as("feature"), col(f).cast("string").as("value"),
          lab.as("label"))): _*)).as("m"))
      .select(col("m.feature").as("feature"), col("m.value").as("value"),
        col("m.label").as("label"))
    // entropy via the join-free identity H = ln(N) − (Σ n·ln n)/N —
    // no totals frame, no self-join, two stacked aggregations total
    val joint = melted.groupBy("feature", "value", "label")
      .agg(count(lit(1)).as("__n"))
    val perValue = joint.groupBy("feature", "value")
      .agg(sum(col("__n")).as("__nv"),
        sum(col("__n") * log(col("__n"))).as("__s"))
      .withColumn("__hv", log(col("__nv")) - col("__s") / col("__nv"))
    val hcond = perValue.groupBy("feature")
      .agg((sum(col("__nv") * col("__hv")) / sum(col("__nv")))
        .as("h_cond"))
    // label marginal entropy: one scan of the label column only
    val hl = broadcast(df.where(lab.isNotNull).groupBy(lab.as("__l"))
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("__N"),
        sum(col("__n") * log(col("__n"))).as("__s"))
      .select((log(col("__N")) - col("__s") / col("__N"))
        .as("h_label")))
    hcond.crossJoin(hl)
      .select(col("feature"), col("h_label"), col("h_cond"),
        (col("h_label") - col("h_cond")).as("info_gain"))
  }

  def benfordConformity(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    import graft.analysis.PrefixSum
    val gs = groupCols.map(col)
    val v = abs(col(valueCol).cast("double"))
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("long")
    val counts = df.where(v > 0.0)
      .groupBy(gs :+ digit.as("digit"): _*).agg(count(lit(1)).as("n"))
      .localCheckpoint() // ≤ groups×9 rows; grid, totals + join read it
    val digits = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    // dense (group × digit) grid: absent digits surface as n=0 rows —
    // the grid's group side is the reduced distinct-group frame
    val grid =
      if (groupCols.isEmpty) digits
      else counts.select(gs: _*).distinct().crossJoin(digits)
    val totals =
      if (groupCols.isEmpty)
        counts.agg(sum(col("n")).cast("double").as("__N"))
      else counts.groupBy(gs: _*)
        .agg(sum(col("n")).cast("double").as("__N"))
    val joined = PrefixSum.joinNullSafe(grid, counts,
        groupCols :+ "digit", "left")
      .na.fill(0L, Seq("n"))
    val perDigit =
      (if (groupCols.isEmpty) joined.crossJoin(broadcast(totals))
       else PrefixSum.joinNullSafe(joined, totals, groupCols,
         broadcastRight = true))
        .withColumn("observed", col("n") / col("__N"))
        .withColumn("expected", log10(lit(1.0) + lit(1.0) / col("digit")))
        .localCheckpoint() // ≤ groups×9 rows; scores re-read it below
    val scoreAggs = Seq(
      avg(abs(col("observed") - col("expected"))).as("mad"),
      (max(col("__N")) * sum(pow(col("observed") - col("expected"), 2) /
        col("expected"))).as("chi2"))
    val out =
      if (groupCols.isEmpty)
        perDigit.crossJoin(broadcast(
          perDigit.agg(scoreAggs.head, scoreAggs.tail: _*)))
      else PrefixSum.joinNullSafe(perDigit,
        perDigit.groupBy(gs: _*).agg(scoreAggs.head, scoreAggs.tail: _*),
        groupCols, broadcastRight = true)
    out.select(gs ++ Seq(col("digit"), col("n"), col("observed"),
      col("expected"), col("mad"), col("chi2")): _*)
  }

  /**
   * Per-group Gini coefficient of a non-negative value column — the
   * inequality / concentration profile (how skewed is spend per user,
   * tokens per document, events per entity) that decides salting and
   * sampling strategy at scale. Uses the rank formulation on the
   * ascending sort: G = (2·Σ i·x_i) / (n·Σ x) − (n+1)/n, computed
   * tie-invariantly from distinct-value counts (equal x share their
   * rank block's total either way). Scale shape: one distinct-value
   * aggregation + PrefixSum's bucketed distributed scan — no global
   * or single-partition window even in the ungrouped case. Returns
   * (group..., n, total, mean, gini).
   */
  def giniCoefficient(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val x = col(valueCol).cast("double")
    // distinct-value counts, then a DISTRIBUTED exclusive prefix sum of
    // the counts in value order (PrefixSum's bucketed two-level scan —
    // no single-partition window anywhere). Tied values occupy the
    // consecutive rank block [ex+1, ex+c], whose rank total is
    // c·ex + c(c+1)/2 — the tie-invariant form of Σ i·x_i.
    val vc = df.where(x.isNotNull)
      .groupBy(groupCols.map(col) :+ x.as("__x"): _*)
      .agg(count(lit(1)).cast("double").as("__c"))
    val withEx = graft.analysis.PrefixSum.exclusive(
      vc, "__x", Seq("__c" -> "__ex"), groupCols = groupCols)
    val grouped =
      if (groupCols.isEmpty) withEx.groupBy()
      else withEx.groupBy(groupCols.map(col): _*)
    grouped
      .agg(sum(col("__c")).cast("long").as("n"),
        sum(col("__x") * col("__c")).as("total"),
        sum(col("__x") * (col("__c") * col("__ex") +
          col("__c") * (col("__c") + 1) / 2)).as("__ix"))
      .select(groupCols.map(col) ++ Seq(col("n"), col("total"),
        (col("total") / col("n")).as("mean"),
        when(col("total") > 0,
          lit(2.0) * col("__ix") / (col("n") * col("total")) -
            (col("n") + 1.0) / col("n")).otherwise(lit(0.0))
          .as("gini")): _*)
  }

  /**
   * Segment-insight scan (decision-stump sweep): for every value cell
   * of every listed categorical feature, how far the cell's mean
   * outcome deviates from the global mean, as a z-score against the
   * null that the cell is a random draw: z = (ȳ_cell − ȳ) /
   * sqrt(s²·(1/n_cell − 1/N)) (finite-population correction keeps
   * huge cells from reporting inflated significance). The one-scan
   * "which segments move this metric" primitive behind automated
   * insights / metric-regression triage.
   *
   * Scale: ONE melted pass (the row fans out to |features| cell keys
   * through a single explode → groupBy), a broadcast 1-row global
   * moment frame, pure arithmetic after. Cells with fewer than
   * `minSupport` rows are dropped (noise floor). Returns
   * (feature, value, n, mean, lift, z).
   */
  def segmentInsights(df: DataFrame, outcomeCol: String,
      features: Seq[String], minSupport: Long = 30): DataFrame = {
    require(features.nonEmpty, "segmentInsights: no features")
    val y = col(outcomeCol).cast("double")
    val melted = df.where(y.isNotNull)
      .select(y.as("__y"), explode(array(features.map { f =>
        struct(lit(f).as("feature"), col(f).cast("string").as("value"))
      }: _*)).as("__fv"))
      .select(col("__fv.feature").as("feature"),
        col("__fv.value").as("value"), col("__y"))
    val cells = melted.groupBy("feature", "value")
      .agg(count(lit(1)).as("n"), avg(col("__y")).as("mean"))
      .where(col("n") >= minSupport)
    val global = broadcast(df.where(y.isNotNull)
      .agg(count(lit(1)).cast("double").as("__N"),
        avg(y).as("__gm"), var_samp(y).as("__gv")))
    cells.crossJoin(global)
      .select(col("feature"), col("value"), col("n"), col("mean"),
        (col("mean") / col("__gm")).as("lift"),
        // a cell covering the whole population has no sampling
        // variance left (1/n − 1/N = 0) — report NULL, not 0/0
        when(col("n") < col("__N"),
          (col("mean") - col("__gm")) /
            sqrt(col("__gv") *
              (lit(1.0) / col("n") - lit(1.0) / col("__N"))))
          .as("z"))
  }

  /**
   * Missingness-correlation profile: the φ coefficient between the
   * NULL indicators of every column pair — the data-quality signal
   * that distinguishes "fields go missing together" (an upstream
   * extractor died: φ ≈ 1) from independent sparsity (φ ≈ 0).
   * ONE aggregation pass accumulates per-column null counts and
   * pairwise both-null counts; the 1-row result melts to one row per
   * pair: (col_a, col_b, n, null_a, null_b, both_null, phi).
   * φ is NULL when either column is never or always null (no
   * variance to correlate).
   */
  def missingnessCorrelation(df: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "missingnessCorrelation: need >= 2 columns")
    val ind = cols.map(c => when(col(c).isNull, 1.0).otherwise(0.0))
    val aggs = count(lit(1)).cast("double").as("__n") +:
      (cols.indices.map(i => sum(ind(i)).as(s"__m$i")) ++
        (for (i <- cols.indices; j <- i + 1 until cols.size)
          yield sum(ind(i) * ind(j)).as(s"__b${i}_$j")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = (for (i <- cols.indices; j <- i + 1 until cols.size)
      yield {
        val n = col("__n"); val ma = col(s"__m$i"); val mb = col(s"__m$j")
        val both = col(s"__b${i}_$j")
        val denom = ma * (n - ma) * mb * (n - mb)
        struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
          n.cast("long").as("n"), ma.cast("long").as("null_a"),
          mb.cast("long").as("null_b"), both.cast("long").as("both_null"),
          when(denom > 0, (n * both - ma * mb) / sqrt(denom)).as("phi"))
      }).toSeq
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /**
   * Deterministic (feature index, range fraction) split for level `l`
   * of mass-tree `t` — md5-derived so the ensemble is a pure function
   * of (trees, depth, feature list) and an external engine can replay
   * the identical trees from the same literals.
   */
  private[graft] def massSplit(t: Int, l: Int,
      nFeatures: Int): (Int, Double) = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val hex = mdig.digest(s"hst:$t:$l".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val f = (java.lang.Long.parseLong(hex.substring(0, 6), 16) %
      nFeatures).toInt
    val u = 0.05 + 0.9 *
      (java.lang.Long.parseLong(hex.substring(6, 12), 16).toDouble /
        16777216.0)
    (f, u)
  }

  /**
   * Mass-based anomaly scores via an ensemble of oblivious half-space
   * trees (the mass-estimation / HS-tree family: Ting et al., "Mass
   * estimation"; Tan et al., IJCAI 2011 — published, model-free
   * outlier scoring suited to streaming/distributed execution). Each
   * tree is `depth` axis-parallel cuts; level l of tree t cuts
   * feature f_{t,l} at mn + u_{t,l}·(mx − mn), with (f, u) md5-derived
   * literals ([[massSplit]]) and (mn, mx) the column's observed range.
   * A row's leaf per tree is the `depth`-bit cut pattern; its score is
   * the mean over trees of −log2(leaf mass / N) — rows in sparsely
   * populated cells score high.
   *
   * Scale shape: one range aggregation (1 row, broadcast back — no
   * driver collect), leaf ids are pure column arithmetic, one melted
   * groupBy for the ≤ trees·2^depth occupancy frame, then `trees`
   * BROADCAST joins on map-side leaf ids (the hbosScore discipline) —
   * the corpus is never shuffled. NULL feature values take the ≥cut
   * branch (bit 0), deterministically.
   *
   * Returns the key columns + (mass_score). Depth is capped at 12
   * (4096 leaves/tree) to keep the occupancy frame broadcastable.
   */
  def massAnomaly(df: DataFrame, features: Seq[String],
      keyCols: Seq[String], trees: Int = 4, depth: Int = 4): DataFrame = {
    require(features.nonEmpty, "massAnomaly: no features")
    require(depth >= 1 && depth <= 12, "massAnomaly: depth in [1,12]")
    require(trees >= 1, "massAnomaly: trees >= 1")
    val statAggs = features.zipWithIndex.flatMap { case (f, i) =>
      Seq(min(col(f).cast("double")).as(s"__mn$i"),
        max(col(f).cast("double")).as(s"__mx$i"))
    } :+ count(lit(1)).cast("double").as("__N")
    val stats = broadcast(df.agg(statAggs.head, statAggs.tail: _*))
    def leafExpr(t: Int) = (0 until depth).map { l =>
      val (f, u) = massSplit(t, l, features.size)
      val x = col(features(f)).cast("double")
      val cut = col(s"__mn$f") + lit(u) * (col(s"__mx$f") - col(s"__mn$f"))
      when(x.isNotNull && x < cut, lit(1L << l)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withLeaves = df.crossJoin(stats)
      .select(keyCols.map(col) ++ Seq(col("__N")) ++
        (0 until trees).map(t => leafExpr(t).as(s"__leaf$t")): _*)
    val melted = withLeaves.select(explode(array((0 until trees).map { t =>
      struct(lit(t).as("tree"), col(s"__leaf$t").as("leaf"))
    }: _*)).as("__tl"))
      .select(col("__tl.tree").as("tree"), col("__tl.leaf").as("leaf"))
      .groupBy("tree", "leaf").agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint()
    val scored = (0 until trees).foldLeft(withLeaves) { (acc, t) =>
      val ct = melted.where(col("tree") === t)
        .select(col("leaf").as(s"__leaf$t"), col("__c").as(s"__c$t"))
      acc.join(broadcast(ct), Seq(s"__leaf$t"))
    }
    val score = (0 until trees)
      .map(t => -log(2.0, col(s"__c$t") / col("__N")))
      .reduce(_ + _) / trees
    // min_mass_frac is the occupancy FRACTION of the row's emptiest
    // cell — count/N is an IEEE-exact division of exact integers, so
    // thresholding on it is engine-portable where thresholding on the
    // log-based score would ride on libm ulps
    val minFrac = least((0 until trees).map(t => col(s"__c$t")): _*) /
      col("__N")
    scored.select(keyCols.map(col) ++ Seq(score.as("mass_score"),
      minFrac.as("min_mass_frac")): _*)
  }

  /**
   * Chao1 species-richness estimate over a key column (vocabulary
   * size from tokens, distinct users from events, SKUs from baskets):
   * how many distinct keys does the POPULATION hold, given the
   * sample? Uses the bias-corrected form
   * chao1 = D + f₁(f₁−1)/(2(f₂+1)) (defined even when no key appears
   * exactly twice) plus Good's sample-coverage estimate
   * C = 1 − f₁/n — the standard "have we seen most of the
   * vocabulary?" probe when sizing tokenizers or dedup stores from a
   * corpus sample. Returns ONE row:
   * (observed, n_tokens, f1, f2, chao1, coverage).
   *
   * Scale: one groupBy to key counts, one 1-row conditional
   * aggregation over it — the frequency-of-frequencies never
   * materializes beyond two conditional sums.
   */
  def chao1Richness(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    counts.agg(count(lit(1)).as("observed"),
        sum(col("__c")).cast("double").as("__n"),
        sum(when(col("__c") === 1, 1.0).otherwise(0.0)).as("__f1"),
        sum(when(col("__c") === 2, 1.0).otherwise(0.0)).as("__f2"))
      .select(col("observed"), col("__n").cast("long").as("n_tokens"),
        col("__f1").cast("long").as("f1"),
        col("__f2").cast("long").as("f2"),
        (col("observed") + col("__f1") * (col("__f1") - 1) /
          (lit(2.0) * (col("__f2") + 1))).as("chao1"),
        (lit(1.0) - col("__f1") / col("__n")).as("coverage"))
  }

  /**
   * Subgroup scan for ELEVATED outcome rates: every value of every
   * segment column scored with the one-sided binomial log-likelihood
   * ratio llr = k·ln(q/q₀) + (n−k)·ln((1−q)/(1−q₀)) for q > q₀
   * (0 otherwise) — the LTSS-style scan statistic behind "which slice
   * is anomalously hot?" sweeps (error spikes by segment, abuse by
   * channel). Sister to [[segmentInsights]], which ranks by a z-score
   * on a CONTINUOUS outcome; the LLR is the right score for rare
   * binary outcomes where the normal approximation breaks. Returns
   * the top `topK` cells: (segment, value, n, k, rate, base_rate,
   * llr), ordered by llr desc with a deterministic (segment, value)
   * tie-break.
   *
   * Scale: ONE melted scan (array-of-structs explode, the
   * segmentInsights discipline) to |segments|·|values| cells, a
   * 1-row broadcast global rate, TakeOrdered for the top-k.
   */
  def subgroupScan(df: DataFrame, outcomeCol: Column,
      segmentCols: Seq[String], topK: Int = 20): DataFrame = {
    require(segmentCols.nonEmpty, "subgroupScan: no segment columns")
    val y = when(outcomeCol, 1.0).otherwise(0.0)
    val base = df.select(y.as("__y"),
      explode(array(segmentCols.map(c => struct(lit(c).as("__col"),
        col(c).cast("string").as("__val"))): _*)).as("__s"))
    val glob = broadcast(df.agg(sum(y).as("__gs"),
      count(lit(1)).cast("double").as("__gn")))
    base.groupBy(col("__s.__col").as("segment"),
        col("__s.__val").as("value"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__y")).as("__k"))
      .crossJoin(glob)
      .withColumn("__q", col("__k") / col("__n"))
      .withColumn("__q0", col("__gs") / col("__gn"))
      .withColumn("llr", when(col("__q") > col("__q0"),
          col("__k") * log(col("__q") / col("__q0")) +
            when(col("__q") < 1, (col("__n") - col("__k")) *
              log((lit(1.0) - col("__q")) / (lit(1.0) - col("__q0"))))
              .otherwise(lit(0.0)))
        .otherwise(lit(0.0)))
      .select(col("segment"), col("value"),
        col("__n").cast("long").as("n"), col("__k").cast("long").as("k"),
        col("__q").as("rate"), col("__q0").as("base_rate"), col("llr"))
      .orderBy(desc("llr"), col("segment"), col("value"))
      .limit(topK)
  }

  /**
   * Hill tail-index estimate from the top k+1 order statistics:
   * γ̂ = (1/k)·Σ_{i≤k} ln(x_(i)/x_(k+1)) and α̂ = 1/γ̂ — the standard
   * "how heavy is this tail" diagnostic (α < 2: infinite variance;
   * the number that decides whether a metric needs clipping /
   * winsorization before aggregation). Positive values only. Returns
   * ONE row: (k, n_positive, x_k1, hill_gamma, hill_alpha).
   *
   * Scale shape: one filter + a TakeOrdered of k+1 rows (k is a
   * report-sized constant) — the executors keep per-partition top
   * heaps, only k+1 values reach the driver-side-free limit; one
   * 1-row reduce after.
   */
  def hillTailIndex(df: DataFrame, valueCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 2, "hillTailIndex: k >= 2")
    val x = col(valueCol).cast("double")
    val pos = df.where(x.isNotNull && x > 0).select(x.as("__x"))
    val nPos = broadcast(pos.agg(count(lit(1)).as("n_positive")))
    val top = pos.orderBy(desc("__x")).limit(k + 1).localCheckpoint()
    val xk1 = broadcast(top.agg(min(col("__x")).as("__xk1")))
    top.join(xk1)
      .where(col("__x") > col("__xk1"))
      .agg(count(lit(1)).as("k"), max(col("__xk1")).as("x_k1"),
        avg(log(col("__x") / col("__xk1"))).as("hill_gamma"))
      .join(nPos)
      .select(col("k"), col("n_positive"), col("x_k1"),
        col("hill_gamma"),
        (lit(1.0) / col("hill_gamma")).as("hill_alpha"))
  }

  /**
   * Completeness trend: per period × column, the NULL rate — the
   * "which upstream feed degraded, and when" drilldown behind a
   * completeness alert (a flat profile's null count can't localize a
   * regression in time). Returns one row per (period, column):
   * (period, column, n, n_null, null_rate).
   *
   * ONE conditional-aggregation scan (per-period counts for ALL
   * columns in the same groupBy), melted to rows afterwards — the
   * DataQuality single-pass discipline; adding columns adds agg
   * expressions, never scans.
   */
  def completenessTrend(df: DataFrame, periodCol: Column,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "completenessTrend: no columns")
    val aggs = count(lit(1)).as("__n") +: cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"))
    df.groupBy(periodCol.as("period"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("period"), col("__n"),
        explode(array(cols.map(c =>
          struct(lit(c).as("c"), col(s"__null_$c").as("k"))): _*))
          .as("__m"))
      .select(col("period"), col("__m.c").as("column"),
        col("__n").as("n"), col("__m.k").as("n_null"),
        (col("__m.k").cast("double") / col("__n")).as("null_rate"))
  }

  /**
   * Multivariate outlier scoring by squared Mahalanobis distance:
   * d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) with mean vector and covariance from ONE
   * aggregation scan (p(p+3)/2 sums), the p×p inverse solved
   * driver-side (p ≤ 16 — column-count, not data, bounded), and the
   * distance itself pure map-side column algebra with the inverse
   * entries inlined as literals. Under multivariate normality
   * d² ~ χ²(p), so `threshold` is typically the χ² quantile (e.g.
   * 16.27 for p=3 at 0.001). The correlation-aware upgrade of
   * univariate z-scores: a row can be unremarkable per column and
   * still far outside the joint ellipsoid. Appends (mahalanobis2,
   * outlier) to the input columns; complete-case rows only.
   */
  def mahalanobisOutliers(df: DataFrame, cols: Seq[String],
      threshold: Double): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      "mahalanobisOutliers: 2..16 columns")
    require(threshold > 0, "mahalanobisOutliers: threshold > 0")
    val p = cols.size
    val xs = cols.map(c => col(c).cast("double"))
    val complete = df.where(xs.map(_.isNotNull).reduce(_ && _))
    val aggs =
      (0 until p).map(i => sum(xs(i)).as(s"__s_$i")) ++
        (for (i <- 0 until p; j <- i until p)
          yield sum(xs(i) * xs(j)).as(s"__ss_${i}_$j")) ++
        Seq(count(lit(1)).as("__n"))
    val row = complete.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n").toDouble
    require(n > p + 1, s"mahalanobisOutliers: $n rows for $p columns")
    val mu = Array.tabulate(p)(i => row.getAs[Double](s"__s_$i") / n)
    val cov = Array.ofDim[Double](p, p)
    for (i <- 0 until p; j <- i until p) {
      val ss = row.getAs[Double](s"__ss_${i}_$j")
      val v = (ss - n * mu(i) * mu(j)) / (n - 1)
      cov(i)(j) = v; cov(j)(i) = v
    }
    // Σ⁻¹ column by column via the shared p×p solver
    val inv = Array.ofDim[Double](p, p)
    for (j <- 0 until p) {
      val e = Array.tabulate(p)(i => if (i == j) 1.0 else 0.0)
      val c = Regression.solve(cov, e)
      for (i <- 0 until p) inv(i)(j) = c(i)
    }
    val centered = xs.zipWithIndex.map { case (x, i) => x - lit(mu(i)) }
    val d2 = (for (i <- 0 until p; j <- 0 until p)
      yield centered(i) * lit(inv(i)(j)) * centered(j)).reduce(_ + _)
    complete.withColumn("mahalanobis2", d2)
      .withColumn("outlier", col("mahalanobis2") > threshold)
  }

  /**
   * Target-leakage scan: for every numeric feature, how well does the
   * feature ALONE rank the binary target? Separation = max(AUC, 1−AUC)
   * near 1 means the feature encodes the label (a post-outcome field,
   * a join leak, a proxy) — the pre-training gate that catches the
   * "too good to be true" model before it ships. Returns one row per
   * feature: (feature, n, n_pos, auc, separation, leaky).
   *
   * Scale shape: ONE melted scan (feature, value, y), then
   * [[graft.ops.Evaluation.binaryMetrics]] grouped by feature — its
   * per-group distinct-score prefix sums make the whole sweep the
   * same shuffle count as a single AUC, regardless of how many
   * features are scanned.
   */
  def leakageScan(df: DataFrame, targetCol: Column,
      features: Seq[String], flagAbove: Double = 0.8): DataFrame = {
    require(features.nonEmpty, "leakageScan: no features")
    require(flagAbove > 0.5 && flagAbove <= 1.0,
      "leakageScan: flagAbove in (0.5, 1]")
    val y = when(targetCol, 1.0).otherwise(0.0)
    val melted = df.select(y.as("__y"),
        explode(array(features.map(f =>
          struct(lit(f).as("f"), col(f).cast("double").as("v"))): _*))
          .as("__m"))
      .select(col("__m.f").as("feature"), col("__m.v").as("__v"),
        col("__y"))
      .where(col("__v").isNotNull)
    Evaluation.binaryMetrics(melted, "__y", "__v",
        groupCols = Seq("feature"))
      .withColumn("separation",
        greatest(col("auc"), lit(1.0) - col("auc")))
      .select(col("feature"), col("n"), col("n_pos"), col("auc"),
        col("separation"),
        (col("separation") >= flagAbove).as("leaky"))
  }

  /**
   * Pattern-mask profiling: collapse every value of each column to
   * its character-class mask (uppercase runs → `A`, lowercase → `a`,
   * digits → `9`, whitespace → `_`, everything else kept verbatim)
   * and report the top `k` masks per column with counts and shares —
   * the classic "what SHAPES does this column hold" discovery step
   * behind format-validation rules (phone/ID/code columns) and dirty-
   * value triage (the 0.1%-share mask IS the bad data). Run-collapse
   * keeps the mask alphabet small, so "ID12345" and "ID9" agree.
   * Returns ≤ k rows per column: (column, mask, n, share), ordered
   * by (column, n desc, mask).
   *
   * Scale shape: ONE scan — every column's mask is computed in the
   * same projection and exploded to (column, mask) rows (|cols|×
   * fan-out, the uniquenessProfile stance), one grouped count, a
   * broadcast per-column totals join, and the top-k window
   * partitioned BY COLUMN (≤ distinct-masks rows per partition — a
   * report-sized alphabet, never the corpus).
   */
  def maskProfile(df: DataFrame, cols: Seq[String],
      k: Int = 5): DataFrame = {
    require(cols.nonEmpty, "maskProfile: no columns")
    import org.apache.spark.sql.expressions.Window
    val mask = (c: Column) => {
      val m0 = regexp_replace(c.cast("string"), "[A-Z]+", "A")
      val m1 = regexp_replace(m0, "[a-z]+", "a")
      val m2 = regexp_replace(m1, "[0-9]+", "9")
      regexp_replace(m2, "\\s+", "_")
    }
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), mask(col(c)).as("mask"))): _*))
      .as("s"))
      .select(col("s.column"), col("s.mask"))
      .where(col("mask").isNotNull)
    val counts = pairs.groupBy("column", "mask")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("column")
      .agg(sum(col("n")).cast("double").as("__tot"))
    val w = Window.partitionBy("column")
      .orderBy(col("n").desc, col("mask").asc)
    counts.join(broadcast(totals), Seq("column"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("column"), col("mask"), col("n"),
        (col("n") / col("__tot")).as("share"))
  }

  /**
   * Segment concentration report — how unevenly a mass column spreads
   * over a segment key, in one row of the standard indices:
   *   - Herfindahl–Hirschman HHI = Σ s_i² over segment SHARES, and
   *     its 0–1 normalization (HHI − 1/k)/(1 − 1/k);
   *   - Theil T = (1/k)·Σ (x_i/μ)·ln(x_i/μ) over segment totals
   *     (0 = perfectly even, ln k = everything in one segment) —
   *     the entropy-shaped inequality measure that DECOMPOSES across
   *     nested keys, unlike [[giniCoefficient]];
   *   - top_share, the single biggest segment's share.
   * The "is one source/tenant/shard eating the corpus" audit in one
   * pass. Zero-total segments contribute zero to Theil (x·ln x → 0).
   * Returns ONE row: (n_segments, total, hhi, hhi_normalized, theil,
   * top_share).
   *
   * Scale shape: one map-side-combined grouped sum to the ≤k-row
   * segment frame; every index is a 1-row reduce over it.
   */
  def segmentConcentration(df: DataFrame, segmentCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val per = df.where(v.isNotNull && col(segmentCol).isNotNull)
      .groupBy(col(segmentCol).as("__s"))
      .agg(sum(v).as("__x"))
    val tot = broadcast(per.agg(sum(col("__x")).as("__t"),
      count(lit(1)).cast("double").as("__k")))
    per.crossJoin(tot)
      .agg(max(col("__k")).cast("long").as("n_segments"),
        max(col("__t")).as("total"),
        sum(col("__x") * col("__x") / (col("__t") * col("__t")))
          .as("hhi"),
        sum(when(col("__x") > 0,
          (col("__x") / (col("__t") / col("__k"))) *
            log(col("__x") / (col("__t") / col("__k"))))
          .otherwise(lit(0.0))).as("__tsum"),
        max(col("__x") / col("__t")).as("top_share"),
        max(col("__k")).as("__kk"))
      .select(col("n_segments"), col("total"), col("hhi"),
        // k = 1 → the normalizer (1 − 1/k) is 0: a single-segment
        // corpus has no defined normalized concentration — NULL, not
        // a division error (the ANSI-mode guard convention)
        when(col("__kk") > 1,
          (col("hhi") - lit(1.0) / col("__kk")) /
            (lit(1.0) - lit(1.0) / col("__kk")))
          .as("hhi_normalized"),
        (col("__tsum") / col("__kk")).as("theil"), col("top_share"))
  }

  /**
   * Inequality index panel over POSITIVE values (spend, tokens,
   * revenue): Theil-T (top-sensitive), mean log deviation / Theil-L
   * (bottom-sensitive), and the Atkinson index at aversion ε = 0.5 —
   * three decomposable complements to [[giniCoefficient]] that rank
   * DIFFERENT inequality shapes differently (Gini is middle-weighted;
   * a corpus can hold its Gini while its tail concentration explodes,
   * which Theil-T catches). All three are plain means of per-row
   * transforms against μ — ONE aggregation scan, no ranking pass.
   * Non-positive values are excluded (the indices are undefined
   * there) and reported as `n_dropped`.
   */
  def inequalityIndices(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val m = df.where(x.isNotNull).agg(
      sum(when(x > 0, 1L).otherwise(0L)).cast("double").as("__n"),
      sum(when(x <= 0, 1L).otherwise(0L)).as("n_dropped"),
      sum(when(x > 0, x)).as("__s"),
      sum(when(x > 0, log(x))).as("__slog"),
      sum(when(x > 0, x * log(x))).as("__sxlog"),
      sum(when(x > 0, sqrt(x))).as("__ssqrt"))
    m.withColumn("__mu", col("__s") / col("__n"))
      .select(col("__n").cast("long").as("n"), col("n_dropped"),
        col("__mu").as("mean"),
        // Theil-T = E[x/μ · ln(x/μ)] = (Σ x ln x)/(nμ) − ln μ
        (col("__sxlog") / col("__s") - log(col("__mu"))).as("theil_t"),
        // MLD / Theil-L = ln μ − E[ln x]
        (log(col("__mu")) - col("__slog") / col("__n")).as("theil_l"),
        // Atkinson(0.5) = 1 − (E[√x])²/μ
        (lit(1.0) - pow(col("__ssqrt") / col("__n"), 2.0) / col("__mu"))
          .as("atkinson_05"))
  }

  /**
   * Theil-T within/between decomposition by group — WHERE the
   * inequality lives: T = Σ_g s_g·T_g (within) + Σ_g s_g·ln(m_g/μ)
   * (between), with s_g the group's mass share. A corpus whose
   * between-term dominates is segregated by segment (fix the segment
   * mix); a within-dominated one is skewed inside every segment. The
   * decomposition is an EXACT identity — total = within + between to
   * float precision — which the spec asserts. Non-positive values are
   * excluded as in [[inequalityIndices]]. Returns ONE row:
   * (n, n_groups, mean, theil_total, theil_within, theil_between).
   *
   * Scale shape: ONE conditional-aggregation pass to the ≤k-row group
   * frame (n, Σx, Σx·ln x per group), then algebra on the reduction.
   */
  def theilDecomposition(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val g = df.where(x.isNotNull && x > 0 && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("__s"),
        sum(x * log(x)).as("__sxl"))
    val tot = broadcast(g.agg(sum(col("__n")).as("__tn"),
      sum(col("__s")).as("__ts"), count(lit(1)).as("__k")))
    val mu = col("__ts") / col("__tn")
    val mg = col("__s") / col("__n")
    // s_g·T_g = (Σ x ln x)_g/S − s_g·ln m_g ; s_g = Σx_g/S
    val share = col("__s") / col("__ts")
    g.crossJoin(tot)
      .agg(max(col("__tn")).cast("long").as("n"),
        max(col("__k")).as("n_groups"),
        max(mu).as("mean"),
        (sum(col("__sxl")) / max(col("__ts")) - log(max(mu)))
          .as("theil_total"),
        sum(col("__sxl") / col("__ts") - share * log(mg))
          .as("theil_within"),
        sum(share * log(mg / mu)).as("theil_between"))
  }

  /**
   * Hoover index + Palma-style tail shares over POSITIVE values: the
   * Hoover (Robin Hood) index ½·Σ|x−μ|/(Nμ) — "what fraction of
   * total mass must move to equalize" — plus the mass share above the
   * exact-DISC p90 cut and at-or-below the p40 cut, and their ratio
   * (the Palma reading: top-10% vs bottom-40%; cuts are VALUE
   * thresholds, ties land in the lower side on both engines).
   * Returns ONE row: (n, mean, hoover, p40_cut, p90_cut,
   * bottom40_share, top10_share, palma).
   */
  def hooverPalma(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val base = df.where(x.isNotNull && x > 0).select(x.as("__x"))
      .localCheckpoint() // cuts probe + two conditional passes
    val cuts = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(base, "__x",
        Seq("__p40" -> 0.4, "__p90" -> 0.9), Nil))
    val mu = broadcast(base.agg(avg(col("__x")).as("__mu"),
      sum(col("__x")).as("__t"),
      count(lit(1)).cast("double").as("__n")))
    base.crossJoin(cuts).crossJoin(mu)
      .agg(max(col("__n")).cast("long").as("n"),
        max(col("__mu")).as("mean"),
        (sum(abs(col("__x") - col("__mu"))) /
          (max(col("__n")) * max(col("__mu")) * 2)).as("hoover"),
        max(col("__p40")).as("p40_cut"), max(col("__p90")).as("p90_cut"),
        (sum(when(col("__x") <= col("__p40"), col("__x"))
          .otherwise(0.0)) / max(col("__t"))).as("bottom40_share"),
        (sum(when(col("__x") > col("__p90"), col("__x"))
          .otherwise(0.0)) / max(col("__t"))).as("top10_share"))
      .withColumn("palma",
        when(col("bottom40_share") > 0,
          col("top10_share") / col("bottom40_share")))
  }

  /**
   * Bland–Altman agreement between two measurements of the same
   * quantity — the method-comparison readout (bias + limits of
   * agreement) that a correlation coefficient famously canNOT give
   * you (two methods can correlate at 0.99 and still disagree by a
   * constant offset). d = a − b: bias = d̄, LoA = d̄ ± 1.96·sd(d),
   * plus the observed fraction outside the limits and the correlation
   * of d with the pair mean (proportional-bias screen). Returns ONE
   * row: (n, bias, sd_diff, loa_low, loa_high, frac_outside,
   * prop_bias_corr).
   *
   * Scale shape: one moments pass for bias/sd/corr, one conditional
   * re-aggregation against the broadcast limits.
   */
  def blandAltman(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val base = df.where(a.isNotNull && b.isNotNull)
      .select((a - b).as("__d"), ((a + b) / 2).as("__m"))
    val m1 = broadcast(base.agg(
      count(lit(1)).cast("double").as("__n"), avg(col("__d")).as("__bias"),
      stddev_samp(col("__d")).as("__sd"),
      corr(col("__d"), col("__m")).as("__pb")))
    base.crossJoin(m1)
      .agg(max(col("__n")).cast("long").as("n"),
        max(col("__bias")).as("bias"), max(col("__sd")).as("sd_diff"),
        (max(col("__bias")) - lit(1.96) * max(col("__sd"))).as("loa_low"),
        (max(col("__bias")) + lit(1.96) * max(col("__sd"))).as("loa_high"),
        avg((col("__d") < col("__bias") - lit(1.96) * col("__sd") ||
          col("__d") > col("__bias") + lit(1.96) * col("__sd"))
          .cast("double")).as("frac_outside"),
        max(col("__pb")).as("prop_bias_corr"))
  }

  /**
   * Dead-stock screen per category: a key is "dead" when the gap
   * since its last sale is IMPROBABLE under its own historical rate —
   * p = exp(−λ̂·gap_end) with λ̂ = (n−1)/span from its sale history —
   * rather than when it crosses an arbitrary "no sales in 90 days"
   * cutoff that mislabels every slow-but-alive SKU. Keys need
   * `minSales` sales to be classified (the rest are reported
   * unclassified).
   *
   * Scale shape: one groupBy(key) pass against a broadcast 1-row
   * horizon, one groupBy(category) rollup. Returns one row per
   * category: (category, n_keys, n_classified, n_dead, dead_share,
   * worst_p).
   */
  def deadStock(df: DataFrame, keyCol: String, catCol: String,
      tsCol: String, alpha: Double = 0.01,
      minSales: Int = 5): DataFrame = {
    require(alpha > 0 && alpha < 1, s"deadStock: alpha in (0,1)")
    val base = df.where(col(keyCol).isNotNull && col(catCol).isNotNull &&
      col(tsCol).isNotNull)
    val horizon = broadcast(base.agg(max(to_date(col(tsCol)))
      .as("__hz")))
    val per = base
      .groupBy(col(keyCol).as("__k"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__n"),
        min(to_date(col(tsCol))).as("__first"),
        max(to_date(col(tsCol))).as("__last"))
      .crossJoin(horizon)
      .select(col("__k"), col("__c"), col("__n"),
        datediff(col("__hz"), col("__last")).cast("double").as("__gap"),
        datediff(col("__last"), col("__first")).cast("double")
          .as("__span"))
      .select(col("__c"), col("__n"),
        when(col("__n") >= minSales && col("__span") > 0,
          exp(-((col("__n") - 1) / col("__span")) * col("__gap")))
          .as("__p"))
    per.groupBy(col("__c").as(catCol))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("__p").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_classified"),
        coalesce(sum(when(col("__p") < alpha, 1L).otherwise(0L)),
          lit(0L)).as("n_dead"),
        min(col("__p")).as("worst_p"))
      .withColumn("dead_share",
        when(col("n_classified") > 0,
          col("n_dead").cast("double") / col("n_classified")))
  }

  /**
   * ABC × XYZ inventory matrix: keys classed by revenue mass (A/B/C
   * at strictly-above cumulative shares 0.8/0.95, the q519
   * convention) CROSSED with weekly-demand variability (X: CV < 0.5,
   * Y: CV < 1, Z otherwise) — the planning grid that tells you which
   * SKUs deserve forecasting effort (AX: automate; CZ: make-to-order)
   * and that neither classification shows alone. Observed weeks
   * only; boundary CVs land deterministically because the cut
   * comparison runs on identical doubles in both engines.
   *
   * Scale shape: one groupBy(key) revenue pass + value-level
   * PrefixSum for the ABC cut, one groupBy(key, week) + groupBy(key)
   * for CV, one ≤9-row matrix reduce. Returns: (abc_class,
   * xyz_class, n_keys, revenue_share).
   */
  def abcXyzMatrix(df: DataFrame, keyCol: String, tsCol: String,
      revenueCol: String, cvCuts: (Double, Double) = (0.5, 1.0))
      : DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(revenueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(revenueCol).cast("double").as("__r"))
      .localCheckpoint()
    val perKey = base.groupBy("__k")
      .agg(sum(col("__r")).as("__rev")).localCheckpoint()
    val vc = perKey.groupBy("__rev")
      .agg(count(lit(1)).as("__kk"), sum(col("__rev")).as("__mass"))
    val tot = broadcast(vc.agg(sum(col("__mass")).as("__tot")))
    val classed = graft.analysis.PrefixSum
      .exclusive(vc, "__rev", Seq("__mass" -> "__exm"))
      .crossJoin(tot)
      .select(col("__rev"),
        ((col("__tot") - (col("__exm") + col("__mass"))) / col("__tot"))
          .as("__above"))
      .select(col("__rev"),
        when(col("__above") < 0.8, "A")
          .when(col("__above") < 0.95, "B").otherwise("C")
          .as("__abc"))
    val weekly = base.groupBy(col("__k"),
        date_trunc("week", col("__ts")).as("__w"))
      .agg(sum(col("__r")).as("__d"))
    val cv = weekly.groupBy("__k")
      .agg(count(lit(1)).cast("double").as("__nw"),
        avg(col("__d")).as("__md"), stddev_samp(col("__d")).as("__sd"))
      .select(col("__k"),
        when(col("__nw") < 2 || col("__md") <= 0, "Z")
          .when(col("__sd") / col("__md") < cvCuts._1, "X")
          .when(col("__sd") / col("__md") < cvCuts._2, "Y")
          .otherwise("Z").as("__xyz"))
    perKey.join(classed, Seq("__rev")).join(cv, Seq("__k"))
      .crossJoin(tot)
      .groupBy(col("__abc").as("abc_class"),
        col("__xyz").as("xyz_class"))
      .agg(count(lit(1)).as("n_keys"),
        (sum(col("__rev")) / max(col("__tot"))).as("revenue_share"))
  }

  /**
   * Newsvendor stocking panel per key: weekly demand is reduced to
   * (mean, σ, the critical-fractile discrete quantile q*, the exact
   * fill rate that stock level would have achieved, and the expected
   * shortfall share E[(D − s)⁺]/E[D]) — the inventory translation of
   * a demand distribution: q* IS the optimal order-up-to level when
   * underage/overage costs put the critical fractile at `q`.
   * Quantiles are discrete order statistics on exact integer weekly
   * sums, so every column is engine-deterministic.
   *
   * Scale shape: one groupBy(key, week) demand pass, grouped
   * [[graft.analysis.AnalysisPlanner.exactPercentilesDisc]], one
   * join back for the conditional tail sums. Returns one row per
   * key: (key, n_weeks, mean_demand, sd_demand, q_level, fill_rate,
   * shortfall_share, safety_stock).
   */
  def newsvendorPanel(df: DataFrame, keyCol: String, tsCol: String,
      qtyCol: String, q: Double = 0.8): DataFrame = {
    require(q > 0 && q < 1, s"newsvendorPanel: q in (0,1), got $q")
    val weekly = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(qtyCol).isNotNull)
      .groupBy(col(keyCol).as("__k"),
        date_trunc("week", col(tsCol)).as("__w"))
      .agg(sum(col(qtyCol).cast("double")).as("__d"))
      .localCheckpoint()
    val cut = graft.analysis.AnalysisPlanner.exactPercentilesDisc(
      weekly, "__d", Seq("__q" -> q), Seq("__k"))
    weekly.join(broadcast(cut), Seq("__k"))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_weeks"),
        avg(col("__d")).as("mean_demand"),
        stddev_samp(col("__d")).as("sd_demand"),
        max(col("__q")).as("q_level"),
        avg((col("__d") <= col("__q")).cast("double")).as("fill_rate"),
        (sum(greatest(col("__d") - col("__q"), lit(0.0))) /
          sum(col("__d"))).as("shortfall_share"))
      .withColumn("safety_stock", col("q_level") - col("mean_demand"))
  }

  /**
   * 2-D skyline (Pareto front): the points not dominated on
   * (minimize `minCol`, maximize `maxCol`) — "the cheapest part at
   * every size class that no cheaper-and-bigger part beats", the
   * multi-objective shortlist operator plain ORDER BY can't express.
   * A point is on the front iff its cost equals m(s) = min cost over
   * size ≥ s AND every strictly-larger size costs strictly more.
   *
   * Scale shape: one groupBy(size) pass reduces the corpus to the
   * size domain (bounded by the attribute's cardinality), suffix
   * minima via a domain×domain self-join of that reduced frame, one
   * join back to the (cost, size)-level counts. No sort of the
   * corpus, no window. Returns the front ordered by size:
   * (size, cost, n_points).
   */
  def skyline2d(df: DataFrame, minCol: String,
      maxCol: String): DataFrame = {
    val pts = df.where(col(minCol).isNotNull && col(maxCol).isNotNull)
      .select(col(minCol).cast("double").as("__x"),
        col(maxCol).cast("long").as("__y"))
      .localCheckpoint()
    val sizeMin = pts.groupBy("__y").agg(min(col("__x")).as("__mp"))
      .localCheckpoint()
    val other = sizeMin.select(col("__y").as("__y2"),
      col("__mp").as("__mp2"))
    val m = sizeMin.join(other, col("__y2") >= col("__y"))
      .groupBy("__y").agg(min(col("__mp2")).as("__m"))
    val mStrict = sizeMin.join(other, col("__y2") > col("__y"), "left")
      .groupBy("__y").agg(min(col("__mp2")).as("__ms"))
    val front = sizeMin.join(m, Seq("__y")).join(mStrict, Seq("__y"))
      .where(col("__mp") === col("__m") &&
        (col("__ms").isNull || col("__ms") > col("__mp")))
      .select(col("__y"), col("__mp"))
    val counts = pts.groupBy("__y", "__x")
      .agg(count(lit(1)).as("n_points"))
    counts.join(front,
        counts("__y") === front("__y") && counts("__x") === front("__mp"))
      .select(counts("__y").as("size"), counts("__x").as("cost"),
        col("n_points"))
  }

  /**
   * Lin's concordance correlation coefficient between two paired
   * measurements: CCC = 2·s_xy/(s_x² + s_y² + (x̄ − ȳ)²) — agreement
   * with the 45° line, not just linearity, decomposed as
   * CCC = r·C_b (precision × accuracy) with the scale shift s_x/s_y
   * and location shift (x̄ − ȳ)/√(s_x·s_y) naming WHICH calibration
   * knob is off. The method-comparison summary [[blandAltman]] plots
   * and Deming regression fits; variances are population-form (/n),
   * per Lin 1989, spelled out as raw-moment algebra so both engines
   * run identical arithmetic.
   *
   * Scale shape: ONE sufficient-stats aggregation, map-only algebra.
   * Returns 1 row: (n, mean_x, mean_y, pearson_r, ccc, c_b,
   * scale_shift, location_shift).
   */
  def linCcc(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val a = df.where(x.isNotNull && y.isNotNull)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
    val mx = col("__sx") / col("__n")
    val my = col("__sy") / col("__n")
    val vx = col("__sxx") / col("__n") - mx * mx
    val vy = col("__syy") / col("__n") - my * my
    val cxy = col("__sxy") / col("__n") - mx * my
    // both columns the same constant ⇒ zero denominator: NULL, not an
    // ANSI DIVIDE_BY_ZERO crash (matching the other guarded outputs)
    val ccc = when(vx + vy + (mx - my) * (mx - my) > 0,
      lit(2.0) * cxy / (vx + vy + (mx - my) * (mx - my)))
    val r = cxy / sqrt(vx * vy)
    a.select(col("__n").cast("long").as("n"), mx.as("mean_x"),
      my.as("mean_y"),
      when(vx > 0 && vy > 0, r).as("pearson_r"), ccc.as("ccc"),
      when(vx > 0 && vy > 0 && abs(r) > 0, ccc / r).as("c_b"),
      when(vy > 0, sqrt(vx / vy)).as("scale_shift"),
      when(vx > 0 && vy > 0,
        (mx - my) / sqrt(sqrt(vx) * sqrt(vy))).as("location_shift"))
  }

  /**
   * Paired TOST (two one-sided tests) equivalence readout: for the
   * per-row difference d = x − y and a pre-registered margin δ, both
   * t_lower = (d̄ + δ)/se and t_upper = (δ − d̄)/se must clear the
   * one-sided critical value to declare |bias| < δ — the test that
   * can CONFIRM "the new pipeline matches the old one", which a
   * non-significant t-test never does. Emits the two t statistics
   * and df; the caller owns the critical-value lookup (p-values live
   * in [[graft.analysis.Stats]] on the Spark side only).
   *
   * Scale shape: ONE aggregation over the paired frame. Returns
   * 1 row: (n, mean_diff, sd_diff, se_diff, margin, t_lower,
   * t_upper).
   */
  def pairedTost(df: DataFrame, xCol: String, yCol: String,
      margin: Double): DataFrame = {
    require(margin > 0, s"TOST margin must be > 0, got $margin")
    val d = col(xCol).cast("double") - col(yCol).cast("double")
    val a = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(d.as("__d"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__d")).as("__s"), sum(col("__d") * col("__d")).as("__q"))
    val mean = col("__s") / col("__n")
    val sd = sqrt((col("__q") - col("__s") * col("__s") / col("__n")) /
      (col("__n") - 1))
    val se = sd / sqrt(col("__n"))
    a.select(col("__n").cast("long").as("n"), mean.as("mean_diff"),
      sd.as("sd_diff"), se.as("se_diff"), lit(margin).as("margin"),
      when(se > 0, (mean + lit(margin)) / se).as("t_lower"),
      when(se > 0, (lit(margin) - mean) / se).as("t_upper"))
  }

  /**
   * Lorenz decile table: the mass share held by each value decile —
   * the table a Lorenz curve plots, and the "top-10% holds X% of
   * spend" readout. Deciles cut at the EXACT interpolated quantiles
   * (the [[graft.analysis.AnalysisPlanner.exactPercentiles]] path —
   * one distributed value-count pass), mass buckets by
   * (q_{i−1}, q_i] membership, so ties land deterministically in the
   * lower decile on both engines. Returns 10 rows: (decile, n, total,
   * share, cum_share).
   */
  def lorenzDeciles(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val base = df.where(x.isNotNull).select(x.as("__x"))
      .localCheckpoint() // the quantile probe + the bucket scan read it
    val cuts = graft.analysis.AnalysisPlanner.exactPercentiles(
      base, "__x", (1 to 9).map(i => (s"q$i", i / 10.0)), Nil)
      .head()
    val qs = (1 to 9).map(i => cuts.getAs[Double](s"q$i"))
    // decile = count of cutpoints strictly below x (ties → lower bin)
    val dec = qs.foldLeft(lit(0L))((acc, q) =>
      acc + when(col("__x") > q, 1L).otherwise(0L))
    val tot = broadcast(base.agg(sum(col("__x")).as("__tt")))
    val per = base.select(dec.as("decile"), col("__x"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"))
      .crossJoin(tot)
      .withColumn("share", col("total") / col("__tt"))
    graft.analysis.PrefixSum.exclusive(
        per.drop("__tt"), "decile", Seq("share" -> "__exsh"))
      .select(col("decile"), col("n"), col("total"), col("share"),
        (col("__exsh") + col("share")).as("cum_share"))
      .orderBy("decile")
  }
  /**
   * Bilateral price-index panel between a base and current period —
   * Laspeyres (base-quantity weights), Paasche (current-quantity
   * weights), and Fisher (their geometric mean, the superlative
   * index): the standard "did prices move or did the mix move"
   * decomposition for spend dashboards. Per-item period price is the
   * quantity-weighted unit price Σrev/Σqty; only items TRADED IN BOTH
   * periods enter (matched-sample convention; dropped count
   * reported). Returns ONE row: (n_items, n_dropped, laspeyres,
   * paasche, fisher, value_ratio).
   *
   * Scale shape: one conditional-aggregation pass to the per-item
   * frame (base/current qty+revenue as when()-guarded sums), then a
   * 1-row reduce — no joins, no second scan.
   */
  def priceIndices(df: DataFrame, itemCol: String, qtyCol: String,
      revenueCol: String, basePeriod: Column): DataFrame = {
    val q = col(qtyCol).cast("double")
    val r = col(revenueCol).cast("double")
    val b = when(basePeriod, 1.0).otherwise(0.0)
    val per = df
      .where(col(itemCol).isNotNull && q.isNotNull && r.isNotNull &&
        q > 0)
      .groupBy(col(itemCol).as("__it"))
      .agg(sum(b * q).as("__q0"), sum(b * r).as("__r0"),
        sum((lit(1.0) - b) * q).as("__q1"),
        sum((lit(1.0) - b) * r).as("__r1"))
    val p0 = col("__r0") / col("__q0")
    val p1 = col("__r1") / col("__q1")
    val both = col("__q0") > 0 && col("__q1") > 0
    per.agg(
        sum(when(both, 1L).otherwise(0L)).as("n_items"),
        sum(when(!both, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(both, p1 * col("__q0"))).as("__l_num"),
        sum(when(both, p0 * col("__q0"))).as("__l_den"),
        sum(when(both, p1 * col("__q1"))).as("__p_num"),
        sum(when(both, p0 * col("__q1"))).as("__p_den"),
        sum(when(both, col("__r1"))).as("__v1"),
        sum(when(both, col("__r0"))).as("__v0"))
      .select(col("n_items"), col("n_dropped"),
        (col("__l_num") / col("__l_den")).as("laspeyres"),
        (col("__p_num") / col("__p_den")).as("paasche"),
        sqrt(col("__l_num") / col("__l_den") *
          (col("__p_num") / col("__p_den"))).as("fisher"),
        (col("__v1") / col("__v0")).as("value_ratio"))
  }

  /**
   * ABC (Pareto) classification of keys by value mass: keys whose
   * STRICTLY-ABOVE cumulative share is < cutA are class A, < cutB
   * class B, else C — the inventory 80/15/5 readout. Ties share the
   * same "above" mass (the strictly-above rule is order-free, so any
   * engine lands the same classes); per-key values are rounded to 6
   * decimals before the distinct-value frame so float summation order
   * can't split a tie. Returns one row per class: (abc_class, n_keys,
   * value_total, value_share).
   *
   * Scale shape: one corpus groupBy(key), one distinct-value prefix
   * sum ([[graft.analysis.PrefixSum]] — no single-partition window),
   * one ≤|distinct values|-row classify+reduce.
   */
  def abcClassification(df: DataFrame, keyCol: String, valueCol: String,
      cutA: Double = 0.8, cutB: Double = 0.95): DataFrame = {
    require(cutA > 0 && cutA < cutB && cutB < 1,
      s"abcClassification: 0 < cutA < cutB < 1, got ($cutA, $cutB)")
    val rev = df
      .where(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(round(sum(col(valueCol).cast("double")), 6).as("__v"))
    val vc = rev.groupBy((-col("__v")).as("__ns"))
      .agg(count(lit(1)).as("__k"), sum(col("__v")).as("__mass"))
    val ex = graft.analysis.PrefixSum.exclusive(vc, "__ns",
      Seq("__mass" -> "__above"))
    val tot = broadcast(ex.agg(sum(col("__mass")).as("__tot")))
    ex.crossJoin(tot)
      .withColumn("abc_class",
        when(col("__above") / col("__tot") < cutA, "A")
          .when(col("__above") / col("__tot") < cutB, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(sum(col("__k")).as("n_keys"),
        sum(col("__mass")).as("value_total"),
        (sum(col("__mass")) / max(col("__tot"))).as("value_share"))
  }

  /**
   * Tukey biweight robust location + midvariance (one-step, c = 9
   * MADs) next to the classical mean/sd: u = (x − med)/(9·MAD),
   * weights (1−u²)² vanish smoothly past 9 MADs, so a contaminated
   * tail moves these estimates far less than the moments. Median and
   * MAD are exact-DISC order statistics (engine-identical). Returns
   * ONE row: (n, mean, sd, median, mad, biweight_loc,
   * biweight_midvar).
   *
   * Scale shape: two distributed exact-percentile passes
   * (value-count PrefixSum) + one weighted reduce against the
   * broadcast med/MAD.
   */
  def biweightStats(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val base = df.where(x.isNotNull).select(x.as("__x")).localCheckpoint()
    val med = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(base, "__x", Seq("__med" -> 0.5), Nil))
    val absDev = base.crossJoin(med)
      .select(abs(col("__x") - col("__med")).as("__ad"))
    val mad = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(absDev, "__ad", Seq("__mad" -> 0.5), Nil))
    val u = (col("__x") - col("__med")) / (lit(9.0) * col("__mad"))
    val inside = abs(u) < 1 && col("__mad") > 0
    val w = (lit(1.0) - u * u) * (lit(1.0) - u * u)
    base.crossJoin(med).crossJoin(mad)
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__x")).as("mean"), stddev_samp(col("__x")).as("sd"),
        max(col("__med")).as("median"), max(col("__mad")).as("mad"),
        sum(when(inside, (col("__x") - col("__med")) * w)
          .otherwise(0.0)).as("__num"),
        sum(when(inside, w).otherwise(0.0)).as("__den"),
        sum(when(inside, (col("__x") - col("__med")) *
          (col("__x") - col("__med")) * w * w).otherwise(0.0))
          .as("__vnum"),
        sum(when(inside, (lit(1.0) - u * u) *
          (lit(1.0) - lit(5.0) * u * u)).otherwise(0.0)).as("__vden"))
      .select(col("__n").cast("long").as("n"), col("mean"), col("sd"),
        col("median"), col("mad"),
        when(col("__den") > 0,
          col("median") + col("__num") / col("__den"))
          .otherwise(col("median")).as("biweight_loc"),
        when(col("__vden") > 0,
          col("__n") * col("__vnum") /
            (col("__vden") * col("__vden"))).as("biweight_midvar"))
  }

  /**
   * Hotspot scan: which (dimension × dimension) cells have an outcome
   * rate most anomalously above/below the corpus rate, by the normal
   * z-score (p_cell − p₀)/√(p₀(1−p₀)/n_cell) over cells with at
   * least `minN` rows — the first-line "where is the anomaly
   * concentrated" drill-down. Returns the top-k cells by |z|:
   * (dim1, dim2, n, rate, overall_rate, z).
   *
   * Scale shape: one corpus groupBy over the bounded dimension cross,
   * one 1-row overall reduce broadcast, a cell-sized top-k sort.
   */
  def hotspotCells(df: DataFrame, dim1: Column, dim2: Column,
      outcome: Column, minN: Long = 30, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000 && minN >= 1, "hotspotCells: bad args")
    val base = df.select(dim1.as("__d1"), dim2.as("__d2"),
        when(outcome, 1.0).otherwise(0.0).as("__y"))
      .where(col("__d1").isNotNull && col("__d2").isNotNull)
      .localCheckpoint() // cells AND the overall rate read it
    val overall = broadcast(base.agg(avg(col("__y")).as("__p0")))
    base.groupBy("__d1", "__d2")
      .agg(count(lit(1)).as("n"), avg(col("__y")).as("rate"))
      .where(col("n") >= minN)
      .crossJoin(overall)
      .withColumn("z",
        when(col("__p0") > 0 && col("__p0") < 1,
          (col("rate") - col("__p0")) /
            sqrt(col("__p0") * (lit(1.0) - col("__p0")) /
              col("n"))))
      .select(col("__d1").as("dim1"), col("__d2").as("dim2"), col("n"),
        col("rate"), col("__p0").as("overall_rate"), col("z"))
      .orderBy(abs(col("z")).desc, col("dim1").asc, col("dim2").asc)
      .limit(k)
  }

  /**
   * Lorenz asymmetry coefficient S = F(μ) + L(μ) (Damgaard & Weiner):
   * the fraction of units below the mean plus the value share they
   * hold. S = 1 is a symmetric Lorenz curve; S < 1 means inequality
   * is driven by many small units, S > 1 by a few giants — the
   * direction a lone Gini can't give. Returns ONE row: (n, mean,
   * f_mu, l_mu, asymmetry).
   *
   * Scale shape: one 1-row mean reduce broadcast, one conditional
   * re-aggregation.
   */
  def lorenzAsymmetry(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val base = df.where(x.isNotNull && x > 0).select(x.as("__x"))
    val mu = broadcast(base.agg(avg(col("__x")).as("__mu")))
    base.crossJoin(mu)
      .agg(count(lit(1)).as("n"), max(col("__mu")).as("mean"),
        avg(when(col("__x") < col("__mu"), 1.0).otherwise(0.0))
          .as("f_mu"),
        (sum(when(col("__x") < col("__mu"), col("__x")).otherwise(0.0)) /
          sum(col("__x"))).as("l_mu"))
      .withColumn("asymmetry", col("f_mu") + col("l_mu"))
  }

  /**
   * Digit-heaping fraud/data-entry screen on a monetary column: the
   * last cent digit's χ² against uniform (Benford's first-digit law
   * says nothing about trailing digits — THOSE should be flat), plus
   * the round-number heaping shares (integer part ≡ 0 mod 5 / mod 10)
   * with their expected 0.2/0.1 baselines. Returns ONE row: (n,
   * chi2_last_digit, df, share_mod5, share_mod10).
   *
   * Scale shape: one conditional-count pass; the 10-cell digit frame
   * is implicit in the when-sums.
   */
  def digitHeaping(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val base = df.where(x.isNotNull && x >= 0)
      .select(x.as("__x"),
        pmod(round(x * 100).cast("long"), lit(10L)).as("__cd"),
        pmod(floor(x).cast("long"), lit(10L)).as("__id"))
    val cells = base.groupBy("__cd")
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = broadcast(cells.agg(sum(col("__n")).as("__t")))
    val chi2 = cells.crossJoin(tot)
      .agg(max(col("__t")).as("__t"),
        sum((col("__n") - col("__t") / 10) * (col("__n") - col("__t") / 10)
          / (col("__t") / 10)).as("chi2_last_digit"))
    val heaps = base.agg(
      avg(when(col("__id") % 5 === 0, 1.0).otherwise(0.0))
        .as("share_mod5"),
      avg(when(col("__id") === 0, 1.0).otherwise(0.0)).as("share_mod10"))
    chi2.crossJoin(heaps)
      .select(col("__t").cast("long").as("n"), col("chi2_last_digit"),
        lit(9L).as("df"), col("share_mod5"), col("share_mod10"))
  }

  /**
   * Closed-form distribution-fit panel for a positive feature:
   * exponential (rate 1/x̄), gamma by method of moments (k = x̄²/v,
   * θ = v/x̄), lognormal by exact log-moment MLE (μ̂, σ̂ of ln x) —
   * plus the observed population skewness next to each family's
   * implied skewness (exponential 2, gamma 2/√k, lognormal
   * (e^{σ²}+2)·√(e^{σ²}−1)), so the panel itself says which tail
   * story the data supports. All moments come from ONE pass of raw
   * power sums with explicit variance formulas (no engine-specific
   * stddev algorithm in the outputs). Returns ONE row.
   */
  def distributionFitPanel(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    df.where(x.isNotNull && x > 0).select(x.as("__x"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        sum(col("__x") * col("__x") * col("__x")).as("__s3"),
        sum(log(col("__x"))).as("__l1"),
        sum(log(col("__x")) * log(col("__x"))).as("__l2"))
      .withColumn("__m", col("__s1") / col("__n"))
      .withColumn("__v",
        (col("__s2") - col("__n") * col("__m") * col("__m")) /
          (col("__n") - 1))
      .withColumn("__mu", col("__l1") / col("__n"))
      .withColumn("__sig2",
        (col("__l2") - col("__n") * col("__mu") * col("__mu")) /
          (col("__n") - 1))
      .withColumn("__k", col("__m") * col("__m") / col("__v"))
      .select(col("__n").cast("long").as("n"), col("__m").as("mean"),
        col("__v").as("variance"),
        (lit(1.0) / col("__m")).as("exp_rate"),
        col("__k").as("gamma_shape"),
        (col("__v") / col("__m")).as("gamma_scale"),
        col("__mu").as("lognorm_mu"),
        sqrt(col("__sig2")).as("lognorm_sigma"),
        ((col("__s3") / col("__n") -
          lit(3.0) * col("__m") * (col("__s2") / col("__n")) +
          lit(2.0) * col("__m") * col("__m") * col("__m")) /
          pow(col("__s2") / col("__n") - col("__m") * col("__m"),
            lit(1.5))).as("skew_obs"),
        (lit(2.0) / sqrt(col("__k"))).as("skew_gamma"),
        ((exp(col("__sig2")) + 2) * sqrt(exp(col("__sig2")) - 1))
          .as("skew_lognormal"))
  }

  /**
   * Ridit analysis of an ordinal category across groups: each
   * category's ridit is its below-mass plus half its own mass in the
   * POOLED distribution (so the pooled mean ridit is exactly 0.5);
   * a group's mean ridit is the probability a random member of it
   * exceeds a random pooled observation (+½ ties) — the
   * Mann-Whitney-style effect size for ordered categories. Returns
   * one row per group: (group, n, mean_ridit).
   *
   * Scale shape: one corpus groupBy(category) for the pooled ridit
   * frame (category-bounded, prefix-summed, broadcast), one corpus
   * groupBy(group, category), one keyed join + reduce.
   */
  def riditAnalysis(df: DataFrame, groupCol: String, ordinalCol: String,
      ordinalKey: Column => Column = _.cast("double")): DataFrame = {
    val base = df
      .where(col(groupCol).isNotNull && col(ordinalCol).isNotNull)
      .select(col(groupCol).as("__g"), col(ordinalCol).as("__c"))
    val cats = base.groupBy("__c")
      .agg(count(lit(1)).cast("double").as("__n"))
      // the prefix sum needs a NUMERIC order image of the ordinal
      // (default: cast; label ordinals pass an extractor)
      .withColumn("__k", ordinalKey(col("__c")))
    val ridit = graft.analysis.PrefixSum.exclusive(cats, "__k",
        Seq("__n" -> "__below"))
      .crossJoin(broadcast(cats.agg(sum(col("__n")).as("__tot"))))
      .select(col("__c"),
        ((col("__below") + col("__n") / 2) / col("__tot")).as("__r"))
    base.groupBy("__g", "__c").agg(count(lit(1)).as("__gn"))
      .join(broadcast(ridit), Seq("__c"))
      .groupBy(col("__g").as(groupCol))
      .agg(sum(col("__gn")).as("n"),
        (sum(col("__gn") * col("__r")) / sum(col("__gn")))
          .as("mean_ridit"))
  }

  /**
   * Generalized-entropy inequality panel in ONE pass: GE(0) = mean
   * log deviation, GE(1) = Theil T, GE(2) = half the squared
   * coefficient of variation — the full α-sensitivity spectrum (GE(0)
   * weights the poor tail, GE(2) the rich tail; GE(1) sits between),
   * all from the same five sufficient statistics. Returns ONE row:
   * (n, mean, mld, theil_t, ge2).
   */
  def generalizedEntropy(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    df.where(x.isNotNull && x > 0).select(x.as("__x"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__s"),
        sum(log(col("__x"))).as("__sl"),
        sum(col("__x") * log(col("__x"))).as("__sxl"),
        sum(col("__x") * col("__x")).as("__s2"))
      .select(col("__n").cast("long").as("n"),
        (col("__s") / col("__n")).as("mean"),
        (log(col("__s") / col("__n")) - col("__sl") / col("__n"))
          .as("mld"),
        (col("__sxl") / col("__s") - log(col("__s") / col("__n")))
          .as("theil_t"),
        (((col("__s2") / col("__n")) /
          ((col("__s") / col("__n")) * (col("__s") / col("__n"))) -
          1) / 2).as("ge2"))
  }

  /**
   * Categorical-mix shift between the first and second half of the
   * observation window (split at the integer midpoint day — exact in
   * any engine): total-variation distance ½·Σ|p−q| (= the Duncan
   * dissimilarity index: the fraction of mass that must move to
   * equalize the mixes), the overlap coefficient Σ min(p,q) = 1 − TV,
   * and the L∞ gap — the bounded-support complements to the
   * PSI/KL/JS drift family (those explode on near-zero bins; TV
   * doesn't). Returns ONE row: (n_before, n_after, n_cats, tv,
   * overlap, max_gap).
   *
   * Scale shape: one 1-row min/max reduce broadcast for the split day,
   * one map-side-combined groupBy(category) with conditional halves,
   * one ≤|categories|-row reduce.
   */
  def categoricalShift(df: DataFrame, catCol: String,
      tsCol: String): DataFrame = {
    val base = df.where(col(catCol).isNotNull && col(tsCol).isNotNull)
      .select(col(catCol).as("__c"), to_date(col(tsCol)).as("__d"))
    val bounds = broadcast(base.agg(min(col("__d")).as("__lo"),
      max(col("__d")).as("__hi")))
    val cells = base.crossJoin(bounds)
      .withColumn("__cut",
        date_add(col("__lo"),
          (datediff(col("__hi"), col("__lo")) / 2).cast("int")))
      .groupBy("__c")
      .agg(sum(when(col("__d") <= col("__cut"), 1L).otherwise(0L))
        .as("__a"),
        sum(when(col("__d") > col("__cut"), 1L).otherwise(0L))
          .as("__b"))
    val tot = broadcast(cells.agg(
      sum(col("__a")).cast("double").as("__ta"),
      sum(col("__b")).cast("double").as("__tb")))
    cells.crossJoin(tot)
      .agg(max(col("__ta")).cast("long").as("n_before"),
        max(col("__tb")).cast("long").as("n_after"),
        count(lit(1)).as("n_cats"),
        (sum(abs(col("__a") / col("__ta") - col("__b") / col("__tb")))
          / 2).as("tv"),
        sum(least(col("__a") / col("__ta"), col("__b") / col("__tb")))
          .as("overlap"),
        max(abs(col("__a") / col("__ta") - col("__b") / col("__tb")))
          .as("max_gap"))
  }
}
