package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.PrefixSum

/**
 * Model-evaluation metrics over scored frames — the offline-eval side
 * of a feature/training-data platform: a model writes (label, score)
 * or (query, doc, relevance, score) columns and these operators grade
 * it. Complements the statistical-test family in
 * [[graft.analysis.AnalysisPlanner]] (which compares DISTRIBUTIONS;
 * these compare predictions to ground truth). Reference analog: the
 * metric surface of raise_/analytics/models.py stops at descriptive
 * statistics — model-eval metrics are part of the beyond-reference
 * training-pipeline surface.
 *
 * Scale design shared by every operator here: the corpus collapses to
 * per-distinct-score (or per-bin / per-category) sufficient statistics
 * first, and every cumulative quantity runs through
 * [[PrefixSum.exclusive]] — no unbounded single-partition window, no
 * driver-side collect on any data path. Rank-based quantities (AUC)
 * use integer-and-half-valued doubles throughout, so the rank algebra
 * is exact regardless of summation order.
 */
object Evaluation {

  /**
   * Binary-classifier metrics in one pass: ROC-AUC (tie-corrected
   * Mann–Whitney form), log-loss, and Brier score. Returns ONE row:
   * (n, n_pos, n_neg, auc, log_loss, brier).
   *
   * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum of AVERAGE
   * ranks of the positives — ties share the mean of their rank range,
   * making the estimator exactly the probability a random positive
   * outranks a random negative (ties count ½). Ranks come from an
   * exclusive prefix sum over the distinct-score frame: avg rank of a
   * tied group = (# strictly below) + (group size + 1)/2.
   *
   * `scoreCol` must be a probability in [0, 1] for log-loss/Brier to
   * be meaningful (AUC only uses order); probabilities are clamped to
   * [1e-15, 1−1e-15] inside the logs so degenerate 0/1 scores don't
   * produce infinities.
   */
  def binaryMetrics(df: DataFrame, labelCol: String, scoreCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val gs = groupCols.map(col)
    val base = df.select(gs :+ col(labelCol).cast("double").as("__y") :+
        col(scoreCol).cast("double").as("__p"): _*)
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val vc = base.groupBy(gs :+ col("__p").as("__s"): _*)
      .agg(sum(col("__y")).as("__pos"),
        count(lit(1)).cast("double").as("__tot"))
    // grouped: rank prefix sums run PER GROUP (hot groups still spread
    // over buckets — PrefixSum's groupCols path), so a per-segment AUC
    // is the same shuffle count as the corpus-level one
    val ranked = PrefixSum
      .exclusive(vc, "__s", Seq("__tot" -> "__ex"), groupCols = groupCols)
      .withColumn("__avgr", col("__ex") + (col("__tot") + 1) / lit(2.0))
    // log-loss/Brier from the SAME distinct-score frame (per score s:
    // __pos rows contribute −ln s̄ / (s−1)², the rest −ln(1−s̄) / s²) —
    // one corpus scan total, where a separate row-level avg branch
    // would re-scan the input just for the two probability metrics
    val pc = least(greatest(col("__s"), lit(1e-15)), lit(1.0 - 1e-15))
    val llTerm = -(col("__pos") * log(pc) +
      (col("__tot") - col("__pos")) * log(lit(1.0) - pc))
    val brTerm = col("__pos") * pow(col("__s") - 1.0, 2) +
      (col("__tot") - col("__pos")) * pow(col("__s"), 2)
    ranked
      .groupBy(gs: _*)
      .agg(sum(col("__pos") * col("__avgr")).as("__rpos"),
        sum(col("__pos")).as("__np"), sum(col("__tot")).as("__n"),
        sum(llTerm).as("__ll"), sum(brTerm).as("__br"))
      .select(gs ++ Seq(col("__n").cast("long").as("n"),
        col("__np").cast("long").as("n_pos"),
        (col("__n") - col("__np")).cast("long").as("n_neg"),
        ((col("__rpos") - col("__np") * (col("__np") + 1) / 2.0) /
          (col("__np") * (col("__n") - col("__np")))).as("auc"),
        (col("__ll") / col("__n")).as("log_loss"),
        (col("__br") / col("__n")).as("brier")): _*)
  }

  /**
   * Area under the precision–recall curve (average precision, step
   * interpolation): AP = Σ_k Δrecall_k · precision_k over distinct
   * score thresholds in DESCENDING order. Returns ONE row:
   * (n, n_pos, n_thresholds, pr_auc).
   *
   * At threshold s: TP(s) = positives with score ≥ s and predicted-
   * positive(s) = rows with score ≥ s, both read off one exclusive
   * prefix sum over the distinct-score frame ordered by NEGATED score
   * (ascending prefix of −s = "strictly above s" totals). Δrecall at s
   * is just pos_at(s)/n_pos, so each distinct score self-contains its
   * AP contribution — one shuffle, one ≤|distinct|-row reduce.
   */
  def prAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val vc = base.groupBy((-col("__p")).as("__ns"))
      .agg(sum(col("__y")).as("__pos"),
        count(lit(1)).cast("double").as("__tot"))
    val pre = PrefixSum.exclusive(vc, "__ns",
        Seq("__pos" -> "__pabove", "__tot" -> "__tabove"))
      .join(broadcast(base.agg(sum(col("__y")).as("__P"),
        count(lit(1)).cast("double").as("__N"))))
    pre
      .agg(max(col("__N")).as("__n"), max(col("__P")).as("__np"),
        count(lit(1)).as("n_thresholds"),
        sum((col("__pos") / col("__P")) *
          ((col("__pabove") + col("__pos")) /
            (col("__tabove") + col("__tot")))).as("pr_auc"))
      .select(col("__n").cast("long").as("n"),
        col("__np").cast("long").as("n_pos"),
        col("n_thresholds"), col("pr_auc"))
  }

  /**
   * Reliability curve + expected calibration error: predictions binned
   * into `bins` equal-width probability bins; per bin the mean
   * predicted probability vs the observed positive rate, plus the
   * corpus ECE = Σ (n_b/N)·|mean_score_b − mean_label_b| repeated on
   * every row (the per-bin frame IS the report). Returns ≤ `bins`
   * rows: (bin, n, mean_score, mean_label, gap, ece).
   */
  def calibrationCurve(df: DataFrame, labelCol: String, scoreCol: String,
      bins: Int = 10): DataFrame = {
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val binned = base
      .groupBy(least(floor(col("__p") * bins), lit(bins - 1L))
        .cast("long").as("bin"))
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__p")).as("mean_score"), avg(col("__y")).as("mean_label"))
      // NOTE: aliases here must differ case-insensitively from "__n" —
      // Spark resolves column names case-insensitively by default
      .join(broadcast(base.agg(count(lit(1)).cast("double").as("__ntot"))))
      .withColumn("gap", abs(col("mean_score") - col("mean_label")))
    binned
      .join(broadcast(binned.agg(
        sum(col("__n") / col("__ntot") * col("gap")).as("ece"))))
      .select(col("bin"), col("__n").cast("long").as("n"),
        col("mean_score"), col("mean_label"), col("gap"), col("ece"))
  }

  /**
   * Decile lift / gains table for a scored binary outcome: rows are
   * bucketed into `buckets` score bands from HIGHEST score down, and
   * each band reports its positive rate, lift over the base rate, and
   * the cumulative share of all positives captured so far (the gains
   * curve). Returns ≤ `buckets` rows:
   * (bucket, n, n_pos, rate, lift, cum_gain, cum_pct).
   *
   * Buckets are assigned per DISTINCT score from the count of strictly
   * higher-scored rows (floor(above·B/N), capped at B−1) — fully
   * deterministic under ties, unlike ntile() whose tie split depends
   * on physical row order. All counts stay integral doubles, so bucket
   * boundaries are exact. The cumulative pass runs over the ≤B-row
   * bucket frame via a second [[PrefixSum.exclusive]].
   */
  def liftTable(df: DataFrame, labelCol: String, scoreCol: String,
      buckets: Int = 10): DataFrame = {
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val vc = base.groupBy((-col("__p")).as("__ns"))
      .agg(sum(col("__y")).as("__pos"),
        count(lit(1)).cast("double").as("__tot"))
    val banded = PrefixSum.exclusive(vc, "__ns", Seq("__tot" -> "__above"))
      .join(broadcast(base.agg(count(lit(1)).cast("double").as("__ntot"),
        sum(col("__y")).as("__ptot"))))
      .groupBy(least(floor(col("__above") * buckets / col("__ntot")),
        lit(buckets - 1L)).cast("long").as("bucket"))
      .agg(sum(col("__tot")).as("__n"), sum(col("__pos")).as("__npos"),
        max(col("__ntot")).as("__ntot"), max(col("__ptot")).as("__ptot"))
    PrefixSum.exclusive(banded, "bucket",
        Seq("__n" -> "__cn", "__npos" -> "__cp"))
      .select(col("bucket"), col("__n").cast("long").as("n"),
        col("__npos").cast("long").as("n_pos"),
        (col("__npos") / col("__n")).as("rate"),
        ((col("__npos") / col("__n")) / (col("__ptot") / col("__ntot")))
          .as("lift"),
        ((col("__cp") + col("__npos")) / col("__ptot")).as("cum_gain"),
        ((col("__cn") + col("__n")) / col("__ntot")).as("cum_pct"))
  }

  /**
   * Cohen's kappa — chance-corrected agreement between two categorical
   * columns (two raters, or a model vs a heuristic labeler):
   * κ = (p_o − p_e)/(1 − p_e) with p_o the observed agreement rate and
   * p_e = Σ_k p_A(k)·p_B(k) the agreement expected from the marginals.
   * Returns ONE row: (n, po, pe, kappa).
   *
   * Scale shape mirrors [[graft.analysis.AnalysisPlanner.cramersV]]:
   * one joint groupBy (≤ R·C rows), marginals re-aggregated from the
   * joint frame and joined back broadcast — one scan of the corpus,
   * no dense grid.
   */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val joint = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val ma = joint.groupBy(col("__a").as("__k")).agg(sum("__n").as("__na"))
    val mb = joint.groupBy(col("__b").as("__k")).agg(sum("__n").as("__nb"))
    val tot = joint.agg(sum("__n").as("__N"),
      sum(when(col("__a") === col("__b"), col("__n"))
        .otherwise(lit(0.0))).as("__agree"))
    ma.join(mb, Seq("__k"))
      .agg(sum(col("__na") * col("__nb")).as("__cross"))
      .join(broadcast(tot))
      .select(col("__N").cast("long").as("n"),
        (col("__agree") / col("__N")).as("po"),
        (col("__cross") / (col("__N") * col("__N"))).as("pe"))
      .withColumn("kappa",
        (col("po") - col("pe")) / (lit(1.0) - col("pe")))
  }

  /**
   * Two-rater chance-corrected agreement BEYOND Cohen: Scott's π
   * (chance from the POOLED marginal — rater-symmetric, the two-rater
   * [[fleissKappa]]) and Gwet's AC1 (chance from category
   * prevalence-instability, 1/(Q−1)·Σ π_q(1−π_q) — robust to the
   * "high agreement, extreme prevalence, kappa near zero" paradox
   * that makes Cohen/Scott unusable on skewed label sets). Same
   * observed agreement po as [[cohenKappa]]; only the chance model
   * differs. Returns ONE row:
   * (n, n_categories, po, pe_scott, scott_pi, pe_gwet, gwet_ac1).
   *
   * Scale shape: [[cohenKappa]]'s exactly — one joint groupBy, pooled
   * marginals re-aggregated from the joint frame, 1-row algebra.
   */
  def gwetScottAgreement(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val joint = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val ma = joint.groupBy(col("__a").as("__k")).agg(sum("__n").as("__na"))
    val mb = joint.groupBy(col("__b").as("__k")).agg(sum("__n").as("__nb"))
    val pooled = ma.join(mb, Seq("__k"), "full_outer")
      .select(coalesce(col("__na"), lit(0.0)).as("__na"),
        coalesce(col("__nb"), lit(0.0)).as("__nb"))
    val tot = joint.agg(sum("__n").as("__N"),
      sum(when(col("__a") === col("__b"), col("__n"))
        .otherwise(lit(0.0))).as("__agree"))
    pooled
      .agg(count(lit(1)).cast("double").as("__Q"),
        sum(pow((col("__na") + col("__nb")), 2)).as("__sq2"),
        sum(col("__na") + col("__nb")).as("__m"))
      .join(broadcast(tot))
      // π_q = pooled share of category q; Σπ_q² from Σ(na+nb)²/(2N)²
      .select(col("__N").cast("long").as("n"),
        col("__Q").cast("long").as("n_categories"),
        (col("__agree") / col("__N")).as("po"),
        (col("__sq2") / (lit(4.0) * col("__N") * col("__N")))
          .as("pe_scott"),
        // Σ π_q(1−π_q) = 1 − Σπ_q²
        when(col("__Q") > 1,
          (lit(1.0) - col("__sq2") / (lit(4.0) * col("__N") * col("__N")))
            / (col("__Q") - 1)).as("pe_gwet"))
      .withColumn("scott_pi", when(col("pe_scott") < 1,
        (col("po") - col("pe_scott")) / (lit(1.0) - col("pe_scott"))))
      .withColumn("gwet_ac1", when(col("pe_gwet") < 1,
        (col("po") - col("pe_gwet")) / (lit(1.0) - col("pe_gwet"))))
      .select(col("n"), col("n_categories"), col("po"),
        col("pe_scott"), col("scott_pi"), col("pe_gwet"),
        col("gwet_ac1"))
  }

  /**
   * NDCG@k per query group over (query, doc, relevance, score) rows —
   * the ranking-quality metric for retrieval / recommendation eval.
   * Returns one row per query: (query, n_docs, dcg, idcg, ndcg).
   *
   * DCG@k = Σ_{rank≤k} (2^rel − 1)/log2(rank + 1) with rank by score
   * descending; IDCG is the same sum under the ideal (relevance-
   * descending) ordering. Both rankings break ties by `idCol` so the
   * result is deterministic under score/relevance ties. The windows
   * are PARTITIONED by query — per-group state only, no global sort.
   */
  def ndcgAtK(df: DataFrame, queryCol: String, idCol: String,
      relCol: String, scoreCol: String, k: Int = 10): DataFrame = {
    val rel = col(relCol).cast("double")
    val wS = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).cast("double").desc, col(idCol).asc)
    val wI = Window.partitionBy(col(queryCol))
      .orderBy(rel.desc, col(idCol).asc)
    val gain = pow(lit(2.0), rel) - 1.0
    df.select(col(queryCol).as("query"), gain.as("__g"),
        row_number().over(wS).as("__rs"), row_number().over(wI).as("__ri"))
      .groupBy("query")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__rs") <= k,
          col("__g") / log(2.0, col("__rs") + 1)).otherwise(lit(0.0)))
          .as("dcg"),
        sum(when(col("__ri") <= k,
          col("__g") / log(2.0, col("__ri") + 1)).otherwise(lit(0.0)))
          .as("idcg"))
      .withColumn("ndcg",
        when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(lit(0.0)))
  }

  /**
   * Binary-relevance ranking metrics per query group over
   * (query, doc, relevant, score) rows: MRR, MAP@k, precision@k and
   * recall@k — the retrieval-eval companions to [[ndcgAtK]]
   * (reference surface: raise_/analytics/analysis.py model-eval
   * family). Returns one row per query:
   * (query, n_docs, n_rel, mrr, map_k, precision_k, recall_k).
   *
   *  - rank is by score descending, ties broken by `idCol` ascending,
   *    so both engines order identically;
   *  - MRR = 1/rank of the first relevant doc (0 if none);
   *  - AP@k = Σ_{rel docs at rank r≤k} (cum_rel(r)/r) / min(n_rel, k);
   *  - precision@k counts relevant in the top k over k; recall@k over
   *    n_rel. Queries with no relevant docs report 0 for all four.
   *
   * Scale: one window partitioned BY QUERY (rank + running relevant
   * count share the same ordering, so Catalyst evaluates both in one
   * Window operator — a single per-group sort, no global sort), then
   * one groupBy. Per-query state is bounded by that query's doc list.
   */
  def rankingMetrics(df: DataFrame, queryCol: String, idCol: String,
      relCol: String, scoreCol: String, k: Int = 10): DataFrame = {
    val rel = col(relCol).cast("double")
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).cast("double").desc, col(idCol).asc)
    val ranked = df.select(col(queryCol).as("query"), rel.as("__rel"),
      row_number().over(w).as("__r"),
      sum(rel).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("__cum"))
    ranked.groupBy("query")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__rel")).cast("long").as("n_rel"),
        coalesce(max(when(col("__rel") > 0, lit(1.0) / col("__r"))),
          lit(0.0)).as("mrr"),
        sum(when(col("__rel") > 0 && col("__r") <= k,
          col("__cum") / col("__r")).otherwise(lit(0.0))).as("__apnum"),
        sum(when(col("__r") <= k, col("__rel")).otherwise(lit(0.0)))
          .as("__relk"))
      .select(col("query"), col("n_docs"), col("n_rel"),
        col("mrr"),
        when(col("n_rel") > 0,
          col("__apnum") / least(col("n_rel").cast("double"), lit(k.toDouble)))
          .otherwise(lit(0.0)).as("map_k"),
        (col("__relk") / lit(k.toDouble)).as("precision_k"),
        when(col("n_rel") > 0, col("__relk") / col("n_rel"))
          .otherwise(lit(0.0)).as("recall_k"))
  }

  /**
   * Sample autocorrelation function at lags 1..maxLag over a regular
   * series (one row per `timeCol` value, e.g. a daily aggregate):
   * r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)², the standard
   * biased ACF estimator (denominator over the FULL series, so r_k is
   * a proper correlogram and |r_k| ≤ 1). Returns maxLag rows:
   * (lag, n_pairs, acf).
   *
   * Scale shape: mean/denominator from one 1-row broadcast aggregate;
   * the lagged pairs come from a keyed equi-join of the series against
   * itself on t + lag (the small lag list is broadcast-exploded onto
   * the left side) — no window at all, shuffle keyed by time.
   */
  def acf(df: DataFrame, timeCol: String, valueCol: String,
      maxLag: Int = 7): DataFrame = {
    val s = df.select(col(timeCol).cast("double").as("__t"),
      col(valueCol).cast("double").as("__x"))
    val stats = s.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__x") * col("__x")).as("__sxx"))
      .select((col("__sx") / col("__n")).as("__m"),
        (col("__sxx") - col("__sx") * col("__sx") / col("__n")).as("__den"))
    val lags = df.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("double").as("__lag"))
    val rhs = s.select(col("__t").as("__t2"), col("__x").as("__x2"))
    s.crossJoin(broadcast(lags))
      .withColumn("__tk", col("__t") + col("__lag"))
      .join(rhs, col("__tk") === col("__t2"))
      .join(broadcast(stats))
      .groupBy(col("__lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum((col("__x") - col("__m")) * (col("__x2") - col("__m"))) /
          max(col("__den"))).as("acf"))
  }

  /**
   * Pinball (quantile) loss of a quantile forecast: mean over rows of
   * q·(y−ŷ) when y ≥ ŷ else (1−q)·(ŷ−y) — the proper scoring rule a
   * τ-quantile forecast minimizes. Grouped by `groupCols` (empty =
   * corpus-level). Returns (groupCols…, n, mean_pinball, coverage)
   * where coverage = share of rows with y ≤ ŷ (should approach q for a
   * calibrated forecast). One aggregate, map-only before it.
   */
  def pinballLoss(df: DataFrame, yCol: String, predCol: String, q: Double,
      groupCols: Seq[String] = Nil): DataFrame = {
    val y = col(yCol).cast("double")
    val p = col(predCol).cast("double")
    val loss = when(y >= p, lit(q) * (y - p))
      .otherwise(lit(1.0 - q) * (p - y))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), avg(loss).as("mean_pinball"),
        avg(when(y <= p, lit(1.0)).otherwise(lit(0.0))).as("coverage"))
  }

  /**
   * CUPED variance reduction (Deng et al., WSDM'13 shape): adjust an
   * experiment metric y by a pre-experiment covariate x via
   * y' = y − θ(x − x̄) with θ = cov(y,x)/var(x) estimated POOLED across
   * all rows. Returns one row per `groupCol` value (experiment arm):
   * (group, n, mean_raw, mean_adj, theta, var_reduction) — theta and
   * var_reduction (1 − var(y')/var(y), population moments) are
   * corpus-level and repeat on every row.
   *
   * Scale shape: one 1-row moment aggregate (n, Σx, Σy, Σxx, Σxy, Σyy)
   * broadcast into a per-group aggregate — two scans, no window, no
   * per-row adjusted column materialized (means adjust algebraically:
   * mean_adj_g = mean_y_g − θ(mean_x_g − x̄)).
   */
  def cuped(df: DataFrame, groupCol: String, yCol: String,
      xCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("group"),
      col(yCol).cast("double").as("__y"), col(xCol).cast("double").as("__x"))
    val glob = base
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy"))
      .select((col("__sx") / col("__n")).as("__mx"),
        ((col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")))
          .as("theta"),
        ((col("__syy") - col("__sy") * col("__sy") / col("__n")) / col("__n"))
          .as("__vary"),
        ((col("__sxy") - col("__sx") * col("__sy") / col("__n")) *
          (col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")) /
          col("__n")).as("__covterm"))
    base.groupBy("group")
      .agg(count(lit(1)).as("n"), avg(col("__y")).as("mean_raw"),
        avg(col("__x")).as("__mxg"))
      .join(broadcast(glob))
      .select(col("group"), col("n"), col("mean_raw"),
        (col("mean_raw") - col("theta") * (col("__mxg") - col("__mx")))
          .as("mean_adj"),
        col("theta"),
        (col("__covterm") / col("__vary")).as("var_reduction"))
  }

  /**
   * Cross-correlation function between two aligned regular series x, y
   * at lags −maxLag..maxLag: r_xy(k) = Σ_t (x_t − x̄)(y_{t+k} − ȳ) /
   * √(Σ(x−x̄)² · Σ(y−ȳ)²), the lead/lag diagnostic ("do clicks lead
   * purchases by two days?"). Means and denominators come from the
   * FULL series (one 1-row broadcast aggregate, [[acf]]'s estimator
   * shape), the numerator from a keyed self-join on t + k with the
   * small lag list broadcast-exploded — no window, one time-keyed
   * shuffle. Returns (lag, n_pairs, ccf), positive lag = x leads y.
   */
  def crossCorrelation(df: DataFrame, timeCol: String, xCol: String,
      yCol: String, maxLag: Int = 7): DataFrame = {
    val s = df.select(col(timeCol).cast("double").as("__t"),
      col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
    val stats = s.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y")).as("__sy"), sum(col("__y") * col("__y")).as("__syy"))
      .select((col("__sx") / col("__n")).as("__mx"),
        (col("__sy") / col("__n")).as("__my"),
        sqrt((col("__sxx") - col("__sx") * col("__sx") / col("__n")) *
          (col("__syy") - col("__sy") * col("__sy") / col("__n")))
          .as("__den"))
    val lags = df.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("double").as("__lag"))
    val rhs = s.select(col("__t").as("__t2"), col("__y").as("__y2"))
    s.crossJoin(broadcast(lags))
      .withColumn("__tk", col("__t") + col("__lag"))
      .join(rhs, col("__tk") === col("__t2"))
      .join(broadcast(stats))
      .groupBy(col("__lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum((col("__x") - col("__mx")) * (col("__y2") - col("__my"))) /
          max(col("__den"))).as("ccf"))
  }

  /**
   * Covariate balance between two groups: standardized mean difference
   * SMD = (x̄_a − x̄_b)/√((s²_a + s²_b)/2) per covariate — the
   * experiment-readout / matching diagnostic (|SMD| < 0.1 is the usual
   * "balanced" bar). ONE aggregation computes every covariate's
   * per-group moments (2k sums in a single scan — never k passes);
   * the group rows then pivot against each other in a 1×1 crossJoin.
   * Returns one row per covariate:
   * (covariate, n_a, n_b, mean_a, mean_b, var_a, var_b, smd).
   */
  def covariateBalance(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty, "no covariates")
    val base = df.where(col(groupCol).isin(groupA, groupB))
    val aggs = Seq(count(lit(1)).as("__n")) ++
      covariates.zipWithIndex.flatMap { case (c, i) =>
        val v = col(c).cast("double")
        Seq(avg(v).as(s"__m$i"), var_samp(v).as(s"__v$i"))
      }
    val g = base.groupBy(col(groupCol).as("__g"))
      .agg(aggs.head, aggs.tail: _*)
    val a = g.where(col("__g") === groupA)
    val b = g.where(col("__g") === groupB)
      .select(col("__n").as("__nb") +: covariates.indices.flatMap(i =>
        Seq(col(s"__m$i").as(s"__mb$i"), col(s"__v$i").as(s"__vb$i"))): _*)
    val wide = a.crossJoin(broadcast(b))
    val perCov = covariates.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("covariate"),
        col("__n").as("n_a"), col("__nb").as("n_b"),
        col(s"__m$i").as("mean_a"), col(s"__mb$i").as("mean_b"),
        col(s"__v$i").as("var_a"), col(s"__vb$i").as("var_b"))
    }
    wide.select(explode(array(perCov: _*)).as("s"))
      .select(col("s.covariate"), col("s.n_a"), col("s.n_b"),
        col("s.mean_a"), col("s.mean_b"), col("s.var_a"), col("s.var_b"),
        // a covariate constant in BOTH groups has no scale — NULL, not
        // a divide-by-zero (ANSI mode makes 0/0 an error, not NaN)
        when(col("s.var_a") + col("s.var_b") > 0.0,
          (col("s.mean_a") - col("s.mean_b")) /
            sqrt((col("s.var_a") + col("s.var_b")) / 2.0)).as("smd"))
  }

  /**
   * Difference-in-differences: the 2×2 (group × pre/post) causal
   * estimate DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), with
   * the large-sample SE from the four cell variances
   * (√Σ s²ᵢ/nᵢ — independent-cells normal approximation). ONE
   * conditional aggregation computes all four cells' (n, mean, var) in
   * a single scan of the input — `avg(when(cell, y))` per cell, the
   * [[covariateBalance]] pattern — then 1-row algebra. (The previous
   * shape re-ran the cell aggregation once per crossJoin branch: four
   * full input scans; at 100 TB that is 4× the IO for the same 4
   * numbers.) Returns 1 row: (mean_treat_pre, mean_treat_post,
   * mean_ctrl_pre, mean_ctrl_post, did, se, t_stat).
   */
  def diffInDiff(df: DataFrame, groupCol: String, treatGroup: String,
      controlGroup: String, postCol: Column, valueCol: String): DataFrame = {
    val y = col(valueCol).cast("double")
    val base = df
      .where(col(groupCol).isin(treatGroup, controlGroup) && y.isNotNull)
      .select(col(groupCol).as("__g"), postCol.cast("boolean").as("__p"),
        y.as("__y"))
    def cell(g: String, p: Boolean, out: String): Seq[Column] = {
      val in = col("__g") === g && col("__p") === p
      Seq(avg(when(in, col("__y"))).as(out),
        (var_samp(when(in, col("__y"))) /
          count(when(in, lit(1))).cast("double")).as(s"__se_$out"))
    }
    val aggs =
      cell(treatGroup, p = false, "mean_treat_pre") ++
        cell(treatGroup, p = true, "mean_treat_post") ++
        cell(controlGroup, p = false, "mean_ctrl_pre") ++
        cell(controlGroup, p = true, "mean_ctrl_post")
    base.agg(aggs.head, aggs.tail: _*)
      .withColumn("did",
        (col("mean_treat_post") - col("mean_treat_pre")) -
          (col("mean_ctrl_post") - col("mean_ctrl_pre")))
      .withColumn("se", sqrt(
        col("__se_mean_treat_pre") + col("__se_mean_treat_post") +
          col("__se_mean_ctrl_pre") + col("__se_mean_ctrl_post")))
      .withColumn("t_stat", col("did") / col("se"))
      .drop("__se_mean_treat_pre", "__se_mean_treat_post",
        "__se_mean_ctrl_pre", "__se_mean_ctrl_post")
  }

  /**
   * Event-study difference-in-differences: [[diffInDiff]] unrolled over
   * TIME — for every period p ≠ `basePeriod`, the effect
   * (treat_p − treat_base) − (ctrl_p − ctrl_base) with its four-cell
   * SE. Pre-period rows (placebo effects ≈ 0) are the parallel-trends
   * diagnostic; post-period rows trace the effect's dynamics — the
   * standard readout before trusting a pooled DiD number.
   *
   * Shape: ONE conditional aggregation produces every (period, arm)
   * cell; the base-period row broadcasts back onto the ≤periods-row
   * cell frame (checkpointed — it feeds both sides). Corpus is
   * scanned once, period count bounds everything after.
   */
  def eventStudy(df: DataFrame, groupCol: String, treatGroup: String,
      controlGroup: String, periodCol: String, valueCol: String,
      basePeriod: Any): DataFrame = {
    val y = col(valueCol).cast("double")
    val isT = col("__g") === treatGroup
    val isC = col("__g") === controlGroup
    val cells = df
      .where(col(groupCol).isin(treatGroup, controlGroup) && y.isNotNull)
      .select(col(groupCol).as("__g"), col(periodCol).as("period"),
        y.as("__y"))
      .groupBy(col("period"))
      .agg(count(when(isT, lit(1))).as("n_treat"),
        avg(when(isT, col("__y"))).as("mean_treat"),
        (var_samp(when(isT, col("__y"))) /
          count(when(isT, lit(1))).cast("double")).as("__vmt"),
        count(when(isC, lit(1))).as("n_ctrl"),
        avg(when(isC, col("__y"))).as("mean_ctrl"),
        (var_samp(when(isC, col("__y"))) /
          count(when(isC, lit(1))).cast("double")).as("__vmc"))
      .localCheckpoint() // ≤ periods rows; base row + join both read it
    // limit(1) states the ≤1-row bound in the PLAN: the checkpoint
    // erased the aggregate lineage, so without it the scale lint (and
    // any reader of the plan) sees an unbounded broadcast side
    val base = cells.where(col("period") === lit(basePeriod))
      .select(col("mean_treat").as("__bt"), col("mean_ctrl").as("__bc"),
        col("__vmt").as("__bvt"), col("__vmc").as("__bvc"))
      .limit(1)
    cells.where(col("period") =!= lit(basePeriod))
      .crossJoin(broadcast(base))
      .withColumn("effect",
        (col("mean_treat") - col("__bt")) -
          (col("mean_ctrl") - col("__bc")))
      .withColumn("se", sqrt(col("__vmt") + col("__bvt") +
        col("__vmc") + col("__bvc")))
      .withColumn("t_stat", when(col("se") > 0, col("effect") / col("se")))
      .select(col("period"), col("n_treat"), col("n_ctrl"),
        col("mean_treat"), col("mean_ctrl"), col("effect"), col("se"),
        col("t_stat"))
  }

  /**
   * Sharp regression-discontinuity estimate: local linear fits on each
   * side of `cutoff` within `bandwidth` of it (running variable
   * centered at the cutoff, so each side's intercept IS its boundary
   * prediction), effect = right-limit − left-limit, with the classical
   * OLS intercept SEs combined. The observational-causal readout for
   * threshold-assigned treatments (score cutoffs, eligibility rules) —
   * sits beside [[diffInDiff]] / [[propensityStratification]] in the
   * experimentation family.
   *
   * ONE conditional aggregation over the bandwidth window (both sides'
   * five moments + Σy² in the same scan — the diffInDiff discipline:
   * no join, no rescan); everything after is closed-form arithmetic on
   * the 1-row frame. Sides with < 3 points return NULL estimates
   * (slope/σ² undefined) instead of ANSI division errors.
   */
  def rddEstimate(df: DataFrame, runningCol: String, outcomeCol: String,
      cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0, "bandwidth must be positive")
    val x0 = col(runningCol).cast("double") - lit(cutoff)
    val y0 = col(outcomeCol).cast("double")
    val base = df
      .where(x0.isNotNull && y0.isNotNull &&
        x0 >= -bandwidth && x0 < bandwidth)
      .select((x0 >= 0).as("__r"), x0.as("__x"), y0.as("__y"))
    def side(right: Boolean, tag: String): Seq[Column] = {
      val in = col("__r") === right
      Seq(
        count(when(in, lit(1))).as(s"__n$tag"),
        sum(when(in, col("__x"))).as(s"__sx$tag"),
        sum(when(in, col("__y"))).as(s"__sy$tag"),
        sum(when(in, col("__x") * col("__x"))).as(s"__sxx$tag"),
        sum(when(in, col("__x") * col("__y"))).as(s"__sxy$tag"),
        sum(when(in, col("__y") * col("__y"))).as(s"__syy$tag"))
    }
    val aggs = side(right = false, "l") ++ side(right = true, "r")
    def fit(tag: String): Seq[(String, Column)] = {
      val n = col(s"__n$tag").cast("double")
      val sx = col(s"__sx$tag"); val sy = col(s"__sy$tag")
      val sxx = col(s"__sxx$tag"); val sxy = col(s"__sxy$tag")
      val syy = col(s"__syy$tag")
      val den = n * sxx - sx * sx
      // every division sits under an explicit n/den guard: a degenerate
      // side must surface as NULL, not an ANSI DIVIDE_BY_ZERO
      val ok = col(s"__n$tag") >= 3 && den =!= 0
      val slope = when(ok, (n * sxy - sx * sy) / den)
      val icept = when(ok, (sy - slope * sx) / n)
      // residual variance off the same moments; intercept variance =
      // sigma2 * Sxx / (n * den) (centered-x OLS algebra)
      val sigma2 = when(ok, (syy - sy * sy / n - slope * slope *
        (sxx - sx * sx / n)) / (n - 2))
      val varI = when(ok, sigma2 * sxx / den)
      Seq(s"slope_$tag" -> slope, s"at_cutoff_$tag" -> icept,
        s"__vi$tag" -> varI)
    }
    val fits = fit("l") ++ fit("r")
    fits.foldLeft(base.agg(aggs.head, aggs.tail: _*)) {
        case (acc, (name, c)) => acc.withColumn(name, c)
      }
      .withColumn("effect", col("at_cutoff_r") - col("at_cutoff_l"))
      .withColumn("se", sqrt(col("__vil") + col("__vir")))
      // a noise-free fit has se = 0 — NULL t, not an ANSI zero-division
      .withColumn("t_stat", when(col("se") > 0, col("effect") / col("se")))
      .select(col("__nl").as("n_left"), col("__nr").as("n_right"),
        col("slope_l"), col("slope_r"), col("at_cutoff_l"),
        col("at_cutoff_r"), col("effect"), col("se"), col("t_stat"))
  }

  /**
   * Uplift by segment — the heterogeneous-treatment-effect readout:
   * per segment, treatment/control counts, means, the uplift
   * (difference in means), its Welch SE, and the t statistic. ONE
   * conditional aggregation per segment — `agg(when(arm, …))` for both
   * arms in the same scan, no t-vs-c self-join (the join shape executed
   * the cells aggregation twice). Segments present in only one arm drop
   * out (post-agg filter, same semantics as the old inner join) — no
   * half-cell rows masquerading as effects.
   */
  def upliftBySegment(df: DataFrame, armCol: String, treatArm: String,
      controlArm: String, segmentCol: String,
      valueCol: String): DataFrame = {
    val y = col(valueCol).cast("double")
    val isT = col("__a") === treatArm
    val isC = col("__a") === controlArm
    df.where(col(armCol).isin(treatArm, controlArm) && y.isNotNull)
      .select(col(segmentCol).as("segment"), col(armCol).as("__a"),
        y.as("__y"))
      .groupBy(col("segment"))
      .agg(count(when(isT, lit(1))).as("n_treat"),
        avg(when(isT, col("__y"))).as("mean_treat"),
        var_samp(when(isT, col("__y"))).as("__vt"),
        count(when(isC, lit(1))).as("n_ctrl"),
        avg(when(isC, col("__y"))).as("mean_ctrl"),
        var_samp(when(isC, col("__y"))).as("__vc"))
      .where(col("n_treat") > 0 && col("n_ctrl") > 0)
      .withColumn("uplift", col("mean_treat") - col("mean_ctrl"))
      .withColumn("se", sqrt(col("__vt") / col("n_treat") +
        col("__vc") / col("n_ctrl")))
      .withColumn("t_stat", col("uplift") / col("se"))
      .drop("__vt", "__vc")
  }

  /**
   * Minimum detectable effect at current sample sizes — the
   * experiment-sizing readout: per segment, the smallest true
   * difference in means a two-sample z test would detect with the
   * given significance and power, from the observed per-arm variances.
   * `MDE = (z_{α/2} + z_β) · √(v_t/n_t + v_c/n_c)`, reported absolute
   * and relative to the control mean. `zAlpha`/`zPower` are the
   * standard-normal quantiles Φ⁻¹(1−α/2) and Φ⁻¹(power); the defaults
   * are the canonical α=0.05 two-sided / 80 %-power pair. ONE
   * conditional aggregation per segment (both arms in one scan, the
   * same single-Aggregate shape as [[upliftBySegment]]); segments
   * missing an arm drop out post-agg, matching the old inner join.
   */
  def minDetectableEffect(df: DataFrame, armCol: String,
      treatArm: String, controlArm: String, segmentCol: String,
      valueCol: String, zAlpha: Double = 1.959964,
      zPower: Double = 0.841621): DataFrame = {
    val y = col(valueCol).cast("double")
    val isT = col("__a") === treatArm
    val isC = col("__a") === controlArm
    df.where(col(armCol).isin(treatArm, controlArm) && y.isNotNull)
      .select(col(segmentCol).as("segment"), col(armCol).as("__a"),
        y.as("__y"))
      .groupBy(col("segment"))
      .agg(count(when(isT, lit(1))).as("n_treat"),
        var_samp(when(isT, col("__y"))).as("__vt"),
        count(when(isC, lit(1))).as("n_ctrl"),
        avg(when(isC, col("__y"))).as("mean_ctrl"),
        var_samp(when(isC, col("__y"))).as("__vc"))
      .where(col("n_treat") > 0 && col("n_ctrl") > 0)
      .withColumn("se", sqrt(col("__vt") / col("n_treat") +
        col("__vc") / col("n_ctrl")))
      .withColumn("mde_abs", lit(zAlpha + zPower) * col("se"))
      .withColumn("mde_rel",
        when(col("mean_ctrl") =!= 0, col("mde_abs") / col("mean_ctrl")))
      .drop("__vt", "__vc")
  }

  /**
   * Forecast-accuracy scorecard for the seasonal-naive baseline — the
   * standard pre-model benchmark on operational series: per key, over
   * an already-rolled-up (x, y) series, forecast each point with the
   * value `season` steps back and grade with the three standard
   * scale-free metrics: sMAPE (mean of 2|a−f|/(|a|+|f|)), WAPE
   * (Σ|a−f| / Σ|a|), and MASE (MAE of the seasonal forecast over the
   * MAE of the one-step naive forecast — < 1 beats naive).
   *
   * Scale contract: input is a rolled-up series (daily/hourly grid —
   * points in the hundreds per key), so the per-key ordered lag
   * windows run over bounded partitions; raw events must be
   * aggregated to the grid first (the callers do, one shuffle).
   */
  def forecastAccuracy(df: DataFrame, keyCols: Seq[String],
      xCol: String, yCol: String, season: Int = 7): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__x"))
    val a = col("__y")
    val scored = df
      .select(keyCols.map(col) :+ col(xCol).as("__x") :+
        col(yCol).cast("double").as("__y"): _*)
      .withColumn("__f", lag(a, season).over(w))
      .withColumn("__naive", lag(a, 1).over(w))
      .where(col("__f").isNotNull && col("__naive").isNotNull)
    scored.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_points"),
        avg(when(abs(a) + abs(col("__f")) =!= 0,
          lit(2.0) * abs(a - col("__f")) / (abs(a) + abs(col("__f")))))
          .as("smape"),
        (sum(abs(a - col("__f"))) / sum(abs(a))).as("wape"),
        (avg(abs(a - col("__f"))) / avg(abs(a - col("__naive"))))
          .as("mase"))
  }

  /**
   * Two-proportion sample-size planner from the OBSERVED baseline:
   * read p̂ off the corpus, posit a relative lift, and return the
   * per-arm n the classic two-proportion z test needs:
   * n = (z_α/2 + z_power)²·(p₁q₁ + p₂q₂)/(p₁−p₂)² — the binary
   * companion to the continuous MDE sizing. Also reports how many
   * days of traffic that is at the observed daily event rate — the
   * number a launch review actually asks for. z quantiles are
   * caller-supplied literals (defaults: two-sided 5% / 80% power),
   * so the whole computation replays as algebra in any engine.
   * Returns ONE row: (n, baseline_rate, target_rate, n_per_arm,
   * days_per_arm).
   *
   * ONE scan (count, conversions, distinct days), 1-row algebra.
   */
  def binarySampleSize(df: DataFrame, tsCol: String, convCond: Column,
      relativeLift: Double, zAlpha: Double = 1.959964,
      zPower: Double = 0.841621): DataFrame = {
    require(relativeLift != 0, "binarySampleSize: zero lift")
    df.where(col(tsCol).isNotNull)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(when(convCond, 1.0).otherwise(0.0)).as("__x"),
        countDistinct(to_date(col(tsCol))).cast("double").as("__days"))
      .select(col("__n").cast("long").as("n"),
        (col("__x") / col("__n")).as("baseline_rate"),
        (col("__x") / col("__n") * (1 + relativeLift))
          .as("target_rate"), col("__n"), col("__days"))
      .withColumn("n_per_arm",
        ceil(pow(lit(zAlpha + zPower), 2) *
          (col("baseline_rate") * (lit(1.0) - col("baseline_rate")) +
            col("target_rate") * (lit(1.0) - col("target_rate"))) /
          pow(col("target_rate") - col("baseline_rate"), 2))
          .cast("long"))
      .withColumn("days_per_arm",
        col("n_per_arm") / (col("__n") / col("__days") / 2))
      .select(col("n"), col("baseline_rate"), col("target_rate"),
        col("n_per_arm"), col("days_per_arm"))
  }

  /**
   * Rolling-origin horizon backtest of the naive persistence
   * forecast: how fast does error GROW with lead time? For every
   * horizon h = 1..maxHorizon each point is forecast by the value h
   * steps earlier; per (key, horizon) the standard error battery
   * (MAE, RMSE, sMAPE) comes back as one row — the curve that tells
   * you how far ahead a metric is forecastable at all, and the
   * baseline every model's horizon curve must beat
   * (the per-lead-time extension of [[forecastAccuracy]]'s fixed
   * season). Returns (key…, horizon, n_points, mae, rmse, smape).
   *
   * Scale shape: the [[crossCorrelation]] lag-grid discipline — the
   * rolled-up series is exploded |horizons|× with the forecast
   * shifted onto its target x, then ONE (key, x)-keyed join and one
   * grouped reduce. No per-horizon rescan, no window at all.
   */
  def horizonBacktest(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String, maxHorizon: Int = 7): DataFrame = {
    require(maxHorizon >= 1, "horizonBacktest: maxHorizon >= 1")
    val base = df
      .select(keyCols.map(col) :+ col(xCol).cast("long").as("__x") :+
        col(yCol).cast("double").as("__y"): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint() // both sides of the horizon join read it
    val hs = (1 to maxHorizon).map(h => lit(h))
    val shifted = base
      .select(keyCols.map(col) :+ col("__x") :+ col("__y") :+
        explode(array(hs: _*)).as("horizon"): _*)
      .select(keyCols.map(col) :+ (col("__x") + col("horizon"))
        .as("__x") :+ col("horizon") :+ col("__y").as("__f"): _*)
    graft.analysis.PrefixSum
      .joinNullSafe(shifted, base, keyCols :+ "__x")
      .groupBy((keyCols :+ "horizon").map(col): _*)
      .agg(count(lit(1)).as("n_points"),
        avg(abs(col("__y") - col("__f"))).as("mae"),
        sqrt(avg(pow(col("__y") - col("__f"), 2))).as("rmse"),
        avg(when(abs(col("__y")) + abs(col("__f")) =!= 0,
          lit(2.0) * abs(col("__y") - col("__f")) /
            (abs(col("__y")) + abs(col("__f"))))).as("smape"))
  }

  /**
   * Propensity-score stratification (Cochran/Rosenbaum–Rubin subclass
   * matching) — the observational-data effect estimate when treatment
   * wasn't randomized: rows are bucketed into `bins` equal-width
   * propensity strata, per stratum the treated-vs-control outcome
   * means difference, and the ATT pools those differences weighted by
   * each stratum's TREATED count (ATE would weight by total count —
   * `attWeighting = false` switches). Strata missing an arm drop out
   * of the pooled estimate (their difference is undefined), reported
   * with NULL diff so the caller sees the overlap violation.
   *
   * Returns per-stratum rows (stratum, p_lo, p_hi, n_treat, n_ctrl,
   * mean_treat, mean_ctrl, diff) with the pooled estimate repeated on
   * every row (`att`) — the ≤bins-row frame IS the report. One
   * conditional aggregation over the input + 1-row broadcast algebra;
   * no join back to the corpus.
   */
  def propensityStratification(df: DataFrame, treatCol: Column,
      scoreCol: String, valueCol: String, bins: Int = 5,
      attWeighting: Boolean = true): DataFrame = {
    require(bins >= 2, "need at least 2 strata")
    val p = col(scoreCol).cast("double")
    val y = col(valueCol).cast("double")
    // equal-width strata over [0,1]: stratum = ⌊p·bins⌋ clamped — a
    // driver-free binning (quantile strata would add a percentile scan;
    // equal-width is the standard first-line subclassification)
    val strat = least(floor(p * bins).cast("long"), lit(bins - 1L))
    val isT = col("__t") === 1L
    val cells = df
      .where(p.isNotNull && y.isNotNull)
      .select(strat.as("stratum"),
        when(treatCol, 1L).otherwise(0L).as("__t"), y.as("__y"))
      .groupBy(col("stratum"))
      .agg(count(when(isT, lit(1))).as("n_treat"),
        avg(when(isT, col("__y"))).as("mean_treat"),
        count(when(!isT, lit(1))).as("n_ctrl"),
        avg(when(!isT, col("__y"))).as("mean_ctrl"))
      .withColumn("diff",
        when(col("n_treat") > 0 && col("n_ctrl") > 0,
          col("mean_treat") - col("mean_ctrl")))
      .withColumn("p_lo", col("stratum").cast("double") / bins)
      .withColumn("p_hi", (col("stratum") + 1).cast("double") / bins)
      // ≤bins rows; both the pooled agg and the final report read it —
      // without this the corpus aggregation above runs TWICE
      .localCheckpoint()
    val wCol = if (attWeighting) col("n_treat") else
      col("n_treat") + col("n_ctrl")
    val pooled = broadcast(cells.where(col("diff").isNotNull)
      .agg((sum(col("diff") * wCol) / sum(wCol)).as("att")))
    cells.crossJoin(pooled)
      .select(col("stratum"), col("p_lo"), col("p_hi"), col("n_treat"),
        col("n_ctrl"), col("mean_treat"), col("mean_ctrl"), col("diff"),
        col("att"))
  }

  /**
   * Inverse-propensity-weighted ATE (Horvitz–Thompson, Hájek-
   * normalized): ATE = Σ(t·y/p)/Σ(t/p) − Σ((1−t)·y/(1−p))/Σ((1−t)/(1−p))
   * — the normalized form, robust to propensity scores that don't
   * average to the treatment rate. Propensities are clamped to
   * [clip, 1−clip] (standard overlap trimming; extreme weights
   * otherwise dominate the estimate). ONE aggregation, 1 row out:
   * (n, n_treat, mean_treat_w, mean_ctrl_w, ate).
   */
  def ipwEffect(df: DataFrame, treatCol: Column, scoreCol: String,
      valueCol: String, clip: Double = 0.01): DataFrame = {
    require(clip >= 0 && clip < 0.5, "clip in [0, 0.5)")
    val y = col(valueCol).cast("double")
    val p = least(greatest(col(scoreCol).cast("double"), lit(clip)),
      lit(1.0 - clip))
    val t = when(treatCol, 1.0).otherwise(0.0)
    df.where(col(scoreCol).isNotNull && y.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(t).cast("long").as("n_treat"),
        (sum(t * y / p) / sum(t / p)).as("mean_treat_w"),
        (sum((lit(1.0) - t) * y / (lit(1.0) - p)) /
          sum((lit(1.0) - t) / (lit(1.0) - p))).as("mean_ctrl_w"))
      .withColumn("ate", col("mean_treat_w") - col("mean_ctrl_w"))
  }

  /**
   * Quantile treatment effects: the per-quantile analog of the
   * difference in means — QTE(p) = q_treat(p) − q_control(p) on exact
   * DISC quantiles, the standard readout when a treatment moves the
   * tails differently from the center (heavy-user effects, latency
   * SLOs). Rides [[graft.analysis.AnalysisPlanner.exactPercentilesDisc]]
   * grouped by arm — distributed prefix sums, no corpus sort — then
   * melts the 2-row arm frame into one row per requested quantile:
   * (p, q_treat, q_control, qte).
   */
  def quantileTreatmentEffect(df: DataFrame, treatCol: Column,
      valueCol: String,
      ps: Seq[(String, Double)] = Seq("p25" -> 0.25, "p50" -> 0.5,
        "p75" -> 0.75, "p90" -> 0.9)): DataFrame = {
    require(ps.nonEmpty, "quantileTreatmentEffect: no quantiles")
    val armed = df
      .withColumn("__arm", when(treatCol, lit("t")).otherwise(lit("c")))
    val q = graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(armed, valueCol, ps, Seq("__arm"))
      .localCheckpoint() // 2 rows; both arm filters re-read it
    // each side ends in a 1-row aggregate (a no-op max over the single
    // arm row) so the plan itself states the crossJoin sides are
    // reduced — the scale lint can't see through the checkpoint
    def arm(a: String, pfx: String) = {
      val aggs = ps.map { case (n, _) => max(col(n)).as(s"$pfx$n") }
      broadcast(q.where(col("__arm") === a).agg(aggs.head, aggs.tail: _*))
    }
    val t = arm("t", "__t_")
    val c = arm("c", "__c_")
    val rows = ps.map { case (n, p) =>
      struct(lit(p).as("p"), col(s"__t_$n").as("q_treat"),
        col(s"__c_$n").as("q_control"),
        (col(s"__t_$n") - col(s"__c_$n")).as("qte"))
    }
    t.crossJoin(c).select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
  }

  /**
   * Cochran–Mantel–Haenszel stratified 2×2 analysis: the common odds
   * ratio OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) across strata plus the CMH
   * χ² statistic (1 df, no continuity correction) — the standard
   * confounder-adjusted binary-outcome test when stratifying an
   * experiment (the 2×2 companion to [[coarsenedExactMatch]]'s
   * continuous ATT). a=treated success, b=treated failure, c=control
   * success, d=control failure per stratum.
   *
   * One grouped conditional aggregation builds the per-stratum cells;
   * a second rollup over the ≤|strata|-row frame produces the single
   * output row: (n_strata, n, or_mh, chi2).
   */
  def mantelHaenszel(df: DataFrame, treatCol: Column,
      successCol: Column, strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "mantelHaenszel: no strata")
    val t = when(treatCol, 1.0).otherwise(0.0)
    val s = when(successCol, 1.0).otherwise(0.0)
    val cells = df.groupBy(strataCols.map(col): _*)
      .agg(sum(t * s).as("__a"), sum(t * (lit(1.0) - s)).as("__b"),
        sum((lit(1.0) - t) * s).as("__c"),
        sum((lit(1.0) - t) * (lit(1.0) - s)).as("__d"))
      .withColumn("__n", col("__a") + col("__b") + col("__c") + col("__d"))
      .withColumn("__r1", col("__a") + col("__b")) // treated row total
      .withColumn("__c1", col("__a") + col("__c")) // success col total
    cells.agg(
      count(lit(1)).as("n_strata"),
      sum(col("__n")).cast("long").as("n"),
      (sum(col("__a") * col("__d") / col("__n")) /
        sum(col("__b") * col("__c") / col("__n"))).as("or_mh"),
      (pow(sum(col("__a") - col("__r1") * col("__c1") / col("__n")), 2) /
        sum(col("__r1") * (col("__n") - col("__r1")) * col("__c1") *
          (col("__n") - col("__c1")) /
          (col("__n") * col("__n") * (col("__n") - 1.0)))).as("chi2"))
  }

  /**
   * Breslow–Day test of odds-ratio HOMOGENEITY across strata (with
   * Tarone's correction) — the companion [[mantelHaenszel]] needs:
   * MH assumes one common OR; Breslow–Day asks whether that
   * assumption holds. Per stratum, the expected exposed-success count
   * ã under the common OR ψ̂_MH solves the quadratic
   * ã²(ψ−1) − ã[ψ(n₁+m₁) + (n₀−m₁)] + ψn₁m₁ = 0 (the root inside
   * [max(0, m₁−n₀), min(n₁, m₁)]), with asymptotic variance
   * V = [1/ã + 1/(n₁−ã) + 1/(m₁−ã) + 1/(n₀−m₁+ã)]⁻¹;
   * X²_BD = Σ(a−ã)²/V ~ χ²(K−1), and Tarone subtracts
   * (Σ(a−ã))²/ΣV. More accurate than Woolf's log-OR form in sparse
   * strata (no +0.5 continuity fudge). Returns ONE row:
   * (n_strata, or_mh, bd_chi2, tarone_chi2, dof).
   *
   * Scale shape: ONE conditional-agg pass to the ≤K-row stratum cell
   * frame (checkpointed), a 1-row broadcast for ψ̂, column algebra
   * for the root — everything after the cells is K-sized.
   */
  def breslowDay(df: DataFrame, treatCol: Column,
      successCol: Column, strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "breslowDay: no strata")
    val t = when(treatCol, 1.0).otherwise(0.0)
    val s = when(successCol, 1.0).otherwise(0.0)
    val cells = df.groupBy(strataCols.map(col): _*)
      .agg(sum(t * s).as("__a"), sum(t * (lit(1.0) - s)).as("__b"),
        sum((lit(1.0) - t) * s).as("__c"),
        sum((lit(1.0) - t) * (lit(1.0) - s)).as("__d"))
      .withColumn("__n", col("__a") + col("__b") + col("__c") + col("__d"))
      .withColumn("__r1", col("__a") + col("__b"))
      .withColumn("__r0", col("__c") + col("__d"))
      .withColumn("__m1", col("__a") + col("__c"))
      .localCheckpoint() // ψ̂ reduce + the per-stratum pass read it
    val psi = broadcast(cells.agg(
      (sum(col("__a") * col("__d") / col("__n")) /
        sum(col("__b") * col("__c") / col("__n"))).as("__psi")))
    val solved = cells.crossJoin(psi)
      .withColumn("__qa", col("__psi") - 1)
      .withColumn("__qb",
        -(col("__psi") * (col("__r1") + col("__m1")) +
          (col("__r0") - col("__m1"))))
      .withColumn("__qc", col("__psi") * col("__r1") * col("__m1"))
      .withColumn("__disc",
        sqrt(greatest(col("__qb") * col("__qb") -
          lit(4.0) * col("__qa") * col("__qc"), lit(0.0))))
      .withColumn("__lo", greatest(lit(0.0), col("__m1") - col("__r0")))
      .withColumn("__hi", least(col("__r1"), col("__m1")))
      // ANSI-guard: ψ = 1 exactly (perfect homogeneity) makes the
      // quadratic linear — the roots are never read there, but the
      // division must not evaluate (when() branches are not lazy
      // across withColumn)
      .withColumn("__rootM",
        when(abs(col("__qa")) >= 1e-12,
          (-col("__qb") - col("__disc")) / (lit(2.0) * col("__qa"))))
      .withColumn("__rootP",
        when(abs(col("__qa")) >= 1e-12,
          (-col("__qb") + col("__disc")) / (lit(2.0) * col("__qa"))))
      .withColumn("__atil",
        when(abs(col("__qa")) < 1e-12,
          col("__r1") * col("__m1") / col("__n"))
          .when(col("__rootM") >= col("__lo") &&
            col("__rootM") <= col("__hi"), col("__rootM"))
          .otherwise(col("__rootP")))
      .withColumn("__bt", col("__r1") - col("__atil"))
      .withColumn("__ct", col("__m1") - col("__atil"))
      .withColumn("__dt", col("__r0") - col("__m1") + col("__atil"))
      // ANSI-guard: a degenerate stratum (empty margin) has no finite
      // variance — it contributes nothing, like SAS's BD handling
      .withColumn("__v",
        when(col("__atil") > 0 && col("__bt") > 0 &&
          col("__ct") > 0 && col("__dt") > 0,
          lit(1.0) / (lit(1.0) / col("__atil") + lit(1.0) / col("__bt") +
            lit(1.0) / col("__ct") + lit(1.0) / col("__dt"))))
    solved.where(col("__v").isNotNull)
      .agg(count(lit(1)).as("n_strata"),
        max(col("__psi")).as("or_mh"),
        sum(pow(col("__a") - col("__atil"), 2) / col("__v")).as("bd_chi2"),
        sum(col("__a") - col("__atil")).as("__dev"),
        sum(col("__v")).as("__sv"))
      .select(col("n_strata"), col("or_mh"), col("bd_chi2"),
        (col("bd_chi2") - col("__dev") * col("__dev") / col("__sv"))
          .as("tarone_chi2"),
        (col("n_strata") - 1).as("dof"))
  }

  /**
   * Two-sample Poisson rate comparison: event rates per unit of
   * exposure in each arm, their ratio, and the normal-approximation
   * z statistic for H₀: equal rates,
   * z = (r₁ − r₂) / sqrt(c₁/e₁² + c₂/e₂²) — the count-metric
   * companion to the mean-based welch test (events per user-day,
   * errors per request, clicks per impression). One conditional
   * aggregation; exposure is any additive column (rows, days,
   * impressions). Returns 1 row:
   * (count_t, exposure_t, rate_t, count_c, exposure_c, rate_c,
   * rate_ratio, z).
   */
  def poissonRateTest(df: DataFrame, treatCol: Column,
      countCol: Column, exposureCol: Column): DataFrame = {
    val t = when(treatCol, 1.0).otherwise(0.0)
    val c = countCol.cast("double")
    val e = exposureCol.cast("double")
    df.agg(
      sum(t * c).as("count_t"), sum(t * e).as("exposure_t"),
      sum((lit(1.0) - t) * c).as("count_c"),
      sum((lit(1.0) - t) * e).as("exposure_c"))
      .select(col("count_t"), col("exposure_t"),
        (col("count_t") / col("exposure_t")).as("rate_t"),
        col("count_c"), col("exposure_c"),
        (col("count_c") / col("exposure_c")).as("rate_c"),
        (col("count_t") / col("exposure_t") /
          (col("count_c") / col("exposure_c"))).as("rate_ratio"),
        ((col("count_t") / col("exposure_t") -
          col("count_c") / col("exposure_c")) /
          sqrt(col("count_t") / (col("exposure_t") * col("exposure_t")) +
            col("count_c") / (col("exposure_c") * col("exposure_c"))))
          .as("z"))
  }

  /**
   * Reciprocal rank fusion (Cormack et al. 2009): combine several
   * rankers' orderings of the same candidate set into one score,
   * rrf(d) = Σ_rankers 1/(k0 + rank_r(d)) — the standard score-free
   * way to merge lexical (BM25) and vector (ANN) retrieval. Input is
   * the melted (ranker, query, doc, score) frame; ranks are per
   * (ranker, query), ties broken by doc id. Returns
   * (query, doc, n_rankers, rrf). (The two-frame convenience form for
   * exactly a lexical+vector pair is [[Retrieval.rrfFuse]]; this is
   * the N-ranker generalization over an already-melted frame.)
   *
   * Scale: one window partitioned by (ranker, query) — per-list sort
   * only — and one groupBy on (query, doc). Docs missing from a
   * ranker's list simply contribute no term (the fusion's contract).
   */
  def reciprocalRankFusion(df: DataFrame, queryCol: String,
      idCol: String, rankerCol: String, scoreCol: String,
      k0: Int = 60): DataFrame = {
    val w = Window.partitionBy(col(rankerCol), col(queryCol))
      .orderBy(col(scoreCol).cast("double").desc, col(idCol).asc)
    df.select(col(queryCol).as("query"), col(idCol).as("doc"),
        row_number().over(w).as("__r"))
      .groupBy("query", "doc")
      .agg(count(lit(1)).as("n_rankers"),
        sum(lit(1.0) / (lit(k0.toDouble) + col("__r"))).as("rrf"))
  }

  /**
   * Coarsened exact matching (CEM, Iacus–King–Porro): exact-match
   * treated and control units within strata of pre-coarsened
   * covariates, drop unmatched strata, and estimate the ATT as the
   * treated-weighted difference of within-stratum outcome means:
   * ATT = Σ_s nT_s·(ȳT_s − ȳC_s) / Σ_s nT_s over strata with both
   * arms present. The caller supplies the coarsened stratum columns
   * (bins, categories) — coarsening choices are the method's contract.
   *
   * Scale: ONE grouped conditional aggregation builds the stratum
   * cells (the diffInDiff discipline — no per-arm scans), then one
   * aggregation over the ≤|strata|-row cell frame. Returns a single
   * row: (n_strata, n_strata_matched, n_treated, n_treated_matched,
   * n_control_matched, att).
   */
  def coarsenedExactMatch(df: DataFrame, treatCol: Column,
      outcomeCol: String, strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "coarsenedExactMatch: no strata")
    val y = col(outcomeCol).cast("double")
    val t = when(treatCol, 1.0).otherwise(0.0)
    val cells = df.where(y.isNotNull)
      .groupBy(strataCols.map(col): _*)
      .agg(sum(t).as("__nt"), sum(lit(1.0) - t).as("__nc"),
        sum(t * y).as("__syt"), sum((lit(1.0) - t) * y).as("__syc"))
    val matched = col("__nt") > 0 && col("__nc") > 0
    cells.agg(
      count(lit(1)).as("n_strata"),
      sum(when(matched, 1L).otherwise(0L)).as("n_strata_matched"),
      sum(col("__nt")).cast("long").as("n_treated"),
      sum(when(matched, col("__nt")).otherwise(lit(0.0))).cast("long")
        .as("n_treated_matched"),
      sum(when(matched, col("__nc")).otherwise(lit(0.0))).cast("long")
        .as("n_control_matched"),
      (sum(when(matched,
        col("__nt") * (col("__syt") / col("__nt") -
          col("__syc") / col("__nc"))).otherwise(lit(0.0))) /
        sum(when(matched, col("__nt")).otherwise(lit(0.0)))).as("att"))
  }

  /**
   * UCB1 (Auer et al. 2002) arm scores over logged reward data: per
   * arm, mean reward plus the exploration bonus c·sqrt(ln N / n) — the
   * standard index a batched bandit serving layer recomputes from the
   * feature store between decision rounds. Returns one row per arm:
   * (arm, n_pulls, mean_reward, bonus, ucb).
   *
   * Scale: one grouped aggregation to the ≤|arms|-row frame plus one
   * broadcast 1-row total — the crossJoin is stat-frame algebra.
   */
  def ucbScores(df: DataFrame, armCol: String, rewardCol: String,
      c: Double = math.sqrt(2.0)): DataFrame = {
    val arms = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col(rewardCol).cast("double")).as("mean_reward"))
    val tot = broadcast(df.agg(count(lit(1)).cast("double").as("__tot")))
    val bonus = lit(c) * sqrt(log(col("__tot")) / col("__n"))
    arms.crossJoin(tot)
      .select(col("arm"), col("__n").cast("long").as("n_pulls"),
        col("mean_reward"), bonus.as("bonus"),
        (col("mean_reward") + bonus).as("ucb"))
  }

  /**
   * Cochran–Armitage trend test: is success probability monotone in an
   * ordinal dose/score? z = Σᵢ sᵢ(rᵢ − nᵢ·p̄) normalized by
   * sqrt(p̄(1−p̄)·(Σ sᵢ²nᵢ − (Σ sᵢnᵢ)²/N)) — the standard test for
   * dose-response in funnels, exposure tiers, and bucketed rollouts,
   * strictly more powerful than the unordered χ² when the alternative
   * is a trend. Returns ONE row: (n, n_success, p_bar, z, chi2) with
   * chi2 = z² ~ χ²(1) under H₀ (feed to [[graft.analysis.Stats]]).
   *
   * Scale: one grouped aggregation to the ≤|levels|-row frame, one
   * 1-row reduce. `scoreCol` is the numeric level score (often the
   * level index itself).
   */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
      successCol: Column): DataFrame = {
    val s = when(successCol, 1.0).otherwise(0.0)
    val g = df.groupBy(scoreCol.cast("double").as("__s"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(s).as("__r"))
    g.agg(sum(col("__n")).as("__N"), sum(col("__r")).as("__R"),
        sum(col("__s") * col("__r")).as("__T"),
        sum(col("__s") * col("__n")).as("__Sn"),
        sum(col("__s") * col("__s") * col("__n")).as("__S2n"))
      .select(col("__N").cast("long").as("n"),
        col("__R").cast("long").as("n_success"),
        (col("__R") / col("__N")).as("p_bar"),
        ((col("__T") - col("__R") / col("__N") * col("__Sn")) /
          sqrt(col("__R") / col("__N") *
            (lit(1.0) - col("__R") / col("__N")) *
            (col("__S2n") - col("__Sn") * col("__Sn") / col("__N"))))
          .as("z"))
      .withColumn("chi2", col("z") * col("z"))
  }

  /**
   * Fisher's exact test (two-sided, by table probability) on the 2×2
   * contingency table of `treatCol` × `successCol` — the exact small-
   * cell companion to the χ² test, the right tool when any expected
   * cell is below ~5 (rare-event guardrails, early-ramp experiments).
   * Returns ONE row: (a, b, c, d, odds_ratio, support, p_two_sided).
   *
   * The hypergeometric pmf is evaluated over the conditional support
   * k ∈ [max(0, r1−c2), min(r1, c1)] via the cancellation recurrence
   * p(k)/p(k−1) = (r1−k+1)(c1−k+1) / (k·(r2−c1+k)) in log space —
   * no factorials, no overflow — prefix-summed with
   * [[PrefixSum.exclusive]] (bucketed: no single-partition window).
   * Two-sided p = Σ p(k) over tables no more probable than the
   * observed one (with the conventional 1+1e-7 tolerance).
   *
   * Scale: the corpus collapses to a 1-row cell frame first; the only
   * non-trivial frame afterwards is the support itself, hard-capped at
   * `maxSupport` rows (fail-loud `assert_true` — beyond that regime
   * the test is indistinguishable from χ², use the statTest family).
   */
  def fisherExact(df: DataFrame, treatCol: Column, successCol: Column,
      maxSupport: Int = 100000): DataFrame = {
    val t = when(treatCol, 1.0).otherwise(0.0)
    val sY = when(successCol, 1.0).otherwise(0.0)
    val cells = df.agg(
        sum(t * sY).as("__a"), sum(t * (lit(1.0) - sY)).as("__b"),
        sum((lit(1.0) - t) * sY).as("__c"),
        sum((lit(1.0) - t) * (lit(1.0) - sY)).as("__d"))
      .withColumn("__r1", col("__a") + col("__b"))
      .withColumn("__r2", col("__c") + col("__d"))
      .withColumn("__c1", col("__a") + col("__c"))
      .withColumn("__c2", col("__b") + col("__d"))
      .withColumn("__kmin", greatest(lit(0.0), col("__r1") - col("__c2")))
      .withColumn("__kmax", least(col("__r1"), col("__c1")))
      // fail loud BEFORE materializing the support sequence
      .where(coalesce(
        assert_true(col("__kmax") - col("__kmin") < lit(maxSupport.toDouble),
          lit(s"fisherExact: support exceeds $maxSupport — " +
            "use the chi2 statTest at this scale")), lit(true)))
    val ks = cells.withColumn("__k",
      explode(sequence(col("__kmin").cast("long"),
        col("__kmax").cast("long"))))
    // log-step of the recurrence; 0 at the support's first point
    val step = when(col("__k") === col("__kmin").cast("long"), lit(0.0))
      .otherwise(
        log(col("__r1") - col("__k") + 1) + log(col("__c1") - col("__k") + 1)
          - log(col("__k").cast("double"))
          - log(col("__r2") - col("__c1") + col("__k")))
    val scored = PrefixSum.exclusive(
        ks.withColumn("__dl", step)
          .select("__k", "__dl", "__a", "__b", "__c", "__d"),
        "__k", Seq("__dl" -> "__pre"))
      .withColumn("__q", exp(col("__pre") + col("__dl")))
    val obs = broadcast(scored
      .where(col("__k") === col("__a").cast("long"))
      .select(col("__q").as("__qobs")))
    scored.crossJoin(obs)
      .agg(first(col("__a")).cast("long").as("a"),
        first(col("__b")).cast("long").as("b"),
        first(col("__c")).cast("long").as("c"),
        first(col("__d")).cast("long").as("d"),
        first(col("__a") * col("__d") / (col("__b") * col("__c")))
          .as("odds_ratio"),
        count(lit(1)).as("support"),
        (sum(when(col("__q") <= col("__qobs") * (1.0 + 1e-7), col("__q"))
          .otherwise(lit(0.0))) / sum(col("__q"))).as("p_two_sided"))
  }

  /**
   * Randomization (permutation) test for a difference in means, with
   * DETERMINISTIC hash-derived reassignments: replicate r assigns each
   * unit to pseudo-treatment iff its [[graft.functions.PortableHash]]
   * bucket of (salt, id, r) falls in the lower half — replayable
   * bit-exactly in any engine with md5, so the oracle can re-derive
   * every replicate. p = (1 + #{r : |Δ_r| ≥ |Δ_obs|}) / (reps + 1)
   * (the add-one form that keeps p > 0). Returns ONE row:
   * (obs_diff, reps, n_ge, p_value).
   *
   * Scale: replicate inflation is a bounded ×reps fan-out of a
   * 2-column projection with full map-side combine into the per-rep
   * aggregate — the Poisson-bootstrap discipline ([[graft.ops]]
   * bootstrap operators); no shuffle carries more than reps rows out.
   */
  def permutationTest(df: DataFrame, idCol: Column, treatCol: Column,
      valueCol: Column, reps: Int = 200): DataFrame = {
    require(reps >= 1, "permutationTest: reps must be positive")
    val M = graft.functions.PortableHash.M
    val v = valueCol.cast("double")
    val t = when(treatCol, 1.0).otherwise(0.0)
    val obs = broadcast(df.agg(
        (sum(t * v) / sum(t)).as("__mt"),
        (sum((lit(1.0) - t) * v) / sum(lit(1.0) - t)).as("__mc"))
      .select((col("__mt") - col("__mc")).as("__obs")))
    val infl = df.select(v.as("__v"), idCol.cast("string").as("__id"))
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
    val h = graft.functions.PortableHash.bucket(
      Seq(lit("perm"), col("__id"), col("__rep")))
    val repStats = infl
      .withColumn("__t", when(h < lit(M / 2), 1.0).otherwise(0.0))
      .groupBy("__rep")
      .agg((sum(col("__t") * col("__v")) / sum(col("__t"))).as("__mt"),
        (sum((lit(1.0) - col("__t")) * col("__v")) /
          sum(lit(1.0) - col("__t"))).as("__mc"))
    repStats.crossJoin(obs)
      .agg(first(col("__obs")).as("obs_diff"),
        count(lit(1)).as("reps"),
        sum(when(abs(col("__mt") - col("__mc")) >= abs(col("__obs")), 1L)
          .otherwise(0L)).as("n_ge"))
      .withColumn("p_value",
        (col("n_ge") + 1.0) / (col("reps") + 1.0))
  }

  /**
   * Bayesian A/B test on conversion: P(rate_B > rate_A) under
   * independent Beta posteriors from uniform Beta(1,1) priors — the
   * decision-ready alternative to a p-value for two-arm binary
   * experiments. Uses the exact closed form (Cook's/Miller's sum)
   * P = Σ_{i=0}^{αB−1} B(αA+i, βA+βB) / ((βB+i)·B(1+i,βB)·B(αA,βA)),
   * evaluated in log space: the i=0 term from exact log-factorials
   * (integer posterior parameters), successive terms via the
   * cancellation recurrence Δln = ln(αA+i−1) + ln(βB+i−1) −
   * ln(αA+βA+βB+i−1) − ln i, prefix-summed with
   * [[PrefixSum.exclusive]]. Returns ONE row:
   * (n_a, s_a, n_b, s_b, rate_a, rate_b, prob_b_gt_a).
   *
   * Scale: the corpus collapses to a 1-row cell frame; the term frame
   * has s_B+1 rows, hard-capped at `maxSupport` (fail loud — beyond
   * that the normal approximation is indistinguishable).
   */
  def bayesianAbTest(df: DataFrame, treatCol: Column,
      successCol: Column, maxSupport: Int = 100000): DataFrame = {
    val t = when(treatCol, 1.0).otherwise(0.0)
    val sY = when(successCol, 1.0).otherwise(0.0)
    // exact ln Γ(x) for integer-valued x ≥ 1 as ln (x−1)! — a bounded
    // sequential fold on a 1-row frame, deterministic summation order
    def lgi(c: Column): Column =
      when(c < 3, 0.0).otherwise(aggregate(
        sequence(lit(2L), c.cast("long") - 1), lit(0.0),
        (acc, x) => acc + log(x.cast("double"))))
    val cells = df.agg(
        sum(t * sY).as("__sa"), sum(t).as("__na"),
        sum((lit(1.0) - t) * sY).as("__sb"),
        sum(lit(1.0) - t).as("__nb"))
      .withColumn("__aa", col("__sa") + 1)
      .withColumn("__ba", col("__na") - col("__sa") + 1)
      .withColumn("__ab2", col("__sb") + 1)
      .withColumn("__bb", col("__nb") - col("__sb") + 1)
      .where(coalesce(
        assert_true(col("__ab2") < lit(maxSupport.toDouble),
          lit(s"bayesianAbTest: support exceeds $maxSupport — " +
            "use a normal approximation at this scale")), lit(true)))
      .withColumn("__lt0",
        lgi(col("__ba") + col("__bb")) -
          lgi(col("__aa") + col("__ba") + col("__bb")) -
          lgi(col("__ba")) + lgi(col("__aa") + col("__ba")))
    val ks = cells.withColumn("__i",
      explode(sequence(lit(0L), col("__ab2").cast("long") - 1)))
    val step = when(col("__i") === 0, lit(0.0)).otherwise(
      log(col("__aa") + col("__i") - 1) +
        log(col("__bb") + col("__i") - 1) -
        log(col("__aa") + col("__ba") + col("__bb") + col("__i") - 1) -
        log(col("__i").cast("double")))
    PrefixSum.exclusive(
        ks.withColumn("__dl", step)
          .select("__i", "__dl", "__sa", "__na", "__sb", "__nb", "__lt0"),
        "__i", Seq("__dl" -> "__pre"))
      .agg(first(col("__na")).cast("long").as("n_a"),
        first(col("__sa")).cast("long").as("s_a"),
        first(col("__nb")).cast("long").as("n_b"),
        first(col("__sb")).cast("long").as("s_b"),
        first(col("__sa") / col("__na")).as("rate_a"),
        first(col("__sb") / col("__nb")).as("rate_b"),
        sum(exp(col("__lt0") + col("__pre") + col("__dl")))
          .as("prob_b_gt_a"))
  }

  /**
   * G-test of independence (log-likelihood-ratio χ² alternative) on
   * the contingency table of two categorical columns:
   * G = 2·Σ O·ln(O·N/(R·C)) over observed cells, dof (r−1)(c−1) —
   * preferred over Pearson χ² when counts are small or cells sparse
   * (absent cells contribute exactly 0, so the observed-cell sum IS
   * the statistic). Returns ONE row: (n, dof, g); G ~ χ²(dof).
   *
   * Scale: one groupBy to the cell frame (checkpointed — marginals
   * and the reduce all derive from it), broadcast marginal joins,
   * 1-row reduce.
   */
  def gTest(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).cast("double").as("__o")).localCheckpoint()
    val rt = cells.groupBy("__r").agg(sum(col("__o")).as("__rt"))
    val ct = cells.groupBy("__c").agg(sum(col("__o")).as("__ct"))
    val tot = broadcast(cells.agg(sum(col("__o")).as("__nn"),
      countDistinct(col("__r")).as("__nr"),
      countDistinct(col("__c")).as("__nc")))
    cells.join(broadcast(rt), "__r").join(broadcast(ct), "__c")
      .crossJoin(tot)
      .agg(first(col("__nn")).cast("long").as("n"),
        ((first(col("__nr")) - 1) * (first(col("__nc")) - 1)).as("dof"),
        (lit(2.0) * sum(col("__o") *
          log(col("__o") * col("__nn") / (col("__rt") * col("__ct")))))
          .as("g"))
  }

  /**
   * Fleiss' kappa over a melted (item, category) ratings frame — one
   * row per individual rating. Chance-corrected multi-rater agreement,
   * the N-rater generalization of [[cohenKappa]] (label-quality
   * audits, multi-annotator consensus screens). Items with fewer than
   * 2 ratings are excluded (agreement undefined); the generalized
   * varying-raters form is used, so unequal rating counts per item
   * are fine. Returns ONE row:
   * (n_items, n_ratings, p_observed, p_expected, kappa).
   *
   * Scale: one groupBy to (item, category) counts, one rollup to
   * per-item agreement Pᵢ = (Σ_c n_ic² − nᵢ)/(nᵢ(nᵢ−1)), marginals
   * over the kept items via a semi-join — all keyed aggregation,
   * 1-row broadcast algebra at the end.
   */
  def fleissKappa(df: DataFrame, itemCol: String,
      categoryCol: String): DataFrame = {
    val ic = df
      .groupBy(col(itemCol).as("__i"), col(categoryCol).as("__c"))
      .agg(count(lit(1)).cast("double").as("__k")).localCheckpoint()
    val ni = ic.groupBy("__i").agg(sum(col("__k")).as("__ni"),
      sum(col("__k") * col("__k")).as("__s2"))
    val kept = ni.where(col("__ni") >= 2).localCheckpoint()
    val pbar = broadcast(kept
      .select(((col("__s2") - col("__ni")) /
        (col("__ni") * (col("__ni") - 1))).as("__pi"), col("__ni"))
      .agg(avg(col("__pi")).as("__pbar"), count(lit(1)).as("__nitems"),
        sum(col("__ni")).as("__ntot")))
    ic.join(kept.select("__i"), Seq("__i"), "left_semi")
      .groupBy("__c").agg(sum(col("__k")).as("__nc"))
      .crossJoin(pbar)
      .agg(first(col("__nitems")).as("n_items"),
        first(col("__ntot")).as("__ntotal"),
        first(col("__pbar")).as("p_observed"),
        sum(col("__nc") * col("__nc")).as("__snc2"))
      .select(col("n_items"), col("__ntotal").cast("long").as("n_ratings"),
        col("p_observed"),
        (col("__snc2") / (col("__ntotal") * col("__ntotal")))
          .as("p_expected"))
      .withColumn("kappa",
        (col("p_observed") - col("p_expected")) /
          (lit(1.0) - col("p_expected")))
  }

  /**
   * Murphy decomposition of the Brier score over DISTINCT forecast
   * values: Brier = reliability − resolution + uncertainty, with
   * REL = Σ n_s/N·(s − acc_s)², RES = Σ n_s/N·(acc_s − base)²,
   * UNC = base·(1−base) — EXACT (not binned-approximate) because the
   * partition is by the forecast values themselves. Separates "the
   * probabilities are miscalibrated" (reliability, want 0) from "the
   * forecasts don't discriminate" (resolution, want large) — the
   * diagnosis the raw Brier number can't give. Returns ONE row:
   * (n, n_scores, base_rate, brier, reliability, resolution,
   * uncertainty).
   *
   * One groupBy to the distinct-score frame + a 1-row rollup with the
   * base rate as a broadcast scalar — the [[binaryMetrics]] shape.
   */
  def brierDecomposition(df: DataFrame, labelCol: Column,
      scoreCol: Column): DataFrame = {
    val y = when(labelCol, 1.0).otherwise(0.0)
    val cells = df.groupBy(scoreCol.cast("double").as("__s"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(y).as("__k"))
    val base = broadcast(cells.agg(
      (sum(col("__k")) / sum(col("__n"))).as("__base"),
      sum(col("__n")).as("__tot")))
    val acc = col("__k") / col("__n")
    cells.join(base)
      .agg(max(col("__tot")).cast("long").as("n"),
        count(lit(1)).as("n_scores"),
        max(col("__base")).as("base_rate"),
        sum(col("__n") / col("__tot") * pow(col("__s") - acc, 2.0))
          .as("reliability"),
        sum(col("__n") / col("__tot") * pow(acc - col("__base"), 2.0))
          .as("resolution"),
        max(col("__base") * (lit(1.0) - col("__base")))
          .as("uncertainty"))
      .select(col("n"), col("n_scores"), col("base_rate"),
        (col("reliability") - col("resolution") + col("uncertainty"))
          .as("brier"),
        col("reliability"), col("resolution"), col("uncertainty"))
  }

  /**
   * Qini curve for uplift evaluation: rank units by an uplift score
   * (descending), and at every distinct score threshold report the
   * incremental responders over random targeting,
   * qini(k) = R_t(k) − R_c(k)·N_t(k)/N_c(k) — the uplift analog of
   * the ROC curve (Radcliffe 2007). Each row also carries its block's
   * population share `d_frac`, so AUUC is the one-line rollup
   * Σ qini·d_frac (right-endpoint step integral) — see the q289
   * oracle. Score must be an engine-stable value (a band, a rank, an
   * integer model output), the same determinism contract as
   * [[binaryMetrics]]. Returns one row per distinct score:
   * (score, frac, d_frac, cum_treated, cum_control, cum_resp_treated,
   * cum_resp_control, qini).
   *
   * Scale shape: one groupBy to the distinct-score frame, one
   * [[PrefixSum]] pass (ordered by negated score = descending), a
   * 1-row broadcast total — no window, no driver state.
   */
  def qiniCurve(df: DataFrame, treatCol: Column, outcomeCol: Column,
      scoreCol: String): DataFrame = {
    val t = when(treatCol, 1.0).otherwise(0.0)
    val y = when(outcomeCol, 1.0).otherwise(0.0)
    val vc = df.groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).cast("double").as("__tot"),
        sum(t).as("__nt"), sum(t * y).as("__rt"),
        sum((lit(1.0) - t) * y).as("__rc"))
      .withColumn("__o", -col("__s"))
    val pre = PrefixSum.exclusive(vc, "__o",
      Seq("__tot" -> "__xtot", "__nt" -> "__xnt", "__rt" -> "__xrt",
        "__rc" -> "__xrc"))
    val n = broadcast(df.agg(count(lit(1)).cast("double").as("__n")))
    val cumTot = col("__xtot") + col("__tot")
    val cumNt = col("__xnt") + col("__nt")
    val cumNc = cumTot - cumNt
    val cumRt = col("__xrt") + col("__rt")
    val cumRc = col("__xrc") + col("__rc")
    pre.join(n)
      .select(col("__s").as("score"), (cumTot / col("__n")).as("frac"),
        (col("__tot") / col("__n")).as("d_frac"),
        cumNt.cast("long").as("cum_treated"),
        cumNc.cast("long").as("cum_control"),
        cumRt.cast("long").as("cum_resp_treated"),
        cumRc.cast("long").as("cum_resp_control"),
        when(cumNc > 0, cumRt - cumRc * cumNt / cumNc).as("qini"))
  }

  /**
   * Classifier two-sample test (C2ST, Lopez-Paz & Oquab 2017): can a
   * classifier tell sample A from sample B on the given categorical
   * features? Held-out AUC ≈ 0.5 means the distributions are
   * indistinguishable; AUC ≫ 0.5 localizes drift in whatever the
   * features encode — the model-based companion to the PSI/KL/JS
   * divergence family, useful precisely when a scalar divergence
   * can't say WHICH interaction moved. Deterministic end-to-end:
   * train/test split by the portable md5 hash of `keyCols`, a
   * two-label naive Bayes as the discriminator, scores via
   * [[graft.ops.NaiveBayes.binaryLogOdds]] (fixed addition order +
   * scoreRound), AUC by midrank. Returns ONE row:
   * (n_train, n, n_pos, n_neg, auc).
   *
   * Scale shape: the labeled corpus is localCheckpointed once (split
   * hash computed once; fit reads train, scoring reads test); the
   * model is three tiny broadcast frames; AUC rides
   * [[binaryMetrics]]'s distinct-score prefix sums. No window, no
   * driver state beyond the 2-row label check.
   */
  def classifierTwoSampleTest(df: DataFrame, memberCol: Column,
      features: Seq[String], keyCols: Seq[String], alpha: Double = 1.0,
      scoreRound: Option[Int] = Some(9)): DataFrame = {
    require(features.nonEmpty, "classifierTwoSampleTest: no features")
    val labeled = df
      .withColumn("__mem", when(memberCol, "b").otherwise("a"))
      .withColumn("__bkt",
        graft.functions.PortableHash.bucket(keyCols.map(col)))
      .localCheckpoint()
    val half = graft.functions.PortableHash.M / 2
    val train = labeled.where(col("__bkt") < half)
    val test = labeled.where(col("__bkt") >= half)
    val model = NaiveBayes.fit(train, features, "__mem", alpha)
    val scored = NaiveBayes.binaryLogOdds(test, model, features,
      keyCols :+ "__mem", "b", scoreRound)
    val nTrain = broadcast(train.agg(count(lit(1)).as("n_train")))
    binaryMetrics(scored.withColumn("__y", col("__mem") === "b"),
        "__y", "log_odds")
      .join(nTrain)
      .select(col("n_train"), col("n"), col("n_pos"), col("n_neg"),
        col("auc"))
  }

  /**
   * Cronbach's alpha over a set of numeric item columns — internal
   * consistency of a multi-item score (do the k items measure one
   * construct?): α = k/(k−1)·(1 − Σᵢvar(itemᵢ)/var(Σᵢitemᵢ)), the
   * label-quality / survey-scale standard. Complete-case rows only.
   * Returns ONE row: (k, n, item_var_sum, total_var, alpha).
   *
   * ONE aggregation scan: per-item sample variances and the variance
   * of the row total in the same agg — map-side combined, no second
   * pass, nothing driver-side.
   */
  def cronbachAlpha(df: DataFrame, itemCols: Seq[String]): DataFrame = {
    require(itemCols.size >= 2, "cronbachAlpha: at least 2 items")
    val items = itemCols.map(c => col(c).cast("double"))
    val complete = df.where(items.map(_.isNotNull).reduce(_ && _))
    val total = items.reduce(_ + _)
    val k = itemCols.size.toDouble
    complete.agg(count(lit(1)).as("n"),
        items.map(i => var_samp(i)).reduce(_ + _).as("item_var_sum"),
        var_samp(total).as("total_var"))
      .select(lit(itemCols.size).as("k"), col("n"), col("item_var_sum"),
        col("total_var"),
        when(col("total_var") > 0,
          lit(k / (k - 1)) *
            (lit(1.0) - col("item_var_sum") / col("total_var")))
          .as("alpha"))
  }

  /**
   * Delta-method inference for a ratio metric over per-unit rows
   * (arm, x, y) — the revenue-per-session / clicks-per-impression
   * family where the analysis unit (session, impression) differs from
   * the randomization unit (user): per arm, R = x̄/ȳ and
   * se² = (var(x) − 2R·cov(x,y) + R²·var(y)) / (n·ȳ²), the standard
   * linearization (Deng et al.'s practical form). Returns one row per
   * arm: (arm, n, sum_x, sum_y, ratio, se, ci_lo, ci_hi) at 95%.
   *
   * ONE grouped aggregation — means, variances, and the covariance in
   * the same pass; everything after is column algebra on the
   * ≤|arms|-row frame.
   */
  def ratioMetric(df: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val g = df.where(x.isNotNull && y.isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("sum_x"),
        sum(y).as("sum_y"), var_samp(x).as("__vx"), var_samp(y).as("__vy"),
        covar_samp(x, y).as("__cxy"))
    val r = col("sum_x") / col("sum_y")
    val my = col("sum_y") / col("__n")
    val se = sqrt((col("__vx") - lit(2.0) * r * col("__cxy") +
      r * r * col("__vy")) / (col("__n") * my * my))
    g.select(col("arm"), col("__n").cast("long").as("n"), col("sum_x"),
      col("sum_y"), r.as("ratio"), se.as("se"),
      (r - lit(1.959963984540054) * se).as("ci_lo"),
      (r + lit(1.959963984540054) * se).as("ci_hi"))
  }

  /**
   * Hosmer–Lemeshow goodness-of-fit for a probability model: rows
   * carry a binary outcome and a predicted probability `muCol`, and a
   * caller-supplied deterministic `binCol` (fixed grid or
   * feature-derived — NOT score deciles computed here, so the binning
   * replays identically in any engine); per bin g with n_g rows,
   * O_g = Σy and E_g = Σμ, the statistic is
   * Σ_g (O_g−E_g)²/(E_g·(1−E_g/n_g)) ~ χ²(bins−2) under fit.
   * Returns ONE row: (n_bins, n, hl_stat) — feed to
   * [[graft.analysis.Stats.chi2PValue]] with dof = n_bins − 2.
   *
   * ONE grouped aggregation to the bin cells, one 1-row reduce.
   */
  def hosmerLemeshow(df: DataFrame, outcomeCol: Column,
      muCol: Column, binCol: Column): DataFrame = {
    val y = when(outcomeCol, 1.0).otherwise(0.0)
    df.groupBy(binCol.as("__b"))
      .agg(count(lit(1)).cast("double").as("__ng"),
        sum(y).as("__o"), sum(muCol.cast("double")).as("__e"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("__ng")).cast("long").as("n"),
        sum(pow(col("__o") - col("__e"), 2.0) /
          (col("__e") * (lit(1.0) - col("__e") / col("__ng"))))
          .as("hl_stat"))
  }

  /**
   * Krippendorff's alpha (nominal metric) over (item, rating) rows —
   * the chance-corrected agreement coefficient that, unlike
   * [[fleissKappa]], is built on the coincidence matrix and so handles
   * varying rater counts per item as its native case: with per-item
   * category counts n_ic (items with n_i ≥ 2 ratings only),
   * D_o = Σ_i (n_i² − Σ_c n_ic²)/(n_i − 1) / n_tot and
   * D_e = (n_tot² − Σ_c n_c²)/(n_tot·(n_tot − 1)); α = 1 − D_o/D_e.
   * Returns ONE row: (n_items, n_ratings, d_observed, d_expected,
   * alpha).
   *
   * Scale shape identical to [[fleissKappa]]: one (item, category)
   * count groupBy, a per-item rollup, category marginals semi-joined
   * to kept items, all reductions 1-row — no window, no driver state.
   */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
      categoryCol: String): DataFrame = {
    val ic = df
      .groupBy(col(itemCol).as("__i"), col(categoryCol).as("__c"))
      .agg(count(lit(1)).cast("double").as("__k")).localCheckpoint()
    val ni = ic.groupBy("__i").agg(sum(col("__k")).as("__ni"),
      sum(col("__k") * col("__k")).as("__s2"))
    val kept = ni.where(col("__ni") >= 2).localCheckpoint()
    val tot = broadcast(kept.agg(
      sum((col("__ni") * col("__ni") - col("__s2")) / (col("__ni") - 1))
        .as("__don"),
      count(lit(1)).as("__nitems"), sum(col("__ni")).as("__ntot")))
    ic.join(kept.select("__i"), Seq("__i"), "left_semi")
      .groupBy("__c").agg(sum(col("__k")).as("__nc"))
      .crossJoin(tot)
      .agg(first(col("__nitems")).as("n_items"),
        first(col("__ntot")).as("__nt"),
        first(col("__don")).as("__don"),
        sum(col("__nc") * col("__nc")).as("__snc2"))
      .select(col("n_items"), col("__nt").cast("long").as("n_ratings"),
        (col("__don") / col("__nt")).as("d_observed"),
        ((col("__nt") * col("__nt") - col("__snc2")) /
          (col("__nt") * (col("__nt") - 1))).as("d_expected"))
      .withColumn("alpha",
        lit(1.0) - col("d_observed") / col("d_expected"))
  }

  /**
   * All pairwise Welch contrasts between the groups of `groupCol`:
   * for every unordered group pair (a < b by name), the mean
   * difference and the Welch z statistic
   * (m_a − m_b)/sqrt(s²_a/n_a + s²_b/n_b) — the post-hoc readout
   * after an ANOVA/omnibus flags "some group differs" (multi-arm
   * experiments, segment sweeps). Feed z to the BH-FDR operator for
   * multiplicity control. Returns one row per pair:
   * (group_a, group_b, n_a, n_b, mean_diff, z).
   *
   * Scale: ONE grouped aggregation to the ≤|groups|-row cell frame
   * (localCheckpointed), then an inequality self-join on that tiny
   * frame — never a corpus-sized join.
   */
  def pairwiseContrasts(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val cells = df.where(v.isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).cast("double").as("__n"), avg(v).as("__m"),
        var_samp(v).as("__s2")).localCheckpoint()
    cells.as("l").join(cells.as("r"), col("l.__g") < col("r.__g"))
      .select(col("l.__g").as("group_a"), col("r.__g").as("group_b"),
        col("l.__n").cast("long").as("n_a"),
        col("r.__n").cast("long").as("n_b"),
        (col("l.__m") - col("r.__m")).as("mean_diff"),
        ((col("l.__m") - col("r.__m")) /
          sqrt(col("l.__s2") / col("l.__n") +
            col("r.__s2") / col("r.__n"))).as("z"))
  }

  /**
   * Isotonic calibration (binned PAVA) of a score against a binary
   * outcome: bin the score into `bins` equal-width bins, then fit the
   * least-squares NON-DECREASING step function to the per-bin outcome
   * means via the minimax characterization
   * fitted(j) = max_{i≤j} min_{k≥j} mean(i..k) — exactly the pooled-
   * adjacent-violators solution, expressed as closed algebra instead
   * of the sequential pooling loop. Returns one row per non-empty bin:
   * (bin, bin_lo, n, raw_mean, fitted), fitted non-decreasing.
   *
   * Scale: ONE corpus scan builds the ≤bins-row cell frame
   * (localCheckpointed — every downstream frame derives from it);
   * the minimax runs as inequality self-joins on that tiny frame,
   * O(bins³) rows total with bins ≤ 64 — never a corpus-sized join,
   * never a window.
   */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 64,
      s"isotonicCalibration: bins must be in [2, 64], got $bins")
    val sc = col(scoreCol).cast("double")
    val y = col(labelCol).cast("double")
    val base = df.where(sc.isNotNull && y.isNotNull)
    val bounds = broadcast(base.agg(min(sc).as("__lo"), max(sc).as("__hi")))
    val width = (col("__hi") - col("__lo")) / bins
    val cells = base.crossJoin(bounds)
      .withColumn("__b",
        when(col("__hi") <= col("__lo"), lit(0))
          .otherwise(least(lit(bins - 1), greatest(lit(0),
            floor((sc - col("__lo")) / width).cast("int")))))
      .groupBy("__b")
      .agg(count(lit(1)).cast("double").as("__n"), sum(y).as("__s"),
        first(col("__lo")).as("__lo"), first(col("__hi")).as("__hi"))
      .localCheckpoint()
    // inclusive prefix (n, s) up to each bin — a tiny-frame
    // inequality join, not a window
    val incl = cells.as("x")
      .join(cells.as("p"), col("p.__b") <= col("x.__b"))
      .groupBy(col("x.__b").as("__bb"))
      .agg(sum(col("p.__n")).as("__In"), sum(col("p.__s")).as("__Is"))
    // left endpoints carry their EXCLUSIVE prefix
    val lefts = cells.as("c")
      .join(incl, col("c.__b") === col("__bb"))
      .select(col("c.__b").as("__bi"),
        (col("__In") - col("c.__n")).as("__En"),
        (col("__Is") - col("c.__s")).as("__Es"))
    // segment means over [i, k], k ≥ i
    val seg = lefts.join(incl.select(col("__bb").as("__bk"),
        col("__In").as("__Ink"), col("__Is").as("__Isk")),
        col("__bk") >= col("__bi"))
      .select(col("__bi"), col("__bk"),
        ((col("__Isk") - col("__Es")) / (col("__Ink") - col("__En")))
          .as("__m"))
    // fitted(j) = max over i≤j of (min over k≥j of mean(i..k))
    val innerMin = cells.select(col("__b").as("__bj"))
      .join(seg, col("__bi") <= col("__bj") && col("__bk") >= col("__bj"))
      .groupBy("__bj", "__bi").agg(min(col("__m")).as("__mn"))
    val fit = innerMin.groupBy(col("__bj")).agg(max(col("__mn")).as("fitted"))
    cells.join(fit, col("__b") === col("__bj"))
      .select(col("__b").as("bin"),
        (col("__lo") + col("__b") * ((col("__hi") - col("__lo")) / bins))
          .as("bin_lo"),
        col("__n").cast("long").as("n"),
        (col("__s") / col("__n")).as("raw_mean"),
        col("fitted"))
  }

  /**
   * Ljung–Box portmanteau test for white noise on a regular series:
   * Q = n(n+2)·Σ_{k=1..h} r_k²/(n−k) with r_k the [[acf]] estimator —
   * the standard residual-diagnostics statistic (Q ~ χ²(h) under H0 of
   * no autocorrelation through lag h; feed Q to
   * [[graft.analysis.Stats.chi2PValue]] driver-side, the
   * statistic-only contract of `homogeneityChi2`). Returns ONE row:
   * (n, max_lag, q_stat).
   *
   * Scale shape: exactly [[acf]]'s — one 1-row broadcast moment
   * aggregate, a lag-list-exploded equi-join on time, one groupBy —
   * then the h-row correlogram reduces to a single row. Nothing
   * driver-side, no window.
   */
  def ljungBox(df: DataFrame, timeCol: String, valueCol: String,
      maxLag: Int = 10): DataFrame = {
    require(maxLag >= 1, "ljungBox: maxLag >= 1")
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    acf(df, timeCol, valueCol, maxLag)
      .join(broadcast(n))
      .agg(max(col("__n")).cast("long").as("n"),
        count(lit(1)).as("max_lag"),
        (max(col("__n")) * (max(col("__n")) + 2) *
          sum(col("acf") * col("acf") /
            (col("__n") - col("lag")))).as("q_stat"))
  }

  /**
   * Doubly-robust (AIPW) average treatment effect with ONE covariate
   * — the capstone of the causal family (propensity-strata ATT,
   * Hájek IPW, CUPED live nearby): combine a logistic propensity
   * e(x) = σ(α+βx) (fixed-Newton, [[Regression.logisticRegression]]'s
   * deterministic contract) with per-arm linear outcome models
   * μ₁/μ₀ (closed-form OLS from one conditional-moments scan), then
   * ψ = mean[ T(y−μ₁)/e + μ₁ − (1−T)(y−μ₀)/(1−e) − μ₀ ].
   * Consistent if EITHER model is right — that's the "doubly robust"
   * contract. Propensities clip to [0.01, 0.99] (overlap guard).
   * Returns ONE row: (n, n_treated, propensity_slope, ate_naive,
   * ate_dr).
   *
   * Scale shape: `iterations` Newton scans + ONE conditional-moments
   * scan (both arms' OLS from the same aggregation) + ONE scoring
   * scan with every fitted coefficient inlined as a literal. Model
   * state: 6 driver doubles.
   */
  def doublyRobustATE(df: DataFrame, treatCond: Column, xCol: String,
      yCol: String, iterations: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
        when(treatCond, 1.0).otherwise(0.0).as("__t"),
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val fit = graft.ops.Regression
      .logisticRegression(base, Seq("__x"), col("__t") > 0.5, iterations)
      .collect().map(r => r.getAs[String]("term") ->
        r.getAs[Double]("coef")).toMap
    val pa = fit("(intercept)"); val pb = fit("__x")
    val mrow = base.agg(
      sum(col("__t")).as("n1"), sum(lit(1.0) - col("__t")).as("n0"),
      sum(col("__t") * col("__x")).as("sx1"),
      sum((lit(1.0) - col("__t")) * col("__x")).as("sx0"),
      sum(col("__t") * col("__y")).as("sy1"),
      sum((lit(1.0) - col("__t")) * col("__y")).as("sy0"),
      sum(col("__t") * col("__x") * col("__x")).as("sxx1"),
      sum((lit(1.0) - col("__t")) * col("__x") * col("__x")).as("sxx0"),
      sum(col("__t") * col("__x") * col("__y")).as("sxy1"),
      sum((lit(1.0) - col("__t")) * col("__x") * col("__y")).as("sxy0"))
      .head()
    def ols(n: Double, sx: Double, sy: Double, sxx: Double,
        sxy: Double): (Double, Double) = {
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (b, (sy - b * sx) / n)
    }
    val n1 = mrow.getAs[Double]("n1"); val n0 = mrow.getAs[Double]("n0")
    val (b1, a1) = ols(n1, mrow.getAs[Double]("sx1"),
      mrow.getAs[Double]("sy1"), mrow.getAs[Double]("sxx1"),
      mrow.getAs[Double]("sxy1"))
    val (b0, a0) = ols(n0, mrow.getAs[Double]("sx0"),
      mrow.getAs[Double]("sy0"), mrow.getAs[Double]("sxx0"),
      mrow.getAs[Double]("sxy0"))
    val e = least(greatest(lit(1.0) /
      (lit(1.0) + exp(-(lit(pa) + lit(pb) * col("__x")))),
      lit(0.01)), lit(0.99))
    val mu1 = lit(a1) + lit(b1) * col("__x")
    val mu0 = lit(a0) + lit(b0) * col("__x")
    val psi = col("__t") * (col("__y") - mu1) / e + mu1 -
      (lit(1.0) - col("__t")) * (col("__y") - mu0) / (lit(1.0) - e) - mu0
    base.agg(count(lit(1)).cast("long").as("n"),
        sum(col("__t")).cast("long").as("n_treated"),
        avg(psi).as("ate_dr"),
        (sum(col("__t") * col("__y")) / sum(col("__t")) -
          sum((lit(1.0) - col("__t")) * col("__y")) /
            sum(lit(1.0) - col("__t"))).as("ate_naive"))
      .select(col("n"), col("n_treated"),
        lit(pb).as("propensity_slope"), col("ate_naive"), col("ate_dr"))
  }

  /**
   * Spiegelhalter's calibration z-test — the HYPOTHESIS-TEST
   * companion to the descriptive ECE/calibration curve: under the
   * null that every predicted probability p is correct,
   * Z = Σ(y−p)(1−2p) / √Σ(1−2p)²·p·(1−p) ~ N(0,1). Positive Z means
   * outcomes beat the probabilities where p < ½ and undershoot where
   * p > ½ — i.e. predictions are too extreme; the Brier score alone
   * cannot distinguish miscalibration from irreducible noise, which
   * is exactly what this decomposes out. Scores clip to
   * [1e−6, 1−1e−6] (a hard 0/1 claim has zero null variance).
   * Returns ONE row: (n, base_rate, mean_score, brier, z_stat).
   *
   * ONE map-side-combined scan, 1-row output.
   */
  def calibrationZTest(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val p = least(greatest(col(scoreCol).cast("double"), lit(1e-6)),
      lit(1.0 - 1e-6))
    df.where(y.isNotNull && col(scoreCol).isNotNull)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(y).as("__sy"), sum(p).as("__sp"),
        avg(pow(p - y, 2)).as("brier"),
        sum((y - p) * (lit(1.0) - lit(2.0) * p)).as("__num"),
        sum(pow(lit(1.0) - lit(2.0) * p, 2) * p * (lit(1.0) - p))
          .as("__den"))
      .select(col("__n").cast("long").as("n"),
        (col("__sy") / col("__n")).as("base_rate"),
        (col("__sp") / col("__n")).as("mean_score"), col("brier"),
        when(col("__den") > 0, col("__num") / sqrt(col("__den")))
          .as("z_stat"))
  }

  /**
   * Mediation analysis (Baron–Kenny / product-of-coefficients): how
   * much of x's effect on y flows THROUGH the mediator m? Three
   * closed-form OLS fits from ONE pairwise-moments scan — total
   * effect c (y~x), a-path (m~x), and the joint y ~ x + m solved by
   * Cramer 3×3 for the direct effect c′ and b-path — then
   * indirect = a·b and proportion mediated = a·b/c. All pure column
   * algebra (the q330 discipline), so any engine replays it exactly.
   * Observational caveat applies: this decomposes ASSOCIATIONS; the
   * causal reading needs the usual no-unmeasured-confounding
   * assumptions. Returns ONE row: (n, total_effect, a_path, b_path,
   * direct_effect, indirect_effect, prop_mediated).
   *
   * Scale shape: one map-side-combined moments aggregation (9 sums),
   * then 1-row algebra. Nothing driver-side, no second scan.
   */
  def mediationAnalysis(df: DataFrame, xCol: String, mCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val mm = col(mCol).cast("double")
    val y = col(yCol).cast("double")
    val mo = df.where(x.isNotNull && mm.isNotNull && y.isNotNull)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).as("sx"), sum(mm).as("sm"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(mm * mm).as("smm"),
        sum(x * mm).as("sxm"), sum(x * y).as("sxy"),
        sum(mm * y).as("smy"))
    val cxx = col("sxx") - col("sx") * col("sx") / col("n")
    val cmm = col("smm") - col("sm") * col("sm") / col("n")
    val cxm = col("sxm") - col("sx") * col("sm") / col("n")
    val cxy = col("sxy") - col("sx") * col("sy") / col("n")
    val cmy = col("smy") - col("sm") * col("sy") / col("n")
    // degenerate-input guards (the chowTest ANSI-mode convention):
    // constant x → cxx = 0 (no total/a-path), collinear x/m → det = 0
    // (no direct/b-path), zero total effect → NULL prop_mediated —
    // each ratio reports NULL instead of a division error/NaN.
    val total = when(cxx =!= 0, cxy / cxx)
    val aPath = when(cxx =!= 0, cxm / cxx)
    // y ~ x + m on centered moments: 2×2 normal equations
    val det = cxx * cmm - cxm * cxm
    val direct = when(det =!= 0, (cxy * cmm - cmy * cxm) / det)
    val bPath = when(det =!= 0, (cmy * cxx - cxy * cxm) / det)
    mo.select(col("n").cast("long").as("n"), total.as("total_effect"),
      aPath.as("a_path"), bPath.as("b_path"),
      direct.as("direct_effect"),
      (aPath * bPath).as("indirect_effect"),
      when(total =!= 0, aPath * bPath / total).as("prop_mediated"))
  }

  /**
   * Platt scaling: recalibrate a raw score into a probability by
   * fitting P(y=1|s) = σ(a·s + b) — the standard post-hoc fix when
   * [[binaryMetrics]] shows good ranking but [[calibrationCurve]]
   * shows the scores aren't probabilities. The logistic fit rides
   * [[Regression.logisticRegression]]'s fixed-Newton contract
   * (deterministic, engine-replayable); the readout is the expected
   * calibration error (equal-width bins over [0,1]) of the RAW score
   * (clipped to [0,1], read as a probability) vs the CALIBRATED one:
   * ECE = Σ_b (n_b/N)·|ȳ_b − p̄_b|. Returns ONE row:
   * (n, a, b, ece_raw, ece_platt, iterations).
   *
   * Scale shape: the Newton scans ([[Regression.logisticRegression]]:
   * one sufficient-stats aggregation per round), then ONE extra scan
   * to a ≤bins²-cell (raw-bin × calibrated-bin) frame from which both
   * ECEs reduce — never two passes for the two readouts.
   */
  def plattScaling(df: DataFrame, labelCol: String, scoreCol: String,
      iterations: Int = 4, bins: Int = 10): DataFrame = {
    require(bins >= 2, "plattScaling: bins >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__s"))
      .where(col("__y").isNotNull && col("__s").isNotNull)
    val fit = graft.ops.Regression
      .logisticRegression(base, Seq("__s"), col("__y") > 0.5, iterations)
      .collect().map(r => r.getAs[String]("term") ->
        r.getAs[Double]("coef")).toMap
    val b0 = fit("(intercept)"); val a = fit("__s")
    val pRaw = least(greatest(col("__s"), lit(0.0)), lit(1.0))
    val pCal = lit(1.0) /
      (lit(1.0) + exp(-(lit(b0) + lit(a) * col("__s"))))
    val bin = (p: Column) =>
      least(floor(p * bins), lit(bins - 1L)).cast("long")
    val cells = base
      .groupBy(bin(pRaw).as("__br"), bin(pCal).as("__bc"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(col("__y")).as("__sy"),
        sum(pRaw).as("__sr"), sum(pCal).as("__sc"))
      .localCheckpoint() // both ECE rollups read the ≤bins² frame
    val eceOf = (binCol: String, pSum: String) => cells
      .groupBy(col(binCol)).agg(sum(col("__n")).as("__bn"),
        sum(col("__sy")).as("__by"), sum(col(pSum)).as("__bp"))
      .crossJoin(broadcast(cells.agg(sum(col("__n")).as("__N"))))
      .agg(sum(col("__bn") / col("__N") *
        abs(col("__by") / col("__bn") - col("__bp") / col("__bn"))))
      .head().getDouble(0)
    val eceRaw = eceOf("__br", "__sr")
    val ecePlatt = eceOf("__bc", "__sc")
    val n = cells.agg(sum(col("__n"))).head().getDouble(0).toLong
    Seq((n, a, b0, eceRaw, ecePlatt, iterations))
      .toDF("n", "a", "b", "ece_raw", "ece_platt", "iterations")
  }

  /**
   * Optimal classification threshold by Youden's J = sensitivity +
   * specificity − 1, the standard "where do I cut the score" readout
   * after [[binaryMetrics]] says the ranking is good: every DISTINCT
   * score is a candidate cut (predict positive when score ≥ t), and
   * the maximizing cut is returned with its full operating point.
   * Deterministic: on exactly tied J the SMALLEST threshold wins.
   * Returns ONE row: (n, n_pos, threshold, sensitivity, specificity,
   * j_stat, accuracy).
   *
   * Scale shape: [[prAuc]]'s — one distinct-score groupBy, one
   * exclusive [[PrefixSum]] over the negated-score frame ("strictly
   * above" counts), a broadcast 1-row total, and a `max_by` 1-row
   * reduce. No global sort, no window.
   */
  def optimalThreshold(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val vc = base.groupBy((-col("__p")).as("__ns"))
      .agg(sum(col("__y")).as("__pos"),
        count(lit(1)).cast("double").as("__tot"))
    val pre = PrefixSum.exclusive(vc, "__ns",
        Seq("__pos" -> "__pabove", "__tot" -> "__tabove"))
      .join(broadcast(base.agg(sum(col("__y")).as("__P"),
        count(lit(1)).cast("double").as("__N"))))
    val tp = col("__pabove") + col("__pos")
    val pp = col("__tabove") + col("__tot")
    val fp = pp - tp
    val sens = tp / col("__P")
    val spec = lit(1.0) - fp / (col("__N") - col("__P"))
    val scored = pre.select(col("__P"), col("__N"),
      (-col("__ns")).as("__t"), sens.as("__sens"), spec.as("__spec"),
      (sens + spec - 1).as("__j"),
      ((tp + (col("__N") - col("__P") - fp)) / col("__N")).as("__acc"))
    scored.agg(
        max(col("__N")).cast("long").as("n"),
        max(col("__P")).cast("long").as("n_pos"),
        max_by(
          struct(col("__t"), col("__sens"), col("__spec"), col("__j"),
            col("__acc")),
          struct(col("__j"), -col("__t"))).as("__best"))
      .select(col("n"), col("n_pos"),
        col("__best.__t").as("threshold"),
        col("__best.__sens").as("sensitivity"),
        col("__best.__spec").as("specificity"),
        col("__best.__j").as("j_stat"),
        col("__best.__acc").as("accuracy"))
  }

  /**
   * Method-comparison agreement in ONE scan: Lin's concordance
   * correlation coefficient CCC = 2·c_xy / (c_xx + c_yy + (x̄−ȳ)²)
   * (population-covariance form) beside the Bland–Altman limits of
   * agreement (bias = mean(x−y), LoA = bias ± 1.96·sd_d, sample sd) —
   * the "can assay B replace assay A" pair: CCC prices how far the
   * points sit from the identity LINE, Bland–Altman prices the
   * per-measurement disagreement BAND. Returns ONE row:
   * (n, pearson_r, ccc, bias, sd_diff, loa_low, loa_high).
   */
  def concordanceMetrics(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val m = df.where(x.isNotNull && y.isNotNull)
      .agg(count(lit(1)).cast("double").as("n"), sum(x).as("sx"),
        sum(y).as("sy"), sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    val n = col("n")
    val cxx = (col("sxx") - col("sx") * col("sx") / n) / n
    val cyy = (col("syy") - col("sy") * col("sy") / n) / n
    val cxy = (col("sxy") - col("sx") * col("sy") / n) / n
    val dm = col("sx") / n - col("sy") / n
    // sample variance of d = x − y from the same moments
    val sd = sqrt((col("sxx") + col("syy") - lit(2.0) * col("sxy") -
      n * dm * dm) / (n - 1))
    val bias = dm
    m.select(n.cast("long").as("n"),
      when(cxx > 0 && cyy > 0, cxy / sqrt(cxx * cyy)).as("pearson_r"),
      when(cxx + cyy + dm * dm > 0,
        lit(2.0) * cxy / (cxx + cyy + dm * dm)).as("ccc"),
      bias.as("bias"), when(n > 1, sd).as("sd_diff"),
      when(n > 1, bias - lit(1.96) * sd).as("loa_low"),
      when(n > 1, bias + lit(1.96) * sd).as("loa_high"))
  }

  /**
   * Matthews correlation coefficient across every distinct score
   * threshold (predict positive at score ≥ t): one row per threshold
   * (threshold, tp, fp, fn, tn, mcc, f1) ordered by threshold — the
   * balanced-cutoff companion to [[youdenThreshold]] (J optimizes
   * sens+spec; MCC is the all-four-cells correlation, the robust
   * choice under class imbalance).
   *
   * Scale shape: [[prAuc]]'s frame exactly — distinct-score counts,
   * one exclusive prefix sum ordered by negated score, a broadcast
   * 1-row total; every confusion cell is algebra on the prefix row.
   */
  def mccByThreshold(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val vc = base.groupBy((-col("__p")).as("__ns"))
      .agg(sum(col("__y")).as("__pos"),
        count(lit(1)).cast("double").as("__tot"))
    val pre = PrefixSum.exclusive(vc, "__ns",
        Seq("__pos" -> "__pabove", "__tot" -> "__tabove"))
      .join(broadcast(base.agg(sum(col("__y")).as("__P"),
        count(lit(1)).cast("double").as("__N"))))
    val tp = col("__pabove") + col("__pos")
    val pp = col("__tabove") + col("__tot")
    val fp = pp - tp
    val fn = col("__P") - tp
    val tn = col("__N") - col("__P") - fp
    val denom = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    pre.select((-col("__ns")).as("threshold"),
      tp.cast("long").as("tp"), fp.cast("long").as("fp"),
      fn.cast("long").as("fn"), tn.cast("long").as("tn"),
      when(denom > 0, (tp * tn - fp * fn) / sqrt(denom)).as("mcc"),
      when(tp * 2 + fp + fn > 0, tp * 2 / (tp * 2 + fp + fn)).as("f1"))
  }

  /**
   * E-value for unmeasured confounding (VanderWeele & Ding 2017): the
   * minimum strength of association an unmeasured confounder would
   * need with BOTH exposure and outcome to explain away an observed
   * risk ratio — the standard sensitivity readout attached to any
   * observational RR. E = RR* + √(RR*·(RR*−1)) with RR* = RR when
   * RR ≥ 1 else 1/RR; also reported for the CI bound closer to the
   * null (NULL when the CI crosses 1 — the conventional "E = 1").
   * Returns ONE row: (n, n_exposed, rr, rr_ci_low, rr_ci_high,
   * e_value, e_value_ci).
   *
   * Scale shape: ONE conditional-aggregation scan builds the 2×2; the
   * log-RR CI is the standard delta-method form.
   */
  def eValue(df: DataFrame, exposed: Column, outcome: Column): DataFrame = {
    val e = when(exposed, 1.0).otherwise(0.0)
    val y = when(outcome, 1.0).otherwise(0.0)
    val m = df.agg(count(lit(1)).as("n"), sum(e).as("n1"),
      sum((lit(1.0) - e)).as("n0"), sum(e * y).as("a"),
      sum((lit(1.0) - e) * y).as("c"))
    val p1 = col("a") / col("n1")
    val p0 = col("c") / col("n0")
    val ok = col("n1") > 0 && col("n0") > 0 && col("a") > 0 && col("c") > 0
    val rr = p1 / p0
    val seLog = sqrt(lit(1.0) / col("a") - lit(1.0) / col("n1") +
      lit(1.0) / col("c") - lit(1.0) / col("n0"))
    val lo = exp(log(rr) - lit(1.96) * seLog)
    val hi = exp(log(rr) + lit(1.96) * seLog)
    def ev(r: Column): Column = {
      val rs = when(r >= 1, r).otherwise(lit(1.0) / r)
      rs + sqrt(rs * (rs - 1))
    }
    // CI bound closer to the null: hi when RR < 1, lo when RR > 1;
    // a CI crossing 1 cannot be explained away by LESS confounding
    // than none — conventional E = 1 reported as NULL
    val nearNull = when(rr >= 1, lo).otherwise(hi)
    m.select(col("n"), col("n1").cast("long").as("n_exposed"),
      when(ok, rr).as("rr"), when(ok, lo).as("rr_ci_low"),
      when(ok, hi).as("rr_ci_high"), when(ok, ev(rr)).as("e_value"),
      when(ok && ((rr >= 1 && lo > 1) || (rr < 1 && hi < 1)),
        ev(nearNull)).as("e_value_ci"))
  }
  /**
   * Weighted Cohen's kappa for ORDINAL ratings (numeric categories):
   * disagreements are penalized by distance — linear
   * w = 1 − |i−j|/(k_max−k_min) or quadratic w = 1 − ((i−j)/range)² —
   * so a 1-vs-2 disagreement costs less than 1-vs-5 (plain
   * [[cohenKappa]] treats them the same, wrong for graded quality
   * labels). κ_w = (po_w − pe_w)/(1 − pe_w) with weighted observed
   * and chance agreement. Returns ONE row:
   * (n, po_linear, pe_linear, kappa_linear, po_quadratic,
   * pe_quadratic, kappa_quadratic).
   *
   * Scale shape: one joint groupBy (≤k² rows); the chance term is the
   * marginal-product sum over the k×k grid of the REDUCED marginal
   * frames — never the corpus.
   */
  def weightedKappa(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val joint = df.where(a.isNotNull && b.isNotNull)
      .groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint() // marginals + range + both weighted sums
    val ma = joint.groupBy(col("__a").as("__k")).agg(sum("__n").as("__na"))
    val mb = joint.groupBy(col("__b").as("__k")).agg(sum("__n").as("__nb"))
    // "__tt", not "__N": the case-insensitive resolver would clash
    // with joint's "__n" cell count across the crossJoin (q346 lesson)
    val rng = broadcast(joint.agg(
      (greatest(max(col("__a")), max(col("__b"))) -
        least(min(col("__a")), min(col("__b")))).as("__r"),
      sum(col("__n")).as("__tt")))
    // ANSI-guard: a single distinct category (or identical min/max for
    // both raters) gives range 0 — weights are then 0/0; report NULL
    // (the repo-wide degenerate-input convention), never NaN
    def wl(x: Column, y: Column, r: Column) =
      when(r > 0, lit(1.0) - abs(x - y) / r)
    def wq(x: Column, y: Column, r: Column) =
      when(r > 0, lit(1.0) - pow((x - y) / r, 2.0))
    val po = joint.crossJoin(rng)
      .agg(sum(col("__n") * wl(col("__a"), col("__b"), col("__r")))
        .as("__pol"),
        sum(col("__n") * wq(col("__a"), col("__b"), col("__r")))
          .as("__poq"),
        max(col("__tt")).as("__ntot"))
    // chance term: full k×k marginal cross — REDUCED frames only
    val pe = ma.crossJoin(mb
        .select(col("__k").as("__k2"), col("__nb")))
      .crossJoin(rng)
      .agg(sum(col("__na") * col("__nb") *
        wl(col("__k"), col("__k2"), col("__r"))).as("__pel"),
        sum(col("__na") * col("__nb") *
          wq(col("__k"), col("__k2"), col("__r"))).as("__peq"))
    po.crossJoin(broadcast(pe))
      .select(col("__ntot").cast("long").as("n"),
        (col("__pol") / col("__ntot")).as("po_linear"),
        (col("__pel") / (col("__ntot") * col("__ntot"))).as("pe_linear"),
        (col("__poq") / col("__ntot")).as("po_quadratic"),
        (col("__peq") / (col("__ntot") * col("__ntot")))
          .as("pe_quadratic"))
      .select(col("n"), col("po_linear"), col("pe_linear"),
        when(col("pe_linear") < 1, (col("po_linear") - col("pe_linear"))
          / (lit(1.0) - col("pe_linear"))).as("kappa_linear"),
        col("po_quadratic"), col("pe_quadratic"),
        when(col("pe_quadratic") < 1,
          (col("po_quadratic") - col("pe_quadratic"))
            / (lit(1.0) - col("pe_quadratic"))).as("kappa_quadratic"))
  }

  /**
   * Reliability diagram table: the per-bin frame BEHIND a calibration
   * plot (and behind the scalar ECE that [[plattScaling]] reports) —
   * score clamped to [0,1], binned on a fixed `bins`-cell grid, each
   * bin reporting its count, mean confidence, empirical accuracy, the
   * signed gap, and the bin's contribution to ECE. The table is what
   * tells you WHERE a model is miscalibrated (overconfident head vs
   * underconfident tail) when the scalar only says THAT it is. One
   * grouped pass; ≤ `bins` rows.
   */
  /**
   * Spiegelhalter's Z calibration test: the SIGNIFICANCE companion to
   * ECE's magnitude — Z = Σ(y−p)(1−2p) / √(Σ(1−2p)²p(1−p)), standard
   * normal under perfect calibration; no binning, so no bin-choice
   * sensitivity. ONE aggregation scan. Returns (n, brier, z_stat).
   */
  def spiegelhalterZ(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val p = least(greatest(col(scoreCol).cast("double"), lit(0.0)),
      lit(1.0))
    df.where(y.isNotNull && col(scoreCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        avg((y - p) * (y - p)).as("brier"),
        sum((y - p) * (lit(1.0) - lit(2.0) * p)).as("__num"),
        sum((lit(1.0) - lit(2.0) * p) * (lit(1.0) - lit(2.0) * p) *
          p * (lit(1.0) - p)).as("__den"))
      .select(col("n"), col("brier"),
        when(col("__den") > 0, col("__num") / sqrt(col("__den")))
          .as("z_stat"))
  }

  /**
   * Hosmer–Lemeshow goodness-of-fit over risk DECILES (cut at exact
   * interpolated score quantiles — the canonical grouping, not
   * fixed-width bins): χ² = Σ_g (O_g − E_g)²/(E_g(1 − E_g/n_g)),
   * ~χ²(g−2) under fit. The classical "does the model fit at all"
   * companion to the reliability diagram. One quantile pass + one
   * grouped scan. Returns (n, n_bins, chi2, dof).
   */
  def hosmerLemeshow(df: DataFrame, labelCol: String,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 3, "hosmerLemeshow: bins >= 3")
    val y = col(labelCol).cast("double")
    val p = least(greatest(col(scoreCol).cast("double"), lit(0.0)),
      lit(1.0))
    val base = df.where(y.isNotNull && col(scoreCol).isNotNull)
      .select(p.as("__p"), y.as("__y"))
    val named = (1 until bins).map(i => (s"q$i", i.toDouble / bins))
    val cutsRow = graft.analysis.AnalysisPlanner
      .exactPercentiles(base, "__p", named, Nil).head()
    val cuts = named.map { case (nm, _) => cutsRow.getAs[Double](nm) }
    val dec = cuts.foldLeft(lit(0L))((acc, q) =>
      acc + when(col("__p") > q, 1L).otherwise(0L))
    base.select(dec.as("__g"), col("__p"), col("__y"))
      .groupBy("__g")
      .agg(count(lit(1)).cast("double").as("__ng"),
        sum(col("__y")).as("__o"), sum(col("__p")).as("__e"))
      .where(col("__e") > 0 && col("__e") < col("__ng"))
      .agg(sum(col("__ng")).cast("long").as("n"),
        count(lit(1)).as("n_bins"),
        sum(pow(col("__o") - col("__e"), 2.0) /
          (col("__e") * (lit(1.0) - col("__e") / col("__ng"))))
          .as("chi2"))
      .withColumn("dof", greatest(col("n_bins") - 2, lit(1L)))
  }

  /**
   * Murphy decomposition of the Brier score over `bins` fixed score
   * bins: BRIER ≈ RELIABILITY − RESOLUTION + UNCERTAINTY — the
   * readout that separates "the scores are wrong" (reliability, fix
   * by recalibrating) from "the scores don't discriminate"
   * (resolution, fix by remodeling), which the scalar Brier
   * conflates. The identity is exact for bin-constant forecasts; the
   * residual (brier − rel + res − unc) is reported as
   * within-bin_variance so the approximation is visible. ONE grouped
   * pass. Returns (n, brier, reliability, resolution, uncertainty,
   * within_bin_variance).
   */
  def brierDecomposition(df: DataFrame, labelCol: String,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "brierDecomposition: bins >= 2")
    val y = col(labelCol).cast("double")
    val p = least(greatest(col(scoreCol).cast("double"), lit(0.0)),
      lit(1.0))
    val binned = df.where(y.isNotNull && col(scoreCol).isNotNull)
      .select(least(floor(p * bins), lit(bins - 1L)).as("__b"),
        p.as("__p"), y.as("__y"))
    val per = binned.groupBy("__b")
      .agg(count(lit(1)).cast("double").as("__nk"),
        avg(col("__p")).as("__pk"), avg(col("__y")).as("__ok"),
        sum((col("__y") - col("__p")) * (col("__y") - col("__p")))
          .as("__sqk"))
    val tot = broadcast(per.agg(sum(col("__nk")).as("__N"),
      (sum(col("__ok") * col("__nk")) / sum(col("__nk"))).as("__obar")))
    per.crossJoin(tot)
      .agg(max(col("__N")).cast("long").as("n"),
        (sum(col("__sqk")) / max(col("__N"))).as("brier"),
        (sum(col("__nk") * (col("__pk") - col("__ok")) *
          (col("__pk") - col("__ok"))) / max(col("__N")))
          .as("reliability"),
        (sum(col("__nk") * (col("__ok") - col("__obar")) *
          (col("__ok") - col("__obar"))) / max(col("__N")))
          .as("resolution"),
        max(col("__obar") * (lit(1.0) - col("__obar")))
          .as("uncertainty"))
      .withColumn("within_bin_variance",
        col("brier") - col("reliability") + col("resolution") -
          col("uncertainty"))
  }

  def reliabilityDiagram(df: DataFrame, labelCol: String,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "reliabilityDiagram: bins >= 2")
    val y = col(labelCol).cast("double")
    val p = least(greatest(col(scoreCol).cast("double"), lit(0.0)),
      lit(1.0))
    val binned = df.where(y.isNotNull && col(scoreCol).isNotNull)
      .select(least(floor(p * bins), lit(bins - 1L)).as("bin"),
        p.as("__p"), y.as("__y"))
    val tot = broadcast(binned.agg(count(lit(1)).cast("double").as("__N")))
    binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), avg(col("__p")).as("confidence"),
        avg(col("__y")).as("accuracy"))
      .crossJoin(tot)
      .select(col("bin"), col("n"), col("confidence"), col("accuracy"),
        (col("accuracy") - col("confidence")).as("gap"),
        (col("n") / col("__N") * abs(col("accuracy") - col("confidence")))
          .as("ece_contribution"))
  }

  /** Welch sufficient statistics (n, mean, var) of `valueCol` for the
    * two arms of `groupCol`, as ONE conditional-aggregation scan —
    * shared by the sequential/Bayesian A/B readouts. */
  private def armMoments(df: DataFrame, groupCol: String,
      valueCol: String, a: String, b: String): DataFrame = {
    val y = col(valueCol).cast("double")
    val inA = col(groupCol) === a
    val inB = col(groupCol) === b
    df.where((inA || inB) && y.isNotNull)
      .agg(sum(when(inA, 1.0).otherwise(0.0)).as("__na"),
        sum(when(inB, 1.0).otherwise(0.0)).as("__nb"),
        sum(when(inA, y)).as("__sa"), sum(when(inB, y)).as("__sb"),
        sum(when(inA, y * y)).as("__qa"),
        sum(when(inB, y * y)).as("__qb"))
      .withColumn("__ma", col("__sa") / col("__na"))
      .withColumn("__mb", col("__sb") / col("__nb"))
      .withColumn("__va",
        (col("__qa") - col("__sa") * col("__sa") / col("__na")) /
          (col("__na") - 1))
      .withColumn("__vb",
        (col("__qb") - col("__sb") * col("__sb") / col("__nb")) /
          (col("__nb") - 1))
  }

  /**
   * Mixture sequential probability ratio test (mSPRT, Johari et al.
   * 2017) on a two-arm mean difference — the ALWAYS-VALID inference
   * that lets an experimenter peek at a running A/B test at any time
   * without inflating false positives (a fixed-n t-test peeked at
   * repeatedly does). With the normal mixture N(0, τ²) over effect
   * sizes and Welch variance V of the observed difference d:
   *   Λ = √(V/(V+τ²)) · exp(d²τ²/(2V(V+τ²))),  p_always = min(1, 1/Λ)
   * Returns ONE row: (n_c, n_t, diff, se, log_lambda, always_valid_p).
   * log Λ is emitted (not Λ) so extreme evidence cannot overflow.
   *
   * Scale shape: one conditional-moments corpus scan, 1-row algebra.
   */
  def msprt(df: DataFrame, groupCol: String, valueCol: String,
      control: String, treatment: String, tau: Double): DataFrame = {
    require(tau > 0, "msprt: tau > 0")
    val m = armMoments(df, groupCol, valueCol, control, treatment)
    val d = col("__mb") - col("__ma")
    val v = col("__va") / col("__na") + col("__vb") / col("__nb")
    val t2 = lit(tau * tau)
    val logL = lit(0.5) * log(v / (v + t2)) +
      d * d * t2 / (lit(2.0) * v * (v + t2))
    m.select(col("__na").cast("long").as("n_c"),
      col("__nb").cast("long").as("n_t"), d.as("diff"),
      sqrt(v).as("se"), logL.as("log_lambda"),
      least(lit(1.0), exp(-logL)).as("always_valid_p"))
  }

  /**
   * Gaussian Bayesian A/B decision panel on a CONTINUOUS metric (the
   * Beta-posterior [[bayesianAbTest]] is the rate version): with flat
   * priors the posterior of μ_t − μ_c is N(d, V), so
   * P(treatment > control) = Φ(d/√V), and the decision-theoretic
   * readouts are the expected losses E[max(−Δ,0)] (choose treatment,
   * treatment actually worse) = √V·φ(z) − d·Φ(−z) and the mirror for
   * choosing control — the "how much do I stand to lose" numbers a
   * launch decision actually uses. Φ from the Abramowitz–Stegun
   * 26.2.17 polynomial written as column arithmetic so an oracle can
   * replay it term-for-term. Returns ONE row:
   * (n_c, n_t, diff, se, prob_t_beats_c, exp_loss_choose_t,
   * exp_loss_choose_c).
   */
  def gaussianAbLoss(df: DataFrame, groupCol: String, valueCol: String,
      control: String, treatment: String): DataFrame = {
    val m = armMoments(df, groupCol, valueCol, control, treatment)
    val d = col("__mb") - col("__ma")
    val se = sqrt(col("__va") / col("__na") + col("__vb") / col("__nb"))
    val z = d / se
    val az = abs(z)
    val pdf = exp(-az * az / 2) / lit(math.sqrt(2 * math.Pi))
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    val upperTail = pdf * poly // 1 − Φ(|z|)
    val phiZ = when(z >= 0, lit(1.0) - upperTail).otherwise(upperTail)
    m.select(col("__na").cast("long").as("n_c"),
      col("__nb").cast("long").as("n_t"), d.as("diff"), se.as("se"),
      phiZ.as("prob_t_beats_c"),
      (se * pdf - d * (lit(1.0) - phiZ)).as("exp_loss_choose_t"),
      (se * pdf + d * phiZ).as("exp_loss_choose_c"))
  }
  /**
   * Gains / KS score-separation decile table — the credit-scoring
   * readout of "how well does this score rank the positives": rows
   * bucket into score deciles at exact-DISC cuts (decile 1 = highest
   * scores; cut ties land in the LOWER-score decile on both engines),
   * and each decile reports its positive capture plus the cumulative
   * top-down gains. `ks_at` is |cumF_pos − cumF_neg| per decile — its
   * max over rows IS the Kolmogorov–Smirnov separation statistic.
   * Returns 10 rows: (decile, n, n_pos, pos_rate, cum_n_share,
   * cum_pos_share, lift, ks_at).
   *
   * Scale shape: one value-count pass for the cuts
   * ([[graft.analysis.AnalysisPlanner.exactPercentilesDisc]]), one
   * conditional bucket aggregation, then [[graft.analysis.PrefixSum]]
   * over the 10-row frame — no global sort, no window over raw rows.
   */
  def gainsTable(df: DataFrame, scoreCol: String,
      label: Column): DataFrame = {
    val x = col(scoreCol).cast("double")
    val base = df.where(x.isNotNull)
      .select(x.as("__x"), when(label, 1.0).otherwise(0.0).as("__y"))
      .localCheckpoint() // cuts probe + bucket pass share one frame
    val cuts = graft.analysis.AnalysisPlanner.exactPercentilesDisc(
      base, "__x", (1 to 9).map(i => (s"q$i", i / 10.0)), Nil).head()
    val qs = (1 to 9).map(i => cuts.getAs[Double](s"q$i"))
    val decAsc = qs.foldLeft(lit(0L))((acc, q) =>
      acc + when(col("__x") > q, 1L).otherwise(0L))
    val per = base.select((lit(10L) - decAsc).as("decile"), col("__y"))
      .groupBy("decile")
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__y")).as("__p"))
    val tot = broadcast(per.agg(sum(col("__n")).as("__tn"),
      sum(col("__p")).as("__tp")))
    graft.analysis.PrefixSum.exclusive(per, "decile",
        Seq("__n" -> "__cn", "__p" -> "__cp"))
      .crossJoin(tot)
      .select(col("decile"), col("__n").cast("long").as("n"),
        col("__p").cast("long").as("n_pos"),
        (col("__p") / col("__n")).as("pos_rate"),
        ((col("__cn") + col("__n")) / col("__tn")).as("cum_n_share"),
        when(col("__tp") > 0, (col("__cp") + col("__p")) / col("__tp"))
          .as("cum_pos_share"),
        when(col("__tp") > 0, (col("__cp") + col("__p")) / col("__tp") /
          ((col("__cn") + col("__n")) / col("__tn"))).as("lift"),
        when(col("__tp") > 0 && col("__tn") > col("__tp"), abs(
          (col("__cp") + col("__p")) / col("__tp") -
          (col("__cn") + col("__n") - col("__cp") - col("__p")) /
            (col("__tn") - col("__tp")))).as("ks_at"))
  }

  /**
   * Propensity-score matching ATT: each treated unit takes its single
   * nearest control by |p| within a `caliper` (1-NN with replacement,
   * ties by control id — fully deterministic), and the effect is the
   * mean of matched pairwise differences with the paired-t SE.
   * Returns ONE row: (n_treated, n_matched, match_rate, att, se_att).
   *
   * Scale shape: candidates come from a BANDED equi-join on
   * ⌊p/caliper⌋ buckets (own + two neighbors), so the pair frame is
   * |treated| × (controls within ±2 calipers) — a caliper sized to
   * the score density keeps that a constant per treated; the 1-NN cut
   * is a per-treated window over that banded frame.
   */
  def psmAtt(df: DataFrame, treatCol: Column, scoreCol: String,
      valueCol: String, idCol: String,
      caliper: Double = 0.002): DataFrame = {
    require(caliper > 0 && caliper < 0.5, "psmAtt: caliper in (0, 0.5)")
    import org.apache.spark.sql.expressions.Window
    val p = col(scoreCol).cast("double")
    val y = col(valueCol).cast("double")
    val base = df.where(p.isNotNull && y.isNotNull)
      .select(col(idCol).as("__id"), when(treatCol, 1L).otherwise(0L)
        .as("__t"), p.as("__p"), y.as("__y"))
      .withColumn("__b", floor(col("__p") / caliper).cast("long"))
      .localCheckpoint() // treated side, control side, and the count
    val treated = base.where(col("__t") === 1L)
      .select(col("__id").as("__tid"), col("__p").as("__tp"),
        col("__y").as("__ty"), col("__b"))
    val controls = base.where(col("__t") === 0L)
      .select(col("__id").as("__cid"), col("__p").as("__cp"),
        col("__y").as("__cy"), explode(array(col("__b") - 1, col("__b"),
          col("__b") + 1)).as("__b"))
    val cand = treated.join(controls, Seq("__b"))
      .where(abs(col("__tp") - col("__cp")) <= caliper)
    val wBest = Window.partitionBy("__tid")
      .orderBy(abs(col("__tp") - col("__cp")).asc, col("__cid").asc)
    val matched = cand
      .withColumn("__r", row_number().over(wBest))
      .where(col("__r") === 1)
      .select(col("__tid"), (col("__ty") - col("__cy")).as("__d"))
    val nT = broadcast(treated.agg(count(lit(1)).as("__nt")))
    matched.crossJoin(nT)
      .agg(max(col("__nt")).as("n_treated"),
        count(lit(1)).as("n_matched"),
        (count(lit(1)).cast("double") / max(col("__nt")))
          .as("match_rate"),
        avg(col("__d")).as("att"),
        (stddev_samp(col("__d")) /
          sqrt(count(lit(1)).cast("double"))).as("se_att"))
  }

  /**
   * Randomization inference for a two-arm mean difference: the
   * observed effect is ranked against `k` DETERMINISTIC pseudo-
   * assignments (portable md5 of (id, replicate) — identical in any
   * engine, no RNG), p = (1 + #{|θ_i| ≥ |θ̂|})/(k + 1) — the exact
   * finite-sample test that needs no variance formula. Returns ONE
   * row: (n, effect, k, n_ge, p_value, max_pseudo_abs).
   *
   * Scale shape: one grid explode (k+1 copies) through a map-side-
   * combined groupBy(replicate) — a (k+1)-row frame does the rest.
   */
  def randomizationTest(df: DataFrame, treatCol: Column, idCol: String,
      valueCol: String, k: Int = 19): DataFrame = {
    require(k >= 1 && k <= 199, "randomizationTest: k in 1..199")
    val y = col(valueCol).cast("double")
    val base = df.where(y.isNotNull)
      .select(col(idCol).as("__id"), when(treatCol, 1L).otherwise(0L)
        .as("__t0"), y.as("__y"))
    val grid = array((0 to k).map(i => lit(i)): _*)
    val half = graft.functions.PortableHash.M / 2
    val assigned = base.select(col("__id"), col("__t0"), col("__y"),
        explode(grid).as("__i"))
      .withColumn("__t",
        when(col("__i") === 0, col("__t0")).otherwise(
          when(graft.functions.PortableHash
            .bucket(Seq(col("__id"), col("__i"))) < half, 1L)
            .otherwise(0L)))
    val effects = assigned.groupBy("__i")
      .agg(count(lit(1)).as("__n"),
        (avg(when(col("__t") === 1, col("__y"))) -
          avg(when(col("__t") === 0, col("__y")))).as("__th"))
    val obs = effects.where(col("__i") === 0)
      .select(col("__n").as("n"), col("__th").as("effect"))
    val pseudo = effects.where(col("__i") =!= 0)
    obs.crossJoin(broadcast(pseudo.agg(
        count(lit(1)).as("k"),
        max(abs(col("__th"))).as("max_pseudo_abs"))))
      .join(pseudo.crossJoin(broadcast(obs))
        .agg(sum(when(abs(col("__th")) >= abs(col("effect")), 1L)
          .otherwise(0L)).as("n_ge")))
      .withColumn("p_value",
        (col("n_ge") + 1).cast("double") / (col("k") + 1))
      .select(col("n"), col("effect"), col("k"), col("n_ge"),
        col("p_value"), col("max_pseudo_abs"))
  }

  /**
   * Group-sequential monitoring panel: the cumulative two-sample z of
   * the arm difference at K equal calendar looks against the
   * O'Brien–Fleming-shaped boundary c·√(K/k) — early looks need
   * overwhelming evidence, the final look spends almost full α. The
   * constant c is the caller's (2.04 is the published K=5, α=0.05
   * two-sided value). Returns one row per look: (look, n_cum, z,
   * boundary, crossed).
   *
   * Scale shape: the look grid explodes each row ≤K times (map-side
   * combine); everything after is a K-row frame.
   */
  def groupSequential(df: DataFrame, treatCol: Column, tsCol: String,
      valueCol: String, looks: Int = 5, c: Double = 2.04): DataFrame = {
    require(looks >= 2 && looks <= 20, "groupSequential: looks 2..20")
    val y = col(valueCol).cast("double")
    val base = df.where(y.isNotNull && col(tsCol).isNotNull)
      .select(when(treatCol, 1L).otherwise(0L).as("__t"), y.as("__y"),
        to_date(col(tsCol)).as("__d"))
    val bounds = broadcast(base.agg(min(col("__d")).as("__lo"),
      max(col("__d")).as("__hi")))
    val grid = array((1 to looks).map(i => lit(i)): _*)
    val sliced = base.crossJoin(bounds)
      .withColumn("__slice",
        least(greatest(
          floor(datediff(col("__d"), col("__lo")).cast("double") * looks /
            (datediff(col("__hi"), col("__lo")) + 1)).cast("int") + 1,
          lit(1)), lit(looks)))
      .select(explode(grid).as("look"), col("__slice"), col("__t"),
        col("__y"))
      .where(col("__slice") <= col("look"))
    sliced.groupBy("look")
      .agg(count(lit(1)).as("n_cum"),
        count(when(col("__t") === 1, lit(1))).cast("double").as("__n1"),
        avg(when(col("__t") === 1, col("__y"))).as("__m1"),
        var_samp(when(col("__t") === 1, col("__y"))).as("__v1"),
        count(when(col("__t") === 0, lit(1))).cast("double").as("__n0"),
        avg(when(col("__t") === 0, col("__y"))).as("__m0"),
        var_samp(when(col("__t") === 0, col("__y"))).as("__v0"))
      .withColumn("z",
        when(col("__n1") > 1 && col("__n0") > 1,
          (col("__m1") - col("__m0")) /
            sqrt(col("__v1") / col("__n1") + col("__v0") / col("__n0"))))
      .withColumn("boundary",
        lit(c) * sqrt(lit(looks.toDouble) / col("look")))
      .withColumn("crossed", abs(col("z")) > col("boundary"))
      .select(col("look"), col("n_cum"), col("z"), col("boundary"),
        col("crossed"))
  }

  /**
   * Kitagawa rate decomposition between two periods: the overall-rate
   * gap splits EXACTLY into a composition effect Σ(w₁−w₀)·r̄ (the
   * stratum mix moved) and a rate effect Σ(r₁−r₀)·w̄ (within-stratum
   * rates moved), with symmetric (average) weights so no interaction
   * term survives. Strata present in only one period contribute
   * with the other side's weight/rate read as 0. Returns ONE row:
   * (rate_a, rate_b, gap, composition_effect, rate_effect).
   *
   * Scale shape: one corpus groupBy(stratum) with conditional halves,
   * one ≤|strata|-row reduce.
   */
  def kitagawa(df: DataFrame, stratumCol: String, inB: Column,
      outcome: Column): DataFrame = {
    val cells = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("__s"))
      .agg(sum(when(!inB, 1L).otherwise(0L)).cast("double").as("__na"),
        sum(when(!inB && outcome, 1L).otherwise(0L)).cast("double")
          .as("__ka"),
        sum(when(inB, 1L).otherwise(0L)).cast("double").as("__nb"),
        sum(when(inB && outcome, 1L).otherwise(0L)).cast("double")
          .as("__kb"))
    val tot = broadcast(cells.agg(sum(col("__na")).as("__ta"),
      sum(col("__nb")).as("__tb")))
    val wa = col("__na") / col("__ta")
    val wb = col("__nb") / col("__tb")
    val ra = when(col("__na") > 0, col("__ka") / col("__na"))
      .otherwise(lit(0.0))
    val rb = when(col("__nb") > 0, col("__kb") / col("__nb"))
      .otherwise(lit(0.0))
    cells.crossJoin(tot)
      .agg((sum(col("__ka")) / max(col("__ta"))).as("rate_a"),
        (sum(col("__kb")) / max(col("__tb"))).as("rate_b"),
        sum((wb - wa) * (ra + rb) / 2).as("composition_effect"),
        sum((rb - ra) * (wa + wb) / 2).as("rate_effect"))
      .withColumn("gap", col("rate_b") - col("rate_a"))
      .select(col("rate_a"), col("rate_b"), col("gap"),
        col("composition_effect"), col("rate_effect"))
  }

  /**
   * Oaxaca–Blinder two-fold decomposition of a mean-outcome gap
   * between groups A and B: simple-OLS fits y ~ x per group, then
   * gap = ȳ_A − ȳ_B = explained (endowments at B's coefficients,
   * (x̄_A − x̄_B)·β_B) + unexplained (coefficient differences at A's
   * endowments). The audit-ready "how much of the gap is mix vs
   * treatment" readout. Returns ONE row: (n_a, n_b, gap, explained,
   * unexplained, beta_a, beta_b, xbar_a, xbar_b).
   *
   * Scale shape: one conditional-moments corpus pass; everything
   * after is scalar algebra.
   */
  def oaxacaBlinder(df: DataFrame, inA: Column, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def side(c: Column, tag: String) = Seq(
      count(when(c, lit(1))).cast("double").as(s"__n$tag"),
      avg(when(c, x)).as(s"__xb$tag"), avg(when(c, y)).as(s"__yb$tag"),
      sum(when(c, x * x).otherwise(0.0)).as(s"__xx$tag"),
      sum(when(c, x * y).otherwise(0.0)).as(s"__xy$tag"))
    val m = df.where(x.isNotNull && y.isNotNull)
      .agg(side(inA, "a").head,
        (side(inA, "a").tail ++ side(!inA, "b")): _*)
    def beta(tag: String) =
      (col(s"__xy$tag") - col(s"__n$tag") * col(s"__xb$tag") *
        col(s"__yb$tag")) /
        (col(s"__xx$tag") - col(s"__n$tag") * col(s"__xb$tag") *
          col(s"__xb$tag"))
    m.withColumn("__ba", beta("a")).withColumn("__bb", beta("b"))
      .select(col("__na").cast("long").as("n_a"),
        col("__nb").cast("long").as("n_b"),
        (col("__yba") - col("__ybb")).as("gap"),
        ((col("__xba") - col("__xbb")) * col("__bb")).as("explained"),
        (col("__yba") - col("__ybb") -
          (col("__xba") - col("__xbb")) * col("__bb")).as("unexplained"),
        col("__ba").as("beta_a"), col("__bb").as("beta_b"),
        col("__xba").as("xbar_a"), col("__xbb").as("xbar_b"))
  }

  /**
   * 2×2 epidemiological risk panel for a binary exposure and binary
   * outcome: relative risk, odds ratio, risk difference, NNT, the
   * log-scale Wald CIs, and VanderWeele's E-value (the minimum
   * confounder strength that could explain the RR away — computed on
   * the away-from-null orientation). Zero cells surface as NULLs, not
   * infinities. Returns ONE row.
   *
   * Scale shape: one conditional-count corpus pass; everything after
   * is scalar algebra on the 1-row frame.
   */
  def riskPanel(df: DataFrame, exposed: Column,
      outcome: Column): DataFrame = {
    val cells = df.agg(
      sum(when(exposed && outcome, 1L).otherwise(0L))
        .cast("double").as("__a"),
      sum(when(exposed && !outcome, 1L).otherwise(0L))
        .cast("double").as("__b"),
      sum(when(!exposed && outcome, 1L).otherwise(0L))
        .cast("double").as("__c"),
      sum(when(!exposed && !outcome, 1L).otherwise(0L))
        .cast("double").as("__d"))
    val a = col("__a"); val b = col("__b")
    val c = col("__c"); val dd = col("__d")
    val r1 = a / (a + b)
    val r0 = c / (c + dd)
    val rr = r1 / r0
    val seLnRr = sqrt(lit(1.0) / a - lit(1.0) / (a + b) +
      lit(1.0) / c - lit(1.0) / (c + dd))
    val seLnOr = sqrt(lit(1.0) / a + lit(1.0) / b + lit(1.0) / c +
      lit(1.0) / dd)
    val ok = a > 0 && b > 0 && c > 0 && dd > 0
    val rrStar = when(rr >= 1, rr).otherwise(lit(1.0) / rr)
    cells.select(
      (a + b).cast("long").as("n_exposed"),
      (c + dd).cast("long").as("n_unexposed"),
      when(ok, r1).as("risk_exposed"), when(ok, r0).as("risk_unexposed"),
      when(ok, rr).as("rr"),
      when(ok, exp(log(rr) - lit(1.96) * seLnRr)).as("rr_lo"),
      when(ok, exp(log(rr) + lit(1.96) * seLnRr)).as("rr_hi"),
      when(ok, a * dd / (b * c)).as("odds_ratio"),
      when(ok, exp(log(a * dd / (b * c)) - lit(1.96) * seLnOr))
        .as("or_lo"),
      when(ok, exp(log(a * dd / (b * c)) + lit(1.96) * seLnOr))
        .as("or_hi"),
      when(ok, r1 - r0).as("risk_diff"),
      when(ok && abs(r1 - r0) > 0, lit(1.0) / abs(r1 - r0)).as("nnt"),
      when(ok, rrStar + sqrt(rrStar * (rrStar - 1))).as("e_value"))
  }

  /**
   * Inverse-variance meta-analysis of per-stratum mean differences
   * (exposed − unexposed): fixed-effect pool, Cochran's Q and I²
   * heterogeneity, the DerSimonian–Laird τ², the random-effects pool,
   * and Egger's small-study-bias intercept (θ/se regressed on 1/se).
   * Per-stratum effects use Welch SEs from one conditional-moments
   * pass. Returns ONE row: (k, fe_effect, fe_se, q_stat, i2, tau2,
   * re_effect, re_se, egger_intercept).
   *
   * Scale shape: one corpus groupBy(stratum) with conditional
   * moments; both reduces after it run on the ≤|strata|-row frame.
   */
  def metaAnalysis(df: DataFrame, stratumCol: String, exposed: Column,
      valueCol: String): DataFrame = {
    val y = col(valueCol).cast("double")
    val per = df.where(y.isNotNull && col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("__s"))
      .agg(count(when(exposed, lit(1))).cast("double").as("__n1"),
        avg(when(exposed, y)).as("__m1"),
        var_samp(when(exposed, y)).as("__v1"),
        count(when(!exposed, lit(1))).cast("double").as("__n0"),
        avg(when(!exposed, y)).as("__m0"),
        var_samp(when(!exposed, y)).as("__v0"))
      .where(col("__n1") > 1 && col("__n0") > 1)
      .select(col("__s"), (col("__m1") - col("__m0")).as("__th"),
        (col("__v1") / col("__n1") + col("__v0") / col("__n0"))
          .as("__se2"))
      .where(col("__se2") > 0)
      .localCheckpoint() // ≤|strata| rows; read by both pooling passes
    val fe = per.agg(count(lit(1)).cast("double").as("__k"),
      sum(lit(1.0) / col("__se2")).as("__sw"),
      sum(col("__th") / col("__se2")).as("__swt"),
      sum((lit(1.0) / col("__se2")) * (lit(1.0) / col("__se2")))
        .as("__sw2"),
      // Egger: θ/se on 1/se — carried as the 4 OLS sums
      sum(col("__th") / sqrt(col("__se2"))).as("__ey"),
      sum(lit(1.0) / sqrt(col("__se2"))).as("__ex"),
      sum(lit(1.0) / col("__se2")).as("__exx"),
      sum(col("__th") / col("__se2")).as("__exy"))
    val withFe = per.crossJoin(broadcast(fe))
      .withColumn("__fe", col("__swt") / col("__sw"))
    val q = withFe.agg(
      max(col("__k")).as("__k"), max(col("__sw")).as("__sw"),
      max(col("__sw2")).as("__sw2"), max(col("__fe")).as("__fe"),
      max(col("__ey")).as("__ey"), max(col("__ex")).as("__ex"),
      max(col("__exx")).as("__exx"), max(col("__exy")).as("__exy"),
      sum((col("__th") - col("__fe")) * (col("__th") - col("__fe")) /
        col("__se2")).as("__q"))
    val tau2 = when(col("__sw") - col("__sw2") / col("__sw") > 0,
      greatest(lit(0.0), (col("__q") - (col("__k") - 1)) /
        (col("__sw") - col("__sw2") / col("__sw"))))
      .otherwise(lit(0.0))
    // NOT checkpointed: the 1-row aggregate must stay visible to the
    // scale lint as a reducing join side (a checkpointed leaf hides it)
    val withTau = q.withColumn("__tau2", tau2)
    val re = per.crossJoin(broadcast(withTau))
      .agg(max(col("__k")).cast("long").as("k"),
        max(col("__fe")).as("fe_effect"),
        (lit(1.0) / sqrt(max(col("__sw")))).as("fe_se"),
        max(col("__q")).as("q_stat"),
        when(max(col("__q")) > 0,
          greatest(lit(0.0), (max(col("__q")) - (max(col("__k")) - 1)) /
            max(col("__q")))).otherwise(lit(0.0)).as("i2"),
        max(col("__tau2")).as("tau2"),
        (sum(col("__th") / (col("__se2") + col("__tau2"))) /
          sum(lit(1.0) / (col("__se2") + col("__tau2"))))
          .as("re_effect"),
        (lit(1.0) / sqrt(sum(lit(1.0) / (col("__se2") + col("__tau2")))))
          .as("re_se"),
        // degenerate when every stratum has the same se (zero x
        // spread) — NULL, not a crash
        when(abs(max(col("__k")) - max(col("__ex")) * max(col("__ex")) /
            max(col("__exx"))) > 1e-12,
          (max(col("__ey")) - max(col("__exy")) * max(col("__ex")) /
            max(col("__exx"))) /
            (max(col("__k")) - max(col("__ex")) * max(col("__ex")) /
              max(col("__exx")))).as("egger_intercept"))
    re
  }

  /**
   * AIPW (doubly robust) average treatment effect with stratum-based
   * nuisances: the propensity ê(s) and outcome means m̂₁(s)/m̂₀(s)
   * come from the [[propensityStratification]] equal-width strata, and
   * the estimator averages the efficient influence function ψ_i =
   * m̂₁ − m̂₀ + t(y−m̂₁)/ê − (1−t)(y−m̂₀)/(1−ê); its SE is sd(ψ)/√n —
   * consistent if EITHER nuisance is right, with a closed-form CI the
   * plain plug-ins don't have. Strata missing an arm are dropped
   * (complete-strata estimand, reported via n_used). Returns ONE row:
   * (n, n_used, ate_outcome, ate_ipw, ate_aipw, se_aipw).
   *
   * Scale shape: one corpus groupBy(stratum) for the nuisance cells
   * (broadcast back), one corpus ψ-moments pass.
   */
  def aipwEffect(df: DataFrame, treatCol: Column, scoreCol: String,
      valueCol: String, bins: Int = 5): DataFrame = {
    require(bins >= 2, "aipwEffect: need at least 2 strata")
    val p = col(scoreCol).cast("double")
    val y = col(valueCol).cast("double")
    val strat = least(floor(p * bins).cast("long"), lit(bins - 1L))
    val base = df.where(p.isNotNull && y.isNotNull)
      .select(strat.as("__st"), when(treatCol, 1L).otherwise(0L).as("__t"),
        y.as("__y"))
      .localCheckpoint() // nuisance cells AND the ψ pass read it
    val isT = col("__t") === 1L
    val cells = broadcast(base.groupBy("__st")
      .agg(count(lit(1)).cast("double").as("__ns"),
        count(when(isT, lit(1))).cast("double").as("__nt"),
        avg(when(isT, col("__y"))).as("__m1"),
        avg(when(!isT, col("__y"))).as("__m0"))
      .where(col("__nt") > 0 && col("__ns") - col("__nt") > 0)
      .withColumn("__e", col("__nt") / col("__ns")))
    val t = col("__t").cast("double")
    val psi = col("__m1") - col("__m0") +
      t * (col("__y") - col("__m1")) / col("__e") -
      (lit(1.0) - t) * (col("__y") - col("__m0")) /
        (lit(1.0) - col("__e"))
    val tot = broadcast(base.agg(count(lit(1)).as("__nall")))
    base.join(cells, Seq("__st"))
      .crossJoin(tot)
      .agg(max(col("__nall")).as("n"),
        count(lit(1)).as("n_used"),
        avg(col("__m1") - col("__m0")).as("ate_outcome"),
        (sum(t * col("__y") / col("__e")) / sum(t / col("__e")) -
          sum((lit(1.0) - t) * col("__y") / (lit(1.0) - col("__e"))) /
          sum((lit(1.0) - t) / (lit(1.0) - col("__e")))).as("ate_ipw"),
        avg(psi).as("ate_aipw"),
        (stddev_samp(psi) / sqrt(count(lit(1)).cast("double")))
          .as("se_aipw"))
  }

  /**
   * Decision-curve analysis (Vickers & Elkin 2006): at each decision
   * threshold t, treat everyone with score ≥ t and report the net
   * benefit NB(t) = TP/n − FP/n · t/(1−t) — true positives credited at
   * face value, false positives debited at the odds the threshold
   * itself implies. Also emits the treat-ALL reference line
   * prev − (1−prev)·t/(1−t); a useful model clears both it and 0 on
   * some threshold range. One row per threshold: (threshold, n_treated,
   * tp, fp, net_benefit, nb_treat_all).
   *
   * Scale shape: the FIXED threshold grid explodes each row ≤|ts|
   * times into one map-side-combined groupBy — one corpus scan, a
   * |ts|-row result, no windows.
   */
  def decisionCurve(df: DataFrame, labelCol: String, scoreCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 64 &&
      thresholds.forall(t => t > 0 && t < 1),
      "decisionCurve: 1..64 thresholds, each in (0,1)")
    val base = df.select(col(labelCol).cast("double").as("__y"),
        col(scoreCol).cast("double").as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
    val grid = array(thresholds.map(lit): _*)
    base.select(explode(grid).as("threshold"), col("__y"), col("__p"))
      .groupBy("threshold")
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__y")).as("__prev"),
        sum(when(col("__p") >= col("threshold"), lit(1L)).otherwise(0L))
          .as("n_treated"),
        sum(when(col("__p") >= col("threshold"), col("__y"))
          .otherwise(0.0)).as("__tp"),
        sum(when(col("__p") >= col("threshold"), lit(1.0) - col("__y"))
          .otherwise(0.0)).as("__fp"))
      .select(col("threshold"), col("n_treated"),
        col("__tp").cast("long").as("tp"),
        col("__fp").cast("long").as("fp"),
        (col("__tp") / col("__n") - col("__fp") / col("__n") *
          (col("threshold") / (lit(1.0) - col("threshold"))))
          .as("net_benefit"),
        (col("__prev") - (lit(1.0) - col("__prev")) *
          (col("threshold") / (lit(1.0) - col("threshold"))))
          .as("nb_treat_all"))
  }

  /**
   * Newcombe hybrid-score CI for a proportion DIFFERENCE: Wilson
   * bounds per arm, recombined as d ± √(per-arm score distances) —
   * the interval that keeps coverage near small counts and at
   * p ≈ 0/1, where the naive Wald difference CI collapses. The
   * two-arm companion to the single-proportion Wilson intervals
   * (q*_wilson_intervals).
   *
   * Scale shape: ONE conditional-count reduce, closed-form algebra.
   * Returns 1 row: (n_1, x_1, n_2, x_2, p_1, p_2, diff, ci_lo,
   * ci_hi).
   */
  def newcombeDiff(df: DataFrame, successFlag: Column,
      groupFlag: Column, z: Double = 1.959964): DataFrame = {
    val a = df.where(successFlag.isNotNull && groupFlag.isNotNull)
      .agg(
        sum(when(groupFlag, 1L).otherwise(0L)).cast("double").as("__n1"),
        sum(when(groupFlag && successFlag, 1L).otherwise(0L))
          .cast("double").as("__x1"),
        sum(when(!groupFlag, 1L).otherwise(0L)).cast("double").as("__n2"),
        sum(when(!groupFlag && successFlag, 1L).otherwise(0L))
          .cast("double").as("__x2"))
    val zz = lit(z * z)
    def wilson(x: Column, n: Column): (Column, Column, Column) = {
      val p = x / n
      val center = (p + zz / (n * 2)) / (lit(1.0) + zz / n)
      val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
        zz / (n * n * 4)) / (lit(1.0) + zz / n)
      (p, center - half, center + half)
    }
    val (p1, l1, u1) = wilson(col("__x1"), col("__n1"))
    val (p2, l2, u2) = wilson(col("__x2"), col("__n2"))
    val d = p1 - p2
    a.select(col("__n1").cast("long").as("n_1"),
      col("__x1").cast("long").as("x_1"),
      col("__n2").cast("long").as("n_2"),
      col("__x2").cast("long").as("x_2"),
      p1.as("p_1"), p2.as("p_2"), d.as("diff"),
      (d - sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2)))
        .as("ci_lo"),
      (d + sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2)))
        .as("ci_hi"))
  }

  /**
   * Switchback-experiment readout: arms alternate by DAY PARITY, the
   * effect is the odd-vs-even difference of daily means, and the
   * standard error comes in two flavors — the iid OLS one and the
   * Newey–West(L) one that survives the serial correlation a
   * time-sliced design always has. Reporting both (and their ratio)
   * is the point: a switchback whose NW SE is 3× the iid SE was
   * never powered the way its dashboard claimed.
   *
   * Scale shape: corpus → calendar frame of daily means; residual
   * products at lags 0..L via L calendar-shift equi-joins of the
   * reduced frame. Returns 1 row: (n_days, mean_even, mean_odd,
   * diff, se_iid, se_nw, nw_inflation).
   */
  def switchback(df: DataFrame, tsCol: String, valueCol: String,
      nwLags: Int = 7): DataFrame = {
    require(nwLags >= 1 && nwLags <= 60,
      s"switchback: nwLags in [1, 60], got $nwLags")
    val daily = df
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__day"))
      .agg(avg(col(valueCol).cast("double")).as("__m"))
      .select(datediff(col("__day"), lit("1970-01-01")).as("__t"),
        col("__m"))
      .withColumn("__d", pmod(col("__t"), lit(2)).cast("double"))
      .localCheckpoint()
    val st = broadcast(daily.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("__d")).as("__db"),
      avg(when(col("__d") === 0.0, col("__m"))).as("__m0"),
      avg(when(col("__d") === 1.0, col("__m"))).as("__m1"),
      sum(when(col("__d") === 0.0, 1.0).otherwise(0.0)).as("__n0"),
      sum(when(col("__d") === 1.0, 1.0).otherwise(0.0)).as("__n1")))
    val u = daily.crossJoin(st)
      .select(col("__t"), col("__n"), col("__n0"), col("__n1"),
        col("__m0"), col("__m1"),
        ((col("__d") - col("__db")) *
          (col("__m") - when(col("__d") === 1.0, col("__m1"))
            .otherwise(col("__m0")))).as("__u"),
        ((col("__d") - col("__db")) * (col("__d") - col("__db")))
          .as("__xx"),
        ((col("__m") - when(col("__d") === 1.0, col("__m1"))
          .otherwise(col("__m0"))) *
         (col("__m") - when(col("__d") === 1.0, col("__m1"))
           .otherwise(col("__m0")))).as("__ee"))
      .localCheckpoint()
    val lag = u.select(col("__t"), col("__u"),
        explode(sequence(lit(1), lit(nwLags))).as("__l"))
      .select((col("__t") + col("__l")).as("__t"), col("__l"),
        col("__u").as("__ul"))
    val cross = u.join(lag, Seq("__t"))
      .groupBy("__l")
      .agg(sum(col("__u") * col("__ul")).as("__g"))
      .agg(coalesce(sum((lit(1.0) - col("__l") / (nwLags + 1.0)) *
        lit(2.0) * col("__g")), lit(0.0)).as("__cross"))
    val base = u.agg(max(col("__n")).as("__n"),
      max(col("__n0")).as("__n0"), max(col("__n1")).as("__n1"),
      max(col("__m0")).as("__m0"), max(col("__m1")).as("__m1"),
      sum(col("__u") * col("__u")).as("__g0"),
      sum(col("__xx")).as("__sxx"), sum(col("__ee")).as("__see"))
    base.crossJoin(broadcast(cross))
      .select(col("__n").cast("long").as("n_days"),
        col("__m0").as("mean_even"), col("__m1").as("mean_odd"),
        (col("__m1") - col("__m0")).as("diff"), {
          val s2 = col("__see") / (col("__n") - 2)
          when(col("__sxx") > 0, sqrt(s2 / col("__sxx"))).as("se_iid")
        }, {
          val vnw = (col("__g0") + col("__cross")) /
            (col("__sxx") * col("__sxx"))
          when(vnw > 0, sqrt(vnw)).as("se_nw")
        },
        when(col("__see") > 0 && col("__sxx") > 0,
          sqrt(((col("__g0") + col("__cross")) /
            (col("__sxx") * col("__sxx"))) /
            ((col("__see") / (col("__n") - 2)) / col("__sxx"))))
          .as("nw_inflation"))
  }

  /**
   * Cluster-robust A/B difference-in-means: when randomization (or
   * exposure) is at the UNIT level but the metric is per-EVENT, the
   * naive per-event SE pretends n_events independent observations and
   * can overstate significance severalfold. Per arm, the CR1-style
   * variance Σ_c(Σ_i e_ci)²·G/(G−1)/n² aggregates residuals WITHIN
   * each unit first; the design effect (se_cluster/se_naive)² is the
   * "how wrong was the naive test" multiplier every experimentation
   * readout should print.
   *
   * Scale shape: one groupBy(unit) pass (map-side combined), one
   * groupBy(arm) reduce, map-only algebra on the 2-row frame; the
   * naive moments ride the same unit pass as sum/sumsq. Returns
   * 1 row: (n_0, n_1, g_0, g_1, mean_0, mean_1, diff, se_naive,
   * se_cluster, design_effect).
   */
  /**
   * Univariate feature screen against a binary label: per feature,
   * the midrank AUC (can this feature alone rank the classes), the
   * KS separation max|F̂₁ − F̂₀| (where on the CDF they split) and
   * the point-biserial correlation (signed linear strength) — the
   * first triage a feature platform runs on a candidate feature set
   * before anyone trains on it. AUC and KS come from exact integer
   * per-value counts, so they are bit-stable; ties get midranks.
   *
   * Scale shape: per feature, ONE value-level cell pass +
   * [[PrefixSum]] ranks + a 1-row reduce; the per-feature 1-row
   * frames union (features are the caller's bounded list). Returns
   * one row per feature: (feature, n, n_pos, auc, ks, point_biserial).
   */
  def univariateScreen(df: DataFrame, labelFlag: Column,
      features: Seq[String]): DataFrame = {
    require(features.nonEmpty, "univariateScreen: >= 1 feature")
    // ONE pass for every feature: the corpus explodes to
    // (feature, value, label) rows, then one grouped cell pass + one
    // grouped PrefixSum + one grouped reduce — k features cost one
    // pipeline, not k (the first cut ran k full rank pipelines and
    // was k× slower for exactly the same numbers)
    val lab = labelFlag.cast("int").cast("double")
    val base = df.where(labelFlag.isNotNull)
      .select(lab.as("__y"), explode(array(features.map(f =>
        struct(lit(f).as("__f"), col(f).cast("double").as("__v"))): _*))
        .as("__fv"))
      .select(col("__fv.__f").as("__f"), col("__fv.__v").as("__v"),
        col("__y"))
      .where(col("__v").isNotNull)
    // checkpoint the reduced frames: PrefixSum evaluates its input
    // twice (bounds + join) and `pre` feeds two consumers — without
    // materialization the corpus explode+groupBy re-runs ~5×
    val cells = base.groupBy("__f", "__v")
      .agg(sum(col("__y")).as("__cp"),
        sum(lit(1.0) - col("__y")).as("__cn"))
      .localCheckpoint()
    val pre = PrefixSum.exclusive(cells, "__v",
        Seq("__cp" -> "__exp", "__cn" -> "__exn"),
        groupCols = Seq("__f"))
      .withColumn("__r", col("__exp") + col("__exn") +
        (col("__cp") + col("__cn") + 1) / 2.0)
      .localCheckpoint()
    val tot = pre.groupBy("__f").agg(sum(col("__cp")).as("__np"),
      sum(col("__cn")).as("__nn"))
    pre.join(broadcast(tot), Seq("__f"))
      .groupBy(col("__f").as("feature"))
      .agg(max(col("__np")).as("__np"), max(col("__nn")).as("__nn"),
        sum(col("__cp") * col("__r")).as("__rs"),
        max(abs((col("__exp") + col("__cp")) / col("__np") -
          (col("__exn") + col("__cn")) / col("__nn"))).as("__ks"),
        sum((col("__cp") + col("__cn")) * col("__v")).as("__sv"),
        sum((col("__cp") + col("__cn")) * col("__v") * col("__v"))
          .as("__svv"),
        sum(col("__cp") * col("__v")).as("__svy"))
      .select(col("feature"),
        (col("__np") + col("__nn")).cast("long").as("n"),
        col("__np").cast("long").as("n_pos"),
        when(col("__np") > 0 && col("__nn") > 0,
          (col("__rs") - col("__np") * (col("__np") + 1) / 2) /
            (col("__np") * col("__nn"))).as("auc"),
        col("__ks").as("ks"), {
          val n = col("__np") + col("__nn")
          val num = n * col("__svy") - col("__sv") * col("__np")
          val den = sqrt((n * col("__svv") -
            col("__sv") * col("__sv")) *
            (n * col("__np") - col("__np") * col("__np")))
          when(den > 0, num / den).as("point_biserial")
        })
  }

  def clusterRobustAb(df: DataFrame, unitCol: String, armFlag: Column,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val per = df
      .where(col(unitCol).isNotNull && armFlag.isNotNull && v.isNotNull)
      .groupBy(col(unitCol).as("__u"),
        armFlag.cast("int").as("__a"))
      .agg(count(lit(1)).cast("double").as("__nc"),
        sum(v).as("__sc"), sum(v * v).as("__qc"))
    val arm = per.groupBy("__a")
      .agg(sum(col("__nc")).as("__n"), count(lit(1)).as("__g"),
        sum(col("__sc")).as("__s"), sum(col("__qc")).as("__q"))
    val wide = arm
      .select(col("__a"), col("__n"), col("__g"), col("__q"),
        col("__s"), (col("__s") / col("__n")).as("__m"))
    val resid = per.join(
        broadcast(wide.select(col("__a"), col("__m"))), Seq("__a"))
      .groupBy("__a")
      .agg(sum((col("__sc") - col("__nc") * col("__m")) *
        (col("__sc") - col("__nc") * col("__m"))).as("__se2"))
    val both = wide.join(resid, Seq("__a"))
    def pick(c: String, a: Int) = max(when(col("__a") === a, col(c)))
    val one = both.agg(
      pick("__n", 0).as("__n0"), pick("__n", 1).as("__n1"),
      pick("__g", 0).as("__g0"), pick("__g", 1).as("__g1"),
      pick("__m", 0).as("__m0"), pick("__m", 1).as("__m1"),
      pick("__q", 0).as("__q0"), pick("__q", 1).as("__q1"),
      pick("__s", 0).as("__s0"), pick("__s", 1).as("__s1"),
      pick("__se2", 0).as("__e0"), pick("__se2", 1).as("__e1"))
    def varNaive(q: Column, s: Column, n: Column) =
      (q - s * s / n) / (n - 1) / n
    def varCluster(e: Column, g: Column, n: Column) =
      e * g / (g - 1) / (n * n)
    one.select(col("__n0").cast("long").as("n_0"),
      col("__n1").cast("long").as("n_1"),
      col("__g0").as("g_0"), col("__g1").as("g_1"),
      col("__m0").as("mean_0"), col("__m1").as("mean_1"),
      (col("__m1") - col("__m0")).as("diff"),
      sqrt(varNaive(col("__q0"), col("__s0"), col("__n0")) +
        varNaive(col("__q1"), col("__s1"), col("__n1")))
        .as("se_naive"),
      sqrt(varCluster(col("__e0"), col("__g0"), col("__n0")) +
        varCluster(col("__e1"), col("__g1"), col("__n1")))
        .as("se_cluster"),
      ((varCluster(col("__e0"), col("__g0"), col("__n0")) +
        varCluster(col("__e1"), col("__g1"), col("__n1"))) /
        (varNaive(col("__q0"), col("__s0"), col("__n0")) +
          varNaive(col("__q1"), col("__s1"), col("__n1"))))
        .as("design_effect"))
  }
}
