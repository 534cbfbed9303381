package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Categorical (multinomial) naive Bayes — the counts-only classifier:
 * training is pure grouped counting (one pass per nothing — a single
 * melted aggregation), scoring is log-space addition against small
 * broadcast probability tables. The natural companion to the
 * embedding-side nearest-centroid classifier ([[Similarity.nearestCentroid]])
 * for tabular/categorical features at corpus scale.
 *
 * Model: P(label) from label counts; P(value | feature, label) with
 * Laplace smoothing α: (c(f,v,l) + α) / (c(f,l) + α·V_f), V_f = the
 * number of DISTINCT training values of feature f. An unseen test
 * value contributes the smoothed-zero term α/(c(f,l) + α·V_f).
 *
 * Scale shape: the model is three aggregate frames (labels; per-
 * feature value counts via ONE melted groupBy; per-feature distinct
 * counts) — all tiny relative to the corpus, all broadcast at
 * scoring. Scoring inflates each test row by |labels| (a broadcast
 * join), adds F log-terms via F broadcast left joins on
 * (feature-value, label), and takes the argmax with one min_by
 * aggregation — no corpus-sized shuffle beyond the final groupBy on
 * the test row key.
 */
object NaiveBayes {

  /** Fitted model as three small DataFrames. */
  final case class Model(labels: DataFrame, valueCounts: DataFrame,
      featureCard: DataFrame, alpha: Double)

  def fit(train: DataFrame, features: Seq[String], labelCol: String,
      alpha: Double = 1.0): Model = {
    require(features.nonEmpty, "naiveBayes: no features")
    require(alpha > 0, "naiveBayes: alpha > 0")
    val lbl = col(labelCol).cast("string")
    val labels = train.groupBy(lbl.as("label"))
      .agg(count(lit(1)).as("n_l"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n_all"))))
      .select(col("label"), col("n_l"), col("n_all"))
      .localCheckpoint()
    val melted = train.select(lbl.as("label"), explode(array(features.map {
      f => struct(lit(f).as("feature"), col(f).cast("string").as("value"))
    }: _*)).as("fv"))
      .select(col("label"), col("fv.feature").as("feature"),
        col("fv.value").as("value"))
    val valueCounts = melted.groupBy("feature", "value", "label")
      .agg(count(lit(1)).as("c_fvl")).localCheckpoint()
    val featureCard = valueCounts.groupBy("feature")
      .agg(countDistinct(col("value")).as("v_f")).localCheckpoint()
    Model(labels, valueCounts, featureCard, alpha)
  }

  /**
   * Adds (pred_label, log_score) for each test row, identified by
   * `keyCols`. Scores are summed in a FIXED order (prior, then the
   * features in call order), so an external engine replaying the same
   * additions computes bit-identical scores; argmax ties break on
   * label ascending.
   */
  def score(test: DataFrame, model: Model, features: Seq[String],
      keyCols: Seq[String], scoreRound: Option[Int] = None): DataFrame = {
    perLabelScored(test, model, features, scoreRound)
      .groupBy(keyCols.map(col): _*)
      .agg(min_by(col("label"),
        struct((-col("__score")).as("ns"), col("label").as("lb")))
        .as("pred_label"),
        max(col("__score")).as("log_score"))
  }

  /**
   * Binary-model readout: per test key, the log-odds
   * score(posLabel) − score(other) — the ranking score AUC/threshold
   * sweeps need, which the argmax of [[score]] throws away. The model
   * must have exactly two labels (checked against the tiny labels
   * frame). Same fixed-order additions and scoreRound contract as
   * [[score]], so the value replays bit-stable in an external engine.
   */
  def binaryLogOdds(test: DataFrame, model: Model, features: Seq[String],
      keyCols: Seq[String], posLabel: String,
      scoreRound: Option[Int] = None): DataFrame = {
    val nLabels = model.labels.count()
    require(nLabels == 2, s"binaryLogOdds: binary model required " +
      s"(got $nLabels labels)")
    perLabelScored(test, model, features, scoreRound)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(when(col("label") === posLabel, col("__score"))
        .otherwise(-col("__score"))).as("log_odds"))
  }

  /** Shared scoring core: the |labels|-inflated test frame with one
    * `__score` per (test key, label) — consumed by the [[score]]
    * argmax and the [[binaryLogOdds]] difference. */
  private def perLabelScored(test: DataFrame, model: Model,
      features: Seq[String], scoreRound: Option[Int]): DataFrame = {
    val a = model.alpha
    // per-(label, feature) denominators: c(f,l) = Σ_v c(f,v,l)
    val denom = model.valueCounts.groupBy("feature", "label")
      .agg(sum(col("c_fvl")).as("c_fl"))
      .join(model.featureCard, Seq("feature"))
    // every broadcast side ends in a (no-op) re-aggregation: the model
    // frames are localCheckpointed, which erases their aggregate shape
    // from the plan — the scale lint needs the reduction visible
    val lbls = broadcast(model.labels.groupBy("label")
      .agg(max(col("n_l")).as("n_l"), max(col("n_all")).as("n_all")))
    val inflated = test.join(lbls)
    val scored = features.zipWithIndex.foldLeft(inflated) {
      case (acc, (f, i)) =>
        val vc = broadcast(model.valueCounts
          .where(col("feature") === f)
          .groupBy(col("value").as(s"__v$i"), col("label").as(s"__l$i"))
          .agg(max(col("c_fvl")).as(s"__c$i")))
        val dn = broadcast(denom.where(col("feature") === f)
          .select(col("label").as(s"__dl$i"), col("c_fl").as(s"__cf$i"),
            col("v_f").as(s"__vf$i")))
        acc
          .join(vc, col(f).cast("string") <=> col(s"__v$i") &&
            col("label") === col(s"__l$i"), "left")
          .join(dn, col("label") === col(s"__dl$i"))
          .withColumn(s"__t$i",
            log((coalesce(col(s"__c$i"), lit(0L)) + lit(a)) /
              (col(s"__cf$i") + lit(a) * col(s"__vf$i"))))
          .drop(s"__v$i", s"__l$i", s"__c$i", s"__dl$i", s"__cf$i",
            s"__vf$i")
    }
    val total0 = features.indices
      .map(i => col(s"__t$i"))
      .foldLeft(log(col("n_l") / col("n_all")))(_ + _)
    // scoreRound (the nearestCentroid cosRound pattern): JVM Math.log
    // and a C libm may disagree by an ulp — rounding the score before
    // the argmax keeps a genuine tie a tie in both engines
    val total = scoreRound.fold(total0)(r => round(total0, r))
    scored.withColumn("__score", total)
  }

  /**
   * Map-only scoring for a BOUNDED label set (≤ `maxLabels`, checked):
   * instead of inflating the test corpus by |labels| and shuffling it
   * through a per-key argmax, the per-label scores become COLUMNS —
   * one broadcast left join per feature against a value-keyed lookup
   * whose per-label counts are pivoted wide, with the per-(feature,
   * label) denominators and priors inlined as literals (they are F×L
   * scalars). The argmax is then `least` over (−score, label) structs,
   * so the whole scoring pass is narrow: zero corpus shuffles.
   *
   * Additions happen in the SAME fixed order as [[score]] (prior, then
   * features in call order) with identical arithmetic, so the two
   * paths — and an external engine replaying the sums — agree
   * bit-for-bit; ties still break on label ascending.
   *
   * Returns `test` plus (pred_label, log_score) — one output row per
   * input row (no keying needed).
   */
  def scorePivoted(test: DataFrame, model: Model, features: Seq[String],
      scoreRound: Option[Int] = None, maxLabels: Int = 64): DataFrame = {
    val a = model.alpha
    val lblRows = model.labels.limit(maxLabels + 1).collect()
    require(lblRows.length <= maxLabels,
      s"scorePivoted: more than $maxLabels labels; use score()")
    // (label, n_l, n_all) sorted for a deterministic column layout
    val labelSeq = lblRows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // per-(feature, label) denominators: F×L scalar cells, bounded
    val denomCap = features.size * maxLabels + 1
    val denomRows = model.valueCounts.groupBy("feature", "label")
      .agg(sum(col("c_fvl")).as("c_fl"))
      .join(model.featureCard, Seq("feature"))
      .limit(denomCap).collect()
    require(denomRows.length < denomCap,
      s"scorePivoted: denominator frame exceeds $denomCap cells")
    val denom = denomRows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    val joined = features.zipWithIndex.foldLeft(test) {
      case (acc, (f, i)) =>
        val cCols = labelSeq.zipWithIndex.map { case ((l, _, _), j) =>
          max(when(col("label") === l, col("c_fvl"))).as(s"__c${i}_$j")
        }
        val vc = broadcast(model.valueCounts
          .where(col("feature") === f)
          .groupBy(col("value").as(s"__v$i"))
          .agg(cCols.head, cCols.tail: _*))
        acc.join(vc, col(f).cast("string") <=> col(s"__v$i"), "left")
          .drop(s"__v$i")
    }
    val scoreCols = labelSeq.zipWithIndex.map { case ((l, nL, nAll), j) =>
      val terms = features.zipWithIndex.map { case (f, i) =>
        val (cFl, vF) = denom.getOrElse((f, l), sys.error(
          s"scorePivoted: no denominator for feature=$f label=$l"))
        log((coalesce(col(s"__c${i}_$j"), lit(0L)) + lit(a)) /
          (lit(cFl) + lit(a) * lit(vF)))
      }
      val total0 = terms.foldLeft(log(lit(nL) / lit(nAll)))(_ + _)
      scoreRound.fold(total0)(r => round(total0, r)).as(s"__s$j")
    }
    val scored = joined.select(col("*") +: scoreCols: _*)
    val packed = labelSeq.zipWithIndex.map { case ((l, _, _), j) =>
      struct((-col(s"__s$j")).as("ns"), lit(l).as("lb"))
    }
    val best =
      if (packed.size == 1) packed.head else least(packed: _*)
    scored
      .withColumn("pred_label", best.getField("lb"))
      .withColumn("log_score",
        if (scoreCols.size == 1) col("__s0")
        else greatest(labelSeq.indices.map(j => col(s"__s$j")): _*))
      .drop((features.indices.flatMap(i =>
        labelSeq.indices.map(j => s"__c${i}_$j")) ++
        labelSeq.indices.map(j => s"__s$j")): _*)
  }

  /** Convenience: fit on `train`, score `test`, return the confusion
    * frame (true_label, pred_label, n) — the standard eval readout.
    * Rides the map-only [[scorePivoted]] path (labels are bounded by
    * construction in a confusion readout), so the only shuffle beyond
    * the fit aggregations is the tiny L×L confusion groupBy. */
  def confusion(train: DataFrame, test: DataFrame, features: Seq[String],
      labelCol: String, keyCols: Seq[String], alpha: Double = 1.0,
      scoreRound: Option[Int] = None): DataFrame = {
    val m = fit(train, features, labelCol, alpha)
    scorePivoted(test.withColumn("__true", col(labelCol).cast("string")),
        m, features, scoreRound)
      .groupBy(col("__true").as("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
  }
}
