package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Group-fairness panel over a scored/decisioned dataset — the audit a
 * training-data or model-governance pipeline runs before shipping a
 * classifier (reference surface: the quality/governance checks of
 * raise_/PRD.md extended to protected-group parity). For each group it
 * reports the selection rate and the confusion-derived rates, plus the
 * two classic cross-group reads: statistical parity difference (group
 * selection rate minus the overall rate) and the disparate-impact
 * ratio (group selection rate over the best group's — the EEOC
 * "four-fifths rule" denominator choice).
 *
 * Scale shape: ONE map-side-combined groupBy over the corpus, then a
 * broadcast 1-row global frame — no shuffle beyond the group agg, no
 * driver-side iteration; group cardinality bounds every later frame.
 */
object Fairness {

  /**
   * @param decision boolean column: the model/policy said yes
   * @param outcome  boolean column: the ground-truth label
   * Returns one row per group: (grp, n, sel_rate, tpr, fpr, ppv,
   * spd, di_ratio); rate columns are NULL when their denominator is
   * empty (e.g. fpr for an all-positive group).
   */
  def groupFairness(df: DataFrame, groupCol: String, decision: Column,
      outcome: Column): DataFrame = {
    val base = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        decision.cast("boolean").as("__d"),
        outcome.cast("boolean").as("__y"))
      .where(col("__d").isNotNull && col("__y").isNotNull)
    val per = base.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum(when(col("__d"), 1.0).otherwise(0.0)).as("__nd"),
      sum(when(col("__y"), 1.0).otherwise(0.0)).as("__ny"),
      sum(when(col("__d") && col("__y"), 1.0).otherwise(0.0)).as("__tp"),
      sum(when(col("__d") && !col("__y"), 1.0).otherwise(0.0)).as("__fp"))
    val glob = broadcast(per.agg(
      (sum(col("__nd")) / sum(col("n"))).as("__overall"),
      max(col("__nd") / col("n")).as("__maxsel")))
    per.crossJoin(glob)
      .select(col("grp"), col("n"),
        (col("__nd") / col("n")).as("sel_rate"),
        when(col("__ny") > 0, col("__tp") / col("__ny")).as("tpr"),
        when(col("n") - col("__ny") > 0,
          col("__fp") / (col("n") - col("__ny"))).as("fpr"),
        when(col("__nd") > 0, col("__tp") / col("__nd")).as("ppv"),
        (col("__nd") / col("n") - col("__overall")).as("spd"),
        when(col("__maxsel") > 0,
          (col("__nd") / col("n")) / col("__maxsel")).as("di_ratio"))
  }
}
