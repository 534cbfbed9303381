package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix sums over a globally-ordered frame WITHOUT a
 * single-partition window (`Window.orderBy` with no `partitionBy` moves
 * the whole frame to one task — the classic
 * "WindowExec: No Partition Defined" scale-killer).
 *
 * Algorithm (the textbook two-pass scan, expressed declaratively):
 *   1. bucket rows by a deterministic equal-width range over the order
 *      column (min/max from a broadcast 1-row aggregate — NOT
 *      `repartitionByRange`, whose sampled boundaries differ between
 *      recomputations of the same plan);
 *   2. per-bucket subtotals (small frame, ≤ `buckets` rows);
 *   3. per-bucket cumulative offsets via a non-equi broadcast self-join
 *      (≤ buckets² pairs — trivial, and warning-free);
 *   4. bucket-LOCAL exclusive prefix windows (`partitionBy(bucket)`), plus
 *      the broadcast offset.
 *
 * Results are identical to `sum(c) OVER (ORDER BY orderCol ROWS BETWEEN
 * UNBOUNDED PRECEDING AND 1 PRECEDING)` when `orderCol` values are unique
 * per row (the value-count / histogram-bucket frames this serves always
 * are — they're post-`groupBy(value)`). Summation regrouping is exact for
 * the integral count columns this is used on.
 *
 * Scale: each bucket's window partition holds ~1/buckets of the frame and
 * sorts locally (spillable); nothing is ever moved to one partition. For
 * extreme value skew raise `buckets` (offset join grows as buckets²).
 */
object PrefixSum {

  /**
   * Adds one exclusive-prefix-sum column per `(inputCol, outputCol)` pair,
   * ordered by `orderCol` ascending (nulls first, matching Spark's window
   * default). Input columns must be numeric; prefix of the first row is 0
   * (typed long for long inputs, double for double inputs).
   */
  def exclusive(df: DataFrame, orderCol: String,
      sums: Seq[(String, String)], buckets: Int = 1024): DataFrame = {
    val v = col(orderCol).cast("double")
    val bounds = df.agg(min(v).as("__plo"), max(v).as("__phi"))
    val bucketed = df
      .join(broadcast(bounds))
      .withColumn("__pb",
        when(v.isNull, lit(-1L))
          .when(col("__phi") <= col("__plo"), lit(0L))
          .otherwise(least(
            greatest(
              floor((v - col("__plo")) / (col("__phi") - col("__plo")) * buckets),
              lit(0L)),
            lit(buckets - 1L))))
      .drop("__plo", "__phi")
    val tAggs = sums.map { case (c, _) => sum(col(c)).as(s"__t_$c") }
    val totals = bucketed.groupBy(col("__pb")).agg(tAggs.head, tAggs.tail: _*)
    // cumulative offset per bucket: exclusive window over the totals
    // frame — ≤ `buckets` rows BY CONSTRUCTION (post-aggregation), so a
    // constant partition is bounded at any data scale; the constant key
    // keeps the partition spec non-empty (this is not the unbounded
    // global-window pattern)
    val wOff = Window.partitionBy(lit(0)).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col("__pb") +: sums.map { case (c, _) =>
        coalesce(sum(col(s"__t_$c")).over(wOff), lit(0L)).as(s"__off_$c")
      }: _*)
    val wLoc = Window.partitionBy("__pb").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumCols: Seq[Column] = sums.map { case (c, out) =>
      (coalesce(sum(col(c)).over(wLoc), lit(0L)) + col(s"__off_$c")).as(out) }
    bucketed
      .join(broadcast(offsets), Seq("__pb"))
      .select(df.columns.map(col).toSeq ++ cumCols: _*)
  }
}
