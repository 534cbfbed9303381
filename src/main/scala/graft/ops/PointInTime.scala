package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time-correct (as-of) join — THE feature-store training-set
 * operator: for every left row (entity, t) attach the latest right-side
 * feature row with the same entity key and timestamp ≤ t (optionally
 * within a lookback tolerance), with no future leakage.
 *
 * Reference scope: the reference's PIT semantics live in its feature
 * serving/materialization design (raise_/PRD.md §4.5 point lookups and
 * training-data export); it ships no user-facing as-of join, so this is
 * a beyond-reference operator per BASELINE.json's north star.
 *
 * Scale design — the union-marker algorithm, NOT a range join:
 * left and right are unioned with a side marker, shuffled ONCE by
 * entity key, and sorted within each entity partition by (time, side)
 * with right-before-left at equal timestamps (inclusive at-or-before).
 * A `last(..., ignoreNulls)` running window then carries each right
 * row's values forward to the left rows that follow it. One shuffle per
 * input, zero row expansion — a range join instead explodes candidate
 * pairs per entity and re-filters, which collapses at 100 TB on hot
 * entities. Window partitioning is by entity key, so parallelism scales
 * with distinct entities (salt extremely hot entities upstream if one
 * entity dominates a partition).
 *
 * Right side must be unique per (keys, rightTs) — pre-aggregate
 * upstream (e.g. latest per key+ts) — so the carried value is
 * deterministic.
 */
object PointInTime {

  /**
   * @param left      probe side; all its columns are preserved
   * @param right     build side (features); must be unique on keys+rightTs
   * @param keys      equality join keys (entity id columns, same names
   *                  on both sides)
   * @param leftTs    event-time column on `left`
   * @param rightTs   feature-time column on `right`
   * @param valueCols right columns to attach (emitted under the same
   *                  names, NULL when no feature row is at-or-before)
   * @param tolerance max lookback (left.ts - right.ts); matches older
   *                  than this are nulled out (None = unbounded)
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)
    val nonKeyLeft = leftCols.filterNot(keys.contains)
    require(valueCols.intersect(leftCols).isEmpty,
      "valueCols must not collide with left column names")

    // identical layout on both sides (unionByName aligns by name):
    // every left col (nulls on build rows), __t/__side/__rt, value cols
    // (nulls on probe rows)
    val rtType = right.schema(rightTs).dataType
    val probe = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side"),
          lit(null).cast(rtType).as("__rt")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val build = right.select(
      (keyCols ++
        nonKeyLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        Seq(col(rightTs).as("__t"), lit(0).as("__side"),
          col(rightTs).as("__rt")) ++
        valueCols.map(col): _*)

    // right rows sort before left rows at equal time → inclusive ≤
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = probe.unionByName(build)
      .withColumn("__mt", last(col("__rt"), ignoreNulls = true).over(w))
    val filled = valueCols.foldLeft(carried)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val within = tolerance match {
      case Some(tol) => col("__mt").isNotNull && (col("__t") - col("__mt")) <= tol
      case None      => col("__mt").isNotNull
    }
    val out = filled
      .where(col("__side") === 1)
      .withColumn("__ok", within)
    val masked = valueCols.foldLeft(out)((d, c) =>
      d.withColumn(c, when(col("__ok"), col(c))))
    masked
      .withColumn("feature_ts", when(col("__ok"), col("__mt")))
      .select(leftCols.map(col) ++ Seq(col("feature_ts")) ++
        valueCols.map(col): _*)
  }
}
