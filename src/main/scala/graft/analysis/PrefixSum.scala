package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix sums over an ordered frame WITHOUT an unbounded
 * single-partition window (`Window.orderBy` with no `partitionBy` moves
 * the whole frame to one task — the classic
 * "WindowExec: No Partition Defined" scale-killer). With `groupCols`,
 * prefix sums run per group the same way — so a HOT group's frame is
 * spread over `buckets` tasks too, instead of serializing on one.
 *
 * Algorithm (the textbook two-pass scan, expressed declaratively):
 *   1. bucket rows by a deterministic equal-width range over the order
 *      column (min/max from a 1-row — or per-group — bounds aggregate;
 *      NOT `repartitionByRange`, whose sampled boundaries differ
 *      between recomputations of the same plan);
 *   2. per-(group, bucket) subtotals (≤ buckets rows per group);
 *   3. per-bucket cumulative offsets via an exclusive window over the
 *      totals frame — partitioned by group (or a constant for the
 *      ungrouped case), ≤ `buckets` rows per partition BY CONSTRUCTION;
 *   4. bucket-LOCAL exclusive prefix windows, plus the joined offset.
 *
 * Results are identical to `sum(c) OVER (PARTITION BY group ORDER BY
 * orderCol ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)` when
 * `orderCol` values are unique per (group, row) — the value-count /
 * histogram-bucket frames this serves always are, post-`groupBy`.
 * Summation regrouping is exact for the integral count columns used.
 */
object PrefixSum {

  /**
   * Equi-join on `keys` with NULL-SAFE equality (`<=>`). A plain
   * `join(right, keys)` never matches a NULL key, silently dropping
   * NULL-keyed groups — but NULL is a legitimate group value for every
   * grouped analysis (and for the DuckDB GROUP BY oracle). Right-side
   * keys are aliased before the join and dropped after, so the output
   * schema matches the USING-join shape. `EqualNullSafe` is still a
   * hash-joinable key, so broadcast/shuffled-hash plans are unaffected.
   */
  private[graft] def joinNullSafe(left: DataFrame, right: DataFrame,
      keys: Seq[String], joinType: String = "inner",
      broadcastRight: Boolean = false): DataFrame = {
    val r0 = right.select(keys.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__jk$i") } ++
      right.columns.filterNot(keys.contains).map(col): _*)
    val r = if (broadcastRight) broadcast(r0) else r0
    val cond = keys.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__jk$i") }
      .reduce(_ && _)
    left.join(r, cond, joinType).drop(keys.indices.map(i => s"__jk$i"): _*)
  }

  /**
   * Adds one exclusive-prefix-sum column per `(inputCol, outputCol)`
   * pair, ordered by `orderCol` ascending (nulls first, matching
   * Spark's window default) within each `groupCols` group. Input
   * columns must be numeric; prefix of the first row is 0 (typed long
   * for long inputs, double for double inputs).
   */
  def exclusive(df: DataFrame, orderCol: String,
      sums: Seq[(String, String)], buckets: Int = 1024,
      groupCols: Seq[String] = Nil): DataFrame =
    exclusiveChain(df, orderCol, Seq((identity[DataFrame] _, sums)),
      buckets, groupCols)

  /**
   * CHAINED exclusive prefix sums sharing ONE bucketing shuffle (r14).
   * Each stage is `(transform, sums)`: the transform maps the current
   * frame — with every earlier stage's prefix columns available — and
   * then its `sums` are prefix-summed in the shared `orderCol` order.
   * This is the cascade the survival/rank family needs (a prefix sum,
   * a row-local function of it, a prefix sum of THAT, …): run as
   * separate [[exclusive]] calls each link re-buckets, re-bounds, and
   * re-shuffles the frame; chained, the bucket assignment from the
   * FIRST frame serves every stage (bucketing only needs
   * value-contiguous ranges of `orderCol`, and a stage's frame is a
   * row-subset of the first, so the inherited ranges stay contiguous),
   * and every per-stage aggregate/join/window clusters on the same
   * (groupCols, bucket) key the initial repartition established — the
   * whole chain pays ONE full-frame exchange plus a report-sized
   * offsets exchange per stage.
   *
   * Transform contract: ROW-LOCAL only (filter / withColumn /
   * broadcast-1-row crossJoin) — anything that repartitions or renames
   * `orderCol`/`groupCols` breaks the shared clustering. `orderCol`
   * values must not change across stages.
   */
  def exclusiveChain(df: DataFrame, orderCol: String,
      stages: Seq[(DataFrame => DataFrame, Seq[(String, String)])],
      buckets: Int = 1024, groupCols: Seq[String] = Nil): DataFrame = {
    // bucketing works on the double image of orderCol, so the column's
    // native ordering must agree with its double cast — true for
    // numerics, timestamps, and dates (monotone epoch casts), NOT for
    // strings, whose lexicographic order would disagree with bucket
    // boundaries
    require({
      import org.apache.spark.sql.types._
      df.schema(orderCol).dataType match {
        case _: NumericType | TimestampType | DateType => true
        case _ => false
      }
    }, s"PrefixSum order column '$orderCol' must order numerically")
    // the double image used for bucketing: DATE has no direct double
    // cast in Spark 4 — route it through the (monotone) epoch-day int
    val v = {
      import org.apache.spark.sql.types.DateType
      df.schema(orderCol).dataType match {
        case DateType => unix_date(col(orderCol)).cast("double")
        case _ => col(orderCol).cast("double")
      }
    }
    val bucketCol =
      when(v.isNull, lit(-1L))
        .when(col("__phi") <= col("__plo"), lit(0L))
        .otherwise(least(
          greatest(
            floor((v - col("__plo")) / (col("__phi") - col("__plo")) * buckets),
            lit(0L)),
          lit(buckets - 1L)))
    val gb = groupCols :+ "__psb__"
    // MULTI-STAGE chains hash-repartition on gb once, so every stage's
    // totals aggregate, offsets join-back, and local prefix window
    // cluster on the one AQE-materialized exchange — that alignment is
    // what makes k dependent passes cost ONE full-frame shuffle.
    // SINGLE-stage calls deliberately skip it: an A/B (q119/q129/q626,
    // control-matched) showed the explicit full-width repartition runs
    // 10-30% SLOWER locally than the old shape (pruned window exchange
    // + map-side-combined totals shuffle + AQE exchange reuse on the
    // bucketing subtree), with no offsetting pass saved when there is
    // only one stage. No numPartitions is pinned — AQE coalesces.
    val aligned = stages.length > 1
    val bucketed0 =
      (if (groupCols.isEmpty)
         df.join(broadcast(df.agg(min(v).as("__plo"), max(v).as("__phi"))))
       else
         joinNullSafe(df, df.groupBy(groupCols.map(col): _*)
           .agg(min(v).as("__plo"), max(v).as("__phi")), groupCols))
        .withColumn("__psb__", bucketCol)
        .drop("__plo", "__phi")
    var cur =
      if (aligned) bucketed0.repartition(gb.map(col): _*) else bucketed0
    stages.foreach { case (transform, sums) =>
      cur = transform(cur)
      val kept = cur.columns.toSeq
      val tAggs = sums.map { case (c, _) => sum(col(c)).as(s"__t_$c") }
      val totals = cur.groupBy(gb.map(col): _*).agg(tAggs.head, tAggs.tail: _*)
      // cumulative offset per bucket: exclusive prefix over the totals
      // frame — ≤ `buckets` rows per group by construction. Grouped: a
      // window partitioned by the group keys. Ungrouped: a window
      // partitioned by a constant would be FOLDED to a no-partition spec
      // by Spark 4's EliminateWindowPartitions (→ the single-partition
      // WindowExec warning), so the exclusive prefix is computed instead
      // as a broadcast triangular self-join over the ≤ `buckets`-row
      // frame — O(buckets²) pairs, trivially distributed, no window.
      val offsets =
        if (groupCols.isEmpty) {
          val t2 = totals.select(col("__psb__").as("__psb2__") +:
            sums.map { case (c, _) => col(s"__t_$c").as(s"__t2_$c") }: _*)
          val offAggs = sums.map { case (c, _) =>
            coalesce(sum(col(s"__t2_$c")), lit(0L)).as(s"__off_$c") }
          totals.join(broadcast(t2), col("__psb2__") < col("__psb__"), "left")
            .groupBy(col("__psb__"))
            .agg(offAggs.head, offAggs.tail: _*)
        } else {
          val wOff = Window.partitionBy(groupCols.map(col): _*)
            .orderBy(col("__psb__"))
            .rowsBetween(Window.unboundedPreceding, -1)
          totals.select(
            gb.map(col) ++ sums.map { case (c, _) =>
              coalesce(sum(col(s"__t_$c")).over(wOff), lit(0L)).as(s"__off_$c")
            }: _*)
        }
      val wLoc = Window.partitionBy(gb.map(col): _*).orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cumCols: Seq[Column] = sums.map { case (c, out) =>
        (coalesce(sum(col(c)).over(wLoc), lit(0L)) + col(s"__off_$c")).as(out) }
      cur = joinNullSafe(cur, offsets, gb, broadcastRight = groupCols.isEmpty)
        .select(kept.map(col) ++ cumCols: _*)
    }
    cur.drop("__psb__")
  }
}
