package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Row-level table diff between two versions of a keyed table — the
 * row-granular sibling of the stats-level VersionDiff analysis
 * (reference: version compare surface, `raise_/analytics/analysis.py`
 * VersionDiff; the reference reports aggregate drift only — this gives
 * the per-row audit a migration/backfill review needs).
 *
 * One null-safe full-outer join on the keys; change detection is
 * COLUMN-WISE null-safe equality (`<=>`), not a row-hash — exact by
 * construction (no separator/collision caveats) and it yields the
 * `changed_cols` list for free. Both sides shuffle once on the key
 * (sort-merge at scale); no driver state.
 *
 * Output: key columns, `diff_status` ∈ added|removed|changed|unchanged
 * (added = key only in `newDf`), and `changed_cols` (names of value
 * columns whose values differ; empty for unchanged, NULL for
 * added/removed where "changed" has no meaning).
 */
object Diff {

  def rowDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val o = oldDf.select(
      keys.map(c => col(c).as(s"__ok_$c")) ++
        valueCols.map(c => col(c).as(s"__ov_$c")) :+
        lit(1).as("__o_present"): _*)
    val n = newDf.select(
      keys.map(c => col(c).as(s"__nk_$c")) ++
        valueCols.map(c => col(c).as(s"__nv_$c")) :+
        lit(1).as("__n_present"): _*)
    val cond = keys.map(c => col(s"__ok_$c") <=> col(s"__nk_$c"))
      .reduce(_ && _)
    val sameRow = valueCols
      .map(c => col(s"__ov_$c") <=> col(s"__nv_$c"))
      .foldLeft(lit(true))(_ && _)
    val changed: Column = filter(
      array(valueCols.map(c =>
        when(!(col(s"__ov_$c") <=> col(s"__nv_$c")), lit(c))): _*),
      x => x.isNotNull)
    o.join(n, cond, "full_outer")
      .select(
        keys.map(c => coalesce(col(s"__nk_$c"), col(s"__ok_$c")).as(c)) ++
          Seq(
            when(col("__o_present").isNull, "added")
              .when(col("__n_present").isNull, "removed")
              .when(sameRow, "unchanged")
              .otherwise("changed").as("diff_status"),
            when(col("__o_present").isNotNull && col("__n_present").isNotNull,
              changed).as("changed_cols")): _*)
  }
}
