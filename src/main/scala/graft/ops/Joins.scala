package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join-shape utilities for 100 TB facts. Spark's own
 * `InjectRuntimeFilter` applies the bloom-prefilter trick only under
 * narrow conditions (selective filter on the build side, one join
 * level, size thresholds); these operators make the shape explicit and
 * composable where the optimizer won't infer it.
 */
object Joins {

  /**
   * Bloom-prefiltered semi/anti join: when `right` is far smaller than
   * `left` but still too big to broadcast, a plain
   * `left.join(right, keys, "left_semi")` shuffles ALL of `left`. Here
   * a bloom over the right keys (built distributed, probed as a
   * map-only codegen'd filter — the [[Dedup.bloomDecontaminate]]
   * machinery) drops non-matching left rows BEFORE the exchange, so
   * only candidate rows (matches + ~fpp of left) shuffle into the
   * exact join that removes the false positives. Result is EXACTLY
   * `left semi-join right` — the bloom only prunes.
   *
   * For anti joins the bloom can only prune the JOIN's probe work, not
   * the output (a bloom "no" is definite, a "yes" needs the exact
   * check): rows the bloom rejects are emitted directly, the rest go
   * through the exact anti join — same exactness argument.
   */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      expectedItems: Long = 4000000L, fpp: Double = 0.01): DataFrame = {
    val (candidates, _, rightKeys) =
      bloomSplit(left, right, keys, expectedItems, fpp)
    candidates.join(rightKeys, keys, "left_semi")
  }

  /** Exact `left anti-join right` with bloom-definite rejects bypassing
    * the shuffle entirely. Cost note: the split reads `left` twice
    * (accept + reject filters over the same scan — both map-only,
    * columnar, and usually pruned to the key columns) in exchange for
    * shuffling only the candidate slice; if `left` is expensive to
    * produce (not a plain scan), persist it first. */
  def bloomAntiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      expectedItems: Long = 4000000L, fpp: Double = 0.01): DataFrame = {
    val (candidates, rejected, rightKeys) =
      bloomSplit(left, right, keys, expectedItems, fpp)
    rejected.unionByName(candidates.join(rightKeys, keys, "left_anti"))
  }

  /** (bloom-accepted left rows, bloom-rejected left rows, right keys).
    * An empty right side yields a NULL bloom → `might_contain` is NULL
    * → every row lands in `rejected` (correct for both semi and anti). */
  private def bloomSplit(left: DataFrame, right: DataFrame,
      keys: Seq[String], expectedItems: Long, fpp: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.GraftShims
    require(keys.nonEmpty, "need at least one join key")
    val keyHash: Column = xxhash64(keys.map(col): _*)
    val rightKeys = right.select(keys.map(col): _*).distinct()
    val (items, bits) = Dedup.bloomSizing(left, expectedItems, fpp)
    val bloom = rightKeys
      .agg(Dedup.bloomAggOver(xxhash64(keys.map(col): _*), items, bits)
        .as("bf"))
    val probe = Dedup.bloomProbeOver(
      GraftShims.toExpression(bloom.scalar()), keyHash)
    (left.where(probe), left.where(!coalesce(probe, lit(false))), rightKeys)
  }
}
