package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling for training-data pipelines. Both
 * samplers are map-only hash-threshold predicates (no global sort, no
 * TakeOrdered over the corpus) and replay identically in any engine
 * with md5 — see [[graft.analysis.AnalysisPlanner.hashSample]] for the
 * single-frame variant and the portability contract.
 */
object Sampling {

  private val M = 1048576L // 2^20 hash buckets

  private def hashOf(hashCols: Seq[String]) =
    pmod(
      conv(substring(md5(concat_ws("|",
        hashCols.map(c => col(c).cast("string")): _*)), 1, 15), 16, 10)
        .cast("long"),
      lit(M))

  /**
   * Stratified sampler: targets ~`n` rows PER STRATUM (class-balanced
   * subsets — the "equal examples per label/language/source" step).
   * Strata counts come from one aggregation joined back on the strata
   * keys; a stratum with fewer than n rows is kept whole. Deterministic:
   * the kept subset depends only on `hashCols` values.
   */
  def stratifiedHashSample(df: DataFrame, n: Long, strata: Seq[String],
      hashCols: Seq[String]): DataFrame = {
    val tot = df.groupBy(strata.map(col): _*).agg(count(lit(1)).as("__tot"))
    df.join(tot, strata)
      .where(hashOf(hashCols) * col("__tot") < lit(n) * lit(M))
      .drop("__tot")
  }
}
