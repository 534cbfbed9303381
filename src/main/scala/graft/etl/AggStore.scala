package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental materialized aggregate: per-key MERGEABLE sufficient
 * statistics (count / sum / sum-of-squares / min / max) persisted as a
 * parquet store, so each new batch costs one aggregation over the
 * BATCH plus a keyed merge with the (per-key-sized) store — the corpus
 * is never rescanned. This is the view-maintenance primitive behind
 * "daily metrics over an append-only 100 TB event log": ingest folds
 * O(batch) rows into O(keys) state, and any point-in-time metric frame
 * (mean/std/min/max) finalizes from the state alone.
 *
 * All five statistics are associative-commutative merges, so
 * `ingest(b1); ingest(b2)` ≡ one aggregation over `b1 ∪ b2` (exactly
 * for count/min/max; to float addition reordering for sum/sumsq —
 * the same reordering any distributed aggregation already performs).
 * Persistence delegates to [[ParquetTarget]] (staged-swap commit +
 * writer lock), so a crash mid-ingest leaves the previous store state
 * intact. Variance finalizes as (sumsq − n·mean²)/(n−1) — the one-pass
 * form, documented here as adequate for metric magnitudes where
 * cancellation stays far below reporting precision.
 *
 * Reference analog: incremental transform modes
 * (raise_/transforms/job.py:41-71) maintain TABLES incrementally; this
 * store maintains AGGREGATES incrementally — the missing half of
 * rescan-free reporting.
 */
object AggStore {

  /** Per-key mergeable partials of `valueCol` (null values ignored,
    * like any SQL aggregate). */
  def partials(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("sum"),
        sum(v * v).as("sumsq"), min(v).as("vmin"), max(v).as("vmax"))
  }

  /** Merge two partial frames (same schema) by key — a union and one
    * re-aggregation; every statistic re-combines losslessly. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum")).as("sum"),
        sum(col("sumsq")).as("sumsq"), min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))

  /** Fold one raw batch into the store at `path` (created on first
    * ingest). Cost: one aggregation of the batch + a keyed merge with
    * the store; commit is staged-swap atomic. */
  def ingest(spark: SparkSession, path: String, batch: DataFrame,
      keyCols: Seq[String], valueCol: String): Unit = {
    val p = partials(batch, keyCols, valueCol)
    val merged =
      if (new java.io.File(path).exists())
        merge(spark.read.parquet(path), p, keyCols)
      else p
    ParquetTarget(path).write(merged, WriteMode.Full)
    ()
  }

  /** The persisted partial frame. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ------------------------- retraction-safe (linear) maintenance ----
  //
  // count/sum/sumsq are LINEAR in the rows, so they maintain exactly
  // under both additions and retractions (an upsert's replaced rows
  // fold out with sign −1) — min/max do not (a retracted extremum
  // can't be un-taken without a rescan), so the signed path carries
  // the linear statistics only and finalizes (n, sum, mean, std).
  // This is the state algebra behind [[graft.live.LiveAggTable]]'s
  // commit-feed refresh: cost ∝ delta rows, result ≡ full recompute.

  /** Signed per-key linear partials: `sign` = −1 folds retractions. */
  def linearPartials(df: DataFrame, keyCols: Seq[String],
      valueCol: String, sign: Int = 1): DataFrame = {
    val v = col(valueCol).cast("double")
    df.groupBy(keyCols.map(col): _*)
      .agg((count(v) * sign).as("n"), (sum(v) * sign).as("sum"),
        (sum(v * v) * sign).as("sumsq"))
  }

  /** Merge signed linear partial frames by key; keys whose count
    * reaches 0 drop out (all their rows were retracted). */
  def mergeLinear(frames: Seq[DataFrame],
      keyCols: Seq[String]): DataFrame = {
    require(frames.nonEmpty, "mergeLinear: no frames")
    frames.reduceLeft(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum")).as("sum"),
        sum(col("sumsq")).as("sumsq"))
      .where(col("n") > 0)
  }

  /** Finalize the linear state: (keys…, n, sum, mean, std). */
  def finalizeLinear(store: DataFrame, keyCols: Seq[String]): DataFrame =
    store.select(
      keyCols.map(col) ++ Seq(
        col("n"),
        col("sum"),
        (col("sum") / col("n")).as("mean"),
        when(col("n") > 1,
          sqrt((col("sumsq") - col("sum") * col("sum") / col("n")) /
            (col("n") - 1))).as("std")): _*)

  /** Finalize metrics from partials alone — no raw-data access. */
  def finalizeStats(store: DataFrame, keyCols: Seq[String]): DataFrame =
    store.select(
      keyCols.map(col) ++ Seq(
        col("n"),
        col("sum"),
        (col("sum") / col("n")).as("mean"),
        sqrt((col("sumsq") - col("sum") * col("sum") / col("n")) /
          (col("n") - 1)).as("std"),
        col("vmin"),
        col("vmax")): _*)
}
