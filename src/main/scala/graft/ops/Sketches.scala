package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality sketches — the 100 TB form of "distinct count"
 * profiling. Exact `count_distinct` is a full shuffle of every distinct
 * value per profiled column; a DataSketches HLL sketch is a few KB of
 * mergeable state with map-side partial aggregation, and — the real
 * lever — ALREADY-PROFILED data never needs rescanning: per-day (or
 * per-partition) sketch rows stored as binary columns merge into
 * month/corpus cardinalities with `hll_union_agg` over KB-sized inputs.
 *
 * This is the scale path behind the summarize operator's
 * `distinct_count` metric (reference analysis metrics,
 * `raise_/analytics/analysis.py` Aggregation; the exact metric stays
 * the oracle-verified default — sketches are the opt-in for extreme
 * cardinality, same stance as t-digest percentiles).
 *
 * Built entirely on Spark's native DataSketches expressions
 * (`hll_sketch_agg`/`hll_union`/`hll_sketch_estimate` — codegen'd,
 * no UDF, no driver state). Standard error at the default
 * `lgConfigK=12` is ~1.6%/√1 ≈ 0.8–1.6%; raise lgConfigK for tighter
 * bounds (each +1 doubles sketch size).
 */
object Sketches {

  /**
   * Per-group HLL profiles: one row per `groupCols` group with, for
   * each value column, a mergeable sketch binary (`<c>_hll`) and its
   * cardinality estimate (`<c>_distinct_est`). No `groupCols` → one
   * global profile row.
   */
  def hllProfile(df: DataFrame, valueCols: Seq[String],
      groupCols: Seq[String] = Nil, lgConfigK: Int = 12): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val aggs = valueCols.flatMap { c =>
      val sk = hll_sketch_agg(col(c), lit(lgConfigK))
      Seq(sk.as(s"${c}_hll"),
        hll_sketch_estimate(sk).cast("long").as(s"${c}_distinct_est"))
    }
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Merge stored profiles ACROSS groups without touching the raw data:
   * unions each `<c>_hll` column over all rows (optionally regrouped by
   * `groupCols`, e.g. day-profiles → month-profiles) and re-estimates.
   * Input rows are KB-sized sketches, so this runs in milliseconds at
   * any corpus size — the incremental-profiling payoff.
   */
  def hllMergeProfiles(profiles: DataFrame, valueCols: Seq[String],
      groupCols: Seq[String] = Nil): DataFrame = {
    val aggs = valueCols.flatMap { c =>
      val merged = hll_union_agg(col(s"${c}_hll"))
      Seq(merged.as(s"${c}_hll"),
        hll_sketch_estimate(merged).cast("long").as(s"${c}_distinct_est"))
    }
    if (groupCols.isEmpty) profiles.agg(aggs.head, aggs.tail: _*)
    else profiles.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Per-group KLL quantile sketches (DataSketches, native Spark 4
   * expressions) — the mergeable counterpart of the exact distributed
   * percentile path: one row per group with the sketch binary
   * (`<c>_kll`) and the requested quantile estimates (`<c>_p<q>`).
   * Rank error at the default k=200 is ~1.65% (two-sided, 99% conf.).
   * The same incremental payoff as [[hllProfile]]: stored per-day
   * sketches roll up to corpus quantiles with no rescan.
   */
  def kllProfile(df: DataFrame, valueCol: String,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      groupCols: Seq[String] = Nil, k: Int = 200): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0, 1]")
    val sk = kll_sketch_agg_double(col(valueCol).cast("double"), k)
    val aggs = sk.as(s"${valueCol}_kll") +: quantiles.map(q =>
      kll_sketch_get_quantile_double(sk, lit(q))
        .as(s"${valueCol}_p${(q * 100).round}"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge stored KLL profiles across groups (per-day → corpus) and
    * re-estimate the quantiles — KB inputs, no raw-data rescan. */
  def kllMergeProfiles(profiles: DataFrame, valueCol: String,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      groupCols: Seq[String] = Nil): DataFrame = {
    // kll_merge_agg_double is registered in the function registry but
    // has no typed functions._ wrapper in this Spark version
    val merged = expr(s"kll_merge_agg_double(${valueCol}_kll)")
    val aggs = merged.as(s"${valueCol}_kll") +: quantiles.map(q =>
      kll_sketch_get_quantile_double(merged, lit(q))
        .as(s"${valueCol}_p${(q * 100).round}"))
    if (groupCols.isEmpty) profiles.agg(aggs.head, aggs.tail: _*)
    else profiles.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Per-group Count–Min frequency sketches (Spark's native
   * `count_min_sketch` aggregate — codegen'd, mergeable binary state):
   * the third leg of the sketch family — HLL answers "how many
   * distinct", KLL "what quantile", CMS "how often does item x occur"
   * without materializing the full value histogram. Guarantees:
   * est ≥ true, est ≤ true + ε·N with probability ≥ `confidence`.
   * Insertion and merge are commutative counter additions, so the
   * sketch bytes are deterministic for a fixed `seed` regardless of
   * partitioning. One row per group: (`groupCols`…, `<c>_cms`, n).
   */
  def cmsProfile(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val aggs = Seq(
      count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as(s"${valueCol}_cms"),
      count(col(valueCol)).as("n"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Point-frequency estimates from a stored CMS binary — the
   * METADATA-side read path (the sketch row is KBs; the raw corpus is
   * never rescanned). `items` are the probes (e.g. a watchlist of
   * suspected heavy hitters from [[Profiling]]).
   */
  def cmsEstimate(sketchBytes: Array[Byte],
      items: Seq[Any]): Seq[(Any, Long)] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    items.map(i => i -> cms.estimateCount(i))
  }

  /**
   * Merge stored CMS profile rows (per-day → corpus) into one sketch.
   * Input is PROFILE rows — KB-sized sketches at metadata cardinality
   * (days × groups), so the driver-side merge is bounded by what a
   * profile store holds, never by corpus size; the counter-wise
   * addition is exact (merging then estimating ≡ sketching the union).
   */
  def cmsMerge(profiles: DataFrame, sketchCol: String): Array[Byte] = {
    val rows = profiles.select(col(sketchCol)).collect()
    require(rows.nonEmpty, "no profiles to merge")
    val sketches = rows.map(r =>
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    val merged = sketches.reduce { (a, b) => a.mergeInPlace(b); a }
    val bos = new java.io.ByteArrayOutputStream()
    merged.writeTo(bos)
    bos.toByteArray
  }
}
