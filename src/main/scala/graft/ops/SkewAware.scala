package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-aware aggregation: two-phase salted groupBy for hot keys. A
 * skewed key's rows are spread over `salt` sub-groups for the first
 * (partial) aggregation, then merged — no single reducer ever sees the
 * whole hot key. Algebraic metrics only (count/sum/min/max/avg); results
 * identical to a direct groupBy.
 *
 * AQE's skew-join handling covers joins; this covers aggregation skew,
 * which AQE does not rebalance. At 100 TB, apply to group-bys whose key
 * histogram is heavy-tailed (event_type, user_id power laws).
 */
object SkewAware {

  /**
   * `metrics`: (alias, metric, column) with metric ∈ count|sum|min|max|avg.
   */
  def groupAgg(df: DataFrame, keys: Seq[String], salt: Int,
      metrics: Seq[(String, String, String)]): DataFrame = {
    require(salt > 0)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    // phase 1: partial aggregates per (keys, salt)
    val partial = metrics.flatMap {
      case (a, "count", c) => Seq(count(col(c)).as(s"__cnt_$a"))
      case (a, "sum", c)   => Seq(sum(col(c)).as(s"__sum_$a"))
      case (a, "min", c)   => Seq(min(col(c)).as(s"__min_$a"))
      case (a, "max", c)   => Seq(max(col(c)).as(s"__max_$a"))
      case (a, "avg", c) =>
        Seq(sum(col(c)).as(s"__sum_$a"), count(col(c)).as(s"__cnt_$a"))
      case (_, m, _) => throw new IllegalArgumentException(s"Non-algebraic metric: $m")
    }
    val p1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    // phase 2: merge partials per keys
    val merged = metrics.map {
      case (a, "count", _) => sum(col(s"__cnt_$a")).as(a)
      case (a, "sum", _)   => sum(col(s"__sum_$a")).as(a)
      case (a, "min", _)   => min(col(s"__min_$a")).as(a)
      case (a, "max", _)   => max(col(s"__max_$a")).as(a)
      case (a, "avg", _) =>
        (sum(col(s"__sum_$a")) / sum(col(s"__cnt_$a"))).as(a)
    }
    p1.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }

  /**
   * Key-skew profile — the diagnostic that DECIDES the mitigations
   * this module and the salted as-of join offer: one keyed count +
   * one small aggregate over the per-key counts, reporting the key
   * histogram's shape and a suggested salt factor.
   *
   *   - `n_keys`, `n_rows`, `max_rows`, `avg_rows`: the basics;
   *   - `top_share`: the hottest key's fraction of all rows (≈1/n_keys
   *     when balanced, →1 under power-law collapse);
   *   - `skew_ratio`: max/avg — the factor by which the hottest
   *     reducer outweighs the average one, i.e. the straggler
   *     multiplier of an unsalted shuffle;
   *   - `suggested_salt`: ⌈skew_ratio⌉ capped at `maxSalt` — spreading
   *     the hottest key over that many sub-groups levels it with the
   *     average (1 = no salting needed).
   *
   * Two shuffles total (the keyed count, then a ≤n_keys-row global
   * aggregate); nothing driver-side. Run it on a sample for a quick
   * read — the ratios are scale-free.
   */
  def keySkewProfile(df: DataFrame, keys: Seq[String],
      maxSalt: Int = 64): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("__n")).as("n_rows"),
      max(col("__n")).as("max_rows"),
      avg(col("__n")).as("avg_rows"),
      (max(col("__n")) / sum(col("__n")).cast("double")).as("top_share"),
      (max(col("__n")) / avg(col("__n"))).as("skew_ratio"),
      least(greatest(ceil(max(col("__n")) / avg(col("__n"))).cast("int"),
        lit(1)), lit(maxSalt)).as("suggested_salt"))
  }

  /**
   * EXACT pre-flight join fan-out profile: before running `a ⋈ b` on
   * `keys`, report what it will produce — output rows
   * (Σ over matched keys of cA·cB), matched-key count, the single
   * hottest key's contribution, and its share. The classic guard
   * against the accidental-explosion join (duplicate keys on both
   * sides): two key-count aggregations + a KEY-CARDINALITY-sized join
   * of the count frames — never the data join itself, so the probe
   * costs two shuffles of key-count rows regardless of how explosive
   * the real join would be. Feed `suggested check`: est_rows ≫
   * max(|a|, |b|) means somebody's key isn't the key they think it is.
   */
  def joinFanout(a: DataFrame, b: DataFrame, keys: Seq[String])
      : DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val ca = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cb"))
    ca.join(cb, keys)
      .select((col("__ca") * col("__cb")).as("__prod"))
      .agg(
        count(lit(1)).as("n_matched_keys"),
        coalesce(sum(col("__prod")), lit(0L)).as("est_rows"),
        coalesce(max(col("__prod")), lit(0L)).as("max_key_rows"))
      .withColumn("max_key_share",
        when(col("est_rows") > 0,
          col("max_key_rows").cast("double") / col("est_rows")))
  }

  /**
   * Salted inner equi-join for skewed keys — the join-side companion
   * to [[groupAgg]], for when AQE's skew split can't help (e.g. the
   * skewed side feeds a co-partitioned downstream stage, or the
   * runtime stats miss the skew because the hot key materializes
   * mid-pipeline). The LEFT (large, skewed) side's rows get a random
   * sub-key in [0, salt); the RIGHT side is replicated `salt` times
   * via a literal-Range explode (scale-bounded by construction), so
   * each hot key's work spreads over `salt` reducers. Results are
   * identical to `left.join(right, keys)` — every left row still
   * meets every matching right row exactly once.
   *
   * Costs: the right side shuffles salt× its size — use for
   * large-×-medium joins where the right side is far smaller than
   * the left (else broadcast it and skew is moot) but too big to
   * broadcast whole.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(salt >= 1, "salt >= 1")
    if (salt == 1) left.join(right, keys)
    else {
      val l = left.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salt))
          .cast("int"))
      val r = right.withColumn("__salt",
        explode(lit((0 until salt).toArray)))
      l.join(r, keys :+ "__salt").drop("__salt")
    }
  }
}
