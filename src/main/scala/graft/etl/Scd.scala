package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SCD Type-2 history maintenance — the versioned twin of the
 * reference's SCD1 upsert (raise_/transforms/job.py:41-71 replaces
 * rows in place; this keeps every version with a validity interval),
 * the shape a feature store needs for point-in-time-correct training
 * joins over mutable dimensions.
 *
 * History schema: keys ++ attrs ++ (valid_from, valid_to) with
 * `valid_to IS NULL` marking the current version.
 *
 * Scale shape: one key-partitioned window to take the latest update
 * per key in the batch, one keyed join of updates against CURRENT
 * rows only (closed history never shuffles — it passes through
 * untouched), and a union. Change detection is null-safe per
 * attribute. Idempotent: re-applying the same batch is a no-op
 * (unchanged attributes never open a new version).
 */
object Scd {

  /**
   * Apply `updates` (keys ++ attrs ++ `tsCol`) to an SCD2 `history`:
   * changed keys close their current row (`valid_to` = update ts) and
   * append a new open version; unseen keys insert their first version;
   * unchanged updates are dropped. Multiple updates per key in one
   * batch collapse to the latest by `tsCol` (intra-batch history is a
   * caller concern — feed batches in order for full fidelity).
   */
  def scd2Apply(history: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], tsCol: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "need keys and attrs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc)
    val latest = updates
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .select(keys.map(col) ++ attrs.map(c => col(c).as(s"__u_$c")) :+
        col(tsCol).as("__uts"): _*)
    val current = history.where(col("valid_to").isNull)
    val closed = history.where(col("valid_to").isNotNull)
    val joined = current.join(latest, keys, "full_outer")
    val changed = attrs
      .map(c => !(col(c) <=> col(s"__u_$c")))
      .reduce(_ || _)
    val hasCurrent = col("valid_from").isNotNull
    val hasUpdate = col("__uts").isNotNull
    // current rows: close when a differing update arrived, else keep open
    val keptCurrent = joined.where(hasCurrent)
      .select(keys.map(col) ++ attrs.map(col) :+ col("valid_from") :+
        when(hasUpdate && changed, col("__uts"))
          .otherwise(col("valid_to")).as("valid_to"): _*)
    // new versions: differing updates on existing keys + brand-new keys
    val inserts = joined.where(hasUpdate && (!hasCurrent || changed))
      .select(keys.map(col) ++
        attrs.map(c => col(s"__u_$c").as(c)) :+
        col("__uts").as("valid_from") :+
        lit(null).cast(
          history.schema("valid_to").dataType).as("valid_to"): _*)
    closed.unionByName(keptCurrent).unionByName(inserts)
  }

  /** Point-in-time read of an SCD2 history: the version valid AT `ts`
    * (`valid_from <= ts < valid_to`, open intervals included) — the
    * dimension side of a training-data as-of join. */
  def asOf(history: DataFrame, ts: org.apache.spark.sql.Column): DataFrame =
    history.where(col("valid_from") <= ts &&
      (col("valid_to").isNull || ts < col("valid_to")))

  /**
   * Point-in-time dimension join — the feature-store correctness join:
   * each FACT row picks the dimension version valid AT ITS OWN
   * timestamp (`valid_from <= fact.ts < valid_to`), never a later one
   * (the label-leakage bug PIT-correct training joins exist to
   * prevent). A keyed equi-join carries the interval predicate in the
   * join condition: fan-out before filtering is the key's VERSION
   * count (small by construction — versions per entity, not rows), so
   * no range bucketing is needed, unlike the timestamp-only
   * [[graft.ops.PointInTime]] joins. `"left"` keeps facts with no
   * valid version (NULL dims); validity intervals per key must be
   * non-overlapping, which [[scd2Apply]] guarantees.
   */
  def pitJoin(facts: DataFrame, history: DataFrame, keys: Seq[String],
      tsCol: String, joinType: String = "inner"): DataFrame = {
    val cond = keys.map(k => facts(k) === history(k)).reduce(_ && _) &&
      history("valid_from") <= facts(tsCol) &&
      (history("valid_to").isNull || facts(tsCol) < history("valid_to"))
    keys.foldLeft(facts.join(history, cond, joinType)) { (df, k) =>
      df.drop(history(k))
    }
  }
}
