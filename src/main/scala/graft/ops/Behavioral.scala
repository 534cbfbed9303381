package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-stream behavioral analytics — the funnel / cohort queries every
 * event-backed feature store ends up serving. Both operators reduce to
 * a handful of keyed aggregations and entity-keyed joins: no windows
 * over the raw stream, no per-user state larger than a few timestamps,
 * parallelism scales with users.
 */
object Behavioral {

  /**
   * Ordered funnel conversion: step i counts a user iff an event of
   * `steps(i)` occurred AT OR AFTER the user's earliest qualifying time
   * for step i−1 (strict sequential semantics — a purchase before the
   * signup does not convert). Each step is one filtered aggregation
   * joined on the user key: k steps = k keyed joins over per-step
   * MINIMAL frames (one row per qualifying user), never a self-join of
   * the raw stream. Each intermediate reach frame is persisted so the
   * single result action computes every step ONCE — without the cache,
   * step k's plan would re-execute steps 1..k−1 (O(k²) scans); caches
   * are released to Spark's LRU once the action completes. Returns
   * (step_idx, step, n_users) with step 1 = the entry population, as
   * ONE lazy frame (no per-step driver action).
   */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .persist()
    def stepCount(r: DataFrame, idx: Int, name: String) =
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("step_idx"), lit(name).as("step"),
          col("n_users"))
    val stepCounts = scala.collection.mutable.ArrayBuffer(
      stepCount(reached, 1, steps.head))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      reached = df.where(col(typeCol) === s)
        .join(reached.select(col(userCol), col("__t").as("__prev")), userCol)
        .where(col(tsCol) >= col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .persist()
      stepCounts += stepCount(reached, i + 1, s)
    }
    stepCounts.reduce(_ unionByName _)
  }

  /**
   * Cohort retention: users grouped by their first-activity period
   * (the cohort), counted in every later period they return —
   * `(cohort, period_offset, n_users)`, the classic retention
   * triangle. Two aggregations (first-seen per user; distinct
   * user-periods) and one user-keyed join. `granularity` is any
   * `date_trunc` unit (`week`, `month`, `day`).
   */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
      granularity: String = "week"): DataFrame = {
    val period = date_trunc(granularity, col(tsCol))
    val firstSeen = df.groupBy(col(userCol))
      .agg(min(period).as("cohort"))
    val active = df.select(col(userCol), period.as("__p")).distinct()
    val diff = granularity.toLowerCase match {
      case "day"   => datediff(col("__p"), col("cohort"))
      case "week"  => floor(datediff(col("__p"), col("cohort")) / 7)
      case "month" => months_between(col("__p"), col("cohort")).cast("long")
      case g => throw new IllegalArgumentException(s"granularity: $g")
    }
    active.join(firstSeen, userCol)
      .withColumn("period_offset", diff.cast("long"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
