package graft

import org.apache.spark.sql.SparkSession

/**
 * Opinionated SparkSession defaults for running this library at scale —
 * every knob is the one the operators here are designed against:
 *
 *  - AQE on (runtime re-plan: skew-join splitting, partition
 *    coalescing, broadcast demotion) — the operators lean on it for
 *    fact-fact join skew instead of hand-salting everything;
 *  - `spark.sql.shuffle.partitions` sized by the caller (cores × 2-3
 *    locally; thousands on a real cluster — AQE coalesces down);
 *  - dynamic partition overwrite, so `ParquetTarget`'s partition-scoped
 *    upsert replaces only affected partitions;
 *  - parquet nanos-as-long + UTC session time, matching
 *    [[Tables.load]]'s nano-timestamp handling and the oracle's
 *    microsecond truncation;
 *  - 128 MiB scan partitions (`files.maxPartitionBytes` default kept —
 *    documented here as the lever to retune when row width is extreme).
 *
 * This is a convenience, not a requirement — every operator works on a
 * plain session; tests/Bench/Verify build their own.
 */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session sized to the machine (tests, notebooks, Bench). */
  def local(cores: Int = math.min(Runtime.getRuntime.availableProcessors, 32))
      : SparkSession =
    builder(s"local[$cores]", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
