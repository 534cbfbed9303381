package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers for co-located joins/aggregations — the
 * pre-shuffle answer to repeated large-fact equi-joins at 100 TB: write
 * both sides bucketed (and sorted) by the join keys ONCE, and every
 * subsequent join/groupBy on those keys skips its Exchange (and with
 * sorted buckets, the sort) entirely. EtlExtSpec asserts the
 * shuffle-free plan.
 */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
