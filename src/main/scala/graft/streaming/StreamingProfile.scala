package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.etl.{ParquetTarget, WriteMode}
import graft.ops.Sketches

/**
 * Streaming corpus profiling via mergeable sketches — the rescan-free
 * answer to "what are the distinct counts and quantiles of everything
 * we ever ingested": each micro-batch appends ONE profile row (HLL
 * sketch per tracked column + KLL sketch for the value column, a few
 * KB) to a parquet store, and [[corpusProfile]] folds the stored rows
 * into whole-history estimates in milliseconds — no raw-data rescan,
 * no per-key streaming state, state growth O(batches), not O(rows).
 *
 * Delivery: plain APPEND — a redelivered batch appends its profile row
 * again, which double-counts that batch's contribution. HLL/KLL unions
 * are not redelivery-idempotent, so exactly-once matters here more
 * than in the key-idempotent sinks: the batch id is carried in the
 * row, and [[corpusProfile]] drops duplicate batch ids before merging
 * (dedup-on-read — cheap, the store is KB-sized rows).
 */
object StreamingProfile {

  /** Stream → one (batch_id, n_rows, sketches…) row per micro-batch. */
  def profileEachBatch(stream: DataFrame, hllCols: Seq[String],
      kllCol: String, target: ParquetTarget): DataStreamWriter[Row] = {
    require(hllCols.nonEmpty, "need at least one profiled column")
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      // the profile reads the batch four times (emptiness probe, HLL,
      // KLL, row count) — persist so the source is scanned once
      batch.persist()
      try {
        if (!batch.isEmpty) {
          val profile = Sketches.hllProfile(batch, hllCols)
            .crossJoin(Sketches.kllProfile(batch, kllCol, Seq(0.5)))
            .crossJoin(batch.agg(count(lit(1)).as("n_rows")))
            .withColumn("batch_id", lit(id))
          target.write(profile, WriteMode.Append)
          ()
        }
      } finally { batch.unpersist(); () }
    }
  }

  /** Whole-history estimates from the stored profile rows: duplicate
    * batch ids (replays) dropped, sketches merged, quantiles and
    * cardinalities re-estimated. KB inputs — runs in milliseconds at
    * any history length. */
  def corpusProfile(spark: org.apache.spark.sql.SparkSession,
      storePath: String, hllCols: Seq[String], kllCol: String,
      quantiles: Seq[Double] = Seq(0.5)): DataFrame = {
    // a replayed batch's rows are byte-identical, so WHICH duplicate
    // survives doesn't matter — dropDuplicates states that intent
    // (row_number ordered by the partition key would tie every row)
    val stored = spark.read.parquet(storePath).dropDuplicates("batch_id")
    Sketches.hllMergeProfiles(stored, hllCols)
      .crossJoin(Sketches.kllMergeProfiles(stored, kllCol, quantiles))
      .crossJoin(stored.agg(sum(col("n_rows")).as("n_rows")))
  }
}
