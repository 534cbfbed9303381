package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.etl.{ParquetTarget, WriteMode}

/**
 * Stream → transactional table sinks: each micro-batch lands through
 * [[graft.etl.ParquetTarget]]'s staged-swap commit, composing Structured
 * Streaming's at-least-once batch redelivery with the target's
 * key-idempotent upsert into end-to-end effectively-once ingestion:
 * a replayed batch re-merges the same keys to the same values, and a
 * crash inside a batch's commit either leaves the table pre-batch or is
 * rolled forward by the redelivery — never half-written.
 *
 * The caller owns triggers and checkpointing (`.trigger(...)
 * .option("checkpointLocation", ...)`) — the sink only fixes the
 * per-batch write semantics. Continuous CDC-style feature refresh
 * (reference live tables, raise_/live/table.py) is this sink under a
 * file/Kafka source.
 */
object StreamingSink {

  /** Upsert every micro-batch into `target` on `keys`. */
  def upsertEachBatch(stream: DataFrame, target: ParquetTarget,
      keys: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // empty batches skip the merge read-modify-write entirely
      if (!batch.isEmpty) { target.write(batch, WriteMode.Upsert, keys); () }
    }

  /** Append every micro-batch (immutable event/log tables). */
  def appendEachBatch(stream: DataFrame, target: ParquetTarget)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) { target.write(batch, WriteMode.Append); () }
    }
}
