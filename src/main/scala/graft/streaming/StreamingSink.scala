package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.etl.{ParquetTarget, WriteMode}

/**
 * Stream → [[graft.etl.ParquetTarget]] sinks. The two paths carry
 * DIFFERENT delivery guarantees — pick by table semantics:
 *
 *  - [[upsertEachBatch]]: effectively-once BY KEY. Each micro-batch
 *    lands through the target's staged-swap commit; Structured
 *    Streaming's at-least-once redelivery composes with the
 *    key-idempotent merge (a replayed batch re-merges the same keys to
 *    the same values), and a crash inside a batch's commit either
 *    leaves the table pre-batch or rolls forward on redelivery —
 *    never half-written.
 *  - [[appendEachBatch]]: at-least-once, PLAIN append (no staging, no
 *    marker). A batch whose append committed but whose streaming
 *    checkpoint didn't is appended AGAIN on restart — duplicate rows.
 *    Use only where downstream dedups (or duplicates are tolerable);
 *    for exactly-once semantics give rows a key and use the upsert
 *    sink.
 *
 * The caller owns triggers and checkpointing (`.trigger(...)
 * .option("checkpointLocation", ...)`) — the sink only fixes the
 * per-batch write semantics. Continuous CDC-style feature refresh
 * (reference live tables, raise_/live/table.py) is the upsert sink
 * under a file/Kafka source.
 */
object StreamingSink {

  /** The batch source is re-read per action otherwise (isEmpty probe,
    * the write's row count, the merge itself — 3× input I/O). */
  private def withCachedBatch(batch: DataFrame)(body: => Unit): Unit = {
    batch.persist()
    try { if (!batch.isEmpty) body }
    finally { batch.unpersist(); () }
  }

  /** Upsert every micro-batch into `target` on `keys`. */
  def upsertEachBatch(stream: DataFrame, target: ParquetTarget,
      keys: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      withCachedBatch(batch) { target.write(batch, WriteMode.Upsert, keys); () }
    }

  /** Append every micro-batch (duplicates possible on redelivery — see
    * the object doc). */
  def appendEachBatch(stream: DataFrame, target: ParquetTarget)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      withCachedBatch(batch) { target.write(batch, WriteMode.Append); () }
    }

  /** Upsert every micro-batch into a [[graft.etl.SnapshotStore]] —
    * versioned streaming ingestion: each batch commits a snapshot
    * version, so the table's whole micro-batch history stays
    * time-travelable (`readVersion`/`asOf`) while the head serves the
    * merged state. Same effectively-once-by-key story as
    * [[upsertEachBatch]]: a redelivered batch re-merges the same keys
    * to the same values (it adds a version whose CONTENT equals the
    * previous head — the head state is replay-idempotent even though
    * the version count is not). */
  def upsertEachBatchVersioned(stream: DataFrame,
      store: graft.etl.SnapshotStore, keys: Seq[String])
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      withCachedBatch(batch) { store.write(batch, WriteMode.Upsert, keys); () }
    }
}
