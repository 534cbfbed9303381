package graft.live

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{AggStore, ParquetTarget, SnapshotStore, WriteMode}

/**
 * Incrementally maintained live AGGREGATION over a [[SnapshotStore]]
 * — the view-maintenance upgrade of [[LiveTable]]'s on-commit refresh
 * (reference contract raise_/analytics/live_table.py:161-209): where
 * LiveTable re-runs the whole analysis per commit, this table holds
 * per-key linear sufficient statistics ([[AggStore]] n/sum/sumsq) and
 * folds each commit's PHYSICAL DELTA ([[SnapshotStore.deltaBetween]])
 * into them — additions with sign +1, an upsert's replaced rows with
 * sign −1 — so a refresh costs ∝ the commit's changed partitions, not
 * the table, and the finalized (n, sum, mean, std) frame is EXACTLY a
 * full recompute of the store head (linear statistics maintain
 * losslessly under retraction; min/max do not, which is why they stay
 * on the full-recompute [[LiveTable]] path).
 *
 * Crash safety: the state parquet at `<statePath>/state` carries the
 * reflected store version INSIDE it (a `__version` column), and the
 * state commit is [[ParquetTarget]]'s staged atomic swap — state and
 * version advance together or not at all, so a replayed commit
 * notification is a no-op (version gate) and a crash mid-refresh
 * leaves the previous state+version pair intact, never a half-folded
 * delta.
 */
final class LiveAggTable(
    val name: String,
    spark: SparkSession,
    store: SnapshotStore,
    keyCols: Seq[String],
    valueCol: String,
    materializePath: String,
    statePath: String,
    val cdc: CdcConfig = CdcConfig()) {

  private val events = scala.collection.mutable.ArrayBuffer.empty[RefreshEvent]
  @volatile private var stream: Option[StreamingQuery] = None

  private def stateDir = statePath + "/state"

  private def readState(): Option[(DataFrame, Long)] =
    if (!new java.io.File(stateDir).exists()) None
    else {
      val df = spark.read.parquet(stateDir)
      val v = df.agg(max(col("__version"))).head().getLong(0)
      Some((df.drop("__version"), v))
    }

  private def commitState(state: DataFrame, version: Long): DataFrame = {
    ParquetTarget(stateDir).write(
      state.withColumn("__version", lit(version)), WriteMode.Full)
    spark.read.parquet(stateDir).drop("__version")
  }

  private def materialize(state: DataFrame): Long = {
    val out = AggStore.finalizeLinear(state, keyCols)
    val n = out.count()
    out.write.mode("overwrite").parquet(materializePath)
    n
  }

  /**
   * Fold every commit since the last reflected version into the state
   * (one full pass on first call initializes it), re-materialize the
   * finalized frame, and record the event. No-op (None) when the store
   * head hasn't advanced — the version gate that makes commit replays
   * idempotent.
   */
  def refreshIncremental(trigger: String = "manual"): Option[RefreshEvent] = synchronized {
    val head = store.latestVersion(spark).getOrElse(
      return None) // store not yet committed: nothing to reflect
    val t0 = System.nanoTime()
    val (state, kind) = readState() match {
      case Some((_, v)) if v == head => return None
      case Some((prev, v)) =>
        val (adds, rets) = store.deltaBetween(spark, v, head)
        (AggStore.mergeLinear(Seq(
          prev,
          AggStore.linearPartials(adds, keyCols, valueCol, 1),
          AggStore.linearPartials(rets, keyCols, valueCol, -1)),
          keyCols), "incremental")
      case None =>
        (AggStore.linearPartials(store.read(spark), keyCols, valueCol),
          "initial")
    }
    val committed = commitState(state, head)
    val n = materialize(committed)
    val ev = RefreshEvent(Instant.now(), s"${trigger}_$kind", n,
      (System.nanoTime() - t0) / 1000000)
    events += ev
    Some(ev)
  }

  /** The finalized materialization (same query surface as
    * [[LiveTable.query]]'s base read). */
  def query(filter: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(materializePath)
    filter.fold(df)(df.where(_))
  }

  /** Commit-log watch, LiveTable's [[LiveTable.startOnSnapshotCommit]]
    * shape — but each batch folds only the new commits' deltas. */
  def startOnSnapshotCommit(checkpointDir: String): StreamingQuery = {
    val src = spark.readStream
      .option("maxFilesPerTrigger", cdc.maxFilesPerTrigger)
      .text(store.commitLogPath)
    val q = src.writeStream
      .trigger(Trigger.ProcessingTime(s"${cdc.debounceSeconds} seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) refreshIncremental(s"snapshot_commit_$id")
        ()
      }
      .start()
    stream = Some(q)
    q
  }

  def stopStream(): Unit = { stream.foreach(_.stop()); stream = None }
  def refreshHistory: Seq[RefreshEvent] = synchronized(events.toSeq)
}
