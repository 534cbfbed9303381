package graft.live

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Live tables: materialized analyses with CDC / scheduled refresh
 * (raise_/analytics/live_table.py). Batch refresh recomputes the analysis
 * frame and rewrites the materialization; on_change refresh attaches a
 * Structured Streaming file watch whose `foreachBatch` triggers the same
 * batch refresh (debounced via processing-time trigger).
 */
final case class RefreshPolicy(kind: String, cron: Option[String] = None)
object RefreshPolicy {
  val onChange: RefreshPolicy = RefreshPolicy("on_change")
  val hourly: RefreshPolicy = RefreshPolicy("hourly")
  val daily: RefreshPolicy = RefreshPolicy("daily")
  val weekly: RefreshPolicy = RefreshPolicy("weekly")
  val manual: RefreshPolicy = RefreshPolicy("manual")
  def cron(expr: String): RefreshPolicy = RefreshPolicy("cron", Some(expr))
}

/** CDC knobs (live_table.py:20-56). */
final case class CdcConfig(
    debounceSeconds: Int = 5,
    maxFilesPerTrigger: Int = 1000,
    trackColumns: Seq[String] = Nil)

final case class RefreshEvent(
    at: Instant, trigger: String, rows: Long, durationMs: Long)

final class LiveTable(
    val name: String,
    spark: SparkSession,
    compute: SparkSession => DataFrame, // the analysis program
    materializePath: String,
    val policy: RefreshPolicy = RefreshPolicy.manual,
    val cdc: CdcConfig = CdcConfig(),
    /** Snapshot-backed materialization: refreshes commit through the
      * store (upsert-merged on `upsertKeys` when non-empty, so a
      * partition-sliced `compute` rewrites ONLY its slice and the
      * untouched segments persist), and filtered [[query]] calls ride
      * [[graft.etl.SnapshotStore.readWhere]] — manifest-stats segment
      * skipping prunes non-matching segments BEFORE any file listing,
      * the same read path the feature-group analysis gets. */
    val store: Option[graft.etl.SnapshotStore] = None,
    upsertKeys: Seq[String] = Nil) {

  private val events = scala.collection.mutable.ArrayBuffer.empty[RefreshEvent]
  @volatile private var paused = false
  @volatile private var stream: Option[StreamingQuery] = None

  def refresh(force: Boolean = false, trigger: String = "manual"): Option[RefreshEvent] = {
    if (paused && !force) return None
    val t0 = System.nanoTime()
    val df = compute(spark)
    val n = df.count()
    store match {
      case Some(st) =>
        st.write(df,
          if (upsertKeys.nonEmpty) graft.etl.WriteMode.Upsert
          else graft.etl.WriteMode.Full,
          upsertKeys)
      case None =>
        df.write.mode("overwrite").parquet(materializePath)
    }
    val ev = RefreshEvent(Instant.now(), trigger, n, (System.nanoTime() - t0) / 1000000)
    synchronized(events += ev)
    Some(ev)
  }

  /** Query the materialization; `-col` = descending (live_table.py:211-271).
    * Snapshot-backed tables route a filter through segment skipping. */
  def query(filter: Option[String] = None, orderBy: Seq[String] = Nil,
      limit: Option[Int] = None): DataFrame = {
    var df = store match {
      case Some(st) =>
        filter.fold(st.read(spark))(f => st.readWhere(spark, f))
      case None =>
        val base = spark.read.parquet(materializePath)
        filter.fold(base)(base.where(_))
    }
    if (orderBy.nonEmpty)
      df = df.orderBy(orderBy.map(c =>
        if (c.startsWith("-")) col(c.drop(1)).desc else col(c).asc): _*)
    limit.foreach(n => df = df.limit(n))
    df
  }

  /**
   * on_change: watch a source directory as a stream; every micro-batch
   * with data re-materializes. Debounce → processing-time trigger;
   * batch size → maxFilesPerTrigger (live_table.py:29-37 mapping).
   */
  def startOnChange(sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      checkpointDir: String): StreamingQuery = {
    require(policy.kind == "on_change", s"policy is ${policy.kind}")
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", cdc.maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = src.writeStream
      .trigger(Trigger.ProcessingTime(s"${cdc.debounceSeconds} seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) refresh(force = false, trigger = s"cdc_batch_$id")
        ()
      }
      .start()
    stream = Some(q)
    q
  }

  /**
   * on_change from a [[graft.etl.SnapshotStore]]: the store's commit
   * log IS the change-data feed — every committed version writes
   * exactly one new `_log` file at its atomic commit point, so a text
   * file-stream over the log directory delivers one tiny record per
   * commit (KB manifests, never row data), and `foreachBatch` triggers
   * the same batch [[refresh]] as the raw file watch. With
   * `cdc.maxFilesPerTrigger = 1` each commit becomes its own refresh
   * batch; larger values debounce a burst of commits into one refresh
   * — either way the materialization equals a batch recompute of the
   * store head, because refresh re-runs `compute` against the
   * committed snapshot (never a partial write: uncommitted data dirs
   * are invisible by construction).
   */
  def startOnSnapshotCommit(store: graft.etl.SnapshotStore,
      checkpointDir: String): StreamingQuery = {
    require(policy.kind == "on_change", s"policy is ${policy.kind}")
    val src = spark.readStream
      .option("maxFilesPerTrigger", cdc.maxFilesPerTrigger)
      .text(store.commitLogPath)
    val q = src.writeStream
      .trigger(Trigger.ProcessingTime(s"${cdc.debounceSeconds} seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) refresh(force = false, trigger = s"snapshot_commit_$id")
        ()
      }
      .start()
    stream = Some(q)
    q
  }

  def stopStream(): Unit = { stream.foreach(_.stop()); stream = None }
  def pause(): Unit = { paused = true }
  def resume(): Unit = { paused = false }
  def isPaused: Boolean = paused
  def refreshHistory: Seq[RefreshEvent] = synchronized(events.toSeq)
}
