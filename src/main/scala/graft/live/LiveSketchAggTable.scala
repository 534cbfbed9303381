package graft.live

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{ParquetTarget, SnapshotStore, WriteMode}

/**
 * Incrementally maintained live DISTINCT-COUNT + PERCENTILE aggregates
 * over a [[SnapshotStore]] — the sketch-state companion to
 * [[LiveAggTable]]'s linear statistics. Those metrics cannot fold
 * retractions through n/sum/sumsq (an HLL union is monotone; a KLL
 * sketch has no subtract), so the state here is one mergeable sketch
 * pair (HLL + KLL, [[graft.ops.Sketches]] substrate) per
 * (aggregation key × STORE PARTITION):
 *
 *  - append commits MERGE: the new rows' per-(key, partition) sketches
 *    union into the existing state — sketch-union is exactly
 *    re-sketching the union of the inputs, so no rescan;
 *  - upsert/delete commits REBUILD only the store partitions whose
 *    rows were retracted (which [[SnapshotStore.deltaBetween]] already
 *    scopes via exclusion-predicate partition terms): those
 *    partitions' sketches are re-derived from the store HEAD filtered
 *    to exactly those partitions — a partition-pruned file listing —
 *    while every untouched partition's state row carries over
 *    unchanged. A store with no `partitionBy` degrades to a full
 *    sketch rebuild on any retraction (documented; appends still
 *    merge).
 *
 * The finalized frame is per aggregation key: (keys…, n,
 * distinct_count, p50/p90/… quantile estimates). For HLL,
 * union-of-sketches ≡ sketch-of-union REGISTER-EXACT, so the
 * incrementally maintained distinct_count equals a full head
 * recompute through the same sketch bit-for-bit; KLL merge carries
 * the documented rank error (~1.65% at k=200), so quantiles agree
 * with a full recompute within sketch tolerance (StreamingSpec pins
 * both).
 *
 * Crash safety: same staged-swap + in-state `__version` gate as
 * [[LiveAggTable]] — state and reflected version advance atomically,
 * replayed commit notifications are no-ops.
 */
final class LiveSketchAggTable(
    val name: String,
    spark: SparkSession,
    store: SnapshotStore,
    keyCols: Seq[String],
    valueCol: String,
    quantiles: Seq[Double] = Seq(0.5, 0.9),
    materializePath: String,
    statePath: String,
    val cdc: CdcConfig = CdcConfig()) {

  require(quantiles.forall(q => q >= 0 && q <= 1),
    "quantiles must be in [0, 1]")
  require(quantiles.map(LiveSketchAggTable.quantileColName).distinct.size ==
    quantiles.size, "quantiles must map to distinct column names")

  private val events = scala.collection.mutable.ArrayBuffer.empty[RefreshEvent]
  @volatile private var stream: Option[StreamingQuery] = None
  /** Files listed by the last partial REBUILD read (test/ops
    * introspection: proves the refresh touched only changed
    * partitions). Empty when the refresh merged appends only. */
  @volatile var lastRebuildFiles: Seq[String] = Nil

  private def partCols = store.partitionBy
  // a partition column may ITSELF be an aggregation key (per-day
  // metrics over a day-partitioned store): dedup, don't double-group
  private def stateKeys = (keyCols ++ partCols).distinct

  private def stateDir = statePath + "/state"

  // HLL accepts int/long/string/binary — a double/decimal value column
  // rides as its canonical string (cast is deterministic, distinct
  // semantics preserved)
  private def sketchAggs: Seq[Column] = Seq(
    hll_sketch_agg(col(valueCol).cast("string"), lit(12)).as("__hll"),
    expr(s"kll_sketch_agg_double(CAST(`$valueCol` AS DOUBLE), 200)")
      .as("__kll"),
    count(col(valueCol)).as("__n"))

  /** Per-(key, partition) sketch rows for a batch of raw rows. */
  private def profile(df: DataFrame): DataFrame =
    df.groupBy(stateKeys.map(col): _*)
      .agg(sketchAggs.head, sketchAggs.tail: _*)

  /** Union sketch rows ACROSS inputs at (key, partition) granularity —
    * KB-sized state rows, never raw data. */
  private def mergeState(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduceLeft(_.unionByName(_))
      .groupBy(stateKeys.map(col): _*)
      .agg(hll_union_agg(col("__hll")).as("__hll"),
        expr("kll_merge_agg_double(__kll)").as("__kll"),
        sum(col("__n")).as("__n"))

  private def readState(): Option[(DataFrame, Long)] =
    if (!new java.io.File(stateDir).exists()) None
    else {
      val df = spark.read.parquet(stateDir)
      // A zero-row state frame (initial commit against an empty store)
      // makes max(__version) NULL — treat it as "no state" so the
      // caller falls through to the initial rebuild branch.
      Option(df.agg(max(col("__version"))).head().get(0))
        .map(v => (df.drop("__version"), v.asInstanceOf[Long]))
    }

  private def commitState(state: DataFrame, version: Long): DataFrame = {
    ParquetTarget(stateDir).write(
      state.withColumn("__version", lit(version)), WriteMode.Full)
    spark.read.parquet(stateDir).drop("__version")
  }

  private def materialize(state: DataFrame): Long = {
    val mergedH = hll_union_agg(col("__hll"))
    val qCols = quantiles.map(q =>
      expr(s"kll_sketch_get_quantile_double(kll_merge_agg_double(__kll), $q)")
        .as(LiveSketchAggTable.quantileColName(q)))
    val aggCols = Seq(sum(col("__n")).as("n"),
      hll_sketch_estimate(mergedH).cast("long").as("distinct_count")) ++
      qCols
    val out = state.groupBy(keyCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val n = out.count()
    out.write.mode("overwrite").parquet(materializePath)
    n
  }

  /** OR-of-ANDs partition predicate (null-safe) — the disjunctive
    * shape partition pruning understands at the file listing. */
  private def partPredicate(parts: Seq[Row]): Column =
    parts.map { r =>
      partCols.zipWithIndex.map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)

  /**
   * Fold every commit since the last reflected version into the sketch
   * state and re-materialize. Append-only deltas merge; deltas with
   * retractions rebuild exactly the retraction-touched partitions from
   * the head. No-op when the head hasn't advanced (version gate).
   */
  def refreshIncremental(trigger: String = "manual"): Option[RefreshEvent] = synchronized {
    val head = store.latestVersion(spark).getOrElse(return None)
    val t0 = System.nanoTime()
    lastRebuildFiles = Nil
    val (state, kind) = readState() match {
      case Some((_, v)) if v == head => return None
      case Some((prev, v)) =>
        val (adds, rets) = store.deltaBetween(spark, v, head)
        if (partCols.isEmpty) {
          // unpartitioned store: retraction → full rebuild; append → merge
          if (rets.isEmpty)
            (mergeState(Seq(prev, profile(adds))), "incremental_merge")
          else {
            val rebuilt = store.read(spark)
            lastRebuildFiles = rebuilt.inputFiles.toSeq
            (profile(rebuilt), "incremental_rebuild")
          }
        } else {
          // distinct partition tuples are bounded by the store's
          // partition layout (calendar/tenant-sized) — the
          // partition-metadata collect idiom
          val retParts = rets.select(partCols.map(col): _*)
            .distinct().collect().toSeq
          if (retParts.isEmpty)
            (mergeState(Seq(prev, profile(adds))), "incremental_merge")
          else {
            val pred = partPredicate(retParts)
            val rebuiltSrc = store.read(spark).where(pred)
            lastRebuildFiles = rebuiltSrc.inputFiles.toSeq
            val carried = prev.where(!coalesce(pred, lit(false)))
            // adds OUTSIDE the rebuilt partitions still merge (one
            // commit can append to one partition and upsert another)
            val outsideAdds = adds.where(!coalesce(pred, lit(false)))
            (mergeState(Seq(carried, profile(rebuiltSrc),
              profile(outsideAdds))), "incremental_rebuild")
          }
        }
      case None =>
        (profile(store.read(spark)), "initial")
    }
    val committed = commitState(state, head)
    val n = materialize(committed)
    val ev = RefreshEvent(Instant.now(), s"${trigger}_$kind", n,
      (System.nanoTime() - t0) / 1000000)
    events += ev
    Some(ev)
  }

  /** The finalized materialization. */
  def query(filter: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(materializePath)
    filter.fold(df)(df.where(_))
  }

  /** Commit-log watch ([[LiveAggTable.startOnSnapshotCommit]] shape). */
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

object LiveSketchAggTable {
  /** Quantile → column name from the FULL quantile value ("p50",
    * "p50_4" for 0.504) so two quantiles can never collide on a
    * rounded integer percent. */
  def quantileColName(q: Double): String = {
    val pct = (BigDecimal(q.toString) * 100).underlying
      .stripTrailingZeros.toPlainString
    "p" + pct.replace(".", "_")
  }
}
