package graft.etl

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * ETL job system: sources → transform → target with schedules,
 * incremental checkpoints and quality gates — the real execution the
 * reference mocks (raise_/transforms/job.py:310-318 "Execute transform
 * (mock implementation)").
 */

// ----------------------------------------------------------------- sources

sealed trait Source {
  def alias: String
  def read(spark: SparkSession): DataFrame
}

/** Object-storage / filesystem scan (source.py:25-203). */
final case class FileSource(
    alias: String, path: String, format: String = "parquet",
    options: Map[String, String] = Map.empty,
    partition: Option[(String, String)] = None, // Hive-style path narrowing
    recursive: Boolean = false) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val p = partition.fold(path) { case (k, v) => s"$path/$k=$v" }
    var r = spark.read.format(format).options(options)
    if (recursive) r = r.option("recursiveFileLookup", "true")
    r.load(p)
  }
}

/** Catalog table with column pruning + filter pushdown (source.py:206-264). */
final case class TableSource(
    alias: String, table: String,
    columns: Seq[String] = Nil, filter: Option[String] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    var df = spark.table(table)
    filter.foreach(f => df = df.where(f))
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    df
  }
}

/** Read from a registered feature group's frame (source.py:267-306). */
final case class FeatureGroupSource(
    alias: String, data: graft.meta.FeatureGroupData,
    features: Seq[String] = Nil, filter: Option[String] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    var df = data.frame
    filter.foreach(f => df = df.where(f))
    if (features.nonEmpty) df = df.select(features.map(col): _*)
    df
  }
}

/** JDBC (source.py:309-348). */
final case class JdbcSource(
    alias: String, url: String, table: String,
    properties: Map[String, String] = Map.empty) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(url, table, props)
  }
}

// ------------------------------------------------------------- transforms

final case class TransformContext(
    jobId: String,
    runId: String,
    executionDate: Instant,
    isIncremental: Boolean,
    checkpointValue: Option[String],
    params: Map[String, String] = Map.empty) {
  private val metrics = scala.collection.mutable.Map.empty[String, Double]
  def logMetric(name: String, value: Double): Unit = metrics(name) = value
  def loggedMetrics: Map[String, Double] = metrics.toMap
}

sealed trait Transform {
  def apply(spark: SparkSession, ctx: TransformContext,
      sources: Map[String, DataFrame]): DataFrame
}

/**
 * SQL over named source views with `{{checkpoint}}`, `{{execution_date}}`,
 * `{{run_id}}`, `{{param:NAME}}` substitution (transform.py:97-175).
 * Substituted values are SQL-literal-formatted; a missing checkpoint
 * becomes the epoch so first runs read everything.
 */
final case class SqlTransform(sql: String) extends Transform {

  def materialize(ctx: TransformContext): String = {
    val cp = ctx.checkpointValue.getOrElse("1970-01-01 00:00:00")
    var out = sql
      .replace("{{checkpoint}}", s"TIMESTAMP '$cp'")
      .replace("{{execution_date}}",
        s"TIMESTAMP '${java.sql.Timestamp.from(ctx.executionDate).toString.stripSuffix(".0")}'")
      .replace("{{run_id}}", s"'${ctx.runId}'")
    ctx.params.foreach { case (k, v) =>
      out = out.replace(s"{{param:$k}}", s"'$v'")
    }
    out
  }

  def apply(spark: SparkSession, ctx: TransformContext,
      sources: Map[String, DataFrame]): DataFrame = {
    sources.foreach { case (alias, df) => df.createOrReplaceTempView(alias) }
    spark.sql(materialize(ctx))
  }
}

/** Arbitrary Scala transform (PythonTransform analog; transform.py:182-251). */
final case class FnTransform(
    fn: (TransformContext, Map[String, DataFrame]) => DataFrame) extends Transform {
  def apply(spark: SparkSession, ctx: TransformContext,
      sources: Map[String, DataFrame]): DataFrame = fn(ctx, sources)
}

/** SQL then function post-processing (transform.py:254-304). */
final case class HybridTransform(
    sql: SqlTransform,
    post: (TransformContext, DataFrame) => DataFrame) extends Transform {
  def apply(spark: SparkSession, ctx: TransformContext,
      sources: Map[String, DataFrame]): DataFrame =
    post(ctx, sql(spark, ctx, sources))
}

// ------------------------------------------------- incremental / checkpoints

sealed trait WriteMode
object WriteMode {
  case object Full extends WriteMode        // overwrite recompute
  case object Incremental extends WriteMode // cursor-filtered overwrite-partition
  case object Append extends WriteMode
  case object Upsert extends WriteMode      // merge on key columns
}

final case class IncrementalConfig(
    mode: WriteMode,
    checkpointColumn: Option[String] = None,
    keyColumns: Seq[String] = Nil,
    lookback: Option[String] = None) // duration string, late-data window

object IncrementalConfig {
  def full: IncrementalConfig = IncrementalConfig(WriteMode.Full)
  def incremental(cpCol: String, lookback: Option[String] = None) =
    IncrementalConfig(WriteMode.Incremental, Some(cpCol), Nil, lookback)
  def append(cpCol: String) =
    IncrementalConfig(WriteMode.Append, Some(cpCol))
  def upsert(cpCol: String, keys: Seq[String]) =
    IncrementalConfig(WriteMode.Upsert, Some(cpCol), keys)
}

/** Durable checkpoint cursor (checkpoint.py:32-148), JSON-file-backed. */
final class CheckpointStore(dir: String) {
  private def file(jobId: String) =
    java.nio.file.Paths.get(dir, s"$jobId.checkpoint")

  def get(jobId: String): Option[String] = {
    val f = file(jobId)
    if (java.nio.file.Files.exists(f))
      Some(java.nio.file.Files.readString(f).trim).filter(_.nonEmpty)
    else None
  }

  /** advance-only: a checkpoint never moves backwards (checkpoint.py:55-58). */
  def advance(jobId: String, value: String): Unit = {
    val cur = get(jobId)
    if (cur.forall(_ < value)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(file(jobId), value)
    }
  }

  def reset(jobId: String): Unit =
    java.nio.file.Files.deleteIfExists(file(jobId))
}

// ----------------------------------------------------------------- target

/**
 * Parquet-directory target with append / overwrite / upsert semantics.
 * Upsert = read-union-window-dedup-rewrite (Delta is not on this
 * classpath; with Delta this becomes MERGE INTO on the key columns —
 * transforms/job.py:41-71 semantics either way).
 *
 * With `partitionBy` set, upsert is PARTITION-SCOPED: only partitions
 * present in the incoming batch are read, merged, and rewritten; every
 * other partition's files are left untouched. That turns the O(table)
 * merge into O(affected partitions) per batch — the non-Delta analog of
 * MERGE's file-level pruning.
 *
 * Concurrency stance: the staged-swap protocol assumes EXACTLY ONE
 * writer per target path — two concurrent upserts could interleave
 * each other's stage/commit steps. Every write therefore takes a
 * best-effort create-exclusive `_WRITER_LOCK` beside the table and a
 * second writer FAILS FAST instead of corrupting a commit; a lock
 * older than `lockTimeoutMs` is presumed crashed and taken over.
 * Create-exclusive is atomic on HDFS/local filesystems; the age-based
 * takeover race is not — this is a guard against accidental
 * double-scheduling, not a coordination service (real multi-writer
 * tables belong to a transactional format; the reference delegates the
 * same way — raise_/transforms/job.py:41-71 rewrites via MERGE).
 *
 * Crash safety (single writer): the merge result is STAGED durably at
 * `<path>.staged` first — the target is not touched until staging
 * completes, so a failure anywhere up to the commit point leaves the
 * table at its exact pre-upsert state. Commit then writes a
 * `_COMMIT_READY` marker and swaps directories in (whole table, or per
 * affected leaf partition) via filesystem renames. A crash mid-commit
 * is ROLLED FORWARD by the next write: the marker proves the staged
 * data is complete, so recovery finishes the remaining renames —
 * idempotent because each completed rename removes its source from the
 * staged dir. No state leaves a partition half-rewritten.
 */
object ParquetTarget {
  /** Test seam: invoked after the merge result is durably staged but
    * before the commit marker — the "crash between stage and commit"
    * window a transactional upsert must tolerate. */
  private[graft] var stageFailpoint: () => Unit = () => ()
}

final case class ParquetTarget(path: String, orderColumn: Option[String] = None,
    partitionBy: Seq[String] = Nil, lockTimeoutMs: Long = 30 * 60 * 1000L) {

  private def lockPath = new org.apache.hadoop.fs.Path(path + "._WRITER_LOCK")

  /** Best-effort single-writer guard (see the class doc's concurrency
    * stance). Held for the write's duration; released on ANY exit —
    * a thrown write is a finished writer. A process crash leaves the
    * lock behind; the age takeover reclaims it. */
  private def withWriterLock[T](hFs: org.apache.hadoop.fs.FileSystem)(
      body: => T): T = {
    def tryAcquire(): Boolean =
      try { hFs.create(lockPath, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val age =
        try System.currentTimeMillis() -
          hFs.getFileStatus(lockPath).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue } // vanished
      if (age <= lockTimeoutMs)
        throw new java.io.IOException(s"$path: another writer holds " +
          s"_WRITER_LOCK (age ${age} ms ≤ timeout $lockTimeoutMs ms); " +
          "the staged-swap target is single-writer")
      hFs.delete(lockPath, false) // presumed crashed — age-based takeover
      if (!tryAcquire())
        throw new java.io.IOException(
          s"$path: lost the _WRITER_LOCK takeover race to another writer")
    }
    try body finally hFs.delete(lockPath, false)
  }

  private def writer(df: DataFrame) = {
    val w = df.write
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }

  /** One predicate per affected partition tuple (driver-side list — a few
    * partition values per batch, never row data). */
  private def affectedPredicate(df: DataFrame): Column = {
    val parts = df.select(partitionBy.map(col): _*).distinct().collect()
    parts.map { r =>
      partitionBy.zipWithIndex.map { case (c, i) =>
        if (r.isNullAt(i)) col(c).isNull else col(c) === lit(r.get(i))
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
  }

  private def hadoopFs(df: DataFrame): org.apache.hadoop.fs.FileSystem =
    // resolve the filesystem FROM the path — java.io.File would say
    // "missing" for any object-store URI and truncate the table
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** Row-count observation riding the write action itself (CollectMetrics
    * accumulators) — the previous `df.count()` re-executed the caller's
    * whole pipeline once per write just to report a number. */
  private def writeCounted(df: DataFrame)(
      run: DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    run(df.observe(obs, count(lit(1)).as("rows")))
    // the write action has completed, so the observation resolves (the
    // await covers only the short listener-dispatch window). A zero-row
    // write can fold the observed subtree to an empty relation whose
    // metrics Row arrives schemaless/empty — that specific shape IS the
    // zero count; any other failure propagates rather than silently
    // reporting rowsWritten=0.
    val row = scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration.Inf)
    if (row.schema == null || row.length == 0) 0L
    else row.getAs[Long]("rows")
  }

  def write(df: DataFrame, mode: WriteMode, keys: Seq[String] = Nil): Long =
    withWriterLock(hadoopFs(df)) { writeLocked(df, mode, keys) }

  private def writeLocked(df: DataFrame, mode: WriteMode,
      keys: Seq[String]): Long =
    mode match {
      case WriteMode.Full | WriteMode.Incremental =>
        // a full rewrite SUPERSEDES any pending upsert commit: discard a
        // crashed upsert's stage/marker/backup first — leaving the marker
        // behind would make a later upsert roll the STALE pre-crash merge
        // forward over this write's data
        invalidateStage(hadoopFs(df))
        // pin STATIC per-write: a Full rewrite must truncate the whole
        // table even when the session default is dynamic (GraftSession
        // sets partitionOverwriteMode=dynamic session-wide for upsert) —
        // dynamic would silently retain stale partitions absent from the
        // batch. The Upsert path pins "dynamic" per-write symmetrically.
        writeCounted(df) { d =>
          writer(d).mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .parquet(path)
        }
      case WriteMode.Append =>
        // bring the table to a consistent post-upsert state before
        // appending (roll an interrupted commit forward, drop stale stage)
        recoverOrClean(hadoopFs(df))
        writeCounted(df)(d => writer(d).mode("append").parquet(path))
      case WriteMode.Upsert =>
        require(keys.nonEmpty, "upsert requires key columns")
        val spark = df.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(path)
        val hFs = hadoopFs(df)
        recoverOrClean(hFs) // finish an interrupted commit first
        val exists = hFs.exists(hPath)
        if (!exists)
          writeCounted(df)(d => writer(d).mode("overwrite").parquet(path))
        else {
          val ord = orderColumn.getOrElse(keys.head)
          // partition-scoped: read ONLY the batch's partitions (the isin
          // predicate prunes at the file listing, no full-table scan).
          // The read uses the BATCH's schema explicitly: directory-name
          // type inference would otherwise mangle partition values
          // (string "01" → int 1 → cast-back "1"), making the predicate
          // miss the partition and the rewrite drop its other rows.
          val current =
            if (partitionBy.isEmpty) spark.read.parquet(path)
            else spark.read.schema(df.schema).parquet(path)
              .where(affectedPredicate(df))
          // new rows win ties: tag precedence, window-dedup per key
          val merged = current.withColumn("__prec", lit(0))
            .unionByName(df.withColumn("__prec", lit(1)))
          val w = Window.partitionBy(keys.map(col): _*)
            .orderBy(col("__prec").desc, col(ord).desc)
          val deduped = merged
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1)
            .drop("__prec", "__rn")
          // STAGE: merge result lands beside the target; the table is
          // untouched until the stage is durably complete. Written count
          // = rows physically written (the merged partitions), observed
          // on the staging write itself.
          val staged = stagedPath
          hFs.delete(staged, true)
          val n = writeCounted(deduped)(d =>
            writer(d).mode("overwrite").parquet(staged.toString))
          ParquetTarget.stageFailpoint()
          // COMMIT: marker proves the stage is complete, then swap in
          hFs.create(new org.apache.hadoop.fs.Path(staged, "_COMMIT_READY"),
            true).close()
          commitStaged(hFs)
          n
        }
    }

  private def stagedPath = new org.apache.hadoop.fs.Path(path + ".staged")
  private def backupPath = new org.apache.hadoop.fs.Path(path + ".backup")

  /** `FileSystem.rename` signals failure by RETURNING false (permissions,
    * missing parent, dst anomalies, store-specific limits) — falling
    * through would let the commit delete the only surviving copy of the
    * data. Throw instead: the marker and staged dir stay in place, so the
    * next write retries the commit idempotently. */
  private def renameOrThrow(hFs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!hFs.rename(src, dst))
      throw new java.io.IOException(s"upsert commit: rename $src -> $dst failed")

  /** Discard any pending upsert stage/marker/backup — used by Full/
    * Incremental rewrites, which supersede an interrupted upsert. */
  private def invalidateStage(hFs: org.apache.hadoop.fs.FileSystem): Unit = {
    hFs.delete(stagedPath, true)
    hFs.delete(backupPath, true)
    hFs.delete(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), "_COMMIT_READY"), false)
  }

  /** Roll forward an interrupted commit (marker present ⇒ staged data is
    * complete), discard a stage that never reached its commit point, and
    * drop leftovers of completed commits. Called before every upsert. */
  private def recoverOrClean(hFs: org.apache.hadoop.fs.FileSystem): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val marker = new org.apache.hadoop.fs.Path(stagedPath, "_COMMIT_READY")
    if (hFs.exists(stagedPath)) {
      if (hFs.exists(marker)) commitStaged(hFs)
      else hFs.delete(stagedPath, true) // pre-commit crash: discard stage
    }
    // whole-table swap can crash between the final rename and the marker
    // delete — the marker travels with the data, remove it at the target
    hFs.delete(new org.apache.hadoop.fs.Path(hPath, "_COMMIT_READY"), false)
    hFs.delete(backupPath, true) // stale backup of a completed commit
  }

  /** Relative leaf-partition dirs (one per partitionBy tuple) under
    * `root` — exactly `partitionBy.length` levels of `k=v` dirs. */
  private def leafPartitionRels(hFs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] = {
    def walk(p: org.apache.hadoop.fs.Path, depth: Int, rel: String): Seq[String] =
      if (depth == 0) Seq(rel)
      else hFs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => walk(s.getPath, depth - 1,
          if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"))
    walk(root, partitionBy.length, "")
  }

  /** Swap staged data into the target via renames (atomic per rename on
    * HDFS/local filesystems). Idempotent: a completed rename removes its
    * source from the staged dir, so a re-run after a crash only touches
    * the remaining leaves. */
  private def commitStaged(hFs: org.apache.hadoop.fs.FileSystem): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val staged = stagedPath
    val backup = backupPath
    if (partitionBy.isEmpty) {
      // whole-table swap: current → backup, staged → current
      if (hFs.exists(hPath)) {
        hFs.delete(backup, true)
        renameOrThrow(hFs, hPath, backup)
      }
      renameOrThrow(hFs, staged, hPath)
      hFs.delete(new org.apache.hadoop.fs.Path(hPath, "_COMMIT_READY"), false)
      hFs.delete(backup, true)
    } else {
      for (rel <- leafPartitionRels(hFs, staged)) {
        val src = new org.apache.hadoop.fs.Path(staged, rel)
        val tgt = new org.apache.hadoop.fs.Path(hPath, rel)
        val bak = new org.apache.hadoop.fs.Path(backup, rel)
        if (hFs.exists(tgt)) {
          if (!hFs.exists(bak)) {
            hFs.mkdirs(bak.getParent)
            renameOrThrow(hFs, tgt, bak)
          } else hFs.delete(tgt, true) // half-moved remnant; backup wins
        }
        hFs.mkdirs(tgt.getParent)
        renameOrThrow(hFs, src, tgt)
      }
      hFs.delete(staged, true) // removes marker + _SUCCESS
      hFs.delete(backup, true)
    }
  }
}

// ------------------------------------------------------------------- jobs

final case class Schedule(kind: String, cron: Option[String] = None)
object Schedule {
  def manual: Schedule = Schedule("manual")
  def hourly: Schedule = Schedule("hourly")
  def daily: Schedule = Schedule("daily")
  def cron(expr: String): Schedule = Schedule("cron", Some(expr))
}

sealed trait JobStatus
object JobStatus {
  case object Draft extends JobStatus
  case object Active extends JobStatus
  case object Paused extends JobStatus
  case object Failed extends JobStatus
  case object Deprecated extends JobStatus
}

final case class JobRun(
    runId: String,
    executionDate: Instant,
    state: String, // pending/running/success/failed/cancelled/skipped
    rowsRead: Long = 0,
    rowsWritten: Long = 0,
    durationMs: Long = 0,
    error: Option[String] = None,
    qualityReport: Option[QualityReport] = None)

/**
 * Job: sources → transform → quality checks → target → checkpoint advance
 * (transforms/job.py:21-343, with the mock at :310-318 replaced by real
 * Spark execution).
 */
final class Job(
    val jobId: String,
    val sources: Seq[Source],
    val transform: Transform,
    val target: ParquetTarget,
    val incremental: IncrementalConfig = IncrementalConfig.full,
    val qualityChecks: Seq[QualityCheck] = Nil,
    val schedule: Schedule = Schedule.manual,
    val checkpoints: CheckpointStore,
    val maxRetries: Int = 0) {

  var status: JobStatus = JobStatus.Draft
  private val runs = scala.collection.mutable.ArrayBuffer.empty[JobRun]

  def activate(): Unit = {
    require(sources.nonEmpty, "job needs at least one source")
    if (incremental.mode != WriteMode.Full)
      require(incremental.checkpointColumn.isDefined,
        "incremental job needs a checkpoint column")
    status = JobStatus.Active
  }

  def pause(): Unit = { status = JobStatus.Paused }
  def runHistory: Seq[JobRun] = runs.toSeq
  def resetCheckpoint(): Unit = checkpoints.reset(jobId)

  def run(spark: SparkSession,
      executionDate: Instant = Instant.now()): JobRun = {
    require(status == JobStatus.Active, s"job not active: $status")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val t0 = System.nanoTime()
    val cp = checkpoints.get(jobId)
    val ctx = TransformContext(jobId, runId, executionDate,
      incremental.mode != WriteMode.Full, cp)
    // SINGLE-PASS RUN: the pipeline (source scans + transform) executes
    // ONCE per run. rowsRead rides each source frame as an observation
    // (CollectMetrics accumulators — no dedicated count() scan), the
    // checkpoint high-water max rides the quality gate's one aggregation
    // pass, the write reports its own row count the same way, and the
    // transform output is persisted so the gate and the write share one
    // pipeline execution. At 100 TB the previous shape (count per source
    // + gate + write-count + checkpoint max, nothing persisted) re-ran
    // the full scan+join+shuffle pipeline 4+ times per run.
    def attempt(): JobRun = {
      // read sources, applying the incremental cursor (+ lookback) on the
      // checkpoint column — the predicate lands in the scan via pushdown.
      // The observation sits ABOVE the cursor filter: rowsRead = rows
      // entering the transform (same as the count() it replaces), and a
      // CollectMetrics node below the filter would block predicate
      // pushdown into the scan.
      val srcObs = sources.map(s =>
        s.alias -> org.apache.spark.sql.Observation()).toMap
      val frames: Map[String, DataFrame] = sources.map { s =>
        var df = s.read(spark)
        for {
          cpCol <- incremental.checkpointColumn
          if incremental.mode != WriteMode.Full
          if df.columns.contains(cpCol)
          cpVal <- cp
        } {
          val cursor = lit(cpVal).cast(df.schema(cpCol).dataType)
          val bound = incremental.lookback.fold(cursor)(lb =>
            cursor - graft.analysis.AnalysisPlanner.durationToInterval(lb))
          df = df.where(col(cpCol) > bound)
        }
        s.alias -> df.observe(srcObs(s.alias), count(lit(1)).as("rows"))
      }.toMap
      val out = transform(spark, ctx, frames)
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // checkpoint high-water mark folded into the quality gate's
        // single aggregation job
        val cpCol = incremental.checkpointColumn.filter(c =>
          incremental.mode != WriteMode.Full && out.columns.contains(c))
        val cpAgg = cpCol.map(c =>
          max(col(c)).cast("string").as("__graft_cp_hi")).toSeq
        val (report, aggRow) =
          QualityCheck.runAllWith(qualityChecks, out, cpAgg)
        if (report.failed)
          throw new IllegalStateException(
            s"quality checks failed: ${report.failures.map(_.name).mkString(", ")}")

        val written = target.write(out, incremental.mode, incremental.keyColumns)

        // advance cursor to the batch high-water mark (computed above)
        for {
          _ <- cpCol
          row <- aggRow
          hi <- Option(row.getAs[String]("__graft_cp_hi"))
        } checkpoints.advance(jobId, hi)

        val rowsRead = sources.iterator
          .map(s => observedRows(srcObs(s.alias))).sum
        JobRun(runId, executionDate, "success", rowsRead, written,
          (System.nanoTime() - t0) / 1000000, None, Some(report))
      } finally out.unpersist(false)
    }

    // The write (and any gate aggregation before it) has completed, so
    // consumed sources resolve immediately — but Observation completion
    // arrives via an async listener, and a source the transform never
    // consumed NEVER resolves: poll briefly instead of a blocking get.
    def observedRows(o: org.apache.spark.sql.Observation): Long = {
      var tries = 0
      while (tries < 10) { // getOrEmpty itself waits up to ~100 ms
        org.apache.spark.sql.GraftShims.observedOrEmpty(o).get("rows") match {
          case Some(n: java.lang.Long) => return n
          case _ => tries += 1
        }
      }
      0L
    }

    var attemptN = 0
    var result: JobRun = null
    while (result == null) {
      try result = attempt()
      catch {
        case e: Throwable if attemptN < maxRetries =>
          attemptN += 1
        case e: Throwable =>
          result = JobRun(runId, executionDate, "failed", 0, 0,
            (System.nanoTime() - t0) / 1000000, Some(e.getMessage))
          status = JobStatus.Failed
      }
    }
    runs += result
    result
  }
}
