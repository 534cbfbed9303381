package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Versioned parquet table store with snapshot isolation, time travel
 * and rollback — the offline-implementable slice of a transactional
 * table format (Delta/Iceberg connector jars are absent from this
 * environment; the reference delegates upserts to engine MERGE the
 * same way, raise_/transforms/job.py:41-71, and its format surface
 * raise_/transforms/source.py:76-154 lists delta/iceberg as storage
 * options this store stands in for).
 *
 * Layout:
 * {{{
 *   <path>/_log/v00000001.list    one commit file per version
 *   <path>/data/<writeDir>/       immutable parquet data directories
 * }}}
 *
 * The COMMIT POINT is the create-exclusive write of the version's log
 * file. Data lands in a fresh write directory first — invisible to
 * every reader — and the log entry (a manifest of data directories,
 * each with an optional partition-tuple exclusion predicate) becomes
 * visible atomically or not at all. A crash before the log write
 * leaves an orphan data dir no reader ever sees ([[vacuum]] collects
 * them); a crash after it IS a completed commit. There is no rename
 * dance and nothing is ever rewritten in place, so every prior
 * version stays readable until vacuumed.
 *
 * Scale design: an upsert rewrites ONLY the affected partitions' rows
 * into the new write dir (the batch's partition tuples — a bounded
 * driver-side list, never row data) and carries every untouched
 * partition BY REFERENCE: the prior segments ride into the new
 * manifest with the affected tuples appended to their exclusion
 * predicate. Readers apply exclusions as partition-column predicates,
 * which prune at the file listing — a 100 TB table whose daily upsert
 * touches one partition re-reads and rewrites one partition, exactly
 * the Delta/Iceberg contract. Version manifests are KB-sized text
 * files; the log is listed once per read (one filesystem listing, no
 * data scan). Long-lived tables fold accumulated segments back to one
 * with a Full rewrite (or [[etl.Compaction]] on the read frame), and
 * [[vacuum]] bounds disk growth by retiring versions.
 *
 * Concurrency: same single-writer stance as [[ParquetTarget]] — a
 * best-effort create-exclusive `_WRITER_LOCK` with age-based takeover
 * guards against accidental double-scheduling; the create-exclusive
 * log commit is a second, hard guard (two racing writers cannot both
 * commit the same version number — the loser's data dir is orphaned,
 * never half-merged).
 *
 * Schema is pinned per version (the batch schema's JSON rides in the
 * log entry): older segments read under a newer version's schema
 * surface newly added columns as NULL — parquet schema-on-read.
 */
object SnapshotStore {
  /** Test seam: invoked after the write dir is durably written but
    * before the log-file commit — the crash window snapshot isolation
    * must keep invisible. */
  private[graft] var commitFailpoint: () => Unit = () => ()

  private val LogDirName = "_log"
  private val DataDirName = "data"

  private def versionFileName(v: Long): String = f"v$v%08d.list"

  /** Max columns stats are collected for (the Delta
    * dataSkippingNumIndexedCols default) — stats lines stay KB-sized
    * however wide the table is. */
  private[etl] val StatsMaxColumns = 32
}

/**
 * Segment-level min/max data skipping (the Delta/Iceberg file-stats
 * analog): each committed segment carries per-column (min, max) of its
 * non-null values in the version manifest, and a selective read
 * refutes whole segments against the conjunctive structure of the
 * pushed predicate BEFORE any file listing — at 100 TB the difference
 * between scanning every segment a long append chain accumulated and
 * touching only the ones whose range can match.
 *
 * Soundness: stats cover non-null values only, which is exactly what
 * predicate comparisons can match (NULL comparisons are never true in
 * a WHERE); exclusion predicates only shrink a segment's live rows, so
 * write-time stats stay a valid over-approximation. Unsupported
 * expression shapes and stat-less columns degrade to "cannot refute"
 * — pruning is best-effort, never unsound.
 *
 * Canonical stat encoding (engine-portable text): `n:<decimal>` for
 * numerics (dates as epoch days, timestamps as epoch micros — the
 * same internal forms Catalyst literals carry), `s:<utf8>` for
 * strings. Non-finite doubles are not recorded (no pruning rather
 * than a lying range).
 */
private[etl] object SegmentStats {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd,
    EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In,
    LessThan, LessThanOrEqual, Literal => CLit, Or => COr}
  import org.apache.spark.sql.types._

  def eligible(f: StructField): Boolean = f.dataType match {
    case _: NumericType | StringType | DateType | TimestampType => true
    case _ => false
  }

  /** Scala-side value (from a collected Row) → canonical stat string. */
  def canon(v: Any): Option[String] = v match {
    case null => None
    case t: java.sql.Timestamp =>
      Some("n:" + (t.getTime * 1000L + (t.getNanos / 1000L) % 1000L))
    case t: java.time.Instant =>
      Some("n:" + (t.getEpochSecond * 1000000L + t.getNano / 1000L))
    case d: java.sql.Date => Some("n:" + d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some("n:" + d.toEpochDay)
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None else Some("n:" + BigDecimal(d))
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None
      else Some("n:" + BigDecimal(f.toDouble))
    case n @ (_: java.lang.Byte | _: java.lang.Short |
              _: java.lang.Integer | _: java.lang.Long) =>
      Some("n:" + BigDecimal(n.toString))
    case b: java.math.BigDecimal => Some("n:" + BigDecimal(b))
    case s: String => Some("s:" + s)
    case _ => None
  }

  /** Catalyst literal (internal form) → canonical stat string. */
  private def canonLit(l: CLit): Option[String] = l.dataType match {
    case _ if l.value == null => None
    case DateType => Some("n:" + BigDecimal(l.value.toString))
    case TimestampType => Some("n:" + BigDecimal(l.value.toString))
    case _: NumericType =>
      val s = l.value.toString
      if (s == "NaN" || s.endsWith("Infinity")) None
      else Some("n:" + BigDecimal(s))
    case StringType => Some("s:" + l.value.toString)
    case _ => None
  }

  /** Total order matching Spark's comparison semantics: numeric by
    * value; strings by unsigned UTF-8 byte order (UTF8String's
    * binary collation). None when the two are not comparable. */
  private def cmp(a: String, b: String): Option[Int] =
    if (a.startsWith("n:") && b.startsWith("n:"))
      scala.util.Try(
        BigDecimal(a.drop(2)).compare(BigDecimal(b.drop(2)))).toOption
    else if (a.startsWith("s:") && b.startsWith("s:")) {
      val x = a.drop(2).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.drop(2).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return Some(d)
        i += 1
      }
      Some(x.length - y.length)
    } else None

  /** True iff `pred` is PROVABLY false for every row of a segment
    * whose per-column ranges are `stats` (col → (min, max), canonical
    * encoding, matched case-insensitively like Spark's resolver). */
  def provablyEmpty(pred: Expression,
      stats: Map[String, (String, String)]): Boolean = {
    val byLower = stats.map { case (k, v) => (k.toLowerCase, v) }
    def range(a: UnresolvedAttribute): Option[(String, String)] =
      if (a.nameParts.length != 1) None
      else byLower.get(a.nameParts.head.toLowerCase)
    def outside(a: UnresolvedAttribute, l: CLit): Boolean =
      (range(a), canonLit(l)) match {
        case (Some((lo, hi)), Some(v)) =>
          cmp(v, lo).exists(_ < 0) || cmp(v, hi).exists(_ > 0)
        case _ => false
      }
    def refute(e: Expression): Boolean = e match {
      case CAnd(a, b) => refute(a) || refute(b)
      case COr(a, b) => refute(a) && refute(b)
      case EqualTo(a: UnresolvedAttribute, l: CLit) => outside(a, l)
      case EqualTo(l: CLit, a: UnresolvedAttribute) => outside(a, l)
      case GreaterThan(a: UnresolvedAttribute, l: CLit) => // col > v
        (range(a), canonLit(l)) match {
          case (Some((_, hi)), Some(v)) => cmp(hi, v).exists(_ <= 0)
          case _ => false
        }
      case GreaterThan(l: CLit, a: UnresolvedAttribute) => // v > col
        refute(LessThan(a, l))
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: CLit) =>
        (range(a), canonLit(l)) match {
          case (Some((_, hi)), Some(v)) => cmp(hi, v).exists(_ < 0)
          case _ => false
        }
      case GreaterThanOrEqual(l: CLit, a: UnresolvedAttribute) =>
        refute(LessThanOrEqual(a, l))
      case LessThan(a: UnresolvedAttribute, l: CLit) => // col < v
        (range(a), canonLit(l)) match {
          case (Some((lo, _)), Some(v)) => cmp(lo, v).exists(_ >= 0)
          case _ => false
        }
      case LessThan(l: CLit, a: UnresolvedAttribute) =>
        refute(GreaterThan(a, l))
      case LessThanOrEqual(a: UnresolvedAttribute, l: CLit) =>
        (range(a), canonLit(l)) match {
          case (Some((lo, _)), Some(v)) => cmp(lo, v).exists(_ > 0)
          case _ => false
        }
      case LessThanOrEqual(l: CLit, a: UnresolvedAttribute) =>
        refute(GreaterThanOrEqual(a, l))
      case In(a: UnresolvedAttribute, vs)
          if vs.forall(_.isInstanceOf[CLit]) =>
        vs.nonEmpty &&
          vs.forall(v => outside(a, v.asInstanceOf[CLit]))
      case _ => false // unsupported shape: cannot refute
    }
    refute(pred)
  }
}

final case class SnapshotStore(path: String,
    orderColumn: Option[String] = None,
    partitionBy: Seq[String] = Nil,
    lockTimeoutMs: Long = 30 * 60 * 1000L) {
  import SnapshotStore._
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def root = new HPath(path)
  private def logDir = new HPath(root, LogDirName)
  private def dataRoot = new HPath(root, DataDirName)
  private def lockPath = new HPath(path + "._WRITER_LOCK")

  /** One manifest segment: a data dir plus the SQL predicate selecting
    * rows SUPERSEDED by later versions (None = whole dir live). */
  private[etl] final case class Segment(dir: String, excluded: Option[String])
  /** `stats`: dir → column → (min, max) in [[SegmentStats]] canonical
    * encoding; carried segments keep the stats recorded when their dir
    * was first written. Old manifests without stat lines parse to an
    * empty map (no pruning — never an error). */
  private[etl] final case class Commit(version: Long, tsMillis: Long,
      op: String, schemaJson: String, segments: Seq[Segment],
      stats: Map[String, Map[String, (String, String)]] = Map.empty)

  // ----------------------------------------------------------- log I/O

  private def fs(spark: SparkSession): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listVersions(hFs: FileSystem): Seq[Long] =
    if (!hFs.exists(logDir)) Nil
    else hFs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".list"))
      .map(n => n.stripPrefix("v").stripSuffix(".list").toLong)
      .sorted

  private def readCommit(hFs: FileSystem, v: Long): Commit = {
    val p = new HPath(logDir, versionFileName(v))
    val in = hFs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split('\n').toSeq.filter(_.nonEmpty)
    def field(k: String): String = lines
      .find(_.startsWith(k + "="))
      .getOrElse(throw new java.io.IOException(
        s"snapshot log $p: missing field $k"))
      .substring(k.length + 1)
    val segs = lines.filter(_.startsWith("seg ")).map { l =>
      val body = l.substring(4)
      val sp = body.indexOf(' ')
      if (sp < 0) Segment(body, None)
      else Segment(body.substring(0, sp), Some(body.substring(sp + 1)))
    }
    def dec(s: String): String =
      java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)
    val stats = lines.filter(_.startsWith("stat "))
      .map(_.substring(5).split(' '))
      .collect { case Array(dir, c, lo, hi) =>
        (dir, dec(c), dec(lo), dec(hi)) }
      .groupBy(_._1)
      .map { case (dir, rows) =>
        dir -> rows.map(r => r._2 -> (r._3, r._4)).toMap }
    Commit(field("version").toLong, field("ts").toLong, field("op"),
      field("schema"), segs, stats)
  }

  /** The commit file is written create-exclusive: it either fully
    * exists with this content or does not exist — the atomic commit
    * point. A loser of a same-version race gets FileAlreadyExists. */
  private def writeCommit(hFs: FileSystem, c: Commit): Unit = {
    hFs.mkdirs(logDir)
    require(c.segments.forall(s => !s.dir.contains(' ') &&
      !s.dir.contains('\n')), "segment dir names must be space-free")
    val body = new StringBuilder()
      .append("version=").append(c.version).append('\n')
      .append("ts=").append(c.tsMillis).append('\n')
      .append("op=").append(c.op).append('\n')
      .append("schema=").append(c.schemaJson).append('\n')
    c.segments.foreach { s =>
      body.append("seg ").append(s.dir)
      s.excluded.foreach(e => body.append(' ')
        .append(e.replace('\n', ' ')))
      body.append('\n')
    }
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
    // stat lines only for dirs the manifest references
    val live = c.segments.map(_.dir).toSet
    c.stats.toSeq.sortBy(_._1).foreach { case (dir, cols) =>
      if (live(dir)) cols.toSeq.sortBy(_._1).foreach {
        case (cn, (lo, hi)) =>
          body.append("stat ").append(dir).append(' ').append(enc(cn))
            .append(' ').append(enc(lo)).append(' ').append(enc(hi))
            .append('\n')
      }
    }
    val out = hFs.create(new HPath(logDir, versionFileName(c.version)), false)
    try out.write(body.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ------------------------------------------------------------- reads

  /** The commit-log directory as a path. The log IS the store's change
    * signal: each committed version writes exactly ONE new file here
    * (the create-exclusive commit point), so a file stream over this
    * directory yields one record batch per commit — no data-dir
    * listing, no polling of row data. [[live.LiveTable.startOnSnapshotCommit]]
    * uses it to refresh materializations from store commits. */
  def commitLogPath: String = logDir.toString

  def latestVersion(spark: SparkSession): Option[Long] =
    listVersions(fs(spark)).lastOption

  /** Latest committed snapshot (empty frame with the latest schema if
    * the store has no commits yet is an error — read a created store). */
  def read(spark: SparkSession): DataFrame =
    readVersion(spark, latestVersion(spark).getOrElse(
      throw new java.io.IOException(s"snapshot store $path: no commits")))

  /** Time travel: the table exactly as committed at `version`. */
  def readVersion(spark: SparkSession, version: Long): DataFrame = {
    val c = readCommit(fs(spark), version)
    assemble(spark, c, c.segments)
  }

  private def assemble(spark: SparkSession, c: Commit,
      segs0: Seq[Segment]): DataFrame = {
    val schema = DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
    if (segs0.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val segs = segs0.map { s =>
      val df = spark.read.schema(schema)
        .parquet(new HPath(dataRoot, s.dir).toString)
      s.excluded.fold(df)(e => df.where(!expr(e)))
    }
    segs.reduceLeft(_.unionByName(_))
  }

  /**
   * Selective read with segment-level data skipping: semantically
   * identical to `read(spark).where(predicateSql)`, but every segment
   * whose manifest (min, max) stats REFUTE the predicate is dropped
   * before any file is listed or scanned — the [[SegmentStats]]
   * contract. A long append/upsert chain with clustered writes (time
   * ranges, id ranges, tenants) then reads only the matching segments;
   * parquet row-group pushdown still applies inside survivors.
   * `version` targets time travel (default: latest head).
   */
  def readWhere(spark: SparkSession, predicateSql: String,
      version: Option[Long] = None): DataFrame = {
    val hFs = fs(spark)
    val v = version.orElse(listVersions(hFs).lastOption).getOrElse(
      throw new java.io.IOException(s"snapshot store $path: no commits"))
    val c = readCommit(hFs, v)
    val pred = spark.sessionState.sqlParser.parseExpression(predicateSql)
    val keep = c.segments.filterNot(s =>
      SegmentStats.provablyEmpty(pred,
        c.stats.getOrElse(s.dir, Map.empty)))
    assemble(spark, c, keep).where(expr(predicateSql))
  }

  /** The latest snapshot committed at or before epoch-millis `ts`. */
  def asOf(spark: SparkSession, tsMillis: Long): DataFrame = {
    val hFs = fs(spark)
    val v = listVersions(hFs)
      .takeWhile(v => readCommit(hFs, v).tsMillis <= tsMillis).lastOption
      .getOrElse(throw new java.io.IOException(
        s"snapshot store $path: no commit at or before $tsMillis"))
    readVersion(spark, v)
  }

  /** Commit history as a DataFrame: (version, ts_millis, op,
    * n_segments) — KB-sized, derived from the log listing only. */
  def history(spark: SparkSession): DataFrame = {
    val hFs = fs(spark)
    import spark.implicits._
    listVersions(hFs).map(readCommit(hFs, _))
      .map(c => (c.version, c.tsMillis, c.op, c.segments.size))
      .toDF("version", "ts_millis", "op", "n_segments")
  }

  // ------------------------------------------------------------ writes

  private def withWriterLock[T](hFs: FileSystem)(body: => T): T = {
    def tryAcquire(): Boolean =
      try { hFs.mkdirs(root); hFs.create(lockPath, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val age =
        try System.currentTimeMillis() -
          hFs.getFileStatus(lockPath).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue }
      if (age <= lockTimeoutMs)
        throw new java.io.IOException(s"$path: another writer holds " +
          s"_WRITER_LOCK (age $age ms ≤ timeout $lockTimeoutMs ms)")
      hFs.delete(lockPath, false)
      if (!tryAcquire())
        throw new java.io.IOException(
          s"$path: lost the _WRITER_LOCK takeover race")
    }
    try body finally hFs.delete(lockPath, false)
  }

  private def newWriteDir(nextV: Long): String =
    f"w$nextV%08d-${java.util.UUID.randomUUID().toString.take(8)}"

  private def writeData(df: DataFrame, dir: String): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new HPath(dataRoot, dir).toString)
  }

  /** Per-column (min, max) of a freshly written segment, read back
    * from its own parquet — ONE columnar min/max scan of the NEW files
    * only (the collect-stats-on-write contract; carried segments never
    * re-scan). First [[SnapshotStore.StatsMaxColumns]] eligible
    * columns; an all-null or empty column records nothing. */
  private def collectStats(spark: SparkSession, dir: String,
      schema: StructType): Map[String, (String, String)] = {
    val use = schema.fields.filter(SegmentStats.eligible)
      .take(SnapshotStore.StatsMaxColumns)
    if (use.isEmpty) return Map.empty
    val df = spark.read.schema(schema)
      .parquet(new HPath(dataRoot, dir).toString)
    val aggs = use.zipWithIndex.flatMap { case (f, i) =>
      Seq(min(col(f.name)).as(s"__lo$i"), max(col(f.name)).as(s"__hi$i")) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    use.iterator.zipWithIndex.flatMap { case (f, i) =>
      for (lo <- SegmentStats.canon(row.get(2 * i));
           hi <- SegmentStats.canon(row.get(2 * i + 1)))
        yield f.name -> (lo, hi)
    }.toMap
  }

  /** Stats for a new manifest: freshly collected for `newDir`, carried
    * forward for every by-reference segment. */
  private def statsFor(spark: SparkSession, segments: Seq[Segment],
      newDir: String, schema: StructType,
      priorStats: Map[String, Map[String, (String, String)]])
      : Map[String, Map[String, (String, String)]] =
    segments.map(_.dir).distinct.map { d =>
      d -> (if (d == newDir) collectStats(spark, d, schema)
            else priorStats.getOrElse(d, Map.empty))
    }.filter(_._2.nonEmpty).toMap

  /** Engine-portable SQL for "row is in one of these partition
    * tuples" — values render via Catalyst literal SQL (quoted/escaped),
    * NULL tuples via IS NULL. Bounded: one term per affected tuple. */
  private def tupleSql(tuples: Array[org.apache.spark.sql.Row]): String =
    tuples.map { r =>
      partitionBy.zipWithIndex.map { case (c, i) =>
        if (r.isNullAt(i)) s"($c IS NULL)"
        else s"($c = ${org.apache.spark.sql.catalyst.expressions
          .Literal(r.get(i)).sql})"
      }.mkString("(", " AND ", ")")
    }.mkString("(", " OR ", ")")

  private def affectedSql(df: DataFrame): String = {
    val tuples = df.select(partitionBy.map(col): _*).distinct().collect()
    require(tuples.nonEmpty, "upsert batch has no rows")
    tupleSql(tuples)
  }

  /**
   * Commit `df` as the next version. Full = the new table; Append =
   * prior segments + the batch; Upsert = merge on `keys` (new rows win
   * ties, then by `orderColumn` descending — [[ParquetTarget]]'s
   * dedup contract) touching only the batch's partitions. Returns the
   * committed version number.
   */
  /**
   * Additive schema evolution (the Delta/Iceberg mergeSchema analog):
   * an Append/Upsert batch may carry NEW columns — they join the
   * committed schema, and every pre-evolution segment reads them as
   * NULL (parquet schema projection null-fills absent columns, so no
   * data is rewritten). A batch may also OMIT existing columns (they
   * stay, NULL for the new rows on upsert). Type changes for an
   * existing column fail loud — silent widening corrupts readers.
   */
  private def evolveSchema(prior: Option[StructType],
      batch: StructType): StructType = prior match {
    case None => batch
    case Some(p) =>
      batch.fields.foreach { f =>
        p.fields.find(_.name.equalsIgnoreCase(f.name)).foreach { e =>
          require(e.dataType == f.dataType,
            s"snapshot store $path: column ${f.name} type change " +
              s"${e.dataType.simpleString} -> ${f.dataType.simpleString}" +
              " is not supported; write a Full snapshot to retype")
        }
      }
      StructType(p.fields ++ batch.fields.filterNot(f =>
        p.fields.exists(_.name.equalsIgnoreCase(f.name))))
  }

  def write(df: DataFrame, mode: WriteMode, keys: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val hFs = fs(spark)
    withWriterLock(hFs) {
      val prior = listVersions(hFs).lastOption.map(readCommit(hFs, _))
      val priorSchema = prior.map(c =>
        DataType.fromJson(c.schemaJson).asInstanceOf[StructType])
      val nextV = prior.map(_.version + 1).getOrElse(1L)
      val dir = newWriteDir(nextV)
      val (op, segments, schema) = mode match {
        case WriteMode.Full | WriteMode.Incremental =>
          writeData(df, dir)
          ("full", Seq(Segment(dir, None)), df.schema)
        case WriteMode.Append =>
          writeData(df, dir)
          ("append",
            prior.map(_.segments).getOrElse(Nil) :+ Segment(dir, None),
            evolveSchema(priorSchema, df.schema))
        case WriteMode.Upsert =>
          require(keys.nonEmpty, "upsert requires key columns")
          prior match {
            case None =>
              writeData(df, dir)
              ("upsert", Seq(Segment(dir, None)), df.schema)
            case Some(p) =>
              val evolved = evolveSchema(priorSchema, df.schema)
              val ord = orderColumn.getOrElse(keys.head)
              val (current, carried) =
                if (partitionBy.isEmpty)
                  (readVersion(spark, p.version), Nil)
                else {
                  val aff = affectedSql(df)
                  (readVersion(spark, p.version).where(expr(aff)),
                    p.segments.map(s => s.copy(excluded = Some(
                      s.excluded.fold(aff)(e => s"($e) OR $aff")))))
                }
              val w = Window.partitionBy(keys.map(col): _*)
                .orderBy(col("__prec").desc, col(ord).desc)
              val merged = current.withColumn("__prec", lit(0))
                .unionByName(df.withColumn("__prec", lit(1)),
                  allowMissingColumns = true)
                .withColumn("__rn", row_number().over(w))
                .where(col("__rn") === 1)
                .drop("__prec", "__rn")
              writeData(merged, dir)
              ("upsert", carried :+ Segment(dir, None), evolved)
          }
      }
      SnapshotStore.commitFailpoint()
      writeCommit(hFs, Commit(nextV, System.currentTimeMillis(), op,
        schema.json, segments,
        statsFor(spark, segments, dir, schema,
          prior.map(_.stats).getOrElse(Map.empty))))
      nextV
    }
  }

  /**
   * Predicate DELETE as a new commit — the transactional-format DELETE
   * analog: rows matching `predicateSql` disappear from the new head,
   * every prior version still shows them. Partitioned tables rewrite
   * ONLY the partitions that contain matches (found with one pruned
   * scan; untouched partitions carry by reference exactly as upserts
   * do); a predicate matching nothing commits a no-op version.
   * Returns the committed version.
   */
  def delete(spark: SparkSession, predicateSql: String): Long = {
    val hFs = fs(spark)
    withWriterLock(hFs) {
      val p = listVersions(hFs).lastOption.map(readCommit(hFs, _))
        .getOrElse(throw new java.io.IOException(
          s"snapshot store $path: no commits"))
      val nextV = p.version + 1
      val dir = newWriteDir(nextV)
      val cur = readVersion(spark, p.version)
      val pred = expr(predicateSql)
      val segments =
        if (partitionBy.isEmpty) {
          writeData(cur.where(!pred), dir)
          Seq(Segment(dir, None))
        } else {
          val tuples = cur.where(pred)
            .select(partitionBy.map(col): _*).distinct().collect()
          if (tuples.isEmpty) p.segments // nothing matched: no-op commit
          else {
            val aff = tupleSql(tuples)
            writeData(cur.where(expr(aff) && !pred), dir)
            p.segments.map(s => s.copy(excluded = Some(
              s.excluded.fold(aff)(e => s"($e) OR $aff")))) :+
              Segment(dir, None)
          }
        }
      SnapshotStore.commitFailpoint()
      writeCommit(hFs, Commit(nextV, System.currentTimeMillis(), "delete",
        p.schemaJson, segments,
        statsFor(spark, segments, dir,
          DataType.fromJson(p.schemaJson).asInstanceOf[StructType],
          p.stats)))
      nextV
    }
  }

  /**
   * Physical row delta between two committed versions, as
   * (additions, retractions) — the incremental-view-maintenance feed:
   * a consumer holding any aggregate state valid at `fromVersion`
   * reaches `toVersion` by folding `additions` in and `retractions`
   * out, at cost ∝ the CHANGED segments/partitions, never the table.
   * Derived purely from the two manifests: a data dir only in the new
   * manifest contributes its live rows as additions; a dir only in the
   * old one contributes its live rows as retractions (Full/compact/
   * rollback fall back to whole-table deltas — the honest cost of a
   * total rewrite); a dir in BOTH contributes the rows whose liveness
   * flipped — exclusion predicates are partition-column terms, so both
   * sides prune to the affected partitions at the file listing.
   * Schemas: additions read under `toVersion`'s schema, retractions
   * under `fromVersion`'s.
   */
  def deltaBetween(spark: SparkSession, fromVersion: Long,
      toVersion: Long): (DataFrame, DataFrame) = {
    val hFs = fs(spark)
    val cf = readCommit(hFs, fromVersion)
    val ct = readCommit(hFs, toVersion)
    val fromSchema = DataType.fromJson(cf.schemaJson).asInstanceOf[StructType]
    val toSchema = DataType.fromJson(ct.schemaJson).asInstanceOf[StructType]
    val oldExcl = cf.segments.map(s => s.dir -> s.excluded).toMap
    val newExcl = ct.segments.map(s => s.dir -> s.excluded).toMap
    def readDir(dir: String, schema: StructType): DataFrame =
      spark.read.schema(schema)
        .parquet(new HPath(dataRoot, dir).toString)
    def live(e: Option[String]): Column = e.fold(lit(true))(x => !expr(x))
    def dead(e: Option[String]): Column = e.fold(lit(false))(x => expr(x))
    val adds = Seq.newBuilder[DataFrame]
    val rets = Seq.newBuilder[DataFrame]
    ct.segments.foreach { s =>
      oldExcl.get(s.dir) match {
        case None => // new dir: its live rows are additions
          adds += readDir(s.dir, toSchema).where(live(s.excluded))
        case Some(oldE) if oldE != s.excluded =>
          // liveness flipped rows only (upsert/delete widen the
          // exclusion → retractions; rollback can narrow it → additions)
          adds += readDir(s.dir, toSchema)
            .where(live(s.excluded) && dead(oldE))
          rets += readDir(s.dir, fromSchema)
            .where(live(oldE) && dead(s.excluded))
        case _ => () // carried unchanged: no delta
      }
    }
    cf.segments.foreach { s =>
      if (!newExcl.contains(s.dir)) // dropped dir: live rows retract
        rets += readDir(s.dir, fromSchema).where(live(s.excluded))
    }
    def unionAll(fs: Seq[DataFrame], schema: StructType): DataFrame =
      if (fs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else fs.reduceLeft(_.unionByName(_))
    (unionAll(adds.result(), toSchema), unionAll(rets.result(), fromSchema))
  }

  /**
   * Change data feed between two committed versions — the CDC readout
   * of the snapshot log (the transactional-format CDF analog): every
   * key inserted, updated (new values), or deleted going from
   * `fromVersion` to `toVersion`. Computed as ONE null-safe
   * full-outer key join of the two snapshots plus a row-struct
   * comparison — the honest shape for a store whose commits carry
   * full affected-partition segments (there is no per-row delta log
   * to replay); partition pruning still reaches both snapshot scans.
   * Returns (change_type, keys..., columns...) with deleted rows
   * carrying their before-values.
   */
  def changes(spark: SparkSession, fromVersion: Long, toVersion: Long,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changes: key columns required")
    val before0 = readVersion(spark, fromVersion)
    val after = readVersion(spark, toVersion)
    val nonKey = after.columns.filterNot(keys.contains).toSeq
    // schema evolution: a column added after `fromVersion` compares
    // as NULL on the before side (its rows read as update/insert)
    val before = nonKey.foldLeft(before0)((b, c) =>
      if (b.columns.contains(c)) b
      else b.withColumn(c, lit(null).cast(after.schema(c).dataType)))
    val aSide = after.select(keys.map(col) ++ nonKey.map(col) :+
      lit(1).as("__ap"): _*)
    val bSide = before.select(keys.map(k => col(k).as(s"__k_$k")) ++
      nonKey.map(c => col(c).as(s"__b_$c")) :+ lit(1).as("__bp"): _*)
    val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    val j = aSide.join(bSide, cond, "full_outer")
    val changed = !(org.apache.spark.sql.functions.struct(
      nonKey.map(col): _*) <=>
      org.apache.spark.sql.functions.struct(
        nonKey.map(c => col(s"__b_$c")): _*))
    val changeType = when(col("__bp").isNull, lit("insert"))
      .when(col("__ap").isNull, lit("delete"))
      .when(changed, lit("update"))
    val keyOut = keys.map(k => coalesce(col(k), col(s"__k_$k")).as(k))
    val valOut = nonKey.map(c =>
      when(col("__ap").isNull, col(s"__b_$c")).otherwise(col(c)).as(c))
    j.withColumn("change_type", changeType)
      .where(col("change_type").isNotNull)
      .select(col("change_type") +: (keyOut ++ valOut): _*)
  }

  /**
   * Compaction — the transactional-format OPTIMIZE analog. Long
   * append/upsert/delete chains accumulate carried segments plus
   * per-segment exclusion predicates whose union every read must
   * evaluate (and, at scale, the small-file problem: each micro-batch
   * commit is its own directory). Compact rewrites the current head
   * into ONE fresh segment — sized toward `targetFileBytes` per output
   * file from the head's Catalyst size estimate (partitioned stores
   * instead shuffle to one file per live partition) — and commits it
   * with op "compact". Contents are identical to the head; prior
   * versions still reference the old segments until [[vacuum]]
   * retires them, so time travel is unaffected. Returns the version.
   */
  def compact(spark: SparkSession,
      targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hFs = fs(spark)
    withWriterLock(hFs) {
      val p = listVersions(hFs).lastOption.map(readCommit(hFs, _))
        .getOrElse(throw new java.io.IOException(
          s"snapshot store $path: no commits"))
      val nextV = p.version + 1
      val dir = newWriteDir(nextV)
      val cur = readVersion(spark, p.version)
      val sized =
        if (partitionBy.nonEmpty) cur.repartition(partitionBy.map(col): _*)
        else {
          val bytes = cur.queryExecution.optimizedPlan.stats.sizeInBytes
          val files = (bytes / BigInt(targetFileBytes)).toLong + 1
          cur.repartition(math.min(files, Int.MaxValue.toLong).toInt)
        }
      writeData(sized, dir)
      SnapshotStore.commitFailpoint()
      writeCommit(hFs, Commit(nextV, System.currentTimeMillis(), "compact",
        p.schemaJson, Seq(Segment(dir, None)),
        statsFor(spark, Seq(Segment(dir, None)), dir,
          DataType.fromJson(p.schemaJson).asInstanceOf[StructType],
          p.stats)))
      nextV
    }
  }

  /** Restore the table to `toVersion`'s state as a NEW commit (the
    * intermediate versions stay in the log — rollback is an audited
    * forward operation, not history rewriting). */
  def rollback(spark: SparkSession, toVersion: Long): Long = {
    val hFs = fs(spark)
    withWriterLock(hFs) {
      val target = readCommit(hFs, toVersion)
      val head = listVersions(hFs).last
      val nextV = head + 1
      SnapshotStore.commitFailpoint()
      writeCommit(hFs, Commit(nextV, System.currentTimeMillis(),
        s"rollback@$toVersion", target.schemaJson, target.segments,
        target.stats))
      nextV
    }
  }

  /**
   * Retire history: keep the last `retainVersions` commits, delete log
   * entries before them and every data dir no retained version
   * references (incl. orphans of pre-commit crashes). Time travel to a
   * vacuumed version then fails loudly at the log lookup.
   */
  def vacuum(spark: SparkSession, retainVersions: Int = 1): Unit = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val hFs = fs(spark)
    withWriterLock(hFs) {
      val vs = listVersions(hFs)
      val (drop, keep) = vs.splitAt(math.max(0, vs.size - retainVersions))
      val live = keep.flatMap(readCommit(hFs, _).segments.map(_.dir)).toSet
      if (hFs.exists(dataRoot))
        hFs.listStatus(dataRoot).foreach { st =>
          if (st.isDirectory && !live.contains(st.getPath.getName))
            hFs.delete(st.getPath, true)
        }
      drop.foreach(v =>
        hFs.delete(new HPath(logDir, versionFileName(v)), false))
    }
  }
}
