package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._

/** Inference contract, orchestrator, schema files, multi-format sources,
  * async analysis jobs, streaming on_change refresh. */
class EtlExtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftext").toString

  test("partition-scoped upsert leaves untouched partitions byte-identical") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir, orderColumn = Some("v"),
      partitionBy = Seq("day"))
    val base = Seq((1L, 10.0, "d1"), (2L, 20.0, "d2"), (3L, 30.0, "d3"))
      .toDF("id", "v", "day")
    target.write(base, WriteMode.Upsert, Seq("id"))

    def partFiles(day: String): Map[String, Array[Byte]] = {
      val d = new java.io.File(s"$dir/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath)).toMap
    }
    val d1Before = partFiles("d1")
    val d3Before = partFiles("d3")

    // batch touches only day=d2 (update id=2, insert id=4)
    val batch = Seq((2L, 25.0, "d2"), (4L, 40.0, "d2")).toDF("id", "v", "day")
    target.write(batch, WriteMode.Upsert, Seq("id"))

    val d1After = partFiles("d1")
    val d3After = partFiles("d3")
    assert(d1After.keySet == d1Before.keySet &&
      d1After.forall { case (k, b) => java.util.Arrays.equals(b, d1Before(k)) })
    assert(d3After.keySet == d3Before.keySet &&
      d3After.forall { case (k, b) => java.util.Arrays.equals(b, d3Before(k)) })

    val result = spark.read.parquet(dir)
      .select("id", "v", "day").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(result.toSeq == Seq((1L, 10.0, "d1"), (2L, 25.0, "d2"),
      (3L, 30.0, "d3"), (4L, 40.0, "d2")))
  }

  test("windowed analysis pushes the ts bound and prunes date partitions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir() + "/ev"
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 30 day-partitions × 10 rows; max(ts) = day 29 + 9 min
    val rows = (0 until 30).flatMap { d =>
      (0 until 10).map { i =>
        (java.sql.Timestamp.from(base.plusSeconds(d * 86400L + i * 60L)),
          d * 10.0 + i)
      }
    }
    rows.toDF("ts", "v").withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val table = spark.read.parquet(dir)
    val windowed = graft.analysis.AnalysisPlanner.applyTimeWindow(
      table, "ts", "7d", datePartitionCol = Some("day"))

    // bound = (day29 + 9min) - 7d = day22 + 9min → 71 in-window rows
    assert(windowed.count() == 71)

    val scans = windowed.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // literal ts bound reaches the parquet scan (row-group stats engage)
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(ts"))
    // date-partition predicate prunes the file listing: only the 8
    // partitions day22..day29 are scanned, not all 30
    assert(scan.selectedPartitions.partitionCount == 8)

    // the anchor job itself is O(1 partition): max(day) resolves the
    // partition, then max(ts) scans ONLY that partition — not a full
    // ts-column pass over all 30
    val anchor = graft.analysis.AnalysisPlanner.anchorFrame(
      table, "ts", Some("day"))
    assert(anchor.collect()(0).getTimestamp(0) ==
      java.sql.Timestamp.from(base.plusSeconds(29 * 86400L + 9 * 60L)))
    // the agg plan is AQE-wrapped, and AQE hides executed stages inside
    // QueryStageExec nodes that plain collect() does not descend into
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val anchorScan = allScans(anchor.queryExecution.executedPlan).head
    assert(anchorScan.selectedPartitions.partitionCount == 1)
  }

  test("Full overwrite truncates stale partitions under a dynamic session default") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir, partitionBy = Seq("day"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    // GraftSession sets this session-wide for upsert; a Full rewrite must
    // still replace the WHOLE table, not just the batch's partitions
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      target.write(Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"),
        WriteMode.Full)
      target.write(Seq((3L, "d2")).toDF("id", "day"), WriteMode.Full)
      val rows = spark.read.parquet(dir).select("id", "day")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((3L, "d2"))) // day=d1 gone
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("partition-scoped upsert preserves numeric-looking string partitions") {
    import spark.implicits._
    val dir = tmpDir() + "/t01"
    val target = ParquetTarget(dir, orderColumn = Some("v"),
      partitionBy = Seq("code"))
    target.write(
      Seq((1L, 1.0, "01"), (3L, 3.0, "01"), (2L, 2.0, "02"))
        .toDF("id", "v", "code"),
      WriteMode.Upsert, Seq("id"))
    // directory inference would read code back as INT 1 — the upsert
    // must still target code=01, merge with id=3 (NOT delete it), and
    // replace the same directory
    target.write(Seq((1L, 9.0, "01")).toDF("id", "v", "code"),
      WriteMode.Upsert, Seq("id"))
    assert(new java.io.File(s"$dir/code=01").exists())
    assert(!new java.io.File(s"$dir/code=1").exists())
    val rows = spark.read.parquet(dir)
      .select(col("id"), col("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 9.0), (2L, 2.0), (3L, 3.0)))
  }

  test("upsert crash between stage and commit leaves the target pre-upsert") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir, orderColumn = Some("v"),
      partitionBy = Seq("day"))
    target.write(Seq((1L, 10.0, "d1"), (2L, 20.0, "d2")).toDF("id", "v", "day"),
      WriteMode.Upsert, Seq("id"))
    def rows() = spark.read.parquet(dir).select("id", "v", "day")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getString(2))).toSeq

    val batch = Seq((2L, 25.0, "d2"), (3L, 30.0, "d2")).toDF("id", "v", "day")
    ParquetTarget.stageFailpoint = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      target.write(batch, WriteMode.Upsert, Seq("id"))
    } finally ParquetTarget.stageFailpoint = () => ()
    // failure before the commit point: table readable at pre-upsert state
    assert(rows() == Seq((1L, 10.0, "d1"), (2L, 20.0, "d2")))

    // next upsert discards the stale stage and applies cleanly
    target.write(batch, WriteMode.Upsert, Seq("id"))
    assert(rows() == Seq((1L, 10.0, "d1"), (2L, 25.0, "d2"), (3L, 30.0, "d2")))
    assert(!new java.io.File(dir + ".staged").exists &&
      !new java.io.File(dir + ".backup").exists)
  }

  test("writer lock: fresh lock fails fast, stale lock is taken over") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir)
    val df = Seq((1L, 10.0)).toDF("id", "v")
    target.write(df, WriteMode.Full)
    // a successful write leaves no lock behind
    val lockFile = new java.io.File(dir + "._WRITER_LOCK")
    assert(!lockFile.exists)

    // a FRESH foreign lock (another live writer): fail fast, table intact
    assert(lockFile.createNewFile())
    val e = intercept[java.io.IOException] {
      target.write(Seq((2L, 20.0)).toDF("id", "v"), WriteMode.Full)
    }
    assert(e.getMessage.contains("_WRITER_LOCK"))
    assert(spark.read.parquet(dir).count() == 1)

    // a STALE lock (crashed writer, older than the timeout): taken over
    assert(lockFile.setLastModified(
      System.currentTimeMillis() - 60 * 60 * 1000L))
    target.write(Seq((2L, 20.0)).toDF("id", "v"), WriteMode.Full)
    assert(spark.read.parquet(dir).collect()(0).getLong(0) == 2L)
    assert(!lockFile.exists)

    // a thrown write is a finished writer: the lock is released so the
    // retry isn't deadlocked behind the failure
    ParquetTarget.stageFailpoint = () => throw new RuntimeException("boom")
    val t2 = ParquetTarget(dir)
    try intercept[RuntimeException] {
      t2.write(Seq((3L, 30.0)).toDF("id", "v"), WriteMode.Upsert, Seq("id"))
    } finally ParquetTarget.stageFailpoint = () => ()
    assert(!lockFile.exists)
  }

  test("upsert commit marker rolls an interrupted commit forward") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir, orderColumn = Some("v"),
      partitionBy = Seq("day"))
    target.write(Seq((1L, 10.0, "d1"), (2L, 20.0, "d2")).toDF("id", "v", "day"),
      WriteMode.Upsert, Seq("id"))
    // stage a merge, crash before commit, then hand-write the marker —
    // the exact on-disk state of a crash between marker and renames
    val batch = Seq((2L, 25.0, "d2"), (3L, 30.0, "d2")).toDF("id", "v", "day")
    ParquetTarget.stageFailpoint = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      target.write(batch, WriteMode.Upsert, Seq("id"))
    } finally ParquetTarget.stageFailpoint = () => ()
    assert(new java.io.File(dir + ".staged").isDirectory)
    new java.io.File(dir + ".staged/_COMMIT_READY").createNewFile()

    // next write first rolls the staged commit FORWARD, then applies its
    // own batch on top
    target.write(Seq((4L, 40.0, "d1")).toDF("id", "v", "day"),
      WriteMode.Upsert, Seq("id"))
    val rows = spark.read.parquet(dir).select("id", "v", "day")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getString(2))).toSeq
    assert(rows == Seq((1L, 10.0, "d1"), (2L, 25.0, "d2"), (3L, 30.0, "d2"),
      (4L, 40.0, "d1")))
    assert(!new java.io.File(dir + ".staged").exists &&
      !new java.io.File(dir + ".backup").exists)
  }

  test("Full rewrite invalidates a crashed upsert's commit marker") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir, orderColumn = Some("v"))
    target.write(Seq((1L, 10.0)).toDF("id", "v"), WriteMode.Upsert, Seq("id"))
    // crash an upsert after staging, then hand-write the marker — the
    // state recovery would normally roll FORWARD
    ParquetTarget.stageFailpoint = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      target.write(Seq((1L, 11.0)).toDF("id", "v"), WriteMode.Upsert, Seq("id"))
    } finally ParquetTarget.stageFailpoint = () => ()
    new java.io.File(dir + ".staged/_COMMIT_READY").createNewFile()

    // a Full rewrite SUPERSEDES the pending commit; the stale stage must
    // not roll forward over it on the next upsert
    target.write(Seq((1L, 50.0)).toDF("id", "v"), WriteMode.Full)
    target.write(Seq((2L, 60.0)).toDF("id", "v"), WriteMode.Upsert, Seq("id"))
    val rows = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 50.0), (2L, 60.0))) // NOT the stale 11.0
  }

  test("snapshot store: upserts version, prior snapshots stay readable") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snap", orderColumn = Some("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val v1 = st.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"),
      WriteMode.Full)
    val v2 = st.write(Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v"),
      WriteMode.Upsert, Seq("id"))
    val v3 = st.write(Seq((1L, 11.0)).toDF("id", "v"),
      WriteMode.Upsert, Seq("id"))
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(rows(st.read(spark)) ==
      Seq((1L, 11.0), (2L, 25.0), (3L, 30.0)))
    // time travel: every prior version exactly as committed
    assert(rows(st.readVersion(spark, 1)) == Seq((1L, 10.0), (2L, 20.0)))
    assert(rows(st.readVersion(spark, 2)) ==
      Seq((1L, 10.0), (2L, 25.0), (3L, 30.0)))
    // history reflects the ops
    val hist = st.history(spark).orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(hist == Seq((1L, "full"), (2L, "upsert"), (3L, "upsert")))
    // rollback is a forward commit restoring v1's state
    val v4 = st.rollback(spark, 1)
    assert(v4 == 4L)
    assert(rows(st.read(spark)) == Seq((1L, 10.0), (2L, 20.0)))
    assert(rows(st.readVersion(spark, 3)) ==
      Seq((1L, 11.0), (2L, 25.0), (3L, 30.0))) // intermediate intact
  }

  test("snapshot store: additive schema evolution on append and upsert") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snapse", orderColumn = Some("v"))
    st.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), WriteMode.Full)
    // append a batch carrying a NEW column — old rows read it as NULL
    st.write(Seq((3L, 30.0, "x")).toDF("id", "v", "tag"),
      WriteMode.Append)
    val head2 = st.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("tag"))).toSeq
    assert(head2 == Seq((1L, null), (2L, null), (3L, "x")))
    // upsert mixing old-schema keys and the new column; the batch may
    // also omit nothing — new col set for touched rows only
    st.write(Seq((1L, 11.0, "y")).toDF("id", "v", "tag"),
      WriteMode.Upsert, Seq("id"))
    val head3 = st.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getAs[String]("tag")))
      .toSeq
    assert(head3 == Seq((1L, 11.0, "y"), (2L, 20.0, null),
      (3L, 30.0, "x")))
    // a batch OMITTING an existing column upserts with NULL there
    st.write(Seq((4L, 40.0)).toDF("id", "v"), WriteMode.Upsert,
      Seq("id"))
    val r4 = st.read(spark).where(col("id") === 4L).collect()(0)
    assert(r4.getAs[String]("tag") == null)
    // time travel: v1 still shows the ORIGINAL two-column schema
    assert(!st.readVersion(spark, 1).columns.contains("tag"))
    // CDF across the evolution boundary: v1 -> head sees the new
    // column's values without erroring
    val cdf = st.changes(spark, 1, 4, Seq("id"))
      .select("change_type", "id").orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cdf == Seq(("update", 1L), ("insert", 3L), ("insert", 4L)))
    // type change fails loud
    val e = intercept[IllegalArgumentException] {
      st.write(Seq((9L, "oops")).toDF("id", "v"), WriteMode.Append)
    }
    assert(e.getMessage.contains("type change"))
  }

  test("snapshot store: segment min/max stats skip non-matching segments") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snapskip", orderColumn = Some("v"))
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 1.0, f"t$i%03d")).toDF("id", "v", "tag")
    st.write(batch(1, 10), WriteMode.Full)
    st.write(batch(11, 20), WriteMode.Append)
    st.write(batch(21, 30), WriteMode.Append)
    def segDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map { f =>
        f.split("/data/")(1).split("/")(0)
      }.toSet
    // unpruned head lists all three segment dirs
    assert(segDirs(st.read(spark)).size == 3)
    // a range predicate hitting only the middle batch materializes ONLY
    // that segment — the FileIndex listing proves the skip
    val pruned = st.readWhere(spark, "id >= 11 AND id <= 15")
    assert(segDirs(pruned).size == 1)
    assert(pruned.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (11L to 15L))
    // string stats prune too (binary UTF-8 order)
    assert(segDirs(st.readWhere(spark, "tag = 't025'")).size == 1)
    // OR of two ranges keeps exactly the two matching segments
    assert(segDirs(st.readWhere(spark, "id = 5 OR id = 25")).size == 2)
    // an unsupported predicate shape degrades to no pruning, same rows
    val odd = st.readWhere(spark, "id % 2 = 1")
    assert(odd.count() == 15)
    // time travel prunes against THAT version's manifest
    val tt = st.readWhere(spark, "id >= 11", version = Some(2))
    assert(segDirs(tt).size == 1)
    assert(tt.count() == 10)
    // a provably-empty predicate reads nothing but keeps the schema
    val none = st.readWhere(spark, "id > 1000")
    assert(none.columns.toSeq == Seq("id", "v", "tag") && none.count() == 0)
  }

  test("snapshot-backed group: analysis filter prunes segments without caller cooperation") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snapfg", orderColumn = Some("v"))
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 1.0)).toDF("id", "v")
    st.write(batch(1, 10), WriteMode.Full)
    st.write(batch(11, 20), WriteMode.Append)
    st.write(batch(21, 30), WriteMode.Append)
    val fs = new graft.meta.FeatureStore
    val g = fs.createGroup("o", "d", "p", "snapg", entityKey = Some("id"))
    g.createFeature("v", "float64")
    g.createFeature("v2", "float64", derivedFrom = Some("v * 2"))
    val data = graft.meta.FeatureGroupData.snapshotBacked(g, st, spark)
    def segDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(_.split("/data/")(1).split("/")(0)).toSet
    // the analysis INPUT for a selective base-column filter lists only
    // the matching segment — no explicit readWhere from the caller
    val agg = graft.analysis.Aggregation("v", Seq("count", "sum"),
      filter = Some("id >= 11 AND id <= 15"))
    assert(segDirs(data.frameFor(agg)).size == 1)
    val row = data.analyze(agg).head
    assert(row.getLong(0) == 5L && row.getDouble(1) == (11 to 15).sum)
    // the result is identical to the unpruned path
    val full = graft.analysis.AnalysisPlanner.plan(data.frame, agg).head
    assert(row == full)
    // derived-feature filter has no segment stats: falls back to the
    // full frame (all 3 segments), still correct
    val dAgg = graft.analysis.Aggregation("v", Seq("count"),
      filter = Some("v2 > 50"))
    assert(segDirs(data.frameFor(dAgg)).size == 3)
    assert(data.analyze(dAgg).head.getLong(0) == 5L) // v2>50 ⇔ v>25
    // a no-filter spec takes the plain frame
    val plain = graft.analysis.Aggregation("v", Seq("count"))
    assert(segDirs(data.frameFor(plain)).size == 3)
    // pinned version: a later commit does not leak into this binding
    st.write(batch(31, 40), WriteMode.Append)
    assert(data.analyze(graft.analysis.Aggregation("v", Seq("count"),
      filter = Some("id >= 1"))).head.getLong(0) == 30L)
  }

  test("snapshot store: carried segments keep stats across upserts") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snapskip2",
      orderColumn = Some("v"), partitionBy = Seq("day"))
    st.write(Seq((1L, 1.0, "d1"), (100L, 2.0, "d2")).toDF("id", "v", "day"),
      WriteMode.Full)
    // upsert touches ONLY d2: d1 rides by reference WITH its stats
    st.write(Seq((100L, 3.0, "d2")).toDF("id", "v", "day"),
      WriteMode.Upsert, Seq("id"))
    val pf = st.readWhere(spark, "id <= 1")
    // the new segment (only id=100) is refuted; just the carried v1 dir
    // is listed, and its d2 rows are masked by the exclusion predicate
    assert(pf.inputFiles.map(_.split("/data/")(1).split("/")(0))
      .toSet.size == 1)
    assert(pf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0)))
    // and the upsert result itself is intact
    assert(st.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (100L, 3.0)))
  }

  test("snapshot store: compact collapses segment chains, history intact") {
    import spark.implicits._
    val base = tmpDir() + "/snapc"
    val st = SnapshotStore(base)
    st.write(Seq((1L, 10.0)).toDF("id", "v"), WriteMode.Full)
    st.write(Seq((2L, 20.0)).toDF("id", "v"), WriteMode.Append)
    st.write(Seq((3L, 30.0)).toDF("id", "v"), WriteMode.Append)
    val before = st.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val hist3 = st.history(spark).orderBy("version").collect()
    assert(hist3.last.getAs[Int]("n_segments") == 3) // the chain
    val v4 = st.compact(spark)
    assert(v4 == 4L)
    val hist4 = st.history(spark).orderBy("version").collect()
    assert(hist4.last.getAs[String]("op") == "compact" &&
      hist4.last.getAs[Int]("n_segments") == 1)
    val after = st.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before) // contents identical
    // pre-compact versions still time-travel
    assert(st.readVersion(spark, 2).count() == 2)
    // vacuum retires the old segment dirs; the compacted head survives
    st.vacuum(spark, retainVersions = 1)
    val dirs = new java.io.File(base + "/data").listFiles()
      .filter(_.isDirectory)
    assert(dirs.length == 1)
    assert(st.read(spark).count() == 3)
  }

  test("snapshot store: change data feed between versions") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snapcdf", orderColumn = Some("v"))
    st.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"),
      WriteMode.Full)
    // v2: update id=2, insert id=4, leave 1 and 3 untouched
    st.write(Seq((2L, 25.0), (4L, 40.0)).toDF("id", "v"),
      WriteMode.Upsert, Seq("id"))
    val c12 = st.changes(spark, 1, 2, Seq("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(c12 == Set(("update", 2L, 25.0), ("insert", 4L, 40.0)))
    // v3: delete id=1
    st.delete(spark, "id = 1")
    val c23 = st.changes(spark, 2, 3, Seq("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(c23 == Set(("delete", 1L, 10.0)))
    // full span: v1 -> v3 folds the update+insert+delete together
    val c13 = st.changes(spark, 1, 3, Seq("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(c13 == Set(("update", 2L, 25.0), ("insert", 4L, 40.0),
      ("delete", 1L, 10.0)))
  }

  test("snapshot store: partitioned upsert carries untouched partitions by reference") {
    import spark.implicits._
    val base = tmpDir() + "/snapp"
    val st = SnapshotStore(base, orderColumn = Some("v"),
      partitionBy = Seq("day"))
    st.write(Seq((1L, 10.0, "d1"), (2L, 20.0, "d2"), (3L, 30.0, "d3"))
      .toDF("id", "v", "day"), WriteMode.Full)
    st.write(Seq((2L, 25.0, "d2"), (4L, 40.0, "d2")).toDF("id", "v", "day"),
      WriteMode.Upsert, Seq("id"))
    // v2's write dir holds ONLY the affected partition — untouched
    // partitions ride from v1's segment by reference
    val dataRoot = new java.io.File(base + "/data")
    val dirs = dataRoot.listFiles().filter(_.isDirectory).sortBy(_.getName)
    assert(dirs.length == 2)
    val v2parts = dirs(1).listFiles().filter(_.isDirectory).map(_.getName)
    assert(v2parts.toSeq == Seq("day=d2"), v2parts.mkString(","))
    val got = st.read(spark).select("id", "v", "day").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 10.0, "d1"), (2L, 25.0, "d2"),
      (3L, 30.0, "d3"), (4L, 40.0, "d2")))
    // and v1 is still exactly the original
    assert(st.readVersion(spark, 1).count() == 3)
    // partition pruning still reaches the carried segments' scans
    val pruned = st.read(spark).where(col("day") === "d3")
    assert(pruned.collect().map(_.getAs[Long]("id")).toSeq == Seq(3L))
  }

  test("snapshot store: predicate delete rewrites only matching partitions") {
    import spark.implicits._
    val base = tmpDir() + "/snapd"
    val st = SnapshotStore(base, orderColumn = Some("v"),
      partitionBy = Seq("day"))
    st.write(Seq((1L, 10.0, "d1"), (2L, 20.0, "d2"), (3L, 30.0, "d2"),
      (4L, 40.0, "d3")).toDF("id", "v", "day"), WriteMode.Full)
    val v2 = st.delete(spark, "day = 'd2' AND v > 25.0")
    assert(v2 == 2L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids(st.read(spark)) == Seq(1L, 2L, 4L)) // id=3 gone
    assert(ids(st.readVersion(spark, 1)) == Seq(1L, 2L, 3L, 4L))
    // only d2 was rewritten in v2's write dir
    val dirs = new java.io.File(base + "/data").listFiles()
      .filter(_.isDirectory).sortBy(_.getName)
    assert(dirs.length == 2)
    assert(dirs(1).listFiles().filter(_.isDirectory).map(_.getName)
      .toSeq == Seq("day=d2"))
    // a no-match predicate commits a no-op version, content unchanged
    val v3 = st.delete(spark, "v > 1e9")
    assert(v3 == 3L && ids(st.readVersion(spark, 3)) == Seq(1L, 2L, 4L))
    // unpartitioned delete
    val st2 = SnapshotStore(tmpDir() + "/snapd2")
    st2.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), WriteMode.Full)
    st2.delete(spark, "id = 1")
    assert(ids(st2.read(spark)) == Seq(2L))
    assert(ids(st2.readVersion(spark, 1)) == Seq(1L, 2L))
  }

  test("snapshot store: crash before log commit is invisible; vacuum collects orphans") {
    import spark.implicits._
    val base = tmpDir() + "/snapc"
    val st = SnapshotStore(base, orderColumn = Some("v"))
    st.write(Seq((1L, 10.0)).toDF("id", "v"), WriteMode.Full)
    SnapshotStore.commitFailpoint = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      st.write(Seq((1L, 99.0)).toDF("id", "v"), WriteMode.Upsert, Seq("id"))
    } finally SnapshotStore.commitFailpoint = () => ()
    // the crashed write's data dir exists but no reader ever sees it
    assert(st.latestVersion(spark).contains(1L))
    assert(st.read(spark).collect().map(_.getDouble(1)).toSeq == Seq(10.0))
    val dataRoot = new java.io.File(base + "/data")
    assert(dataRoot.listFiles().count(_.isDirectory) == 2) // incl. orphan
    // the failed writer released the lock; the retry applies cleanly
    st.write(Seq((1L, 99.0)).toDF("id", "v"), WriteMode.Upsert, Seq("id"))
    assert(st.read(spark).collect().map(_.getDouble(1)).toSeq == Seq(99.0))
    // vacuum keeps the latest version's dirs, drops the orphan + retired
    st.vacuum(spark, retainVersions = 1)
    val live = dataRoot.listFiles().filter(_.isDirectory)
    assert(live.length == 1, live.map(_.getName).mkString(","))
    assert(st.read(spark).collect().map(_.getDouble(1)).toSeq == Seq(99.0))
    intercept[Exception] { st.readVersion(spark, 1).collect() }
  }

  test("snapshot store: writer lock fails fast while held, asOf time-travels") {
    import spark.implicits._
    val base = tmpDir() + "/snapl"
    val st = SnapshotStore(base)
    st.write(Seq((1L, 10.0)).toDF("id", "v"), WriteMode.Full)
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    st.write(Seq((2L, 20.0)).toDF("id", "v"), WriteMode.Full)
    // asOf between the two commits resolves to v1
    assert(st.asOf(spark, t1).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(st.asOf(spark, System.currentTimeMillis())
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a fresh foreign lock: fail fast, store intact
    val lockFile = new java.io.File(base + "._WRITER_LOCK")
    assert(lockFile.createNewFile())
    val e = intercept[java.io.IOException] {
      st.write(Seq((3L, 30.0)).toDF("id", "v"), WriteMode.Full)
    }
    assert(e.getMessage.contains("_WRITER_LOCK"))
    assert(st.latestVersion(spark).contains(2L))
    lockFile.delete()
  }

  test("compaction collapses small files, preserves rows") {
    import spark.implicits._
    val dir = tmpDir() + "/frag"
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(40).write.mode("overwrite").parquet(dir)
    val sumBefore = spark.read.parquet(dir).agg(sum("id")).first().getLong(0)
    val (before, after) = Compaction.compact(spark, dir)
    assert(before == 40 && after <= 2, s"$before -> $after")
    val got = spark.read.parquet(dir)
    assert(got.count() == 5000)
    assert(got.agg(sum("id")).first().getLong(0) == sumBefore)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val facts = (1 to 2000).map(i => (i.toLong % 200, i.toDouble))
      .toDF("k", "v")
    val dims = (0 until 200).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readTable(spark, "b_facts")
        .join(Bucketing.readTable(spark, "b_dims"), "k")
      assert(joined.count() == 2000)
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: bucketed scan on both sides, no Exchange anywhere
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") ||
        plan.toLowerCase.contains("bucket"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("jdbc source round-trips through embedded Derby with pushdown") {
    val db = tmpDir() + "/derbydb"
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE users (id BIGINT, name VARCHAR(32), score DOUBLE)")
    (1 to 50).foreach(i =>
      st.execute(s"INSERT INTO users VALUES ($i, 'u$i', ${i * 1.5})"))
    st.close(); conn.close()

    val src = JdbcSource("users", s"jdbc:derby:$db", "users")
    val df = src.read(spark)
    assert(df.count() == 50)
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq ==
      Seq("id", "name", "score"))
    // filter + projection push into the JDBC scan
    val filtered = df.where(col("ID") > 40).select("ID", "SCORE")
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"))
    assert(filtered.orderBy(col("ID")).collect()(0).getLong(0) == 41L)
  }

  test("inference: batching, metrics, convenience ctors, bad specs rejected") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"text-$i")).toDF("id", "text")
    val spec = InferenceTransform.embedding("hf://org/model", "text", dim = 8)
    assert(spec.model.scheme == "hf")
    val (out, res) = InferenceTransform.run(df, spec,
      InferenceTransform.fakeEmbeddingModel(8))
    assert(res.totalSamples == 100 && res.successSamples == 100)
    assert(res.failedSamples == 0 && res.throughputPerSec > 0)
    assert(out.schema.fieldNames.contains("embedding"))
    assert(out.select("embedding").first().getSeq[Float](0).size == 8)
    // deterministic across runs
    val (out2, _) = InferenceTransform.run(df, spec,
      InferenceTransform.fakeEmbeddingModel(8))
    assert(out.orderBy("id").collect().toSeq ==
      out2.orderBy("id").collect().toSeq)
    // failing model → failed accounting, null outputs
    val failing: InferenceTransform.BatchModel =
      _ => throw new RuntimeException("boom")
    val (outF, resF) = InferenceTransform.run(df, spec, failing)
    assert(resF.failedSamples == 100 && resF.successSamples == 0)
    assert(outF.where(col("embedding").isNull).count() == 100)
    intercept[IllegalArgumentException](ModelSpec("ftp://x", "pytorch"))
    intercept[IllegalArgumentException](ModelSpec("s3://x", "cobol"))
    assert(AcceleratorConfig("gpu", 2).sparkConf.nonEmpty)
    assert(AcceleratorConfig().sparkConf.isEmpty)
  }

  test("orchestrator: deploy/trigger/pause + Airflow DAG text") {
    import spark.implicits._
    val root = tmpDir()
    Seq((1L, 2.0)).toDF("id", "v").write.parquet(s"$root/src")
    val job = new Job("orch1", Seq(FileSource("s", s"$root/src")),
      SqlTransform("SELECT * FROM s"), ParquetTarget(s"$root/out"),
      schedule = Schedule.daily,
      checkpoints = new CheckpointStore(s"$root/cp"))
    val orch = new InternalOrchestrator(spark)
    orch.deploy(job)
    assert(orch.list == Seq("orch1"))
    assert(orch.trigger("orch1").state == "success")
    orch.pause("orch1")
    intercept[IllegalArgumentException](orch.trigger("orch1"))
    val dag = AirflowDagGenerator.generate(job)
    assert(dag.contains("dag_id=\"graft_orch1\""))
    assert(dag.contains("schedule='@daily'"))
    assert(dag.contains("start >> transform >> quality_checks".replace(
      "quality_checks", "quality") + " >> end"))
  }

  test("schema files: YAML and JSON bulk creation") {
    val root = tmpDir()
    val yaml = s"$root/fg.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(yaml),
      """features:
        |  clicks: int64
        |  score: float64
        |  emb: float32[4]
        |""".stripMargin)
    val json = s"$root/fg.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(json),
      """{"a": "int64", "b": "string[8]"}""")
    val fs = new graft.meta.FeatureStore
    val g1 = fs.createGroup("o", "d", "p", "y1")
    val made = SchemaFile.createFrom(g1, yaml)
    assert(made.map(_.name) == Seq("clicks", "score", "emb"))
    assert(g1.feature("emb").dtype == graft.types.TEmbedding("float32", 4))
    val g2 = fs.createGroup("o", "d", "p", "j1")
    assert(SchemaFile.createFrom(g2, json).size == 2)
  }

  test("file sources: csv/json/orc round-trip through FileSource") {
    // avro/delta/iceberg are connector-jar-dependent; this classpath ships
    // only core avro libs (no spark-avro), so the portable trio is tested
    import spark.implicits._
    val root = tmpDir()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    df.write.option("header", "true").csv(s"$root/c")
    df.write.json(s"$root/j")
    df.write.orc(s"$root/o")
    val c = FileSource("c", s"$root/c", "csv",
      Map("header" -> "true", "inferSchema" -> "true")).read(spark)
    val j = FileSource("j", s"$root/j", "json").read(spark)
    val o = FileSource("o", s"$root/o", "orc").read(spark)
    Seq(c, j, o).foreach { d =>
      assert(d.count() == 2)
      assert(d.select(sum($"v")).first().getDouble(0) == 4.0)
    }
  }

  test("TableSource prunes/pushes down; FeatureGroupSource reads derived frame") {
    import spark.implicits._
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "seg", "v").createOrReplaceTempView("tsrc")
    val t = TableSource("t", "tsrc", columns = Seq("id", "v"),
      filter = Some("seg = 'a'")).read(spark)
    assert(t.columns.toSeq == Seq("id", "v") && t.count() == 2)

    val fs = new graft.meta.FeatureStore
    val g = fs.createGroup("o", "d", "p", "fgs", entityKey = Some("id"))
    g.createFeature("v", "float64")
    g.createFeature("v2", "float64", derivedFrom = Some("v * 2"))
    val data = new graft.meta.FeatureGroupData(g,
      Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v"))
    val src = FeatureGroupSource("fg", data, features = Seq("id", "v2"),
      filter = Some("v2 > 3")).read(spark)
    assert(src.columns.toSeq == Seq("id", "v2"))
    assert(src.collect().map(_.getDouble(1)).toSeq == Seq(5.0))
  }

  test("async analysis job: completes, and cancel is observable") {
    import spark.implicits._
    import scala.concurrent.ExecutionContext.Implicits.global
    val df = (1 to 1000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val job = new graft.analysis.AnalysisJob(spark, df,
      graft.analysis.Aggregation("v", Seq("count", "sum", "avg")))
    assert(job.status == "pending")
    job.start()
    assert(job.waitFor(30000) == "completed")
    val row = job.result.head
    assert(row.getLong(0) == 1000L)
    // cancel an unstarted job
    val j2 = new graft.analysis.AnalysisJob(spark, df,
      graft.analysis.Aggregation("v", Seq("count")))
    j2.cancel()
    assert(j2.status == "cancelled")
    intercept[IllegalStateException](j2.result)
  }

  test("live table on_change: file stream triggers re-materialization") {
    import spark.implicits._
    val root = tmpDir()
    val srcDir = s"$root/stream-src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    Seq((1L, 1.0)).toDF("k", "v").write.mode("append").parquet(srcDir)
    val lt = new graft.live.LiveTable("lt-stream", spark,
      s => s.read.schema(schema).parquet(srcDir)
        .agg(count(lit(1)).as("n"), sum($"v").as("total")),
      s"$root/mat",
      policy = graft.live.RefreshPolicy.onChange,
      cdc = graft.live.CdcConfig(debounceSeconds = 1))
    val q = lt.startOnChange(srcDir, schema, s"$root/ckpt")
    try {
      q.processAllAvailable()
      assert(lt.refreshHistory.nonEmpty)
      val first = lt.query().collect()(0)
      assert(first.getLong(0) == 1L)
      // new file arrives → another refresh with updated aggregate
      Seq((2L, 4.0)).toDF("k", "v").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val after = lt.query().collect()(0)
      assert(after.getLong(0) == 2L && after.getDouble(1) == 5.0)
      assert(lt.refreshHistory.size >= 2)
      assert(lt.refreshHistory.last.trigger.startsWith("cdc_batch"))
    } finally lt.stopStream()
  }

  test("job run executes the source→transform pipeline exactly once") {
    import spark.implicits._
    val root = tmpDir()
    val n = 500
    (1 to n).map(i => (i.toLong, f"2024-01-${i % 28 + 1}%02d 00:00:00", i * 1.0))
      .toDF("id", "ts_s", "v")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.parquet(s"$root/src")

    // every row flowing source→transform ticks the accumulator; a re-run
    // of the pipeline (per extra action: rowsRead count, quality gate,
    // write's own count, checkpoint max) would tick it again. The udf is
    // nondeterministic so Catalyst can neither collapse nor re-order it.
    val acc = spark.sparkContext.longAccumulator("graftPipelineRows")
    val tick = udf { (x: Long) => acc.add(1); x }.asNondeterministic()
    val job = new Job("single-pass",
      sources = Seq(FileSource("s", s"$root/src")),
      transform = FnTransform((_, frames) =>
        frames("s").withColumn("id", tick(col("id")))),
      target = ParquetTarget(s"$root/out"),
      incremental = IncrementalConfig(WriteMode.Append, Some("ts")),
      qualityChecks = Seq(NullCheck("v", 0.0), RowCountCheck(minRows = Some(1))),
      checkpoints = new CheckpointStore(s"$root/cp"))
    job.activate()
    val r = job.run(spark)

    assert(r.state == "success")
    assert(r.rowsRead == n && r.rowsWritten == n)
    assert(job.checkpoints.get("single-pass").contains("2024-01-28 00:00:00"))
    assert(acc.value == n, s"pipeline executed ${acc.value / n.toDouble}x")
  }

  test("z-order clustering tiles BOTH columns; single-col sort only one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val df = (0 until 4000)
      .map(_ => (rnd.nextInt(1000), rnd.nextInt(1000))).toDF("x", "y")
    val root = tmpDir()
    graft.etl.ZOrder.writeClustered(df, s"$root/z", Seq("x", "y"),
      nFiles = 8, bits = 10)
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/xsort")

    def avgRange(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length >= 6, s"expected ~8 files in $dir")
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
        (r.getInt(1) - r.getInt(0)).toDouble
      }
      spans.sum / spans.length
    }
    // x-sorted layout: x prunes (~1/8 of the range per file), y does not
    assert(avgRange(s"$root/xsort", "x") < 300.0)
    assert(avgRange(s"$root/xsort", "y") > 800.0)
    // z-ordered layout: BOTH columns' per-file ranges shrink well below
    // the global 1000 span — every clustered column prunes files
    assert(avgRange(s"$root/z", "x") < 700.0)
    assert(avgRange(s"$root/z", "y") < 700.0)
    // row content preserved
    assert(spark.read.parquet(s"$root/z").count() == 4000)
    assert(spark.read.parquet(s"$root/z").agg(sum("x"), sum("y")).head()
      == df.agg(sum("x"), sum("y")).head())
  }

  test("snapshot-backed live table: filtered query prunes segments") {
    import spark.implicits._
    // store partitioned by day so upsert refreshes are partition-scoped
    val st = SnapshotStore(tmpDir() + "/ltsnap", orderColumn = Some("id"),
      partitionBy = Seq("day"))
    // a partition-sliced compute: each refresh re-derives ONE day range
    @volatile var dayLo = 1L
    @volatile var dayHi = 2L
    val lt = new graft.live.LiveTable("lt_snap", spark,
      s => {
        import s.implicits._
        (1 to 100).map(i => (i.toLong, dayLo + i % (dayHi - dayLo + 1),
          i * 1.5)).toDF("id", "day", "v")
      },
      materializePath = st.path,
      store = Some(st), upsertKeys = Seq("id", "day"))
    assert(lt.refresh().exists(_.rows == 100L)) // v1: days 1-2
    dayLo = 3; dayHi = 4
    lt.refresh() // v2: days 3-4 — disjoint partitions carry v1 segments
    dayLo = 5; dayHi = 6
    lt.refresh() // v3: days 5-6
    def segDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(_.split("/data/")(1).split("/")(0)).toSet
    assert(lt.query().count() == 300)
    assert(segDirs(lt.query()).size == 3)
    // the filtered query's FILE LISTING proves the segment skip: only
    // the day-3/4 segment materializes
    val q = lt.query(filter = Some("day >= 3 AND day <= 4"))
    assert(segDirs(q).size == 1)
    assert(q.count() == 100)
    // order/limit compose with the store-backed read path
    val top = lt.query(filter = Some("day = 5"), orderBy = Seq("-v"),
      limit = Some(1)).head()
    assert(top.getAs[Long]("day") == 5L)
    assert(lt.refreshHistory.size == 3)
  }

  test("delta-format round-trip lights up when delta jars are present (source.py:86)") {
    // Opportunistic: this offline image ships no Delta connector, so the
    // test self-cancels (scalatest `assume`); if the driver image ever
    // adds delta-spark to the classpath, MERGE-format coverage activates
    // with zero code change — FileSource already passes the format
    // string straight through to the DataSource V2 registry.
    val deltaPresent =
      try { Class.forName("org.apache.spark.sql.delta.DeltaLog"); true }
      catch { case _: ClassNotFoundException => false }
    assume(deltaPresent, "delta-spark not on classpath (offline image)")
    import spark.implicits._
    val dir = tmpDir() + "/delta"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("delta").save(dir)
    val back = FileSource("t", dir, format = "delta").read(spark)
    assert(back.count() == 2L)
  }

  test("StatTest compare_versions tests snapshot v1 against v2 (analysis.py:272)") {
    import spark.implicits._
    val st = SnapshotStore(tmpDir() + "/snapver", orderColumn = Some("v"))
    st.write((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v"),
      WriteMode.Full)
    st.write((11L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"),
      WriteMode.Append)
    val fs = new graft.meta.FeatureStore
    val g = fs.createGroup("o", "d", "p", "verg", entityKey = Some("id"))
    g.createFeature("v", "float64")
    val data = graft.meta.FeatureGroupData.snapshotBacked(g, st, spark)
    val r = data.analyze(graft.analysis.StatTest("v", "welch", "", "", "",
      compareVersions = Some(("v1", "v2")))).head
    assert(r.getAs[Long]("n_c") == 10L)  // v1: rows 1..10
    assert(r.getAs[Long]("n_t") == 20L)  // v2: rows 1..20
    assert(math.abs(r.getAs[Double]("mean_c") - 5.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_t") - 10.5) < 1e-12)
    assert(r.getAs[Double]("t_stat") > 0) // v2 mean is higher
    assert(r.getAs[Double]("ci_lo") < 5.0 && 5.0 < r.getAs[Double]("ci_hi"))
    // bare "1"/"2" version refs normalize to the same labels
    val r2 = data.analyze(graft.analysis.StatTest("v", "welch", "", "", "",
      compareVersions = Some(("1", "2")))).head
    assert(r2.getAs[Long]("n_c") == 10L && r2.getAs[Long]("n_t") == 20L)
    // spec validation mirrors analysis.py:287-289
    intercept[IllegalArgumentException](
      graft.analysis.StatTest("v", "welch", "", "", ""))
    // segment_by requires control AND treatment (analysis.py:285-286)
    intercept[IllegalArgumentException](
      graft.analysis.StatTest("v", "welch", "grp", "", "t"))
    intercept[IllegalArgumentException](
      graft.analysis.StatTest("v", "welch", "grp", "c", ""))
  }

  test("StatTest filter + confidence_level: CI brackets and widens (analysis.py:273-274)") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      val g = if (i % 2 == 0) "c" else "t"
      val v = (if (g == "c") 10.0 else 12.0) + (i % 7) * 0.5
      (g, v, i)
    }.toDF("grp", "x", "id")
    def ci(level: Double) = {
      val r = graft.analysis.AnalysisPlanner.statTest(rows,
        graft.analysis.StatTest("x", "welch", "grp", "c", "t",
          confidenceLevel = level, filter = Some("id <= 140"))).head
      (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
        r.getAs[Long]("n_c") + r.getAs[Long]("n_t"))
    }
    val (lo95, hi95, n95) = ci(0.95)
    val (lo99, hi99, _) = ci(0.99)
    assert(n95 == 140L) // the filter really ran before the test
    assert(lo95 < 2.0 && 2.0 < hi95) // true mean diff bracketed
    assert(lo99 < lo95 && hi95 < hi99) // 99% interval strictly wider
  }

  test("audit retention archives then drops expired rows (audit.py:256-286)") {
    import graft.meta._
    val log = new AuditLog
    val now = java.time.Instant.parse("2026-08-16T00:00:00Z")
    def entry(daysAgo: Long, actor: String) = AuditEntry(
      timestamp = now.minus(java.time.Duration.ofDays(daysAgo)),
      actor = actor, action = "read_feature", category = "read",
      resource = "o/d/p/g", resourceOrg = "o")
    (1L to 3L).foreach(i => log.record(entry(400 + i, s"old$i")))
    (1L to 2L).foreach(i => log.record(entry(i, s"new$i")))
    // persist so retention exercises the base-rewrite path too
    val base = tmpDir() + "/auditbase"
    log.saveTo(spark, base)
    val dest = tmpDir() + "/archive"
    log.config = AuditConfig(retentionDays = 365,
      exportDestination = Some(dest))
    val rep = log.applyRetention(spark, now)
    assert(rep.expired == 3L && rep.kept == 2L)
    assert(rep.exportedTo.exists(_.startsWith(dest)))
    // archive holds exactly the expired rows; live log only fresh ones
    assert(spark.read.parquet(rep.exportedTo.get).count() == 3L)
    assert(log.query(spark, AuditQuery()).map(_.actor).toSet ==
      Set("new1", "new2"))
    // second sweep is a no-op — and still reports the REAL kept count
    // (never a sentinel), so callers can sum `kept` across sweeps
    val rep2 = log.applyRetention(spark, now)
    assert(rep2.expired == 0L && rep2.kept == 2L && rep2.exportedTo.isEmpty)
  }

  test("AuditQuery frame filters + streamBatches (audit.py:303-347, 428-460)") {
    import graft.meta._
    val log = new AuditLog
    def e(actor: String, org: String, action: String) = AuditEntry(
      actor = actor, actorOrg = Some(org), action = action,
      category = "write", resource = s"o/d/p/$actor", resourceOrg = "o")
    log.record(e("a1", "acme", "create_feature_group"))
    log.record(e("a2", "acme", "delete_feature"))
    log.record(e("b1", "partner", "delete_feature"))
    val q = AuditQuery(actions = Seq("delete_feature", "update_acl"),
      actorOrg = Some("acme"))
    assert(log.queryFrame(spark, q).count() == 1L)
    assert(log.query(spark, q).map(_.actor) == Seq("a2"))
    val batches = log.streamBatches(spark, AuditQuery(), size = 2).toSeq
    assert(batches.map(_.size) == Seq(2, 1))
    assert(batches.flatten.map(_.actor).toSet == Set("a1", "a2", "b1"))
  }
}
