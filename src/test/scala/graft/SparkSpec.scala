package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._
import graft.expr.ExpressionValidator

/** Spark-backed behavior: validator, ETL job lifecycle, upsert algebra,
  * incremental≡full, quality gates, live tables, derived features. */
class SparkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftspec").toString

  import scala.jdk.CollectionConverters._

  // ----------------------------------------------------------- validator

  test("validator: valid expression resolves refs and type") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("clicks", LongType),
      StructField("views", LongType)))
    val r = ExpressionValidator.validate(spark,
      "clicks / NULLIF(views, 0)", schema)
    assert(r.valid)
    assert(r.references == Seq("clicks", "views"))
    assert(r.resultType.contains(DoubleType))
  }

  test("validator: error codes UNKNOWN_REFERENCE / UNKNOWN_FUNCTION / SYNTAX") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("clicks", LongType)))
    val bad = ExpressionValidator.validate(spark, "clicsk + 1", schema)
    assert(!bad.valid && bad.errors.exists(_.code == "UNKNOWN_REFERENCE"))
    assert(bad.errors.exists(_.message.contains("did you mean 'clicks'")))
    val fn = ExpressionValidator.validate(spark, "MAGICFN(clicks)", schema)
    assert(!fn.valid && fn.errors.exists(_.code == "UNKNOWN_FUNCTION"))
    val syn = ExpressionValidator.validate(spark, "clicks +* 2", schema)
    assert(!syn.valid && syn.errors.exists(_.code == "SYNTAX_ERROR"))
    val par = ExpressionValidator.validate(spark, "(clicks + 1", schema)
    assert(!par.valid && par.errors.exists(_.code == "UNBALANCED_PARENS"))
  }

  test("validator: division warning + strict level escalation") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val std = ExpressionValidator.validate(spark, "a / b", schema)
    assert(std.valid &&
      std.warnings.exists(_.code == "POSSIBLE_DIVISION_BY_ZERO"))
    val strict = ExpressionValidator.validate(spark, "a / b", schema,
      level = ExpressionValidator.Strict)
    assert(!strict.valid)
    val perm = ExpressionValidator.validate(spark, "mystery + 1", schema,
      level = ExpressionValidator.Permissive)
    assert(perm.valid) // unknown refs tolerated
  }

  test("withFunctions: IIF/IFNULL/NVL + vector fns validate AND execute") {
    import org.apache.spark.sql.types._
    GraftSession.withFunctions(spark)
    val schema = StructType(Seq(StructField("clicks", LongType),
      StructField("views", LongType),
      StructField("emb", ArrayType(DoubleType))))
    // every name the validator accepts must round-trip through expr()
    val exprs = Seq(
      "IIF(clicks > views, 'hot', 'cold')",
      "IFNULL(views, 0) + NVL(clicks, 0)",
      "round(DOT(emb, emb) + NORM(emb) + L2_DISTANCE(emb, emb), 6)",
      "COSINE_SIMILARITY(VEC_ADD(emb, emb), NORMALIZE(emb))")
    exprs.foreach { e =>
      val r = ExpressionValidator.validate(spark, e, schema)
      assert(r.valid, s"validator rejected: $e → ${r.issues}")
    }
    import spark.implicits._
    val df = Seq((10L, 5L, Array(3.0, 4.0))).toDF("clicks", "views", "emb")
    val out = df.select(
      expr(exprs(0)).as("a"), expr(exprs(1)).as("b"),
      expr(exprs(2)).as("c"), expr(exprs(3)).as("d")).head()
    assert(out.getString(0) == "hot")
    assert(out.getLong(1) == 15L)
    assert(out.getDouble(2) == 30.0)         // 25 + 5 + 0
    assert(math.abs(out.getDouble(3) - 1.0) < 1e-12)
    // idempotent: a second registration pass is a no-op, not an error
    GraftSession.withFunctions(spark)
    assert(spark.sql("SELECT IIF(1 < 2, 1, 0)").head().getInt(0) == 1)
  }

  // ------------------------------------------------------ derived features

  test("derived features materialize in dependency order; cycles rejected") {
    import graft.meta._
    import spark.implicits._
    val fs = new FeatureStore
    val g = fs.createGroup("o", "d", "p", "sig", entityKey = Some("id"))
    g.createFeature("clicks", "int64")
    g.createFeature("views", "int64")
    g.createFeature("ctr", "float64",
      derivedFrom = Some("clicks / NULLIF(views, 0)"))
    g.createFeature("ctr_pct", "float64", derivedFrom = Some("ctr * 100"))
    val base = Seq((1L, 10L, 100L), (2L, 5L, 0L)).toDF("id", "clicks", "views")
    val data = new FeatureGroupData(g, base)
    val out = data.frame.orderBy("id").collect()
    assert(out(0).getAs[Double]("ctr") == 0.1)
    assert(out(0).getAs[Double]("ctr_pct") == 10.0)
    assert(out(1).isNullAt(out(1).fieldIndex("ctr"))) // NULLIF guarded
    // cycle
    val g2 = fs.createGroup("o", "d", "p", "cyc")
    g2.createFeature("x", "int64", derivedFrom = Some("y + 1"))
    g2.createFeature("y", "int64", derivedFrom = Some("x + 1"))
    val data2 = new FeatureGroupData(g2, base)
    intercept[IllegalStateException](data2.frame)
  }

  test("metadata catalog: parquet save/load round-trips the registry") {
    import graft.meta._
    import spark.implicits._
    val fs = new FeatureStore
    val g = fs.createGroup("o", "d", "p", "sig", entityKey = Some("id"),
      acl = AccessControl(readers = Set("team"), admins = Set("root")))
    g.createFeature("clicks", "int64", default = Some(0L), tags = Set("raw"))
    g.createFeature("views", "int64")
    g.createFeature("clicks", "int64", ifExists = IfExists.Update) // v2
    g.createFeature("ctr", "float64",
      derivedFrom = Some("clicks / NULLIF(views, 0)"))
    g.deprecate("views")
    g.grant(ExternalGrant("partner", Set("ctr"),
      Some(java.time.Instant.parse("2030-01-01T00:00:00Z"))))
    fs.audit.record(AuditEntry(actor = "alice", action = "read",
      category = "read", resource = g.qualifiedName, resourceOrg = "o"))
    val g2 = fs.createGroup("o", "d", "p", "dims", entityKey = Some("id"))
    g2.createFeature("segment", "string")

    val dir = tmpDir() + "/catalog"
    MetaCatalog.save(fs, spark, dir)
    val re = MetaCatalog.load(spark, dir)

    assert(re.listGroups.map(_.qualifiedName).toSet ==
      fs.listGroups.map(_.qualifiedName).toSet)
    val rg = re.group("o/d/p/sig")
    assert(rg.entityKey.contains("id"))
    assert(rg.acl == AccessControl(Set("team"), Set(), Set("root")))
    // full version history, not just latest
    assert(rg.listVersions("clicks").map(_.version) == Seq(1, 2))
    assert(rg.feature("clicks@v1").default.contains(0L)) // re-typed
    assert(rg.feature("clicks@v1").tags == Set("raw"))
    assert(rg.feature("views").status == FeatureStatus.Deprecated)
    assert(rg.feature("ctr").derivedFrom
      .contains("clicks / NULLIF(views, 0)"))
    assert(rg.externalCanRead("partner", "ctr"))
    assert(!rg.externalCanRead("partner", "clicks"))
    // audit history preserved verbatim, not re-recorded
    assert(re.audit.query().map(e => (e.actor, e.action)).toSet ==
      fs.audit.query().map(e => (e.actor, e.action)).toSet)
    assert(re.audit.query(actor = Some("alice")).size == 1)
    // derived features re-materialize from the LOADED registry
    val base = Seq((1L, 10L, 100L)).toDF("id", "clicks", "views")
    val out = new FeatureGroupData(rg, base).frame.head()
    assert(out.getAs[Double]("ctr") == 0.1)
    // save(load(x)) is stable: a second round-trip changes nothing
    val dir2 = tmpDir() + "/catalog2"
    MetaCatalog.save(re, spark, dir2)
    val re2 = MetaCatalog.load(spark, dir2)
    assert(re2.group("o/d/p/sig").listVersions("clicks").map(_.version) ==
      Seq(1, 2))
    assert(re2.audit.query().size == re.audit.query().size)
  }

  test("catalog load keeps audit lazy: parquet-backed, filters pushed") {
    import graft.meta._
    val fs = new FeatureStore
    fs.createGroup("o", "d", "p", "g1")
    (1 to 500).foreach { i =>
      fs.audit.record(AuditEntry(actor = s"user${i % 10}", action = "read",
        category = "read", resource = s"o/d/p/g1/f$i", resourceOrg = "o"))
    }
    val dir = tmpDir() + "/lazycat"
    MetaCatalog.save(fs, spark, dir)
    val re = MetaCatalog.load(spark, dir)
    // the reloaded audit reads from parquet lazily — its DataFrame plan
    // is a file scan, not an N-row LocalRelation collected onto the driver
    val plan = re.audit.toDataFrame(spark).queryExecution.executedPlan.toString
    assert(plan.contains("Parquet"), s"expected parquet-backed audit:\n$plan")
    // a filtered query pushes the predicate into the scan and returns
    // exactly the matching slice
    val alice = re.audit.query(actor = Some("user3"))
    assert(alice.size == 50 && alice.forall(_.actor == "user3"))
    assert(re.audit.query(resource = Some("o/d/p/g1/f42")).size == 1)
    // entries recorded after load live in the in-memory tail and appear
    // alongside the persisted base
    re.audit.record(AuditEntry(actor = "user3", action = "write",
      category = "write", resource = "o/d/p/g1/fX", resourceOrg = "o"))
    assert(re.audit.query(actor = Some("user3")).size == 51)
    // saveTo over the SAME path stages+swaps (no overwrite-while-read)
    // and folds the tail into the base
    MetaCatalog.save(re, spark, dir)
    val re2 = MetaCatalog.load(spark, dir)
    assert(re2.audit.query(actor = Some("user3")).size == 51)
    // 500 reads + the createGroup entry + the post-load write
    assert(re2.audit.query().size == 502)
  }

  test("broad audit query is driver-bounded; queryFrame stays distributed") {
    import graft.meta._
    val fs = new FeatureStore
    (1 to 300).foreach { i =>
      fs.audit.record(AuditEntry(actor = s"user${i % 10}", action = "read",
        category = "read", resource = s"o/d/p/g1/f$i", resourceOrg = "o"))
    }
    val dir = tmpDir() + "/boundedcat"
    fs.audit.saveTo(spark, dir)
    // reader-side log, as MetaCatalog.load builds it: empty tail,
    // parquet-backed base
    val audit = new AuditLog
    audit.attachPersisted(spark, dir)
    // a broad query whose match count exceeds maxRows fails LOUDLY
    // instead of collecting the history onto the driver — the limit
    // rides the plan (take(maxRows+1)), so at most maxRows+1 rows ever
    // reach the driver even for the 100M-row PRD-scale table
    val e = intercept[IllegalArgumentException] {
      audit.query(maxRows = 100)
    }
    assert(e.getMessage.contains("queryFrame"))
    // narrow queries under the bound behave exactly as before
    assert(audit.query(actor = Some("user3"), maxRows = 100).size == 30)
    // the DataFrame-first surface handles the broad case without ANY
    // driver materialization, with the filter pushed into the scan
    val frame = audit.queryFrame(spark, actor = Some("user3"))
    assert(frame.count() == 30)
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(actor), EqualTo(actor,user3)]")
      || plan.contains("EqualTo(actor,user3)"), s"no pushdown:\n$plan")
  }

  test("point lookup via entity key") {
    import graft.meta._
    import spark.implicits._
    val fs = new FeatureStore
    val g = fs.createGroup("o", "d", "p", "users", entityKey = Some("id"))
    val base = (1L to 100L).map(i => (i, i * 2)).toDF("id", "score")
    val data = new FeatureGroupData(g, base)
    val got = data.get(Seq(5L, 10L), Seq("score")).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(5L, 10L))
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 20L))
  }

  test("scd2: close-and-reopen on change, idempotent, as-of reads") {
    import spark.implicits._
    import graft.etl.Scd
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val history = Seq(
      (1L, 10.0, ts("2024-01-01 00:00:00"), null: java.sql.Timestamp),
      (2L, 20.0, ts("2024-01-01 00:00:00"), null: java.sql.Timestamp))
      .toDF("k", "v", "valid_from", "valid_to")
    val updates = Seq(
      (1L, 99.0, ts("2024-02-01 00:00:00")),  // change
      (2L, 20.0, ts("2024-02-01 00:00:00")),  // no-op
      (3L, 30.0, ts("2024-02-01 00:00:00")))  // new key
      .toDF("k", "v", "ts")
    val h1 = Scd.scd2Apply(history, updates, Seq("k"), Seq("v"), "ts")
    val rows = h1.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getTimestamp(3)).map(_.toString.take(10)).orNull))
    assert(rows.toSeq == Seq(
      (1L, 10.0, "2024-02-01"), (1L, 99.0, null),
      (2L, 20.0, null), (3L, 30.0, null)))
    // idempotent: re-applying the same batch changes nothing
    val h2 = Scd.scd2Apply(h1, updates, Seq("k"), Seq("v"), "ts")
    assert(h2.count() == h1.count())
    // as-of reads pick the version valid at the asked instant
    val before = Scd.asOf(h1, lit(ts("2024-01-15 00:00:00")))
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(before.toSeq == Seq(1L -> 10.0, 2L -> 20.0))
    val after = Scd.asOf(h1, lit(ts("2024-03-01 00:00:00")))
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(after.toSeq == Seq(1L -> 99.0, 2L -> 20.0, 3L -> 30.0))
  }

  // -------------------------------------------------------------- upsert

  test("upsert: idempotent, new rows win, appends keep history") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val target = ParquetTarget(dir, orderColumn = Some("v"))
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    target.write(base, WriteMode.Full)
    val upd = Seq((2L, 99L), (3L, 30L)).toDF("k", "v")
    target.write(upd, WriteMode.Upsert, keys = Seq("k"))
    val after = spark.read.parquet(dir).orderBy("k").as[(Long, Long)].collect()
    assert(after.toSeq == Seq((1L, 10L), (2L, 99L), (3L, 30L)))
    // idempotence: MERGE twice ≡ once
    target.write(upd, WriteMode.Upsert, keys = Seq("k"))
    val again = spark.read.parquet(dir).orderBy("k").as[(Long, Long)].collect()
    assert(again.toSeq == after.toSeq)
  }

  // ------------------------------------------------- job runner + quality

  test("job: end-to-end run, checkpoint advance, incremental ≡ full") {
    import spark.implicits._
    val root = tmpDir()
    val srcDir = s"$root/src"
    val cps = new CheckpointStore(s"$root/cp")

    def writeBatch(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("id", "ts", "v")
        .withColumn("ts", col("ts").cast("timestamp"))
        .write.mode("append").parquet(srcDir)

    writeBatch(Seq((1L, "2024-01-01 00:00:00", 1.0), (2L, "2024-01-02 00:00:00", 2.0)))

    val job = new Job(
      jobId = "j1",
      sources = Seq(FileSource("ev", srcDir)),
      transform = SqlTransform("SELECT id, ts, v * 2 AS v2 FROM ev"),
      target = ParquetTarget(s"$root/out"),
      incremental = IncrementalConfig(WriteMode.Append, Some("ts")),
      qualityChecks = Seq(NullCheck("v2", 0.0), RowCountCheck(minRows = Some(1))),
      checkpoints = cps)
    intercept[IllegalArgumentException] { // not activated
      val j2 = new Job("bad", Nil, SqlTransform("SELECT 1"),
        ParquetTarget(s"$root/x"), checkpoints = cps)
      j2.activate()
    }
    job.activate()

    val r1 = job.run(spark)
    assert(r1.state == "success" && r1.rowsWritten == 2)
    assert(cps.get("j1").contains("2024-01-02 00:00:00"))

    // second batch: only the new row flows (cursor pushed into the scan)
    writeBatch(Seq((3L, "2024-01-03 00:00:00", 3.0)))
    val r2 = job.run(spark)
    assert(r2.state == "success" && r2.rowsWritten == 1)
    assert(cps.get("j1").contains("2024-01-03 00:00:00"))

    // incremental-equals-full: appended output ≡ one full pass
    val incr = spark.read.parquet(s"$root/out").orderBy("id")
      .select("id", "v2").as[(Long, Double)].collect().toSeq
    assert(incr == Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)))
    assert(job.runHistory.size == 2)
  }

  test("job: quality gate failure marks run failed") {
    import spark.implicits._
    val root = tmpDir()
    val cps = new CheckpointStore(s"$root/cp")
    Seq((1L, java.lang.Double.valueOf(1.0)), (2L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "v").write.parquet(s"$root/src")
    val job = new Job("jq", Seq(FileSource("s", s"$root/src")),
      SqlTransform("SELECT * FROM s"), ParquetTarget(s"$root/out"),
      qualityChecks = Seq(NullCheck("v", 0.1)), checkpoints = cps)
    job.activate()
    val r = job.run(spark)
    assert(r.state == "failed" && r.error.exists(_.contains("null_check")))
  }

  test("quality checks evaluate in one pass with correct outcomes") {
    import spark.implicits._
    val df = Seq((1L, 5.0, "a"), (2L, 50.0, "b"), (2L, -1.0, null))
      .toDF("k", "x", "s")
    val report = QualityCheck.runAll(Seq(
      NullCheck("s", 0.5),            // 1/3 nulls → pass
      NullCheck("s", 0.1, "WARNING"), // warn-only fail
      UniqueCheck(Seq("k")),          // dup key 2 → fail
      RangeCheck("x", 0, 100),        // -1 out of range → fail
      RowCountCheck(minRows = Some(2), maxRows = Some(10)),
      CustomCheck("has-a", d => d.where(col("s") === "a").count() == 1)),
      df)
    val byName = report.results.map(r => r.name -> r.passed).toMap
    assert(byName("null_check(s<=0.5)"))
    assert(!byName("null_check(s<=0.1)"))
    assert(!byName("unique_check(k)"))
    assert(!byName("range_check(x)"))
    assert(byName("row_count_check"))
    assert(byName("has-a"))
    assert(report.failed && report.warnings.size == 1)
  }

  // ----------------------------------------------------------- live table

  test("live table: refresh, query with -col desc, pause/resume, history") {
    import spark.implicits._
    val root = tmpDir()
    var version = 0
    val lt = new graft.live.LiveTable("lt1", spark,
      s => { Seq((1, version), (2, version * 2)).toDF("k", "v") },
      s"$root/mat")
    assert(lt.refresh().exists(_.rows == 2))
    version = 10
    lt.pause()
    assert(lt.refresh().isEmpty) // paused
    assert(lt.refresh(force = true).isDefined)
    lt.resume()
    val rows = lt.query(filter = Some("v >= 0"), orderBy = Seq("-v"))
      .collect().map(_.getInt(1)).toSeq
    assert(rows == Seq(20, 10))
    assert(lt.refreshHistory.size == 2)
  }

  test("result cache honors freshness (client.py:63-79)") {
    import graft.meta.ResultCache
    import java.time.{Duration, Instant}
    val rc = new ResultCache
    val spec = graft.analysis.Aggregation("x")
    var computes = 0
    def compute = { computes += 1; spark.range(1).toDF() }
    val t0 = Instant.now()
    rc.getOrCompute(spec, rc.Within(Duration.ofHours(1)), t0)(compute)
    rc.getOrCompute(spec, rc.Within(Duration.ofHours(1)), t0.plusSeconds(60))(compute)
    assert(computes == 1) // cache hit within 1h
    rc.getOrCompute(spec, rc.Within(Duration.ofHours(1)),
      t0.plusSeconds(7200))(compute)
    assert(computes == 2) // stale → recompute
    rc.getOrCompute(spec, rc.RealTime, t0)(compute)
    assert(computes == 3) // real-time never cached
    assert(rc.parseDuration("2h") == Duration.ofHours(2))
    intercept[IllegalArgumentException](rc.parseDuration("5x"))
  }

  // ----------------------------------------------------------- multimodal

  test("blob integrity + feature extraction plumbing") {
    import spark.implicits._
    import graft.ops.Multimodal
    val df = Seq(("u1", "payload-one"), ("u2", "payload-two"))
      .toDF("uri", "payload")
      .withColumn("payload", col("payload").cast("binary"))
      .withColumn("ref", Multimodal.blobRef(col("uri"), lit("text/plain"),
        col("payload")))
    val ok = Multimodal.blobIntegrity(df, "ref", "payload").collect()(0)
    assert(ok.getAs[Long]("n_invalid") == 0)
    val feats = Multimodal.extractFeatures(df, "uri", "payload", dim = 4)
    assert(feats.count() == 2)
    assert(feats.schema.fieldNames.toSeq == Seq("uri", "features", "n_bytes"))
  }

  test("frame sampling slices every Nth fixed-size block") {
    import spark.implicits._
    import graft.ops.Multimodal
    // 10 frames × 4 bytes; frame i filled with byte value i
    val payload = (0 until 10).flatMap(i => Array.fill(4)(i.toByte)).toArray
    val df = Seq(("v1", payload)).toDF("uri", "payload")
    val frames = Multimodal.frameSample(df, "uri", "payload", 4, 3)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(frames.forall(_.getLong(3) == 10L))
    val f3 = frames(1).getAs[Array[Byte]]("frame")
    assert(f3.toSeq == Seq.fill(4)(3.toByte))
    // short tail payload: last frame keeps the overhang bytes
    val odd = Seq(("v2", Array.tabulate(6)(_.toByte))).toDF("uri", "payload")
    val tail = Multimodal.frameSample(odd, "uri", "payload", 4, 1)
      .orderBy("frame_idx").collect()
    assert(tail.length == 2 && tail(1).getAs[Array[Byte]]("frame").length == 2)
  }

  // ----------------------------------------------------------- dashboards

  test("dashboard renders chart data from a real AnalysisPlanner run") {
    import spark.implicits._
    import graft.analysis._
    import graft.dash._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0), ("b", 7.0))
      .toDF("seg", "x")
    val dash = Dashboard("ops", "Ops")
      .withChart(Chart("X by segment", ChartType.Bar, "agg",
        x = Some("seg"), y = Seq("avg")))
      .withChart(Chart("X histogram", ChartType.Histogram, "hist",
        x = Some("bucket"), y = Seq("n")))
    val html = dash.renderAnalyses(df, Map(
      "agg" -> Aggregation(feature = "x", metrics = Seq("avg", "count"),
        groupBy = Seq("seg")),
      "hist" -> Distribution(feature = "x", bins = 3)))
    assert(html.contains("X by segment") && html.contains("<table>"))
    // real values from the planner: avg(a)=2.0, count(b)=3
    assert(html.contains("2.0") && html.contains("3"))
    val data = dash.materialize(Map(
      "agg" -> AnalysisPlanner.plan(df,
        Aggregation(feature = "x", metrics = Seq("count"),
          groupBy = Seq("seg")))))
    assert(data("agg").map(m => m("seg") -> m("count")).toMap ==
      Map("a" -> 2L, "b" -> 3L))
  }
}
