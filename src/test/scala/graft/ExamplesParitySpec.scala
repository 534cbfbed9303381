package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis._
import graft.etl._
import graft.meta._

/**
 * End-to-end parity with the reference's executable walkthroughs —
 * `examples/06_analytics.py` and `examples/07_transformations.py`
 * replayed top-to-bottom as ONE narrative, asserting each stage's
 * output: create groups → derived features → every analysis family →
 * freshness cache → live table → dashboard → alerts → async job →
 * sources → SQL + Scala transforms → schedules → incremental modes →
 * job execution with quality gates → checkpoint advance. The closest
 * thing to the reference's user journey, and a regression net for the
 * whole API surface as one composition (each piece also has focused
 * specs; this test is about the seams).
 */
class ExamplesParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftex").toString

  test("example 06 parity: analytics walkthrough end to end") {
    import spark.implicits._
    // -- Setup: feature group with base + derived features (06:26-49)
    val fs = new FeatureStore
    val g = fs.createGroup("demo_org", "ml", "reco", "user_features",
      entityKey = Some("user_id"))
    g.createFeature("age", "int64")
    g.createFeature("purchase_amount", "float64")
    g.createFeature("segment", "string")
    g.createFeature("event_ts", "timestamp")
    g.createFeature("spend_per_year", "float64",
      derivedFrom = Some("purchase_amount / age"))
    val rng = new scala.util.Random(42)
    val base = (1 to 400).map { i =>
      (i.toLong, 20 + i % 50, (i % 50) * 10.0 + rng.nextGaussian(),
        if (i % 3 == 0) "premium" else "standard",
        java.sql.Timestamp.valueOf(s"2024-03-${1 + i % 28}%02d 10:00:00"
          .replace("%02d", "")))
    }.toDF("user_id", "age", "purchase_amount", "segment", "event_ts")
    val data = new FeatureGroupData(g, base)
    val client = new AnalyticsClient(data)

    // -- Aggregation: simple, time-windowed, rolling (06:51-95)
    val simple = client.analyze(Aggregation("purchase_amount",
      Seq("count", "avg", "min", "max", "stddev"))).head
    assert(simple.getLong(0) == 400L)
    val windowed = client.analyze(Aggregation("purchase_amount",
      Seq("count", "avg"), window = Some("7d"),
      timeColumn = "event_ts")).head
    assert(windowed.getLong(0) > 0 && windowed.getLong(0) < 400L)
    val rolling = client.analyze(Aggregation("purchase_amount",
      Seq("avg"), rolling = true, periods = Some(3),
      timeColumn = "event_ts"))
    assert(rolling.count() > 3)

    // -- Distribution: histogram + segmented (06:96-126)
    val hist = client.analyze(Distribution("purchase_amount", bins = 10))
    assert(hist.count() >= 5 && hist.count() <= 10) // empty bins absent
    assert(hist.agg(sum("n")).head.getLong(0) == 400L)
    val seg = client.analyze(Distribution("purchase_amount", bins = 5,
      segmentBy = Some("segment")))
    assert(seg.select("segment").distinct().count() == 2)

    // -- Correlation (06:127-149): ONE wide row, a column per pair;
    // the derived feature participates like any base column
    val corr = client.analyze(Correlation(
      Seq("age", "purchase_amount", "spend_per_year"))).head
    assert(corr.length == 3) // 3 pair columns
    val ap = corr.getAs[Double]("corr_age__purchase_amount")
    assert(math.abs(ap) <= 1.0)

    // -- Version diff (06:150-178): old vs shifted new side
    val vd = client.analyze(VersionDiff("purchase_amount",
      sideA = "user_id <= 200", sideB = "user_id > 200"))
    assert(vd.columns.contains("psi"))

    // -- Statistical testing (06:179-202)
    val st = client.analyze(StatTest("purchase_amount", "welch",
      segmentBy = "segment", control = "standard",
      treatment = "premium")).head
    assert(st.getAs[Long]("n_c") + st.getAs[Long]("n_t") == 400L)
    val pValue = graft.analysis.Stats.tTestPValue(
      st.getAs[Double]("t_stat"), st.getAs[Double]("df_welch"))
    assert(pValue >= 0 && pValue <= 1)

    // -- Record lookup: sample + filter (06:203-233)
    val sample = client.analyze(RecordLookup(limit = 10))
    assert(sample.count() == 10)
    val filtered = client.analyze(RecordLookup(
      features = Seq("user_id", "segment"),
      filter = Some("segment = 'premium'"), limit = 5))
    assert(filtered.columns.toSeq == Seq("user_id", "segment"))
    assert(filtered.collect().forall(_.getString(1) == "premium"))

    // -- Freshness control (06:234-262): cached vs real-time
    val cache = new ResultCache
    var computes = 0
    val spec = Aggregation("purchase_amount", Seq("count"))
    def compute() = { computes += 1; client.analyze(spec) }
    cache.getOrCompute(spec, cache.Cached)(compute())
    cache.getOrCompute(spec, cache.Cached)(compute())
    assert(computes == 1) // second hit served from cache
    cache.getOrCompute(spec, cache.RealTime)(compute())
    assert(computes == 2) // real-time always recomputes

    // -- Live table with refresh + history (06:263-304)
    val root = tmpDir()
    val lt = new graft.live.LiveTable("seg_stats", spark,
      s => {
        base.createOrReplaceTempView("users_live")
        s.sql("SELECT segment, count(*) AS n, avg(purchase_amount) AS m" +
          " FROM users_live GROUP BY segment")
      },
      s"$root/live")
    assert(lt.refresh().isDefined)
    assert(lt.query().count() == 2)
    assert(lt.query(filter = Some("segment = 'premium'")).count() == 1)
    assert(lt.refreshHistory.size == 1)

    // -- Dashboard: params + charts + JSON render + publish (06:305-408)
    val dash = graft.dash.Dashboard("user-quality", "User quality")
      .copy(parameters = Seq(graft.dash.Parameter("segment",
        graft.dash.ParamType.Select,
        options = Seq("premium", "standard"))))
      .withChart(graft.dash.Chart("Spend histogram",
        graft.dash.ChartType.Histogram, "hist", x = Some("bin"),
        y = Seq("count")))
      .withChart(graft.dash.Chart("Live segments",
        graft.dash.ChartType.Table, "seg_stats"))
    val json = dash.toJson
    assert(json.contains("Spend histogram") && json.contains("segment"))
    assert(dash.publish.published)

    // -- Alerts: null-rate, drift, significance (06:409-471)
    val nullAlert = new graft.alerts.Alert("high_null_rate",
      graft.alerts.Cmp("null_rate", "gt", 0.1))
    val nr = client.analyze(Aggregation("purchase_amount",
      Seq("null_rate"))).head.getDouble(0)
    assert(!nullAlert.check(Map("null_rate" -> nr)).fired) // clean data
    val driftAlert = new graft.alerts.Alert("drift",
      graft.alerts.Condition.psiGt(0.2))
    val psi = vd.head.getAs[Double]("psi")
    driftAlert.check(Map("psi" -> psi))
    val sigAlert = new graft.alerts.Alert("significant",
      graft.alerts.Condition.pValueLt(0.05))
    sigAlert.check(Map("p_value" -> pValue))
    assert(Seq(nullAlert, driftAlert, sigAlert)
      .forall(_.events.nonEmpty)) // every alert evaluated + recorded

    // -- Async analysis (06:473-496)
    import scala.concurrent.ExecutionContext.Implicits.global
    val job = client.analyzeAsync(Aggregation("purchase_amount",
      Seq("count", "sum")))
    job.start()
    assert(job.waitFor(30000) == "completed")
    assert(job.result.head.getLong(0) == 400L)
  }

  test("example 07 parity: transformations + ETL walkthrough end to end") {
    import spark.implicits._
    val root = tmpDir()
    // -- Setup: clickstream source data on disk (07:39-77)
    val clicks = (1 to 300).map { i =>
      (i.toLong, s"user_${i % 50}", if (i % 10 == 0) "purchase" else "click",
        java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00"))
    }.toDF("event_id", "user_id", "action", "event_ts")
    clicks.write.parquet(s"$root/clickstream")

    // -- Source types (07:238-283): file, table, feature group
    val fileSrc = FileSource("clicks", s"$root/clickstream", "parquet")
    assert(fileSrc.read(spark).count() == 300)
    clicks.createOrReplaceTempView("clicks_tbl")
    val tblSrc = TableSource("t", "clicks_tbl",
      columns = Seq("event_id", "action"),
      filter = Some("action = 'purchase'"))
    assert(tblSrc.read(spark).count() == 30)
    val fs = new FeatureStore
    val fg = fs.createGroup("demo_org", "ml", "reco", "clicks_fg",
      entityKey = Some("event_id"))
    fg.createFeature("action", "string")
    val fgSrc = FeatureGroupSource("fg",
      new FeatureGroupData(fg, clicks), features = Seq("event_id", "action"))
    assert(fgSrc.read(spark).columns.toSeq == Seq("event_id", "action"))

    // -- Schedule types (07:284-315)
    assert(Schedule.manual.kind == "manual")
    assert(Schedule.cron("0 2 * * *").cron.contains("0 2 * * *"))

    // -- SQL transform with checkpoint substitution (07:63-122)
    val cps = new CheckpointStore(s"$root/ckpt")
    val sqlJob = new Job("user_activity",
      sources = Seq(fileSrc),
      transform = SqlTransform(
        """SELECT user_id, count(*) AS n_events,
           sum(CASE WHEN action = 'purchase' THEN 1 ELSE 0 END)
             AS n_purchases,
           max(event_ts) AS event_ts
           FROM clicks WHERE event_ts > {{checkpoint}}
           GROUP BY user_id"""),
      target = ParquetTarget(s"$root/user_activity"),
      incremental = IncrementalConfig.incremental("event_ts"),
      // NOTE no row-count floor: an incremental job's steady-state
      // empty batch is a SUCCESS, not a gate failure
      qualityChecks = Seq(
        NullCheck("user_id", 0.0),
        UniqueCheck(Seq("user_id"))),
      schedule = Schedule.daily,
      checkpoints = cps)
    sqlJob.activate()
    val run1 = sqlJob.run(spark)
    assert(run1.state == "success", s"run1: ${run1.error}")
    assert(run1.rowsRead == 300L && run1.rowsWritten == 50L)
    assert(run1.qualityReport.exists(!_.failed))
    assert(cps.get("user_activity").isDefined) // cursor advanced
    // incremental second run: nothing new past the checkpoint → 0 rows
    val run2 = sqlJob.run(spark)
    assert(run2.state == "success", s"run2: ${run2.error}")
    assert(run2.rowsRead == 0L)

    // -- Scala (Python-analog) transform computing CTR (07:123-237)
    val ctrJob = new Job("ctr",
      sources = Seq(fileSrc),
      transform = FnTransform { (_, srcs) =>
        srcs("clicks").groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("action") === "purchase", 1.0).otherwise(0.0))
              .as("p"))
          .withColumn("ctr", col("p") / col("n"))
      },
      target = ParquetTarget(s"$root/ctr"),
      checkpoints = cps)
    ctrJob.activate()
    val ctrRun = ctrJob.run(spark)
    assert(ctrRun.state == "success" && ctrRun.rowsWritten == 50L)
    val ctr = spark.read.parquet(s"$root/ctr")
    assert(math.abs(ctr.agg(avg("ctr")).head.getDouble(0) - 0.1) < 0.01)

    // -- Quality-gate failure path (07 job execution contract): a
    // violated ERROR check fails the run and writes nothing
    val badJob = new Job("bad",
      sources = Seq(fileSrc),
      transform = SqlTransform(
        "SELECT user_id, NULL AS flag FROM clicks"),
      target = ParquetTarget(s"$root/bad"),
      qualityChecks = Seq(NullCheck("flag", 0.0)),
      checkpoints = cps)
    badJob.activate()
    val badRun = badJob.run(spark)
    assert(badRun.state == "failed")
    assert(badRun.error.exists(_.contains("quality")))
    assert(!new java.io.File(s"$root/bad").exists())
    assert(badJob.status == JobStatus.Failed)

    // -- Run history is the audit surface (07:346-ff)
    assert(sqlJob.runHistory.map(_.state) == Seq("success", "success"))
  }
}
