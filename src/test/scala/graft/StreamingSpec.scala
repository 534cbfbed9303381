package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAgg

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftstream").toString

  test("tumbling/sliding/session helpers compute correct batch windows") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-01 00:01:00", "a", 1.0),
      ("2024-01-01 00:04:00", "a", 2.0),
      ("2024-01-01 00:06:00", "a", 4.0),
      ("2024-01-01 00:06:30", "b", 8.0))
      .toDF("ts", "k", "v")
      .withColumn("ts", col("ts").cast("timestamp"))

    val tum = StreamingAgg.tumbling(df, "ts", "5m", "10m", Seq("k"),
      Seq(sum($"v").as("s"), count(lit(1)).as("n")))
      .orderBy("window_start", "k")
      .select("k", "s", "n").collect()
    assert(tum.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("a", 3.0, 2L), ("a", 4.0, 1L), ("b", 8.0, 1L)))

    val sli = StreamingAgg.sliding(df, "ts", "10m", "5m", "10m", Seq("k"),
      Seq(sum($"v").as("s")))
    // window containing everything for k=a: [00:00,00:10) → 7.0
    assert(sli.where($"k" === "a").agg(max($"s")).first().getDouble(0) == 7.0)

    val ses = StreamingAgg.session(df, "ts", "3m", "10m", Seq("k"),
      Seq(sum($"v").as("s"), count(lit(1)).as("n")))
      .orderBy("window_start", "k").collect()
    // a: events at 1,4,6 chain into one session (gaps 3m,2m ≤ 3m);  b: one
    assert(ses.length == 2)
    assert(ses.map(_.getAs[Double]("s")).toSeq == Seq(7.0, 8.0))
  }

  test("flatMapGroupsWithState running features: batch semantics + stream run") {
    import spark.implicits._
    import graft.streaming._
    // batch semantics: whole input is one group pass
    val batch = Seq(
      FeatureEvent("a", 1.0, 10L), FeatureEvent("a", 3.0, 20L),
      FeatureEvent("a", 2.0, 15L), FeatureEvent("b", 8.0, 5L)).toDS()
    val out = StatefulFeatures.runningFeatures(batch)
      .collect().map(s => s.key -> s).toMap
    assert(out("a").count == 3 && out("a").mean == 2.0 &&
      out("a").last == 3.0 && out("a").lastTs == 20L)
    assert(out("b").count == 1 && out("b").last == 8.0)

    // real incremental stream: two files, state carries across batches
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    Seq(FeatureEvent("a", 1.0, 10L), FeatureEvent("a", 3.0, 20L))
      .toDS().write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[FeatureEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir).as[FeatureEvent]
    val q = StatefulFeatures.runningFeatures(stream).writeStream
      .outputMode("append").format("memory").queryName("statefeat")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val last = spark.sql(
      "SELECT count, mean, last FROM statefeat ORDER BY count DESC LIMIT 1")
      .collect()(0)
    assert(last.getLong(0) == 2 && last.getDouble(1) == 2.0 &&
      last.getDouble(2) == 3.0)
  }

  test("sessionStream: gap splits sessions; watermark timeout closes idle") {
    import spark.implicits._
    import graft.streaming._
    // base well above epoch 0: an event AT the initial watermark (0)
    // would be dropped as late in the stream run
    val base = 1700000000L
    def ts(sec: Long) = new java.sql.Timestamp((base + sec) * 1000L)
    def rel(ms: Long) = ms - base * 1000L
    // batch semantics: one pass, sessions split on the 10s gap; the
    // final open session stays in state (batch mode never times out),
    // so only the CLOSED one is emitted
    val batch = Seq(("a", ts(0)), ("a", ts(5)), ("a", ts(8)),
      ("a", ts(30)), ("b", ts(1)))
      .toDF("k", "t")
    val closed = StatefulFeatures
      .sessionStream(batch, "k", "t", gapMs = 10000L)
      .collect()
    assert(closed.length == 1)
    assert(closed.head.key == "a" && rel(closed.head.sessionStart) == 0L &&
      rel(closed.head.sessionEnd) == 8000L && closed.head.nEvents == 3)

    // real stream: batch 1 opens a session for a; batch 2 carries only
    // b events far in the future, so the advancing watermark TIMES OUT
    // a's idle session — the engine closes it with no further a events
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    Seq(("a", ts(0)), ("a", ts(5))).toDF("k", "t")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq(("b", ts(1000)), ("b", ts(1001))).toDF("k", "t")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = StatefulFeatures
      .sessionStream(stream, "k", "t", gapMs = 10000L,
        watermarkDelay = Some("1 second"))
      .writeStream
      .outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT key, sessionStart, sessionEnd, nEvents FROM sessions")
      .collect().map(r => (r.getString(0), rel(r.getLong(1)),
        rel(r.getLong(2)), r.getLong(3))).toSet
    // a's session closed BY TIMEOUT (no later a event arrived)
    assert(rows.contains(("a", 0L, 5000L, 2L)), s"got $rows")
  }

  test("streaming ewma equals the batch operator across batch splits") {
    import spark.implicits._
    import graft.streaming._
    val events = (1 to 10).map(i =>
      FeatureEvent("a", i.toDouble * i, i * 10L)) ++
      (1 to 4).map(i => FeatureEvent("b", 100.0 - i, i * 10L))
    // batch reference via the ops.TimeSeries kernel
    val ref = graft.ops.TimeSeries
      .ewma(events.toDS().toDF(), Seq("key"), "ts", "value", span = 5)
      .select("key", "ts", "ewma").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // batch-mode flatMapGroupsWithState gives the same series
    val direct = StatefulFeatures.ewmaStream(events.toDS(), span = 5)
      .collect().map(p => (p.key, p.ts) -> p.ewma).toMap
    assert(direct.keySet == ref.keySet)
    direct.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-12) }
    // incremental delivery: state carries across micro-batches
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    events.grouped(5).foreach(chunk =>
      // one file per chunk so micro-batch order follows event time
      chunk.toDS().coalesce(1).write.mode("append").parquet(srcDir))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[FeatureEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir).as[FeatureEvent]
    val q = StatefulFeatures.ewmaStream(stream, span = 5).writeStream
      .outputMode("append").format("memory").queryName("ewmastream")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT key, ts, ewma FROM ewmastream")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(streamed.keySet == ref.keySet)
    streamed.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-12) }
  }

  test("streaming page-hinkley equals the batch detector across splits") {
    import spark.implicits._
    import graft.streaming._
    // one observation per day: step shift at day 11 for key a, flat b
    val days = (1 to 20).map { i =>
      PhEvent("a", i.toLong, if (i <= 10) 0.0 else 5.0)
    } ++ (1 to 8).map(i => PhEvent("b", i.toLong, 2.0))
    val withTs = days.map(e => ("k" + e.key,
      java.sql.Timestamp.valueOf(f"2024-01-${e.ts}%02d 12:00:00"),
      e.value))
    val ref = graft.ops.TimeSeries
      .pageHinkley(withTs.toDF("k", "ts", "v"), Seq("k"), "ts", "v",
        delta = 0.0, lambda = 1.0)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_alarm_days"), r.getAs[Double]("max_ph")))
      .toMap
    // batch-mode flatMapGroupsWithState reproduces the batch summary
    val direct = StreamingChangepoint
      .pageHinkleyStream(days.toDS(), delta = 0.0, lambda = 1.0)
      .collect()
    def summarize(vs: Seq[PhVerdict]) = vs.groupBy(_.key).map {
      case (k, rows) =>
        k -> (rows.count(_.alarm).toLong, rows.map(_.gap).max)
    }
    val ds = summarize(direct.toSeq)
    assert(ds("a")._1 == ref("ka")._1 && ds("b")._1 == ref("kb")._1)
    assert(math.abs(ds("a")._2 - ref("ka")._2) < 1e-12)
    assert(math.abs(ds("b")._2 - ref("kb")._2) < 1e-12)
    assert(direct.filter(v => v.key == "a" && v.alarm)
      .map(_.ts).min == 11L)
    // incremental delivery: the same verdicts across micro-batches
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    days.grouped(7).foreach(chunk =>
      chunk.toDS().coalesce(1).write.mode("append").parquet(srcDir))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[PhEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir).as[PhEvent]
    val q = StreamingChangepoint
      .pageHinkleyStream(stream, delta = 0.0, lambda = 1.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("phstream").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT * FROM phstream").as[PhVerdict]
      .collect()
    val ss = summarize(streamed.toSeq)
    assert(ss == ds)
  }

  test("streaming anomaly: strict-prior Welford scoring across batches") {
    import spark.implicits._
    import graft.streaming._
    // batch semantics first: stable 10s then a spike for key a
    val batch = ((1 to 6).map(i =>
      FeatureEvent("a", 10.0 + (i % 2) * 0.2, i * 10L)) :+
      FeatureEvent("a", 50.0, 100L)).toDS()
    val out = StatefulFeatures.anomalyStream(batch, z = 3.0)
      .collect().sortBy(_.ts)
    // first two events: under minPrior → no score
    assert(out.take(2).forall(v => v.zscore.isEmpty && !v.anomaly))
    // the spike is flagged against the PRIOR baseline of ~10s
    val spike = out.last
    assert(spike.value == 50.0 && spike.anomaly && spike.zscore.get > 3.0)
    // stable points are not flagged
    assert(out.dropRight(1).forall(!_.anomaly))

    // incremental stream: baseline arrives in batch 1, spike in batch 2
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    (1 to 6).map(i => FeatureEvent("a", 10.0 + (i % 2) * 0.2, i * 10L))
      .toDS().write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[FeatureEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir).as[FeatureEvent]
    val outDir = s"$root/verdicts"
    def runOnce(): Unit = {
      // foreachBatch sink: memory-sink queries refuse checkpoint
      // restarts, and state must survive across separate runs here
      val q = StatefulFeatures.anomalyStream(stream, z = 3.0).writeStream
        .outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[AnomalyVerdict], _: Long) =>
            b.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt").start()
      q.awaitTermination(60000)
    }
    runOnce()
    Seq(FeatureEvent("a", 50.0, 100L)).toDS()
      .write.mode("append").parquet(srcDir)
    runOnce()
    // the spike scored against state carried from the PREVIOUS run
    val verdicts = spark.read.parquet(outDir)
    assert(verdicts.count() == 7)
    val flagged = verdicts.where(col("anomaly"))
      .collect().map(_.getAs[Double]("value"))
    assert(flagged.toSeq == Seq(50.0))
  }

  test("streaming sketch profiles merge into whole-history estimates") {
    import spark.implicits._
    import graft.etl._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = ParquetTarget(s"$root/profiles")
    // two waves with overlapping uid populations: 0..5999, 3000..8999
    (0 until 6000).map(i => (i.toLong, i.toDouble)).toDF("uid", "v")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingProfile
        .profileEachBatch(
          spark.readStream.schema(schema).parquet(srcDir),
          Seq("uid"), "v", store)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt").start()
      q.awaitTermination(60000)
    }
    runOnce()
    (3000 until 9000).map(i => (i.toLong, i.toDouble)).toDF("uid", "v")
      .write.mode("append").parquet(srcDir)
    runOnce()
    // one profile row per batch, KB-sized
    assert(spark.read.parquet(store.path).count() == 2)
    val merged = graft.streaming.StreamingProfile
      .corpusProfile(spark, store.path, Seq("uid"), "v").head()
    // true union: 9000 distinct uids over 12000 rows; HLL ±2%
    assert(merged.getAs[Long]("n_rows") == 12000)
    val est = merged.getAs[Long]("uid_distinct_est")
    assert(math.abs(est - 9000) < 400, s"est $est")
    // whole-history median of 0..5999 ++ 3000..8999 ≈ 4500 (KLL ~1.65%)
    val p50 = merged.getAs[Double]("v_p50")
    assert(math.abs(p50 - 4500) < 300, s"p50 $p50")
  }

  test("streaming drift monitor scores windows against a static baseline") {
    import spark.implicits._
    import graft.streaming._
    val rnd = new scala.util.Random(23)
    // baseline: N(0, 1)-ish
    val base = (1 to 4000).map(_ => rnd.nextGaussian()).toDF("v")
    val bl = StreamingDrift.baselineOf(base, "v", 10)
    assert(math.abs(bl.props.sum - 1.0) < 1e-9)

    // window 1: same distribution; window 2: shifted by +2
    def ts(min: Int) = f"2024-01-01 00:$min%02d:00"
    val events = ((1 to 2000).map(i => (ts(1), rnd.nextGaussian())) ++
      (1 to 2000).map(i => (ts(11), rnd.nextGaussian() + 2.0)))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))

    // batch backtest path
    val scored = StreamingDrift.monitor(events, "ts", "v", bl, "10m", "5m")
      .orderBy("window_start").collect()
    assert(scored.length == 2)
    val (psiSame, psiShift) =
      (scored(0).getAs[Double]("psi"), scored(1).getAs[Double]("psi"))
    assert(psiSame < 0.1, s"same-distribution psi $psiSame")
    assert(psiShift > 1.0, s"shifted psi $psiShift")

    // real stream run produces the same two windows
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    events.write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    // update mode: the monitor emits each window's current score as
    // data arrives (the natural mode for an alerting sink)
    val q = StreamingDrift.monitor(stream, "ts", "v", bl, "10m", "5m")
      .writeStream.outputMode("update").format("memory").queryName("driftout")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val emitted = spark
      .sql("SELECT psi FROM driftout ORDER BY window_start").collect()
    assert(emitted.length == 2)
    assert(emitted(0).getDouble(0) < 0.1 && emitted(1).getDouble(0) > 1.0)

    // alert attachment: fires once, on the shifted window only
    val alert = new graft.alerts.Alert("drift",
      graft.alerts.Condition.psiGt(0.5))
    val q2 = StreamingDrift.alertOn(
      StreamingDrift.monitor(
        spark.readStream.schema(events.schema).parquet(srcDir),
        "ts", "v", bl, "10m", "5m"),
      alert, s"$root/ckpt2", Some(Trigger.AvailableNow()),
      outputMode = "update") // single-batch test source never closes windows
    q2.awaitTermination(60000)
    assert(alert.events.count(_.fired) == 1)
  }

  test("watermarked stream dedup keeps first row per key") {
    import spark.implicits._
    import graft.streaming._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    Seq(("2024-01-01 00:01:00", "k1", 1.0), ("2024-01-01 00:02:00", "k1", 2.0),
      ("2024-01-01 00:03:00", "k2", 3.0))
      .toDF("ts", "k", "v").withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = StatefulFeatures.dedupStream(stream, "ts", "10m", Seq("k"))
      .writeStream.outputMode("append").format("memory").queryName("dedupout")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT k, v FROM dedupout ORDER BY k").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSeq == Seq("k1", "k2"))
  }

  test("streaming upsert sink merges micro-batches through the staged commit") {
    import spark.implicits._
    import graft.etl._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val tgt = ParquetTarget(s"$root/table", orderColumn = Some("v"))

    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingSink
        .upsertEachBatch(spark.readStream.schema(schema).parquet(srcDir),
          tgt, Seq("id"))
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    // second wave: update id=2, insert id=3; new files, same checkpoint
    Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val rows = spark.read.parquet(s"$root/table").select("id", "v")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 25.0), (3L, 30.0)))
    // no protocol litter after streaming commits
    assert(!new java.io.File(s"$root/table.staged").exists &&
      !new java.io.File(s"$root/table.backup").exists)
  }

  test("versioned streaming sink: every micro-batch is a time-travelable commit") {
    import spark.implicits._
    import graft.etl._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = SnapshotStore(s"$root/snap", orderColumn = Some("v"))

    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingSink
        .upsertEachBatchVersioned(
          spark.readStream.schema(schema).parquet(srcDir), store,
          Seq("id"))
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    runOnce()
    // head = merged state, v1 = the first wave exactly as ingested
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(store.latestVersion(spark).contains(2L))
    assert(rows(store.read(spark)) ==
      Seq((1L, 10.0), (2L, 25.0), (3L, 30.0)))
    assert(rows(store.readVersion(spark, 1)) ==
      Seq((1L, 10.0), (2L, 20.0)))
  }

  test("streaming incremental near-dup flags copies against the growing store") {
    import spark.implicits._
    import graft.etl._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = ParquetTarget(s"$root/store")
    val matches = ParquetTarget(s"$root/matches")
    val textA = (1 to 30).map(i => s"w$i").mkString(" ")
    val textB = (1 to 30).map(i => s"z$i").mkString(" ")

    // wave 1: two unrelated docs — no store yet, so no matches
    Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingDedup
        .nearDupEachBatch(spark.readStream.schema(schema).parquet(srcDir),
          "doc_id", "text", store, matches)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(store.path).count() == 2)
    assert(!new java.io.File(matches.path).exists) // nothing to flag

    // wave 2: doc 3 is a near-copy of doc 1 (one word changed), doc 4
    // fresh — only (3, 1) must be flagged, and only vs the PRIOR store
    val textA2 = textA.replace("w7", "q7")
    Seq((3L, textA2), (4L, (1 to 30).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val flagged = spark.read.parquet(matches.path)
      .orderBy("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.toSeq == Seq((3L, 1L)))
    assert(spark.read.parquet(store.path).count() == 4)

    // wave 3: an exact copy of doc 2 — matched against the store built
    // by the previous waves
    Seq((5L, textB)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val flagged2 = spark.read.parquet(matches.path)
      .orderBy("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged2.toSeq == Seq((3L, 1L), (5L, 2L)))
    assert(spark.read.parquet(store.path).count() == 5)
  }

  test("streaming decontamination flags eval overlap per micro-batch") {
    import spark.implicits._
    import graft.etl._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val verdicts = ParquetTarget(s"$root/verdicts")
    // reference (eval) corpus: one fixed document
    val ref = Seq("e1 e2 e3 e4 e5").toDF("text")

    // wave 1: doc 1 embeds an eval trigram (e2 e3 e4), doc 2 clean
    Seq((1L, "a b e2 e3 e4 c d"), (2L, "x y z w v u t"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingDecontaminate
        .decontaminateEachBatch(
          spark.readStream.schema(schema).parquet(srcDir),
          "doc_id", "text", ref, "text", verdicts, n = 3)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    def read() = spark.read.parquet(verdicts.path).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // doc 1 contains exactly one distinct eval trigram
    assert(read().toSeq == Seq((1L, 1L, true), (2L, 0L, false)))

    // wave 2: doc 3 contains TWO eval trigrams, doc 4 clean — verdicts
    // accumulate by upsert, wave-1 rows untouched
    Seq((3L, "e1 e2 e3 e4 q"), (4L, "m n o p"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    runOnce()
    assert(read().toSeq == Seq((1L, 1L, true), (2L, 0L, false),
      (3L, 2L, true), (4L, 0L, false)))
  }

  test("streaming execution: tumbling agg over a file stream with watermark") {
    import spark.implicits._
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    Seq(("2024-01-01 00:01:00", "a", 1.0), ("2024-01-01 00:02:00", "a", 2.0))
      .toDF("ts", "k", "v").withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = StreamingAgg.tumbling(stream, "ts", "5m", "1m", Seq("k"),
      Seq(sum($"v").as("s")))
    val q = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("tumout")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT k, s FROM tumout").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "a"
      && rows(0).getDouble(1) == 3.0)
  }

  test("snapshot-store commit feed: upserts drive live-table refreshes") {
    import spark.implicits._
    import graft.etl.{SnapshotStore, WriteMode}
    val root = tmpDir()
    val store = SnapshotStore(s"$root/store", orderColumn = Some("ts"))
    store.write(Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("k", "v", "ts"),
      WriteMode.Full)
    val lt = new graft.live.LiveTable("lt-snap", spark,
      s => store.read(s).agg(count(lit(1)).as("n"), sum($"v").as("total")),
      s"$root/mat",
      policy = graft.live.RefreshPolicy.onChange,
      cdc = graft.live.CdcConfig(debounceSeconds = 1,
        maxFilesPerTrigger = 1)) // one refresh batch per commit
    val q = lt.startOnSnapshotCommit(store, s"$root/ckpt")
    try {
      q.processAllAvailable() // v1 (the pre-existing commit) → refresh 1
      assert(lt.refreshHistory.size == 1)
      assert(lt.query().head.getDouble(1) == 30.0)
      // upsert #1: update k=2, insert k=3 → commit v2 → refresh 2
      store.write(Seq((2L, 25.0, 2L), (3L, 5.0, 2L)).toDF("k", "v", "ts"),
        WriteMode.Upsert, keys = Seq("k"))
      q.processAllAvailable()
      assert(lt.refreshHistory.size == 2)
      assert(lt.refreshHistory.last.trigger.startsWith("snapshot_commit"))
      assert(lt.query().head.getLong(0) == 3L &&
        lt.query().head.getDouble(1) == 40.0)
      // upsert #2 → commit v3 → refresh 3; result ≡ batch recompute
      store.write(Seq((1L, 11.0, 3L)).toDF("k", "v", "ts"),
        WriteMode.Upsert, keys = Seq("k"))
      q.processAllAvailable()
      assert(lt.refreshHistory.size == 3)
      val batch = store.read(spark)
        .agg(count(lit(1)).as("n"), sum($"v").as("total")).head
      val live = lt.query().head
      assert(live.getLong(0) == batch.getLong(0) &&
        live.getDouble(1) == batch.getDouble(1) &&
        live.getDouble(1) == 41.0)
      // the CDF readout agrees with what the commits did
      val ch = store.changes(spark, 1L, 3L, Seq("k"))
        .orderBy("k").collect()
      assert(ch.map(r => (r.getLong(1), r.getString(0))).toSeq ==
        Seq((1L, "update"), (2L, "update"), (3L, "insert")))
    } finally lt.stopStream()
  }

  test("live agg table: commit deltas maintain aggregates incrementally") {
    import spark.implicits._
    import graft.etl.{AggStore, SnapshotStore, WriteMode}
    val root = tmpDir()
    val store = SnapshotStore(s"$root/store", orderColumn = Some("ts"),
      partitionBy = Seq("day"))
    store.write(Seq((1L, 10.0, 1L, "d1"), (2L, 20.0, 1L, "d1"),
        (3L, 30.0, 1L, "d2")).toDF("k", "v", "ts", "day"),
      WriteMode.Full)
    val lat = new graft.live.LiveAggTable("lagg", spark, store,
      Seq("day"), "v", s"$root/mat", s"$root/state",
      cdc = graft.live.CdcConfig(debounceSeconds = 1,
        maxFilesPerTrigger = 1)) // one refresh batch per commit
    val q = lat.startOnSnapshotCommit(s"$root/ckpt")
    try {
      q.processAllAvailable() // v1 → initial full pass
      assert(lat.refreshHistory.size == 1 &&
        lat.refreshHistory.head.trigger.endsWith("_initial"))
      // upsert #1 touches ONLY d2 (update k=3, insert k=4) → refresh 2
      store.write(Seq((3L, 35.0, 2L, "d2"), (4L, 5.0, 2L, "d2"))
        .toDF("k", "v", "ts", "day"), WriteMode.Upsert, Seq("k"))
      q.processAllAvailable()
      assert(lat.refreshHistory.size == 2 &&
        lat.refreshHistory.last.trigger.endsWith("_incremental"))
      // upsert #2 touches ONLY d1 → refresh 3
      store.write(Seq((1L, 11.0, 3L, "d1")).toDF("k", "v", "ts", "day"),
        WriteMode.Upsert, Seq("k"))
      q.processAllAvailable()
      assert(lat.refreshHistory.size == 3)
      // incremental state ≡ one full recompute of the store head
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("day", "n", "sum", "mean").orderBy("day").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3))).toSeq
      val full = AggStore.finalizeLinear(
        AggStore.linearPartials(store.read(spark), Seq("day"), "v"),
        Seq("day"))
      assert(rows(lat.query()) == rows(full))
      assert(rows(lat.query()) == Seq(("d1", 2L, 31.0, 15.5),
        ("d2", 2L, 40.0, 20.0)))
      // delta cost ∝ the commit: v2→v3 additions list ONLY the v3
      // write dir, and the retraction set is exactly the AFFECTED d1
      // partition's prior rows (the upsert rewrote that partition) —
      // never the table (d2's rows appear in neither side)
      val (adds, rets) = store.deltaBetween(spark, 2L, 3L)
      val addDirs = adds.inputFiles
        .map(_.split("/data/")(1).split("/")(0)).toSet
      assert(addDirs.size == 1 && addDirs.head.startsWith("w00000003"))
      assert(rets.select("k", "v").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        Seq((1L, 10.0), (2L, 20.0)))
      // version gate: a replayed notification with no new commit is a
      // no-op
      assert(lat.refreshIncremental("replay").isEmpty)
    } finally lat.stopStream()
  }

  test("live sketch agg table: distinct_count over two upserts == full recompute, rebuild reads only changed partitions") {
    import spark.implicits._
    import graft.etl.{SnapshotStore, WriteMode}
    val root = tmpDir()
    val store = SnapshotStore(s"$root/store", orderColumn = Some("v"),
      partitionBy = Seq("day"))
    def rows(day: String, ids: Range, off: Long) =
      ids.map(i => (i.toLong, (i + off) % 40 * 1.0, day))
        .toDF("k", "v", "day")
    store.write(rows("d1", 1 to 50, 0).union(rows("d2", 51 to 100, 3)),
      WriteMode.Full)
    val lst = new graft.live.LiveSketchAggTable("lsk", spark, store,
      Seq("day"), "v", Seq(0.5), s"$root/mat", s"$root/state")
    assert(lst.refreshIncremental().get.trigger.endsWith("_initial"))
    def live() = lst.query().select("day", "n", "distinct_count", "p50")
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def full() = {
      val s = store.read(spark).groupBy("day")
        .agg(count(col("v")).as("n"),
          hll_sketch_estimate(
            hll_sketch_agg(col("v").cast("string"), lit(12)))
            .cast("long").as("distinct_count"))
        .orderBy("day").collect()
      s.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(live() == full())
    // upsert #1 rewrites part of d2 only
    store.write(rows("d2", 60 to 80, 7), WriteMode.Upsert, Seq("k"))
    val ev1 = lst.refreshIncremental().get
    assert(ev1.trigger.endsWith("_incremental_rebuild"))
    // the rebuild read listed ONLY d2 partition files
    assert(lst.lastRebuildFiles.nonEmpty &&
      lst.lastRebuildFiles.forall(_.contains("day=d2")))
    assert(live() == full())
    // upsert #2 rewrites part of d1 only
    store.write(rows("d1", 10 to 20, 11), WriteMode.Upsert, Seq("k"))
    assert(lst.refreshIncremental().get.trigger
      .endsWith("_incremental_rebuild"))
    assert(lst.lastRebuildFiles.forall(_.contains("day=d1")))
    assert(live() == full())
    // pure append to a NEW day merges (no rebuild read at all)
    store.write(rows("d3", 101 to 120, 1), WriteMode.Append)
    val ev3 = lst.refreshIncremental().get
    assert(ev3.trigger.endsWith("_incremental_merge"))
    assert(lst.lastRebuildFiles.isEmpty)
    assert(live() == full())
    // p50 stays within KLL rank tolerance of the exact percentile
    val p50s = lst.query().select("day", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = store.read(spark).groupBy("day")
      .agg(expr("percentile(v, 0.5)").as("e")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (d, e) =>
      assert(math.abs(p50s(d) - e) <= 2.0,
        s"day $d p50 ${p50s(d)} vs exact $e")
    }
    // version gate: replay is a no-op
    assert(lst.refreshIncremental("replay").isEmpty)
  }

  test("streaming SRM guardrail flags only the broken-ramp window") {
    import spark.implicits._
    import graft.streaming._
    def ts(min: Int) = f"2024-01-01 00:$min%02d:00"
    // window 1: clean 50/50; window 2: ramp broken to 80/20
    val events = ((1 to 500).map(i =>
        (ts(1), if (i % 2 == 0) "a" else "b")) ++
      (1 to 500).map(i => (ts(11), if (i % 5 == 0) "b" else "a")))
      .toDF("ts", "arm").withColumn("ts", col("ts").cast("timestamp"))
    val exp = Map("a" -> 0.5, "b" -> 0.5)
    // batch backtest path
    val scored = StreamingGuardrail
      .monitor(events, "ts", "arm", exp, "10m", "5m")
      .orderBy("window_start").collect()
    assert(scored.length == 2)
    assert(!scored(0).getAs[Boolean]("srm") &&
      scored(1).getAs[Boolean]("srm"))
    assert(math.abs(scored(0).getAs[Double]("chi2_stat")) < 1e-9)
    // 400/100 vs 250/250 → chi2 = 2·150²/250 = 180
    assert(math.abs(scored(1).getAs[Double]("chi2_stat") - 180.0) < 1e-9)
    assert(scored(1).getAs[Long]("n_a") == 400 &&
      scored(1).getAs[Long]("n_b") == 100)

    // real stream run emits the same verdicts
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    events.write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    val q = StreamingGuardrail.monitor(stream, "ts", "arm", exp, "10m", "5m")
      .writeStream.outputMode("update").format("memory")
      .queryName("srmout")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val emitted = spark
      .sql("SELECT srm FROM srmout ORDER BY window_start").collect()
    assert(emitted.length == 2)
    assert(!emitted(0).getBoolean(0) && emitted(1).getBoolean(0))
  }
  test("categorical drift monitor: mix shift flagged, batch ≡ stream") {
    import spark.implicits._
    import graft.streaming._
    // baseline mix: a 50%, b 30%, c 20%
    val base = ((1 to 500).map(_ => "a") ++ (1 to 300).map(_ => "b") ++
      (1 to 200).map(_ => "c")).toDF("cat")
    val bl = StreamingDrift.categoricalBaselineOf(base, "cat")
    assert(bl.categories == Seq("a", "b", "c"))
    assert(math.abs(bl.props.sum + bl.otherProp - 1.0) < 1e-9)

    def ts(min: Int) = f"2024-01-01 00:$min%02d:00"
    // window 1: the baseline mix; window 2: collapsed to mostly "c"
    // plus an unseen category "z" (flows through the OTHER bucket)
    val events = (
      (1 to 250).map(_ => (ts(1), "a")) ++ (1 to 150).map(_ => (ts(1), "b")) ++
      (1 to 100).map(_ => (ts(1), "c")) ++
      (1 to 350).map(_ => (ts(11), "c")) ++ (1 to 150).map(_ => (ts(11), "z")))
      .toDF("ts", "cat").withColumn("ts", col("ts").cast("timestamp"))
    val scored = StreamingDrift
      .categoricalMonitor(events, "ts", "cat", bl, "10m", "5m")
      .orderBy("window_start").collect()
    assert(scored.length == 2)
    assert(scored(0).getAs[Double]("psi") < 0.05,
      s"baseline-mix window psi ${scored(0).getAs[Double]("psi")}")
    assert(scored(1).getAs[Double]("psi") > 1.0)
    // stream run emits the same windows with the same scores
    val root = tmpDir()
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    events.write.mode("append").parquet(srcDir)
    val q = StreamingDrift.categoricalMonitor(
        spark.readStream.schema(events.schema).parquet(srcDir),
        "ts", "cat", bl, "10m", "5m")
      .writeStream.outputMode("update").format("memory")
      .queryName("catdriftout")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination(60000)
    val emitted = spark
      .sql("SELECT psi FROM catdriftout ORDER BY window_start").collect()
    assert(emitted.length == 2)
    assert(math.abs(emitted(0).getDouble(0) -
      scored(0).getAs[Double]("psi")) < 1e-9)
    assert(math.abs(emitted(1).getDouble(0) -
      scored(1).getAs[Double]("psi")) < 1e-9)
  }
}
