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

  test("example 08 parity: multimodal blob-reference walkthrough end to end") {
    import spark.implicits._
    import graft.ops.Multimodal
    import graft.types.{FeatureType, TBlobRef}
    val root = tmpDir()

    // -- Setup: feature group with blob_ref typed columns (08:40-56)
    val fs = new FeatureStore
    val g = fs.createGroup("acme", "mlplatform", "vision", "image_features")
    g.fromSchema(Map(
      "product_id" -> "string",
      "image_ref" -> "blob_ref<image/png|image/jpeg>",
      "thumbnail_ref" -> "blob_ref<image/jpeg>",
      "embedding" -> "float32[512]"), ifExists = IfExists.Skip)
    val imgType = g.feature("image_ref").dtype.asInstanceOf[TBlobRef]
    assert(imgType.contentTypes == Seq("image/png", "image/jpeg"))

    // -- blob_ref dtype parsing + content-type constraints (08:118-137)
    assert(FeatureType.parse("blob_ref") == TBlobRef(Nil))
    val parsed = FeatureType.parse("blob_ref<image/png|image/jpeg>")
      .asInstanceOf[TBlobRef]
    assert(parsed.accepts("image/png") && !parsed.accepts("video/mp4"))
    assert(TBlobRef(Seq("image/*")).accepts("image/webp"))

    // -- Content-type inference from uri extension (08:107-109)
    val inferred = Seq("s3://data/audio/sample.wav", "a/b.PNG", "x/noext")
      .toDF("uri")
      .select(Multimodal.inferContentType(col("uri")).as("ct"))
      .collect().map(r => Option(r.getString(0)))
    assert(inferred.toSeq ==
      Seq(Some("audio/wav"), Some("image/png"), None))

    // -- MultimodalSource.scan analog: binary files on disk →
    //    registered references with real sha256 checksums (08:140-168)
    val blobDir = new java.io.File(s"$root/images"); blobDir.mkdirs()
    val payloads = (1 to 5).map { i =>
      val bytes = Array.tabulate[Byte](100 + i * 10)(j => ((i * j) % 127).toByte)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/images/product-$i.png"), bytes)
      (s"product-$i.png", bytes)
    }.toMap
    val scanned = Multimodal.scanBinaryFiles(spark, s"$root/images",
        pathGlob = Some("*.png"))
      .withColumn("blob_ref", Multimodal.blobRef(
        col("path"), Multimodal.inferContentType(col("path")),
        col("content"),
        map(lit("color_space"), lit("sRGB"))))
    assert(scanned.count() == 5)
    val ref1 = scanned.where(col("path").endsWith("product-1.png"))
      .select("blob_ref.*").head()
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payloads("product-1.png"))
      .map("%02x".format(_)).mkString
    assert(ref1.getAs[String]("checksum") == sha) // real sha256, not mocked
    assert(ref1.getAs[String]("content_type") == "image/png")
    assert(ref1.getAs[Long]("size_bytes") == 110L)
    assert(ref1.getAs[String]("hash_algorithm") == "sha256")

    // -- Registry operations: the reference frame IS the registry —
    //    list/filter/get_by_uri/orphans as DataFrame ops (08:330-356)
    val registry = scanned.select(col("blob_ref"), col("content"))
      .localCheckpoint()
    assert(registry.where(col("blob_ref.content_type") === "image/png")
      .count() == 5)
    assert(registry
      .where(col("blob_ref.uri").startsWith(s"file:$root/images"))
      .count() == 5)
    assert(registry
      .where(col("blob_ref.uri").endsWith("product-3.png")).count() == 1)
    // orphan = a registered ref whose blob no longer exists on disk
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/images/product-5.png"))
    val present = Multimodal.scanBinaryFiles(spark, s"$root/images",
      pathGlob = Some("*.png")).select(col("path").as("uri"))
    val orphans = registry.join(present,
      registry("blob_ref.uri") === present("uri"), "left_anti")
    assert(orphans.count() == 1)

    // -- Integrity validation: clean refs pass, a corrupted payload is
    //    caught by the recomputed checksum (08:201-226)
    val clean = Multimodal.blobIntegrity(registry, "blob_ref", "content").head()
    assert(clean.getAs[Long]("n_checked") == 5 &&
      clean.getAs[Long]("n_invalid") == 0)
    val corrupted = registry.withColumn("content",
      when(col("blob_ref.uri").endsWith("product-2.png"),
        lit(Array[Byte](1, 2, 3))).otherwise(col("content")))
    val dirty = Multimodal.blobIntegrity(corrupted, "blob_ref", "content").head()
    assert(dirty.getAs[Long]("n_invalid") == 1)
    assert(math.abs(dirty.getAs[Double]("invalid_rate") - 0.2) < 1e-12)

    // -- BlobIntegrityCheck as a quality gate (08:232-256): clean data
    //    passes at max_invalid_rate=0; the corrupted frame fails ERROR
    val pass = QualityCheck.runAll(
      Seq(BlobIntegrityQualityCheck("blob_ref", "content")), registry)
    assert(!pass.failed)
    val fail = QualityCheck.runAll(
      Seq(BlobIntegrityQualityCheck("blob_ref", "content",
        maxInvalidRate = 0.01)), corrupted)
    assert(fail.failed)
    // 1% missing allowed ↔ 25% observed invalid: severity WARN does
    // not fail the gate (CheckSeverity contract)
    val warn = QualityCheck.runAll(
      Seq(BlobIntegrityQualityCheck("blob_ref", "content",
        maxInvalidRate = 0.01, severity = "WARNING")), corrupted)
    assert(!warn.failed && warn.results.exists(!_.passed))

    // -- Reference metadata enrichment: immutable with_metadata analog
    //    (08:261-282) — a NEW struct column, original untouched
    val enriched = registry.withColumn("blob_ref2",
      col("blob_ref").withField("metadata",
        map_concat(col("blob_ref.metadata"),
          map(lit("ml_processed"), lit("true"),
            lit("model_version"), lit("resnet50-v2")))))
    val m2 = enriched.select(col("blob_ref2.metadata")).head()
      .getAs[Map[String, String]](0)
    assert(m2("ml_processed") == "true" && m2("color_space") == "sRGB")
    assert(enriched.select(col("blob_ref.metadata")).head()
      .getAs[Map[String, String]](0).keySet == Set("color_space"))

    // -- Serialize / restore round trip (08:284-291): to_dict/from_dict
    //    ↔ to_json/from_json against the canonical blobRefType schema
    val roundTrip = registry.select(
        from_json(to_json(col("blob_ref")), Multimodal.blobRefType)
          .as("restored"),
        col("blob_ref"))
      .where(col("restored.checksum") === col("blob_ref.checksum") &&
        col("restored.uri") === col("blob_ref.uri"))
    assert(roundTrip.count() == 5)

    // -- Pipeline: references + payloads → batched feature extraction
    //    (08:360-383; decode is the documented deterministic stand-in,
    //    the mapPartitions batching/schema plumbing is real)
    val feats = Multimodal.extractFeatures(
      registry.select(col("blob_ref.uri").as("uri"), col("content")),
      "uri", "content", dim = 8)
    assert(feats.count() == 5)
    assert(feats.select(size(col("features"))).head().getInt(0) == 8)
  }

  test("example 09 parity: bulk inference walkthrough end to end") {
    import spark.implicits._
    val root = tmpDir()

    // -- Model specifications (09:80-130): every public scheme/framework
    val hf = ModelSpec("hf://sentence-transformers/all-MiniLM-L6-v2",
      "sentence_transformers", version = Some("main"),
      task = Some("embedding"))
    assert(hf.scheme == "hf") // is_huggingface analog
    val mlflow = ModelSpec("mlflow://sentiment-classifier/Production",
      "sklearn", version = Some("3"))
    assert(mlflow.scheme == "mlflow")
    val pt = ModelSpec("s3://models/custom/text-encoder-v2.pt", "pytorch",
      version = Some("v2.1"))
    val onnx = ModelSpec("s3://models/optimized/embedding-model.onnx",
      "onnx")
    assert(Seq(pt, onnx).forall(_.scheme == "s3"))
    intercept[IllegalArgumentException](ModelSpec("ftp://x", "pytorch"))
    intercept[IllegalArgumentException](ModelSpec("s3://x", "caffe"))

    // -- Accelerator configurations (09:135-170) and their Spark knobs
    assert(AcceleratorConfig("cpu", 8).sparkConf.isEmpty)
    val gpu = AcceleratorConfig("gpu", 1, memoryGb = Some(16))
    assert(gpu.sparkConf("spark.executor.resource.gpu.amount") == "1")
    val multiGpu = AcceleratorConfig("gpu", 4)
    assert(multiGpu.sparkConf("spark.task.resource.gpu.amount") == "4")

    // -- Batch configurations (09:176-204)
    assert(BatchConfig(64).batchSize == 64)
    val dyn = BatchConfig(256, dynamic = true)
    assert(dyn.dynamic)

    // -- Text embedding inference via the convenience ctor (09:240-260)
    val docs = (1 to 200).map(i => (s"doc_$i", s"document text $i"))
      .toDF("doc_id", "text")
    val embedSpec = InferenceTransform.embedding(
      "hf://sentence-transformers/all-MiniLM-L6-v2", "text",
      outputColumn = "text_embedding")
    val (embedded, embedRes) = InferenceTransform.run(docs, embedSpec,
      InferenceTransform.fakeEmbeddingModel(16))
    assert(embedRes.totalSamples == 200 && embedRes.failedSamples == 0)
    assert(embedRes.successSamples == embedRes.totalSamples)
    assert(embedded.select(size(col("text_embedding"))).head().getInt(0) == 16)
    // deterministic stand-in model: same input → same embedding
    val (embedded2, _) = InferenceTransform.run(docs, embedSpec,
      InferenceTransform.fakeEmbeddingModel(16))
    assert(embedded.select("doc_id", "text_embedding")
      .except(embedded2.select("doc_id", "text_embedding")).count() == 0)

    // -- Classification inference (09:345-355): string output column
    val clsSpec = InferenceTransform.classification(
      "mlflow://sentiment-classifier/Production", Seq("text"),
      outputColumn = "sentiment")
    val sentimentModel: InferenceTransform.BatchModel = _.map { in =>
      if (in.mkString("").hashCode % 2 == 0) "POSITIVE" else "NEGATIVE"
    }
    val (classified, clsRes) =
      InferenceTransform.run(docs, clsSpec, sentimentModel)
    assert(clsRes.successSamples == 200)
    assert(classified.select("sentiment").distinct().count() == 2)

    // -- LLM inference (09:390-405): prompt → completion, small batches
    val llmSpec = InferenceTransform.llmInference(
      "hf://meta-llama/Llama-2-7b-hf", "text",
      outputColumn = "caption")
    assert(llmSpec.batch.batchSize == 8 && llmSpec.batch.dynamic)
    val llmModel: InferenceTransform.BatchModel =
      _.map(in => s"caption of: ${in.mkString("").take(20)}")
    val (captioned, llmRes) = InferenceTransform.run(docs, llmSpec, llmModel)
    assert(llmRes.successSamples == 200)
    assert(captioned.select("caption").head().getString(0)
      .startsWith("caption of: "))

    // -- Failure accounting (09:InferenceResult contract): a model that
    //    rejects some batches yields null outputs, counted as failed,
    //    and total = success + failed; throughput is derived
    val flaky: InferenceTransform.BatchModel = { batch =>
      if (batch.exists(_.mkString("").contains("text 7")))
        sys.error("model OOM")
      batch.map(_ => "ok")
    }
    val (flakyOut, flakyRes) = InferenceTransform.run(docs, clsSpec, flaky)
    assert(flakyRes.failedSamples > 0)
    assert(flakyRes.totalSamples ==
      flakyRes.successSamples + flakyRes.failedSamples)
    assert(flakyOut.where(col("sentiment").isNull).count() ==
      flakyRes.failedSamples)
    assert(flakyRes.throughputPerSec >= 0)

    // -- Chained inference jobs (09:470-500): step 1 embeds into a
    //    feature target, step 2 classifies FROM the embeddings — the
    //    second model consumes the first's output column
    docs.write.parquet(s"$root/docs")
    val cps = new CheckpointStore(s"$root/ckpt")
    val embedJob = new Job("step1_embed",
      sources = Seq(FileSource("docs", s"$root/docs", "parquet")),
      transform = FnTransform { (_, srcs) =>
        InferenceTransform.run(srcs("docs"), embedSpec,
          InferenceTransform.fakeEmbeddingModel(16))._1
      },
      target = ParquetTarget(s"$root/text_features"),
      qualityChecks = Seq(NullCheck("text_embedding", 0.0)),
      checkpoints = cps)
    embedJob.activate()
    val r1 = embedJob.run(spark)
    assert(r1.state == "success", s"embed job: ${r1.error}")
    assert(r1.rowsWritten == 200L)
    val clsFromEmbedding = InferenceTransformSpec(
      ModelSpec("s3://models/classifier/embedding-classifier.onnx", "onnx"),
      Seq("text_embedding"), "category",
      org.apache.spark.sql.types.StringType,
      BatchConfig(batchSize = 256))
    val classifyJob = new Job("step2_classify",
      sources = Seq(FileSource("feats", s"$root/text_features", "parquet")),
      transform = FnTransform { (_, srcs) =>
        InferenceTransform.run(srcs("feats"), clsFromEmbedding, { batch =>
          batch.map { in =>
            // Spark rows surface arrays as collection.Seq (mutable)
            val emb = in.head.asInstanceOf[scala.collection.Seq[Float]]
            if ((math.abs(emb.head) * 1e4).toLong % 2 == 0) "A" else "B"
          }
        })._1.select("doc_id", "category")
      },
      target = ParquetTarget(s"$root/categories"),
      checkpoints = cps)
    classifyJob.activate()
    val r2 = classifyJob.run(spark)
    assert(r2.state == "success", s"classify job: ${r2.error}")
    val cats = spark.read.parquet(s"$root/categories")
    assert(cats.count() == 200)
    assert(cats.select("category").distinct().count() == 2)
    assert(Seq(embedJob, classifyJob).forall(_.runHistory.size == 1))
  }
}
