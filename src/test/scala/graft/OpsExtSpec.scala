package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-group derived features, multi-probe LSH recall, skew-aware agg. */
class OpsExtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cross-group derived feature joins sibling on entity key") {
    import graft.meta._
    import spark.implicits._
    val fs = new FeatureStore
    val profile = fs.createGroup("o", "d", "p", "profile", entityKey = Some("uid"))
    profile.createFeature("age", "int64")
    val signals = fs.createGroup("o", "d", "p", "signals", entityKey = Some("uid"))
    signals.createFeature("clicks", "int64")
    signals.createFeature("clicks_per_year", "float64",
      derivedFrom = Some("clicks / NULLIF(profile.age, 0)"))

    val profileData = new FeatureGroupData(profile,
      Seq((1L, 20L), (2L, 40L)).toDF("uid", "age"))
    val signalsData = new FeatureGroupData(signals,
      Seq((1L, 100L), (2L, 80L), (3L, 5L)).toDF("uid", "clicks"),
      siblings = Map("profile" -> profileData))

    val out = signalsData.frame.orderBy("uid").collect()
    assert(out(0).getAs[Double]("clicks_per_year") == 5.0)
    assert(out(1).getAs[Double]("clicks_per_year") == 2.0)
    // uid=3 has no profile row → left join null → null result
    assert(out(2).isNullAt(out(2).fieldIndex("clicks_per_year")))
  }

  test("multi-probe LSH recall beats single-bucket on the same planes") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val queries = emb.where(col("vec_id") < 20)
    val exact = graft.ops.Similarity.bruteForceKnn(emb, queries, 5)
      .select("query_id", "nbr_id")
    def recall(multiProbe: Boolean): Long =
      graft.ops.Similarity
        .lshKnn(emb, queries, 5, planes = 4, multiProbe = multiProbe)
        .select("query_id", "nbr_id")
        .intersect(exact)
        .count()
    val single = recall(multiProbe = false)
    val multi = recall(multiProbe = true)
    assert(multi > single, s"multi-probe $multi should beat single $single")
    assert(multi >= 30, s"multi-probe recall too low: $multi / 100")
  }

  test("fast xxhash64 MinHash finds the same near-dup pairs as md5 MinHash") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val md5Pairs = graft.ops.Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fastPairs = graft.ops.Dedup.minhashLshFast(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH is probabilistic: different hash families may disagree on
    // borderline-jaccard pairs, but BOTH must catch every j≥0.95 pair
    // (candidate probability ≥99.99%) and agree on the vast majority
    // docs here have ~30 shingles, so per-pair miss probability is a few
    // 1e-3 — allow one unlucky miss per family rather than zero
    val sure = graft.ops.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sure.nonEmpty)
    assert(sure.diff(md5Pairs).size <= 1, s"md5 missed: ${sure.diff(md5Pairs)}")
    assert(sure.diff(fastPairs).size <= 1, s"fast missed: ${sure.diff(fastPairs)}")
    val overlap = md5Pairs.intersect(fastPairs).size.toDouble /
      math.max(md5Pairs.size, fastPairs.size)
    assert(overlap >= 0.8, s"overlap $overlap too low (md5=${md5Pairs.size}, fast=${fastPairs.size})")
  }

  test("analytics client: freshness cache + async + export end-to-end") {
    import graft.meta._
    import graft.analysis._
    import spark.implicits._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = new FeatureStore
    val g = fs.createGroup("o", "d", "p", "ev", entityKey = Some("id"))
    val base = (1 to 500).map(i => (i.toLong, i % 5, i * 1.0)).toDF("id", "seg", "v")
    val client = new AnalyticsClient(new FeatureGroupData(g, base))
    val spec = Aggregation("v", Seq("count", "sum", "avg"), groupBy = Seq("seg"))
    val r1 = client.analyze(spec)
    val r2 = client.analyze(spec)
    assert(r1 eq r2) // cache hit returns the same frame
    assert(client.cache.size == 1)
    val job = client.analyzeAsync(spec)
    assert(job.waitFor() == "completed" && job.result.length == 5)
    val out = java.nio.file.Files.createTempDirectory("exp").toString + "/r"
    client.export(r1.orderBy("seg"), out, "csv")
    assert(spark.read.option("header", "true").csv(out).count() == 5)
  }

  test("blob integrity quality check gates on corrupted checksums") {
    import graft.etl._
    import spark.implicits._
    val df = Seq(("u1", "good"), ("u2", "bad"))
      .toDF("uri", "payload")
      .withColumn("payload", col("payload").cast("binary"))
      .withColumn("ref", graft.ops.Multimodal.blobRef(col("uri"),
        lit("text/plain"), col("payload")))
      // corrupt u2's recorded checksum
      .withColumn("ref", when(col("uri") === "u2",
        col("ref").withField("checksum", lit("deadbeef")))
        .otherwise(col("ref")))
    val rep = QualityCheck.runAll(Seq(
      BlobIntegrityQualityCheck("ref", "payload", maxInvalidRate = 0.0),
      BlobIntegrityQualityCheck("ref", "payload", maxInvalidRate = 0.6,
        severity = "WARNING")), df)
    assert(!rep.results.head.passed && rep.results.head.observed == 0.5)
    assert(rep.results(1).passed)
  }

  test("partitioned file source: partition narrowing prunes the scan") {
    import graft.etl._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("part").toString
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "seg", "v")
      .write.partitionBy("seg").parquet(s"$root/t")
    val narrowed = FileSource("t", s"$root/t", "parquet",
      partition = Some(("seg", "a"))).read(spark)
    assert(narrowed.count() == 2)
    assert(narrowed.select(sum($"v")).first().getDouble(0) == 4.0)
    // partition-value directory read: seg column is consumed by the path
    assert(!narrowed.columns.contains("seg"))
  }

  test("dashboard renders real analysis output") {
    import graft.dash._
    val d = "/root/testdata/sf0.001"
    val rows = Queries.queries("q01_agg_group")(spark, d).collect()
    val data = rows.map(r => r.schema.fieldNames.map(f =>
      f -> r.getAs[Any](f)).toMap).toSeq
    val dash = Dashboard("ops", "Ops Dashboard")
      .withChart(Chart("Lineitem by flag", ChartType.Table, "q01_agg_group"))
      .publish
    val html = dash.toHtml(Map("q01_agg_group" -> data))
    assert(html.contains("<table>") && html.contains("sum_qty"))
    assert(dash.toJson.contains("\"query\":\"q01_agg_group\""))
  }

  test("skew-aware salted aggregation equals direct groupBy") {
    import spark.implicits._
    // heavy-tailed: key 'hot' has 10k rows, others 10
    val rows = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 10).map(i => ("cold", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count($"v").as("n"), sum($"v").as("s"), min($"v").as("mn"),
        max($"v").as("mx"), avg($"v").as("a"))
      .orderBy("k").collect()
    val salted = graft.ops.SkewAware.groupAgg(df, Seq("k"), salt = 8,
      metrics = Seq(("n", "count", "v"), ("s", "sum", "v"),
        ("mn", "min", "v"), ("mx", "max", "v"), ("a", "avg", "v")))
      .select("k", "n", "s", "mn", "mx", "a")
      .orderBy("k").collect()
    assert(direct.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
    // non-algebraic metric rejected
    intercept[IllegalArgumentException] {
      graft.ops.SkewAware.groupAgg(df, Seq("k"), 4,
        Seq(("m", "median", "v")))
    }
  }
}
