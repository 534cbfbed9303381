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

  test("lshKnn drops the forced broadcast when queries exceed the cap") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val queries = emb.where(col("vec_id") < 20)
    def run(cap: Long) = graft.ops.Similarity
      .lshKnn(emb, queries, 5, planes = 4, maxBroadcastQueries = cap)
    val small = run(100000L) // 20 queries — broadcast hint applies
    val big = run(5L)        // cap exceeded — no hint; same answer
    // the contract is "never FORCE a broadcast of an oversized query
    // set": assert on the hint, not the physical join (AQE may still
    // legitimately choose broadcast from true runtime sizes)
    def hinted(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    assert(hinted(small), "under the cap the query side is hint-broadcast")
    assert(!hinted(big), "over the cap no broadcast may be forced")
    assert(big.collect().toSet == small.collect().toSet)
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

  test("vector VEC_ADD/SUB/MUL/NORMALIZE surface (Column + SQL)") {
    import graft.functions.VectorFunctions
    import spark.implicits._
    val df = Seq((Array(3.0, 4.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.vecAdd($"a", $"b").as("add"),
      VectorFunctions.vecSub($"a", $"b").as("sub"),
      VectorFunctions.vecMul($"a", $"b").as("mul"),
      VectorFunctions.normalize($"a").as("nrm")).first()
    assert(r.getSeq[Double](0) == Seq(4.0, 6.0))
    assert(r.getSeq[Double](1) == Seq(2.0, 2.0))
    assert(r.getSeq[Double](2) == Seq(3.0, 8.0))
    assert(r.getSeq[Double](3) == Seq(0.6, 0.8))
    VectorFunctions.registerAll(spark)
    df.createOrReplaceTempView("vecs")
    val s = spark.sql(
      "SELECT NORMALIZE(a)[0] AS n0, VEC_ADD(a, b)[1] AS a1 FROM vecs").first()
    assert(s.getDouble(0) == 0.6 && s.getDouble(1) == 6.0)
  }

  test("audit export to json and csv via Spark") {
    import graft.meta._
    val fs = new FeatureStore
    fs.createGroup("acme", "d", "p", "g", actor = "alice")
    fs.audit.record(AuditEntry(actor = "bob", action = "read_feature",
      category = "read", resource = "acme/d/p/g/x", resourceOrg = "acme"))
    val root = java.nio.file.Files.createTempDirectory("audit").toString
    fs.audit.export(spark, s"$root/j", "json")
    fs.audit.export(spark, s"$root/c", "csv")
    assert(spark.read.json(s"$root/j").count() == 2)
    assert(spark.read.csv(s"$root/c").count() == 2)
  }

  test("incremental lookback re-reads late-arrival window") {
    import graft.etl._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lb").toString
    val cps = new CheckpointStore(s"$root/cp")
    def src(rows: Seq[(Long, String, Double)]) =
      rows.toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
        .write.mode("append").parquet(s"$root/src")
    src(Seq((1L, "2024-01-01 00:00:00", 1.0), (2L, "2024-01-05 00:00:00", 2.0)))
    def mkJob(lookback: Option[String]) = {
      val j = new Job(s"lb${lookback.isDefined}", Seq(FileSource("s", s"$root/src")),
        SqlTransform("SELECT * FROM s"), ParquetTarget(s"$root/out${lookback.isDefined}"),
        incremental = IncrementalConfig(WriteMode.Incremental, Some("ts"),
          lookback = lookback),
        checkpoints = cps)
      j.activate(); j
    }
    val strict = mkJob(None)
    strict.run(spark) // checkpoint → 2024-01-05
    assert(cps.get("lbfalse").contains("2024-01-05 00:00:00"))
    // late row INSIDE the 7d lookback window arrives after the cursor moved
    src(Seq((3L, "2024-01-03 00:00:00", 3.0)))
    val r2 = strict.run(spark)
    assert(r2.rowsWritten == 0) // strict cursor misses the late row
    cps.advance("lbtrue", "2024-01-05 00:00:00")
    val lb = mkJob(Some("7d"))
    val r3 = lb.run(spark)
    assert(r3.rowsWritten == 3) // lookback re-reads the full late window
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

  test("ivfKnn: exhaustive probe equals brute force; partial probe recalls") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 5)
    val exact = graft.ops.Similarity.bruteForceKnn(emb, queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Int]("rnk"))).toSet

    // probing every cell degenerates to exhaustive search
    val full = graft.ops.Similarity
      .ivfKnn(emb, queries, 5, cells = 8, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Int]("rnk"))).toSet
    assert(full == exact)

    // partial probe: valid top-k shape and usable recall on the true top-5
    val part = graft.ops.Similarity
      .ivfKnn(emb, queries, 5, cells = 8, nProbe = 4)
      .collect()
    assert(part.groupBy(_.getAs[Long]("query_id"))
      .values.forall(rows => rows.map(_.getAs[Int]("rnk")).sorted.toSeq ==
        (1 to rows.length)))
    val partSet = part.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = exact.count { case (q, n, _) => partSet((q, n)) }.toDouble /
      exact.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("asofJoin: at-or-before match, no-match null, tolerance cutoff") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "a"), // exact-ts tie → matches the t=10 feature
      (1L, 20L, "b"), // after both features → latest (t=15)
      (1L, 3L, "c"),  // before any feature → null
      (2L, 50L, "d")  // matches t=5 but 45 apart → nulled by tolerance
    ).toDF("uid", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 5L, 500.0)
    ).toDF("uid", "ft", "score")

    val unbounded = graft.ops.PointInTime
      .asofJoin(left, right, Seq("uid"), "t", "ft", Seq("score"))
      .orderBy("uid", "t").collect()
    assert(unbounded.map(r =>
      (r.getAs[Long]("uid"), r.getAs[Long]("t"),
        Option(r.getAs[Any]("feature_ts")),
        Option(r.getAs[Any]("score")))).toSeq == Seq(
      (1L, 3L, None, None),
      (1L, 10L, Some(10L), Some(100.0)),
      (1L, 20L, Some(15L), Some(150.0)),
      (2L, 50L, Some(5L), Some(500.0))))

    val bounded = graft.ops.PointInTime
      .asofJoin(left, right, Seq("uid"), "t", "ft", Seq("score"),
        tolerance = Some(lit(10L)))
      .orderBy("uid", "t").collect()
    val d = bounded.find(_.getAs[Long]("t") == 50L).get
    assert(d.isNullAt(d.fieldIndex("score")) && d.isNullAt(d.fieldIndex("feature_ts")))
    // within-tolerance rows unaffected
    assert(bounded.count(r => !r.isNullAt(r.fieldIndex("score"))) == 2)
  }

  test("asof join carries the matched right row wholesale (nulls included)") {
    import spark.implicits._
    val left = Seq((1L, 12L), (1L, 7L)).toDF("uid", "t")
    val right = Seq(
      (1L, 5L, Some(1.0), "a"),
      (1L, 10L, None: Option[Double], "b")).toDF("uid", "ft", "score", "tag")
    val out = graft.ops.PointInTime
      .asofJoin(left, right, Seq("uid"), "t", "ft", Seq("score", "tag"))
      .orderBy("t").collect()
    // t=7 matches ft=5 → score 1.0, tag a
    assert(out(0).getLong(2) == 5L && out(0).getDouble(3) == 1.0 &&
      out(0).getString(4) == "a")
    // t=12 matches ft=10, whose score is NULL → score stays NULL (no
    // back-fill from ft=5) and tag comes from the SAME row
    assert(out(1).getLong(2) == 10L && out(1).isNullAt(3) &&
      out(1).getString(4) == "b")
  }

  test("salted asof join equals unsalted on a skewed fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // one entity holds half the probe rows
    val left = ((1 to 500).map(i => (42L, i.toLong * 2)) ++
      (1 to 500).map(i => (rnd.nextInt(50).toLong, i.toLong * 3)))
      .toDF("uid", "t")
    val right = (0 to 50).flatMap(u =>
      (1 to 20).map(j => (u.toLong, j.toLong * 40, u * 1000.0 + j)))
      .toDF("uid", "ft", "score")
    def run(salt: Int) = graft.ops.PointInTime
      .asofJoin(left, right, Seq("uid"), "t", "ft", Seq("score"),
        salt = salt, hotThreshold = 100L)
      .orderBy("uid", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[Any]("feature_ts")), Option(r.getAs[Any]("score"))))
    assert(run(8).toSeq == run(1).toSeq)
  }

  test("edge cases: empty/degenerate inputs do not break the new ops") {
    import graft.analysis._
    import spark.implicits._
    // PrefixSum on empty and single-value frames
    val empty = Seq.empty[(Double, Long)].toDF("v", "c")
    assert(PrefixSum.exclusive(empty, "v", Seq("c" -> "cum")).count() == 0)
    val one = Seq((5.0, 3L)).toDF("v", "c")
    assert(PrefixSum.exclusive(one, "v", Seq("c" -> "cum"))
      .collect()(0).getLong(2) == 0L)
    // kendall on constant x (every pair x-tied → zero discordant)
    val const = (1 to 50).map(i => (i.toLong, 1.0, i.toDouble)).toDF("k", "x", "y")
    val kt = AnalysisPlanner.kendallTau(const, "x", "y", "k").collect()(0)
    assert(kt.getLong(1) == 0L && kt.getLong(2) == 50L * 49 / 2)
    // asof join with empty right side: all feature values NULL
    val left = Seq((1L, 10L)).toDF("uid", "t")
    val rightEmpty = Seq.empty[(Long, Long, Double)].toDF("uid", "ft", "score")
    val aj = graft.ops.PointInTime
      .asofJoin(left, rightEmpty, Seq("uid"), "t", "ft", Seq("score"))
      .collect()
    assert(aj.length == 1 && aj(0).isNullAt(2) && aj(0).isNullAt(3))
    // salted asof with empty left
    val leftEmpty = Seq.empty[(Long, Long)].toDF("uid", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("uid", "ft", "score")
    assert(graft.ops.PointInTime
      .asofJoin(leftEmpty, right, Seq("uid"), "t", "ft", Seq("score"),
        salt = 4, hotThreshold = 0L).count() == 0)
    // chunking a one-token doc
    val doc = Seq((1L, "hello")).toDF("doc_id", "text")
    val ch = graft.ops.TextAnalysis.chunk(doc, "doc_id", "text", 20, 5)
      .collect()
    assert(ch.length == 1 && ch(0).getString(2) == "hello" &&
      ch(0).getLong(3) == 1L)
    // connected components with no edges
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.ops.Dedup.connectedComponents(noEdges, "a", "b").count() == 0)
  }

  test("review fixes: NULL propagation, NULL strata, chains, string ids") {
    import spark.implicits._
    // winsorize/quantileBucket: NULL in, NULL out
    val withNull = (Seq.tabulate(99)(i => Some(i.toDouble)) :+
      (None: Option[Double])).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val w = graft.ops.Features.winsorize(withNull, "v", 0.1, 0.9)
      .where(col("v").isNull).collect()
    assert(w.length == 1 && w(0).isNullAt(2))
    val qb = graft.ops.Features.quantileBucket(withNull, "v", 4)
      .where(col("v").isNull).collect()
    assert(qb.length == 1 && qb(0).isNullAt(2))
    // stratified sampling keeps NULL-stratum rows
    val strat = Seq(("a", 1L), ("a", 2L), (null, 3L), (null, 4L))
      .toDF("g", "id")
    val sampled = graft.ops.Sampling
      .stratifiedHashSample(strat, 100, Seq("g"), Seq("id"))
    assert(sampled.where(col("g").isNull).count() == 2)
    // connected components: 60-node chain converges (pointer doubling)
    val chain = (0 until 59).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val cc = graft.ops.Dedup.connectedComponents(chain, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.length == 60 && cc.forall(_._2 == 0L))
    // string ids (the md5-keyed dedup shape) work end to end
    val sEdges = Seq(("x", "y"), ("y", "z"), ("p", "q")).toDF("a", "b")
    val sc = graft.ops.Dedup.connectedComponents(sEdges, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(sc == Map("x" -> "x", "y" -> "x", "z" -> "x",
      "p" -> "p", "q" -> "p"))
  }

  test("PII presets redact emails, phones, ssn, ip") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.com then 555-123-4567 done"),
      (2L, "ssn 123-45-6789 from 10.0.0.1 ok"),
      (3L, "clean text only")).toDF("id", "text")
    val out = graft.ops.TextAnalysis.redactPii(df, "text")
      .orderBy("id").collect()
    assert(out(0).getString(2).contains("<EMAIL>") &&
      out(0).getString(2).contains("<PHONE>") &&
      !out(0).getString(2).contains("@"))
    assert(out(1).getString(2).contains("<SSN>") &&
      out(1).getString(2).contains("<IPV4>"))
    assert(out(2).getString(2) == "clean text only" &&
      out(2).getLong(3) == 0L)
  }

  test("connected components match BFS on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).distinct
    val got = graft.ops.Dedup
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference BFS
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val verts = adj.keySet
    var expect = Map.empty[Long, Long]
    for (v <- verts.toSeq.sorted if !expect.contains(v)) {
      var seen = Set(v); var frontier = Set(v)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      val label = seen.min
      expect ++= seen.map(_ -> label)
    }
    assert(got == expect)
  }

  test("approx percentile toggle tracks exact within t-digest tolerance") {
    import graft.analysis._
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 20000).map(_ => rnd.nextGaussian() * 100 + 500)
      .toDF("v").repartition(8)
    def run() = AnalysisPlanner
      .percentiles(df, "v", Seq(0.25, 0.5, 0.9, 0.99))
      .collect()(0)
    val exact = run()
    AnalysisPlanner.approxPercentiles = true
    val approx = try run() finally AnalysisPlanner.approxPercentiles = false
    (0 until 4).foreach { i =>
      val (e, a) = (exact.getDouble(i), approx.getDouble(i))
      assert(math.abs(e - a) <= 2.0,
        s"p$i exact=$e approx=$a") // ~0.5% of the spread at accuracy 10000
    }
  }

  test("approx distinct toggle tracks exact within HLL error") {
    import graft.analysis._
    import spark.implicits._
    val df = (1 to 30000).map(i => i % 7919).toDF("x").repartition(8)
    def run() = AnalysisPlanner
      .dataQuality(df, DataQuality(features = Seq("x")))
      .collect()(0).getAs[Double]("distinct__x")
    val exact = run()
    AnalysisPlanner.approxDistinct = true
    val approx = try run() finally AnalysisPlanner.approxDistinct = false
    assert(exact == 7919.0)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("ansari-bradley: hand-computed folded scores on a 4-point case") {
    import spark.implicits._
    // c = {1, 10}, t = {5, 6}: ranks 1..4, folded scores 1,2,2,1;
    // AB = 2 + 2 = 4; E = 3; Var = 1/3 → z = √3
    val df = Seq((1.0, "c"), (10.0, "c"), (5.0, "t"), (6.0, "t"))
      .toDF("v", "g")
    val cells = graft.analysis.AnalysisPlanner.rankCells(df, "g", "v")
    val r = graft.analysis.AnalysisPlanner
      .ansariBradleyFromCells(cells, "c", "t").head
    assert(r.getAs[Double]("ab_stat") == 4.0)
    assert(math.abs(r.getAs[Double]("z_stat") - math.sqrt(3.0)) < 1e-9)
    // identical arms → z ≈ 0 (scores split evenly)
    val sym = Seq.tabulate(40)(i => (i.toDouble, if (i % 2 == 0) "c" else "t"))
      .toDF("v", "g")
    val zs = graft.analysis.AnalysisPlanner
      .ansariBradleyFromCells(
        graft.analysis.AnalysisPlanner.rankCells(sym, "g", "v"), "c", "t")
      .head.getAs[Double]("z_stat")
    assert(math.abs(zs) < 0.5)
  }

  test("lepage composes its wilcoxon and ansari components") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 500).map(i =>
      (rnd.nextGaussian() * (if (i % 2 == 0) 1.0 else 2.0) + i % 2,
        if (i % 2 == 0) "c" else "t")).toDF("v", "g")
    val cells = graft.analysis.AnalysisPlanner.rankCells(df, "g", "v")
      .localCheckpoint()
    val l = graft.analysis.AnalysisPlanner
      .lepageFromCells(cells, "c", "t").head
    val zw = l.getAs[Double]("z_wilcoxon")
    val za = l.getAs[Double]("z_ansari")
    assert(math.abs(l.getAs[Double]("lepage_l") - (zw * zw + za * za)) < 1e-9)
    // shifted AND re-dispersed arms → the omnibus fires
    assert(l.getAs[Double]("lepage_l") > 5.0)
  }

  test("stuart-maxwell: symmetric-flow table and singular diagonal") {
    import spark.implicits._
    // 2-category flow 10 vs 30 between off-diagonal cells: d1 = -20,
    // v11 = 40 → chi2 = 400/40 = 10
    val rows = Seq.fill(10)(("x", "y")) ++ Seq.fill(30)(("y", "x")) ++
      Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y"))
    val r = graft.analysis.AnalysisPlanner
      .stuartMaxwell(rows.toDF("a", "b"), "a", "b").head
    assert(r.getAs[Long]("n") == 50L)
    assert(math.abs(r.getAs[Double]("chi2") - 10.0) < 1e-9)
    // perfectly diagonal table → V singular → NULL, not a crash
    val diag = Seq.fill(20)(("x", "x")) ++ Seq.fill(20)(("y", "y"))
    val rd = graft.analysis.AnalysisPlanner
      .stuartMaxwell(diag.toDF("a", "b"), "a", "b").head
    assert(rd.isNullAt(rd.fieldIndex("chi2")))
  }

  test("kendalls W: perfect agreement gives W = 1, reversal lowers it") {
    import spark.implicits._
    // 3 raters, 6 items, identical scores → W = 1
    val perfect = for (r <- 0 until 3; i <- 0 until 6)
      yield (r, i, (i + 1).toDouble)
    val w1 = graft.analysis.AnalysisPlanner
      .kendallsW(perfect.toDF("rater", "item", "score"),
        "rater", "item", "score").head
    assert(w1.getAs[Long]("n_raters") == 3L)
    assert(math.abs(w1.getAs[Double]("w") - 1.0) < 1e-9)
    // one rater reversed → W drops strictly below 1
    val mixed = for (r <- 0 until 3; i <- 0 until 6)
      yield (r, i, if (r == 2) (6 - i).toDouble else (i + 1).toDouble)
    val w2 = graft.analysis.AnalysisPlanner
      .kendallsW(mixed.toDF("rater", "item", "score"),
        "rater", "item", "score").head.getAs[Double]("w")
    assert(w2 < 0.5 && w2 >= 0.0)
  }

  test("cochran-armitage: monotone ramp fires, flat rates do not") {
    import spark.implicits._
    val ramp = for (lvl <- 1 to 4; i <- 1 to 100)
      yield (lvl, i <= lvl * 20) // 20% → 80%
    val zr = graft.analysis.AnalysisPlanner
      .cochranArmitage(ramp.toDF("lvl", "s"), "lvl", col("s"))
      .head.getAs[Double]("z_trend")
    assert(math.abs(zr) > 5.0)
    val flat = for (lvl <- 1 to 4; i <- 1 to 100) yield (lvl, i <= 50)
    val zf = graft.analysis.AnalysisPlanner
      .cochranArmitage(flat.toDF("lvl", "s"), "lvl", col("s"))
      .head.getAs[Double]("z_trend")
    assert(math.abs(zf) < 1e-9)
  }

  test("unit-root pair: mean-reverting vs drifting daily series") {
    import spark.implicits._
    // iid pseudo-noise (AR(0)): Δx on x_{t−1} slope ≈ −1, DF hugely
    // negative; KPSS small. (A PERFECTLY alternating series would fit
    // with zero residuals — se undefined → NULL, the guard's job.)
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(day))
    val alt = (0 until 200).map(i =>
      (ts(i), ((i * 7919) % 97 - 48).toDouble)).toDF("ts", "value")
    val dfr = graft.ops.TimeSeries.dickeyFuller(alt, "ts", "value").head
    assert(dfr.getAs[Double]("gamma") < -0.5) // strong mean reversion
    assert(dfr.getAs[Double]("df_stat") < -5.0)
    val kAlt = graft.ops.TimeSeries.kpssLevel(alt, "ts", "value")
      .head.getAs[Double]("kpss_stat")
    assert(kAlt < 0.1)
    // deterministic drift: KPSS large, DF near 0
    val drift = (0 until 200).map(i => (ts(i), i.toDouble))
      .toDF("ts", "value")
    val kDrift = graft.ops.TimeSeries.kpssLevel(drift, "ts", "value")
      .head.getAs[Double]("kpss_stat")
    assert(kDrift > 1.0)
  }

  test("FDR family: BY equals BH at the harmonic-scaled level; Storey q monotone") {
    import spark.implicits._
    val ps = (1 to 40).map(i => (i.toLong, i / 40.0)).toDF("id", "p")
    val h = (1 to 40).map(1.0 / _).sum
    val by = graft.analysis.AnalysisPlanner.byFdr(ps, "p", 0.1)
      .select("id", "by_critical", "discovery").orderBy("id").collect()
    val bh = graft.analysis.AnalysisPlanner.bhFdr(ps, "p", 0.1 / h)
      .select("id", "bh_critical", "discovery").orderBy("id").collect()
    assert(by.map(_.getBoolean(2)).toSeq == bh.map(_.getBoolean(2)).toSeq)
    assert(by.zip(bh).forall { case (a, b) =>
      math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-12 })
    val q = graft.analysis.AnalysisPlanner.storeyQValues(ps, "p", 0.5)
      .orderBy("p").select("q_value", "pi0").collect()
    assert(q.sliding(2).forall(w =>
      w(0).getDouble(0) <= w(1).getDouble(0) + 1e-12)) // monotone
    // 20 of 40 p-values exceed λ=0.5 → π₀ = 20/(0.5·40) = 1 (clamped)
    assert(math.abs(q.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("association floor: blomqvist identity, GK lambda determinism") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val xy = (1 to 1001).map(_ => { val x = rnd.nextDouble(); (x, x) })
      .toDF("x", "y")
    val b = graft.analysis.AnalysisPlanner.blomqvistBeta(xy, "x", "y")
      .head.getAs[Double]("beta")
    assert(math.abs(b - 1.0) < 1e-12) // y = x → all concordant
    val same = (1 to 100).map(i => (s"c${i % 4}", s"c${i % 4}"))
      .toDF("a", "b")
    val l = graft.analysis.AnalysisPlanner.gkLambda(same, "a", "b").head
    assert(math.abs(l.getAs[Double]("lambda_b_given_a") - 1.0) < 1e-12)
    assert(math.abs(l.getAs[Double]("lambda_symmetric") - 1.0) < 1e-12)
  }

  test("kendall inversion count matches brute-force pairs, no cap") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = (1 to 4000).map(i =>
      (i.toLong, rnd.nextInt(40).toDouble, rnd.nextInt(25).toDouble))
    val df = data.toDF("k", "x", "y").repartition(8)
    val r = graft.analysis.AnalysisPlanner
      .kendallTau(df, "x", "y", "k").collect()(0)
    // brute force over all pairs
    var con = 0L; var dis = 0L; var tx = 0L; var ty = 0L
    for (i <- data.indices; j <- (i + 1) until data.size) {
      val p = (data(i)._2 - data(j)._2) * (data(i)._3 - data(j)._3)
      if (p > 0) con += 1 else if (p < 0) dis += 1
      if (data(i)._2 == data(j)._2) tx += 1
      if (data(i)._3 == data(j)._3) ty += 1
    }
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (con, dis, tx, ty, data.size.toLong * (data.size - 1) / 2))
  }

  test("kendall doubly-continuous: reduction levels engage, still exact") {
    import spark.implicits._
    // continuous x AND y (all values distinct) with a tiny cell budget
    // and grid budget: the old single-level design would either blow the
    // grid (nb × |Y| rows) or the per-task Fenwick buffer; the reduction
    // recursion must engage and stay exact.
    val rnd = new scala.util.Random(11)
    val data = (1 to 3000).map(i =>
      (i.toLong, rnd.nextDouble() * 1e6, rnd.nextDouble() * 1e6))
    val df = data.toDF("k", "x", "y").repartition(8)
    val cells = df.select(col("x"), col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    // memWant = 3000/64 + 1 = 47 buckets; grid would be 47 × 3000 =
    // 141k rows > budget 4096 ⇒ at least one reduction level
    val (d, levels) = graft.analysis.AnalysisPlanner
      .discordantCount(spark, cells, fixedBuckets = 0, cap = 64L,
        gridBudget = 4096L)
    var dis = 0L
    for (i <- data.indices; j <- (i + 1) until data.size) {
      val p = (data(i)._2 - data(j)._2) * (data(i)._3 - data(j)._3)
      if (p < 0) dis += 1
    }
    assert(levels >= 1, "reduction recursion must engage under a tiny grid budget")
    assert(d == dis)
    // end-to-end through the public surface with the same tiny budgets
    val r = graft.analysis.AnalysisPlanner.kendallTau(df, "x", "y", "k",
      cellsPerBucket = 64, gridBudget = 4096L).collect()(0)
    assert(r.getLong(1) == dis)
  }

  test("binned kendall: bounded cells, tau within tolerance of exact") {
    import spark.implicits._
    // continuous correlated pair: y = x + noise, all values distinct —
    // the distinct-cell worst case the binned opt-out exists for
    val rnd = new scala.util.Random(7)
    val data = (1 to 3000).map { i =>
      val x = rnd.nextDouble() * 100.0
      (i.toLong, x, x * 0.8 + rnd.nextGaussian() * 20.0)
    }
    val df = data.toDF("k", "x", "y").repartition(8)
    val exact = graft.analysis.AnalysisPlanner
      .kendallTau(df, "x", "y", "k").collect()(0).getAs[Double]("tau_b")
    val approx = graft.analysis.AnalysisPlanner
      .kendallTauBinned(df, "x", "y", "k", bins = 256).collect()(0)
      .getAs[Double]("tau_b")
    // monotone binning preserves cross-bin orientation; same-bin pairs
    // collapse to ties — tau_b's tie correction keeps the error small
    assert(math.abs(approx - exact) < 0.02,
      s"binned tau $approx vs exact $exact")
    // the input really is distinct-heavy (the case the opt-out is for):
    // the exact path's cell frame carries ~n cells, the binned one is
    // capped at bins² by construction (grid-clipped floor)
    assert(df.select("x", "y").distinct().count() == 3000L)
    // same pair universe: binning never drops rows
    val nPairsBinned = graft.analysis.AnalysisPlanner
      .kendallTauBinned(df, "x", "y", "k", bins = 256).collect()(0)
      .getAs[Long]("n_pairs")
    assert(nPairsBinned == 3000L * 2999 / 2)
  }

  test("parquet scan pushes filters and prunes columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftscan").toString
    (1 to 100).map(i => (i.toLong, i * 2.0, s"s$i", i % 7, i % 3))
      .toDF("a", "x", "s", "m", "n")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(col("x") > 50.0).select("a", "x")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(x"))
    val readSchema = "ReadSchema: [^\\n]+".r.findFirstIn(plan).get
    assert(readSchema.contains("a:") && readSchema.contains("x:") &&
      !readSchema.contains("s:") && !readSchema.contains("m:"),
      s"projection not pruned: $readSchema")
  }

  test("PrefixSum.exclusive matches a single-partition window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(_ => rnd.nextInt(200))
      .distinct.map(v => (v.toDouble, rnd.nextInt(9) + 1L))
      .toDF("v", "c").repartition(8)
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("cum", coalesce(sum("c").over(w), lit(0L)))
      .orderBy("v").collect().map(r => (r.getDouble(0), r.getLong(2)))
    val got = graft.analysis.PrefixSum.exclusive(df, "v", Seq("c" -> "cum"),
        buckets = 16)
      .orderBy("v").collect().map(r => (r.getDouble(0), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
  }

  test("grouped PrefixSum.exclusive matches per-group windows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(17)
    val df = (1 to 900).map(_ => (s"g${rnd.nextInt(5)}", rnd.nextInt(150)))
      .distinct.map { case (g, v) => (g, v.toDouble, rnd.nextInt(9) + 1L) }
      .toDF("g", "v", "c").repartition(8)
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("cum", coalesce(sum("c").over(w), lit(0L)))
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(3)))
    val got = graft.analysis.PrefixSum
      .exclusive(df, "v", Seq("c" -> "cum"), buckets = 16,
        groupCols = Seq("g"))
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)
  }

  test("PrefixSum.exclusiveChain matches sequential exclusive calls") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val df = (1 to 400).map(_ => rnd.nextInt(120))
      .distinct.map(v => (v.toDouble, rnd.nextInt(7) + 1L))
      .toDF("v", "c").repartition(8)
    // reference: two independent exclusive passes, the second over a
    // derived+filtered frame — exactly what the chain fuses
    val p1 = graft.analysis.PrefixSum.exclusive(df, "v",
      Seq("c" -> "cum1"), buckets = 16)
    val derived = p1.where(col("cum1") % 2 === 0)
      .withColumn("d", col("cum1") + col("c"))
    val expect = graft.analysis.PrefixSum.exclusive(derived, "v",
        Seq("d" -> "cum2"), buckets = 16)
      .orderBy("v").collect()
      .map(r => (r.getAs[Double]("v"), r.getAs[Long]("cum1"),
        r.getAs[Long]("cum2")))
    val got = graft.analysis.PrefixSum.exclusiveChain(df, "v", Seq(
        ((x: org.apache.spark.sql.DataFrame) => x, Seq("c" -> "cum1")),
        ((x: org.apache.spark.sql.DataFrame) =>
          x.where(col("cum1") % 2 === 0)
            .withColumn("d", col("cum1") + col("c")),
          Seq("d" -> "cum2"))), buckets = 16)
      .orderBy("v").collect()
      .map(r => (r.getAs[Double]("v"), r.getAs[Long]("cum1"),
        r.getAs[Long]("cum2")))
    assert(got.toSeq == expect.toSeq)
  }

  test("PrefixSum output named __pb survives (q593 regression)") {
    import spark.implicits._
    // the chain's internal bucket column must not collide with a
    // caller's OUTPUT name — q593 names a prefix output __pb and the
    // first exclusiveChain cut dropped it with the internal column
    val df = Seq((1.0, 2L), (2.0, 3L), (3.0, 5L)).toDF("v", "cb")
    val out = graft.analysis.PrefixSum.exclusive(df, "v",
      Seq("cb" -> "__pb"), buckets = 4)
    assert(out.columns.contains("__pb"))
    assert(out.orderBy("v").collect().map(_.getAs[Long]("__pb")).toSeq ==
      Seq(0L, 2L, 5L))
  }

  test("value-count summarize keeps all-NULL groups and metric order") {
    import graft.analysis._
    import spark.implicits._
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", None), ("b", None)).toDF("g", "x")
    val out = AnalysisPlanner.aggregation(df,
      Aggregation(feature = "x",
        metrics = Seq("median", "count", "null_count", "avg"),
        groupBy = Seq("g")))
    assert(out.columns.toSeq == Seq("g", "median", "count", "null_count", "avg"))
    val rows = out.orderBy("g").collect()
    assert(rows.length == 2) // group b (all NULL) retained
    val a = rows(0); val b = rows(1)
    assert(a.getDouble(1) == 2.0 && a.getLong(2) == 2L &&
      a.getLong(3) == 1L && a.getDouble(4) == 2.0)
    assert(b.isNullAt(1) && b.getLong(2) == 0L && b.getLong(3) == 2L)
  }

  test("incremental near-dup equals the cross slice of the self-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def doc() = (1 to 20).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc()))
    // near-dups ACROSS the boundary (100, 101 copy corpus docs 3, 7),
    // WITHIN the batch (102 copies 100's text), and WITHIN the corpus
    // (28/29 already share text) — the side-internal pairs must NOT
    // appear in the asymmetric incremental output
    val withinCorpus = base.updated(29, (29L, base(28)._2))
    val planted = Seq((100L, base(3)._2), (101L, base(7)._2 + " extra"),
      (102L, base(3)._2))
    val all = (withinCorpus ++ planted).toDF("doc_id", "text")
    val corpus = all.where(col("doc_id") < 100)
    val batch = all.where(col("doc_id") >= 100)
    val incr = graft.ops.Dedup
      .incrementalNearDup(batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val self = graft.ops.Dedup.minhashLsh(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // self-join pairs are (lo, hi); the cross slice maps to (new, corpus)
    val expected = self.collect {
      case (a, b) if a < 100 && b >= 100 => (b, a)
    }
    assert(incr == expected && incr.nonEmpty)
    // the planted side-internal dups ARE found by the self-join...
    assert(self.contains((100L, 102L)) && self.contains((28L, 29L)))
    // ...and are correctly absent from the batch-vs-corpus output
    assert(incr.forall { case (n, c) => n >= 100 && c < 100 })
  }

  test("quantized IVF equals exact IVF at exhaustive probe + deep rerank") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 60)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 5)
    val cents = graft.ops.Similarity.pseudoCentroids(4, 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rnk", "nbr_id", "cos").orderBy("query_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e9)))
    val exact = rows(graft.ops.Similarity.ivfKnnWith(
      corpus, queries, 5, cents, nProbe = 4))
    val quant = rows(graft.ops.Similarity.ivfKnnQuantizedWith(
      corpus, queries, 5, cents, nProbe = 4, rerank = 60))
    // rerank depth covers every candidate → stage 1 cannot drop the true
    // top-k; the exact re-rank then reproduces the exact pipeline
    assert(quant.toSeq == exact.toSeq)
    // shallow rerank still returns k rows per query (recall may dip)
    val shallow = graft.ops.Similarity.ivfKnnQuantizedWith(
      corpus, queries, 5, cents, nProbe = 4, rerank = 5)
    assert(shallow.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5L))
  }

  test("int8 quantization: codes, scale and reconstruction error") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, -0.5, 0.254)), (2L, Array(0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Features
      .quantizeEmbedding(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val s = 1.0 / 127
    assert(out(0).getSeq[Int](2) == Seq(127, -64, 32)) // -63.5 rounds away
    assert(math.abs(out(0).getDouble(1) - s) < 1e-15)
    assert(math.abs(out(0).getDouble(3) - (64 * s - 0.5)) < 1e-12)
    // all-zero vector: scale 0, zero codes, zero error — no div-by-zero
    assert(out(1).getDouble(1) == 0.0 &&
      out(1).getSeq[Int](2) == Seq(0, 0) && out(1).getDouble(3) == 0.0)
  }

  test("repetition stats match hand-computed Gopher signals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab → top ab 3/5, all dup
      (2L, "x y z w"),       // all bigrams unique
      (3L, "solo"),          // no bigrams → NULL fractions
      (4L, "t t t t")        // one word repeated: ttr 1/4, one bigram ×3
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getDouble(2),
      if (out(i).isNullAt(3)) -1.0 else out(i).getDouble(3),
      if (out(i).isNullAt(4)) -1.0 else out(i).getDouble(4))
    assert(row(0) == ((6L, 0.333333, 0.6, 1.0)))
    assert(row(1) == ((4L, 1.0, 0.333333, 0.0)))
    assert(row(2) == ((1L, 1.0, -1.0, -1.0)))
    assert(row(3) == ((4L, 0.25, 1.0, 1.0)))
  }

  test("bucket cap thins only oversized buckets; small buckets stay exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(4)(rnd.nextDouble() + 0.5)
    // one hot block (120 mutually-similar vectors) + one small block
    val rows = (0 until 120).map(i => (i.toLong, "hot", vec())) ++
      (200 until 206).map(i => (i.toLong, "cold", vec()))
    val df = rows.toDF("id", "blk", "emb")
    def pairs(maxBlock: Int) =
      graft.ops.Dedup.embeddingNearDup(df, "id", "emb", "blk", 0.0, maxBlock)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    val capped = pairs(30)
    // block under the cap is bit-exact untouched
    assert(capped.filter(_._1 >= 200) == uncapped.filter(_._1 >= 200))
    // hot block thinned to a deterministic subset of the true pairs
    assert(capped.subsetOf(uncapped))
    val hot = capped.count(_._1 < 200)
    assert(hot > 0 && hot < uncapped.count(_._1 < 200))
    assert(pairs(30) == capped) // deterministic replay
    // self-ANN with the cap active: every query still gets k results
    val ann = graft.ops.Similarity.lshSelfKnn(
      df.toDF("vec_id", "blk", "embedding"), 2, planes = 2, dim = 4,
      maxBucket = 20)
    val perQuery = ann.groupBy("query_id").count().collect()
    assert(perQuery.length == 126 && perQuery.forall(_.getLong(1) == 2L))
  }

  test("exact dedup shuffles hashed keys, not document text") {
    import spark.implicits._
    val docs = Seq((5L, "aa bb"), (2L, "aa bb"), (3L, "cc"), (4L, "dd ee ff"),
      (1L, "cc")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.exact(docs, "text", "doc_id")
      .orderBy("keeper_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (4L, 1L)))
    // the exchange partitions on the 16-byte (hash, length) key; the
    // document text must not appear in any shuffle's partitioning
    val plan = graft.ops.Dedup.exact(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    val parts = plan.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(parts.nonEmpty && parts.forall(!_.contains("text")))
  }

  test("summarize: n=1 group yields NULL variance, not ANSI divide-by-zero") {
    import graft.analysis._
    import spark.implicits._
    // group b has exactly ONE non-null value → sample variance undefined;
    // the (n-1) denominator must not throw under ANSI mode, and the
    // result must be NULL like var_samp / the DuckDB oracle
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(5.0)),
      ("b", Some(7.0)), ("b", None)).toDF("g", "x")
    val out = AnalysisPlanner.aggregation(df,
      Aggregation(feature = "x",
        metrics = Seq("median", "variance", "stddev"),
        groupBy = Seq("g")))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) == 3.0 && out(0).getDouble(2) == 8.0)
    assert(out(1).getDouble(1) == 7.0 && out(1).isNullAt(2) &&
      out(1).isNullAt(3))
  }

  test("grouped percentiles keep the NULL group key") {
    import graft.analysis._
    import spark.implicits._
    val df = Seq[(Option[String], Double)](
      (Some("a"), 1.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0)).toDF("g", "x")
    // exactPercentiles joins per-group bounds/totals back on g — with a
    // plain equi-join the NULL-keyed group would vanish
    val out = AnalysisPlanner.exactPercentiles(df, "x",
        Seq("p50" -> 0.5), Seq("g"))
      .orderBy(col("g").asc_nulls_first).collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(0) && out(0).getDouble(1) == 20.0)
    assert(out(1).getString(0) == "a" && out(1).getDouble(1) == 2.0)

    val summ = AnalysisPlanner.aggregation(df,
      Aggregation(feature = "x", metrics = Seq("median", "count"),
        groupBy = Seq("g")))
      .orderBy(col("g").asc_nulls_first).collect()
    assert(summ(0).isNullAt(0) && summ(0).getDouble(1) == 20.0 &&
      summ(0).getLong(2) == 3L)
  }

  test("chunkDedup drops cross-document boilerplate, keeps document order") {
    import spark.implicits._
    // "x y z" opens all three docs (boilerplate, >= 3 docs); the rest is
    // unique prose. chunk size 3, zero overlap.
    val docs = Seq(
      (1L, "x y z a b c d e f"),
      (2L, "x y z g h i"),
      (3L, "x y z j k l m")) // last chunk is the short tail "m"
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.chunkDedup(docs, "doc_id", "text", 3, 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq == Seq(
      (1L, 3L, 1L, "a b c d e f"),
      (2L, 2L, 1L, "g h i"),
      (3L, 3L, 1L, "j k l m")))
    // below the threshold nothing is hot
    val none = graft.ops.Dedup.chunkDedup(docs, "doc_id", "text", 3, 4)
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    assert(none == 0L)
  }

  test("canonicalPerCluster keeps the highest-score member, ties to lowest id") {
    import spark.implicits._
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L))
      .toDF("doc_id", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster")
    val out = graft.ops.Dedup
      .canonicalPerCluster(clusters, docs, "doc_id", "n_chars")
      .orderBy("doc_id").collect()
    // cluster 1: ids 2 and 3 tie at 30 chars -> 2 wins; singleton keeps itself
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((1L, 2L, false), (2L, 2L, true), (3L, 2L, false), (4L, 4L, true)))
  }

  test("budgetSample: exclusive prefix respects the cap, first row always fits") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 10L + i % 7)).toDF("id", "w")
      .repartition(8)
    val budget = 300L
    val kept = graft.ops.Sampling.budgetSample(df, budget, "w", Seq("id"))
      .collect()
    assert(kept.nonEmpty)
    // every kept row STARTED under the budget; total overshoot < one row
    val total = kept.map(_.getLong(1)).sum
    val maxW = kept.map(_.getLong(1)).max
    assert(kept.forall(_.getLong(2) < budget))
    assert(total < budget + maxW && total >= budget - maxW)
    // deterministic: same subset on re-run
    val again = graft.ops.Sampling.budgetSample(df, budget, "w", Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_.getLong(0)).toSet)
    // a budget below the first row's weight keeps exactly that first row
    // (exclusive prefix 0 < budget for any positive budget)
    val one = graft.ops.Sampling.budgetSample(df, 1L, "w", Seq("id"))
      .collect()
    assert(one.length == 1 && one(0).getLong(2) == 0L)
  }

  test("duplicateSpans merges overlapping dup grams, splits on gaps") {
    import spark.implicits._
    // "p q r s" is common to docs 1-3 (both its 3-grams hit 3 docs);
    // doc 1 carries a second, distant occurrence that must be its OWN span
    val docs = Seq(
      (1L, "p q r s a b c p q r s"),
      (2L, "z p q r s b n"),
      (3L, "k l p q r s m"),
      (4L, "no dupes at all")).toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .duplicateSpans(docs, "doc_id", "text", n = 3, minDocs = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 4L, 4L), (1L, 8L, 11L, 4L),
      (2L, 2L, 5L, 4L),
      (3L, 3L, 6L, 4L)))
  }

  test("semanticDedup drops the higher id of a near-identical pair") {
    import spark.implicits._
    // two well-separated blobs; ids 3 and 5 are near-identical (cos ~1),
    // everything else mutually below the 0.95 threshold
    def vec(xs: Double*) = xs.toArray
    val rows = Seq(
      (0L, vec(10, 0, 0, 0)), (1L, vec(0, 10, 0, 0)), // centroid seeds
      (2L, vec(9, 4, 0, 0)), (3L, vec(8, 0, 3, 1)),
      (4L, vec(3, 7, 6, 0)), (5L, vec(8.01, 0, 3.0, 1.0)),
      (6L, vec(0, 8, 0, 4))).toDF("vec_id", "embedding")
    val out = graft.ops.Dedup
      .semanticDedup(rows, "vec_id", "embedding", cells = 2, iters = 1,
        roundDp = 6, threshold = 0.95)
      .orderBy("vec_id").collect()
    val dropped = out.filter(!_.getBoolean(2)).map(_.getLong(0)).toSeq
    assert(dropped == Seq(5L))
    // the near-identical pair landed in the same cell (same blob)
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf(3L) == cellOf(5L))
  }

  test("budgetSample strata: each stratum gets its own budget") {
    import spark.implicits._
    val df = (1L to 100L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", 10L)).toDF("id", "src", "w")
    val out = graft.ops.Sampling
      .budgetSample(df, 100L, "w", Seq("id"), strataCols = Seq("src"))
      .collect()
    val bySrc = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // 100-token budget / 10-token rows = exactly 10 kept PER stratum
    assert(bySrc == Map("even" -> 10, "odd" -> 10))
    assert(out.forall(_.getLong(3) < 100L))
  }

  test("assignShards packs hash-ordered rows into weight-balanced shards") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i, 10L)).toDF("id", "w").repartition(8)
    val out = graft.ops.Sampling.assignShards(df, 100L, "w", Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // 120 rows x 10 weight / 100 per shard = 12 shards of exactly 10 rows
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 12L).toSet)
    assert(sizes.values.forall(_ == 10))
    // deterministic across runs
    val again = graft.ops.Sampling.assignShards(df, 100L, "w", Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == out.toSet)
  }

  test("CorpusPipeline.clean: every stage engages on a planted corpus") {
    import spark.implicits._
    // 28-word docs that pass the quality gate; the seed suffix keeps
    // the vocabularies DISJOINT across docs (no accidental near-dups)
    def prose(seed: Char): String = {
      val words = Seq("river", "stone", "garden", "window", "copper",
        "meadow", "lantern", "harbor", "timber", "valley", "violet",
        "saddle", "marble", "forest", "candle", "bridge", "hollow",
        "summer", "winter", "silver")
      (0 until 22).map(i => words(i % words.size) + seed)
        .mkString("the all of ", " ", " and a thing") // stopword hits
    }
    val boiler = "copyright footer text" // 3-gram, planted in >= 3 docs
    val docs = Seq(
      (1L, s"$boiler ${prose('a')}"),
      (2L, s"$boiler ${prose('b')}"),
      (3L, s"$boiler ${prose('c')}"),
      (4L, s"$boiler ${prose('a')}"),         // exact dup of 1 AFTER strip
      (5L, prose('b') + " extra tail words"), // near-dup of 2, longer
      (6L, "short junk")) // fails the quality gate
      .toDF("doc_id", "text")
    val out = graft.ops.CorpusPipeline
      .clean(docs, "doc_id", "text", chunkMaxDocs = 3,
        jaccardThreshold = 0.7, tokensPerShard = 40)
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    // 6 fails quality; 4 collapses into 1 once the boilerplate chunk is
    // stripped; 2 loses the near-dup contest to the LONGER doc 5
    assert(ids == Seq(1L, 3L, 5L))
    // the boilerplate chunk is gone from every survivor
    assert(out.forall(!_.getString(1).contains("copyright")))
    // shard packing engaged: ~25-token docs, 60-token shards → 2 shards
    assert(out.map(_.getLong(3)).distinct.length == 2)
    // optional holdout split rides on the deduped survivors: complete
    // partition, deterministic, and post-dedup (no near-dup straddle)
    val withSplit = graft.ops.CorpusPipeline
      .clean(docs, "doc_id", "text", chunkMaxDocs = 3,
        jaccardThreshold = 0.7, tokensPerShard = 40,
        splits = Seq("train" -> 0.5, "test" -> 0.5))
      .collect()
    assert(withSplit.map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
    assert(withSplit.forall(r =>
      Set("train", "test")(r.getString(r.fieldIndex("split")))))
  }

  test("qualityFlags gates on words, word length, stopwords, alpha fraction") {
    import spark.implicits._
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "runs far away into the deep green quiet woods tonight again")
    val docs = Seq(
      (1L, good),                    // passes every gate
      (2L, "the a of to"),           // too few words
      (3L, Seq.fill(30)("zz").mkString(" ")), // no stopword hits
      (4L, good + " " + Seq.fill(25)("7 %").mkString(" "))) // low alpha
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.qualityFlags(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(5)).toSeq == Seq(true, false, false, false))
    val r1 = out(0)
    assert(r1.getLong(1) == 22 && r1.getLong(3) >= 2 &&
      r1.getDouble(4) == 1.0)
  }

  test("kmeansCentroids: rounded grid is honored and profile covers the corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0L until 60L).map { i =>
      val base = (i % 3).toDouble * 5
      (i, Array.fill(4)(base + rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "embedding")
    val cents = graft.ops.Similarity
      .kmeansCentroids(df, "vec_id", "embedding", 3, iters = 2, roundDp = 6)
    assert(cents.length == 3)
    // every coordinate sits exactly on the 1e-6 grid
    assert(cents.flatten.forall(x =>
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        == x)))
    val prof = graft.ops.Similarity
      .kmeansProfile(df, "vec_id", "embedding", 3, iters = 2, roundDp = 6)
      .collect()
    assert(prof.map(_.getLong(1)).sum == 60L)
    // three tight gaussian blobs at 0/5/10: clusters converge to ~20 each
    assert(prof.forall(r => r.getLong(1) >= 15 && r.getLong(1) <= 25))
    assert(prof.forall(_.getDouble(2) < 1.0))
  }

  test("bm25 matches the Okapi formula on a hand-computed fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join"),        // dl 2, tf(hash)=1
      (2L, "hash hash scan"),   // dl 3, tf(hash)=2, tf(scan)=1
      (3L, "sort merge"))       // no query terms → no row
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq("hash", "scan"), k = 10)
      .collect()
    // independent driver-side evaluation of the same formula
    val (n, avgdl, k1, b) = (3.0, 7.0 / 3.0, 1.2, 0.75)
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    val exp1 = BigDecimal(w(1, 2, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(w(2, 3, 2) + w(1, 3, 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length == 2)
    assert(out(0).getLong(0) == 2L && out(0).getDouble(1) == exp2)
    assert(out(1).getLong(0) == 1L && out(1).getDouble(1) == exp1)
    assert(exp2 > exp1) // two matched terms outrank one
  }

  test("pmi bigrams: counts, formula, and deterministic tiebreak") {
    import spark.implicits._
    val docs = Seq("a b a b", "a c").toDF("text")
    val out = graft.ops.TextAnalysis
      .pmiBigrams(docs, "text", minCount = 1, k = 10).collect()
    // bigrams: ab×2 ba×1 ac×1 (T_bi 4); unigrams a3 b2 c1 (T_uni 6)
    // pmi(ab) = ln((2/4)/((3/6)(2/6))) = ln 3 = pmi(ac); pmi(ba) = ln 1.5
    val ln3 = BigDecimal(math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln15 = BigDecimal(math.log(1.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getDouble(3))).toSeq
    // equal-PMI tie broken by (x, y) — (a,b) before (a,c)
    assert(rows == Seq(("a", "b", 2L, ln3), ("a", "c", 1L, ln3),
      ("b", "a", 1L, ln15)))
  }

  test("bloom decontamination is exact: bloom prunes, never changes the answer") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def doc() = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val train = (0L until 40L).map(i => (i, doc())).toDF("doc_id", "text")
    val ref = (0 until 6).map(_ => Tuple1(doc())).toDF("text")
    val out = graft.ops.Dedup
      .bloomDecontaminate(train, "doc_id", "text", ref, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    // independent ground truth: plain distinct-trigram semi-join count
    val tg = graft.ops.Dedup.shingles(train, "doc_id", "text", 3)
    val rg = graft.ops.Dedup
      .shingles(ref.withColumn("rid", lit(1)), "rid", "text", 3)
      .select("s").distinct()
    val truth = tg.join(rg, Seq("s"), "left_semi")
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length == 40)
    out.foreach { case (id, dirty, flag) =>
      assert(dirty == truth.getOrElse(id, 0L), s"doc $id")
      assert(flag == (dirty > 0))
    }
    assert(out.exists(_._3) && out.exists(!_._3)) // fixture covers both
  }

  test("bloom decontamination with an empty reference flags nothing") {
    import spark.implicits._
    val train = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val ref = Seq.empty[Tuple1[String]].toDF("text")
    val out = graft.ops.Dedup
      .bloomDecontaminate(train, "doc_id", "text", ref, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSet == Set((1L, 0L, false), (2L, 0L, false)))
  }

  test("sequence packing is a contiguous chunked stream with exact spans") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = ((0L until 50L).map(i => (i, rnd.nextInt(40).toLong + 1)) :+
      (99L, 0L)) // one empty document
      .toDF("doc_id", "n_tokens")
    val out = graft.ops.Sampling
      .packSequences(docs, seqLen = 64L, "n_tokens", Seq("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 51)
    // global start position of each doc reconstructs an exclusive cumsum
    val byPos = out.sortBy(t => t._3 * 64 + t._5)
    var cum = 0L
    byPos.foreach { case (id, w, first, last, off) =>
      assert(first * 64 + off == cum, s"doc $id start")
      assert(first == cum / 64 && off == cum % 64)
      if (w > 0) assert(last == (cum + w - 1) / 64, s"doc $id span")
      else assert(last == first, s"empty doc $id")
      cum += w
    }
    // at least one document straddles a boundary in this fixture
    assert(out.exists(t => t._4 > t._3))
  }

  test("matryoshka truncation renormalizes prefixes and reports norm loss") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0, 4.0, 12.0)),  // prefix (3,4): norm 5, full norm 13
      (2L, Array(0.0, 0.0, 2.0)),   // zero prefix, nonzero full
      (3L, Array(0.0, 0.0, 0.0)))   // zero everything
      .toDF("vec_id", "embedding")
    val out = graft.ops.Features
      .truncateEmbedding(df, "vec_id", "embedding", dim = 2)
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(math.abs(out(0).getDouble(2) - 5.0 / 13.0) < 1e-12)
    assert(out(1).getSeq[Double](1) == Seq(0.0, 0.0)) // no div-by-zero
    assert(out(1).getDouble(2) == 0.0)
    assert(out(2).isNullAt(2)) // 0/0 norm fraction is NULL
    // renormalize=false keeps raw prefix values
    val raw = graft.ops.Features
      .truncateEmbedding(df, "vec_id", "embedding", 2, renormalize = false)
      .orderBy("vec_id").collect()
    assert(raw(0).getSeq[Double](1) == Seq(3.0, 4.0))
  }

  test("range join: exact containment, boundaries, overlaps, fan-out guard") {
    import spark.implicits._
    val pts = Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 19L), (5L, 20L),
      (6L, -3L)).toDF("pid", "t")
    val ivs = Seq(
      ("a", 0L, 10L),    // catches 0, 5 — NOT 10 (end-exclusive)
      ("b", 5L, 25L),    // catches 5, 10, 19, 20 — overlaps a
      ("c", 30L, 30L),   // empty — matches nothing
      ("d", -10L, 0L))   // negative range: catches -3 only
      .toDF("iv", "s", "e")
    val out = graft.ops.PointInTime
      .rangeJoin(pts, "t", ivs, "s", "e", bucketWidth = 7L)
      .select("iv", "pid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L),
      ("b", 4L), ("b", 5L), ("d", 6L)))
    // ground truth: the nested-loop predicate join gives the same pairs
    val truth = pts.join(ivs, col("t") >= col("s") && col("t") < col("e"))
      .select("iv", "pid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == truth)
    // fan-out guard: an interval spanning >= cap buckets throws
    val wide = Seq(("w", 0L, 1000L)).toDF("iv", "s", "e")
    val ex = intercept[Exception] {
      graft.ops.PointInTime
        .rangeJoin(pts, "t", wide, "s", "e", 7L, maxBucketsPerInterval = 10L)
        .collect()
    }
    assert(ex.getMessage.contains("rangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("rangeJoin")))
  }

  test("rolling anomaly: strict-prior baseline, degenerate-spread guards") {
    import spark.implicits._
    // entity u: stable 10s then a spike; entity v: constant (sd 0)
    val rows = (1 to 8).map(i => ("u", i.toLong, 10.0)) ++
      Seq(("u", 9L, 100.0)) ++
      (1 to 5).map(i => ("v", i.toLong, 5.0))
    val df = rows.toDF("ent", "t", "value")
    val out = graft.ops.TimeSeries
      .rollingAnomaly(df, Seq("ent"), "t", "value", window = 7, z = 3.0)
      .orderBy("ent", "t").collect()
    val u = out.filter(_.getString(0) == "u")
    // first row: no priors → NULL score, no flag
    assert(u(0).isNullAt(u(0).fieldIndex("zscore")) && !u(0).getBoolean(u(0).fieldIndex("anomaly")))
    // second row: ONE prior → n<2 → still no score
    assert(u(1).isNullAt(u(1).fieldIndex("zscore")))
    // constant baseline (sd 0) never divides: rows 3..8 of u unf lagged
    assert(u.slice(2, 8).forall(r => r.isNullAt(r.fieldIndex("zscore"))))
    // the spike row HAS a constant baseline too (all 10s) → sd 0 → NULL
    // score by the guard; now check a mixed baseline flags properly
    val mixed = (Seq(("w", 1L, 1.0), ("w", 2L, 2.0), ("w", 3L, 1.5),
      ("w", 4L, 1.8), ("w", 5L, 50.0)))
      .toDF("ent", "t", "value")
    val m = graft.ops.TimeSeries
      .rollingAnomaly(mixed, Seq("ent"), "t", "value", window = 7, z = 3.0)
      .orderBy("t").collect()
    val spike = m.last
    val priors = Seq(1.0, 2.0, 1.5, 1.8)
    val mu = priors.sum / 4
    val sd = math.sqrt(priors.map(x => (x - mu) * (x - mu)).sum / 3)
    assert(math.abs(spike.getDouble(spike.fieldIndex("zscore"))
      - (50.0 - mu) / sd) < 1e-9)
    assert(spike.getBoolean(spike.fieldIndex("anomaly")))
    // v: all constant → no flags at all
    assert(out.filter(_.getString(0) == "v")
      .forall(r => !r.getBoolean(r.fieldIndex("anomaly"))))
  }

  test("hll profiles: accurate estimates and rescan-free merging") {
    import spark.implicits._
    // two "days" with overlapping user populations
    val day1 = (0 until 30000).map(i => ("d1", (i % 20000).toLong))
      .toDF("day", "uid")
    val day2 = (0 until 30000).map(i => ("d2", (i % 20000 + 10000).toLong))
      .toDF("day", "uid")
    val profiles = graft.ops.Sketches
      .hllProfile(day1.unionByName(day2), Seq("uid"), Seq("day"))
      .persist()
    val byDay = profiles.orderBy("day").collect()
    // each day has exactly 20000 distinct uids; HLL@lg12 ≈ ±2%
    byDay.foreach { r =>
      val est = r.getLong(r.fieldIndex("uid_distinct_est"))
      assert(math.abs(est - 20000) < 800, s"day est $est")
    }
    // merge the two stored profiles WITHOUT the raw data: true union
    // is 30000 distinct (10000..29999 overlap)
    val merged = graft.ops.Sketches
      .hllMergeProfiles(profiles.select("day", "uid_hll"), Seq("uid"))
      .head().getLong(1)
    assert(math.abs(merged - 30000) < 1200, s"merged est $merged")
    // merging must match sketching the union directly (same state)
    val direct = graft.ops.Sketches
      .hllProfile(day1.unionByName(day2), Seq("uid"))
      .head().getLong(1)
    assert(merged == direct, s"merge $merged != direct $direct")
    profiles.unpersist()
  }

  test("interval join: overlap semantics, canonical-bucket dedup-free") {
    import spark.implicits._
    val a = Seq(("a1", 0L, 10L), ("a2", 5L, 15L), ("a3", 20L, 21L),
      ("a4", -5L, 2L)).toDF("aid", "as", "ae")
    val b = Seq(("b1", 8L, 30L),   // overlaps a1 (8<10), a2, a3
      ("b2", 10L, 12L),            // touches a1 at 10 → NO (end-exclusive)
      ("b3", -10L, -4L),           // overlaps a4 only
      ("b4", 3L, 3L))              // empty
      .toDF("bid", "bs", "be")
    val out = graft.ops.PointInTime
      .intervalJoin(a, "as", "ae", b, "bs", "be", bucketWidth = 4L)
      .select("aid", "bid").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // no duplicates even though wide pairs share many buckets
    assert(out.length == out.toSet.size)
    // NB the raw overlap predicate alone would claim the EMPTY b4=[3,3)
    // overlaps a1 (0<3 && 3<10) though the intersection is empty — the
    // nonempty guards are part of the correct nested-loop semantics
    val truth = a.join(b, col("as") < col("be") && col("bs") < col("ae") &&
        col("ae") > col("as") && col("be") > col("bs"))
      .select("aid", "bid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.toSet == truth)
    assert(out.toSet == Set(("a1", "b1"), ("a2", "b1"), ("a3", "b1"),
      ("a2", "b2"), ("a4", "b3")))
  }

  test("kll profiles: quantile accuracy and rescan-free merging") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vals = (0 until 60000)
      .map(i => (if (i % 2 == 0) "d1" else "d2", rnd.nextDouble() * 100))
    val df = vals.toDF("day", "v")
    val profiles = graft.ops.Sketches
      .kllProfile(df, "v", Seq(0.5, 0.9), Seq("day")).persist()
    // uniform[0,100): p50 ≈ 50, p90 ≈ 90 — KLL@k200 rank err ~1.65%
    profiles.collect().foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("v_p50")) - 50) < 4)
      assert(math.abs(r.getDouble(r.fieldIndex("v_p90")) - 90) < 4)
    }
    // merging the stored day profiles reproduces corpus quantiles
    val m = graft.ops.Sketches
      .kllMergeProfiles(profiles.select("v_kll"), "v", Seq(0.5, 0.9))
      .head()
    assert(math.abs(m.getDouble(1) - 50) < 4)
    assert(math.abs(m.getDouble(2) - 90) < 4)
    profiles.unpersist()
  }

  test("row diff: statuses, changed columns, NULL-safe comparisons") {
    import spark.implicits._
    val oldT = Seq(
      (1L, Some(10.0), "a"),   // unchanged
      (2L, Some(20.0), "b"),   // price changes
      (3L, None, "c"),         // NULL → NULL is unchanged
      (4L, Some(40.0), "d"),   // removed
      (5L, None, "e"))         // NULL → value: changed
      .toDF("k", "price", "status")
    val newT = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(25.0), "b"),
      (3L, None, "c"),
      (5L, Some(5.0), "e"),
      (6L, Some(60.0), "f"))   // added
      .toDF("k", "price", "status")
    val out = graft.ops.Diff
      .rowDiff(oldT, newT, Seq("k"), Seq("price", "status"))
      .orderBy("k").collect()
    def row(i: Int) = (out(i).getLong(0), out(i).getString(1),
      if (out(i).isNullAt(2)) null else out(i).getSeq[String](2).toList)
    assert(row(0) == ((1L, "unchanged", Nil)))
    assert(row(1) == ((2L, "changed", List("price"))))
    assert(row(2) == ((3L, "unchanged", Nil)))
    assert(row(3) == ((4L, "removed", null)))
    assert(row(4) == ((5L, "changed", List("price"))))
    assert(row(5) == ((6L, "added", null)))
  }

  test("cdc chunks survive insertions; fixed windows do not") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    // insert ONE word in the middle of the copy
    val shifted = ((1 to 30).map(i => s"tok$i") ++ Seq("INSERTED") ++
      (31 to 60).map(i => s"tok$i")).mkString(" ")
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")

    def sharedChunks(ch: org.apache.spark.sql.DataFrame): Long =
      ch.groupBy("chunk_text")
        .agg(count_distinct(col("doc_id")).as("n"))
        .where(col("n") === 2).count()

    val cdcShared = sharedChunks(
      graft.ops.Dedup.cdcChunks(docs, "doc_id", "text", divisor = 4))
    val fixedShared = sharedChunks(
      graft.ops.TextAnalysis.chunk(docs, "doc_id", "text", 4, 0))
    // fixed windows: every chunk after the insertion shifts — only the
    // prefix survives. CDC: boundaries re-synchronize right after the
    // inserted word, so chunks on BOTH sides still match.
    assert(cdcShared > fixedShared,
      s"cdc $cdcShared vs fixed $fixedShared")
    // chunks partition the document: reassembly is the identity
    val rejoined = graft.ops.Dedup
      .cdcChunks(docs, "doc_id", "text", divisor = 4)
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text")), " ").as("t2"))
      .join(docs, "doc_id")
      .where(col("t2") =!= col("text")).count()
    assert(rejoined == 0)
  }

  test("unigram log-likelihood: smoothing, unseen floor, fluency order") {
    import spark.implicits._
    val ref = Seq("a a a b", "a b c").toDF("text") // c: a=4, b=2, c=1; N=7, V=3
    val score = Seq(
      (1L, "a a"),        // high-prob tokens
      (2L, "c zzz"))      // rare + unseen
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .unigramLogLikelihood(score, "doc_id", "text", ref, "text")
      .orderBy("doc_id").collect()
    def lp(c: Long) = math.log((c + 1.0) / (7 + 1.0 * (3 + 1)))
    def r6d(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getLong(1) == 2 &&
      out(0).getDouble(2) == r6d(lp(4)))
    assert(out(1).getDouble(2) == r6d((lp(1) + lp(0)) / 2))
    // fluent doc scores higher (less negative), lower perplexity
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    assert(out(0).getDouble(3) < out(1).getDouble(3))
  }

  test("text normalization collapses case/whitespace variants") {
    import spark.implicits._
    val df = Seq(
      "Hello   World",
      "hello world",
      "\thello\nworld  ",
      "hello\u0001world",  // control char becomes a separator
      "different").toDF("text")
    val out = graft.ops.TextAnalysis.normalizeText(df, "text")
      .select("norm_text").collect().map(_.getString(0))
    assert(out.take(4).toSet == Set("hello world"))
    assert(out(4) == "different")
  }

  test("pca recovers planted directions; projection decorrelates") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // rank-2 structure in 6-d: strong dir u (sd 10), weaker dir w (sd 3),
    // isotropic noise (sd 0.1)
    val u = Array(1.0, 1, 0, 0, 0, 0).map(_ / math.sqrt(2))
    val w = Array(0.0, 0, 1, 1, 0, 0).map(_ / math.sqrt(2))
    val rows = (0 until 5000).map { _ =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 3
      Array.tabulate(6)(i =>
        a * u(i) + b * w(i) + rnd.nextGaussian() * 0.1) :+ 5.0
    }.map(v => Tuple1(v.dropRight(1).map(_ + 5.0))) // shift mean to 5
    val df = rows.toDF("embedding")
    val model = graft.ops.Pca.fit(df, "embedding", d = 6, k = 2)
    assert(model.n == 5000)
    // mean recovered
    assert(model.mean.forall(m => math.abs(m - 5.0) < 0.5))
    // PC1 ≈ ±u, PC2 ≈ ±w (|cos| close to 1); variances ≈ 100 and 9
    def absCos(a: Array[Double], b: Array[Double]) =
      math.abs((a, b).zipped.map(_ * _).sum) /
        math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(absCos(model.components(0), u) > 0.99)
    assert(absCos(model.components(1), w) > 0.99)
    assert(model.explainedVariance(0) > 80 &&
      model.explainedVariance(0) < 120)
    assert(model.explainedVariance(1) > 6 &&
      model.explainedVariance(1) < 12)
    // components orthonormal
    assert(math.abs((model.components(0), model.components(1)).zipped
      .map(_ * _).sum) < 1e-6)
    // projected coordinates decorrelate and carry the planted variance
    val proj = graft.ops.Pca.project(df, "embedding", model)
      .select(col("pca")(0).as("p0"), col("pca")(1).as("p1"))
    val stats = proj.agg(avg(col("p0") * col("p1")).as("cross"),
      stddev_samp(col("p0")).as("s0"),
      stddev_samp(col("p1")).as("s1")).head()
    assert(math.abs(stats.getDouble(0)) < 1.0)
    assert(math.abs(stats.getDouble(1) - 10) < 1.0)
    assert(math.abs(stats.getDouble(2) - 3) < 0.5)
    // whitening: both components come out unit-variance
    val white = graft.ops.Pca.projectWhitened(df, "embedding", model)
      .select(col("pca_white")(0).as("w0"), col("pca_white")(1).as("w1"))
      .agg(stddev_samp(col("w0")), stddev_samp(col("w1"))).head()
    assert(math.abs(white.getDouble(0) - 1.0) < 0.1)
    assert(math.abs(white.getDouble(1) - 1.0) < 0.1)
  }

  test("pca executor-side partial merge matches single-partition fit") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (0 until 3000).map { _ =>
      Tuple1(Array.tabulate(8)(i => rnd.nextGaussian() * (i + 1)))
    }.toDF("embedding")
    // 97 input partitions >> fanIn=5 forces both merge levels to do
    // real multi-way folds; result must equal the trivially-safe
    // 1-partition fit (same sums, so same covariance and eigenbasis)
    val many = graft.ops.Pca.fit(df.repartition(97), "embedding",
      d = 8, k = 3, fanIn = 5)
    val one = graft.ops.Pca.fit(df.coalesce(1), "embedding", d = 8, k = 3)
    assert(many.n == 3000 && one.n == 3000)
    many.mean.zip(one.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9) }
    many.explainedVariance.zip(one.explainedVariance).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-6 * math.max(1.0, b)) }
    many.components.zip(one.components).foreach { case (ca, cb) =>
      val cos = (ca, cb).zipped.map(_ * _).sum
      assert(math.abs(math.abs(cos) - 1.0) < 1e-6)
    }
  }

  test("search index: store equals direct bm25; append equals rebuild") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join strategies"), (2L, "hash hash scan"),
      (3L, "sort merge join"), (4L, "broadcast hash join plan"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("searchidx").toString
    graft.ops.TextAnalysis.writeSearchIndex(docs, "doc_id", "text",
      s"$dir/a")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val direct = key(graft.ops.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq("hash", "scan")))
    val stored = key(graft.ops.TextAnalysis
      .searchIndex(spark, s"$dir/a", Seq("hash", "scan"),
        idCol = "doc_id"))
    assert(stored == direct)
    // incremental append == full rebuild over the concatenated corpus
    val more = Seq((5L, "scan scan scan"), (6L, "no match here"))
      .toDF("doc_id", "text")
    graft.ops.TextAnalysis.appendToSearchIndex(more, "doc_id", "text",
      s"$dir/a")
    graft.ops.TextAnalysis.writeSearchIndex(docs.unionByName(more),
      "doc_id", "text", s"$dir/b")
    val appended = key(graft.ops.TextAnalysis
      .searchIndex(spark, s"$dir/a", Seq("hash", "scan"),
        idCol = "doc_id"))
    val rebuilt = key(graft.ops.TextAnalysis
      .searchIndex(spark, s"$dir/b", Seq("hash", "scan"),
        idCol = "doc_id"))
    assert(appended == rebuilt && appended.map(_._1).contains(5L))
  }

  test("joinFanout predicts the exact join size; schemaDiff reports drift") {
    import spark.implicits._
    val a = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "va")
    val b = Seq((1L, 10), (1L, 20), (1L, 30), (3L, 40)).toDF("k", "vb")
    val f = graft.ops.SkewAware.joinFanout(a, b, Seq("k")).head()
    // key 1: 2×3 = 6 rows; keys 2 and 3 unmatched
    assert(f.getLong(0) == 1 && f.getLong(1) == 6 && f.getLong(2) == 6)
    assert(f.getLong(1) == a.join(b, "k").count()) // exact, not estimate
    // disjoint keys: zero everything, NULL share (no division error)
    val z = graft.ops.SkewAware
      .joinFanout(a, Seq((9L, 1)).toDF("k", "vb"), Seq("k")).head()
    assert(z.getLong(1) == 0 && z.isNullAt(3))
    // schema drift: added / removed / type-changed
    val v1 = Seq((1L, "s", 1.0)).toDF("id", "name", "score")
    val v2 = Seq((1L, 1, true)).toDF("id", "name", "fresh")
    val diff = graft.analysis.AnalysisPlanner.schemaDiff(v1, v2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff == Set(("fresh", "added"), ("score", "removed"),
      ("name", "type_changed")))
  }

  test("clusterQuality: separated clusters beat overlapping ones") {
    import spark.implicits._
    val rnd = new scala.util.Random(89)
    def blob(center: Double, ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(4)(_ => center + rnd.nextGaussian() * 0.2))
    }
    // well-separated: centers 0 and 10
    val sep = (blob(0.0, 0 until 500) ++ blob(10.0, 500 until 1000))
      .toDF("vec_id", "embedding")
    val cSep = Array(Array.fill(4)(0.0), Array.fill(4)(10.0))
    val qSep = graft.ops.Similarity
      .clusterQuality(sep, "vec_id", "embedding", cSep).head()
    // overlapping: centers 0 and 0.5 with the same spread
    val ovl = (blob(0.0, 0 until 500) ++ blob(0.5, 500 until 1000))
      .toDF("vec_id", "embedding")
    val cOvl = Array(Array.fill(4)(0.0), Array.fill(4)(0.5))
    val qOvl = graft.ops.Similarity
      .clusterQuality(ovl, "vec_id", "embedding", cOvl).head()
    assert(qSep.getDouble(1) < 0.2, s"separated DB ${qSep.getDouble(1)}")
    assert(qOvl.getDouble(1) > qSep.getDouble(1) * 5)
    // balanced halves → entropy ≈ ln 2
    assert(math.abs(qSep.getDouble(2) - math.log(2)) < 0.05)
    assert(qSep.getLong(3) == 1000)
  }

  test("df-resident kmeans matches literal path when probing all blocks") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val corpus = (0 until 2000).map { i =>
      (i.toLong, Array.tabulate(4)(_ => rnd.nextGaussian() * 5))
    }.toDF("vec_id", "embedding")
    val cells = 8
    // literal path
    val litProfile = graft.ops.Similarity
      .kmeansProfile(corpus, "vec_id", "embedding", cells, iters = 2,
        roundDp = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    // DF path, seeded with the literal path's init (lowest-id vectors,
    // cell = rank) and probing every coarse block → assignment is exact,
    // so rounded centroids and the profile must agree
    val init = corpus.orderBy("vec_id").limit(cells)
      .collect().zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Double](1).toArray) }
      .toSeq.toDF("cell", "centroid")
    val idx = graft.ops.Similarity.kmeansCentroidsDF(corpus, "vec_id",
      "embedding", cells, iters = 2, roundDp = 4,
      coarseProbe = Int.MaxValue, init = Some(init))
    val dfProfile = graft.ops.Similarity
      .assignCellsDF(corpus, "vec_id", "embedding", idx)
      .groupBy(col("__cell").as("cell"))
      .agg(count(lit(1)).as("n"), avg(col("__dist")).as("mean_dist"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(dfProfile.keySet == litProfile.keySet)
    dfProfile.foreach { case (cell, (n, d)) =>
      val (ln, ld) = litProfile(cell)
      assert(n == ln, s"cell $cell size $n vs $ln")
      assert(math.abs(d - ld) < 1e-9, s"cell $cell dist $d vs $ld")
    }
  }

  test("kmeans auto-routes to DF path at 10k cells; every row assigned") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val corpus = (0 until 20000).map { i =>
      (i.toLong, Array.tabulate(4)(_ => rnd.nextGaussian()))
    }.toDF("vec_id", "embedding").repartition(8)
    // cells > defaultCellThreshold → DataFrame-resident path: no
    // cells×dim literal broadcast, no per-iteration driver collect
    val prof = graft.ops.Similarity.kmeansProfile(corpus, "vec_id",
      "embedding", cells = 10000, iters = 1)
    val agg = prof.agg(sum("n"), count(lit(1))).head()
    assert(agg.getLong(0) == 20000)         // every row lands in a cell
    assert(agg.getLong(1) <= 10000)         // at most `cells` cells
    assert(prof.where(col("mean_dist") < 0).isEmpty)
    // semanticDedup over the same route stays keep-consistent
    val sem = graft.ops.Dedup.semanticDedup(
      corpus.where(col("vec_id") < 3000), "vec_id",
      "embedding", cells = 5000, iters = 1, roundDp = 4,
      threshold = 0.999)
    assert(sem.count() == 3000)
    assert(sem.where(!col("keep")).count() < 3000)
  }

  test("audioChunkPlan: ranges tile the stream; slices reassemble") {
    import spark.implicits._
    // 10-sample payload (20 bytes, PCM16 mono), 4-sample chunks, 2 hop
    val payload = (0 until 20).map(_.toByte).toArray
    val df = Seq(("u1", payload.length.toLong, payload))
      .toDF("uri", "size_bytes", "content")
    val plan = graft.ops.Multimodal.audioChunkPlan(df, "uri", "size_bytes",
      sampleRate = 4, bytesPerSample = 2, channels = 1,
      chunkSeconds = 1.0, overlapSeconds = 0.5)
      .orderBy("chunk_idx").collect()
    // total 10 samples, chunk 4, hop 2 → ceil((10-4)/2)+1 = 4 chunks
    assert(plan.length == 4)
    assert(plan.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 4L), (2L, 4L), (4L, 4L), (6L, 4L)))
    // last chunk ends exactly at the stream end; none overruns
    assert(plan.forall(r => r.getLong(4) + r.getLong(5) <= 20))
    assert(plan.last.getLong(4) + plan.last.getLong(5) == 20)
    // byte slices line up with the computed offsets
    val sliced = graft.ops.Multimodal.audioChunkPlan(df, "uri",
      "size_bytes", 4, 2, 1, 1.0, 0.5)
      .join(df, "uri")
      .withColumn("chunk", expr(
        "substring(content, cast(start_byte + 1 as int), cast(n_bytes as int))"))
      .orderBy("chunk_idx").collect()
    val first = sliced.head.getAs[Array[Byte]]("chunk")
    assert(first.toSeq == payload.take(8).toSeq)
    // truncated tail: 11-sample payload → last chunk 3 samples
    val odd = Seq(("u2", 22L)).toDF("uri", "size_bytes")
    val tail = graft.ops.Multimodal.audioChunkPlan(odd, "uri",
      "size_bytes", 4, 2, 1, 1.0, 0.5).orderBy("chunk_idx").collect().last
    assert(tail.getLong(3) == 3L && tail.getLong(5) == 6L)
  }

  test("behavioral/series ops survive empty and degenerate inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, String)].toDF("u", "t", "et")
    // funnel on an empty stream: every step reports 0
    val f = graft.ops.Behavioral
      .funnel(empty, "u", "t", "et", Seq("a", "b"))
      .orderBy("step_idx").collect()
    assert(f.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    // transitions/inter-arrival: single-event users → empty / NULL stats
    val one = Seq((1L, 10L, "a")).toDF("u", "t", "et")
    assert(graft.ops.Behavioral
      .eventTransitions(one, "u", "t", "et").isEmpty)
    val ia = graft.ops.Behavioral.interArrival(one, "u", "t").head()
    assert(ia.getLong(1) == 0 && ia.isNullAt(2))
    // ewma on empty input: empty output, no kernel crash
    assert(graft.ops.TimeSeries
      .ewma(empty.toDF("k", "t", "v"), Seq("k"), "t", "v", span = 3)
      .isEmpty)
    // MMD with sides too small to pair: zero pairs, NULL estimate
    val tiny = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val mmd = graft.ops.Features.embeddingMmd(tiny, tiny).head()
    assert(mmd.getLong(1) == 0 && mmd.isNullAt(0))
  }

  test("funnel: strict sequential conversion; out-of-order never counts") {
    import spark.implicits._
    val ev = Seq(
      // u1 converts fully in order
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "buy"),
      // u2: view BEFORE signup → drops at step 2
      (2L, 10L, "view"), (2L, 20L, "signup"),
      // u3: signup only
      (3L, 5L, "signup"),
      // u4: never signs up
      (4L, 1L, "view"), (4L, 2L, "buy"))
      .toDF("u", "t", "et")
    val out = graft.ops.Behavioral
      .funnel(ev, "u", "t", "et", Seq("signup", "view", "buy"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "signup", 3L), (2, "view", 1L),
      (3, "buy", 1L)))
  }

  test("funnel maxGapSeconds: conversions outside the window drop") {
    import spark.implicits._
    val ev = Seq(
      // u1: view 10 s after signup — outside a 5 s window
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 21L, "buy"),
      // u2: signup→view in 4 s, buy 96 s later — drops at step 3
      (2L, 0L, "signup"), (2L, 4L, "view"), (2L, 100L, "buy"),
      // u3: fully inside the window
      (3L, 0L, "signup"), (3L, 3L, "view"), (3L, 6L, "buy"))
      .toDF("u", "t", "et")
      .withColumn("ts", timestamp_seconds(col("t")))
    val out = graft.ops.Behavioral
      .funnel(ev, "u", "ts", "et", Seq("signup", "view", "buy"),
        maxGapSeconds = Some(5L))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "signup", 3L), (2, "view", 2L),
      (3, "buy", 1L)))
  }

  test("cohortRetention: offsets count returning users per cohort") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-08"), (1L, "2024-01-22"),
      (2L, "2024-01-02"), (2L, "2024-01-03"),  // same week twice → once
      (3L, "2024-01-08"))
      .toDF("u", "d")
      .withColumn("ts", col("d").cast("timestamp"))
    val out = graft.ops.Behavioral
      .cohortRetention(ev, "u", "ts", "week")
      .orderBy("cohort", "period_offset").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getLong(2)))
    // week of 2024-01-01: u1+u2 at offset 0; u1 at offsets 1 and 3.
    // week of 2024-01-08: u3 at offset 0.
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-01", 3L, 1L), ("2024-01-08", 0L, 1L)))
  }

  test("mutualInformation: ~0 for independent, ~ln(bins) for identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val ind = (0 until 20000).map(_ =>
      (rnd.nextDouble(), rnd.nextDouble())).toDF("x", "y")
    val miInd = graft.analysis.AnalysisPlanner
      .mutualInformation(ind, "x", "y", bins = 8).head().getDouble(0)
    assert(miInd >= 0 && miInd < 0.02, s"independent MI $miInd")
    val same = (0 until 20000).map(_ => rnd.nextDouble())
      .map(v => (v, v)).toDF("x", "y")
    val miSame = graft.analysis.AnalysisPlanner
      .mutualInformation(same, "x", "y", bins = 8).head().getDouble(0)
    assert(math.abs(miSame - math.log(8)) < 0.05, s"identity MI $miSame")
  }

  test("bigramLogLikelihood ranks ordered text above scrambled") {
    import spark.implicits._
    val ref = Seq("the cat sat on the mat", "the dog sat on the rug")
      .map(Tuple1(_)).toDF("text")
    val docs = Seq(
      (1L, "the cat sat on the rug"),   // fluent bigrams
      (2L, "rug the on sat cat the"))   // same words, wrong order
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .bigramLogLikelihood(docs, "doc_id", "text", ref, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    assert(out(0).getDouble(3) < out(1).getDouble(3)) // lower perplexity
  }

  test("density histogram integrates to 1, globally and per segment") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val df = (0 until 4000).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextGaussian() * (i % 2 + 1)))
      .toDF("seg", "x")
    val bins = 16
    val global = graft.analysis.AnalysisPlanner.density(df, "x", bins)
    val (lo, hi) = {
      val r = df.agg(min("x"), max("x")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val width = (hi - lo) / bins
    val integral = global.agg(sum(col("density") * width)).head().getDouble(0)
    assert(math.abs(integral - 1.0) < 1e-9)
    // segmented: each segment's density integrates to 1 over the SHARED
    // global bounds
    val seg = graft.analysis.AnalysisPlanner
      .density(df, "x", bins, segmentBy = Some("seg"))
      .groupBy("seg").agg(sum(col("density") * width).as("i"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(seg.keySet == Set("a", "b"))
    seg.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
    // dispatch via the Distribution spec
    val viaSpec = graft.analysis.AnalysisPlanner.distribution(df,
      graft.analysis.Distribution(feature = "x", bins = bins,
        outputs = Seq("density")))
    assert(viaSpec.columns.toSeq == Seq("bucket", "n", "density"))
  }

  test("ewma matches the hand-computed recursion; nulls carry forward") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, Double.NaN), (1L, 4, 40.0),
      (2L, 1, 5.0))
      .toDF("k", "t", "v")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val out = graft.ops.TimeSeries
      .ewma(df, Seq("k"), "t", "v", span = 3) // alpha = 0.5
      .orderBy("k", "t").collect()
    val e = out.map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(e(0) == 10.0)
    assert(e(1) == 0.5 * 20 + 0.5 * 10)        // 15
    assert(e(2) == 15.0)                       // null carries state
    assert(e(3) == 0.5 * 40 + 0.5 * 15)        // 27.5
    assert(e(4) == 5.0)                        // new entity resets
  }

  test("rollingCorrelation: perfect linear window → 1; stable on epochs") {
    import spark.implicits._
    val df = (1 to 50).map(i =>
      (1L, 1700000000L + i * 60L, 1700000000.0 + i * 60.0))
      .toDF("k", "t", "y")
      .withColumn("x", col("t").cast("double"))
    val out = graft.ops.TimeSeries
      .rollingCorrelation(df, Seq("k"), "t", "x", "y", window = 7)
      .orderBy("t").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("roll_corr"))) // n=1
    // y is an exact linear function of x at epoch magnitudes — the
    // stable co-moment path must return 1 within fp, never > 1
    out.drop(1).foreach { r =>
      val c = r.getDouble(r.fieldIndex("roll_corr"))
      assert(math.abs(c - 1.0) < 1e-9 && c <= 1.0 + 1e-12)
    }
  }

  test("groupOls recovers a planted line per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (0 until 2000).map { i =>
      val g = i % 2
      val x = rnd.nextDouble() * 100
      val y = if (g == 0) 3.0 * x + 7 + rnd.nextGaussian() * 0.01
              else -2.0 * x + 100 + rnd.nextGaussian() * 0.01
      (g, x, y)
    }.toDF("g", "x", "y")
    val out = graft.analysis.AnalysisPlanner
      .groupOls(rows, Seq("g"), "x", "y")
      .orderBy("g").collect()
    assert(math.abs(out(0).getDouble(2) - 3.0) < 0.01)   // slope g0
    assert(math.abs(out(0).getDouble(3) - 7.0) < 0.1)    // intercept g0
    assert(out(0).getDouble(4) > 0.999)                  // r2
    assert(math.abs(out(1).getDouble(2) + 2.0) < 0.01)
    // degenerate group: constant x → NULL coefficients
    val deg = graft.analysis.AnalysisPlanner
      .groupOls(Seq((9, 1.0, 5.0), (9, 1.0, 6.0)).toDF("g", "x", "y"),
        Seq("g"), "x", "y").head()
    assert(deg.isNullAt(2) && deg.isNullAt(3))
  }

  test("impute fills mean/median/mode/const; non-null rows untouched") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, 20.0, "a"), (3L, null, "b"),
      (4L, 40.0, null), (5L, null, null))
      .toDF("id", "v", "s")
    val out = graft.ops.Features
      .impute(df, Map("v" -> "median", "s" -> "mode"))
      .orderBy("id").collect()
    assert(out(2).getDouble(1) == 20.0) // median of 10,20,40
    assert(out(3).getString(2) == "a")  // mode
    assert(out(0).getDouble(1) == 10.0) // untouched
    val cm = graft.ops.Features
      .impute(df, Map("v" -> "mean", "s" -> "zzz"))
      .orderBy("id").collect()
    assert(math.abs(cm(2).getDouble(1) - 70.0 / 3) < 1e-12)
    assert(cm(4).getString(2) == "zzz")
  }

  test("targetEncode: smoothing shrinks to global mean; LOO excludes self") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0))
      .toDF("cat", "y")
    val gmean = 130.0 / 3
    val plain = graft.ops.Features
      .targetEncode(df, "cat", "y", alpha = 1.0)
      .orderBy("cat", "y").collect()
    assert(math.abs(plain(0).getDouble(2) - (30 + gmean) / 3) < 1e-12)
    assert(math.abs(plain(2).getDouble(2) - (100 + gmean) / 2) < 1e-12)
    // LOO: singleton category falls to pure smoothed global mean
    val loo = graft.ops.Features
      .targetEncode(df, "cat", "y", alpha = 1.0, leaveOneOut = true)
      .orderBy("cat", "y").collect()
    assert(math.abs(loo(0).getDouble(2) - (20 + gmean) / 2) < 1e-12)
    assert(math.abs(loo(2).getDouble(2) - (0 + gmean) / 1) < 1e-12)
  }

  test("hashSplit: stable under growth, partitions completely, ~weights") {
    import spark.implicits._
    val df = (0 until 5000).map(i => Tuple1(i.toLong)).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = graft.ops.Sampling.hashSplit(df, splits, Seq("id"))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000)
    assert(math.abs(counts("train") - 4000) < 200)
    assert(math.abs(counts("val") - 500) < 100)
    // growth stability: a row's split never changes when rows are added
    val grown = graft.ops.Sampling.hashSplit(
      (0 until 10000).map(i => Tuple1(i.toLong)).toDF("id"),
      splits, Seq("id"))
    val before = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    grown.where(col("id") < 5000).collect().foreach { r =>
      assert(before(r.getLong(0)) == r.getString(1))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.hashSplit(df, Seq("a" -> 0.5, "b" -> 0.4),
        Seq("id"))
    }
  }

  test("exactStratifiedSample: exactly min(n, stratum size) per stratum") {
    import spark.implicits._
    val df = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 105).map(i => (i.toLong, "small")))
      .toDF("id", "s")
    val out = graft.ops.Sampling
      .exactStratifiedSample(df, 20, Seq("s"), Seq("id"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("big" -> 20L, "small" -> 5L))
    // deterministic: same subset on re-evaluation
    val a = graft.ops.Sampling
      .exactStratifiedSample(df, 20, Seq("s"), Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Sampling
      .exactStratifiedSample(df.repartition(7), 20, Seq("s"), Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("hardNegatives: never same label, top-k by cosine") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(4)(_ => rnd.nextGaussian()), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity
      .hardNegatives(df, df.where(col("vec_id") < 5), k = 4)
    val rows = out.collect()
    assert(rows.length == 20) // 5 queries × 4
    val labels = df.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach { r =>
      assert(labels(r.getLong(0)) != r.getInt(3),
        s"query ${r.getLong(0)} got same-label negative")
    }
  }

  test("woeBins: separating feature has large IV, uninformative ~0") {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    // label 1 concentrated high, label 0 low → separating
    val sep = (0 until 4000).map { _ =>
      val y = rnd.nextInt(2)
      (if (y == 1) 10 + rnd.nextGaussian() else rnd.nextGaussian(), y)
    }.toDF("x", "y")
    val ivSep = graft.ops.Features.woeBins(sep, "x", "y", bins = 8)
      .agg(sum("iv_term")).head().getDouble(0)
    assert(ivSep > 1.0, s"separating IV $ivSep")
    // same distribution for both classes → IV near zero
    val flat = (0 until 4000).map(_ =>
      (rnd.nextGaussian(), rnd.nextInt(2))).toDF("x", "y")
    val ivFlat = graft.ops.Features.woeBins(flat, "x", "y", bins = 8)
      .agg(sum("iv_term")).head().getDouble(0)
    assert(ivFlat >= 0 && ivFlat < 0.05, s"flat IV $ivFlat")
  }

  test("psiOverTime: stable weeks ~0, shifted week spikes") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    // 3 stable weeks then one shifted week
    val rows = (0 until 4).flatMap { wk =>
      val shift = if (wk == 3) 5.0 else 0.0
      (0 until 2000).map { _ =>
        (java.sql.Timestamp.valueOf(s"2024-01-${1 + wk * 7} 12:00:00"),
          rnd.nextGaussian() + shift)
      }
    }.toDF("ts", "v")
    val out = graft.analysis.AnalysisPlanner
      .psiOverTime(rows, "ts", "v", "week", bins = 10)
      .orderBy("period").collect()
    assert(out.length == 3) // weeks 2..4 each have a predecessor
    assert(out(0).getDouble(1) < 0.1 && out(1).getDouble(1) < 0.1)
    assert(out(2).getDouble(1) > 1.0, s"shift PSI ${out(2).getDouble(1)}")
  }

  test("embeddingMmd: ~0 for same distribution, positive under shift") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    def gauss(n: Int, ids: Range, shift: Double) = ids.take(n).map { i =>
      (i.toLong, Array.tabulate(8)(_ => rnd.nextGaussian() + shift))
    }.toDF("vec_id", "embedding")
    val a = gauss(2000, 0 until 2000, 0.0)
    val same = gauss(2000, 2000 until 4000, 0.0)
    val shifted = gauss(2000, 2000 until 4000, 1.0)
    val mmdSame = graft.ops.Features.embeddingMmd(a, same, sigma = 2.0)
      .head().getDouble(0)
    val mmdShift = graft.ops.Features.embeddingMmd(a, shifted, sigma = 2.0)
      .head().getDouble(0)
    assert(math.abs(mmdSame) < 0.05, s"same-dist MMD $mmdSame")
    assert(mmdShift > 0.1, s"shifted MMD $mmdShift")
    assert(mmdShift > mmdSame * 5)
  }

  test("embeddingDrift: identical corpora → cosine 1, l2 0") {
    import spark.implicits._
    val df = (0 until 100).map { i =>
      Tuple1(Array.tabulate(6)(j => (i + j).toDouble))
    }.toDF("embedding")
    val same = graft.ops.Features.embeddingDrift(df, df).head()
    assert(math.abs(same.getDouble(0) - 1.0) < 1e-12)
    assert(same.getDouble(1) < 1e-9 && same.getDouble(2) < 1e-9)
    val shifted = graft.ops.Features.embeddingDrift(df,
      df.select(transform(col("embedding"), x => x + 10.0).as("embedding")))
      .head()
    assert(shifted.getDouble(1) > 1.0) // l2 moved
    assert(math.abs(shifted.getDouble(2) - 10.0) < 1e-9)
  }

  test("dsirLogRatio: target-like docs score higher than off-domain") {
    import spark.implicits._
    val target = Seq("alpha beta gamma", "alpha beta delta")
      .map(Tuple1(_)).toDF("text")
    val docs = Seq(
      (1L, "alpha beta gamma"),   // in-domain
      (2L, "zeta eta theta"))     // off-domain
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .dsirLogRatio(docs, "doc_id", "text", target, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("fuzzyPairs hot-block cap bounds pairs; small blocks untouched") {
    import spark.implicits._
    val hot = (0 until 500).map(i => (i.toLong, f"hot item $i%04d"))
    val tiny = (1000 until 1005).map(i => (i.toLong, f"tiny item $i%04d"))
    val df = (hot ++ tiny).toDF("id", "name")
    val capped = graft.ops.Dedup.fuzzyPairs(df, "id", "name",
      maxDist = 4, maxBlock = 20)
    val full = graft.ops.Dedup.fuzzyPairs(df, "id", "name",
      maxDist = 4, maxBlock = 0)
    // hot block: 500 names, all mutually within 4 edits → uncapped is
    // quadratic; the default-on cap keeps a ~20-candidate subset so
    // pair volume is O(pop · maxBlock)
    val fullHot = full.where(col("id_a") < 1000).count()
    val cappedHot = capped.where(col("id_a") < 1000).count()
    assert(fullHot == 500L * 499 / 2)
    assert(cappedHot > 0 && cappedHot <= 500L * 25)
    // the 5-name block sits under the cap → bit-exact untouched
    def tinyPairs(d: org.apache.spark.sql.DataFrame) =
      d.where(col("id_a") >= 1000).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(tinyPairs(capped) == tinyPairs(full) && tinyPairs(full).nonEmpty)
  }

  test("ivfKnnDFWith equals literal-centroid ivfKnnWith on same index") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val corpus = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(6)(_ => rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 10)
    val idx = graft.ops.Similarity.kmeansCentroidsDF(corpus, "vec_id",
      "embedding", cells = 12, iters = 1, roundDp = 4,
      coarseProbe = Int.MaxValue)
    // same centroids, literal form — DF path must reproduce it exactly
    // when it probes every coarse block and every cell
    val centRows = idx.centroids.orderBy("cell").collect()
    assert(centRows.map(_.getLong(0)).toSeq ==
      centRows.indices.map(_.toLong)) // contiguous cell ids
    val cents = centRows.map(_.getSeq[Double](1).toArray)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    val viaDf = graft.ops.Similarity.ivfKnnDFWith(corpus, queries, k = 5,
      idx, nProbe = 12)
    val viaLit = graft.ops.Similarity.ivfKnnWith(corpus, queries, k = 5,
      cents, nProbe = 12)
    assert(key(viaDf) == key(viaLit))
  }

  test("bloom semi/anti joins are exactly the plain joins") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val left = (0 until 5000).map(_ => rnd.nextInt(10000).toLong)
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "k")
    val right = (0 until 400).map(_ => rnd.nextInt(10000).toLong)
      .map(Tuple1(_)).toDF("k")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id").collect().map(_.getLong(0)).toSet
    val semi = ids(graft.ops.Joins.bloomSemiJoin(left, right, Seq("k")))
    val anti = ids(graft.ops.Joins.bloomAntiJoin(left, right, Seq("k")))
    assert(semi == ids(left.join(right, Seq("k"), "left_semi")))
    assert(anti == ids(left.join(right, Seq("k"), "left_anti")))
    assert(semi.intersect(anti).isEmpty &&
      (semi ++ anti) == ids(left))
    // empty right side: semi empty, anti everything — no NPE on the
    // NULL bloom
    val empty = Seq.empty[Tuple1[Long]].toDF("k")
    assert(ids(graft.ops.Joins.bloomSemiJoin(left, empty, Seq("k"))).isEmpty)
    assert(ids(graft.ops.Joins.bloomAntiJoin(left, empty, Seq("k")))
      == ids(left))
  }

  test("key skew profile: exact shape stats and the suggested salt") {
    import spark.implicits._
    // 80 rows on 'hot', 10 on 'a', 10 on 'b' → avg 100/3, skew 2.4
    val df = (Seq.fill(80)("hot") ++ Seq.fill(10)("a") ++ Seq.fill(10)("b"))
      .toDF("k")
    val r = graft.ops.SkewAware.keySkewProfile(df, Seq("k")).head()
    assert(r.getAs[Long]("n_keys") == 3 && r.getAs[Long]("n_rows") == 100)
    assert(r.getAs[Long]("max_rows") == 80)
    assert(math.abs(r.getAs[Double]("top_share") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("skew_ratio") - 2.4) < 1e-12)
    assert(r.getAs[Int]("suggested_salt") == 3) // ceil(2.4)
    // balanced keys need no salt
    val flat = (1 to 90).map(i => s"k${i % 9}").toDF("k")
    assert(graft.ops.SkewAware.keySkewProfile(flat, Seq("k"))
      .head().getAs[Int]("suggested_salt") == 1)
  }

  test("fuzzy pairs: edit-distance matches inside blocks only") {
    import spark.implicits._
    val df = Seq(
      (1L, "red widget"),
      (2L, "red widgett"),   // dist 1, same block → pair
      (3L, "red wadget"),    // dist 1 from #1, 2 from #2 → pairs
      (4L, "blue widget"),   // different block: never compared to red*
      (5L, "red completely")) // same block, far → no pair
      .toDF("pid", "nm")
    val out = graft.ops.Dedup.fuzzyPairs(df, "pid", "nm", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)))
    // blocking is a recall trade: "blue widget" vs "red widget" (dist 3
    // anyway) and cross-block near-pairs are DELIBERATELY unseen
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("temperature mix rebalances source shares toward p^(1/T)") {
    import spark.implicits._
    val df = ((1 to 800).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "s1")) ++
      (2001 to 2100).map(i => (i.toLong, "s2")))
      .toDF("doc_id", "source")
    val (mixed, rates) = graft.ops.Sampling
      .temperatureMix(df, "source", temperature = 2.0, Seq("doc_id"))
    // p = (.8, .1, .1); rate ∝ p^(-1/2) → small sources keep rate 1.0,
    // the big one keeps sqrt(.1/.8) ≈ .3536
    assert(math.abs(rates("s1") - 1.0) < 1e-12 &&
      math.abs(rates("s2") - 1.0) < 1e-12)
    assert(math.abs(rates("big") - math.sqrt(0.125)) < 1e-12)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small sources kept whole (rate 1.0 ⇒ every row, one copy)
    assert(bySrc("s1") == 100 && bySrc("s2") == 100)
    // big source downsampled to ≈ 283 (hash-coin variance tolerated)
    assert(bySrc("big") > 220 && bySrc("big") < 340, bySrc("big"))
    // T=1 is the identity mix: every source at rate 1
    val (id1, r1) = graft.ops.Sampling
      .temperatureMix(df, "source", 1.0, Seq("doc_id"))
    assert(r1.values.forall(v => math.abs(v - 1.0) < 1e-12))
    assert(id1.count() == 1000)
  }

  test("pmi min-count prunes support below the threshold") {
    import spark.implicits._
    val docs = Seq("a b a b", "a c").toDF("text")
    val out = graft.ops.TextAnalysis
      .pmiBigrams(docs, "text", minCount = 2, k = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("a", "b")))
  }

  test("perKeyCap keeps under-cap keys whole and ranks only hot keys") {
    import spark.implicits._
    val df = ((1 to 3).map(i => (i.toLong, "cold")) ++
      (11 to 30).map(i => (i.toLong, "hot"))).toDF("id", "k")
    val out = graft.ops.Sampling.perKeyCap(df, Seq("k"), 5, Seq("id"))
    val byKey = out.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("cold" -> 3L, "hot" -> 5L))
    // survivors are EXACTLY the 5 smallest portable hashes — replayable
    val expected = df.where($"k" === "hot")
      .withColumn("__h",
        graft.functions.PortableHash.bucket(Seq($"id".cast("string"))))
      .orderBy($"__h", $"id").limit(5)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = out.where($"k" === "hot").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    // column set preserved (no helper columns leak)
    assert(out.columns.toSeq == df.columns.toSeq)
  }

  test("two-proportion z-test matches the hand formula") {
    import graft.analysis._
    import spark.implicits._
    // A: 40 trials 10 successes; B: 60 trials 30 successes
    val rows = (1 to 40).map(i => ("a", if (i <= 10) 1 else 0)) ++
      (1 to 60).map(i => ("b", if (i <= 30) 1 else 0))
    val df = rows.toDF("grp", "ok")
    val r = AnalysisPlanner
      .statTest(df, StatTest("ok", "ztest_proportions", "grp", "a", "b"))
      .head()
    assert(r.getAs[Long]("n_c") == 40 && r.getAs[Long]("n_t") == 60)
    assert(r.getAs[Long]("x_c") == 10 && r.getAs[Long]("x_t") == 30)
    val (pc, pt, pp) = (0.25, 0.5, 0.4)
    val z = (pt - pc) / math.sqrt(pp * (1 - pp) * (1.0 / 40 + 1.0 / 60))
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-12)
  }

  test("attribution credits last vs first touch; no-touch is (none)") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view → click → purchase(10) → purchase(5)
      (1L, 1L, "view", 0.0), (1L, 2L, "click", 0.0),
      (1L, 3L, "purchase", 10.0), (1L, 4L, "purchase", 5.0),
      // user 2: purchase with no prior touch
      (2L, 5L, "purchase", 7.0))
      .toDF("user_id", "ts", "event_type", "value")
    def runWith(model: String) = graft.ops.Behavioral
      .attribution(ev, "user_id", "ts", "event_type", "value",
        "purchase", model)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val last = runWith("last_touch")
    // both of user 1's purchases follow the click (the purchase at ts=3
    // is NOT a touch for the one at ts=4 — target events never credit)
    assert(last == Map("click" -> ((2L, 15.0)), "(none)" -> ((1L, 7.0))))
    val first = runWith("first_touch")
    assert(first == Map("view" -> ((2L, 15.0)), "(none)" -> ((1L, 7.0))))
  }

  test("gini: uniform totals → 0, single-key concentration → (n-1)/n") {
    import graft.analysis.AnalysisPlanner
    import spark.implicits._
    // 4 keys, equal totals → perfect equality
    val eq = (1 to 4).flatMap(k => Seq((s"k$k", 50.0), (s"k$k", 50.0)))
      .toDF("k", "v")
    val g0 = AnalysisPlanner.giniConcentration(eq, Seq("k"), "v").head()
    assert(g0.getAs[Long]("n_keys") == 4)
    assert(math.abs(g0.getAs[Double]("gini")) < 1e-12)
    // all value on one of n keys → G = (n-1)/n
    val con = Seq(("a", 1000.0), ("b", 0.0), ("c", 0.0), ("d", 0.0))
      .toDF("k", "v")
    val g1 = AnalysisPlanner.giniConcentration(con, Seq("k"), "v").head()
    assert(math.abs(g1.getAs[Double]("gini") - 0.75) < 1e-12)
  }

  test("agg store: two ingests ≡ one full aggregation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("aggstore").toString + "/store"
    val all = (1 to 100).map(i =>
      (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    graft.etl.AggStore.ingest(spark, dir, all.where($"v" <= 50), Seq("k"), "v")
    graft.etl.AggStore.ingest(spark, dir, all.where($"v" > 50), Seq("k"), "v")
    val inc = graft.etl.AggStore
      .finalizeStats(graft.etl.AggStore.read(spark, dir), Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val full = all.groupBy("k")
      .agg(count("v").as("n"), avg("v").as("mean"),
        stddev_samp("v").as("std"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(inc.keySet == full.keySet)
    inc.foreach { case (k, (n, mean, std, mn, mx)) =>
      val (fn, fmean, fstd, fmn, fmx) = full(k)
      assert(n == fn && mn == fmn && mx == fmx)
      assert(math.abs(mean - fmean) < 1e-9 && math.abs(std - fstd) < 1e-9)
    }
  }

  test("embedding decontamination flags only above-threshold train docs") {
    import spark.implicits._
    val mk = (id: Long, v: Seq[Double]) => (id, v.map(_.toFloat).toArray)
    val train = Seq(
      mk(1L, Seq(1.0, 0.0)),   // identical to eval 10 → cos 1
      mk(2L, Seq(0.8, 0.2)),   // cos 0.970 to eval 10 — below threshold
      mk(3L, Seq(0.0, 1.0)))   // orthogonal to eval 10, = eval 11
      .toDF("id", "vec")
    val eval = Seq(mk(10L, Seq(2.0, 0.0)), mk(11L, Seq(0.0, 3.0)))
      .toDF("id", "vec")
    val out = graft.ops.Dedup
      .embeddingDecontaminate(train, eval, "id", "vec", 0.99)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // 1 hits eval 10 exactly; 3 hits eval 11 exactly; 2 is below 0.99
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L)._1 == 1 && out(1L)._3 == 10L &&
      math.abs(out(1L)._2 - 1.0) < 1e-12)
    assert(out(3L)._3 == 11L)
    // tie on max_cos picks the SMALLEST eval id deterministically
    val both = graft.ops.Dedup.embeddingDecontaminate(
      Seq(mk(7L, Seq(1.0, 0.0))).toDF("id", "vec"),
      Seq(mk(21L, Seq(5.0, 0.0)), mk(20L, Seq(3.0, 0.0))).toDF("id", "vec"),
      "id", "vec", 0.5).head()
    assert(both.getAs[Long]("n_eval_hits") == 2 &&
      both.getAs[Long]("worst_eval_id") == 20L)
  }

  test("compression ratio orders repetitive below prose, junk near 1") {
    import spark.implicits._
    val df = Seq(
      (1L, "abab" * 200),                               // highly repetitive
      (2L, (1 to 120).map(i => s"w${i * 7919 % 997}").mkString(" ")), // prose-ish
      (3L, { val rnd = new scala.util.Random(42)
        Array.fill(800)(rnd.nextPrintableChar()).mkString }), // high entropy
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = graft.ops.TextAnalysis.compressionRatio(df, "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    val rep = out(1L).asInstanceOf[Double]
    val prose = out(2L).asInstanceOf[Double]
    val noise = out(3L).asInstanceOf[Double]
    assert(rep < 0.1 && rep < prose && prose < noise && noise > 0.6)
    assert(out(4L) == 1.0 && out(5L) == null)
    // deterministic across runs
    val again = graft.ops.TextAnalysis.compressionRatio(df, "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(again == out)
  }

  test("binaryMetrics: AUC matches the hand-computed tie-corrected value") {
    import spark.implicits._
    // scores: pos at 0.9, 0.5; neg at 0.5, 0.1 → pairs: (0.9 beats both
    // negs) + (0.5 vs 0.5 tie = 0.5) + (0.5 beats 0.1) = 3.5 / 4 = 0.875
    val df = Seq((1.0, 0.9), (1.0, 0.5), (0.0, 0.5), (0.0, 0.1))
      .toDF("y", "p")
    val r = graft.ops.Evaluation.binaryMetrics(df, "y", "p").collect()(0)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_pos") == 2)
    assert(math.abs(r.getAs[Double]("auc") - 0.875) < 1e-12)
    // brier = ((0.9-1)^2 + (0.5-1)^2 + (0.5-0)^2 + (0.1-0)^2) / 4
    assert(math.abs(r.getAs[Double]("brier") - 0.13) < 1e-12)
    // perfect separation → AUC 1; degenerate 0/1 scores don't blow up
    val perfect = Seq((1.0, 1.0), (1.0, 0.8), (0.0, 0.2), (0.0, 0.0))
      .toDF("y", "p")
    val rp = graft.ops.Evaluation.binaryMetrics(perfect, "y", "p").collect()(0)
    assert(rp.getAs[Double]("auc") == 1.0)
    assert(!rp.getAs[Double]("log_loss").isInfinite)
  }

  test("prAuc equals sklearn-style average precision on a known fixture") {
    import spark.implicits._
    // desc thresholds: 0.8(pos) → P=1,R=1/2·…  AP = Σ ΔR·P:
    // at 0.8: TP=1, pred=1, P=1, ΔR=1/2 → 0.5
    // at 0.6: TP=1, pred=2, ΔR=0 → 0
    // at 0.4: TP=2, pred=3, P=2/3, ΔR=1/2 → 1/3;  AP = 0.8333…
    val df = Seq((1.0, 0.8), (0.0, 0.6), (1.0, 0.4), (0.0, 0.2))
      .toDF("y", "p")
    val r = graft.ops.Evaluation.prAuc(df, "y", "p").collect()(0)
    assert(math.abs(r.getAs[Double]("pr_auc") - (0.5 + 1.0 / 3)) < 1e-12)
    assert(r.getAs[Long]("n_thresholds") == 4)
  }

  test("liftTable buckets deterministically and gains reach 1.0") {
    import spark.implicits._
    val df = (1 to 100).map(i => (if (i <= 30) 1.0 else 0.0, 1.0 - i / 101.0))
      .toDF("y", "p") // top 30 scores are exactly the positives
    val out = graft.ops.Evaluation.liftTable(df, "y", "p", 10)
      .orderBy("bucket").collect()
    assert(out.length == 10 && out.forall(_.getAs[Long]("n") == 10))
    // buckets 0-2 all positive → lift = 1 / 0.3
    assert(math.abs(out(0).getAs[Double]("lift") - 1 / 0.3) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("cum_gain") - 1.0) < 1e-12)
    assert(math.abs(out(9).getAs[Double]("cum_pct") - 1.0) < 1e-12)
  }

  test("cohenKappa: textbook 2x2 fixture") {
    import spark.implicits._
    // classic example: po = 0.7, pe = 0.5 → kappa = 0.4
    val rows = Seq.fill(25)(("a", "a")) ++ Seq.fill(10)(("a", "b")) ++
      Seq.fill(5)(("b", "a")) ++ Seq.fill(10)(("b", "b"))
    val r = graft.ops.Evaluation.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .collect()(0)
    assert(r.getAs[Long]("n") == 50)
    assert(math.abs(r.getAs[Double]("po") - 0.7) < 1e-12)
    // pe = (35/50)(30/50) + (15/50)(20/50) = 0.42 + 0.12 = 0.54
    assert(math.abs(r.getAs[Double]("pe") - 0.54) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - (0.7 - 0.54) / 0.46) < 1e-12)
  }

  test("ndcgAtK: perfect ranking → 1.0; reversed < 1; ties broken by id") {
    import spark.implicits._
    val perfect = Seq(("q", "a", 3.0, 0.9), ("q", "b", 2.0, 0.8),
      ("q", "c", 1.0, 0.7)).toDF("q", "doc", "rel", "score")
    val p = graft.ops.Evaluation.ndcgAtK(perfect, "q", "doc", "rel", "score", 10)
      .collect()(0)
    assert(math.abs(p.getAs[Double]("ndcg") - 1.0) < 1e-12)
    val reversed = Seq(("q", "a", 3.0, 0.1), ("q", "b", 2.0, 0.2),
      ("q", "c", 1.0, 0.3)).toDF("q", "doc", "rel", "score")
    val r = graft.ops.Evaluation.ndcgAtK(reversed, "q", "doc", "rel", "score", 10)
      .collect()(0)
    assert(r.getAs[Double]("ndcg") < 1.0 && r.getAs[Double]("ndcg") > 0.0)
    assert(r.getAs[Double]("idcg") == p.getAs[Double]("idcg"))
  }

  test("acf of a constant-increment series; cuped removes covariate variance") {
    import spark.implicits._
    // alternating series: lag-1 ACF strongly negative, lag-2 positive
    val s = (0 until 20).map(i => (i.toDouble, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("t", "x")
    val a = graft.ops.Evaluation.acf(s, "t", "x", 2)
      .orderBy("lag").collect()
    assert(a(0).getAs[Double]("acf") < -0.8 && a(1).getAs[Double]("acf") > 0.8)
    assert(a(0).getAs[Long]("n_pairs") == 19 && a(1).getAs[Long]("n_pairs") == 18)
    // y = 2x + arm effect: CUPED should explain almost all variance and
    // leave the arm means' ORDER intact
    val rows = (0 until 100).map { i =>
      val x = (i % 10).toDouble
      (i % 2, 2.0 * x + (if (i % 2 == 0) 0.0 else 1.0), x)
    }
    val c = graft.ops.Evaluation.cuped(rows.toDF("arm", "y", "x"), "arm", "y", "x")
      .orderBy("group").collect()
    assert(c.length == 2)
    assert(c(0).getAs[Double]("var_reduction") > 0.9)
    assert(c(1).getAs[Double]("mean_adj") > c(0).getAs[Double]("mean_adj"))
  }

  test("logRank: symmetric arms → chi2 exactly 0; separated arms → large") {
    import spark.implicits._
    // identical duration/event multisets per arm: O_A = E_A exactly
    val sym = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 0.0),
      ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 0.0))
      .toDF("arm", "dur", "ev")
    val rs = graft.analysis.AnalysisPlanner
      .logRank(sym, "dur", "ev", "arm", "a", "b").collect()(0)
    assert(rs.getAs[Double]("chi2") == 0.0)
    assert(rs.getAs[Long]("observed_a") == 2)
    // arm a all events early, arm b all late → strong separation
    val sep = ((1 to 10).map(i => ("a", i.toDouble, 1.0)) ++
      (1 to 10).map(i => ("b", 100.0 + i, 1.0))).toDF("arm", "dur", "ev")
    val rb = graft.analysis.AnalysisPlanner
      .logRank(sep, "dur", "ev", "arm", "a", "b").collect()(0)
    assert(rb.getAs[Double]("chi2") > 10.0)
  }

  test("zipfSlope: two-point corpus has the exact analytic slope") {
    import spark.implicits._
    // "a a a a b": freq 4 at rank 1, freq 1 at rank 2 →
    // slope = (ln1 − ln4)/(ln2 − ln1) = −2 exactly
    val r = graft.ops.TextAnalysis
      .zipfSlope(Seq(Tuple1("a a a a b")).toDF("text"), "text").collect()(0)
    assert(r.getAs[Long]("n_terms") == 2 && r.getAs[Long]("n_freq_levels") == 2)
    assert(math.abs(r.getAs[Double]("slope") - (-2.0)) < 1e-12)
  }

  test("heapsLaw: two-checkpoint fixture fits exactly") {
    import spark.implicits._
    // doc1 "a b" → (n=2, V=2); doc2 "a c" → (n=4, V=3)
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.heapsLaw(df, "doc_id", "text").collect()(0)
    val beta = math.log(3.0 / 2) / math.log(2.0)
    assert(r.getAs[Long]("total_tokens") == 4 && r.getAs[Long]("vocab") == 3)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-12)
    assert(math.abs(r.getAs[Double]("k") - 2.0 / math.pow(2.0, beta)) < 1e-12)
  }

  test("termBurstiness: VMR with zero cells counted") {
    import spark.implicits._
    val df = Seq((1L, "x x x x"), (2L, "y"), (3L, "y"), (4L, "y y"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .termBurstiness(df, "doc_id", "text", minDf = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("vmr")).toMap
    // x: counts (4,0,0,0) → mean 1, var 3 → vmr 3
    // y: counts (0,1,1,2) → mean 1, var 0.5 → vmr 0.5
    assert(out("x") == 3.0 && out("y") == 0.5)
  }

  test("rrfFuse: doc present in both rankers outranks single-list docs") {
    import spark.implicits._
    val a = Seq(("q", "x", 1), ("q", "y", 2)).toDF("query", "doc", "rank")
    val b = Seq(("q", "x", 2), ("q", "z", 1)).toDF("query", "doc", "rank")
    val out = graft.ops.Retrieval.rrfFuse(a, b, "query", "doc", "rank", 60)
      .collect().map(r => r.getString(1) ->
        (r.getAs[Double]("rrf_score"), r.getAs[Int]("fused_rank"))).toMap
    assert(out("x")._1 == 1.0 / 61 + 1.0 / 62) // both lists
    assert(out("x")._2 == 1)                   // beats either single-list doc
    assert(out("z")._1 == 1.0 / 61 && out("y")._1 == 1.0 / 62)
    assert(out("z")._2 == 2 && out("y")._2 == 3)
  }

  test("retrievalMetrics: textbook MRR/recall/precision fixture") {
    import spark.implicits._
    val res = Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3),
      ("q", "d", 4), ("q", "e", 5)).toDF("query", "doc", "rank")
    val rel = Seq(("q", "b"), ("q", "e"), ("q", "z")).toDF("query", "doc")
    val r = graft.ops.Retrieval
      .retrievalMetrics(res, rel, "query", "doc", "rank", k = 3)
      .collect()(0)
    assert(r.getAs[Long]("first_rel_rank") == 2)
    assert(r.getAs[Double]("rr") == 0.5)
    assert(math.abs(r.getAs[Double]("recall_at_k") - 1.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("precision_at_k") - 1.0 / 3) < 1e-12)
    assert(r.getAs[Long]("n_relevant") == 3 && r.getAs[Long]("n_results") == 5)
  }

  test("termJsDivergence: 0 for identical slices, ln2 for disjoint") {
    import spark.implicits._
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("g", "text")
    val js0 = graft.ops.TextAnalysis
      .termJsDivergence(same, "text", "g", "a", "b").collect()(0)
    assert(math.abs(js0.getAs[Double]("js_divergence")) < 1e-12)
    val disj = Seq(("a", "x x y"), ("b", "p q q")).toDF("g", "text")
    val jsD = graft.ops.TextAnalysis
      .termJsDivergence(disj, "text", "g", "a", "b").collect()(0)
    assert(math.abs(jsD.getAs[Double]("js_divergence") - math.log(2)) < 1e-12)
    assert(jsD.getAs[Long]("n_terms_union") == 4)
  }

  test("vocabCoverage: exact crossing-block arithmetic") {
    import spark.implicits._
    // corpus "a a a b": T=4; 50% needs 1 term (3/4 covered);
    // 100% needs both (ties: the f=1 block supplies the last token)
    val df = Seq(Tuple1("a a a b")).toDF("text")
    val out = graft.ops.TextAnalysis
      .vocabCoverage(df, "text", Seq(0.5, 1.0))
      .orderBy("share").collect()
    assert(out(0).getAs[Long]("vocab_size") == 1)
    assert(out(0).getAs[Double]("coverage") == 0.75)
    assert(out(1).getAs[Long]("vocab_size") == 2)
    assert(out(1).getAs[Double]("coverage") == 1.0)
    assert(out(0).getAs[Long]("total_tokens") == 4)
  }

  test("pageRank: mass conserved, chain ranks increase downstream") {
    import spark.implicits._
    // a→b→c chain: rank accumulates downstream; c is dangling
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = graft.ops.Graph.pageRank(e, "src", "dst", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-9) // dangling mass recycled
    assert(out("c") > out("b") && out("b") > out("a"))
    // multi-edges collapse: duplicating an edge changes nothing
    val dup = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("src", "dst")
    val out2 = graft.ops.Graph.pageRank(dup, "src", "dst", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2 == out)
  }

  test("bhFdr: step-up discovers the block below the crossing, ties together") {
    import spark.implicits._
    // m=4, α=0.2 → criticals .05/.10/.15/.20: k*=3, p=0.9 excluded
    val df = Seq(0.01, 0.02, 0.03, 0.9).toDF("p")
    val out = graft.analysis.AnalysisPlanner.bhFdr(df, "p", 0.2)
      .collect().map(r => r.getDouble(0) -> r.getAs[Boolean]("discovery"))
      .toMap
    assert(out(0.01) && out(0.02) && out(0.03) && !out(0.9))
    // step-up: p=.05 fails its own critical (.05 ≤ .05 ok actually) —
    // use the classic case where a later position rescues an earlier:
    // p=(0.04, 0.05): criticals .075/.15 → both discovered
    val df2 = Seq(0.04, 0.05).toDF("p")
    val o2 = graft.analysis.AnalysisPlanner.bhFdr(df2, "p", 0.15)
      .collect().map(r => r.getDouble(0) -> r.getAs[Boolean]("discovery"))
      .toMap
    assert(o2(0.04) && o2(0.05))
    // tied p-values evaluate at the block's LARGEST position
    val o3 = graft.analysis.AnalysisPlanner
      .bhFdr(Seq(0.1, 0.1).toDF("p"), "p", 0.2)
      .collect().map(_.getAs[Boolean]("discovery"))
    assert(o3.forall(identity))
  }

  test("conformalThreshold: exact finite-sample order statistic") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("s")
    val out = graft.analysis.AnalysisPlanner
      .conformalThreshold(df, "s", Seq(0.1, 0.5))
      .collect().map(r => r.getDouble(0) ->
        (r.getAs[Long]("k"), r.getAs[Double]("threshold"))).toMap
    assert(out(0.1) == ((10L, 10.0)))  // ceil(11·0.9)=10
    assert(out(0.5) == ((6L, 6.0)))    // ceil(11·0.5)=6
  }

  test("pinballLoss: symmetric at the median, coverage counted") {
    import spark.implicits._
    val df = Seq((0.0, 5.0), (10.0, 5.0)).toDF("y", "pred")
    val r = graft.ops.Evaluation.pinballLoss(df, "y", "pred", 0.5).collect()(0)
    assert(r.getAs[Double]("mean_pinball") == 2.5)
    assert(r.getAs[Double]("coverage") == 0.5)
  }

  test("pairRules computes support, confidence, and lift") {
    import spark.implicits._
    val baskets = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"),
      (2L, "b"), (3L, "a"), (3L, "c"), (4L, "a"), (4L, "b"),
      (4L, "b")) // duplicate (4, b) must not inflate counts
      .toDF("bk", "it")
    val r = graft.ops.Associations.pairRules(baskets, "bk", "it",
        minPairCount = 1)
      .orderBy("item_a", "item_b").collect()
    val ab = r.find(x => x.getString(0) == "a" && x.getString(1) == "b").get
    assert(ab.getAs[Long]("n_pair") == 3 && ab.getAs[Long]("n_a") == 4 &&
      ab.getAs[Long]("n_b") == 3)
    assert(ab.getAs[Double]("support") == 0.75)
    assert(ab.getAs[Double]("conf_a_b") == 0.75)
    assert(ab.getAs[Double]("conf_b_a") == 1.0)
    assert(ab.getAs[Double]("lift") == 1.0) // 3*4/(4*3)
    // min-support prunes: (b, c) co-occur only in basket 1
    val r2 = graft.ops.Associations.pairRules(baskets, "bk", "it",
      minPairCount = 2)
    assert(!r2.collect().exists(x =>
      x.getString(0) == "b" && x.getString(1) == "c"))
  }

  test("pairRules basket cap keeps the smallest item ids") {
    import spark.implicits._
    val baskets = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"))
      .toDF("bk", "it")
    val pairs = graft.ops.Associations.pairRules(baskets, "bk", "it",
        minPairCount = 1, maxBasketItems = 2)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"))) // only the 2 smallest ids survive
  }

  test("triangleStats counts per-node triangles on K4 minus an edge") {
    import spark.implicits._
    // edges of K4 without (3,4); given directed/dup/reversed forms
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (4L, 2L)).toDF("s", "d")
    val r = graft.ops.Graph.triangleStats(e, "s", "d").orderBy("node")
      .collect().map(x => (x.getLong(0), x.getAs[Long]("degree"),
        x.getAs[Long]("triangles"), x.getAs[Double]("clustering_coeff")))
    assert(r.toSeq == Seq((1L, 3L, 2L, 2.0 / 3), (2L, 3L, 2L, 2.0 / 3),
      (3L, 2L, 1L, 1.0), (4L, 2L, 1L, 1.0)))
  }

  test("triangleStats minCount drops thin edges first") {
    import spark.implicits._
    // triangle 1-2-3 where edge (2,3) appears only once
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (3L, 1L), (2L, 3L))
      .toDF("s", "d")
    val r = graft.ops.Graph.triangleStats(e, "s", "d", minCount = 2)
    assert(r.agg(sum("triangles")).head.getLong(0) == 0)
    assert(r.count() == 3) // nodes 1,2,3 still present via kept edges
  }

  test("jarqueBera is zero-skew on a symmetric sample with exact p") {
    import spark.implicits._
    val df = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).map(("g", _)).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.jarqueBera(df, "v", Seq("g"))
      .head()
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-12)
    val kurt = r.getAs[Double]("kurtosis_excess")
    assert(math.abs(kurt - (6.8 / 4.0 - 3.0)) < 1e-12)
    val jb = r.getAs[Double]("jb_stat")
    assert(math.abs(jb - 5.0 / 6 * kurt * kurt / 4) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-jb / 2)) < 1e-12)
  }

  test("brownForsythe is F=0 for groups with identical spread") {
    import spark.implicits._
    val df = (Seq(0.0, 1.0, 2.0).map(("a", _)) ++
      Seq(10.0, 11.0, 12.0).map(("b", _))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.brownForsythe(df, "v", "g")
      .head()
    assert(math.abs(r.getAs[Double]("f_stat")) < 1e-12)
    assert(r.getAs[Long]("df_between") == 1 &&
      r.getAs[Long]("df_within") == 4)
  }

  test("cliffsDelta matches the hand count with ties") {
    import spark.implicits._
    // a = (1, 2, 2), b = (2, 3): wins a>b: 0; losses a<b: (1<2),(1<3),
    // (2<3),(2<3) = 4; ties: (2,2),(2,2) = 2; delta = (0-4)/6
    val df = (Seq(1.0, 2.0, 2.0).map(("a", _)) ++
      Seq(2.0, 3.0).map(("b", _))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .cliffsDelta(df, "v", "g", "a", "b").head()
    assert(r.getAs[Long]("wins") == 0 && r.getAs[Long]("losses") == 4 &&
      r.getAs[Long]("ties") == 2)
    assert(math.abs(r.getAs[Double]("cliffs_delta") - (-4.0 / 6)) < 1e-12)
  }

  test("theilSen ignores a single outlier the OLS fit would chase") {
    import spark.implicits._
    val pts = (0 to 5).map(i =>
      ("k", i.toDouble, if (i == 5) 100.0 else 2.0 * i + 1.0))
      .toDF("k", "x", "y")
    val r = graft.ops.TimeSeries.theilSen(pts, Seq("k"), "x", "y").head()
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-9)
  }

  test("uniquenessProfile flags candidate keys and null ratios") {
    import spark.implicits._
    val df = Seq((1L, Some("x"), "p"), (2L, None, "p"), (3L, Some("y"), "q"))
      .toDF("id", "opt", "cat")
    val r = graft.ops.Profiling
      .uniquenessProfile(df, Seq("id", "opt", "cat"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("id").getAs[Boolean]("is_candidate_key"))
    assert(r("opt").getAs[Long]("n_nulls") == 1 &&
      !r("opt").getAs[Boolean]("is_candidate_key"))
    assert(r("opt").getAs[Double]("distinct_ratio") == 1.0) // 2 of 2 non-null
    assert(r("cat").getAs[Long]("n_distinct") == 2 &&
      !r("cat").getAs[Boolean]("is_candidate_key"))
  }

  test("functionalDependency reports violating groups and rows") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "c"))
      .toDF("det", "dep")
    val r = graft.ops.Profiling.functionalDependency(df, "det", "dep")
      .head()
    assert(r.getAs[Long]("n_groups") == 3 &&
      r.getAs[Long]("violating_groups") == 1 &&
      r.getAs[Long]("violating_rows") == 2 &&
      r.getAs[Long]("n_rows") == 5)
    assert(math.abs(r.getAs[Double]("holds_ratio") - 2.0 / 3) < 1e-12)
  }

  test("ivfKnnFromIndex equals ivfKnnWith over the same store") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextDouble().toFloat))).toDF("vec_id", "embedding")
    val cents = graft.ops.Similarity.pseudoCentroids(4, 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    graft.ops.Similarity.writeIvfIndex(emb, "vec_id", "embedding", cents, dir)
    val q = emb.where($"vec_id" < 5)
    val inline = graft.ops.Similarity.ivfKnnWith(emb, q, 3, cents, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val stored = graft.ops.Similarity
      .ivfKnnFromIndex(spark, dir, q, 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(stored == inline && stored.nonEmpty)
  }

  test("seasonality lift averages to the segment mean") {
    import spark.implicits._
    val ev = Seq(
      ("x", "2024-01-01 00:10:00", 10.0),
      ("x", "2024-01-01 00:20:00", 20.0), // hour 0: mean 15
      ("x", "2024-01-01 06:00:00", 45.0)) // hour 6: mean 45; overall 25
      .toDF("t", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = graft.ops.TimeSeries
      .seasonalityProfile(ev, "ts", "value", "t")
      .orderBy("hod").collect()
    assert(out.map(_.getAs[Int]("hod")).toSeq == Seq(0, 6))
    assert(math.abs(out(0).getAs[Double]("lift") - 15.0 / 25) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("lift") - 45.0 / 25) < 1e-12)
    assert(out(0).getAs[Long]("n") == 2 && out(1).getAs[Long]("n") == 1)
  }

  test("jaro-winkler matches the published fixtures incl. edge cases") {
    import graft.functions.JaroWinklerImpl.sim
    // textbook pairs, values verified against DuckDB's builtin
    assert(math.abs(sim("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(sim("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(sim("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    // odd raw transposition count halves by integer division
    assert(math.abs(sim("abcdef", "bcadef") - 0.9444444444444445) < 1e-15)
    // no Winkler boost at jaro <= 0.7 despite the shared prefix
    assert(sim("abcdefgh", "abzzzzzz") == 0.5)
    // prefix capped at 4
    assert(math.abs(sim("aaaaab", "aaaaac") - 0.9333333333333333) < 1e-15)
    // empties score 0 (DuckDB convention), identity scores 1
    assert(sim("", "") == 0.0 && sim("", "abc") == 0.0 && sim("a", "a") == 1.0)
    assert(sim("ab", "ba") == 0.0) // window 0: no cross-position matches
  }

  test("weighted sampling w/o replacement: k rows, no dupes, weight pull") {
    import spark.implicits._
    // 100 light rows (w=1) + 10 heavy rows (w=1000): heavy rows should
    // dominate a k=10 sample drawn proportional to weight
    val df = ((0L until 100L).map(i => (i, 1L)) ++
      (100L until 110L).map(i => (i, 1000L))).toDF("id", "w")
    val got = graft.ops.Sampling
      .weightedSampleWithoutReplacement(df, 10, "w", Seq("id"))
      .collect().map(_.getLong(0))
    assert(got.length == 10 && got.distinct.length == 10)
    assert(got.count(_ >= 100L) >= 7) // heavy ids carry ~99% of the mass
    // deterministic: same call, same subset
    val again = graft.ops.Sampling
      .weightedSampleWithoutReplacement(df, 10, "w", Seq("id"))
      .collect().map(_.getLong(0))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("heavy hitters: exact counts and shares above phi") {
    import spark.implicits._
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    val out = graft.ops.Profiling.heavyHitters(df, Seq("k"), 0.3)
      .orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(out(0).getAs[Long]("cnt") == 6 &&
      math.abs(out(0).getAs[Double]("share") - 0.6) < 1e-12)
  }

  test("logSumExp is stable at magnitudes where naive ln(sum(exp)) overflows") {
    import spark.implicits._
    val df = Seq(("g", 1000.0), ("g", 1000.0), ("g", 999.0),
      ("h", -1000.0), ("h", -1000.0)).toDF("grp", "x")
    val out = graft.analysis.AnalysisPlanner.logSumExp(df, "x", Seq("grp"))
      .orderBy("grp").collect()
    // lse(1000,1000,999) = 1000 + ln(2 + e^-1); lse(-1000,-1000) = -1000 + ln 2
    assert(math.abs(out(0).getAs[Double]("logsumexp") -
      (1000.0 + math.log(2.0 + math.exp(-1.0)))) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("logsumexp") -
      (-1000.0 + math.log(2.0))) < 1e-9)
  }

  test("poisson bootstrap CI brackets the mean and tightens with n") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, (i % 7).toDouble)).toDF("id", "x")
    val r = graft.analysis.AnalysisPlanner
      .poissonBootstrapMean(df, "x", Seq("id"), b = 100).head()
    val (mean, lo, hi) = (r.getAs[Double]("mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(r.getAs[Long]("b") == 100 && r.getAs[Long]("n") == 400)
    assert(lo < mean && mean < hi)
    assert(hi - lo < 1.0) // sd(x)≈2, so a 95% CI at n=400 is ~±0.2
  }

  test("srmCheck: hand-computed chi2 and undeclared-arm flag") {
    import spark.implicits._
    // declared 50/50 but observed 60/40 → chi2 = (10²/50)·2 = 4
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("arm")
    val out = graft.analysis.AnalysisPlanner
      .srmCheck(df, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .orderBy("arm").collect()
    assert(math.abs(out(0).getAs[Double]("chi2_stat") - 4.0) < 1e-12)
    assert(out(0).getAs[Long]("dof") == 1)
    assert(math.abs(out(0).getAs[Double]("expected") - 50.0) < 1e-12)
    // an arm outside the declared allocation is flagged, not crashed
    val extra = (Seq.fill(50)("a") ++ Seq.fill(50)("b") ++ Seq("rogue"))
      .toDF("arm")
    val flagged = graft.analysis.AnalysisPlanner
      .srmCheck(extra, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .where(col("undeclared_arm")).collect()
    assert(flagged.map(_.getAs[String]("arm")).toSeq == Seq("rogue"))
  }

  test("sortedNeighborhood emits exactly the within-window rank pairs") {
    import spark.implicits._
    val df = Seq((1L, 10.0, "x"), (2L, 30.0, "y"), (3L, 20.0, "z"),
      (4L, 40.0, "w"), (5L, 20.0, "v")).toDF("id", "k", "nm")
    // rank order by (k, id): 1(10), 3(20), 5(20), 2(30), 4(40)
    val got = graft.ops.Dedup
      .sortedNeighborhood(df, "id", "k", 2, Seq("nm"))
      .select("id_a", "id_b", "rank_gap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((1L, 3L, 1L), (1L, 5L, 2L), (3L, 5L, 1L),
      (3L, 2L, 2L), (5L, 2L, 1L), (5L, 4L, 2L), (2L, 4L, 1L))
    assert(got == want)
  }

  test("crossCorrelation peaks at the true lead lag") {
    import spark.implicits._
    // y_t = x_{t-1}: x leads y by 1 → ccf(+1) ≈ 1
    val rnd = new scala.util.Random(11)
    val xs = Vector.fill(40)(rnd.nextDouble() * 10)
    val rows = (1 until 40).map(t => (t.toDouble, xs(t), xs(t - 1)))
    val out = graft.ops.Evaluation
      .crossCorrelation(rows.toDF("t", "x", "y"), "t", "x", "y", 3)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ccf"))
      .toMap
    assert(out.maxBy(_._2)._1 == 1L && out(1L) > 0.9)
  }

  test("mutualInformation: zero when independent, H when determined") {
    import spark.implicits._
    // y == x → MI = H(x) and NMI = 1
    val dep = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2"))
      .toDF("x", "y")
    val r1 = graft.analysis.AnalysisPlanner
      .mutualInformation(dep, "x", "y").head()
    assert(math.abs(r1.getAs[Double]("mi") - math.log(2.0)) < 1e-12)
    assert(math.abs(r1.getAs[Double]("nmi") - 1.0) < 1e-12)
    // balanced independent grid → MI = 0
    val ind = (for { x <- Seq("a", "b"); y <- Seq("1", "2") }
      yield (x, y)).toDF("x", "y")
    val r2 = graft.analysis.AnalysisPlanner
      .mutualInformation(ind, "x", "y").head()
    assert(math.abs(r2.getAs[Double]("mi")) < 1e-12)
    assert(math.abs(r2.getAs[Double]("h_xy") - math.log(4.0)) < 1e-12)
  }

  test("rfmSegments: recency inverted, frequency/monetary ascending") {
    import spark.implicits._
    val ev = Seq(
      // u1: recent, frequent, big spender; u2: stale, rare, small
      (1L, "2024-01-30 10:00:00", 100.0), (1L, "2024-01-29 10:00:00", 100.0),
      (1L, "2024-01-28 10:00:00", 100.0), (1L, "2024-01-27 10:00:00", 100.0),
      (2L, "2024-01-02 10:00:00", 1.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = graft.ops.Behavioral
      .rfmSegments(ev, "user_id", "ts", "value", 2)
      .orderBy("user_id").collect()
    val u1 = out(0); val u2 = out(1)
    assert(u1.getAs[Double]("recency_days") == 0.0 &&
      u2.getAs[Double]("recency_days") == 28.0)
    assert(u1.getAs[Long]("r_score") == 2 && u2.getAs[Long]("r_score") == 1)
    assert(u1.getAs[Long]("f_score") == 2 && u2.getAs[Long]("f_score") == 1)
    assert(u1.getAs[Long]("m_score") == 2 && u2.getAs[Long]("m_score") == 1)
  }

  test("sessionize: gap splits sessions, rollup spans are exact") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, "2024-01-01 10:00:00"), (1L, 101L, "2024-01-01 10:10:00"),
      (1L, 102L, "2024-01-01 12:00:00"), // 110-min gap → new session
      (2L, 200L, "2024-01-01 09:00:00"))
      .toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = graft.ops.Behavioral
      .sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 &&
      out(0).getAs[Long]("duration_sec") == 600L)
    assert(out(1).getAs[Long]("session_idx") == 2 &&
      out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("dsirWeights: target-like docs score above off-target docs") {
    import spark.implicits._
    val target = Seq((1L, "cats cats cats like milk")).toDF("id", "text")
    val raw = Seq((1L, "cats dogs birds like milk"),
      (2L, "dogs dogs fetch sticks")).toDF("id", "text")
    val docs = Seq((10L, "cats like milk"), (11L, "dogs fetch sticks"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .dsirWeights(docs, "doc_id", "text", target, "text", raw, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("log_ratio_sum") >
      out(1).getAs[Double]("log_ratio_sum"))
    assert(out(0).getAs[Double]("log_ratio_sum") > 0 &&
      out(1).getAs[Double]("log_ratio_sum") < 0)
    assert(out(0).getAs[Long]("n_tokens") == 3)
  }

  test("yuenTTest matches the hand-computed trimmed fixture") {
    import spark.implicits._
    // A=[1..5], B=[11,12,13,14,115]: g=1, trimmed means 3 vs 13,
    // winsorized vars 1.0 → t = -10/sqrt(4/3), dof = 4; the 115
    // outlier is winsorized away
    val df = (Seq(1, 2, 3, 4, 5).map(v => ("A", v.toDouble)) ++
      Seq(11, 12, 13, 14, 115).map(v => ("B", v.toDouble)))
      .toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .yuenTTest(df, "v", "g", "A", "B", trim = 0.2).head()
    assert(math.abs(r.getAs[Double]("t_stat") -
      (-10.0 / math.sqrt(4.0 / 3.0))) < 1e-9)
    assert(math.abs(r.getAs[Double]("dof") - 4.0) < 1e-9)
    assert(r.getAs[Long]("h_a") == 3 && r.getAs[Long]("h_b") == 3)
    assert(math.abs(r.getAs[Double]("tmean_a") - 3.0) < 1e-12 &&
      math.abs(r.getAs[Double]("tmean_b") - 13.0) < 1e-12)
  }

  test("covariateBalance: SMD matches the moment formula, one scan") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 10.0), ("a", 3.0, 10.0),
      ("b", 5.0, 10.0), ("b", 7.0, 10.0)).toDF("g", "x", "z")
    val out = graft.ops.Evaluation
      .covariateBalance(df, "g", "a", "b", Seq("x", "z"))
      .orderBy("covariate").collect()
    // x: means 2 vs 6, vars 2 and 2 → smd = -4/sqrt(2) = -2.828…
    val x = out(0)
    assert(x.getAs[String]("covariate") == "x")
    assert(math.abs(x.getAs[Double]("smd") - (-4.0 / math.sqrt(2.0))) < 1e-12)
    // z is constant in both groups → no scale → smd NULL, means equal
    val z = out(1)
    assert(z.getAs[Double]("mean_a") == 10.0 && z.isNullAt(z.fieldIndex("smd")))
  }

  test("activeUserMetrics: rolling distinct is not a sum of DAUs") {
    import spark.implicits._
    val ev = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (2L, "2024-01-02 11:00:00"))
      .toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = graft.ops.Behavioral
      .activeUserMetrics(ev, "user_id", "ts", 2)
      .orderBy("day").collect()
    // day1: dau 1, rolling {u1} = 1; day2: dau 2, rolling {u1,u2} = 2
    // (u1 active BOTH days counts once — 2, not 3)
    assert(out(0).getAs[Long]("dau") == 1 &&
      out(0).getAs[Long]("rolling_active") == 1)
    assert(out(1).getAs[Long]("dau") == 2 &&
      out(1).getAs[Long]("rolling_active") == 2)
    assert(out(1).getAs[Double]("stickiness") == 1.0)
  }

  test("partialCorrelation removes a perfect confounder") {
    import spark.implicits._
    // x and y both exactly linear in z → r_xy = 1 but partial ≈ NaN/undef;
    // instead use x = z + noise-free independent part: construct
    // x = z + a, y = z + b with a,b orthogonal → partial r(x,y|z) = 0
    val rows = (0 until 16).map { i =>
      val z = (i % 4).toDouble
      val a = ((i / 4) % 2).toDouble      // independent of z and b
      val b = ((i / 8) % 2).toDouble
      (z + a, z + b, z)
    }
    val r = graft.analysis.AnalysisPlanner
      .partialCorrelation(rows.toDF("x", "y", "z"), "x", "y", "z").head()
    assert(r.getAs[Double]("r_xy") > 0.5) // confounded marginal corr
    assert(math.abs(r.getAs[Double]("partial_r")) < 1e-9) // vanishes
  }

  test("ols2 recovers exact coefficients on a noiseless plane") {
    import spark.implicits._
    val rows = for { a <- 0 until 5; b <- 0 until 5 }
      yield (a.toDouble, b.toDouble, 2.0 + 3.0 * a - 1.5 * b)
    val r = graft.analysis.AnalysisPlanner
      .ols2(rows.toDF("x1", "x2", "y"), "y", "x1", "x2").head()
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") + 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
    assert(r.getAs[Double]("rmse") < 1e-6)
  }

  test("olsInfluence: the planted outlier carries the largest Cook's D") {
    import spark.implicits._
    val pts = (0 until 20).map(i => (i.toDouble, 2.0 * i)) :+ (19.5, 100.0)
    val out = graft.analysis.AnalysisPlanner
      .olsInfluence(pts.toDF("x", "y"), Seq("x"), "x", "y")
      .orderBy(desc("cooks_d")).collect()
    assert(out.head.getAs[Double]("x") == 19.5)
    assert(out.head.getAs[Boolean]("influential"))
    // leverage sums to p = 2 for simple OLS with intercept
    val hSum = out.map(_.getAs[Double]("leverage")).sum
    assert(math.abs(hSum - 2.0) < 1e-9)
  }

  test("ngramNovelty: seen docs score 0, fresh docs score 1") {
    import spark.implicits._
    val ref = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val docs = Seq(
      (10L, "the cat sat on the mat"),      // fully seen → novelty 0
      (11L, "dogs chase red balls today"),  // fully novel → novelty 1
      (12L, "the cat sat under bright stars")) // partial
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .ngramNovelty(docs, "doc_id", "text", ref, "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("novelty") == 0.0)
    assert(out(1).getAs[Double]("novelty") == 1.0)
    val mid = out(2).getAs[Double]("novelty")
    assert(mid > 0.0 && mid < 1.0)
  }

  test("sequentialMonitor: boundary decays as information accrues") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val ev = (0 until 600).map { i =>
      val day = (i / 2) % 6 + 1 // decouple day from arm parity
      (f"2024-01-0$day 10:00:00", if (i % 2 == 0) "t" else "c",
        rnd.nextGaussian())
    }.toDF("ts_s", "arm", "v")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = graft.analysis.AnalysisPlanner
      .sequentialMonitor(ev, "ts", "arm", "v", "t", "c")
      .orderBy("day").collect()
    assert(out.length == 6)
    // info fraction reaches exactly 1 on the last day
    assert(math.abs(out.last.getAs[Double]("info_frac") - 1.0) < 1e-12)
    assert(math.abs(out.last.getAs[Double]("boundary") - 2.797) < 1e-12)
    // boundary strictly decreasing; no crossing under the null
    val bs = out.map(_.getAs[Double]("boundary"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a > b })
    assert(out.forall(!_.getAs[Boolean]("crossed")))
  }

  test("diffInDiff: recovers a planted post-period treatment effect") {
    import spark.implicits._
    // treat: 10 pre, 15 post (+5); ctrl: 20 pre, 22 post (+2) → DiD 3
    val rows =
      Seq.fill(50)(("t", false, 10.0)) ++ Seq.fill(50)(("t", true, 15.0)) ++
      Seq.fill(50)(("c", false, 20.0)) ++ Seq.fill(50)(("c", true, 22.0))
    val withNoise = rows.zipWithIndex.map { case ((g, p, v), i) =>
      (g, p, v + (i % 5) * 0.01) } // tiny jitter so variances exist
    val r = graft.ops.Evaluation
      .diffInDiff(withNoise.toDF("g", "p", "v"), "g", "t", "c",
        col("p"), "v").head()
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 0.01)
    assert(r.getAs[Double]("t_stat") > 100) // effect >> jitter noise
  }

  test("upliftBySegment drops one-armed segments and nails the math") {
    import spark.implicits._
    val rows = Seq.fill(40)(("t", "s1", 5.0)) ++
      Seq.fill(40)(("c", "s1", 3.0)) ++
      Seq.fill(40)(("t", "s2", 7.0)) // s2 has no control rows
    val jittered = rows.zipWithIndex.map { case ((a, s, v), i) =>
      (a, s, v + (i % 4) * 0.01) }
    val out = graft.ops.Evaluation
      .upliftBySegment(jittered.toDF("arm", "seg", "v"), "arm", "t", "c",
        "seg", "v").collect()
    assert(out.length == 1 && out(0).getAs[String]("segment") == "s1")
    assert(math.abs(out(0).getAs[Double]("uplift") - 2.0) < 0.02)
  }

  test("jaro_winkler registers in the session SQL surface") {
    val s = GraftSession.withFunctions(spark)
    val r = s.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").head.getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-15)
  }

  test("AGE() registers: 2-arg timestamp diff matches PG semantics") {
    val s = GraftSession.withFunctions(spark)
    // day-time interval surfaces as java.time.Duration: 2d6h = 54h
    val iv = s.sql("SELECT age(timestamp'2024-01-03 06:00:00', " +
      "timestamp'2024-01-01 00:00:00') AS a")
      .head.getAs[java.time.Duration](0)
    assert(iv.toHours == 54, iv.toString)
    // 1-arg form: now() - x is a positive interval for a past timestamp
    val one = s.sql(
      "SELECT age(timestamp'2000-01-01 00:00:00') > INTERVAL '1' DAY AS p")
      .head.getBoolean(0)
    assert(one)
  }

  test("neymanAllocation: budget splits proportional to N_h * S_h") {
    import spark.implicits._
    // stratum a: 4 rows sd 10; stratum b: 4 rows sd 0 (constant)
    val df = Seq(("a", 0.0), ("a", 20.0), ("a", 0.0), ("a", 20.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("s", "v")
    val out = graft.ops.Sampling
      .neymanAllocation(df, Seq("s"), "v", 100L)
      .orderBy("s").collect()
    // all weight on stratum a: alloc = 100, b gets 0
    assert(out(0).getAs[Long]("alloc") == 100L &&
      out(1).getAs[Long]("alloc") == 0L)
    assert(math.abs(out(0).getAs[Double]("stddev") - 11.547005383792516)
      < 1e-9)
  }

  test("cusum: running-min identity matches the sequential recursion") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // late mean shift at t=50: N(0,1) then N(5,1) — strong enough to
    // alarm even after GLOBAL standardization pulls the mean up
    val xs = (0 until 60).map(t => rnd.nextGaussian() +
      (if (t >= 50) 5.0 else 0.0))
    val df = xs.zipWithIndex.map { case (v, t) => ("k", t, v) }
      .toDF("key", "t", "v")
    val out = graft.ops.TimeSeries.cusum(df, Seq("key"), "t", "v")
      .orderBy("t").collect()
    // brute-force recursion over the same standardized series
    val mu = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1))
    val zs = xs.map(x => (x - mu) / sd)
    var (cp, cn) = (0.0, 0.0)
    zs.zipWithIndex.foreach { case (z, t) =>
      cp = math.max(0.0, cp + z - 0.5)
      cn = math.max(0.0, cn - z - 0.5)
      assert(math.abs(out(t).getAs[Double]("cusum_pos") - cp) < 1e-9,
        s"pos at $t")
      assert(math.abs(out(t).getAs[Double]("cusum_neg") - cn) < 1e-9,
        s"neg at $t")
    }
    // the planted upward shift alarms on the positive side only
    assert(out.exists(r => r.getAs[Boolean]("alarm") &&
      r.getAs[Double]("cusum_pos") > 4.0))
    assert(out.forall(r => r.getAs[Double]("cusum_neg") <= 4.0))
  }

  test("mcnemar: discordant cells drive the statistic") {
    import spark.implicits._
    // b=6 a-only, c=2 b-only, 3 both, 1 neither
    val rows = Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(3)((true, true)) ++ Seq((false, false))
    val out = graft.analysis.AnalysisPlanner
      .mcnemarTest(rows.toDF("a", "b"), "a", "b").head
    assert(out.getAs[Long]("n_a_only") == 6 &&
      out.getAs[Long]("n_b_only") == 2)
    // (|6-2|-1)^2 / 8 = 9/8
    assert(math.abs(out.getAs[Double]("chi2") - 1.125) < 1e-12)
  }

  test("forecastAccuracy: seasonal-naive metrics by hand") {
    import spark.implicits._
    // period-2 series: 10,20,10,20,12,24 — lag-2 forecast errs 2,4
    val df = Seq(10.0, 20.0, 10.0, 20.0, 12.0, 24.0).zipWithIndex
      .map { case (v, t) => ("k", t, v) }.toDF("key", "t", "v")
    val out = graft.ops.Evaluation
      .forecastAccuracy(df, Seq("key"), "t", "v", season = 2).head
    assert(out.getAs[Long]("n_points") == 4)
    // errors |a-f|: 0,0,2,4 → wape = 6/(10+20+12+24)
    assert(math.abs(out.getAs[Double]("wape") - 6.0 / 66.0) < 1e-12)
    // naive lag-1 errors: 10,10,8,12 → mase = (6/4)/(40/4)
    assert(math.abs(out.getAs[Double]("mase") - 1.5 / 10.0) < 1e-12)
    val smape = (0.0 + 0.0 + 2.0 * 2 / 22 + 2.0 * 4 / 44) / 4
    assert(math.abs(out.getAs[Double]("smape") - smape) < 1e-12)
  }

  test("minDetectableEffect shrinks with sample size") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def arm(a: String, n: Int, seg: String) =
      (0 until n).map(_ => (a, seg, rnd.nextGaussian()))
    val df = (arm("t", 50, "small") ++ arm("c", 50, "small") ++
      arm("t", 5000, "big") ++ arm("c", 5000, "big"))
      .toDF("arm", "seg", "v")
    val out = graft.ops.Evaluation
      .minDetectableEffect(df, "arm", "t", "c", "seg", "v")
      .orderBy("segment").collect()
    val big = out(0); val small = out(1)
    assert(big.getAs[String]("segment") == "big")
    // 100x the data → ~10x smaller detectable effect
    assert(small.getAs[Double]("mde_abs") >
      5 * big.getAs[Double]("mde_abs"))
    // MDE = 2.801585 * se exactly
    assert(math.abs(big.getAs[Double]("mde_abs") -
      2.801585 * big.getAs[Double]("se")) < 1e-9)
  }

  test("kAnonymityProfile: histogram and risk flags") {
    import spark.implicits._
    // classes: (a,x)x1  (a,y)x2  (b,x)x2  (b,y)x5
    val df = (Seq(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("q1", "q2")
    val out = graft.ops.Profiling
      .kAnonymityProfile(df, Seq("q1", "q2"), riskK = 2)
      .orderBy("k").collect()
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_classes"),
      r.getAs[Long]("n_rows"), r.getAs[Boolean]("at_risk"))).toSeq ==
      Seq((1L, 1L, 1L, true), (2L, 2L, 4L, false), (5L, 1L, 5L, false)))
    assert(math.abs(out(1).getAs[Double]("row_share") - 0.4) < 1e-12)
  }

  test("goodTuring: bands, unseen mass, and adjusted counts by hand") {
    import spark.implicits._
    // token counts: a=1 b=1 c=2 d=3 → N=7, N1=2, N2=1, N3=1
    val df = Seq("a b c", "c d d d").toDF("text")
    val out = graft.ops.TextAnalysis.goodTuring(df, "text", maxR = 3)
      .orderBy("r").collect()
    assert(out.map(_.getAs[Long]("n_types")).toSeq == Seq(2L, 1L, 1L))
    // p0 = N1/N = 2/7 on every row
    assert(out.forall(r => math.abs(r.getAs[Double]("p0") - 2.0 / 7) < 1e-12))
    // r*=1: 2*N2/N1 = 1.0 ; r*=2: 3*N3/N2 = 3.0 ; r*=3: 4*0/1 = 0
    assert(out.map(_.getAs[Double]("r_star")).toSeq == Seq(1.0, 3.0, 0.0))
    // trigram mode: "a b c" yields one trigram a_b_c
    val tri = graft.ops.TextAnalysis
      .goodTuring(Seq("a b c", "a b").toDF("text"), "text", 3, n = 3)
      .collect()
    assert(tri.length == 1 && tri.head.getAs[Long]("n_types") == 1)
  }

  test("diffInDiff/uplift/MDE plans: one Aggregate, no join, no rescan") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = Seq(("t", 0, 1.0), ("t", 1, 2.0), ("c", 0, 0.5), ("c", 1, 0.7))
      .toDF("g", "p", "v")
    def audit(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String): Unit = {
      val aggs = plan.collect { case a: Aggregate => a }
      val joins = plan.collect { case j: Join => j }
      assert(aggs.size == 1, s"$name: expected 1 Aggregate, got ${aggs.size}")
      assert(joins.isEmpty, s"$name: expected no Join, got ${joins.size}")
    }
    audit(graft.ops.Evaluation
      .diffInDiff(df, "g", "t", "c", col("p") === 1, "v")
      .queryExecution.optimizedPlan, "diffInDiff")
    audit(graft.ops.Evaluation
      .upliftBySegment(df.withColumnRenamed("p", "seg"), "g", "t", "c",
        "seg", "v").queryExecution.optimizedPlan, "upliftBySegment")
    audit(graft.ops.Evaluation
      .minDetectableEffect(df.withColumnRenamed("p", "seg"), "g", "t",
        "c", "seg", "v").queryExecution.optimizedPlan, "minDetectableEffect")
  }

  test("kCore peels pendants, keeps the dense backbone") {
    import spark.implicits._
    // triangle {a,b,c} + pendant d—a + chain d—e: 2-core = the triangle
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"),
      ("d", "e")).toDF("s", "t")
    val core = graft.ops.Graph.kCore(edges, "s", "t", k = 2, rounds = 3)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(core.toSeq == Seq("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k above the max degree peels everything
    assert(graft.ops.Graph.kCore(edges, "s", "t", k = 5, rounds = 3)
      .count() == 0)
  }

  test("degreeAssortativity: star graph is perfectly disassortative") {
    import spark.implicits._
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("s", "t")
    val r = graft.ops.Graph.degreeAssortativity(star, "s", "t").head()
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-12)
    assert(r.getAs[Long]("n_edges") == 3L && r.getAs[Long]("n_nodes") == 4L)
  }

  test("labelPropagation: two triangles + bridge settle into 2 communities") {
    import spark.implicits._
    // triangle {a,b,c} — bridge c-d — triangle {d,e,f}; hand-traced 3
    // synchronous rounds (min-label ties) end at labels a and c
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("c", "d"), ("d", "e"), ("e", "f"), ("d", "f")).toDF("s", "t")
    val out = graft.ops.Graph.labelPropagation(edges, "s", "t", 3)
      .orderBy("node").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "c", "e" -> "c", "f" -> "c"))
  }

  test("labelPropagation plan: vote is window-free (min_by in groupBy)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val plan = graft.ops.Graph.labelPropagation(edges, "s", "t", 1)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.isEmpty,
      s"vote must aggregate, not sort-window; found ${windows.size}")
  }

  test("theilSen: rolled-up series is materialized once (no corpus rescan)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("ts_ckpt").toString
    Seq(("k", 0.0, 1.0), ("k", 1.0, 3.0), ("k", 2.0, 5.0))
      .toDF("g", "x", "y")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val out = graft.ops.TimeSeries.theilSen(src, Seq("g"), "x", "y")
    // the keyed rollup is localCheckpointed before fanning into the
    // l/r self-join + residual branches, so the returned plan must not
    // contain the parquet scan at all — the corpus is read exactly once
    // at checkpoint time, not per branch
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "theilSen plan re-reads the source; keyed frame not materialized")
    val r = out.collect().head
    // all three pairwise slopes are exactly 2 → median 2, intercept 1
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-9)
  }

  test("temporalSplit: last ceil(n*frac) rows go to val, 1-row keys train") {
    import spark.implicits._
    val df = Seq(("u1", 1), ("u1", 2), ("u1", 3), ("u1", 4), ("u1", 5),
      ("u2", 1), ("u3", 1), ("u3", 2)).toDF("u", "t")
    val out = graft.ops.Sampling
      .temporalSplit(df, Seq("u"), Seq("t"), valFrac = 0.2)
      .orderBy("u", "t").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    // u1: 5 rows → ceil(1) = 1 val (t=5); u2: 1 row → train (capped at
    // n-1 = 0 val); u3: 2 rows → ceil(0.4) = 1 val (t=2)
    assert(out.toSeq == Seq(("u1", 1, "train"), ("u1", 2, "train"),
      ("u1", 3, "train"), ("u1", 4, "train"), ("u1", 5, "val"),
      ("u2", 1, "train"), ("u3", 1, "train"), ("u3", 2, "val")))
  }

  test("mixturePlan: temperature weights, epoch caps, one waterfall round") {
    import spark.implicits._
    // τ=0.5 → weights ∝ n²: 100:400:900. budget 140, caps 2n.
    // a0 = (10, 40, 60-capped); leftover 30 → A 16, B re-capped at 40
    val df = Seq(("A", 10L), ("B", 20L), ("C", 30L)).toDF("src", "tok")
    val out = graft.ops.Sampling
      .mixturePlan(df, "src", "tok", budget = 140L, temperature = 0.5,
        maxEpochs = 2.0)
      .orderBy("source").collect()
    val byS = out.map(r => r.getString(0) ->
      (r.getAs[Double]("alloc_tokens"), r.getAs[Double]("epochs"))).toMap
    assert(math.abs(byS("A")._1 - 16.0) < 1e-9)
    assert(math.abs(byS("B")._1 - 40.0) < 1e-9)
    assert(math.abs(byS("C")._1 - 60.0) < 1e-9)
    assert(math.abs(byS("A")._2 - 1.6) < 1e-9)
    assert(math.abs(byS("B")._2 - 2.0) < 1e-9)
    // weights are n²-proportional
    val w = out.map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(math.abs(w("A") - 100.0 / 1400) < 1e-12)
    assert(math.abs(w("C") - 900.0 / 1400) < 1e-12)
  }

  test("binaryMetrics groupCols: per-group AUC matches hand pair-counts") {
    import spark.implicits._
    // g1: pos{0.9, 0.6} neg{0.1, 0.7} → 3 of 4 pairs ordered → 0.75
    // g2: pos{0.5, 0.9} neg{0.5} → one tie (½) + one win → 0.75... no:
    //     pairs = (0.5 vs 0.5 tie = 0.5) + (0.9 > 0.5 = 1) → 1.5/2 = 0.75
    val df = Seq(("g1", 1.0, 0.9), ("g1", 0.0, 0.1), ("g1", 1.0, 0.6),
      ("g1", 0.0, 0.7), ("g2", 1.0, 0.5), ("g2", 0.0, 0.5),
      ("g2", 1.0, 0.9)).toDF("g", "label", "score")
    val out = graft.ops.Evaluation
      .binaryMetrics(df, "label", "score", groupCols = Seq("g"))
      .orderBy("g").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 4 &&
      math.abs(out(0).getAs[Double]("auc") - 0.75) < 1e-12)
    assert(out(1).getAs[Long]("n") == 3 &&
      math.abs(out(1).getAs[Double]("auc") - 0.75) < 1e-12)
    // ungrouped call keeps its original 1-row shape
    val g = graft.ops.Evaluation.binaryMetrics(df, "label", "score").collect()
    assert(g.length == 1 && g(0).getAs[Long]("n") == 7)
  }

  test("randomProject: JL projection equals scaled plane dots, map-only") {
    import spark.implicits._
    val v = Array.tabulate(8)(i => (i + 1).toDouble)
    val df = Seq((1L, v)).toDF("id", "vec")
    val out = graft.ops.Features.randomProject(df, "id", "vec", 8, 3)
      .head.getSeq[Double](1)
    assert(out.size == 3)
    val scale = 1.0 / math.sqrt(3.0)
    (0 until 3).foreach { j =>
      val w = graft.ops.Similarity.planeWeights(j, 8)
      val expect = v.zip(w).map { case (a, b) => a * b }.sum * scale
      assert(math.abs(out(j) - expect) < 1e-12, s"dim $j")
    }
  }

  test("propensityStratification: strata means and treated-weighted ATT") {
    import spark.implicits._
    val df = Seq((1L, 0.3, 10.0), (0L, 0.3, 8.0), (1L, 0.7, 20.0),
      (1L, 0.8, 22.0), (0L, 0.9, 15.0)).toDF("t", "p", "y")
    val out = graft.ops.Evaluation
      .propensityStratification(df, col("t") === 1L, "p", "y", bins = 2)
      .orderBy("stratum").collect()
    // s0: diff 10-8=2 (1 treated); s1: mean_t 21, mean_c 15 → diff 6
    // (2 treated); ATT = (2·1 + 6·2)/3 = 14/3
    assert(out.map(_.getAs[Long]("n_treat")).toSeq == Seq(1L, 2L))
    assert(math.abs(out(0).getAs[Double]("diff") - 2.0) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("diff") - 6.0) < 1e-12)
    assert(out.forall(r =>
      math.abs(r.getAs[Double]("att") - 14.0 / 3) < 1e-12))
    // total-weighted variant: (2·2 + 6·3)/5 = 4.4
    val ate = graft.ops.Evaluation
      .propensityStratification(df, col("t") === 1L, "p", "y", bins = 2,
        attWeighting = false).head.getAs[Double]("att")
    assert(math.abs(ate - 4.4) < 1e-12)
  }

  test("ipwEffect: Hajek-normalized means match hand arithmetic") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 10.0), (0L, 0.5, 6.0), (1L, 0.8, 20.0),
      (0L, 0.2, 4.0)).toDF("t", "p", "y")
    val r = graft.ops.Evaluation
      .ipwEffect(df, col("t") === 1L, "p", "y").head
    // treat: (10/.5 + 20/.8)/(1/.5 + 1/.8) = 45/3.25
    // ctrl:  (6/.5 + 4/.8)/(1/.5 + 1/.8)  = 17/3.25
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_treat") == 2)
    assert(math.abs(r.getAs[Double]("mean_treat_w") - 45.0 / 3.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_ctrl_w") - 17.0 / 3.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("ate") - 28.0 / 3.25) < 1e-12)
  }

  test("cmsProfile: frequency estimates exact at low cardinality, merge ≡ union") {
    import spark.implicits._
    val day1 = Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(3)("c")
    val day2 = Seq.fill(20)("a") ++ Seq.fill(5)("c") ++ Seq.fill(7)("d")
    val df1 = day1.toDF("v"); val df2 = day2.toDF("v")
    val p1 = graft.ops.Sketches.cmsProfile(df1, "v").head
    val p2 = graft.ops.Sketches.cmsProfile(df2, "v").head
    assert(p1.getAs[Long]("n") == 43 && p2.getAs[Long]("n") == 32)
    // at this cardinality vs eps=0.001 width the estimates are exact
    val est1 = graft.ops.Sketches
      .cmsEstimate(p1.getAs[Array[Byte]]("v_cms"), Seq("a", "b", "c", "d"))
      .map(_._2)
    assert(est1 == Seq(30L, 10L, 3L, 0L))
    // merged day sketches answer union-level frequencies with no rescan
    val profiles = graft.ops.Sketches.cmsProfile(df1, "v")
      .unionByName(graft.ops.Sketches.cmsProfile(df2, "v"))
    val merged = graft.ops.Sketches.cmsMerge(profiles, "v_cms")
    val estM = graft.ops.Sketches
      .cmsEstimate(merged, Seq("a", "b", "c", "d")).map(_._2)
    assert(estM == Seq(50L, 10L, 8L, 7L))
  }

  test("hbosScore: sparse bins score high, constants and NULLs add zero") {
    import spark.implicits._
    val df = Seq((1L, Some(1.0), 7.0), (2L, Some(2.0), 7.0),
      (3L, Some(3.0), 7.0), (4L, Some(4.0), 7.0),
      (5L, Some(100.0), 7.0), (6L, None, 7.0)).toDF("id", "a", "b")
    val out = graft.ops.Profiling
      .hbosScore(df, Seq("a", "b"), bins = 2)
      .orderBy("id").collect()
      .map(r => r.getAs[Double]("hbos_score"))
    // feature a: n=5, bins over [1,100] → {1..4} in bin0 (c=4),
    // 100 in bin1 (c=1); feature b constant → ln(1) = 0 for all;
    // NULL a → 0 contribution
    assert(out.take(4).forall(s => math.abs(s - math.log(5.0 / 4)) < 1e-12))
    assert(math.abs(out(4) - math.log(5.0)) < 1e-12)
    assert(out(5) == 0.0)
    // schema: original columns + hbos_score appended
    assert(graft.ops.Profiling.hbosScore(df, Seq("a"), 2).columns.toSeq ==
      Seq("id", "a", "b", "hbos_score"))
  }

  test("temporalSplit invariants over random key shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      val frac = Seq(0.1, 0.2, 0.5)(rnd.nextInt(3))
      val rows = (1 to 12).flatMap { k =>
        (1 to (rnd.nextInt(9) + 1)).map(t => (s"k$k", t.toLong))
      }
      val df = rows.toDF("k", "t")
      val out = graft.ops.Sampling.temporalSplit(df, Seq("k"), Seq("t"), frac)
      assert(out.count() == rows.size) // row set unchanged
      val per = out.groupBy("k").agg(
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("nv"),
          count(lit(1)).as("n"),
          max(when(col("split") === "train", col("t"))).as("maxTr"),
          min(when(col("split") === "val", col("t"))).as("minVa"))
        .collect()
      per.foreach { r =>
        val n = r.getAs[Long]("n"); val nv = r.getAs[Long]("nv")
        assert(nv == math.min(math.ceil(n * frac).toLong, n - 1),
          s"n=$n frac=$frac nv=$nv")
        // every train row strictly precedes every val row (t unique/key)
        if (nv > 0)
          assert(r.getAs[Long]("maxTr") < r.getAs[Long]("minVa"))
      }
    }
  }

  test("mixturePlan invariants over random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { _ =>
      val srcs = (1 to (rnd.nextInt(6) + 2)).map(i =>
        (s"s$i", (rnd.nextInt(900) + 100).toLong))
      val budget = (rnd.nextInt(3000) + 500).toLong
      val out = graft.ops.Sampling
        .mixturePlan(srcs.toDF("src", "tok"), "src", "tok", budget,
          temperature = Seq(0.5, 1.0, 2.0)(rnd.nextInt(3)),
          maxEpochs = 1.5)
        .collect()
      val wSum = out.map(_.getAs[Double]("weight")).sum
      assert(math.abs(wSum - 1.0) < 1e-9)
      out.foreach { r =>
        val alloc = r.getAs[Double]("alloc_tokens")
        val cap = r.getAs[Double]("n_tokens") * 1.5
        assert(alloc >= -1e-9 && alloc <= cap + 1e-6)
      }
      // never allocates more than the budget (single waterfall round
      // may leave budget UNUSED, never over-used)
      assert(out.map(_.getAs[Double]("alloc_tokens")).sum <=
        budget + 1e-6)
    }
  }

  test("bounded-collect lint: planted unbounded collect flagged, agg collects pass") {
    import spark.implicits._
    import graft.analysis.PlanLint
    val dir = java.nio.file.Files
      .createTempDirectory("lint_collect").toString
    spark.range(1000).toDF("id").write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    // plan-level rule: bounded shapes pass…
    assert(PlanLint.collectIsBounded(
      corpus.agg(count(lit(1))).queryExecution.optimizedPlan))
    assert(PlanLint.collectIsBounded(
      corpus.limit(10).queryExecution.optimizedPlan))
    assert(PlanLint.collectIsBounded(
      corpus.select("id").distinct().queryExecution.optimizedPlan))
    assert(PlanLint.collectIsBounded(corpus.groupBy("id").count()
      .join(corpus.agg(max(col("id")).as("m"))).queryExecution
      .optimizedPlan))
    // …raw/filter-only scans do not (filters don't bound cardinality)
    assert(!PlanLint.collectIsBounded(corpus.queryExecution.optimizedPlan))
    assert(!PlanLint.collectIsBounded(
      corpus.where(col("id") > 5).queryExecution.optimizedPlan))
    // listener form: the planted unbounded collect is flagged, the
    // bounded ones are not — the Verify-gate seam that keeps the
    // all-collects-bounded audit finding true for future contributors
    val guard = new PlanLint.BoundedCollectListener
    spark.listenerManager.register(guard)
    try {
      corpus.agg(sum(col("id"))).collect()
      corpus.limit(5).collect()
      corpus.where(col("id") % 7 === 0).collect() // PLANTED violation
      // QueryExecutionListener delivery is async on the listener bus
      val deadline = System.currentTimeMillis() + 10000
      while (guard.violations.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(guard.violations.size == 1,
        s"expected exactly the planted violation, got ${guard.violations}")
      assert(guard.violations.head.contains("unbounded collect"))
    } finally spark.listenerManager.unregister(guard)
  }

  test("PlanLint flags cartesian/window/broadcast smells, passes clean plans") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.analysis.PlanLint
    val big = spark.range(1000000).toDF("id")
    // raw (file-backed) relation — Range/LocalRelation are literal and
    // scale-bounded by construction, so the cartesian/broadcast rules
    // need a real scan to exercise
    val tinyDir = java.nio.file.Files
      .createTempDirectory("lint_tiny").toString
    spark.range(50).toDF("id").write.mode("overwrite").parquet(tinyDir)
    val tiny = spark.read.parquet(tinyDir)
    // cartesian of two raw sides → flagged; tiny thresholds force it
    val cart = tiny.crossJoin(tiny.withColumnRenamed("id", "id2"))
    assert(PlanLint.audit(cart, broadcastableBytes = 16)
      .exists(_.rule == "cartesian-product"))
    // 1-row stat-frame crossJoin (the library idiom) passes even there
    val statJoin = tiny.crossJoin(tiny.agg(max(col("id")).as("mx")))
    assert(PlanLint.audit(statJoin, broadcastableBytes = 16).isEmpty)
    // unpartitioned window → flagged
    val w = big.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))))
    assert(PlanLint.audit(w).exists(_.rule == "unpartitioned-window"))
    // per-key window passes
    val wk = big.withColumn("rn", row_number().over(
      Window.partitionBy(col("id") % 10).orderBy(col("id"))))
    assert(PlanLint.audit(wk).isEmpty)
    // oversized raw broadcast hint → flagged at a tiny threshold
    val bj = tiny.join(broadcast(tiny.withColumnRenamed("id", "id2")),
      col("id") === col("id2"))
    assert(PlanLint.audit(bj, maxBroadcastBytes = 16)
      .exists(_.rule == "oversized-broadcast"))
    // the gate form throws with the findings in the message
    val ex = intercept[IllegalStateException](
      PlanLint.assertScaleSafe(w))
    assert(ex.getMessage.contains("unpartitioned-window"))
    // rawSidesAreCorpus (the Verify-gate mode): byte estimates ignored —
    // a cartesian of two TINY raw sides still flags, because raw
    // relations scale with the corpus even when the test SF is small
    assert(PlanLint.audit(cart).isEmpty) // bytes alone: passes
    assert(PlanLint.audit(cart, rawSidesAreCorpus = true)
      .exists(_.rule == "cartesian-product"))
    // ...but a literal Range side (replicate inflation, the bootstrap
    // idiom) is scale-bounded by construction and never flags
    val inflate = tiny.crossJoin(spark.range(200).toDF("rep"))
    assert(PlanLint.audit(inflate, rawSidesAreCorpus = true).isEmpty)
    // and a representative library query is scale-clean
    assert(PlanLint.audit(
      SparkEntry.queries("q06_percentiles")(spark,
        "/root/testdata/sf0.001")).isEmpty)
  }

  test("every registered query passes the scale lint") {
    // suite-wide guarantee: none of the 215 declared plans contains a
    // cartesian product of big sides, an unpartitioned window, or a
    // raw oversized broadcast (sf0.001 so checkpoint-materializing
    // queries stay cheap)
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try graft.analysis.PlanLint.audit(fn(spark, dir))
          .map(f => s"$name: [${f.rule}] ${f.detail}")
        catch { case e: Throwable =>
          Seq(s"$name: audit construction failed: ${e.getMessage}")
        }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("topPaths and blocklistScore: hand-checked counts") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (1L, 4L, "b"), (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .toDF("u", "t", "et")
    val paths = graft.ops.Behavioral
      .topPaths(ev, "u", "t", "et", len = 3, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // u1: a>b>c, b>c>b; u2: a>b>c → a>b>c ×2 tops the list
    assert(paths.head == ("a>b>c", 2L))
    assert(paths.toSeq.contains(("b>c>b", 1L)) && paths.length == 2)

    val docs = Seq((1L, "The Hash join beats scan hash"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val bl = graft.ops.TextAnalysis
      .blocklistScore(docs, "doc_id", "text", Seq("hash", "scan"))
      .orderBy("doc_id").collect()
    // lowercased: hash ×2 + scan ×1 = 3 hits, 2 distinct terms
    assert(bl(0).getAs[Int]("hits") == 3 &&
      bl(0).getAs[Int]("distinct_terms") == 2 &&
      bl(0).getAs[Boolean]("flagged"))
    assert(bl(1).getAs[Int]("hits") == 0 && !bl(1).getAs[Boolean]("flagged"))
  }

  test("retentionDecay: exact half-life on a constructed halving cohort") {
    import spark.implicits._
    // 4 users week0; 2 return week1; 1 returns week2 → retention
    // 1, 0.5, 0.25 → slope of ln r is exactly −ln 2 → half-life 1
    val ev = (
      (1 to 4).map(u => (u.toLong, "2024-01-01")) ++
        Seq((1L, "2024-01-08"), (2L, "2024-01-08")) ++
        Seq((1L, "2024-01-15"))
      ).toDF("u", "d").withColumn("ts", col("d").cast("timestamp"))
    val out = graft.ops.Behavioral
      .retentionDecay(ev, "u", "ts", "week").collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_points") == 3)
    assert(math.abs(out(0).getAs[Double]("decay_rate") -
      -math.log(2.0)) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("half_life_periods") - 1.0)
      < 1e-12)
    // single-offset cohort → NULL decay, not 0/0
    val one = graft.ops.Behavioral.retentionDecay(
      Seq((9L, "2024-01-01")).toDF("u", "d")
        .withColumn("ts", col("d").cast("timestamp")), "u", "ts", "week")
      .collect()
    assert(one.length == 1 &&
      one(0).isNullAt(one(0).fieldIndex("decay_rate")))
  }

  test("nearestCentroid: assigns to the closest label mean") {
    import spark.implicits._
    val train = Seq((1L, Array(1.0, 0.0), "A"), (2L, Array(1.0, 0.2), "A"),
      (3L, Array(0.0, 1.0), "B"), (4L, Array(0.2, 1.0), "B"))
      .toDF("id", "vec", "lbl")
    val test = Seq((10L, Array(0.9, 0.1), "A"), (11L, Array(0.0, 2.0), "B"))
      .toDF("id", "vec", "lbl")
    val out = graft.ops.Similarity
      .nearestCentroid(train, test, "id", "vec", "lbl")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("pred_label")).toSeq == Seq("A", "B"))
    assert(out.forall(r =>
      r.getAs[String]("true_label") == r.getAs[String]("pred_label")))
    // centroid of B = (0.1, 1.0); cos((0,2),(0.1,1)) = 1/sqrt(1.01)
    assert(math.abs(out(1).getAs[Double]("cos") -
      1.0 / math.sqrt(1.01)) < 1e-12)
  }

  test("negativeEdges: no real edges, no self-pairs, deterministic") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("e", "f")).toDF("s", "t")
    // perNode ≥ N−1 → bucket count 1 → all non-edges enumerated
    val neg = graft.ops.Graph.negativeEdges(edges, "s", "t", perNode = 10)
    val pairs = neg.collect().map(r => (r.getString(0), r.getString(1)))
    // 6 nodes → 15 canonical pairs − 5 real edges = 10 negatives
    assert(pairs.length == 10)
    assert(pairs.forall { case (u, v) => u < v })
    val real = Set(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"),
      ("e", "f"))
    assert(pairs.forall(p => !real.contains(p)))
    // determinism: same input → same set
    val again = graft.ops.Graph.negativeEdges(edges, "s", "t", 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet == again.toSet)
    // smaller perNode → more buckets → fewer candidates generated (the
    // rate shrinks GENERATION, not a post-filter); all still valid
    val small = graft.ops.Graph.negativeEdges(edges, "s", "t", 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(small.length < 10)
    assert(small.forall { case (u, v) =>
      u < v && !real.contains((u, v)) })
  }

  test("decompose recovers a planted flat-trend periodic series exactly") {
    import spark.implicits._
    // y = 100 + s[phase], s = (3, -1, -2) summing to 0, period 3: every
    // centered 3-day mean is exactly 100, seasonal recovers s, zero
    // remainder
    val s = Seq(3.0, -1.0, -2.0)
    val rows = (0 until 12).map { i =>
      ("k", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()),
        100.0 + s(i % 3))
    }
    val out = graft.ops.TimeSeries
      .decompose(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v",
        period = 3, halfWindow = 1)
      .orderBy("day").collect()
    assert(out.length == 12)
    assert(out.head.isNullAt(out.head.fieldIndex("trend"))) // edge
    val interior = out.drop(1).dropRight(1)
    assert(interior.forall(r =>
      math.abs(r.getAs[Double]("trend") - 100.0) < 1e-9))
    interior.foreach { r =>
      val phase = ((r.getDate(r.fieldIndex("day")).toLocalDate.toEpochDay -
        java.time.LocalDate.of(2024, 1, 1).toEpochDay) % 3).toInt
      assert(math.abs(r.getAs[Double]("seasonal") - s(phase)) < 1e-9)
      assert(math.abs(r.getAs[Double]("remainder")) < 1e-9)
    }
  }

  test("eventStudy: placebo period nulls out, treatment period shows the jump") {
    import spark.implicits._
    // period 1 = base. period 2: both arms +5 (parallel trends, effect
    // 0). period 3: treat +8 extra (effect 8). two rows per cell so
    // var_samp is defined.
    def cell(g: String, p: Int, base: Double) =
      Seq((g, p, base - 0.5), (g, p, base + 0.5))
    val df = (cell("t", 1, 10) ++ cell("c", 1, 20) ++
      cell("t", 2, 15) ++ cell("c", 2, 25) ++
      cell("t", 3, 23) ++ cell("c", 3, 25)).toDF("arm", "p", "y")
    val out = graft.ops.Evaluation
      .eventStudy(df, "arm", "t", "c", "p", "y", 1)
      .orderBy("period").collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getAs[Double]("effect")) < 1e-12) // placebo
    assert(math.abs(out(1).getAs[Double]("effect") - 8.0) < 1e-12)
    assert(out.forall(_.getAs[Double]("se") > 0))
  }

  test("informationGain: perfect predictor gets H(label), constant gets 0") {
    import spark.implicits._
    val df = Seq(
      ("x", "a", "1"), ("x", "a", "1"), ("y", "b", "0"), ("y", "b", "0"),
      ("x", "c", "1"), ("y", "c", "0")
    ).toDF("perfect", "partial", "lbl")
      .withColumn("const", lit("k"))
    val out = graft.ops.Profiling
      .informationGain(df, Seq("perfect", "partial", "const"), "lbl")
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Double]("h_label"), r.getAs[Double]("info_gain"))).toMap
    val hLabel = math.log(2.0) // balanced binary label
    assert(math.abs(out("perfect")._1 - hLabel) < 1e-12)
    // 'perfect' determines the label exactly -> IG = H(label)
    assert(math.abs(out("perfect")._2 - hLabel) < 1e-12)
    // 'const' carries nothing -> IG = 0
    assert(math.abs(out("const")._2) < 1e-12)
    // 'partial': values a,b are pure (4 rows), c is 50/50 (2 rows)
    // H(l|f) = (2/6)*0 + (2/6)*0 + (2/6)*ln2 -> IG = ln2 * 2/3
    assert(math.abs(out("partial")._2 - hLabel * 2.0 / 3.0) < 1e-12)
  }

  test("rddEstimate recovers a noise-free planted jump exactly") {
    import spark.implicits._
    // y = 2 + 0.5x + 3*1(x>=0): both side fits are exact lines
    val df = ((-20 to -1) ++ (0 to 19)).map { i =>
      val x = i.toDouble
      (x, 2.0 + 0.5 * x + (if (x >= 0) 3.0 else 0.0))
    }.toDF("run", "y")
    val r = graft.ops.Evaluation
      .rddEstimate(df, "run", "y", cutoff = 0.0, bandwidth = 25.0)
      .head()
    assert(r.getAs[Long]("n_left") == 20 && r.getAs[Long]("n_right") == 20)
    assert(math.abs(r.getAs[Double]("slope_l") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_r") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("at_cutoff_l") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("at_cutoff_r") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("effect") - 3.0) < 1e-9)
    assert(r.getAs[Double]("se") < 1e-6 && r.isNullAt(r.fieldIndex("t_stat")))
    // a side with < 3 points yields NULL estimates, not a crash
    val thin = Seq((-1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (3.0, 4.0))
      .toDF("run", "y")
    val r2 = graft.ops.Evaluation
      .rddEstimate(thin, "run", "y", 0.0, 10.0).head()
    assert(r2.isNullAt(r2.fieldIndex("slope_l")) &&
      r2.isNullAt(r2.fieldIndex("effect")))
  }

  test("pqEncode/pqKnn: exact on codebook vectors, ADC finds the planted hit") {
    import spark.implicits._
    val m = 2; val subDim = 4; val ksub = 4; val inDim = 8
    def codebookVec(c0: Int, c1: Int): Array[Double] =
      graft.ops.Similarity.pqCentroids(0, ksub, subDim)(c0) ++
        graft.ops.Similarity.pqCentroids(1, ksub, subDim)(c1)
    // vectors assembled FROM the codebooks: codes recover exactly, zero
    // reconstruction error
    val rows = Seq((1L, codebookVec(0, 3)), (2L, codebookVec(2, 1)),
      (3L, codebookVec(3, 3))).toDF("vec_id", "embedding")
    val enc = graft.ops.Similarity
      .pqEncode(rows, "vec_id", "embedding", inDim, m, ksub)
      .orderBy("vec_id").collect()
    assert(enc.map(_.getAs[scala.collection.Seq[Int]]("pq_codes").toSeq)
      .toSeq == Seq(Seq(0, 3), Seq(2, 1), Seq(3, 3)))
    assert(enc.forall(_.getAs[Double]("recon_err") < 1e-12))
    // ADC: query = vector 1's exact value → nbr 3 (shares subspace-1
    // code 3, differs in subspace 0) must outrank nbr 2 (shares none)
    val knn = graft.ops.Similarity
      .pqKnn(rows, rows.where(col("vec_id") === 1), k = 2, inDim, m, ksub)
      .orderBy("rnk").collect()
    assert(knn.map(_.getAs[Long]("nbr_id")).toSeq == Seq(3L, 2L))
    // the planted exact-code match has approx_dist = only subspace-0
    // centroid separation; both are > 0 (query differs from both)
    assert(knn.forall(_.getAs[Double]("approx_dist") > 0))
  }

  test("funnelDurations: per-step gaps, strict ordering, window drop") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))
    // u1 converts a→b in 10 s, b→c in 20 s; u2 a→b in 30 s, no c;
    // u3's b precedes a (strict order: not counted); u4's b is past
    // the 60 s window
    val ev = Seq(
      ("u1", ts(0), "a"), ("u1", ts(10), "b"), ("u1", ts(30), "c"),
      ("u2", ts(0), "a"), ("u2", ts(30), "b"),
      ("u3", ts(50), "a"), ("u3", ts(0), "b"),
      ("u4", ts(0), "a"), ("u4", ts(100), "b")
    ).toDF("u", "t", "e")
    val out = graft.ops.Behavioral
      .funnelDurations(ev, "u", "t", "e", Seq("a", "b", "c"),
        maxGapSeconds = Some(60))
      .orderBy("step_idx").collect()
    assert(out.length == 2)
    val b = out(0)
    assert(b.getAs[Int]("step_idx") == 2 && b.getAs[Long]("n_users") == 2)
    assert(math.abs(b.getAs[Double]("avg_gap_s") - 20.0) < 1e-9)
    assert(b.getAs[Double]("p50_gap_s") == 10.0) // disc: lower of {10,30}
    assert(b.getAs[Double]("p90_gap_s") == 30.0)
    val c = out(1)
    assert(c.getAs[Long]("n_users") == 1)
    assert(math.abs(c.getAs[Double]("avg_gap_s") - 20.0) < 1e-9)
  }

  test("quantileNormalize aligns group distributions onto the pooled grid") {
    import spark.implicits._
    // two groups, same shape, 100-apart scales; after QN both carry the
    // IDENTICAL multiset of pooled grid quantiles (hand-traced, K=8)
    val df = ((1 to 8).map(i => ("a", i.toDouble)) ++
      (1 to 8).map(i => ("b", 100.0 + i))).toDF("g", "x")
    val out = graft.ops.Features.quantileNormalize(df, "x", Seq("g"),
      gridPoints = 8)
    def vals(g: String) = out.where(col("g") === g)
      .select("qn_value").collect().map(_.getDouble(0)).sorted.toSeq
    val expect = Seq(1.0, 3.0, 5.0, 7.0, 101.0, 103.0, 105.0, 107.0)
    assert(vals("a") == expect)
    assert(vals("b") == expect)
    // rows and NULLs pass through
    val withNull = df.unionByName(
      Seq(("a", Option.empty[Double])).toDF("g", "x"))
    val out2 = graft.ops.Features.quantileNormalize(withNull, "x",
      Seq("g"), gridPoints = 8)
    assert(out2.count() == 17)
    assert(out2.where(col("x").isNull).select("qn_value")
      .collect().forall(_.isNullAt(0)))
  }

  test("slicedWasserstein: zero on identical sets, exact on constant shift") {
    import spark.implicits._
    val base = (1 to 40).map(i => (i.toLong,
      Array(i * 0.1, -i * 0.05))).toDF("id", "vec")
    val same = graft.ops.Features
      .slicedWasserstein(base, base, "vec", inDim = 2, slices = 3,
        gridPoints = 8)
      .collect()
    assert(same.length == 3)
    assert(same.forall(r => math.abs(r.getAs[Double]("w1")) < 1e-12))
    // shifting every vector by a constant c moves each slice's whole
    // 1-D distribution by dot(c, w_j): W1 per slice = |dot(c, w_j)|
    val c = Array(0.7, -0.3)
    val shifted = base.select(col("id"),
      array(col("vec")(0) + c(0), col("vec")(1) + c(1)).as("vec"))
    val out = graft.ops.Features
      .slicedWasserstein(base, shifted, "vec", inDim = 2, slices = 3,
        gridPoints = 8)
      .orderBy("slice").collect()
    (0 until 3).foreach { j =>
      val wj = graft.ops.Similarity.planeWeights(j, 2)
      val expect = math.abs(c(0) * wj(0) + c(1) * wj(1))
      assert(math.abs(out(j).getAs[Double]("w1") - expect) < 1e-9,
        s"slice $j")
    }
  }

  test("probitCol matches published normal quantiles incl. tails") {
    import spark.implicits._
    val ps = Seq(0.5, 0.975, 0.01, 0.999, 0.0001, 0.8)
    val out = ps.toDF("p")
      .select(graft.ops.Features.probitCol(col("p")).as("z"))
      .collect().map(_.getDouble(0))
    val expect = Seq(0.0, 1.959964, -2.326348, 3.090232, -3.719016,
      0.841621) // Φ⁻¹ reference values (1e-6 tables); Acklam ε < 1.2e-9
    ps.indices.foreach { i =>
      assert(math.abs(out(i) - expect(i)) < 5e-6, s"p=${ps(i)}")
    }
  }

  test("inverseNormalTransform: Blom rankits for n=5, ties share ranks") {
    import spark.implicits._
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0),
      ("g", 50.0)).toDF("grp", "v")
    val z = graft.ops.Features
      .inverseNormalTransform(df, "v", Seq("grp"))
      .orderBy("v").collect().map(_.getAs[Double]("int_z"))
    // published Blom rankits for n=5: ±1.17986, ±0.49720, 0
    val rankits = Seq(-1.17986, -0.49720, 0.0, 0.49720, 1.17986)
    z.indices.foreach(i => assert(math.abs(z(i) - rankits(i)) < 1e-4))
    // ties: two equal values share the midrank z
    val tied = graft.ops.Features
      .inverseNormalTransform(
        Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 3.0))
          .toDF("grp", "v"), "v", Seq("grp"))
      .where(col("v") === 2.0).collect().map(_.getAs[Double]("int_z"))
    assert(tied.length == 2 && tied(0) == tied(1))
    assert(math.abs(tied(0)) < 1e-12) // midrank 2.5 of 4 → center
  }

  test("benfordConformity: digits, zero-fill, and hand-checked MAD/chi2") {
    import spark.implicits._
    // values: first digits 1,1,2,9 (0.05 → digit 5); no 3,4,6,7,8
    val df = Seq(120.0, 0.0, 15.0, -230.0, 9000.0, 0.05).toDF("v")
    val out = graft.ops.Profiling.benfordConformity(df, "v")
      .orderBy("digit").collect()
    assert(out.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    assert(out.map(_.getAs[Long]("n")).toSeq ==
      Seq(2L, 1L, 0L, 0L, 1L, 0L, 0L, 0L, 1L)) // 0.0 dropped
    val obs = out.map(_.getAs[Double]("observed"))
    val exp = out.map(_.getAs[Double]("expected"))
    assert(math.abs(obs(0) - 0.4) < 1e-12 &&
      math.abs(exp(0) - math.log10(2.0)) < 1e-12)
    val mad = obs.zip(exp).map { case (o, e) => math.abs(o - e) }.sum / 9
    val chi2 = 5.0 * obs.zip(exp)
      .map { case (o, e) => (o - e) * (o - e) / e }.sum
    assert(math.abs(out(0).getAs[Double]("mad") - mad) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("chi2") - chi2) < 1e-12)
  }

  test("Tables.load normalizes µs-NTZ parquet timestamps to TIMESTAMP") {
    import org.apache.spark.sql.types._
    import java.sql.Timestamp
    // write a fixture whose ts column is TIMESTAMP_NTZ — the shape the
    // round-6 testdata shipped (plain parquet timestamp[us], no tz) that
    // broke every unix_micros(ts) / ts.cast(long) query
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L,
        java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5, 678000000)),
      org.apache.spark.sql.Row(2L,
        java.time.LocalDateTime.of(2024, 6, 7, 8, 9, 10, 0)))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    // UTC session ⇒ the NTZ wall-clock reading IS the instant
    val micros = loaded.orderBy("event_id")
      .selectExpr("unix_micros(ts)").collect().map(_.getLong(0))
    assert(micros(0) == 1704164645678000L && micros(1) == 1717747750000000L)
  }

  test("normalizeTimestamps still converts nanosAsLong ts columns") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq((1L, 1704164645678000000L)).toDF("event_id", "ts")
    val out = Tables.normalizeTimestamps(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.selectExpr("unix_micros(ts)").head.getLong(0) == 1704164645678000L)
  }

  test("containmentPairs: planted sub-document found, asymmetric") {
    import spark.implicits._
    // B's words are a strict prefix of A's → every trigram of B is a
    // trigram of A: containment(B ⊂ A) = 1.0; the reverse direction
    // is 4/9 < 0.6 and must NOT emit. C shares nothing.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "x1 x2 x3 x4 x5 x6 x7")).toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("super_id") == 1L)
    assert(out(0).getAs[Long]("sub_id") == 2L)
    assert(out(0).getAs[Double]("containment") == 1.0)
  }

  test("boilerplateUnits: planted footer found, unique lines ignored") {
    import spark.implicits._
    val footer = "all rights reserved"
    val docs = Seq(
      (1L, s"unique one. $footer. body a"),
      (2L, s"unique two. $footer. body b"),
      (3L, s"unique three. $footer"),
      (4L, "nothing shared here"),
      // unit repeated WITHIN one doc counts that doc once (distinct)
      (5L, s"$footer. $footer. tail")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .boilerplateUnits(docs, "doc_id", "text", minDocs = 3)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("unit") == footer)
    assert(out(0).getAs[Long]("n_docs") == 4L) // docs 1,2,3,5 — 5 once
  }

  test("charNgramCompressibility: looped, natural, and short texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaaaa"),   // 3 grams, all identical → 1/3
      (2L, "abcdefghij"),   // 3 grams, all distinct → 1.0
      (3L, "ab")            // shorter than n → one truncated gram → 1.0
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .charNgramCompressibility(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_grams") == 3L)
    assert(out(0).getAs[Long]("distinct_grams") == 1L)
    assert(out(0).getAs[Double]("compress_ratio") == 1.0 / 3.0)
    assert(out(1).getAs[Double]("compress_ratio") == 1.0)
    assert(out(2).getAs[Long]("n_grams") == 1L)
    assert(out(2).getAs[Double]("compress_ratio") == 1.0)
  }

  test("Tables.materialized supports NESTED builds (regression)") {
    // doc_trigram_clusters builds FROM doc_trigram_pairs — a nested
    // materialized call. computeIfAbsent threw IllegalStateException
    // ("Recursive update") whenever the inner put hashed into the bin
    // the outer compute held; the collision depended on session
    // identity hash, so it was intermittent (green Verify, dead
    // ScaleSlope). The rewritten get/build/putIfAbsent path must
    // build nested frames and memoize both.
    import spark.implicits._
    val tag = System.nanoTime().toString // unique per run
    var innerBuilds, outerBuilds = 0
    def inner() = Tables.materialized(spark, tag, "inner") {
      innerBuilds += 1
      Seq(1, 2, 3).toDF("x")
    }
    def outer() = Tables.materialized(spark, tag, "outer") {
      outerBuilds += 1
      inner().selectExpr("x * 10 AS y")
    }
    assert(outer().orderBy("y").collect().map(_.getInt(0)).toSeq ==
      Seq(10, 20, 30))
    // memoized: second access builds nothing
    outer(); inner()
    assert(innerBuilds == 1 && outerBuilds == 1)
  }

  test("rankingMetrics: hand-computed MRR/MAP/P/R, no-relevant query") {
    import spark.implicits._
    // q=a ranked by score desc: d3(rel), d1, d2(rel), d4 →
    //   MRR = 1/1; AP@2 = (1/1)/min(2,2) = 0.5; P@2 = 1/2; R@2 = 1/2
    // q=b has no relevant docs → all zeros
    val df = Seq(
      ("a", 1L, 0.0, 3.0), ("a", 2L, 1.0, 2.0), ("a", 3L, 1.0, 9.0),
      ("a", 4L, 0.0, 1.0),
      ("b", 1L, 0.0, 5.0), ("b", 2L, 0.0, 4.0))
      .toDF("q", "doc", "rel", "score")
    val out = graft.ops.Evaluation
      .rankingMetrics(df, "q", "doc", "rel", "score", k = 2)
      .orderBy("query").collect()
    assert(out(0).getAs[Long]("n_rel") == 2L)
    assert(out(0).getAs[Double]("mrr") == 1.0)
    assert(out(0).getAs[Double]("map_k") == 0.5)
    assert(out(0).getAs[Double]("precision_k") == 0.5)
    assert(out(0).getAs[Double]("recall_k") == 0.5)
    assert(out(1).getAs[Double]("mrr") == 0.0 &&
      out(1).getAs[Double]("map_k") == 0.0 &&
      out(1).getAs[Double]("recall_k") == 0.0)
  }

  test("linkPredictionScores: wedge counts, anti-join, degree cap") {
    import spark.implicits._
    // path 1-2-3 plus edge 3-4: pair (1,3) shares center 2 (deg 2);
    // (2,4) shares center 3 (deg 2); (1,4) is distance 3 → absent;
    // (1,2) etc. are existing edges → anti-joined away
    val edges = Seq(("1", "2"), ("2", "3"), ("3", "4")).toDF("s", "t")
    val out = graft.ops.Graph
      .linkPredictionScores(edges, "s", "t")
      .orderBy("u", "w").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "3"), ("2", "4")))
    val r13 = out(0)
    assert(r13.getAs[Long]("common") == 1L)
    assert(math.abs(r13.getAs[Double]("adamic_adar") -
      1.0 / math.log(2.0)) < 1e-12)
    assert(r13.getAs[Double]("resource_alloc") == 0.5)
    // deg(1)=1, deg(3)=2, common=1 → jaccard = 1/(1+2-1) = 0.5
    assert(r13.getAs[Double]("jaccard") == 0.5)
    // cap 1 excludes every center of degree ≥ 2 → no wedges at all
    assert(graft.ops.Graph
      .linkPredictionScores(edges, "s", "t", maxCenterDegree = 1)
      .isEmpty)
  }

  test("hopDistance: BFS levels on a path, unreachable stays absent") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("s", "t")
    val seeds = Seq("a").toDF("node")
    val out = graft.ops.Graph
      .hopDistance(edges, "s", "t", seeds, "node", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("massAnomaly: planted outlier scores highest; probs sum sane") {
    import spark.implicits._
    val base = (1 to 200).map(i => (i.toLong, 10.0 + (i % 5), 5.0))
    val df = (base :+ (999L, 1000.0, 500.0)).toDF("id", "x", "y")
    val out = graft.ops.Profiling
      .massAnomaly(df, Seq("x", "y"), Seq("id"), trees = 4, depth = 4)
    val top = out.orderBy(desc("mass_score")).head
    assert(top.getAs[Long]("id") == 999L)
    // the outlier sits alone in its cells → min mass fraction = 1/201
    assert(math.abs(top.getAs[Double]("min_mass_frac") - 1.0 / 201) < 1e-12)
  }

  test("giniCoefficient: uniform → 0, concentrated → near 1, groups") {
    import spark.implicits._
    val df = Seq(("u", 5.0), ("u", 5.0), ("u", 5.0), ("u", 5.0),
      ("c", 0.0), ("c", 0.0), ("c", 0.0), ("c", 100.0))
      .toDF("g", "x")
    val out = graft.ops.Profiling.giniCoefficient(df, "x", Seq("g"))
      .orderBy("g").collect()
    // concentrated: ranks of (0,0,0,100): Σi·x = 4·100 = 400;
    // G = 2·400/(4·100) − 5/4 = 0.75 (= (n−1)/n for one-holder)
    assert(out(0).getAs[String]("g") == "c" &&
      math.abs(out(0).getAs[Double]("gini") - 0.75) < 1e-12)
    assert(out(1).getAs[String]("g") == "u" &&
      math.abs(out(1).getAs[Double]("gini")) < 1e-12)
  }

  test("mmrSelect: diversity penalty beats raw relevance ordering") {
    import spark.implicits._
    // b is nearly parallel to a — after picking a, the λ=0.5 penalty
    // pushes b below the orthogonal-but-less-relevant c
    val df = Seq(
      ("a", Array(1.0, 0.0), 1.0),
      ("b", Array(0.995, 0.0998), 0.9),
      ("c", Array(0.0, 1.0), 0.5))
      .toDF("id", "v", "rel")
    val out = graft.ops.Similarity
      .mmrSelect(df, "id", "v", "rel", k = 2, lambda = 0.5)
      .orderBy("round").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a", "c"))
    assert(out(0).getAs[Double]("mmr") == 0.5) // λ·rel − (1−λ)·0
  }

  test("bpeMerges: tie-break, greedy-left application, round chain") {
    import spark.implicits._
    // word types: aa(×2), ab(×2), aaa(×1):
    //   round 1 pairs: (<a>,<a>) = 2+2 = 4 (aa twice + aaa twice),
    //                  (<a>,<b>) = 2 → merge <aa>;
    //   "aaa" applies greedily left→right: <aa> <a> (not <a> <aa>)
    //   round 2 pairs: (<a>,<b>) = 2, (<aa>,<a>) = 1 → merge <ab>
    val docs = Seq("aa ab aaa", "aa ab").toDF("text")
    val out = graft.ops.TextAnalysis.bpeMerges(docs, "text", merges = 2)
      .orderBy("round").collect()
    assert(out(0).getAs[String]("left") == "<a>" &&
      out(0).getAs[String]("right") == "<a>" &&
      out(0).getAs[String]("merged") == "<aa>" &&
      out(0).getAs[Long]("cnt") == 4L)
    assert(out(1).getAs[String]("left") == "<a>" &&
      out(1).getAs[String]("right") == "<b>" &&
      out(1).getAs[String]("merged") == "<ab>" &&
      out(1).getAs[Long]("cnt") == 2L)
  }

  test("reciprocalRankFusion: hand-computed fused scores") {
    import spark.implicits._
    // ranker r1 orders (x, y); ranker r2 orders (y, x):
    //   rrf(x) = 1/61 + 1/62 = rrf(y) — symmetric tie
    // z appears only in r1 at rank 3 → single term
    val df = Seq(
      ("q", "x", "r1", 9.0), ("q", "y", "r1", 8.0), ("q", "z", "r1", 7.0),
      ("q", "y", "r2", 9.0), ("q", "x", "r2", 8.0))
      .toDF("q", "doc", "rkr", "score")
    val out = graft.ops.Evaluation
      .reciprocalRankFusion(df, "q", "doc", "rkr", "score", 60)
      .orderBy("doc").collect()
    val exp = 1.0 / 61 + 1.0 / 62
    assert(math.abs(out(0).getAs[Double]("rrf") - exp) < 1e-15)
    assert(math.abs(out(1).getAs[Double]("rrf") - exp) < 1e-15)
    assert(out(2).getAs[Long]("n_rankers") == 1L &&
      math.abs(out(2).getAs[Double]("rrf") - 1.0 / 63) < 1e-15)
  }

  test("hashFeatures matches the PortableHash formula replayed by hand") {
    import spark.implicits._
    def bucket(key: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1048576L
    }
    def expected(vals: Map[String, String], dims: Int): Seq[Double] = {
      val acc = Array.fill(dims)(0.0)
      vals.foreach { case (c, v) =>
        val j = (bucket(s"$c|$v") % dims).toInt
        val s = if (bucket(s"s|$c|$v") % 2 == 0) 1.0 else -1.0
        acc(j) += s
      }
      acc.toSeq
    }
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x")).toDF("c1", "c2")
    val out = graft.ops.Features.hashFeatures(df, Seq("c1", "c2"), 8)
      .select("hashed").collect().map(_.getSeq[Double](0))
    assert(out(0) == expected(Map("c1" -> "a", "c2" -> "x"), 8))
    assert(out(1) == expected(Map("c1" -> "a", "c2" -> "y"), 8))
    assert(out(2) == out(0)) // same values hash identically
  }

  test("piiProfile: per-column hit rates in one pass") {
    import spark.implicits._
    val df = Seq(
      ("mail me at bob@x.com", "clean"),
      ("ssn 123-45-6789 and ip 10.0.0.1", "clean"),
      ("nothing here", "also clean"),
      ("call +1 (415) 555-0100", "clean"))
      .toDF("a", "b")
    val out = graft.ops.TextAnalysis.piiProfile(df, Seq("a", "b"))
      .orderBy("column").collect()
    val a = out(0)
    assert(a.getAs[String]("column") == "a" && a.getAs[Long]("n") == 4L)
    assert(a.getAs[Double]("email_rate") == 0.25)
    assert(a.getAs[Double]("ssn_rate") == 0.25)
    assert(a.getAs[Double]("ipv4_rate") == 0.25)
    assert(a.getAs[Double]("any_rate") == 0.75)
    assert(out(1).getAs[Double]("any_rate") == 0.0)
  }

  test("segmentInsights: deviating cell flagged, support floor holds") {
    import spark.implicits._
    // 40 rows of g=a,y=10 and 40 of g=b,y=20; tiny g=c below support
    val rows = (1 to 40).map(i => ("a", "x", 10.0)) ++
      (1 to 40).map(i => ("b", "x", 20.0)) ++ Seq(("c", "x", 99.0))
    val df = rows.toDF("g", "h", "y")
    val out = graft.ops.Profiling
      .segmentInsights(df, "y", Seq("g", "h"), minSupport = 30)
      .orderBy("feature", "value").collect()
    // g=c dropped; h=x covers everything → lift 1 vs global mean
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("g", "a"), ("g", "b"), ("h", "x")))
    assert(out(0).getAs[Double]("z") < 0 && out(1).getAs[Double]("z") > 0)
    assert(math.abs(out(2).getAs[Double]("lift") - 1.0) < 1e-12)
    assert(out(2).isNullAt(out(2).fieldIndex("z"))) // full-pop cell
  }

  test("quantileTreatmentEffect: constant shift recovered at every p") {
    import spark.implicits._
    val ctrl = (1 to 20).map(i => (false, i.toDouble))
    val trt = (1 to 20).map(i => (true, i.toDouble + 5))
    val df = (ctrl ++ trt).toDF("t", "y")
    val out = graft.ops.Evaluation
      .quantileTreatmentEffect(df, col("t"), "y")
      .orderBy("p").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("qte") == 5.0))
    assert(out(1).getAs[Double]("p") == 0.5 &&
      out(1).getAs[Double]("q_control") == 10.0) // DISC at p=0.5, n=20
  }

  test("linearRegression: exact recovery, ridge shrinks, predict scores") {
    import spark.implicits._
    // y = 2 + 3·x1 − 0.5·x2, noise-free → exact coefficients, R² = 1
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val x1 = rnd.nextDouble() * 10; val x2 = rnd.nextDouble() * 4
      (x1, x2, 2.0 + 3.0 * x1 - 0.5 * x2)
    }
    val df = rows.toDF("x1", "x2", "y")
    val fit = graft.ops.Regression
      .linearRegression(df, Seq("x1", "x2"), "y")
    val m = fit.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("(intercept)") - 2.0) < 1e-8)
    assert(math.abs(m("x1") - 3.0) < 1e-9)
    assert(math.abs(m("x2") + 0.5) < 1e-9)
    assert(math.abs(fit.head.getAs[Double]("r2") - 1.0) < 1e-10)
    // ridge pulls slopes toward zero
    val ridge = graft.ops.Regression
      .linearRegression(df, Seq("x1", "x2"), "y", lambda = 1000.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ridge("x1")) < 3.0 && math.abs(ridge("x2")) < 0.5)
    // predict reproduces the noise-free target
    val scored = graft.ops.Regression
      .predict(df, fit, Seq("x1", "x2"))
      .select(max(abs(col("prediction") - col("y")))).head.getDouble(0)
    assert(scored < 1e-8)
    // collinear design fails loudly
    val bad = df.withColumn("x3", col("x1") * 2)
    intercept[IllegalArgumentException] {
      graft.ops.Regression.linearRegression(bad, Seq("x1", "x3"), "y")
    }
  }

  test("naiveBayes: hand-computed posterior, smoothing, unseen value") {
    import spark.implicits._
    // train: label A has f=x twice, f=y once; label B has f=y twice
    val train = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"),
      ("B", "y")).toDF("lbl", "f")
    val test = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "f")
    val m = graft.ops.NaiveBayes.fit(train, Seq("f"), "lbl")
    val out = graft.ops.NaiveBayes
      .score(test, m, Seq("f"), Seq("id"))
      .orderBy("id").collect()
    // id=1 (x): A has seen x, B never → A wins
    assert(out(0).getAs[String]("pred_label") == "A")
    // id=2 (y): V_f = 2 distinct train values, so
    //   P(y|A)=(1+1)/(3+2)=0.4, P(y|B)=(2+1)/(2+2)=0.75;
    //   A: 0.6·0.4 = 0.24; B: 0.4·0.75 = 0.3 → B
    assert(out(1).getAs[String]("pred_label") == "B")
    assert(math.abs(out(1).getAs[Double]("log_score") -
      math.log(0.3)) < 1e-12)
    // id=3 (z, unseen anywhere): A: 0.6·(1/5) = 0.12,
    //   B: 0.4·(1/4) = 0.1 → A
    assert(out(2).getAs[String]("pred_label") == "A")
  }

  test("groupedOls: exact line per key, degenerate x gives NULLs") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0), // y = 1 + 2x
      ("b", 4.0, 9.0), ("b", 4.0, 11.0)) // constant x → no slope
      .toDF("g", "x", "y")
    val out = graft.ops.Regression.groupedOls(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    assert(math.abs(out(0).getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("intercept") - 1.0) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("r2") - 1.0) < 1e-12)
    assert(out(1).isNullAt(out(1).fieldIndex("slope")))
  }

  test("mantelHaenszel: matches the hand-computed classic 2-stratum case") {
    import spark.implicits._
    // stratum s1: a=10 b=5 c=4 d=8 (n=27); s2: a=6 b=6 c=3 d=9 (n=24)
    def rows(st: String, t: Boolean, s: Boolean, k: Int) =
      Seq.fill(k)((st, t, s))
    val df = (rows("s1", true, true, 10) ++ rows("s1", true, false, 5) ++
      rows("s1", false, true, 4) ++ rows("s1", false, false, 8) ++
      rows("s2", true, true, 6) ++ rows("s2", true, false, 6) ++
      rows("s2", false, true, 3) ++ rows("s2", false, false, 9))
      .toDF("st", "t", "s")
    val out = graft.ops.Evaluation
      .mantelHaenszel(df, col("t"), col("s"), Seq("st")).head
    val orMh = (10.0 * 8 / 27 + 6.0 * 9 / 24) /
      (5.0 * 4 / 27 + 6.0 * 3 / 24)
    assert(out.getAs[Long]("n") == 51L)
    assert(math.abs(out.getAs[Double]("or_mh") - orMh) < 1e-12)
    // chi2: sum(a - r1*c1/n) with r1=15,c1=14,n=27 and r1=12,c1=9,n=24
    val num = math.pow((10 - 15.0 * 14 / 27) + (6 - 12.0 * 9 / 24), 2)
    val den = 15.0 * 12 * 14 * 13 / (27.0 * 27 * 26) +
      12.0 * 12 * 9 * 15 / (24.0 * 24 * 23)
    assert(math.abs(out.getAs[Double]("chi2") - num / den) < 1e-12)
  }

  test("poissonRateTest: hand-computed rates and z") {
    import spark.implicits._
    // treated: 30 events / 10 days = 3.0; control: 10 / 10 = 1.0
    val df = Seq((true, 30.0, 10.0), (false, 10.0, 10.0))
      .toDF("t", "cnt", "days")
    val out = graft.ops.Evaluation
      .poissonRateTest(df, col("t"), col("cnt"), col("days")).head
    assert(out.getAs[Double]("rate_t") == 3.0)
    assert(out.getAs[Double]("rate_ratio") == 3.0)
    val z = 2.0 / math.sqrt(30.0 / 100 + 10.0 / 100)
    assert(math.abs(out.getAs[Double]("z") - z) < 1e-12)
  }

  test("missingnessCorrelation: perfect co-missing, independent, guards") {
    import spark.implicits._
    val rows = (1 to 40).map { i =>
      val coMiss = i % 4 == 0
      (if (coMiss) null else "a", if (coMiss) null else "b",
        if (i % 2 == 0) null else "c", "never")
    }
    val df = rows.toDF("p", "q", "r", "s")
    val out = graft.ops.Profiling
      .missingnessCorrelation(df, Seq("p", "q", "r", "s"))
      .collect().map(x =>
        (x.getString(0), x.getString(1)) -> x).toMap
    // p and q always miss together → φ = 1
    assert(math.abs(out(("p", "q")).getAs[Double]("phi") - 1.0) < 1e-12)
    // p misses only on multiples of 4 (all even) vs r on evens:
    //   not independent — φ = sqrt((1/4·1/2)/(3/4·1/2)) ≈ 0.577
    assert(math.abs(out(("p", "r")).getAs[Double]("phi") -
      math.sqrt(1.0 / 3)) < 1e-12)
    // s never missing → φ NULL
    assert(out(("p", "s")).isNullAt(
      out(("p", "s")).fieldIndex("phi")))
    assert(out(("p", "q")).getAs[Long]("both_null") == 10L)
  }

  test("saltedJoin result-equivalent to the plain join under skew") {
    import spark.implicits._
    val left = ((1 to 500).map(_ => ("hot", 1)) ++
      (1 to 20).map(i => (s"k$i", 2))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("hot", 11), ("k3", 12), ("zz", 13))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val salted = graft.ops.SkewAware
      .saltedJoin(left, right, Seq("k"), salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(salted == plain && plain.exists(_._1 == "hot"))
  }

  test("lDiversity and tCloseness: leaky class flagged, uniform clean") {
    import spark.implicits._
    // class A: sensitive always "x" (l=1, leaks); class B: x/y evenly
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "x"), ("B", "y"))
      .toDF("qi", "sv")
    val ld = graft.ops.Profiling
      .lDiversityProfile(df, Seq("qi"), "sv", riskL = 2)
      .orderBy("l").collect()
    assert(ld(0).getAs[Long]("l") == 1L &&
      ld(0).getAs[Boolean]("at_risk") &&
      ld(0).getAs[Double]("avg_entropy") == 0.0)
    assert(ld(1).getAs[Long]("l") == 2L &&
      !ld(1).getAs[Boolean]("at_risk") &&
      math.abs(ld(1).getAs[Double]("avg_entropy") - math.log(2)) < 1e-12)
    // global dist: x = 6/8, y = 2/8. TVD(A) = ½(|1−.75| + .25) = .25;
    // TVD(B) = ½(|.5−.75| + |.5−.25|) = .25
    val tc = graft.ops.Profiling
      .tClosenessProfile(df, Seq("qi"), "sv", t = 0.2).head
    assert(tc.getAs[Long]("n_classes") == 2L)
    assert(math.abs(tc.getAs[Double]("max_tvd") - 0.25) < 1e-12)
    assert(tc.getAs[Long]("classes_over") == 2L &&
      tc.getAs[Long]("rows_over") == 8L)
  }

  test("hashFeatures: dictionary path identical to map-only, incl. nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vals = Array("x", "y", "zz", "", null)
    val df = (1 to 300).map { i =>
      (i.toLong, vals(rnd.nextInt(vals.length)),
        vals(rnd.nextInt(vals.length)))
    }.toDF("id", "a", "b")
    def run(dict: Boolean) = graft.ops.Features
      .hashFeatures(df, Seq("a", "b"), 16, viaDictionary = dict)
      .select("id", "hashed").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(true) == run(false))
  }

  test("coarsenedExactMatch: hand ATT, unmatched strata dropped") {
    import spark.implicits._
    // stratum A: treated {10, 12}, control {8} → contrib 2·(11−8)=6
    // stratum B: treated {20}, control {14, 16} → contrib 1·(20−15)=5
    // stratum C: treated only → dropped
    val df = Seq(
      ("A", true, 10.0), ("A", true, 12.0), ("A", false, 8.0),
      ("B", true, 20.0), ("B", false, 14.0), ("B", false, 16.0),
      ("C", true, 99.0))
      .toDF("s", "t", "y")
    val out = graft.ops.Evaluation
      .coarsenedExactMatch(df, col("t"), "y", Seq("s")).head
    assert(out.getAs[Long]("n_strata") == 3L)
    assert(out.getAs[Long]("n_strata_matched") == 2L)
    assert(out.getAs[Long]("n_treated") == 4L)
    assert(out.getAs[Long]("n_treated_matched") == 3L)
    assert(out.getAs[Long]("n_control_matched") == 3L)
    assert(math.abs(out.getAs[Double]("att") - 11.0 / 3.0) < 1e-12)
  }

  test("ucbScores: hand-computed index, bonus shrinks with pulls") {
    import spark.implicits._
    val df = (Seq.fill(4)(("a", 1.0)) ++ Seq.fill(16)(("b", 0.0)))
      .toDF("arm", "r")
    val out = graft.ops.Evaluation.ucbScores(df, "arm", "r", c = 2.0)
      .orderBy("arm").collect()
    val n = 20.0
    assert(out(0).getAs[Long]("n_pulls") == 4L)
    assert(math.abs(out(0).getAs[Double]("ucb") -
      (1.0 + 2.0 * math.sqrt(math.log(n) / 4.0))) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("ucb") -
      2.0 * math.sqrt(math.log(n) / 16.0)) < 1e-12)
    // more pulls → smaller bonus
    assert(out(0).getAs[Double]("bonus") > out(1).getAs[Double]("bonus"))
  }

  test("cochranArmitage: perfect trend large z, flat trend z≈0") {
    import spark.implicits._
    def mk(ps: Seq[Double]) = ps.zipWithIndex.flatMap { case (p, i) =>
      val k = math.round(p * 100).toInt
      Seq.fill(k)((i, true)) ++ Seq.fill(100 - k)((i, false))
    }.toDF("dose", "y")
    val up = graft.ops.Evaluation
      .cochranArmitage(mk(Seq(0.1, 0.3, 0.5, 0.7)), col("dose"),
        col("y")).head
    assert(up.getAs[Double]("z") > 5.0)
    assert(math.abs(up.getAs[Double]("chi2") -
      math.pow(up.getAs[Double]("z"), 2)) < 1e-9)
    val flat = graft.ops.Evaluation
      .cochranArmitage(mk(Seq(0.4, 0.4, 0.4, 0.4)), col("dose"),
        col("y")).head
    assert(math.abs(flat.getAs[Double]("z")) < 1e-9)
  }

  test("fisherExact: matches the classic tea-tasting table") {
    import spark.implicits._
    // Fisher's lady-tasting-tea 2×2: a=3 b=1 c=1 d=3 →
    // two-sided p = 0.485714…, support k ∈ [0, 4]
    val rows = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val out = graft.ops.Evaluation
      .fisherExact(rows.toDF("t", "y"), col("t"), col("y")).head
    assert(out.getAs[Long]("a") == 3L && out.getAs[Long]("d") == 3L)
    assert(out.getAs[Long]("support") == 5L)
    assert(math.abs(out.getAs[Double]("p_two_sided") - 34.0 / 70.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("odds_ratio") - 9.0) < 1e-12)
  }

  test("fisherExact: fails loud beyond the support cap") {
    import spark.implicits._
    val big = (1 to 2000).map(i => (i % 2 == 0, i % 3 == 0))
      .toDF("t", "y")
    val e = intercept[Exception] {
      graft.ops.Evaluation
        .fisherExact(big, col("t"), col("y"), maxSupport = 100).head
    }
    assert(e.getMessage.contains("support exceeds") ||
      Option(e.getCause).exists(_.getMessage.contains("support exceeds")))
  }

  test("permutationTest: strong separation yields the minimal p") {
    import spark.implicits._
    // strong separation: treated ≡ 100, control ≡ 0 — no hash
    // reassignment reproduces a diff of 100 (both halves mix)
    val strong = (1 to 200)
      .map(i => (i.toLong, i <= 100, if (i <= 100) 100.0 else 0.0))
      .toDF("id", "t", "v")
    val s = graft.ops.Evaluation
      .permutationTest(strong, col("id"), col("t"), col("v"), reps = 99)
      .head
    assert(math.abs(s.getAs[Double]("obs_diff") - 100.0) < 1e-12)
    assert(s.getAs[Long]("n_ge") == 0L)
    assert(math.abs(s.getAs[Double]("p_value") - 0.01) < 1e-12)
  }

  test("isotonicCalibration: monotone output, pools violations") {
    import spark.implicits._
    // bins 0..3 raw means 0.2, 0.8, 0.4, 0.9 (n=10 each) — PAVA pools
    // bins 1,2 to 0.6; sequence becomes 0.2, 0.6, 0.6, 0.9
    def block(b: Int, p: Double) = {
      val k = math.round(p * 10).toInt
      Seq.fill(k)((b / 4.0 + 0.01, 1.0)) ++
        Seq.fill(10 - k)((b / 4.0 + 0.01, 0.0))
    }
    val df = (block(0, 0.2) ++ block(1, 0.8) ++ block(2, 0.4) ++
      block(3, 0.9)).toDF("s", "y")
    val out = graft.ops.Evaluation
      .isotonicCalibration(df, "s", "y", bins = 4)
      .orderBy("bin").collect()
    val fitted = out.map(_.getAs[Double]("fitted"))
    assert(fitted.sliding(2).forall(p => p(0) <= p(1) + 1e-12))
    assert(math.abs(fitted(0) - 0.2) < 1e-12)
    assert(math.abs(fitted(1) - 0.6) < 1e-12)
    assert(math.abs(fitted(2) - 0.6) < 1e-12)
    assert(math.abs(fitted(3) - 0.9) < 1e-12)
    // raw means preserved
    assert(math.abs(out(2).getAs[Double]("raw_mean") - 0.4) < 1e-12)
  }

  test("hits: star graph — center is the hub, leaves authorities") {
    import spark.implicits._
    val e = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"), ("l1", "l2"))
      .toDF("s", "d")
    val out = graft.ops.Graph.hits(e, "s", "d", iterations = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("hub"), r.getAs[Double]("authority"))).toMap
    // center has the dominant hub score, no in-edges → authority 0
    assert(out("c")._1 > out("l1")._1 && out("c")._2 == 0.0)
    // l2 (two in-edges) outranks l3 (one) on authority
    assert(out("l2")._2 > out("l3")._2 && out("l3")._2 > 0.0)
    // L2 norms are 1
    val ah = out.values.map(v => v._1 * v._1).sum
    val aa = out.values.map(v => v._2 * v._2).sum
    assert(math.abs(ah - 1.0) < 1e-9 && math.abs(aa - 1.0) < 1e-9)
  }

  test("nelsonAalen: hand-computed hazard with censoring") {
    import spark.implicits._
    // durations: 1(event), 2(censored), 3(event), 3(event), 5(censored)
    // t=1: n=5, d=1 → H=0.2; t=3: n=3, d=2 → H=0.2+2/3
    val df = Seq((1, 1), (2, 0), (3, 1), (3, 1), (5, 0)).toDF("dur", "ev")
    val out = graft.analysis.AnalysisPlanner.nelsonAalen(df, "dur", "ev")
      .orderBy("duration").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("duration") == 1.0 &&
      out(0).getAs[Long]("n_risk") == 5L)
    assert(math.abs(out(0).getAs[Double]("cum_hazard") - 0.2) < 1e-12)
    assert(out(1).getAs[Long]("n_risk") == 3L &&
      out(1).getAs[Long]("n_event") == 2L)
    assert(math.abs(out(1).getAs[Double]("cum_hazard") -
      (0.2 + 2.0 / 3.0)) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("var_hazard") -
      (1.0 / 25.0 + 2.0 / 9.0)) < 1e-12)
  }

  test("readability: longer words and sentences lower flesch") {
    import spark.implicits._
    val df = Seq(
      (1L, "The cat sat. The dog ran."),
      (2L, "Incomprehensibly multisyllabic terminology perpetually " +
        "obfuscates understanding consistently throughout documentation."))
      .toDF("id", "text")
    val out = graft.ops.TextAnalysis.readability(df, "text")
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_words") == 6L)
    assert(out(0).getAs[Long]("n_sentences") == 2L)
    assert(out(0).getAs[Double]("flesch") > out(1).getAs[Double]("flesch"))
    assert(out(1).getAs[Double]("fk_grade") >
      out(0).getAs[Double]("fk_grade"))
  }

  test("andersonDarling: identical samples ⇒ small A², shifted large") {
    import spark.implicits._
    val same = ((1 to 200).map(i => (i % 20, true)) ++
      (1 to 200).map(i => (i % 20, false))).toDF("v", "t")
    val a0 = graft.analysis.AnalysisPlanner
      .andersonDarling(same, "v", col("t")).head
    assert(a0.getAs[Long]("n_a") == 200L && a0.getAs[Long]("n_b") == 200L)
    // perfectly matched empirical CDFs → statistic exactly 0
    assert(math.abs(a0.getAs[Double]("a2")) < 1e-12)
    val shifted = ((1 to 200).map(i => (i % 20, true)) ++
      (1 to 200).map(i => (i % 20 + 15, false))).toDF("v", "t")
    val a1 = graft.analysis.AnalysisPlanner
      .andersonDarling(shifted, "v", col("t")).head
    assert(a1.getAs[Double]("a2") > 10.0)
  }

  test("fleissKappa: perfect agreement 1, hand-computed mixed case") {
    import spark.implicits._
    val perfect = Seq((1, "a"), (1, "a"), (1, "a"), (2, "b"), (2, "b"),
      (2, "b")).toDF("item", "cat")
    val p = graft.ops.Evaluation.fleissKappa(perfect, "item", "cat").head
    assert(p.getAs[Double]("p_observed") == 1.0)
    assert(math.abs(p.getAs[Double]("kappa") - 1.0) < 1e-12)
    // 2 items × 2 ratings: item1 {a,a} (P=1), item2 {a,b} (P=0) →
    // P̄=0.5; marginals a=3/4, b=1/4 → Pe=0.625; κ=(0.5−0.625)/0.375
    val mixed = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"))
      .toDF("item", "cat")
    val m = graft.ops.Evaluation.fleissKappa(mixed, "item", "cat").head
    assert(math.abs(m.getAs[Double]("p_observed") - 0.5) < 1e-12)
    assert(math.abs(m.getAs[Double]("p_expected") - 0.625) < 1e-12)
    assert(math.abs(m.getAs[Double]("kappa") - (-1.0 / 3.0)) < 1e-12)
    // singleton items are excluded
    val withSingleton = mixed.union(Seq((3, "c")).toDF("item", "cat"))
    val w = graft.ops.Evaluation
      .fleissKappa(withSingleton, "item", "cat").head
    assert(w.getAs[Long]("n_items") == 2L &&
      w.getAs[Long]("n_ratings") == 4L)
  }

  test("chao1Richness: hand f1/f2, complete coverage when no singletons") {
    import spark.implicits._
    // a×1, b×1, c×2, d×3 → D=4, n=7, f1=2, f2=1,
    // chao1 = 4 + 2·1/(2·2) = 4.5, coverage = 1 − 2/7
    val df = Seq("a", "b", "c", "c", "d", "d", "d").toDF("k")
    val out = graft.ops.Profiling.chao1Richness(df, "k").head
    assert(out.getAs[Long]("observed") == 4L)
    assert(out.getAs[Long]("f1") == 2L && out.getAs[Long]("f2") == 1L)
    assert(math.abs(out.getAs[Double]("chao1") - 4.5) < 1e-12)
    assert(math.abs(out.getAs[Double]("coverage") - 5.0 / 7.0) < 1e-12)
    val full = Seq("a", "a", "b", "b").toDF("k")
    val f = graft.ops.Profiling.chao1Richness(full, "k").head
    assert(f.getAs[Double]("chao1") == 2.0 &&
      f.getAs[Double]("coverage") == 1.0)
  }

  test("pairwiseContrasts: hand Welch z, all pairs present") {
    import spark.implicits._
    val df = (Seq.fill(50)(("a", 10.0)) ++ Seq.fill(50)(("a", 14.0)) ++
      Seq.fill(50)(("b", 20.0)) ++ Seq.fill(50)(("b", 26.0)) ++
      Seq.fill(100)(("c", 17.0))).toDF("g", "v")
    val out = graft.ops.Evaluation.pairwiseContrasts(df, "g", "v")
      .orderBy("group_a", "group_b").collect()
    assert(out.length == 3)
    val ab = out(0)
    assert(ab.getAs[String]("group_a") == "a" &&
      ab.getAs[String]("group_b") == "b")
    assert(math.abs(ab.getAs[Double]("mean_diff") - (-11.0)) < 1e-9)
    // var a = 4.040…, var b = 9.090… (sample) → z by hand
    val s2a = 100 * 4.0 / 99.0; val s2b = 100 * 9.0 / 99.0
    val z = -11.0 / math.sqrt(s2a / 100 + s2b / 100)
    assert(math.abs(ab.getAs[Double]("z") - z) < 1e-9)
    // degenerate variance group c: z vs c is finite (other side's var)
    assert(out.forall(r => !r.getAs[Double]("mean_diff").isNaN))
  }

  test("bayesianAbTest: hand closed form, symmetry sums to 1") {
    import spark.implicits._
    // A: 1/1 success; B: 0/1 → αA=2 βA=1 αB=1 βB=2 → P(B>A) = 1/6
    val tiny = Seq((true, true), (false, false)).toDF("t", "y")
    val p = graft.ops.Evaluation
      .bayesianAbTest(tiny, col("t"), col("y")).head
    assert(math.abs(p.getAs[Double]("prob_b_gt_a") - 1.0 / 6.0) < 1e-12)
    // complementary direction: P(A>B) with arms swapped = 1 − 1/6
    // (Beta posteriors are continuous, ties have measure 0)
    val q = graft.ops.Evaluation
      .bayesianAbTest(tiny, !col("t"), col("y")).head
    assert(math.abs(p.getAs[Double]("prob_b_gt_a") +
      q.getAs[Double]("prob_b_gt_a") - 1.0) < 1e-9)
    // a clearly better B → probability near 1
    val strong = ((1 to 100).map(i => (true, i <= 10)) ++
      (1 to 100).map(i => (false, i <= 60))).toDF("t", "y")
    val w = graft.ops.Evaluation
      .bayesianAbTest(strong, col("t"), col("y")).head
    assert(w.getAs[Double]("prob_b_gt_a") > 0.9999)
  }

  test("gTest: independent ⇒ g≈0, dependent large, hand dof") {
    import spark.implicits._
    val indep = (for (r <- Seq("a", "b"); c <- Seq("x", "y", "z");
      _ <- 1 to 10) yield (r, c)).toDF("r", "c")
    val gi = graft.ops.Evaluation.gTest(indep, "r", "c").head
    assert(gi.getAs[Long]("n") == 60L && gi.getAs[Long]("dof") == 2L)
    assert(math.abs(gi.getAs[Double]("g")) < 1e-9)
    val dep = (Seq.fill(30)(("a", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("r", "c")
    val gd = graft.ops.Evaluation.gTest(dep, "r", "c").head
    // perfect association: G = 2N ln 2
    assert(math.abs(gd.getAs[Double]("g") - 2 * 60 * math.log(2)) < 1e-9)
  }

  test("empiricalBayesRate: low-count keys shrink harder") {
    import spark.implicits._
    // many keys with varied rates; key "lo" has 2 trials, "hi" has 200
    val rnd = new scala.util.Random(7)
    val bg = (1 to 50).flatMap { k =>
      (1 to 20).map(i => (s"k$k", i <= (k % 11)))
    }
    val df = (bg ++ Seq(("lo", true), ("lo", true)) ++
      (1 to 200).map(i => ("hi", i <= 200))).toDF("key", "y")
    val out = graft.ops.Features
      .empiricalBayesRate(df, "key", col("y"))
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Double]("raw_rate"), r.getAs[Double]("shrunk_rate"),
          r.getAs[Double]("prior_rate"))).toMap
    val (loRaw, loShrunk, prior) = out("lo")
    val (hiRaw, hiShrunk, _) = out("hi")
    assert(loRaw == 1.0 && hiRaw == 1.0)
    // both raw rates are 1.0; the 2-trial key is pulled much closer
    // to the prior than the 200-trial key
    assert(loShrunk < hiShrunk && hiShrunk < 1.0)
    assert((1.0 - loShrunk) > 10 * (1.0 - hiShrunk))
    assert(prior > 0 && prior < 1)
  }

  test("centroidSimilarity: identical segs cos 1, orthogonal cos 0") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0, 0.0)), ("a", Seq(3.0, 0.0)),
      ("b", Seq(2.0, 0.0)),
      ("c", Seq(0.0, 5.0))).toDF("seg", "v")
    val out = graft.ops.Similarity.centroidSimilarity(df, "seg", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("cosine")).toMap
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(out(("a", "c"))) < 1e-12)
    assert(math.abs(out(("b", "c"))) < 1e-12)
  }

  test("subgroupScan: planted hot slice ranks first, cold slices 0") {
    import spark.implicits._
    // seg1=h rows are 90% positive; everything else ~10%
    val df = ((1 to 100).map(i => (if (i <= 90) true else false, "h",
      s"u${i % 3}")) ++
      (1 to 400).map(i => (i <= 40, "c", s"u${i % 3}")))
      .toDF("y", "s1", "s2")
    val out = graft.ops.Profiling
      .subgroupScan(df, col("y"), Seq("s1", "s2"), topK = 10)
      .collect()
    assert(out.head.getAs[String]("segment") == "s1" &&
      out.head.getAs[String]("value") == "h")
    assert(out.head.getAs[Double]("llr") > 50.0)
    // below-base slices score exactly 0
    val cold = out.find(r => r.getAs[String]("value") == "c").get
    assert(cold.getAs[Double]("llr") == 0.0)
  }

  test("itemSimilarity: symmetric cosine, cap excludes none here") {
    import spark.implicits._
    // baskets: {1,2,3}, {1,2}, {1,3}, {2,3} → each pair co-occurs 2×,
    // each item in 3 baskets → cosine 2/3 for every pair
    val df = Seq((10, 1), (10, 2), (10, 3), (11, 1), (11, 2),
      (12, 1), (12, 3), (13, 2), (13, 3)).toDF("bk", "it")
    val out = graft.ops.Associations
      .itemSimilarity(df, "bk", "it", minPairCount = 2, topK = 5)
      .collect()
    assert(out.length == 6) // 3 items × 2 neighbors
    assert(out.forall(r =>
      math.abs(r.getAs[Double]("cosine") - 2.0 / 3.0) < 1e-12))
    // symmetry: (1,2) and (2,1) both present with equal n_pair
    val m = out.map(r => (r.getAs[Int]("item"),
      r.getAs[Int]("neighbor")) -> r.getAs[Long]("n_pair")).toMap
    assert(m((1, 2)) == 2L && m((2, 1)) == 2L)
  }

  test("reportCard: hand corpus metrics") {
    import spark.implicits._
    val df = Seq((1L, "the cat", "en", "a"), (2L, "the cat", "en", "a"),
      (3L, "le chat", "fr", "b")).toDF("id", "text", "lang", "src")
    val out = graft.ops.CorpusPipeline
      .reportCard(df, "id", "text", "lang", "src")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("docs") == 3.0 && out("tokens") == 6.0)
    assert(math.abs(out("dup_text_rate") - 1.0 / 3) < 1e-12)
    assert(out("vocab_size") == 4.0) // the, cat, le, chat
    // H(2/3, 1/3) bits
    val h = -(2.0 / 3 * math.log(2.0 / 3) / math.log(2) +
      1.0 / 3 * math.log(1.0 / 3) / math.log(2))
    assert(math.abs(out("lang_entropy_bits") - h) < 1e-12)
    assert(math.abs(out("top_source_share") - 2.0 / 3) < 1e-12)
  }

  test("sourceVocabularyOverlap: hand Jaccard, self-pairs excluded") {
    import spark.implicits._
    val df = Seq(("s1", "the cat sat"), ("s1", "the dog"),
      ("s2", "the cat ran"), ("s3", "zebra")).toDF("src", "text")
    val out = graft.ops.TextAnalysis
      .sourceVocabularyOverlap(df, "src", "text")
      .collect().map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r).toMap
    // s1 = {the,cat,sat,dog}, s2 = {the,cat,ran} → 2/5
    val p = out(("s1", "s2"))
    assert(p.getAs[Long]("vocab_a") == 4 && p.getAs[Long]("vocab_b") == 3)
    assert(p.getAs[Long]("common") == 2)
    assert(math.abs(p.getAs[Double]("jaccard") - 0.4) < 1e-12)
    assert(!out.contains(("s1", "s3"))) // disjoint pairs absent
  }

  test("hillTailIndex: Pareto-ish grid recovers its exponent roughly") {
    import spark.implicits._
    // deterministic Pareto(α=2) quantile grid: x = (1−u)^(−1/2)
    val xs = (1 to 5000).map(i => math.pow(i / 5001.0, -0.5))
    val r = graft.ops.Profiling
      .hillTailIndex(xs.toDF("x"), "x", k = 200).head
    assert(r.getAs[Long]("k") == 200)
    assert(math.abs(r.getAs[Double]("hill_alpha") - 2.0) < 0.3,
      s"alpha ${r.getAs[Double]("hill_alpha")}")
  }

  test("crossSourceDuplicates: planted copy ratios") {
    import spark.implicits._
    val df = Seq(("a", "t1"), ("a", "t2"), ("a", "t3"), ("a", "t3"),
      ("b", "t1"), ("b", "t2"), ("c", "zzz")).toDF("src", "text")
    val out = graft.ops.Dedup.crossSourceDuplicates(df, "src", "text")
      .collect()
    assert(out.length == 1) // only (a, b) share anything
    val p = out.head
    assert(p.getAs[String]("source_a") == "a" &&
      p.getAs[String]("source_b") == "b")
    assert(p.getAs[Long]("docs_a") == 3) // distinct texts, dup collapsed
    assert(p.getAs[Long]("shared_texts") == 2)
    assert(math.abs(p.getAs[Double]("overlap_b") - 1.0) < 1e-12)
  }

  test("embeddingDimensionHealth: collapsed dim flagged, shares sum to 1") {
    import spark.implicits._
    val df = (1 to 50).map(i =>
      Tuple1(Seq(i.toDouble, 7.0, (i % 3).toDouble))).toDF("v")
    val out = graft.ops.Features.embeddingDimensionHealth(df, "v")
      .collect().map(r => r.getAs[Int]("dim") -> r).toMap
    assert(out(1).getAs[Boolean]("collapsed")) // constant dimension
    assert(!out(0).getAs[Boolean]("collapsed"))
    assert(math.abs(out(1).getAs[Double]("mean") - 7.0) < 1e-12)
    val shares = out.values.map(_.getAs[Double]("var_share")).sum
    assert(math.abs(shares - 1.0) < 1e-12)
  }

  test("majorityVote: plurality with deterministic tie-break") {
    import spark.implicits._
    val df = Seq((1, 10, "x"), (1, 11, "x"), (1, 12, "y"),
      (2, 10, "y"), (2, 11, "x")).toDF("item", "rater", "lbl")
    val out = graft.ops.Labeling.majorityVote(df, "item", "rater", "lbl")
      .collect().map(r => r.getAs[Int]("item") -> r).toMap
    assert(out(1).getAs[String]("label") == "x")
    assert(out(1).getAs[Long]("n_votes") == 2)
    assert(math.abs(out(1).getAs[Double]("vote_share") - 2.0 / 3) < 1e-12)
    // tie on item 2 → label ascending wins
    assert(out(2).getAs[String]("label") == "x")
  }

  test("dawidSkene: unreliable rater identified, truth recovered") {
    import spark.implicits._
    // r1, r2 always report the truth; r3 is wrong except every 5th item
    val rows = (1 to 30).flatMap { i =>
      val truth = if (i % 2 == 0) "a" else "b"
      val flip = if (truth == "a") "b" else "a"
      Seq((i, 1, truth), (i, 2, truth),
        (i, 3, if (i % 5 == 0) truth else flip))
    }
    val ds = graft.ops.Labeling.dawidSkene(rows.toDF("item", "r", "lbl"),
      "item", "r", "lbl", iterations = 3)
    val labels = ds.items.collect()
      .map(r => r.getAs[Int]("item") -> r.getAs[String]("label")).toMap
    assert((1 to 30).forall(i =>
      labels(i) == (if (i % 2 == 0) "a" else "b")))
    val acc = ds.raters.collect()
      .map(r => r.getAs[Int]("rater") -> r.getAs[Double]("accuracy"))
      .toMap
    assert(acc(1) > 0.9 && acc(2) > 0.9)
    assert(acc(3) < 0.4, s"liar accuracy ${acc(3)}")
    // posteriors near-certain with two honest raters
    assert(ds.items.agg(min(col("posterior"))).head.getDouble(0) > 0.9)
  }

  test("cramerVonMises: identical samples 0, disjoint shift by hand") {
    import spark.implicits._
    val same = ((1 to 10).map(i => (true, i.toDouble)) ++
      (1 to 10).map(i => (false, i.toDouble))).toDF("t", "v")
    val s0 = graft.analysis.AnalysisPlanner
      .cramerVonMises(same, "v", col("t")).head
    assert(math.abs(s0.getAs[Double]("cvm_stat")) < 1e-12)
    // a = 1..10, b = 101..110: T = (100/400)·(3.85 + 2.85) = 1.675
    val shift = ((1 to 10).map(i => (true, i.toDouble)) ++
      (1 to 10).map(i => (false, 100.0 + i))).toDF("t", "v")
    val s1 = graft.analysis.AnalysisPlanner
      .cramerVonMises(shift, "v", col("t")).head
    assert(s1.getAs[Long]("n_a") == 10 && s1.getAs[Long]("n_b") == 10)
    assert(math.abs(s1.getAs[Double]("cvm_stat") - 1.675) < 1e-12)
  }

  test("dunnTest: hand two-group z, mean ranks") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", 100.0 + i))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.dunnTest(df, "g", "v").head
    assert(r.getAs[String]("group_a") == "a")
    assert(math.abs(r.getAs[Double]("mean_rank_a") - 5.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_rank_b") - 15.5) < 1e-12)
    // V = 20·21/12 = 35; z = −10/√(35·(1/10+1/10)) = −10/√7
    assert(math.abs(r.getAs[Double]("z") + 10.0 / math.sqrt(7)) < 1e-12)
  }

  test("huberRegression: gross outlier barely moves the robust fit") {
    import spark.implicits._
    // outlier at the far end of x so it torques the OLS slope (an
    // outlier at mean-x would only shift the intercept)
    val clean = (0 to 20).map(i => (i.toDouble, 2.0 * i + 1))
    val df = (clean :+ ((20.0, 1000.0))).toDF("x", "y")
    val hub = graft.ops.Regression
      .huberRegression(df, Seq("x"), "y", delta = 2.0, iterations = 6)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("coef")).toMap
    assert(math.abs(hub("x") - 2.0) < 0.1, s"huber slope ${hub("x")}")
    // plain OLS on the same data is pulled far off by the outlier
    val ols = graft.ops.Regression.linearRegression(df, Seq("x"), "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("coef")).toMap
    assert(math.abs(ols("x") - 2.0) > 0.5)
  }

  test("partialCorrelation: shared driver explains the raw correlation") {
    import spark.implicits._
    // x and y both ride z; given z they are (nearly) independent
    val df = (1 to 700).map { i =>
      val z = (i % 10).toDouble
      val a = ((i / 10) % 7).toDouble
      val b = ((i / 70) % 5).toDouble
      (z + a, z + b, z)
    }.toDF("x", "y", "z")
    val r = graft.analysis.AnalysisPlanner
      .partialCorrelationMulti(df, "x", "y", Seq("z")).head
    assert(r.getAs[Double]("r_xy") > 0.4)
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) < 0.1)
    assert(r.getAs[Long]("n") == 700)
  }

  test("kruskalWallis: hand two-group shift, no ties") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", 100.0 + i))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.kruskalWallis(df, "g", "v")
      .head
    assert(r.getAs[Long]("n") == 20 && r.getAs[Long]("n_groups") == 2)
    // ranks 1..20: H = 12/(20·21)·(55²/10 + 155²/10) − 3·21 = 100/7
    assert(math.abs(r.getAs[Double]("h") - 100.0 / 7) < 1e-9)
    assert(math.abs(r.getAs[Double]("h_corrected") - 100.0 / 7) < 1e-9)
  }

  test("gaussianMixture1D: well-separated modes recovered") {
    import spark.implicits._
    // two tight clusters at 0 and 100, 40/60 mix
    val xs = (1 to 40).map(i => (i % 5) * 0.1) ++
      (1 to 60).map(i => 100.0 + (i % 5) * 0.1)
    val out = graft.ops.Regression
      .gaussianMixture1D(xs.toDF("x"), "x", iterations = 6)
      .collect().map(r => r.getAs[Int]("component") -> r).toMap
    val c1 = out(1); val c2 = out(2)
    assert(math.abs(c1.getAs[Double]("mean") - 0.2) < 0.05)
    assert(math.abs(c2.getAs[Double]("mean") - 100.2) < 0.05)
    assert(math.abs(c1.getAs[Double]("weight") - 0.4) < 0.02)
    assert(math.abs(c2.getAs[Double]("weight") - 0.6) < 0.02)
    assert(c1.getAs[Long]("n") == 100)
    // weights always sum to 1
    assert(math.abs(c1.getAs[Double]("weight") +
      c2.getAs[Double]("weight") - 1.0) < 1e-12)
  }

  test("completenessTrend: per-period null rates, one pass") {
    import spark.implicits._
    val df = Seq((1, Some(1.0), Some("a")), (1, None, Some("b")),
      (2, None, None), (2, None, Some("c"))).toDF("p", "x", "s")
    val out = graft.ops.Profiling
      .completenessTrend(df, col("p"), Seq("x", "s"))
      .collect()
      .map(r => (r.getAs[Int]("period"), r.getAs[String]("column")) ->
        (r.getAs[Long]("n_null"), r.getAs[Double]("null_rate"))).toMap
    assert(out((1, "x")) == (1L, 0.5))
    assert(out((1, "s")) == (0L, 0.0))
    assert(out((2, "x")) == (2L, 1.0))
    assert(out((2, "s")) == (1L, 0.5))
  }

  test("brierDecomposition: calibrated forecast has zero reliability") {
    import spark.implicits._
    // score .5: 1 of 2 positive; score .75: 3 of 4 → perfectly
    // calibrated: REL = 0 and Brier = UNC − RES exactly
    val df = Seq((0.5, true), (0.5, false),
      (0.75, true), (0.75, true), (0.75, true), (0.75, false))
      .toDF("s", "y")
    val r = graft.ops.Evaluation
      .brierDecomposition(df, col("y"), col("s")).head
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_scores") == 2)
    assert(math.abs(r.getAs[Double]("reliability")) < 1e-12)
    val base = 4.0 / 6
    assert(math.abs(r.getAs[Double]("uncertainty") - base * (1 - base))
      < 1e-12)
    assert(math.abs(r.getAs[Double]("brier") -
      (r.getAs[Double]("uncertainty") - r.getAs[Double]("resolution")))
      < 1e-12)
    // identity check against the direct mean squared error
    val direct = df.select(avg(pow(col("s") -
      when(col("y"), 1.0).otherwise(0.0), 2.0))).head.getDouble(0)
    assert(math.abs(r.getAs[Double]("brier") - direct) < 1e-12)
  }

  test("mahalanobisOutliers: joint outlier beats marginal z-scores") {
    import spark.implicits._
    // strongly correlated cloud + one point off the diagonal that is
    // unremarkable per-coordinate but far outside the joint ellipsoid
    val cloud = (1 to 60).map { i =>
      val x = (i % 11).toDouble
      (i, x, 2 * x + (if (i % 2 == 0) 0.3 else -0.3))
    }
    val df = (cloud :+ ((99, 5.0, 2.0))).toDF("id", "a", "b")
    val out = graft.ops.Profiling
      .mahalanobisOutliers(df, Seq("a", "b"), threshold = 13.8)
      .collect().map(r => r.getAs[Int]("id") ->
        (r.getAs[Double]("mahalanobis2"), r.getAs[Boolean]("outlier")))
      .toMap
    val planted = out(99)
    assert(planted._2, s"planted joint outlier not flagged: $planted")
    assert(cloud.count { case (i, _, _) => out(i)._2 } == 0)
    assert(planted._1 > cloud.map(c => out(c._1)._1).max * 3)
  }

  test("rakeWeights: both margins converge to targets; balanced stays 1") {
    import spark.implicits._
    val rows = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(30)(("a1", "b2")) ++
      Seq.fill(30)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val df = rows.toDF("x", "z")
    val ta = Seq(("a1", 0.5), ("a2", 0.5)).toDF("v", "s")
    val tb = Seq(("b1", 0.5), ("b2", 0.5)).toDF("v", "s")
    val w = graft.ops.Sampling
      .rakeWeights(df, "x", "z", ta, tb, iterations = 10)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("weight"))).toMap
    def margin(f: ((String, String)) => String, v: String) =
      w.filter(kv => f(kv._1) == v).values.map(t => t._1 * t._2).sum
    assert(math.abs(margin(_._1, "a1") - 50.0) < 1e-6)
    assert(math.abs(margin(_._1, "a2") - 50.0) < 1e-6)
    assert(math.abs(margin(_._2, "b1") - 50.0) < 1e-6)
    assert(math.abs(margin(_._2, "b2") - 50.0) < 1e-6)
    // already-balanced corpus: every weight stays exactly 1
    val bal = (Seq.fill(25)(("a1", "b1")) ++ Seq.fill(25)(("a1", "b2")) ++
      Seq.fill(25)(("a2", "b1")) ++ Seq.fill(25)(("a2", "b2")))
      .toDF("x", "z")
    val wb = graft.ops.Sampling
      .rakeWeights(bal, "x", "z", ta, tb, iterations = 3)
      .collect()
    assert(wb.forall(r => math.abs(r.getAs[Double]("weight") - 1.0)
      < 1e-12))
  }

  test("leakageScan: planted leak flags at 1.0, honest feature doesn't") {
    import spark.implicits._
    val df = (1 to 100).map { i =>
      val y = i % 3 == 0
      // leak = y exactly; honest = independent of y
      (y, if (y) 1.0 else 0.0, (i % 7).toDouble)
    }.toDF("y", "leak", "honest")
    val out = graft.ops.Profiling
      .leakageScan(df, col("y"), Seq("leak", "honest"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(out("leak").getAs[Double]("separation") == 1.0)
    assert(out("leak").getAs[Boolean]("leaky"))
    assert(out("honest").getAs[Double]("separation") < 0.7)
    assert(!out("honest").getAs[Boolean]("leaky"))
  }

  test("qiniCurve: hand 4-unit curve, AUUC by rollup") {
    import spark.implicits._
    val df = Seq((2.0, true, true), (2.0, false, false),
      (1.0, true, false), (1.0, false, true)).toDF("s", "t", "y")
    val out = graft.ops.Evaluation
      .qiniCurve(df, col("t"), col("y"), "s")
      .collect().map(r => r.getAs[Double]("score") -> r).toMap
    val top = out(2.0)
    assert(top.getAs[Double]("frac") == 0.5)
    assert(top.getAs[Long]("cum_treated") == 1 &&
      top.getAs[Long]("cum_control") == 1)
    assert(math.abs(top.getAs[Double]("qini") - 1.0) < 1e-12)
    val bot = out(1.0)
    assert(bot.getAs[Double]("frac") == 1.0)
    assert(math.abs(bot.getAs[Double]("qini")) < 1e-12)
    val auuc = out.values.map(r => r.getAs[Double]("qini") *
      r.getAs[Double]("d_frac")).sum
    assert(math.abs(auuc - 0.5) < 1e-12)
  }

  test("fellegiSunter: hand weights, decisions, cross-block excluded") {
    import spark.implicits._
    val df = Seq(
      (1, "b1", "x", 10), (2, "b1", "x", 10), // full agreement
      (3, "b1", "y", 99),                     // disagrees with both
      (4, "b2", "x", 10)                      // other block: never paired
    ).toDF("id", "blk", "fa", "fb")
    val out = graft.ops.Dedup.fellegiSunter(df, "id", "blk",
      Seq(("fa", 0.9, 0.1), ("fb", 0.8, 0.2)), upper = 2.0,
      lower = 0.0).collect()
    assert(out.length == 3) // pairs within b1 only
    val m = out.map(r => (r.getAs[Int]("id_a"), r.getAs[Int]("id_b")) -> r)
      .toMap
    val agree = math.log(9.0) / math.log(2) + math.log(4.0) / math.log(2)
    val disagree = math.log(1.0 / 9) / math.log(2) +
      math.log(0.2 / 0.8) / math.log(2)
    assert(math.abs(m((1, 2)).getAs[Double]("weight") - agree) < 1e-12)
    assert(m((1, 2)).getAs[String]("decision") == "match")
    assert(m((1, 2)).getAs[Long]("n_agree") == 2)
    assert(math.abs(m((1, 3)).getAs[Double]("weight") - disagree) < 1e-12)
    assert(m((1, 3)).getAs[String]("decision") == "non_match")
    assert(!m.contains((1, 4)) && !m.contains((2, 4)))
  }

  test("bpeEncode: merges shrink token counts exactly as replayed") {
    import spark.implicits._
    val docs = Seq((1L, "the the the cat"), (2L, "then")).toDF("id", "t")
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, "t", merges = 2)
    val out = graft.ops.TextAnalysis.bpeEncode(docs, "id", "t", merges)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // corpus: the×3, cat, then → top pair <t><h> (4), then <th><e> (4)
    // doc1: "the"→1 token ×3 + "cat"→3 → 6; base = 3·3+3 = 12
    assert(out(1L).getAs[Long]("n_words") == 4)
    assert(out(1L).getAs[Long]("n_tokens_base") == 12)
    assert(out(1L).getAs[Long]("n_tokens_bpe") == 6)
    assert(math.abs(out(1L).getAs[Double]("compression") - 2.0) < 1e-12)
    // doc2: "then" → <the><n> = 2 tokens, base 4
    assert(out(2L).getAs[Long]("n_tokens_bpe") == 2)
  }

  test("binaryLogOdds: sign agrees with score argmax; non-binary rejected") {
    import spark.implicits._
    val train = Seq((1, "x", "p"), (2, "x", "p"), (3, "y", "q"),
      (4, "y", "q"), (5, "x", "p"), (6, "y", "q")).toDF("id", "f", "lbl")
    val m = graft.ops.NaiveBayes.fit(train, Seq("f"), "lbl")
    val test = Seq((10, "x"), (11, "y")).toDF("id", "f")
    val odds = graft.ops.NaiveBayes
      .binaryLogOdds(test, m, Seq("f"), Seq("id"), "p")
      .collect().map(r => r.getAs[Int]("id") ->
        r.getAs[Double]("log_odds")).toMap
    val preds = graft.ops.NaiveBayes
      .score(test, m, Seq("f"), Seq("id"))
      .collect().map(r => r.getAs[Int]("id") ->
        r.getAs[String]("pred_label")).toMap
    assert(odds(10) > 0 && preds(10) == "p")
    assert(odds(11) < 0 && preds(11) == "q")
    val tri = train.withColumn("lbl",
      when(col("id") === 1, "r").otherwise(col("lbl")))
    val m3 = graft.ops.NaiveBayes.fit(tri, Seq("f"), "lbl")
    intercept[IllegalArgumentException] {
      graft.ops.NaiveBayes
        .binaryLogOdds(test, m3, Seq("f"), Seq("id"), "p")
    }
  }

  test("classifierTwoSampleTest: planted drift detected, none ≈ 0.5") {
    import spark.implicits._
    // drifted: feature value perfectly separates the halves
    val drift = (1 to 400).map(i =>
      (i, i <= 200, if (i <= 200) "u" else "v")).toDF("id", "m", "f")
    val a = graft.ops.Evaluation
      .classifierTwoSampleTest(drift, col("m"), Seq("f"), Seq("id"))
      .head
    assert(a.getAs[Double]("auc") > 0.95)
    assert(a.getAs[Long]("n_train") + a.getAs[Long]("n") == 400)
    // identical distributions: feature independent of membership
    val same = (1 to 400).map(i =>
      (i, i <= 200, if (i % 2 == 0) "u" else "v")).toDF("id", "m", "f")
    val b = graft.ops.Evaluation
      .classifierTwoSampleTest(same, col("m"), Seq("f"), Seq("id"))
      .head
    assert(math.abs(b.getAs[Double]("auc") - 0.5) < 0.12)
  }

  test("cronbachAlpha: duplicated item gives 1, anti-correlated NULL") {
    import spark.implicits._
    val dup = Seq((1.0, 1.0), (2.0, 2.0), (5.0, 5.0), (9.0, 9.0))
      .toDF("a", "b")
    val r = graft.ops.Evaluation.cronbachAlpha(dup, Seq("a", "b")).head
    assert(r.getAs[Int]("k") == 2 && r.getAs[Long]("n") == 4)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0) < 1e-12)
    // total = a + (−a) is constant → zero total variance → NULL alpha
    val anti = Seq((1.0, -1.0), (2.0, -2.0), (3.0, -3.0)).toDF("a", "b")
    val r2 = graft.ops.Evaluation.cronbachAlpha(anti, Seq("a", "b")).head
    assert(r2.isNullAt(r2.fieldIndex("alpha")))
  }

  test("ratioMetric: constant denominator degenerates to mean ± se") {
    import spark.implicits._
    val df = Seq(("t", 1.0, 1.0), ("t", 2.0, 1.0), ("t", 3.0, 1.0),
      ("t", 6.0, 1.0)).toDF("arm", "x", "y")
    val r = graft.ops.Evaluation.ratioMetric(df, "arm", "x", "y").head
    assert(math.abs(r.getAs[Double]("ratio") - 3.0) < 1e-12)
    // vy = 0, cov = 0, ȳ = 1 → se = sqrt(vx/n) = sqrt((14/3)/4)
    val se = math.sqrt((14.0 / 3) / 4)
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
      - 2 * 1.959963984540054 * se) < 1e-10)
  }

  test("hosmerLemeshow: perfectly calibrated bins score exactly 0") {
    import spark.implicits._
    // each bin's mu equals its empirical rate → O = E everywhere
    val df = Seq(("a", true, 0.5), ("a", false, 0.5),
      ("b", true, 0.75), ("b", true, 0.75), ("b", true, 0.75),
      ("b", false, 0.75)).toDF("bin", "y", "mu")
    val r = graft.ops.Evaluation.hosmerLemeshow(df, col("y"), col("mu"),
      col("bin")).head
    assert(r.getAs[Long]("n_bins") == 2 && r.getAs[Long]("n") == 6)
    assert(math.abs(r.getAs[Double]("hl_stat")) < 1e-12)
    // shifting every mu up by .2 breaks calibration → positive stat
    val off = df.withColumn("mu", col("mu") + 0.2)
    val r2 = graft.ops.Evaluation.hosmerLemeshow(off, col("y"), col("mu"),
      col("bin")).head
    assert(r2.getAs[Double]("hl_stat") > 0.5)
  }

  test("krippendorffAlpha: hand 4-item binary case, singletons excluded") {
    import spark.implicits._
    // (a,a) (a,b) (b,b) (b,b) → Do = 2/8, De = 30/56, α = 1 − 7/15
    val df = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"),
      (3, "b"), (3, "b"), (4, "b"), (4, "b"),
      (5, "a")). // single-rating item: excluded
      toDF("item", "label")
    val r = graft.ops.Evaluation.krippendorffAlpha(df, "item", "label").head
    assert(r.getAs[Long]("n_items") == 4 && r.getAs[Long]("n_ratings") == 8)
    assert(math.abs(r.getAs[Double]("d_observed") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("d_expected") - 30.0 / 56) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha") - (1 - 0.25 / (30.0 / 56)))
      < 1e-12)
  }

  test("holmBonferroni: hand step-down, cummax monotone, ranks") {
    import spark.implicits._
    val df = Seq((1, 0.01), (2, 0.02), (3, 0.04), (4, 0.5))
      .toDF("hid", "p")
    val out = graft.analysis.AnalysisPlanner.holmBonferroni(df, "p", 0.05)
      .collect().map(r => r.getAs[Int]("hid") -> r).toMap
    assert(math.abs(out(1).getAs[Double]("adj_p") - 0.04) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("adj_p") - 0.06) < 1e-12)
    assert(math.abs(out(3).getAs[Double]("adj_p") - 0.08) < 1e-12)
    assert(math.abs(out(4).getAs[Double]("adj_p") - 0.5) < 1e-12)
    assert(out(1).getAs[Boolean]("discovery"))
    assert(!out(2).getAs[Boolean]("discovery"))
    assert((1 to 4).map(i => out(i).getAs[Long]("p_rank")) ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("restrictedMeanSurvival: hand KM integral with censoring") {
    import spark.implicits._
    // events at 1 and 3, censored at 5 → S = 1, 2/3, 1/3
    val df = Seq((1.0, 1), (3.0, 1), (5.0, 0)).toDF("dur", "ev")
    val r = graft.analysis.AnalysisPlanner.restrictedMeanSurvival(df, "dur", "ev", 4.0)
      .head
    assert(r.getAs[Double]("tau") == 4.0)
    assert(r.getAs[Long]("n") == 3 && r.getAs[Long]("n_events") == 2)
    assert(math.abs(r.getAs[Double]("rmst") - 8.0 / 3) < 1e-12)
    // τ before the first event: RMST = τ (survival 1 throughout)
    val r2 = graft.analysis.AnalysisPlanner.restrictedMeanSurvival(df, "dur", "ev", 0.5)
      .head
    assert(math.abs(r2.getAs[Double]("rmst") - 0.5) < 1e-12)
  }

  test("crossValidatedOls: exact line recovered by every fold") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i, i.toDouble % 23, 2.0 * (i % 23) + 1))
      .toDF("id", "x", "y")
    val out = graft.ops.Regression
      .crossValidatedOls(df, Seq(col("id")), "x", "y", folds = 4)
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-9)
      assert(r.getAs[Double]("mse_oof") < 1e-12)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 200)
    }
  }

  test("logisticRegression: symmetric design recovers logit MLE") {
    import spark.implicits._
    // x=+1: 30 pos / 10 neg (rate .75); x=−1: 10 pos / 30 neg (.25)
    // MLE: intercept 0, slope = logit(.75) = ln 3
    val rows =
      (1 to 30).map(_ => (1.0, true)) ++ (1 to 10).map(_ => (1.0, false)) ++
      (1 to 10).map(_ => (-1.0, true)) ++ (1 to 30).map(_ => (-1.0, false))
    val df = rows.toDF("x", "y")
    val fit = graft.ops.Regression
      .logisticRegression(df, Seq("x"), col("y"), iterations = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(fit("(intercept)").getAs[Double]("coef")) < 1e-6)
    assert(math.abs(fit("x").getAs[Double]("coef") - math.log(3.0)) < 1e-6)
    assert(fit("x").getAs[Long]("n") == 80)
    // more Newton steps never worsen the final-β loss
    val l1 = graft.ops.Regression
      .logisticRegression(df, Seq("x"), col("y"), iterations = 1)
      .head.getAs[Double]("log_loss")
    val l5 = fit("x").getAs[Double]("log_loss")
    assert(l5 <= l1 + 1e-12)
  }

  test("leaveOneGroupOut: hand 2-group influence, deltas exact") {
    import spark.implicits._
    // A: slope +1 line; B: slope −1 line → full slope 0
    val df = Seq(("A", 0.0, 0.0), ("A", 1.0, 1.0),
      ("B", 0.0, 1.0), ("B", 1.0, 0.0)).toDF("g", "x", "y")
    val out = graft.ops.Regression.leaveOneGroupOut(df, "g", "x", "y")
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    val a = out("A"); val b = out("B")
    assert(math.abs(a.getAs[Double]("slope_full")) < 1e-12)
    assert(math.abs(a.getAs[Double]("slope_loo") + 1.0) < 1e-12)
    assert(math.abs(a.getAs[Double]("delta_slope") - 1.0) < 1e-12)
    assert(math.abs(a.getAs[Double]("delta_intercept") + 0.5) < 1e-12)
    assert(math.abs(b.getAs[Double]("delta_slope") + 1.0) < 1e-12)
    assert(a.getAs[Long]("n") == 2 && b.getAs[Long]("n") == 2)
  }

  test("ljungBox: alternating series huge Q, hand Q for n=4") {
    import spark.implicits._
    // perfectly alternating ±1 → r1 ≈ −1, Q blows up
    val alt = (0 until 40).map(t => (t, if (t % 2 == 0) 1.0 else -1.0))
      .toDF("t", "x")
    val qa = graft.ops.Evaluation.ljungBox(alt, "t", "x", 3).head
    assert(qa.getAs[Long]("n") == 40 && qa.getAs[Long]("max_lag") == 3)
    assert(qa.getAs[Double]("q_stat") > 60.0)
    // hand case n=4, x=(1,2,3,4), lag 1: mean 2.5, den 5,
    // r1 = (−1.5·−0.5 + −0.5·0.5 + 0.5·1.5)/5 = 1.25/5 = 0.25
    // Q = 4·6·(0.25²/3) = 0.5
    val tiny = Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)).toDF("t", "x")
    val qt = graft.ops.Evaluation.ljungBox(tiny, "t", "x", 1).head
    assert(math.abs(qt.getAs[Double]("q_stat") - 0.5) < 1e-12)
  }

  test("durbinWatson: white-ish ≈ 2 on alternating, 0 on constant-run") {
    import spark.implicits._
    // alternating residuals e = ±1: num = Σ(±2)² = 4(n−1), den = n
    // → DW = 4(n−1)/n → 4 (strong negative autocorrelation)
    val alt = (0 until 50).map(t => ("k", t,
      if (t % 2 == 0) 1.0 else -1.0)).toDF("k", "t", "e")
    val a = graft.ops.TimeSeries
      .durbinWatson(alt, Seq("k"), "t", "e").head
    assert(math.abs(a.getAs[Double]("dw") - 4.0 * 49 / 50) < 1e-12)
    // constant residuals: successive diffs 0 → DW = 0
    val const = (0 until 10).map(t => ("k", t, 3.0)).toDF("k", "t", "e")
    val c = graft.ops.TimeSeries
      .durbinWatson(const, Seq("k"), "t", "e").head
    assert(c.getAs[Double]("dw") == 0.0)
    // all-zero residuals → NULL dw (0/0 guarded)
    val zero = (0 until 5).map(t => ("k", t, 0.0)).toDF("k", "t", "e")
    val z = graft.ops.TimeSeries
      .durbinWatson(zero, Seq("k"), "t", "e").head
    assert(z.isNullAt(z.fieldIndex("dw")))
  }

  test("periodogram: pure cosine concentrates all variance at its freq") {
    import spark.implicits._
    val n = 64
    val df = (0 until n).map(t =>
      (t, math.cos(2 * math.Pi * 4 * t / n))).toDF("t", "x")
    val out = graft.ops.TimeSeries.periodogram(df, "t", "x", 8)
      .collect().map(r => r.getAs[Long]("freq") ->
        r.getAs[Double]("power_frac")).toMap
    // at the matching Fourier frequency the fraction is ~1 (c = n/2·…)
    assert(out(4L) > 0.99)
    assert((1 to 8).filter(_ != 4).forall(k => out(k.toLong) < 1e-10))
    // period readout: n/k
    val p = graft.ops.TimeSeries.periodogram(df, "t", "x", 8)
      .where(col("freq") === 4).head.getAs[Double]("period")
    assert(math.abs(p - 16.0) < 1e-12)
  }

  test("coxPH: risk direction, identities, one-round closed form") {
    import spark.implicits._
    // x=1 subjects fail fast, x=0 subjects fail late or are censored
    val rows = Seq(
      (1.0, 1, 1.0), (2.0, 1, 1.0), (3.0, 1, 1.0), (4.0, 1, 1.0),
      (8.0, 1, 0.0), (9.0, 1, 0.0), (10.0, 0, 0.0), (12.0, 0, 0.0))
    val df = rows.toDF("dur", "ev", "x")
    val r = graft.ops.Survival.coxPH(df, "dur", "ev", "x", 2).head
    assert(r.getAs[Long]("n") == 8 && r.getAs[Long]("n_events") == 6)
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.5, s"high-x group fails faster, got beta=$beta")
    assert(math.abs(r.getAs[Double]("hazard_ratio") - math.exp(beta))
      < 1e-12)
    assert(math.abs(r.getAs[Double]("z") -
      beta / r.getAs[Double]("se")) < 1e-12)

    // one Newton round from beta=0 must equal U(0)/I(0) computed
    // directly: at beta=0 the risk-set sums are plain counts/sums
    val one = graft.ops.Survival.coxPH(df, "dur", "ev", "x", 1)
      .head.getAs[Double]("beta")
    val times = rows.map(_._1).distinct.sorted
    var u = 0.0; var inf = 0.0
    for (t <- times) {
      val atT = rows.filter(_._1 == t)
      val d = atT.count(_._2 == 1)
      if (d > 0) {
        val sxe = atT.filter(_._2 == 1).map(_._3).sum
        val risk = rows.filter(_._1 >= t)
        val s0 = risk.size.toDouble
        val s1 = risk.map(_._3).sum
        val s2 = risk.map(v => v._3 * v._3).sum
        u += sxe - d * s1 / s0
        inf += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
      }
    }
    assert(math.abs(one - u / inf) < 1e-9)

    // constant covariate carries no information → loud failure
    val const = rows.map { case (a, b, _) => (a, b, 2.0) }
      .toDF("dur", "ev", "x")
    intercept[IllegalArgumentException] {
      graft.ops.Survival.coxPH(const, "dur", "ev", "x", 1).head
    }
  }

  test("bartlettTest: hand case; equal variances ≈ 0") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0, 10.0).map(("b", _)) ++
      Seq(1.0, 1.5, 2.0).map(("c", _))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.bartlettTest(df, "g", "v").head
    assert(r.getAs[Long]("n") == 12 && r.getAs[Long]("n_groups") == 3)
    assert(math.abs(r.getAs[Double]("pooled_var") - 5.0555555556) < 1e-9)
    assert(math.abs(r.getAs[Double]("chi2") - 5.6918678198) < 1e-9)
    // identical spreads: chi2 exactly 0 up to fp
    val eq = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(11.0, 12.0, 13.0).map(("b", _))).toDF("g", "v")
    assert(math.abs(graft.analysis.AnalysisPlanner
      .bartlettTest(eq, "g", "v").head.getAs[Double]("chi2")) < 1e-12)
    // single-row group carries no variance → dropped from k
    val drop = df.union(Seq(("d", 9.0)).toDF("g", "v"))
    assert(graft.analysis.AnalysisPlanner.bartlettTest(drop, "g", "v")
      .head.getAs[Long]("n_groups") == 3)
  }

  test("friedmanTest: no-ties textbook value; incomplete block dropped") {
    import spark.implicits._
    // 4 blocks x 3 treatments, rank columns R = (11, 5, 8) → chi2 = 4.5
    val data = Seq(
      (1, "t1", 3.0), (1, "t2", 1.0), (1, "t3", 2.0),
      (2, "t1", 2.0), (2, "t2", 1.0), (2, "t3", 3.0),
      (3, "t1", 3.0), (3, "t2", 2.0), (3, "t3", 1.0),
      (4, "t1", 3.0), (4, "t2", 1.0), (4, "t3", 2.0))
    val df = data.toDF("b", "t", "v")
    val r = graft.analysis.AnalysisPlanner.friedmanTest(df, "b", "t", "v").head
    assert(r.getAs[Long]("n_blocks") == 4)
    assert(r.getAs[Long]("n_treatments") == 3)
    assert(r.getAs[Long]("dof") == 2)
    assert(math.abs(r.getAs[Double]("chi2") - 4.5) < 1e-9)
    // a block missing a treatment is excluded entirely
    val extra = df.union(Seq((5, "t1", 9.0), (5, "t2", 1.0)).toDF("b", "t", "v"))
    val r2 = graft.analysis.AnalysisPlanner
      .friedmanTest(extra, "b", "t", "v").head
    assert(r2.getAs[Long]("n_blocks") == 4)
    assert(math.abs(r2.getAs[Double]("chi2") - 4.5) < 1e-9)
    // within-block tie → midranks keep statistic finite and smaller
    val tied = Seq(
      (1, "t1", 2.0), (1, "t2", 2.0), (1, "t3", 1.0),
      (2, "t1", 3.0), (2, "t2", 2.0), (2, "t3", 1.0)).toDF("b", "t", "v")
    val r3 = graft.analysis.AnalysisPlanner
      .friedmanTest(tied, "b", "t", "v").head
    assert(!r3.isNullAt(r3.fieldIndex("chi2")))
  }

  test("grubbsTest: planted outlier dominates; deviation-tie picks min") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 100.0).map(("g", _)).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.grubbsTest(df, "g", "v").head
    val xs = Seq(1.0, 2.0, 3.0, 100.0)
    val mu = xs.sum / 4
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / 3)
    assert(r.getAs[Double]("extreme_value") == 100.0)
    assert(math.abs(r.getAs[Double]("g_stat") - (100.0 - mu) / sd) < 1e-12)
    // symmetric data: both endpoints equally deviant → min reported
    val sym = Seq(-5.0, 0.0, 5.0).map(("g", _)).toDF("g", "v")
    assert(graft.analysis.AnalysisPlanner.grubbsTest(sym, "g", "v")
      .head.getAs[Double]("extreme_value") == -5.0)
    // n < 3 groups are dropped
    val tiny = Seq(("h", 1.0), ("h", 2.0)).toDF("g", "v")
    assert(graft.analysis.AnalysisPlanner.grubbsTest(tiny, "g", "v").count() == 0)
  }

  test("optimalThreshold: perfect separation → J=1 at the class edge") {
    import spark.implicits._
    val df = Seq((0.0, 0.1), (0.0, 0.4), (1.0, 0.6), (1.0, 0.9))
      .toDF("y", "s")
    val r = graft.ops.Evaluation.optimalThreshold(df, "y", "s").head
    assert(r.getAs[Double]("threshold") == 0.6)
    assert(r.getAs[Double]("j_stat") == 1.0)
    assert(r.getAs[Double]("sensitivity") == 1.0)
    assert(r.getAs[Double]("specificity") == 1.0)
    assert(r.getAs[Double]("accuracy") == 1.0)
    // overlapping scores: best cut skips the planted inversion
    val df2 = Seq((0.0, 0.1), (1.0, 0.2), (0.0, 0.3), (1.0, 0.6),
      (1.0, 0.7)).toDF("y", "s")
    val r2 = graft.ops.Evaluation.optimalThreshold(df2, "y", "s").head
    assert(r2.getAs[Double]("threshold") == 0.6)
    // at t=0.6: sens = 2/3, spec = 1 → J = 2/3 beats every other cut
    assert(math.abs(r2.getAs[Double]("j_stat") - 2.0 / 3) < 1e-12)
  }

  test("pageHinkley: step shift fires after the jump, stable series never") {
    import spark.implicits._
    val days = (1 to 20).map { i =>
      ("m", java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"),
        if (i <= 10) 0.0 else 5.0)
    }
    val df = days.toDF("k", "ts", "v")
    val r = graft.ops.TimeSeries
      .pageHinkley(df, Seq("k"), "ts", "v", delta = 0.0, lambda = 1.0)
      .head
    assert(r.getAs[Long]("n_days") == 20)
    // day 11: m jumps by 5 − 5/11 ≈ 4.55 > λ → alarm from day 11 on
    assert(r.getAs[java.sql.Date]("first_alarm_date").toString ==
      "2024-01-11")
    assert(r.getAs[Long]("n_alarm_days") == 10)
    assert(r.getAs[Double]("max_ph") > 4.0)
    val flat = days.map { case (k, ts, _) => (k, ts, 2.0) }
      .toDF("k", "ts", "v")
    val r2 = graft.ops.TimeSeries
      .pageHinkley(flat, Seq("k"), "ts", "v", 0.0, 1.0).head
    assert(r2.getAs[Long]("n_alarm_days") == 0)
    assert(r2.isNullAt(r2.fieldIndex("first_alarm_date")))
  }

  test("modularity: disjoint cliques 0.5, single community exactly 0") {
    import spark.implicits._
    // two disconnected triangles, labeled by component: Q = 1/2
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z")).toDF("s", "t")
    val labels = Seq(("a", 1), ("b", 1), ("c", 1),
      ("x", 2), ("y", 2), ("z", 2)).toDF("node", "comm")
    val r = graft.ops.Graph
      .modularity(edges, "s", "t", labels, "node", "comm").head
    assert(r.getAs[Long]("n_nodes") == 6 && r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_communities") == 2)
    assert(math.abs(r.getAs[Double]("modularity") - 0.5) < 1e-12)
    // everything in one community: e_c/m = 1, (d_c/2m)^2 = 1 → Q = 0
    val one = labels.withColumn("comm", lit(7))
    assert(math.abs(graft.ops.Graph
      .modularity(edges, "s", "t", one, "node", "comm")
      .head.getAs[Double]("modularity")) < 1e-12)
    // anti-community labels (every edge crosses): Q < 0
    val anti = Seq(("a", 1), ("b", 2), ("c", 3),
      ("x", 1), ("y", 2), ("z", 3)).toDF("node", "comm")
    assert(graft.ops.Graph
      .modularity(edges, "s", "t", anti, "node", "comm")
      .head.getAs[Double]("modularity") < 0)
  }

  test("bradleyTerry: dominance ordering, symmetry, gauge") {
    import spark.implicits._
    val prefs = (Seq.fill(3)(("a", "b")) ++ Seq.fill(3)(("b", "c")) ++
      Seq.fill(3)(("a", "c"))).toDF("w", "l")
    val out = graft.ops.Labeling.bradleyTerry(prefs, "w", "l", 3)
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Double]("score"), r.getAs[Long]("wins"),
          r.getAs[Long]("games"))).toMap
    assert(out("a")._1 > out("b")._1 && out("b")._1 > out("c")._1)
    assert(out("a")._2 == 6 && out("b")._2 == 3 && out("c")._2 == 0)
    assert(out("a")._3 == 6 && out("b")._3 == 6 && out("c")._3 == 6)
    // gauge: scores rescaled to mean 1 each round
    assert(math.abs(out.values.map(_._1).sum / 3 - 1.0) < 1e-12)
    // an even head-to-head record is exactly symmetric
    val even = Seq(("p", "q"), ("q", "p")).toDF("w", "l")
    val e = graft.ops.Labeling.bradleyTerry(even, "w", "l", 3)
      .collect().map(r => r.getAs[Double]("score"))
    assert(math.abs(e(0) - e(1)) < 1e-12)
  }

  test("plattScaling: recalibrates a compressed score") {
    import spark.implicits._
    // true P(y=1) tracks i/100, but the reported score is halved —
    // raw ECE is big, the logistic refit should shrink it
    val rows = (0 until 100).map { i =>
      (if (i % 10 < i / 10) 1.0 else 0.0, i / 200.0)
    }
    val df = rows.toDF("y", "s")
    val r = graft.ops.Evaluation.plattScaling(df, "y", "s", 4, 10).head
    assert(r.getAs[Long]("n") == 100)
    assert(r.getAs[Double]("a") > 0, "calibration slope must be positive")
    val raw = r.getAs[Double]("ece_raw")
    val cal = r.getAs[Double]("ece_platt")
    assert(raw > 0.15, s"halved scores must miscalibrate, got $raw")
    assert(cal < raw / 2, s"platt must recalibrate: raw=$raw cal=$cal")
  }

  test("lillieforsTest: matches brute-force D on a hand frame") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 2.0, 3.0, 4.0, 10.0)
    val df = vals.map(("g", _)).toDF("k", "v")
    val r = graft.analysis.AnalysisPlanner
      .lillieforsTest(df, "k", "v").head
    val n = vals.size.toDouble
    val mu = vals.sum / n
    val sd = math.sqrt(vals.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    def phi(z: Double): Double = {
      val x = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val poly = ((((1.061405429 * t - 1.453152027) * t +
        1.421413741) * t - 0.284496736) * t + 0.254829592) * t
      0.5 * (1 + (if (z >= 0) 1.0 else -1.0) *
        (1 - poly * math.exp(-x * x)))
    }
    val distinct = vals.distinct.sorted
    val d = distinct.map { v =>
      val below = vals.count(_ < v) / n
      val upto = vals.count(_ <= v) / n
      val p = phi((v - mu) / sd)
      math.max(math.abs(upto - p), math.abs(p - below))
    }.max
    assert(r.getAs[Long]("n") == 6)
    assert(math.abs(r.getAs[Double]("d_stat") - d) < 1e-12)
    assert(math.abs(r.getAs[Double]("sqrt_n_d") -
      math.sqrt(n) * d) < 1e-12)
    // degenerate groups (n < 4 or zero spread) are dropped
    val tiny = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("k", "v")
    assert(graft.analysis.AnalysisPlanner
      .lillieforsTest(tiny, "k", "v").count() == 0)
  }

  test("partitionQuality: true partition beats a scrambled one") {
    import spark.implicits._
    // two tight blobs around (0,0) and (10,10)
    val pts = Seq(
      (Array(0.0f, 0.1f), 0), (Array(0.1f, 0.0f), 0),
      (Array(-0.1f, 0.0f), 0), (Array(0.0f, -0.1f), 0),
      (Array(10.0f, 10.1f), 1), (Array(10.1f, 10.0f), 1),
      (Array(9.9f, 10.0f), 1), (Array(10.0f, 9.9f), 1))
    val good = pts.toDF("vec", "lab")
    val g = graft.ops.Similarity.partitionQuality(good, "vec", "lab").head
    assert(g.getAs[Long]("n") == 8 && g.getAs[Long]("n_clusters") == 2)
    assert(g.getAs[Long]("dims") == 2)
    // scrambled labels: half of each blob swapped
    val bad = pts.zipWithIndex
      .map { case ((v, _), i) => (v, i % 2) }.toDF("vec", "lab")
    val b = graft.ops.Similarity.partitionQuality(bad, "vec", "lab").head
    assert(g.getAs[Double]("ch_index") > 100 * b.getAs[Double]("ch_index"))
    assert(g.getAs[Double]("db_index") < b.getAs[Double]("db_index"))
    // DB of the tight/far case is tiny in absolute terms too
    assert(g.getAs[Double]("db_index") < 0.1)
  }

  test("energyDistance: hand values, zero on identical samples") {
    import spark.implicits._
    // A = {0,0}, B = {1,1}: E|X−Y| = 1, within-terms 0 → D² = 2
    val df = Seq((0.0, 0L), (0.0, 2L), (1.0, 1L), (1.0, 3L))
      .toDF("v", "u")
    val r = graft.analysis.AnalysisPlanner
      .energyDistance(df, "v", col("u") % 2 === 0).head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(math.abs(r.getAs[Double]("e_dist_sq") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_dist") - math.sqrt(2.0)) < 1e-12)
    // identical samples → exactly zero
    val same = Seq((1.0, 0L), (2.0, 0L), (1.0, 1L), (2.0, 1L))
      .toDF("v", "u")
    assert(math.abs(graft.analysis.AnalysisPlanner
      .energyDistance(same, "v", col("u") % 2 === 0)
      .head.getAs[Double]("e_dist_sq")) < 1e-12)
    // brute-force agreement on an uneven frame
    val av = Seq(0.5, 2.5, 2.5, 7.0); val bv = Seq(1.0, 4.0, 6.5)
    val mixed = (av.map((_, 0L)) ++ bv.map((_, 1L))).toDF("v", "u")
    val got = graft.analysis.AnalysisPlanner
      .energyDistance(mixed, "v", col("u") % 2 === 0)
      .head.getAs[Double]("e_dist_sq")
    def mad(x: Seq[Double], y: Seq[Double]) =
      x.flatMap(a => y.map(b => math.abs(a - b))).sum / (x.size * y.size)
    val want = 2 * mad(av, bv) - mad(av, av) - mad(bv, bv)
    assert(math.abs(got - want) < 1e-12)
  }

  test("jonckheereTerpstra: increasing trend, ties give half-counts") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .jonckheereTerpstra(df, "g", "v").head
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_groups") == 3)
    // every cross-group pair is ordered: JT = 3 pairs × 4 = 12, E = 6
    assert(math.abs(r.getAs[Double]("jt_stat") - 12.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("jt_mean") - 6.0) < 1e-12)
    assert(r.getAs[Double]("z") > 0)
    // a tie across groups counts half
    val tied = Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v")
    assert(math.abs(graft.analysis.AnalysisPlanner
      .jonckheereTerpstra(tied, "g", "v")
      .head.getAs[Double]("jt_stat") - 0.5) < 1e-12)
  }

  test("cohensD: hand case incl. Hedges correction") {
    import spark.implicits._
    val df = Seq((2.0, 0L), (4.0, 0L), (1.0, 1L), (3.0, 1L))
      .toDF("v", "u")
    val r = graft.analysis.AnalysisPlanner
      .cohensD(df, "v", col("u") % 2 === 0).head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(math.abs(r.getAs[Double]("mean_a") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_b") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("pooled_sd") - math.sqrt(2.0)) < 1e-12)
    val d = 1.0 / math.sqrt(2.0)
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-12)
    assert(math.abs(r.getAs[Double]("hedges_g") - d * 4 / 7) < 1e-12)
  }

  test("segmentConcentration: uniform floor and single-segment ceiling") {
    import spark.implicits._
    val even = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0), ("d", 5.0))
      .toDF("s", "x")
    val r = graft.ops.Profiling
      .segmentConcentration(even, "s", "x").head
    assert(r.getAs[Long]("n_segments") == 4)
    assert(math.abs(r.getAs[Double]("hhi") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("hhi_normalized")) < 1e-12)
    assert(math.abs(r.getAs[Double]("theil")) < 1e-12)
    assert(math.abs(r.getAs[Double]("top_share") - 0.25) < 1e-12)
    // all mass in one of two segments: hhi = 1, theil = ln 2
    val one = Seq(("a", 10.0), ("b", 0.0)).toDF("s", "x")
    val r2 = graft.ops.Profiling
      .segmentConcentration(one, "s", "x").head
    assert(math.abs(r2.getAs[Double]("hhi") - 1.0) < 1e-12)
    assert(math.abs(r2.getAs[Double]("hhi_normalized") - 1.0) < 1e-12)
    assert(math.abs(r2.getAs[Double]("theil") - math.log(2.0)) < 1e-12)
    assert(math.abs(r2.getAs[Double]("top_share") - 1.0) < 1e-12)
  }

  test("trimmedMean: integral and fractional trim boundaries") {
    import spark.implicits._
    // trim 0.2 of n=5 cuts exactly one value each side
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)).toDF("k", "v")
    val r = graft.analysis.AnalysisPlanner
      .trimmedMean(df, "k", "v", 0.2).head
    assert(r.getAs[Long]("n") == 5)
    assert(math.abs(r.getAs[Double]("mean") - 22.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 3.0) < 1e-12)
    // fractional boundary: trim 0.125 of n=4 half-weights the ends
    val f = Seq(1.0, 2.0, 3.0, 8.0).map(("g", _)).toDF("k", "v")
    val r2 = graft.analysis.AnalysisPlanner
      .trimmedMean(f, "k", "v", 0.125).head
    assert(math.abs(r2.getAs[Double]("trimmed_mean") - 9.5 / 3) < 1e-12)
    // trim 0 is the plain mean
    val r3 = graft.analysis.AnalysisPlanner
      .trimmedMean(f, "k", "v", 0.0).head
    assert(math.abs(r3.getAs[Double]("trimmed_mean") -
      r3.getAs[Double]("mean")) < 1e-12)
  }

  test("runsTest: monotone → 1 run, alternating → max runs") {
    import spark.implicits._
    def series(key: String, xs: Seq[Double]) = xs.zipWithIndex.map {
      case (x, i) =>
        (key, java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 08:00:00"), x)
    }
    val df = (series("up", (1 to 10).map(_.toDouble)) ++
      series("zig", (1 to 10).map(i => (i % 2).toDouble)) ++
      series("flat", Seq.fill(10)(3.0))).toDF("k", "ts", "v")
    val out = graft.ops.TimeSeries.runsTest(df, Seq("k"), "ts", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val up = out("up")
    assert(up.getAs[Long]("n_days") == 10 && up.getAs[Long]("n_signs") == 9)
    assert(up.getAs[Long]("runs") == 1)
    assert(math.abs(up.getAs[Double]("expected_runs") - 19.0 / 3) < 1e-12)
    assert(up.getAs[Double]("z") < -3)
    val zig = out("zig")
    assert(zig.getAs[Long]("runs") == 9)
    assert(zig.getAs[Double]("z") > 0)
    // a constant series has no defined signs → no row
    assert(!out.contains("flat"))
  }

  test("kuiperTest: interleaved samples sum both one-sided gaps") {
    import spark.implicits._
    val df = Seq((1.0, 0L), (3.0, 0L), (2.0, 1L), (4.0, 1L))
      .toDF("v", "u")
    val r = graft.analysis.AnalysisPlanner
      .kuiperTest(df, "v", col("u") % 2 === 0).head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(math.abs(r.getAs[Double]("d_plus") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("d_minus")) < 1e-12)
    assert(math.abs(r.getAs[Double]("kuiper_v") - 0.5) < 1e-12)
    // disjoint supports: the A-side CDF leads everywhere → V = 1
    val dj = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L))
      .toDF("v", "u")
    assert(math.abs(graft.analysis.AnalysisPlanner
      .kuiperTest(dj, "v", col("u") % 2 === 0)
      .head.getAs[Double]("kuiper_v") - 1.0) < 1e-12)
  }

  test("wilcoxonSignedRank: hand ranks, ties, zero-diff drop") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, -4.0, 0.0).toDF("d")
    val r = graft.analysis.AnalysisPlanner
      .wilcoxonSignedRank(df, "d").head
    assert(r.getAs[Long]("n") == 4) // the zero difference drops
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 1)
    assert(math.abs(r.getAs[Double]("w_plus") - 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("w_mean") - 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 1.0 / math.sqrt(7.5)) < 1e-12)
    // midranks under |d| ties + tie-corrected variance
    val tied = Seq(1.0, -1.0, 2.0).toDF("d")
    val r2 = graft.analysis.AnalysisPlanner
      .wilcoxonSignedRank(tied, "d").head
    assert(math.abs(r2.getAs[Double]("w_plus") - 4.5) < 1e-12)
    assert(math.abs(r2.getAs[Double]("z") -
      1.5 / math.sqrt(3.375)) < 1e-12)
  }

  test("grangerCausality: a planted one-day lead is detected") {
    import spark.implicits._
    // y today = x yesterday (+ tiny wiggle): x Granger-causes y
    val xs = (1 to 40).map(t => (t % 7).toDouble + (t % 3) * 0.1)
    val rows = (1 to 40).flatMap { t =>
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(t - 1).atTime(9, 0))
      Seq(("x", ts, xs(t - 1)),
        ("y", ts, (if (t >= 2) xs(t - 2) else 0.0) + 0.001 * (t % 5)))
    }
    val df = rows.toDF("k", "ts", "v")
    val r = graft.ops.TimeSeries
      .grangerCausality(df, "ts", "v", col("k") === "x", col("k") === "y")
      .head
    assert(r.getAs[Long]("n") == 39)
    assert(math.abs(r.getAs[Double]("beta_xlag") - 1.0) < 0.05)
    assert(r.getAs[Double]("rss_unrestricted") <
      r.getAs[Double]("rss_restricted") / 10)
    assert(r.getAs[Double]("f_stat") > 100)
    // reversed direction: y's past says little about x
    val rev = graft.ops.TimeSeries
      .grangerCausality(df, "ts", "v", col("k") === "y", col("k") === "x")
      .head
    assert(rev.getAs[Double]("f_stat") < r.getAs[Double]("f_stat") / 10)
  }

  test("spectralEntropy: pure tone → 0, flat spectrum → 1") {
    import spark.implicits._
    val n = 64
    val tone = (0 until n).map(t =>
      (t, math.cos(2 * math.Pi * 4 * t / n))).toDF("t", "x")
    val r = graft.ops.TimeSeries.spectralEntropy(tone, "t", "x", 8).head
    assert(r.getAs[Long]("n_freqs") == 8)
    assert(r.getAs[Double]("spectral_entropy") < 1e-6)
    assert(r.getAs[Long]("peak_freq") == 4)
    assert(r.getAs[Double]("peak_share") > 0.999)
    // equal-amplitude mix of all 8 tones: near-uniform spectrum
    val mix = (0 until n).map(t => (t, (1 to 8).map(k =>
      math.cos(2 * math.Pi * k * t / n)).sum)).toDF("t", "x")
    val r2 = graft.ops.TimeSeries.spectralEntropy(mix, "t", "x", 8).head
    assert(r2.getAs[Double]("spectral_entropy") > 0.99)
  }

  test("cointegration: planted spread mean-reversion detected") {
    import spark.implicits._
    // x drifts, y = 2x + stationary wiggle → residual snaps back
    val xs = (1 to 80).map(t => t * 0.3 + math.sin(t * 0.9))
    val rows = (1 to 80).flatMap { t =>
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(t - 1).atTime(9, 0))
      val wiggle = 0.3 * math.sin(t * 2.1) + 0.1 * ((t * 7) % 13) / 13.0
      Seq(("x", ts, xs(t - 1)), ("y", ts, 2.0 * xs(t - 1) + wiggle))
    }
    val df = rows.toDF("k", "ts", "v")
    val r = graft.ops.TimeSeries
      .cointegration(df, "ts", "v", col("k") === "x", col("k") === "y")
      .head
    assert(r.getAs[Long]("n") == 80)
    assert(math.abs(r.getAs[Double]("hedge_ratio") - 2.0) < 0.05)
    assert(r.getAs[Double]("rho") < -0.5, "spread must mean-revert")
    assert(r.getAs[Double]("df_t") < -3.37, "past the 5% EG critical value")
  }

  test("hurstExponent: trending ≈ 1, alternating ≪ 0.5") {
    import spark.implicits._
    def mk(key: String, f: Int => Double) = (1 to 96).map { t =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(t - 1).atTime(9, 0)),
        f(t))
    }
    val trend = mk("t", t => t * 1.0 + 0.01 * (t % 3)).toDF("ts", "v")
    val rT = graft.ops.TimeSeries
      .hurstExponent(trend, "ts", "v", Seq(8, 16, 32)).head
    assert(rT.getAs[Long]("n_days") == 96 && rT.getAs[Long]("n_sizes") == 3)
    assert(rT.getAs[Double]("hurst") > 0.85,
      s"trend must be persistent, got ${rT.getAs[Double]("hurst")}")
    val zig = mk("z", t => (t % 2).toDouble + 0.001 * (t % 5))
      .toDF("ts", "v")
    val rZ = graft.ops.TimeSeries
      .hurstExponent(zig, "ts", "v", Seq(8, 16, 32)).head
    assert(rZ.getAs[Double]("hurst") < 0.25,
      s"alternation is anti-persistent, got ${rZ.getAs[Double]("hurst")}")
  }

  test("maskProfile: shapes collapse, rare mask surfaces with share") {
    import spark.implicits._
    val df = Seq("AB-1234", "XY-77", "QQ-9", "bad value", "CD-55")
      .toDF("code")
    val out = graft.ops.Profiling.maskProfile(df, Seq("code"), k = 5)
      .collect().map(r => r.getAs[String]("mask") ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(out("A-9") == ((4L, 0.8)))
    assert(out("a_a") == ((1L, 0.2)))
    // nulls are skipped; ranking is count-desc then mask
    val withNull = Seq(Some("A1"), None, Some("B2"), Some("zz"))
      .toDF("code")
    val rows = graft.ops.Profiling.maskProfile(withNull, Seq("code"), 5)
      .orderBy(col("n").desc, col("mask")).collect()
    assert(rows.head.getAs[String]("mask") == "A9")
    assert(rows.head.getAs[Long]("n") == 2)
    assert(rows.map(_.getAs[Long]("n")).sum == 3)
  }

  test("mannKendall: monotone S = n(n-1)/2, flat S = 0, tie variance") {
    import spark.implicits._
    def mk(key: String, f: Int => Double) = (1 to 12).map { t =>
      (key, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 5, 1).plusDays(t - 1).atTime(8, 0)),
        f(t))
    }
    val df = (mk("up", _.toDouble) ++ mk("flat", _ => 2.0)).toDF("k", "ts", "v")
    val out = graft.ops.TimeSeries
      .mannKendall(df, Seq("k"), "ts", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val up = out("up")
    assert(up.getAs[Long]("n_days") == 12)
    assert(up.getAs[Double]("s_stat") == 66.0) // all 12·11/2 pairs rise
    // no ties: Var = n(n−1)(2n+5)/18 = 12·11·29/18
    assert(math.abs(up.getAs[Double]("var_s") - 12.0 * 11 * 29 / 18)
      < 1e-9)
    assert(up.getAs[Double]("z") > 3)
    val flat = out("flat")
    assert(flat.getAs[Double]("s_stat") == 0.0)
    // one 12-way tie wipes the variance term completely
    assert(math.abs(flat.getAs[Double]("var_s")) < 1e-9)
    assert(flat.getAs[Double]("z") == 0.0)
  }

  test("mediationAnalysis: fully mediated effect decomposes exactly") {
    import spark.implicits._
    // m carries ALL of x's effect: y = 3m, m = 2x + independent wiggle
    val rows = (1 to 20).map { i =>
      val x = i.toDouble
      val m = 2 * x + ((i * 3) % 5 - 2).toDouble
      (x, m, 3 * m)
    }
    val r = graft.ops.Evaluation
      .mediationAnalysis(rows.toDF("x", "m", "y"), "x", "m", "y").head
    assert(r.getAs[Long]("n") == 20)
    // the wiggle is not orthogonal to x, so a ≈ 2 but not exactly —
    // the DECOMPOSITION identities are what must hold exactly
    val a = r.getAs[Double]("a_path")
    assert(math.abs(a - 2.0) < 0.1)
    assert(math.abs(r.getAs[Double]("b_path") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("direct_effect")) < 1e-9)
    assert(math.abs(r.getAs[Double]("total_effect") - 3 * a) < 1e-9)
    assert(math.abs(r.getAs[Double]("indirect_effect") -
      r.getAs[Double]("total_effect")) < 1e-9)
    assert(math.abs(r.getAs[Double]("prop_mediated") - 1.0) < 1e-9)
  }

  test("doublyRobustATE: exact outcome model wipes confounding bias") {
    import spark.implicits._
    // treatment goes to high-x units; y = 2·t + 1.5·x exactly, so the
    // naive difference absorbs the x gap but AIPW recovers ATE = 2
    val rows = (1 to 40).map { i =>
      val x = i / 10.0
      val t = i > 20
      (i.toLong, x, 2.0 * (if (t) 1 else 0) + 1.5 * x, t)
    }
    val df = rows.toDF("id", "x", "y", "treat")
    val r = graft.ops.Evaluation
      .doublyRobustATE(df, col("treat"), "x", "y", iterations = 2).head
    assert(r.getAs[Long]("n") == 40 && r.getAs[Long]("n_treated") == 20)
    val naive = r.getAs[Double]("ate_naive")
    assert(math.abs(naive - 5.0) < 1e-9, s"naive must be biased: $naive")
    assert(math.abs(r.getAs[Double]("ate_dr") - 2.0) < 1e-9)
    assert(r.getAs[Double]("propensity_slope") > 0)
  }

  test("two-sample stat invariances: shift/scale laws hold exactly") {
    import spark.implicits._
    val base = Seq(1.2, 3.4, 2.2, 5.5, 0.7, 4.1, 2.9, 1.8)
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }
    def ed(rows: Seq[(Double, Long)]) =
      graft.analysis.AnalysisPlanner
        .energyDistance(rows.toDF("v", "u"), "v", col("u") % 2 === 0)
        .head.getAs[Double]("e_dist_sq")
    val d0 = ed(base)
    // translation invariance: |x−y| unchanged under a common shift
    assert(math.abs(ed(base.map { case (v, u) => (v + 17.5, u) }) - d0)
      < 1e-9)
    // scale equivariance: D² is homogeneous of degree 1 in distance
    assert(math.abs(ed(base.map { case (v, u) => (v * 3.0, u) })
      - 3.0 * d0) < 1e-9)
    // Kuiper dominates one-sided KS: V = D⁺ + D⁻ ≥ max(D⁺, D⁻)
    val k = graft.analysis.AnalysisPlanner
      .kuiperTest(base.toDF("v", "u"), "v", col("u") % 2 === 0).head
    assert(k.getAs[Double]("kuiper_v") >=
      math.max(k.getAs[Double]("d_plus"), k.getAs[Double]("d_minus"))
        - 1e-15)
    // trimmed mean sits inside the data range and between the
    // 0-trim mean and an aggressive trim of the same frame
    val df = Seq(1.0, 2.0, 2.5, 3.0, 50.0).map(("g", _)).toDF("k", "v")
    val t1 = graft.analysis.AnalysisPlanner
      .trimmedMean(df, "k", "v", 0.1).head.getAs[Double]("trimmed_mean")
    val t4 = graft.analysis.AnalysisPlanner
      .trimmedMean(df, "k", "v", 0.4).head.getAs[Double]("trimmed_mean")
    assert(t1 >= 1.0 && t1 <= 50.0)
    // heavier trimming pulls toward the median on this right-skewed set
    assert(t4 < t1)
  }

  test("breuschPagan: variance-in-x inflates LM vs constant noise") {
    import spark.implicits._
    def frame(het: Boolean) = (1 to 60).map { i =>
      val x = i.toDouble
      val w = ((i * 7) % 5 - 2).toDouble
      (x, 2 * x + (if (het) x / 10 * w else w))
    }
    val hom = graft.ops.Regression
      .breuschPagan(frame(false).toDF("x", "y"), "x", "y").head
    val het = graft.ops.Regression
      .breuschPagan(frame(true).toDF("x", "y"), "x", "y").head
    assert(hom.getAs[Long]("n") == 60)
    assert(math.abs(hom.getAs[Double]("slope") - 2.0) < 0.01)
    assert(het.getAs[Double]("lm_stat") >
      5 * hom.getAs[Double]("lm_stat"),
      s"het=${het.getAs[Double]("lm_stat")} hom=${hom.getAs[Double]("lm_stat")}")
  }

  test("chowTest: a regime flip is detected, a shared line is not") {
    import spark.implicits._
    def rows(breakIt: Boolean) = (1 to 40).map { i =>
      val x = (i % 20).toDouble
      val a = i <= 20
      val w = 0.01 * ((i * 3) % 7 - 3)
      val y = if (a || !breakIt) 2 * x + 1 + w else -x + 5 + w
      (x, y, a)
    }
    val split = graft.ops.Regression
      .chowTest(rows(true).toDF("x", "y", "a"), "x", "y", col("a")).head
    assert(split.getAs[Long]("n_a") == 20 && split.getAs[Long]("n_b") == 20)
    assert(split.getAs[Double]("f_stat") > 100)
    assert(split.getAs[Double]("rss_pooled") >
      split.getAs[Double]("rss_a") + split.getAs[Double]("rss_b"))
    val same = graft.ops.Regression
      .chowTest(rows(false).toDF("x", "y", "a"), "x", "y", col("a")).head
    assert(same.getAs[Double]("f_stat") < 5)
    // a degenerate regime yields NULL outputs, never a divide error
    val tiny = Seq((1.0, 1.0, true), (2.0, 2.0, true), (3.0, 3.0, true),
      (4.0, 4.0, false)).toDF("x", "y", "a")
    val t = graft.ops.Regression.chowTest(tiny, "x", "y", col("a")).head
    assert(t.isNullAt(t.fieldIndex("f_stat")))
  }

  test("expectedReciprocalRank: cascade semantics by hand") {
    import spark.implicits._
    // one query, ranks 1..3 with gains 3, 0, 3 (maxGain 3):
    // R = (7/8, 0, 7/8); ERR = 7/8 + 0 + (1/3)(7/8)(1/8)
    val res = Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3))
      .toDF("query", "doc", "rank")
    val rel = Seq(("q", "a", 3), ("q", "b", 0), ("q", "c", 3))
      .toDF("query", "doc", "gain")
    val r = graft.ops.Retrieval
      .expectedReciprocalRank(res, rel, "query", "doc", "rank", "gain",
        maxGain = 3, k = 10).head
    val want = 7.0 / 8 + (1.0 / 3) * (7.0 / 8) * (1.0 / 8)
    assert(r.getAs[Long]("n_results") == 3)
    assert(math.abs(r.getAs[Double]("err_at_k") - want) < 1e-12)
    // perfect doc at rank 1 dominates any later arrangement
    val res2 = Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3))
      .toDF("query", "doc", "rank")
    val relLate = Seq(("q", "a", 0), ("q", "b", 0), ("q", "c", 3))
      .toDF("query", "doc", "gain")
    val late = graft.ops.Retrieval
      .expectedReciprocalRank(res2, relLate, "query", "doc", "rank",
        "gain", 3, 10).head.getAs[Double]("err_at_k")
    assert(late < r.getAs[Double]("err_at_k"))
    // ungraded docs default to gain 0 (left join semantics)
    val sparse = graft.ops.Retrieval
      .expectedReciprocalRank(res, rel.where(col("doc") === "a"),
        "query", "doc", "rank", "gain", 3, 10).head
    assert(math.abs(sparse.getAs[Double]("err_at_k") - 7.0 / 8) < 1e-12)
  }

  test("cumulativeIncidence: hand Aalen-Johansen, mass conservation") {
    import spark.implicits._
    val noCens = Seq((1.0, 1), (2.0, 2), (3.0, 1)).toDF("t", "c")
    val out = graft.analysis.AnalysisPlanner
      .cumulativeIncidence(noCens, "t", "c")
      .collect().map(r => (r.getAs[Double]("duration"),
        r.getAs[Int]("cause")) -> r.getAs[Double]("cif")).toMap
    assert(math.abs(out((1.0, 1)) - 1.0 / 3) < 1e-12)
    assert(math.abs(out((2.0, 2)) - 1.0 / 3) < 1e-12)
    assert(math.abs(out((3.0, 1)) - 2.0 / 3) < 1e-12)
    // no censoring: total incidence at the horizon is exactly 1
    assert(math.abs(out((3.0, 1)) + out((2.0, 2)) - 1.0) < 1e-12)
    // a censored subject shrinks later risk sets, not earlier CIFs
    val cens = Seq((1.0, 1), (2.0, 2), (2.5, 0), (3.0, 1))
      .toDF("t", "c")
    val o2 = graft.analysis.AnalysisPlanner
      .cumulativeIncidence(cens, "t", "c")
      .collect().map(r => (r.getAs[Double]("duration"),
        r.getAs[Int]("cause")) -> r.getAs[Double]("cif")).toMap
    assert(math.abs(o2((1.0, 1)) - 0.25) < 1e-12)
    assert(math.abs(o2((2.0, 2)) - 0.25) < 1e-12)
    assert(math.abs(o2((3.0, 1)) - 0.75) < 1e-12)
  }

  test("overdispersionTest: clumped counts score far above mild ones") {
    import spark.implicits._
    def frame(clumped: Boolean) = (1 to 10).flatMap { _ =>
      val lo = if (clumped) Seq(0.0, 0.0, 0.0, 16.0)
        else Seq(1.0, 3.0, 5.0, 7.0)
      val hi = if (clumped) Seq(0.0, 0.0, 0.0, 32.0)
        else Seq(2.0, 6.0, 10.0, 14.0)
      lo.map((0.0, _)) ++ hi.map((1.0, _))
    }.toDF("x", "y")
    // 8 Newton rounds: the exp-link overshoot from beta=0 on this
    // synthetic needs a few extra steps to settle (fixed-count
    // contract — the caller picks the budget)
    val mild = graft.ops.Regression
      .overdispersionTest(frame(false), "x", col("y"), 8).head
    val over = graft.ops.Regression
      .overdispersionTest(frame(true), "x", col("y"), 8).head
    assert(mild.getAs[Long]("n") == 80)
    // same fitted means in both designs (same per-level averages)
    assert(math.abs(mild.getAs[Double]("mu_mean") -
      over.getAs[Double]("mu_mean")) < 1e-6)
    // alpha is the dispersion MAGNITUDE (clumps dominate); t is
    // evidence strength — both designs depart from equidispersion
    // here, so both t's are positive and large
    assert(over.getAs[Double]("alpha") >
      5 * mild.getAs[Double]("alpha"))
    assert(over.getAs[Double]("t_stat") > 3.0)
    assert(mild.getAs[Double]("t_stat") > 3.0)
  }

  test("contingencyResiduals: hand 2x2 residuals and chi2") {
    import spark.implicits._
    val rows = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val out = graft.analysis.AnalysisPlanner
      .contingencyResiduals(rows.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"))
        -> r).toMap
    val c = out(("a1", "b1"))
    assert(c.getAs[Long]("n") == 30)
    assert(math.abs(c.getAs[Double]("expected") - 20.0) < 1e-12)
    assert(math.abs(c.getAs[Double]("std_residual") -
      10.0 / math.sqrt(20)) < 1e-12)
    assert(math.abs(c.getAs[Double]("adj_residual") -
      10.0 / math.sqrt(5)) < 1e-12)
    assert(math.abs(c.getAs[Double]("chi2") - 20.0) < 1e-12)
    // off-diagonal cells mirror with the opposite sign
    assert(math.abs(out(("a1", "b2")).getAs[Double]("std_residual") +
      10.0 / math.sqrt(20)) < 1e-12)
  }

  test("controlContrasts: hand Welch z vs the designated control") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0).map(("ctl", _)) ++
      Seq(4.0, 6.0).map(("t1", _)) ++
      Seq(1.0, 1.0, 1.0).map(("t2", _)) ++
      Seq(("solo", 9.0))).toDF("g", "v")
    val out = graft.analysis.AnalysisPlanner
      .controlContrasts(df, "g", "v", "ctl")
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    // control itself and the n<2 arm are absent
    assert(out.keySet == Set("t1", "t2"))
    val t1 = out("t1")
    assert(math.abs(t1.getAs[Double]("diff_vs_control") - 3.0) < 1e-12)
    // Welch se: s1²/n1 + sc²/nc = 2/2 + 1/3
    assert(math.abs(t1.getAs[Double]("se") -
      math.sqrt(1.0 + 1.0 / 3)) < 1e-12)
    assert(math.abs(t1.getAs[Double]("z") -
      3.0 / math.sqrt(4.0 / 3)) < 1e-12)
    // constant arm: zero own variance, control variance still counts
    val t2 = out("t2")
    assert(math.abs(t2.getAs[Double]("se") -
      math.sqrt(1.0 / 3)) < 1e-12)
    assert(t2.getAs[Double]("z") < 0)
  }

  test("sprtBinary: boundaries decide in the right direction") {
    import spark.implicits._
    def stream(convEvery: Int) = (1 to 200).map { i =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays((i - 1) / 10)
          .atTime(8, 0)), i % convEvery == 0)
    }
    // ~50% conversions ≫ p1 = 0.22 → reject H0, and early
    val hot = graft.analysis.AnalysisPlanner
      .sprtBinary(stream(2).toDF("ts", "c"), "ts", col("c"),
        0.18, 0.22, 0.05, 0.2).head
    assert(hot.getAs[String]("decision") == "reject_h0")
    assert(!hot.isNullAt(hot.fieldIndex("first_decision_day")))
    assert(hot.getAs[Double]("llr_final") >
      hot.getAs[Double]("upper_bound"))
    // ~2% conversions ≪ p0 = 0.18 → accept H0
    val cold = graft.analysis.AnalysisPlanner
      .sprtBinary(stream(50).toDF("ts", "c"), "ts", col("c"),
        0.18, 0.22, 0.05, 0.2).head
    assert(cold.getAs[String]("decision") == "accept_h0")
    assert(cold.getAs[Double]("llr_final") <
      cold.getAs[Double]("lower_bound"))
    // counters surface
    assert(hot.getAs[Long]("n") == 200 &&
      hot.getAs[Long]("conversions") == 100)
  }

  test("qqTable: identical arms on the diagonal, shift moves it") {
    import spark.implicits._
    val vals = (1 to 100).map(_.toDouble)
    val same = (vals.map((_, 0L)) ++ vals.map((_, 1L))).toDF("v", "u")
    val out = graft.analysis.AnalysisPlanner
      .qqTable(same, "v", col("u") % 2 === 0, Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getAs[Double]("prob") -> r).toMap
    out.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("qq_diff")) < 1e-12)
      assert(math.abs(r.getAs[Double]("qq_ratio") - 1.0) < 1e-12)
    }
    // median of 1..100 is the interpolated 50.5
    assert(math.abs(out(0.5).getAs[Double]("q_a") - 50.5) < 1e-12)
    // arm a shifted +10: every quantile gap is exactly 10
    val shifted = (vals.map(v => (v + 10, 0L)) ++ vals.map((_, 1L)))
      .toDF("v", "u")
    graft.analysis.AnalysisPlanner
      .qqTable(shifted, "v", col("u") % 2 === 0, Seq(0.25, 0.5, 0.75))
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("qq_diff") - 10.0) < 1e-12)
      }
  }

  test("calibrationZTest: perfect probabilities ≈ 0, extreme ones flag") {
    import spark.implicits._
    // y follows p exactly in aggregate: for each p-cell, the label
    // rate equals p → the numerator cancels cell by cell
    val calibrated = Seq.fill(3)((1.0, 0.75)) ++ Seq((0.0, 0.75)) ++
      Seq((1.0, 0.25)) ++ Seq.fill(3)((0.0, 0.25))
    val r = graft.ops.Evaluation
      .calibrationZTest(calibrated.toDF("y", "s"), "y", "s").head
    assert(r.getAs[Long]("n") == 8)
    assert(math.abs(r.getAs[Double]("z_stat")) < 1e-9)
    assert(math.abs(r.getAs[Double]("base_rate") - 0.5) < 1e-12)
    // overconfident scores: claims 0.9/0.1 while truth is 50/50 →
    // outcomes regress toward the middle → strongly positive z
    val extreme = Seq((1.0, 0.9), (0.0, 0.9), (1.0, 0.1), (0.0, 0.1),
      (1.0, 0.9), (0.0, 0.9), (1.0, 0.1), (0.0, 0.1))
    val r2 = graft.ops.Evaluation
      .calibrationZTest(extreme.toDF("y", "s"), "y", "s").head
    assert(r2.getAs[Double]("z_stat") > 2,
      s"overconfidence must flag, got ${r2.getAs[Double]("z_stat")}")
  }

  test("horizonBacktest: linear ramp errors scale with the horizon") {
    import spark.implicits._
    // y = 3t: the naive-h forecast misses by exactly 3h everywhere
    val df = (0 until 30).map(t => ("k", t.toLong, 3.0 * t))
      .toDF("k", "t", "y")
    val out = graft.ops.Evaluation
      .horizonBacktest(df, Seq("k"), "t", "y", 3)
      .collect().map(r => r.getAs[Int]("horizon") -> r).toMap
    assert(out.keySet == Set(1, 2, 3))
    (1 to 3).foreach { h =>
      val r = out(h)
      assert(r.getAs[Long]("n_points") == 30 - h)
      assert(math.abs(r.getAs[Double]("mae") - 3.0 * h) < 1e-9)
      assert(math.abs(r.getAs[Double]("rmse") - 3.0 * h) < 1e-9)
    }
    // constant series: every horizon forecasts perfectly
    val flat = (0 until 10).map(t => ("k", t.toLong, 5.0))
      .toDF("k", "t", "y")
    graft.ops.Evaluation.horizonBacktest(flat, Seq("k"), "t", "y", 2)
      .collect().foreach { r =>
        assert(r.getAs[Double]("mae") == 0.0)
        assert(r.getAs[Double]("smape") == 0.0)
      }
  }

  test("binarySampleSize: textbook n for p=0.2 +10% lift") {
    import spark.implicits._
    // 5 events/day over 20 days, one in five converts → p̂ = 0.2
    val rows = (0 until 100).map { i =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 6, 1).plusDays(i / 5).atTime(9, 0)),
        i % 5 == 0)
    }
    val r = graft.ops.Evaluation
      .binarySampleSize(rows.toDF("ts", "c"), "ts", col("c"), 0.10)
      .head
    assert(r.getAs[Long]("n") == 100)
    assert(math.abs(r.getAs[Double]("baseline_rate") - 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("target_rate") - 0.22) < 1e-12)
    // closed form: (1.959964+0.841621)^2 (0.16 + 0.1716) / 0.02^2
    val want = math.ceil(math.pow(1.959964 + 0.841621, 2) *
      (0.2 * 0.8 + 0.22 * 0.78) / math.pow(0.02, 2)).toLong
    assert(r.getAs[Long]("n_per_arm") == want)
    // traffic check: n/day = 5 → 2.5 per arm per day
    assert(math.abs(r.getAs[Double]("days_per_arm") -
      want / 2.5) < 1e-6)
    // bigger lift needs far fewer subjects
    val big = graft.ops.Evaluation
      .binarySampleSize(rows.toDF("ts", "c"), "ts", col("c"), 0.5)
      .head
    assert(big.getAs[Long]("n_per_arm") < want / 10)
  }

  test("kSampleAndersonDarling: k=2 equals the two-sample statistic") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.5), ("a", 4.0), ("a", 6.0),
      ("b", 2.0), ("b", 3.0), ("b", 5.0), ("b", 5.0), ("b", 7.0))
    val df = rows.toDF("g", "v")
    val k2 = graft.analysis.AnalysisPlanner
      .kSampleAndersonDarling(df, "g", "v").head
    val two = graft.analysis.AnalysisPlanner
      .andersonDarling(df, "v", col("g") === "a").head
    assert(k2.getAs[Long]("n") == 9 && k2.getAs[Long]("n_groups") == 2)
    assert(math.abs(k2.getAs[Double]("ad_stat") -
      two.getAs[Double]("a2")) < 1e-12,
      s"k=2 must reduce: ${k2.getAs[Double]("ad_stat")} vs " +
        s"${two.getAs[Double]("a2")}")
    // a clearly shifted third group inflates the statistic
    val shifted = (rows ++ Seq.tabulate(5)(i => ("c", 50.0 + i)))
      .toDF("g", "v")
    val k3 = graft.analysis.AnalysisPlanner
      .kSampleAndersonDarling(shifted, "g", "v").head
    assert(k3.getAs[Long]("n_groups") == 3)
    assert(k3.getAs[Double]("ad_stat") > k2.getAs[Double]("ad_stat"))
  }

  test("moodMedianTest: hand 2x2 split and at-median drop") {
    import spark.implicits._
    // pooled median of 1..8 is 4.5; group a sits below, b above
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(5.0, 6.0, 7.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .moodMedianTest(df, "g", "v").head
    assert(r.getAs[Long]("n") == 8 && r.getAs[Long]("n_groups") == 2)
    assert(math.abs(r.getAs[Double]("pooled_median") - 4.5) < 1e-12)
    // perfect separation in a 2×2 with all margins 4: chi2 = 8
    assert(math.abs(r.getAs[Double]("chi2") - 8.0) < 1e-12)
    assert(r.getAs[Long]("dof") == 1)
    // identical groups: chi2 exactly 0; at-median values drop from n
    val same = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(1.0, 2.0, 3.0).map(("b", _))).toDF("g", "v")
    val r2 = graft.analysis.AnalysisPlanner
      .moodMedianTest(same, "g", "v").head
    assert(math.abs(r2.getAs[Double]("chi2")) < 1e-12)
    assert(r2.getAs[Long]("n") == 4, "the two at-median rows drop")
  }

  test("keyness: planted over-represented terms surface signed") {
    import spark.implicits._
    val docs = Seq(
      ("en", "alpha alpha alpha common word"),
      ("en", "alpha alpha common word word"),
      ("de", "beta beta beta common word"),
      ("de", "beta beta common word word")).toDF("lang", "text")
    val out = graft.ops.TextAnalysis
      .keyness(docs, "text", col("lang") === "en", k = 10, minCount = 1)
      .collect()
    val byTerm = out.map(r => r.getAs[String]("term") ->
      r.getAs[Double]("keyness")).toMap
    assert(byTerm("alpha") > 0, "focus-side term must be positive")
    assert(byTerm("beta") < 0, "reference-side term must be negative")
    assert(math.abs(math.abs(byTerm("alpha")) - math.abs(byTerm("beta")))
      < 1e-9)
    // balanced terms carry ~zero keyness and rank last
    assert(math.abs(byTerm("common")) < 1e-9)
    assert(out.head.getAs[String]("term") != "common")
    // counts surface
    val alpha = out.find(_.getAs[String]("term") == "alpha").get
    assert(alpha.getAs[Long]("n_focus") == 5 &&
      alpha.getAs[Long]("n_reference") == 0)
  }
  test("deming: orthogonal fit recovers the identity line; OLS comparison") {
    import spark.implicits._
    // points ON y = 2x + 1 exactly: Deming slope = 2 whatever lambda
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1)).toDF("x", "y")
    val r = graft.ops.Regression.deming(df, "x", "y").head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    // orthogonal-regression hand case: symmetric cross — for data
    // (0,0),(1,1),(1,0),(0,1) cxy = 0 → slope NULL (undefined limit)
    val sym = Seq((0.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0))
      .toDF("x", "y")
    val rs = graft.ops.Regression.deming(sym, "x", "y").head
    assert(rs.isNullAt(rs.fieldIndex("slope")))
  }

  test("ivTwoStage: instrument recovers the causal slope under confounding") {
    import spark.implicits._
    // structural model: x = z + u, y = 3x + 5u (u confounds) — OLS is
    // biased toward the u channel, IV (via z ⟂ u) recovers 3 exactly
    // on a balanced grid of (z, u)
    val rows = for (z <- 1 to 10; u <- -5 to 5) yield {
      val x = z.toDouble + u
      (3.0 * x + 5.0 * u, x, z.toDouble)
    }
    val r = graft.ops.Regression
      .ivTwoStage(rows.toDF("y", "x", "z"), "y", "x", "z").head
    assert(math.abs(r.getAs[Double]("beta_iv") - 3.0) < 1e-9)
    assert(r.getAs[Double]("beta_ols") > 3.5) // confounding bias shows
    assert(r.getAs[Double]("first_stage_f") > 10) // strong instrument
  }

  test("oaxacaBlinder: decomposition reproduces the gap; pure-mix case") {
    import spark.implicits._
    // both groups share y = 2x (same pricing); A has higher x — the
    // whole gap must be EXPLAINED
    val a = (5 to 14).map(i => (true, i.toDouble, 2.0 * i))
    val b = (1 to 10).map(i => (false, i.toDouble, 2.0 * i))
    val r = graft.ops.Regression.oaxacaBlinder(
      (a ++ b).toDF("ga", "x", "y"), "x", "y", col("ga")).head
    val gap = r.getAs[Double]("gap")
    assert(math.abs(gap - 8.0) < 1e-9) // 2·(mean 9.5 − mean 5.5)
    assert(math.abs(r.getAs[Double]("explained") - gap) < 1e-9)
    assert(math.abs(r.getAs[Double]("unexplained")) < 1e-9)
    // decomposition identity on arbitrary data
    val rnd = new scala.util.Random(7)
    val mixed = (1 to 200).map { i =>
      val g = i % 2 == 0
      val x = rnd.nextDouble() * 10 + (if (g) 2 else 0)
      (g, x, x * (if (g) 3 else 2) + rnd.nextGaussian())
    }
    val m = graft.ops.Regression.oaxacaBlinder(
      mixed.toDF("ga", "x", "y"), "x", "y", col("ga")).head
    assert(math.abs(m.getAs[Double]("gap") -
      (m.getAs[Double]("explained") + m.getAs[Double]("unexplained")))
      < 1e-9)
  }

  test("concordanceMetrics: identity agreement 1; shift moves bias not r") {
    import spark.implicits._
    val same = (1 to 40).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val r = graft.ops.Evaluation.concordanceMetrics(same, "x", "y").head
    assert(math.abs(r.getAs[Double]("ccc") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("bias")) < 1e-12)
    // constant shift: pearson stays 1, CCC drops, bias = shift
    val shifted = (1 to 40).map(i => (i.toDouble, i + 5.0)).toDF("x", "y")
    val s = graft.ops.Evaluation.concordanceMetrics(shifted, "x", "y").head
    assert(math.abs(s.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(s.getAs[Double]("ccc") < 1.0)
    assert(math.abs(s.getAs[Double]("bias") + 5.0) < 1e-12)
    assert(math.abs(s.getAs[Double]("loa_high") -
      (s.getAs[Double]("bias") + 1.96 * s.getAs[Double]("sd_diff"))) < 1e-12)
  }

  test("mccByThreshold: hand confusion cells; perfect separation hits 1") {
    import spark.implicits._
    // scores 1..4, positives at 3,4 → at threshold 3: perfect split
    val df = Seq((0.0, 1.0), (0.0, 2.0), (1.0, 3.0), (1.0, 4.0))
      .toDF("y", "p")
    val out = graft.ops.Evaluation.mccByThreshold(df, "y", "p")
      .orderBy("threshold").collect()
    assert(out.length == 4)
    val at3 = out.find(_.getAs[Double]("threshold") == 3.0).get
    assert(at3.getAs[Long]("tp") == 2 && at3.getAs[Long]("tn") == 2 &&
      at3.getAs[Long]("fp") == 0 && at3.getAs[Long]("fn") == 0)
    assert(math.abs(at3.getAs[Double]("mcc") - 1.0) < 1e-12)
    assert(math.abs(at3.getAs[Double]("f1") - 1.0) < 1e-12)
    // threshold 1 predicts ALL positive → denominator zero → NULL mcc
    val at1 = out.find(_.getAs[Double]("threshold") == 1.0).get
    assert(at1.isNullAt(at1.fieldIndex("mcc")))
  }

  test("eValue: hand 2x2 risk ratio and the VanderWeele formula") {
    import spark.implicits._
    // exposed: 30/100 events; unexposed: 10/100 → RR = 3
    val rows = Seq.fill(30)((true, true)) ++ Seq.fill(70)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(90)((false, false))
    val df = rows.toDF("e", "y")
    val r = graft.ops.Evaluation.eValue(df, col("e"), col("y")).head
    assert(math.abs(r.getAs[Double]("rr") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_value") -
      (3.0 + math.sqrt(3.0 * 2.0))) < 1e-12)
    assert(r.getAs[Double]("rr_ci_low") > 1) // significant → CI e-value set
    assert(!r.isNullAt(r.fieldIndex("e_value_ci")))
  }

  test("theilU: perfect association 1, independence 0, asymmetry") {
    import spark.implicits._
    // b determined by a → U(b|a) = 1; a has 4 values, b only 2 →
    // U(a|b) < 1 (can't recover a from b)
    val det = (1 to 100).map(i => (i % 4, (i % 4) / 2)).toDF("a", "b")
    val r = graft.analysis.AnalysisPlanner.theilU(det, "a", "b").head
    assert(math.abs(r.getAs[Double]("u_b_given_a") - 1.0) < 1e-12)
    assert(r.getAs[Double]("u_a_given_b") < 0.6)
    // independent uniform grid → MI = 0
    val ind = (for (a <- 0 to 3; b <- 0 to 2) yield (a, b)).toDF("a", "b")
    val ri = graft.analysis.AnalysisPlanner.theilU(ind, "a", "b").head
    assert(math.abs(ri.getAs[Double]("mutual_info")) < 1e-12)
  }

  test("cochranQ: hand value vs the classic formula; incomplete dropped") {
    import spark.implicits._
    // 4 subjects × 3 treatments; successes: t1 {1,2,3}, t2 {1}, t3 {}
    val rows = for (b <- 1 to 4; t <- 1 to 3) yield
      (b, s"t$t", if (t == 1 && b <= 3 || t == 2 && b == 1) 1.0 else 0.0)
    // plus an incomplete subject (only t1) that must be dropped
    val df = (rows :+ ((9, "t1", 1.0))).toDF("b", "t", "s")
    val r = graft.analysis.AnalysisPlanner.cochranQ(df, "b", "t", "s").head
    assert(r.getAs[Long]("n_blocks") == 4)
    // hand: k=3, G=(3,1,0) → ΣG²=10, T=4, ΣB²=(2²+1+1+0)=6
    // → Q = k(k−1)·(ΣG² − T²/k)/(kT − ΣB²) = 6·(10−16/3)/6
    val expect = 3.0 * 2 * (10.0 - 16.0 / 3) / (3 * 4 - 6.0)
    assert(math.abs(r.getAs[Double]("q_stat") - expect) < 1e-9)
  }

  test("iccOneWay: identical-within groups → 1; balanced k0 = k") {
    import spark.implicits._
    val df = (1 to 10).flatMap(g => Seq((g, g * 10.0), (g, g * 10.0),
      (g, g * 10.0))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.iccOneWay(df, "g", "v").head
    assert(math.abs(r.getAs[Double]("k0") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("icc1") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ms_within")) < 1e-9)
  }

  test("pageTrend: monotone blocks hit the max L; ties deterministic") {
    import spark.implicits._
    // 6 blocks, 3 treatments, value strictly increasing in treatment →
    // every block ranks 1,2,3 → L = n·Σj·j = 6·14 = 84, z > 0
    val df = (for (b <- 1 to 6; t <- 1 to 3)
      yield (b, t, t * 10.0 + b)).toDF("b", "t", "v")
    val r = graft.analysis.AnalysisPlanner
      .pageTrend(df, "b", "t", "v", col("t")).head
    assert(r.getAs[Long]("n_blocks") == 6)
    assert(math.abs(r.getAs[Double]("l_stat") - 84.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_l") - 72.0) < 1e-9) // 6·3·16/4
    assert(r.getAs[Double]("z") > 2)
  }

  test("vif: orthogonal features 1; a near-duplicate blows up") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (a, b, a + 0.01 * rnd.nextGaussian()) // c ≈ a
    }
    val out = graft.analysis.AnalysisPlanner
      .vif(rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect().map(r => r.getAs[String]("feature") ->
        r.getAs[Double]("vif")).toMap
    assert(out("b") < 1.1) // independent → VIF ≈ 1
    assert(out("a") > 50 && out("c") > 50) // collinear pair
  }

  test("ppsSystematic: hit count n exactly, certainty units multi-hit") {
    import spark.implicits._
    val df = ((1 to 99).map(i => (i, 1.0)) :+ ((100, 101.0)))
      .toDF("id", "w") // unit 100 carries half the mass
    val out = graft.ops.Sampling.ppsSystematic(df, 10, "w", "id")
    val hits = out.agg(sum(col("n_hits"))).head.getLong(0)
    assert(hits == 10, s"expected 10 total hits, got $hits")
    val big = out.where(col("id") === 100).head
    assert(big.getAs[Long]("n_hits") >= 5) // w > step → certainty unit
    // inclusion is deterministic: same call, same rows
    val again = graft.ops.Sampling.ppsSystematic(df, 10, "w", "id")
      .select("id").collect().map(_.getInt(0)).sorted
    assert(again.sameElements(
      out.select("id").collect().map(_.getInt(0)).sorted))
  }

  test("isotropyProfile: centered cloud ≈ isotropic, common vector not") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def vec(shift: Double) =
      Array.fill(8)(rnd.nextGaussian()).map(_ + shift).toSeq
    val centered = (1 to 300).map(i => (i, vec(0.0))).toDF("id", "embedding")
    val c = graft.ops.Similarity.isotropyProfile(centered, "embedding").head
    assert(c.getAs[Double]("isotropy") > 0.9)
    val common = (1 to 300).map(i => (i, vec(5.0))).toDF("id", "embedding")
    val k = graft.ops.Similarity.isotropyProfile(common, "embedding").head
    assert(k.getAs[Double]("isotropy") < 0.2)
    assert(k.getAs[Double]("avg_cos_to_mean") > 0.9)
    assert(c.getAs[Long]("dim") == 8)
  }

  test("gwetScottAgreement: paradox case — kappa-family low, AC1 high") {
    import spark.implicits._
    // 95 (yes,yes), 5 disagreements: po=0.95 but yes-prevalence ~0.97
    // → Scott's pe huge, pi small; Gwet's pe small, AC1 stays high
    val rows = Seq.fill(95)(("y", "y")) ++ Seq.fill(3)(("y", "n")) ++
      Seq.fill(2)(("n", "y"))
    val r = graft.ops.Evaluation
      .gwetScottAgreement(rows.toDF("a", "b"), "a", "b").head
    assert(math.abs(r.getAs[Double]("po") - 0.95) < 1e-12)
    assert(r.getAs[Double]("scott_pi") < 0.5)
    assert(r.getAs[Double]("gwet_ac1") > 0.9)
    assert(r.getAs[Long]("n_categories") == 2)
  }

  test("yuleWalkerAr2: white noise ≈ zero phis; AR(1) momentum shows") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    var prev = 0.0
    val rows = (0 until 400).map { i =>
      prev = 0.7 * prev + rnd.nextGaussian()
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2023, 1, 1).plusDays(i).atStartOfDay()),
        prev)
    }
    val r = graft.ops.Regression
      .yuleWalkerAr2(rows.toDF("ts", "v"), "ts", "v").head
    assert(r.getAs[Long]("n_days") == 400)
    assert(math.abs(r.getAs[Double]("phi1") - 0.7) < 0.15)
    assert(math.abs(r.getAs[Double]("phi2")) < 0.15)
    assert(r.getAs[Double]("sigma2") > 0)
  }
  test("flignerKilleen: equal-scale groups small, inflated group flags") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val equal = (1 to 300).map(i => (s"g${i % 3}", rnd.nextGaussian()))
    val re = graft.analysis.AnalysisPlanner
      .flignerKilleen(equal.toDF("g", "v"), "g", "v").head
    assert(re.getAs[Long]("n_groups") == 3 && re.getAs[Long]("dof") == 2)
    assert(re.getAs[Double]("fk_stat") < 10)
    // one group at 8x the scale → statistic far past the χ²(2) tail
    val skewed = (1 to 300).map { i =>
      val g = i % 3
      (s"g$g", rnd.nextGaussian() * (if (g == 0) 8.0 else 1.0))
    }
    val rs = graft.analysis.AnalysisPlanner
      .flignerKilleen(skewed.toDF("g", "v"), "g", "v").head
    assert(rs.getAs[Double]("fk_stat") > 30)
  }

  test("brunnerMunzel: identical halves p=1/2; separated shifts to 1") {
    import spark.implicits._
    val same = ((1 to 50).map(i => (true, i.toDouble)) ++
      (1 to 50).map(i => (false, i.toDouble))).toDF("a", "v")
    val r = graft.analysis.AnalysisPlanner
      .brunnerMunzel(same, "v", col("a")).head
    assert(math.abs(r.getAs[Double]("p_hat") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("bm_stat")) < 1e-9)
    // a strictly below b → P(a<b)=1 → p_hat 1
    val sep = ((1 to 30).map(i => (true, i.toDouble)) ++
      (1 to 30).map(i => (false, 100.0 + i))).toDF("a", "v")
    val rs = graft.analysis.AnalysisPlanner
      .brunnerMunzel(sep, "v", col("a")).head
    assert(math.abs(rs.getAs[Double]("p_hat") - 1.0) < 1e-12)
    assert(rs.getAs[Long]("n_a") == 30 && rs.getAs[Long]("n_b") == 30)
    // complete separation: rank variances 0 → statistic undefined/NULL
    assert(rs.isNullAt(rs.fieldIndex("bm_stat")))
    // partial overlap: statistic defined and strongly positive
    val part = ((1 to 30).map(i => (true, i.toDouble)) ++
      (1 to 30).map(i => (25.0 + i)).map(v => (false, v))).toDF("a", "v")
    val rp = graft.analysis.AnalysisPlanner
      .brunnerMunzel(part, "v", col("a")).head
    assert(rp.getAs[Double]("bm_stat") > 3)
  }

  test("bowkerTest: symmetric table 0; hand asymmetric value") {
    import spark.implicits._
    // symmetric flows: (x,y) 5 and (y,x) 5 → chi2 = 0
    val sym = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x")) ++
      Seq.fill(10)(("x", "x"))).toDF("a", "b")
    val r0 = graft.analysis.AnalysisPlanner.bowkerTest(sym, "a", "b").head
    assert(math.abs(r0.getAs[Double]("chi2")) < 1e-12)
    assert(r0.getAs[Long]("dof") == 1)
    // hand: n_xy=8, n_yx=2 → (8−2)²/10 = 3.6; plus z with no reverse:
    // n_xz=4, n_zx=0 → 16/4 = 4 → chi2 = 7.6, dof = 2
    val asym = (Seq.fill(8)(("x", "y")) ++ Seq.fill(2)(("y", "x")) ++
      Seq.fill(4)(("x", "z"))).toDF("a", "b")
    val r1 = graft.analysis.AnalysisPlanner.bowkerTest(asym, "a", "b").head
    assert(r1.getAs[Long]("dof") == 2)
    assert(math.abs(r1.getAs[Double]("chi2") - 7.6) < 1e-12)
  }

  test("chapmanOverlap: independent halves recover the universe size") {
    import spark.implicits._
    // universe 1..1200; A = multiples of 2, B = multiples of 3 —
    // m = 200, Chapman = 601·401/201 − 1 ≈ 1198
    val df = (1 to 1200).map(i => Tuple1(i)).toDF("k")
    val r = graft.ops.Dedup
      .chapmanOverlap(df, "k", col("k") % 2 === 0, col("k") % 3 === 0)
      .head
    assert(r.getAs[Long]("n_a") == 600 && r.getAs[Long]("n_b") == 400)
    assert(r.getAs[Long]("n_overlap") == 200)
    val est = r.getAs[Double]("chapman_estimate")
    assert(math.abs(est - (601.0 * 401 / 201 - 1)) < 1e-9)
    assert(math.abs(est - 1200) < 5) // recovers the universe
    assert(r.getAs[Double]("unseen_estimate") > 0) // union 800 < est
  }

  test("jackknifeRatio: constant ratio → zero SE; identity holds") {
    import spark.implicits._
    // y = 3x everywhere → every leave-one-out ratio is 3, SE = 0
    val const = (1 to 100).map(i => (i % 8, 3.0 * i, i.toDouble))
      .toDF("g", "y", "x")
    val r = graft.analysis.AnalysisPlanner
      .jackknifeRatio(const, col("g"), "y", "x").head
    assert(math.abs(r.getAs[Double]("ratio") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_jack")) < 1e-9)
    assert(math.abs(r.getAs[Double]("ratio_jack") - 3.0) < 1e-9)
    // noisy ratio: SE positive, CI brackets the point estimate
    val rnd = new scala.util.Random(31)
    val noisy = (1 to 400).map { i =>
      val x = 1.0 + rnd.nextDouble()
      (i % 16, x * (2.0 + rnd.nextGaussian() * 0.3), x)
    }.toDF("g", "y", "x")
    val rn = graft.analysis.AnalysisPlanner
      .jackknifeRatio(noisy, col("g"), "y", "x").head
    assert(rn.getAs[Double]("se_jack") > 0)
    assert(rn.getAs[Double]("ci_low") < rn.getAs[Double]("ratio") &&
      rn.getAs[Double]("ratio") < rn.getAs[Double]("ci_high"))
  }
  test("welchAnova: equal means small F; shifted group flags; df2 sane") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val same = (1 to 300).map(i => (s"g${i % 3}", rnd.nextGaussian()))
    val r0 = graft.analysis.AnalysisPlanner
      .welchAnova(same.toDF("g", "v"), "g", "v").head
    assert(r0.getAs[Double]("f_stat") < 5)
    assert(r0.getAs[Long]("df1") == 2)
    assert(r0.getAs[Double]("df2") > 50)
    // one group shifted by 5 with INFLATED variance in another —
    // Welch stays valid where classic ANOVA's pooled MSW lies
    val shifted = (1 to 300).map { i =>
      val g = i % 3
      val v = rnd.nextGaussian() * (if (g == 1) 5.0 else 1.0) +
        (if (g == 0) 5.0 else 0.0)
      (s"g$g", v)
    }
    val r1 = graft.analysis.AnalysisPlanner
      .welchAnova(shifted.toDF("g", "v"), "g", "v").head
    assert(r1.getAs[Double]("f_stat") > 20)
  }

  test("anovaEffectSizes: groups explain all variance → η² = 1; none → ≈ 0") {
    import spark.implicits._
    val pure = (1 to 90).map(i => (s"g${i % 3}", (i % 3) * 10.0))
    val r1 = graft.analysis.AnalysisPlanner
      .anovaEffectSizes(pure.toDF("g", "v"), "g", "v").head
    assert(math.abs(r1.getAs[Double]("eta_sq") - 1.0) < 1e-12)
    assert(math.abs(r1.getAs[Double]("ss_within")) < 1e-9)
    val rnd = new scala.util.Random(43)
    val none = (1 to 900).map(i => (s"g${i % 3}", rnd.nextGaussian()))
    val r0 = graft.analysis.AnalysisPlanner
      .anovaEffectSizes(none.toDF("g", "v"), "g", "v").head
    assert(r0.getAs[Double]("eta_sq") < 0.02)
    // omega² is the bias-corrected one: at zero true effect it sits
    // closer to 0 than eta² (can go slightly negative)
    assert(r0.getAs[Double]("omega_sq") < r0.getAs[Double]("eta_sq"))
  }

  test("weightedPercentiles: hand weighted median vs the row median") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7 → weighted median = 4
    // (cum weight hits 5 of 10 inside value 4's mass)
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0))
      .toDF("v", "w")
    val out = graft.analysis.AnalysisPlanner
      .weightedPercentiles(df, "v", "w", Seq(0.25, 0.5))
      .collect().map(r => r.getAs[Double]("p") ->
        r.getAs[Double]("value")).toMap
    assert(out(0.5) == 4.0)
    assert(out(0.25) == 3.0) // target 2.5 lands in value 3's (2,3] mass
    // uniform weights reduce to the DISC row percentile
    val unif = (1 to 100).map(i => (i.toDouble, 1.0)).toDF("v", "w")
    val u = graft.analysis.AnalysisPlanner
      .weightedPercentiles(unif, "v", "w", Seq(0.5)).head
    assert(u.getAs[Double]("value") == 50.0)
    assert(u.getAs[Double]("total_weight") == 100.0)
  }

  test("weightedKappa: perfect agreement 1; near-miss beats far-miss") {
    import spark.implicits._
    val perfect = (1 to 50).map(i => (i % 5, i % 5)).toDF("a", "b")
    val rp = graft.ops.Evaluation.weightedKappa(perfect, "a", "b").head
    assert(math.abs(rp.getAs[Double]("kappa_linear") - 1.0) < 1e-12)
    assert(math.abs(rp.getAs[Double]("kappa_quadratic") - 1.0) < 1e-12)
    // same po-by-count, but near-miss disagreements (|d|=1) must score
    // higher weighted kappa than far-miss ones (|d|=4)
    def frame(d: Int) = ((1 to 40).map(i => (i % 5, i % 5)) ++
      (1 to 10).map(i => (0, d))).toDF("a", "b")
    val near = graft.ops.Evaluation.weightedKappa(frame(1), "a", "b").head
    val far = graft.ops.Evaluation.weightedKappa(frame(4), "a", "b").head
    assert(near.getAs[Double]("kappa_linear") >
      far.getAs[Double]("kappa_linear"))
    assert(near.getAs[Double]("kappa_quadratic") >
      far.getAs[Double]("kappa_quadratic"))
  }
  test("concordanceIndex: hand case, censoring rules, brute-force parity") {
    import spark.implicits._
    // perfect risk ordering: higher score → earlier event; censored
    // row (t=3) never serves as the early member
    val hand = Seq((1.0, 1, 3.0), (2.0, 1, 2.0), (3.0, 0, 1.0),
      (4.0, 1, 0.5)).toDF("t", "ev", "p")
    val r = graft.analysis.AnalysisPlanner
      .concordanceIndex(hand, "t", "ev", "p").head
    assert(r.getAs[Long]("comparable_pairs") == 5)
    assert(r.getAs[Long]("concordant") == 5)
    assert(r.getAs[Long]("tied_score") == 0)
    assert(math.abs(r.getAs[Double]("c_index") - 1.0) < 1e-12)
    // reversed scores → C = 0
    val rev = Seq((1.0, 1, 0.5), (2.0, 1, 2.0), (4.0, 1, 3.0))
      .toDF("t", "ev", "p")
    val r0 = graft.analysis.AnalysisPlanner
      .concordanceIndex(rev, "t", "ev", "p").head
    assert(math.abs(r0.getAs[Double]("c_index")) < 1e-12)
    // randomized parity vs a driver-side brute force (ties included)
    val rnd = new scala.util.Random(57)
    val rows = (1 to 200).map(_ => (rnd.nextInt(20) + 1.0,
      if (rnd.nextBoolean()) 1 else 0, (rnd.nextInt(8) + 1).toDouble))
    var comp = 0L; var conc = 0L; var tie = 0L
    for (a <- rows; b <- rows if a._2 == 1 && a._1 < b._1) {
      comp += 1
      if (a._3 > b._3) conc += 1 else if (a._3 == b._3) tie += 1
    }
    val rb = graft.analysis.AnalysisPlanner
      .concordanceIndex(rows.toDF("t", "ev", "p"), "t", "ev", "p").head
    assert(rb.getAs[Long]("comparable_pairs") == comp)
    assert(rb.getAs[Long]("concordant") == conc,
      s"concordant ${rb.getAs[Long]("concordant")} != $conc")
    assert(rb.getAs[Long]("tied_score") == tie)
    assert(math.abs(rb.getAs[Double]("c_index") -
      (conc + 0.5 * tie) / comp) < 1e-12)
  }
  test("categoricalDrift: identical mixes ~0; disjoint mixes large") {
    import spark.implicits._
    // consecutive pairs share a category so both cohorts see the
    // identical c0..c3 mix
    val same = (1 to 400).map(i => (i % 2 == 0, s"c${(i / 2) % 4}"))
      .toDF("a", "cat")
    val r0 = graft.analysis.AnalysisPlanner
      .categoricalDrift(same, "cat", col("a"), !col("a")).head
    assert(math.abs(r0.getAs[Double]("psi")) < 1e-9)
    assert(math.abs(r0.getAs[Double]("max_abs_diff")) < 1e-9)
    // cohort A only sees c0/c1, B only c2/c3 → massive drift
    val disj = (1 to 400).map { i =>
      val a = i % 2 == 0
      (a, if (a) s"c${(i / 2) % 2}" else s"c${2 + (i / 2) % 2}")
    }.toDF("a", "cat")
    val r1 = graft.analysis.AnalysisPlanner
      .categoricalDrift(disj, "cat", col("a"), !col("a")).head
    assert(r1.getAs[Double]("psi") > 5)
    assert(r1.getAs[Double]("js_divergence") > 0.5)
    assert(r1.getAs[Long]("n_categories") == 4)
  }

  test("directStandardizedRates: pure mix effect vanishes after adjustment") {
    import spark.implicits._
    // within each stratum both cohorts have the SAME rate (s1: 10%,
    // s2: 50%) but cohort A is 80% in the high-rate stratum — the
    // crude gap is all composition, the adjusted gap must be ~0
    val rows =
      (1 to 80).map(i => (true, "s2", i <= 40)) ++   // A in s2: 50%
      (1 to 20).map(i => (true, "s1", i <= 2)) ++    // A in s1: 10%
      (1 to 20).map(i => (false, "s2", i <= 10)) ++  // B in s2: 50%
      (1 to 80).map(i => (false, "s1", i <= 8))      // B in s1: 10%
    val r = graft.analysis.AnalysisPlanner.directStandardizedRates(
      rows.toDF("a", "s", "y"), "s", col("a"), col("y")).head
    assert(r.getAs[Double]("crude_diff") > 0.2) // mix-driven gap
    assert(math.abs(r.getAs[Double]("adj_diff")) < 1e-9)
    assert(r.getAs[Long]("n_strata") == 2)
    assert(math.abs(r.getAs[Double]("adj_a") -
      r.getAs[Double]("adj_b")) < 1e-9)
  }

  test("cuzickTrend: monotone dose-response flags; permuted doses do not") {
    import spark.implicits._
    val cells = graft.analysis.AnalysisPlanner.rankCells(
      (1 to 300).map { i =>
        val g = i % 3
        (s"g$g", g * 5.0 + (i % 7))
      }.toDF("g", "v"), "g", "v")
    val up = graft.analysis.AnalysisPlanner
      .cuzickTrendFromCells(cells,
        Seq("g0" -> 1.0, "g1" -> 2.0, "g2" -> 3.0)).head
    assert(up.getAs[Double]("z_stat") > 5.0)
    // same data, dose order scrambled → the trend vanishes
    val perm = graft.analysis.AnalysisPlanner
      .cuzickTrendFromCells(cells,
        Seq("g1" -> 1.0, "g0" -> 2.0, "g2" -> 3.0)).head
    assert(math.abs(perm.getAs[Double]("z_stat")) <
      up.getAs[Double]("z_stat"))
    assert(up.getAs[Long]("n") == 300L)
  }

  test("klotz: same-scale arms ~0; wide-vs-narrow arm flags") {
    import spark.implicits._
    val same = graft.analysis.AnalysisPlanner.rankCells(
      (1 to 400).map(i => (if (i % 2 == 0) "a" else "b",
        (i % 20).toDouble)).toDF("g", "v"), "g", "v")
    val z0 = graft.analysis.AnalysisPlanner
      .klotzFromCells(same, "a", "b").head.getAs[Double]("z_stat")
    assert(math.abs(z0) < 1.0)
    val diff = graft.analysis.AnalysisPlanner.rankCells(
      (1 to 400).map { i =>
        if (i % 2 == 0) ("a", 100.0 + (i % 5))       // narrow
        else ("b", 100.0 + ((i % 21) - 10) * 8.0)    // wide
      }.toDF("g", "v"), "g", "v")
    val z1 = graft.analysis.AnalysisPlanner
      .klotzFromCells(diff, "a", "b").head.getAs[Double]("z_stat")
    assert(z1 > 5.0) // treatment "b" is the wide arm
  }

  test("shapiroFrancia: near-normal scores high, heavy-tail scores lower") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val normal = (1 to 2000).map(_ => rnd.nextGaussian()).toDF("v")
    val wN = graft.analysis.AnalysisPlanner
      .shapiroFrancia(normal, "v").head.getAs[Double]("w_stat")
    assert(wN > 0.99)
    val expo = (1 to 2000).map(_ => -math.log(rnd.nextDouble())).toDF("v")
    val wE = graft.analysis.AnalysisPlanner
      .shapiroFrancia(expo, "v").head.getAs[Double]("w_stat")
    assert(wE < wN && wE < 0.95)
  }

  test("hodgesLehmann: hand Walsh median; pure shift recovered") {
    import spark.implicits._
    // values 1, 2, 6 → Walsh averages 1, 1.5, 2, 3.5, 4, 6 →
    // lower median (3rd of 6) = 2
    val hl = graft.analysis.AnalysisPlanner
      .hodgesLehmann(Seq(1.0, 2.0, 6.0).toDF("v"), "v").head
    assert(hl.getAs[Double]("hl_estimate") == 2.0)
    assert(hl.getAs[Long]("n_walsh") == 6L)
    // symmetric sample shifted by 10 → estimate ≈ 10
    val rnd = new scala.util.Random(11)
    val shifted = (1 to 999).map(_ => 10.0 + rnd.nextGaussian()).toDF("v")
    val s = graft.analysis.AnalysisPlanner
      .hodgesLehmann(shifted, "v").head.getAs[Double]("hl_estimate")
    assert(math.abs(s - 10.0) < 0.2)
    // the guard refuses un-reduced corpus-sized inputs
    intercept[IllegalArgumentException] {
      graft.analysis.AnalysisPlanner.hodgesLehmann(
        (1 to 30).map(_.toDouble).toDF("v"), "v", maxRows = 10).head
    }
  }

  test("qlrSupF: trend break located; homogeneityPanel finds level shift") {
    import spark.implicits._
    // slope flips at day 100 of 200; several events per day so the
    // daily counts carry the trend
    val rows = (1 to 200).flatMap { day =>
      val n = if (day <= 100) day else 200 - day
      (0 until (2 + n / 10)).map(_ =>
        (java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
          .toLocalDateTime.plusDays(day.toLong - 1), 1))
    }.map { case (t, o) => (java.sql.Timestamp.valueOf(t), o) }
    val df = rows.toDF("ts", "one")
    val q = graft.ops.TimeSeries.qlrSupF(df, "ts").head
    val breakDay = q.getAs[java.sql.Date]("break_day").toLocalDate
    assert(math.abs(breakDay.getDayOfYear - 100) <= 3)
    assert(q.getAs[Double]("f_stat") > 10.0)
    // level shift at day 60 of 120 → SNHT break lands there
    val lv = (1 to 120).flatMap { day =>
      val n = if (day <= 60) 3 else 9
      (0 until n).map(_ => java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
          .plusDays(day.toLong - 1)))
    }.map(Tuple1(_)).toDF("ts")
    val h = graft.ops.TimeSeries.homogeneityPanel(lv, "ts").head
    val snhtDay = h.getAs[java.sql.Date]("snht_break_day").toLocalDate
    assert(math.abs(snhtDay.getDayOfYear - 60) <= 2)
    assert(h.getAs[Double]("buishand_r") > 1.5)
  }

  test("bartelsRank + randomnessPanel: alternating vs monotone series") {
    import spark.implicits._
    def series(f: Int => Int): org.apache.spark.sql.DataFrame =
      (1 to 80).flatMap { day =>
        (0 until f(day)).map(_ => java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
            .plusDays(day.toLong - 1)))
      }.map(Tuple1(_)).toDF("ts")
    // alternating 2,12,2,12… → RVN far above 2, every pair flips sign
    val alt = series(d => if (d % 2 == 0) 12 else 2)
    val a = graft.ops.TimeSeries.bartelsRank(alt, "ts").head
    assert(a.getAs[Double]("rvn") > 3.0)
    val ra = graft.ops.TimeSeries.randomnessPanel(alt, "ts").head
    assert(ra.getAs[Long]("turning_points") == 78L) // every interior day
    // strictly increasing counts → RVN near 0, zero turning points,
    // every step an increase
    val mono = series(d => d + 1)
    val m = graft.ops.TimeSeries.bartelsRank(mono, "ts").head
    assert(m.getAs[Double]("rvn") < 0.5)
    val rm = graft.ops.TimeSeries.randomnessPanel(mono, "ts").head
    assert(rm.getAs[Long]("turning_points") == 0L)
    assert(rm.getAs[Long]("n_increases") == 79L)
  }

  test("breslowDay: common OR passes, one flipped stratum flags") {
    import spark.implicits._
    // two strata with identical 2x2 shape (OR equal) → BD ≈ 0
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
      Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val same = (stratum("s1", 30, 20, 15, 35) ++
      stratum("s2", 60, 40, 30, 70)).toDF("s", "t", "y")
    val r0 = graft.ops.Evaluation
      .breslowDay(same, col("t"), col("y"), Seq("s")).head
    assert(r0.getAs[Double]("bd_chi2") < 1e-9)
    assert(r0.getAs[Double]("tarone_chi2") < 1e-6)
    // flip one stratum's association → flags
    val mixed = (stratum("s1", 30, 20, 15, 35) ++
      stratum("s2", 15, 35, 30, 20)).toDF("s", "t", "y")
    val r1 = graft.ops.Evaluation
      .breslowDay(mixed, col("t"), col("y"), Seq("s")).head
    assert(r1.getAs[Double]("bd_chi2") > 6.0)
  }

  test("lexicalRichness + hillDiversity: hand counts on a toy corpus") {
    import spark.implicits._
    // "a a a b b c" → N=6, V=3, V1=1, V2=1, Σm²V_m = 9+4+1 = 14
    val docs = Seq(("a a a b b", "x"), ("c", "x")).toDF("text", "lang")
    val r = graft.ops.TextAnalysis.lexicalRichness(docs, "text").head
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("vocabulary") == 3L)
    assert(math.abs(r.getAs[Double]("yule_k") -
      1e4 * (14.0 - 6) / 36) < 1e-9)
    assert(math.abs(r.getAs[Double]("simpson_d") -
      (6.0 + 2.0) / 30) < 1e-9) // Σm(m−1)Vm = 6+2
    assert(math.abs(r.getAs[Double]("sichel_s") - 1.0 / 3) < 1e-9)
    // uniform token distribution → all three Hill numbers = V
    val unif = Seq(("p q r s", "en")).toDF("text", "lang")
    val h = graft.ops.TextAnalysis.hillDiversity(unif, "text", "lang").head
    assert(h.getAs[Long]("hill_q0") == 4L)
    assert(math.abs(h.getAs[Double]("hill_q1") - 4.0) < 1e-9)
    assert(math.abs(h.getAs[Double]("hill_q2") - 4.0) < 1e-9)
  }

  test("hausmanIvOls: clean exogenous x → OLS and IV agree, small H") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map { _ =>
      val z = rnd.nextGaussian()
      val x = 2.0 * z + rnd.nextGaussian() // x moved by z, no confounder
      val y = 3.0 * x + rnd.nextGaussian()
      (y, x, z)
    }
    val r = graft.ops.Regression
      .hausmanIvOls(rows.toDF("y", "x", "z"), "y", "x", "z").head
    assert(math.abs(r.getAs[Double]("beta_ols") - 3.0) < 0.1)
    assert(math.abs(r.getAs[Double]("beta_iv") - 3.0) < 0.2)
    // exogenous design: either the variance gap is non-positive
    // (NULL stat, the guard) or the statistic is small
    assert(r.isNullAt(r.fieldIndex("hausman_stat")) ||
      r.getAs[Double]("hausman_stat") < 6.0)
  }

  test("weightedLogRankPanel: symmetric arms → all four z ≈ 0; shift flags all") {
    import spark.implicits._
    val sym = (1 to 60).map(i => ((i + 1) / 2, 1,
      if (i % 2 == 0) "a" else "b")).toDF("dur", "ev", "arm")
    val r0 = graft.analysis.AnalysisPlanner
      .weightedLogRankPanel(sym, "dur", "ev", "arm", "a", "b").head
    Seq("z_logrank", "z_gehan", "z_tarone_ware", "z_peto").foreach { c =>
      assert(math.abs(r0.getAs[Double](c)) < 1e-9, c)
    }
    // arm a fails much earlier → every member flags, same sign
    val sep = ((1 to 30).map(i => (i, 1, "a")) ++
      (1 to 30).map(i => (i + 40, 1, "b"))).toDF("dur", "ev", "arm")
    val r1 = graft.analysis.AnalysisPlanner
      .weightedLogRankPanel(sep, "dur", "ev", "arm", "a", "b").head
    Seq("z_logrank", "z_gehan", "z_tarone_ware", "z_peto").foreach { c =>
      assert(r1.getAs[Double](c) > 3.0, c)
    }
  }

  test("medianSurvival: no censoring → sample median; CI brackets it") {
    import spark.implicits._
    // n = 99 keeps S strictly off the 0.5 boundary (S(49) = 50/99,
    // S(50) = 49/99) — the crossing is fp-robust at t = 50
    val df = (1 to 99).map(i => (i, 1)).toDF("dur", "ev")
    val r = graft.analysis.AnalysisPlanner
      .medianSurvival(df, "dur", "ev").head
    assert(r.getAs[Double]("median_time") == 50.0)
    assert(r.getAs[Long]("n_events") == 99L)
    val lo = r.getAs[Double]("ci_lower_time")
    val hi = r.getAs[Double]("ci_upper_time")
    assert(lo <= 50.0 && 50.0 <= hi)
  }

  test("winsorizedCorrelation: outlier kills pearson, winsorized survives") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val clean = (1 to 500).map { _ =>
      val x = rnd.nextGaussian(); (x, 2.0 * x + 0.1 * rnd.nextGaussian())
    }
    // one catastrophic leverage point
    val df = (clean :+ ((40.0, -400.0))).toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner
      .winsorizedCorrelation(df, "x", "y", 0.05).head
    assert(r.getAs[Double]("winsorized_r") > 0.9)
    assert(r.getAs[Double]("pearson_r") < r.getAs[Double]("winsorized_r"))
    assert(r.getAs[Double]("x_lo") < r.getAs[Double]("x_hi"))
  }

  test("hoeffdingsD: U-shape flags where monotone measures are blind") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // y = (x - 2)² on 5 x-categories: strong NON-monotone dependence
    val ushape = (1 to 2000).map { _ =>
      val xi = rnd.nextInt(5)
      (s"g$xi", (xi - 2.0) * (xi - 2.0) + 0.05 * rnd.nextGaussian())
    }.toDF("x", "y")
    val dU = graft.analysis.AnalysisPlanner
      .hoeffdingsD(ushape, "x", "y").head.getAs[Double]("d_stat")
    // independent noise: D near 0
    val indep = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(5)}", rnd.nextGaussian())
    }.toDF("x", "y")
    val d0 = graft.analysis.AnalysisPlanner
      .hoeffdingsD(indep, "x", "y").head.getAs[Double]("d_stat")
    assert(dU > 0.05)
    assert(math.abs(d0) < 0.01)
    // sanity on the brute-force definition for a tiny frame:
    // perfect monotone pairing → D at its positive extreme region
    val mono = (1 to 100).map(i => (f"g$i%03d", i.toDouble)).toDF("x", "y")
    val dM = graft.analysis.AnalysisPlanner
      .hoeffdingsD(mono, "x", "y", maxXCats = 128).head
      .getAs[Double]("d_stat")
    assert(dM > 0.9)
  }

  test("cochranC: equal variances → C ≈ 1/k; one noisy group flags") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val eq = (1 to 900).map(i => (s"g${i % 3}", rnd.nextGaussian()))
      .toDF("g", "v")
    val c0 = graft.analysis.AnalysisPlanner
      .cochranC(eq, "g", "v").head
    assert(math.abs(c0.getAs[Double]("c_stat") - 1.0 / 3) < 0.1)
    val noisy = (1 to 900).map { i =>
      val g = i % 3
      (s"g$g", rnd.nextGaussian() * (if (g == 0) 10.0 else 1.0))
    }.toDF("g", "v")
    val c1 = graft.analysis.AnalysisPlanner
      .cochranC(noisy, "g", "v").head
    assert(c1.getAs[Double]("c_stat") > 0.9)
  }

  test("skillingsMack: consistent block preference flags; noise does not") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // every block ranks t2 > t1 > t0; some blocks missing one cell
    val strong = (1 to 120).flatMap { b =>
      val cells = Seq(("t0", 1.0), ("t1", 2.0), ("t2", 3.0))
      val kept = if (b % 3 == 0) cells.drop(1) else cells
      kept.map { case (t, v) => (s"b$b", t, v + 0.01 * rnd.nextGaussian()) }
    }.toDF("blk", "trt", "v")
    val r1 = graft.analysis.AnalysisPlanner
      .skillingsMack(strong, "blk", "trt", "v").head
    assert(r1.getAs[Double]("sm_stat") > 50.0)
    assert(r1.getAs[Long]("dof") == 2L)
    val noise = (1 to 120).flatMap { b =>
      Seq("t0", "t1", "t2").filter(_ => rnd.nextDouble() > 0.2)
        .map(t => (s"b$b", t, rnd.nextGaussian()))
    }.toDF("blk", "trt", "v")
    val r0 = graft.analysis.AnalysisPlanner
      .skillingsMack(noise, "blk", "trt", "v").head
    assert(r0.isNullAt(r0.fieldIndex("sm_stat")) ||
      r0.getAs[Double]("sm_stat") < 10.0)
  }

  test("termDispersion + burrowsDelta: clumped terms flag, shared style ≈ 0") {
    import spark.implicits._
    // "spam" lives only in source s1; "the" spreads with corpus mass
    val docs = (1 to 40).map { i =>
      val src = if (i <= 20) "s1" else "s2"
      val body = if (src == "s1") "the spam spam spam word"
                 else "the word word other filler"
      (body, src, if (i % 2 == 0) "en" else "fr")
    }.toDF("text", "source", "lang")
    val dp = graft.ops.TextAnalysis
      .termDispersion(docs, "text", "source", minCount = 10, k = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("dp")).toMap
    assert(dp("spam") > dp("the")) // single-source clump ranks above
    assert(dp("spam") > 0.4)
    // identical texts in both langs → z-profiles equal → delta ≈ 0
    val same = (1 to 40).map(i =>
      ("alpha beta gamma delta", if (i % 2 == 0) "en" else "fr"))
      .toDF("text", "lang")
    val bd = graft.ops.TextAnalysis
      .burrowsDelta(same, "text", "lang", k = 4).collect()
    // all groups share the exact frequency profile → every term's sd
    // is 0 → no term survives, zero pair rows (degenerate convention)
    assert(bd.isEmpty)
    // distinct styles → a positive delta for the pair
    val styled = (1 to 40).map { i =>
      if (i % 2 == 0) ("alpha alpha alpha beta", "en")
      else ("beta beta beta alpha", "fr")
    }.toDF("text", "lang")
    val bd2 = graft.ops.TextAnalysis
      .burrowsDelta(styled, "text", "lang", k = 2).collect()
    assert(bd2.length == 1 && bd2(0).getAs[Double]("delta") > 1.0)
  }

  test("siegelSlopes: exact linear daily trend recovered exactly") {
    import spark.implicits._
    // 3 + 2·day events per day → slope exactly 2
    val rows = (1 to 40).flatMap { day =>
      (0 until (3 + 2 * day)).map(_ => java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 5, 1, 0, 0)
          .plusDays(day.toLong - 1)))
    }.map(Tuple1(_)).toDF("ts")
    val r = graft.ops.TimeSeries.siegelSlopes(rows, "ts").head
    assert(r.getAs[Double]("siegel_slope") == 2.0)
    assert(r.getAs[Long]("n_days") == 40L)
    assert(r.getAs[Long]("n_pairs") == 40L * 39)
  }

  test("tukeyHsd + gamesHowell: identical groups → zero stats, k*(k-1)/2 pairs") {
    import spark.implicits._
    val df = Seq("a", "b", "c").flatMap(g =>
      (1 to 20).map(i => (g, i.toDouble))).toDF("g", "v")
    val t = graft.analysis.AnalysisPlanner.tukeyHsd(df, "g", "v")
      .orderBy("group_a", "group_b").collect()
    assert(t.length == 3)
    t.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_diff")) < 1e-12)
      assert(math.abs(r.getAs[Double]("q_stat")) < 1e-9)
      assert(r.getAs[Long]("df_error") == 57L)
    }
    val gh = graft.analysis.AnalysisPlanner.gamesHowell(df, "g", "v")
      .collect()
    assert(gh.length == 3)
    gh.foreach { r =>
      assert(math.abs(r.getAs[Double]("t_stat")) < 1e-9)
      // equal n, equal var → Welch df = 2(n-1) exactly
      assert(math.abs(r.getAs[Double]("df_welch") - 38.0) < 1e-6)
    }
  }

  test("tukeyHsd: separated means flag; q grows with the gap") {
    import spark.implicits._
    val df = ((1 to 30).map(i => ("lo", i % 5 + 0.0)) ++
      (1 to 30).map(i => ("hi", i % 5 + 10.0))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.tukeyHsd(df, "g", "v").head
    assert(math.abs(math.abs(r.getAs[Double]("mean_diff")) - 10.0) < 1e-9)
    assert(r.getAs[Double]("q_stat") > 10.0)
  }

  test("rankEffectSizesFromCells: complete separation → A=1, delta=1; identical → 0.5/0") {
    import spark.implicits._
    val sep = (1 to 10).map(i => (i + 100.0, "t")) ++
      (1 to 10).map(i => (i + 0.0, "c"))
    val cells = graft.analysis.AnalysisPlanner
      .rankCells(sep.toDF("v", "g"), "g", "v")
    val r = graft.analysis.AnalysisPlanner
      .rankEffectSizesFromCells(cells, "c", "t").head
    assert(r.getAs[Double]("vda_a") == 1.0)
    assert(r.getAs[Double]("cliffs_delta") == 1.0)
    val same = (1 to 10).flatMap(i => Seq((i + 0.0, "t"), (i + 0.0, "c")))
    val cells2 = graft.analysis.AnalysisPlanner
      .rankCells(same.toDF("v", "g"), "g", "v")
    val r2 = graft.analysis.AnalysisPlanner
      .rankEffectSizesFromCells(cells2, "c", "t").head
    assert(math.abs(r2.getAs[Double]("vda_a") - 0.5) < 1e-12)
    assert(math.abs(r2.getAs[Double]("cliffs_delta")) < 1e-12)
  }

  test("bartlettSphericity: independent noise → det≈1; requires 2..16 cols") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (1 to 400).map(_ => (rng.nextGaussian(), rng.nextGaussian(),
      rng.nextGaussian())).toDF("a", "b", "c")
    val r = graft.analysis.AnalysisPlanner
      .bartlettSphericity(df, Seq("a", "b", "c")).head
    assert(r.getAs[Double]("det_r") > 0.9)
    assert(r.getAs[Long]("dof") == 3L)
    intercept[IllegalArgumentException] {
      graft.analysis.AnalysisPlanner.bartlettSphericity(df, Seq("a"))
    }
  }

  test("bartlettSphericity: perfectly correlated pair → det→0, chi2 null-guarded") {
    import spark.implicits._
    val df = (1 to 100).map { i =>
      val x = i.toDouble; (x, x, x % 7)
    }.toDF("a", "b", "c")
    val r = graft.analysis.AnalysisPlanner
      .bartlettSphericity(df, Seq("a", "b", "c")).head
    // det of a singular correlation matrix is 0 (within fp) → chi2 NULL
    assert(math.abs(r.getAs[Double]("det_r")) < 1e-9)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("powerDivergence: independent margins → all four statistics near 0") {
    import spark.implicits._
    // perfectly proportional table: o == e exactly
    val df = (for { x <- Seq("a", "b"); y <- Seq("u", "v", "w");
      _ <- 1 to 10 } yield (x, y)).toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner.powerDivergence(df, "x", "y")
      .head
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-9)
    assert(math.abs(r.getAs[Double]("freeman_tukey")) < 1e-9)
    assert(math.abs(r.getAs[Double]("neyman")) < 1e-9)
    assert(math.abs(r.getAs[Double]("cressie_read")) < 1e-9)
    assert(r.getAs[Long]("dof") == 2L)
  }

  test("powerDivergence: unobserved cell handled exactly (chi2 identity)") {
    import spark.implicits._
    // 2x2 with an empty (b,v) cell: chi2 must include its e-term via
    // the sum(o^2/e) - n identity. Hand value: cells (a,u)=5,(a,v)=5,
    // (b,u)=10 → e(b,v)=10*5/20=2.5 → chi2 = sum(o-e)^2/e over ALL 4.
    val df = (Seq.fill(5)(("a", "u")) ++ Seq.fill(5)(("a", "v")) ++
      Seq.fill(10)(("b", "u"))).toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner.powerDivergence(df, "x", "y")
      .head
    val e = Map(("a", "u") -> 7.5, ("a", "v") -> 2.5, ("b", "u") -> 7.5,
      ("b", "v") -> 2.5)
    val o = Map(("a", "u") -> 5.0, ("a", "v") -> 5.0, ("b", "u") -> 10.0,
      ("b", "v") -> 0.0)
    val want = e.keys.toSeq.map(k => math.pow(o(k) - e(k), 2) / e(k)).sum
    assert(math.abs(r.getAs[Double]("chi2") - want) < 1e-9)
  }

  test("clusterAgreement + vMeasure: identical labelings → ARI=FM=V=NMI=1") {
    import spark.implicits._
    val df = (1 to 60).map(i => (s"c${i % 3}", s"k${i % 3}"))
      .toDF("a", "b")
    val r = graft.analysis.AnalysisPlanner.clusterAgreement(df, "a", "b")
      .head
    assert(math.abs(r.getAs[Double]("adjusted_rand") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("fowlkes_mallows") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rand_index") - 1.0) < 1e-12)
    val v = graft.analysis.AnalysisPlanner.vMeasure(df, "a", "b").head
    assert(math.abs(v.getAs[Double]("homogeneity") - 1.0) < 1e-12)
    assert(math.abs(v.getAs[Double]("completeness") - 1.0) < 1e-12)
    assert(math.abs(v.getAs[Double]("v_measure") - 1.0) < 1e-12)
    assert(math.abs(v.getAs[Double]("nmi") - 1.0) < 1e-12)
  }

  test("clusterAgreement: independent labelings → ARI ≈ 0; vMeasure low") {
    import spark.implicits._
    // b cycles independently of a over a 3x4 grid: the contingency is
    // exactly uniform, MI is exactly 0; ARI sits slightly BELOW 0 (the
    // hypergeometric chance model penalizes the perfectly flat table)
    val df = (0 until 120).map(i => (s"c${i % 3}", s"k${i % 4}"))
      .toDF("a", "b")
    val r = graft.analysis.AnalysisPlanner.clusterAgreement(df, "a", "b")
      .head
    assert(math.abs(r.getAs[Double]("adjusted_rand")) < 0.05)
    val v = graft.analysis.AnalysisPlanner.vMeasure(df, "a", "b").head
    assert(math.abs(v.getAs[Double]("mutual_info")) < 1e-9)
  }

  test("proportionEffects: degenerate rate 1.0 → odds_ratio NULL, others guarded") {
    import spark.implicits._
    val df = (Seq.fill(10)(("x", true)) ++ Seq.fill(10)(("y", true)) ++
      Seq.fill(10)(("y", false))).toDF("g", "s")
    val r = graft.analysis.AnalysisPlanner
      .proportionEffects(df, "g", "s", "x", "y").head
    assert(r.getAs[Double]("p_a") == 1.0)
    assert(r.isNullAt(r.fieldIndex("odds_ratio"))) // p_a = 1 → guarded
    assert(math.abs(r.getAs[Double]("risk_ratio") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("nnt") - 2.0) < 1e-12)
  }

  test("signTest: deterministic direction flags; all-tied blocks → z null") {
    import spark.implicits._
    // every user: 3 clicks vs 1 view → n_pos = users, z > 0
    val df = (1 to 20).flatMap(u =>
      Seq.fill(3)((u, "click")) ++ Seq((u, "view"))).toDF("u", "arm")
    val r = graft.analysis.AnalysisPlanner
      .signTest(df, "u", "arm", "click", "view").head
    assert(r.getAs[Long]("n_pos") == 20L)
    assert(r.getAs[Long]("n_neg") == 0L)
    assert(r.getAs[Double]("z_stat") > 4.0)
    val tied = (1 to 5).flatMap(u => Seq((u, "click"), (u, "view")))
      .toDF("u", "arm")
    val r2 = graft.analysis.AnalysisPlanner
      .signTest(tied, "u", "arm", "click", "view").head
    assert(r2.getAs[Long]("n_tied") == 5L)
    assert(r2.isNullAt(r2.fieldIndex("z_stat"))) // m = 0 → no z
  }

  test("holtLinear: exact linear series → zero SSE, exact forecasts") {
    import spark.implicits._
    // y_t = 10 + 2t daily counts: level+trend seed is exact, every
    // one-step prediction lands on the line → sse 0, forecast exact
    val rows = (1 to 30).flatMap { day =>
      (0 until (10 + 2 * day)).map(_ => java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
          .plusDays(day.toLong - 1)))
    }.map(Tuple1(_)).toDF("ts")
    val r = graft.ops.TimeSeries
      .holtLinear(rows, "ts", alpha = 0.3, beta = 0.1, horizon = 3)
      .orderBy("h").collect()
    assert(r.length == 3)
    assert(math.abs(r(0).getAs[Double]("sse")) < 1e-9)
    // level after day 30 = 70, trend 2 → h=3 forecast 76
    assert(math.abs(r(2).getAs[Double]("forecast") - 76.0) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holtLinear(rows, "ts", 1.5, 0.1, 3)
    }
  }

  test("gumbelBlockMaxima: constant maxima → sd 0, return level = mu = max") {
    import spark.implicits._
    val rows = (1 to 20).flatMap { day =>
      Seq(1.0, 2.0, 5.0).map(v => (java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
          .plusDays(day.toLong - 1)), v))
    }.toDF("ts", "v")
    val r = graft.ops.TimeSeries
      .gumbelBlockMaxima(rows, "ts", "v", Seq(100)).head
    assert(r.getAs[Long]("n_blocks") == 20L)
    assert(math.abs(r.getAs[Double]("beta")) < 1e-12)
    assert(math.abs(r.getAs[Double]("mu") - 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("return_level") - 5.0) < 1e-12)
  }

  test("differenceInDifferences: additive treatment effect recovered exactly") {
    import spark.implicits._
    // control: 10 pre / 10 post; treated: 10 pre / 13 post (lift 3 on
    // top of the shared +0 drift) → DiD exactly 3, zero variance cells
    def cell(tr: Boolean, po: Boolean, base: Double) =
      (1 to 8).map(i => (tr, po, base + (i % 2) * 2.0))
    val df = (cell(false, false, 10) ++ cell(false, true, 12) ++
      cell(true, false, 20) ++ cell(true, true, 25)).toDF("tr", "po", "y")
    val r = graft.ops.Regression
      .differenceInDifferences(df, "y", col("tr"), col("po")).head
    // (25-20) - (12-10) = 3, identical within-cell spreads cancel
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 1e-12)
    assert(r.getAs[Double]("t_stat") > 3.0)
  }

  test("rddLocalLinear: clean jump at cutoff recovered; kernel bounds sides") {
    import spark.implicits._
    // y = 2 + x below cutoff 0, y = 7 + x above → effect 5 exactly
    // (local linear absorbs the common slope)
    val df = (-20 to 20).filter(_ != 0).map { i =>
      val x = i / 25.0
      (x, (if (x >= 0) 7.0 else 2.0) + x)
    }.toDF("x", "y")
    val r = graft.ops.Regression
      .rddLocalLinear(df, "x", "y", cutoff = 0.0, bandwidth = 0.5).head
    assert(math.abs(r.getAs[Double]("effect") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_left") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_right") - 1.0) < 1e-9)
    assert(r.getAs[Long]("n_left") == 12L) // i in -12..-1 → 12 in band
    assert(r.getAs[Long]("n_right") == 12L) // i in 1..12 (x=0 not in data)
  }

  test("paretoTail: exact pareto sample → hill alpha near the true index") {
    import spark.implicits._
    // inverse-CDF pareto(alpha=2): x = (1-u)^(-1/2) on a fixed grid
    val df = (1 to 2000).map { i =>
      val u = (i - 0.5) / 2000.0
      Tuple1(math.pow(1 - u, -0.5))
    }.toDF("v")
    val r = graft.analysis.AnalysisPlanner.paretoTail(df, "v", 0.9).head
    val a = r.getAs[Double]("hill_alpha")
    assert(a > 1.6 && a < 2.4, s"hill_alpha $a")
    assert(r.getAs[Long]("n_tail") > 150L)
  }

  test("labelCoherence: orthogonal label clusters → cos_own 1, separation > 0") {
    import spark.implicits._
    // label 0 vectors on e1, label 1 on e2 — own-centroid cosine is
    // exactly 1, global centroid sits between → separation positive
    val rows = (1 to 10).map(i => (i.toLong, 0,
      Seq(1.0f * i, 0.0f))) ++
      (1 to 10).map(i => (i + 10L, 1, Seq(0.0f, 1.0f * i)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val r = graft.ops.Similarity
      .labelCoherence(df, "label", "embedding")
      .orderBy("label").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("avg_cos_own") - 1.0) < 1e-12)
      assert(row.getAs[Double]("separation") > 0.2)
    }
  }

  test("andersonDarlingKSampleFromCells: same distribution → small T; shift flags") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val same = (1 to 3).flatMap(g =>
      (1 to 300).map(_ => (s"g$g", rng.nextGaussian())))
    val cellsSame = graft.analysis.AnalysisPlanner
      .rankCells(same.toDF("g", "v"), "g", "v")
    val r1 = graft.analysis.AnalysisPlanner
      .andersonDarlingKSampleFromCells(cellsSame).head
    assert(r1.getAs[Long]("n") == 900L)
    assert(r1.getAs[Long]("n_groups") == 3L)
    assert(math.abs(r1.getAs[Double]("t_stat")) < 3.0)
    val shifted = (1 to 2).flatMap(g =>
      (1 to 300).map(_ => (s"g$g", rng.nextGaussian()))) ++
      (1 to 300).map(_ => ("g3", rng.nextGaussian() + 2.0))
    val cellsShift = graft.analysis.AnalysisPlanner
      .rankCells(shifted.toDF("g", "v"), "g", "v")
    val r2 = graft.analysis.AnalysisPlanner
      .andersonDarlingKSampleFromCells(cellsShift).head
    assert(r2.getAs[Double]("t_stat") > 10.0)
    assert(r2.getAs[Double]("a2_stat") > r1.getAs[Double]("a2_stat"))
  }

  test("andersonDarlingKSampleFromCells: heavy ties handled (integer values)") {
    import spark.implicits._
    // two samples over a 4-value support, one shifted by reweighting
    val a = Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0) ++ Seq.fill(50)(3.0)
    val b = Seq.fill(20)(1.0) ++ Seq.fill(40)(2.0) ++ Seq.fill(90)(3.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val cells = graft.analysis.AnalysisPlanner.rankCells(df, "g", "v")
    val r = graft.analysis.AnalysisPlanner
      .andersonDarlingKSampleFromCells(cells).head
    assert(r.getAs[Double]("t_stat") > 2.0) // distributions differ
    assert(!r.getAs[Double]("a2_stat").isNaN)
    assert(r.getAs[Double]("sigma") > 0)
  }

  test("tauCContingency: monotone table → tau_c positive, near 1; reversed negative") {
    import spark.implicits._
    // px == py on a 3x3 grid (perfect monotone association)
    val mono = (1 to 3).flatMap(i => Seq.fill(20)((i, i))).toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner
      .tauCContingency(mono, "x", "y").head
    assert(r.getAs[Double]("tau_c") > 0.8)
    assert(r.getAs[Long]("discordant") == 0L)
    val rev = (1 to 3).flatMap(i => Seq.fill(20)((i, 4 - i)))
      .toDF("x", "y")
    val r2 = graft.analysis.AnalysisPlanner
      .tauCContingency(rev, "x", "y").head
    assert(r2.getAs[Double]("tau_c") < -0.8)
    assert(r2.getAs[Long]("concordant") == 0L)
  }

  test("jamesSteinMeans: small noisy group shrinks hardest, order preserved toward pool") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // four big groups near 0, one tiny group with an extreme mean
    val big = (1 to 4).flatMap(g =>
      (1 to 500).map(_ => (s"g$g", rng.nextGaussian())))
    val tiny = (1 to 5).map(_ => ("tiny", 8.0 + rng.nextGaussian()))
    val df = (big ++ tiny).toDF("g", "v")
    val out = graft.analysis.AnalysisPlanner
      .jamesSteinMeans(df, "g", "v").collect()
      .map(r => r.getAs[String]("group_name") -> r).toMap
    val t = out("tiny")
    // tiny group: shrink weight clearly below the big groups'
    val bigW = out("g1").getAs[Double]("shrink_weight")
    assert(t.getAs[Double]("shrink_weight") < bigW)
    // shrunk mean moves toward the grand mean but keeps the sign
    assert(t.getAs[Double]("shrunk_mean") < t.getAs[Double]("raw_mean"))
    assert(t.getAs[Double]("shrunk_mean") > 0.0)
  }

  test("boxCoxScan: lognormal data peaks at lambda 0, not at 1") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val df = (1 to 2000).map(_ => Tuple1(math.exp(rng.nextGaussian())))
      .toDF("v")
    val out = graft.analysis.AnalysisPlanner.boxCoxScan(df, "v")
      .collect().map(r => r.getAs[Double]("lambda") ->
        r.getAs[Double]("loglik")).toMap
    assert(out(0.0) > out(1.0))
    assert(out(0.0) > out(-1.0))
    assert(out.size == 5)
  }

  test("hotellingT2: pure-correlation shift flags where marginals stay put") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    // arm a: y = x + noise; arm b: mean vector shifted along (1, -1) —
    // a direction the pooled covariance makes cheap to detect
    val a = (1 to 400).map { _ =>
      val x = rng.nextGaussian(); ("a", x, x + 0.3 * rng.nextGaussian())
    }
    val b = (1 to 400).map { _ =>
      val x = rng.nextGaussian() + 0.3
      ("b", x, x - 0.3 + 0.3 * rng.nextGaussian())
    }
    val df = (a ++ b).toDF("g", "x", "y")
    val r = graft.analysis.AnalysisPlanner
      .hotellingT2(df, "x", "y", "g", "a", "b").head
    assert(r.getAs[Double]("t2_stat") > 50.0)
    assert(r.getAs[Long]("df1") == 2L)
    assert(r.getAs[Long]("df2") == 797L)
    // identical arms → tiny T²
    val same = (1 to 400).map { _ =>
      val x = rng.nextGaussian(); ("a", x, x) } ++
      (1 to 400).map { _ => val x = rng.nextGaussian(); ("b", x, x) }
    val r2 = graft.analysis.AnalysisPlanner
      .hotellingT2(same.toDF("g", "x", "y"), "x", "y", "g", "a", "b").head
    // degenerate covariance (y == x exactly) → det 0 → NULL guard
    assert(r2.isNullAt(r2.fieldIndex("t2_stat")))
  }

  test("gateWaterfall: cumulative yield monotone, marginal >= joint drop per gate") {
    import spark.implicits._
    val docs = Seq(
      "the cat is on a mat and that is of it the end here now ok so yes we go", // passes all
      "x", // fails word_count
      ("the a of and to in is that " + (1 to 30).map(_ => "zz").mkString(" ")),
      (1 to 40).map(_ => "12345").mkString(" ") // fails stopwords + alpha
    ).map(Tuple1(_)).toDF("text")
    val out = graft.ops.TextAnalysis.gateWaterfall(docs, "text")
      .orderBy("gate_order").collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[String]("gate")).toSeq ==
      Seq("word_count", "mean_word_len", "stopword_hits", "alpha_frac"))
    // cumulative survivorship is non-increasing
    val cums = out.map(_.getAs[Long]("n_pass_cumulative"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a >= b })
    assert(out(0).getAs[Long]("n_fail_marginal") >= 1L)
    assert(out(3).getAs[Double]("yield_share") <= 1.0)
  }

  test("msprt: null effect → p stays near 1; real effect → tiny always-valid p") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val nullDf = (1 to 2000).map(i =>
      (if (i % 2 == 0) "c" else "t", rng.nextGaussian())).toDF("g", "v")
    val r1 = graft.ops.Evaluation.msprt(nullDf, "g", "v", "c", "t", 0.5)
      .head
    assert(r1.getAs[Double]("always_valid_p") > 0.3)
    val effDf = (1 to 1000).map(_ => ("c", rng.nextGaussian())) ++
      (1 to 1000).map(_ => ("t", rng.nextGaussian() + 0.5))
    val r2 = graft.ops.Evaluation
      .msprt(effDf.toDF("g", "v"), "g", "v", "c", "t", 0.5).head
    assert(r2.getAs[Double]("always_valid_p") < 0.001)
    assert(r2.getAs[Double]("log_lambda") > 0)
  }

  test("gaussianAbLoss: symmetric losses at zero effect; loss asymmetry tracks sign") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val eff = (1 to 2000).map(_ => ("c", rng.nextGaussian())) ++
      (1 to 2000).map(_ => ("t", rng.nextGaussian() + 1.0))
    val r = graft.ops.Evaluation
      .gaussianAbLoss(eff.toDF("g", "v"), "g", "v", "c", "t").head
    assert(r.getAs[Double]("prob_t_beats_c") > 0.999)
    // choosing the clear winner risks ~nothing; choosing the loser
    // forfeits ~the full effect
    assert(r.getAs[Double]("exp_loss_choose_t") < 0.01)
    assert(r.getAs[Double]("exp_loss_choose_c") > 0.9)
    // identity: loss_c − loss_t = diff exactly (algebra of the normal)
    assert(math.abs(r.getAs[Double]("exp_loss_choose_c") -
      r.getAs[Double]("exp_loss_choose_t") -
      r.getAs[Double]("diff")) < 1e-9)
  }

  test("splitConformal: exact line → zero-width interval, full coverage") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, i.toDouble, 3.0 + 2.0 * i))
      .toDF("id", "x", "y")
    val r = graft.ops.Regression
      .splitConformal(df, "x", "y", Seq("id"), alpha = 0.1).head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 3.0) < 1e-9)
    assert(r.getAs[Double]("q_hat") < 1e-9)
    assert(r.getAs[Double]("coverage_cal") == 1.0)
    assert(r.getAs[Long]("n_fit") + r.getAs[Long]("n_cal") == 400L)
  }

  test("splitConformal: noisy line → coverage >= 1 - alpha on calibration") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = (1 to 2000).map(i =>
      (i.toLong, i.toDouble % 50, 1.0 + 0.5 * (i % 50) +
        rng.nextGaussian() * 3)).toDF("id", "x", "y")
    val r = graft.ops.Regression
      .splitConformal(df, "x", "y", Seq("id"), alpha = 0.1).head
    assert(r.getAs[Double]("coverage_cal") >= 0.9)
    assert(r.getAs[Double]("q_hat") > 1.0) // noise sd 3 → wide interval
    assert(r.getAs[Double]("interval_width") ==
      r.getAs[Double]("q_hat") * 2)
  }

  test("readabilityPanel: trivial one-syllable text scores easy on every index") {
    import spark.implicits._
    val df = Seq(
      ("the cat sat on the mat. it was big.", "en"),
      ("incomprehensibility notwithstanding, organizational " +
        "experimentation necessitates comprehensive interpretation.",
        "en")).toDF("text", "lang")
    val out = graft.ops.TextAnalysis.readabilityPanel(df, "text")
      .collect()
    val simple = out(0); val hard = out(1)
    assert(simple.getAs[Long]("n_complex") == 0L)
    assert(hard.getAs[Long]("n_complex") >= 5L)
    assert(simple.getAs[Double]("gunning_fog") <
      hard.getAs[Double]("gunning_fog"))
    assert(simple.getAs[Double]("ari") < hard.getAs[Double]("ari"))
    assert(simple.getAs[Double]("smog") < hard.getAs[Double]("smog"))
    assert(simple.getAs[Double]("coleman_liau") <
      hard.getAs[Double]("coleman_liau"))
  }

  test("gamesHowell: q_stat is t_stat on the studentized-range scale (t*sqrt2)") {
    import spark.implicits._
    val df = Seq("a", "b").flatMap {
      case "a" => (1 to 15).map(i => ("a", i.toDouble))
      case g   => (1 to 25).map(i => (g, i * 3.0))
    }.toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.gamesHowell(df, "g", "v").head
    val t = r.getAs[Double]("t_stat")
    val q = r.getAs[Double]("q_stat")
    assert(math.abs(q - math.abs(t) * math.sqrt(2.0)) < 1e-9)
    assert(q >= 0.0)
  }

  test("jamesSteinMeans: every group n=1 → weight 1, shrunk == raw (no NULLs)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 5.0), ("c", 9.0), ("d", 2.0),
      ("e", 7.0)).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner.jamesSteinMeans(df, "g", "v")
      .orderBy("group_name").collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getAs[Double]("shrink_weight") == 1.0)
      assert(row.getAs[Double]("shrunk_mean") ==
        row.getAs[Double]("raw_mean"))
    }
  }

  test("tauCContingency: non-numeric ordinal labels are dropped, not NULL-cells") {
    import spark.implicits._
    val clean = Seq((1, 1), (1, 1), (2, 2), (2, 2), (3, 3), (3, 3))
      .map { case (x, y) => (x.toString, y.toString) }.toDF("x", "y")
    val dirty = clean.union(
      Seq(("low", "1"), ("2", "mid"), ("high", "high")).toDF("x", "y"))
    val a = graft.analysis.AnalysisPlanner
      .tauCContingency(clean, "x", "y").head
    val b = graft.analysis.AnalysisPlanner
      .tauCContingency(dirty, "x", "y").head
    // unparseable labels contribute to neither n nor the levels
    assert(b.getAs[Long]("n") == a.getAs[Long]("n"))
    assert(b.getAs[Long]("n_x_levels") == 3L)
    assert(b.getAs[Double]("tau_c") == a.getAs[Double]("tau_c"))
  }

  test("energyDistanceBinned: within O(range/bins) of the exact path on continuous data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // arm a ~ N(0,1), arm b ~ N(0.5, 1.3): genuinely continuous values
    val df = (1 to 4000).map { i =>
      val a = i % 2 == 0
      val v = if (a) rng.nextGaussian() else 0.5 + 1.3 * rng.nextGaussian()
      (i.toLong, v, a)
    }.toDF("id", "v", "arm")
    val exact = graft.analysis.AnalysisPlanner
      .energyDistance(df, "v", col("arm")).head
    val binned = graft.analysis.AnalysisPlanner
      .energyDistanceBinned(df, "v", col("arm"), bins = 512).head
    assert(binned.getAs[Long]("n_a") == exact.getAs[Long]("n_a"))
    assert(math.abs(binned.getAs[Double]("e_dist") -
      exact.getAs[Double]("e_dist")) < 0.02)
    // degenerate: constant column → both give 0
    val const = (1 to 50).map(i => (i.toLong, 3.0, i % 2 == 0))
      .toDF("id", "v", "arm")
    val cb = graft.analysis.AnalysisPlanner
      .energyDistanceBinned(const, "v", col("arm"), bins = 16).head
    assert(cb.getAs[Double]("e_dist") == 0.0)
  }

  test("energyDistanceBinnedFromCells: within tolerance of the exact cell path") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val cells = (1 to 3000).map { i =>
      val g = if (i % 2 == 0) "ctl" else "trt"
      val v = if (g == "ctl") rng.nextGaussian()
              else 0.4 + rng.nextGaussian()
      (g, v, 1.0)
    }.toDF("__g", "__v", "__c")
    val exact = graft.analysis.AnalysisPlanner
      .energyDistanceFromCells(cells, "ctl", "trt").head
    val binned = graft.analysis.AnalysisPlanner
      .energyDistanceBinnedFromCells(cells, "ctl", "trt", bins = 512).head
    assert(binned.getAs[Long]("n_c") == exact.getAs[Long]("n_c"))
    assert(math.abs(binned.getAs[Double]("cramer_d") -
      exact.getAs[Double]("cramer_d")) < 0.02)
  }

  test("splitConformalApprox: q_hat/coverage within sketch tolerance of exact") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val df = (1 to 4000).map(i =>
      (i.toLong, i.toDouble % 50, 1.0 + 0.5 * (i % 50) +
        rng.nextGaussian() * 3)).toDF("id", "x", "y")
    val exact = graft.ops.Regression
      .splitConformal(df, "x", "y", Seq("id"), alpha = 0.1).head
    val approx = graft.ops.Regression
      .splitConformalApprox(df, "x", "y", Seq("id"), alpha = 0.1).head
    assert(approx.getAs[Long]("n_cal") == exact.getAs[Long]("n_cal"))
    assert(approx.getAs[Double]("slope") == exact.getAs[Double]("slope"))
    val qe = exact.getAs[Double]("q_hat")
    val qa = approx.getAs[Double]("q_hat")
    assert(math.abs(qa - qe) / qe < 0.05)
    assert(math.abs(approx.getAs[Double]("coverage_cal") -
      exact.getAs[Double]("coverage_cal")) < 0.02)
    assert(approx.getAs[Double]("interval_width") == qa * 2)
  }

  test("dawidSkene withVoteLabel: vote_label replays majorityVote exactly (incl. ties)") {
    import spark.implicits._
    // item 1: clear majority; item 2: 1-1 tie (label-ascending break);
    // item 3: duplicate votes from one rater count per-vote
    val df = Seq((1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "b"),
      (2L, "r1", "b"), (2L, "r2", "a"),
      (3L, "r1", "c"), (3L, "r1", "c"), (3L, "r2", "a")).toDF(
      "item", "rater", "label")
    val cells = graft.ops.Labeling.voteCells(df, "item", "rater", "label")
    val ds = graft.ops.Labeling
      .dawidSkeneFromCells(cells, iterations = 1, withVoteLabel = true)
    val got = ds.items.select("item", "vote_label").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mv = graft.ops.Labeling.majorityVote(df, "item", "rater", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == mv)
    assert(got(2L) == "a") // tie broken label-ascending
  }

  test("leveneTest: equal variances accept, inflated-variance group rejects") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val eq = Seq("a", "b", "c").flatMap(g =>
      (1 to 200).map(_ => (g, rng.nextGaussian()))).toDF("g", "v")
    val wEq = graft.analysis.AnalysisPlanner
      .leveneTest(eq, "g", "v", "median").head
    assert(wEq.getAs[Double]("w_stat") < 3.0)
    assert(wEq.getAs[Long]("df1") == 2L && wEq.getAs[Long]("df2") == 597L)
    val uneq = Seq(("a", 1.0), ("b", 1.0), ("c", 8.0)).flatMap {
      case (g, s) => (1 to 200).map(_ => (g, s * rng.nextGaussian()))
    }.toDF("g", "v")
    val wUn = graft.analysis.AnalysisPlanner
      .leveneTest(uneq, "g", "v", "median").head
    assert(wUn.getAs[Double]("w_stat") > 30.0)
    // mean-centered Levene agrees directionally
    assert(graft.analysis.AnalysisPlanner
      .leveneTest(uneq, "g", "v", "mean").head
      .getAs[Double]("w_stat") > 30.0)
    intercept[IllegalArgumentException] {
      graft.analysis.AnalysisPlanner.leveneTest(eq, "g", "v", "mode")
    }
  }

  test("SPC charts: in-control stays quiet, a shifted regime is flagged") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    def series(shiftFrom: Int, shift: Double) =
      (0 until 30).flatMap { day =>
        val mu = if (day < shiftFrom) 10.0 else 10.0 + shift
        (1 to 40).map(_ => (java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 3, 1, 8, 0)
            .plusDays(day.toLong)), mu + rng.nextGaussian()))
      }.toDF("ts", "v")
    // fully in-control: every chart stays quiet
    val calm = series(30, 0.0)
    val xCalm = graft.ops.Spc.xbarChart(calm, "ts", "v").collect()
    assert(xCalm.length == 30 &&
      xCalm.count(_.getAs[Boolean]("out_of_control")) <= 1)
    assert(!graft.ops.Spc.cusumChart(calm, "ts", "v").collect()
      .exists(_.getAs[Boolean]("signal")))
    assert(!graft.ops.Spc.ewmaChart(calm, "ts", "v").collect()
      .exists(_.getAs[Boolean]("out_of_control")))
    // one strongly shifted final day: X̄ flags exactly the excursion
    // (a single day barely moves the pooled center)
    val spike = series(29, 5.0)
    val xs = graft.ops.Spc.xbarChart(spike, "ts", "v").orderBy("day")
      .collect()
    assert(xs.last.getAs[Boolean]("out_of_control"))
    assert(xs.take(29).count(_.getAs[Boolean]("out_of_control")) <= 1)
    // a persistent small shift: CUSUM/EWMA accumulate and fire
    val drift = series(20, 1.0)
    val cusum = graft.ops.Spc.cusumChart(drift, "ts", "v")
      .orderBy("day").collect()
    assert(cusum.last.getAs[Boolean]("signal"))
    assert(cusum.forall(r => r.getAs[Double]("s_hi") >= 0 &&
      r.getAs[Double]("s_lo") >= 0))
    val ewma = graft.ops.Spc.ewmaChart(drift, "ts", "v")
      .orderBy("day").collect()
    assert(ewma.last.getAs[Boolean]("out_of_control"))
    // limits widen monotonically toward the asymptote
    val widths = ewma.map(r => r.getAs[Double]("ucl") -
      r.getAs[Double]("lcl"))
    assert(widths.sliding(2).forall(w => w(1) >= w(0) - 1e-12))
  }

  test("processCapability: hand-computed Cp/Cpk and out-of-spec fractions") {
    import spark.implicits._
    // symmetric values around 10, sd exactly computable
    val df = Seq(8.0, 9.0, 10.0, 11.0, 12.0).map(Tuple1(_)).toDF("v")
    val r = graft.ops.Spc.processCapability(df, "v", lsl = 4.0,
      usl = 13.0).head
    val sd = math.sqrt(2.5) // var of {8..12} sample = 2.5
    assert(math.abs(r.getAs[Double]("cp") - 9.0 / (6 * sd)) < 1e-12)
    assert(math.abs(r.getAs[Double]("cpk") - 3.0 / (3 * sd)) < 1e-12)
    assert(r.getAs[Double]("frac_below") == 0.0)
    assert(r.getAs[Double]("frac_above") == 0.0)
    val r2 = graft.ops.Spc.processCapability(df, "v", 9.5, 10.5).head
    assert(r2.getAs[Double]("frac_below") == 0.4) // 8, 9
    assert(r2.getAs[Double]("frac_above") == 0.4) // 11, 12
  }

  test("theilDecomposition: exact identity total = within + between; segregated vs mixed") {
    import spark.implicits._
    // equal values within groups but different group means: ALL
    // inequality is between-group
    val seg = Seq(("a", 1.0), ("b", 10.0)).flatMap { case (g, v) =>
      (1 to 50).map(_ => (g, v)) }.toDF("g", "v")
    val rs = graft.ops.Profiling.theilDecomposition(seg, "g", "v").head
    assert(math.abs(rs.getAs[Double]("theil_within")) < 1e-12)
    assert(rs.getAs[Double]("theil_between") > 0.1)
    assert(math.abs(rs.getAs[Double]("theil_total") -
      (rs.getAs[Double]("theil_within") +
        rs.getAs[Double]("theil_between"))) < 1e-12)
    // same distribution in every group: all within, no between
    val mix = Seq("a", "b").flatMap(g =>
      Seq(1.0, 2.0, 5.0, 10.0).map(v => (g, v))).toDF("g", "v")
    val rm = graft.ops.Profiling.theilDecomposition(mix, "g", "v").head
    assert(math.abs(rm.getAs[Double]("theil_between")) < 1e-12)
    assert(rm.getAs[Double]("theil_within") > 0.1)
  }

  test("hooverPalma: equal values → zero inequality; known skew shares") {
    import spark.implicits._
    val eq = (1 to 100).map(_ => Tuple1(7.0)).toDF("v")
    val re = graft.ops.Profiling.hooverPalma(eq, "v").head
    assert(re.getAs[Double]("hoover") == 0.0)
    // 90 values of 1 and 10 values of 91: top-10% holds 910/1000
    val skew = ((1 to 90).map(_ => 1.0) ++ (1 to 10).map(_ => 91.0))
      .map(Tuple1(_)).toDF("v")
    val rk = graft.ops.Profiling.hooverPalma(skew, "v").head
    assert(math.abs(rk.getAs[Double]("top10_share") - 0.91) < 1e-12)
    // value-cut semantics: the p40 cut value is 1.0 and ties land in
    // the lower side, so ALL 90 ones count → 90/1000
    assert(math.abs(rk.getAs[Double]("bottom40_share") - 0.09) < 1e-12)
    assert(math.abs(rk.getAs[Double]("palma") - 0.91 / 0.09) < 1e-9)
    // Hoover: mass above mean 10 → Σ|x-μ| = 90*9 + 10*81 = 1620;
    // N·μ = 1000 → hoover = 1620/2000
    assert(math.abs(rk.getAs[Double]("hoover") - 0.81) < 1e-12)
  }

  test("blandAltman: constant offset → bias exact, zero outside-fraction for tight sd") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = (1 to 500).map { _ =>
      val t = 50 + 10 * rng.nextGaussian()
      (t, t + 2.0 + 0.1 * rng.nextGaussian()) // method b reads 2 high
    }.toDF("a", "b")
    val r = graft.ops.Profiling.blandAltman(df, "a", "b").head
    assert(math.abs(r.getAs[Double]("bias") + 2.0) < 0.05)
    assert(r.getAs[Double]("sd_diff") < 0.2)
    assert(r.getAs[Double]("frac_outside") <= 0.08)
    assert(r.getAs[Double]("loa_high") < 0.0) // systematically below 0
    // proportional bias: b = a * 1.1 → d correlates with the mean
    val prop = (1 to 500).map { _ =>
      val t = 50 + 10 * rng.nextGaussian(); (t, t * 1.1)
    }.toDF("a", "b")
    val rp = graft.ops.Profiling.blandAltman(prop, "a", "b").head
    assert(math.abs(rp.getAs[Double]("prop_bias_corr")) > 0.99)
  }

  test("whiteTest: homoskedastic accepts, quadratic-variance rejects where BP is weaker") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    val xs = (1 to 3000).map(_ => rng.nextDouble() * 10 - 5) // centered
    val homo = xs.map(x => (x, 2 + 3 * x + rng.nextGaussian()))
      .toDF("x", "y")
    assert(graft.ops.Regression.whiteTest(homo, "x", "y").head
      .getAs[Double]("lm_stat") < 10.0)
    // variance ∝ x² is SYMMETRIC in x: linear-in-x BP has ~no power,
    // White's x² term sees it
    val quad = xs.map(x => (x, 2 + 3 * x + math.abs(x) * rng.nextGaussian()))
      .toDF("x", "y")
    val w = graft.ops.Regression.whiteTest(quad, "x", "y").head
    val bp = graft.ops.Regression.breuschPagan(quad, "x", "y").head
    assert(w.getAs[Double]("lm_stat") > 100.0)
    assert(w.getAs[Double]("lm_stat") > 5 * bp.getAs[Double]("lm_stat"))
    assert(w.getAs[Long]("df") == 2L)
  }

  test("resetTest: linear truth accepts, quadratic truth rejects loudly") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val xs = (1 to 2000).map(_ => rng.nextDouble() * 10)
    val lin = xs.map(x => (x, 1 + 2 * x + rng.nextGaussian()))
      .toDF("x", "y")
    val rl = graft.ops.Regression.resetTest(lin, "x", "y").head
    assert(rl.getAs[Double]("f_stat") < 8.0)
    assert(rl.getAs[Double]("rss1") >= rl.getAs[Double]("rss2"))
    val quad = xs.map(x => (x, 1 + 2 * x + 0.5 * x * x +
      rng.nextGaussian())).toDF("x", "y")
    assert(graft.ops.Regression.resetTest(quad, "x", "y").head
      .getAs[Double]("f_stat") > 1000.0)
  }

  test("breuschGodfrey: white residuals accept, AR(1) residuals reject") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    def series(rho: Double, g: String) = {
      var e = 0.0
      (1 to 400).map { t =>
        e = rho * e + rng.nextGaussian()
        (g, t.toDouble, e)
      }
    }
    val df = (series(0.0, "white") ++ series(0.8, "ar1"))
      .toDF("g", "x", "resid")
    val r = graft.ops.Regression
      .breuschGodfrey(df, Seq("g"), "x", "resid")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("lm_stat"))
      .toMap
    assert(r("white") < 8.0)
    assert(r("ar1") > 100.0)
  }

  test("holtWinters: pure weekly pattern → zero SSE, exact seasonal forecasts") {
    import spark.implicits._
    val pattern = Array(3, -2, 5, 0, -4, 1, -3) // sums to 0
    val rows = (0 until 28).flatMap { day =>
      val n = 100 + pattern(day % 7)
      (0 until n).map(_ => Tuple1(java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
          .plusDays(day.toLong))))
    }.toDF("ts")
    val r = graft.ops.TimeSeries
      .holtWinters(rows, "ts", 0.4, 0.1, 0.2, period = 7, horizon = 7)
      .orderBy("h").collect()
    assert(r.length == 7)
    assert(math.abs(r(0).getAs[Double]("sse")) < 1e-9)
    r.foreach { row =>
      val h = row.getLong(0).toInt
      // day 28+h-1 has pattern index (28+h-1) % 7 = h-1
      assert(math.abs(row.getAs[Double]("forecast") -
        (100 + pattern((h - 1) % 7))) < 1e-9)
      assert(math.abs(row.getAs[Double]("trend")) < 1e-12)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holtWinters(rows, "ts", 0.4, 0.1, 0.2,
        period = 20) // < two seasons of data
    }
  }

  test("croston: hand-computed intermittent series") {
    import spark.implicits._
    // 10 days; demand (value>0 events) on day idx 2 (x2), 4 (x4), 8 (x6)
    val demand = Map(2 -> 2, 4 -> 4, 8 -> 6)
    val rows = (0 until 10).flatMap { day =>
      val hits = demand.getOrElse(day, 0)
      // every day gets one zero-marker event so the calendar is dense
      (0 until hits).map(_ => (day, 1.0)) :+ (day, 0.0)
    }.map { case (day, v) => (java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
        .plusDays(day.toLong)), v) }.toDF("ts", "v")
    val r = graft.ops.TimeSeries
      .croston(rows, "ts", col("v") > 0, alpha = 0.1).head
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("n_demand_days") == 3L)
    // z: 2 → 0.1*4+0.9*2 = 2.2 → 0.1*6+0.9*2.2 = 2.58
    assert(math.abs(r.getAs[Double]("z_hat") - 2.58) < 1e-12)
    // p: 3 → 0.1*2+0.9*3 = 2.9 → 0.1*4+0.9*2.9 = 3.01
    assert(math.abs(r.getAs[Double]("p_hat") - 3.01) < 1e-12)
    assert(math.abs(r.getAs[Double]("forecast_sba") -
      2.58 / 3.01 * 0.95) < 1e-12)
  }

  test("gainsTable: perfect separation captures everything in the top decile block") {
    import spark.implicits._
    // 1000 rows, 100 positives all holding the highest scores
    val df = (1 to 1000).map(i => (i.toDouble, i > 900)).toDF("s", "y")
    val g = graft.ops.Evaluation.gainsTable(df, "s", col("y"))
      .orderBy("decile").collect()
    assert(g.length == 10)
    val top = g.head
    assert(top.getLong(0) == 1L && top.getAs[Long]("n_pos") == 100L)
    assert(math.abs(top.getAs[Double]("cum_pos_share") - 1.0) < 1e-12)
    assert(math.abs(top.getAs[Double]("lift") - 10.0) < 1e-9)
    assert(math.abs(top.getAs[Double]("ks_at") - 1.0) < 1e-12)
    // the bottom decile closes the cumulative shares at 1
    assert(math.abs(g.last.getAs[Double]("cum_n_share") - 1.0) < 1e-12)
    assert(math.abs(g.last.getAs[Double]("ks_at")) < 1e-12)
    // a useless random-ish score: lift ≈ 1 everywhere
    val flat = (1 to 1000).map(i => (i.toDouble, i % 10 == 0))
      .toDF("s", "y")
    val gf = graft.ops.Evaluation.gainsTable(flat, "s", col("y"))
      .collect()
    assert(gf.forall(r => math.abs(r.getAs[Double]("lift") - 1.0) < 0.35))
  }

  test("simplifiedSilhouette: separated clusters near 1, shuffled labels near 0") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    def vec(cx: Double, cy: Double) =
      Array(cx + 0.01 * rng.nextGaussian(), cy + 0.01 * rng.nextGaussian())
    val tight = (1 to 90).map { i =>
      val l = i % 3
      val v = l match {
        case 0 => vec(1, 0); case 1 => vec(0, 1); case 2 => vec(-1, 0)
      }
      (i.toLong, l.toString, v)
    }.toDF("id", "lbl", "v")
    val rs = graft.ops.Similarity
      .simplifiedSilhouette(tight, "id", "lbl", "v").collect()
    assert(rs.length == 3)
    rs.foreach(r =>
      assert(r.getAs[Double]("mean_silhouette") > 0.9, r.toString))
    // labels independent of geometry: silhouette collapses toward <= 0
    val shuffled = (1 to 90).map { i =>
      (i.toLong, (rng.nextInt(3)).toString, vec(1, 0)) }
      .toDF("id", "lbl", "v")
    val rsh = graft.ops.Similarity
      .simplifiedSilhouette(shuffled, "id", "lbl", "v").collect()
    rsh.foreach(r =>
      assert(r.getAs[Double]("mean_silhouette") < 0.3, r.toString))
  }

  test("priceIndices: hand-computed two-item bilateral panel") {
    import spark.implicits._
    // item A: p 2→3, q 10→5 ; item B: p 1→1, q 10→20 ; item C only
    // in base (dropped)
    val df = Seq(
      ("a", 10.0, 20.0, true), ("a", 5.0, 15.0, false),
      ("b", 10.0, 10.0, true), ("b", 20.0, 20.0, false),
      ("c", 4.0, 8.0, true)).toDF("it", "q", "r", "base")
    val r = graft.ops.Profiling
      .priceIndices(df, "it", "q", "r", col("base")).head
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("n_dropped") == 1L)
    // Laspeyres = (3*10 + 1*10)/(2*10 + 1*10) = 40/30
    assert(math.abs(r.getAs[Double]("laspeyres") - 40.0 / 30) < 1e-12)
    // Paasche = (3*5 + 1*20)/(2*5 + 1*20) = 35/30
    assert(math.abs(r.getAs[Double]("paasche") - 35.0 / 30) < 1e-12)
    assert(math.abs(r.getAs[Double]("fisher") -
      math.sqrt(40.0 / 30 * 35.0 / 30)) < 1e-12)
    // value ratio = (15+20)/(20+10)
    assert(math.abs(r.getAs[Double]("value_ratio") - 35.0 / 30) < 1e-12)
  }

  test("pairRules extended metrics: independence baseline and exact-rule guard") {
    import spark.implicits._
    // 4 baskets: {1,2} twice, {1} once, {2} once → P(1)=P(2)=3/4,
    // P(1,2)=1/2; conf(1→2)=2/3
    val df = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (13L, 2L)).toDF("bk", "it")
    val r = graft.ops.Associations
      .pairRules(df, "bk", "it", minPairCount = 1).head
    assert(math.abs(r.getAs[Double]("leverage") -
      (0.5 - 0.75 * 0.75)) < 1e-12)
    assert(math.abs(r.getAs[Double]("jaccard") - 2.0 / 4) < 1e-12)
    // conviction(1→2) = (1 − 3/4)/(1 − 2/3) = 0.75
    assert(math.abs(r.getAs[Double]("conviction_a_b") - 0.75) < 1e-12)
    // exact rule a ⇒ b: conviction undefined → NULL, not a div error
    val exact = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 2L))
      .toDF("bk", "it")
    val re = graft.ops.Associations
      .pairRules(exact, "bk", "it", minPairCount = 1).head
    assert(re.isNullAt(re.fieldIndex("conviction_a_b")))
  }

  test("attribute charts: stable rates quiet, burst day flagged on both p- and c-chart") {
    import spark.implicits._
    val rng = new scala.util.Random(27)
    // 29 days at ~5% defect rate over 200 rows, day 30 bursts to 30%
    val rows = (0 until 30).flatMap { day =>
      val rate = if (day == 29) 0.3 else 0.05
      (1 to 200).map(_ => (java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 3, 1, 8, 0)
          .plusDays(day.toLong)), rng.nextDouble() < rate))
    }.toDF("ts", "bad")
    val p = graft.ops.Spc.pChart(rows, "ts", col("bad"))
      .orderBy("day").collect()
    assert(p.length == 30)
    assert(p.take(29).count(_.getAs[Boolean]("out_of_control")) <= 1)
    assert(p.last.getAs[Boolean]("out_of_control"))
    assert(p.forall(r => r.getAs[Double]("lcl") >= 0 &&
      r.getAs[Double]("ucl") <= 1))
    val c = graft.ops.Spc.cChart(rows, "ts", col("bad"))
      .orderBy("day").collect()
    assert(c.last.getAs[Boolean]("out_of_control"))
    assert(c.take(29).count(_.getAs[Boolean]("out_of_control")) <= 1)
  }

  test("ebBetaBinomialRates: small groups shrink toward pool, degenerate input falls back") {
    import spark.implicits._
    val rng = new scala.util.Random(33)
    // 20 groups at true rate ~0.3 with n=500, one tiny group with 3/3
    val rows = (1 to 20).flatMap(g => (1 to 500).map(_ =>
      (s"g$g", rng.nextDouble() < 0.3))) ++
      (1 to 3).map(_ => ("tiny", true))
    val df = rows.toDF("g", "s")
    val r = graft.analysis.AnalysisPlanner
      .ebBetaBinomialRates(df, "g", col("s"))
      .collect().map(x => x.getString(0) -> x).toMap
    val tiny = r("tiny")
    assert(tiny.getAs[Double]("raw_rate") == 1.0)
    // 3/3 pulled hard toward the ~0.3 pool
    assert(tiny.getAs[Double]("shrunk_rate") < 0.7)
    // big groups barely move
    val big = r("g1")
    assert(math.abs(big.getAs[Double]("shrunk_rate") -
      big.getAs[Double]("raw_rate")) < 0.05)
    // shrinkage is toward the prior mean from BOTH sides
    assert(tiny.getAs[Double]("shrunk_rate") <
      tiny.getAs[Double]("raw_rate"))
    // degenerate: one group → NULL prior, raw rate back
    val one = (1 to 10).map(i => ("only", i % 2 == 0)).toDF("g", "s")
    val ro = graft.analysis.AnalysisPlanner
      .ebBetaBinomialRates(one, "g", col("s")).head
    assert(ro.isNullAt(ro.fieldIndex("alpha")))
    assert(ro.getAs[Double]("shrunk_rate") ==
      ro.getAs[Double]("raw_rate"))
  }

  test("captureRecapture: closed-population estimate recovers the truth") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    // 1000 true individuals; two independent captures at p=0.5
    val rows = (1 to 1000).flatMap { id =>
      val a = rng.nextDouble() < 0.5
      val b = rng.nextDouble() < 0.5
      (if (a) Seq((id.toLong, "a")) else Nil) ++
        (if (b) Seq((id.toLong, "b")) else Nil)
    }.toDF("id", "cap")
    val r = graft.ops.Sampling
      .captureRecapture(rows, "id", col("cap") === "a",
        col("cap") === "b").head
    val est = r.getAs[Double]("chapman")
    assert(math.abs(est - 1000) < 4 * r.getAs[Double]("se"))
    assert(r.getAs[Long]("n_observed") <= 1000L)
    assert(r.getAs[Long]("n_overlap") > 150L)
  }

  test("vocabRichness: hand-computed frequency-of-frequencies") {
    import spark.implicits._
    // tokens: a a a b b c d → N=7, V=4, n1=2 (c,d), n2=1 (b)
    val df = Seq("a a a b", "b c d").map(Tuple1(_)).toDF("text")
    val r = graft.ops.TextAnalysis.vocabRichness(df, "text").head
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("singletons") == 2L)
    assert(r.getAs[Long]("doubletons") == 1L)
    assert(math.abs(r.getAs[Double]("p_unseen") - 2.0 / 7) < 1e-12)
    assert(math.abs(r.getAs[Double]("chao1") - (4 + 4.0 / 2)) < 1e-12)
  }

  test("gpdPotFit: exponential tail → xi near 0, return levels grow with horizon") {
    import spark.implicits._
    val rng = new scala.util.Random(43)
    // exponential(1) tail: GPD xi = 0 exactly in the limit
    val df = (1 to 20000).map(_ => Tuple1(-math.log(rng.nextDouble())))
      .toDF("v")
    val r = graft.ops.TimeSeries
      .gpdPotFit(df, "v", 0.9, Seq(1000, 10000)).orderBy("t_period")
      .collect()
    assert(r.length == 2)
    assert(math.abs(r(0).getAs[Double]("xi")) < 0.15)
    assert(r(0).getAs[Double]("sigma") > 0.7 &&
      r(0).getAs[Double]("sigma") < 1.3) // exp(1) sigma = 1
    assert(r(1).getAs[Double]("return_level") >
      r(0).getAs[Double]("return_level"))
    assert(r(0).getAs[Long]("n_exceed") > 1500L)
  }

  test("postStratify: reweighting corrects a biased mix exactly; ESS <= n_used") {
    import spark.implicits._
    // stratum a (value 10) over-sampled 4:1 vs b (value 20); the true
    // population is 50/50 → post mean must be exactly 15
    val df = ((1 to 800).map(_ => ("a", 10.0)) ++
      (1 to 200).map(_ => ("b", 20.0))).toDF("g", "v")
    val r = graft.ops.Sampling
      .postStratify(df, "g", "v", Map("a" -> 0.5, "b" -> 0.5)).head
    assert(math.abs(r.getAs[Double]("raw_mean") - 12.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("post_mean") - 15.0) < 1e-12)
    assert(r.getAs[Double]("ess") <= 1000.0)
    assert(r.getAs[Double]("ess") > 400.0)
    // an unmapped stratum is dropped and counted out of n_used
    val extra = df.union(Seq(("c", 99.0)).toDF("g", "v"))
    val r2 = graft.ops.Sampling
      .postStratify(extra, "g", "v", Map("a" -> 0.5, "b" -> 0.5)).head
    assert(r2.getAs[Long]("n_used") == 1000L)
    assert(r2.getAs[Long]("n_strata") == 2L)
    assert(math.abs(r2.getAs[Double]("post_mean") - 15.0) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.postStratify(df, "g", "v", Map("a" -> 0.7))
    }
  }

  test("holtLinear: > 4000-day series fails loudly instead of truncating") {
    import spark.implicits._
    val rows = (0 until 4001).map(d => Tuple1(java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2010, 1, 1, 0, 0).plusDays(d.toLong))))
      .toDF("ts")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holtLinear(rows, "ts", 0.3, 0.1, 3)
    }
    assert(e.getMessage.contains("4000"))
  }

  test("Risk.drawdown: hand-computed peaks, islands, longest spell") {
    import spark.implicits._
    // daily levels 10, 8, 12, 9, 7, 11 → runmax 10,10,12,12,12,12;
    // peaks on days 1 and 3; max dd = 1 - 7/12; spells of 1 and 3 days
    val df = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 8.0),
      ("a", "2024-01-03", 12.0), ("a", "2024-01-04", 9.0),
      ("a", "2024-01-05", 7.0), ("a", "2024-01-06", 11.0))
      .toDF("g", "ts", "v")
    val r = graft.ops.Risk.drawdown(df, "g", "ts", "v").head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(math.abs(r.getAs[Double]("peak_value") - 12.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("max_drawdown") - (1.0 - 7.0 / 12)) < 1e-9)
    assert(r.getAs[Long]("longest_underwater") == 3L)
    assert(math.abs(r.getAs[Double]("frac_underwater") - 4.0 / 6) < 1e-9)
  }

  test("Risk.riskAdjusted: hand-computed returns panel") {
    import spark.implicits._
    // levels 10, 12, 9, 9 → returns 0.2, -0.25, 0.0
    val df = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 12.0),
      ("a", "2024-01-03", 9.0), ("a", "2024-01-04", 9.0))
      .toDF("g", "ts", "v")
    val r = graft.ops.Risk.riskAdjusted(df, "g", "ts", "v").head
    assert(r.getAs[Long]("n_ret") == 3L)
    val m = (0.2 - 0.25 + 0.0) / 3
    assert(math.abs(r.getAs[Double]("mean_ret") - m) < 1e-9)
    assert(math.abs(r.getAs[Double]("win_rate") - 1.0 / 3) < 1e-9)
    assert(math.abs(r.getAs[Double]("best_day") - 0.2) < 1e-9)
    assert(math.abs(r.getAs[Double]("worst_day") + 0.25) < 1e-9)
    val dd = math.sqrt(0.25 * 0.25 / 3)
    assert(math.abs(r.getAs[Double]("downside_dev") - dd) < 1e-9)
    assert(math.abs(r.getAs[Double]("sortino") - m / dd) < 1e-9)
  }

  test("Risk.varBacktest: order-statistic VaR, strict violations, " +
      "zero-violation Kupiec limit") {
    import spark.implicits._
    // 41 levels → 40 returns: 38 small gains, one -0.5, one -0.6.
    // k = ceil(0.05·40) = 2 → VaR = 2nd smallest = -0.5; the single
    // r < -0.5 (the -0.6 crash) is the only violation.
    val days = (0 until 41).map(i =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    var level = 100.0
    val rows = days.zipWithIndex.map { case (d, i) =>
      if (i == 10) level = level * 0.5
      else if (i == 30) level = level * 0.4
      else if (i > 0) level = level * 1.01
      ("a", d, level)
    }
    val df = rows.toDF("g", "ts", "v")
    val r = graft.ops.Risk.varBacktest(df, "g", "ts", "v", p = 0.05).head
    assert(r.getAs[Long]("n_ret") == 40L)
    assert(math.abs(r.getAs[Double]("var_p") + 0.5) < 1e-6)
    assert(r.getAs[Long]("n_viol") == 1L)
    val lrPof = -2.0 * (39 * math.log(0.95) + math.log(0.05)
      - 39 * math.log(39.0 / 40) - math.log(1.0 / 40))
    assert(math.abs(r.getAs[Double]("lr_pof") - lrPof) < 1e-6)
    assert(r.getAs[Double]("lr_ind") >= 0.0)
    // a violation-free series hits the x→0 Kupiec limit −2n·ln(1−p)
    val flat = (0 until 21).map(i =>
      ("b", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        100.0 + i)).toDF("g", "ts", "v")
    val r2 = graft.ops.Risk.varBacktest(flat, "g", "ts", "v", p = 0.05).head
    assert(r2.getAs[Long]("n_viol") == 0L)
    assert(math.abs(r2.getAs[Double]("lr_pof")
      - (-2.0 * 20 * math.log(0.95))) < 1e-9)
    assert(r2.getAs[Double]("lr_ind") == 0.0)
  }

  test("markovChain: two-state chain converges to the exact stationary " +
      "distribution") {
    import spark.implicits._
    // one user's stream a a a b a a b a a b → transitions
    // a→a:4, a→b:3, b→a:2 → P = [[4/7, 3/7], [1, 0]] → π = (0.7, 0.3)
    val evs = Seq("a", "a", "a", "b", "a", "a", "b", "a", "a", "b")
      .zipWithIndex.map { case (t, i) =>
        (1L, java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
          t, i.toLong)
      }.toDF("u", "ts", "t", "eid")
    val r = graft.ops.Behavioral
      .markovChain(evs, "u", "ts", "t", tieCols = Seq("eid"),
        iterations = 40)
      .orderBy("state").collect()
    assert(r.map(_.getAs[String]("state")).toSeq == Seq("a", "b"))
    assert(r(0).getAs[Long]("n_out") == 7L)
    assert(r(1).getAs[Long]("n_out") == 2L)
    assert(math.abs(r(0).getAs[Double]("p_stationary") - 0.7) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("p_stationary") - 0.3) < 1e-9)
    // state b always returns to a → zero conditional entropy
    assert(r(1).getAs[Double]("h_cond") == 0.0)
    val ha = -(4.0 / 7) * math.log(4.0 / 7) - (3.0 / 7) * math.log(3.0 / 7)
    assert(math.abs(r(0).getAs[Double]("h_cond") - ha) < 1e-12)
  }

  test("permutationEntropy: monotone ramp → 0, known mix hand-checked") {
    import spark.implicits._
    val ramp = (0 until 10).map(i =>
      ("m", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        i.toDouble)).toDF("g", "ts", "v")
    val r = graft.ops.TimeSeries.permutationEntropy(ramp, "g", "ts", "v")
      .head
    assert(r.getAs[Long]("n_windows") == 8L)
    assert(r.getAs[Long]("n_patterns") == 1L)
    assert(r.getAs[Double]("perm_entropy") == 0.0)
    // 5, 1, 4, 2 → windows (5,1,4): pattern b,c,a = 4; (1,4,2): a,c,b = 1
    val mix = Seq(5.0, 1.0, 4.0, 2.0).zipWithIndex.map { case (v, i) =>
      ("x", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString, v)
    }.toDF("g", "ts", "v")
    val r2 = graft.ops.TimeSeries.permutationEntropy(mix, "g", "ts", "v")
      .head
    assert(r2.getAs[Long]("n_windows") == 2L)
    assert(r2.getAs[Long]("n_patterns") == 2L)
    assert(math.abs(r2.getAs[Double]("perm_entropy")
      - math.log(2) / math.log(6)) < 1e-12)
  }

  test("richClub: 4-clique plus pendants — hubs wire to each other") {
    import spark.implicits._
    // K4 on n1..n4 (each degree >= 3) plus a pendant on n1 (degree 1)
    val edges = Seq(
      ("n1", "n2"), ("n1", "n3"), ("n1", "n4"),
      ("n2", "n3"), ("n2", "n4"), ("n3", "n4"),
      ("n1", "p1")).toDF("s", "t")
    val r = graft.ops.Graph.richClub(edges, "s", "t", ks = Seq(1, 3))
      .orderBy("k").collect()
    // k=1: nodes with degree > 1 are n1..n4; all 6 clique edges qualify
    assert(r(0).getAs[Long]("n_nodes") == 4L)
    assert(r(0).getAs[Long]("n_edges") == 6L)
    assert(math.abs(r(0).getAs[Double]("phi") - 1.0) < 1e-12)
    // k=3: only n1 (degree 4) clears → phi NULL
    assert(r(1).getAs[Long]("n_nodes") == 1L)
    assert(r(1).getAs[Long]("n_edges") == 0L)
    assert(r(1).isNullAt(r(1).fieldIndex("phi")))
  }

  test("decisionCurve: hand-computed net benefit and treat-all line") {
    import spark.implicits._
    val df = Seq((1.0, 0.8), (0.0, 0.6), (1.0, 0.3), (0.0, 0.1))
      .toDF("y", "p")
    val r = graft.ops.Evaluation
      .decisionCurve(df, "y", "p", thresholds = Seq(0.25, 0.5))
      .orderBy("threshold").collect()
    assert(r(0).getAs[Long]("n_treated") == 3L)
    assert(r(0).getAs[Long]("tp") == 2L && r(0).getAs[Long]("fp") == 1L)
    assert(math.abs(r(0).getAs[Double]("net_benefit")
      - (0.5 - 0.25 * (0.25 / 0.75))) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("nb_treat_all")
      - (0.5 - 0.5 * (0.25 / 0.75))) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("net_benefit")) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("nb_treat_all")) < 1e-12)
  }

  test("neweyWestTrend: exact line → zero se; positive autocorrelation " +
      "inflates the HAC se") {
    import spark.implicits._
    val line = (0 until 6).map(i =>
      ("k", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        2.0 + 0.5 * i)).toDF("g", "ts", "v")
    val r = graft.ops.Regression
      .neweyWestTrend(line, "g", "ts", "v", maxLag = 2).head
    assert(math.abs(r.getAs[Double]("slope") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_ols")) < 1e-9)
    assert(r.isNullAt(r.fieldIndex("hac_ratio")))
    // 8-day same-sign residual blocks → lag-1..3 autocovariances all
    // strongly positive → HAC se must exceed the iid OLS se
    val noisy = (0 until 32).map(i =>
      ("k", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        5.0 + 0.1 * i + 0.4 * (if ((i / 8) % 2 == 0) 1 else -1)))
      .toDF("g", "ts", "v")
    val r2 = graft.ops.Regression
      .neweyWestTrend(noisy, "g", "ts", "v", maxLag = 3).head
    assert(r2.getAs[Double]("se_hac") > r2.getAs[Double]("se_ols"))
    assert(r2.getAs[Double]("hac_ratio") > 1.0)
  }

  test("runRules: 8-in-a-row fires R4, a lone spike fires R1") {
    import spark.implicits._
    val shift = (0 until 16).map(i =>
      ("k", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        if (i < 8) 10.0 else 20.0))
    val spike = (0 until 11).map(i =>
      ("s", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        if (i == 10) 1000.0 else 10.0))
    val df = (shift ++ spike).toDF("g", "ts", "v")
    val m = graft.ops.Spc.runRules(df, "g", "ts", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_flagged")).toMap
    // |m − μ| = 5 < σ ≈ 5.16 for the shift key: zone rules quiet, but
    // days 8 and 16 complete 8-in-a-row runs below then above center
    assert(m(("k", "R1")) == 0L && m(("k", "R2")) == 0L &&
      m(("k", "R3")) == 0L)
    assert(m(("k", "R4")) == 2L)
    // spike: 1000 > μ + 3σ ≈ 995.5 → one R1 day; days 8..10 complete
    // below-center runs of 8
    assert(m(("s", "R1")) == 1L)
    assert(m(("s", "R4")) == 3L)
  }

  test("categoricalShift: hand-computed TV / overlap over a midpoint " +
      "split") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-01"), ("b", "2024-01-01"),
      ("a", "2024-01-02"), ("b", "2024-01-02"),
      ("a", "2024-01-03"), ("a", "2024-01-04"))
      .toDF("c", "ts")
    val r = graft.ops.Profiling.categoricalShift(df, "c", "ts").head
    assert(r.getAs[Long]("n_before") == 4L)
    assert(r.getAs[Long]("n_after") == 2L)
    assert(r.getAs[Long]("n_cats") == 2L)
    assert(math.abs(r.getAs[Double]("tv") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("overlap") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("max_gap") - 0.5) < 1e-12)
  }

  test("thetaForecast: pure linear counts → forecast continues the line") {
    import spark.implicits._
    // day i has i+1 events → y_t = t exactly (t = 1..8): a = 0, b = 1,
    // z_t = 2t − t = t, SES converges along the line; forecast(h) =
    // ½((n+h) + s_n) — s_n lags the line, so check the closed recursion
    val rows = (0 until 8).flatMap { i =>
      (0 to i).map(_ => Tuple1(java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i.toLong))))
    }.toDF("ts")
    val r = graft.ops.TimeSeries
      .thetaForecast(rows, "ts", alpha = 0.2, horizon = 2)
      .orderBy("h").collect()
    assert(r(0).getAs[Long]("n_days") == 8L)
    assert(math.abs(r(0).getAs[Double]("intercept")) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("drift") - 1.0) < 1e-9)
    var s = 1.0
    for (t <- 2 to 8) s = 0.2 * t + 0.8 * s
    assert(math.abs(r(0).getAs[Double]("ses_level") - s) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("forecast")
      - 0.5 * (9 + s)) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("forecast")
      - 0.5 * (10 + s)) < 1e-9)
  }

  test("generalizedEntropy: equal values → all indices zero; " +
      "two-point hand computation") {
    import spark.implicits._
    val eq = Seq(5.0, 5.0, 5.0, 5.0).toDF("x")
    val r = graft.ops.Profiling.generalizedEntropy(eq, "x").head
    assert(math.abs(r.getAs[Double]("mld")) < 1e-12)
    assert(math.abs(r.getAs[Double]("theil_t")) < 1e-12)
    assert(math.abs(r.getAs[Double]("ge2")) < 1e-12)
    val two = Seq(1.0, 3.0).toDF("x")
    val r2 = graft.ops.Profiling.generalizedEntropy(two, "x").head
    // mean 2: MLD = ln2 − (ln1+ln3)/2; Theil = (3·ln3)/4 − ln2;
    // GE2 = ((5/4)/1 − 1)/2... mean²=4 → ((10/2)/4 − 1)/2 = 0.125
    assert(math.abs(r2.getAs[Double]("mld")
      - (math.log(2) - math.log(3) / 2)) < 1e-12)
    assert(math.abs(r2.getAs[Double]("theil_t")
      - (3 * math.log(3) / 4 - math.log(2))) < 1e-12)
    assert(math.abs(r2.getAs[Double]("ge2") - 0.125) < 1e-12)
  }

  test("textRank: hub word in a star co-occurrence graph ranks first") {
    import spark.implicits._
    // "hub" is adjacent to every spoke ≥ minCount times; spokes only
    // touch hub → hub must take the top rank
    val docs = (0 until 6).flatMap { _ =>
      Seq("hub alpha hub beta hub gamma", "delta hub epsilon hub")
    }.map(Tuple1(_)).toDF("text")
    val r = graft.ops.TextAnalysis
      .textRank(docs, "text", minCount = 5, k = 10, iterations = 3)
      .collect()
    assert(r.head.getAs[String]("term") == "hub")
    assert(r.length >= 5)
    val ranks = r.map(_.getAs[Double]("rank"))
    assert(ranks.head == ranks.max)
  }

  test("rougePairs: clipped-count unigram and bigram overlap by hand") {
    import spark.implicits._
    val docs = Seq((1L, "x y x z"), (2L, "x y x w")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = graft.ops.TextAnalysis
      .rougePairs(docs, "id", "text", pairs).head
    // unigrams: min(2,2)+min(1,1) = 3 of 4 → P = R = F = 0.75
    assert(math.abs(r.getAs[Double]("r1_precision") - 0.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("r1_recall") - 0.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("r1_f") - 0.75) < 1e-12)
    // bigrams: {x y, y x} shared of 3 each → F = 2/3
    assert(math.abs(r.getAs[Double]("r2_f") - 2.0 / 3) < 1e-12)
  }

  test("distinctNgrams: hand-computed ratios for a 2-doc corpus") {
    import spark.implicits._
    val docs = Seq("a b a", "a b").map(Tuple1(_)).toDF("text")
    val r = graft.ops.TextAnalysis.distinctNgrams(docs, "text", maxN = 3)
      .orderBy("n").collect()
    assert(r(0).getAs[Long]("total_ngrams") == 5L)
    assert(r(0).getAs[Long]("distinct_ngrams") == 2L)
    assert(math.abs(r(0).getAs[Double]("distinct_ratio") - 0.4) < 1e-12)
    assert(r(1).getAs[Long]("total_ngrams") == 3L)
    assert(r(1).getAs[Long]("distinct_ngrams") == 2L)
    assert(r(2).getAs[Long]("total_ngrams") == 1L)
    assert(math.abs(r(2).getAs[Double]("distinct_ratio") - 1.0) < 1e-12)
  }

  test("esdOutliers: sequential removals catch the masked second " +
      "outlier") {
    import spark.implicits._
    val counts = Seq(10, 12, 11, 13, 10, 12, 11, 100, 12, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map(_ => Tuple1(java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i.toLong))))
    }.toDF("ts")
    val r = graft.ops.TimeSeries.esdOutliers(rows, "ts", rounds = 3)
      .orderBy("round").collect()
    assert(r.map(_.getAs[Long]("n_used")).toSeq == Seq(10L, 9L, 8L))
    assert(r(0).getAs[Double]("removed_value") == 100.0)
    assert(r(1).getAs[Double]("removed_value") == 1.0)
    assert(r(0).getAs[Double]("r_stat") > r(1).getAs[Double]("r_stat"))
  }

  test("circularHourStats: midnight wrap lands mean hour at 0, not 12") {
    import spark.implicits._
    val df = Seq(("k", "2024-01-01 23:00:00"), ("k", "2024-01-02 01:00:00"))
      .toDF("g", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val r = graft.ops.TimeSeries.circularHourStats(df, "g", "ts").head
    assert(math.abs(r.getAs[Double]("mean_hour")) < 1e-9)
    assert(math.abs(r.getAs[Double]("resultant_r")
      - math.cos(math.Pi / 12)) < 1e-12)
    // antipodal hours cancel: R ≈ 0
    val anti = Seq(("a", "2024-01-01 00:30:00"), ("a", "2024-01-01 12:30:00"))
      .toDF("g", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val r2 = graft.ops.TimeSeries.circularHourStats(anti, "g", "ts").head
    assert(r2.getAs[Double]("resultant_r") < 1e-9)
  }

  test("abcClassification: 80/15/5 mass lands in A/B/C") {
    import spark.implicits._
    val df = Seq(("a", 80.0), ("b", 15.0), ("c", 5.0)).toDF("k", "v")
    val m = graft.ops.Profiling.abcClassification(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("value_share"))).toMap
    assert(m("A")._1 == 1L && math.abs(m("A")._2 - 0.8) < 1e-12)
    assert(m("B")._1 == 1L && math.abs(m("B")._2 - 0.15) < 1e-12)
    assert(m("C")._1 == 1L && math.abs(m("C")._2 - 0.05) < 1e-12)
  }

  test("savitzkyGolay: quadratic series is reproduced exactly") {
    import spark.implicits._
    // y_t = (t+1)² is a quadratic — the order-2 SG filter must return
    // it unchanged on every full window
    val rows = (0 until 9).flatMap { t =>
      (0 until (t + 1) * (t + 1)).map(_ => Tuple1(
        java.sql.Timestamp.valueOf(java.time.LocalDateTime
          .of(2024, 1, 1, 0, 0).plusDays(t.toLong))))
    }.map(x => ("k", x._1)).toDF("g", "ts")
    val r = graft.ops.TimeSeries.savitzkyGolay(rows, "g", "ts")
      .orderBy("day").collect()
    assert(r.length == 9)
    assert(r(0).isNullAt(r(0).fieldIndex("smooth"))) // edge day
    (3 to 5).foreach { i =>
      assert(math.abs(r(i).getAs[Double]("smooth")
        - (i + 1.0) * (i + 1.0)) < 1e-9)
      assert(math.abs(r(i).getAs[Double]("resid")) < 1e-9)
    }
  }

  test("biweightStats: outlier barely moves the biweight location") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0).toDF("x")
    val r = graft.ops.Profiling.biweightStats(df, "x").head
    assert(r.getAs[Double]("median") == 3.0) // DISC lower middle
    assert(r.getAs[Double]("mad") == 1.0)
    // symmetric core around 3 → one-step biweight stays at 3 exactly
    assert(math.abs(r.getAs[Double]("biweight_loc") - 3.0) < 1e-12)
    assert(r.getAs[Double]("mean") > 100.0)
    assert(r.getAs[Double]("biweight_midvar") > 0.0)
  }

  test("riditAnalysis: hand-computed mean ridits over a pooled " +
      "ordinal") {
    import spark.implicits._
    val df = Seq(("g1", 1), ("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3),
      ("g2", 3)).toDF("g", "c")
    val m = graft.ops.Profiling.riditAnalysis(df, "g", "c")
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("mean_ridit")).toMap
    assert(math.abs(m("g1") - 5.0 / 18) < 1e-12)
    assert(math.abs(m("g2") - 13.0 / 18) < 1e-12)
  }

  test("distributionFitPanel: hand-computed moment fits on {1,2,3,4}") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = graft.ops.Profiling.distributionFitPanel(df, "x").head
    assert(math.abs(r.getAs[Double]("mean") - 2.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("variance") - 5.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("exp_rate") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("gamma_shape") - 3.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("gamma_scale") - 2.0 / 3) < 1e-12)
    val mu = (math.log(2) + math.log(3) + math.log(4)) / 4
    assert(math.abs(r.getAs[Double]("lognorm_mu") - mu) < 1e-12)
    assert(math.abs(r.getAs[Double]("skew_gamma")
      - 2.0 / math.sqrt(3.75)) < 1e-12)
  }

  test("segmentMigration: quartile reversal lands on the anti-diagonal") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-02", 40.0),
      (1L, "2024-01-04", 40.0), (2L, "2024-01-04", 30.0),
      (3L, "2024-01-03", 20.0), (4L, "2024-01-03", 10.0))
      .toDF("e", "ts", "v")
    val m = graft.ops.Behavioral.segmentMigration(rows, "e", "ts", "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("row_share"))).toMap
    assert(m.keySet == Set((1, 4), (2, 3), (3, 2), (4, 1)))
    assert(m.values.forall { case (n, s) => n == 1L && s == 1.0 })
  }

  test("rankStability: identical halves → RBO = 1 − p^k, footrule 0") {
    import spark.implicits._
    val docs = Seq((0L, "a a a b b c"), (1L, "a a a b b c"),
      (2L, "a a a b b c"), (3L, "a a a b b c")).toDF("id", "text")
    val r = graft.ops.TextAnalysis
      .rankStability(docs, "id", "text", k = 3, p = 0.9).head
    assert(r.getAs[Long]("n_shared") == 3L)
    assert(math.abs(r.getAs[Double]("overlap_at_k") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rbo")
      - (1.0 - math.pow(0.9, 3))) < 1e-9)
    assert(r.getAs[Long]("footrule") == 0L)
  }

  test("sessionQuality: exit types, bounce rates, durations by hand") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (1L, "2024-01-01 00:01:40", 2L, "b"),
      (1L, "2024-01-01 02:00:00", 3L, "c"))
      .toDF("u", "ts", "eid", "t")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = graft.ops.Behavioral
      .sessionQuality(df, "u", "ts", "eid", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("b", "c"))
    assert(m("b").getAs[Long]("n_sessions") == 1L)
    assert(m("b").getAs[Double]("bounce_rate") == 0.0)
    assert(m("b").getAs[Double]("mean_events") == 2.0)
    assert(m("b").getAs[Double]("mean_duration_sec") == 100.0)
    assert(m("c").getAs[Double]("bounce_rate") == 1.0)
    assert(m("c").getAs[Double]("session_share") == 0.5)
  }

  test("stlStrength: pure weekly signal → seasonal strength 1, zero " +
      "remainder") {
    import spark.implicits._
    val pat = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
    val rows = (0 until 28).map(i =>
      ("k", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        pat(i % 7))).toDF("g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = graft.ops.TimeSeries
      .stlStrength(rows, Seq("g"), "ts", "v").head
    assert(math.abs(r.getAs[Double]("var_remainder")) < 1e-18)
    assert(math.abs(r.getAs[Double]("f_seasonal") - 1.0) < 1e-9)
    assert(r.isNullAt(r.fieldIndex("f_trend"))) // constant trend+rem
  }

  test("fanoTaylor: hand-computed Fano factors and Taylor exponent 2") {
    import spark.implicits._
    // k1 daily counts {1,3}: m=2, v=2, fano=1; k2 {2,6}: m=4, v=8,
    // fano=2 → slope = ln(8/2)/ln(4/2) = 2
    val rows =
      (0 until 1).map(_ => ("k1", "2024-01-01")) ++
      (0 until 3).map(_ => ("k1", "2024-01-02")) ++
      (0 until 2).map(_ => ("k2", "2024-01-01")) ++
      (0 until 6).map(_ => ("k2", "2024-01-02"))
    val df = rows.toDF("g", "ts")
    val m = graft.ops.TimeSeries.fanoTaylor(df, "g", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(m("k1").getAs[Double]("fano") - 1.0) < 1e-12)
    assert(math.abs(m("k2").getAs[Double]("fano") - 2.0) < 1e-12)
    assert(math.abs(m("k1").getAs[Double]("taylor_slope") - 2.0) < 1e-12)
  }

  test("intervalLoadCurve: +1/−1 prefix sums reproduce the hand WIP") {
    import spark.implicits._
    val df = Seq(("2024-01-01", "2024-01-03"), ("2024-01-02", "2024-01-03"))
      .toDF("s", "e")
    val r = graft.ops.TimeSeries.intervalLoadCurve(df, "s", "e")
      .orderBy("day").collect()
    assert(r.map(_.getAs[Long]("active")).toSeq == Seq(1L, 2L, 0L))
    assert(r(2).getAs[Long]("ended") == 2L)
    assert(r(2).getAs[Long]("started") == 0L)
  }

  test("riskPanel: hand-computed 2x2 — RR 2, OR 3, NNT 4, E-value") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 1), (1, 0), (1, 0), (0, 1), (0, 0), (0, 0),
      (0, 0)).toDF("ex", "oc")
    val r = graft.ops.Evaluation
      .riskPanel(df, col("ex") === 1, col("oc") === 1).head
    assert(math.abs(r.getAs[Double]("rr") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("odds_ratio") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("risk_diff") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("nnt") - 4.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_value")
      - (2.0 + math.sqrt(2.0))) < 1e-12)
    assert(r.getAs[Double]("rr_lo") < 2.0 && r.getAs[Double]("rr_hi") > 2.0)
  }

  test("metaAnalysis: homogeneous strata → pooled effect exact, " +
      "tau2 = 0") {
    import spark.implicits._
    val rows =
      Seq(("A", 1, 1.0), ("A", 1, 2.0), ("A", 1, 3.0),
        ("A", 0, 0.0), ("A", 0, 1.0), ("A", 0, 2.0),
        ("B", 1, 2.0), ("B", 1, 4.0), ("B", 1, 6.0),
        ("B", 0, 1.0), ("B", 0, 3.0), ("B", 0, 5.0))
    val df = rows.toDF("g", "ex", "v")
    val r = graft.ops.Evaluation
      .metaAnalysis(df, "g", col("ex") === 1, "v").head
    assert(r.getAs[Long]("k") == 2L)
    assert(math.abs(r.getAs[Double]("fe_effect") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("re_effect") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("q_stat")) < 1e-12)
    assert(r.getAs[Double]("tau2") == 0.0)
    assert(r.getAs[Double]("i2") == 0.0)
  }

  test("aipwEffect: within-stratum randomization with constant effect " +
      "→ all three estimators 1, zero se") {
    import spark.implicits._
    val rows = Seq(
      (1, 0.1, 2.0), (1, 0.1, 2.0), (0, 0.1, 1.0), (0, 0.1, 1.0),
      (1, 0.9, 5.0), (1, 0.9, 5.0), (0, 0.9, 4.0), (0, 0.9, 4.0))
    val df = rows.toDF("t", "p", "y")
    val r = graft.ops.Evaluation
      .aipwEffect(df, col("t") === 1, "p", "y", bins = 5).head
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_used") == 8L)
    assert(math.abs(r.getAs[Double]("ate_outcome") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ate_ipw") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ate_aipw") - 1.0) < 1e-12)
    assert(r.getAs[Double]("se_aipw") == 0.0)
  }

  test("spectralMassPanel: rank-1 covariance → PR = stable rank = 1") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(-1.0, 0.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0, 0.0)), (3L, Array(-1.0, 0.0, 0.0, 0.0)))
      .toDF("id", "v")
    val r = graft.ops.Features.spectralMassPanel(df, "id", "v", d = 4)
      .head
    // population covariance: E[x²] − μ² = 1 in dim 0, zero elsewhere
    assert(math.abs(r.getAs[Double]("trace") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("participation_ratio") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("lambda_max") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("stable_rank") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("top_share") - 1.0) < 1e-9)
  }

  test("alignmentUniformity: hand-computed pairs on unit vectors") {
    import spark.implicits._
    val df = Seq(
      (0L, 0, Array(1.0, 0.0)), (1L, 0, Array(1.0, 0.0)),
      (2L, 0, Array(0.0, 1.0)), (3L, 0, Array(0.0, 1.0)))
      .toDF("id", "lab", "v")
    val r = graft.ops.Features
      .alignmentUniformity(df, "id", "v", "lab").head
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(math.abs(r.getAs[Double]("alignment") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Long]("n_background") == 2L)
    // both half-offset pairs are orthogonal: ln(exp(−4)) = −4
    assert(math.abs(r.getAs[Double]("uniformity") + 4.0) < 1e-12)
  }

  test("hubnessPanel: a central hub dominates 1-NN occurrence") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, Array(0.9, -0.1)), (4L, Array(-1.0, 0.0)))
      .toDF("id", "v")
    val r = graft.ops.Features.hubnessPanel(df, "id", "v", cap = 8, k = 1)
      .head
    assert(r.getAs[Long]("n_sample") == 4L)
    assert(r.getAs[Long]("max_kocc") == 2L)
    assert(math.abs(r.getAs[Double]("frac_antihub") - 0.5) < 1e-12)
    // k-occurrences {2,2,0,0} are symmetric → zero skew
    assert(math.abs(r.getAs[Double]("skew_kocc")) < 1e-12)
  }

  test("weibullFit: log-moment formulas reproduced, DISC quantile " +
      "anchors observed") {
    import spark.implicits._
    val df = Seq(1.0, math.exp(2), 1.0, math.exp(2)).toDF("t")
    val r = graft.ops.Survival.weibullFit(df, "t").head
    val m = 1.0
    val s = math.sqrt(4.0 / 3) // sd of {0,2,0,2}
    val k = math.Pi / (s * math.sqrt(6))
    val lam = math.exp(m + 0.5772156649015329 / k)
    assert(math.abs(r.getAs[Double]("k_shape") - k) < 1e-9)
    assert(math.abs(r.getAs[Double]("lambda_scale") - lam) < 1e-9)
    assert(math.abs(r.getAs[Double]("fit_median")
      - lam * math.pow(math.log(2), 1 / k)) < 1e-9)
    assert(r.getAs[Double]("obs_median") == 1.0) // DISC lower middle
  }

  test("lorenzAsymmetry: a single giant drives S above F+L baseline") {
    import spark.implicits._
    val df = Seq(1.0, 1.0, 1.0, 97.0).toDF("x")
    val r = graft.ops.Profiling.lorenzAsymmetry(df, "x").head
    assert(math.abs(r.getAs[Double]("mean") - 25.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("f_mu") - 0.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("l_mu") - 0.03) < 1e-12)
    assert(math.abs(r.getAs[Double]("asymmetry") - 0.78) < 1e-12)
  }

  test("digitHeaping: uniform last cents → zero chi2; no round heaps") {
    import spark.implicits._
    val df = (0 until 10).map(i => 1.10 + i * 0.01).toDF("x")
    val r = graft.ops.Profiling.digitHeaping(df, "x").head
    assert(r.getAs[Long]("n") == 10L)
    assert(math.abs(r.getAs[Double]("chi2_last_digit")) < 1e-12)
    assert(r.getAs[Double]("share_mod5") == 0.0)
    assert(r.getAs[Double]("share_mod10") == 0.0)
  }

  test("reliabilityPanel: hand-computed MTBF/MTTR/availability") {
    import spark.implicits._
    val rows = Seq((0L, "ok"), (10L, "error"), (20L, "ok"),
      (30L, "error"), (40L, "error"), (50L, "ok")).zipWithIndex.map {
      case ((sec, t), i) =>
        (1L, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(sec)), i.toLong, t)
    }
    val df = rows.toDF("u", "ts", "eid", "t")
    val r = graft.ops.Behavioral
      .reliabilityPanel(df, "u", "ts", "eid", "t", "error").head
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Long]("n_failures") == 3L)
    assert(math.abs(r.getAs[Double]("mtbf_sec") - 15.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mttr_sec") - 40.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("failures_per_1k") - 500.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("availability")
      - 15.0 / (15 + 40.0 / 3)) < 1e-12)
  }

  test("bradleyTerry: two items with 3:1 odds → ratings 1.5 and 0.5") {
    import spark.implicits._
    val pairs = Seq(("a", "b", 3L, 1L)).toDF("i", "j", "wi", "wj")
    val m = graft.ops.Graph.bradleyTerry(pairs, "i", "j", "wi", "wj")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rating"))
      .toMap
    assert(math.abs(m("a") - 1.5) < 1e-9)
    assert(math.abs(m("b") - 0.5) < 1e-9)
  }

  test("kitagawa: composition + rate effects sum exactly to the gap") {
    import spark.implicits._
    def block(s: String, b: Int, pos: Int, neg: Int) =
      (0 until pos).map(_ => (s, b, 1)) ++ (0 until neg).map(_ => (s, b, 0))
    val rows = block("X", 0, 1, 9) ++ block("Y", 0, 5, 5) ++
      block("X", 1, 3, 27) ++ block("Y", 1, 7, 3)
    val df = rows.toDF("s", "b", "oc")
    val r = graft.ops.Evaluation
      .kitagawa(df, "s", col("b") === 1, col("oc") === 1).head
    assert(math.abs(r.getAs[Double]("rate_a") - 0.3) < 1e-12)
    assert(math.abs(r.getAs[Double]("rate_b") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("composition_effect") + 0.125) < 1e-12)
    assert(math.abs(r.getAs[Double]("rate_effect") - 0.075) < 1e-12)
    assert(math.abs(r.getAs[Double]("gap")
      - (r.getAs[Double]("composition_effect") +
        r.getAs[Double]("rate_effect"))) < 1e-12)
  }

  test("oaxacaBlinder: equal endowments → the whole gap is " +
      "unexplained") {
    import spark.implicits._
    val rows = Seq(1, 2, 3).flatMap(x =>
      Seq(("A", x.toDouble, 2.0 * x), ("B", x.toDouble, x.toDouble)))
    val df = rows.toDF("g", "x", "y")
    val r = graft.ops.Evaluation
      .oaxacaBlinder(df, col("g") === "A", "x", "y").head
    assert(math.abs(r.getAs[Double]("gap") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("explained")) < 1e-12)
    assert(math.abs(r.getAs[Double]("unexplained") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("beta_a") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("beta_b") - 1.0) < 1e-12)
  }

  test("fightinWords: a one-sided term tops |z|; shared terms score " +
      "near zero") {
    import spark.implicits._
    val docs = Seq(
      (0L, "common common alpha alpha alpha"),
      (2L, "common alpha alpha"),
      (1L, "common common beta beta beta"),
      (3L, "common beta beta")).toDF("id", "text")
    val r = graft.ops.TextAnalysis
      .fightinWords(docs, "id", "text", alpha0 = 10.0, k = 3).collect()
    val top = r.map(_.getAs[String]("term")).take(2).toSet
    assert(top == Set("alpha", "beta"))
    val zs = r.map(x => x.getAs[String]("term") -> x.getAs[Double]("z"))
      .toMap
    assert(zs("alpha") > 0 && zs("beta") < 0)
    assert(math.abs(zs.getOrElse("common", 0.0)) <
      math.min(zs("alpha"), -zs("beta")))
  }

  test("hotspotCells: the planted hot cell ranks first by z") {
    import spark.implicits._
    val rows =
      (0 until 100).map(i => ("t1", 0L, i < 90)) ++   // hot: 90%
      (0 until 100).map(i => ("t1", 1L, i < 10)) ++
      (0 until 100).map(i => ("t2", 0L, i < 10)) ++
      (0 until 100).map(i => ("t2", 1L, i < 10))
    val df = rows.toDF("t", "b", "oc")
    val r = graft.ops.Profiling.hotspotCells(df, col("t"), col("b"),
      col("oc"), minN = 30, k = 2).collect()
    assert(r(0).getAs[String]("dim1") == "t1")
    assert(r(0).getAs[Long]("dim2") == 0L)
    assert(r(0).getAs[Double]("z") > 0)
    assert(math.abs(r(0).getAs[Double]("rate") - 0.9) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("overall_rate") - 0.3) < 1e-12)
  }

  test("psmAtt: nearest in-caliper control wins; out-of-caliper " +
      "treated stays unmatched") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, 0.1010, 10.0), (2L, 0, 0.1005, 7.0),
      (3L, 0, 0.1020, 8.0), (4L, 0, 0.5000, 0.0),
      (5L, 1, 0.9000, 1.0)).toDF("id", "t", "p", "y")
    val r = graft.ops.Evaluation
      .psmAtt(df, col("t") === 1, "p", "y", "id", caliper = 0.002).head
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(math.abs(r.getAs[Double]("match_rate") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("att") - 3.0) < 1e-12) // 10 − 7
  }

  test("randomizationTest: an overwhelming real effect gets the " +
      "minimal exact p") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, if (i <= 20) 1 else 0,
      if (i <= 20) 100.0 else 0.0)).toDF("id", "t", "y")
    val r = graft.ops.Evaluation
      .randomizationTest(df, col("t") === 1, "id", "y", k = 19).head
    assert(math.abs(r.getAs[Double]("effect") - 100.0) < 1e-12)
    assert(r.getAs[Long]("k") == 19L)
    assert(r.getAs[Long]("n_ge") == 0L)
    assert(math.abs(r.getAs[Double]("p_value") - 0.05) < 1e-12)
    assert(r.getAs[Double]("max_pseudo_abs") < 100.0)
  }

  test("groupSequential: OF-shaped boundaries shrink; a huge effect " +
      "crosses at the final look") {
    import spark.implicits._
    val rows = (0 until 100).map { i =>
      val t = i % 2
      (i.toLong,
        java.time.LocalDate.of(2024, 1, 1).plusDays((i / 10).toLong)
          .toString,
        t, t * 10.0 + (i % 3) * 0.1)
    }
    val df = rows.toDF("id", "ts", "t", "y")
    val r = graft.ops.Evaluation
      .groupSequential(df, col("t") === 1, "ts", "y", looks = 5,
        c = 2.04)
      .orderBy("look").collect()
    assert(r.map(_.getAs[Long]("n_cum")).toSeq == Seq(20L, 40L, 60L,
      80L, 100L))
    assert(math.abs(r(0).getAs[Double]("boundary")
      - 2.04 * math.sqrt(5.0)) < 1e-12)
    assert(math.abs(r(4).getAs[Double]("boundary") - 2.04) < 1e-12)
    assert(r(4).getAs[Boolean]("crossed"))
  }

  test("marketBeta: a key that IS half the market has beta 1, " +
      "alpha 0, r2 1") {
    import spark.implicits._
    val vals = Seq(10.0, 12.0, 9.0, 15.0, 11.0)
    val rows = vals.zipWithIndex.flatMap { case (v, i) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
        .toString
      Seq(("a", day, v), ("b", day, v))
    }
    val df = rows.toDF("g", "ts", "v")
    val m = graft.ops.Risk.marketBeta(df, "g", "ts", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { g =>
      assert(m(g).getAs[Long]("n_days") == 4L)
      assert(math.abs(m(g).getAs[Double]("beta") - 1.0) < 1e-9)
      assert(math.abs(m(g).getAs[Double]("alpha")) < 1e-9)
      assert(math.abs(m(g).getAs[Double]("r2") - 1.0) < 1e-9)
    }
  }

  test("adoptionCurve: new vs returning split and cumulative adopters") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-02")).toDF("u", "ts")
    val r = graft.ops.Behavioral.adoptionCurve(df, "u", "ts")
      .orderBy("day").collect()
    assert(r(0).getAs[Long]("active_users") == 1L)
    assert(r(0).getAs[Long]("new_users") == 1L)
    assert(r(0).getAs[Long]("cum_adopters") == 1L)
    assert(r(1).getAs[Long]("active_users") == 2L)
    assert(r(1).getAs[Long]("new_users") == 1L)
    assert(r(1).getAs[Long]("returning_users") == 1L)
    assert(r(1).getAs[Long]("cum_adopters") == 2L)
  }

  test("streakPanel: gaps-and-islands longest runs, DISC quantiles") {
    import spark.implicits._
    val df = (Seq(1, 2, 3, 5).map(d => (1L, s"2024-01-0$d")) ++
      Seq(1, 3).map(d => (2L, s"2024-01-0$d"))).toDF("u", "ts")
    val r = graft.ops.Behavioral.streakPanel(df, "u", "ts").head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(math.abs(r.getAs[Double]("mean_max_streak") - 2.0) < 1e-12)
    assert(r.getAs[Long]("p50") == 1L) // DISC lower middle of {1, 3}
    assert(r.getAs[Long]("p90") == 3L)
    assert(r.getAs[Long]("max_streak") == 3L)
  }

  test("minhash LSH hot-bucket guard fails loudly on a degenerate corpus") {
    import spark.implicits._
    // a byte-identical-heavy corpus (the pathological shape the exact-
    // dedup-first discipline prevents): every doc lands in ONE bucket
    val degenerate = (1 to 2000)
      .map(i => (i.toLong, "the same exact document text every time"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.ops.Dedup.minhashLsh(degenerate, "doc_id", "text",
        maxBucketSize = Some(100)).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxBucketSize")), msgs(e).mkString("|"))
    // unguarded + guarded-with-headroom paths both still work
    val mixed = ((1 to 50).map(i => (i.toLong, s"unique document $i ${i * 7}")) :+
      (51L, "unique document 1 7")).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashLsh(mixed, "doc_id", "text",
      maxBucketSize = Some(1000))
    assert(pairs.where(col("doc_a") === 1L && col("doc_b") === 51L).count() == 1)
  }

  test("sampleEntropy: hand-worked 6-day series (m=2 forward templates)") {
    import spark.implicits._
    // daily counts [1,2,1,2,1,9] → templates (1,2,1),(2,1,2),(1,2,1),(2,1,9)
    // σ² = 92/6 − (16/6)² ; r ≈ 0.5735 → matches need integer equality:
    // b-pairs (0,2),(1,3); a-pairs only (0,2) → SampEn = −ln(1/2) = ln 2
    val counts = Seq(1, 2, 1, 2, 1, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.sampleEntropy(rows, "ts", rFactor = 0.2).head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("n_templates") == 4L)
    assert(math.abs(r.getAs[Double]("r")
      - 0.2 * math.sqrt(92.0 / 6 - (16.0 / 6) * (16.0 / 6))) < 1e-12)
    assert(r.getAs[Long]("b_count") == 2L)
    assert(r.getAs[Long]("a_count") == 1L)
    assert(math.abs(r.getAs[Double]("sample_entropy") - math.log(2)) < 1e-12)
  }

  test("kalmanLevel: constant series → zero SSE, exact gain/variance") {
    import spark.implicits._
    // y = [5,5,5], q=10, r=100, P0=r: pp1=110, k1=11/21, P1=1100/21;
    // pp2=1310/21, k2=131/341, P2=13100/341; all innovations zero
    val rows = (0 until 3).flatMap(i => Seq.fill(5)(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)).toDF("ts")
    val r = graft.ops.TimeSeries.kalmanLevel(rows, "ts", q = 10.0, r = 100.0).head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Double]("level") == 5.0)
    assert(r.getAs[Double]("sse") == 0.0)
    assert(r.getAs[Double]("rmse") == 0.0)
    assert(math.abs(r.getAs[Double]("k_gain") - 131.0 / 341) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_var") - 13100.0 / 341) < 1e-9)
    assert(math.abs(r.getAs[Double]("neg_loglik")
      - 0.5 * (math.log(2 * math.Pi * 210.0)
        + math.log(2 * math.Pi * 3410.0 / 21))) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.kalmanLevel(rows, "ts", q = 0.0, r = 100.0)
    }
  }

  test("phillipsPerron: hand-worked AR(1) regression + Bartlett L=1") {
    import spark.implicits._
    // x = [1,2,1,3,1]: rho = −9/11, residuals u = (−4,−6,7,3)/11,
    // γ0 = 5/22, γ1 = 3/484, λ² = 113/484, t_rho = −2√5
    val rows = Seq(1.0, 2.0, 1.0, 3.0, 1.0).zipWithIndex.map { case (v, i) =>
      (java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString, v)
    }.toDF("ts", "v")
    val r = graft.ops.TimeSeries.phillipsPerron(rows, "ts", "v", lags = 1).head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(math.abs(r.getAs[Double]("rho") - (-9.0 / 11)) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_rho") - (-2 * math.sqrt(5))) < 1e-12)
    assert(math.abs(r.getAs[Double]("gamma0") - 5.0 / 22) < 1e-12)
    assert(math.abs(r.getAs[Double]("lambda2") - 113.0 / 484) < 1e-12)
    assert(math.abs(r.getAs[Double]("z_rho") - (-9704.0 / 1331)) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_tau")
      - (math.sqrt(110.0 / 113) * (-2 * math.sqrt(5))
        - (6.0 / 11) / math.sqrt(1243.0))) < 1e-9)
  }

  test("arForecast: Yule-Walker AR(2) on alternating counts") {
    import spark.implicits._
    // counts [1,2,1,2,1]: μ=1.4, c=(0.24,−0.192,0.136) → φ1=−26/27,
    // φ2=−11/54; backtest and 3-step fan recomputed below
    val counts = Seq(1, 2, 1, 2, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val out = graft.ops.TimeSeries.arForecast(rows, "ts").orderBy("h").collect()
    assert(out.length == 3)
    val mu = 7.0 / 5
    val p1 = -26.0 / 27
    val p2 = -11.0 / 54
    val r0 = out(0)
    assert(r0.getAs[Long]("n_days") == 5L)
    assert(math.abs(r0.getAs[Double]("phi1") - p1) < 1e-9)
    assert(math.abs(r0.getAs[Double]("phi2") - p2) < 1e-9)
    assert(math.abs(r0.getAs[Double]("mean_daily") - mu) < 1e-12)
    // in-sample one-step predictions at t = 2,3,4
    val preds = Seq((1.0, 2.0, 1.0), (2.0, 1.0, 2.0), (1.0, 2.0, 1.0)).map {
      case (y, z1, z2) => (y, mu + p1 * (z1 - mu) + p2 * (z2 - mu))
    }
    val mae = preds.map { case (y, p) => math.abs(y - p) }.sum / 3
    val rmse = math.sqrt(preds.map { case (y, p) => (y - p) * (y - p) }.sum / 3)
    assert(math.abs(r0.getAs[Double]("mae") - mae) < 1e-9)
    assert(math.abs(r0.getAs[Double]("rmse") - rmse) < 1e-9)
    assert(math.abs(r0.getAs[Double]("mase") - mae) < 1e-9) // naive MAE = 1
    val f1 = mu + p1 * (1.0 - mu) + p2 * (2.0 - mu)
    val f2 = mu + p1 * (f1 - mu) + p2 * (1.0 - mu)
    val f3 = mu + p1 * (f2 - mu) + p2 * (f1 - mu)
    assert(math.abs(r0.getAs[Double]("forecast") - f1) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("forecast") - f2) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("forecast") - f3) < 1e-9)
  }

  test("engleGrangerEcm: DuckDB-cross-checked constants on 6-day panel") {
    import spark.implicits._
    // x=[1,2,1,3,2,4], y=[2.5,4.2,2.8,6.1,4.4,7.9]; expected values
    // independently computed from the normal equations in DuckDB
    val data = Seq(
      (0, 1.0, 2.5), (1, 2.0, 4.2), (2, 1.0, 2.8),
      (3, 3.0, 6.1), (4, 2.0, 4.4), (5, 4.0, 7.9)).map { case (t, x, y) =>
      (java.time.LocalDate.of(2024, 1, 1).plusDays(t.toLong).toString, x, y)
    }.toDF("ts", "x", "y")
    val r = graft.ops.TimeSeries.engleGrangerEcm(data, "ts", "x", "y").head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("n_ecm") == 5L)
    assert(math.abs(r.getAs[Double]("alpha_lr") - 0.860975609756) < 1e-9)
    assert(math.abs(r.getAs[Double]("beta_lr") - 1.748780487805) < 1e-9)
    assert(math.abs(r.getAs[Double]("gamma_adj") - (-0.739268568847)) < 1e-9)
    assert(math.abs(r.getAs[Double]("delta_x_coef") - 1.691688310103) < 1e-9)
    assert(math.abs(r.getAs[Double]("t_gamma") - (-1.028337773927)) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2_ecm") - 0.998251416391) < 1e-9)
  }

  test("groupFairness: hand-worked two-group confusion panel") {
    import spark.implicits._
    // g1: (d,y) = (T,T),(T,F),(F,T),(F,F); g2: (T,T),(T,T)
    val rows = Seq(("g1", true, true), ("g1", true, false),
      ("g1", false, true), ("g1", false, false),
      ("g2", true, true), ("g2", true, true)).toDF("seg", "d", "y")
    val r = graft.ops.Fairness
      .groupFairness(rows, "seg", col("d"), col("y"))
      .orderBy("grp").collect()
    val g1 = r(0)
    assert(g1.getAs[Long]("n") == 4L)
    assert(g1.getAs[Double]("sel_rate") == 0.5)
    assert(g1.getAs[Double]("tpr") == 0.5)
    assert(g1.getAs[Double]("fpr") == 0.5)
    assert(g1.getAs[Double]("ppv") == 0.5)
    // overall selection = 4/6; max group selection = 1 (g2)
    assert(math.abs(g1.getAs[Double]("spd") - (0.5 - 4.0 / 6)) < 1e-12)
    assert(g1.getAs[Double]("di_ratio") == 0.5)
    val g2 = r(1)
    assert(g2.getAs[Double]("sel_rate") == 1.0)
    assert(g2.getAs[Double]("tpr") == 1.0)
    assert(g2.isNullAt(g2.fieldIndex("fpr"))) // no negatives in g2
    assert(math.abs(g2.getAs[Double]("spd") - (1.0 - 4.0 / 6)) < 1e-12)
    assert(g2.getAs[Double]("di_ratio") == 1.0)
  }

  test("cka: duplicated half-views -> 1; constant half -> NULL") {
    import spark.implicits._
    val dup = Seq(Seq(1f, 0f, 1f, 0f), Seq(0f, 1f, 0f, 1f),
      Seq(2f, 3f, 2f, 3f)).toDF("v")
    val r = graft.ops.Features.cka(dup, "v", 4, 2).head
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Int]("p_dims") == 2)
    assert(math.abs(r.getAs[Double]("cka") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cross_norm")
      - r.getAs[Double]("x_norm")) < 1e-12)
    val flat = Seq(Seq(1f, 2f, 5f, 5f), Seq(3f, 4f, 5f, 5f)).toDF("v")
    val r2 = graft.ops.Features.cka(flat, "v", 4, 2).head
    assert(r2.getAs[Double]("y_norm") == 0.0)
    assert(r2.isNullAt(r2.fieldIndex("cka")))
  }

  test("lifeTable: hand-worked 28-day actuarial intervals") {
    import spark.implicits._
    // durations (days, event): k=0 {5T,10T,30 is k=1...}: see asserts
    val rows = Seq((5, true), (10, true), (30, false), (35, true),
      (70, false)).toDF("dur", "ev")
    val r = graft.ops.Survival.lifeTable(rows, "dur", "ev", 28)
      .orderBy("interval").collect()
    assert(r.length == 3)
    // k=0: d=2 c=0 n_risk=5, q=2/5, S=3/5
    assert(r(0).getAs[Long]("n_risk") == 5L)
    assert(r(0).getAs[Long]("n_event") == 2L)
    assert(r(0).getAs[Long]("n_censored") == 0L)
    assert(math.abs(r(0).getAs[Double]("q") - 0.4) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("surv") - 0.6) < 1e-12)
    // k=1 (days 28-55): d=1 (35) c=1 (30), n_risk=3, q=1/(3-0.5)=2/5
    assert(r(1).getAs[Long]("day_start") == 28L)
    assert(r(1).getAs[Long]("n_risk") == 3L)
    assert(r(1).getAs[Long]("n_event") == 1L)
    assert(r(1).getAs[Long]("n_censored") == 1L)
    assert(math.abs(r(1).getAs[Double]("q") - 0.4) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("surv") - 0.36) < 1e-12)
    // k=2 (day 70 censored): d=0 c=1, n_risk=1, q=0, surv unchanged
    assert(r(2).getAs[Long]("n_risk") == 1L)
    assert(r(2).getAs[Double]("q") == 0.0)
    assert(math.abs(r(2).getAs[Double]("surv") - 0.36) < 1e-12)
  }

  test("runsTwoSample: interleaved ABABA -> 5 runs, exact z") {
    import spark.implicits._
    val rows = Seq((1.0, "A", 1L, 1), (3.0, "A", 2L, 1), (5.0, "A", 3L, 1),
      (2.0, "B", 4L, 1), (4.0, "B", 5L, 1)).toDF("v", "g", "k1", "k2")
    val r = graft.analysis.AnalysisPlanner
      .runsTwoSample(rows, "v", "g", Seq("k1", "k2")).head
    assert(r.getAs[String]("group_a") == "A")
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("runs") == 5L)
    assert(math.abs(r.getAs[Double]("expected_runs") - 3.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("variance") - 0.84) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 1.6 / math.sqrt(0.84)) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.analysis.AnalysisPlanner.runsTwoSample(
        rows.withColumn("g", lit("only")), "v", "g", Seq("k1"))
    }
  }

  test("gphLongMemory: DuckDB-cross-checked on 16-day pi-digit series") {
    import spark.implicits._
    val y = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    val rows = y.zipWithIndex.map { case (v, i) =>
      (java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString,
        v.toDouble)
    }.toDF("ts", "v")
    val r = graft.ops.TimeSeries.gphLongMemory(rows, "ts", "v").head
    assert(r.getAs[Long]("n_days") == 16L)
    assert(r.getAs[Long]("n_freqs") == 4L)
    assert(math.abs(r.getAs[Double]("d_hat") - 1.752540232065) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_d") - 1.099195731853) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 0.559671235924) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.gphLongMemory(rows.limit(4), "ts", "v")
    }
  }

  test("dfa: DuckDB-cross-checked fluctuations; 2-size fit has r2 = 1") {
    import spark.implicits._
    val y = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    val rows = y.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.dfa(rows, "ts", boxSizes = Seq(4, 8))
      .orderBy("s").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_boxes") == 4L)
    assert(r(1).getAs[Long]("n_boxes") == 2L)
    assert(math.abs(r(0).getAs[Double]("fluctuation") - 1.214495780149) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("fluctuation") - 2.029910272472) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("alpha") - 0.741058480557) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("demandClasses: one part per Syntetos-Boylan quadrant") {
    import spark.implicits._
    def day(week: Int) = java.time.LocalDate.ofEpochDay(week * 7L).toString
    val rows = Seq(
      // A: every week, steady -> smooth (adi=1, cv2 tiny)
      ("A", day(0), 10.0), ("A", day(1), 10.0), ("A", day(2), 10.0),
      ("A", day(3), 11.0),
      // B: sparse AND volatile -> lumpy (adi=2.5, cv2=200/121)
      ("B", day(0), 1.0), ("B", day(4), 21.0),
      // C: every week but volatile -> erratic (adi=1, cv2=420.5/240.25)
      ("C", day(0), 1.0), ("C", day(1), 30.0),
      // D: sparse, steady -> intermittent (adi=7/3, cv2=0)
      ("D", day(0), 5.0), ("D", day(3), 5.0), ("D", day(6), 5.0)
    ).toDF("part", "ts", "qty")
    val r = graft.ops.TimeSeries
      .demandClasses(rows, "part", "ts", "qty")
      .orderBy("demand_class").collect()
    assert(r.map(_.getAs[String]("demand_class")).toSeq ==
      Seq("erratic", "intermittent", "lumpy", "smooth"))
    assert(r.forall(_.getAs[Long]("n_keys") == 1L))
    val byClass = r.map(x =>
      x.getAs[String]("demand_class") -> x).toMap
    assert(math.abs(byClass("smooth").getAs[Double]("avg_adi") - 1.0) < 1e-12)
    assert(math.abs(byClass("lumpy").getAs[Double]("avg_adi") - 2.5) < 1e-12)
    assert(math.abs(byClass("lumpy").getAs[Double]("avg_cv2")
      - 200.0 / 121) < 1e-12)
    assert(math.abs(byClass("erratic").getAs[Double]("avg_cv2")
      - 420.5 / 240.25) < 1e-12)
    assert(math.abs(byClass("intermittent").getAs[Double]("avg_adi")
      - 7.0 / 3) < 1e-12)
    assert(byClass("intermittent").getAs[Double]("avg_cv2") == 0.0)
  }

  test("cornishFisher: alternating +-10% returns -> zero skew, kurt -2") {
    import spark.implicits._
    // daily sums 100,110,99,108.9,98.01 -> returns +0.1,-0.1,+0.1,-0.1
    val vals = Seq(100.0, 110.0, 99.0, 108.9, 98.01)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("k", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString, v)
    }.toDF("g", "ts", "v")
    val r = graft.ops.Risk.cornishFisherVar(rows, "g", "ts", "v").head
    assert(r.getAs[Long]("n_ret") == 4L)
    assert(r.getAs[Double]("mean_ret") == 0.0)
    assert(math.abs(r.getAs[Double]("sd_ret") - 0.1) < 1e-12)
    assert(math.abs(r.getAs[Double]("skew")) < 1e-9)
    assert(math.abs(r.getAs[Double]("kurt_excess") - (-2.0)) < 1e-9)
    val z95 = -1.6448536269514722
    val z99 = -2.3263478740408408
    def w(z: Double) = z + (z * z * z - 3 * z) * -2.0 / 24
    assert(math.abs(r.getAs[Double]("var95_gauss") - (-0.1 * z95)) < 1e-9)
    assert(math.abs(r.getAs[Double]("var95_cf") - (-0.1 * w(z95))) < 1e-9)
    assert(math.abs(r.getAs[Double]("var99_gauss") - (-0.1 * z99)) < 1e-9)
    assert(math.abs(r.getAs[Double]("var99_cf") - (-0.1 * w(z99))) < 1e-9)
  }

  test("katzCentrality: path graph a-b-c, two hand-checked iterations") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val r = graft.ops.Graph
      .katzCentrality(edges, "s", "t", alpha = 0.1, iterations = 2)
      .orderBy("node").collect()
    assert(r.map(_.getAs[String]("node")).toSeq == Seq("a", "b", "c"))
    assert(math.abs(r(0).getAs[Double]("katz") - 1.12) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("katz") - 1.22) < 1e-12)
    assert(math.abs(r(2).getAs[Double]("katz") - 1.12) < 1e-12)
  }

  test("rankBiasedOverlap: hand-worked depth-3 p=0.5 lists") {
    import spark.implicits._
    // A ranks x,y,z ; B ranks x,w,y -> A_d = 1,1,2
    val docs = Seq(("A", "x x x y y z"), ("B", "x x x w w y"))
      .toDF("src", "text")
    val r = graft.ops.TextAnalysis
      .rankBiasedOverlap(docs, "src", "text", "A", "B", depth = 3, p = 0.5)
      .head
    assert(r.getAs[Int]("depth") == 3)
    assert(r.getAs[Long]("n_common") == 2L)
    assert(math.abs(r.getAs[Double]("overlap_at_depth") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("rbo_trunc") - 17.0 / 24) < 1e-12)
    assert(math.abs(r.getAs[Double]("rbo_ext") - 19.0 / 24) < 1e-12)
  }

  test("twoNnDimension: 3 collinear sample points, exact mu ratios") {
    import spark.implicits._
    val rows = Seq((0L, Seq(0f, 0f)), (5L, Seq(1f, 0f)),
      (10L, Seq(3f, 0f)), (1L, Seq(9f, 9f))).toDF("vec_id", "v")
    val r = graft.ops.Similarity
      .twoNnDimension(rows, "vec_id", "v", sampleMod = 5).head
    assert(r.getAs[Long]("n_sampled") == 3L) // id 1 not in the sample
    assert(r.getAs[Long]("n_used") == 3L)
    // mu = 3, 2, 1.5 -> sum ln = ln 9
    assert(math.abs(r.getAs[Double]("sum_log_mu") - math.log(9)) < 1e-9)
    assert(math.abs(r.getAs[Double]("id_twonn") - 3.0 / math.log(9)) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.twoNnDimension(rows, "vec_id", "v",
        sampleMod = 1, maxSample = 2)
    }
  }

  test("weightedJaccardGroups: two sources, hand-worked Ruzicka") {
    import spark.implicits._
    // A: w(x)=2/3, w(y)=1/3 ; B: w(x)=1/4, w(y)=3/4
    val docs = Seq(("A", "x x y"), ("B", "x y y y")).toDF("src", "text")
    val r = graft.ops.TextAnalysis
      .weightedJaccardGroups(docs, "src", "text").head
    assert(r.getAs[String]("src_a") == "A")
    assert(r.getAs[Long]("n_shared_terms") == 2L)
    // smin = 1/4 + 1/3 = 7/12 ; wj = smin / (2 - smin) = 7/17
    assert(math.abs(r.getAs[Double]("weighted_jaccard") - 7.0 / 17) < 1e-12)
  }

  test("lofScores: 1-D cluster plus far point, hand-worked k=2") {
    import spark.implicits._
    val pts = Seq(("a", 0.0), ("b", 1.0), ("c", 2.0), ("d", 10.0))
      .toDF("id", "x")
    val r = graft.ops.Similarity.lofScores(pts, "id", Seq("x"), k = 2)
      .orderBy("id").collect()
    val by = r.map(x => x.getAs[String]("id") -> x).toMap
    assert(by("a").getAs[Double]("kdist") == 2.0)
    assert(math.abs(by("a").getAs[Double]("lrd") - 2.0 / 3) < 1e-12)
    assert(math.abs(by("a").getAs[Double]("lof") - 7.0 / 8) < 1e-12)
    assert(math.abs(by("b").getAs[Double]("lof") - 4.0 / 3) < 1e-12)
    assert(math.abs(by("c").getAs[Double]("lof") - 7.0 / 8) < 1e-12)
    assert(math.abs(by("d").getAs[Double]("lrd") - 2.0 / 17) < 1e-12)
    assert(math.abs(by("d").getAs[Double]("lof") - 119.0 / 24) < 1e-12)
  }

  test("spectralRadius: triangle graph -> exactly 2; path under-reads") {
    import spark.implicits._
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("s", "t")
    val r = graft.ops.Graph.spectralRadius(tri, "s", "t").head
    assert(r.getAs[Long]("n_nodes") == 3L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(math.abs(r.getAs[Double]("lambda_max") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha_max") - 0.5) < 1e-12)
    // bipartite path a-b-c: oscillates, Rayleigh lower bound = 4/3
    val path = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val p = graft.ops.Graph.spectralRadius(path, "s", "t").head
    assert(math.abs(p.getAs[Double]("lambda_max") - 4.0 / 3) < 1e-9)
  }

  test("binarySegmentation: two-step series, hand-worked 3 splits") {
    import spark.implicits._
    // counts [1,1,1,1,9,9,5,5]: root at day 3 (SSE 88 -> 16), left
    // flat (0 -> 0), right splits 9,9|5,5 at day 5 (16 -> 0)
    val counts = Seq(1, 1, 1, 1, 9, 9, 5, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.binarySegmentation(rows, "ts")
      .orderBy("segment").collect()
    val by = r.map(x => x.getAs[String]("segment") -> x).toMap
    assert(r.length == 3)
    assert(by("root").getAs[java.sql.Date]("change_day").toString ==
      "2024-01-04")
    assert(by("root").getAs[Long]("n_seg") == 8L)
    assert(math.abs(by("root").getAs[Double]("sse_before") - 88.0) < 1e-9)
    assert(math.abs(by("root").getAs[Double]("sse_after") - 16.0) < 1e-9)
    assert(math.abs(by("root").getAs[Double]("reduction_share")
      - 9.0 / 11) < 1e-9)
    assert(by("left").getAs[java.sql.Date]("change_day").toString ==
      "2024-01-01")
    assert(by("left").getAs[Double]("sse_after") == 0.0)
    assert(by("left").isNullAt(by("left").fieldIndex("reduction_share")))
    assert(by("right").getAs[java.sql.Date]("change_day").toString ==
      "2024-01-06")
    assert(by("right").getAs[Long]("n_seg") == 4L)
    assert(math.abs(by("right").getAs[Double]("sse_before") - 16.0) < 1e-9)
    assert(by("right").getAs[Double]("sse_after") == 0.0)
    assert(math.abs(by("right").getAs[Double]("reduction_share") - 1.0)
      < 1e-12)
  }

  test("ransacLine: exact line plus one gross outlier -> outlier ignored") {
    import spark.implicits._
    val pts = ((0 to 8).map(x => (x.toDouble, 2.0 * x + 1)) :+ (9.0, 100.0))
      .toDF("x", "y")
    val r = graft.ops.Regression.ransacLine(pts, "x", "y").head
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Long]("best_inliers") == 9L)
    assert(math.abs(r.getAs[Double]("slope_cand") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("icept_cand") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope_refit") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("icept_refit") - 1.0) < 1e-9)
  }

  test("transferEntropy: y follows x's state -> hand-worked nats") {
    import spark.implicits._
    // counts [2,1,1,2,2,1] (X state), day means [0,10,0,0,10,10] (Y):
    // sy(t+1) = sx(t) by construction
    val counts = Seq(2, 1, 1, 2, 2, 1)
    val vals = Seq(0.0, 10.0, 0.0, 0.0, 10.0, 10.0)
    val rows = counts.zip(vals).zipWithIndex.flatMap {
      case ((c, v), i) => Seq.fill(c)(
        (java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString, v))
    }.toDF("ts", "v")
    val r = graft.ops.TimeSeries.transferEntropy(rows, "ts", "v").head
    assert(r.getAs[Long]("n_transitions") == 5L)
    val teXY = 0.4 * math.log(1.5) + 0.4 * math.log(2) + 0.2 * math.log(3)
    val teYX = 0.2 * (math.log(0.75) + 2 * math.log(2) + 2 * math.log(1.5))
    assert(math.abs(r.getAs[Double]("te_x_to_y") - teXY) < 1e-9)
    assert(math.abs(r.getAs[Double]("te_y_to_x") - teYX) < 1e-9)
  }

  test("tailDependence: comonotone -> 1, antimonotone -> 0") {
    import spark.implicits._
    val co = (1 to 10).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner
      .tailDependence(co, "x", "y", p = 0.8).head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("q_upper_x") == 8.0)
    assert(r.getAs[Long]("n_upper_y") == 2L)
    assert(r.getAs[Double]("lambda_upper") == 1.0)
    assert(r.getAs[Double]("q_lower_x") == 2.0)
    assert(r.getAs[Double]("lambda_lower") == 1.0)
    val anti = (1 to 10).map(i => (i.toDouble, 11.0 - i)).toDF("x", "y")
    val r2 = graft.analysis.AnalysisPlanner
      .tailDependence(anti, "x", "y", p = 0.8).head
    assert(r2.getAs[Double]("lambda_upper") == 0.0)
    assert(r2.getAs[Double]("lambda_lower") == 0.0)
  }

  test("robustShape: uniform 1..15 -> octiles 2..14, zero Bowley skew") {
    import spark.implicits._
    val rows = (1 to 15).map(_.toDouble).toDF("v")
    val r = graft.analysis.AnalysisPlanner.robustShape(rows, "v").head
    assert(r.getAs[Long]("n") == 15L)
    assert(r.getAs[Double]("e1") == 2.0)
    assert(r.getAs[Double]("e2") == 4.0)
    assert(r.getAs[Double]("e4") == 8.0)
    assert(r.getAs[Double]("e6") == 12.0)
    assert(r.getAs[Double]("e7") == 14.0)
    assert(r.getAs[Double]("bowley_skew") == 0.0)
    assert(math.abs(r.getAs[Double]("moors_kurtosis") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("quartile_dispersion") - 0.5) < 1e-12)
  }

  test("dbscan: 1-D chain cluster, one border, one noise point") {
    import spark.implicits._
    val pts = Seq(("a", 0.0), ("b", 0.1), ("c", 0.2), ("d", 0.3),
      ("e", 0.4), ("f", 0.6), ("g", 5.0)).toDF("id", "x")
    val r = graft.ops.Similarity
      .dbscan(pts, "id", Seq("x"), eps = 0.25, minPts = 2)
      .orderBy("id").collect()
    val by = r.map(x => x.getAs[String]("id") -> x).toMap
    Seq("a", "b", "c", "d", "e").foreach { id =>
      assert(by(id).getAs[String]("role") == "core")
      assert(by(id).getAs[String]("cluster") == "a")
    }
    assert(by("f").getAs[String]("role") == "border")
    assert(by("f").getAs[String]("cluster") == "a")
    assert(by("g").getAs[String]("role") == "noise")
    assert(by("g").isNullAt(by("g").fieldIndex("cluster")))
  }

  test("mdlpSplit: tied cuts break to the smaller value; MDL rejects") {
    import spark.implicits._
    val rows = Seq((1.0, true), (1.0, true), (2.0, true), (2.0, false),
      (3.0, false), (3.0, false)).toDF("v", "y")
    val r = graft.analysis.AnalysisPlanner
      .mdlpSplit(rows, "v", col("y")).head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Double]("split_value") == 1.0)
    assert(r.getAs[Long]("n_left") == 2L)
    assert(r.getAs[Double]("h_parent") == 1.0)
    assert(r.getAs[Double]("h_left") == 0.0)
    val h14 = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75)) / math.log(2)
    assert(math.abs(r.getAs[Double]("h_right") - h14) < 1e-12)
    assert(math.abs(r.getAs[Double]("info_gain") - (1 - 4.0 / 6 * h14))
      < 1e-12)
    // MDL: delta = log2(7) - (2*1 - 1*0 - 2*h14); thr = (log2(5)+d)/6
    val thr = (math.log(5) / math.log(2) + math.log(7) / math.log(2) -
      (2.0 - 2 * h14)) / 6
    assert(math.abs(r.getAs[Double]("mdl_threshold") - thr) < 1e-12)
    assert(!r.getAs[Boolean]("accepted"))
  }

  test("sessionCopresence: hand-worked PMI over 5 sessions") {
    import spark.implicits._
    // sessions 1,2,5 contain {A,B}; 3 only A; 4 only B
    val rows = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"),
      (4, "B"), (5, "A"), (5, "B"), (5, "B")).map { case (u, t) =>
      (u.toLong, "2024-01-01", t)
    }.toDF("u", "day", "t")
    val r = graft.ops.Behavioral
      .sessionCopresence(rows, Seq(col("u"), col("day")), "t",
        minPairSessions = 2).head
    assert(r.getAs[String]("item_a") == "A")
    assert(r.getAs[String]("item_b") == "B")
    assert(r.getAs[Long]("n_sessions_both") == 3L)
    assert(math.abs(r.getAs[Double]("lift") - 15.0 / 16) < 1e-12)
    assert(math.abs(r.getAs[Double]("pmi") - math.log(15.0 / 16)) < 1e-12)
  }

  test("classSeparability: separated 1-D clusters -> d' = 2*sqrt(2), AUC 1") {
    import spark.implicits._
    val rows = Seq((1L, Seq(0f, 0f), 0), (2L, Seq(1f, 0f), 0),
      (3L, Seq(2f, 0f), 1), (4L, Seq(3f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.ops.Features
      .classSeparability(rows, "embedding", "label", 0, 1, d = 2).head
    assert(r.getAs[Long]("n0") == 2L)
    assert(r.getAs[Long]("n1") == 2L)
    // w = (2, 0); projections 0,2 | 4,6
    assert(math.abs(r.getAs[Double]("mean_proj_0") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_proj_1") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("sd_pooled") - math.sqrt(2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("d_prime") - 4 / math.sqrt(2)) < 1e-9)
    assert(r.getAs[Double]("auc") == 1.0)
  }

  test("poissonBootstrapSlope: exact line -> every replica slope 3") {
    import spark.implicits._
    val rows = (1 to 30).map(i => (i.toLong, i.toDouble, 3.0 * i + 2))
      .toDF("id", "x", "y")
    val r = graft.analysis.AnalysisPlanner
      .poissonBootstrapSlope(rows, "x", "y", Seq("id"), b = 50).head
    assert(r.getAs[Long]("n") == 30L)
    assert(r.getAs[Long]("b") <= 50L && r.getAs[Long]("b") >= 40L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_lo") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_hi") - 3.0) < 1e-9)
  }

  test("expectile: {0,10} tau=0.9 -> 9; tau=0.5 -> mean") {
    import spark.implicits._
    val rows = Seq(0.0, 10.0).toDF("v")
    val r = graft.analysis.AnalysisPlanner.expectile(rows, "v", 0.9).head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("mean") == 5.0)
    assert(math.abs(r.getAs[Double]("expectile") - 9.0) < 1e-12)
    assert(r.getAs[Double]("delta_last") == 0.0)
    val r2 = graft.analysis.AnalysisPlanner.expectile(rows, "v", 0.5).head
    assert(math.abs(r2.getAs[Double]("expectile") - 5.0) < 1e-12)
  }

  test("phScoreTrend: 4 subjects, hand-worked risk-set residuals") {
    import spark.implicits._
    val rows = Seq((1.0, true, 5.0), (2.0, true, 1.0), (3.0, true, 3.0),
      (3.0, false, 3.0)).toDF("dur", "ev", "x")
    val r = graft.ops.Survival.phScoreTrend(rows, "dur", "ev", "x").head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_events") == 3L)
    // residuals (t, r): (1, 2), (2, -4/3), (3, 0)
    val num = -6.0
    val den = math.sqrt(6 * 152.0 / 9)
    val corr = num / den
    assert(math.abs(r.getAs[Double]("corr_time") - corr) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_stat")
      - corr * math.sqrt(1.0 / (1 - corr * corr))) < 1e-9)
  }

  test("haarEnergy: [1,3,5,7] two levels, hand-worked energies") {
    import spark.implicits._
    val counts = Seq(1, 3, 5, 7)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.haarEnergy(rows, "ts", levels = 2)
      .orderBy("level").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("block_size") == 2L)
    assert(r(0).getAs[Long]("n_blocks") == 2L)
    assert(math.abs(r(0).getAs[Double]("energy") - 2.0) < 1e-12)
    assert(r(1).getAs[Long]("n_blocks") == 1L)
    assert(math.abs(r(1).getAs[Double]("energy") - 4.0) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("energy_share") - 1.0 / 3) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("energy_share") - 2.0 / 3) < 1e-12)
  }

  test("dieboldMariano: exact weekly cycle -> seasonal-naive wins") {
    import spark.implicits._
    val p = Seq(1, 2, 1, 2, 1, 2, 3)
    val rows = (0 until 14).flatMap { i =>
      Seq.fill(p(i % 7))(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.dieboldMariano(rows, "ts").head
    assert(r.getAs[Long]("n_common") == 7L)
    assert(math.abs(r.getAs[Double]("mse_naive") - 10.0 / 7) < 1e-9)
    assert(r.getAs[Double]("mse_snaive") == 0.0)
    assert(math.abs(r.getAs[Double]("mean_loss_diff") - 10.0 / 7) < 1e-9)
    val (g0, g1, g2) = (378.0 / 49, -9.0 / 49, -18.0 / 49)
    val lrv = g0 / 7 + 2 * (1 - 1.0 / 3) * g1 / 7 + 2 * (1 - 2.0 / 3) * g2 / 7
    assert(math.abs(r.getAs[Double]("dm_stat")
      - (10.0 / 7) / math.sqrt(lrv / 7)) < 1e-9)
  }

  test("pesaranTimmermann: perfect anti-momentum -> PT = -4/sqrt(3)") {
    import spark.implicits._
    val counts = Seq(1, 2, 1, 2, 1, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.pesaranTimmermann(rows, "ts").head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("hit_rate") == 0.0)
    assert(r.getAs[Double]("p_star") == 0.5)
    assert(math.abs(r.getAs[Double]("pt_stat") - (-4 / math.sqrt(3))) < 1e-9)
  }

  test("minhashAccuracyAudit: identical docs -> bucket 4, zero error") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "q r s t u v")).toDF("doc_id", "text")
    val r = graft.ops.Dedup
      .minhashAccuracyAudit(docs, "doc_id", "text").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("bucket") == 4L)
    assert(r(0).getAs[Long]("n_pairs") == 1L)
    assert(r(0).getAs[Double]("avg_est") == 1.0)
    assert(r(0).getAs[Double]("avg_exact") == 1.0)
    assert(r(0).getAs[Double]("mae") == 0.0)
  }

  test("lmScoreDecileMix: unseen-vocab doc lands in the bottom decile") {
    import spark.implicits._
    val docs = Seq((1L, "a a", "X"), (2L, "b b", "Y"), (3L, "q q", "X"))
      .toDF("doc_id", "text", "source")
    val r = graft.ops.TextAnalysis
      .lmScoreDecileMix(docs, "doc_id", "text", "source",
        docs.where(col("doc_id") < 3), "text")
      .orderBy("decile", "source").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Int]("decile") == 0)
    assert(r(0).getAs[String]("source") == "X") // the q-doc
    assert(r(0).getAs[Double]("share_of_decile") == 1.0)
    assert(r(1).getAs[Int]("decile") == 3)
    assert(r(1).getAs[Double]("share_of_decile") == 0.5)
    assert(r(2).getAs[Int]("decile") == 3)
    assert(r(2).getAs[String]("source") == "Y")
  }

  test("crossSourceNgramContainment: one shared bigram of two") {
    import spark.implicits._
    val docs = Seq(("A", "x y z"), ("B", "x y q")).toDF("source", "text")
    val r = graft.ops.Dedup
      .crossSourceNgramContainment(docs, "source", "text", n = 2)
      .orderBy("src_a").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("grams_a") == 2L)
    assert(r(0).getAs[Long]("grams_shared") == 1L)
    assert(r(0).getAs[Double]("containment") == 0.5)
    assert(r(1).getAs[Double]("containment") == 0.5)
  }

  test("sourceProfileOutliers: hand-worked z over three sources") {
    import spark.implicits._
    val docs = Seq(("A", "the cat"), ("A", "the cat"), ("B", "the dog"),
      ("C", "zz zz zz")).toDF("source", "text")
    val r = graft.ops.TextAnalysis
      .sourceProfileOutliers(docs, "source", "text")
      .orderBy("source").collect()
    val by = r.map(x => x.getAs[String]("source") -> x).toMap
    assert(by("A").getAs[Long]("n_docs") == 2L)
    assert(by("A").getAs[Double]("mean_doc_tokens") == 2.0)
    assert(by("A").getAs[Double]("stopword_ratio") == 0.5)
    assert(by("C").getAs[Double]("mean_doc_tokens") == 3.0)
    assert(by("C").getAs[Double]("stopword_ratio") == 0.0)
    assert(math.abs(by("C").getAs[Double]("type_token_ratio") - 1.0 / 3)
      < 1e-12)
    // mdt = [2,2,3]: population sd = sqrt(2)/3, z(C) = sqrt(2)
    assert(math.abs(by("C").getAs[Double]("z_len") - math.sqrt(2)) < 1e-9)
    assert(r.forall(!_.getAs[Boolean]("flagged")))
  }

  test("zipfHapaxBySource: counts 4,2,1 -> hand-worked slope") {
    import spark.implicits._
    val docs = Seq(("S", "a a a a b b c")).toDF("source", "text")
    val r = graft.ops.TextAnalysis
      .zipfHapaxBySource(docs, "source", "text").head
    assert(r.getAs[Long]("vocab") == 3L)
    assert(math.abs(r.getAs[Double]("hapax_share") - 1.0 / 3) < 1e-12)
    assert(r.getAs[Long]("n_ranked") == 3L)
    val lx = Seq(0.0, math.log(2), math.log(3))
    val ly = Seq(math.log(4), math.log(2), 0.0)
    val (sx, sy) = (lx.sum, ly.sum)
    val sxx = lx.map(x => x * x).sum
    val sxy = lx.zip(ly).map { case (x, y) => x * y }.sum
    val slope = (sxy - sx * sy / 3) / (sxx - sx * sx / 3)
    assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-9)
  }

  test("sbgRetention: hand-worked alpha=0.5 beta=1.5 cohort") {
    import spark.implicits._
    // 8 users day 0; 6 on day 1; 5 on day 2; 4 on day 3:
    // S1=.75, S2=.625 -> beta=1.5, alpha=.5; S(3) projected 0.546875
    def day(i: Int) = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString
    val rows = ((1 to 8).map(u => (u.toLong, day(0))) ++
      (1 to 6).map(u => (u.toLong, day(1))) ++
      (1 to 5).map(u => (u.toLong, day(2))) ++
      (1 to 4).map(u => (u.toLong, day(3)))).toDF("u", "ts")
    val r = graft.ops.Behavioral
      .sbgRetention(rows, "u", "ts", horizon = 3, periodDays = 1)
      .orderBy("period").collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("n_cohort_users") == 8L))
    assert(math.abs(r(0).getAs[Double]("alpha") - 0.5) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("beta") - 1.5) < 1e-12)
    assert(r(0).getAs[Double]("observed_retention") == 0.75)
    assert(math.abs(r(0).getAs[Double]("projected_retention") - 0.75)
      < 1e-12)
    assert(math.abs(r(1).getAs[Double]("projected_retention") - 0.625)
      < 1e-12)
    assert(r(2).getAs[Double]("observed_retention") == 0.5)
    assert(math.abs(r(2).getAs[Double]("projected_retention") - 0.546875)
      < 1e-12)
  }

  test("edgeEmbeddedness: triangle plus pendant -> one bridge") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
      .toDF("s", "t")
    val r = graft.ops.Graph.edgeEmbeddedness(edges, "s", "t").head
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_bridges") == 1L)
    assert(r.getAs[Double]("bridge_share") == 0.25)
    assert(r.getAs[Double]("avg_support") == 0.75)
    assert(r.getAs[Long]("max_support") == 1L)
  }

  test("stochasticDominance: shifted sample dominates") {
    import spark.implicits._
    val rows = Seq((2.0, "A"), (4.0, "A"), (1.0, "B"), (3.0, "B"))
      .toDF("v", "g")
    val r = graft.analysis.AnalysisPlanner
      .stochasticDominance(rows, "v", "g", "A", "B").head
    assert(r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Double]("d_ab") == 0.0)
    assert(r.getAs[Double]("d_ba") == 0.5)
    assert(r.getAs[String]("verdict") == "a_dominates")
  }

  test("growthDecomposition: effects sum exactly to the delta") {
    import spark.implicits._
    val rows = (Seq.fill(2)(("S", false, 10.0)) ++
      Seq.fill(3)(("S", true, 12.0))).toDF("seg", "p", "v")
    val r = graft.ops.Behavioral
      .growthDecomposition(rows, "seg", col("p"), "v").head
    assert(r.getAs[Long]("n0") == 2L)
    assert(r.getAs[Long]("n1") == 3L)
    assert(r.getAs[Double]("delta") == 16.0)
    assert(r.getAs[Double]("volume_effect") == 10.0)
    assert(r.getAs[Double]("rate_effect") == 4.0)
    assert(r.getAs[Double]("cross_effect") == 2.0)
  }

  test("ma1Fit: zero rho1 -> theta 0; big negative rho1 -> not invertible") {
    import spark.implicits._
    def mk(xs: Seq[Double]) = xs.zipWithIndex.map { case (v, i) =>
      (java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString, v)
    }.toDF("ts", "v")
    val r = graft.ops.TimeSeries.ma1Fit(mk(Seq(0, 1, 1, 0, 0)), "ts", "v")
      .head
    assert(r.getAs[Long]("n_diffs") == 4L)
    assert(r.getAs[Double]("rho1") == 0.0)
    assert(r.getAs[Boolean]("invertible"))
    assert(r.getAs[Double]("theta") == 0.0)
    assert(math.abs(r.getAs[Double]("sigma2_innov") - 0.5) < 1e-12)
    val r2 = graft.ops.TimeSeries.ma1Fit(mk(Seq(0, 1, 0, 1, 0)), "ts", "v")
      .head
    assert(math.abs(r2.getAs[Double]("rho1") - (-0.75)) < 1e-12)
    assert(!r2.getAs[Boolean]("invertible"))
    assert(r2.isNullAt(r2.fieldIndex("theta")))
    assert(r2.isNullAt(r2.fieldIndex("sigma2_innov")))
  }

  test("audienceOverlap: shared users -> hand-worked Jaccard") {
    import spark.implicits._
    val rows = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L),
      ("B", 3L), ("C", 4L)).toDF("t", "u")
    val r = graft.ops.Behavioral.audienceOverlap(rows, "t", "u").collect()
    assert(r.length == 1) // only pairs with a non-empty intersection
    assert(r(0).getAs[String]("item_a") == "A")
    assert(r(0).getAs[Long]("users_a") == 3L)
    assert(r(0).getAs[Long]("users_both") == 2L)
    assert(math.abs(r(0).getAs[Double]("jaccard") - 2.0 / 3) < 1e-12)
  }

  test("rankingDisagreement: one swapped pair of three sources") {
    import spark.implicits._
    val docs = Seq(("A", "x x x"), ("B", "x y"), ("C", "x y z q"))
      .toDF("source", "text")
    val r = graft.ops.TextAnalysis
      .rankingDisagreement(docs, "source", "text").head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_discordant") == 1L)
    assert(math.abs(r.getAs[Double]("tau_distance") - 1.0 / 3) < 1e-12)
  }

  test("extremalIndex: two clusters of three exceedances") {
    import spark.implicits._
    // daily counts [1,2,3,4,5,10,6,1,9,8], q70 threshold = 6:
    // exceedances at days 5, 8, 9 -> clusters start at 5 and 8
    val counts = Seq(1, 2, 3, 4, 5, 10, 6, 1, 9, 8)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries
      .extremalIndex(rows, "ts", thresholdQ = 0.7, runGap = 2).head
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Double]("threshold") == 6.0)
    assert(r.getAs[Long]("n_exceed") == 3L)
    assert(r.getAs[Long]("n_clusters") == 2L)
    assert(math.abs(r.getAs[Double]("extremal_index") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("mean_cluster_size") == 1.5)
  }

  test("meanResidualLife: 1..10 at q50/q80 -> excesses 3 and 1.5") {
    import spark.implicits._
    val rows = (1 to 10).map(_.toDouble).toDF("v")
    val r = graft.ops.TimeSeries
      .meanResidualLife(rows, "v", qs = Seq(0.5, 0.8))
      .orderBy("q").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Double]("threshold") == 5.0)
    assert(r(0).getAs[Long]("n_exceed") == 5L)
    assert(r(0).getAs[Double]("mean_excess") == 3.0)
    assert(r(1).getAs[Double]("threshold") == 8.0)
    assert(r(1).getAs[Double]("mean_excess") == 1.5)
  }

  test("burstinessMemory: gaps 1,2,4 -> hand-worked B and M = 1") {
    import spark.implicits._
    val rows = Seq(0, 1, 3, 7).zipWithIndex.map { case (sec, i) =>
      ("k", f"2024-01-01 00:00:$sec%02d", i.toLong)
    }.toDF("g", "ts0", "id")
      .select(col("g"), to_timestamp(col("ts0")).as("ts"), col("id"))
    val r = graft.ops.Behavioral
      .burstinessMemory(rows, "g", "ts", tieCols = Seq("id")).head
    assert(r.getAs[Long]("n_gaps") == 3L)
    assert(math.abs(r.getAs[Double]("mean_gap") - 7.0 / 3) < 1e-12)
    val sd = math.sqrt(14.0) / 3
    assert(math.abs(r.getAs[Double]("sd_gap") - sd) < 1e-9)
    assert(math.abs(r.getAs[Double]("b_index")
      - (sd - 7.0 / 3) / (sd + 7.0 / 3)) < 1e-9)
    assert(math.abs(r.getAs[Double]("memory_coeff") - 1.0) < 1e-12)
  }

  test("chatterjeeXi: monotone n=5 -> 0.5; quadratic with ties -> 0") {
    import spark.implicits._
    val mono = (1 to 5).map(i => ("g", i.toDouble, (i * i).toDouble, i.toLong))
      .toDF("g", "x", "y", "id")
    val r1 = graft.ops.TimeSeries
      .chatterjeeXi(mono, "g", "x", "y", tieCols = Seq("id")).head
    assert(r1.getAs[Long]("n") == 5L)
    assert(r1.getAs[Long]("sum_abs_dr") == 4L)
    // no-ties reduction: xi = 1 - 3*4/(n^2-1) = 0.5
    assert(math.abs(r1.getAs[Double]("xi") - 0.5) < 1e-12)
    // y = (x-3)^2: r over x-order = [5,3,1,3,5] -> sum|dr| = 8,
    // sum l(n-l) = 20 -> xi = 1 - 5*8/40 = 0
    val quad = (1 to 5).map(i =>
      ("g", i.toDouble, ((i - 3) * (i - 3)).toDouble, i.toLong))
      .toDF("g", "x", "y", "id")
    val r2 = graft.ops.TimeSeries
      .chatterjeeXi(quad, "g", "x", "y", tieCols = Seq("id")).head
    assert(r2.getAs[Long]("sum_abs_dr") == 8L)
    assert(math.abs(r2.getAs[Double]("xi")) < 1e-12)
  }

  test("watsonU2: u = {0.25, 0.5, 0.75} -> U2 = 1/24") {
    import spark.implicits._
    val rows = Seq(("g", "2024-01-01 06:00:00", 1L),
      ("g", "2024-01-01 12:00:00", 2L), ("g", "2024-01-02 18:00:00", 3L))
      .toDF("g", "ts0", "id")
      .select(col("g"), to_timestamp(col("ts0")).as("ts"), col("id"))
    val r = graft.ops.TimeSeries
      .watsonU2(rows, "g", "ts", tieCols = Seq("id")).head
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("mean_u") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("u2_stat") - 1.0 / 24) < 1e-9)
  }

  test("famaMacbeth: slopes {2,4} -> mean 3, FM se 1, t 3; degenerate periods dropped") {
    import spark.implicits._
    val rows = (
      Seq((1, 1.0, 3.0), (1, 2.0, 5.0), (1, 3.0, 7.0)) ++   // y = 2x+1
      Seq((2, 1.0, 7.0), (2, 2.0, 11.0), (2, 3.0, 15.0)) ++ // y = 4x+3
      Seq((3, 1.0, 1.0), (3, 2.0, 2.0)) ++                  // n < 3
      Seq((4, 5.0, 1.0), (4, 5.0, 2.0), (4, 5.0, 3.0))      // var(x) = 0
    ).toDF("p", "x", "y")
    val r = graft.ops.Regression
      .famaMacbeth(rows, col("p"), "x", "y").head
    assert(r.getAs[Long]("n_periods") == 2L)
    assert(math.abs(r.getAs[Double]("mean_slope") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("fm_se_slope") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_slope") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_intercept") - 2.0) < 1e-12)
  }

  test("bnsJumpTest: hourly means 0,1,3,6 -> rv 14, bv 4pi") {
    import spark.implicits._
    val rows = Seq((0, 0.0), (1, 1.0), (2, 3.0), (3, 6.0))
      .map { case (h, v) => (f"2024-01-01 $h%02d:30:00", v) }
      .toDF("ts0", "v")
      .select(to_timestamp(col("ts0")).as("ts"), col("v"))
    val r = graft.ops.TimeSeries.bnsJumpTest(rows, "ts", "v").head
    assert(r.getAs[Long]("n_rets") == 3L)
    assert(math.abs(r.getAs[Double]("rv") - 14.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("bv") - 4 * math.Pi) < 1e-12)
    assert(math.abs(r.getAs[Double]("jump_share") -
      (1.0 - 4 * math.Pi / 14)) < 1e-12)
  }

  test("recordsTest: counts [1,3,2,5,4] -> 3 upper, 1 lower, H5 expectation") {
    import spark.implicits._
    val counts = Seq(1, 3, 2, 5, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.recordsTest(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("upper_records") == 3L)
    assert(r.getAs[Long]("lower_records") == 1L)
    assert(math.abs(r.getAs[Double]("expected") - 137.0 / 60) < 1e-12)
    assert(math.abs(r.getAs[Double]("variance") - 2951.0 / 3600) < 1e-12)
    assert(math.abs(r.getAs[Double]("z_upper") -
      (3 - 137.0 / 60) / math.sqrt(2951.0 / 3600)) < 1e-9)
  }

  test("cochraneOrcutt: counts [2,1,3,2,4] -> rho -12/13, slope 0.512") {
    import spark.implicits._
    val counts = Seq(2, 1, 3, 2, 4)
    // days at epoch 0..4 so the recovered intercept is the hand value
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.cochraneOrcutt(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(math.abs(r.getAs[Double]("slope_ols") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho") + 12.0 / 13) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope_co") - 0.512) < 1e-6)
    assert(math.abs(r.getAs[Double]("intercept_co") - 1.22576) < 1e-4)
  }

  test("mosumTest: counts [1,1,5,1,1], h=2 -> peak at day 3") {
    import spark.implicits._
    val counts = Seq(1, 1, 5, 1, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.mosumTest(rows, "ts", h = 2).head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_windows") == 4L)
    assert(math.abs(r.getAs[Double]("mean_y") - 1.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("sigma") - math.sqrt(3.2)) < 1e-12)
    // W = [2,6,6,2] vs h*mean 3.6 -> dev [1.6,2.4,2.4,1.6], earliest max
    assert(r.getAs[Int]("peak_t") ==
      java.time.LocalDate.of(2024, 1, 3).toEpochDay.toInt)
    assert(math.abs(r.getAs[Double]("max_abs_mosum") -
      2.4 / math.sqrt(6.4)) < 1e-12)
    assert(r.getAs[Long]("n_above_2") == 0L)
  }

  test("keenanTest: 12-day counts match numpy two-stage fit") {
    import spark.implicits._
    val counts = Seq(2, 1, 3, 2, 4, 1, 3, 5, 2, 4, 3, 6)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.keenanTest(rows, "ts").head
    assert(r.getAs[Long]("n_triples") == 10L)
    assert(math.abs(r.getAs[Double]("b1") + 0.26) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - 0.29217391304347856) < 1e-9)
    assert(math.abs(r.getAs[Double]("eta") - 1.9504235994093309) < 1e-8)
    assert(math.abs(r.getAs[Double]("f_stat") - 0.519359877161338) < 1e-8)
  }

  test("kneserNeyBigram: hand-worked 3-type model with OOV skip") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b c"), (1L, "a b c a"), (3L, "a z"))
      .toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis
      .kneserNeyBigram(docs, "doc_id", "text", col("doc_id") % 2 === 0)
      .head
    assert(r.getAs[Long]("n_train_bigrams") == 4L)
    assert(r.getAs[Long]("n_bigram_types") == 3L)
    assert(r.getAs[Long]("n_heldout") == 4L)
    assert(r.getAs[Long]("n_scored") == 3L)
    val lp = (math.log(0.75) + math.log(0.375) + math.log(1.0 / 3)) / 3
    assert(math.abs(r.getAs[Double]("avg_logprob") - lp) < 1e-12)
    assert(math.abs(r.getAs[Double]("perplexity") - math.exp(-lp)) < 1e-9)
  }

  test("rakeKeywords: 'x y the x y the z' -> phrase 'x y' scores 4") {
    import spark.implicits._
    val docs = Seq((0L, "x y the x y the z")).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis
      .rakeKeywords(docs, "doc_id", "text").orderBy(col("score").desc)
      .collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("phrase") == "x y")
    assert(r(0).getAs[Long]("n_words") == 2L)
    assert(r(0).getAs[Long]("n_occurrences") == 2L)
    assert(r(0).getAs[Double]("score") == 4.0)
    assert(r(1).getAs[String]("phrase") == "z")
    assert(r(1).getAs[Double]("score") == 1.0)
  }

  test("giniCorrelation: tied x -> gamma_xy 1, gamma_yx 0.9") {
    import spark.implicits._
    val rows = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (4.0, 40.0))
      .toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner
      .giniCorrelation(rows, "x", "y").head
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("gamma_x_given_y") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("gamma_y_given_x") - 0.9) < 1e-12)
  }

  test("hjorthParams: counts [1,3,2,4,1] hand-worked variances") {
    import spark.implicits._
    val counts = Seq(1, 3, 2, 4, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.hjorthParams(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_d1") == 4L)
    assert(r.getAs[Long]("n_d2") == 3L)
    assert(math.abs(r.getAs[Double]("activity") - 1.7) < 1e-12)
    assert(math.abs(r.getAs[Double]("mobility") - math.sqrt(6 / 1.7)) < 1e-12)
    assert(math.abs(r.getAs[Double]("complexity") -
      math.sqrt((104.0 / 6) / 6) / math.sqrt(6 / 1.7)) < 1e-12)
  }

  test("gompertzHazard: lifetimes {0x3,1x2,2x1} -> slope ln(4/3)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-01"),
      (4L, "2024-01-01"), (4L, "2024-01-02"),
      (5L, "2024-01-01"), (5L, "2024-01-02"),
      (6L, "2024-01-01"), (6L, "2024-01-03"))
      .toDF("uid", "ts0")
      .select(col("uid"), to_timestamp(col("ts0")).as("ts"))
    val r = graft.ops.Survival.gompertzHazard(ev, "uid", "ts").head
    assert(r.getAs[Long]("n_entities") == 6L)
    assert(r.getAs[Long]("n_points") == 2L)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(0.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope") - math.log(4.0 / 3)) < 1e-12)
    assert(math.abs(r.getAs[Double]("hazard_doubling_days") -
      math.log(2.0) / math.log(4.0 / 3)) < 1e-9)
  }

  test("clusterRobustAb: zero within-cluster spread in arm0 -> deff 2/3") {
    import spark.implicits._
    val rows = Seq(
      ("A", 0, 1.0), ("A", 0, 3.0), ("B", 0, 2.0),
      ("C", 1, 5.0), ("C", 1, 7.0), ("D", 1, 6.0), ("D", 1, 2.0))
      .toDF("u", "a", "v")
    val r = graft.ops.Evaluation
      .clusterRobustAb(rows, "u", col("a") === 1, "v").head
    assert(r.getAs[Long]("n_0") == 3L && r.getAs[Long]("n_1") == 4L)
    assert(r.getAs[Long]("g_0") == 2L && r.getAs[Long]("g_1") == 2L)
    assert(math.abs(r.getAs[Double]("diff") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_naive") - math.sqrt(1.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_cluster") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("design_effect") - 2.0 / 3) < 1e-12)
  }

  test("conoverSquaredRanks: hand-worked T 47.25, z 0.1403") {
    import spark.implicits._
    val rows = Seq(("c", 0.0), ("c", 2.0), ("c", 4.0),
      ("t", 10.0), ("t", 11.0), ("t", 19.0)).toDF("g", "y")
    val r = graft.analysis.AnalysisPlanner
      .conoverSquaredRanks(rows, "g", "y", "c", "t").head
    assert(r.getAs[Long]("n_c") == 3L && r.getAs[Long]("n_t") == 3L)
    assert(math.abs(r.getAs[Double]("t_stat") - 47.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("z_stat") -
      2.25 / math.sqrt(257.175)) < 1e-12)
  }

  test("mincerZarnowitz: lag-1 naive on [2,1,3,2,4] -> F 11/9") {
    import spark.implicits._
    val counts = Seq(2, 1, 3, 2, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries
      .mincerZarnowitz(rows, "ts", lagDays = 1).head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(math.abs(r.getAs[Double]("intercept") - 3.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope") + 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("rss_naive") - 10.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rss_ols") - 4.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("f_stat") - 11.0 / 9) < 1e-12)
  }

  test("relativeDistribution: [1,2,3 | 10,20] -> mrr 1, mrp 1") {
    import spark.implicits._
    val counts = Seq(1, 2, 3, 10, 20)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.relativeDistribution(rows, "ts").head
    assert(r.getAs[Long]("n_ref") == 3L)
    assert(r.getAs[Long]("n_cmp") == 2L)
    assert(r.getAs[Double]("split_t") == 2.0)
    assert(math.abs(r.getAs[Double]("mean_rel_rank") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mrp") - 1.0) < 1e-12)
  }

  test("linCcc: y = x + 1 -> r 1, ccc 4/7, loc shift -sqrt(3/2)") {
    import spark.implicits._
    val rows = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val r = graft.ops.Profiling.linCcc(rows, "x", "y").head
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ccc") - 4.0 / 7) < 1e-12)
    assert(math.abs(r.getAs[Double]("c_b") - 4.0 / 7) < 1e-12)
    assert(math.abs(r.getAs[Double]("scale_shift") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("location_shift") +
      1.0 / math.sqrt(2.0 / 3)) < 1e-12)
  }

  test("pairedTost: diffs [1,-1,0,0], margin 1 -> t both sqrt(6)") {
    import spark.implicits._
    val rows = Seq((2.0, 1.0), (1.0, 2.0), (3.0, 3.0), (4.0, 4.0))
      .toDF("x", "y")
    val r = graft.ops.Profiling.pairedTost(rows, "x", "y", 1.0).head
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("mean_diff")) < 1e-12)
    assert(math.abs(r.getAs[Double]("sd_diff") - math.sqrt(2.0 / 3)) < 1e-12)
    val se = math.sqrt(2.0 / 3) / 2
    assert(math.abs(r.getAs[Double]("t_lower") - 1.0 / se) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_upper") - 1.0 / se) < 1e-12)
  }

  test("distributionOverlap: 2 bins -> ovl 0.5, BC sqrt(0.5)") {
    import spark.implicits._
    val rows = (Seq(0.0, 1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 3.0, 4.0, 4.0).map(("b", _))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .distributionOverlap(rows, "g", "v", "a", "b", bins = 2).head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("n_bins_occupied") == 2L)
    assert(math.abs(r.getAs[Double]("overlap") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("bhattacharyya") -
      math.sqrt(0.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("hellinger") -
      math.sqrt(1 - math.sqrt(0.5))) < 1e-12)
  }

  test("chaoShenEntropy: 'a a b' -> hand-worked coverage-adjusted H") {
    import spark.implicits._
    val docs = Seq(("s", "a a b")).toDF("source", "text")
    val r = graft.ops.TextAnalysis
      .chaoShenEntropy(docs, "source", "text").head
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_types") == 2L)
    assert(r.getAs[Long]("f1_singletons") == 1L)
    assert(math.abs(r.getAs[Double]("coverage") - 2.0 / 3) < 1e-12)
    val hp = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(r.getAs[Double]("h_plugin") - hp) < 1e-12)
    def term(pc: Double) =
      pc * math.log(pc) / (1 - math.pow(1 - pc, 3))
    val hcs = -(term(4.0 / 9) + term(2.0 / 9))
    assert(math.abs(r.getAs[Double]("h_chao_shen") - hcs) < 1e-12)
  }

  test("variogram: [1,3,2] -> gamma(1) 1.25, gamma(2) 0.5") {
    import spark.implicits._
    val counts = Seq(1, 3, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.variogram(rows, "ts", maxLag = 2)
      .orderBy("h").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_pairs") == 2L)
    assert(r(0).getAs[Double]("semivariance") == 1.25)
    assert(r(0).getAs[Double]("madogram") == 0.75)
    assert(r(1).getAs[Long]("n_pairs") == 1L)
    assert(r(1).getAs[Double]("semivariance") == 0.5)
    assert(r(1).getAs[Double]("madogram") == 0.5)
  }

  test("recurrenceQuant: period-3 counts -> DET 1") {
    import spark.implicits._
    val counts = Seq(1, 2, 9, 1, 2, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.recurrenceQuant(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(math.abs(r.getAs[Double]("eps") - 0.8) < 1e-12)
    assert(r.getAs[Long]("n_pairs") == 15L)
    assert(r.getAs[Long]("n_recurrent") == 3L)
    assert(math.abs(r.getAs[Double]("recurrence_rate") - 0.2) < 1e-12)
    assert(r.getAs[Long]("n_on_diagonal") == 3L)
    assert(r.getAs[Double]("determinism") == 1.0)
  }

  test("crossCoherence: identical series -> coherence2 = 1 per band") {
    import spark.implicits._
    val counts = Seq(1, 2, 3, 4, 5, 6, 5, 4, 3, 2, 1, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      val day = java.time.LocalDate.ofEpochDay(i.toLong).toString
      Seq.fill(c)(("a", day)) ++ Seq.fill(c)(("b", day))
    }.toDF("k", "ts")
    val r = graft.ops.TimeSeries
      .crossCoherence(rows, "ts", "k", "a", "b",
        maxFreq = 4, bandWidth = 2)
      .orderBy("band").collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Long]("n_freqs") == 2L))
    r.foreach(row =>
      assert(math.abs(row.getAs[Double]("coherence2") - 1.0) < 1e-9))
  }

  test("laplaceTrend: offsets {0, 5s, 10s} -> z 0, chi2 2ln2") {
    import spark.implicits._
    val rows = Seq("2024-01-01 00:00:00", "2024-01-01 00:00:05",
      "2024-01-01 00:00:10").toDF("ts0")
      .select(to_timestamp(col("ts0")).as("ts"))
    val r = graft.ops.TimeSeries.laplaceTrend(rows, "ts").head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("t_span_seconds") == 10.0)
    assert(math.abs(r.getAs[Double]("laplace_z")) < 1e-12)
    assert(math.abs(r.getAs[Double]("milhdbk_chi2") -
      2 * math.log(2.0)) < 1e-12)
    assert(r.getAs[Long]("n_zero_offset") == 1L)
  }

  test("univariateScreen: pos {2,3} vs neg {1,2} -> auc 0.875, ks 0.5") {
    import spark.implicits._
    val rows = Seq((2.0, 1), (3.0, 1), (1.0, 0), (2.0, 0))
      .toDF("x", "lab")
    val r = graft.ops.Evaluation
      .univariateScreen(rows, col("lab") === 1, Seq("x")).head
    assert(r.getAs[String]("feature") == "x")
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(math.abs(r.getAs[Double]("auc") - 0.875) < 1e-12)
    assert(math.abs(r.getAs[Double]("ks") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("point_biserial") -
      4.0 / math.sqrt(32.0)) < 1e-12)
  }

  test("charTrigramScore: 'abcd' -> two trigrams, ppl 2") {
    import spark.implicits._
    val docs = Seq(("s", "abcd")).toDF("source", "text")
    val r = graft.ops.TextAnalysis
      .charTrigramScore(docs, "source", "text").head
    assert(r.getAs[Long]("n_trigrams") == 2L)
    assert(math.abs(r.getAs[Double]("avg_logprob") -
      math.log(0.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("perplexity") - 2.0) < 1e-12)
  }

  test("bwsTest: A={1,3} B={2,4} -> B_A 1.125, B_B 0, B 0.5625") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .bwsTest(rows, "v", "g", "a", "b").head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("b_a") - 1.125) < 1e-12)
    assert(math.abs(r.getAs[Double]("b_b")) < 1e-12)
    assert(math.abs(r.getAs[Double]("b_stat") - 0.5625) < 1e-12)
  }

  test("clumpiness: edge-burst user C=1, even user C=0.5") {
    import spark.implicits._
    val rows = Seq((1L, 0), (1L, 10), (2L, 0), (2L, 5), (2L, 10))
      .zipWithIndex.map { case ((u, sec), i) =>
        (u, f"2024-01-01 00:00:$sec%02d", i.toLong)
      }.toDF("u", "ts0", "id")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("id"))
    val r = graft.ops.Behavioral
      .clumpiness(rows, "u", "ts", tieCols = Seq("id")).head
    assert(r.getAs[Long]("n_entities") == 2L)
    assert(r.getAs[Double]("window_seconds") == 10.0)
    // user1: x = [1,0,0] -> C = 1; user2: x = [.5,.5,0,0] ->
    // C = 1 + 2*(.5 ln .5)/ln 4 = 0.5
    assert(math.abs(r.getAs[Double]("mean_c") - 0.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("c_p25") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("c_p50") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("c_p75") - 1.0) < 1e-9)
  }

  test("skyline2d: dominated points drop, front ordered by size") {
    import spark.implicits._
    val rows = Seq((5.0, 1), (3.0, 2), (4.0, 3), (6.0, 4), (4.0, 3))
      .toDF("price", "size")
    val r = graft.ops.Profiling.skyline2d(rows, "price", "size")
      .orderBy("size").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Long]("size") == 2L &&
      r(0).getAs[Double]("cost") == 3.0 &&
      r(0).getAs[Long]("n_points") == 1L)
    assert(r(1).getAs[Long]("size") == 3L &&
      r(1).getAs[Double]("cost") == 4.0 &&
      r(1).getAs[Long]("n_points") == 2L)
    assert(r(2).getAs[Long]("size") == 4L &&
      r(2).getAs[Double]("cost") == 6.0)
  }

  test("sequenceConformance: perfect, truncated and swapped journeys") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0, "signup"), (1L, 1, "view"), (1L, 2, "click"),
      (1L, 3, "purchase"),
      (2L, 0, "signup"), (2L, 1, "purchase"),
      (3L, 0, "view"), (3L, 1, "signup"), (3L, 2, "click"),
      (3L, 3, "purchase"))
      .zipWithIndex.map { case ((u, sec, et), i) =>
        (u, f"2024-01-01 00:00:$sec%02d", et, i.toLong)
      }.toDF("u", "ts0", "et", "id")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("et"),
        col("id"))
    val r = graft.ops.Behavioral.sequenceConformance(rows, "u", "ts",
        "et", Seq("click" -> "c", "purchase" -> "p", "signup" -> "s",
          "view" -> "v"), "svcp", tieCols = Seq("id"))
      .orderBy("distance").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Int]("distance") == 0 &&
      r(0).getAs[Long]("n_entities") == 1L)
    assert(r(1).getAs[Int]("distance") == 2 &&
      r(1).getAs[Long]("n_entities") == 2L)
    assert(math.abs(r(1).getAs[Double]("share") - 2.0 / 3) < 1e-12)
  }

  test("switchback: daily means [1,3,2,4], L=2 -> hand-worked NW SE") {
    import spark.implicits._
    val rows = Seq((0, 1.0), (1, 3.0), (2, 2.0), (3, 4.0))
      .map { case (day, v) =>
        (java.time.LocalDate.ofEpochDay(day.toLong).toString, v)
      }.toDF("ts0", "v")
      .select(to_timestamp(col("ts0")).as("ts"), col("v"))
    val r = graft.ops.Evaluation.switchback(rows, "ts", "v",
      nwLags = 2).head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("mean_even") == 1.5)
    assert(r.getAs[Double]("mean_odd") == 3.5)
    assert(r.getAs[Double]("diff") == 2.0)
    assert(math.abs(r.getAs[Double]("se_iid") - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_nw") -
      math.sqrt(1.0 / 12)) < 1e-12)
    assert(math.abs(r.getAs[Double]("nw_inflation") -
      math.sqrt((1.0 / 12) / 0.5)) < 1e-12)
  }

  test("dowAdjustedTrend: pure weekly pattern -> adj slope 0, r2 1") {
    import spark.implicits._
    val counts = (1 to 7) ++ (1 to 7)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.dowAdjustedTrend(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 14L)
    // raw slope is confounded by the in-week ascent: 56/227.5
    assert(math.abs(r.getAs[Double]("slope_raw") - 56.0 / 227.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope_adj")) < 1e-12)
    assert(math.abs(r.getAs[Double]("dow_r2") - 1.0) < 1e-12)
  }

  test("prewhitenedCcf: identical series -> ccf(0) = 1") {
    import spark.implicits._
    val counts = Seq(1, 2, 3, 1, 2, 3, 1, 2, 3, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      val day = java.time.LocalDate.ofEpochDay(i.toLong).toString
      Seq.fill(c)(("a", day)) ++ Seq.fill(c)(("b", day))
    }.toDF("k", "ts")
    val r = graft.ops.TimeSeries
      .prewhitenedCcf(rows, "ts", "k", "a", "b", maxLag = 3)
      .orderBy("lag").collect()
    assert(r.length == 7)
    val lag0 = r(3)
    assert(lag0.getAs[Int]("lag") == 0)
    assert(lag0.getAs[Long]("n_pairs") == 9L)
    assert(math.abs(lag0.getAs[Double]("ccf") - 1.0) < 1e-9)
    assert(r.forall(row => math.abs(row.getAs[Double]("ccf")) <= 1 + 1e-9))
    assert(r(0).getAs[Long]("n_pairs") == 6L)
  }

  test("shorthMode: [1,2,2,3,10] -> interval [1,2], midpoint 1.5") {
    import spark.implicits._
    val rows = Seq(1.0, 2.0, 2.0, 3.0, 10.0).toDF("v")
    val r = graft.analysis.AnalysisPlanner.shorthMode(rows, "v").head
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("h") == 2L)
    assert(r.getAs[Double]("mode_lo") == 1.0)
    assert(r.getAs[Double]("mode_hi") == 2.0)
    assert(r.getAs[Double]("shorth_len") == 1.0)
    assert(r.getAs[Double]("midpoint") == 1.5)
  }

  test("lMoments: uniform {1,2,3,4} -> l1 2.5, l2 5/6, t3 = t4 = 0") {
    import spark.implicits._
    val rows = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = graft.analysis.AnalysisPlanner.lMoments(rows, "v").head
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("l1") - 2.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2") - 5.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_lcv") - 1.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("t3_lskew")) < 1e-12)
    assert(math.abs(r.getAs[Double]("t4_lkurt")) < 1e-12)
  }

  test("geometricMedian2d: symmetric square -> gm = mean, shift 0") {
    import spark.implicits._
    val rows = Seq((0.0, 0.0), (2.0, 0.0), (0.0, 2.0), (2.0, 2.0))
      .toDF("x", "y")
    val r = graft.ops.Features.geometricMedian2d(rows, "x", "y").head
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("gm_x") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("gm_y") - 1.0) < 1e-9)
    assert(r.getAs[Double]("shift") < 1e-9)
  }

  test("forecastTournament: linear ramp -> drift wins with mae 0") {
    import spark.implicits._
    val counts = (1 to 10)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries
      .forecastTournament(rows, "ts", horizon = 2, season = 2)
      .orderBy("method").collect()
    assert(r.length == 4)
    assert(r(0).getAs[String]("method") == "1_mean")
    assert(math.abs(r(0).getAs[Double]("mae") - 5.0) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("mae") - 1.5) < 1e-12)
    assert(math.abs(r(2).getAs[Double]("mae")) < 1e-12)
    assert(math.abs(r(3).getAs[Double]("mae") - 2.0) < 1e-12)
    // MASE: train one-step naive MAE is exactly 1
    assert(math.abs(r(1).getAs[Double]("mase") - 1.5) < 1e-12)
  }

  test("newsvendorPanel: weekly demands 1..5 at q80 -> level 4") {
    import spark.implicits._
    val rows = (1 to 5).map { wk =>
      ("B1", java.time.LocalDate.of(2024, 1, 1).plusDays(7L * (wk - 1)).toString,
        wk.toDouble)
    }.toDF("brand", "ts0", "qty")
      .select(col("brand"), to_timestamp(col("ts0")).as("ts"), col("qty"))
    val r = graft.ops.Profiling
      .newsvendorPanel(rows, "brand", "ts", "qty", q = 0.8).head
    assert(r.getAs[Long]("n_weeks") == 5L)
    assert(math.abs(r.getAs[Double]("mean_demand") - 3.0) < 1e-12)
    assert(r.getAs[Double]("q_level") == 4.0)
    assert(math.abs(r.getAs[Double]("fill_rate") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("shortfall_share") - 1.0 / 15) < 1e-12)
    assert(math.abs(r.getAs[Double]("safety_stock") - 1.0) < 1e-12)
  }

  test("markovEntropyRate: deterministic a->b->a chain -> H 0") {
    import spark.implicits._
    val rows = (0 until 6).map { i =>
      (1L, f"2024-01-01 00:00:$i%02d", if (i % 2 == 0) "a" else "b",
        i.toLong)
    }.toDF("u", "ts0", "et", "id")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("et"),
        col("id"))
    val r = graft.ops.Behavioral.markovEntropyRate(rows, "u", "ts",
      "et", tieCols = Seq("id")).head
    assert(r.getAs[Long]("n_transitions") == 5L)
    assert(r.getAs[Long]("n_states") == 2L)
    assert(math.abs(r.getAs[Double]("h_rate")) < 1e-12)
    // marginal: 3 of 5 from 'a', 2 of 5 from 'b'
    val hm = -(0.6 * math.log(0.6) + 0.4 * math.log(0.4))
    assert(math.abs(r.getAs[Double]("h_marginal") - hm) < 1e-12)
    assert(math.abs(r.getAs[Double]("predictability") - 1.0) < 1e-12)
  }

  test("rarefaction: 'a a b' at f=0.5 -> E[V] hand-worked") {
    import spark.implicits._
    val docs = Seq("a a b").toDF("text")
    val r = graft.ops.TextAnalysis
      .rarefaction(docs, "text", fractions = Seq(0.5)).head
    // N=3, m=1: P(a in 1-draw) = 2/3, P(b) = 1/3 -> E[V] = 1
    assert(r.getAs[Long]("m") == 1L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_types") == 2L)
    assert(math.abs(r.getAs[Double]("expected_types") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("expected_share") - 0.5) < 1e-9)
  }

  test("temporalScan: burst day in flat series peaks at width 1") {
    import spark.implicits._
    val counts = Seq(1, 1, 1, 9, 1, 1, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.temporalScan(rows, "ts",
      maxWidth = 3).head
    assert(r.getAs[Long]("n_days") == 7L)
    assert(r.getAs[Double]("total") == 15.0)
    assert(r.getAs[Int]("peak_width") == 1)
    assert(r.getAs[Int]("peak_end_t") == 3)
    assert(r.getAs[Double]("peak_count") == 9.0)
    // LLR = 9 ln(9/(15/7)) + 6 ln(6/(15 - 15/7))
    val mu = 15.0 / 7
    val llr = 9 * math.log(9 / mu) + 6 * math.log(6 / (15 - mu))
    assert(math.abs(r.getAs[Double]("peak_llr") - llr) < 1e-8)
  }

  test("abcXyzMatrix: one dominant steady key -> AX cell") {
    import spark.implicits._
    val rows = (
      // key 1: 4 weeks of 100 each -> A (80% mass), CV 0
      (1 to 4).map(wk => (1L,
        java.time.LocalDate.of(2024, 1, 1).plusDays(7L * (wk - 1)).toString,
        100.0)) ++
      // key 2: 4 weeks alternating 5/45 -> C-ish mass, high CV
      Seq((2L, "2024-01-01", 5.0), (2L, "2024-01-08", 45.0),
        (2L, "2024-01-15", 5.0), (2L, "2024-01-22", 45.0))
    ).toDF("k", "ts0", "r")
      .select(col("k"), to_timestamp(col("ts0")).as("ts"), col("r"))
    val m = graft.ops.Profiling
      .abcXyzMatrix(rows, "k", "ts", "r")
      .orderBy("abc_class").collect()
    assert(m.length == 2)
    assert(m(0).getAs[String]("abc_class") == "A" &&
      m(0).getAs[String]("xyz_class") == "X")
    assert(math.abs(m(0).getAs[Double]("revenue_share") - 0.8) < 1e-12)
    // key 2's strictly-above share is exactly 0.8 -> class B
    assert(m(1).getAs[String]("abc_class") == "B" &&
      m(1).getAs[String]("xyz_class") == "Y")
  }

  test("forecastErrorDecomposition: f = y + 2 -> pure bias, UM 1") {
    import spark.implicits._
    // y_t = y_{t-1} - 2 means f = y+2: counts 9,7,5,3 with lag 1
    val counts = Seq(9, 7, 5, 3)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries
      .forecastErrorDecomposition(rows, "ts", lagDays = 1).head
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(math.abs(r.getAs[Double]("mse") - 4.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("um") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("us")) < 1e-12)
    assert(math.abs(r.getAs[Double]("uc")) < 1e-9)
  }

  test("asofNearest: picks closer side, backward on ties") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100), (2L, 10L, 205), (3L, 20L, 300))
      .map { case (id, u, sec) => (id, u, f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d") }
      .toDF("id", "u", "ts0")
      .select(col("id"), col("u"), to_timestamp(col("ts0")).as("ts"))
    val right = Seq((10L, 90, 1.0), (10L, 210, 2.0), (20L, 400, 3.0))
      .map { case (u, sec, v) => (u, f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d", v) }
      .toDF("u", "ts0", "v")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("v"))
    val r = graft.ops.PointInTime
      .asofNearest(left, right, Seq("u"), "id", "ts", "ts", Seq("v"))
      .orderBy("id").collect()
    // id1 at 100: back 90 (gap 10) vs fwd 210 (gap 110) -> backward
    assert(r(0).getAs[String]("direction") == "backward")
    assert(r(0).getAs[Double]("v") == 1.0)
    assert(r(0).getAs[Double]("gap_seconds") == 10.0)
    // id2 at 205: back 90 (115) vs fwd 210 (5) -> forward
    assert(r(1).getAs[String]("direction") == "forward")
    assert(r(1).getAs[Double]("v") == 2.0)
    assert(r(1).getAs[Double]("gap_seconds") == 5.0)
    // id3 at 300 user 20: only forward 400
    assert(r(2).getAs[String]("direction") == "forward")
    assert(r(2).getAs[Double]("v") == 3.0)
  }

  test("partialSpearman: within-z anticorrelation -> rho_partial -1") {
    import spark.implicits._
    val rows = Seq((1.0, 2.0, 1.0), (2.0, 1.0, 1.0), (3.0, 4.0, 2.0),
      (4.0, 3.0, 2.0), (5.0, 5.0, 3.0)).toDF("x", "y", "z")
    val r = graft.analysis.AnalysisPlanner
      .partialSpearman(rows, "x", "y", "z").head
    assert(r.getAs[Long]("n") == 5L)
    assert(math.abs(r.getAs[Double]("rho_xy") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho_xz") - 3 / math.sqrt(10)) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho_yz") - 3 / math.sqrt(10)) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho_partial") + 1.0) < 1e-9)
  }

  test("medianCi: 1..100 -> median 50, CI ranks symmetric") {
    import spark.implicits._
    val rows = (1 to 100).map(_.toDouble).toDF("v")
    val r = graft.analysis.AnalysisPlanner.medianCi(rows, "v").head
    assert(r.getAs[Long]("n") == 100L)
    // klo = floor((100 - 1.96*10)/2) = 40, khi = ceil((100+19.6)/2+1) = 61
    assert(r.getAs[Long]("k_lo") == 40L)
    assert(r.getAs[Long]("k_hi") == 61L)
    assert(r.getAs[Double]("median") == 50.0)
    assert(r.getAs[Double]("ci_lo") == 40.0)
    assert(r.getAs[Double]("ci_hi") == 61.0)
  }

  test("zipfMandelbrot: exact Mandelbrot law recovers q = 3") {
    import spark.implicits._
    // f(r) = C/(r+3): counts 250,200,...  for ranks 1..5 with C=1000
    val freqs = (1 to 5).map(r => 1000 / (r + 3))
    val text = freqs.zipWithIndex.flatMap { case (f, i) =>
      Seq.fill(f)(s"w$i")
    }.mkString(" ")
    val docs = Seq(text).toDF("text")
    val r = graft.ops.TextAnalysis
      .zipfMandelbrot(docs, "text", maxQ = 10).head
    assert(r.getAs[Long]("n_types") == 5L)
    assert(r.getAs[Int]("best_q") == 3)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 0.01)
  }

  test("butterflyCount: complete 2x2 bipartite -> 1 butterfly") {
    import spark.implicits._
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"),
      ("c2", "s2"), ("c3", "s3")).toDF("src", "dst")
    val r = graft.ops.Graph.butterflyCount(edges, "src", "dst").head
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_left_used") == 3L)
    assert(r.getAs[Long]("n_wedges") == 2L)
    assert(r.getAs[Long]("n_wedge_pairs") == 1L)
    assert(r.getAs[Long]("n_butterflies") == 1L)
  }

  test("twap: burst sampling -> time-weighted mean 50.5 vs plain 36") {
    import spark.implicits._
    val rows = Seq((0, 1.0), (10, 100.0), (20, 7.0))
      .zipWithIndex.map { case ((sec, v), i) =>
        ("g", f"2024-01-01 00:00:$sec%02d", v, i.toLong)
      }.toDF("g", "ts0", "v", "id")
      .select(col("g"), to_timestamp(col("ts0")).as("ts"), col("v"),
        col("id"))
    val r = graft.ops.Behavioral
      .twap(rows, "g", "ts", "v", tieCols = Seq("id")).head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("span_seconds") == 20.0)
    assert(math.abs(r.getAs[Double]("plain_mean") - 36.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("twap") - 50.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("twap_minus_mean") - 14.5) < 1e-12)
  }

  test("deadStock: daily seller gone 31 days -> dead; sparse unclassified") {
    import spark.implicits._
    val rows = ((0 until 10).map(d => (1L, "B", d)) ++
      Seq((2L, "B", 0), (2L, "B", 40)))
      .map { case (k, c, day) =>
        (k, c, java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong).toString)
      }.toDF("k", "c", "ts0")
      .select(col("k"), col("c"), to_timestamp(col("ts0")).as("ts"))
    val r = graft.ops.Profiling.deadStock(rows, "k", "c", "ts").head
    assert(r.getAs[Long]("n_keys") == 2L)
    assert(r.getAs[Long]("n_classified") == 1L)
    assert(r.getAs[Long]("n_dead") == 1L)
    assert(r.getAs[Double]("dead_share") == 1.0)
    assert(math.abs(r.getAs[Double]("worst_p") - math.exp(-31.0)) < 1e-18)
  }

  test("hyperexpGaps: feasible MoM fit recovers hand values") {
    import spark.implicits._
    // cumulative seconds giving gaps (h): .26 .17 .17 .2 .34 .13 .36 1.49
    val cum = Seq(0, 936, 1548, 2160, 2880, 4104, 4572, 5868, 11232)
    val rows = cum.zipWithIndex.map { case (sec, i) =>
      (1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
        .plusSeconds(sec.toLong).toString.replace('T', ' '), i.toLong)
    }.toDF("u", "ts0", "id")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("id"))
    val r = graft.ops.Behavioral
      .hyperexpGaps(rows, "u", "ts", tieCols = Seq("id")).head
    assert(r.getAs[Long]("n_gaps") == 8L)
    assert(r.getAs[Boolean]("fit_ok"))
    assert(math.abs(r.getAs[Double]("mean_gap_hours") - 0.39) < 1e-9)
    assert(math.abs(r.getAs[Double]("cv2") - 1.17587114) < 1e-6)
    assert(math.abs(r.getAs[Double]("p1") - 0.87359311) < 1e-6)
    assert(math.abs(r.getAs[Double]("lambda1") - 2.30418781) < 1e-6)
    assert(math.abs(r.getAs[Double]("lambda2") - 11.63193537) < 1e-6)
  }

  test("mannWhitneyEquivalence: identical groups, huge margin -> both z 1.964") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "y")
    val r = graft.analysis.AnalysisPlanner
      .mannWhitneyEquivalence(rows, "g", "y", "a", "b", 10.0).head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    val z = 4.5 / math.sqrt(5.25)
    assert(math.abs(r.getAs[Double]("z_lower") - z) < 1e-12)
    assert(math.abs(r.getAs[Double]("z_upper") - z) < 1e-12)
  }

  test("sessionGapSweep: gaps 400s/1600s -> 3,2,1,1 sessions") {
    import spark.implicits._
    val rows = Seq(0, 400, 2000).zipWithIndex.map { case (sec, i) =>
      (1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
        .plusSeconds(sec.toLong).toString.replace('T', ' '), i.toLong)
    }.toDF("u", "ts0", "id")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("id"))
    val r = graft.ops.Behavioral
      .sessionGapSweep(rows, "u", "ts", tieCols = Seq("id"))
      .orderBy("threshold_seconds").collect()
    assert(r.map(_.getAs[Long]("n_sessions")).toSeq ==
      Seq(3L, 2L, 1L, 1L))
    assert(math.abs(r(1).getAs[Double]("events_per_session") - 1.5) < 1e-12)
  }

  test("ledoitWolfShrinkage: y = x over 3 rows -> lambda 0.25") {
    import spark.implicits._
    val rows = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r = graft.analysis.AnalysisPlanner
      .ledoitWolfShrinkage(rows, Seq("x", "y")).head
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("avg_abs_r") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("lambda_star") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("avg_abs_r_shrunk") - 0.75) < 1e-12)
  }

  test("splitHalfReliability: linear half-means -> r 1, SB 1") {
    import spark.implicits._
    val rows = (for {
      (u, base) <- Seq((1L, 1.0), (2L, 3.0), (3L, 5.0))
      (i, v) <- Seq(0 -> base, 1 -> (base + 1), 2 -> base,
        3 -> (base + 1))
    } yield (u, f"2024-01-01 00:00:0$i", v, i.toLong))
      .toDF("u", "ts0", "v", "id")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"), col("v"),
        col("id"))
    val r = graft.ops.Behavioral
      .splitHalfReliability(rows, "u", "ts", "v",
        tieCols = Seq("id")).head
    assert(r.getAs[Long]("n_entities") == 3L)
    assert(math.abs(r.getAs[Double]("r_half") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("spearman_brown") - 1.0) < 1e-12)
  }

  test("medianCiBy: group of 1..4 -> median 2, CI [1,4]") {
    import spark.implicits._
    val rows = ((1 to 100).map(v => ("a", v.toDouble)) ++
      (1 to 4).map(v => ("b", v.toDouble))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .medianCiBy(rows, "v", "g").orderBy("g").collect()
    assert(r(0).getAs[Double]("median") == 50.0)
    assert(r(0).getAs[Double]("ci_lo") == 40.0)
    assert(r(1).getAs[Long]("n") == 4L)
    assert(r(1).getAs[Double]("median") == 2.0)
    assert(r(1).getAs[Double]("ci_lo") == 1.0)
    assert(r(1).getAs[Double]("ci_hi") == 4.0)
  }

  test("senSlopeCi: counts [1,2,4] -> slope 1.5, CI spans slopes") {
    import spark.implicits._
    val counts = Seq(1, 2, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.senSlopeCi(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Double]("sen_slope") == 1.5)
    assert(r.getAs[Double]("ci_lo") == 1.0)
    assert(r.getAs[Double]("ci_hi") == 2.0)
  }

  test("weekdayRateRatio: epoch days 0..6, counts 2 on weekdays 1 on weekend") {
    import spark.implicits._
    // epoch day 0 = Thursday; days 2 (Sat), 3 (Sun) are weekend
    val counts = Seq(2, 2, 1, 1, 2, 2, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.weekdayRateRatio(rows, "ts").head
    assert(r.getAs[Long]("days_wd") == 5L)
    assert(r.getAs[Long]("days_we") == 2L)
    assert(r.getAs[Double]("events_wd") == 10.0)
    assert(r.getAs[Double]("events_we") == 2.0)
    assert(math.abs(r.getAs[Double]("rate_ratio") - 2.0) < 1e-12)
    val se = math.sqrt(1.0 / 10 + 1.0 / 2)
    assert(math.abs(r.getAs[Double]("ci_lo") -
      math.exp(math.log(2.0) - 1.959964 * se)) < 1e-9)
  }

  test("engagementByTenure: two staggered users, hand-worked exposure") {
    import spark.implicits._
    // u1 first day 0 (span 8), u2 first day 7 (span 1); horizon day 8
    val rows = Seq((1L, 0), (1L, 3), (1L, 8), (2L, 7), (2L, 8))
      .map { case (u, day) =>
        (u, java.time.LocalDate.ofEpochDay(day.toLong).toString)
      }.toDF("u", "ts0")
      .select(col("u"), to_timestamp(col("ts0")).as("ts"))
    val r = graft.ops.Behavioral.engagementByTenure(rows, "u", "ts")
      .orderBy("age_week").collect()
    // week 0: events u1@0,3 + u2@7,8(ages 0,1) = 4; exposure:
    // u1 min(8-0+1,7)=7, u2 min(1-0+1,7)=2 -> 9 user-days
    assert(r(0).getAs[Long]("age_week") == 0L)
    assert(r(0).getAs[Long]("n_events") == 4L)
    assert(r(0).getAs[Long]("user_days") == 9L)
    assert(math.abs(r(0).getAs[Double]("events_per_user_day") -
      4.0 / 9) < 1e-12)
    // week 1: u1's event at age 8 -> 1 event; exposure u1 only:
    // min(8-7+1,7)=2
    assert(r(1).getAs[Long]("age_week") == 1L)
    assert(r(1).getAs[Long]("n_events") == 1L)
    assert(r(1).getAs[Long]("user_days") == 2L)
  }

  test("newcombeDiff: 8/10 vs 2/10 -> diff 0.6, hybrid CI brackets") {
    import spark.implicits._
    val rows = ((1 to 10).map(i => (true, i <= 8)) ++
      (1 to 10).map(i => (false, i <= 2))).toDF("g", "s")
    val r = graft.ops.Evaluation
      .newcombeDiff(rows, col("s"), col("g")).head
    assert(r.getAs[Long]("n_1") == 10L && r.getAs[Long]("x_1") == 8L)
    assert(r.getAs[Long]("n_2") == 10L && r.getAs[Long]("x_2") == 2L)
    assert(math.abs(r.getAs[Double]("diff") - 0.6) < 1e-12)
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    // Newcombe (1998) for 8/10 vs 2/10 at 95%: about [0.197, 0.805]
    assert(lo > 0.15 && lo < 0.25)
    assert(hi > 0.75 && hi < 0.85)
    assert(lo < 0.6 && hi > 0.6)
  }

  test("effectiveSampleSize: alternating series -> rho -1-ish guard, smooth series shrinks n") {
    import spark.implicits._
    // counts 1,2,4,8,16 (strong positive autocorrelation of levels)
    val counts = Seq(1, 2, 4, 8, 16)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.effectiveSampleSize(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 5L)
    // demeaned z = [-5.2,-4.2,-2.2,1.8,9.8]; rho = sum(z_t z_{t-1})/sum(z_{t-1}^2)
    val z = Seq(-5.2, -4.2, -2.2, 1.8, 9.8)
    val num = (1 until 5).map(i => z(i) * z(i - 1)).sum
    val den = (0 until 4).map(i => z(i) * z(i)).sum
    val rho = num / den
    assert(math.abs(r.getAs[Double]("rho1") - rho) < 1e-9)
    assert(math.abs(r.getAs[Double]("n_eff") -
      5 * (1 - rho) / (1 + rho)) < 1e-6)
    assert(r.getAs[Double]("n_eff") < 5.0)
  }

  test("spearmanCi: monotone pairs -> rho 1 with null CI; noisy pairs bracketed") {
    import spark.implicits._
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0),
      (5.0, 50.0)).toDF("x", "y")
    val r1 = graft.analysis.AnalysisPlanner.spearmanCi(mono, "x", "y").head
    assert(math.abs(r1.getAs[Double]("rho") - 1.0) < 1e-12)
    assert(r1.isNullAt(r1.fieldIndex("ci_lo"))) // |rho| = 1 -> no z CI
    val noisy = Seq((1.0, 10.0), (2.0, 30.0), (3.0, 20.0), (4.0, 50.0),
      (5.0, 40.0), (6.0, 60.0)).toDF("x", "y")
    val r2 = graft.analysis.AnalysisPlanner.spearmanCi(noisy, "x", "y").head
    val rho = r2.getAs[Double]("rho")
    // ranks swap two adjacent pairs: rho = 1 - 6*4/(6*35) = 0.885714
    assert(math.abs(rho - (1 - 24.0 / 210)) < 1e-12)
    assert(r2.getAs[Double]("ci_lo") < rho && rho < r2.getAs[Double]("ci_hi"))
  }

  test("turningPoints: [1,3,2,4,1] -> 3 of 3 triples turn") {
    import spark.implicits._
    val counts = Seq(1, 3, 2, 4, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.turningPoints(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_triples") == 3L)
    assert(r.getAs[Long]("turning_points") == 3L)
    assert(math.abs(r.getAs[Double]("expected_tp") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("variance_tp") - 51.0 / 90) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 1.0 / math.sqrt(51.0 / 90)) < 1e-12)
  }

  test("lshParameterPlan: matches scalar integral, s50 and shape sane") {
    val out = graft.ops.Dedup
      .lshParameterPlan(spark, numPerm = 16, threshold = 0.5, grid = 200)
      .collect()
    // divisor pairs of 16: (1,16) (2,8) (4,4) (8,2) (16,1)
    assert(out.map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows"))).toSeq ==
      Seq((1L, 16L), (2L, 8L), (4L, 4L), (8L, 2L), (16L, 1L)))
    // cross-check every row against a plain-Scala midpoint integral
    out.foreach { r =>
      val (b, rr) = (r.getAs[Long]("bands").toInt, r.getAs[Long]("rows").toInt)
      def p(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, rr), b)
      val ss = (0 until 200).map(i => (i + 0.5) / 200)
      val fp = ss.filter(_ < 0.5).map(p).sum / 200
      val fn = ss.filter(_ >= 0.5).map(s => 1.0 - p(s)).sum / 200
      assert(math.abs(r.getAs[Double]("fp_area") - fp) < 1e-9, s"fp b=$b")
      assert(math.abs(r.getAs[Double]("fn_area") - fn) < 1e-9, s"fn b=$b")
      assert(math.abs(r.getAs[Double]("s50") -
        math.pow(1.0 / b, 1.0 / rr)) < 1e-12)
    }
    // shape: more bands (fewer rows) pushes the effective threshold DOWN
    val s50s = out.map(_.getAs[Double]("s50")).toSeq
    assert(s50s == s50s.sorted.reverse)
    // the all-rows banding misses near-dups (high fn), the all-bands
    // banding over-collides (high fp) — the planner's raison d'etre
    assert(out.head.getAs[Double]("fn_area") >
      out.last.getAs[Double]("fn_area"))
    assert(out.last.getAs[Double]("fp_area") >
      out.head.getAs[Double]("fp_area"))
  }

  // ---- ANSI divide-by-zero guards on degenerate inputs (r13) ----

  test("distributionOverlap: all-equal values (hi == lo) -> overlap 1, no ANSI crash") {
    import spark.implicits._
    val rows = (Seq.fill(3)(("a", 5.0)) ++ Seq.fill(4)(("b", 5.0))).toDF("g", "v")
    val r = graft.analysis.AnalysisPlanner
      .distributionOverlap(rows, "g", "v", "a", "b", bins = 4).head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("n_bins_occupied") == 1L)
    assert(math.abs(r.getAs[Double]("overlap") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("hellinger")) < 1e-7)
  }

  test("lMoments: n <= 3 -> NULL higher moments, no ANSI crash") {
    import spark.implicits._
    val r = Seq(1.0, 2.0).toDF("v")
    val out = graft.analysis.AnalysisPlanner.lMoments(r, "v").head
    assert(out.getAs[Long]("n") == 2L)
    assert(math.abs(out.getAs[Double]("l1") - 1.5) < 1e-12)
    // l3/l4 need b2/b3 which need n > 2 / n > 3: NULL ratios
    assert(out.isNullAt(out.fieldIndex("t3_lskew")))
    assert(out.isNullAt(out.fieldIndex("t4_lkurt")))
    val one = graft.analysis.AnalysisPlanner
      .lMoments(Seq(7.0).toDF("v"), "v").head
    assert(one.getAs[Long]("n") == 1L)
    assert(math.abs(one.getAs[Double]("l1") - 7.0) < 1e-12)
  }

  test("effectiveSampleSize: constant daily series -> NULL rho1, no ANSI crash") {
    import spark.implicits._
    val rows = (0 until 5).flatMap { i =>
      Seq.fill(2)(java.time.LocalDate.ofEpochDay(i.toLong).toString)
    }.toDF("ts")
    val r = graft.ops.TimeSeries.effectiveSampleSize(rows, "ts").head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.isNullAt(r.fieldIndex("rho1")))
    assert(r.isNullAt(r.fieldIndex("n_eff")))
  }

  test("gompertzHazard: single interior ladder point -> NULL fit, no ANSI crash") {
    import spark.implicits._
    // 3 users die at lifetime 0, 1 at lifetime 1: the interior ladder
    // is ONE point (m=1 → zero OLS denominator — the sf0.001 crash)
    val ev = (Seq(("u1", 0), ("u2", 0), ("u3", 0)) ++
      Seq(("u4", 0), ("u4", 1))).map { case (u, d) =>
      (u, java.time.LocalDate.ofEpochDay(d.toLong).toString)
    }.toDF("uid", "ts")
    val r = graft.ops.Survival.gompertzHazard(ev, "uid", "ts").head
    assert(r.getAs[Long]("n_entities") == 4L)
    assert(r.getAs[Long]("n_points") == 1L)
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("intercept")))
  }

  test("linCcc: both columns same constant -> NULL ccc, no ANSI crash") {
    import spark.implicits._
    val rows = Seq.fill(4)((3.0, 3.0)).toDF("x", "y")
    val r = graft.ops.Profiling.linCcc(rows, "x", "y").head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.isNullAt(r.fieldIndex("ccc")))
    assert(r.isNullAt(r.fieldIndex("pearson_r")))
  }
}
