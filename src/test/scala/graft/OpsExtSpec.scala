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
