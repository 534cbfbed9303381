package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket association mining over (basket, item) frames — the
 * co-purchase / co-view / co-click signal a feature platform feeds
 * into recommendation features, plus the spec'd correlation surface
 * generalized to categorical pairs (reference analysis catalogue,
 * raise_/analytics/models.py:86-104, lists correlation as a feature
 * relationship; association lift is its transactional analogue).
 *
 * Scale design: the only quadratic step is the within-basket pair
 * self-join, whose fan-out is bounded by the per-basket item cap
 * (`maxBasketItems`, deterministic keep-lowest-ids so an engine
 * mirror reproduces it exactly — the thinBuckets pattern). Everything
 * downstream is keyed aggregation; item marginals are a broadcast
 * (≤ |vocabulary| rows). No driver collect anywhere.
 */
object Associations {

  /**
   * Pairwise association rules: for every unordered item pair {a, b}
   * (a < b) co-occurring in at least `minPairCount` baskets, emit
   * basket counts, support, both directional confidences, and lift
   * = P(a,b) / (P(a)·P(b)). Duplicate (basket, item) rows collapse
   * first so multiplicity inside one basket never inflates counts.
   *
   * Baskets with more than `maxBasketItems` distinct items keep only
   * their `maxBasketItems` smallest item ids (deterministic — the
   * oracle mirrors the same rank filter); the cap bounds the pair
   * fan-out per basket at C(cap, 2) regardless of basket skew.
   */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2, maxBasketItems: Int = 256): DataFrame = {
    val b0 = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .where(col("__bk").isNotNull && col("__it").isNotNull)
      .distinct()
    // deterministic per-basket cap: keep the `maxBasketItems` smallest
    // item ids — a basket-partitioned rank, never a global window
    val baskets = b0
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__bk").orderBy("__it")))
      .where(col("__rk") <= maxBasketItems)
      .drop("__rk")
    val nBaskets = broadcast(
      baskets.agg(countDistinct(col("__bk")).cast("double").as("__nb")))
    val itemCounts = baskets.groupBy(col("__it"))
      .agg(count(lit(1)).cast("double").as("__ni"))
    val pairs = baskets.as("l")
      .join(baskets.as("r"), col("l.__bk") === col("r.__bk") &&
        col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("item_a"), col("r.__it").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minPairCount)
    pairs
      .join(broadcast(itemCounts).withColumnRenamed("__ni", "__na"),
        col("item_a") === col("__it")).drop("__it")
      .join(broadcast(itemCounts).withColumnRenamed("__ni", "__nb2"),
        col("item_b") === col("__it")).drop("__it")
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("n_pair"),
        col("__na").cast("long").as("n_a"),
        col("__nb2").cast("long").as("n_b"),
        (col("n_pair") / col("__nb")).as("support"),
        (col("n_pair") / col("__na")).as("conf_a_b"),
        (col("n_pair") / col("__nb2")).as("conf_b_a"),
        (col("n_pair") * col("__nb") / (col("__na") * col("__nb2")))
          .as("lift"),
        // conviction: expected-failure ratio (1−supp(b))/(1−conf(a→b))
        // — ∞ for exact rules, hence the guard; directional where lift
        // is symmetric
        when(col("n_pair") < col("__na"),
          (lit(1.0) - col("__nb2") / col("__nb")) /
            (lit(1.0) - col("n_pair") / col("__na")))
          .as("conviction_a_b"),
        // leverage: P(a,b) − P(a)P(b), the additive lift
        (col("n_pair") / col("__nb") -
          col("__na") * col("__nb2") / (col("__nb") * col("__nb")))
          .as("leverage"),
        // jaccard: co-basket share of the union
        (col("n_pair") /
          (col("__na") + col("__nb2") - col("n_pair"))).as("jaccard"))
  }

  /**
   * Item–item cosine neighborhoods — the classic co-occurrence
   * collaborative-filtering signal: cosine(a, b) = |baskets with
   * both| / sqrt(|baskets with a| · |baskets with b|) over binary
   * basket vectors, top-`topK` neighbors per item. The feature a
   * "customers also bought" recommender reads from the store.
   *
   * Scale shape identical to [[pairRules]]: per-basket cap bounds the
   * only quadratic step (deterministic keep-lowest-ids), marginals
   * broadcast, and the final ranking is an item-partitioned window
   * over candidate lists bounded by the pair support — never global.
   * The pair frame is built once (a < b) and symmetrized by union, so
   * each co-count is computed exactly once.
   */
  def itemSimilarity(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2, maxBasketItems: Int = 256,
      topK: Int = 10): DataFrame = {
    val b0 = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .where(col("__bk").isNotNull && col("__it").isNotNull)
      .distinct()
    val baskets = b0
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__bk").orderBy("__it")))
      .where(col("__rk") <= maxBasketItems)
      .drop("__rk")
    val itemCounts = baskets.groupBy(col("__it"))
      .agg(count(lit(1)).cast("double").as("__ni"))
    val pairs = baskets.as("l")
      .join(baskets.as("r"), col("l.__bk") === col("r.__bk") &&
        col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("__a"), col("r.__it").as("__b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minPairCount)
    val sym = pairs.unionByName(pairs.select(col("__b").as("__a"),
      col("__a").as("__b"), col("n_pair")))
    val scored = sym
      .join(broadcast(itemCounts).withColumnRenamed("__ni", "__na"),
        col("__a") === col("__it")).drop("__it")
      .join(broadcast(itemCounts).withColumnRenamed("__ni", "__nb"),
        col("__b") === col("__it")).drop("__it")
      .select(col("__a").as("item"), col("__b").as("neighbor"),
        col("n_pair"),
        (col("n_pair") / sqrt(col("__na") * col("__nb"))).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("item")
          .orderBy(col("cosine").desc, col("neighbor").asc)))
      .where(col("rank") <= topK)
  }
}
