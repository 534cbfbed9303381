package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The standard corpus-cleaning DAG (CCNet / RefinedWeb / Gopher shape)
 * as ONE composed DataFrame program — the end-to-end path a
 * training-data pipeline actually runs, built entirely from this
 * library's operators:
 *
 *   1. structural quality gate     [[TextAnalysis.qualityFlags]]
 *   2. boilerplate (chunk) removal [[Dedup.chunkDedup]]
 *   3. exact dedup                 [[Dedup.exact]] (on the CLEANED text)
 *   4. near-dup clustering + keep  [[Dedup.ngramJaccardPairs]] →
 *      [[Dedup.dedupClusters]] → [[Dedup.canonicalPerCluster]]
 *   5. token-balanced shard packing [[Sampling.assignShards]]
 *   6. (optional) deterministic train/val/test holdout
 *      [[Sampling.hashSplit]] — growth-stable, so re-running the
 *      pipeline on an extended corpus never migrates a document
 *      across splits (the leakage guarantee a release needs)
 *
 * Everything stays declarative until the caller acts; the only
 * driver-side loop is connected components' O(log chain) rounds. Order
 * matters and is deliberate: quality BEFORE dedup (junk shouldn't win
 * a canonical contest), boilerplate strip BEFORE exact dedup (docs
 * differing only in boilerplate ARE duplicates), near-dup LAST among
 * filters (it is the most expensive — let the cheap gates shrink its
 * input first), holdout split LAST overall (splitting before dedup
 * leaks near-copies across the train/test boundary — the classic
 * contamination bug this ordering exists to prevent). Wrap in
 * [[graft.etl.FnTransform]] to run it inside the job system with
 * checkpoints/quality-metrics/targets.
 */
object CorpusPipeline {

  /** Cleaning result: the surviving documents with cleaned text,
    * token counts, training-shard assignment, and (when `splits` is
    * non-empty) the deterministic holdout split. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 3, chunkMaxDocs: Long = 3,
      shingleN: Int = 3, jaccardThreshold: Double = 0.8,
      maxPostings: Int = 100, tokensPerShard: Long = 4000,
      splits: Seq[(String, Double)] = Nil): DataFrame = {
    val base = docs.select(col(idCol), col(textCol))

    // 1. structural gate
    val q = TextAnalysis.qualityFlags(base, idCol, textCol)
      .where(col("pass")).select(col(idCol))
    val gated = base.join(q, Seq(idCol))

    // 2. cross-document boilerplate strip; empty survivors exit here
    val stripped = Dedup
      .chunkDedup(gated, idCol, textCol, chunkTokens, chunkMaxDocs)
      .where(length(col("clean_text")) > 0)
      .select(col(idCol), col("clean_text").as(textCol))

    // 3. exact dedup on the cleaned text (min-id keeper)
    val exactKeep = Dedup.exact(stripped, textCol, idCol)
      .select(col("keeper_id").as(idCol))
    val exactDeduped = stripped.join(exactKeep, Seq(idCol))

    // 4. near-dup clusters; keep the longest member per cluster
    val pairs = Dedup.ngramJaccardPairs(exactDeduped, idCol, textCol,
      shingleN, jaccardThreshold, maxPostings)
    val clusters = Dedup.dedupClusters(exactDeduped, idCol, pairs)
    val scored = exactDeduped
      .withColumn("__len", length(col(textCol)).cast("long"))
    val keep = Dedup
      .canonicalPerCluster(clusters, scored, idCol, "__len")
      .where(col("keep")).select(col(idCol))
    val kept = exactDeduped.join(keep, Seq(idCol))

    // 5. token-balanced shards over the survivors
    val sharded = Sampling.assignShards(
      kept.withColumn("n_tokens",
        size(split(col(textCol), " ")).cast("long")),
      tokensPerShard, "n_tokens", Seq(idCol))

    // 6. holdout split AFTER dedup so near-copies can't straddle the
    // train/test boundary
    if (splits.isEmpty) sharded
    else Sampling.hashSplit(sharded, splits, Seq(idCol))
  }

  /**
   * Corpus report card — the one-table release summary a dataset card
   * quotes: size (docs, whitespace tokens, characters), shape
   * (avg/max doc tokens), redundancy (exact-duplicate text rate),
   * vocabulary size, language entropy in bits (0 = monolingual), and
   * source concentration (largest source's share). Returns
   * (metric, value) rows, metric-name ordered.
   *
   * Scale shape: one corpus scan for the row-level moments, one
   * text-keyed distinct for the duplicate rate, one token explode →
   * distinct count for vocabulary, two tiny groupBys for the
   * language/source distributions — every branch reduces to a 1-row
   * frame before the final union of literals-wide frames (a
   * ≤8-row result, unioned cheaply).
   */
  def reportCard(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, srcCol: String): DataFrame = {
    val base = docs.where(col(textCol).isNotNull).localCheckpoint()
    def one(name: String, v: org.apache.spark.sql.Column,
        from: DataFrame) =
      from.agg(v.cast("double").as("value"))
        .select(lit(name).as("metric"), col("value"))
    val toks = size(split(col(textCol), " ")).cast("long")
    val moments = base.agg(count(lit(1)).as("__docs"),
        sum(toks).as("__tokens"), sum(length(col(textCol))).as("__chars"),
        avg(toks).as("__avgTok"), max(toks).as("__maxTok"))
      .localCheckpoint() // five metric rows read it
    def m(name: String, c: String) =
      moments.select(lit(name).as("metric"),
        col(c).cast("double").as("value"))
    val dupRate = one("dup_text_rate",
      lit(1.0) - countDistinct(col(textCol)).cast("double") /
        count(lit(1)), base)
    val vocab = one("vocab_size", count(lit(1)),
      base.select(explode(split(lower(col(textCol)), "[^a-z]+"))
        .as("__t")).where(length(col("__t")) > 0)
        .select("__t").distinct())
    def shares(c: String) = {
      val counts = base.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .localCheckpoint() // total rollup + the share projection
      counts.join(broadcast(counts.agg(sum(col("__c")).as("__tot"))))
        .select((col("__c") / col("__tot")).as("__p"))
    }
    val langEntropy = one("lang_entropy_bits",
      -sum(col("__p") * log2(col("__p"))), shares(langCol))
    val topSource = one("top_source_share", max(col("__p")),
      shares(srcCol))
    Seq(m("docs", "__docs"), m("tokens", "__tokens"),
      m("chars", "__chars"), m("avg_doc_tokens", "__avgTok"),
      m("max_doc_tokens", "__maxTok"), dupRate, vocab, langEntropy,
      topSource)
      .reduce(_ unionByName _)
      .orderBy("metric")
  }
}
