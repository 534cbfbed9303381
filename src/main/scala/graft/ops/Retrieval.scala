package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid-retrieval composition and evaluation: fuse independently
 * produced rankings (lexical BM25, embedding ANN, recency, …) and
 * grade ranked results against a relevance set. Complements the
 * retrievers themselves ([[TextAnalysis.bm25TopK]],
 * [[Similarity.lshKnn]], [[Similarity.ivfKnn]]) — these operators
 * consume their OUTPUT frames, so any ranker that emits
 * (query, doc, rank) composes.
 *
 * Scale design: fusion is one keyed full-outer join on (query, doc);
 * evaluation is one left join + per-query aggregate. The only windows
 * are PARTITIONED by query (per-query candidate lists, bounded by the
 * rankers' top-k) — no global sort, no driver collect.
 */
object Retrieval {

  /**
   * Reciprocal-rank fusion (Cormack et al., SIGIR'09 form) of two
   * rankings: fused score = Σ_r 1/(k + rank_r), a ranker that missed
   * the doc contributing 0. Returns (query, doc, rrf_score,
   * fused_rank) with fused_rank dense per query, ties broken by doc
   * id so both the score (two correctly-rounded reciprocals summed
   * once) and the order are deterministic.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String, docCol: String,
      rankCol: String, k: Int = 60): DataFrame = {
    def side(df: DataFrame, out: String) =
      df.select(col(queryCol).as("query"), col(docCol).as("doc"),
        (lit(1.0) / (lit(k.toDouble) + col(rankCol).cast("double"))).as(out))
    side(a, "__sa")
      .join(side(b, "__sb"), Seq("query", "doc"), "full_outer")
      .na.fill(0.0, Seq("__sa", "__sb"))
      .withColumn("rrf_score", col("__sa") + col("__sb"))
      .withColumn("fused_rank",
        row_number().over(Window.partitionBy("query")
          .orderBy(col("rrf_score").desc, col("doc").asc)))
      .select("query", "doc", "rrf_score", "fused_rank")
  }

  /**
   * Ranked-retrieval evaluation per query: given results
   * (query, doc, rank) and a relevance set (query, doc), returns one
   * row per query with
   * (query, n_results, n_relevant, first_rel_rank, rr, recall_at_k,
   * precision_at_k) — rr = 1/first_rel_rank (0 when no relevant doc
   * was retrieved; averaging rr over queries gives MRR), recall@k =
   * hits in the top k / min(n_relevant, k) is NOT clipped here:
   * recall@k = hits@k / n_relevant, precision@k = hits@k / k, the
   * textbook definitions.
   *
   * Queries with an empty relevance set report n_relevant = 0 and
   * NULL recall (0/0 is undefined, not 0) — callers filter or
   * coalesce per their convention.
   */
  def retrievalMetrics(results: DataFrame, relevant: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      k: Int = 10): DataFrame = {
    val res = results.select(col(queryCol).as("query"),
      col(docCol).as("doc"), col(rankCol).cast("long").as("__rank"))
    val rel = relevant
      .select(col(queryCol).as("query"), col(docCol).as("doc")).distinct()
      .withColumn("__rel", lit(1.0))
    val nRel = rel.groupBy("query")
      .agg(count(lit(1)).as("n_relevant"))
    res.join(rel, Seq("query", "doc"), "left")
      .groupBy("query")
      .agg(count(lit(1)).as("n_results"),
        min(when(col("__rel").isNotNull, col("__rank")))
          .as("first_rel_rank"),
        sum(when(col("__rel").isNotNull && col("__rank") <= k, 1L)
          .otherwise(0L)).as("__hitsk"))
      .join(nRel, Seq("query"), "left")
      .na.fill(0L, Seq("n_relevant"))
      .select(col("query"), col("n_results"), col("n_relevant"),
        col("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)).as("rr"),
        when(col("n_relevant") > 0, col("__hitsk") / col("n_relevant"))
          .as("recall_at_k"),
        (col("__hitsk") / lit(k.toDouble)).as("precision_at_k"))
  }

  /**
   * Expected Reciprocal Rank (Chapelle et al. 2009) per query — the
   * graded cascade-model metric that complements binary MRR and
   * position-discount NDCG: a user scans down the list and stops at
   * rank r with probability R_r·Π_{i<r}(1−R_i), contributing 1/r;
   * R = (2^gain − 1)/2^maxGain. Top-heavy AND satisfaction-aware: a
   * perfect doc at rank 1 nearly ends the session, so later relevants
   * add little. Returns one row per query:
   * (query, n_results, err_at_k).
   *
   * Scale shape: one graded-relevance left join, then the cascade
   * product as exp(Σ log1p(−R)) over a rank window PARTITIONED BY
   * QUERY — ≤k rows per partition by construction (the
   * [[retrievalMetrics]] stance); one grouped reduce. R < 1 always
   * (even max gain), so the log is finite.
   */
  def expectedReciprocalRank(results: DataFrame, graded: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      gainCol: String, maxGain: Int = 3, k: Int = 10): DataFrame = {
    require(maxGain >= 1 && k >= 1, "expectedReciprocalRank: args")
    val res = results.select(col(queryCol).as("query"),
        col(docCol).as("doc"), col(rankCol).cast("long").as("__rank"))
      .where(col("__rank") <= k)
    val rel = graded.select(col(queryCol).as("query"),
      col(docCol).as("doc"), col(gainCol).cast("double").as("__g"))
    val w = Window.partitionBy("query").orderBy("__rank")
      .rowsBetween(Window.unboundedPreceding, -1)
    // gains are clamped to maxGain BEFORE the cascade: a data gain
    // above the declared scale would give R ≥ 1, making log1p(−R)
    // NaN/−Inf and silently corrupting every later rank's cascade
    // term for that query. Clamped, R < 1 holds for every input.
    val r = (pow(lit(2.0),
        least(coalesce(col("__g"), lit(0.0)), lit(maxGain.toDouble))) - 1) /
      pow(lit(2.0), lit(maxGain.toDouble))
    res.join(rel, Seq("query", "doc"), "left")
      .withColumn("__r", r)
      .withColumn("__stopHere",
        col("__r") / col("__rank") *
          exp(coalesce(sum(log1p(-col("__r"))).over(w), lit(0.0))))
      .groupBy("query")
      .agg(count(lit(1)).as("n_results"),
        sum(col("__stopHere")).as("err_at_k"))
  }
}
