package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Crowd-label aggregation — turning redundant (item, rater, label)
 * ratings into one training label per item, the step between raw
 * annotation exports and a training set. Two estimators: the
 * [[Labeling.majorityVote]] baseline and [[Labeling.dawidSkene]]
 * (Dawid & Skene 1979) EM, which learns per-rater confusion matrices
 * so a systematically-wrong rater stops outvoting good ones — the
 * standard upgrade when rater quality varies (it usually does).
 *
 * Everything is deterministic: no RNG (EM initialized from the
 * empirical vote shares), FIXED iteration counts, and intermediate
 * posteriors/confusions rounded on a fixed grid (the naive-Bayes
 * scoreRound discipline) so an external engine replays the argmax
 * bit-stably.
 *
 * Scale shape: the ratings frame is the only corpus-sized object.
 * Per EM iteration: one item-keyed join (ratings ⋈ posteriors) into a
 * (rater, true, observed) groupBy for the M-step, and one broadcast
 * join (ratings ⋈ confusion) into an (item, label) groupBy for the
 * E-step — confusion/prior frames are raters×L² and L rows. No
 * window, no driver state beyond the label list (L ≤ 32, collected
 * once).
 */
object Labeling {

  /** Aggregated result: `items` = (item, label, posterior, n_ratings);
    * `raters` = (rater, n_ratings, accuracy). */
  final case class DsResult(items: DataFrame, raters: DataFrame)

  /**
   * Per-item plurality label with deterministic tie-break (count DESC,
   * label ASC) — the baseline every aggregation should beat. Returns
   * (item, label, n_votes, n_ratings, vote_share).
   */
  def majorityVote(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val votes = df
      .where(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(labelCol).cast("string")
        .as("label"))
      .agg(count(lit(1)).as("__c"))
    votes.groupBy("item")
      .agg(min_by(col("label"),
        struct((-col("__c")).as("nc"), col("label").as("lb")))
        .as("label"),
        max(col("__c")).as("n_votes"), sum(col("__c")).as("n_ratings"))
      .withColumn("vote_share",
        col("n_votes").cast("double") / col("n_ratings"))
  }

  /**
   * Dawid–Skene EM with `iterations` fixed rounds. Posteriors start at
   * the empirical vote shares; each round re-estimates class priors
   * and per-rater confusion matrices (additive `alpha` smoothing over
   * the L observed labels) from the current posteriors, then
   * recomputes item posteriors in log space. Posterior weights,
   * confusion cells, and the final log-scores are rounded at
   * `roundAt` decimals so the whole computation replays bit-stably in
   * any engine; final ties break label-ascending.
   */
  def dawidSkene(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String, iterations: Int = 2, alpha: Double = 0.1,
      roundAt: Int = 9): DsResult = {
    require(iterations >= 1, "dawidSkene: iterations >= 1")
    require(alpha > 0, "dawidSkene: alpha > 0")
    val ratings = df.select(col(itemCol).as("item"),
        col(raterCol).as("rater"),
        col(labelCol).cast("string").as("obs"))
      .where(col("item").isNotNull && col("rater").isNotNull &&
        col("obs").isNotNull)
      .localCheckpoint() // read every E and M step
    val labels = ratings.select(col("obs").as("l")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length >= 2 && labels.length <= 32,
      s"dawidSkene: 2..32 labels (got ${labels.length})")
    val bigL = labels.length
    val spark = df.sparkSession
    import spark.implicits._
    val labelsDf = broadcast(labels.toSeq.toDF("l"))
    val nItems = broadcast(ratings.select("item").distinct()
      .agg(count(lit(1)).cast("double").as("__ni")))
    // initial posteriors: empirical vote share on the item×L grid
    val votes = ratings.groupBy("item", "obs")
      .agg(count(lit(1)).cast("double").as("__c"))
    val perItem = votes.groupBy("item").agg(sum(col("__c")).as("__nr"))
    var post = perItem.crossJoin(labelsDf)
      .join(votes.withColumnRenamed("obs", "l"), Seq("item", "l"), "left")
      .select(col("item"), col("l"),
        round(coalesce(col("__c"), lit(0.0)) / col("__nr"), roundAt)
          .as("w"))
      .localCheckpoint()
    var prior: DataFrame = null
    var conf: DataFrame = null
    for (_ <- 1 to iterations) {
      // M-step: class priors and rater confusions from posteriors
      prior = broadcast(post.groupBy("l")
        .agg(sum(col("w")).as("__s")).crossJoin(nItems)
        .select(col("l"), round((col("__s") + alpha) /
          (col("__ni") + alpha * bigL), roundAt).as("p")))
      val cells = ratings.join(post, Seq("item"))
        .groupBy(col("rater"), col("l"), col("obs"))
        .agg(sum(col("w")).as("__s"))
        .localCheckpoint() // denominator rollup + normalized cells
      val denom = cells.groupBy("rater", "l")
        .agg(sum(col("__s")).as("__tot"))
      conf = broadcast(cells.join(denom, Seq("rater", "l"))
        .select(col("rater"), col("l"), col("obs"),
          round((col("__s") + alpha) / (col("__tot") + alpha * bigL),
            roundAt).as("pi")))
      // E-step: log-space posterior per (item, l), renormalized
      val scored = ratings.join(conf, Seq("rater", "obs"))
        .groupBy("item", "l").agg(sum(log(col("pi"))).as("__sl"))
        .join(prior, Seq("l"))
        .select(col("item"), col("l"),
          round(col("__sl") + log(col("p")), roundAt).as("__s"))
        .localCheckpoint() // max join + normalization read it twice
      val mx = scored.groupBy("item").agg(max(col("__s")).as("__mx"))
      val withMx = scored.join(mx, Seq("item"))
        .withColumn("__e", exp(col("__s") - col("__mx")))
      val z = withMx.groupBy("item").agg(sum(col("__e")).as("__z"))
      post = withMx.join(z, Seq("item"))
        .select(col("item"), col("l"),
          round(col("__e") / col("__z"), roundAt).as("w"))
        .localCheckpoint()
    }
    val items = post.groupBy("item")
      .agg(min_by(col("l"), struct((-col("w")).as("nw"), col("l")
        .as("lb"))).as("label"),
        max(col("w")).as("posterior"))
      .join(perItem.select(col("item"), col("__nr").cast("long")
        .as("n_ratings")), Seq("item"))
    // rater quality: prior-weighted diagonal of the confusion matrix
    val raters = conf.where(col("l") === col("obs"))
      .join(prior, Seq("l"))
      .groupBy("rater").agg(sum(col("p") * col("pi")).as("accuracy"))
      .join(ratings.groupBy("rater")
        .agg(count(lit(1)).as("n_ratings")), Seq("rater"))
      .select(col("rater"), col("n_ratings"), col("accuracy"))
    DsResult(items, raters)
  }

  /**
   * Bradley–Terry strength scores from pairwise preferences — the
   * model behind preference-data aggregation (RLHF comparison
   * pools, ranked A/B panels): P(i beats j) = w_i/(w_i+w_j), fit by
   * a FIXED number of MM iterations (Hunter 2004) from w = 1:
   * w_i ← W_i / Σ_{j≠i} n_ij/(w_i+w_j), then rescaled to mean 1
   * each round (the MM update is scale-free; the rescale pins the
   * gauge so any engine replays the same numbers). No RNG, no
   * convergence test — deterministic like the GLM family.
   * Returns one row per item: (item, score, wins, games); an item
   * with zero wins scores 0 (its MM numerator), one with zero games
   * is absent.
   *
   * Scale shape: ONE corpus aggregation to the (winner, loser) count
   * frame; the frame is capped at `maxItems`² pairs and collected —
   * MM runs on the driver over ≤maxItems doubles (the q286 BPE-merge
   * discipline: iterate on a bounded report frame, never the corpus).
   */
  def bradleyTerry(prefs: DataFrame, winnerCol: String,
      loserCol: String, iterations: Int = 3,
      maxItems: Int = 1024): DataFrame = {
    require(iterations >= 1, "bradleyTerry: iterations >= 1")
    val spark = prefs.sparkSession
    import spark.implicits._
    val wins = prefs
      .where(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2)))
    val items = (wins.map(_._1) ++ wins.map(_._2)).distinct.sorted
    require(items.nonEmpty, "bradleyTerry: no preference pairs")
    require(items.size <= maxItems,
      s"bradleyTerry: ${items.size} items exceeds maxItems=$maxItems")
    val idx = items.zipWithIndex.toMap
    val k = items.size
    val winCount = Array.fill(k)(0.0)
    val games = Array.ofDim[Double](k, k)
    wins.foreach { case (wi, li, c) =>
      val i = idx(wi); val j = idx(li)
      winCount(i) += c; games(i)(j) += c; games(j)(i) += c
    }
    var w = Array.fill(k)(1.0)
    for (_ <- 1 to iterations) {
      val next = Array.tabulate(k) { i =>
        var denom = 0.0
        for (j <- 0 until k if j != i && games(i)(j) > 0)
          denom += games(i)(j) / (w(i) + w(j))
        if (denom > 0) winCount(i) / denom else 0.0
      }
      val mean = next.sum / k
      w = next.map(_ / mean)
    }
    items.indices.map { i =>
      (items(i), w(i), winCount(i).toLong,
        games(i).sum.toLong)
    }.toDF("item", "score", "wins", "games")
  }
}
