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
 * Scale shape: the corpus is read ONCE, collapsed to distinct
 * (item, rater, obs) vote cells with counts, item-hash-partitioned
 * and checkpointed. Posteriors ride WIDE (one row per item, one
 * column per label, L ≤ 32), so per EM iteration the plan is: one
 * co-partitioned item join + a map-side-combined (rater, obs)
 * aggregate for the M-step, and one broadcast join (cells ⋈ the
 * raters×L-row confusion) + a map-side-combined groupBy(item) for
 * the E-step, with the per-item max/exp/renormalize entirely
 * row-local. No window, no corpus×L intermediate, no driver state
 * beyond L priors and the label list (L ≤ 32, collected once).
 */
object Labeling {

  /** Aggregated result: `items` = (item, label, posterior, n_ratings);
    * `raters` = (rater, n_ratings, accuracy). */
  final case class DsResult(items: DataFrame, raters: DataFrame)

  /**
   * The shared substrate both estimators reduce: distinct
   * (item, rater, obs) vote cells with duplicate-vote counts, read
   * from the corpus ONCE, item-hash-partitioned (one raw shuffle; the
   * in-partition groupBy needs no second exchange since item-hash
   * already co-locates every (item, rater, obs)) and checkpointed so
   * every later per-item join/aggregate reuses the partitioning.
   * Build it once and feed [[majorityVoteFromCells]] +
   * [[dawidSkeneFromCells]] when running both on the same ratings.
   */
  def voteCells(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame =
    df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).cast("string").as("obs"))
      .where(col("item").isNotNull && col("rater").isNotNull &&
        col("obs").isNotNull)
      .repartition(col("item"))
      .groupBy("item", "rater", "obs")
      .agg(count(lit(1)).cast("double").as("cnt"))
      .localCheckpoint()

  /**
   * Per-item plurality label with deterministic tie-break (count DESC,
   * label ASC) — the baseline every aggregation should beat. Returns
   * (item, label, n_votes, n_ratings, vote_share).
   */
  def majorityVote(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame =
    majorityVoteFromCells(
      df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
          col(labelCol).cast("string").as("obs"))
        .where(col("item").isNotNull && col("obs").isNotNull)
        .groupBy("item", "obs").agg(count(lit(1)).cast("double")
          .as("cnt")))

  /** [[majorityVote]] over a prebuilt [[voteCells]] frame — rater
    * granularity folds out with a partitioning-preserving in-place
    * aggregate (cells are item-partitioned), so sharing cells with
    * [[dawidSkeneFromCells]] makes the vote baseline shuffle-free. */
  def majorityVoteFromCells(cells: DataFrame): DataFrame = {
    val votes = cells.groupBy(col("item"), col("obs").as("label"))
      .agg(sum(col("cnt")).as("__c"))
    votes.groupBy("item")
      .agg(min_by(col("label"),
        struct((-col("__c")).as("nc"), col("label").as("lb")))
        .as("label"),
        max(col("__c")).cast("long").as("n_votes"),
        sum(col("__c")).cast("long").as("n_ratings"))
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
      roundAt: Int = 9): DsResult =
    dawidSkeneFromCells(voteCells(df, itemCol, raterCol, labelCol),
      iterations, alpha, roundAt)

  /** [[dawidSkene]] over a prebuilt [[voteCells]] frame. With
    * `withVoteLabel` the items frame also carries `vote_label` — the
    * plurality baseline label, read off the INITIAL posteriors (vote
    * shares) for free: argmax-with-first-label-tie-break over
    * count/n_ratings is exactly [[majorityVote]]'s (count DESC, label
    * ASC) rule, so the EM-vs-baseline comparison costs no extra
    * corpus pass. */
  def dawidSkeneFromCells(cells: DataFrame, iterations: Int = 2,
      alpha: Double = 0.1, roundAt: Int = 9,
      withVoteLabel: Boolean = false): DsResult = {
    require(iterations >= 1, "dawidSkene: iterations >= 1")
    require(alpha > 0, "dawidSkene: alpha > 0")
    val labels = cells.select(col("obs").as("l")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length >= 2 && labels.length <= 32,
      s"dawidSkene: 2..32 labels (got ${labels.length})")
    val bigL = labels.length
    val js = labels.indices
    def wc(j: Int) = s"w_$j" // posterior weight column for label j
    // posteriors ride WIDE: one row per item, one column per label
    // (L ≤ 32 enforced above) — the per-item max/exp/normalize of the
    // E-step becomes row-local arithmetic instead of three self-joins.
    // initial posteriors (empirical vote share) and the per-item
    // rating totals the final readout joins back: ONE aggregate pass,
    // checkpointed once — perItem is a column select, not a second
    // corpus reduction.
    val init = cells.groupBy("item")
      .agg(sum(col("cnt")).as("__nr"),
        js.map(j => sum(when(col("obs") === labels(j), col("cnt"))
          .otherwise(lit(0.0))).as(s"__c$j")): _*)
      .select(col("item") +: col("__nr") +: js.map(j =>
        round(col(s"__c$j") / col("__nr"), roundAt).as(wc(j))): _*)
      .localCheckpoint()
    val perItem = init.select("item", "__nr")
    var post = init.drop("__nr")
    var priors: DataFrame = null // 1 row: __prior_0..__prior_{L-1}
    var confWide: DataFrame = null // (rater, obs, pi_0..pi_{L-1})
    for (it <- 1 to iterations) {
      // M-step. Class priors: one 1-row aggregate kept IN-PLAN as a
      // broadcast cross-join (no per-round driver collect — each
      // head() here was a whole extra job launch), rounded on the
      // same grid a literal would have been.
      priors = broadcast(post.agg(
          count(lit(1)).cast("double").as("__ni"),
          js.map(j => sum(col(wc(j))).as(s"__s$j")): _*)
        .select(js.map(j => round((col(s"__s$j") + alpha) /
          (col("__ni") + alpha * bigL), roundAt)
          .as(s"__prior_$j")): _*))
      // Rater confusions: cells ⋈ posteriors on the shared item
      // partitioning, then ONE wide conditional aggregation straight
      // to (rater) rows carrying all L(obs)×L(true) weighted sums
      // (L ≤ 32 ⇒ ≤ 1056 agg columns) — the per-rater denominators
      // t_j = Σ_o s_{o,j} are in-row column sums, so normalization
      // needs no second shuffle and no join-back; the (rater, obs)
      // shape the E-step broadcast-joins on is recovered by a
      // row-local inline explosion, restricted to OBSERVED obs rows
      // (__n_o > 0) so unobserved-but-smoothed cells never leak into
      // the rater-accuracy readout.
      val soCols = js.flatMap(o =>
        sum(when(col("obs") === labels(o), col("cnt"))
          .otherwise(lit(0.0))).as(s"__n$o") +:
        js.map(j =>
          sum(when(col("obs") === labels(o), col("cnt") * col(wc(j)))
            .otherwise(lit(0.0))).as(s"__s_${o}_$j")))
      val confRater = cells.join(post, Seq("item"))
        .groupBy("rater")
        .agg(soCols.head, soCols.tail: _*)
      def tj(j: Int) = js.map(o => col(s"__s_${o}_$j")).reduce(_ + _)
      val piRows = js.map(o => struct(
        lit(labels(o)).as("obs") +: col(s"__n$o").as("n_obs") +: js.map(
          j => round((col(s"__s_${o}_$j") + alpha) /
            (tj(j) + alpha * bigL), roundAt).as(s"pi_$j")): _*))
      // NOT checkpointed: the confusion is the broadcast SIDE of the
      // E-step join, so the round's whole M+E materializes in the ONE
      // job that checkpoints the posterior — a separate confusion
      // materialization would be a second job launch per round for a
      // frame nothing else reads eagerly (the raters readout evaluates
      // it lazily, and only if consumed).
      confWide = broadcast(confRater
        .select(col("rater"), explode(array(piRows: _*)).as("__p"))
        .where(col("__p.n_obs") > 0)
        .select(col("rater") +: col("__p.obs").as("obs") +:
          js.map(j => col(s"__p.pi_$j").as(s"pi_$j")): _*))
      // E-step: broadcast-join the (raters×L)-row confusion onto the
      // cells, one groupBy(item) with map-side combine, then the whole
      // renormalization in-row (greatest/exp/sum over L columns).
      val sumCols = js.map(j =>
        sum(col("cnt") * log(col(s"pi_$j"))).as(s"__sum$j"))
      val scored = cells.join(confWide, Seq("rater", "obs"))
        .groupBy("item")
        .agg(sumCols.head, sumCols.tail: _*)
        .crossJoin(priors)
        .select(col("item") +: js.map(j => round(
          col(s"__sum$j") + log(col(s"__prior_$j")), roundAt)
          .as(s"__sc$j")): _*)
      val mx = greatest(js.map(j => col(s"__sc$j")): _*)
      val withE = scored.withColumn("__mx", mx)
        .select(col("item") +: js.map(j =>
          exp(col(s"__sc$j") - col("__mx")).as(s"__e$j")): _*)
        .withColumn("__z", js.map(j => col(s"__e$j")).reduce(_ + _))
      post = withE
        .select(col("item") +: js.map(j =>
          round(col(s"__e$j") / col("__z"), roundAt).as(wc(j))): _*)
        .localCheckpoint()
    }
    // argmax with label-ascending tie-break: labels are sorted, so the
    // FIRST column hitting the max wins the tie.
    val mxW = greatest(js.map(j => col(wc(j))): _*)
    val labelFirst = js.foldRight(lit(null).cast("string")) { (j, e) =>
      when(col(wc(j)) === col("__mxw"), lit(labels(j))).otherwise(e)
    }
    val rightSide =
      if (withVoteLabel) {
        // plurality baseline off the INIT posteriors: w_init = count/nr
        // is order-identical to counts (same nr per item) and the
        // first-column-wins fold replays (count DESC, label ASC)
        val vm = greatest(js.map(j => col(wc(j))): _*)
        val vLabel = js.foldRight(lit(null).cast("string")) { (j, e) =>
          when(col(wc(j)) === col("__vmx"), lit(labels(j))).otherwise(e)
        }
        init.withColumn("__vmx", vm)
          .select(col("item"), col("__nr").cast("long").as("n_ratings"),
            vLabel.as("vote_label"))
      } else
        perItem.select(col("item"), col("__nr").cast("long")
          .as("n_ratings"))
    val items = post.withColumn("__mxw", mxW)
      .select(col("item"), labelFirst.as("label"),
        col("__mxw").as("posterior"))
      .join(rightSide, Seq("item"))
    // rater quality: prior-weighted diagonal of the confusion matrix —
    // each (rater, obs) row contributes prior(obs)·pi_{obs}(rater, obs)
    val diag = js.foldRight(lit(0.0)) { (j, e) =>
      when(col("obs") === labels(j),
        col(s"__prior_$j") * col(s"pi_$j")).otherwise(e)
    }
    val raters = confWide.crossJoin(priors)
      .groupBy("rater").agg(sum(diag).as("accuracy"))
      .join(cells.groupBy("rater")
        .agg(sum(col("cnt")).cast("long").as("n_ratings")), Seq("rater"))
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
    val valid = prefs
      .where(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
    // guard BEFORE the pair collect: a high-cardinality item column
    // would otherwise materialize up to items² count rows on the
    // driver before the require could fire. One cheap distinct-count
    // aggregate bounds the later collect at maxItems² by construction.
    val nDistinct = valid
      .select(explode(array(col(winnerCol).cast("string"),
        col(loserCol).cast("string"))).as("__i"))
      .agg(count_distinct(col("__i"))).head().getLong(0)
    require(nDistinct > 0, "bradleyTerry: no preference pairs")
    require(nDistinct <= maxItems,
      s"bradleyTerry: $nDistinct items exceeds maxItems=$maxItems")
    val wins = valid
      .groupBy(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2)))
    val items = (wins.map(_._1) ++ wins.map(_._2)).distinct.sorted
    require(items.nonEmpty, "bradleyTerry: no preference pairs")
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
