package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling for training-data pipelines. Both
 * samplers are map-only hash-threshold predicates (no global sort, no
 * TakeOrdered over the corpus) and replay identically in any engine
 * with md5 — see [[graft.analysis.AnalysisPlanner.hashSample]] for the
 * single-frame variant and the portability contract.
 */
object Sampling {

  private val M = graft.functions.PortableHash.M

  private def hashOf(hashCols: Seq[String]) =
    graft.functions.PortableHash.bucket(hashCols.map(col))

  /**
   * Weighted source mixing with deterministic fractional epochs — the
   * corpus-mixing step of a training-data pipeline: a source at rate
   * 0.3 keeps ~30% of its rows; at rate 2.5 every row appears twice and
   * ~half a third time (`mix_copy` = 1..k distinguishes the epochs).
   * Map-only: the per-row copy count is ⌊rate⌋ plus a hash-threshold
   * coin for the fractional part, then a bounded `explode` — no shuffle
   * and the same subset in any engine with md5. Sources absent from
   * `rates` default to rate 1.0.
   */
  def weightedMix(df: DataFrame, sourceCol: String,
      rates: Map[String, Double], hashCols: Seq[String]): DataFrame = {
    require(rates.values.forall(r => r >= 0), "rates must be >= 0")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(1.0)) {
      case (acc, (k, r)) => when(col(sourceCol) === k, lit(r)).otherwise(acc)
    }
    val copies = (floor(rate).cast("long") +
      when(hashOf(hashCols) < (rate - floor(rate)) * M, 1L).otherwise(0L))
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0) // sequence(1,0) would step backwards
      .withColumn("mix_copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /**
   * Temperature-based source rebalancing — the standard multilingual /
   * multi-domain mixing rule (mT5 §3.1 shape): a source holding share
   * p_s of the corpus is sampled proportionally to p_s^(1/T), so T=1
   * keeps natural proportions and T→∞ approaches uniform across
   * sources. Implemented as data-derived per-source rates feeding
   * [[weightedMix]]: rates are normalized so the HIGHEST-WEIGHT source
   * keeps rate `maxRate` — for T > 1 (the common flattening case) the
   * per-row weight p^(1/T−1) DECREASES in p, so the SMALLEST source
   * keeps `maxRate` and the largest is downsampled hardest (default
   * 1.0 — downsample-only; raise `maxRate` to allow fractional
   * upsampling epochs of small sources).
   *
   * The per-source share frame is tiny (one row per source) and is
   * collected to drive literal rates — deterministic replay therefore
   * needs only [[weightedMix]]'s md5-coin contract. Returns the mixed
   * frame plus the rate map actually applied.
   */
  def temperatureMix(df: DataFrame, sourceCol: String, temperature: Double,
      hashCols: Seq[String], maxRate: Double = 1.0)
      : (DataFrame, Map[String, Double]) = {
    require(temperature > 0, "temperature must be positive")
    require(maxRate > 0, "maxRate must be positive")
    val shares = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.get(0).toString -> r.getLong(1).toDouble)
    val total = shares.map(_._2).sum
    // output share ∝ p^(1/T) requires a per-ROW rate ∝ p^(1/T − 1)
    // (the rate multiplies the source's natural share p)
    val weights = shares.map { case (s, n) =>
      s -> math.pow(n / total, 1.0 / temperature - 1.0)
    }
    val wMax = weights.map(_._2).max
    val rates = weights.map { case (s, w) => s -> maxRate * w / wMax }.toMap
    (weightedMix(df, sourceCol, rates, hashCols), rates)
  }

  /**
   * Stratified sampler: targets ~`n` rows PER STRATUM (class-balanced
   * subsets — the "equal examples per label/language/source" step).
   * Strata counts come from one aggregation joined back on the strata
   * keys; a stratum with fewer than n rows is kept whole. Deterministic:
   * the kept subset depends only on `hashCols` values.
   */
  def stratifiedHashSample(df: DataFrame, n: Long, strata: Seq[String],
      hashCols: Seq[String]): DataFrame = {
    // NULL is a legitimate stratum (unlabeled rows in scraped corpora) —
    // join null-safely so those rows are sampled, not silently dropped
    val tot = df.groupBy(strata.map(col): _*).agg(count(lit(1)).as("__tot"))
      .select(strata.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__k$i") } :+ col("__tot"): _*)
    val cond = strata.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__k$i") }
      .reduce(_ && _)
    // double comparison: the Long product h·tot overflows (ANSI error)
    // past ~2^43 rows per stratum; doubles are exact below 2^53
    df.join(tot, cond)
      .where(hashOf(hashCols).cast("double") * col("__tot").cast("double") <
        lit(n.toDouble * M))
      .drop(strata.indices.map(i => s"__k$i") :+ "__tot": _*)
  }

  /**
   * Budget-capped sampling: keep a deterministic pseudo-random subset of
   * rows whose `weightCol` total stays within `budget` — the "give me
   * ~10B training tokens from this corpus" step, where a per-row
   * hash-threshold rate can only target an EXPECTED total, not a cap.
   * Rows are ordered by a portable 52-bit md5 hash of `hashCols` (a
   * deterministic shuffle of the corpus) and the prefix whose EXCLUSIVE
   * running weight is under the budget is kept — so the first row always
   * fits, and the kept total overshoots by less than one row's weight.
   *
   * Scale design: the running weight is a distributed bucketed prefix
   * sum ([[graft.analysis.PrefixSum]]), NOT a global single-partition
   * window — the corpus-wide sort the naive `sum() OVER (ORDER BY h)`
   * would serialize is replaced by two keyed shuffles. Replayable in
   * any engine with md5 (`('0x' || substring(md5(k),1,13))::BIGINT`);
   * 52-bit hash order has no meaningful collision mass below ~2^26
   * rows — collisions only make the tie's relative order
   * engine-dependent, never the kept count wrong by more than the tie.
   */
  def budgetSample(df: DataFrame, budget: Long, weightCol: String,
      hashCols: Seq[String], strataCols: Seq[String] = Nil): DataFrame = {
    // 13 hex chars = 52 bits: exact as double, which PrefixSum's
    // bucket-boundary math requires (15-char/60-bit would silently lose
    // low bits in the double image)
    val h = conv(substring(
      md5(concat_ws("|", hashCols.map(c => col(c).cast("string")): _*)),
      1, 13), 16, 10).cast("long")
    // strataCols gives each stratum (source/domain/language) its OWN
    // budget — the mixture-balancing form ("2B tokens per domain"):
    // the prefix sum groups per stratum (null-safe, NULL is a stratum)
    graft.analysis.PrefixSum
      .exclusive(df.withColumn("__h", h), "__h",
        Seq(weightCol -> "budget_used"), groupCols = strataCols)
      .where(col("budget_used") < budget)
      .drop("__h")
  }

  /**
   * Token-balanced training-shard assignment: rows are ordered by the
   * same portable md5 hash as [[budgetSample]] (a deterministic global
   * shuffle — neighboring source documents land in different shards)
   * and packed greedily so each shard holds ~`weightPerShard` tokens:
   * `shard_id = floor(exclusive running weight / weightPerShard)`.
   * Shards are balanced by WEIGHT (± one row's weight at each
   * boundary), not by row count — what a trainer's data loader wants.
   * The writer side is one `partitionBy("shard_id")` away; the
   * assignment itself is the [[graft.analysis.PrefixSum]] grouped
   * bucketed prefix sum — no global window, any corpus size.
   */
  def assignShards(df: DataFrame, weightPerShard: Long, weightCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(weightPerShard > 0, "weightPerShard must be positive")
    val h = conv(substring(
      md5(concat_ws("|", hashCols.map(c => col(c).cast("string")): _*)),
      1, 13), 16, 10).cast("long")
    graft.analysis.PrefixSum
      .exclusive(df.withColumn("__h", h), "__h",
        Seq(weightCol -> "__cum"))
      .withColumn("shard_id", floor(col("__cum") / weightPerShard))
      .drop("__h", "__cum")
  }

  /**
   * GPT-style sequence packing: documents are concatenated in the same
   * deterministic md5-hash order as [[assignShards]] and the token
   * stream is chunked into fixed-capacity training sequences of
   * `seqLen` tokens — the "no padding waste" packing every LLM
   * trainer's data loader performs. Unlike [[assignShards]] (whole
   * documents, weight-balanced bins), a document here may STRADDLE a
   * sequence boundary; the output reports the placement a loader needs
   * to materialize its slice:
   *
   *  - `seq_first` / `seq_last`: the sequence span the document covers
   *    (`seq_last - seq_first` boundaries are crossed);
   *  - `offset_in_seq`: the document's start offset inside `seq_first`.
   *
   * Zero-weight rows (empty documents) report `seq_last = seq_first` —
   * they occupy a position but no tokens. The running offset is the
   * [[graft.analysis.PrefixSum]] bucketed prefix sum, so there is no
   * corpus-wide single-partition window at any size; replaying the md5
   * order in another engine reproduces the identical packing.
   */
  def packSequences(df: DataFrame, seqLen: Long, weightCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val h = conv(substring(
      md5(concat_ws("|", hashCols.map(c => col(c).cast("string")): _*)),
      1, 13), 16, 10).cast("long")
    val w = col(weightCol)
    graft.analysis.PrefixSum
      .exclusive(df.withColumn("__h", h), "__h",
        Seq(weightCol -> "__cum"))
      .withColumn("seq_first", floor(col("__cum") / seqLen))
      .withColumn("seq_last",
        when(w <= 0, col("seq_first"))
          .otherwise(floor((col("__cum") + w - 1) / seqLen)))
      .withColumn("offset_in_seq", col("__cum") % seqLen)
      .drop("__h", "__cum")
  }

  /**
   * Deterministic train/val/test split — the holdout-assignment step of
   * every dataset release. Each row gets the FIRST split whose
   * cumulative weight threshold its md5 bucket falls under:
   * `splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)` maps
   * bucket < 0.9·M → train, < 0.95·M → val, else test. Map-only (one
   * codegen'd CASE over the [[graft.functions.PortableHash]] bucket),
   * stable under corpus growth (a row's split never changes when other
   * rows are added — the property a leakage-safe holdout needs, and the
   * reason `ORDER BY rand()` splits are wrong), and replayable in any
   * engine with md5.
   */
  def hashSplit(df: DataFrame, splits: Seq[(String, Double)],
      hashCols: Seq[String], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0), "split weights must be >= 0")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be distinct")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1 (got $total)")
    val h = hashOf(hashCols).cast("double")
    // CASE built from the last split backwards so the FIRST matching
    // cumulative threshold wins
    val cases = splits.init
      .scanLeft(("", 0.0)) { case ((_, cum), (name, wgt)) => (name, cum + wgt) }
      .drop(1)
    val caseExpr = cases.reverse.foldLeft(lit(splits.last._1)) {
      case (els, (name, cumW)) => when(h < lit(cumW * M), lit(name)).otherwise(els)
    }
    df.withColumn(outCol, caseExpr)
  }

  /**
   * EXACT-n stratified sampling: exactly `min(n, |stratum|)` rows per
   * stratum, chosen as the first n in deterministic md5-hash order —
   * the class-balanced-subset step when the downstream contract needs
   * an exact count, not [[stratifiedHashSample]]'s expected ~n. One
   * window per stratum (`row_number` over the hash order) — partitioned
   * by the strata keys, so it distributes; a single giant stratum
   * serializes its own window, which is the inherent cost of an exact
   * per-stratum rank (use the rate-based sampler when ~n suffices at
   * that scale). Ties in the 60-bit hash are broken by the hash-column
   * values themselves, so the subset is total-order deterministic.
   */
  def exactStratifiedSample(df: DataFrame, n: Long, strata: Seq[String],
      hashCols: Seq[String]): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(hashOf(hashCols).asc +: hashCols.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /**
   * Per-key document cap — the RefinedWeb/C4-style "at most `cap` docs
   * per domain" curation step. Keeps the `cap` rows with the smallest
   * portable hash per key (total-order deterministic: hash ties break
   * on the hash columns themselves), so the SAME subset survives on any
   * engine and under any partitioning.
   *
   * Scale shape: rows of keys already at-or-under the cap — in a
   * Zipf-ish web corpus, almost all keys — bypass the rank entirely
   * (one keyed count-join decides membership); only over-cap keys'
   * rows enter the per-key `row_number` window. The window therefore
   * ranks O(rows of hot keys), not O(corpus), and each hot key's frame
   * is the inherent cost of an exact per-key top-`cap`. Result column
   * set = input column set (projection preserved for pushdown).
   */
  /**
   * Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-Res:
   * each row draws a deterministic uniform u from the portable md5
   * bucket (u = (bucket + ½)/2²⁰) and competes on key u^(1/w) — the
   * top-k keys are exactly a weight-proportional without-replacement
   * sample. The engine orders by the monotone-equivalent ln(u)/w
   * (descending), so heavier rows, whose key is pulled toward 1, win
   * more often, and no row can be drawn twice by construction.
   *
   * Scale shape: the selection is `orderBy(key).limit(k)` — Spark
   * plans TakeOrderedAndProject, a per-partition top-k + single k-row
   * driver merge, NOT a global sort; the key itself is map-only.
   * Replayable: DuckDB mirror is `ln((bucket + 0.5)/1048576)/w` with
   * the shared md5 bucket; ln differs across engines by ≤1 ulp, which
   * flips selection only on ~1e-16-relative key ties.
   */
  def weightedSampleWithoutReplacement(df: DataFrame, k: Int,
      weightCol: String, hashCols: Seq[String]): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (hashOf(hashCols).cast("double") + lit(0.5)) / lit(M.toDouble)
    df.withColumn("__es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__es_key").desc +: hashCols.map(c => col(c).asc): _*)
      .limit(k)
      .drop("__es_key")
  }

  /**
   * Neyman optimal allocation for stratified estimation: given a total
   * sample budget `n`, each stratum h gets n_h ∝ N_h·S_h (population ×
   * sample stddev) — the allocation that minimizes the variance of the
   * stratified mean. Returns the allocation TABLE
   * (strataCols…, n_rows, stddev, alloc); feed `alloc` per stratum to
   * [[exactStratifiedSample]] to draw the rows. One keyed aggregation
   * plus a 1-row total broadcast.
   *
   * Replay note: alloc = ⌊round(n·N_h·S_h/Σ, 6)⌋ — the round-6 grid
   * absorbs cross-engine stddev fp noise BEFORE the floor, so the
   * integer allocation is engine-stable (a raw floor would flip on a
   * last-ulp difference when the product sits near an integer);
   * single-row strata (S_h undefined) allocate 0.
   */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
      valueCol: String, n: Long): DataFrame = {
    require(n > 0, "n must be positive")
    val g = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        coalesce(stddev_samp(col(valueCol).cast("double")), lit(0.0))
          .as("stddev"))
      .withColumn("__w", col("n_rows").cast("double") * col("stddev"))
    val tot = broadcast(g.agg(sum(col("__w")).as("__tot")))
    g.crossJoin(tot)
      .withColumn("alloc",
        floor(round(lit(n.toDouble) * col("__w") / col("__tot"), 6))
          .cast("long"))
      .drop("__w", "__tot")
  }

  /**
   * Systematic probability-proportional-to-size sampling: lay the
   * units' weights end to end along [0, T), drop n equally spaced
   * points (step = T/n, deterministic half-step start r = step/2 — no
   * RNG, the engine-replay stance), and select every unit whose
   * weight interval contains a point. A unit with w > step is a
   * CERTAINTY unit and can be hit multiple times — `n_hits` carries
   * the multiplicity (its sampling weight), Σ n_hits = n exactly.
   * The inclusion probability of a small unit is n·w/T — the PPS
   * contract that makes Hansen–Hurwitz/HT estimators unbiased.
   * Returns the selected rows + (cum_before, n_hits).
   *
   * `orderCol` must be a UNIQUE numeric column (the frame order along
   * the line — sampling needs a total order to be well-defined).
   * Replay note: interval endpoints are compared on the round-6 grid
   * before the floor (the [[neymanAllocation]] discipline), so
   * cross-engine fp noise can't flip a point across a boundary.
   *
   * Scale shape: ONE [[graft.analysis.PrefixSum]] pass for the
   * cumulative weights + a broadcast 1-row total; selection is a
   * map-only predicate. No window, no sort, no driver state.
   */
  def ppsSystematic(df: DataFrame, n: Long, weightCol: String,
      orderCol: String): DataFrame = {
    require(n > 0, "n must be positive")
    val w = col(weightCol).cast("double")
    val base = df.where(w.isNotNull && w > 0 && col(orderCol).isNotNull)
      .withColumn("__w", w)
    val pre = graft.analysis.PrefixSum
      .exclusive(base, orderCol, Seq("__w" -> "__cb"))
    val tot = broadcast(base.agg(sum(col("__w")).as("__T")))
    val step = col("__T") / lit(n.toDouble)
    val r = step / 2
    def idx(c: org.apache.spark.sql.Column) =
      floor(round((c - r) / step, 6))
    pre.crossJoin(tot)
      .withColumn("n_hits",
        (idx(col("__cb") + col("__w")) - idx(col("__cb"))).cast("long"))
      .where(col("n_hits") >= 1)
      .withColumn("cum_before", col("__cb"))
      .drop("__w", "__cb", "__T")
  }

  def perKeyCap(df: DataFrame, keyCols: Seq[String], cap: Long,
      hashCols: Seq[String]): DataFrame = {
    require(cap > 0, "cap must be positive")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val withN = graft.analysis.PrefixSum.joinNullSafe(df, counts, keyCols)
    val under = withN.where(col("__n") <= cap).drop("__n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(hashOf(hashCols).asc +: hashCols.map(c => col(c).asc): _*)
    val capped = withN.where(col("__n") > cap)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn", "__n")
    under.unionByName(capped).select(df.columns.map(col).toSeq: _*)
  }

  /**
   * Per-entity temporal train/validation split — the leakage-free way
   * to split behavioral data (a global time cut starves cold entities;
   * a random split leaks future rows into train). Each key's rows are
   * ordered by `orderCols` (include a unique tiebreaker — e.g. the
   * event id — for determinism under timestamp ties) and the LAST
   * ⌈n·valFrac⌉ become `"val"`, the rest `"train"`; a 1-row key goes
   * entirely to train (⌈1·0.2⌉ = 1 would otherwise starve it — we cap
   * validation at n−1). Adds a `split` column; row set unchanged.
   *
   * Scale: one window per key ordered by time — bounded by per-key
   * cardinality (the sessionize/inter-arrival shape), never global.
   */
  def temporalSplit(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], valFrac: Double): DataFrame = {
    require(valFrac >= 0 && valFrac < 1, "valFrac in [0, 1)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)))
      .withColumn("split",
        when(col("__rn") > col("__n") -
            least(ceil(col("__n") * valFrac), col("__n") - 1), "val")
          .otherwise("train"))
      .drop("__rn", "__n")
  }

  /**
   * Corpus mixture planner — sizing the per-source sampling rates for
   * a token budget (the static half of temperature mixing; cf. the
   * multilingual-sampling rule of Conneau & Lample 2019): per source,
   * weight wₛ ∝ nₛ^(1/τ) over available tokens nₛ, allocation
   * aₛ = wₛ·budget capped at `maxEpochs`·nₛ (an epoch cap stops tiny
   * sources from being oversampled into memorization), and ONE
   * redistribution round hands the capped sources' unused budget to
   * the uncapped ones in proportion to their weights (re-capped). τ=1
   * is proportional; τ→∞ approaches uniform.
   *
   * Returns one row per source: (source, n_tokens, weight,
   * alloc_tokens, epochs) — a ≤|sources|-row frame from ONE
   * aggregation over the corpus plus broadcast 1-row totals; the
   * waterfall is pure column algebra, no iteration over the data.
   */
  def mixturePlan(df: DataFrame, sourceCol: String, tokenCol: String,
      budget: Long, temperature: Double = 1.0,
      maxEpochs: Double = 4.0): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(temperature > 0, "temperature must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val perSource = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol).cast("double")).as("n_tokens"))
      // ≤|sources| rows feeding four downstream branches (total weight,
      // first-pass alloc, leftover, report) — materialize once or the
      // corpus aggregation runs four times
      .localCheckpoint()
    val wRaw = pow(col("n_tokens"), lit(1.0 / temperature))
    val weighted = perSource.withColumn("__w", wRaw)
    val totW = broadcast(weighted.agg(sum(col("__w")).as("__tw")))
    val first = weighted.crossJoin(totW)
      .withColumn("weight", col("__w") / col("__tw"))
      .withColumn("__cap", col("n_tokens") * maxEpochs)
      .withColumn("__a0", least(col("weight") * budget, col("__cap")))
      .withColumn("__capped", col("weight") * budget > col("__cap"))
    // single waterfall round: leftover budget → uncapped sources by
    // weight, re-capped (sources capped in round 2 just keep their cap)
    val leftover = broadcast(first.agg(
      (lit(budget.toDouble) - sum(col("__a0"))).as("__left"),
      coalesce(sum(when(!col("__capped"), col("__w"))), lit(0.0))
        .as("__wUncapped")))
    first.crossJoin(leftover)
      .withColumn("alloc_tokens",
        when(col("__capped") || col("__wUncapped") === 0.0, col("__a0"))
          .otherwise(least(
            col("__a0") + col("__left") * col("__w") / col("__wUncapped"),
            col("__cap"))))
      .withColumn("epochs", col("alloc_tokens") / col("n_tokens"))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("alloc_tokens"), col("epochs"))
  }

  /**
   * Raking / iterative proportional fitting (Deming & Stephan 1940):
   * per-cell sampling weights that make the corpus match TWO target
   * marginal distributions at once — the "rebalance the training mix
   * to a reference demographic/source/language profile" operation
   * that per-axis reweighting can't do (fixing one margin breaks the
   * other; IPF alternates until both hold). `targetA`/`targetB` are
   * 2-column frames (value, share) over `aCol`/`bCol`; a FIXED
   * iteration count keeps the weights a pure function of the inputs
   * (IPF converges geometrically — 3 rounds is standard practice).
   * Returns one row per observed cell: (a, b, n, weight); a row's
   * sampling weight is its cell's `weight`, and Σ n·w = N with both
   * margins matched to the targets.
   *
   * Scale shape: ONE corpus groupBy to the |A|×|B| cell frame
   * (localCheckpointed), then every iteration is two margin rollups +
   * broadcast joins ON THAT TINY FRAME — the corpus is never
   * rescanned, and 100 TB costs exactly one shuffle regardless of
   * iteration count.
   */
  def rakeWeights(df: DataFrame, aCol: String, bCol: String,
      targetA: DataFrame, targetB: DataFrame,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      "rakeWeights: iterations in [1,20]")
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).cast("double").as("n")).localCheckpoint()
    val tot = broadcast(cells.agg(sum(col("n")).as("__N")))
    val ta = broadcast(targetA.select(
      col(targetA.columns(0)).as("a"),
      col(targetA.columns(1)).cast("double").as("__sa")))
    val tb = broadcast(targetB.select(
      col(targetB.columns(0)).as("b"),
      col(targetB.columns(1)).cast("double").as("__sb")))
    // inner join: cells whose margin has no target share are dropped
    // loudly from the output (the caller's targets define the frame)
    var w = cells.crossJoin(tot).join(ta, Seq("a")).join(tb, Seq("b"))
      .withColumn("w", lit(1.0)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val ra = w.groupBy("a").agg(sum(col("n") * col("w")).as("__ra"))
      w = w.join(broadcast(ra), Seq("a"))
        .withColumn("w",
          col("w") * col("__sa") * col("__N") / col("__ra"))
        .drop("__ra").localCheckpoint()
      val rb = w.groupBy("b").agg(sum(col("n") * col("w")).as("__rb"))
      w = w.join(broadcast(rb), Seq("b"))
        .withColumn("w",
          col("w") * col("__sb") * col("__N") / col("__rb"))
        .drop("__rb").localCheckpoint()
    }
    w.select(col("a"), col("b"), col("n").cast("long").as("n"),
      col("w").as("weight"))
  }
  /**
   * Chapman capture–recapture estimate of a POPULATION size from two
   * overlapping samples — "how many distinct users/docs/entities are
   * there really, given two partial captures": N̂ = (n₁+1)(n₂+1)/(m+1)
   * − 1 with the standard variance estimate, where m is the overlap.
   * The classic ecology estimator reads directly onto dedup audits
   * (two crawls' overlap → total distinct docs) and traffic
   * estimation (two samplers' overlap → total distinct users).
   * Returns ONE row: (n_a, n_b, n_overlap, n_observed, chapman, se).
   *
   * Scale shape: one groupBy(id) pass collapses the corpus to
   * per-entity capture flags, one 1-row reduce — no joins.
   */
  def captureRecapture(df: DataFrame, idCol: String, sampleA: Column,
      sampleB: Column): DataFrame = {
    val per = df.where(col(idCol).isNotNull)
      .groupBy(col(idCol).as("__id"))
      .agg(max(when(sampleA, 1.0).otherwise(0.0)).as("__a"),
        max(when(sampleB, 1.0).otherwise(0.0)).as("__b"))
      .where(col("__a") > 0 || col("__b") > 0)
    val n1 = sum(col("__a"))
    val n2 = sum(col("__b"))
    val m = sum(col("__a") * col("__b"))
    per.agg(n1.cast("long").as("n_a"), n2.cast("long").as("n_b"),
        m.cast("long").as("n_overlap"),
        count(lit(1)).as("n_observed"),
        ((n1 + 1) * (n2 + 1) / (m + 1) - 1).as("chapman"),
        sqrt((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) /
          ((m + 1) * (m + 1) * (m + 2))).as("se"))
  }
  /**
   * Post-stratification reweighting: adjust a sample whose stratum
   * mix drifted from the population's — the survey-statistics fix
   * that also reads directly onto "my logged traffic over-represents
   * power users". Each stratum's rows get weight target_share /
   * observed_share; the post-stratified mean is Σ_g target_g·mean_g,
   * and Kish's effective sample size (Σw)²/Σw² prices the variance
   * cost of the reweighting. Strata absent from `targetShares` are
   * DROPPED and counted (they have no defined weight). Returns ONE
   * row: (n, n_used, n_strata, raw_mean, post_mean, ess).
   *
   * Scale shape: one grouped pass to the ≤k-row stratum frame;
   * everything else is algebra on the reduction (weights never touch
   * rows — w is constant within a stratum, so Σw = Σ_g w_g·n_g and
   * Σw² = Σ_g w_g²·n_g exactly).
   */
  def postStratify(df: DataFrame, stratumCol: String, valueCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "postStratify: no target shares")
    require(math.abs(targetShares.values.sum - 1.0) < 1e-9,
      "postStratify: target shares must sum to 1")
    val x = col(valueCol).cast("double")
    val tgt = targetShares.foldLeft(lit(null).cast("double")) {
      case (e, (k, v)) =>
        when(col("__g") === k, lit(v)).otherwise(e)
    }
    val g = df.where(x.isNotNull && col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("__g"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("__s"))
      .withColumn("__t", tgt)
    val tot = broadcast(g.agg(sum(col("__n")).as("__tn"),
      sum(col("__s")).as("__ts")))
    g.crossJoin(tot)
      .withColumn("__w", col("__t") / (col("__n") / col("__tn")))
      .agg(max(col("__tn")).cast("long").as("n"),
        sum(when(col("__t").isNotNull, col("__n")).otherwise(0.0))
          .cast("long").as("n_used"),
        sum(when(col("__t").isNotNull, 1L).otherwise(0L)).as("n_strata"),
        (max(col("__ts")) / max(col("__tn"))).as("raw_mean"),
        sum(when(col("__t").isNotNull,
          col("__t") * col("__s") / col("__n"))).as("post_mean"),
        (pow(sum(when(col("__t").isNotNull, col("__w") * col("__n"))), 2.0) /
          sum(when(col("__t").isNotNull,
            col("__w") * col("__w") * col("__n")))).as("ess"))
  }
}
