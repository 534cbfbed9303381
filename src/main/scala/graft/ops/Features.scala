package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Feature transformation primitives: scaling (z-score, min-max) and
 * equal-width discretization — the standard preprocessing surface for
 * training-data pipelines.
 *
 * Scale design: all statistics come from ONE aggregate pass producing a
 * 1-row frame that is broadcast-joined back — a map-only second pass, no
 * window, no driver collect, no second shuffle of the fact table.
 * Quantile binning at scale composes the same way from a 1-row
 * `percentile`/`approx_percentile` boundary aggregate.
 */
object Features {

  /**
   * Append z-score (sample stddev), min-max in [0,1], and equal-width
   * bin index in [0, bins) for `valueCol`.
   */
  def scaleColumn(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.agg(
      avg(v).as("__mu"), stddev_samp(v).as("__sd"),
      min(v).as("__lo"), max(v).as("__hi"))
    df.join(broadcast(stats))
      .withColumn("z_score", (v - col("__mu")) / col("__sd"))
      .withColumn("min_max", (v - col("__lo")) / (col("__hi") - col("__lo")))
      .withColumn("bin",
        least(floor(((v - col("__lo")) / (col("__hi") - col("__lo"))) * bins),
          lit(bins - 1L)).cast("long"))
      .drop("__mu", "__sd", "__lo", "__hi")
  }

  /**
   * Robust (median/MAD) scaling: z = (x − median) / (1.4826 · MAD),
   * MAD = median(|x − median|) — outlier-resistant standardization.
   *
   * ONE corpus-level value-count shuffle feeds BOTH percentile passes:
   * the median runs over the per-value counts, and the MAD pass
   * re-aggregates that SAME frame under |v − median| — a
   * distinct-values-sized job, not a second scan-and-shuffle of the
   * corpus (MAD genuinely depends on the median, so the passes chain,
   * but only the small frame is revisited). The scaling itself is two
   * 1-row broadcasts over a map-only pass. A zero MAD (more than half
   * the values identical) yields NULL, not a divide-by-zero.
   */
  def robustScale(df: DataFrame, valueCol: String,
      outCol: String = "robust_z"): DataFrame = {
    val v = col(valueCol).cast("double")
    val vc = df.where(v.isNotNull)
      .groupBy(v.as("__v")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // median pass + deviation-counts pass read it
    val med = graft.analysis.AnalysisPlanner.percentilesFromCounts(
      vc, Seq("__med" -> 0.5), Nil)
    val adCounts = vc.crossJoin(broadcast(med))
      .select(abs(col("__v") - col("__med")).as("__v"), col("__c"))
      .groupBy("__v").agg(sum(col("__c")).as("__c"))
    val mad = graft.analysis.AnalysisPlanner.percentilesFromCounts(
      adCounts, Seq("__mad" -> 0.5), Nil)
    df.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .withColumn(outCol,
        when(col("__mad") === 0.0, lit(null).cast("double"))
          .otherwise((v - col("__med")) / (lit(1.4826) * col("__mad"))))
      .drop("__med", "__mad")
  }

  /**
   * Winsorization: clamp `valueCol` into its [pLo, pHi] exact
   * interpolated percentile range — the outlier-capping step before
   * scaling/training. Bounds are a 1-row broadcast from the distributed
   * percentile path; the clamp itself is map-only.
   */
  def winsorize(df: DataFrame, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      outCol: String = "v_wins"): DataFrame = {
    val bounds = graft.analysis.AnalysisPlanner.exactPercentiles(
      df, valueCol, Seq("__wlo" -> pLo, "__whi" -> pHi), Nil)
    val v = col(valueCol).cast("double")
    df.join(broadcast(bounds))
      .withColumn(outCol,
        // least/greatest SKIP nulls, which would fabricate the upper
        // bound for a NULL observation — keep NULL in, NULL out
        when(v.isNull, lit(null).cast("double"))
          .otherwise(greatest(col("__wlo"), least(col("__whi"), v))))
      .drop("__wlo", "__whi")
  }

  /**
   * Symmetric linear int8 quantization of an embedding column — the 4×
   * memory/bandwidth lever for ANN at corpus scale (float32 → int8
   * codes + one float scale per vector; IVF/LSH candidate scoring then
   * runs over codes and only the re-rank touches full precision).
   * Map-only: `scale = max|x| / 127`, `code_i = clamp(round(x_i /
   * scale), ±127)`, all deterministic double arithmetic, so any engine
   * replays the codes bit-exactly. An all-zero vector quantizes to
   * zero codes with scale 0 (no division). Emits the codes, the scale,
   * and `max_abs_err` (max element-wise |x − code·scale|; max is
   * fp-order-independent, unlike a sum, which keeps it engine-exact).
   */
  /** `scale = max|x| / 127` for an `array<double>` column. THE one copy
    * of the quantization arithmetic (with [[quantCodes]]) — the ANN
    * scoring path and every oracle mirror replay exactly these
    * expressions. Pass PROJECTED columns (not inline computed arrays):
    * a computed array inside a HOF lambda re-evaluates per element. */
  private[graft] def quantScale(v: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array_max(transform(v, x => abs(x))) / 127.0

  /** int8 codes `clamp(round(x / scale), ±127)`; zero scale ⇒ zero
    * codes, no division. */
  private[graft] def quantCodes(v: org.apache.spark.sql.Column,
      scale: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(v, x =>
      when(scale === 0.0, 0.0)
        .otherwise(greatest(lit(-127.0), least(lit(127.0), round(x / scale))))
        .cast("int"))

  def quantizeEmbedding(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    // stepwise column projections: an inline computed array inside a
    // HOF lambda is re-evaluated per element (the O(n²) shingling trap)
    val v = col(vecCol).cast("array<double>")
    df.withColumn("__v", v)
      .withColumn("scale", quantScale(col("__v")))
      .withColumn("codes", quantCodes(col("__v"), col("scale")))
      .withColumn("max_abs_err",
        array_max(zip_with(col("__v"), col("codes"),
          (x, q) => abs(x - q.cast("double") * col("scale")))))
      .select(col(idCol), col("scale"), col("codes"), col("max_abs_err"))
  }

  /**
   * Matryoshka-style embedding truncation: keep the first `dim`
   * coordinates and L2-renormalize — the "cheap tier" of MRL-trained
   * embeddings (Kusupati et al. 2022), where prefixes of the vector are
   * themselves usable embeddings at a fraction of the storage and ANN
   * compute (a 64→16 truncation is a 4× index-size and dot-product
   * saving before any quantization). Map-only: slice + one sequential
   * fold for the norm + one transform, no shuffle anywhere.
   *
   * `norm_frac` reports ‖prefix‖/‖full‖ — the retained-signal measure a
   * pipeline uses to pick the cheapest acceptable tier. Zero-norm
   * prefixes renormalize to zero vectors (no division); a zero full
   * vector reports norm_frac NULL (0/0 has no meaningful fraction).
   */
  def truncateEmbedding(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, renormalize: Boolean = true): DataFrame = {
    require(dim > 0, "dim must be positive")
    val full = col(vecCol).cast("array<double>")
    def l2(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    val out = df
      .withColumn("__t", slice(full, 1, dim))
      .withColumn("__full_n", l2(full))
      .withColumn("__n", l2(col("__t")))
      .withColumn("truncated",
        if (renormalize)
          transform(col("__t"), x =>
            when(col("__n") === 0.0, 0.0).otherwise(x / col("__n")))
        else col("__t"))
      .withColumn("norm_frac",
        when(col("__full_n") === 0.0, lit(null).cast("double"))
          .otherwise(col("__n") / col("__full_n")))
    out.select(col(idCol), col("truncated"), col("norm_frac"))
  }

  /**
   * Null imputation — the fill-missing step of feature preparation.
   * Strategies per column: `"mean"`, `"median"` (exact distributed
   * percentile — no per-group buffering), `"mode"` (most frequent
   * value, ties to the smallest), or any literal constant. All fill
   * statistics are computed in ONE pass over the frame per kind
   * (a single aggregate row for means; one value-count aggregation per
   * median/mode column) and broadcast back — the scan-side fill is a
   * map-only coalesce. NULL-heavy columns at 100 TB cost exactly the
   * aggregations, never a collect of data rows.
   */
  def impute(df: DataFrame, strategies: Map[String, Any]): DataFrame = {
    require(strategies.nonEmpty, "no columns to impute")
    val meanCols = strategies.collect { case (c, "mean") => c }.toSeq
    val medianCols = strategies.collect { case (c, "median") => c }.toSeq
    val modeCols = strategies.collect { case (c, "mode") => c }.toSeq
    val constCols = strategies.filter { case (_, s) =>
      s != "mean" && s != "median" && s != "mode" }
    var out = df
    if (meanCols.nonEmpty) {
      val aggs = meanCols.map(c => avg(col(c)).as(s"__mean_$c"))
      val means = broadcast(df.agg(aggs.head, aggs.tail: _*))
      out = out.crossJoin(means)
      meanCols.foreach { c =>
        out = out.withColumn(c, coalesce(col(c), col(s"__mean_$c")))
          .drop(s"__mean_$c")
      }
    }
    medianCols.foreach { c =>
      val med = broadcast(graft.analysis.AnalysisPlanner
        .exactPercentiles(df, c, Seq(s"__med_$c" -> 0.5), Nil))
      out = out.crossJoin(med)
        .withColumn(c, coalesce(col(c),
          col(s"__med_$c").cast(df.schema(c).dataType)))
        .drop(s"__med_$c")
    }
    modeCols.foreach { c =>
      val mode = broadcast(df.where(col(c).isNotNull)
        .groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("__v").asc).limit(1)
        .select(col("__v").as(s"__mode_$c")))
      out = out.crossJoin(mode)
        .withColumn(c, coalesce(col(c), col(s"__mode_$c")))
        .drop(s"__mode_$c")
    }
    constCols.foreach { case (c, v) =>
      out = out.withColumn(c,
        coalesce(col(c), lit(v).cast(df.schema(c).dataType)))
    }
    out
  }

  /**
   * Smoothed target (mean) encoding of a categorical column — the
   * classic high-cardinality categorical→numeric feature:
   *
   *   enc(cat) = (Σ_cat y + α·ȳ_global) / (n_cat + α)
   *
   * with `leaveOneOut = true` excluding the row's OWN target from its
   * category statistics (`(Σ_cat y − y_row) / (n_cat − 1)` pre-
   * smoothing) — the standard leakage guard when the encoding feeds a
   * model trained on the same rows; singleton categories fall back to
   * the smoothed global mean. One keyed aggregation builds the
   * category table (vocabulary-sized, broadcast when small); the
   * row-side encode is a keyed join + arithmetic — no per-row state,
   * any cardinality.
   */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      alpha: Double = 10.0, leaveOneOut: Boolean = false,
      outCol: String = "target_enc"): DataFrame = {
    require(alpha >= 0, "alpha must be >= 0")
    val y = col(targetCol).cast("double")
    val global = broadcast(df.agg(avg(y).as("__gmean")))
    val cat = df.where(y.isNotNull)
      .groupBy(col(catCol))
      .agg(sum(y).as("__sum"), count(y).as("__n"))
    val joined = df.join(cat, Seq(catCol), "left").crossJoin(global)
    val enc =
      if (!leaveOneOut)
        (coalesce(col("__sum"), lit(0.0)) + lit(alpha) * col("__gmean")) /
          (coalesce(col("__n"), lit(0L)) + lit(alpha))
      else {
        val looSum = col("__sum") - coalesce(y, lit(0.0))
        val looN = col("__n") - when(y.isNotNull, 1L).otherwise(0L)
        (coalesce(looSum, lit(0.0)) + lit(alpha) * col("__gmean")) /
          (coalesce(looN, lit(0L)) + lit(alpha))
      }
    joined.withColumn(outCol, enc).drop("__sum", "__n", "__gmean")
  }

  /**
   * Embedding-centroid drift between two corpus versions — the
   * embedding-space twin of the scalar Drift analysis: has the mean of
   * the vector space shifted between snapshot A and snapshot B (an
   * encoder re-train, an upstream content shift, a silent pipeline
   * regression)?  Reports the cosine similarity and L2 distance between
   * the two per-dimension mean vectors plus the largest single-dimension
   * shift. Each mean is one `posexplode + groupBy(dim).avg` aggregation
   * re-assembled to an array (no driver-side matrix, dims stay a
   * d-row frame); the comparison is a 1-row × 1-row crossJoin of the
   * two mean rows. Suitable as a scheduled monitor: KB of state, two
   * scans, any corpus size.
   */
  def embeddingDrift(a: DataFrame, b: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    def meanVec(df: DataFrame, out: String) = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("__p", "__x")))
      .groupBy("__p").agg(avg(col("__x")).as("__m"))
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__m")))),
        s => s.getField("__m")).as(out))
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    meanVec(a, "__ma").crossJoin(meanVec(b, "__mb"))
      .select(
        (dot(col("__ma"), col("__mb")) /
          (sqrt(dot(col("__ma"), col("__ma"))) *
           sqrt(dot(col("__mb"), col("__mb"))))).as("centroid_cosine"),
        sqrt(aggregate(zip_with(col("__ma"), col("__mb"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)).as("centroid_l2"),
        array_max(zip_with(col("__ma"), col("__mb"),
          (x, y) => abs(x - y))).as("max_dim_shift"))
  }

  /**
   * Weight-of-evidence encoding + information value of a numeric
   * feature against a binary target — the credit-scoring-era feature
   * diagnostic that survived into every tabular featurestore:
   *
   *   woe(bin) = ln( (good_bin/good_total) / (bad_bin/bad_total) )
   *   IV       = Σ (good% − bad%) · woe
   *
   * Bins are equal-width over the feature's range (the histogram
   * machinery's bucket rule); `laplace` adds a smoothing count to both
   * classes in every bin so empty-class bins never produce ±∞. One
   * bounds aggregate + one (bin × class) aggregation over the scan;
   * class totals are re-aggregated from the binned frame. Returns one
   * row per bin (bucket, n_good, n_bad, woe, iv_term) — `sum(iv_term)`
   * is the feature's IV.
   */
  def woeBins(df: DataFrame, featureCol: String,
      labelCol: String, bins: Int = 10, laplace: Double = 0.5)
      : DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    require(laplace > 0, "laplace must be positive (guards empty bins)")
    val x = col(featureCol).cast("double")
    val y = col(labelCol).cast("int")
    val base = df.where(x.isNotNull && y.isNotNull)
    val bounds = base.agg(min(x).as("__lo"), max(x).as("__hi"))
    val binned = base.join(broadcast(bounds))
      .withColumn("bucket",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor(((x - col("__lo")) / (col("__hi") - col("__lo"))) * bins),
            lit(bins - 1L))))
      .groupBy("bucket")
      .agg(count(when(y === 1, 1)).as("n_good"),
        count(when(y =!= 1, 1)).as("n_bad"))
    val totals = broadcast(binned.agg(
      sum(col("n_good")).as("__tg"), sum(col("n_bad")).as("__tb"),
      count(lit(1)).as("__nb")))
    binned.crossJoin(totals)
      .withColumn("__pg",
        (col("n_good") + lit(laplace)) /
          (col("__tg") + lit(laplace) * col("__nb")))
      .withColumn("__pb",
        (col("n_bad") + lit(laplace)) /
          (col("__tb") + lit(laplace) * col("__nb")))
      .withColumn("woe", log(col("__pg") / col("__pb")))
      .withColumn("iv_term", (col("__pg") - col("__pb")) * col("woe"))
      .select(col("bucket"), col("n_good"), col("n_bad"), col("woe"),
        col("iv_term"))
  }

  /**
   * Linear-time MMD² two-sample test between two embedding sets
   * (Gretton et al. 2012 §6, the streaming estimator): rows of each
   * side are paired consecutively in deterministic id order and the
   * unbiased estimate averages
   * `h = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁)` over disjoint
   * pair blocks, with the RBF kernel `k(a,b) = exp(−‖a−b‖²/(2σ²))`.
   * MMD² ≈ 0 → same distribution; > 0 → shift. This is the
   * DISTRIBUTION-level complement of [[embeddingDrift]] (which only
   * compares means — blind to variance/shape changes MMD catches).
   *
   * O(n) kernel evaluations vs the quadratic full estimator. Pairing
   * is hash-bucketed so it DISTRIBUTES: rows land in `buckets` md5
   * buckets of their id, a bucket-PARTITIONED `row_number` over id
   * order pairs consecutive rows within each bucket, and the two sides
   * join on (bucket, pair index) — any deterministic bijection between
   * a-pairs and b-pairs is a valid linear-MMD pairing, and this one
   * needs no global window anywhere. Mismatched tails (odd bucket
   * populations, unequal side sizes) drop from the inner join.
   */
  def embeddingMmd(a: DataFrame, b: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", sigma: Double = 1.0,
      buckets: Int = 32): DataFrame = {
    require(sigma > 0, "sigma must be positive")
    require(buckets >= 1, "buckets must be >= 1")
    import org.apache.spark.sql.expressions.Window
    def prep(df: DataFrame, pfx: String) = {
      val bkt = pmod(graft.functions.PortableHash.bucket(Seq(col(idCol))),
        lit(buckets.toLong)).as("__bkt")
      val w = Window.partitionBy("__bkt").orderBy(col(idCol))
      df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"), bkt)
        .withColumn("__rn", row_number().over(w) - 1)
        .groupBy(col("__bkt"), (col("__rn") / 2).cast("long").as("__blk"))
        .agg(min(when(col("__rn") % 2 === 0, col("__v"))).as(s"${pfx}1"),
          min(when(col("__rn") % 2 === 1, col("__v"))).as(s"${pfx}2"))
    }
    def sq(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => (p - q) * (p - q)), lit(0.0), _ + _)
    def k(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      exp(-sq(x, y) / lit(2.0 * sigma * sigma))
    prep(a, "a").join(prep(b, "b"), Seq("__bkt", "__blk"))
      .where(col("a1").isNotNull && col("a2").isNotNull &&
        col("b1").isNotNull && col("b2").isNotNull)
      .select((k(col("a1"), col("a2")) + k(col("b1"), col("b2")) -
        k(col("a1"), col("b2")) - k(col("a2"), col("b1"))).as("__h"))
      .agg(avg(col("__h")).as("mmd2"), count(lit(1)).as("n_pairs"))
  }

  /**
   * Quantile (equal-frequency) bucketing: row → bucket 1..n by the
   * exact interpolated quantile boundaries. Boundaries come from the
   * distributed percentile machinery
   * ([[graft.analysis.AnalysisPlanner.exactPercentiles]] — a 1-row
   * frame) broadcast back over the scan; the bucket index is a sum of
   * strict boundary comparisons, so values tied with a boundary land in
   * the lower bucket in any engine.
   */
  def quantileBucket(df: DataFrame, valueCol: String, n: Int,
      outCol: String = "q_bucket"): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    val bounds = graft.analysis.AnalysisPlanner.exactPercentiles(
      df, valueCol, (1 until n).map(i => s"__q$i" -> i.toDouble / n), Nil)
    val v = col(valueCol).cast("double")
    val bucket = (1 until n)
      .map(i => when(v > col(s"__q$i"), 1).otherwise(0))
      .reduce(_ + _) + 1
    df.join(broadcast(bounds))
      // a NULL value belongs to no bucket (every comparison is NULL,
      // which would otherwise silently land it in bucket 1)
      .withColumn(outCol,
        when(v.isNull, lit(null).cast("long")).otherwise(bucket.cast("long")))
      .drop((1 until n).map(i => s"__q$i"): _*)
  }

  /**
   * Standard-normal inverse CDF Φ⁻¹(p) as a Column — Acklam's rational
   * approximation (|ε| < 1.15e-9, the published coefficients), pure
   * arithmetic so any engine replays it bit-for-bit (no special
   * function dependence beyond ln/sqrt). Piecewise: central rational
   * in q = p−½ on [0.02425, 0.97575], tail rationals in
   * q = √(−2 ln p) outside.
   */
  private[graft] def probitCol(p: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    def horner(cs: Seq[Double], x: org.apache.spark.sql.Column) =
      cs.tail.foldLeft(lit(cs.head))((acc, k) => acc * x + lit(k))
    val plow = 0.02425
    val qc = p - lit(0.5)
    val rc = qc * qc
    val central = horner(a, rc) * qc / (horner(b, rc) * rc + lit(1.0))
    val ql = sqrt(lit(-2.0) * log(p))
    val lower = horner(c, ql) / (horner(d, ql) * ql + lit(1.0))
    val qu = sqrt(lit(-2.0) * log(lit(1.0) - p))
    val upper = -(horner(c, qu) / (horner(d, qu) * qu + lit(1.0)))
    when(p < plow, lower).when(p > 1.0 - plow, upper).otherwise(central)
  }

  /**
   * Rank-based inverse-normal transform (Blom scores) — the
   * distribution-free normalization for heavy-tailed features (GWAS /
   * robust-model standard): z = Φ⁻¹((r̄ − c)/(n − 2c + 1)) with
   * midranks r̄ (ties share their average rank) and Blom's c = 3/8,
   * per `groupCols` group (a per-source batch-effect removal when
   * grouped). Appends `int_z`; row set unchanged.
   *
   * Scale shape: ranks come from a grouped [[PrefixSum]] over the
   * DISTINCT (group, value) frame — never a per-row window — and the
   * per-row assignment is one keyed join back on (group, value).
   */
  def inverseNormalTransform(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil, blomC: Double = 0.375): DataFrame = {
    val gs = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val vc = df.where(v.isNotNull)
      .groupBy(gs :+ v.as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint() // distinct-cells frame; totals + the prefix
    // pass's double evaluation read it — ONE corpus shuffle, not 3
    val totals =
      if (groupCols.isEmpty)
        vc.agg(sum(col("__cnt")).as("__n"))
      else vc.groupBy(gs: _*).agg(sum(col("__cnt")).as("__n"))
    val ranked0 = graft.analysis.PrefixSum
      .exclusive(vc, "__v", Seq("__cnt" -> "__ex"), groupCols = groupCols)
    val ranked =
      if (groupCols.isEmpty) ranked0.crossJoin(broadcast(totals))
      else graft.analysis.PrefixSum.joinNullSafe(ranked0, totals,
        groupCols, broadcastRight = true)
    val pr = (col("__ex") + (col("__cnt") + 1) / lit(2.0) - lit(blomC)) /
      (col("__n") - lit(2 * blomC) + lit(1.0))
    val zs = ranked
      .select(gs ++ Seq(col("__v"), probitCol(pr).as("int_z")): _*)
    graft.analysis.PrefixSum.joinNullSafe(
      df.withColumn("__v", v), zs, groupCols :+ "__v", "left")
      .drop("__v")
  }

  /**
   * Johnson–Lindenstrauss random projection: embeddings → `outDim`
   * dims via a fixed pseudo-random matrix, y_j = ⟨v, w_j⟩/√outDim —
   * the cheap, data-independent complement to [[Pca]] (no fit pass at
   * all; distances preserved within (1±ε) for outDim ≳ 8·ln n/ε²).
   * The rows w_j are [[Similarity.planeWeights]] — md5-derived driver
   * literals, so the projection is engine-replayable and an oracle can
   * inline the identical matrix (the q26 LSH pattern).
   *
   * Map-only: `outDim` codegen'd native dots per row against broadcast
   * literal arrays — no shuffle, no fit, no driver state. Returns
   * (idCol, projected[outDim]).
   */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(outDim > 0 && inDim > 0, "dims must be positive")
    val v = col(vecCol).cast("array<double>")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val proj = array((0 until outDim).map { j =>
      graft.functions.VectorFunctions.dot(v,
        lit(Similarity.planeWeights(j, inDim))) * scale
    }: _*)
    df.select(col(idCol), proj.as("projected"))
  }

  /**
   * Quantile normalization onto the pooled distribution — the
   * batch-effect removal classic (microarray lineage): every group's
   * values are remapped so all groups share one distribution, by
   * replacing each value with the POOLED corpus's quantile at that
   * value's within-group rank. Rank→quantile goes through a
   * `gridPoints`-level grid (the practical large-scale form): a row at
   * within-group midrank fraction p lands in grid cell
   * ⌈p·K⌉ and receives the pooled exact PERCENTILE_DISC value at the
   * cell's center (cell−½)/K. Appends `qn_value`; row set unchanged,
   * NULL values stay NULL.
   *
   * Scale shape: within-group midranks from the grouped [[graft.analysis.PrefixSum]]
   * over DISTINCT (group, value) rows (never a per-row window); the
   * pooled reference is a K-row frame (grid cell → disc quantile)
   * joined back by equi-key — broadcastable at any corpus size.
   */
  def quantileNormalize(df: DataFrame, valueCol: String,
      groupCols: Seq[String], gridPoints: Int = 64): DataFrame = {
    require(gridPoints >= 2, "gridPoints must be >= 2")
    require(groupCols.nonEmpty, "quantile normalization needs groups")
    import graft.analysis.{AnalysisPlanner, PrefixSum}
    val K = gridPoints
    val gs = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val vc = df.where(v.isNotNull)
      .groupBy(gs :+ v.as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint() // distinct-cells frame; totals + the prefix
    // pass (which evaluates its input twice for bucket bounds) read it
    val totals = vc.groupBy(gs: _*).agg(sum(col("__cnt")).as("__n"))
    val ranked = PrefixSum.joinNullSafe(
      PrefixSum.exclusive(vc, "__v", Seq("__cnt" -> "__ex"),
        groupCols = groupCols),
      totals, groupCols, broadcastRight = true)
    // midrank fraction, then grid cell — the ceil argument's expression
    // SHAPE is part of the cross-engine contract (identical IEEE ops)
    val cell = least(
      ceil((col("__ex") + (col("__cnt") + 1) / lit(2.0) - lit(0.5)) /
        col("__n") * lit(K.toDouble)), lit(K.toLong)).cast("long")
    val cells = ranked.select(gs ++ Seq(col("__v"),
      cell.as("__qcell")): _*)
    // pooled reference: one exact disc quantile per grid cell
    val refRow = AnalysisPlanner.exactPercentilesDisc(
      df.select(v.as("__v")), "__v",
      (1 to K).map(c => s"__r$c" -> (c - 0.5) / K), Nil)
    val refFrame = refRow.select(posexplode(
      array((1 to K).map(c => col(s"__r$c")): _*))
      .as(Seq("__p0", "qn_value")))
      .select((col("__p0") + 1).as("__qcell"), col("qn_value"))
    val mapped = PrefixSum.joinNullSafe(cells, refFrame, Seq("__qcell"),
        broadcastRight = true)
      .select(gs ++ Seq(col("__v"), col("qn_value")): _*)
    PrefixSum.joinNullSafe(df.withColumn("__v", v), mapped,
        groupCols :+ "__v", "left")
      .drop("__v")
  }

  /**
   * Sliced Wasserstein distance between two embedding SETS: both sides
   * project onto `slices` fixed md5-derived directions
   * ([[Similarity.planeWeights]] — driver literals, engine-replayable),
   * and each slice's 1-D W₁ is approximated on a `gridPoints`-point
   * quantile grid, W₁(s) ≈ (1/K)·Σᵢ |Q_a^s(qᵢ) − Q_b^s(qᵢ)| with
   * qᵢ = (i+½)/K evaluated as exact PERCENTILE_DISC. The
   * distribution-shift metric that complements [[embeddingMmd]]:
   * W₁ keeps growing with magnitude shifts the RBF kernel saturates
   * on, and the per-slice rows localize WHICH directions moved.
   * Returns one row per slice (slice, w1) plus the pooled `mean_w1`
   * repeated on each.
   *
   * Scale shape: projection is a map-only codegen'd dot per slice
   * (rows × slices frame, no shuffle); per-slice quantiles run the
   * grouped bucketed prefix-sum PERCENTILE_DISC path (group = slice —
   * distinct-value state, no buffering); the compare is a
   * `slices`-row join of two quantile frames.
   */
  def slicedWasserstein(a: DataFrame, b: DataFrame, vecCol: String,
      inDim: Int, slices: Int = 4, gridPoints: Int = 16): DataFrame = {
    require(slices > 0 && gridPoints > 0, "slices/gridPoints positive")
    import graft.analysis.{AnalysisPlanner, PrefixSum}
    def proj(df: DataFrame): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      df.select(posexplode(array((0 until slices).map { j =>
        graft.functions.VectorFunctions.dot(v,
          lit(Similarity.planeWeights(j, inDim)))
      }: _*)).as(Seq("slice", "__proj")))
    }
    val grid = (0 until gridPoints)
      .map(i => s"__g$i" -> (i + 0.5) / gridPoints)
    val qa = AnalysisPlanner.exactPercentilesDisc(proj(a), "__proj",
      grid, Seq("slice"))
    val qb = AnalysisPlanner.exactPercentilesDisc(proj(b), "__proj",
      grid.map { case (n, p) => (n + "b", p) }, Seq("slice"))
    val w1 = (0 until gridPoints)
      .map(i => abs(col(s"__g$i") - col(s"__g${i}b")))
      .reduce(_ + _) / lit(gridPoints.toDouble)
    val perSlice = PrefixSum.joinNullSafe(qa, qb, Seq("slice"))
      .select(col("slice"), w1.as("w1"))
      .localCheckpoint() // ≤ slices rows; the pooled mean re-reads it
    perSlice.crossJoin(broadcast(perSlice.agg(avg(col("w1"))
        .as("mean_w1"))))
      .select(col("slice"), col("w1"), col("mean_w1"))
  }

  /**
   * Feature hashing (the hashing trick, Weinberger et al. 2009):
   * encode categorical columns into a fixed `dims`-dimensional dense
   * vector with out[h(c,v) mod dims] += sign(c,v) — the unbounded-
   * cardinality encoder (no vocabulary fit, no dictionary shuffle, no
   * OOV problem) for model-input pipelines at corpus scale. Both the
   * index and the sign hash ride on [[graft.functions.PortableHash]]
   * (md5 — engine-replayable); the signed variant keeps collisions
   * unbiased in expectation.
   *
   * Map-only: the output array is pure column arithmetic over
   * cols×dims codegen'd terms — no shuffle, no fit pass, no driver
   * state. Hash only columns whose string rendering is identical
   * across engines (integers and strings; NOT doubles).
   */
  def hashFeatures(df: DataFrame, cols: Seq[String], dims: Int,
      outCol: String = "hashed", viaDictionary: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "hashFeatures: no columns")
    require(dims >= 2 && dims <= 1024, "hashFeatures: dims in [2,1024]")
    def hx(k: Seq[org.apache.spark.sql.Column]) =
      graft.functions.PortableHash.bucket(k) % dims
    def hs(k: Seq[org.apache.spark.sql.Column]) =
      when(graft.functions.PortableHash.bucket(k) % 2 === 0, lit(1.0))
        .otherwise(lit(-1.0))
    // Two execution shapes for the same math. Map-only (default):
    // hash ONCE per column in a prior projection — building the array
    // directly would re-evaluate every md5 once per dimension (cols ×
    // dims × 2 digests/row; Catalyst does not CSE across array
    // elements), a measured 4× on the corpus bench. Dictionary: for
    // BOUNDED-cardinality columns, md5 through the expression stack
    // (~30 µs/digest) dominates — hash each DISTINCT value once and
    // broadcast-join back (cols distinct-aggregates + broadcast
    // probes; 600k-row bench: 4.2 s → sub-second). High-cardinality
    // columns should stay on the map-only path: no shuffle, no
    // dictionary to build.
    val hashed =
      if (!viaDictionary)
        df.select(df.columns.map(col) ++ cols.flatMap { c =>
          Seq(hx(Seq(lit(c), col(c))).as(s"__hx_$c"),
            hs(Seq(lit("s"), lit(c), col(c))).as(s"__hs_$c"))
        }: _*)
      else
        cols.foldLeft(df) { (acc, c) =>
          val dict = df.select(col(c).as(s"__dv_$c")).distinct()
            .select(col(s"__dv_$c"),
              hx(Seq(lit(c), col(s"__dv_$c"))).as(s"__hx_$c"),
              hs(Seq(lit("s"), lit(c), col(s"__dv_$c"))).as(s"__hs_$c"))
          acc.join(broadcast(dict), acc(c) <=> dict(s"__dv_$c"), "left")
            .drop(s"__dv_$c")
        }
    val arr = array((0 until dims).map { j =>
      cols.map { c =>
        when(col(s"__hx_$c") === j, col(s"__hs_$c")).otherwise(lit(0.0))
      }.reduce(_ + _)
    }: _*)
    hashed.withColumn(outCol, arr)
      .drop(cols.flatMap(c => Seq(s"__hx_$c", s"__hs_$c")): _*)
  }

  /**
   * Empirical-Bayes rate shrinkage (beta-binomial, method of
   * moments): per-key success rates pulled toward the population
   * rate, with low-count keys pulled hardest — the standard CTR /
   * conversion-rate smoothing for sparse categorical features
   * (cf. [[targetEncode]], whose additive smoothing uses a FIXED
   * pseudo-count; here the prior strength K = m(1−m)/v − 1 is FIT
   * from the observed between-key variance). shrunk = (s + K·m) /
   * (n + K); degenerate fits (zero variance, boundary mean) fall
   * back to K = 0 (no shrinkage). Returns one row per key:
   * (key, n, successes, raw_rate, prior_rate, shrunk_rate).
   *
   * Scale: ONE grouped aggregation to the per-key frame
   * (localCheckpointed — the 1-row moment fit and the output both
   * derive from it), then map-side arithmetic against the broadcast
   * moments.
   */
  def empiricalBayesRate(df: DataFrame, keyCol: String,
      successCol: org.apache.spark.sql.Column): DataFrame = {
    val sY = when(successCol, 1.0).otherwise(0.0)
    val per = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).cast("double").as("__n"), sum(sY).as("__s"))
      .localCheckpoint()
    val mom = broadcast(per.select((col("__s") / col("__n")).as("__r"))
      .agg(avg(col("__r")).as("__m"), var_samp(col("__r")).as("__v")))
    per.crossJoin(mom)
      .withColumn("__k0", greatest(lit(0.0),
        when(col("__v") > 0 && col("__m") > 0 && col("__m") < 1,
          col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1)
          .otherwise(lit(0.0))))
      .select(col("key"), col("__n").cast("long").as("n"),
        col("__s").cast("long").as("successes"),
        (col("__s") / col("__n")).as("raw_rate"),
        col("__m").as("prior_rate"),
        ((col("__s") + col("__k0") * col("__m")) /
          (col("__n") + col("__k0"))).as("shrunk_rate"))
  }

  /**
   * Embedding dimension health: per-dimension mean/variance and each
   * dimension's share of the total variance — the collapsed-dimension
   * / anisotropy check for a learned embedding column (a dimension
   * with ~zero variance carries nothing; a dimension with most of the
   * variance ruins cosine geometry — both are silent quality
   * regressions in an embedding pipeline). Returns one row per
   * dimension: (dim, n, mean, variance, var_share, collapsed).
   *
   * ONE melted scan: posexplode to (dim, value), a dim-keyed groupBy
   * (dims × corpus rows, map-side combined into a dims-row frame),
   * total variance as that frame's broadcast rollup.
   */
  /**
   * Covariance spectral-mass panel of an embedding column — the
   * eigen-free dimensionality readouts: trace Σλ, squared Frobenius
   * norm Σλ², participation ratio (Σλ)²/Σλ² (how many directions
   * carry the variance), λ_max by a FIXED 12-step normalized power
   * iteration over the collected d×d covariance (bounded, loud
   * require), stable rank trace/λ_max, and λ_max/trace. Returns ONE
   * row: (d, trace, frob_sq, participation_ratio, lambda_max,
   * stable_rank, top_share).
   *
   * Scale shape: one self-join-by-id cross-moment pass (d²-cell
   * map-side-combined aggregate), one ≤d²-row collect behind a
   * require, driver-side O(d²·iters) power iteration.
   */
  def spectralMassPanel(df: DataFrame, idCol: String, vecCol: String,
      d: Int, iterations: Int = 12): DataFrame = {
    require(d >= 2 && d <= 256, s"spectralMassPanel: d 2..256, got $d")
    val spark = df.sparkSession
    import spark.implicits._
    val e = df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("__i", "__x")))
      .localCheckpoint() // both sides of the cross-moment self-join
    val cells = e.join(
        e.select(col("__id"), col("__i").as("__j"), col("__x").as("__y")),
        Seq("__id"))
      .groupBy("__i", "__j")
      .agg(avg(col("__x") * col("__y")).as("__exy"))
    val means = e.groupBy(col("__i").as("__mi"))
      .agg(avg(col("__x")).as("__mu"))
    val cov = cells
      .join(broadcast(means), col("__i") === col("__mi"))
      .drop("__mi").withColumnRenamed("__mu", "__mui")
      .join(broadcast(means), col("__j") === col("__mi"))
      .drop("__mi").withColumnRenamed("__mu", "__muj")
      .select(col("__i"), col("__j"),
        (col("__exy") - col("__mui") * col("__muj")).as("__c"))
    val rows = cov.limit(d * d + 1).collect()
    require(rows.length <= d * d,
      s"spectralMassPanel: more than $d² covariance cells — vector " +
        "column is ragged or d is wrong")
    val c = Array.fill(d, d)(0.0)
    rows.foreach(r => c(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    var x = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iterations) {
      val y = Array.tabulate(d)(j =>
        (0 until d).map(i => x(i) * c(i)(j)).sum)
      val nrm = math.sqrt(y.map(v => v * v).sum)
      x = if (nrm > 0) y.map(_ / nrm) else y
    }
    val lambdaMax = (0 until d).map(i =>
      (0 until d).map(j => x(i) * c(i)(j) * x(j)).sum).sum
    val trace = (0 until d).map(i => c(i)(i)).sum
    val frob = (0 until d).flatMap(i => (0 until d).map(j =>
      c(i)(j) * c(i)(j))).sum
    Seq((d.toLong, trace, frob, trace * trace / frob, lambdaMax,
        trace / lambdaMax, lambdaMax / trace))
      .toDF("d", "trace", "frob_sq", "participation_ratio", "lambda_max",
        "stable_rank", "top_share")
  }

  /**
   * Alignment & uniformity (Wang & Isola 2020) of L2-normalized
   * embeddings: alignment = E‖z_a − z_b‖² over POSITIVE pairs
   * (consecutive ids sharing a label — the deterministic stand-in for
   * augmentation pairs), uniformity = ln E exp(−2‖z_a − z_b‖²) over
   * deterministic background pairs (id, id + N/2). Lower is better on
   * both; a collapsed encoder aces alignment and bombs uniformity.
   * Returns ONE row: (n_pos, alignment, n_background, uniformity).
   *
   * Scale shape: id-keyed self-joins (consecutive and half-offset
   * shifts), one norm pass — no pair explosion beyond O(n).
   */
  def alignmentUniformity(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val e = df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("__l"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
      .where(col("__n") > 0)
      .localCheckpoint() // read by both pairings + the count
    val nTot = broadcast(e.agg(count(lit(1)).as("__cnt")))
    val b = e.select(col("__id").as("__id2"), col("__l").as("__l2"),
      col("__v").as("__v2"), col("__n").as("__n2"))
    val d2 = lit(2.0) - lit(2.0) * dot(col("__v"), col("__v2")) /
      (col("__n") * col("__n2"))
    val pos = e.join(b, col("__id2") === col("__id") + 1 &&
        col("__l2") === col("__l"))
      .agg(count(lit(1)).as("n_pos"), avg(d2).as("alignment"))
    val bg = e.crossJoin(nTot)
      .join(b, col("__id2") === col("__id") + (col("__cnt") / 2)
        .cast("long"))
      .agg(count(lit(1)).as("n_background"),
        log(avg(exp(lit(-2.0) * d2))).as("uniformity"))
    pos.crossJoin(bg)
  }

  /**
   * Hubness panel (Radovanović et al.): the k-occurrence distribution
   * over a deterministic bounded sample (the `cap` smallest ids) —
   * how often each point shows up in others' cosine k-NN lists. High
   * skewness means hub points dominate retrieval; the anti-hub
   * fraction never gets retrieved at all. Returns ONE row: (n_sample,
   * k, skew_kocc, max_kocc, frac_antihub).
   *
   * Scale shape: the sample is a GlobalLimit (bounded by construction
   * at any corpus size); the ≤cap² conditioned pair join and the
   * per-point top-k window both run on that bounded frame.
   */
  def hubnessPanel(df: DataFrame, idCol: String, vecCol: String,
      cap: Int = 512, k: Int = 5): DataFrame = {
    require(cap >= 8 && cap <= 2048, s"hubnessPanel: cap 8..2048")
    require(k >= 1 && k < cap, "hubnessPanel: 1 <= k < cap")
    import org.apache.spark.sql.expressions.Window
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val s = df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .orderBy("__id").limit(cap)
      .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
      .where(col("__n") > 0)
      .localCheckpoint() // both join sides + the zero-count frame
    val b = s.select(col("__id").as("__id2"), col("__v").as("__v2"),
      col("__n").as("__n2"))
    val sims = s.join(b, col("__id") =!= col("__id2"))
      .select(col("__id"), col("__id2"),
        (dot(col("__v"), col("__v2")) / (col("__n") * col("__n2")))
          .as("__sim"))
    val topk = sims
      .withColumn("__r", row_number().over(Window.partitionBy("__id")
        .orderBy(col("__sim").desc, col("__id2").asc)))
      .where(col("__r") <= k)
    val kocc = s.select(col("__id").as("__id2"))
      .join(topk.groupBy("__id2").agg(count(lit(1)).as("__k")),
        Seq("__id2"), "left")
      .na.fill(0L, Seq("__k"))
    kocc.agg(count(lit(1)).as("n_sample"),
        avg(col("__k")).as("__m"),
        avg(col("__k") * col("__k")).as("__m2"),
        avg(col("__k") * col("__k") * col("__k")).as("__m3"),
        max(col("__k")).as("max_kocc"),
        avg(when(col("__k") === 0, 1.0).otherwise(0.0))
          .as("frac_antihub"))
      .select(col("n_sample"), lit(k).as("k"),
        ((col("__m3") - lit(3.0) * col("__m") * col("__m2") +
          lit(2.0) * col("__m") * col("__m") * col("__m")) /
          pow(col("__m2") - col("__m") * col("__m"), lit(1.5)))
          .as("skew_kocc"),
        col("max_kocc"), col("frac_antihub"))
  }

  /**
   * Linear Centered Kernel Alignment (CKA) between the first `p` and
   * the remaining `d − p` coordinates of one embedding column — "how
   * much linear structure do the two views share", the
   * representation-similarity readout used to compare embedding
   * versions, layers, or a full vector against its truncated/Matryoshka
   * half (Kornblith et al., "Similarity of Neural Network
   * Representations Revisited", ICML 2019). Linear CKA =
   * ‖Yᶜ'Xᶜ‖²_F / (‖Xᶜ'Xᶜ‖_F · ‖Yᶜ'Yᶜ‖_F) with column-centered X, Y —
   * every factor-of-n cancels, so it is computed from raw centered
   * cross-product sums.
   *
   * Scale shape: the whole corpus folds through [[Pca.gramTotals]] —
   * the executor-merged (n, Σv, Σvvᵀ) kernel; exactly ONE d²-sized
   * partial reaches the driver, where the block norms are d²
   * flops. No explode, no join, no per-row driver traffic.
   * Returns 1 row: (n_vecs, p_dims, q_dims, cross_norm, x_norm,
   * y_norm, cka).
   */
  def cka(df: DataFrame, vecCol: String, d: Int, p: Int,
      fanIn: Int = 64): DataFrame = {
    require(d >= 2 && p >= 1 && p < d, "cka: need 1 <= p < d")
    val spark = df.sparkSession
    import spark.implicits._
    val (n, sum, gram) = Pca.gramTotals(df, vecCol, d, fanIn)
    require(n >= 2, "cka: need at least two valid vectors")
    val mean = sum.map(_ / n)
    // centered cross-product: Σ x_i x_j − n·μ_i·μ_j (lower triangle
    // stored; mirror on read)
    def cc(i: Int, j: Int): Double = {
      val (a, b) = if (i >= j) (i, j) else (j, i)
      gram(a * d + b) - n * mean(a) * mean(b)
    }
    var sxx2 = 0.0
    var syy2 = 0.0
    var sxy2 = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        val c = cc(i, j)
        if (i < p && j < p) sxx2 += c * c
        else if (i >= p && j >= p) syy2 += c * c
        else if (i < p && j >= p) sxy2 += c * c
        j += 1
      }
      i += 1
    }
    val ckaVal = if (sxx2 > 0 && syy2 > 0)
      Some(sxy2 / (math.sqrt(sxx2) * math.sqrt(syy2))) else None
    Seq((n, p, d - p, math.sqrt(sxy2), math.sqrt(sxx2), math.sqrt(syy2),
        ckaVal))
      .toDF("n_vecs", "p_dims", "q_dims", "cross_norm", "x_norm",
        "y_norm", "cka")
  }

  /**
   * Linear class separability of an embedding along the two classes'
   * mean-difference direction — the cheapest "are these labels
   * linearly told apart in this representation" probe (the LDA
   * direction under equal spherical covariance): project every vector
   * onto w = μ₁ − μ₀ and report d′ = (m₁ − m₀)/s_pooled plus the
   * rank-based AUC of the projection (Mann–Whitney midranks — exact,
   * pair-free). Complements [[cka]]/[[graft.ops.Similarity
   * .twoNnDimension]] on the embedding-health panel.
   *
   * Scale shape: class means are ONE posexplode groupBy (2·d rows,
   * collected bounded with a require); the projection is a map-only
   * codegen'd dot against a literal direction; AUC uses the midrank
   * value-count machinery — no pair join anywhere. Returns 1 row:
   * (n0, n1, mean_proj_0, mean_proj_1, sd_pooled, d_prime, auc).
   */
  def classSeparability(df: DataFrame, vecCol: String, labelCol: String,
      label0: Int, label1: Int, d: Int): DataFrame = {
    require(d >= 1 && d <= 8192, "classSeparability: d in 1..8192")
    val base = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) === d &&
        col(labelCol).isin(label0, label1))
      .select((col(labelCol) === label1).as("__y"),
        col(vecCol).cast("array<double>").as("__v"))
      .localCheckpoint()
    val means = base
      .select(col("__y"), posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy("__y", "__i").agg(avg(col("__x")).as("__m"))
      .limit(2 * d + 1).collect()
    require(means.length <= 2 * d, "classSeparability: mean frame overflow")
    val m0 = new Array[Double](d)
    val m1 = new Array[Double](d)
    means.foreach { r =>
      val arr = if (r.getBoolean(0)) m1 else m0
      arr(r.getInt(1)) = r.getDouble(2)
    }
    // direction components rounded to 9 decimals (HALF_UP — the SQL
    // round() convention) so both engines project with identical w
    val w = (0 until d).map(i => BigDecimal(m1(i) - m0(i))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
    val wLit = array(w.map(lit(_)): _*)
    val proj = base.select(col("__y"),
      round(graft.functions.VectorFunctions.dot(col("__v"), wLit), 9)
        .as("__p")).localCheckpoint()
    val st = proj.groupBy("__y")
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__p")).as("__m"),
        sum(col("__p") * col("__p")).as("__s2"))
    // midranks over the pooled projection (value-count + prefix)
    val vc = proj.groupBy(col("__p").as("__pv"))
      .agg(count(lit(1)).cast("double").as("__c"),
        sum(when(col("__y"), 1.0).otherwise(0.0)).as("__c1"))
    val mr = graft.analysis.PrefixSum.exclusive(vc, "__pv",
        Seq("__c" -> "__ex"))
      .select(col("__pv"), col("__c1"),
        (col("__ex") + (col("__c") + 1) / 2.0).as("__r"))
    val r1 = mr.agg(sum(col("__c1") * col("__r")).as("__r1"))
    val wide = st.groupBy()
      .agg(max(when(!col("__y"), col("__n"))).as("__n0"),
        max(when(col("__y"), col("__n"))).as("__n1"),
        max(when(!col("__y"), col("__m"))).as("__m0"),
        max(when(col("__y"), col("__m"))).as("__m1"),
        max(when(!col("__y"), col("__s2"))).as("__s20"),
        max(when(col("__y"), col("__s2"))).as("__s21"))
    val v0 = (col("__s20") - col("__n0") * col("__m0") * col("__m0")) /
      (col("__n0") - 1)
    val v1 = (col("__s21") - col("__n1") * col("__m1") * col("__m1")) /
      (col("__n1") - 1)
    val sp = sqrt((v0 + v1) / 2)
    wide.crossJoin(broadcast(r1))
      .select(col("__n0").cast("long").as("n0"),
        col("__n1").cast("long").as("n1"),
        col("__m0").as("mean_proj_0"), col("__m1").as("mean_proj_1"),
        sp.as("sd_pooled"),
        when(sp > 0, (col("__m1") - col("__m0")) / sp).as("d_prime"),
        ((col("__r1") - col("__n1") * (col("__n1") + 1) / 2) /
          (col("__n0") * col("__n1"))).as("auc"))
  }

  def embeddingDimensionHealth(df: DataFrame, vecCol: String,
      collapseEps: Double = 1e-6): DataFrame = {
    val per = df.where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        avg(col("__x").cast("double")).as("mean"),
        var_samp(col("__x").cast("double")).as("variance"))
      .localCheckpoint() // total rollup + the share projection
    val tot = broadcast(per.agg(sum(col("variance")).as("__tv")))
    per.join(tot)
      .select(col("dim"), col("n"), col("mean"), col("variance"),
        (col("variance") / col("__tv")).as("var_share"),
        (col("variance") < collapseEps).as("collapsed"))
  }

  /**
   * 2-D geometric median by `iters` Weiszfeld steps from the
   * componentwise mean: the rotation-invariant robust center a
   * componentwise median is not (it minimizes Σ‖p − m‖, not the sum
   * of coordinate deviations) — the right "typical point" for an
   * embedding plane or any paired-metric cloud with outliers.
   * Distances are floored at 1e-9 so a step landing exactly on a
   * data point cannot divide by zero (both engines mirror the
   * floor).
   *
   * Scale shape: `iters` chained (1-row broadcast × corpus)
   * aggregations — each step is one map-side-combined reduce; no
   * collect, no window. Returns 1 row: (n, mean_x, mean_y, gm_x,
   * gm_y, shift).
   */
  def geometricMedian2d(df: DataFrame, xCol: String, yCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"geometricMedian2d: iters in [1, 20], got $iters")
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .localCheckpoint()
    val init = base.agg(count(lit(1)).as("__n"),
      avg(col("__x")).as("__gx"), avg(col("__y")).as("__gy"),
      avg(col("__x")).as("__mx"), avg(col("__y")).as("__my"))
    val fin = (1 to iters).foldLeft(init) { (m, _) =>
      val w = lit(1.0) / greatest(
        sqrt((col("__x") - col("__gx")) * (col("__x") - col("__gx")) +
          (col("__y") - col("__gy")) * (col("__y") - col("__gy"))),
        lit(1e-9))
      base.crossJoin(broadcast(m))
        .agg(max(col("__n")).as("__n"),
          (sum(col("__x") * w) / sum(w)).as("__gx"),
          (sum(col("__y") * w) / sum(w)).as("__gy"),
          max(col("__mx")).as("__mx"), max(col("__my")).as("__my"))
    }
    fin.select(col("__n").as("n"), col("__mx").as("mean_x"),
      col("__my").as("mean_y"), col("__gx").as("gm_x"),
      col("__gy").as("gm_y"),
      sqrt((col("__gx") - col("__mx")) * (col("__gx") - col("__mx")) +
        (col("__gy") - col("__my")) * (col("__gy") - col("__my")))
        .as("shift"))
  }
}
