package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 *  - [[bruteForceKnn]]: exact cosine top-k — the correctness baseline.
 *    The (small) query set is broadcast against the corpus; scoring is a
 *    map-only pass, top-k a partitioned window. Scales linearly in corpus
 *    size with no corpus shuffle.
 *  - [[lshKnn]]: random-hyperplane LSH — the 100 TB path. Corpus is
 *    bucketed by sign-signature once (can be persisted/partitioned by
 *    bucket); queries probe only their bucket, turning all-pairs into
 *    bucket-local joins. Recall/latency tunable via #planes.
 */
object Similarity {

  /** Exact cosine top-k for each query vector (norms precomputed per side). */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("nbr_id")) // no self-match
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"), col("cos"))
  }

  /**
   * Hard-negative mining for contrastive training: each query's top-k
   * most similar corpus vectors with a DIFFERENT label — the classic
   * "closest wrong answers" batch-construction step (metric learning,
   * retrieval fine-tuning, reranker training). Identical plan shape to
   * [[bruteForceKnn]] (broadcast query side, map-only cosine, per-query
   * window) with the label inequality fused into the join condition so
   * same-label pairs never materialize. For corpus-scale query sets,
   * block through [[lshSelfKnn]]-style buckets first and filter labels
   * in the candidate set.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"),
      col(labelCol).as("nbr_label"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"),
      col(labelCol).as("__qlabel"))
    val scored = c
      .join(broadcast(q),
        col("query_id") =!= col("nbr_id") &&
          !(col("__qlabel") <=> col("nbr_label"))) // negatives only
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"),
        col("nbr_label"), col("cos"))
  }

  /**
   * Deterministic pseudo-random hyperplanes: plane p, dim i weight from
   * md5("plane{p}:{i}") mapped into [-1, 1). Seedless and reproducible in
   * any engine with md5 — but computed ONCE on the driver and shipped as
   * an array literal, so the per-row work is a single codegen'd dot
   * product instead of dim× (md5 + conv) inside an interpreted lambda
   * (measured 13.5 s → sub-second on the sf0.1 bench).
   */
  private[graft] def planeWeights(p: Int, dim: Int): Array[Double] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val hex = mdig.digest(s"plane$p:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / 8388608.0 - 1.0
    }
  }

  /** Sign-signature bucket id over `planes` hyperplanes (native dots). */
  def lshBucket(vecCol: Column, planes: Int, dim: Int): Column =
    concat((0 until planes).map { p =>
      val proj = VectorFunctions.dot(vecCol.cast("array<double>"),
        lit(planeWeights(p, dim)))
      when(proj >= 0, "1").otherwise("0")
    }: _*)

  /** all bucket keys within Hamming distance 1 of the signature. */
  private def probeBuckets(bkt: Column, planes: Int): Column =
    array((bkt +: (1 to planes).map { j =>
      val flipped = when(substring(bkt, j, 1) === "1", "0").otherwise("1")
      concat(substring(bkt, 1, j - 1), flipped, substring(bkt, j + 1, planes - j))
    }): _*)

  /**
   * ANN top-k: corpus bucketed by sign signature once; queries probe
   * their own bucket plus every Hamming-1 neighbor (multi-probe), then
   * exact cosine re-rank within the probed candidates. Multi-probe
   * recovers most of the recall single-bucket LSH loses on near-boundary
   * vectors, at (planes+1)× candidate cost — still a tiny corpus slice.
   *
   * The query side is broadcast ONLY while it is provably small: a
   * bounded `limit(maxBroadcastQueries + 1).count()` probe (it stops
   * scanning at the cap — never a full pass over a large query frame)
   * decides between the broadcast build and a plain bucket-keyed
   * shuffle join. An unconditional `broadcast()` hint would force a
   * multi-probe-exploded large query set through the driver — the
   * classic misuse OOM. For the fully symmetric corpus-vs-corpus case
   * prefer [[lshSelfKnn]], which never broadcasts and caps hot buckets.
   */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      multiProbe: Boolean = true, dim: Int = 64,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"),
      lshBucket(col(vecCol), planes, dim).as("bkt"))
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"),
      lshBucket(col(vecCol), planes, dim).as("bkt"))
    val q =
      if (!multiProbe) q0
      else q0.withColumn("bkt",
        explode(probeBuckets(col("bkt"), planes)))
    val broadcastSafe = queries.select(col(idCol))
      .limit(math.min(maxBroadcastQueries + 1, Int.MaxValue.toLong).toInt)
      .count() <= maxBroadcastQueries
    val scored = c
      .join(if (broadcastSafe) broadcast(q) else q, Seq("bkt"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"), col("cos"))
  }

  /**
   * Deterministic per-bucket candidate thinning — the `maxPostings`
   * analog for ANN buckets. A row is kept iff
   * `md5hash(bucket|id) · bucketCount < maxBucket · 2^20`: buckets at
   * or under `maxBucket` keep EVERY row (the threshold exceeds the hash
   * range, so small buckets are bit-exact untouched); oversized buckets
   * keep a deterministic ~`maxBucket`-row subset. Map-only predicate
   * plus one keyed count join — no per-bucket sort/window that would
   * itself serialize the hot bucket. Engine-replayable: the same md5
   * threshold formula reproduces the subset in the DuckDB oracle.
   */
  private[graft] def thinBuckets(df: DataFrame, bktCol: String,
      idCol: String, maxBucket: Int): DataFrame = {
    val M = graft.functions.PortableHash.M
    val cnt = df.groupBy(col(bktCol)).agg(count(lit(1)).as("__bn"))
    val h = graft.functions.PortableHash.bucket(Seq(col(bktCol), col(idCol)))
    df.join(cnt, Seq(bktCol))
      .where(h.cast("double") * col("__bn").cast("double") <
        lit(maxBucket.toDouble * M))
      .drop("__bn")
  }

  /**
   * Corpus-vs-corpus self-ANN: every vector's top-k neighbors across
   * the whole corpus. Unlike [[lshKnn]] (which BROADCASTS a small query
   * set), both sides here are the full corpus, so candidates come from
   * a SHUFFLE join keyed on the LSH bucket — each bucket's pair
   * expansion is local to its partition, nothing is broadcast, and the
   * multi-probe explode bounds per-query fan-out at (planes+1) buckets.
   * The top-k re-rank window is partitioned by query id.
   *
   * `maxBucket` bounds the CANDIDATE side of a bucket ([[thinBuckets]]):
   * without it, a hot signature (a dense embedding region) makes the
   * bucket's pair count quadratic in its population — AQE skew-split
   * relocates those pairs but cannot reduce them. With the cap, a
   * query in a hot bucket ranks a deterministic ~`maxBucket`-candidate
   * subset (the recall trade, acceptable because bucket members are
   * mutually similar by construction), so per-bucket work is
   * O(pop · maxBucket) instead of O(pop²). Queries are never thinned —
   * every vector still gets k results.
   *
   * The cap is ON by default (10000): self-ANN is approximate by
   * construction and an uncapped hot bucket is quadratic, so the safe
   * default bounds work; pass `maxBucket <= 0` for exhaustive buckets.
   * NOTE this deliberately differs from [[Dedup.embeddingNearDup]],
   * whose cap defaults OFF — near-DUP detection may genuinely need
   * every pair, top-k ANN does not. Any external result-replay (e.g. an
   * oracle) must mirror the active cap's md5 threshold.
   */
  def lshSelfKnn(corpus: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      multiProbe: Boolean = true, dim: Int = 64,
      maxBucket: Int = 10000): DataFrame = {
    val c0 = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"),
      lshBucket(col(vecCol), planes, dim).as("bkt"))
    val c = if (maxBucket <= 0) c0
            else thinBuckets(c0, "bkt", "nbr_id", maxBucket)
    val q0 = corpus.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"),
      lshBucket(col(vecCol), planes, dim).as("bkt"))
    val q =
      if (!multiProbe) q0
      else q0.withColumn("bkt", explode(probeBuckets(col("bkt"), planes)))
    val scored = c
      .join(q, Seq("bkt")) // shuffle join — NOT broadcast
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"), col("cos"))
  }

  // ------------------------------------------------------------- IVF ANN

  /**
   * Deterministic Lloyd k-means for IVF cells: init = the `cells`
   * lowest-id vectors, fixed iteration count, ties in the argmin broken
   * by lowest cell index (array_position returns the first match).
   *
   * Scale design: assignment is a map-only pass (centroids broadcast as
   * literals, distance via the codegen'd SquaredL2 expression); the
   * update step aggregates per-(cell, dimension) means — the ONLY
   * driver-side state is the cells×dim centroid matrix (KiB), collected
   * once per iteration.
   *
   * `roundDp > 0` rounds every updated centroid coordinate to that many
   * decimals (HALF_UP, matching SQL `round`). Distributed fp averaging
   * is not bit-reproducible across engines, but the ROUNDED means are
   * (cross-engine avg noise ~1e-15 ≪ the grid step), so a rounded run
   * can be replayed exactly by another engine's SQL — the same trick
   * that makes the hash samplers portable, applied to iterative fp.
   */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int = 2, roundDp: Int = 0): Array[Array[Double]] = {
    val v = col(vecCol).cast("array<double>")
    def gridded(x: Double): Double =
      if (roundDp <= 0) x
      else BigDecimal(x)
        .setScale(roundDp, BigDecimal.RoundingMode.HALF_UP).toDouble
    var centroids: Array[Array[Double]] = corpus.orderBy(col(idCol))
      .limit(cells).select(v.as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val means = assignCells(corpus, vecCol, centroids)
        .select(col("__cell"), posexplode(v).as(Seq("__p", "__x")))
        .groupBy("__cell", "__p").agg(avg(col("__x")).as("__m"))
        .collect()
        .groupBy(_.getInt(0))
      centroids = centroids.indices.map { cIdx =>
        means.get(cIdx)
          .map(_.sortBy(_.getInt(1)).map(r => gridded(r.getDouble(2))).toArray)
          .getOrElse(centroids(cIdx)) // empty cell keeps its centroid
      }.toArray
    }
    centroids
  }

  /**
   * K-means cluster profile: final assignment (one map-only pass against
   * the trained centroids) aggregated to per-cell size and mean
   * nearest-centroid L2 distance — the "how balanced is my embedding
   * space" diagnostic a corpus pipeline runs before sharding by cluster.
   * Train with `roundDp > 0` when the result must replay in another
   * engine (see [[kmeansCentroids]]).
   */
  def kmeansProfile(corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int = 2, roundDp: Int = 0,
      cellThreshold: Int = defaultCellThreshold): DataFrame = {
    if (cells > cellThreshold)
      return kmeansProfileDF(corpus, idCol, vecCol, cells, iters, roundDp)
    val cents = kmeansCentroids(corpus, idCol, vecCol, cells, iters, roundDp)
    assignCells(corpus, vecCol, cents)
      .withColumn("__d", array_min(col("__dists")))
      .groupBy(col("__cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n"), avg(col("__d")).as("mean_dist"))
  }

  /**
   * Clustering-quality diagnostics for a trained centroid set: the
   * Davies–Bouldin index (lower = tighter, better-separated cells;
   * DB = mean over cells of max_j (s_i + s_j) / d_ij with s = mean
   * point-to-centroid distance) plus cell-size entropy (how balanced
   * the partition is; ln(cells) = perfectly uniform). Silhouette needs
   * O(n²) point pairs — DB needs only the per-cell scatter aggregate
   * (one distributed pass over the assignment) and the cells×cells
   * centroid-distance matrix (driver math on the small literal
   * matrix, same boundedness class as the eigensolve in [[graft.ops.Pca]]).
   * Returns one row: (n_cells, db_index, size_entropy, n).
   */
  def clusterQuality(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val perCell = assignCells(corpus, vecCol, cents)
      .withColumn("__d", array_min(col("__dists")))
      .groupBy(col("__cell"))
      .agg(count(lit(1)).as("__n"), avg(col("__d")).as("__s"))
      .collect() // ≤ cells rows — bounded by the centroid count
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val live = perCell.keys.toSeq.sorted
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val db =
      if (live.size < 2) 0.0
      else live.map { i =>
        live.filter(_ != i).map { j =>
          val dij = dist(cents(i), cents(j))
          if (dij == 0.0) Double.PositiveInfinity
          else (perCell(i)._2 + perCell(j)._2) / dij
        }.max
      }.sum / live.size
    val n = perCell.values.map(_._1).sum
    val entropy = -perCell.values.map { case (c, _) =>
      val p = c.toDouble / n
      p * math.log(p)
    }.sum
    Seq((live.size, db, entropy, n))
      .toDF("n_cells", "db_index", "size_entropy", "n")
  }

  /**
   * Deterministic pseudo-random centroids (cell c, dim i weight from
   * md5("cell{c}:{i}") in [-1, 1)) — the data-independent IVF variant.
   * Same driver-literal trick as [[planeWeights]]: an oracle can inline
   * the identical centroid arrays, making the whole IVF pipeline
   * (assignment, probe ranking, re-rank) engine-replayable, which the
   * data-dependent k-means centroids are not (distributed fp averaging
   * is not bit-reproducible across engines).
   */
  def pseudoCentroids(cells: Int, dim: Int): Array[Array[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(cells) { c =>
      Array.tabulate(dim) { i =>
        val hex = mdig.digest(s"cell$c:$i".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / 8388608.0 - 1.0
      }
    }
  }

  /**
   * Per-subspace PQ codebook: `ksub` deterministic centroids of
   * `subDim` dims for subspace `sub`, from md5("pq{sub}:{c}:{i}") in
   * [-1, 1) — [[pseudoCentroids]]' seeded sibling, so each subspace
   * gets its own codebook and an oracle inlines the identical arrays.
   */
  def pqCentroids(sub: Int, ksub: Int, subDim: Int): Array[Array[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(ksub) { c =>
      Array.tabulate(subDim) { i =>
        val hex = mdig.digest(s"pq$sub:$c:$i".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / 8388608.0 - 1.0
      }
    }
  }

  /** Squared L2 between a sliced subvector and a literal centroid —
    * plain HOF arithmetic (no sqrt), so Spark and any oracle compute
    * the IDENTICAL IEEE expression and argmin ties break the same. */
  private def sqDist(sub: Column, cent: Array[Double]): Column =
    aggregate(zip_with(sub, lit(cent), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /**
   * Product quantization encode: each `inDim` vector splits into `m`
   * contiguous subvectors of inDim/m dims; each subvector maps to its
   * nearest of `ksub` per-subspace [[pqCentroids]] (first index wins
   * ties). Output codes are m small ints — at ksub ≤ 256 that is m
   * bytes per vector vs 8·inDim for raw doubles (a 64-dim float corpus
   * compresses 64×), THE standard memory layout for billion-scale ANN
   * (Jégou et al. 2011). `recon_err` = √Σₛ‖subₛ − cent[codeₛ]‖² reports
   * per-vector quantization loss. Map-only: every distance is codegen
   * HOF arithmetic against broadcast literals — no shuffle, no fit
   * pass, deterministic in any engine.
   */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, m: Int = 4, ksub: Int = 8): DataFrame = {
    require(m > 0 && inDim % m == 0, s"m=$m must divide inDim=$inDim")
    val subDim = inDim / m
    val v = col(vecCol).cast("array<double>")
    val codeAndErr = (0 until m).map { s =>
      val sub = slice(v, s * subDim + 1, subDim)
      val cents = pqCentroids(s, ksub, subDim)
      val dists = array(cents.map(c => sqDist(sub, c)): _*)
      val code = (array_position(dists, array_min(dists)) - 1).cast("int")
      (code, element_at(dists, array_position(dists, array_min(dists))
        .cast("int")))
    }
    df.select(col(idCol),
      array(codeAndErr.map(_._1): _*).as("pq_codes"),
      sqrt(codeAndErr.map(_._2).reduce(_ + _)).as("recon_err"))
  }

  /**
   * PQ asymmetric-distance (ADC) top-k: the corpus lives as PQ codes
   * (encoded map-side here; at scale the codes are the stored index),
   * queries stay full-precision, and each candidate's approximate
   * distance is Σₛ‖q_subₛ − centₛ[codeₛ]‖² — m table lookups instead
   * of an inDim-wide dot per pair. Queries broadcast (the [[bruteForceKnn]]
   * contract: few queries against a huge corpus); ranking is
   * (approx_dist ASC, nbr_id ASC), deterministic in any engine since
   * both distance and lookup replay exactly. Returns
   * (query_id, rnk, nbr_id, approx_dist).
   */
  def pqKnn(corpus: DataFrame, queries: DataFrame, k: Int, inDim: Int,
      m: Int = 4, ksub: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && inDim % m == 0, s"m=$m must divide inDim=$inDim")
    val subDim = inDim / m
    val enc = pqEncode(corpus, idCol, vecCol, inDim, m, ksub)
      .select(col(idCol).as("nbr_id"), col("pq_codes"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv")))
    val dist = (0 until m).map { s =>
      val qsub = slice(col("__qv"), s * subDim + 1, subDim)
      val cents = pqCentroids(s, ksub, subDim)
      // centₛ[codeₛ] as a literal-table lookup: ksub-branch element_at
      // over the code — stays codegen, no join
      val table = array(cents.map(c => sqDist(qsub, c)): _*)
      element_at(table, element_at(col("pq_codes"), s + 1) + 1)
    }.reduce(_ + _)
    val scored = enc.crossJoin(q)
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("approx_dist", dist)
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dist").asc, col("nbr_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("nbr_id"), col("approx_dist"))
  }

  /** Tag each row with its nearest-centroid cell index (`__cell`). */
  def assignCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val dists = array(centroids.map(c =>
      VectorFunctions.l2Distance(v, lit(c))): _*)
    df.withColumn("__dists", dists)
      .withColumn("__cell",
        (array_position(col("__dists"), array_min(col("__dists"))) - 1)
          .cast("int"))
  }

  // --------------------------------------- DataFrame-resident k-means
  //
  // The literal-broadcast path above collects a cells×dim matrix per
  // iteration and inlines every centroid into the plan — perfect for
  // oracle replay at the documented KiB scale, quadratic plan poison at
  // SemDeDup scale (~100k cells × 1024 dims ≈ 800 MB of literals and a
  // ~10⁸-row driver collect per iteration). Above [[defaultCellThreshold]]
  // the auto entry points switch to this path: centroids stay in a
  // DataFrame, the update step stays an aggregation (never collected),
  // and assignment is a coarse→fine two-level join — a row first picks
  // its `coarseProbe` nearest COARSE quantizer cells (≤
  // [[maxCoarseCells]] literal centroids, the classic IVF coarse
  // quantizer), then compares against only the fine centroids blocked
  // under those coarse cells. Per-row distance work drops from O(cells)
  // to O(coarseProbe · cells / coarseCells); the only driver-side state
  // that scales with anything is the coarse matrix (capped).

  /** Above this cell count the auto entry points ([[kmeansProfile]],
    * [[ivfKnn]], [[graft.ops.Dedup.semanticDedup]]) switch from
    * literal-broadcast centroids to the DataFrame-resident path. */
  val defaultCellThreshold: Int = 4096

  private val maxCoarseCells = 256

  /** Coarse quantizer size for `cells` fine cells: ~√cells, capped. */
  private[graft] def coarseCellCount(cells: Int): Int =
    math.min(maxCoarseCells, math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt))

  /** DataFrame-resident centroid index: `centroids` is
    * (cell: long, centroid: array<double>); `coarse` is the small
    * literal coarse-quantizer matrix used to block assignments;
    * `coarseProbe` is how many coarse blocks a row probes (the recall /
    * cost lever of the approximate assignment). */
  final case class CentroidIndex(centroids: DataFrame,
      coarse: Array[Array[Double]], coarseProbe: Int)

  /** Lloyd k-means with DataFrame-resident centroids — the scale path.
    *
    * Init is a deterministic hash-bucket min-id pick (`xxhash64(id) %
    * cells`, lowest-id vector per bucket) unless `init` provides a
    * (cell, centroid) frame. The update step is `groupBy(cell, dim).avg`
    * re-assembled to arrays — a pure aggregation, nothing collected.
    * Assignment is the coarse→fine join of [[assignCellsDF]]; it is
    * approximate (a row only sees fine centroids inside its probed
    * coarse blocks), the standard IVF trade. `roundDp` grids updated
    * coordinates exactly like the literal path. */
  def kmeansCentroidsDF(corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int = 2, roundDp: Int = 0, coarseProbe: Int = 2,
      init: Option[DataFrame] = None): CentroidIndex = {
    require(cells >= 1, "cells must be >= 1")
    val v = col(vecCol).cast("array<double>")
    // coarse quantizer: small data-dependent k-means via the literal
    // path — bounded at maxCoarseCells so its collect stays KiB–MB
    val coarse = kmeansCentroids(corpus, idCol, vecCol,
      coarseCellCount(cells), iters = 1, roundDp = roundDp)
    var cents = init.getOrElse {
      corpus.select(
          pmod(xxhash64(col(idCol).cast("string")), lit(cells.toLong))
            .as("cell"),
          v.as("centroid"), col(idCol).cast("string").as("__id"))
        .groupBy("cell")
        .agg(min_by(col("centroid"), col("__id")).as("centroid"))
    }.persist()
    cents.count()
    val grid: Column => Column = c =>
      if (roundDp <= 0) c else transform(c, x => round(x, roundDp))
    for (_ <- 0 until iters) {
      val idx = CentroidIndex(cents, coarse, coarseProbe)
      val means = assignCellsDF(corpus, idCol, vecCol, idx)
        .where(col("__cell").isNotNull)
        .select(col("__cell").as("cell"), posexplode(v).as(Seq("__p", "__x")))
        .groupBy("cell", "__p").agg(avg(col("__x")).as("__m"))
        .groupBy("cell")
        .agg(grid(transform(
          array_sort(collect_list(struct(col("__p"), col("__m")))),
          s => s.getField("__m"))).as("__new"))
      // empty cells keep their previous centroid (literal-path semantics)
      val next = cents.select(col("cell"), col("centroid").as("__prev"))
        .join(means, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("__new"), col("__prev")).as("centroid"))
        .persist()
      next.count()
      cents.unpersist()
      cents = next
    }
    CentroidIndex(cents, coarse, coarseProbe)
  }

  /**
   * Two-level nearest-centroid assignment against a DataFrame-resident
   * index: adds `__cell` (long, nearest probed fine cell) and `__dist`
   * (its L2 distance) to `df`. Rows probe their `coarseProbe` nearest
   * NON-EMPTY coarse blocks (map-only literal distances — empty blocks
   * are excluded up front so no row's candidate list is ever dry), join
   * the fine centroids blocked under them, and take the per-row argmin
   * with a map-side-combining `min_by` (ties break to the lowest cell
   * id, matching the literal path's first-match rule). Requires unique
   * `idCol` values (the argmin groups and joins back on it). Rows whose
   * vector is NULL get a NULL `__cell`, as in the literal path.
   */
  def assignCellsDF(df: DataFrame, idCol: String, vecCol: String,
      index: CentroidIndex): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // fine centroid -> its single nearest coarse block; tiny frame
    val blocked = assignCells(index.centroids, "centroid", index.coarse)
      .select(col("__cell").as("__coarse"), col("cell").as("__fcell"),
        col("centroid").as("__fc"))
    // coarse blocks that actually hold fine centroids — bounded collect
    // (≤ maxCoarseCells ids, never scales with `cells` or data)
    val live = blocked.select("__coarse").distinct()
      .collect().map(_.getInt(0)).sorted
    val liveCents = live.map(index.coarse(_))
    val probe = math.max(1, math.min(index.coarseProbe, live.length))
    val dists = array(liveCents.map(c =>
      VectorFunctions.l2Distance(col("__v"), lit(c))): _*)
    val probed = df.select(col(idCol), v.as("__v"))
      .withColumn("__coarse", explode(transform(
        slice(array_sort(zip_with(dists, lit(live),
          (d, i) => struct(d.as("d"), i.as("i")))), 1, probe),
        s => s.getField("i"))))
    val best = probed.join(blocked, Seq("__coarse"))
      .select(col(idCol),
        struct(VectorFunctions.l2Distance(col("__v"), col("__fc")).as("d"),
          col("__fcell").as("c")).as("__dc"))
      .groupBy(col(idCol))
      .agg(min(col("__dc")).as("__best")) // struct min: (dist, cell) lexicographic
      .select(col(idCol), col("__best.c").cast("long").as("__cell"),
        col("__best.d").as("__dist"))
    df.join(best, Seq(idCol), "left")
  }

  /** [[kmeansProfile]] over a DataFrame-resident index — no driver-side
    * collect scales with the cell count. */
  def kmeansProfileDF(corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int = 2, roundDp: Int = 0,
      coarseProbe: Int = 2): DataFrame = {
    val idx = kmeansCentroidsDF(corpus, idCol, vecCol, cells, iters,
      roundDp, coarseProbe)
    assignCellsDF(corpus, idCol, vecCol, idx)
      .where(col("__cell").isNotNull)
      .groupBy(col("__cell").as("cell"))
      .agg(count(lit(1)).as("n"), avg(col("__dist")).as("mean_dist"))
  }

  /**
   * IVF ANN top-k: corpus partitioned into k-means cells once (persist /
   * write bucketed-by-cell in a real pipeline); each query probes its
   * `nProbe` nearest cells and exact-cosine re-ranks inside them. With
   * nProbe == cells this degenerates to exhaustive search (== brute
   * force), which is what the spec asserts; recall/latency trade by
   * nProbe. Candidate volume is nProbe/cells of the corpus per query.
   */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellThreshold: Int = defaultCellThreshold): DataFrame =
    if (cells > cellThreshold)
      ivfKnnDFWith(corpus, queries, k,
        kmeansCentroidsDF(corpus, idCol, vecCol, cells, iters), nProbe,
        idCol, vecCol)
    else
      ivfKnnWith(corpus, queries, k,
        kmeansCentroids(corpus, idCol, vecCol, cells, iters), nProbe,
        idCol, vecCol)

  /**
   * IVF ANN against a DataFrame-resident [[CentroidIndex]] — the
   * large-cell-count twin of [[ivfKnnWith]]. Queries rank the fine
   * centroids inside their probed coarse blocks (a join against the
   * small blocked-centroid frame, never a per-query scan of all cells)
   * and keep the `nProbe` nearest as probe targets; the corpus is
   * assigned once via [[assignCellsDF]]; candidates meet in a
   * cell-keyed SHUFFLE join (queries at this scale are not assumed
   * broadcastable — AQE may still choose broadcast when they are).
   */
  def ivfKnnDFWith(corpus: DataFrame, queries: DataFrame, k: Int,
      index: CentroidIndex, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = assignCellsDF(corpus, idCol, vecCol, index)
      .where(col("__cell").isNotNull)
      .select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("cv"),
        VectorFunctions.norm(col(vecCol)).as("cn"),
        col("__cell").as("cell"))
    val v = col(vecCol).cast("array<double>")
    val blocked = assignCells(index.centroids, "centroid", index.coarse)
      .select(col("__cell").as("__coarse"), col("cell").as("__fcell"),
        col("centroid").as("__fc"))
    val live = blocked.select("__coarse").distinct()
      .collect().map(_.getInt(0)).sorted
    val liveCents = live.map(index.coarse(_))
    val probe = math.max(1, math.min(index.coarseProbe, live.length))
    val dists = array(liveCents.map(cc =>
      VectorFunctions.l2Distance(col("qv"), lit(cc))): _*)
    val wP = Window.partitionBy("query_id")
      .orderBy(col("__d").asc, col("__fcell").asc)
    val probed = queries.select(col(idCol).as("query_id"), v.as("qv"),
        VectorFunctions.norm(col(vecCol)).as("qn"))
      .withColumn("__coarse", explode(transform(
        slice(array_sort(zip_with(dists, lit(live),
          (d, i) => struct(d.as("d"), i.as("i")))), 1, probe),
        s => s.getField("i"))))
      .join(blocked, Seq("__coarse"))
      .withColumn("__d", VectorFunctions.l2Distance(col("qv"), col("__fc")))
      .withColumn("__pr", row_number().over(wP))
      .where(col("__pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"),
        col("__fcell").as("cell"))
    val scored = c.join(probed, Seq("cell")) // shuffle join — NOT broadcast
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"), col("cos"))
  }

  /**
   * IVF ANN with int8-quantized candidate scoring — the memory-lever
   * composition of [[graft.ops.Features.quantizeEmbedding]] and
   * [[ivfKnnWith]]: cells are probed as usual, but candidates are
   * scored with an INTEGER dot product over the int8 codes (exact
   * arithmetic — engine-reproducible, ~4× less candidate bandwidth
   * than float64), the top `rerank` per query survive, and only those
   * are re-scored with the full-precision cosine. Classic
   * quantize-score-rerank: recall loss is bounded by how often the
   * true top-k falls outside the approximate top-`rerank`
   * (`rerank >> k` makes it negligible); the exact path stays
   * [[ivfKnnWith]].
   */
  /** Corpus side of an IVF join: id/vector/norm/cell (+ int8 codes when
    * `quantized`) in ONE map-only projection — no second scan, no
    * self-join to attach codes. Shared by both IVF variants. */
  private def corpusWithCells(corpus: DataFrame, cents: Array[Array[Double]],
      idCol: String, vecCol: String, quantized: Boolean): DataFrame = {
    val base = assignCells(corpus, vecCol, cents)
      .withColumn("cv", col(vecCol).cast("array<double>"))
    val cols = Seq(col(idCol).as("nbr_id"), col("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"), col("__cell").as("cell"))
    if (!quantized) base.select(cols: _*)
    else base
      .withColumn("c_scale", graft.ops.Features.quantScale(col("cv")))
      .withColumn("c_codes",
        graft.ops.Features.quantCodes(col("cv"), col("c_scale")))
      .select(cols :+ col("c_codes") :+ col("c_scale"): _*)
  }

  /** Query side: one row per (query, probed cell) — sort (distance,
    * cellIdx) structs, explode the first nProbe (+ codes when
    * `quantized`, computed per vector BEFORE the explode). */
  private def probedQueries(queries: DataFrame, cents: Array[Array[Double]],
      nProbe: Int, idCol: String, vecCol: String,
      quantized: Boolean): DataFrame = {
    val cells = cents.length
    val base0 = assignCells(queries, vecCol, cents)
      .withColumn("qv", col(vecCol).cast("array<double>"))
    val base =
      if (!quantized) base0
      else base0
        .withColumn("q_scale", graft.ops.Features.quantScale(col("qv")))
        .withColumn("q_codes",
          graft.ops.Features.quantCodes(col("qv"), col("q_scale")))
    val cols = Seq(col(idCol).as("query_id"), col("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"), col("cell")) ++
      (if (quantized) Seq(col("q_codes"), col("q_scale")) else Nil)
    base
      .withColumn("cell",
        explode(transform(
          slice(array_sort(zip_with(col("__dists"),
            sequence(lit(0), lit(cells - 1)),
            (d, i) => struct(d.as("d"), i.as("i")))), 1, nProbe),
          s => s.getField("i"))))
      .select(cols: _*)
  }

  def ivfKnnQuantizedWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[Array[Double]], nProbe: Int = 4, rerank: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, "rerank depth must be >= k")
    val c = corpusWithCells(corpus, cents, idCol, vecCol, quantized = true)
    val probed = probedQueries(queries, cents, nProbe, idCol, vecCol,
      quantized = true)
    // stage 1: integer-dot approximate score over the codes (exact
    // int arithmetic → deterministic ranking in any engine)
    val intDot = aggregate(
      zip_with(col("q_codes"), col("c_codes"),
        (a, b) => (a.cast("long") * b.cast("long"))),
      lit(0L), (acc, x) => acc + x)
    val scored = c.join(broadcast(probed), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("__idot", intDot)
      .withColumn("approx_cos",
        col("__idot").cast("double") * col("q_scale") * col("c_scale") /
          (col("qn") * col("cn")))
    // approx_cos (not raw __idot) is the stage-1 key: per-candidate
    // scales differ, so the integer dot alone mis-ranks across
    // candidates. Still deterministic: exact int dot cast once, then
    // fixed IEEE multiplications — bit-identical in any engine.
    val wA = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("nbr_id").asc)
    // stage 2: exact cosine re-rank of the surviving `rerank` candidates
    val survivors = scored
      .withColumn("__arnk", row_number().over(wA))
      .where(col("__arnk") <= rerank)
    val wE = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    survivors
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(wE))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"), col("cos"),
        col("approx_cos"))
  }

  /** Shared exact-cosine scoring tail: broadcast the probed queries
    * into their cells, score, rank per query. */
  private def scoreAndRank(c: DataFrame, probed: DataFrame,
      k: Int): DataFrame = {
    val scored = c
      .join(broadcast(probed), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nbr_id"), col("cos"))
  }

  /** IVF ANN against caller-provided centroids (k-means, pseudo-random,
    * or loaded from a trained index). */
  def ivfKnnWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[Array[Double]], nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    scoreAndRank(
      corpusWithCells(corpus, cents, idCol, vecCol, quantized = false),
      probedQueries(queries, cents, nProbe, idCol, vecCol,
        quantized = false), k)

  /**
   * Persist the IVF corpus state — cell assignments with norms and
   * vectors, plus the centroid table — so repeated query batches
   * amortize the assignment pass: the search-index-store pattern
   * ([[TextAnalysis.writeSearchIndex]], the q98 cluster store) applied
   * to ANN. Layout: `path/assignments` (cell, nbr_id, cv, cn) and
   * `path/centroids` (cell, cv).
   */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], path: String): Unit = {
    val dir = path.stripSuffix("/")
    corpusWithCells(corpus, cents, idCol, vecCol, quantized = false)
      .write.mode("overwrite").parquet(s"$dir/assignments")
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.toSeq.map { case (cv, i) => (i, cv.toSeq) }
      .toDF("cell", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /**
   * IVF ANN against a [[writeIvfIndex]] store: the query batch is
   * assigned with the STORED centroids (collected to the driver —
   * KiB, the same bounded contract as the literal-centroid path) and
   * only the probed cells of the assignment parquet are scored — the
   * cell equi-join prunes the store scan. Results are identical to
   * [[ivfKnnWith]] over the same corpus and centroids.
   */
  def ivfKnnFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dir = path.stripSuffix("/")
    // the centroid table is cells-bounded by the writer's contract;
    // the limit makes that bound structural for the collect lint and
    // the require catches a store that was never a centroid table
    val maxCells = 65536
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").limit(maxCells + 1).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("cv").toArray)
    require(cents.length <= maxCells,
      s"ivfKnnFromIndex: $dir/centroids exceeds $maxCells cells")
    scoreAndRank(spark.read.parquet(s"$dir/assignments"),
      probedQueries(queries, cents, nProbe, idCol, vecCol,
        quantized = false), k)
  }

  /**
   * Nearest-centroid (Rocchio) classification: per-label mean vectors
   * from the train split, each test vector assigned to the
   * max-cosine centroid. The distributed shape: centroid fitting is a
   * posexplode + (label, dim) aggregation (the shuffle carries
   * dims×train rows of 8-byte doubles, the standard vector-mean
   * reduction), centroids (≤labels rows) broadcast into a map-side
   * score, and the per-test argmax is a window over ≤labels candidate
   * rows. Returns (id, true_label, pred_label, cos).
   *
   * `cosRound`: rank by the cosine ROUNDED to that many decimals
   * (ties → smallest label). Distributed float sums are not
   * bit-reproducible across engines, so an exact-replay consumer (the
   * DuckDB oracle) needs ranking on a rounding grid; None ranks on the
   * raw cosine.
   */
  def nearestCentroid(train: DataFrame, test: DataFrame, idCol: String,
      vecCol: String, labelCol: String,
      cosRound: Option[Int] = None): DataFrame = {
    val cent = train
      .select(col(labelCol).as("__lbl"),
        posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("__p", "__x")))
      .groupBy(col("__lbl"), col("__p")).agg(avg(col("__x")).as("__m"))
      .groupBy(col("__lbl"))
      .agg(transform(array_sort(collect_list(struct(col("__p"),
        col("__m")))), x => x.getField("__m")).as("__cv"))
    val t = test.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("__tv"),
      col(labelCol).as("true_label"))
    val cos = graft.functions.VectorFunctions
      .cosineSimilarity(col("__tv"), col("__cv"))
    val scored = t.crossJoin(broadcast(cent))
      .withColumn("__cos", cosRound.fold(cos)(d => round(cos, d)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("__cos"), col("__lbl"))
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("id"), col("true_label"),
        col("__lbl").as("pred_label"), col("__cos").as("cos"))
  }

  /**
   * Maximal Marginal Relevance (MMR, Carbonell & Goldstein 1998)
   * greedy diverse top-k: pick argmax of
   * λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s), k times — the standard
   * redundancy-penalized selection for few-shot example picking,
   * eval-set curation, and diverse retrieval.
   *
   * Determinism: the running max-similarity column makes each round a
   * pure function of the previous state; argmax ties break on id
   * ascending. Cosines are dot/(‖a‖·‖b‖) on the RAW vectors in a fixed
   * operand order, so an external engine replaying the same arithmetic
   * selects the identical sequence.
   *
   * Scale: the candidate frame is localCheckpointed once, then each of
   * the k rounds is one map-side pass (the sole join is against the
   * 1-row broadcast winner, bounded by an explicit limit(1)) plus a
   * TakeOrdered(1) — no corpus shuffle anywhere, k·O(n/p) total work.
   * Greedy MMR is inherently sequential in k; for large k, pre-filter
   * candidates with [[bruteForceKnn]]/[[ivfKnn]] first.
   */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && k <= 256, "mmrSelect: k in [1,256]")
    require(lambda >= 0 && lambda <= 1, "mmrSelect: lambda in [0,1]")
    var cands = df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("__v"),
        col(relCol).cast("double").as("rel"))
      .withColumn("__nn", sqrt(VectorFunctions.dot(col("__v"), col("__v"))))
      .withColumn("__ms", lit(null).cast("double"))
      .localCheckpoint()
    var out: DataFrame = null
    for (round <- 1 to k) {
      val scored = cands.withColumn("mmr",
        lit(lambda) * col("rel") -
          lit(1.0 - lambda) * coalesce(col("__ms"), lit(0.0)))
      val best = scored.orderBy(desc("mmr"), asc("id")).limit(1)
        .localCheckpoint()
      val pick = best.select(lit(round).as("round"), col("id"),
        col("rel"), col("mmr"))
      out = if (out == null) pick else out.unionByName(pick)
      if (round < k) {
        val b = broadcast(best.select(col("id").as("__bid"),
          col("__v").as("__bv"), col("__nn").as("__bnn")))
        val cosB = VectorFunctions.dot(col("__v"), col("__bv")) /
          (col("__nn") * col("__bnn"))
        cands = cands.crossJoin(b)
          .where(col("id") =!= col("__bid"))
          .withColumn("__ms",
            if (round == 1) cosB else greatest(col("__ms"), cosB))
          .drop("__bid", "__bv", "__bnn")
          .localCheckpoint()
      }
    }
    out
  }

  /**
   * Pairwise cosine similarity between SEGMENT CENTROIDS of an
   * embedding column — the corpus-composition probe ("how close are
   * the wiki and web slices in embedding space?") that sits between
   * per-pair ANN and the 1-row centroid drift of
   * [[Features.embeddingDrift]]. Returns one row per unordered
   * segment pair (a < b): (seg_a, seg_b, cosine).
   *
   * Scale: one posexplode + groupBy collapses the corpus to the
   * |segments|×dims centroid frame; the pair join is keyed on
   * dimension index over that tiny frame — never corpus-sized.
   */
  def centroidSimilarity(df: DataFrame, segCol: String,
      vecCol: String): DataFrame = {
    val cent = df
      .select(col(segCol).as("__seg"),
        posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .groupBy("__seg", "__pos")
      .agg(avg(col("__x").cast("double")).as("__m"))
      .localCheckpoint()
    val l = cent.select(col("__seg").as("seg_a"), col("__pos"),
      col("__m").as("__xa"))
    val r = cent.select(col("__seg").as("seg_b"),
      col("__pos").as("__pos2"), col("__m").as("__xb"))
    l.join(r, col("__pos") === col("__pos2") &&
        col("seg_a") < col("seg_b"))
      .groupBy("seg_a", "seg_b")
      .agg(sum(col("__xa") * col("__xb")).as("__dot"),
        sum(col("__xa") * col("__xa")).as("__sa2"),
        sum(col("__xb") * col("__xb")).as("__sb2"))
      .select(col("seg_a"), col("seg_b"),
        (col("__dot") / (sqrt(col("__sa2")) * sqrt(col("__sb2"))))
          .as("cosine"))
  }

  /**
   * Internal clustering-quality indices for a labeled embedding set
   * (the label-column companion to the trained-centroid
   * [[clusterQuality]]) —
   * score a partition (k-means output, or any exogenous labeling like
   * source/language) WITHOUT ground truth:
   *   - Calinski–Harabasz (variance-ratio): (B/(k−1)) / (W/(n−k)),
   *     between- over within-cluster dispersion — higher is better;
   *   - Davies–Bouldin: mean over clusters of the worst
   *     (s_i + s_j)/‖c_i − c_j‖ ratio, s_i = √(W_i/n_i) — lower is
   *     better.
   * Both are exact and centroid-based (no pairwise point distances),
   * so they stay linear in the corpus. Returns ONE row:
   * (n, n_clusters, dims, ch_index, db_index).
   *
   * Scale shape: ONE posexplode scan collapses the corpus to a
   * (label × dim) sufficient-stats frame (count/sum/sumsq — centroids
   * AND within-scatter both read off it, no second pass); everything
   * after, including the k²-pair centroid distances, is
   * report-frame algebra. Labels are expected at report cardinality
   * (the frame is labels×dims rows).
   */
  def partitionQuality(df: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val cell = df
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("__l"),
        posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("__d", "__x")))
      .groupBy("__l", "__d")
      .agg(count(lit(1)).cast("double").as("__c"), sum("__x").as("__s"),
        sum(col("__x") * col("__x")).as("__ss"))
      .localCheckpoint() // W, B, and the pair distances all read it
    val glob = cell.groupBy("__d")
      .agg(sum(col("__s")).as("__gs"), sum(col("__c")).as("__gc"))
    val perL = cell.groupBy("__l")
      .agg(sum(col("__ss") - col("__s") * col("__s") / col("__c"))
        .as("__w"), max(col("__c")).as("__n"))
    val tot = perL.agg(sum(col("__n")).as("__nn"),
      count(lit(1)).cast("double").as("__k"), sum(col("__w")).as("__tw"))
    val btw = cell.join(glob, Seq("__d"))
      .agg(sum(col("__c") *
        (col("__s") / col("__c") - col("__gs") / col("__gc")) *
        (col("__s") / col("__c") - col("__gs") / col("__gc")))
        .as("__b"))
    val dims = cell.agg(countDistinct(col("__d")).as("__dims"))
    val pairs = cell.as("a")
      .join(cell.as("b"),
        col("a.__d") === col("b.__d") && col("a.__l") < col("b.__l"))
      .groupBy(col("a.__l").as("__i"), col("b.__l").as("__j"))
      .agg(sqrt(sum(
        (col("a.__s") / col("a.__c") - col("b.__s") / col("b.__c")) *
        (col("a.__s") / col("a.__c") - col("b.__s") / col("b.__c"))))
        .as("__m"))
    val si = perL.select(col("__l"),
      sqrt(col("__w") / col("__n")).as("__si"))
    val sym = pairs.select(col("__i"), col("__j"), col("__m"))
      .unionByName(pairs.select(col("__j").as("__i"),
        col("__i").as("__j"), col("__m")))
    val db = sym
      .join(si.withColumnRenamed("__l", "__i")
        .withColumnRenamed("__si", "__s1"), Seq("__i"))
      .join(si.withColumnRenamed("__l", "__j")
        .withColumnRenamed("__si", "__s2"), Seq("__j"))
      .groupBy("__i")
      .agg(max((col("__s1") + col("__s2")) / col("__m")).as("__r"))
      .agg(avg(col("__r")).as("__db"))
    tot.crossJoin(broadcast(btw)).crossJoin(broadcast(dims))
      .crossJoin(broadcast(db))
      .select(col("__nn").cast("long").as("n"),
        col("__k").cast("long").as("n_clusters"),
        col("__dims").as("dims"),
        ((col("__b") / (col("__k") - 1)) /
          (col("__tw") / (col("__nn") - col("__k")))).as("ch_index"),
        col("__db").as("db_index"))
  }

  /**
   * Embedding-space isotropy profile: how concentrated the corpus is
   * around its mean direction — anisotropic spaces (avg cosine to the
   * mean ≈ 1) hurt retrieval because every similarity is inflated by
   * the common component (the "all embeddings share a huge mean
   * vector" pathology; mitigation is mean-centering, and THIS is the
   * before/after readout). Returns ONE row: (n, dim, mean_vec_norm,
   * avg_vec_norm, avg_cos_to_mean, isotropy) with
   * isotropy = 1 − ‖μ‖²/avg(‖x‖²) — the share of embedding energy NOT
   * explained by the common mean (1 = centered, 0 = all mass on μ).
   *
   * Scale shape: one dims-bounded posexplode aggregation to the mean
   * vector (collected — dims doubles, the literal-centroid contract,
   * lint-bounded by the orderBy+limit), then ONE map-side pass scoring
   * codegen'd dot/norms against the literal μ, one 1-row reduce.
   */
  def isotropyProfile(df: DataFrame, vecCol: String,
      maxDims: Int = 8192): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val base = df.where(col(vecCol).isNotNull)
    val dims = base
      .select(posexplode(v).as(Seq("__i", "__v")))
      .groupBy("__i").agg(sum(col("__v")).as("__s"),
        count(lit(1)).as("__c"))
      .orderBy("__i").limit(maxDims + 1).collect()
    require(dims.nonEmpty && dims.length <= maxDims,
      s"isotropyProfile: 1..$maxDims dims expected, got ${dims.length}")
    val mu = dims.map(r =>
      r.getAs[Double]("__s") / r.getAs[Long]("__c"))
    val muLit = array(mu.map(lit(_)): _*)
    val muNorm = math.sqrt(mu.map(x => x * x).sum)
    val cos = when(VectorFunctions.norm(v) > 0 && lit(muNorm) > 0,
      VectorFunctions.dot(v, muLit) /
        (VectorFunctions.norm(v) * lit(muNorm)))
    base.agg(count(lit(1)).as("n"),
        avg(cos).as("avg_cos_to_mean"),
        avg(VectorFunctions.dot(v, v)).as("__avg_sq"),
        avg(VectorFunctions.norm(v)).as("avg_vec_norm"))
      .select(col("n"), lit(mu.length.toLong).as("dim"),
        lit(muNorm).as("mean_vec_norm"), col("avg_vec_norm"),
        col("avg_cos_to_mean"),
        when(col("__avg_sq") > 0,
          lit(1.0) - lit(muNorm * muNorm) / col("__avg_sq"))
          .as("isotropy"))
  }

  /**
   * Label-coherence panel over an embedding column: per label, the
   * average cosine of members to their OWN label centroid vs to the
   * corpus centroid — the separation readout that says whether the
   * labels carve the embedding space at all (the retrieval-eval
   * cousin of the nearest-centroid classifier, WITHOUT per-vector
   * argmax assignment: an argmax over near-tied float similarities
   * is not engine-replayable; these are pure averages, which are).
   * Returns one row per label:
   * (label, n, avg_cos_own, avg_cos_global, separation).
   *
   * Scale shape: centroids come from ONE posexplode + (label, dim)
   * groupBy (map-side combined — the shuffle carries labels×dim
   * partials, not n·dim rows); the per-vector cosines are the
   * codegen'd [[graft.functions.VectorFunctions.cosineSimilarity]]
   * against the ≤labels-sized broadcast centroid arrays.
   */
  def labelCoherence(corpus: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val e = corpus
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("__lbl"),
        col(vecCol).cast("array<double>").as("__v"))
    val pos = e.select(col("__lbl"), posexplode(col("__v"))
      .as(Seq("__i", "__x")))
    val centArr = pos.groupBy("__lbl", "__i")
      .agg(avg(col("__x")).as("__c"))
      .groupBy("__lbl")
      .agg(transform(array_sort(collect_list(struct(col("__i"),
        col("__c")))), s => s.getField("__c")).as("__cent"))
    val globArr = broadcast(pos.groupBy("__i")
      .agg(avg(col("__x")).as("__g"))
      .agg(transform(array_sort(collect_list(struct(col("__i"),
        col("__g")))), s => s.getField("__g")).as("__glob")))
    e.join(broadcast(centArr), "__lbl").crossJoin(globArr)
      .select(col("__lbl"),
        graft.functions.VectorFunctions
          .cosineSimilarity(col("__v"), col("__cent")).as("__co"),
        graft.functions.VectorFunctions
          .cosineSimilarity(col("__v"), col("__glob")).as("__cg"))
      .groupBy(col("__lbl").as("label"))
      .agg(count(lit(1)).as("n"), avg(col("__co")).as("avg_cos_own"),
        avg(col("__cg")).as("avg_cos_global"),
        avg(col("__co") - col("__cg")).as("separation"))
  }
  /**
   * Simplified (centroid) silhouette per label — "is each labeled
   * region compact and separated", the clustering-quality companion
   * to [[labelCoherence]]: for every vector, a = cosine DISTANCE
   * (1 − cos) to its OWN label centroid, b = the minimum distance to
   * any OTHER centroid, silhouette = (b − a)/max(a, b) ∈ [−1, 1].
   * The centroid form (Hruschka's simplified silhouette) replaces the
   * classic all-pairs mean distances — O(n·k) instead of O(n²), the
   * only shape that survives corpus scale — and per-label AVERAGES
   * are the emitted readout (engine-replayable; a per-point argmin
   * assignment would not be). Returns one row per label:
   * (label, n, mean_silhouette, mean_own_dist, mean_other_dist).
   *
   * Scale shape: centroids from one map-side-combined posexplode
   * groupBy (k·dim rows); the point×centroid expansion is a
   * broadcast of the ≤k-row centroid frame — n·k narrow rows, no
   * shuffle of the corpus beyond the final per-label reduce.
   */
  def simplifiedSilhouette(corpus: DataFrame, idCol: String,
      labelCol: String, vecCol: String): DataFrame = {
    val e = corpus
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
        col(vecCol).cast("array<double>").as("__v"))
    val pos = e.select(col("__lbl"), posexplode(col("__v"))
      .as(Seq("__i", "__x")))
    val cents = pos.groupBy("__lbl", "__i")
      .agg(avg(col("__x")).as("__c"))
      .groupBy(col("__lbl").as("__clbl"))
      .agg(transform(array_sort(collect_list(struct(col("__i"),
        col("__c")))), s => s.getField("__c")).as("__cent"))
    val d = lit(1.0) - graft.functions.VectorFunctions
      .cosineSimilarity(col("__v"), col("__cent"))
    val ab = e.join(broadcast(cents))
      .groupBy("__id", "__lbl")
      .agg(min(when(col("__clbl") === col("__lbl"), d)).as("__a"),
        min(when(col("__clbl") =!= col("__lbl"), d)).as("__b"))
    ab.where(col("__a").isNotNull && col("__b").isNotNull)
      .select(col("__lbl"), col("__a"), col("__b"),
        ((col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .as("__s"))
      .groupBy(col("__lbl").as("label"))
      .agg(count(lit(1)).as("n"), avg(col("__s")).as("mean_silhouette"),
        avg(col("__a")).as("mean_own_dist"),
        avg(col("__b")).as("mean_other_dist"))
  }

  /**
   * TwoNN intrinsic-dimension estimate (Facco et al. 2017) of an
   * embedding column: for each sampled point take the two nearest
   * Euclidean distances r₁ < r₂; under a locally uniform density the
   * ratio μ = r₂/r₁ is Pareto(d), so d̂ = n / Σ ln μ — "how many
   * effective dimensions does this representation actually use",
   * independent of the ambient width (the curse-of-dimensionality
   * read next to [[graft.ops.Features.cka]] and the isotropy panel).
   *
   * The estimator is SAMPLE-BASED BY DESIGN: neighbor ratios from a
   * deterministic hash sample (`vec_id % sampleMod == 0`) estimate the
   * same d as the full corpus; the exact pair pass runs only within
   * the sample, whose size is asserted ≤ `maxSample` (fail loudly, the
   * holtLinear discipline — at 100 TB you raise sampleMod, not the
   * cap). Distances are rounded to 9 decimals before ranking with a
   * neighbor-id tie-break, so the selected pair set is engine-stable.
   * Points whose nearest distance is 0 (exact duplicates) are
   * excluded. Returns 1 row: (n_sampled, n_used, sum_log_mu,
   * id_twonn).
   */
  def twoNnDimension(df: DataFrame, idCol: String, vecCol: String,
      sampleMod: Int = 5, maxSample: Int = 20000): DataFrame = {
    require(sampleMod >= 1, "twoNnDimension: sampleMod must be >= 1")
    val pts = df
      .where(col(idCol).isNotNull && col(vecCol).isNotNull &&
        pmod(col(idCol), lit(sampleMod)) === 0)
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .localCheckpoint()
    val nSampled = pts.count()
    require(nSampled <= maxSample,
      s"twoNnDimension: sample has $nSampled points (> $maxSample); " +
        "raise sampleMod — the estimator needs a sample, not the corpus")
    require(nSampled >= 3, "twoNnDimension: need >= 3 sampled points")
    val other = pts.select(col("__id").as("__id2"), col("__v").as("__v2"))
    val dists = pts.join(other, col("__id") =!= col("__id2"))
      .select(col("__id"), col("__id2"),
        round(VectorFunctions.l2Distance(col("__v"), col("__v2")), 9)
          .as("__d"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__d"), col("__id2"))
    val top2 = dists.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 2)
      .groupBy("__id")
      .agg(min(when(col("__rn") === 1, col("__d"))).as("__d1"),
        min(when(col("__rn") === 2, col("__d"))).as("__d2"))
      .where(col("__d1") > 0)
    top2.agg(count(lit(1)).as("n_used"),
        sum(log(col("__d2") / col("__d1"))).as("sum_log_mu"))
      .select(lit(nSampled).as("n_sampled"), col("n_used"),
        col("sum_log_mu"),
        when(col("sum_log_mu") > 0,
          col("n_used") / col("sum_log_mu")).as("id_twonn"))
  }

  /**
   * Local Outlier Factor (Breunig et al. 2000, k-NN row_number
   * variant) over a SMALL feature frame — density-relative outlier
   * scores for the calendar/segment-sized summaries this library's
   * anomaly reads reduce to (HBOS and MAD score global tails; LOF
   * catches points that are normal globally but isolated LOCALLY).
   * reach-dist_k(p,o) = max(kdist(o), d(p,o)), lrd = k / Σ reach,
   * LOF = Σ lrd(neighbor) / (k · lrd). Neighbor sets use distances
   * rounded to 9 decimals with an id tie-break (engine-stable,
   * deterministic — ties beyond k are cut by id, the fixed-k variant
   * of the classic definition).
   *
   * Scale shape: the input must already be a REDUCED frame (daily
   * panel, segment profile — the caller aggregates the corpus first);
   * the exact pair pass is asserted ≤ `maxPoints` and every later
   * step is a bounded window or grouped aggregate.
   */
  def lofScores(df: DataFrame, idCol: String, featureCols: Seq[String],
      k: Int = 5, maxPoints: Int = 20000): DataFrame = {
    require(featureCols.nonEmpty, "lofScores: featureCols required")
    require(k >= 1, "lofScores: k must be >= 1")
    val pts = df
      .where(col(idCol).isNotNull &&
        featureCols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol).as("__id") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__f$i") }: _*)
      .localCheckpoint()
    val n = pts.count()
    require(n <= maxPoints,
      s"lofScores: $n points (> $maxPoints) — LOF is for reduced " +
        "frames; aggregate the corpus before scoring")
    require(n > k, s"lofScores: need more than k=$k points")
    val other = pts.select(col("__id").as("__id2") +:
      featureCols.indices.map(i => col(s"__f$i").as(s"__o$i")): _*)
    val sq = featureCols.indices
      .map(i => (col(s"__f$i") - col(s"__o$i")) *
        (col(s"__f$i") - col(s"__o$i")))
      .reduce(_ + _)
    val dists = pts.join(other, col("__id") =!= col("__id2"))
      .select(col("__id"), col("__id2"), round(sqrt(sq), 9).as("__d"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__d"), col("__id2"))
    val knn = dists.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).localCheckpoint()
    val kd = knn.groupBy("__id").agg(max(col("__d")).as("kdist"))
    val reach = knn
      .join(kd.select(col("__id").as("__id2"), col("kdist").as("__kd2")),
        Seq("__id2"))
      .select(col("__id"), greatest(col("__kd2"), col("__d")).as("__re"))
    val lrd = reach.groupBy("__id")
      .agg(when(sum(col("__re")) > 0, lit(k.toDouble) / sum(col("__re")))
        .as("lrd"))
    val nbr = knn
      .join(lrd.select(col("__id").as("__id2"), col("lrd").as("__l2")),
        Seq("__id2"))
      .groupBy("__id").agg(sum(col("__l2")).as("__sl"))
    nbr.join(lrd, Seq("__id")).join(kd, Seq("__id"))
      .select(col("__id").as(idCol), col("kdist"), col("lrd"),
        when(col("lrd") > 0, col("__sl") / (lit(k.toDouble) * col("lrd")))
          .as("lof"))
  }

  /**
   * DBSCAN over a SMALL feature frame (deterministic variant): core
   * points have ≥ `minPts` OTHER points within `eps` (Euclidean,
   * rounded to 9 decimals — engine-stable); clusters are the connected
   * components of the core-core ε-graph labeled by MIN member id
   * ([[Dedup.connectedComponents]], pointer doubling); border points
   * adopt the MIN cluster label among their core neighbors (the one
   * order-dependence of classic DBSCAN, made deterministic); the rest
   * is noise. Density clustering for the calendar/segment panels the
   * library's anomaly reads reduce to — [[lofScores]] scores isolation,
   * this names the dense groups.
   *
   * Scale shape: the input must already be REDUCED (asserted ≤
   * `maxPoints`); the ε-pair pass, the component loop, and the label
   * joins are all bounded by that cap. Returns one row per point:
   * (id, role ∈ core/border/noise, cluster — NULL for noise).
   */
  def dbscan(df: DataFrame, idCol: String, featureCols: Seq[String],
      eps: Double, minPts: Int = 4, maxPoints: Int = 20000): DataFrame = {
    require(eps > 0, "dbscan: eps must be positive")
    require(minPts >= 1, "dbscan: minPts must be >= 1")
    val pts = df
      .where(col(idCol).isNotNull &&
        featureCols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol).as("__id") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__f$i") }: _*)
      .localCheckpoint()
    val n = pts.count()
    require(n <= maxPoints,
      s"dbscan: $n points (> $maxPoints) — DBSCAN here is for reduced " +
        "frames; aggregate the corpus first")
    val other = pts.select(col("__id").as("__id2") +:
      featureCols.indices.map(i => col(s"__f$i").as(s"__o$i")): _*)
    val sq = featureCols.indices
      .map(i => (col(s"__f$i") - col(s"__o$i")) *
        (col(s"__f$i") - col(s"__o$i")))
      .reduce(_ + _)
    val nbrs = pts.join(other, col("__id") =!= col("__id2"))
      .where(round(sqrt(sq), 9) <= eps)
      .select(col("__id"), col("__id2"))
      .localCheckpoint()
    val cores = nbrs.groupBy("__id").agg(count(lit(1)).as("__deg"))
      .where(col("__deg") >= minPts)
      .select(col("__id")).localCheckpoint()
    val coreEdges = nbrs
      .join(cores, Seq("__id"), "left_semi")
      .join(cores.select(col("__id").as("__id2")), Seq("__id2"),
        "left_semi")
    val comp = Dedup.connectedComponents(coreEdges, "__id", "__id2")
    val coreLabeled = cores
      .join(comp.withColumnRenamed("id", "__id"), Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("component"), col("__id")).as("cluster"))
      .localCheckpoint()
    val borders = nbrs
      .join(cores, Seq("__id"), "left_anti")
      .join(coreLabeled.select(col("__id").as("__id2"),
        col("cluster")), Seq("__id2"))
      .groupBy("__id").agg(min(col("cluster")).as("cluster"))
    val labeled = coreLabeled.select(col("__id"), lit("core").as("role"),
        col("cluster"))
      .unionByName(borders.select(col("__id"), lit("border").as("role"),
        col("cluster")))
    pts.select(col("__id"))
      .join(labeled, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("role"), lit("noise")).as("role"), col("cluster"))
  }
}
