package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/**
 * Distributed PCA for embedding columns — the whitening / compression
 * step of an embedding pipeline (decorrelate before quantization,
 * project to the top-k variance directions before ANN).
 *
 * Scale shape — one pass, tiny driver math, map-only apply:
 *  1. a single `mapPartitions` kernel folds each partition into ONE
 *    (count, sum[d], gram[d·d]) accumulator row — the same
 *    genuine-algorithmic-kernel pattern as the kendall Fenwick pass
 *    (no per-row driver traffic, no d²-per-row explode; the
 *    alternative, 4096 aggregate expressions for d=64, is codegen
 *    poison). Partials merge ON EXECUTORS in two levels — a
 *    `reduceByKey(pid % fanIn)` pass then one single-partition final
 *    merge — so exactly ONE (n, sum, gram) row ever reaches the
 *    driver regardless of input partition count. Accumulators are
 *    primitive `Array[Double]` end to end (no boxing); at d = 4096 a
 *    partial is ~134 MB, which is why a 10⁴-partition `.collect()`
 *    would OOM the driver and the executor-side merge is mandatory.
 *  2. the d×d covariance eigendecomposition runs on the DRIVER via
 *    power iteration with deflation — microseconds for embedding-sized
 *    d (64–4096), deterministic (fixed start vector, fixed iteration
 *    count, sign canonicalized so the largest-|coordinate| entry is
 *    positive).
 *  3. projection is a map-only broadcast-literal dot per component
 *    (the codegen'd [[graft.functions.VectorFunctions.dot]]).
 *
 * Returns (projected DataFrame with `pca` = k-dim array, explained
 * variance per component, components as plain Scala arrays for
 * storage/reuse). NULL or wrong-length vectors are dropped (reported
 * via the count in [[PcaModel]]).
 */
object Pca {

  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], explainedVariance: Array[Double],
      n: Long)

  /** Mergeable (count, Σv, Σvvᵀ lower triangle) accumulator. Primitive
    * arrays only — a boxed Seq[Double] at d² elements would triple the
    * footprint and shred the shuffle serializer. */
  private final class GramPartial(var n: Long, val sum: Array[Double],
      val gram: Array[Double]) extends Serializable {
    def merge(o: GramPartial): GramPartial = {
      n += o.n
      var i = 0
      while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += o.gram(i); i += 1 }
      this
    }
  }

  /** Fit on `vecCol` (array<float|double>, fixed dim `d`).
    *
    * `fanIn` bounds the level-2 merge width: level 1 emits ≤ #input
    * partitions partial rows, `reduceByKey(pid % fanIn)` folds them to
    * ≤ fanIn rows on executors, and a final 1-partition reduce leaves
    * exactly one row for the driver to collect. */
  /** One (count, Σv, Σvvᵀ lower triangle) total for `vecCol` — the
    * executor-merged Gram kernel shared by [[fit]] and
    * [[Features.cka]]. Exactly one partial row reaches the driver. */
  private[ops] def gramTotals(df: DataFrame, vecCol: String, d: Int,
      fanIn: Int = 64): (Long, Array[Double], Array[Double]) = {
    require(fanIn >= 1, "fanIn must be >= 1")
    import df.sparkSession.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull && size(col("v")) === d)
      .as[Seq[Double]]
    val level1 = vecs.rdd.mapPartitionsWithIndex { (pid, it) =>
      val sum = new Array[Double](d)
      val gram = new Array[Double](d * d)
      var n = 0L
      it.foreach { v =>
        var i = 0
        while (i < d) {
          val vi = v(i)
          sum(i) += vi
          var j = 0
          while (j <= i) { gram(i * d + j) += vi * v(j); j += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty
      else Iterator.single((pid % fanIn, new GramPartial(n, sum, gram)))
    }
    val collected = level1
      .reduceByKey(_.merge(_), math.max(1, fanIn)) // executor-side merge
      .values
      .coalesce(1)
      .mapPartitions(it => if (it.hasNext) Iterator.single(it.reduce(_.merge(_)))
                           else Iterator.empty)
      .collect() // exactly one (n, sum, gram) row crosses to the driver
    require(collected.nonEmpty, "gramTotals needs at least one valid vector")
    assert(collected.length == 1,
      s"gram driver merge expected 1 partial, got ${collected.length}")
    val total = collected(0)
    (total.n, total.sum, total.gram)
  }

  def fit(df: DataFrame, vecCol: String, d: Int, k: Int,
      iters: Int = 100, fanIn: Int = 64): PcaModel = {
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val (n, sum, gram) = gramTotals(df, vecCol, d, fanIn)
    require(n >= 2, "PCA needs at least two valid vectors")
    val mean = sum.map(_ / n)
    // covariance (sample): C_ij = (Σ v_i v_j − n·μ_i·μ_j) / (n − 1);
    // the kernel filled the lower triangle only — mirror it
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val c = (gram(i * d + j) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }

    // power iteration + deflation on the driver's d×d matrix
    def matVec(m: Array[Array[Double]], x: Array[Double]) = {
      val out = new Array[Double](d)
      var a = 0
      while (a < d) {
        var acc = 0.0; var b = 0
        while (b < d) { acc += m(a)(b) * x(b); b += 1 }
        out(a) = acc; a += 1
      }
      out
    }
    val work = cov.map(_.clone())
    val comps = new Array[Array[Double]](k)
    val evs = new Array[Double](k)
    var c = 0
    while (c < k) {
      // deterministic start: basis vector of the largest diagonal entry
      var best = 0
      var bi = 1
      while (bi < d) { if (work(bi)(bi) > work(best)(best)) best = bi; bi += 1 }
      var x = Array.tabulate(d)(ii => if (ii == best) 1.0 else 1e-4)
      var it2 = 0
      while (it2 < iters) {
        val y = matVec(work, x)
        val nrm = math.sqrt(y.map(v => v * v).sum)
        x = if (nrm == 0) x else y.map(_ / nrm)
        it2 += 1
      }
      val lambda = {
        val y = matVec(work, x)
        (x, y).zipped.map(_ * _).sum
      }
      // canonical sign: largest-|coordinate| entry positive
      val pivot = x.indices.maxBy(ii => math.abs(x(ii)))
      val sgn = if (x(pivot) < 0) -1.0 else 1.0
      comps(c) = x.map(_ * sgn)
      evs(c) = lambda
      // deflate: work -= λ x xᵀ
      var a = 0
      while (a < d) {
        var b = 0
        while (b < d) { work(a)(b) -= lambda * x(a) * x(b); b += 1 }
        a += 1
      }
      c += 1
    }
    PcaModel(mean, comps, evs, n)
  }

  /** Map-only projection: `pca[j] = (v − μ)·c_j` via the codegen'd
    * vector dot against broadcast component literals. */
  def project(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val d = model.mean.length
    val centered = VectorFunctions.vecSub(col(vecCol),
      array(model.mean.map(lit): _*))
    val proj = array(model.components.map(comp =>
      VectorFunctions.dot(centered, array(comp.map(lit): _*))): _*)
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === d)
      .withColumn("pca", proj)
  }

  /** fit + project in one call. */
  def fitProject(df: DataFrame, vecCol: String, d: Int, k: Int)
      : (DataFrame, PcaModel) = {
    val m = fit(df, vecCol, d, k)
    (project(df, vecCol, m), m)
  }

  /** PCA whitening: the projection with each component scaled to unit
    * variance (`(v−μ)·c_j / √(λ_j+ε)`) — the standard preprocessing
    * before cosine-based dedup/ANN when dominant directions would
    * otherwise swamp the metric. Map-only like [[project]]. */
  def projectWhitened(df: DataFrame, vecCol: String, model: PcaModel,
      eps: Double = 1e-9): DataFrame = {
    val d = model.mean.length
    val centered = VectorFunctions.vecSub(col(vecCol),
      array(model.mean.map(lit): _*))
    val proj = array(model.components.zip(model.explainedVariance).map {
      case (comp, ev) =>
        VectorFunctions.dot(centered, array(comp.map(lit): _*)) /
          lit(math.sqrt(math.max(ev, 0.0) + eps))
    }: _*)
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === d)
      .withColumn("pca_white", proj)
  }
}
