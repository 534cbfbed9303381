package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge frames. Connected components (the dedup
 * clustering workhorse) lives in [[Dedup.dedupClusters]]; this object
 * adds rank propagation — entity-importance scoring over interaction
 * graphs (customer↔supplier, doc↔doc citation, user↔item), a standard
 * feature-engineering signal.
 *
 * Scale design: every iteration is two keyed shuffles (contribution
 * groupBy(dst) + the node left-join) over edge/node frames — the
 * textbook Pregel-as-joins shape with no driver-side state beyond
 * 1-row broadcast aggregates. Lineage is truncated with
 * localCheckpoint every few iterations so long runs don't grow the
 * plan unboundedly.
 */
object Graph {

  /**
   * PageRank with damping and full dangling-mass redistribution:
   * r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/deg(u) + dangling/N), a fixed
   * `iterations`-step power iteration from the uniform vector (fixed
   * step count keeps the result a deterministic function of the edge
   * set — no float-tolerance convergence test). Multi-edges collapse
   * to simple edges first. Returns (node, rank); Σ rank = 1 up to
   * float rounding at every step.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    // materialize the loop-invariant frames ONCE — without this every
    // iteration re-executes the caller's edge pipeline (often a join)
    // three times over; localCheckpoint keeps them distributed on
    // executor-local storage, nothing through the driver
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("__deg"))
      .localCheckpoint()
    val eDeg = e.join(deg, Seq("src")).localCheckpoint()
    // the dangling-node SET is loop-invariant — only its rank mass
    // changes per iteration, so resolve the anti-join once
    val dangling = nodes
      .join(deg, nodes("node") === deg("src"), "left_anti")
      .localCheckpoint()
    val nRow = broadcast(nodes.agg(count(lit(1)).cast("double").as("__nn")))
    var ranks = nodes.crossJoin(nRow)
      .select(col("node"), (lit(1.0) / col("__nn")).as("rank"))
    for (i <- 1 to iterations) {
      val contrib = ranks.join(eDeg, ranks("node") === eDeg("src"))
        .groupBy(col("dst").as("__n2"))
        .agg(sum(col("rank") / col("__deg")).as("__c"))
      val dang = broadcast(
        ranks.join(dangling, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang")))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("__n2"), "left")
        .na.fill(0.0, Seq("__c"))
        .crossJoin(nRow).crossJoin(dang)
        .select(col("node"),
          (lit(1.0 - damping) / col("__nn") +
            lit(damping) * (col("__c") + col("__dang") / col("__nn")))
            .as("rank"))
      // truncate lineage so long runs keep a bounded plan; values are
      // unchanged (localCheckpoint just materializes the frame)
      if (i % 5 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /**
   * Per-node triangle counts and local clustering coefficient over an
   * undirected graph given as a (possibly directed, possibly repeated)
   * edge list. Edges with multiplicity below `minCount` are dropped
   * first — the standard sparsifier for co-occurrence graphs, where
   * weight-1 edges are noise. Self-loops are ignored; multi-edges
   * collapse to one.
   *
   * Algorithm: degree-ordered node-iterator. Each surviving edge is
   * oriented from its lower-(degree, id) endpoint to the higher one,
   * wedges are pairs of out-neighbors of a common center, and a wedge
   * closes into a triangle iff its far pair is itself an edge (one
   * semi-join probe against the canonical edge set). Degree
   * orientation bounds every node's out-degree by O(√|E|), so the
   * wedge fan-out is O(|E|^1.5) worst-case — the provably-optimal
   * join shape — and no hub node explodes the plan. Each triangle is
   * produced exactly once, then exploded to its three corners for the
   * per-node count. Everything is keyed joins + aggregations; the
   * only broadcast is the (node, degree) frame when small.
   */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String,
      minCount: Long = 1): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .groupBy("u", "v").agg(count(lit(1)).as("__w"))
      .where(col("__w") >= minCount)
      .select("u", "v")
      .localCheckpoint()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient low→high by (degree, id): lexicographic on the pair makes
    // the orientation total and deterministic even under degree ties
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("lo"),
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("v"))
        .otherwise(col("u")).as("hi"))
      .localCheckpoint()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"),
        col("e2.hi").as("c"))
    // wedge closes iff {b, c} is an edge; probe in canonical id order
    val tri = wedges.join(canon,
      least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"), "left_semi")
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .select(col("node"), col("deg").as("degree"), col("triangles"),
        when(col("deg") >= 2,
          lit(2.0) * col("triangles") / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }

  /**
   * Community detection by synchronous label propagation (Raghavan et
   * al. 2007), made fully deterministic: every node starts labeled
   * with its own id; each of the fixed `iterations` rounds relabels
   * every node with its neighbors' most frequent label, ties broken by
   * the smallest label (count DESC, label ASC) — no randomized update
   * order, so the result is a pure function of the edge set. Directed
   * input is symmetrized; self-loops and multi-edges collapse.
   * Returns (node, label): nodes sharing a label are one community.
   *
   * Scale shape: per round, one keyed join (edges ⋈ labels on the
   * neighbor id), one (node, label) count aggregation, and one
   * per-node window over that node's DISTINCT neighbor labels —
   * bounded by degree, never a global or single-partition window. The
   * symmetrized edge frame is loop-invariant and localCheckpointed
   * once; labels are checkpointed per round (they feed the next
   * iteration — same lineage-truncation discipline as [[pageRank]]).
   */
  /**
   * Deterministic negative-edge sampling for link-prediction training
   * data: candidate NON-edges drawn by hashing nodes into `buckets`
   * and pairing within a bucket (u < v), minus the real edge set
   * (both orientations canonicalized), thinned by the portable
   * hash-threshold `keepRate`. Every step replays identically in any
   * engine with md5 — the negatives a model trains on are a pure
   * function of the edge set, not of partitioning or RNG state.
   *
   * Scale: per-bucket pairing is O((n/B)²) per bucket — choose
   * `buckets` ≈ n/√(target pairs per bucket) so no bucket explodes;
   * the anti-join against edges is one keyed join. The sampler is
   * intentionally NOT uniform over all non-edges (within-bucket only)
   * — standard practice, since uniform negatives need the full n²
   * space the bucketing exists to avoid.
   */
  def negativeEdges(edges: DataFrame, srcCol: String, dstCol: String,
      buckets: Int = 32, keepRate: Double = 1.0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(keepRate > 0 && keepRate <= 1.0, "keepRate in (0, 1]")
    val M = graft.functions.PortableHash.M
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val nodes = canon.select(col("u").as("n"))
      .unionByName(canon.select(col("v").as("n"))).distinct()
      .withColumn("__b",
        graft.functions.PortableHash.bucket(Seq(col("n"))) % buckets)
      .localCheckpoint() // read twice by the self-pairing below
    val pairs = nodes.as("a")
      .join(nodes.as("b"),
        col("a.__b") === col("b.__b") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"))
    val thinned =
      if (keepRate >= 1.0) pairs
      else pairs.where(
        graft.functions.PortableHash.bucket(Seq(col("u"), col("v"))) <
          (keepRate * M).toLong)
    thinned.join(canon, Seq("u", "v"), "left_anti")
  }

  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().localCheckpoint()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    val byVote = Window.partitionBy("node")
      .orderBy(desc("__c"), asc("label"))
    for (i <- 1 to iterations) {
      labels = und
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(byVote))
        .where(col("__rn") === 1)
        .select(col("node"), col("label"))
      if (i < iterations) labels = labels.localCheckpoint()
    }
    labels
  }
}
