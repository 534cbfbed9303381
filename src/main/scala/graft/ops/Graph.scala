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
      // unchanged (localCheckpoint just materializes the frame).
      // Cadence measured, not assumed (r14 A/B on q158, min-of-3 ×2
      // alternating): every-iteration checkpointing is a WASH vs every
      // 5th (3.14/3.74 s vs 3.36/3.60 s) — the double reference to
      // ranks per round (contrib + dangling) is already deduplicated
      // by ReusedExchange within the single action, so extra
      // materializations buy nothing at low iteration counts; keep the
      // sparse cadence that bounds plan depth for long runs
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
   * Deterministic negative-edge sampling for link-prediction training
   * data: candidate NON-edges drawn by hashing nodes into data-sized
   * buckets and pairing within a bucket (u < v), minus the real edge
   * set (both orientations canonicalized). Every step replays
   * identically in any engine with md5 — the negatives a model trains
   * on are a pure function of the edge set, not of partitioning or
   * RNG state.
   *
   * Scale: the sampling rate is folded into the candidate GENERATION,
   * not applied as a post-hoc filter — the bucket count is derived
   * from the node count as B = ⌈N/(perNode+1)⌉, so each bucket holds
   * ~perNode+1 nodes and within-bucket enumeration emits ~perNode
   * candidates per node TOTAL (O(N·perNode) work, output-sized; never
   * an enumerate-then-thin stage that hashes 50× the pairs it keeps).
   * The node count rides as a 1-row broadcast — no driver collect —
   * and the anti-join against edges is one keyed join. The sampler is
   * intentionally NOT uniform over all non-edges (within-bucket only)
   * — standard practice, since uniform negatives need the full n²
   * space the bucketing exists to avoid.
   */
  def negativeEdges(edges: DataFrame, srcCol: String, dstCol: String,
      perNode: Int = 5): DataFrame = {
    require(perNode > 0, "perNode must be positive")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint() // feeds the node set AND the final anti-join
    // node set materialized ONCE; the count and the bucketed frame both
    // derive from the checkpoint (no second distinct pass over canon)
    val nodes0 = canon.select(col("u").as("n"))
      .unionByName(canon.select(col("v").as("n"))).distinct()
      .localCheckpoint()
    val nRow = broadcast(nodes0.agg(count(lit(1)).as("__nn")))
    val nodes = nodes0.crossJoin(nRow)
      .withColumn("__b",
        pmod(graft.functions.PortableHash.bucket(Seq(col("n"))),
          greatest(lit(1L),
            ceil(col("__nn") / lit(perNode + 1.0)).cast("long"))))
      .select("n", "__b")
    val pairs = nodes.as("a")
      .join(nodes.as("b"),
        col("a.__b") === col("b.__b") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"))
    pairs.join(canon, Seq("u", "v"), "left_anti")
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
   * neighbor id), one (node, label) count aggregation, and the
   * plurality vote as `min_by(label, (−count, label))` folded into a
   * second partial-aggregatable groupBy — no per-node sort window at
   * all, so a hub node's vote never serializes on one task regardless
   * of its distinct-neighbor-label count. The symmetrized edge frame
   * is loop-invariant and localCheckpointed once; labels are
   * checkpointed per round (they feed the next iteration — same
   * lineage-truncation discipline as [[pageRank]]).
   */
  /**
   * k-core peeling: repeatedly delete nodes of degree < k (with their
   * edges) for a FIXED `rounds` iterations — deterministic unrolling,
   * so any engine replays it step for step; when the peel reaches its
   * fixpoint within `rounds` (it usually does — each round removes a
   * shrinking frontier) the result IS the k-core, the standard dense
   * backbone / influential-substructure extraction. Directed input is
   * symmetrized; self-loops and multi-edges collapse. Returns the
   * surviving nodes with their within-subgraph degree.
   *
   * Scale shape: per round one degree aggregation + two semi-joins on
   * the shrinking edge frame, localCheckpointed (the next round and
   * the final degree count re-read it — same lineage discipline as
   * [[pageRank]]). Never materializes anything driver-side.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    // Alternating-key peel (r14): the symmetrized edge list holds BOTH
    // orientations of every edge, so a node's degree is identical
    // grouped by either endpoint. Each round therefore (1) computes
    // degrees on the key the frame is ALREADY partitioned by (no
    // exchange — localCheckpoint preserves LogicalRDD partitioning),
    // (2) semi-joins the survivor set on that same key (no exchange on
    // the edge side), and (3) pays the round's ONE full-edge shuffle
    // on the opposite endpoint — which leaves the frame partitioned on
    // that endpoint for the next round. 3 full-edge shuffles per round
    // → 1, same peel semantics, bit-identical survivors.
    var und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().repartition(col("a")).localCheckpoint()
    var key = "a"
    for (_ <- 1 to rounds) {
      val other = if (key == "a") "b" else "a"
      val keep = und.groupBy(key).agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k).select(key)
        .localCheckpoint() // probed by BOTH endpoint semi-joins
      und = und
        .join(keep, Seq(key), "left_semi")
        .join(keep.withColumnRenamed(key, other), Seq(other), "left_semi")
        .localCheckpoint()
      key = other
    }
    und.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /**
   * Degree assortativity: the Pearson correlation of (deg(u), deg(v))
   * over all directed realizations of the symmetrized edge set —
   * Newman's r, the one-number answer to "do hubs attach to hubs?"
   * (social graphs: r > 0; bipartite interaction graphs like
   * customer↔supplier: r < 0 by construction). Returns one row
   * (assortativity, n_edges, n_nodes).
   *
   * One degree aggregation, two keyed joins to annotate endpoints, one
   * moment aggregate — no window, nothing driver-side. Symmetrized
   * orientation keeps the measure direction-free (each undirected edge
   * contributes both (du,dv) and (dv,du), the standard convention).
   */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().localCheckpoint()
    val deg = und.groupBy(col("a").as("n"))
      .agg(count(lit(1)).cast("double").as("d"))
      .localCheckpoint() // joined onto both endpoints
    val annotated = und
      .join(deg.select(col("n").as("a"), col("d").as("du")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("dv")), Seq("b"))
    annotated.agg(
        count(lit(1)).as("__m"),
        avg(col("du")).as("__eu"), avg(col("dv")).as("__ev"),
        avg(col("du") * col("dv")).as("__euv"),
        avg(col("du") * col("du")).as("__eu2"),
        avg(col("dv") * col("dv")).as("__ev2"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("__nn"))))
      .select(
        ((col("__euv") - col("__eu") * col("__ev")) /
          (sqrt(col("__eu2") - col("__eu") * col("__eu")) *
            sqrt(col("__ev2") - col("__ev") * col("__ev"))))
          .as("assortativity"),
        (col("__m") / 2).cast("long").as("n_edges"),
        col("__nn").as("n_nodes"))
  }

  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3): DataFrame = {
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().localCheckpoint()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iterations) {
      // vote = min over (−count, label): highest count wins, ties to
      // the smallest label — same total order the row_number form used
      labels = und
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("__c")).as("nc"), col("label").as("lb")))
          .as("label"))
      if (i < iterations) labels = labels.localCheckpoint()
    }
    labels
  }

  /**
   * Link-prediction scores for non-adjacent node pairs at distance 2:
   * common-neighbour count, Adamic–Adar (Σ_z 1/ln deg z), resource
   * allocation (Σ_z 1/deg z) and neighbourhood Jaccard — the classic
   * unsupervised candidate-scoring family for edge recommendation /
   * positive-pair mining (complement of [[negativeEdges]]).
   *
   * Pairs are enumerated as wedges u–z–w through each common
   * neighbour z with u < w (each unordered pair produced once per
   * common neighbour, aggregated by groupBy), then existing edges are
   * removed with one anti-join. Hub blow-up control: centers with
   * degree > `maxCenterDegree` are excluded from wedge enumeration —
   * a hub shared by everyone carries ~zero discriminative weight
   * (1/ln deg → small) but quadratic enumeration cost, so capping is
   * the standard sparsifier; the cap is part of the operator contract
   * and both engines replay it. Wedge fan-out is bounded by
   * Σ_z min(deg z, cap)² — linear in |E| for bounded cap.
   *
   * Returns (u, w, common, adamic_adar, resource_alloc, jaccard)
   * where jaccard = common / (deg u + deg w − common).
   */
  def linkPredictionScores(edges: DataFrame, srcCol: String,
      dstCol: String, maxCenterDegree: Int = 1000): DataFrame = {
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().localCheckpoint()
    val deg = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).cast("double").as("deg")).localCheckpoint()
    // adjacency annotated with the CENTER's degree (b is the center in
    // the wedge join below): one keyed join, reused for both sides
    val adj = und
      .join(deg.withColumnRenamed("node", "b"), Seq("b"))
      .where(col("deg") <= maxCenterDegree)
      .select(col("b").as("z"), col("a").as("n"), col("deg").as("zdeg"))
      .localCheckpoint()
    val wedges = adj.as("l")
      .join(adj.as("r"), col("l.z") === col("r.z") &&
        col("l.n") < col("r.n"))
      .select(col("l.n").as("u"), col("r.n").as("w"),
        col("l.zdeg").as("zdeg"))
    val scored = wedges.groupBy("u", "w")
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("zdeg"))).as("adamic_adar"),
        sum(lit(1.0) / col("zdeg")).as("resource_alloc"))
    val canon = und.where(col("a") < col("b"))
      .select(col("a").as("u"), col("b").as("w"))
    scored
      .join(canon, Seq("u", "w"), "left_anti")
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("deg", "du"), Seq("u"))
      .join(deg.withColumnRenamed("node", "w")
        .withColumnRenamed("deg", "dw"), Seq("w"))
      .select(col("u"), col("w"), col("common"), col("adamic_adar"),
        col("resource_alloc"),
        (col("common") / (col("du") + col("dw") - col("common")))
          .as("jaccard"))
  }

  /**
   * Multi-source BFS hop distances: for every node reachable from the
   * seed set within `maxHops` undirected hops, the minimum hop count.
   * Deterministic fixed-round unrolling (the [[kCore]] discipline) —
   * each round expands the previous frontier through one keyed join
   * and keeps only newly discovered nodes via anti-join against the
   * visited set; both frames are localCheckpointed so round r+1 never
   * re-executes round r's plan. Work per round is O(edges incident to
   * the frontier); the visited set only grows, so total work is
   * O(|E|·maxHops) worst-case with no recomputation.
   *
   * Returns (node, dist) with dist ∈ [0, maxHops], seeds at 0.
   */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int = 3): DataFrame = {
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().localCheckpoint()
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = visited
    for (h <- 1 to maxHops) {
      frontier = und
        .join(frontier.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(h)).localCheckpoint()
      visited = visited.unionByName(frontier).localCheckpoint()
    }
    visited
  }

  /**
   * HITS (Kleinberg 1999) hubs-and-authorities over a DIRECTED edge
   * set: a fixed `iterations`-step mutual power iteration —
   * a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v), each vector L2-
   * normalized per half-step (the classic formulation; the fixed step
   * count keeps the result a deterministic function of the edge set,
   * the [[pageRank]] convention). Returns (node, hub, authority);
   * sources with no in-edges get authority 0, sinks hub 0.
   *
   * Scale shape: per half-step one keyed join + groupBy over the edge
   * frame and a 1-row broadcast norm — Pregel-as-joins like
   * [[pageRank]], loop-invariant frames localCheckpointed once.
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    var hubs = nodes.withColumn("h", lit(1.0))
    var auths = nodes.withColumn("a", lit(0.0))
    for (i <- 1 to iterations) {
      val aRaw = hubs.join(e, hubs("node") === e("src"))
        .groupBy(col("dst").as("__n")).agg(sum(col("h")).as("__a"))
      val aN = broadcast(
        aRaw.agg(sqrt(sum(col("__a") * col("__a"))).as("__na")))
      auths = nodes.join(aRaw, col("node") === col("__n"), "left")
        .na.fill(0.0, Seq("__a")).crossJoin(aN)
        .select(col("node"), (col("__a") / col("__na")).as("a"))
      val hRaw = auths.join(e, auths("node") === e("dst"))
        .groupBy(col("src").as("__n")).agg(sum(col("a")).as("__h"))
      val hN = broadcast(
        hRaw.agg(sqrt(sum(col("__h") * col("__h"))).as("__nh")))
      hubs = nodes.join(hRaw, col("node") === col("__n"), "left")
        .na.fill(0.0, Seq("__h")).crossJoin(hN)
        .select(col("node"), (col("__h") / col("__nh")).as("h"))
      if (i % 3 == 0 && i < iterations) {
        hubs = hubs.localCheckpoint(); auths = auths.localCheckpoint()
      }
    }
    hubs.join(auths, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }

  /**
   * Newman modularity Q of a node partition over an undirected graph:
   * Q = Σ_c [ e_c/m − (d_c/2m)² ] with e_c = within-community edges,
   * d_c = total degree of community c, m = edges — THE "are these
   * communities better than random" score, the natural companion to
   * [[labelPropagation]] (score its output, or score any exogenous
   * partition like region/tenant). Q ∈ [−½, 1); ~0 means the
   * partition explains nothing. Nodes missing from `labels` form
   * their own implicit singleton communities only through their
   * degree — their edges count in m but never in any e_c, which
   * penalizes Q; pass complete labels. Directed input is symmetrized,
   * self-loops and multi-edges collapse (same canonicalization as
   * [[negativeEdges]]). Returns ONE row:
   * (n_nodes, n_edges, n_communities, modularity).
   *
   * Scale shape: canonical edge frame built once (one distinct), two
   * label equi-joins (labels frame keyed by node — broadcastable when
   * the node set is), then everything is community-cardinality
   * aggregates. No window, nothing driver-side.
   */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String, labelCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
      .distinct()
      .localCheckpoint() // m + degree frame + both label joins read it
    val lab = labels.select(col(nodeCol).as("__n"),
      col(labelCol).as("__l")).where(col("__n").isNotNull).distinct()
    val m = canon.agg(count(lit(1)).cast("double").as("__m"))
    // within-community edge count per label
    val within = canon
      .join(lab.withColumnRenamed("__n", "u")
        .withColumnRenamed("__l", "__lu"), Seq("u"))
      .join(lab.withColumnRenamed("__n", "v")
        .withColumnRenamed("__l", "__lv"), Seq("v"))
      .where(col("__lu") === col("__lv"))
      .groupBy(col("__lu").as("__l"))
      .agg(count(lit(1)).cast("double").as("__ec"))
    // community degree: every canonical edge gives 1 degree to each end
    val deg = canon.select(col("u").as("__n"))
      .unionByName(canon.select(col("v").as("__n")))
      .groupBy("__n").agg(count(lit(1)).cast("double").as("__d"))
    val deg2 = deg.localCheckpoint() // node count + community rollup
    val perC = deg2.join(lab, Seq("__n"))
      .groupBy("__l").agg(sum(col("__d")).as("__dc"))
      .join(within, Seq("__l"), "left")
      .na.fill(0.0, Seq("__ec"))
    perC.crossJoin(broadcast(m))
      .crossJoin(broadcast(deg2.agg(count(lit(1)).as("__nn"))))
      .agg(max(col("__nn")).as("n_nodes"),
        max(col("__m")).cast("long").as("n_edges"),
        count(lit(1)).as("n_communities"),
        sum(col("__ec") / col("__m") -
          (col("__dc") / (lit(2.0) * col("__m"))) *
          (col("__dc") / (lit(2.0) * col("__m")))).as("modularity"))
  }

  /**
   * Bradley–Terry strength ratings from pairwise win counts by the MM
   * algorithm (Hunter 2004), FIXED `iterations` with a mean-1
   * renormalization each step (identifiable and engine-replayable —
   * no convergence test): w_i ← W_i / Σ_j n_ij/(w_i + w_j). Returns
   * one row per item: (item, games, wins, rating).
   *
   * Scale shape: each iteration is two keyed joins (both endpoints)
   * + one groupBy over the OBSERVED pair frame — the PageRank loop
   * discipline, nothing driver-side, parallelism scales with items.
   *
   * `pairs` must carry one row per unordered pair with columns
   * (aCol, bCol, winsACol, winsBCol).
   */
  def bradleyTerry(pairs: DataFrame, aCol: String, bCol: String,
      winsACol: String, winsBCol: String,
      iterations: Int = 8): DataFrame = {
    require(iterations >= 1 && iterations <= 32,
      "bradleyTerry: 1..32 iterations")
    val e = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"),
        col(winsACol).cast("double").as("__wa"),
        col(winsBCol).cast("double").as("__wb"))
      .withColumn("__g", col("__wa") + col("__wb"))
      .localCheckpoint()
    // symmetric edge view: one row per (item, opponent, games, wins)
    val sym = e.select(col("__a").as("__i"), col("__b").as("__j"),
        col("__g"), col("__wa").as("__w"))
      .unionByName(e.select(col("__b").as("__i"), col("__a").as("__j"),
        col("__g"), col("__wb").as("__w")))
      .localCheckpoint()
    val items = sym.groupBy(col("__i"))
      .agg(sum(col("__g")).as("games"), sum(col("__w")).as("wins"))
      .localCheckpoint()
    var r = items.select(col("__i"), lit(1.0).as("__r"))
    for (_ <- 1 to iterations) {
      // the ratings frame is items-sized — BROADCAST it onto the pair
      // frame explicitly (the checkpointed leaf has no size stats, so
      // the planner would otherwise sort-merge the big side twice per
      // iteration)
      val denom = sym
        .join(broadcast(r.select(col("__i"), col("__r").as("__ri"))),
          Seq("__i"))
        .join(broadcast(r.select(col("__i").as("__j"),
          col("__r").as("__rj"))), Seq("__j"))
        .groupBy("__i")
        .agg(sum(col("__g") / (col("__ri") + col("__rj"))).as("__den"))
      val raw = items.join(broadcast(denom), Seq("__i"))
        .select(col("__i"),
          when(col("__den") > 0, col("wins") / col("__den"))
            .otherwise(lit(0.0)).as("__r"))
      val mean = broadcast(raw.agg(avg(col("__r")).as("__m")))
      r = raw.crossJoin(mean)
        .select(col("__i"), (col("__r") / col("__m")).as("__r"))
        .localCheckpoint()
    }
    items.join(r, Seq("__i"))
      .select(col("__i").as("item"), col("games").cast("long").as("games"),
        col("wins").cast("long").as("wins"), col("__r").as("rating"))
  }

  /**
   * Rich-club coefficient profile: for each degree threshold k,
   * φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k counts nodes of degree > k
   * and E_k counts (undirected, deduped) edges whose BOTH endpoints
   * have degree > k — "do the hubs preferentially wire to each other".
   * Returns one row per k: (k, n_nodes, n_edges, phi); phi is NULL
   * when fewer than two nodes clear the threshold.
   *
   * Scale shape: one degree aggregation, two keyed joins to annotate
   * endpoints (same discipline as [[degreeAssortativity]]), then an
   * explode over the FIXED k grid — |E|·|ks| rows through one
   * map-side-combined groupBy. No windows, nothing driver-side.
   */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.size <= 64,
      s"richClub: 1..64 thresholds, got ${ks.size}")
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct().localCheckpoint()
    val deg = und.groupBy(col("a").as("n"))
      .agg(count(lit(1)).as("d"))
      .localCheckpoint() // read for node counts AND both edge endpoints
    val kGrid = array(ks.map(k => lit(k)): _*)
    val nodesPerK = deg
      .select(explode(kGrid).as("k"), col("d"))
      .where(col("d") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val canon = und.where(col("a") < col("b"))
      .join(deg.select(col("n").as("a"), col("d").as("__da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("__db")), Seq("b"))
    val edgesPerK = canon
      .select(explode(kGrid).as("k"), col("__da"), col("__db"))
      .where(col("__da") > col("k") && col("__db") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    val grid = edges.sparkSession
      .createDataFrame(ks.map(k => Tuple1(k))).toDF("k")
    grid
      .join(nodesPerK, Seq("k"), "left")
      .join(edgesPerK, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .withColumn("phi",
        when(col("n_nodes") > 1,
          lit(2.0) * col("n_edges") /
            (col("n_nodes") * (col("n_nodes") - 1))))
  }

  /**
   * Katz centrality on the undirected simple graph: x ← 1 + α·A·x for
   * a fixed iteration count — attenuated path counting, the
   * centrality [[pageRank]] is NOT (no degree normalization: a
   * high-degree neighbor contributes its full score, scaled only by
   * α). α must satisfy α < 1/λ_max for convergence; with degree ≤ D
   * any α < 1/D is safe.
   *
   * Scale shape: same loop discipline as [[pageRank]] — loop-invariant
   * edge/node frames localCheckpointed ONCE, each iteration is one
   * join + one groupBy (linear in edges), scores checkpointed
   * periodically to bound the plan. Returns (node, katz).
   */
  def katzCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      alpha: Double = 0.005, iterations: Int = 8,
      preNormalized: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha < 1, "katzCentrality: alpha in (0,1)")
    require(iterations >= 1 && iterations <= 50,
      "katzCentrality: iterations in 1..50")
    // preNormalized: caller warrants edges are ALREADY symmetric simple
    // (both directions present, no self-loops/nulls/dups) and cheap to
    // re-scan (e.g. a materialized derived edge table) — skips the
    // symmetrize+distinct shuffle, the dominant cost when two queries
    // share one registered co-occurrence graph
    val e =
      if (preNormalized)
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      else {
        val e0 = edges
          .select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull &&
            col("src") =!= col("dst"))
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint()
      }
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var x = nodes.select(col("node"), lit(1.0).as("katz"))
    for (i <- 1 to iterations) {
      val contrib = x.join(e, x("node") === e("src"))
        .groupBy(col("dst").as("__n2"))
        .agg(sum(col("katz")).as("__c"))
      x = nodes.join(contrib, nodes("node") === contrib("__n2"), "left")
        .na.fill(0.0, Seq("__c"))
        .select(col("node"), (lit(1.0) + lit(alpha) * col("__c")).as("katz"))
      if (i % 4 == 0 && i < iterations) x = x.localCheckpoint()
    }
    x
  }

  /**
   * Edge embeddedness census: each edge's SUPPORT (number of triangles
   * through it = common neighbors of its endpoints); support-0 edges
   * are local bridges — the weak ties whose removal disconnects
   * neighborhoods (Granovetter's structural holes; also exactly the
   * truss-decomposition substrate). Returns 1 row: (n_edges,
   * n_bridges, bridge_share, avg_support, max_support).
   *
   * Scale shape: the same degree-oriented wedge join as triangle
   * counting (each wedge generated once, from its lowest-degree
   * center), each closed wedge credited to its three edges by a
   * 3-way explode — never an unoriented neighbor-pair blowup.
   */
  def edgeEmbeddedness(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct().localCheckpoint()
    val deg = canon.select(col("u").as("node"))
      .unionByName(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("deg", "dv"), "v")
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
    val tri = wedges.join(canon,
      least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"), "left_semi")
    val perEdge = tri.select(explode(array(
        struct(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"),
          greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"),
          greatest(col("b"), col("c")).as("v")))).as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("__sup"))
    canon.join(perEdge, Seq("u", "v"), "left")
      .na.fill(0L, Seq("__sup"))
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("__sup") === 0, 1L).otherwise(0L)).as("n_bridges"),
        (sum(when(col("__sup") === 0, 1.0).otherwise(0.0)) /
          count(lit(1))).as("bridge_share"),
        avg(col("__sup").cast("double")).as("avg_support"),
        max(col("__sup")).as("max_support"))
  }

  /**
   * Spectral radius λ_max of the undirected simple graph's adjacency
   * matrix by power iteration + a final Rayleigh quotient —
   * the graph's intrinsic "amplification factor": epidemic/cascade
   * thresholds sit at 1/λ_max, and a [[katzCentrality]] α is valid iff
   * α < 1/λ_max (this op IS that check). Starts from the all-ones
   * vector (non-orthogonal to the Perron vector on any non-empty
   * graph). Caveat: on a BIPARTITE graph the ±λ_max eigenpair makes
   * plain power iteration oscillate and the quotient under-read (it is
   * still a valid lower bound); co-occurrence graphs have odd cycles
   * and converge.
   *
   * Scale shape: same loop discipline as [[pageRank]] — each iteration
   * one edge join + groupBy plus a broadcast 1-row norm; the Rayleigh
   * quotient is one more 1-row aggregate. Returns 1 row: (n_nodes,
   * n_edges, lambda_max, alpha_max).
   */
  def spectralRadius(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, preNormalized: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      "spectralRadius: iterations in 1..50")
    // preNormalized contract: see [[katzCentrality]]
    val e =
      if (preNormalized)
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      else {
        val e0 = edges
          .select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull &&
            col("src") =!= col("dst"))
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint()
      }
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint()
    // every node of the simple graph has degree >= 1, so A·x keeps
    // every node's mass positive from the all-ones start — the plain
    // groupBy covers exactly the node set, no re-join/fill needed
    def multiply(x: DataFrame): DataFrame =
      x.join(e, x("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("v")).as("__av"))
    // UNNORMALIZED iterations: doubles hold λ^iters comfortably for
    // any real degree bound, and skipping the per-iteration norm
    // avoids 1 eager materialization per round (the norm branch would
    // otherwise re-embed the A·x lineage — 2^iters plan growth)
    var x = nodes.select(col("node"), lit(1.0).as("v"))
    for (i <- 1 to iterations) {
      x = multiply(x).select(col("node"), col("__av").as("v"))
      if (i % 4 == 0 && i < iterations) x = x.localCheckpoint()
    }
    // the Rayleigh quotient references x TWICE (x and A·x) — without a
    // checkpoint the tail of the iteration chain re-executes once per
    // reference; x is one row per node, so materializing is ~free
    x = x.localCheckpoint()
    val ray = x.join(multiply(x), Seq("node"))
      .agg(sum(col("v") * col("__av")).as("__num"),
        sum(col("v") * col("v")).as("__den"))
    val counts = broadcast(nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg((count(lit(1)) / 2).cast("long").as("n_edges"))))
    ray.crossJoin(counts)
      .select(col("n_nodes"), col("n_edges"),
        when(col("__den") > 0, col("__num") / col("__den"))
          .as("lambda_max"),
        when(col("__num") > 0, col("__den") / col("__num"))
          .as("alpha_max"))
  }

  /**
   * Butterfly (4-cycle) count of a bipartite graph: wedges are
   * supplier pairs sharing a customer, and C(w, 2) over the wedge
   * multiplicities counts the butterflies — the bipartite analogue
   * of the triangle count ([[triangles]] is identically zero on
   * bipartite graphs, so THIS is the clustering primitive for
   * customer×item / user×feature incidence data). Left nodes above
   * `maxDegree` are excluded from wedge enumeration (and counted):
   * the C(deg, 2) blow-up cap, same discipline as link prediction's
   * degree-capped centers.
   *
   * Scale shape: one degree pass, a capped per-left-node pair join
   * (≤ maxDegree² wedges/node), one groupBy(pair), one reduce.
   * Returns 1 row: (n_edges, n_left_used, n_left_excluded, n_wedges,
   * n_wedge_pairs, n_butterflies).
   */
  def butterflyCount(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Int = 1000): DataFrame = {
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().localCheckpoint()
    val deg = e.groupBy("__s").agg(count(lit(1)).as("__deg"))
    val used = deg.where(col("__deg") <= maxDegree)
      .select(col("__s"))
    val excl = broadcast(deg.agg(
      coalesce(sum(when(col("__deg") > maxDegree, 1L).otherwise(0L)),
        lit(0L)).as("n_left_excluded"),
      coalesce(sum(when(col("__deg") <= maxDegree, 1L).otherwise(0L)),
        lit(0L)).as("n_left_used")))
    val ee = e.join(used, Seq("__s"))
    val wedges = ee.as("a")
      .join(ee.as("b"),
        col("a.__s") === col("b.__s") && col("a.__d") < col("b.__d"))
      .groupBy(col("a.__d").as("__d1"), col("b.__d").as("__d2"))
      .agg(count(lit(1)).as("__w"))
    val agg = wedges.agg(
      coalesce(sum(col("__w")), lit(0L)).as("n_wedges"),
      count(lit(1)).as("n_wedge_pairs"),
      (coalesce(sum(col("__w") * (col("__w") - 1)), lit(0L)) / 2)
        .cast("long").as("n_butterflies"))
    broadcast(e.agg(count(lit(1)).as("n_edges"))).crossJoin(excl)
      .crossJoin(broadcast(agg))
      .select(col("n_edges"), col("n_left_used"),
        col("n_left_excluded"), col("n_wedges"), col("n_wedge_pairs"),
        col("n_butterflies"))
  }
}
