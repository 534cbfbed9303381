package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/**
 * Scale linter for query plans — the library's own 100 TB discipline
 * ("no cartesian products, no single-partition windows, no
 * corpus-sized broadcasts") productized, so pipelines can gate
 * themselves the way this repo's review gates do. Walks the OPTIMIZED
 * logical plan (post-Catalyst, so eliminated constructs don't
 * false-positive) and returns findings; [[assertScaleSafe]] throws on
 * any, for use in CI or before an expensive action.
 *
 * Rules:
 *  - `cartesian-product`: a Join with no condition (cross or
 *    condition-free inner) where BOTH sides' size estimates exceed
 *    `broadcastableBytes` — 1-row/stat-frame crossJoins (this
 *    library's own broadcast-algebra idiom) pass.
 *  - `unpartitioned-window`: a Window whose partitionSpec is empty —
 *    the whole input moves through ONE task regardless of cluster
 *    size.
 *  - `oversized-broadcast`: a broadcast-hinted subtree whose estimate
 *    exceeds `maxBroadcastBytes` (default 1 GiB) — executor-OOM bait.
 *
 * Estimates come from Catalyst statistics (file sizes through
 * projections), the same numbers the planner's own broadcast decision
 * uses: imperfect, but biased the safe way for a LINTER (overestimates
 * flag, underestimates defer to AQE at runtime).
 */
object PlanLint {

  final case class Finding(rule: String, detail: String)

  /**
   * `rawSidesAreCorpus`: size estimates scale with the TEST data, so a
   * gate running at sf0.01 would pass a cartesian whose raw side is a
   * few hundred KB there but corpus-sized in production. With this
   * flag the cartesian rule ignores byte estimates and flags ANY
   * condition-free join of two non-REDUCED sides — `reduces` (an
   * aggregate/distinct/limit below the join input) is the
   * scale-invariant version of "broadcastable": a 1-row stat frame
   * stays 1 row at 100 TB, a raw table does not.
   */
  def audit(df: DataFrame,
      broadcastableBytes: Long = 64L << 20,
      maxBroadcastBytes: Long = 1L << 30,
      rawSidesAreCorpus: Boolean = false): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    def size(p: LogicalPlan): BigInt = p.stats.sizeInBytes
    // size-only stats pass aggregates through at child size, so a
    // subtree containing a cardinality reducer has a meaninglessly
    // inflated estimate — such sides are the library's bounded
    // stat-frame idiom, not corpus-sized data
    // a side is scale-bounded when something below it reduces
    // cardinality OR it is a literal relation (Range / LocalRelation /
    // OneRowRelation): those stay the same size at any corpus SF — the
    // library's replicate-inflation crossJoins (bootstrap × range(b))
    // are deliberate bounded fan-out, not cartesian smells
    def reduces(p: LogicalPlan): Boolean = p.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate |
           _: org.apache.spark.sql.catalyst.plans.logical.Distinct |
           _: org.apache.spark.sql.catalyst.plans.logical.Deduplicate |
           _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit |
           _: org.apache.spark.sql.catalyst.plans.logical.Range |
           _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation |
           _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => true
      case _ => false
    }
    // joins and windows: the OPTIMIZED plan (post-Catalyst — pushed
    // predicates may have turned a cross join into an equi-join, and
    // eliminated windows shouldn't flag)
    df.queryExecution.optimizedPlan.foreach {
      case j: Join if j.condition.isEmpty &&
          (j.joinType == Cross || j.joinType == Inner) =>
        val (l, r) = (size(j.left), size(j.right))
        val bothBig =
          if (rawSidesAreCorpus) true // raw = corpus-sized by decree
          else l > broadcastableBytes && r > broadcastableBytes
        if (bothBig && !reduces(j.left) && !reduces(j.right))
          out += Finding("cartesian-product",
            s"join of ~$l x ~$r byte sides with no condition")
      case w: LWindow if w.partitionSpec.isEmpty =>
        out += Finding("unpartitioned-window",
          s"window [${w.windowExpressions.map(_.name).mkString(",")}] " +
            "moves the whole input through one task")
      case _ =>
    }
    // broadcast hints: the ANALYZED plan — the optimizer's
    // EliminateResolvedHint folds hints into Join nodes, so they are
    // invisible post-optimization. Size estimates are only trustworthy
    // when nothing below the hint reduces cardinality (size-only stats
    // pass aggregates through at child size), so the rule targets the
    // actual smell — broadcasting a RAW corpus-sized relation — and
    // stays silent on the bounded post-aggregation frames whose
    // estimates are meaninglessly inflated.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    df.queryExecution.analyzed.foreach {
      case h: ResolvedHint if h.hints.strategy.exists(
            _.toString.toUpperCase.contains("BROADCAST")) =>
        val s = size(h.child)
        if (!reduces(h.child) && s > maxBroadcastBytes)
          out += Finding("oversized-broadcast",
            s"broadcast hint on ~$s byte un-aggregated subtree")
      case _ =>
    }
    out.result()
  }

  /**
   * Bounded-collect discipline, machine-checkable: a frame that is
   * collected to the driver must be CARDINALITY-BOUNDED BY
   * CONSTRUCTION — its plan, walked from the root through
   * order-preserving operators, must reach an Aggregate / GlobalLimit
   * / Distinct / Deduplicate / literal relation on EVERY corpus-fed
   * path (joins/unions bound iff all inputs bound). A raw or
   * filter-only scan feeding a collect is the driver-OOM shape this
   * library bans (every model-fit collect here is a sufficient-stats
   * aggregate, a ≤32-row guarded frame, or a 1-row bound).
   */
  def collectIsBounded(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: Aggregate | _: GlobalLimit | _: Distinct |
           _: Deduplicate | _: Range | _: LocalRelation |
           _: OneRowRelation => true
      case j: Join => collectIsBounded(j.left) && collectIsBounded(j.right)
      case u: Union => u.children.forall(collectIsBounded)
      // Generate (explode/posexplode/inline) EXPANDS cardinality — a
      // Generate over a GlobalLimit is limit × array-length rows, so it
      // does not inherit its child's bound; require a bound ABOVE it.
      case _: Generate => false
      case other if other.children.length == 1 =>
        collectIsBounded(other.children.head)
      case _ => false // leaf relation (corpus scan) or multi-child op
    }
  }

  /**
   * Session-wide enforcement of [[collectIsBounded]]: register via
   * `spark.listenerManager.register(new BoundedCollectListener)`, run
   * the workload, then assert `violations.isEmpty`. Flags every
   * collect-family action (collect / collectAsList / head / take /
   * toLocalIterator) whose optimized plan is not bounded — so an
   * unbounded collect added anywhere in the library fails the Verify
   * gate and the scalatest suite, not a 100 TB run.
   */
  final class BoundedCollectListener
      extends org.apache.spark.sql.util.QueryExecutionListener {
    private val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val watched = Set("collect", "collectAsList", "head",
      "take", "toLocalIterator")
    def violations: Seq[String] = {
      val b = Seq.newBuilder[String]
      bad.forEach(v => b += v)
      b.result()
    }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      if (watched(funcName) && !collectIsBounded(qe.optimizedPlan))
        bad.add(s"unbounded $funcName: " +
          qe.optimizedPlan.treeString.linesIterator.take(6).mkString(" | "))
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Throw (with every finding in the message) if the plan violates
    * the scale rules — the CI-gate form of [[audit]]. Thresholds pass
    * through so small-SF gates (Verify runs at sf0.01, where a raw
    * corpus side is only ~MBs) can tighten them to flag the same
    * SHAPES the defaults catch at production scale. */
  def assertScaleSafe(df: DataFrame,
      broadcastableBytes: Long = 64L << 20,
      maxBroadcastBytes: Long = 1L << 30,
      rawSidesAreCorpus: Boolean = false): Unit = {
    val findings = audit(df, broadcastableBytes, maxBroadcastBytes,
      rawSidesAreCorpus)
    if (findings.nonEmpty)
      throw new IllegalStateException(
        "plan fails scale lint:\n" + findings
          .map(f => s"  [${f.rule}] ${f.detail}").mkString("\n"))
  }
}
