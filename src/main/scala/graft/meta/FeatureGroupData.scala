package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.{Aggregation, Analysis, AnalysisPlanner,
  Correlation, Distribution, RecordLookup}

/**
 * Data plane of a [[FeatureGroup]]: binds the metadata to a backing
 * DataFrame and materializes derived features lazily as Catalyst columns
 * (feature_group.py:331-439 + PRD §4.5 semantics, for real).
 */
final class FeatureGroupData(
    val meta: FeatureGroup,
    base: DataFrame,
    /** sibling groups resolvable for cross-group references, by group name */
    siblings: Map[String, FeatureGroupData] = Map.empty,
    /** when the group is snapshot-backed ([[FeatureGroupData.snapshotBacked]]):
      * the store and the pinned version `base` was read at — lets
      * [[analyze]] route spec filters through segment-level data
      * skipping without caller cooperation */
    snapshot: Option[(graft.etl.SnapshotStore, Long)] = None) {

  private val spark: SparkSession = base.sparkSession

  /**
   * Cross-group references (`group.feature`) in derived expressions are
   * planned as equi-joins on the shared entity key: the sibling's frame
   * is projected to (entity_key, feature), left-joined once per
   * referenced group, and the reference rewritten to the joined column.
   * Dim-sized siblings broadcast automatically via AQE; key-partitioned
   * co-location makes this a local join at scale.
   */
  private def resolveCrossGroup(df0: DataFrame, exprs: Seq[String]): DataFrame = {
    val key = meta.entityKey.getOrElse(return df0)
    val wanted: Seq[(String, String)] = exprs.flatMap { e =>
      graft.expr.ExpressionValidator.parse(spark, e).toOption.toSeq
        .flatMap(graft.expr.ExpressionValidator.references)
        .filter(_.contains("."))
        .map { r => val p = r.split("\\.", 2); (p(0), p(1)) }
    }.distinct.filter { case (g, _) => siblings.contains(g) }
    wanted.groupBy(_._1).foldLeft(df0) { case (df, (gName, feats)) =>
      val sib = siblings(gName)
      val sibKey = sib.meta.entityKey.getOrElse(
        throw new IllegalStateException(s"sibling $gName has no entity_key"))
      val proj = sib.frame.select(
        (org.apache.spark.sql.functions.col(sibKey).as(key) +:
          feats.map { case (_, f) =>
            org.apache.spark.sql.functions.col(f).as(s"${gName}__$f")
          }): _*)
      df.join(proj, Seq(key), "left")
    }
  }

  /** rewrite `group.feature` → joined alias in an expression string. */
  private def rewriteRefs(e: String): String =
    siblings.keys.foldLeft(e)((acc, g) =>
      acc.replaceAll(s"\\b$g\\.([A-Za-z_][A-Za-z0-9_]*)", s"${g}__$$1"))

  /**
   * The group's frame with every derived feature materialized as a
   * `withColumn(expr)` in dependency order (cycles rejected up front).
   */
  lazy val frame: DataFrame = buildFrame(base)

  private def buildFrame(b: DataFrame): DataFrame = {
    val derived = meta.listFeatures.filter(_.derivedFrom.isDefined)
    val deps: Map[String, Seq[String]] = derived.map { f =>
      f.name -> graft.expr.ExpressionValidator
        .parse(spark, f.derivedFrom.get).toOption.toSeq
        .flatMap(graft.expr.ExpressionValidator.references)
        .filter(r => derived.exists(_.name == r))
    }.toMap
    graft.expr.ExpressionValidator.findCycle(deps).foreach { cyc =>
      throw new IllegalStateException(
        s"Circular derived-feature dependency: ${cyc.mkString(" -> ")}")
    }
    // topological order: repeatedly emit features whose deps are emitted
    var remaining = derived
    var out = resolveCrossGroup(b, derived.flatMap(_.derivedFrom))
    val done = scala.collection.mutable.Set.empty[String]
    while (remaining.nonEmpty) {
      val (ready, rest) = remaining.partition(f =>
        deps(f.name).forall(done.contains))
      require(ready.nonEmpty, s"Unresolvable derived features: ${rest.map(_.name)}")
      ready.foreach { f =>
        out = out.withColumn(f.name, expr(rewriteRefs(f.derivedFrom.get)))
        done += f.name
      }
      remaining = rest
    }
    out
  }

  /**
   * Point lookup by entity ids (feature_group.py:393-439; PRD §4.5).
   * Small id lists → `isin` (pushed to the scan); large lists → broadcast
   * semi-join so the probe stays distributed.
   */
  def get(entityIds: Seq[Any], features: Seq[String] = Nil): DataFrame = {
    val key = meta.entityKey.getOrElse(
      throw new IllegalStateException(s"${meta.qualifiedName} has no entity_key"))
    val cols: Seq[Column] =
      col(key) +: (if (features.isEmpty) Seq(col("*")) else features.map(col))
    val filtered =
      if (entityIds.size <= 1000) frame.where(col(key).isin(entityIds: _*))
      else {
        import spark.implicits._
        val ids = entityIds.map(_.toString).toDF(key)
        frame.join(broadcast(ids.withColumn(key, col(key).cast(frame.schema(key).dataType))),
          Seq(key), "left_semi")
      }
    if (features.isEmpty) filtered else filtered.select(cols.distinct: _*)
  }

  /**
   * Run an analysis spec against this group's frame. On a
   * snapshot-backed group ([[FeatureGroupData.snapshotBacked]]) a
   * spec-level `filter` is ALSO routed through
   * [[graft.etl.SnapshotStore.readWhere]] segment skipping, so a
   * selective analysis over a long append/upsert chain materializes
   * only the segments whose manifest (min, max) stats can match —
   * without the caller invoking readWhere themselves (the reference's
   * source read path prunes the same way). The planner re-applies the
   * filter row-level on the pruned read, so semantics are identical
   * to analyzing `frame`; pruning engages only when every column the
   * predicate references is a BASE column (a derived-feature filter
   * has no segment stats and falls back to the plain frame).
   */
  def analyze(a: Analysis): DataFrame = a match {
    // compare_versions (analysis.py:272): test version-a rows against
    // version-b rows of THIS group — read both snapshot versions, label
    // them, and let the planner treat the label as the segment column.
    // Each side is still a pruned parquet read of its own manifest, so
    // nothing rescans: the union is two version scans, one shuffle.
    case st: graft.analysis.StatTest if st.compareVersions.isDefined =>
      val (store, _) = snapshot.getOrElse(throw new IllegalStateException(
        s"${meta.qualifiedName}: compareVersions requires a snapshot-backed group"))
      val vCol = graft.analysis.StatTest.versionCol
      def side(v: String): DataFrame = {
        val n = v.stripPrefix("v").toLong
        buildFrame(store.readVersion(spark, n))
          .withColumn(vCol, lit(graft.analysis.StatTest.normVersion(v)))
      }
      val (a0, b0) = st.compareVersions.get
      AnalysisPlanner.plan(side(a0).unionByName(side(b0)), st)
    case _ =>
      AnalysisPlanner.plan(frameFor(a), a)
  }

  /** The input frame an analysis spec should scan — the segment-pruned
    * snapshot read when a base-column filter allows it. */
  private[graft] def frameFor(a: Analysis): DataFrame =
    (snapshot, specFilter(a)) match {
      case (Some((st, v)), Some(f)) if filterOnBaseColumns(f) =>
        buildFrame(st.readWhere(spark, f, Some(v)))
      case _ => frame
    }

  private def specFilter(a: Analysis): Option[String] = a match {
    case s: Aggregation => s.filter
    case s: Distribution => s.filter
    case s: Correlation => s.filter
    case s: graft.analysis.StatTest => s.filter
    case s: RecordLookup => s.filter
    case _ => None
  }

  private def filterOnBaseColumns(f: String): Boolean =
    try {
      val refs = spark.sessionState.sqlParser.parseExpression(f).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a
      }
      val cols = base.schema.fieldNames.map(_.toLowerCase).toSet
      refs.nonEmpty && refs.forall(r =>
        r.nameParts.length == 1 && cols(r.nameParts.head.toLowerCase))
    } catch { case scala.util.control.NonFatal(_) => false }
}

object FeatureGroupData {

  /**
   * Bind a group to the LATEST snapshot of `store`, pinned to the
   * version resolved here (so every read through this instance —
   * including the segment-pruned [[FeatureGroupData.analyze]] path —
   * sees one consistent table even while writers keep committing).
   */
  def snapshotBacked(meta: FeatureGroup, store: graft.etl.SnapshotStore,
      spark: SparkSession,
      siblings: Map[String, FeatureGroupData] = Map.empty): FeatureGroupData = {
    val v = store.latestVersion(spark).getOrElse(throw new java.io.IOException(
      s"snapshot store ${store.path}: no commits"))
    new FeatureGroupData(meta, store.readVersion(spark, v), siblings,
      Some((store, v)))
  }
}

/**
 * Driver-side analysis-result cache with freshness semantics
 * (analytics/client.py:63-79 + freshness.py:32-111).
 */
final class ResultCache {
  import java.time.{Duration, Instant}

  sealed trait Freshness {
    def acceptsAge(age: Duration): Boolean
  }
  case object RealTime extends Freshness {
    def acceptsAge(age: Duration): Boolean = false
  }
  case object Cached extends Freshness {
    def acceptsAge(age: Duration): Boolean = true
  }
  final case class Within(d: Duration) extends Freshness {
    def acceptsAge(age: Duration): Boolean = age.compareTo(d) <= 0
  }

  /** "7d"/"2h"/"30m"/"45s"/"1w" → Duration (freshness.py:32-64). */
  def parseDuration(s: String): Duration = {
    val m = "^(\\d+)(s|m|h|d|w)$".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"Bad duration: $s"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "s" => Duration.ofSeconds(n)
      case "m" => Duration.ofMinutes(n)
      case "h" => Duration.ofHours(n)
      case "d" => Duration.ofDays(n)
      case "w" => Duration.ofDays(7 * n)
    }
  }

  private val cache =
    scala.collection.mutable.Map.empty[String, (DataFrame, Instant)]

  /** cache key = canonical string of the spec (client.py:194-199). */
  def key(spec: Analysis): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(spec.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def getOrCompute(spec: Analysis, freshness: Freshness,
      now: Instant = Instant.now())(compute: => DataFrame): DataFrame =
    synchronized {
      val k = key(spec)
      cache.get(k) match {
        case Some((df, at))
            if freshness.acceptsAge(Duration.between(at, now)) => df
        case _ =>
          val df = compute
          cache(k) = (df, now)
          df
      }
    }

  def size: Int = synchronized(cache.size)
  def clear(): Unit = synchronized(cache.clear())
}
