package graft.meta

import java.time.Instant

import graft.types.FeatureType

/**
 * Metadata layer: the 5-level namespace org/domain/project/group/feature
 * with versioning, ACLs, cross-org grants, lineage and audit — pure
 * driver-side Scala (the reference keeps all of this in-process too:
 * raise_/models/{organization,domain,project,feature_group,feature,acl,
 * lineage,audit}.py). Data-plane operations delegate to Spark through
 * [[graft.meta.FeatureGroupData]].
 */
final case class AccessControl(
    readers: Set[String] = Set.empty,
    writers: Set[String] = Set.empty,
    admins: Set[String] = Set.empty) {

  /** child overrides parent per non-empty role (acl.py:51-129). */
  def merged(child: AccessControl): AccessControl = AccessControl(
    if (child.readers.nonEmpty) child.readers else readers,
    if (child.writers.nonEmpty) child.writers else writers,
    if (child.admins.nonEmpty) child.admins else admins)

  def canRead(p: String): Boolean =
    readers.contains(p) || readers.contains("*") || canWrite(p)
  def canWrite(p: String): Boolean =
    writers.contains(p) || writers.contains("*") || isAdmin(p)
  def isAdmin(p: String): Boolean = admins.contains(p) || admins.contains("*")
}

/** Cross-org grant with optional expiry; "*" = all features (acl.py:151-205). */
final case class ExternalGrant(
    granteeOrg: String,
    features: Set[String], // "*" allowed
    expiresAt: Option[Instant] = None) {
  def active(now: Instant = Instant.now()): Boolean =
    expiresAt.forall(now.isBefore)
  def covers(feature: String): Boolean =
    features.contains("*") || features.contains(feature)
}

sealed trait FeatureStatus
object FeatureStatus {
  case object Active extends FeatureStatus
  case object Deprecated extends FeatureStatus
  case object Archived extends FeatureStatus
}

/** One feature version (immutable once created; feature.py:22-84). */
final case class Feature(
    name: String,
    dtype: FeatureType,
    version: Int,
    nullable: Boolean = true,
    default: Option[Any] = None,
    derivedFrom: Option[String] = None,
    tags: Set[String] = Set.empty,
    owner: Option[String] = None,
    description: Option[String] = None,
    status: FeatureStatus = FeatureStatus.Active,
    acl: Option[AccessControl] = None,
    createdAt: Instant = Instant.now()) {
  def versionedName: String = s"$name@v$version"
}

sealed trait IfExists
object IfExists {
  case object Error extends IfExists  // raise (default)
  case object Skip extends IfExists   // keep existing
  case object Update extends IfExists // new version
}

/**
 * Feature group: named features with version history, entity key, ACL.
 * Mutable registry entry (the reference mutates in place as well).
 */
final class FeatureGroup(
    val org: String, val domain: String, val project: String,
    val name: String,
    val entityKey: Option[String] = None,
    val entityDtype: Option[FeatureType] = None,
    var acl: AccessControl = AccessControl(),
    val description: Option[String] = None) {

  // name → all versions ascending (feature_group.py:103-214)
  private val versions =
    scala.collection.mutable.LinkedHashMap.empty[String, Vector[Feature]]
  private val grants =
    scala.collection.mutable.ArrayBuffer.empty[ExternalGrant]

  def qualifiedName: String = s"$org/$domain/$project/$name"

  def createFeature(
      name: String, dtype: String,
      nullable: Boolean = true, default: Option[Any] = None,
      derivedFrom: Option[String] = None, tags: Set[String] = Set.empty,
      owner: Option[String] = None, description: Option[String] = None,
      ifExists: IfExists = IfExists.Error): Feature = {
    val existing = versions.getOrElse(name, Vector.empty)
    if (existing.nonEmpty) ifExists match {
      case IfExists.Error =>
        throw new IllegalStateException(
          s"Feature '$name' already exists in $qualifiedName (use ifExists)")
      case IfExists.Skip => return existing.last
      case IfExists.Update => // fall through: new version
    }
    val f = Feature(name, FeatureType.parse(dtype), existing.size + 1,
      nullable, default, derivedFrom, tags, owner, description)
    versions(name) = existing :+ f
    f
  }

  /** Bulk creation (feature_group.py:216-259). */
  def createFeatures(specs: Seq[(String, String)],
      ifExists: IfExists = IfExists.Error): Seq[Feature] =
    specs.map { case (n, dt) => createFeature(n, dt, ifExists = ifExists) }

  /** From a schema map name→dtype (feature_group.py:261-284). */
  def fromSchema(schema: Map[String, String],
      ifExists: IfExists = IfExists.Error): Seq[Feature] =
    createFeatures(schema.toSeq, ifExists)

  /** `name` (latest) or `name@vN` resolution (feature_group.py:146-214). */
  def feature(ref: String): Feature = {
    val (n, v) = ref.lastIndexOf("@v") match {
      case -1 => (ref, None)
      case i  => (ref.take(i), Some(ref.drop(i + 2).toInt))
    }
    val vs = versions.getOrElse(n,
      throw new NoSuchElementException(s"No feature '$n' in $qualifiedName"))
    v.fold(vs.last) { want =>
      vs.find(_.version == want).getOrElse(
        throw new NoSuchElementException(s"No version v$want of '$n'"))
    }
  }

  def listFeatures: Seq[Feature] = versions.values.map(_.last).toSeq
  def listVersions(name: String): Seq[Feature] =
    versions.getOrElse(name, Vector.empty)

  def deprecate(name: String): Unit = {
    val vs = versions(name)
    versions(name) = vs.init :+ vs.last.copy(status = FeatureStatus.Deprecated)
  }

  /** effective ACL = group ACL overridden by feature ACL (feature.py:193-227). */
  def effectiveAcl(featureName: String): AccessControl =
    feature(featureName).acl.fold(acl)(acl.merged)

  /** [[MetaCatalog.load]] hook: re-attach a persisted feature version
    * verbatim (caller feeds versions in ascending order). */
  private[meta] def restoreFeature(f: Feature): Unit = {
    val existing = versions.getOrElse(f.name, Vector.empty)
    require(f.version == existing.size + 1,
      s"restore out of order: ${f.name} v${f.version} after ${existing.size}")
    versions(f.name) = existing :+ f
  }

  // -- cross-org grants (feature_group.py:529-579) --
  def grant(g: ExternalGrant): Unit = grants += g
  def revoke(granteeOrg: String): Unit =
    grants.filterInPlace(_.granteeOrg != granteeOrg)
  def listGrants: Seq[ExternalGrant] = grants.toSeq
  def externalCanRead(orgName: String, feature: String,
      now: Instant = Instant.now()): Boolean =
    grants.exists(g => g.granteeOrg == orgName && g.active(now) && g.covers(feature))
}

/** In-memory store: org → domain → project → groups (client.py surface). */
final class FeatureStore {
  private val groups =
    scala.collection.mutable.LinkedHashMap.empty[String, FeatureGroup]
  val audit = new AuditLog

  def createGroup(org: String, domain: String, project: String, name: String,
      entityKey: Option[String] = None,
      entityDtype: Option[String] = None,
      acl: AccessControl = AccessControl(),
      actor: String = "system"): FeatureGroup = {
    val g = new FeatureGroup(org, domain, project, name, entityKey,
      entityDtype.map(FeatureType.parse), acl)
    require(!groups.contains(g.qualifiedName), s"Group exists: ${g.qualifiedName}")
    groups(g.qualifiedName) = g
    audit.record(AuditEntry(actor = actor, action = "create_feature_group",
      category = "write", resource = g.qualifiedName, resourceOrg = org))
    g
  }

  def group(qualified: String): FeatureGroup = groups(qualified)
  def listGroups: Seq[FeatureGroup] = groups.values.toSeq

  /** [[MetaCatalog.load]] hook: attach a reconstructed group without
    * re-recording a creation audit entry (the loaded audit table IS
    * the history). */
  private[meta] def restoreGroup(g: FeatureGroup): Unit = {
    require(!groups.contains(g.qualifiedName),
      s"Group exists: ${g.qualifiedName}")
    groups(g.qualifiedName) = g
  }

  /** search by name substring / dtype / tags (client.py:502-552). */
  def searchFeatures(query: String = "", dtype: Option[String] = None,
      tags: Set[String] = Set.empty, limit: Int = 50): Seq[(FeatureGroup, Feature)] =
    groups.values.iterator.flatMap { g =>
      g.listFeatures.iterator
        .filter(f => query.isEmpty || f.name.contains(query))
        .filter(f => dtype.forall { d =>
          if (d.endsWith("*")) f.dtype.typeString.startsWith(d.dropRight(1))
          else f.dtype.typeString == d
        })
        .filter(f => tags.isEmpty || tags.subsetOf(f.tags))
        .map(g -> _)
    }.take(limit).toSeq
}

/** Lineage graph derived from derived_from references (lineage.py:156-338). */
object Lineage {
  /** upstream edges: feature → features it reads. */
  def upstream(store: FeatureStore, group: FeatureGroup, feature: String,
      spark: org.apache.spark.sql.SparkSession): Seq[String] =
    group.feature(feature).derivedFrom.toSeq.flatMap { e =>
      graft.expr.ExpressionValidator.parse(spark, e).toOption.toSeq
        .flatMap(graft.expr.ExpressionValidator.references)
    }

  /** transitive closure over a dependency map. */
  def transitive(deps: Map[String, Seq[String]], start: String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    def go(n: String): Unit =
      deps.getOrElse(n, Nil).foreach { m =>
        if (seen.add(m)) go(m)
      }
    go(start)
    seen.toSeq
  }

  def downstream(deps: Map[String, Seq[String]], target: String): Seq[String] =
    deps.collect { case (k, vs) if vs.contains(target) => k }.toSeq
}

/** Audit entry (audit.py:38-78; 16 fields condensed to the used subset). */
final case class AuditEntry(
    id: String = java.util.UUID.randomUUID().toString,
    timestamp: Instant = Instant.now(),
    actor: String,
    actorOrg: Option[String] = None,
    action: String,
    category: String,
    resource: String,
    resourceOrg: String,
    success: Boolean = true,
    detail: Option[String] = None)

/**
 * Declarative audit filter (audit.py:127-180) — the query object audit
 * alerts and exports are keyed by. Field-for-field the reference's
 * AuditQuery: `actions` is a LIST (any-of), `resource` supports a
 * trailing `*` wildcard, and actorOrg/excludeActorOrgs are both
 * honored. `matches` is the driver-side per-entry predicate alerts
 * evaluate on record; [[AuditLog.queryFrame]] applies the same
 * semantics as pushed-down Column filters for bulk scans.
 */
final case class AuditQuery(
    resource: Option[String] = None, // trailing-* wildcard supported
    actions: Seq[String] = Nil,
    category: Option[String] = None,
    actor: Option[String] = None,
    actorOrg: Option[String] = None,
    excludeActorOrgs: Set[String] = Set.empty,
    since: Option[Instant] = None,
    until: Option[Instant] = None,
    limit: Int = 100) {
  def matches(e: AuditEntry): Boolean =
    resource.forall { r =>
      if (r.endsWith("*")) e.resource.startsWith(r.dropRight(1))
      else e.resource == r
    } &&
      (actions.isEmpty || actions.contains(e.action)) &&
      category.forall(_ == e.category) &&
      actor.forall(_ == e.actor) &&
      actorOrg.forall(o => e.actorOrg.contains(o)) &&
      e.actorOrg.forall(o => !excludeActorOrgs.contains(o)) &&
      since.forall(s => !e.timestamp.isBefore(s)) &&
      until.forall(u => e.timestamp.isBefore(u))
}

/**
 * Alert configuration over audit events (audit.py:200-251): fires a
 * notification record whenever a matching entry is recorded.
 */
final case class AuditAlert(
    name: String,
    query: AuditQuery,
    notifyTargets: Seq[String], // reference field `notify` (clashes with Object.notify)
    channels: Seq[String] = Seq("email"),
    enabled: Boolean = true,
    createdAt: Option[Instant] = None,
    createdBy: Option[String] = None)

/** A fired alert notification: which alert, on which entry. */
final case class AuditAlertEvent(alert: String, entry: AuditEntry,
    channels: Seq[String], notifyTargets: Seq[String])

/**
 * Organization-level audit configuration (audit.py:256-286):
 * retention window, immutability, and the export destination expired
 * rows are archived to before deletion.
 */
final case class AuditConfig(
    retentionDays: Int = 365,
    immutable: Boolean = true,
    exportDestination: Option[String] = None) {
  require(retentionDays > 0, s"retentionDays > 0, got $retentionDays")
}

/** What [[AuditLog.applyRetention]] did: rows kept vs archived. */
final case class RetentionReport(expired: Long, kept: Long,
    exportedTo: Option[String])

/**
 * Append-only audit log; Spark-exportable (audit.py:303-477 — the
 * reference's query returns mock-empty; this one is real).
 *
 * Scale contract (raise_/PRD.md:2773 targets 100M audit events/day): a
 * catalog reload does NOT materialize the persisted history on the
 * driver. [[attachPersisted]] keeps it as a lazy parquet-backed
 * DataFrame; [[query]] pushes every filter into the scan and collects
 * only matching rows; [[toDataFrame]]/[[export]] union the lazy base
 * with the in-memory tail without ever collecting either.
 */
final class AuditLog(
    // Bounded fired-alert ring: a broad alert at the PRD's
    // 100M-events/day scale must not grow driver memory without limit —
    // once full, the OLDEST events are dropped (and counted via
    // [[droppedAlerts]]) so the tail holds the most recent notifications.
    // Dispatchers that need every event should [[drainFiredAlerts]] on
    // their own cadence.
    val maxFiredAlertEvents: Int = 10000) {
  import org.apache.spark.sql.{DataFrame, Row, SparkSession}
  import org.apache.spark.sql.functions.{col, lit, not}

  private val entries = scala.collection.mutable.ArrayBuffer.empty[AuditEntry]
  // (session, parquet path) of the persisted history; entries above hold
  // only what was recorded AFTER attach
  @volatile private var persisted: Option[(SparkSession, String)] = None

  def record(e: AuditEntry): Unit = synchronized {
    entries += e
    // alert evaluation is O(#alerts) driver arithmetic per entry —
    // enabled alerts fire a notification record (audit.py:203-205)
    alerts.valuesIterator.foreach { a =>
      if (a.enabled && a.query.matches(e))
        alertEvents += AuditAlertEvent(a.name, e, a.channels, a.notifyTargets)
    }
    if (alertEvents.length > maxFiredAlertEvents) {
      val drop = alertEvents.length - maxFiredAlertEvents
      alertEvents.remove(0, drop)
      alertEventsDropped += drop
    }
  }

  /** Back this log with an already-persisted parquet audit table (lazy —
    * nothing is read until a query/export needs it). */
  def attachPersisted(spark: SparkSession, path: String): Unit =
    persisted = Some((spark, path))

  private def persistedDf: Option[DataFrame] =
    persisted.map { case (s, p) => s.read.parquet(p) }

  private def rowToEntry(r: Row): AuditEntry = AuditEntry(
    id = r.getAs[String]("id"),
    timestamp = Instant.parse(r.getAs[String]("timestamp")),
    actor = r.getAs[String]("actor"),
    actorOrg = Option(r.getAs[String]("actor_org")),
    action = r.getAs[String]("action"),
    category = r.getAs[String]("category"),
    resource = r.getAs[String]("resource"),
    resourceOrg = r.getAs[String]("resource_org"),
    success = r.getAs[Boolean]("success"),
    detail = Option(r.getAs[String]("detail")))

  /**
   * DataFrame-first query surface: the persisted base ∪ in-memory tail
   * with every predicate applied as a Column filter — equality and
   * startsWith push down to the parquet scan, NOTHING is collected.
   * This is the API for broad queries over the attached history (the
   * PRD's 100M-events/day scale, raise_/PRD.md:2773): compose, limit,
   * aggregate or export the returned frame; the driver only
   * materializes what the caller explicitly collects.
   */
  def queryFrame(spark: SparkSession,
      actor: Option[String] = None,
      action: Option[String] = None,
      category: Option[String] = None,
      resource: Option[String] = None, // trailing-* wildcard supported
      excludeActorOrgs: Set[String] = Set.empty,
      since: Option[Instant] = None,
      until: Option[Instant] = None): DataFrame =
    queryFrameOver(toDataFrame(spark), actor, action, category,
      resource, excludeActorOrgs, since, until)

  /**
   * Entry-object query. With a persisted base attached this delegates
   * to [[queryFrame]] and collects AT MOST `maxRows` matches (the
   * limit rides the plan — the driver never receives the unfiltered
   * history); a match count beyond `maxRows` fails loudly instead of
   * silently truncating — narrow the filters, or use [[queryFrame]] /
   * [[export]] for result sets that belong in Spark.
   */
  def query(
      actor: Option[String] = None,
      action: Option[String] = None,
      category: Option[String] = None,
      resource: Option[String] = None, // trailing-* wildcard supported
      excludeActorOrgs: Set[String] = Set.empty,
      since: Option[Instant] = None,
      until: Option[Instant] = None,
      maxRows: Int = 100000): Seq[AuditEntry] = {
    val mem = synchronized { entries.toVector }
      .filter(e => actor.forall(_ == e.actor))
      .filter(e => action.forall(_ == e.action))
      .filter(e => category.forall(_ == e.category))
      .filter(e => resource.forall { r =>
        if (r.endsWith("*")) e.resource.startsWith(r.dropRight(1))
        else e.resource == r
      })
      .filter(e => e.actorOrg.forall(o => !excludeActorOrgs.contains(o)))
      .filter(e => since.forall(s => !e.timestamp.isBefore(s)))
      .filter(e => until.forall(u => e.timestamp.isBefore(u)))
    persisted match {
      case None => mem
      case Some((spark, path)) =>
        // persisted side only — the tail is filtered in memory above,
        // keeping the historical (store-sorted ++ tail) return order
        val base = spark.read.parquet(path)
        val filtered = queryFrameOver(base, actor, action, category,
          resource, excludeActorOrgs, since, until)
        val rows = filtered.orderBy(col("timestamp")).take(maxRows + 1)
        if (rows.length > maxRows)
          throw new IllegalArgumentException(
            s"audit query matched more than $maxRows rows; narrow the " +
              "filters or use queryFrame/export for large result sets")
        rows.map(rowToEntry).toSeq ++ mem
    }
  }

  /** Column-filter application shared by [[queryFrame]] and [[query]]. */
  private def queryFrameOver(df0: DataFrame,
      actor: Option[String], action: Option[String],
      category: Option[String], resource: Option[String],
      excludeActorOrgs: Set[String], since: Option[Instant],
      until: Option[Instant]): DataFrame = {
    var d = df0
    actor.foreach(a => d = d.where(col("actor") === a))
    action.foreach(a => d = d.where(col("action") === a))
    category.foreach(c => d = d.where(col("category") === c))
    resource.foreach { r =>
      d = if (r.endsWith("*"))
        d.where(col("resource").startsWith(r.dropRight(1)))
      else d.where(col("resource") === r)
    }
    if (excludeActorOrgs.nonEmpty)
      d = d.where(col("actor_org").isNull ||
        not(col("actor_org").isin(excludeActorOrgs.toSeq: _*)))
    val ts = col("timestamp").cast("timestamp")
    since.foreach(s => d = d.where(
      ts >= lit(java.sql.Timestamp.from(s))))
    until.foreach(u => d = d.where(
      ts < lit(java.sql.Timestamp.from(u))))
    d
  }

  /** In-memory tail only (entries recorded since attach, or all when
    * never attached). */
  private def memDataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized {
      entries.toSeq.map(e => (e.id, e.timestamp.toString, e.actor,
        e.actorOrg.orNull, e.action, e.category, e.resource, e.resourceOrg,
        e.success, e.detail.orNull))
    }.toDF("id", "timestamp", "actor", "actor_org", "action", "category",
      "resource", "resource_org", "success", "detail")
  }

  /** Export to a Spark DataFrame (→ jsonl/csv/parquet; audit.py:396-425).
    * Persisted base (lazy) ∪ in-memory tail — no driver materialization. */
  def toDataFrame(spark: SparkSession): DataFrame =
    persistedDf.map(_.unionByName(memDataFrame(spark)))
      .getOrElse(memDataFrame(spark))

  def export(spark: SparkSession, path: String, format: String = "json"): Unit =
    toDataFrame(spark).write.mode("overwrite").format(format).save(path)

  /** Persist the full log (base ∪ tail) as parquet at `path`.
    *
    * When the attached base IS `path`, a direct overwrite would delete
    * the files mid-read; stage to a sibling dir and swap instead, then
    * re-attach to the fresh files with an emptied in-memory tail (the
    * tail is now part of the base).
    *
    * Crash ordering: the live base is renamed ASIDE (`path + "_old"`)
    * before the staged dir is promoted, and deleted only after the
    * promotion succeeds — at every instant either the live dir or the
    * aside copy holds complete data (recovery from a crash between the
    * renames: restore `_old` — or promote `_staged`, which the marker
    * of completeness is the rename itself having vacated it). */
  def saveTo(spark: SparkSession, path: String): Unit = synchronized {
    persisted match {
      case None =>
        memDataFrame(spark).coalesce(1).write.mode("overwrite").parquet(path)
      case Some((_, base)) =>
        val staged = path + "_staged"
        toDataFrame(spark).write.mode("overwrite").parquet(staged)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(): Unit
        }
        val dst = new java.io.File(path)
        val aside = new java.io.File(path + "_old")
        if (aside.exists) rm(aside)
        if (dst.exists && !dst.renameTo(aside))
          throw new java.io.IOException(
            s"audit swap failed: $path → ${aside.getPath}")
        if (!new java.io.File(staged).renameTo(dst)) {
          // restore the aside copy so the live path stays populated
          if (aside.exists) aside.renameTo(dst)
          throw new java.io.IOException(s"audit swap failed: $staged → $path")
        }
        rm(aside)
        entries.clear()
        persisted = Some((spark, path))
        // base == path or not, the new files are authoritative now
        locally(base): Unit
    }
  }

  // ---------------------------------------------------------- alerts
  // (audit.py:349-392 create/list/get/delete; fired events recorded)

  private val alerts =
    scala.collection.mutable.LinkedHashMap.empty[String, AuditAlert]
  private val alertEvents =
    scala.collection.mutable.ArrayBuffer.empty[AuditAlertEvent]
  private var alertEventsDropped: Long = 0L

  def createAlert(name: String, query: AuditQuery, notifyTargets: Seq[String],
      channels: Seq[String] = Seq("email"),
      createdBy: Option[String] = None): AuditAlert = synchronized {
    require(notifyTargets.nonEmpty, "alert needs at least one notify target")
    val a = AuditAlert(name, query, notifyTargets, channels, enabled = true,
      createdAt = Some(Instant.now()), createdBy = createdBy)
    alerts(name) = a
    a
  }
  def listAlerts: Seq[AuditAlert] = synchronized { alerts.values.toSeq }
  def getAlert(name: String): Option[AuditAlert] =
    synchronized { alerts.get(name) }
  def deleteAlert(name: String): Boolean =
    synchronized { alerts.remove(name).isDefined }
  def setAlertEnabled(name: String, enabled: Boolean): Unit = synchronized {
    alerts.get(name).foreach(a => alerts(name) = a.copy(enabled = enabled))
  }
  /** Retained notifications (record order; oldest beyond
    * [[maxFiredAlertEvents]] have been dropped — see [[droppedAlerts]]). */
  def firedAlerts: Seq[AuditAlertEvent] = synchronized { alertEvents.toSeq }
  /** How many fired events the bounded buffer has discarded so far. */
  def droppedAlerts: Long = synchronized { alertEventsDropped }
  /** Return all retained fired events and clear the buffer — the
    * at-most-once consumption API for notification dispatchers. */
  def drainFiredAlerts(): Seq[AuditAlertEvent] = synchronized {
    val out = alertEvents.toSeq
    alertEvents.clear()
    out
  }

  // ------------------------------------------------------- retention
  // (audit.py:256-286 AuditConfig; enforcement is Spark-side)

  @volatile var config: AuditConfig = AuditConfig()

  /**
   * Enforce `config.retentionDays` as of `now`: rows older than the
   * cutoff are archived to `config.exportDestination` (parquet, one
   * timestamped subdir per sweep) when set, then dropped from both the
   * in-memory tail and the persisted base. The expired split is ONE
   * timestamp-predicate scan (pushed to parquet row-group stats on a
   * time-ordered log), the keep-side rewrite reuses the staged-swap
   * path of [[saveTo]] — never a driver materialization.
   *
   * `config.immutable` does NOT block retention (the reference's
   * immutability governs ad-hoc modification/deletion; retention is
   * the org policy) — see [[truncate]], which immutability does block.
   */
  def applyRetention(spark: SparkSession,
      now: Instant = Instant.now()): RetentionReport = synchronized {
    val cutoff = now.minus(java.time.Duration.ofDays(config.retentionDays.toLong))
    val cutTs = java.sql.Timestamp.from(cutoff)
    val all = toDataFrame(spark)
    val ts = col("timestamp").cast("timestamp")
    val expired = all.where(ts < lit(cutTs))
    val nExpired = expired.count()
    // kept is always the REAL surviving count (never a sentinel):
    // callers sum it across sweeps, so the no-op path pays one count
    // of the (small, time-pruned) log rather than handing back -1
    if (nExpired == 0) return RetentionReport(0L, all.count(), None)
    val dest = config.exportDestination.map { d =>
      val out = s"$d/expired_${now.toEpochMilli}"
      expired.write.mode("overwrite").parquet(out)
      out
    }
    // keep side: filter the in-memory tail, rewrite the persisted base
    entries.filterInPlace(e => !e.timestamp.isBefore(cutoff))
    persisted match {
      case Some((s, path)) =>
        val staged = path + "_staged"
        s.read.parquet(path).where(ts >= lit(cutTs))
          .write.mode("overwrite").parquet(staged)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(): Unit
        }
        val dst = new java.io.File(path)
        val aside = new java.io.File(path + "_old")
        if (aside.exists) rm(aside)
        if (dst.exists && !dst.renameTo(aside))
          throw new java.io.IOException(s"retention swap failed: $path")
        if (!new java.io.File(staged).renameTo(dst)) {
          if (aside.exists) aside.renameTo(dst)
          throw new java.io.IOException(s"retention swap failed: $staged")
        }
        rm(aside)
      case None => ()
    }
    val kept = toDataFrame(spark).count()
    RetentionReport(nExpired, kept, dest)
  }

  /** Hard-delete everything — the "modify/delete" the immutable flag
    * exists to forbid (audit.py:264 `immutable`). */
  def truncate(): Unit = synchronized {
    if (config.immutable)
      throw new UnsupportedOperationException(
        "audit log is immutable (AuditConfig.immutable=true)")
    entries.clear()
    persisted = None
  }

  // ---------------------------------------------------- query object
  // (audit.py:303-347 query + 428-460 AuditStream)

  /** [[queryFrame]] driven by a declarative [[AuditQuery]] — adds the
    * reference's any-of `actions` and `actorOrg` filters on top of the
    * base column pushdowns. */
  def queryFrame(spark: SparkSession, q: AuditQuery): DataFrame = {
    var d = queryFrame(spark, actor = q.actor, category = q.category,
      resource = q.resource, excludeActorOrgs = q.excludeActorOrgs,
      since = q.since, until = q.until)
    if (q.actions.nonEmpty) d = d.where(col("action").isin(q.actions: _*))
    q.actorOrg.foreach(o => d = d.where(col("actor_org") === o))
    d
  }

  /** Limit-respecting entry query over an [[AuditQuery]]
    * (audit.py:303-347): at most `q.limit` rows cross to the driver. */
  def query(spark: SparkSession, q: AuditQuery): Seq[AuditEntry] =
    queryFrame(spark, q).orderBy(col("timestamp")).limit(q.limit)
      .collect().map(rowToEntry).toSeq

  /** Streamed batches for large exports (audit.py:428-460
    * AuditStream.batches): a `toLocalIterator` over the pushed-down
    * scan — one partition in driver memory at a time, never the log. */
  def streamBatches(spark: SparkSession, q: AuditQuery,
      size: Int = 1000): Iterator[Seq[AuditEntry]] = {
    import scala.jdk.CollectionConverters._
    queryFrame(spark, q).toLocalIterator().asScala
      .map(rowToEntry).grouped(size).map(_.toSeq)
  }
}
