package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.types._
import graft.expr.{ExpressionValidator, FeatureRef}
import graft.analysis.Stats

/** Pure-Scala core: type system, reference grammar, cycle detection, stats. */
class CoreSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- types

  test("dtype parse round-trips the grammar") {
    val cases = Seq(
      "int64", "float32", "float64", "bool", "string", "bytes", "timestamp",
      "string[64]", "float32[128]", "float16[8]", "int64[]", "float64[]",
      "int64[:10]", "blob_ref", "blob_ref<image/png|image/jpeg>",
      "struct<a: int64, b: string>")
    cases.foreach { s =>
      assert(FeatureType.parse(s).typeString == s, s"round-trip failed for $s")
    }
  }

  test("nested struct / array parse") {
    val t = FeatureType.parse("struct<xs: float32[4], meta: struct<k: string>>")
    assert(t == TStruct(Seq(
      "xs" -> TEmbedding("float32", 4),
      "meta" -> TStruct(Seq("k" -> TString(None))))))
  }

  test("embedding dim must be positive") {
    intercept[IllegalArgumentException](FeatureType.parse("float32[0]"))
  }

  test("unknown dtype rejected") {
    intercept[IllegalArgumentException](FeatureType.parse("decimal(10,2)"))
  }

  test("numeric compatibility: ints fit float columns, not vice versa") {
    assert(TFloat64.isCompatible(TInt64))
    assert(TFloat32.isCompatible(TInt64))
    assert(!TInt64.isCompatible(TFloat32))
  }

  test("string[N] accepts only tighter bounds") {
    assert(TString(Some(64)).isCompatible(TString(Some(32))))
    assert(!TString(Some(32)).isCompatible(TString(Some(64))))
    assert(!TString(Some(32)).isCompatible(TString(None)))
    assert(TString(None).isCompatible(TString(Some(999))))
  }

  test("embedding compat requires equal dim+dtype") {
    assert(TEmbedding("float32", 8).isCompatible(TEmbedding("float32", 8)))
    assert(!TEmbedding("float32", 8).isCompatible(TEmbedding("float32", 16)))
    assert(!TEmbedding("float32", 8).isCompatible(TEmbedding("float64", 8)))
  }

  test("blob_ref content-type subset compat + wildcard accepts") {
    val img = TBlobRef(Seq("image/png", "image/jpeg"))
    assert(TBlobRef(Nil).isCompatible(img))
    assert(img.isCompatible(TBlobRef(Seq("image/png"))))
    assert(!img.isCompatible(TBlobRef(Seq("video/mp4"))))
    val any = TBlobRef(Seq("image/*"))
    assert(any.accepts("image/webp"))
    assert(!any.accepts("audio/wav"))
  }

  test("binary-op result type promotion (types.py:333-365)") {
    import FeatureType.inferResultType
    assert(inferResultType(TInt64, "+", TInt64) == TInt64)
    assert(inferResultType(TInt64, "/", TInt64) == TFloat64)
    assert(inferResultType(TFloat32, "+", TInt64) == TFloat32)
    assert(inferResultType(TFloat64, "*", TFloat32) == TFloat64)
    assert(inferResultType(TInt64, "<", TInt64) == TBool)
    assert(inferResultType(TString(None), "||", TString(None)) == TString(None))
  }

  // -------------------------------------------------------- feature refs

  test("reference grammar: all 5 forms + version pin (lineage.py:24-141)") {
    assert(FeatureRef.parse("clicks") ==
      FeatureRef(None, None, None, None, "clicks", None))
    assert(FeatureRef.parse("signals.clicks") ==
      FeatureRef(None, None, None, Some("signals"), "clicks", None))
    assert(FeatureRef.parse("proj/signals.clicks") ==
      FeatureRef(None, None, Some("proj"), Some("signals"), "clicks", None))
    assert(FeatureRef.parse("dom/proj/signals.clicks") ==
      FeatureRef(None, Some("dom"), Some("proj"), Some("signals"), "clicks", None))
    assert(FeatureRef.parse("@acme/dom/proj/signals.clicks@v3") ==
      FeatureRef(Some("acme"), Some("dom"), Some("proj"), Some("signals"),
        "clicks", Some(3)))
  }

  test("reference qualification falls back to context") {
    val r = FeatureRef.parse("signals.clicks")
    assert(r.qualified("o", "d", "p", "g") == "o/d/p/signals/clicks")
  }

  // ---------------------------------------------------- cycle detection

  test("cycle detection finds a → b → c → a") {
    val deps = Map("a" -> Seq("b"), "b" -> Seq("c"), "c" -> Seq("a"))
    assert(ExpressionValidator.findCycle(deps).isDefined)
  }

  test("acyclic DAG has no cycle") {
    val deps = Map("a" -> Seq("b", "c"), "b" -> Seq("c"), "c" -> Seq.empty[String])
    assert(ExpressionValidator.findCycle(deps).isEmpty)
  }

  test("did-you-mean suggestions") {
    assert(ExpressionValidator.suggest("revnue", Set("revenue", "clicks"))
      .contains("revenue"))
    assert(ExpressionValidator.suggest("zzz", Set("revenue")).isEmpty)
  }

  // ---------------------------------------------------------------- stats

  test("t-test p-values match published tables") {
    assert(math.abs(Stats.tTestPValue(2.0, 10) - 0.07339) < 1e-4)
    assert(math.abs(Stats.tTestPValue(2.228, 10) - 0.05) < 1e-3)
  }

  test("chi2 / normal / F p-values match tables") {
    assert(math.abs(Stats.chi2PValue(3.841, 1) - 0.05) < 1e-3)
    assert(math.abs(Stats.normalCdf(1.959964) - 0.975) < 1e-6)
    assert(math.abs(Stats.zTestPValue(1.959964) - 0.05) < 1e-5)
    assert(math.abs(Stats.fTestPValue(4.103, 2, 10) - 0.05) < 2e-3)
  }

  test("inverse t CDF inverts the CDF") {
    val t = Stats.inverseTCdf(0.975, 10)
    assert(math.abs(t - 2.2281) < 1e-3)
  }

  test("KS p-value: small D on large n is insignificant, large D significant") {
    assert(Stats.ksPValue(0.01, 1000, 1000) > 0.9)
    assert(Stats.ksPValue(0.5, 1000, 1000) < 1e-6)
  }

  // --------------------------------------------------------------- alerts

  test("alert condition operator table (alert.py:62-107)") {
    import graft.alerts._
    assert(Cmp("psi", "gt", 0.2).eval(0.3))
    assert(!Cmp("psi", "gt", 0.2).eval(0.1))
    assert(Cmp("x", "lte", 5).eval(5))
    assert(Between("x", 1, 2).eval(1.5))
    assert(!Between("x", 1, 2, inside = false).eval(1.5))
    assert(Between("x", 1, 2, inside = false).eval(3))
    val a = new Alert("drift", Condition.psiGt(0.2))
    assert(a.check(Map("psi" -> 0.5)).fired)
    assert(!a.check(Map("psi" -> 0.1)).fired)
    intercept[NoSuchElementException](a.check(Map("other" -> 1.0)))
  }

  // ------------------------------------------------------------ dashboards

  test("dashboard JSON renders and is parseable-ish") {
    import graft.dash._
    val d = Dashboard("d1", "My \"Dash\"")
      .withChart(Chart("Revenue", ChartType.Line, "q01_agg_group",
        x = Some("day"), y = Seq("revenue")))
      .publish
    val js = d.toJson
    assert(js.contains("\"published\":true"))
    assert(js.contains("\\\"Dash\\\""))
    assert(js.contains("\"type\":\"line\""))
    val html = d.toHtml(Map("q01_agg_group" ->
      Seq(Map("day" -> "2024-01-01", "revenue" -> 10))))
    assert(html.contains("<table>") && html.contains("Revenue"))
  }

  // ----------------------------------------------------------------- meta

  test("feature versioning: auto v{n+1}, @vN resolution, if_exists modes") {
    import graft.meta._
    val fs = new FeatureStore
    val g = fs.createGroup("acme", "growth", "core", "signals",
      entityKey = Some("user_id"))
    val f1 = g.createFeature("clicks", "int64")
    assert(f1.version == 1)
    intercept[IllegalStateException](g.createFeature("clicks", "int64"))
    val f1again = g.createFeature("clicks", "int64", ifExists = IfExists.Skip)
    assert(f1again.version == 1)
    val f2 = g.createFeature("clicks", "float64", ifExists = IfExists.Update)
    assert(f2.version == 2)
    assert(g.feature("clicks").version == 2)
    assert(g.feature("clicks@v1").dtype == TInt64)
    assert(g.listVersions("clicks").map(_.version) == Seq(1, 2))
    intercept[NoSuchElementException](g.feature("clicks@v9"))
    intercept[NoSuchElementException](g.feature("nope"))
  }

  test("ACL merge/cascade/effective (acl.py:51-129)") {
    import graft.meta._
    val group = AccessControl(readers = Set("alice"), writers = Set("bob"))
    val feature = AccessControl(readers = Set("carol"))
    val eff = group.merged(feature)
    assert(eff.canRead("carol") && !eff.canRead("alice")) // child overrides
    assert(eff.canWrite("bob")) // parent fills empty child role
    assert(AccessControl(admins = Set("root")).canRead("root")) // admin ⊃ write ⊃ read
    assert(AccessControl(readers = Set("*")).canRead("anyone"))
  }

  test("external grants: wildcard, coverage, expiry (acl.py:151-205)") {
    import graft.meta._
    import java.time.Instant
    val fs = new FeatureStore
    val g = fs.createGroup("acme", "d", "p", "g2")
    g.createFeature("a", "int64")
    g.grant(ExternalGrant("partner", Set("*")))
    assert(g.externalCanRead("partner", "a"))
    assert(!g.externalCanRead("rando", "a"))
    g.grant(ExternalGrant("timed", Set("a"),
      expiresAt = Some(Instant.now().minusSeconds(60))))
    assert(!g.externalCanRead("timed", "a")) // expired
    g.revoke("partner")
    assert(!g.externalCanRead("partner", "a"))
  }

  test("search features by name/dtype-wildcard/tags (client.py:502-552)") {
    import graft.meta._
    val fs = new FeatureStore
    val g = fs.createGroup("o", "d", "p", "g")
    g.createFeature("click_count", "int64", tags = Set("engagement"))
    g.createFeature("embedding", "float32[16]")
    assert(fs.searchFeatures(query = "click").map(_._2.name) == Seq("click_count"))
    assert(fs.searchFeatures(dtype = Some("float32[*")).map(_._2.name) == Seq("embedding"))
    assert(fs.searchFeatures(tags = Set("engagement")).map(_._2.name) == Seq("click_count"))
  }

  test("audit log records and filters (audit.py:126-155)") {
    import graft.meta._
    val fs = new FeatureStore
    fs.createGroup("acme", "d", "p", "g", actor = "alice")
    fs.audit.record(AuditEntry(actor = "bob", actorOrg = Some("evil"),
      action = "read_feature", category = "read",
      resource = "acme/d/p/g/x", resourceOrg = "acme"))
    assert(fs.audit.query(actor = Some("alice")).size == 1)
    assert(fs.audit.query(resource = Some("acme/d/p/*")).size == 2)
    assert(fs.audit.query(excludeActorOrgs = Set("evil")).size == 1)
    assert(fs.audit.query(category = Some("read")).size == 1)
  }

  test("audit alerts fire on matching entries (audit.py:200-251, 349-392)") {
    import graft.meta._
    val log = new AuditLog
    val q = AuditQuery(resource = Some("acme/d/p/*"),
      actions = Seq("delete_feature", "update_acl"))
    val a = log.createAlert("sensitive-writes", q,
      notifyTargets = Seq("sec@acme.test"), channels = Seq("email", "slack"),
      createdBy = Some("alice"))
    assert(a.enabled && a.createdAt.isDefined)
    assert(log.listAlerts.map(_.name) == Seq("sensitive-writes"))
    assert(log.getAlert("sensitive-writes").contains(a))
    // matching action+resource fires; others don't
    log.record(AuditEntry(actor = "bob", action = "delete_feature",
      category = "write", resource = "acme/d/p/g/x", resourceOrg = "acme"))
    log.record(AuditEntry(actor = "bob", action = "read_feature",
      category = "read", resource = "acme/d/p/g/x", resourceOrg = "acme"))
    log.record(AuditEntry(actor = "bob", action = "update_acl",
      category = "admin", resource = "other/d/p/g", resourceOrg = "other"))
    assert(log.firedAlerts.map(_.alert) == Seq("sensitive-writes"))
    assert(log.firedAlerts.head.entry.action == "delete_feature")
    assert(log.firedAlerts.head.notifyTargets == Seq("sec@acme.test"))
    // disabled alert is silent; re-enabled fires again
    log.setAlertEnabled("sensitive-writes", enabled = false)
    log.record(AuditEntry(actor = "bob", action = "update_acl",
      category = "admin", resource = "acme/d/p/g", resourceOrg = "acme"))
    assert(log.firedAlerts.size == 1)
    log.setAlertEnabled("sensitive-writes", enabled = true)
    log.record(AuditEntry(actor = "bob", action = "update_acl",
      category = "admin", resource = "acme/d/p/g", resourceOrg = "acme"))
    assert(log.firedAlerts.size == 2)
    assert(log.deleteAlert("sensitive-writes"))
    assert(!log.deleteAlert("sensitive-writes") && log.listAlerts.isEmpty)
  }

  test("fired-alert buffer is bounded and drainable") {
    import graft.meta._
    val log = new AuditLog(maxFiredAlertEvents = 5)
    log.createAlert("all-writes", AuditQuery(category = Some("write")),
      notifyTargets = Seq("ops@acme.test"))
    (1 to 8).foreach(i => log.record(AuditEntry(actor = s"a$i",
      action = "write_feature", category = "write",
      resource = "o/d/p/g", resourceOrg = "o")))
    // ring keeps the 5 NEWEST events; 3 oldest dropped and counted
    assert(log.firedAlerts.size == 5)
    assert(log.firedAlerts.map(_.entry.actor) ==
      (4 to 8).map(i => s"a$i"))
    assert(log.droppedAlerts == 3L)
    // drain returns the retained tail and clears it (at-most-once)
    assert(log.drainFiredAlerts().size == 5)
    assert(log.firedAlerts.isEmpty && log.drainFiredAlerts().isEmpty)
    // post-drain fires accumulate again from empty
    log.record(AuditEntry(actor = "a9", action = "write_feature",
      category = "write", resource = "o/d/p/g", resourceOrg = "o"))
    assert(log.firedAlerts.map(_.entry.actor) == Seq("a9"))
  }

  test("AuditQuery.matches honors actor_org and exclusions (audit.py:127-180)") {
    import graft.meta._
    val e = AuditEntry(actor = "bob", actorOrg = Some("partner"),
      action = "read_feature", category = "read",
      resource = "acme/d/p/g/x", resourceOrg = "acme")
    assert(AuditQuery(actorOrg = Some("partner")).matches(e))
    assert(!AuditQuery(actorOrg = Some("acme")).matches(e))
    assert(!AuditQuery(excludeActorOrgs = Set("partner")).matches(e))
    assert(AuditQuery(excludeActorOrgs = Set("evil")).matches(e))
    assert(AuditQuery(since = Some(e.timestamp)).matches(e))
    assert(!AuditQuery(until = Some(e.timestamp)).matches(e))
  }

  test("audit config: immutable blocks truncate (audit.py:256-286)") {
    import graft.meta._
    val log = new AuditLog
    log.record(AuditEntry(actor = "a", action = "x", category = "write",
      resource = "r", resourceOrg = "o"))
    assert(log.config.immutable && log.config.retentionDays == 365)
    intercept[UnsupportedOperationException](log.truncate())
    log.config = AuditConfig(immutable = false)
    log.truncate()
    assert(log.query().isEmpty)
  }

  test("lineage transitive closure + downstream") {
    import graft.meta.Lineage
    val deps = Map("ctr" -> Seq("clicks", "views"), "score" -> Seq("ctr"))
    assert(Lineage.transitive(deps, "score").toSet == Set("ctr", "clicks", "views"))
    assert(Lineage.downstream(deps, "ctr") == Seq("score"))
  }
}
