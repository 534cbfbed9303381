package graft.expr

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Derived-feature expression front end. The reference validates
 * expressions with a hand-rolled regex pipeline
 * (raise_/validation/validator.py:180-316); here parsing is delegated to
 * Spark's SQL parser and the checks walk the real AST:
 *
 *  - syntax (parse errors, unbalanced parens) → Catalyst parser
 *  - reference extraction → `UnresolvedAttribute` leaves
 *  - unknown functions → `UnresolvedFunction` not in the session registry
 *  - type inference → resolve against the group's schema (LocalRelation)
 *  - division-without-NULLIF warning (validator.py:268-274)
 *  - strictness levels strict/standard/permissive (validator.py:319-351)
 *  - cycle detection over the feature registry (validator.py:354-426)
 */
object ExpressionValidator {

  final case class Issue(code: String, message: String, isError: Boolean)

  final case class Result(
      valid: Boolean,
      references: Seq[String],
      resultType: Option[DataType],
      issues: Seq[Issue]) {
    def errors: Seq[Issue] = issues.filter(_.isError)
    def warnings: Seq[Issue] = issues.filterNot(_.isError)
  }

  sealed trait Level
  case object Strict extends Level     // warnings are errors
  case object Standard extends Level
  case object Permissive extends Level // unknown refs tolerated

  /** did-you-mean: smallest edit distance among candidates, ≤2 edits. */
  def suggest(name: String, known: Iterable[String]): Option[String] =
    known
      .map(k => k -> levenshtein(name.toLowerCase, k.toLowerCase))
      .filter(_._2 <= 2)
      .minByOption(_._2)
      .map(_._1)

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  def parse(spark: SparkSession, exprStr: String): Try[Expression] =
    if (exprStr == null || exprStr.trim.isEmpty)
      Failure(new IllegalArgumentException("Empty expression"))
    else Try(spark.sessionState.sqlParser.parseExpression(exprStr))

  /** All column references (dotted paths joined with '.'). */
  def references(e: Expression): Seq[String] = {
    val buf = scala.collection.mutable.LinkedHashSet.empty[String]
    e.foreach {
      case a: UnresolvedAttribute => buf += a.nameParts.mkString(".")
      case _                      =>
    }
    buf.toSeq
  }

  /** Function names used that the session's registry doesn't know. */
  def unknownFunctions(spark: SparkSession, e: Expression): Seq[String] = {
    val reg = spark.sessionState.functionRegistry
    val buf = scala.collection.mutable.LinkedHashSet.empty[String]
    e.foreach {
      case f: UnresolvedFunction =>
        val name = f.nameParts.mkString(".")
        val known = Try(reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name.toLowerCase)))
          .getOrElse(false)
        if (!known) buf += name
      case _ =>
    }
    buf.toSeq
  }

  /** Resolve the expression against a schema to get its result type. */
  def inferType(spark: SparkSession, exprStr: String,
      schema: StructType): Try[DataType] = Try {
    import org.apache.spark.sql.functions.expr
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    empty.select(expr(exprStr)).schema.head.dataType
  }

  def validate(
      spark: SparkSession,
      exprStr: String,
      schema: StructType,
      knownFeatures: Set[String] = Set.empty,
      level: Level = Standard): Result = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[Issue]

    // cheap structural pre-checks mirrored from the reference
    val parens = exprStr.count(_ == '(') - exprStr.count(_ == ')')
    if (parens != 0)
      issues += Issue("UNBALANCED_PARENS",
        s"Unbalanced parentheses (${if (parens > 0) "missing )" else "extra )"})",
        isError = true)

    parse(spark, exprStr) match {
      case Failure(ex) =>
        issues += Issue("SYNTAX_ERROR", ex.getMessage, isError = true)
        Result(valid = false, Nil, None, issues.toSeq)
      case Success(ast) =>
        val refs = references(ast)
        val known = schema.fieldNames.toSet ++ knownFeatures
        refs.foreach { r =>
          val base = r.split("\\.").head
          if (!known.contains(r) && !known.contains(base)) {
            val hint = suggest(r, known).fold("")(s => s"; did you mean '$s'?")
            val isErr = level != Permissive
            issues += Issue("UNKNOWN_REFERENCE", s"Unknown feature: '$r'$hint", isErr)
          }
        }
        unknownFunctions(spark, ast).foreach { f =>
          issues += Issue("UNKNOWN_FUNCTION", s"Unknown function: $f", isError = true)
        }
        // division-by-zero advisory: a '/' whose divisor isn't NULLIF-guarded
        if (exprStr.contains("/") && !exprStr.toUpperCase.contains("NULLIF"))
          issues += Issue("POSSIBLE_DIVISION_BY_ZERO",
            "Division without NULLIF guard", isError = false)

        val resultType =
          if (issues.exists(_.isError)) None
          else inferType(spark, exprStr, schema).toOption

        val effectiveErrors =
          if (level == Strict) issues.nonEmpty else issues.exists(_.isError)
        Result(!effectiveErrors, refs, resultType, issues.toSeq)
    }
  }

  /**
   * DFS cycle detection over derived-feature dependencies
   * (validator.py:354-426): `deps` maps feature → referenced features.
   */
  def findCycle(deps: Map[String, Seq[String]]): Option[Seq[String]] = {
    val WHITE = 0; val GRAY = 1; val BLACK = 2
    val color = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(WHITE)
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    def dfs(n: String): Option[Seq[String]] = {
      color(n) = GRAY
      stack += n
      val res = deps.getOrElse(n, Nil).view.flatMap { m =>
        color(m) match {
          case GRAY  => Some(stack.toSeq.drop(stack.indexOf(m)) :+ m)
          case WHITE => dfs(m)
          case _     => None
        }
      }.headOption
      stack.remove(stack.length - 1)
      color(n) = BLACK
      res
    }
    deps.keys.view.flatMap(k => if (color(k) == WHITE) dfs(k) else None).headOption
  }
}

/**
 * Cross-namespace feature reference grammar
 * (raise_/models/lineage.py:24-141): `feature`, `group.feature`,
 * `project/group.feature`, `domain/project/group.feature`,
 * `@org/domain/project/group.feature`, each with optional `@vN` pin.
 */
final case class FeatureRef(
    org: Option[String], domain: Option[String], project: Option[String],
    group: Option[String], feature: String, version: Option[Int]) {
  def qualified(ctxOrg: String, ctxDomain: String, ctxProject: String,
      ctxGroup: String): String = {
    val o = org.getOrElse(ctxOrg)
    val d = domain.getOrElse(ctxDomain)
    val p = project.getOrElse(ctxProject)
    val g = group.getOrElse(ctxGroup)
    s"$o/$d/$p/$g/$feature" + version.fold("")(v => s"@v$v")
  }
}

object FeatureRef {
  def parse(s: String): FeatureRef = {
    var rest = s.trim
    val org = if (rest.startsWith("@")) {
      val i = rest.indexOf('/')
      require(i > 1, s"Bad org reference: $s")
      val o = rest.substring(1, i); rest = rest.substring(i + 1); Some(o)
    } else None
    val (body, version) = rest.lastIndexOf("@v") match {
      case -1 => (rest, None)
      case i  => (rest.take(i), Some(rest.drop(i + 2).toInt))
    }
    val slash = body.split("/")
    val (pathParts, leaf) = (slash.init.toSeq, slash.last)
    val dot = leaf.split("\\.")
    require(dot.length <= 2 && dot.forall(_.nonEmpty), s"Bad reference: $s")
    val (group, feature) =
      if (dot.length == 2) (Some(dot(0)), dot(1)) else (None, dot(0))
    pathParts match {
      case Seq() => FeatureRef(org, None, None, group, feature, version)
      case Seq(p) => FeatureRef(org, None, Some(p), group, feature, version)
      case Seq(d, p) => FeatureRef(org, Some(d), Some(p), group, feature, version)
      case _ => throw new IllegalArgumentException(s"Bad reference path: $s")
    }
  }
}
