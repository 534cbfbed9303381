package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Vector scalar functions over `array<float|double>` columns — the
 * reference's custom-UDF surface (DOT, COSINE_SIMILARITY, L2_DISTANCE,
 * L1_DISTANCE, NORM, NORMALIZE, VEC_ADD/SUB/MUL; see
 * raise_/validation/validator.py:116-120 and raise_/PRD.md App. B
 * "Vector Functions (Custom UDFs)").
 *
 * Implemented as higher-order-function compositions (`zip_with` +
 * `aggregate`), NOT Scala UDFs: these stay inside Catalyst, codegen, and
 * are expressible 1:1 in the DuckDB oracle. Elements are cast to double
 * first so accumulation precision matches the oracle's `::DOUBLE[]`.
 *
 * Also registered as SQL functions (via SQL scalar UDFs) so
 * `derived_from` expression strings like "DOT(a, b)" parse directly.
 */
object VectorFunctions {

  private def asD(c: Column): Column = c.cast("array<double>")

  /**
   * Σ aᵢ·bᵢ — native codegen'd expression ([[VectorExpressions]]); same
   * sequential left-to-right accumulation as the HOF formulation and the
   * oracle, so results are bit-identical.
   */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(VectorExpressions.squaredL2(a, b))

  def l1Distance(a: Column, b: Column): Column = VectorExpressions.l1(a, b)

  def vecAdd(a: Column, b: Column): Column = zip_with(asD(a), asD(b), _ + _)
  def vecSub(a: Column, b: Column): Column = zip_with(asD(a), asD(b), _ - _)
  def vecMul(a: Column, b: Column): Column = zip_with(asD(a), asD(b), _ * _)

  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(asD(a), x => x / n)
  }

  /**
   * Register the vector surface for SQL/`derived_from` strings. Uses SQL
   * scalar UDFs (`CREATE TEMPORARY FUNCTION ... RETURN <expr>`) so the
   * functions remain pure Catalyst expressions (inlined + codegen'd), not
   * black-box closures.
   */
  def registerAll(spark: SparkSession): Unit = {
    def f(name: String, params: String, ret: String, body: String): Unit =
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name($params) RETURNS $ret RETURN $body")
    val ad = "ARRAY<DOUBLE>"
    f("DOT", s"a $ad, b $ad", "DOUBLE",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)")
    f("NORM", s"a $ad", "DOUBLE", "sqrt(DOT(a, a))")
    f("COSINE_SIMILARITY", s"a $ad, b $ad", "DOUBLE",
      "DOT(a, b) / (NORM(a) * NORM(b))")
    f("L2_DISTANCE", s"a $ad, b $ad", "DOUBLE",
      "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (s, x) -> s + x))")
    f("L1_DISTANCE", s"a $ad, b $ad", "DOUBLE",
      "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0D, (s, x) -> s + x)")
    f("VEC_ADD", s"a $ad, b $ad", ad, "zip_with(a, b, (x, y) -> x + y)")
    f("VEC_SUB", s"a $ad, b $ad", ad, "zip_with(a, b, (x, y) -> x - y)")
    f("VEC_MUL", s"a $ad, b $ad", ad, "zip_with(a, b, (x, y) -> x * y)")
    f("NORMALIZE", s"a $ad", ad, "transform(a, x -> x / NORM(a))")
  }
}
