package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst expressions for the vector hot path. The
 * higher-order-function formulation (`aggregate(zip_with(...))`) is
 * semantically identical but interpreted per element with lambda-variable
 * boxing; these generate a tight primitive loop inside whole-stage
 * codegen. Used by [[VectorFunctions]] where throughput matters
 * (pairwise similarity joins); results are bit-identical (same
 * sequential left-to-right double accumulation).
 */
abstract class VectorFoldExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** scalar kernel applied per element pair, folded with + */
  protected def kernel(x: Double, y: Double): Double
  /** same kernel as a Java source snippet over `$x`/`$y` */
  protected def kernelCode(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += kernel(xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $acc += ${kernelCode(x, y)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ with whole-stage codegen. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "dot_product"
  protected def kernel(x: Double, y: Double): Double = x * y
  protected def kernelCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (xᵢ−yᵢ)² (squared L2) with whole-stage codegen. */
case class SquaredL2(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "squared_l2"
  protected def kernel(x: Double, y: Double): Double = (x - y) * (x - y)
  protected def kernelCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ |xᵢ−yᵢ| (L1) with whole-stage codegen. */
case class AbsDiffSum(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "abs_diff_sum"
  protected def kernel(x: Double, y: Double): Double = math.abs(x - y)
  protected def kernelCode(x: String, y: String): String =
    s"Math.abs($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  private def asE(c: Column): Expression =
    GraftShims.toExpression(c.cast("array<double>"))

  def dot(a: Column, b: Column): Column =
    GraftShims.toColumn(DotProduct(asE(a), asE(b)))

  def squaredL2(a: Column, b: Column): Column =
    GraftShims.toColumn(SquaredL2(asE(a), asE(b)))

  def l1(a: Column, b: Column): Column =
    GraftShims.toColumn(AbsDiffSum(asE(a), asE(b)))

  /** Register as SQL functions (native, codegen'd). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("squared_l2",
      es => SquaredL2(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("abs_diff_sum",
      es => AbsDiffSum(es(0), es(1)), "builtin")
  }
}
