package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst expressions for embedding math over `array<float>`
 * columns: dot product, squared L2 distance, squared norm.
 *
 * The built-in route (`zip_with` + `aggregate`) is semantically
 * identical but runs as interpreted higher-order functions — per
 * element it allocates lambda variables and boxes values, which makes
 * all-pairs similarity (O(n²·d) evaluations) orders of magnitude
 * slower. These expressions participate in whole-stage codegen: the
 * generated Java is a primitive `double` loop over the two
 * `ArrayData`s, no allocation per element.
 *
 * Numerics: each element is widened float→double and accumulated
 * sequentially in index order — exactly the fold order of the built-in
 * `aggregate` route and of DuckDB's `list_sum(list_transform(...))`,
 * so results are bit-identical across all three (required by the
 * oracle hash check).
 */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Java source for the per-element accumulation, given element vars. */
  protected def elementJava(x: String, y: String): String
  protected def elementEval(x: Double, y: Double): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += elementEval(x.getFloat(i).toDouble, y.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $s += ${elementJava(x, y)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

case class DotProduct(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def elementJava(x: String, y: String): String = s"$x * $y"
  override protected def elementEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class L2Squared(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def elementJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def elementEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq"
}

case class NormSquared(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_normsq"
}

object VectorExpressions {
  private def expr(c: Column): Expression = Bridge.expression(c)
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(expr(a), expr(b)))
  def vec_l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(expr(a), expr(b)))
  def vec_normsq(a: Column): Column =
    Bridge.column(NormSquared(expr(a)))
}
