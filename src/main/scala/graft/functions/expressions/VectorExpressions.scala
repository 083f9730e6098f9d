package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Native Catalyst expressions for embedding math over `array<float>`
 * or `array<double>` columns: dot product, squared L2 distance,
 * squared norm.
 *
 * The built-in route (`zip_with` + `aggregate`) is semantically
 * identical but runs as interpreted higher-order functions — per
 * element it allocates lambda variables and boxes values, which makes
 * all-pairs similarity (O(n²·d) evaluations) orders of magnitude
 * slower. These expressions participate in whole-stage codegen: the
 * generated Java is a primitive `double` loop over the two
 * `ArrayData`s, no allocation per element.
 *
 * Numerics: each element is widened to double (a no-op for double
 * inputs) and accumulated sequentially in index order — exactly the
 * fold order of the built-in `aggregate` route and of DuckDB's
 * `list_sum(list_transform(...))`, so results are bit-identical
 * across all three (required by the oracle hash check).
 *
 * Null handling mirrors the built-in fold: a null element poisons the
 * result to null (`acc + null` in `aggregate`), and non-array /
 * non-numeric inputs are an ANALYSIS error, not a runtime codegen
 * ClassCastException.
 */
object VecTypeCheck {
  def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  def check(name: String, inputs: Seq[Expression]): TypeCheckResult =
    inputs.find(e => elemType(e.dataType).isEmpty) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> or array<double> arguments, got " +
          bad.dataType.catalogString)
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Java getter expression yielding a double for element `i`. */
  def getJava(arr: String, i: String, et: DataType): String = et match {
    case DoubleType => s"$arr.getDouble($i)"
    case _ => s"(double) $arr.getFloat($i)"
  }

  def getEval(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType => arr.getDouble(i)
    case _ => arr.getFloat(i).toDouble
  }
}

abstract class VecBinary extends BinaryExpression {
  import VecTypeCheck._
  override def dataType: DataType = DoubleType
  // a null ELEMENT nulls the whole result even when the array columns
  // themselves are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(left, right))

  /** Java source for the per-element accumulation, given element vars. */
  protected def elementJava(x: String, y: String): String
  protected def elementEval(x: Double, y: Double): Double

  private def lt = elemType(left.dataType).getOrElse(FloatType)
  private def rt = elemType(right.dataType).getOrElse(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += elementEval(getEval(x, i, lt), getEval(y, i, rt))
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
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = ${getJava(a, i, lt)};
         |  double $y = ${getJava(b, i, rt)};
         |  $s += ${elementJava(x, y)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

case class DotProduct(left: Expression, right: Expression) extends VecBinary {
  override protected def elementJava(x: String, y: String): String = s"$x * $y"
  override protected def elementEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class L2Squared(left: Expression, right: Expression) extends VecBinary {
  override protected def elementJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def elementEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq"
}

case class NormSquared(child: Expression) extends UnaryExpression {
  import VecTypeCheck._
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(child))

  private def et = elemType(child.dataType).getOrElse(FloatType)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = getEval(x, i, et)
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
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = ${getJava(a, i, et)};
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_normsq"
}

/** Count of common elements between two SORTED array<long> columns —
  * the merge-intersection primitive that turns relational triangle
  * counting (a 10⁸-row wedge join) into Σ per-edge neighbor-list
  * intersections: the same total comparisons, but each is one long
  * compare in a fused loop instead of a hash-join probe row
  * (~50 ns/row of operator overhead → ~1-2 ns/step). Inputs MUST be
  * ascending (build them with sort_array); null elements are not
  * expected (graph ids) and are skipped by the merge. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    while (i < x.numElements() && j < y.numElements()) {
      // skip null slots (getLong on one would read garbage 0s and
      // count phantom matches) — graph ids don't carry them, but the
      // SQL registration makes arbitrary arrays reachable
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |    if ($xv == $yv) { $c++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** Per-subspace argmin keys against a literal PQ/k-means codebook —
  * the codegen form of the `array_min(array(aggregate(zip_with(...))))`
  * minKey/subKey construction ([[graft.operators.KMeansQueries]],
  * [[graft.operators.PqQueries]]). For an `array<long>` quantized
  * vector of M·subDim components and codebooks cbs(ss)(cid)(j), emits
  * an M-long array whose element ss is
  * `min over cid of (Σ_j (v[ss·subDim+j] − cbs(ss)(cid)(j))² · K + cid)`
  * — identical exact integer arithmetic and (dist, cid)-lexicographic
  * tie-break as the built-in route, but one fused primitive loop per
  * row instead of M·K interpreted higher-order folds, each of which
  * allocates a zip_with array and boxes every element (measured ~8×
  * on the x148 encode pass, ~3× on the PQ/k-means training builds).
  *
  * `flat` is the row-major flattened codebook
  * (((ss·K)+cid)·subDim+j); M, K and subDim ride as constructor
  * params so equals/serialization stay primitive. Null handling: a
  * null ELEMENT nulls the WHOLE result array. For M=1 that is exactly
  * the built-in outcome (the fold poisons every cid's key to null and
  * array_min over all-null is null); for M>1 the built-in would null
  * only the affected subspace's slot — a deliberate difference, taken
  * because it keeps containsNull=false on the result, and unreachable
  * in practice: quantized corpora carry no null components (the
  * trainer and every wired caller build the arrays themselves).
  * A vector whose length differs from
  * M·subDim throws (the built-in route would silently zip-truncate;
  * no caller feeds mixed dimensions — quantized corpora are uniform
  * and the trainer derives subDim from the seeds — so loud beats
  * wrong). */
case class CodebookArgminKeys(child: Expression, flat: Array[Long],
    m: Int, k: Int, subDim: Int) extends UnaryExpression {
  import VecTypeCheck._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${v.numElements()} components, codebook expects ${m * subDim}")
    val keys = new Array[Long](m)
    var ss = 0
    while (ss < m) {
      var best = Long.MaxValue
      var c = 0
      while (c < k) {
        var s = 0L
        val off = (ss * k + c) * subDim
        val voff = ss * subDim
        var j = 0
        while (j < subDim) {
          if (v.isNullAt(voff + j)) return null
          val dd = v.getLong(voff + j) - flat(off + j)
          s += dd * dd
          j += 1
        }
        val key = s * k + c
        if (key < best) best = key
        c += 1
      }
      keys(ss) = best
      ss += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fl = ctx.addReferenceObj("cbFlat", flat, "long[]")
      val keys = ctx.freshName("keys")
      val ss = ctx.freshName("ss")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val off = ctx.freshName("off")
      val voff = ctx.freshName("voff")
      val dd = ctx.freshName("dd")
      val key = ctx.freshName("key")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector has " + $a.numElements() +
         |    " components, codebook expects ${m * subDim}");
         |}
         |long[] $keys = new long[$m];
         |boolean ${ev.isNull}_el = false;
         |for (int $ss = 0; $ss < $m && !${ev.isNull}_el; $ss++) {
         |  long $best = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $k && !${ev.isNull}_el; $c++) {
         |    long $s = 0L;
         |    int $off = ($ss * $k + $c) * $subDim;
         |    int $voff = $ss * $subDim;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      if ($a.isNullAt($voff + $j)) { ${ev.isNull}_el = true; break; }
         |      long $dd = $a.getLong($voff + $j) - $fl[$off + $j];
         |      $s += $dd * $dd;
         |    }
         |    long $key = $s * $k + $c;
         |    if (!${ev.isNull}_el && $key < $best) $best = $key;
         |  }
         |  $keys[$ss] = $best;
         |}
         |if (${ev.isNull}_el) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "codebook_argmin_keys"

  // Array[Long] fields get reference equality from the synthesized
  // case-class equals, which silently defeats semanticEquals-driven
  // optimizations (common-subexpression elimination, exchange reuse)
  // whenever two instances are built from the same codebook — compare
  // the flattened codebook by CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case that: CodebookArgminKeys =>
      child == that.child && m == that.m && k == that.k &&
        subDim == that.subDim && java.util.Arrays.equals(flat, that.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(k),
      Integer.valueOf(subDim), Integer.valueOf(java.util.Arrays.hashCode(flat)))
}

object VectorExpressions {
  private def expr(c: Column): Expression = Bridge.expression(c)
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(expr(a), expr(b)))
  def vec_l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(expr(a), expr(b)))
  def vec_normsq(a: Column): Column =
    Bridge.column(NormSquared(expr(a)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(expr(a), expr(b)))

  /** [[CodebookArgminKeys]] over a nested cbs(subspace)(centroid)(component)
    * codebook (flattened here; all subspaces must share K and subDim). */
  def codebook_argmin_keys(v: Column,
      cbs: Array[Array[Array[Long]]]): Column = {
    require(cbs.nonEmpty && cbs(0).nonEmpty && cbs(0)(0).nonEmpty,
      "codebook_argmin_keys needs a non-empty codebook")
    val m = cbs.length
    val k = cbs(0).length
    val subDim = cbs(0)(0).length
    require(cbs.forall(sub => sub.length == k && sub.forall(_.length == subDim)),
      s"codebook_argmin_keys needs uniform K=$k and subDim=$subDim across subspaces")
    val flat = new Array[Long](m * k * subDim)
    var i = 0
    for (ss <- 0 until m; c <- 0 until k; j <- 0 until subDim) {
      flat(i) = cbs(ss)(c)(j); i += 1
    }
    Bridge.column(CodebookArgminKeys(expr(v), flat, m, k, subDim))
  }
}
