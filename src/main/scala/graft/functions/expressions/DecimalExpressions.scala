package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/**
 * Exact fast path for the decimal products in the TPC-H-shape
 * aggregates (q18/x27/x28/x53/x76/x77/x108 …): Spark's `Decimal.*`
 * has no compact-long arm — every row pays
 * `toJavaBigDecimal.multiply` plus the CheckOverflow `toPrecision`
 * pass, i.e. several BigDecimal allocations per product (measured:
 * x53's three product-sums cost ~0.9 s of its 1.33 s at sf0.1; the
 * same sums over doubles run 0.46 s — but doubles are not
 * oracle-exact, which is the whole point of the decimal forms).
 *
 * [[DecimalTimesCompact]] computes the same product on the UNSCALED
 * LONGS: `Decimal.toUnscaledLong` (which `longValueExact`-throws
 * rather than truncates), one `Math.multiplyExact`, and a
 * `Decimal.createUnsafe` at the result scale. Any ArithmeticException
 * (an operand or the product beyond a long) falls back to the exact
 * BigDecimal path, so the expression is VALUE-IDENTICAL to the
 * built-in `l * r` for every input:
 *
 *  - result TYPE: replicated from Spark's allowPrecisionLoss multiply
 *    rule, raw (p1+p2+1, s1+s2) capped at precision 38 — construction
 *    REJECTS (require) the scale-adjusted case (raw precision > 38
 *    AND adjusted scale < s1+s2), where the built-in HALF_UP-rounds
 *    mid-expression; every wired call site keeps scale = s1+s2, so
 *    the product is exact integer arithmetic in both engines and no
 *    rounding semantics exist to drift.
 *  - overflow: a product needs ≤ p1+p2+1 digits, so a result capped
 *    to fewer digits CAN overflow in principle; the fast path's
 *    products fit a long (≤ 19 digits ≤ any wired result precision),
 *    and the fallback throws loudly where ANSI Spark would — at these
 *    call sites the operand bounds (prices < 10^6, quantities ≤ 50,
 *    discount fractions ≤ 1) make that arm unreachable.
 */
object DecimalExprUtil {

  /** Spark's adjusted multiply result type (DecimalType
    * adjustPrecisionScale, allowPrecisionLoss arm) — kept in the
    * no-scale-loss region by the caller's require. */
  def multiplyResultType(l: DecimalType, r: DecimalType): DecimalType = {
    val rawP = l.precision + r.precision + 1
    val rawS = l.scale + r.scale
    if (rawP <= DecimalType.MAX_PRECISION) DecimalType(rawP, rawS)
    else {
      val intDigits = rawP - rawS
      // 6 == DecimalType.MINIMUM_ADJUSTED_SCALE (private[sql])
      val minScale = math.min(rawS, 6)
      val adjScale = math.max(DecimalType.MAX_PRECISION - intDigits, minScale)
      DecimalType(DecimalType.MAX_PRECISION, adjScale)
    }
  }

  /** [[DoubleToDecimalExact]]'s runtime: round-trip-verified
    * compact-long cast with the built-in string path as fallback. */
  def castDoubleExact(d: Double, p: Int, s: Int): Decimal = {
    val pow = DecimalFnsInternal.POW10(s)
    val x = d * pow
    if (java.lang.Math.abs(x) < 4.5e15) { // 2^52: exact-integer region
      val u = if (x >= 0) Math.round(x) else -Math.round(-x) // HALF_UP
      if (u / pow == d) return Decimal.createUnsafe(u, p, s)
    }
    // non-finite: BigDecimal.valueOf would throw NumberFormatException;
    // fail with the decimal-domain error instead (the ANSI cast's
    // behavior class; Spark's non-ANSI cast would return null, but
    // nullSafeEval/nullSafeCodeGen cannot surface a null from here).
    // Unreachable for the wired TPC-H money/quantity columns.
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(
        s"non-finite double $d cannot be cast to DECIMAL($p,$s)")
    // slow path: Spark's own cast semantics, exactly
    val dec = Decimal(scala.math.BigDecimal.valueOf(d))
    if (!dec.changePrecision(p, s))
      throw new ArithmeticException(
        s"$d overflows DECIMAL($p,$s)") // the ANSI default's behavior
    dec
  }

  /** The product, exact: compact-long arm with an exact-BigDecimal
    * fallback. `p`/`s` are the (pre-validated, unadjusted-scale)
    * result type. */
  def timesCompact(a: Decimal, b: Decimal, p: Int, s: Int): Decimal = {
    try {
      Decimal.createUnsafe(
        Math.multiplyExact(a.toUnscaledLong, b.toUnscaledLong), p, s)
    } catch {
      case _: ArithmeticException =>
        val exact = a.toJavaBigDecimal.multiply(b.toJavaBigDecimal)
        // scale is exactly s by construction; only the digit count can
        // exceed p, which no wired operand range reaches — fail loudly
        // (the ANSI default's behavior) rather than silently null
        if (exact.precision > p)
          throw new ArithmeticException(
            s"decimal product ${exact} overflows DECIMAL($p,$s)")
        Decimal(exact, p, s)
    }
  }
}

/** `CAST(double AS DECIMAL(p,s))`, value-identical to Spark's cast
  * with a string-free fast path. Spark's double→decimal cast goes
  * through `BigDecimal.valueOf` = `Double.toString` (shortest decimal
  * representation) + `setScale(HALF_UP)` — several allocations and a
  * Ryu/Grisu formatting pass PER ROW, which dominated every decimal
  * aggregate over the double-typed fact columns (x53 measured 1.33 s
  * with the cast chain vs 0.46 s over raw doubles).
  *
  * Fast path: `u = halfAwayRound(d·10^s)`; accept iff
  * `u / 10^s == d` EXACTLY. Acceptance proof: `u/10^s` (correctly
  * rounded IEEE division) equals `d` iff `d` is the nearest double to
  * the s-decimal value `D = u·10^-s`; by the shortest-representation
  * property, `Double.toString(d)` then prints `D` (or an even shorter
  * prefix of it with the same value), so Spark's string-based cast
  * yields exactly `D` — the fast result. Any double whose shortest
  * representation needs more than s fraction digits fails the
  * round-trip compare and takes the exact slow path, so the
  * expression is value-identical to the built-in cast for every
  * FINITE input, not just the clean ones. (|d·10^s| ≥ 2^52 also falls
  * back — past integer precision the round trip could alias.)
  * NaN/±Infinity throw an ArithmeticException (the ANSI cast's error
  * class) where the non-ANSI built-in would yield null — deliberate:
  * unreachable for the wired columns, and loud beats a silent
  * behavior fork if dcast is ever reused on unclean doubles. */
case class DoubleToDecimalExact(child: Expression, p: Int, s: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(p <= 18 && s >= 0 && s < p,
    s"DoubleToDecimalExact($p,$s): compact precision only")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double input, got ${other.catalogString}")
  }

  override def dataType: DataType = DecimalType(p, s)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    DecimalExprUtil.castDoubleExact(a.asInstanceOf[Double], p, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.DecimalExprUtil
         |  .castDoubleExact($c, $p, $s);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "double_to_decimal_exact"
}

/** `l * r` for decimal columns, value- and type-identical to the
  * built-in multiply (see [[DecimalExprUtil]]) with a compact-long
  * fast path. Analysis-time checked to decimal inputs; construction
  * rejects the scale-adjusted precision-loss region. */
case class DecimalTimesCompact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: DecimalType, _: DecimalType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (decimal, decimal), got $other")
    }

  private lazy val resultType: DecimalType = {
    val (l, r) = (left.dataType.asInstanceOf[DecimalType],
      right.dataType.asInstanceOf[DecimalType])
    val t = DecimalExprUtil.multiplyResultType(l, r)
    require(t.scale == l.scale + r.scale,
      s"$prettyName: result scale ${t.scale} adjusted below " +
        s"${l.scale + r.scale} — the built-in rounds here; use `*`")
    t
  }

  override def dataType: DataType = resultType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalExprUtil.timesCompact(a.asInstanceOf[Decimal],
      b.asInstanceOf[Decimal], resultType.precision, resultType.scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.expressions.DecimalExprUtil
         |  .timesCompact($a, $b, ${resultType.precision}, ${resultType.scale});
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "decimal_times_compact"
}

object DecimalFnsInternal {
  private[expressions] val POW10: Array[Double] =
    (0 to 17).map(i => math.pow(10, i)).toArray
}

object DecimalFns {
  /** Drop-in for `a * b` on decimal columns (exact, typed like the
    * built-in) — the compact-long product. */
  def dtimes(a: Column, b: Column): Column =
    Bridge.column(DecimalTimesCompact(
      Bridge.expression(a), Bridge.expression(b)))

  /** Drop-in for `col.cast("decimal(p,s)")` on a DOUBLE column
    * (exact, string-free fast path). */
  def dcast(a: Column, p: Int = 18, s: Int = 2): Column =
    Bridge.column(DoubleToDecimalExact(Bridge.expression(a), p, s))
}
