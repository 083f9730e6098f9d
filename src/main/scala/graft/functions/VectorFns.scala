package graft.functions

import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector similarity primitives over `array<float>` embedding columns,
 * expressed as Catalyst array-fold expressions (`zip_with` +
 * `aggregate`): codegen-friendly, no UDFs, and element-order-sequential
 * so results are bit-identical to DuckDB's list functions.
 *
 * Floats are widened to double before any arithmetic: both engines then
 * perform the identical IEEE ops in the identical order.
 */
object VectorFns {

  private def d(c: Column): Column = c.cast("double")

  // Primary implementations: native codegen expressions
  // (graft.functions.expressions). Same float→double widening and
  // sequential fold order as the built-in variants below, so results
  // are bit-identical — VectorSpec asserts it.

  /** Σ aᵢ·bᵢ (codegen). */
  def dot(a: Column, b: Column): Column = VectorExpressions.vec_dot(a, b)

  /** Σ (aᵢ−bᵢ)² — squared L2 distance (codegen). */
  def l2sq(a: Column, b: Column): Column = VectorExpressions.vec_l2sq(a, b)

  /** Σ aᵢ² — squared norm (codegen). */
  def normsq(a: Column): Column = VectorExpressions.vec_normsq(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normsq(a)) / sqrt(normsq(b))

  // Built-in higher-order-function route (interpreted; reference
  // implementation for the specs and for environments where custom
  // expressions are not allowed).

  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  def l2sqBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  def normsqBuiltin(a: Column): Column =
    aggregate(transform(a, x => d(x) * d(x)), lit(0.0), (acc, v) => acc + v)

  /** DuckDB fragments mirroring the folds above. list_sum over a
    * per-element double list matches the sequential Spark fold. */
  object Sql {
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), " +
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

    def l2sq(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"

    def normsq(a: String): String =
      s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

    def cosine(a: String, b: String): String =
      s"${dot(a, b)} / sqrt(${normsq(a)}) / sqrt(${normsq(b)})"
  }

  /** Deterministic ±1 random-hyperplane coefficients for SRP-LSH
    * (xorshift-mixed; seed-stable across JVMs — no Random involved). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      var x = seed + p * 1000003L + i * 7919L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      if ((x & 1L) == 0L) 1.0 else -1.0
    }
}
