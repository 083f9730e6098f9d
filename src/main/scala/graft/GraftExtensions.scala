package graft

import graft.functions.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions registration for the engine's custom Catalyst
 * expressions, making them first-class SQL functions next to the
 * DataFrame API (`SparkEntry.queries` uses the Column wrappers in
 * `TextExpressions`/`VectorExpressions`; SQL users get the same codegen
 * expressions via `spark.sql("SELECT vec_dot(a, b) ...")`).
 *
 * Activate with `.withExtensions(new GraftExtensions)` on the builder
 * or `spark.sql.extensions=graft.GraftExtensions` in config — the
 * standard extension mechanism Delta/Iceberg use, so the library
 * composes with other extensions instead of mutating a session's
 * function registry by hand.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
    args.head
  }
  private def two(args: Seq[Expression], name: String): (Expression, Expression) = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    (args(0), args(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => {
        val (a, b) = two(args, "vec_dot"); DotProduct(a, b)
      }))
    ext.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two float/double arrays"),
      (args: Seq[Expression]) => {
        val (a, b) = two(args, "vec_l2sq"); L2Squared(a, b)
      }))
    ext.injectFunction((FunctionIdentifier("vec_normsq"),
      info("vec_normsq", "vec_normsq(a) - squared norm of a float/double array"),
      (args: Seq[Expression]) => NormSquared(one(args, "vec_normsq"))))
    ext.injectFunction((FunctionIdentifier("simhash16"),
      info("simhash16", "simhash16(tokens) - 16-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash16(one(args, "simhash16"))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(one(args, "simhash64"))))
    ext.injectFunction((FunctionIdentifier("rolling_fp"),
      info("rolling_fp", "rolling_fp(tokens) - order-sensitive rolling-hash fingerprint"),
      (args: Seq[Expression]) => RollingHashFp(one(args, "rolling_fp"))))
    ext.injectFunction((FunctionIdentifier("shingles_distinct"),
      info("shingles_distinct", "shingles_distinct(tokens) - distinct 3-gram shingles"),
      (args: Seq[Expression]) => ShinglesDistinct(one(args, "shingles_distinct"), 3)))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(shingles) - 4 LSH band signatures"),
      (args: Seq[Expression]) => MinHashBands(one(args, "minhash_bands"))))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(s) - distinct character trigrams"),
      (args: Seq[Expression]) => CharNgramsDistinct(one(args, "char_ngrams"), 3)))
    ext.injectFunction((FunctionIdentifier("winnow_fps"),
      info("winnow_fps", "winnow_fps(tokens) - winnowing document fingerprints (k=4, w=4)"),
      (args: Seq[Expression]) => WinnowFpsExpr(one(args, "winnow_fps"), 4, 4)))
    ext.injectFunction((FunctionIdentifier("edit_at_most"),
      info("edit_at_most",
        "edit_at_most(a, b, k) - levenshtein(a, b) if <= k else -1 " +
          "(k a literal int; distances count UTF-16 units — equals " +
          "levenshtein for BMP text, diverges on supplementary-plane chars)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"edit_at_most expects 3 arguments, got ${args.length}")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"edit_at_most threshold must be an integer literal, got $other")
        }
        EditDistanceAtMost(args(0), args(1), k)
      }))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - common-element count of two SORTED bigint arrays"),
      (args: Seq[Expression]) => {
        val (a, b) = two(args, "sorted_intersect_count")
        SortedIntersectCount(a, b)
      }))
  }
}
