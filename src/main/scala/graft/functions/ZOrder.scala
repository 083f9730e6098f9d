package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve — multi-dimensional data CLUSTERING for scan
 * pruning. Sorting a table by `zvalue(d1, d2)` makes every written
 * file cover a small RECTANGLE of the (d1, d2) space, so a query box
 * selective in BOTH dimensions prunes by the PRODUCT of the
 * selectivities through ordinary parquet min/max statistics — where a
 * single-column sort only ever prunes by its one dimension. This is
 * Delta OPTIMIZE ZORDER BY / Iceberg's z-ordered rewrite, built from
 * plain codegen'd bit arithmetic (shift/and/or — no UDF).
 *
 * The interleave needs both dimensions scaled to the same fixed-width
 * unsigned domain first ([[scaleTo]]): Morton order is only meaningful
 * over uniformly-gridded coordinates. 16 bits per dimension (the
 * default) gives 65k cells per axis — far finer than any realistic
 * file count, so the grid never limits clustering resolution.
 */
object ZOrder {

  /** Affine-scale `v` (any numeric/timestamp-castable column) from
    * [lo, hi] onto the integer grid [0, 2^bits), clamped at the edges
    * so out-of-range stragglers land in the boundary cells. */
  def scaleTo(v: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, s"degenerate range [$lo, $hi]")
    val cells = (1L << bits) - 1
    val scaled = floor((v.cast("double") - lit(lo)) / lit(hi - lo) * cells)
    least(greatest(scaled, lit(0)), lit(cells)).cast("long")
  }

  /** Bit-interleave two `bits`-wide non-negative longs into their
    * Morton index: x supplies the even bits, y the odd. Pure
    * shift/and/or — whole-stage-codegen folds it into the write
    * projection. */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** Morton index of two raw columns given their value ranges. */
  def zvalue(x: Column, xLo: Double, xHi: Double,
      y: Column, yLo: Double, yHi: Double, bits: Int = 16): Column =
    interleave(scaleTo(x, xLo, xHi, bits), scaleTo(y, yLo, yHi, bits), bits)

  /** Reference interleave for tests (driver-side longs). */
  def interleaveRef(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.foldLeft(0L)(_ | _)
}
