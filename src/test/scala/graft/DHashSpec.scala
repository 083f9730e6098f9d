package graft

import graft.multimodal.MediaPipeline
import graft.operators.MediaQueries
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image near-dup (x98): the decoded-raster dHash equals
  * the arithmetic definition (PNG losslessness carried through the
  * downsample), and the broadcast-quotient and banded-pigeonhole pair
  * paths produce identical results. */
class DHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decoded-raster grid and hash equal the arithmetic definition") {
    val rows = MediaPipeline.dhashFrame(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // recompute from (doc_id, n_chars) — the oracle's arithmetic
    val nChars = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.doc_id
      val w = (nChars(id) % 48 + 4).toInt
      val h = (nChars(id) % 32 + 4).toInt
      val grid = Array.tabulate(72) { i =>
        val c = i % 9; val rr = i / 9
        ((7L * (c * w / 9) + 13L * (rr * h / 8) + 31L * id) % 256).toInt
      }
      assert(r.grid.sameElements(grid), s"grid mismatch for doc $id")
      var bits = 0L
      for (k <- 0 until 64)
        if (grid((k / 8) * 9 + k % 8) < grid((k / 8) * 9 + k % 8 + 1))
          bits |= (1L << k)
      assert(r.dhash === bits, s"hash mismatch for doc $id")
    }
  }

  test("banded fallback path returns exactly the quotient path's pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
    val quotient = MediaQueries.dhashPairs(spark, TestSpark.sf)
      .collect().map(key).toSet
    val banded = MediaQueries.dhashPairs(spark, TestSpark.sf,
      maxQuotientFps = 0L).collect().map(key).toSet
    assert(quotient.nonEmpty, "fixture yields no <=2-bit pairs — vacuous")
    assert(banded === quotient)
  }

  test("the decode pipeline executes once per run — all references reuse one exchange") {
    val df = MediaQueries.dhashPairs(spark, TestSpark.sf)
    df.collect() // AQE finalizes reuse during execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"dhash scan not reused — every reference re-decodes the corpus:\n$p")
  }

  test("every reported pair is within Hamming 2 and L1 is the exact grid distance") {
    val grids = MediaPipeline.dhashFrame(spark, TestSpark.sf).collect()
      .map(r => r.doc_id -> r).toMap
    MediaQueries.dhashPairs(spark, TestSpark.sf).collect().foreach { p =>
      val a = grids(p.getLong(0)); val b = grids(p.getLong(1))
      assert(java.lang.Long.bitCount(a.dhash ^ b.dhash) === p.getInt(2))
      assert(p.getInt(2) <= 2)
      val l1 = a.grid.zip(b.grid).map { case (x, y) => (x - y).abs.toLong }.sum
      assert(l1 === p.getLong(3))
    }
  }
}
