package graft

import graft.multimodal.MediaPipeline
import graft.operators.MediaQueries
import org.scalatest.funsuite.AnyFunSuite

/** Video probe + temporal near-dup (x112/x113): the real AVI parse /
  * sampled-frame DIB decode equals the arithmetic definition, and the
  * shared 64-bit pair engine's two paths agree on video signatures. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parsed header and sampled-frame envelope equal the arithmetic definition") {
    val rows = MediaPipeline.videoFrame(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val nChars = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.doc_id
      assert(id % 3 == 0, "only doc_id%3==0 docs carry AVI fixtures")
      val nc = nChars(id)
      val w = (nc % 24 + 8).toInt
      val h = (nc % 16 + 8).toInt
      val fps = (5 * (nc % 4 + 1)).toInt
      val nF = (nc % 16 + 65).toInt
      val slope = (nc % 7 + 3).toInt
      assert(r.width === w && r.height === h, s"dims for doc $id")
      assert(r.fps === fps && r.n_frames === nF, s"rate/frames for doc $id")
      assert(r.duration_ms === nF * 1000L / fps, s"duration for doc $id")
      val en = Array.tabulate(65) { k =>
        val f = k * nF / 65
        var s = 0L
        var p = 0
        while (p < 72) {
          val x = (p % 9) * w / 9; val y = (p / 9) * h / 8
          s += (7 * x + 13 * y + f * slope +
            (if (f == (id % nF).toInt) 64 else 0)) % 256
          p += 1
        }
        s
      }
      assert(r.sums.sameElements(en), s"envelope mismatch for doc $id")
      var bits = 0L
      for (k <- 0 until 64) if (en(k) < en(k + 1)) bits |= (1L << k)
      assert(r.vfp === bits, s"fingerprint mismatch for doc $id")
    }
  }

  test("banded fallback path returns exactly the quotient path's pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
    val quotient = MediaQueries.videoFpPairs(spark, TestSpark.sf)
      .collect().map(key).toSet
    val banded = MediaQueries.videoFpPairs(spark, TestSpark.sf,
      maxQuotientFps = 0L).collect().map(key).toSet
    assert(quotient.nonEmpty, "fixture yields no <=2-bit pairs — vacuous")
    assert(banded === quotient)
  }

  test("every reported pair is within Hamming 2 and L1 is the exact envelope distance") {
    val sigs = MediaPipeline.videoFrame(spark, TestSpark.sf).collect()
      .map(r => r.doc_id -> r).toMap
    MediaQueries.videoFpPairs(spark, TestSpark.sf).collect().foreach { p =>
      val a = sigs(p.getLong(0)); val b = sigs(p.getLong(1))
      assert(java.lang.Long.bitCount(a.vfp ^ b.vfp) === p.getInt(2))
      assert(p.getInt(2) <= 2)
      val l1 = a.sums.zip(b.sums).map { case (x, y) => (x - y).abs }.sum
      assert(l1 === p.getLong(3))
    }
  }

  test("the decode pipeline executes once per run — all references reuse one exchange") {
    val df = MediaQueries.videoFpPairs(spark, TestSpark.sf)
    df.collect() // AQE finalizes reuse during execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"video decode scan not reused — every reference re-decodes:\n$p")
  }
}
