package graft

import graft.multimodal.MediaPipeline
import graft.operators.MediaQueries
import org.scalatest.funsuite.AnyFunSuite

/** Acoustic near-dup (x110): the decoded-PCM energy-gradient
  * fingerprint equals the arithmetic definition (RIFF/PCM16 round-trip
  * losslessness carried through the envelope), and the
  * broadcast-quotient and banded-pigeonhole pair paths agree. */
class AudioFpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decoded-PCM envelope and hash equal the arithmetic definition") {
    val rows = MediaPipeline.audioFpFrame(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val nChars = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.doc_id
      assert(id % 2 == 1, "only odd doc_ids carry WAV fixtures")
      val nc = nChars(id)
      val channels = (1 + nc % 2).toInt
      val nFrames = (nc % 5000 + 100).toInt
      val n = nFrames * channels
      val en = Array.tabulate(65) { k =>
        var s = 0L
        var i = k * n / 65
        val end = (k + 1) * n / 65
        while (i < end) {
          val v = ((i * 17 + id * 29) % 2001 - 1000)
          s += v * v
          i += 1
        }
        s
      }
      assert(r.energies.sameElements(en), s"envelope mismatch for doc $id")
      var bits = 0L
      for (k <- 0 until 64) if (en(k) < en(k + 1)) bits |= (1L << k)
      assert(r.afp === bits, s"fingerprint mismatch for doc $id")
    }
  }

  test("banded fallback path returns exactly the quotient path's pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
    val quotient = MediaQueries.audioFpPairs(spark, TestSpark.sf)
      .collect().map(key).toSet
    val banded = MediaQueries.audioFpPairs(spark, TestSpark.sf,
      maxQuotientFps = 0L).collect().map(key).toSet
    assert(quotient.nonEmpty, "fixture yields no <=2-bit pairs — vacuous")
    assert(banded === quotient)
  }

  test("every reported pair is within Hamming 2 and L1 is the exact envelope distance") {
    val sigs = MediaPipeline.audioFpFrame(spark, TestSpark.sf).collect()
      .map(r => r.doc_id -> r).toMap
    MediaQueries.audioFpPairs(spark, TestSpark.sf).collect().foreach { p =>
      val a = sigs(p.getLong(0)); val b = sigs(p.getLong(1))
      assert(java.lang.Long.bitCount(a.afp ^ b.afp) === p.getInt(2))
      assert(p.getInt(2) <= 2)
      val l1 = a.energies.zip(b.energies)
        .map { case (x, y) => (x - y).abs }.sum
      assert(l1 === p.getLong(3))
    }
  }

  test("the decode pipeline executes once per run — all references reuse one exchange") {
    val df = MediaQueries.audioFpPairs(spark, TestSpark.sf)
    df.collect() // AQE finalizes reuse during execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"audio decode scan not reused — every reference re-decodes:\n$p")
  }
}
