package graft

import graft.multimodal.{MediaCodec, MediaPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** Lossy-decode robustness (x116): the dHash near-dup fingerprint
  * must survive a JPEG round trip — real crawls are mostly JPEG. Pins
  * the measured drift distribution on the fixture, the encoder's
  * byte-determinism (the property that lets the driver's oracle hash
  * the verdict at all), and the qualifying-slice rationale. */
class JpegDHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val rows =
    MediaPipeline.jpegDhashFrame(spark, TestSpark.sf).collect()

  test("every qualifying raster stays within the pinned Hamming budget") {
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.jpeg_hamming <= 16,
      s"doc ${r.doc_id} drifted ${r.jpeg_hamming} bits"))
    // and the budget is TIGHT evidence, not slack: the lossy trip is
    // near-lossless for the typical raster
    val avg = rows.map(_.jpeg_hamming).sum.toDouble / rows.length
    assert(avg <= 2.0, s"average drift $avg — codec behavior changed?")
    assert(rows.count(_.jpeg_hamming == 0) * 5 >= rows.length * 2,
      "at least 40% of the rasters should round-trip hash-exact")
  }

  test("the PNG-side hash equals the x98 dHash for the same doc (shared definitions)") {
    val x98 = MediaPipeline.dhashFrame(spark, TestSpark.sf).collect()
      .map(r => r.doc_id -> r.dhash).toMap
    rows.foreach(r => assert(x98(r.doc_id) === r.dhash,
      s"doc ${r.doc_id}: x116's PNG hash diverged from x98's"))
  }

  test("JDK JPEG encode is byte-deterministic (the oracle-hash precondition)") {
    val a = MediaCodec.encodeJpeg(24, 20, (x, y) => (x * 11 + y * 5) * 0x010101)
    val b = MediaCodec.encodeJpeg(24, 20, (x, y) => (x * 11 + y * 5) * 0x010101)
    assert(java.util.Arrays.equals(a, b), "JPEG encoder is not deterministic")
    // and the frame itself is run-stable: a second evaluation yields
    // identical hamming values
    val again = MediaPipeline.jpegDhashFrame(spark, TestSpark.sf).collect()
      .map(r => r.doc_id -> r.jpeg_hamming).toMap
    rows.foreach(r => assert(again(r.doc_id) === r.jpeg_hamming))
  }

  test("below the downsample-step floor, 0-gradients flip under codec noise — the slice rationale") {
    // a 8x8 raster: every 9-column grid step samples a repeated pixel,
    // so adjacent grid cells tie and the < comparison sits on the
    // noise floor. Document (not assert) that the wide-raster slice is
    // what makes the budget meaningful: this test only pins that the
    // qualifying filter excludes such rasters.
    val n = MediaPipeline.jpegDhashFrame(spark, TestSpark.sf).toDF()
      .join(graft.sources.Tables.table(spark, TestSpark.sf, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("n_chars")), Seq("doc_id"))
      .filter("n_chars % 48 < 14 OR n_chars % 32 < 12").count()
    assert(n === 0L, "qualifying slice admitted a below-floor raster")
  }
}
