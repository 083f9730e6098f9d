package graft

import graft.multimodal.MediaPipeline
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing must be deterministic, shape-stable and
  * lossless around the stubbed codec boundary. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("feature extraction is deterministic and shape-stable") {
    val a = MediaPipeline.featureFrame(spark, TestSpark.sf)
      .orderBy("media_id").collect()
    val b = MediaPipeline.featureFrame(spark, TestSpark.sf)
      .orderBy("media_id").collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getSeq[Float](5) === y.getSeq[Float](5))
    }
    assert(a.forall(_.getSeq[Float](5).length === 16))
  }

  test("stub features are integer-exact dyadic rationals (oracle contract)") {
    // x13's digest check relies on every feature being bucketSum/256
    // with bucketSum an exact integer — *256 must round-trip losslessly
    val rows = MediaPipeline.featureFrame(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      r.getSeq[Float](5).foreach { f =>
        val scaled = f.toDouble * 256
        assert(scaled == math.rint(scaled) && scaled >= 0)
      }
    }
  }

  test("no row loss through mapPartitions; kinds partition by id mod 3") {
    val rows = MediaPipeline.featureFrame(spark, TestSpark.sf).collect()
    val docs = graft.sources.Tables.table(spark, TestSpark.sf, "documents").count()
    assert(rows.length === docs)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expected = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(r.getString(1) === expected)
    }
  }

  test("only video rows sample frames; byte stats match payload") {
    val rows = MediaPipeline.featureFrame(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      if (r.getString(1) == "video") assert(r.getInt(4) > 0)
      else assert(r.getInt(4) === 0)
      assert(r.getLong(2) > 0)
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 255)
    }
  }

  test("resize: image rows only, fixed shape, deterministic, exact indexing") {
    import spark.implicits._
    val media = MediaPipeline.syntheticMediaTable(spark, TestSpark.sf)
    val r1 = MediaPipeline.resizeImages(media, 8, 8).collect().sortBy(_.media_id)
    val r2 = MediaPipeline.resizeImages(media, 8, 8).collect().sortBy(_.media_id)
    assert(r1.nonEmpty)
    assert(r1.forall(_.kind == "image"))
    assert(r1.forall(r => r.pixels.length == 64 && r.w == 8 && r.h == 8))
    assert(r1.map(_.pixels.toSeq).toSeq === r2.map(_.pixels.toSeq).toSeq,
      "resize must be deterministic")
    // known small case: 5x2 grid of bytes 0..9 down to 2x1 picks
    // source pixels (0,0) and (2,0) — nearest-neighbor integral index
    val tiny = Seq(MediaPipeline.MediaRow(0L, "image",
      Array.tabulate(10)(_.toByte),
      MediaPipeline.MediaMeta("jpeg", 5, 2, 1, 0L))).toDS()
    val out = MediaPipeline.resizeImages(tiny, 2, 1).collect().head
    assert(out.pixels.toSeq === Seq[Byte](0, 2))
  }
}
