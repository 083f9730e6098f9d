package graft

import graft.operators.VectorQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SRP multi-probe tier (x150 + retuneSrp + srpKnn): the measured
  * radius curve is monotone and anchored at recall 1.0 (radius K
  * probes every bucket), its radius-0 point IS x138's single-bucket
  * audit, the retune policy picks the smallest radius clearing the
  * floor and stays pinned to the corpus version it measured, and the
  * serving probe at radius 0 equals the declared x11 frame (one probe
  * definition across audit, benchmark and serving). */
class SrpProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def curve(): Map[Long, Double] =
    VectorQueries.srpRadiusCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("x150 curve: monotone, anchored at 1.0; radius 0 equals x138's mean") {
    val c = curve()
    assert(c.keySet === (0L to 4L).toSet)
    assert(c(4L) === 1.0, s"full probe must be exact: $c")
    (0 to 3).foreach { r =>
      assert(c(r.toLong) <= c(r + 1L), s"curve not monotone at $r: $c")
    }
    // the radius-0 point is x138's audit: same candidates (each
    // query's own L buckets), same exact arm — its mean recall must
    // equal the curve's first entry
    val x138 = SparkEntry.queries("x138_srp_recall")(spark, sf).collect()
    val mean = x138.map(_.getLong(1)).sum / (10.0 * x138.length)
    assert(math.abs(c(0L) - mean) < 5e-5, s"curve(0)=${c(0L)} x138=$mean")
  }

  test("retuneSrp picks the smallest radius clearing the floor; unreachable floor -> full probe") {
    val c = curve()
    val pick = VectorQueries.retuneSrp(spark, sf, 0.9)
    assert(c(pick.toLong) >= 0.9, s"pick $pick misses the floor: $c")
    assert(pick == 0 || c(pick.toLong - 1) < 0.9,
      s"pick $pick is not the smallest clearing radius: $c")
    assert(VectorQueries.srpServingRadius(sf) === pick)
    // a floor no radius can reach falls back to the full probe —
    // honest full-scan cost, not a silent miss
    assert(VectorQueries.retuneSrp(spark, sf, 1.01) === 4)
    // restore the measured pick for any later consumer
    VectorQueries.retuneSrp(spark, sf, 0.9)
  }

  test("serving radius is pinned to the corpus version it was measured on") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-srppin").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.parquet(s"$tmp/embeddings.parquet")
    val pick = VectorQueries.retuneSrp(spark, tmp, 0.9)
    assert(VectorQueries.srpServingRadius(tmp) === pick)
    // corpus change (append-only growth included) reverts to the
    // default until re-measured — a radius tuned on one geometry says
    // nothing about another
    import spark.implicits._
    Seq((900000L, Seq.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .write.mode("append").parquet(s"$tmp/embeddings.parquet")
    assert(VectorQueries.srpServingRadius(tmp) === 0,
      "stale radius served across a corpus change")
  }

  test("srpKnn: radius 0 top-10 equals the declared x11; radius K covers the corpus") {
    val top = VectorQueries.srpKnn(spark, sf, 0L, 0)
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val x11 = SparkEntry.queries("x11_ann_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top === x11, "radius-0 serving probe drifted from x11")
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(VectorQueries.srpKnn(spark, sf, 0L, 4).count() === n,
      "full-radius probe must cover every vector")
    // an absent query id is a NoSuchElementException (the 404 seam)
    intercept[NoSuchElementException] {
      VectorQueries.srpKnn(spark, sf, 99999999L, 0)
    }
  }
}
