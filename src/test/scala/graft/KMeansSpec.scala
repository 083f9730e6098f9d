package graft

import graft.operators.KMeansQueries
import org.scalatest.funsuite.AnyFunSuite

/** Topic clustering (x111): the distributed Lloyd trainer and the
  * literal-centroid assignment pass equal an independent single-machine
  * recompute over the collected fixture — every centroid component,
  * cluster size and SSE, not just the aggregate shape. All arithmetic
  * is integer (quantized embeddings), so equality is exact. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 8
  private val Dim = 64
  private val Iters = 2

  /** Collected, quantized fixture vectors (the reference substrate). */
  private lazy val vecs: Array[(Long, Array[Long])] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.table(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
          .map(e => math.floor(e.toDouble * 1000).toLong + 2048)
        (r.getLong(0), v)
      }
  }

  /** (dist·8 + cid)-argmin, the engine's tie rule re-stated. */
  private def argmin(cents: Array[Array[Long]], v: Array[Long]): (Int, Long) = {
    var bestKey = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      var d = 0L; var j = 0
      while (j < Dim) { val t = v(j) - cents(i)(j); d += t * t; j += 1 }
      val key = d * 8 + i
      if (key < bestKey) bestKey = key
      i += 1
    }
    ((bestKey % 8).toInt, bestKey / 8)
  }

  /** Plain-Scala Lloyd reference: same init, same rounds, same
    * floor-division update, same empty-cluster retention. */
  private lazy val refCents: Array[Array[Long]] = {
    var cents = vecs.filter(_._1 < K).sortBy(_._1).map(_._2.clone())
    assert(cents.length == K)
    for (_ <- 0 until Iters) {
      val sums = Array.fill(K)(Array.fill(Dim)(0L))
      val ns = Array.fill(K)(0L)
      vecs.foreach { case (_, v) =>
        val (cid, _) = argmin(cents, v)
        ns(cid) += 1
        var j = 0
        while (j < Dim) { sums(cid)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(K)(i =>
        if (ns(i) == 0) cents(i) else sums(i).map(_ / ns(i)))
    }
    cents
  }

  test("distributed trainer reproduces the single-machine Lloyd trajectory") {
    val trained = KMeansQueries.train(spark, TestSpark.sf)
    assert(trained.length === K)
    trained.zip(refCents).zipWithIndex.foreach { case ((t, r), i) =>
      assert(t.sameElements(r), s"centroid $i diverges from the reference")
    }
  }

  test("declared report equals the reference per-cluster (n, sse, centroid_sum)") {
    val ref = vecs.map { case (_, v) => argmin(refCents, v) }
      .groupBy(_._1).map { case (cid, as) =>
        cid -> ((as.length.toLong, as.map(_._2).sum, refCents(cid).sum))
      }
    val got = SparkEntry.queries("x111_kmeans_topics")(spark, TestSpark.sf)
      .collect()
    assert(got.length === ref.size) // every non-empty cluster reported once
    got.foreach { r =>
      val (n, sse, csum) = ref(r.getInt(0))
      assert(r.getLong(1) === n, s"cluster ${r.getInt(0)} size")
      assert(r.getLong(2) === sse, s"cluster ${r.getInt(0)} sse")
      assert(r.getLong(3) === csum, s"cluster ${r.getInt(0)} centroid_sum")
    }
  }

  test("argmin key encoding cannot overflow at the quantization bounds") {
    // components are in [floor(min·1000)+2048, floor(max·1000)+2048];
    // the engine's key is dist·8+cid, so dist must stay below 2⁶⁰
    val lo = vecs.flatMap(_._2).min
    val hi = vecs.flatMap(_._2).max
    assert(lo >= 0L, "quantization must be non-negative (floor-div contract)")
    val maxDiff = hi // vs 0
    assert(Dim.toLong * maxDiff * maxDiff < (1L << 60),
      s"dist bound overflows the ·8 key shift (component range [$lo,$hi])")
  }

  test("balanced sample equals the reference recompute and is exactly k per cluster") {
    def md5bits16(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    }
    val ref = vecs.map { case (id, v) => (argmin(refCents, v)._1, id) }
      .groupBy(_._1).map { case (cid, as) =>
        cid -> as.map(_._2).sortBy(id => (md5bits16(id.toString), id)).take(5)
      }
    val got = SparkEntry.queries("x114_cluster_sample")(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    got.groupBy(_._1).foreach { case (cid, rows) =>
      assert(rows.length === math.min(5, ref(cid).length), s"cluster $cid size")
      assert(rows.sortBy(_._3).map(_._2).toSeq === ref(cid).toSeq,
        s"cluster $cid sample diverges from the md5-rank reference")
    }
    assert(got.map(_._1).distinct.sorted.toSeq === ref.keys.toSeq.sorted)
  }

  test("sample rank-filter compiles to WindowGroupLimit (map-side top-k)") {
    val p = SparkEntry.queries("x114_cluster_sample")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no map-side group limit:\n$p")
    assert(!p.contains("Join"), s"sample pass plans a join:\n$p")
  }

  test("assignment pass is one narrow scan: no join, map-side combine") {
    val df = SparkEntry.queries("x111_kmeans_topics")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"assignment pass plans a join:\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }
}
