package graft

import java.nio.file.Files

import graft.operators.PqQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization pins: the engine's per-subspace Lloyd trainer
  * equals an independent driver recompute on a NON-64-dim fixture
  * (including the keep-previous-centroid-on-empty rule, exercised via
  * a duplicated seed vector), the declared x148 codebook report equals
  * a driver recompute from the trained codebooks, and the ADC ordering
  * works as the candidate generator it is operationally: its top-100
  * shortlist captures (almost) all of the exact L2 top-10, which is
  * what an IVFADC store reranks exactly. Absolute recall@10 of raw
  * 32-bit codes on this near-random fixture corpus is LOW by
  * construction (random data is PQ's worst case — no inter-dimension
  * correlation to exploit); the spec pins the shortlist property, not
  * a pretty number. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = PqQueries.M
  private val K = PqQueries.K
  private val Iters = PqQueries.Iters

  // ------------------------------------------------- dim-16 fixture
  // 40 deterministic dim-16 float vectors (subDim = 2 at M = 8).
  // vec(1) DUPLICATES vec(0): seeds are vec_ids 0..15, so every
  // subspace's cluster 1 starts identical to cluster 0, loses every
  // assignment tie to the smaller cid, and EMPTIES — exercising the
  // keep-previous-centroid rule on both engine and recompute.

  private val Dim = 16
  private val N = 40

  private def vec(i: Int): Array[Float] = {
    val src = if (i == 1) 0 else i
    Array.tabulate(Dim) { j =>
      ((((src * 37 + j * 11) % 29) - 14) * 0.07).toFloat
    }
  }

  private lazy val dir: String = {
    val root = Files.createTempDirectory("graft-pqdim").toString
    import spark.implicits._
    (0 until N).map(i => (i.toLong, vec(i).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .write.parquet(s"$root/embeddings.parquet")
    root
  }

  // ---------------------------------------------------------- recompute
  // Independent restatement of the PQ train contract; every loop runs
  // off array lengths, never a hardcoded dimension.

  private def quant(v: Array[Float]): Array[Long] =
    v.map(e => math.floor(e.toDouble * 1000).toLong + 2048)

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var j = 0
    while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
    s
  }

  /** (cid, dist) argmin with ties to the smaller cid. */
  private def assign(cents: Array[Array[Long]],
      sv: Array[Long]): (Int, Long) = {
    var best = -1; var bd = Long.MaxValue
    cents.zipWithIndex.foreach { case (c, i) =>
      val d = sqDist(sv, c)
      if (d < bd) { bd = d; best = i }
    }
    (best, bd)
  }

  /** Rounds in which the keep-previous-on-empty branch fired. */
  private var emptiedClusters = 0

  private def refTrain(vecs: Array[Array[Long]])
      : Array[Array[Array[Long]]] = {
    val dim = vecs.head.length
    val sub = dim / M
    def slice(v: Array[Long], ss: Int): Array[Long] =
      v.slice(ss * sub, ss * sub + sub)
    var cbs = Array.tabulate(M, K)((ss, c) => slice(vecs(c), ss))
    emptiedClusters = 0
    (0 until Iters).foreach { _ =>
      cbs = Array.tabulate(M) { ss =>
        val members = Array.fill(K)(
          scala.collection.mutable.ArrayBuffer[Array[Long]]())
        vecs.foreach { v =>
          val sv = slice(v, ss)
          members(assign(cbs(ss), sv)._1) += sv
        }
        Array.tabulate(K) { c =>
          if (members(c).isEmpty) { // keep previous on empty
            emptiedClusters += 1
            cbs(ss)(c)
          } else Array.tabulate(sub)(j =>
            Math.floorDiv(members(c).map(_(j)).sum, members(c).length.toLong))
        }
      }
    }
    cbs
  }

  test("dim-16 trainer parity incl. the empty-cluster keep rule") {
    val vecs = (0 until N).map(i => quant(vec(i))).toArray
    val want = refTrain(vecs)
    val got = PqQueries.train(spark, dir)
    // the duplicated seed must actually exercise the rule: cluster 1
    // loses every tie to cluster 0 in round 1, so the keep branch
    // fires at least once per subspace across the training run
    assert(emptiedClusters >= M,
      s"fixture no longer exercises keep-on-empty ($emptiedClusters fires)")
    assert(got.length == M && got(0).length == K)
    (0 until M).foreach { ss =>
      (0 until K).foreach { c =>
        assert(got(ss)(c).sameElements(want(ss)(c)),
          s"centroid ($ss, $c): got ${got(ss)(c).toSeq} " +
            s"want ${want(ss)(c).toSeq}")
      }
    }
  }

  test("x148 codebook report equals a driver recompute from the trained codebooks") {
    val sf = TestSpark.sf
    val cbs = PqQueries.train(spark, sf)
    val sub = cbs(0)(0).length
    val vecs = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), quant(r.getSeq[Float](1).toArray)))
    val agg = scala.collection.mutable.Map[(Int, Int), (Long, Long)]()
    vecs.foreach { case (_, v) =>
      (0 until M).foreach { ss =>
        val (cid, d) = assign(cbs(ss), v.slice(ss * sub, ss * sub + sub))
        val (n, sse) = agg.getOrElse((ss, cid), (0L, 0L))
        agg((ss, cid)) = (n + 1, sse + d)
      }
    }
    val want = agg.toSeq.map { case ((ss, cid), (n, sse)) =>
      (ss.toLong, cid.toLong, n, sse, cbs(ss)(cid).sum)
    }.sorted
    val got = SparkEntry.queries("x148_pq_codebook")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("ADC top-100 shortlist captures >= 8 of the exact L2 top-10") {
    val sf = TestSpark.sf
    val cbs = PqQueries.train(spark, sf)
    val sub = cbs(0)(0).length
    val rows = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = rows.find(_._1 == 0L).get._2
    val qq = quant(q)
    // exact arm: float→double L2², (d2, vec_id) order — q23's ranking
    val exact = rows.map { case (id, v) =>
      var s = 0.0; var j = 0
      while (j < v.length) {
        val d = v(j).toDouble - q(j).toDouble; s += d * d; j += 1
      }
      (s, id)
    }.sorted.take(10).map(_._2).toSet
    // ADC arm from codes + LUTs (the x149 ordering, unlimited)
    val luts = Array.tabulate(M, K)((ss, c) =>
      sqDist(qq.slice(ss * sub, ss * sub + sub), cbs(ss)(c)))
    val adc = rows.map { case (id, v) =>
      val vq = quant(v)
      val d = (0 until M).map { ss =>
        luts(ss)(assign(cbs(ss), vq.slice(ss * sub, ss * sub + sub))._1)
      }.sum
      (d, id)
    }.sorted.take(100).map(_._2).toSet
    val hits = (exact & adc).size
    assert(hits >= 8, s"shortlist recall $hits/10 — ADC ordering degraded")
    // and the declared x149 top-10 is exactly the ADC ordering's head
    val got = SparkEntry.queries("x149_pq_adc")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val wantHead = rows.map { case (id, v) =>
      val vq = quant(v)
      val d = (0 until M).map { ss =>
        luts(ss)(assign(cbs(ss), vq.slice(ss * sub, ss * sub + sub))._1)
      }.sum
      (d, id)
    }.sorted.take(10).map(_._2).toSeq
    assert(got == wantHead)
  }
}
