package graft

import graft.operators.{PqQueries, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ re-rank tier (x151 + retunePq + pqKnn + the stored code
  * table): the measured depth curve is monotone and anchored at
  * recall 1.0 (re-ranking the whole corpus IS exact search), the
  * stored codes equal a driver-side argmin recompute from the trained
  * codebooks, the retune policy picks the smallest depth clearing the
  * floor and stays pinned to the corpus version it measured, and the
  * serving probe at full depth equals brute-force exact search (one
  * probe definition across audit, benchmark and serving). */
class PqProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val n: Long =
    spark.read.parquet(s"$sf/embeddings.parquet").count()

  private def curve(): Map[Long, Double] =
    PqQueries.pqRerankCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("x151 curve: grid + corpus anchor, monotone, anchored at 1.0") {
    val c = curve()
    val depths = PqQueries.RerankGrid.map(_.toLong).filter(_ < n) :+ n
    assert(c.keySet === depths.toSet)
    assert(c(n) === 1.0, s"full re-rank must be exact: $c")
    depths.sliding(2).foreach {
      case Seq(a, b) =>
        assert(c(a) <= c(b), s"curve not monotone at $a -> $b: $c")
      case _ =>
    }
  }

  test("stored pq_codes equal a driver argmin recompute from the codebooks") {
    val cbs = PqQueries.train(spark, sf)
    val subDim = cbs(0)(0).length
    val stored = PqQueries.codesFor(spark, sf).load("pq_codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(stored.size === raw.length)
    raw.foreach { case (id, e) =>
      val qv = e.map(x => math.floor(x.toDouble * 1000).toLong + 2048)
      val want = (0 until PqQueries.M).map { ss =>
        val sv = qv.slice(ss * subDim, ss * subDim + subDim)
        (0 until PqQueries.K).minBy { c =>
          var s = 0L; var j = 0
          while (j < subDim) {
            val d = sv(j) - cbs(ss)(c)(j); s += d * d; j += 1
          }
          (s, c) // (dist, cid)-lexicographic, the subKey tie rule
        }
      }
      assert(stored(id).toSeq === want,
        s"stored code for vec $id drifted from the argmin")
    }
  }

  test("retunePq picks the smallest depth clearing the floor; unreachable floor -> full re-rank") {
    val c = curve()
    val depths = PqQueries.RerankGrid.map(_.toLong).filter(_ < n) :+ n
    val pick = PqQueries.retunePq(spark, sf, 0.9)
    assert(c(pick) >= 0.9, s"pick $pick misses the floor: $c")
    val below = depths.filter(_ < pick)
    assert(below.forall(c(_) < 0.9),
      s"pick $pick is not the smallest clearing depth: $c")
    assert(PqQueries.pqServingRerank(sf).toLong === pick)
    // a floor no depth can reach degrades to the full re-rank —
    // honest exact-search cost, never a silent miss
    assert(PqQueries.retunePq(spark, sf, 1.01) === n)
    // restore the measured pick for any later consumer
    PqQueries.retunePq(spark, sf, 0.9)
  }

  test("serving depth is pinned to the corpus version it was measured on") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pqpin").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.parquet(s"$tmp/embeddings.parquet")
    val pick = PqQueries.retunePq(spark, tmp, 0.9)
    assert(PqQueries.pqServingRerank(tmp).toLong === pick)
    // corpus change (append-only growth included) reverts to the
    // default until re-measured — codebooks AND the depth tuned on
    // them say nothing about the grown corpus
    import spark.implicits._
    Seq((900000L, Seq.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .write.mode("append").parquet(s"$tmp/embeddings.parquet")
    assert(PqQueries.pqServingRerank(tmp) === 10,
      "stale re-rank depth served across a corpus change")
  }

  test("pqKnn: full-depth top-10 is exact; shallow candidates equal x149's ADC ranking") {
    // full depth re-ranks every vector -> the result IS brute-force
    // exact cosine search
    val top = PqQueries.pqKnn(spark, sf, 0L, n.toInt)
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val q = VectorQueries.recallQueries(spark, sf) // touch: loud-fail path
    assert(q.nonEmpty)
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q0 = embs.find(_._1 == 0L).get._2
    val exact = embs.map { case (id, v) => (id, TestSpark.cos6(v, q0)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).toSeq
    assert(top === exact, "full-depth pqKnn != driver-side exact")
    // depth 10: the candidate SET is x149's ADC top-10 (same codes,
    // same LUTs, same (adc, vec_id) ordering — one probe definition)
    val cand10 = PqQueries.pqKnn(spark, sf, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val x149 = SparkEntry.queries("x149_pq_adc")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(cand10 === x149, "shallow pqKnn candidates drifted from x149")
    // an absent query id is a NoSuchElementException (the 404 seam)
    intercept[NoSuchElementException] {
      PqQueries.pqKnn(spark, sf, 99999999L, 10)
    }
  }

  test("PqParams: a finer k=32 build coexists with the serving default and strictly lowers distortion") {
    // x151's measured finding is that the oracle-pinned K=16 default
    // is coarse; the actionable response is the params knob — prove a
    // finer codebook trains, does not evict the default, and lowers
    // exactly the distortion x148 reports
    val cb16 = PqQueries.train(spark, sf)
    val cb32 = PqQueries.train(spark, sf, PqQueries.PqParams(k = 32))
    assert(cb32.length === PqQueries.M && cb32(0).length === 32)
    assert(PqQueries.train(spark, sf) eq cb16,
      "k=32 experiment evicted the serving codebooks")
    val raw = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(_.getSeq[Float](1).toArray)
    def sse(cbs: Array[Array[Array[Long]]]): Long = {
      val subDim = cbs(0)(0).length
      raw.map { e =>
        val qv = e.map(x => math.floor(x.toDouble * 1000).toLong + 2048)
        cbs.indices.map { ss =>
          val sv = qv.slice(ss * subDim, ss * subDim + subDim)
          cbs(ss).map { c =>
            var s = 0L; var j = 0
            while (j < subDim) { val d = sv(j) - c(j); s += d * d; j += 1 }
            s
          }.min
        }.sum
      }.sum
    }
    val (s16, s32) = (sse(cb16), sse(cb32))
    assert(s32 < s16, s"k=32 SSE $s32 not below k=16 SSE $s16")
    // a coarser split also trains (the slicing is dim-agnostic)
    val cb4 = PqQueries.train(spark, sf, PqQueries.PqParams(m = 4))
    assert(cb4.length === 4 && cb4(0)(0).length === 16)
    // a split that cannot slice the dim fails loudly, never silently
    intercept[IllegalArgumentException] {
      PqQueries.train(spark, sf, PqQueries.PqParams(m = 7))
    }
  }

  test("ivfadc: full knobs are exact; narrow probe stays inside its cells; code scan partition-prunes") {
    import graft.operators.VectorIndex
    // nProbe = every cell + re-rank = whole corpus → brute-force exact
    val full = PqQueries.ivfadcKnn(spark, sf, 0L,
        VectorIndex.Cells, n.toInt)
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q0 = embs.find(_._1 == 0L).get._2
    val exact = embs.map { case (id, v) => (id, TestSpark.cos6(v, q0)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).toSeq
    assert(full === exact, "full-knob ivfadc != driver-side exact")
    // a 1-cell probe returns only vectors assigned to that cell —
    // the candidate restriction IS the cell restriction
    val ivf = VectorIndex.forDir(spark, sf)
    val cell0 = ivf.probeCells(VectorIndex.fixedPoint(q0.toSeq), 1).head
    val members = ivf.corpus.filter(col("cell") === cell0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val narrow = PqQueries.ivfadcKnn(spark, sf, 0L, 1, n.toInt)
      .collect().map(_.getLong(0)).toSet
    assert(narrow === members,
      "1-cell ivfadc candidates != the probed cell's membership")
    // the code scan prunes to the probed cells at PLANNING time — the
    // property that makes the scan nProbe/cells of the sidecar at any
    // corpus size (the x20 contract, inherited by the code layout)
    val pruned = PqQueries.ivfadcKnn(spark, sf, 0L, 1, 10)
      .queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters"),
      s"ivfadc code scan lost partition pruning:\n$pruned")
    // an absent query id is a NoSuchElementException (the 404 seam)
    intercept[NoSuchElementException] {
      PqQueries.ivfadcKnn(spark, sf, 99999999L, 1, 10)
    }
  }

  test("filtered ivfadc: full knobs equal the filtered exact search; the predicate is a pushed pre-filter") {
    import graft.operators.VectorIndex
    val lbl = PqQueries.FilterLabel
    // full probe + full re-rank restricted to one label == brute
    // force over exactly that label's vectors
    val got = PqQueries.ivfadcKnn(spark, sf, 0L,
        VectorIndex.Cells, n.toInt, Some(lbl))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val q0 = rows.find(_._1 == 0L).get._2
    val exact = rows.filter(_._3 == lbl)
      .map { case (id, v, _) => (id, TestSpark.cos6(v, q0)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).toSeq
    assert(got === exact, "filtered full-knob ivfadc != filtered exact")
    // every returned vector carries the label (no post-filter leak)
    val ids = got.map(_._1).toSet
    assert(rows.filter(r => ids(r._1)).forall(_._3 == lbl))
    // the predicate PRE-filters the pruned code scan: the plan shows
    // the label pushed into the SAME scan that partition-prunes —
    // no id-set join, no post-filter starvation at the candidate
    // stage (the filtered-ANN failure mode)
    val plan = PqQueries.ivfadcKnn(spark, sf, 0L, 1, 10, Some(lbl))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*label[^\\]]*\\].*"),
      s"label filter not pushed into the pruned code scan:\n$plan")
  }

  test("a label-less corpus still serves unfiltered ivfadc; a label filter fails loudly") {
    // the label column is OPTIONAL metadata: drop it and the sidecar
    // builds label-free, unfiltered search is unaffected, and a
    // filter request is a loud contract violation (the REST layer
    // turns the same probe into a 400), never a missing-column crash
    val tmp = java.nio.file.Files.createTempDirectory("graft-nolbl").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .write.parquet(s"$tmp/embeddings.parquet")
    assert(!PqQueries.hasLabels(spark, tmp))
    val got = PqQueries.ivfadcKnn(spark, tmp, 0L,
        graft.operators.VectorIndex.Cells, n.toInt)
      .orderBy(col("cos").desc, col("vec_id")).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty, "label-less corpus broke the unfiltered arm")
    intercept[IllegalArgumentException] {
      PqQueries.ivfadcKnn(spark, tmp, 0L, 1, 10, Some(3))
    }
  }

  test("x154 filtered recall curve: full grid, monotone, anchored at 1.0 inside the filtered universe") {
    import graft.operators.VectorIndex
    val c = PqQueries.filteredRecallCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(c.keySet === (1L to VectorIndex.Cells.toLong).toSet)
    // full probe covers every cell, so the filtered probe arm IS the
    // filtered exact arm — the structural anchor proving both arms
    // rank inside the same (label-restricted) universe
    assert(c(VectorIndex.Cells.toLong) === 1.0, s"anchor broken: $c")
    (1 until VectorIndex.Cells).foreach { w =>
      assert(c(w.toLong) <= c(w + 1L), s"curve not monotone at $w: $c")
    }
  }
}
