package graft

import graft.operators.{VectorIndex, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The audit-driven IVF lifecycle loop (r16 verdict ask #2): ingest
  * with FROZEN centroids drifts recall down; retuneIvf measures the
  * x142 recall curve on the current index and responds — widening the
  * serving width when the floor is reachable inside the probe budget,
  * rebuilding (re-training centroids on the grown corpus) when it is
  * not. End-to-end on a CONSTRUCTED drift fixture whose recall
  * numbers are hand-derivable:
  *
  *  - base corpus: 100 vectors in 8 tight axis-aligned clusters
  *    (vec_id % 8; seeds vec_id < 8), centers 2·e_k;
  *  - ingested delta: two NEW far-away clusters, close to each other
  *    but straddling the frozen cell boundary — A (5 members, ids
  *    100..104) near 10·e0 + 9.9·e1 lands in frozen cell 0, B (15
  *    members, ids 105..119) near 9.9·e0 + 10·e1 lands in cell 1;
  *  - the 8 audit queries (ids 100..107) = 5 A + 3 B. An A-query's
  *    exact top-10 spans BOTH new clusters (5 A + 5 B — within- and
  *    cross-cluster cosines both ≈ 1, far above the ≈ 0.7 to any old
  *    vector), but its width-1 probe reads only cell 0 → recall 0.5;
  *    a B-query's exact top-10 is all-B (15 members) and its
  *    width-1 probe reads cell 1 → recall 1.0. Mean recall:
  *    w=1 → (5·0.5 + 3·1.0)/8 = 0.6875, w=2 → 1.0 (both new cells
  *    probed; old-cell candidates cannot displace cos≈1 rows).
  */
class IvfRetuneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = VectorIndex.Dim

  private def vec(axes: Map[Int, Double], jitterAxis: Int,
      jitter: Double): Seq[Float] =
    (0 until Dim).map { j =>
      (axes.getOrElse(j, 0.0) +
        (if (j == jitterAxis) jitter else 0.0)).toFloat
    }

  private def base: Seq[(Long, Seq[Float])] =
    (0L until 100L).map { i =>
      val k = (i % 8).toInt
      (i, vec(Map(k -> 2.0), (k + 8) % Dim, 0.001 * (i / 8 % 7).toInt))
    }

  private def delta: Seq[(Long, Seq[Float])] =
    (100L until 105L).map { i => // cluster A → frozen cell 0
      (i, vec(Map(0 -> 10.0, 1 -> 9.9), 2, 0.001 * (i - 100)))
    } ++ (105L until 120L).map { i => // cluster B → frozen cell 1
      (i, vec(Map(0 -> 9.9, 1 -> 10.0), 3, 0.001 * (i - 105)))
    }

  test("ingest → recall drop → retune widens; unreachable floor → rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retune").toString
    base.toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val idx0 = VectorIndex.forDir(spark, dir)
    // corpus grows append-only; frozen-centroid ingest absorbs it
    delta.toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    val idx1 = VectorIndex.ingest(spark, dir,
      delta.toDF("vec_id", "embedding"))
    assert(idx1 eq idx0, "append-only ingest must not rebuild")
    // the constructed drift: A and B straddle the frozen cell boundary
    val cells = idx1.corpus
      .filter(col("vec_id") >= 100).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((100L to 104L).map(cells).toSet === Set(0),
      "cluster A must land in frozen cell 0")
    assert((105L to 119L).map(cells).toSet === Set(1),
      "cluster B must land in frozen cell 1")
    // measured curve on the drifted index: the hand-derived numbers
    val curve = VectorQueries.recallCurve(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(curve(1L) === 0.6875, s"drifted recall@1: $curve")
    assert(curve(2L) === 1.0, s"recall@2 after widening: $curve")
    // policy response #1: the floor is reachable by WIDENING — the
    // serving width moves from the default to the measured pick
    assert(VectorQueries.servingProbeWidth(dir) === 3) // default NProbe
    val (w, rebuilt) = VectorQueries.retuneIvf(spark, dir, floor = 0.95)
    assert(w === 2 && !rebuilt, s"expected widen-to-2, got ($w, $rebuilt)")
    assert(VectorQueries.servingProbeWidth(dir) === 2)
    // the serving path consumes the policy: default-width ivfKnn now
    // probes 2 cells — an A-anchor query sees cluster B again
    val knn = VectorQueries.ivfKnn(spark, dir, 100L)
      .orderBy(col("cos").desc, col("vec_id")).limit(10).collect()
      .map(_.getLong(0)).toSet
    assert((105L to 109L).forall(knn.contains),
      s"policy-width probe still misses cluster B: $knn")
    // policy response #2: floor unreachable inside the probe budget
    // (maxProbe=1 on the drifted geometry) → REBUILD — centroids
    // re-train on the grown corpus and the entry is replaced
    val (w2, rebuilt2) =
      VectorQueries.retuneIvf(spark, dir, floor = 0.95, maxProbe = 1)
    assert(rebuilt2, "drifted index under a width-1 budget must rebuild")
    assert(w2 === 1, "the rebuilt pick is clamped to the budget")
    val idx2 = VectorIndex.forDir(spark, dir)
    assert(!(idx2 eq idx1), "rebuild must replace the served entry")
    assert(idx2.corpus.count() === 120,
      "rebuilt index must cover the grown corpus")
    // the serving pick is pinned to the corpus VERSION it was
    // measured on: any corpus change reverts to the default until the
    // next retune (a width tuned on one geometry says nothing about
    // another — review-caught)
    val (w3, _) = VectorQueries.retuneIvf(spark, dir, floor = 0.95)
    assert(VectorQueries.servingProbeWidth(dir) === w3)
    (120L until 122L).map(i => (i, vec(Map(2 -> 5.0), 4, 0.001 * i)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(VectorQueries.servingProbeWidth(dir) === 3,
      "a mutated corpus must revert the serving width to the default")
    graft.tables.TempDirs.delete(dir)
  }

  test("fwd lookup: point fetch finds any vec_id, including negative ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fwd").toString
    // a negative id exercises the floorMod bucket (the writer's pmod
    // puts it in a non-negative partition; a sign-preserving % on the
    // read side would probe a nonexistent negative one)
    val ids = Seq(-5L, 0L, 1L, 2L, 3L, 63L, 64L, 129L)
    ids.zipWithIndex.map { case (i, k) =>
      (i, vec(Map(k % 8 -> 2.0), 8 + k, 0.0)) }
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val idx = VectorIndex.forDir(spark, dir)
    ids.foreach { i =>
      assert(idx.lookup(i).isDefined, s"fwd lookup missed vec_id $i")
    }
    assert(idx.lookup(7777L).isEmpty, "absent id must report absent")
    // the fetch plan partition-prunes to the id's bucket
    val one = idx.store.load("fwd")
      .filter(col("bkt") === 1 && col("vec_id") === 1L)
    one.collect()
    assert(one.queryExecution.executedPlan.toString
      .contains("PartitionFilters"), "fwd fetch lost partition pruning")
    graft.tables.TempDirs.delete(dir)
  }
}
