package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Topic clustering over the embedding corpus — the k-means step of a
 * training-data mixing pipeline (cluster-balanced sampling, domain
 * discovery over document embeddings). Reference scope: the reference
 * backend has no clustering; this extends the x41/x44/x89 mixing
 * family with the standard embedding-space grouping operator.
 *
 * Engine shape (the 100 TB design):
 *  - Embeddings are QUANTIZED to integers up front
 *    (floor(e·1000)+2048 — non-negative, exact in both engines), so
 *    every distance, centroid mean and tie-break is integer
 *    arithmetic: bit-reproducible across Spark and DuckDB, no
 *    float-summation order sensitivity anywhere.
 *  - Lloyd's iterations are inherently sequential, so the model
 *    follows the stored-model lifecycle ([[UnigramLM]], [[BpeMiner]]):
 *    centroids are trained once per corpus version
 *    ([[StoredIndexes.versionedValue]]) in `Iters` passes, each pass
 *    ONE narrow scan + a map-side-combined 65-aggregate groupBy into
 *    K=8 groups (the shuffle moves K·(Dim+1) partial sums per task,
 *    not rows). The k×dim centroid table is bounded by construction —
 *    the only driver materialization.
 *  - The declared query then assigns every vector in ONE narrow pass:
 *    the trained centroids ride as literal arrays inside a single
 *    `array_min` argmin expression (key = dist·8+cid, so one array_min
 *    yields both the assignment and its distance; ties break to the
 *    smallest cid), followed by one K-group aggregate. No join, no
 *    explode, no per-row UDF.
 *
 * Empty-cluster rule: a cluster that captures no vectors keeps its
 * previous centroid (both engines COALESCE the same way).
 */
object KMeansQueries {

  private val K = 8
  private val Dim = 64
  /** assign→update rounds before the final assignment pass (x50's
    * fixed-unroll convention, mirrored by the oracle's CTE chain). */
  private val Iters = 2
  /** vectors kept per cluster by the balanced sample (x114). */
  private val SampleK = 5

  private val centroidCache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[Array[Array[Long]]]]()

  /** Integer-quantized embedding frame: v[j] = floor(e_j·1000)+2048
    * (non-negative, so integral division below is floor division in
    * both engines). */
  private[graft] def quantized(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          e => floor(e.cast("double") * 1000).cast("long") + 2048).as("v"))

  /** argmin over the literal centroid table, encoded as ONE value:
    * min over cid of (squared-L2 dist)·8 + cid. dist ≤ 64·4096² ≈ 2³⁰
    * so the ·8 shift cannot overflow; cid < 8 makes the key unique and
    * (dist, cid)-lexicographic. */
  private def minKey(cents: Array[Array[Long]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      aggregate(
        zip_with(col("v"), array(c.map(lit).toIndexedSeq: _*),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x) * 8 + i
    }.toIndexedSeq: _*))

  /** Train once per corpus version: init = the first K vectors by
    * vec_id, then `Iters` assign→update rounds. Each round is one
    * Spark job: narrow argmin scan → groupBy(cid) with count + Dim
    * element sums (map-side combined; K groups) → K-row collect. */
  private[graft] def train(s: SparkSession, d: String): Array[Array[Long]] =
    StoredIndexes.versionedValue(centroidCache, d, "embeddings.parquet",
      "graft-kmeans") {
      val q = quantized(s, d)
      var cents: Array[Array[Long]] = q.filter(col("vec_id") < K)
        .orderBy("vec_id").select(col("v"))
        .collect().map(_.getSeq[Long](0).toArray)
      require(cents.length == K, s"need $K seed vectors, got ${cents.length}")
      var it = 0
      while (it < Iters) {
        val aggs = count(lit(1)).as("n") +:
          (0 until Dim).map(j =>
            sum(element_at(col("v"), j + 1)).as(s"s$j"))
        val rows = q
          .select((minKey(cents) % 8).cast("int").as("cid"), col("v"))
          .groupBy("cid")
          .agg(aggs.head, aggs.tail: _*)
          .collect()
        val next = cents.map(_.clone()) // empty cluster keeps its centroid
        rows.foreach { r =>
          val cid = r.getInt(0)
          val n = r.getLong(1)
          var j = 0
          while (j < Dim) {
            next(cid)(j) = r.getLong(2 + j) / n // all sums ≥ 0: floor div
            j += 1
          }
        }
        cents = next
        it += 1
      }
      cents
    }

  /** The unrolled training chain shared by every k-means oracle:
    * quantize → seed → Iters×(assign, update) → final assignment a3 +
    * final centroids c2 (x50's pagerank CTE technique). */
  private def trainCtes: String = {
    def assign(prevC: String, name: String): String =
      s"""$name AS (
  SELECT vec_id, any_value(v) AS v, min_by(cid, dist*8+cid) AS cid FROM (
    SELECT q.vec_id, q.v, $prevC.cid,
      CAST(list_sum(list_transform(range($Dim), j ->
        (q.v[CAST(j+1 AS INT)]-$prevC.c[CAST(j+1 AS INT)])
        *(q.v[CAST(j+1 AS INT)]-$prevC.c[CAST(j+1 AS INT)]))) AS BIGINT) AS dist
    FROM q CROSS JOIN $prevC) GROUP BY vec_id)"""
    def update(prevC: String, a: String, name: String): String =
      s"""$name AS (
  SELECT $prevC.cid, COALESCE(u.c, $prevC.c) AS c FROM $prevC LEFT JOIN (
    SELECT cid, list_transform(range($Dim), j ->
      list_sum(list_transform(list(v), vv -> vv[CAST(j+1 AS INT)])) // count(*)) AS c
    FROM $a GROUP BY cid) u ON $prevC.cid = u.cid)"""
    s"""WITH q AS (
  SELECT vec_id, list_transform(embedding, e ->
    CAST(floor(CAST(e AS DOUBLE)*1000) + 2048 AS BIGINT)) AS v
  FROM embeddings),
c0 AS (SELECT vec_id AS cid, v AS c FROM q WHERE vec_id < $K),
${assign("c0", "a1")},
${update("c0", "a1", "c1")},
${assign("c1", "a2")},
${update("c1", "a2", "c2")},
${assign("c2", "a3")}"""
  }

  private def oracleSql: String =
    s"""$trainCtes,
d3 AS (SELECT a3.vec_id, a3.cid,
    CAST(list_sum(list_transform(range($Dim), j ->
      (a3.v[CAST(j+1 AS INT)]-c2.c[CAST(j+1 AS INT)])
      *(a3.v[CAST(j+1 AS INT)]-c2.c[CAST(j+1 AS INT)]))) AS BIGINT) AS dist
  FROM a3 JOIN c2 ON a3.cid = c2.cid)
SELECT d3.cid, count(*) AS n, CAST(sum(d3.dist) AS BIGINT) AS sse,
  CAST(list_sum(any_value(c2.c)) AS BIGINT) AS centroid_sum
FROM d3 JOIN c2 ON d3.cid = c2.cid GROUP BY d3.cid ORDER BY d3.cid"""

  private def sampleOracleSql: String =
    s"""$trainCtes
SELECT cid, vec_id, rk FROM (
  SELECT a3.cid, a3.vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY a3.cid
    ORDER BY ${graft.functions.TextFns.Sql.md5Bits16(
      "md5(CAST(a3.vec_id AS VARCHAR))")}, a3.vec_id) AS INT) AS rk
  FROM a3)
WHERE rk <= $SampleK ORDER BY cid, rk"""

  val all: Seq[Query] = Seq(
    // Per-cluster report after Iters assign→update rounds + a final
    // assignment: size, exact integer SSE against the trained
    // centroids, and the centroid component sum (pins every centroid
    // value). The oracle unrolls the same rounds as MATERIALIZED-free
    // CTEs (x50's pagerank technique), so a hash match proves the
    // whole iterative training trajectory, not just the last pass.
    Query("x111_kmeans_topics", oracleSql) { (s, d) =>
      val cents = train(s, d)
      val sumByCid = map_from_arrays(
        array((0 until K).map(i => lit(i)).toIndexedSeq: _*),
        array(cents.map(c => lit(c.sum)).toIndexedSeq: _*))
      quantized(s, d)
        .select(minKey(cents).as("key"))
        .select((col("key") % 8).cast("int").as("cid"),
          expr("key div 8").as("dist"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sum(col("dist")).as("sse"))
        .select(col("cid"), col("n"), col("sse"),
          element_at(sumByCid, col("cid")).as("centroid_sum"))
        .orderBy("cid")
    },

    // Cluster-BALANCED sampling — the reason a mixing pipeline runs
    // k-means at all (SemDeDup/DoReMi-style domain balancing): exactly
    // SampleK vectors per discovered cluster, chosen by the x80
    // reproducible-reservoir technique (md5-rank row_number ≤ k
    // compiles to WindowGroupLimit, so every map task keeps only its
    // local top-k before the single cid shuffle — stable under
    // partitioning and reruns). Assignment is x111's join-free
    // literal-centroid argmin, so the whole query is one narrow scan +
    // one K-partition window. The oracle replays training through the
    // shared CTE chain, then ranks with the same md5 arithmetic.
    Query("x114_cluster_sample", sampleOracleSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cents = train(s, d)
      quantized(s, d)
        .select(col("vec_id"), (minKey(cents) % 8).cast("int").as("cid"))
        .select(col("cid"), col("vec_id"),
          row_number().over(Window.partitionBy(col("cid"))
            .orderBy(graft.functions.TextFns.md5Bits16(
              col("vec_id").cast("string")), col("vec_id"))).as("rk"))
        .filter(col("rk") <= SampleK)
        .orderBy("cid", "rk")
    })
}
