package graft.operators

import graft.Query
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) over the embedding corpus — the vector
 * COMPRESSION tier between x63's scalar quantization (1 byte/dim, 4×)
 * and the IVF cell partitioning (x20): split each vector into M
 * subspaces, train a K-centroid codebook per subspace, and store each
 * vector as M sub-centroid ids (Jégou et al., "Product Quantization
 * for Nearest Neighbor Search", TPAMI 2011 — the standard billion-
 * scale ANN memory layout). Reference scope: the reference backend has
 * no vector search at all; this completes the engine's quantized-ANN
 * family (x63/x64 scalar-quant ADC, x20 IVF, x11 SRP).
 *
 * At the fixture's dim=64 with M=4, K=16: 256 bytes of floats become
 * M log₂K = 16 BITS per vector — codes are what a 100 TB ANN store
 * actually scans (the FAISS IVFADC layout: codes live inside x20's
 * cell partitions; a query probes cells and reads codes, never
 * floats). Search is asymmetric distance (ADC): the query stays
 * full-precision, each subspace precomputes a K-entry lookup table of
 * query-to-centroid distances (M·K bounded numbers, broadcast), and a
 * vector's distance is M table lookups + (M−1) adds — no per-
 * dimension arithmetic in the scan at all, unlike x64's scalar-quant
 * ADC which still touches every dimension.
 *
 * Engine shape (every choice mirrors an already-proven doctrine):
 *  - Integer arithmetic end to end: vectors ride the x111 fixed-point
 *    quantization (floor(e·1000)+2048), centroid means use FLOOR
 *    division (`Math.floorDiv` / DuckDB `//`), distances are exact
 *    integer sums — bit-reproducible across engines, no float
 *    summation order anywhere ([[KMeansQueries]]' doctrine).
 *  - Per-subspace training is Lloyd's over the SLICED vectors with
 *    first-K-by-vec_id seeds (the x20 IVF seeding convention; PQ
 *    subspaces are low-dimensional and the final declared outputs
 *    carry per-cluster SSE, so seed quality is measured, not
 *    assumed). All M subspaces train in ONE pass per iteration: a
 *    narrow argmin projection builds (sub, cid, subvector) structs,
 *    one explode + posexplode feeds a map-side-combined
 *    (sub, cid, component) aggregate — M·K·subDim bounded groups, the
 *    same shuffle shape as x111 (the r14 janino lesson: two aggregate
 *    columns over exploded rows stay codegen'd at any dimension).
 *  - Codebooks follow the stored-model lifecycle
 *    ([[StoredIndexes.versionedValue]]): trained once per corpus
 *    version, M·K·subDim bounded driver numbers (the x41 rate-table
 *    collect contract), then ride every probe as literals — the
 *    declared queries are single narrow scans, no joins.
 *  - Empty-cluster rule: a cluster that captures no vectors keeps its
 *    previous centroid (both engines COALESCE the same way — the
 *    x111 rule, NOT the IVF drop-the-cell rule, so the codebook
 *    always has exactly K usable entries per subspace).
 *
 * The oracle replays the ENTIRE build relationally (quantize → slice
 * → seed → 2 Lloyd rounds per subspace → final assignment) as
 * MATERIALIZED CTE chains — the x111/x20 oracle technique — so the
 * hash check pins training, encoding and search, not just the final
 * ranking.
 */
object PqQueries {

  /** Subspace count: dim must divide evenly (64 → 8 × 8-dim). */
  private[graft] val M = 8
  /** Centroids per subspace codebook (codes are log₂K = 4 bits). */
  private[graft] val K = 16
  /** Lloyd rounds per subspace (the x111/x20 default). */
  private[graft] val Iters = 2

  /** Fixture subspace width — ORACLE-ONLY (the engine derives it from
    * the seed vectors; only the SQL pins the fixture's 64-dim). */
  private val OracleSubDim = KMeansQueries.Dim / M

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[Array[Array[Array[Long]]]]]()

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var j = 0
    while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
    s
  }

  /** argmin over one subspace's literal codebook, encoded as ONE
    * value: min over cid of (squared-L2 dist)·K + cid — the
    * [[KMeansQueries]] minKey trick. dist ≤ subDim·4096² ≈ 2²⁸·subDim
    * so the ·K shift cannot overflow; cid < K makes the key unique
    * and (dist, cid)-lexicographic. `sv` is the quantized SUBvector
    * column. */
  private def subKey(cents: Array[Array[Long]], sv: Column): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      aggregate(
        zip_with(sv, array(c.map(lit).toIndexedSeq: _*),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x) * K + i
    }.toIndexedSeq: _*))

  /** The quantized subvector for subspace `ss` (1-based slice). */
  private def subCol(v: Column, ss: Int, subDim: Int): Column =
    slice(v, ss * subDim + 1, subDim)

  /** Train the M per-subspace codebooks once per corpus version.
    * Returns cbs(sub)(cid)(component) — M·K·subDim bounded longs. */
  private[graft] def train(s: SparkSession, d: String)
      : Array[Array[Array[Long]]] =
    StoredIndexes.versionedValue(cache, d, "embeddings.parquet",
      "graft-pq-codebooks", d) {
      val q = KMeansQueries.quantized(s, d)
      val seedRows = q.filter(col("vec_id") < K)
        .orderBy("vec_id")
        .select(col("vec_id").cast("long"), col("v")).collect()
      require(seedRows.length == K &&
        seedRows.zipWithIndex.forall { case (r, i) => r.getLong(0) == i },
        s"PQ seeding needs contiguous vec_ids 0..${K - 1} " +
          s"(got ${seedRows.length} rows)")
      val dim = seedRows.head.getSeq[Long](1).length
      require(dim % M == 0, s"dim $dim not divisible into $M subspaces")
      val subDim = dim / M
      var cbs: Array[Array[Array[Long]]] = Array.tabulate(M, K) { (ss, c) =>
        seedRows(c).getSeq[Long](1)
          .slice(ss * subDim, ss * subDim + subDim).toArray
      }
      var it = 0
      while (it < Iters) {
        // argmin select and the generators MUST be separate steps (the
        // x111 lesson: a generator's sibling expressions re-evaluate
        // once per exploded row if they share its Project)
        val rows = q
          .select(array((0 until M).map(ss =>
            struct(lit(ss).as("s"),
              (subKey(cbs(ss), subCol(col("v"), ss, subDim)) % K)
                .cast("int").as("cid"),
              subCol(col("v"), ss, subDim).as("sv"))): _*).as("a"))
          .select(explode(col("a")).as("e"))
          .select(col("e.s").as("s"), col("e.cid").as("cid"),
            posexplode(col("e.sv")).as(Seq("j", "x")))
          .groupBy("s", "cid", "j")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sm"))
          .collect()
        val next = cbs.map(_.map(_.clone())) // empty cluster keeps its centroid
        rows.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            Math.floorDiv(r.getLong(4), r.getLong(3))
        }
        cbs = next
        it += 1
      }
      cbs
    }

  // ------------------------------------------------------- oracle SQL

  /** Exact integer squared-L2 between two sliced-subvector SQL
    * expressions (x111's distSql at the subspace width). */
  private def sdist(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range($OracleSubDim), j -> " +
      s"($a[CAST(j+1 AS INT)]-$b[CAST(j+1 AS INT)])" +
      s"*($a[CAST(j+1 AS INT)]-$b[CAST(j+1 AS INT)]))) AS BIGINT)"

  /** One subspace's training chain: slice → first-K seed → Iters
    * assign/update rounds (keep-previous-centroid on empty) → final
    * assignment `a{ss}{Iters+1}`, final codebook `c{ss}{Iters}`. */
  private def subChain(ss: Int): String = {
    val lo = ss * OracleSubDim + 1
    val hi = ss * OracleSubDim + OracleSubDim
    def assign(prevC: String, name: String): String =
      s"""$name AS MATERIALIZED (
  SELECT vec_id, any_value(v) AS v, min_by(cid, dist*$K+cid) AS cid FROM (
    SELECT q.vec_id, q.v, c.cid, ${sdist("q.v", "c.c")} AS dist
    FROM sub$ss q CROSS JOIN $prevC c) GROUP BY vec_id)"""
    def update(prevC: String, a: String, name: String): String =
      s"""$name AS MATERIALIZED (
  SELECT p.cid, COALESCE(u.c, p.c) AS c FROM $prevC p LEFT JOIN (
    SELECT cid, list_transform(range($OracleSubDim), j ->
      list_sum(list_transform(list(v), vv -> vv[CAST(j+1 AS INT)])) // count(*)) AS c
    FROM $a GROUP BY cid) u ON p.cid = u.cid)"""
    val rounds = new StringBuilder
    var prev = s"c${ss}0"
    for (r <- 1 to Iters) {
      rounds ++= ",\n" + assign(prev, s"a$ss$r")
      rounds ++= ",\n" + update(prev, s"a$ss$r", s"c$ss$r")
      prev = s"c$ss$r"
    }
    rounds ++= ",\n" + assign(prev, s"a$ss${Iters + 1}")
    s"""sub$ss AS MATERIALIZED (SELECT vec_id, list_slice(v, $lo, $hi) AS v FROM q),
c${ss}0 AS MATERIALIZED (SELECT vec_id AS cid, v AS c FROM sub$ss WHERE vec_id < $K)$rounds"""
  }

  /** Quantize + all M subspace chains (no leading WITH — callers
    * prepend it so they can append their own CTEs). */
  private lazy val pqCtes: String =
    s"""q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, e ->
    CAST(floor(CAST(e AS DOUBLE)*1000) + 2048 AS BIGINT)) AS v
  FROM embeddings),
${(0 until M).map(subChain).mkString(",\n")}"""

  private def finalA(ss: Int) = s"a$ss${Iters + 1}"
  private def finalC(ss: Int) = s"c$ss$Iters"

  private lazy val x148Sql: String = {
    val perSub = (0 until M).map { ss =>
      s"SELECT $ss AS sub, d.cid, COUNT(*) AS n, " +
        "CAST(SUM(d.dist) AS BIGINT) AS sse, " +
        "CAST(list_sum(any_value(c.c)) AS BIGINT) AS m_sum " +
        s"FROM (SELECT a.cid, ${sdist("a.v", "c.c")} AS dist " +
        s"FROM ${finalA(ss)} a JOIN ${finalC(ss)} c ON a.cid = c.cid) d " +
        s"JOIN ${finalC(ss)} c ON d.cid = c.cid GROUP BY d.cid"
    }.mkString(" UNION ALL ")
    s"WITH $pqCtes, r AS ($perSub) " +
      "SELECT CAST(sub AS BIGINT) AS sub, CAST(cid AS BIGINT) AS cid, " +
      "n, sse, m_sum FROM r ORDER BY sub, cid"
  }

  private lazy val x149Sql: String = {
    val luts = (0 until M).map { ss =>
      s"l$ss AS MATERIALIZED (SELECT c.cid, ${sdist("qq.v", "c.c")} AS dd " +
        s"FROM ${finalC(ss)} c, (SELECT v FROM sub$ss WHERE vec_id = 0) qq)"
    }.mkString(",\n")
    val joins = (1 until M).map { ss =>
      s"JOIN ${finalA(ss)} ON ${finalA(ss)}.vec_id = ${finalA(0)}.vec_id " +
        s"JOIN l$ss ON ${finalA(ss)}.cid = l$ss.cid"
    }.mkString(" ")
    s"""WITH $pqCtes,
$luts
SELECT ${finalA(0)}.vec_id AS vec_id,
  CAST(${(0 until M).map(ss => s"l$ss.dd").mkString(" + ")} AS BIGINT) AS adc_dist
FROM ${finalA(0)} JOIN l0 ON ${finalA(0)}.cid = l0.cid $joins
ORDER BY adc_dist, vec_id LIMIT 10"""
  }

  val all: Seq[Query] = Seq(

    // PQ codebook report: per (subspace, centroid) cluster size, exact
    // integer SSE (the quantization DISTORTION a PQ user tunes M and K
    // against — measured, not assumed, the x137/x142 audit doctrine)
    // and the centroid component sum. The declared query is ONE narrow
    // encode pass over the corpus (trained codebooks ride as literals;
    // dist and cid both decode from the single argmin key) into an
    // M·K-bounded aggregate; the codebook side of the join is an
    // M·K-row literal frame.
    Query("x148_pq_codebook", x148Sql) {
      (s, d) => {
        import s.implicits._
        val cbs = train(s, d)
        val subDim = cbs(0)(0).length
        val enc = KMeansQueries.quantized(s, d)
          .select(array((0 until M).map(ss =>
            subKey(cbs(ss), subCol(col("v"), ss, subDim))): _*).as("ks"))
          .select(posexplode(col("ks")).as(Seq("sub", "key")))
          .select(col("sub").cast("long").as("sub"),
            pmod(col("key"), lit(K)).cast("long").as("cid"),
            ((col("key") - pmod(col("key"), lit(K))) / K)
              .cast("long").as("dist"))
          .groupBy("sub", "cid")
          .agg(count(lit(1)).as("n"), sum(col("dist")).as("sse"))
        val mSums = (0 until M).flatMap(ss => (0 until K).map(c =>
          (ss.toLong, c.toLong, cbs(ss)(c).sum))).toDF("sub", "cid", "m_sum")
        enc.join(broadcast(mSums), Seq("sub", "cid"))
          .select(col("sub"), col("cid"), col("n"), col("sse"), col("m_sum"))
          .orderBy("sub", "cid")
      }
    },

    // PQ asymmetric-distance kNN — the SEARCH half: the query vector
    // stays full-precision (well, fixed-point — the shared integer
    // grid), each subspace precomputes its K-entry distance lookup
    // table driver-side (M·K bounded longs from the cached codebooks
    // + one bounded 1-row query fetch, x64's documented pattern), and
    // every corpus vector's distance is M literal-array lookups
    // indexed by its PQ code + (M−1) integer adds — a single narrow
    // scan + TakeOrdered, no joins, no per-dimension work. This is
    // the plan an IVFADC store runs inside each probed cell at
    // 100 TB; x64 keeps the per-dimension scalar-quant variant for
    // contrast. Exact integers end to end — no rounding needed before
    // the (adc_dist, vec_id) ranking.
    Query("x149_pq_adc", x149Sql) {
      (s, d) => {
        val cbs = train(s, d)
        val subDim = cbs(0)(0).length
        val qRow = KMeansQueries.quantized(s, d)
          .filter(col("vec_id") === 0).select(col("v"))
          .collect()
        require(qRow.nonEmpty, "query vector 0 missing")
        val qv = qRow.head.getSeq[Long](0).toArray
        val luts: Array[Array[Long]] = Array.tabulate(M, K) { (ss, c) =>
          sqDist(qv.slice(ss * subDim, ss * subDim + subDim), cbs(ss)(c))
        }
        val adc = (0 until M).map { ss =>
          element_at(array(luts(ss).map(lit).toIndexedSeq: _*),
            pmod(subKey(cbs(ss), subCol(col("v"), ss, subDim)), lit(K))
              .cast("int") + 1)
        }.reduce(_ + _)
        KMeansQueries.quantized(s, d)
          .select(col("vec_id"), adc.cast("bigint").as("adc_dist"))
          .orderBy(col("adc_dist"), col("vec_id")).limit(10)
      }
    }
  )
}
