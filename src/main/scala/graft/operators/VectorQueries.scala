package graft.operators

import graft.Query
import graft.functions.VectorFns
import graft.functions.VectorFns.Sql
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (SURVEY.md §2.1 Q23 +
 * extensions): brute-force k-NN under L2 and cosine, all-pairs
 * embedding near-dup detection, an SRP-LSH bucketed ANN variant and a
 * k-means IVF variant as the scale paths.
 *
 * Brute force broadcasts the (tiny) query side and scans the corpus
 * once — at 100 TB this is the exact-answer baseline you run per query
 * batch. The LSH variant hashes every vector into per-table sign-bit
 * buckets so candidate generation becomes an equi-join on the bucket
 * id; the IVF variant learns coarse cells with k-means and probes only
 * the nearest cells.
 *
 * Both ANN variants are FULLY oracle-checked despite being
 * "approximate": approximation lives in the candidate sets, and the
 * candidate sets are deterministic — the hyperplanes are seed-stable
 * literals baked into the oracle SQL, and k-means runs on a fixed-point
 * projection (floor(x·2¹⁶) as int64) whose sums are exact integers, so
 * centroid arithmetic has no float-accumulation-order exposure and both
 * engines derive bit-identical cells, probes and top-k.
 */
object VectorQueries {

  private def emb(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  // ------------------------------------------------- scalar quantization
  // x63/x64 shared codebook: per-dimension (min, max) over the corpus.
  // One posexplode → partial-combine agg to n_dims rows (bounded corpus
  // metadata, collected under x41's rate-table contract) so downstream
  // encode/search stages are join-free narrow maps over literal arrays.

  private val SqDims = 64

  /** DuckDB replica of the codebook CTE (named `stats`). */
  private val sqStatsSql: String =
    "stats AS (SELECT t.i, " +
      "MIN(CAST(embedding[t.i] AS DOUBLE)) AS mn, " +
      "MAX(CAST(embedding[t.i] AS DOUBLE)) AS mx " +
      s"FROM embeddings CROSS JOIN generate_series(1, $SqDims) AS t(i) " +
      "GROUP BY t.i)"

  private def sqStats(s: SparkSession, d: String): Map[Int, (Double, Double)] =
    emb(s, d)
      .select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("i").agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  /** Literal-array codebook: encode/dequantize expressions over a
    * (value, 0-based index) pair — floor(x+0.5) keeps the code free of
    * engine rounding-mode variance (see x63's header). */
  private final class Codebook(stats: Map[Int, (Double, Double)]) {
    private val mns = array((0 until SqDims).map(i => lit(stats(i)._1)): _*)
    private val mxs = array((0 until SqDims).map(i => lit(stats(i)._2)): _*)
    def mn(i: Column): Column = element_at(mns, i + 1)
    def mx(i: Column): Column = element_at(mxs, i + 1)
    def code(v: Column, i: Column): Column =
      when(mx(i) > mn(i),
        floor((v.cast("double") - mn(i)) * 255 / (mx(i) - mn(i)) + 0.5))
        .otherwise(lit(0.0))
    def deq(v: Column, i: Column): Column =
      mn(i) + code(v, i) * (mx(i) - mn(i)) / 255
  }

  // ---------------------------------------------------------------- LSH
  private val L = 8 // hash tables
  private val K = 4 // sign bits per table
  private lazy val planes = VectorFns.hyperplanes(L * K, 64)

  private def planeLit(p: Array[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** DuckDB replica of table t's bucket id: the same double dot
    * products against the same ±1 plane literals, same sign rule. */
  /** DuckDB replica of table t's raw bucket BITS (the integer the
    * "t|bits" id encodes) — factored so the multi-probe audit can do
    * Hamming arithmetic on it. */
  private def tbBitsSql(t: Int): String = {
    val bits = (0 until K).map { j =>
      s"(CASE WHEN ${Sql.dot("embedding", planeLit(planes(t * K + j)))} > 0 " +
        s"THEN ${1 << j} ELSE 0 END)"
    }
    bits.mkString(" + ")
  }

  private def tbSql(t: Int): String =
    s"'$t|' || CAST(${tbBitsSql(t)} AS VARCHAR)"

  /** Spark twin of tbSql: table t's bucket id for an embedding column
    * (same ±1 planes, same sign rule, same "t|bits" encoding). */
  private def tbColumn(t: Int, e: Column): Column = {
    val bits = (0 until K).map { j =>
      val coef = array(planes(t * K + j).map(v => lit(v.toFloat))
        .toIndexedSeq: _*)
      when(VectorFns.dot(e, coef) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    concat(lit(s"$t|"), bits)
  }

  /** All L bucket ids for an embedding, as an array column (exploded
    * into the (vec_id, tb) inverted index both ANN queries join on). */
  private def tbArray(e: Column): Column =
    array((0 until L).map(t => tbColumn(t, e)).toIndexedSeq: _*)

  /** The (vec_id, tb) inverted-index rows for an embeddings frame —
    * the build function x10/x11 hand [[VectorIndex.srpForDir]],
    * exposed so the ingestion flow maintains the SAME stored index
    * incrementally (one index serves queries and the flow). */
  private[graft] def srpIndexRows(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(tbArray(col("embedding"))).as("tb"))

  /** DuckDB CTE chain ending in `res(vec_id, cos)` — the SRP-probe +
    * exact-cosine stage shared by x11 (top-10) and x128's dense
    * hybrid-retrieval arm (top-20 rank): candidates share ≥1 of query
    * vector 0's L bucket ids, cosine rounded to 6. */
  /** The SRP inverted-index CTE alone (`idx(vec_id, tb)`) — shared by
    * [[annCosSql]] and x138's recall-audit oracle. */
  private lazy val srpIdxSql =
    s"idx AS (SELECT vec_id, unnest([${(0 until L).map(tbSql).mkString(", ")}]) AS tb " +
      "FROM embeddings)"

  private[operators] lazy val annCosSql =
    s"$srpIdxSql, " +
      "qt AS (SELECT tb AS qtb FROM idx WHERE vec_id = 0), " +
      "qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
      "cand AS (SELECT DISTINCT i.vec_id FROM idx i JOIN qt ON i.tb = qt.qtb), " +
      s"res AS (SELECT e.vec_id, round(${Sql.cosine("e.embedding", "qv.qe")}, 6) AS cos " +
      "FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, qv)"

  private lazy val x11Sql =
    s"WITH $annCosSql SELECT vec_id, cos FROM res ORDER BY cos DESC, vec_id LIMIT 10"

  /** (vec_id, cos): [[annCosSql]]'s Spark twin — probes the STORED SRP
    * inverted index with query vector 0's L buckets (one bounded 1-row
    * collect, x11's documented pattern), partition-prunes to those
    * bucket directories, exact-cosine re-ranks. Probe cost is O(query
    * buckets), never O(corpus·L). */
  private[operators] def annCosineFrame(s: SparkSession, d: String): DataFrame = {
    val idxStore = VectorIndex.srpForDir(s, d, srpIndexRows)
    val qtbs = emb(s, d).filter(col("vec_id") === 0)
      .select(tbArray(col("embedding")).as("tbs"))
      .collect().head.getSeq[String](0)
    val cand = idxStore.load("srp_idx")
      .filter(col("tb").isin(qtbs: _*))
      .select(col("vec_id")).distinct()
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    emb(s, d).join(cand, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
  }

  // ---------------------------------------------------------------- IVF
  // build parameters live on the stored index (VectorIndex); NProbe is
  // a query-time knob
  private val Cells = VectorIndex.Cells
  private[operators] val NProbe = 3
  /** x137's fixed query-vector slice [lo, hi) — deliberately NOT the
    * IVF seed vectors (vec_id < Cells), so the audit measures probe
    * quality on ordinary corpus vectors. */
  private[graft] val RecallQLo = 100
  private[graft] val RecallQHi = 108

  /** The x137/x138 query-vector slice, collected once per call —
    * 8 bounded driver rows (the x41 rate-table contract). FAILS
    * LOUDLY on a corpus too small to carry the slice (r16 ADVICE: an
    * empty query frame would make every recall audit emit zero rows,
    * which an operator can misread as a passing audit rather than
    * "not measurable"). */
  private[graft] def recallQueries(s: SparkSession, d: String)
      : Array[(Long, Seq[Float])] = {
    val q = emb(s, d)
      .filter(col("vec_id") >= RecallQLo && col("vec_id") < RecallQHi)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(q.nonEmpty, s"recall audit not measurable: corpus at $d " +
      s"has no vectors in the query slice [$RecallQLo, $RecallQHi)")
    q
  }

  /** Per-qid top-10 by (6-rounded cos DESC, vec_id) — WindowGroupLimit
    * map-local top-k, never a corpus-sized per-key buffer. */
  private[graft] def recallTop10(scored: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select("qid", "vec_id")
  }

  /** recall@10 of an approximate (qid, vec_id) top-10 set against the
    * exact-kNN arm — the audit frame x137 (IVF) and x138 (SRP) share.
    * `q` is the 8-row (qid, qe) query frame. */
  private[graft] def recallVsExact(s: SparkSession, d: String, q: DataFrame,
      approxTop: DataFrame): DataFrame = {
    val ex = recallTop10(emb(s, d).crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6)
          .as("cos")))
    ex.join(approxTop.withColumn("hit", lit(1)),
        Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_hits"))
      .select(col("qid"), col("n_hits"),
        round(col("n_hits") / 10.0, 4).as("recall"))
      .orderBy("qid")
  }

  /** The shared tail of every probe-width recall CURVE (x142 IVF,
    * x150 SRP, x151 PQ): `scored` carries one row per (qid, vec_id)
    * candidate pair with its 6-rounded exact cosine and a
    * param-comparable value `pv` (centroid rank, min Hamming
    * distance, ADC rank); a grid entry `gp` qualifies the pair iff
    * pv ≤ gp; per-(gp, qid) top-10 rides the map-local window; the
    * exact arm and the left-join/agg are the x137 frame. ONE
    * definition so a fix to the denominator, the rounding or the
    * tie-break reaches all three ANN families' audits at once. */
  private[operators] def gridRecallFrame(s: SparkSession, d: String,
      q: DataFrame, scored: DataFrame, grid: Seq[Long],
      outName: String, exactBase: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val gridDf = grid.map(Tuple1(_)).toDF("gp")
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("gp", "qid").orderBy(col("cos").desc, col("vec_id"))
    val top = scored.join(broadcast(gridDf), col("pv") <= col("gp"))
      .withColumn("rn", row_number().over(wnd))
      .filter(col("rn") <= 10)
      .select(col("gp"), col("qid"), col("vec_id"), lit(1).as("hit"))
    // the exact arm defaults to the whole corpus; a FILTERED audit
    // (x154) hands in the predicate-restricted base so both arms
    // rank inside the same candidate universe
    val ex = recallTop10(exactBase.getOrElse(emb(s, d))
      .crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6)
          .as("cos")))
    ex.crossJoin(broadcast(gridDf))
      .join(top, Seq("gp", "qid", "vec_id"), "left")
      .groupBy("gp")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_hits"),
        count(lit(1)).as("n"))
      .select(col("gp").cast("bigint").as(outName), col("n_hits"),
        round(col("n_hits") / col("n").cast("double"), 4)
          .as("avg_recall"))
      .orderBy(outName)
  }

  /** (qid, n_hits, recall): x137's recall@10 audit at an arbitrary
    * probe width — the engine body behind the declared query, exposed
    * so VectorSpec can pin the completeness property (nProbe = Cells
    * probes every cell, so the IVF arm IS exact search and recall must
    * be 1.0 for every query) and probe-width monotonicity. */
  private[graft] def annRecall(s: SparkSession, d: String,
      nProbe: Int): DataFrame = {
    import s.implicits._
    val idx = VectorIndex.forDir(s, d)
    val qRows = recallQueries(s, d)
    // 8 driver-side probes of the in-memory routing table — the
    // same bounded work class as x20's single probe
    val probes = qRows.flatMap { case (qid, e) =>
      idx.probeCells(VectorIndex.fixedPoint(e), nProbe)
        .map(c => (qid, c))
    }.toSeq.toDF("qid", "cell")
    val q = qRows.toSeq.toDF("qid", "qe")
    val iv = recallTop10(idx.corpus
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6)
          .as("cos")))
    recallVsExact(s, d, q, iv)
  }

  /** (qid, n_hits, recall): x138's SRP-LSH recall@10 audit — the same
    * exact arm, with candidates = vectors sharing ≥1 of each query's
    * L stored bucket ids (x11's probe shape, per query). */
  private[graft] def srpRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idxStore = VectorIndex.srpForDir(s, d, srpIndexRows)
    val qRows = recallQueries(s, d)
    // 8 bounded rows × L buckets each → a 64-row broadcast probe
    // table, derived from the ALREADY-collected query frame (a third
    // corpus scan for the same 8 rows was review-caught)
    val q = qRows.toSeq.toDF("qid", "qe")
    val probes = q.select(col("qid"),
      explode(tbArray(col("qe"))).as("tb"))
    val cand = idxStore.load("srp_idx")
      .join(broadcast(probes), Seq("tb"))
      .select(col("qid"), col("vec_id")).distinct()
    val sr = recallTop10(cand
      .join(emb(s, d), Seq("vec_id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6)
          .as("cos")))
    recallVsExact(s, d, q, sr)
  }

  // ------------------------------------------------ SRP multi-probe
  // x138 measured SRP recall at the single-bucket probe and (like
  // x137 before r17) nothing consumed the number. Multi-probe LSH
  // (Lv et al., VLDB'07) is the SRP family's probe-width knob: at
  // radius r every bucket within Hamming distance r of the query's
  // bucket is probed in each of the L tables, trading bounded extra
  // bucket reads (L·ΣC(K,≤r) buckets) for recall — the exact
  // analogue of IVF's nProbe. x150 measures the recall curve over
  // every radius 0..K, retuneSrp picks the serving radius from it,
  // and `/search?like=&index=srp` serves at that policy.

  /** The stored "t|bits" bucket id parsed back to integer (t, bits) —
    * the multi-probe audit's Hamming-arithmetic view. */
  private def tbParsed(idx: DataFrame): DataFrame =
    idx.select(col("vec_id"),
      split(col("tb"), "\\|").getItem(0).cast("int").as("t"),
      split(col("tb"), "\\|").getItem(1).cast("int").as("bits"))

  /** (radius, n_hits, avg_recall): the measured recall@10 curve of
    * the stored SRP index over probe radii 0..`maxR` — x150's engine
    * body and [[retuneSrp]]'s decision input. ONE candidate pass
    * shared by every radius (the x142 technique): each (query,
    * candidate) pair carries its MINIMUM over tables of the Hamming
    * distance between stored bucket bits (one XOR + bit_count per
    * stored row per query — the 64-row parsed query-bucket table
    * broadcasts), a radius qualifies the pair iff that minimum ≤ r,
    * and per-(radius, qid) top-10 rides the same map-local window as
    * every recall audit. radius = K probes everything, so its recall
    * is structurally 1.0 — the curve's anchor (spec-pinned). Batch-
    * boundary audit cost, never a per-request path. */
  private[graft] def srpRadiusCurve(s: SparkSession, d: String,
      maxR: Int = K): DataFrame = {
    import s.implicits._
    val idxStore = VectorIndex.srpForDir(s, d, srpIndexRows)
    val qRows = recallQueries(s, d)
    val q = qRows.toSeq.toDF("qid", "qe")
    val qids = qRows.map(_._1).toSeq
    val parsed = tbParsed(idxStore.load("srp_idx"))
    val qidx = broadcast(parsed.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("t"), col("bits").as("qbits")))
    val crad = parsed.join(qidx, Seq("t"))
      .groupBy("qid", "vec_id")
      .agg(min(bit_count(col("bits").bitwiseXOR(col("qbits"))))
        .as("crad"))
    val scored = crad
      .join(emb(s, d), Seq("vec_id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"), col("crad").as("pv"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
    gridRecallFrame(s, d, q, scored, (0L to maxR.toLong), "radius")
  }

  // Per-corpus-dir SRP serving radius, default 0 (x11's single-bucket
  // probe) until a [[retuneSrp]] run picks one from the measured
  // curve. Same fingerprint-pinning rule as [[servingProbeWidth]].
  private val servingRadius =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()

  /** The probe radius `/search?like=&index=srp` serves `d` at. Pinned
    * to the corpus version it was measured on — any corpus change
    * reverts to the default until the next retune (the
    * [[servingProbeWidth]] doctrine). */
  private[graft] def srpServingRadius(d: String): Int =
    Option(servingRadius.get(d)) match {
      case Some((fp, r))
        if fp == StoredIndexes.fingerprint(d, "embeddings.parquet") => r
      case _ => 0
    }

  /** Audit-driven SRP retune — [[retuneIvf]]'s sibling for the second
    * ANN family: re-measures the radius curve on the CURRENT index
    * and picks the smallest probe radius whose mean recall@10 ≥
    * `floor`. No rebuild arm, deliberately: SRP hyperplanes are
    * DATA-INDEPENDENT (a fixed seed, not trained state), so re-
    * hashing the same corpus reproduces the same buckets — when even
    * radius K−1 misses the floor the honest response is the widest
    * radius (K probes every bucket, recall 1.0 by construction, at
    * full-scan cost), not a no-op rebuild. Returns the chosen
    * radius; batch-boundary scheduling, like refreshTopics. */
  private[graft] def retuneSrp(s: SparkSession, d: String,
      floor: Double = 0.9): Int = {
    val r = srpRadiusCurve(s, d).collect()
      .collectFirst { case row if row.getDouble(2) >= floor =>
        row.getLong(0).toInt }
      .getOrElse(K)
    servingRadius.put(d,
      (StoredIndexes.fingerprint(d, "embeddings.parquet"), r))
    r
  }

  /** All stored bucket ids within Hamming radius `r` of the query
    * embedding's L buckets — the serving probe list, enumerated
    * driver-side (bounded: L·ΣC(K,≤r) ids). The driver dot product
    * replays the engine's sequential float→double fold exactly (same
    * IEEE op order), so the computed buckets equal the stored ones. */
  private def probeBuckets(qe: Seq[Float], r: Int): Seq[String] = {
    val masks = (0 until (1 << K)).filter(Integer.bitCount(_) <= r)
    (0 until L).flatMap { t =>
      var qbits = 0
      (0 until K).foreach { j =>
        val p = planes(t * K + j)
        var s = 0.0; var i = 0
        while (i < qe.length) { s += qe(i).toDouble * p(i); i += 1 }
        if (s > 0) qbits |= (1 << j)
      }
      masks.map(m => s"$t|${qbits ^ m}")
    }.distinct
  }

  /** (vec_id, cos): exact-cosine re-rank of the SRP multi-probe
    * candidate set for corpus vector `queryId` — the
    * `/search?like=&index=srp` serving arm, [[ivfKnn]]'s shape over
    * the OTHER stored index: query vector from the stored forward
    * table (point fetch), probe ids enumerated driver-side, candidate
    * generation = a bucket-pruned scan of the stored inverted index
    * (the x11 partition-pruning plan), one cosine per candidate.
    * `radius` < 0 means "the serving policy's radius"
    * ([[srpServingRadius]]); values are clamped to K. Throws
    * NoSuchElementException for an absent queryId (→ 404). */
  private[graft] def srpKnn(s: SparkSession, d: String,
      queryId: Long, radius: Int = -1): DataFrame = {
    val qe = VectorIndex.forDir(s, d).lookup(queryId).getOrElse(
      throw new NoSuchElementException(s"no such vector: $queryId"))
    val r = (if (radius >= 0) radius else srpServingRadius(d)).min(K)
    val ids = probeBuckets(qe, r)
    val idxStore = VectorIndex.srpForDir(s, d, srpIndexRows)
    val cand = idxStore.load("srp_idx").filter(col("tb").isin(ids: _*))
      .select(col("vec_id")).distinct()
    import s.implicits._
    val q = Seq(Tuple1(qe)).toDF("qe")
    emb(s, d).join(cand, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
  }

  // ------------------------------------------------ IVF serving policy
  // Per-corpus-dir serving probe width, default NProbe until a
  // [[retuneIvf]] run picks one from the MEASURED recall curve — the
  // r16 verdict's ask #2: x137 measured recall@10 at the fixed
  // serving width and nothing consumed the number. The declared x20
  // stays pinned at the oracle-replayed NProbe; the SERVING endpoint
  // reads this policy.
  private val servingWidth =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()

  /** The probe width `/search?like=` serves `dir` at (policy-set by
    * [[retuneIvf]], NProbe until then). The pick is PINNED to the
    * corpus version it was measured on: any corpus change — rewrite
    * OR append-only ingest — reverts to the default until the next
    * retune, because a width tuned on one geometry says nothing about
    * another (the StoredIndexes stale-derived-state doctrine;
    * review-caught — the first cut kept serving the old pick across a
    * silent fingerprint rebuild). The check is a file-metadata walk,
    * the same cost class every stored-index probe already pays. */
  private[graft] def servingProbeWidth(d: String): Int =
    Option(servingWidth.get(d)) match {
      case Some((fp, w))
        if fp == StoredIndexes.fingerprint(d, "embeddings.parquet") => w
      case _ => NProbe
    }

  /** (vec_id, cos): exact-cosine re-rank inside the `nProbe` nearest
    * stored IVF cells for corpus vector `queryId` — x20's probe shape
    * parameterized for the more-like-this retrieval surface
    * (`GET /search?like=<vec_id>[&nprobe=N]`). The query vector is a
    * point fetch from the stored `fwd` forward table
    * ([[VectorIndex.Ivf.lookup]] — partition-pruned +
    * row-group-skipped, r16 ADVICE closed: the previous
    * emb()-filter fetch was a full embeddings scan per request), then
    * centroid ranking against the in-memory routing table and a scan
    * of ONLY the probed cell PARTITIONS (PartitionFilters prune the
    * rest) with one cosine per candidate — O(probed cells) at any
    * index size. `nProbe` ≤ 0 means "the serving policy's width"
    * ([[servingProbeWidth]]). Throws NoSuchElementException for an
    * absent queryId (the endpoint maps it to 404). */
  private[graft] def ivfKnn(s: SparkSession, d: String,
      queryId: Long, nProbe: Int = -1): DataFrame = {
    val idx = VectorIndex.forDir(s, d)
    val qe = idx.lookup(queryId).getOrElse(
      throw new NoSuchElementException(s"no such vector: $queryId"))
    val w = (if (nProbe > 0) nProbe else servingProbeWidth(d))
      .min(idx.centroids.length)
    val probeCells = idx.probeCells(VectorIndex.fixedPoint(qe), w)
    import s.implicits._
    val q = Seq(Tuple1(qe)).toDF("qe")
    idx.corpus.filter(col("cell").isin(probeCells: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
  }

  /** (nprobe, n_hits, avg_recall): the measured recall@10 CURVE of
    * the stored IVF index over probe widths 1..`maxW` — x142's engine
    * body and [[retuneIvf]]'s decision input. One exact arm (the x137
    * corpus scan with 8 broadcast cosines + WindowGroupLimit) and ONE
    * candidate pass shared by every width: each candidate carries its
    * cell's per-query probe RANK (driver-ranked, ≤ Cells×8 broadcast
    * rows), a width qualifies the candidate iff rank ≤ w, top-10 per
    * (width, qid) via the same map-local window. avg_recall derives
    * from the exact-integer hit sum with ONE double division
    * (Σhits/(10·nq)), so both engines round identically. Cost is
    * bounded by maxW × the single x137 audit — a batch-boundary
    * audit, never a per-request path. */
  private[graft] def recallCurve(s: SparkSession, d: String,
      maxW: Int = Cells, label: Option[Int] = None): DataFrame = {
    import s.implicits._
    val idx = VectorIndex.forDir(s, d)
    val qRows = recallQueries(s, d)
    val cranks = qRows.flatMap { case (qid, e) =>
      val qd = VectorIndex.fixedPoint(e)
      idx.centroids.map { case (c, m) => (VectorIndex.l2(qd, m), c) }
        .sorted.zipWithIndex.map { case ((_, c), i) => (qid, c, i + 1) }
    }.toSeq.toDF("qid", "cell", "crank")
    val q = qRows.toSeq.toDF("qid", "qe")
    // `label` restricts BOTH arms to one metadata label (x154's
    // filtered audit) — same cranks, same frame, plus a predicate
    val scored0 = idx.corpus
      .join(broadcast(cranks), Seq("cell"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"), col("crank").as("pv"),
        round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
    val scored = label.fold(scored0)(l => scored0.join(
      emb(s, d).filter(col("label") === l).select("vec_id"),
      Seq("vec_id"), "left_semi"))
    gridRecallFrame(s, d, q, scored, (1L to maxW.toLong), "nprobe",
      exactBase = label.map(l => emb(s, d).filter(col("label") === l)))
  }

  /** Audit-driven IVF retune — the refreshTopics doctrine applied to
    * the recall audit (r16 verdict ask #2): an explicit
    * batch-boundary op an operator (or the ingest pipeline) runs
    * after incremental ingests, because [[VectorIndex.ingest]]
    * deliberately FREEZES centroids (drift is tolerated until someone
    * decides otherwise) and x137's measured recall is the number that
    * says when. Re-measures the recall curve on the CURRENT index and
    * picks the smallest probe width whose mean recall@10 ≥ `floor`;
    * if no width ≤ `maxProbe` reaches the floor (drifted centroids
    * forcing the probe budget past its latency envelope), REBUILDS
    * the index — re-training centroids on the grown corpus
    * ([[VectorIndex.rebuild]]) — and re-picks from the fresh curve
    * (clamped to maxProbe if even the fresh index misses the floor
    * inside the budget: serve the best width the budget buys, the
    * honest fallback). The chosen width becomes the serving default
    * ([[servingProbeWidth]]) for `d`. Not atomic against a
    * concurrently-triggering ingest — slot it between triggers, like
    * refreshTopics. Returns (width, rebuilt?). */
  private[graft] def retuneIvf(s: SparkSession, d: String,
      floor: Double = 0.9, maxProbe: Int = Cells): (Int, Boolean) = {
    def pick(): Option[Int] = recallCurve(s, d, maxProbe).collect()
      .collectFirst {
        case r if r.getDouble(2) >= floor => r.getLong(0).toInt
      }
    val (w, rebuilt) = pick() match {
      case Some(w0) => (w0, false)
      case None =>
        VectorIndex.rebuild(s, d)
        (pick().getOrElse(maxProbe), true)
    }
    // pin the pick to the corpus version the curve was measured on
    servingWidth.put(d,
      (StoredIndexes.fingerprint(d, "embeddings.parquet"), w))
    (w, rebuilt)
  }
  private val Dim = VectorIndex.Dim
  private val Scale = VectorIndex.Scale

  /** Per-cell fixed-point centroid: exact int sums, then one exact
    * int→double division per dimension (deterministic IEEE in both
    * engines — no float accumulation order anywhere). */
  private def centSql(src: String): String =
    "SELECT cell, [" +
      (0 until Dim).map(i => s"CAST(SUM(pfp[${i + 1}]) AS DOUBLE) / COUNT(*)")
        .mkString(", ") + s"] AS m FROM $src GROUP BY cell"

  /** Nearest-centroid assignment with (distance, cell) tie-break. */
  private def assignSql(cen: String): String =
    "SELECT vec_id, embedding, pfp, pd, cell FROM (" +
      "SELECT b.*, c.cell, ROW_NUMBER() OVER (PARTITION BY b.vec_id " +
      s"ORDER BY ${Sql.l2sq("b.pd", "c.m")}, c.cell) AS rn " +
      s"FROM base b, $cen c) WHERE rn = 1"

  /** The IVF build replay (fixed-point projection → seeds → two Lloyd
    * rounds → final assignment `af`, centroids `c2`) — shared by the
    * x20 probe oracle and the x137 recall-audit oracle. */
  private[operators] lazy val ivfBuildSql =
    "b0 AS (SELECT vec_id, embedding, list_transform(embedding, " +
      s"x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS pfp FROM embeddings), " +
      "base AS (SELECT vec_id, embedding, pfp, " +
      "list_transform(pfp, f -> CAST(f AS DOUBLE)) AS pd FROM b0), " +
      s"c0 AS (SELECT vec_id AS cell, pd AS m FROM base WHERE vec_id < $Cells), " +
      s"a1 AS (${assignSql("c0")}), c1 AS (${centSql("a1")}), " +
      s"a2 AS (${assignSql("c1")}), c2 AS (${centSql("a2")}), " +
      s"af AS (${assignSql("c2")})"

  /** The x142 probe-width recall-curve replay, optionally restricted
    * to one metadata label on BOTH arms (x154) — ONE generator so the
    * filtered audit is provably the same frame plus a predicate. */
  private[operators] def ivfCurveSql(label: Option[Int]): String = {
    val lj = label.fold("")(l =>
      s" JOIN embeddings lf ON lf.vec_id = f.vec_id AND lf.label = $l")
    val lb = label.fold("")(l =>
      s" JOIN embeddings lb ON lb.vec_id = b.vec_id AND lb.label = $l")
    s"WITH $ivfBuildSql, " +
      "q AS (SELECT vec_id AS qid, pd AS qd, embedding AS qe " +
      s"FROM base WHERE vec_id >= $RecallQLo AND vec_id < $RecallQHi), " +
      s"ws AS (SELECT unnest(range(1, $Cells + 1)) AS w), " +
      "crank AS (SELECT qid, cell, rn FROM (SELECT q.qid, c.cell, " +
      "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY " +
      s"${Sql.l2sq("q.qd", "c.m")}, c.cell) AS rn FROM c2 c, q)), " +
      "iv AS (SELECT w, qid, vec_id FROM (SELECT ws.w, cr.qid, " +
      "f.vec_id, ROW_NUMBER() OVER (PARTITION BY ws.w, cr.qid " +
      s"ORDER BY round(${Sql.cosine("f.embedding", "q.qe")}, 6) DESC, " +
      s"f.vec_id) AS rn FROM af f$lj JOIN crank cr ON f.cell = cr.cell " +
      "JOIN ws ON cr.rn <= ws.w JOIN q ON q.qid = cr.qid) " +
      "WHERE rn <= 10), " +
      "ex AS (SELECT qid, vec_id FROM (SELECT q.qid, b.vec_id, " +
      "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY " +
      s"round(${Sql.cosine("b.embedding", "q.qe")}, 6) DESC, b.vec_id) " +
      s"AS rn FROM base b$lb, q) WHERE rn <= 10), " +
      "exw AS (SELECT ws.w, ex.qid, ex.vec_id FROM ex, ws) " +
      "SELECT CAST(exw.w AS BIGINT) AS nprobe, " +
      "CAST(COUNT(iv.vec_id) AS BIGINT) AS n_hits, " +
      "round(COUNT(iv.vec_id) / CAST(COUNT(*) AS DOUBLE), 4) " +
      "AS avg_recall FROM exw LEFT JOIN iv ON iv.w = exw.w " +
      "AND iv.qid = exw.qid AND iv.vec_id = exw.vec_id " +
      "GROUP BY exw.w ORDER BY nprobe"
  }

  private lazy val x20Sql =
    s"WITH $ivfBuildSql, " +
      "qd AS (SELECT pd AS v FROM base WHERE vec_id = 0), " +
      "qe AS (SELECT embedding AS v FROM base WHERE vec_id = 0), " +
      "probe AS (SELECT cell FROM (SELECT c.cell, ROW_NUMBER() OVER " +
      s"(ORDER BY ${Sql.l2sq("qd.v", "c.m")}, c.cell) AS rn FROM c2 c, qd) " +
      s"WHERE rn <= $NProbe), " +
      s"res AS (SELECT f.vec_id, round(${Sql.cosine("f.embedding", "qe.v")}, 6) AS cos " +
      "FROM af f JOIN probe p ON f.cell = p.cell, qe) " +
      "SELECT vec_id, cos FROM res ORDER BY cos DESC, vec_id LIMIT 10"

  val all: Seq[Query] = Seq(

    // survey Q23: top-10 by L2 distance to vec_id 0
    Query("q23_knn",
      "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
        s"SELECT vec_id, round(${Sql.l2sq("embedding", "qe")}, 4) AS d2 " +
        "FROM embeddings, q ORDER BY d2, vec_id LIMIT 10") {
      (s, d) =>
        val q = emb(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        emb(s, d).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(VectorFns.l2sq(col("embedding"), col("qe")), 4).as("d2"))
          .orderBy("d2", "vec_id")
          .limit(10)
    },

    // cosine top-10 for the same query vector
    Query("x9_knn_cosine",
      "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
        s"SELECT vec_id, round(${Sql.cosine("embedding", "qe")}, 6) AS cos " +
        "FROM embeddings, q ORDER BY cos DESC, vec_id LIMIT 10") {
      (s, d) =>
        val q = emb(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        emb(s, d).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // embedding near-dup pairs at 100 TB shape: LSH-prefiltered
    // candidate generation + exact cosine verify. Candidates are pairs
    // sharing ≥1 of the L=8 SRP bucket ids (an equi-join on the
    // inverted index — never an all-pairs product), verified with the
    // exact cosine ≥ 0.45 (threshold sits in a verified data gap
    // 0.4494–0.4516 so float noise cannot flip membership). The oracle
    // mirrors the identical plane literals, so even the probabilistic
    // recall misses reproduce bit-for-bit; VectorSpec keeps the exact
    // all-pairs formulation as TEST-ONLY ground truth and pins the
    // prefilter's recall against it.
    Query("x10_embed_neardup",
      s"WITH idx AS (SELECT vec_id, unnest([${(0 until L).map(tbSql).mkString(", ")}]) AS tb " +
        "FROM embeddings), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM idx a JOIN idx b ON a.tb = b.tb AND a.vec_id < b.vec_id), " +
        "c AS (SELECT vec_a, vec_b, " +
        s"${Sql.cosine("ea.embedding", "eb.embedding")} AS cos " +
        "FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a " +
        "JOIN embeddings eb ON eb.vec_id = cand.vec_b) " +
        "SELECT vec_a, vec_b, round(cos, 6) AS cos FROM c " +
        "WHERE cos >= 0.45 ORDER BY vec_a, vec_b") {
      (s, d) =>
        // candidate generation reads the SAME build-once stored SRP
        // index x11 probes (one index serves point-ANN and near-dup) —
        // no per-query recomputation of 32 hyperplane dot products per
        // vector on both join sides; embeddings and precomputed norms
        // join back AFTER dedup, so the verify stage does one dot
        // product per candidate pair instead of three folds.
        // (dot/‖a‖)/‖b‖ keeps the IEEE op sequence of VectorFns.cosine,
        // so values stay oracle-identical.
        val idx = VectorIndex.srpForDir(s, d, srpIndexRows).load("srp_idx")
        val cand = idx.select(col("vec_id").as("vec_a"), col("tb"))
          .join(idx.select(col("vec_id").as("vec_b"), col("tb")), Seq("tb"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b")).distinct()
        val base = emb(s, d).select(col("vec_id"), col("embedding"),
          sqrt(VectorFns.normsq(col("embedding"))).as("nrm"))
        cand
          .join(base.select(col("vec_id").as("vec_a"),
            col("embedding").as("ea"), col("nrm").as("na")), Seq("vec_a"))
          .join(base.select(col("vec_id").as("vec_b"),
            col("embedding").as("eb"), col("nrm").as("nb")), Seq("vec_b"))
          .withColumn("cos",
            VectorFns.dot(col("ea"), col("eb")) / col("na") / col("nb"))
          .filter(col("cos") >= 0.45)
          .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
          .orderBy("vec_a", "vec_b")
    },

    // SRP-LSH bucketed ANN against the STORED inverted index
    // (VectorIndex.srpForDir): L=8 hash tables of k=4 deterministic
    // hyperplane sign bits, built ONCE per corpus and persisted
    // through TableStore partitioned by bucket id. The declared query
    // computes the query vector's L buckets (one 1-row scan — exact
    // expression parity with the build), partition-prunes the index to
    // those L directories, and exact-cosine re-ranks the candidates —
    // probe cost is O(query's buckets), not O(corpus·L). The oracle
    // mirrors the identical plane literals and sign rule, so even the
    // probabilistic recall misses reproduce bit-for-bit —
    // rows+schema+hash checked; VectorSpec additionally asserts recall
    // against the brute-force top-10 and the partition pruning.
    Query("x11_ann_lsh", x11Sql) {
      (s, d) =>
        annCosineFrame(s, d)
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // IVF ANN against the STORED index (VectorIndex): real k-means
    // coarse cells built ONCE per corpus and persisted through
    // TableStore as a cell-partitioned table; the declared query only
    // (a) ranks the Cells stored centroids driver-side, (b) scans the
    // NProbe nearest cell PARTITIONS (the `cell IN (...)` filter is a
    // PartitionFilter — unprobed cell directories are never read), and
    // (c) exact-cosine re-ranks inside them. Scan cost is
    // O(probed cells), not O(corpus), and the build is amortized over
    // every query — the standard billion-vector serving layout. The
    // oracle replays the identical deterministic build + probe
    // relationally (x20Sql), so results hash-match end to end.
    Query("x20_ann_ivf", x20Sql) {
      // width pinned to the oracle-replayed NProbe explicitly: the
      // declared query must stay hash-stable regardless of what the
      // retune policy has set the SERVING width to
      (s, d) =>
        ivfKnn(s, d, 0L, NProbe)
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // ANN QUALITY AUDIT — recall@10 of the stored IVF index against
    // exact kNN, THE standard ANN serving metric (every production
    // vector store publishes recall-vs-latency; an index whose recall
    // silently degrades — centroid drift after incremental ingests,
    // too few probes for a grown corpus — is a data-quality incident
    // retrieval consumers cannot see from their own results). Eight
    // fixed query vectors (vec_id 100..107 — deliberately NOT the
    // build's seed vectors); for each, the exact cosine top-10 and the
    // NProbe-cell IVF top-10, both ranked (6-rounded cos DESC, vec_id)
    // — tie-proof; recall = |intersection|/10. Scale shape: the exact
    // arm is ONE corpus scan with 8 broadcast cosines and a rank ≤ 10
    // per-qid window (compiles to WindowGroupLimit — map-local top-k,
    // the x80 pattern; no corpus-sized per-key buffering), the IVF arm
    // scans only the probed cell PARTITIONS through a 24-row broadcast
    // (qid, cell) probe table. The oracle replays build + both arms
    // relationally, so the audit itself is hash-pinned.
    Query("x137_ann_recall", {
      s"WITH $ivfBuildSql, " +
        "q AS (SELECT vec_id AS qid, pd AS qd, embedding AS qe " +
        s"FROM base WHERE vec_id >= $RecallQLo AND vec_id < $RecallQHi), " +
        "probe AS (SELECT qid, cell FROM (SELECT q.qid, c.cell, " +
        "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY " +
        s"${Sql.l2sq("q.qd", "c.m")}, c.cell) AS rn FROM c2 c, q) " +
        s"WHERE rn <= $NProbe), " +
        "iv AS (SELECT qid, vec_id FROM (SELECT p.qid, f.vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY " +
        s"round(${Sql.cosine("f.embedding", "q.qe")}, 6) DESC, f.vec_id) " +
        "AS rn FROM af f JOIN probe p ON f.cell = p.cell " +
        "JOIN q ON q.qid = p.qid) WHERE rn <= 10), " +
        "ex AS (SELECT qid, vec_id FROM (SELECT q.qid, b.vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY " +
        s"round(${Sql.cosine("b.embedding", "q.qe")}, 6) DESC, b.vec_id) " +
        "AS rn FROM base b, q) WHERE rn <= 10) " +
        "SELECT ex.qid, CAST(COUNT(iv.vec_id) AS BIGINT) AS n_hits, " +
        "round(COUNT(iv.vec_id) / 10.0, 4) AS recall " +
        "FROM ex LEFT JOIN iv ON ex.qid = iv.qid AND ex.vec_id = iv.vec_id " +
        "GROUP BY ex.qid ORDER BY ex.qid"
    }) {
      (s, d) => annRecall(s, d, NProbe)
    },

    // The recall CURVE x137 is one point of — recall@10 at EVERY probe
    // width 1..Cells, the measured trade-off an operator prices
    // latency against and the exact frame retuneIvf picks the serving
    // width from (r16 verdict ask #2: the audit existed, nothing
    // consumed it; now the /search serving default is policy-derived
    // from THIS curve). One shared exact arm and one shared candidate
    // pass for all widths (each candidate carries its cell's per-query
    // probe rank; width membership is rank ≤ w), so the audit costs
    // ≤ Cells× the single-width x137, at batch boundaries only.
    // avg_recall is an exact-integer hit sum with one double division
    // — bit-stable across engines.
    Query("x142_ivf_recall_curve", ivfCurveSql(None)) {
      (s, d) => recallCurve(s, d)
    },

    // x137's sibling for the OTHER ANN path: recall@10 of the SRP-LSH
    // bucketed index (x11's probe shape) against the same exact arm —
    // together the two audits tell an operator which index to serve a
    // workload from (SRP recall reflects bucket collision luck; IVF
    // recall reflects centroid/probe-width fit). Same 8 fixed query
    // vectors, same tie-proof rankings; candidates = vectors sharing
    // ≥1 of the query's L stored bucket ids through a 64-row broadcast
    // (qid, tb) probe table — never a corpus×corpus pass.
    Query("x138_srp_recall", {
      s"WITH $srpIdxSql, " +
        "q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings " +
        s"WHERE vec_id >= $RecallQLo AND vec_id < $RecallQHi), " +
        "qt AS (SELECT q.qid, i.tb FROM idx i JOIN q ON i.vec_id = q.qid), " +
        "cand AS (SELECT DISTINCT qt.qid, i.vec_id FROM idx i " +
        "JOIN qt ON i.tb = qt.tb), " +
        "sr AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY " +
        s"round(${Sql.cosine("e.embedding", "q.qe")}, 6) DESC, c.vec_id) " +
        "AS rn FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id " +
        "JOIN q ON q.qid = c.qid) WHERE rn <= 10), " +
        "ex AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY " +
        s"round(${Sql.cosine("e.embedding", "q.qe")}, 6) DESC, e.vec_id) " +
        "AS rn FROM embeddings e, q) WHERE rn <= 10) " +
        "SELECT ex.qid, CAST(COUNT(sr.vec_id) AS BIGINT) AS n_hits, " +
        "round(COUNT(sr.vec_id) / 10.0, 4) AS recall " +
        "FROM ex LEFT JOIN sr ON ex.qid = sr.qid AND ex.vec_id = sr.vec_id " +
        "GROUP BY ex.qid ORDER BY ex.qid"
    }) {
      (s, d) => srpRecall(s, d)
    },

    // x142's sibling for the SRP family: the measured recall@10 curve
    // over every multi-probe radius 0..K (Lv et al.'s multi-probe LSH
    // — probe all buckets within Hamming r of the query's bucket in
    // each table). radius 0 is x138's single-bucket number; radius K
    // probes every bucket so its recall is structurally 1.0 — the
    // anchor that proves the audit frame itself is sound. retuneSrp
    // picks the `/search?like=&index=srp` serving radius from this
    // curve; the oracle replays candidate generation (integer bucket
    // bits, XOR/bit_count Hamming, min over tables) relationally.
    Query("x150_srp_radius_curve", {
      val idxb = "idxb AS MATERIALIZED (SELECT vec_id, " +
        s"CAST(u // ${1 << K} AS INT) AS t, " +
        s"CAST(u % ${1 << K} AS INT) AS bits FROM (" +
        "SELECT vec_id, unnest([" +
        (0 until L).map(t => s"(${t * (1 << K)} + ${tbBitsSql(t)})")
          .mkString(", ") + "]) AS u FROM embeddings))"
      s"WITH $idxb, " +
        "q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings " +
        s"WHERE vec_id >= $RecallQLo AND vec_id < $RecallQHi), " +
        "qi AS (SELECT i.vec_id AS qid, i.t, i.bits AS qbits " +
        "FROM idxb i JOIN q ON i.vec_id = q.qid), " +
        "cr AS MATERIALIZED (SELECT qi.qid, i.vec_id, " +
        "MIN(bit_count(xor(CAST(i.bits AS BIGINT), " +
        "CAST(qi.qbits AS BIGINT)))) AS crad " +
        "FROM idxb i JOIN qi ON i.t = qi.t GROUP BY 1, 2), " +
        s"rad AS (SELECT CAST(unnest(range(${K + 1})) AS INT) AS r), " +
        "sc AS (SELECT rad.r, cr.qid, cr.vec_id, " +
        s"round(${Sql.cosine("e.embedding", "q.qe")}, 6) AS cos " +
        "FROM cr JOIN rad ON cr.crad <= rad.r " +
        "JOIN embeddings e ON e.vec_id = cr.vec_id " +
        "JOIN q ON q.qid = cr.qid), " +
        "top AS (SELECT r, qid, vec_id FROM (SELECT r, qid, vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY r, qid " +
        "ORDER BY cos DESC, vec_id) AS rn FROM sc) WHERE rn <= 10), " +
        "ex AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id, " +
        "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY " +
        s"round(${Sql.cosine("e.embedding", "q.qe")}, 6) DESC, e.vec_id) " +
        "AS rn FROM embeddings e, q) WHERE rn <= 10), " +
        "exr AS (SELECT rad.r, ex.qid, ex.vec_id FROM ex CROSS JOIN rad) " +
        "SELECT CAST(exr.r AS BIGINT) AS radius, " +
        "CAST(COUNT(top.vec_id) AS BIGINT) AS n_hits, " +
        "round(COUNT(top.vec_id) / CAST(COUNT(*) AS DOUBLE), 4) " +
        "AS avg_recall FROM exr LEFT JOIN top ON top.r = exr.r " +
        "AND top.qid = exr.qid AND top.vec_id = exr.vec_id " +
        "GROUP BY exr.r ORDER BY radius"
    }) {
      (s, d) => srpRadiusCurve(s, d)
    },

    // SemDeDup-style semantic dedup decision view: assign every vector
    // to a cluster, elect the lowest-id member as the cluster
    // prototype, and flag members whose cosine to the prototype
    // crosses the dedup threshold. Unlike x10 (PAIRWISE near-dup via
    // the banded index), this is the linear-cost cluster form — one
    // cosine per vector against its prototype, never member×member.
    // The cluster here is the SRP table-0 bucket (deterministic and
    // oracle-expressible; production swaps in the IVF k-means cell —
    // same shape). Scale: assignment is a narrow map, the prototype
    // table is cluster-bounded and BROADCAST, so the whole decision
    // view is one scan + one tiny agg — no corpus shuffle at all
    // beyond the deterministic output sort. is_dup compares the
    // 6-rounded cosine on both engines, so a last-ulp libm difference
    // cannot flip a decision.
    Query("x62_semantic_dedup",
      s"WITH c AS (SELECT vec_id, ${tbSql(0)} AS cl, embedding " +
        "FROM embeddings), " +
        "k AS (SELECT cl, MIN(vec_id) AS canonical FROM c GROUP BY 1), " +
        "j AS (SELECT c.vec_id, c.cl, k.canonical, " +
        s"${Sql.cosine("c.embedding", "e2.embedding")} AS cos " +
        "FROM c JOIN k ON c.cl = k.cl " +
        "JOIN embeddings e2 ON e2.vec_id = k.canonical) " +
        "SELECT vec_id, cl, canonical, round(cos, 6) AS cos, " +
        "(round(cos, 6) >= 0.30 AND vec_id <> canonical) AS is_dup " +
        "FROM j ORDER BY vec_id") {
      (s, d) =>
        val c = emb(s, d).select(col("vec_id"),
          tbColumn(0, col("embedding")).as("cl"), col("embedding"))
        // min_by folds the prototype's embedding into the SAME
        // cluster aggregate that elects it (r14) — the previous
        // join-back to fetch the canonical's embedding was a third
        // derivation of the assignment frame
        val proto = c.groupBy("cl").agg(
          min(col("vec_id")).as("canonical"),
          min_by(col("embedding"), col("vec_id")).as("ec"))
        c.join(broadcast(proto), Seq("cl"))
          .withColumn("cos",
            round(VectorFns.cosine(col("embedding"), col("ec")), 6))
          .select(col("vec_id"), col("cl"), col("canonical"), col("cos"),
            (col("cos") >= 0.30 && col("vec_id") =!= col("canonical"))
              .as("is_dup"))
          .orderBy("vec_id")
    },

    // SemDeDup's ACTUAL shape: the same prototype-per-cluster decision
    // view as x62, but over REAL k-means clusters (the stored x111
    // model) instead of the SRP table-0 bucket stand-in. Assignment is
    // the join-free literal-centroid argmin (one narrow pass — the
    // trained centroids ride as literals, no join against a centroid
    // table), prototype election and the per-member cosine are
    // unchanged. Scale: identical to x62 — narrow assign, k-bounded
    // BROADCAST prototype table, one cosine per vector, never
    // member×member. The oracle replays the whole k-means training
    // trajectory through the shared CTE chain and then the decision
    // view, so the hash pins model + assignment + decisions end to
    // end. VectorSpec additionally pins where the real-cluster
    // decisions diverge from the x62 stand-in on the fixture.
    Query("x115_semantic_dedup_kmeans",
      s"""${KMeansQueries.trainCtes()},
c AS (SELECT ${KMeansQueries.FinalA}.vec_id, ${KMeansQueries.FinalA}.cid AS cl,
    e.embedding
  FROM ${KMeansQueries.FinalA} JOIN embeddings e
    ON e.vec_id = ${KMeansQueries.FinalA}.vec_id),
k AS (SELECT cl, MIN(vec_id) AS canonical FROM c GROUP BY 1),
j AS (SELECT c.vec_id, c.cl, k.canonical,
    ${Sql.cosine("c.embedding", "e2.embedding")} AS cos
  FROM c JOIN k ON c.cl = k.cl
  JOIN embeddings e2 ON e2.vec_id = k.canonical)
SELECT vec_id, cl, canonical, round(cos, 6) AS cos,
  (round(cos, 6) >= 0.30 AND vec_id <> canonical) AS is_dup
FROM j ORDER BY vec_id""") {
      (s, d) =>
        val cents = KMeansQueries.train(s, d)
        val c = emb(s, d).select(col("vec_id"),
          KMeansQueries.assignCid(cents,
            KMeansQueries.quantExpr(col("embedding"))).as("cl"),
          col("embedding"))
        // min_by folds the prototype's embedding into the election
        // aggregate (r14, same as x62): two derivations of the
        // argmin frame instead of three
        val proto = c.groupBy("cl").agg(
          min(col("vec_id")).as("canonical"),
          min_by(col("embedding"), col("vec_id")).as("ec"))
        c.join(broadcast(proto), Seq("cl"))
          .withColumn("cos",
            round(VectorFns.cosine(col("embedding"), col("ec")), 6))
          .select(col("vec_id"), col("cl"), col("canonical"), col("cos"),
            (col("cos") >= 0.30 && col("vec_id") =!= col("canonical"))
              .as("is_dup"))
          .orderBy("vec_id")
    },

    // (x63/x64 share the scalar-quantization codebook: sqStatsSql /
    // sqStats below)
    // int8 scalar quantization — the embedding-COMPRESSION op a 100 TB
    // vector store runs before anything else: a float32 corpus quantized
    // to per-dimension uint8 codes is 4× smaller (64 B vs 256 B per
    // vector here), which is the difference between an ANN index that
    // fits executor memory and one that spills. Codebook = per-dimension
    // (min, max) over the corpus: ONE posexplode → partial-combine agg
    // down to n_dims rows (corpus metadata, the bounded kind of
    // driver collect — same contract as x41's rate table), after which
    // encode + reconstruction error is a pure NARROW map (single scan
    // stage at any corpus size; codes would be written next to the IVF
    // cells of x20 and searched via asymmetric distance). Determinism:
    // codes use floor(x + 0.5) — floor is an exact IEEE op with no
    // engine rounding-mode variance (Spark round() HALF_UP vs C round()
    // never enters) — and every error term is (v−deq)·(v−deq) single
    // multiplies, so the only cross-engine exposure is the 64-term sum
    // reassociation, absorbed by round(·, 6) after sqrt. code_sum is
    // pure-integer exact.
    Query("x63_scalar_quant",
      s"WITH $sqStatsSql, " +
        "enc AS (SELECT vec_id, s.i, s.mn, s.mx, " +
        "CAST(embedding[s.i] AS DOUBLE) AS v, " +
        "CASE WHEN s.mx > s.mn THEN " +
        "floor((CAST(embedding[s.i] AS DOUBLE) - s.mn) * 255 / (s.mx - s.mn) + 0.5) " +
        "ELSE 0 END AS code FROM embeddings CROSS JOIN stats s) " +
        "SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum, " +
        "round(sqrt(SUM((v - (mn + code * (mx - mn) / 255)) * " +
        "(v - (mn + code * (mx - mn) / 255)))), 6) AS l2_err " +
        "FROM enc GROUP BY vec_id ORDER BY vec_id") {
      (s, d) => {
        val cb = new Codebook(sqStats(s, d))
        import cb.{code, deq}
        def errsq(v: Column, i: Column): Column =
          (v.cast("double") - deq(v, i)) * (v.cast("double") - deq(v, i))
        emb(s, d).select(col("vec_id"),
            transform(col("embedding"), (v, i) => code(v, i)).as("codes"),
            transform(col("embedding"), (v, i) => errsq(v, i)).as("errs"))
          .select(col("vec_id"),
            aggregate(col("codes"), lit(0L), (acc, c) =>
              acc + c.cast("long")).as("code_sum"),
            round(sqrt(aggregate(col("errs"), lit(0.0), (acc, e) => acc + e)), 6)
              .as("l2_err"))
          .orderBy("vec_id")
      }
    },

    // asymmetric-distance kNN over the quantized corpus — the SEARCH
    // half of x63: the query vector stays full-precision float, the
    // corpus side is reconstructed from its uint8 codes, and top-k
    // runs on the asymmetric L2 (ADC, the standard quantized-search
    // distance). At 100 TB this is what the ANN store actually
    // executes: scan CODES (4× less IO than floats — or 1 byte/dim
    // from the x20 IVF cells' posting lists), reconstruct against the
    // broadcast codebook in-register, TakeOrdered k — no global sort,
    // no float corpus read. Distances are 6-rounded before ranking
    // with a vec_id tiebreak so sum reassociation cannot reorder
    // engines; VectorSpec pins recall against the exact q23 top-k.
    Query("x64_adc_knn",
      s"WITH $sqStatsSql, " +
        "q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
        "enc AS (SELECT e.vec_id, s.i, s.mn, s.mx, " +
        "CAST(q.qe[s.i] AS DOUBLE) AS qv, " +
        "CASE WHEN s.mx > s.mn THEN " +
        "floor((CAST(e.embedding[s.i] AS DOUBLE) - s.mn) * 255 / (s.mx - s.mn) + 0.5) " +
        "ELSE 0 END AS code " +
        "FROM embeddings e CROSS JOIN stats s CROSS JOIN q) " +
        "SELECT vec_id, round(SUM((qv - (mn + code * (mx - mn) / 255)) * " +
        "(qv - (mn + code * (mx - mn) / 255))), 6) AS adc_dist " +
        "FROM enc GROUP BY vec_id ORDER BY adc_dist, vec_id LIMIT 10") {
      (s, d) => {
        val cb = new Codebook(sqStats(s, d))
        import cb.deq
        val q = emb(s, d).filter(col("vec_id") === 0)
          .select(col("embedding")).collect().head.getSeq[Float](0)
        val qArr = array(q.map(f => lit(f.toDouble)): _*)
        def qv(i: Column): Column = element_at(qArr, i + 1)
        emb(s, d).select(col("vec_id"),
            transform(col("embedding"), (v, i) =>
              (qv(i) - deq(v, i)) * (qv(i) - deq(v, i))).as("terms"))
          .select(col("vec_id"),
            round(aggregate(col("terms"), lit(0.0), (acc, t) => acc + t), 6)
              .as("adc_dist"))
          .orderBy(col("adc_dist"), col("vec_id")).limit(10)
      }
    },

    // Embedding-distribution DRIFT between two corpus snapshots — the
    // vector-side sibling of QualityOps.drift: per label, the L2
    // shift between the two snapshots' centroids (here the snapshots
    // are the deterministic vec_id-parity halves, so the oracle
    // replays exactly; production points the two sides at
    // TableStore.loadVersion snapshots). Shape: ONE dimension explode
    // → (label, pos) aggregate with per-half conditional means (no
    // self-join — the x72 lesson; a join of two filtered copies would
    // recompute the explode twice) → per-label sum of squared deltas.
    // Labels×dims is bounded, the explode is the only corpus-scale
    // stage, and the aggregate map-side combines.
    Query("x91_embedding_drift",
      "WITH e AS (SELECT vec_id, label, vec_id % 2 AS half, embedding " +
        "FROM embeddings), " +
        "u AS (SELECT label, half, unnest(range(len(embedding))) AS pos, " +
        "unnest(embedding) AS v FROM e), " +
        "cp AS (SELECT label, pos, " +
        "AVG(CASE WHEN half = 0 THEN CAST(v AS DOUBLE) END) AS m0, " +
        "AVG(CASE WHEN half = 1 THEN CAST(v AS DOUBLE) END) AS m1 " +
        "FROM u GROUP BY label, pos), " +
        "s AS (SELECT label, sqrt(SUM((m0 - m1) * (m0 - m1))) AS shift " +
        "FROM cp GROUP BY label), " +
        "n AS (SELECT label, " +
        "CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 " +
        "FROM e GROUP BY label) " +
        "SELECT n.label, n.n0, n.n1, round(s.shift, 6) AS shift " +
        "FROM n JOIN s ON n.label = s.label WHERE s.shift IS NOT NULL " +
        "ORDER BY n.label") {
      (s, d) => {
        val e = emb(s, d).select(col("label"),
          (col("vec_id") % 2).as("half"), col("embedding"))
        val cp = e
          .select(col("label"), col("half"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("label", "pos")
          .agg(
            avg(when(col("half") === 0, col("v").cast("double"))).as("m0"),
            avg(when(col("half") === 1, col("v").cast("double"))).as("m1"))
        val shift = cp.groupBy("label")
          .agg(sqrt(sum((col("m0") - col("m1")) * (col("m0") - col("m1"))))
            .as("shift"))
          .filter(col("shift").isNotNull)
        e.groupBy("label")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"))
          .join(shift, Seq("label"))
          .select(col("label"), col("n0"), col("n1"),
            round(col("shift"), 6).as("shift"))
          .orderBy("label")
      }
    },

    // EMBEDDING-SPACE contrastive pair mining — x124's complement in
    // the vector modality (the E5/SimCSE hard-negative recipe run on
    // embeddings instead of text fingerprints): positives are x10's
    // exact-verified near-dup pairs (cosine ≥ 0.45); hard NEGATIVES
    // are SRP-bucket-colliding pairs whose exact cosine falls BELOW
    // the near-dup threshold — LSH-adjacent lookalikes, the pairs a
    // contrastive loss most needs — capped at the 3 HARDEST (highest
    // cosine, vec_b tiebreak) per anchor. Scale: candidates are ONE
    // equi-join on the stored SRP inverted index (the same build-once
    // index x10/x11 probe — never all-pairs), verification one dot
    // product per candidate, and the per-anchor cap compiles to
    // WindowGroupLimit (map-local top-k before the vec_a shuffle, the
    // x80/x124 shape), so output is O(vectors·k) at any corpus size.
    // Determinism: the rank key is the RAW cosine, whose IEEE op
    // sequence (dot/‖a‖/‖b‖) is identical in both engines (x10's
    // parity argument), with vec_b as the total-order tiebreak.
    Query("x127_embed_contrastive",
      s"WITH idx AS (SELECT vec_id, unnest([${(0 until L).map(tbSql).mkString(", ")}]) AS tb " +
        "FROM embeddings), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM idx a JOIN idx b ON a.tb = b.tb AND a.vec_id < b.vec_id), " +
        "c AS (SELECT vec_a, vec_b, " +
        s"${Sql.cosine("ea.embedding", "eb.embedding")} AS cos " +
        "FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a " +
        "JOIN embeddings eb ON eb.vec_id = cand.vec_b), " +
        "pos AS (SELECT vec_a, vec_b, 'pos' AS label, cos FROM c " +
        "WHERE cos >= 0.45), " +
        "neg AS (SELECT vec_a, vec_b, 'neg' AS label, cos FROM (" +
        "SELECT vec_a, vec_b, cos, ROW_NUMBER() OVER (" +
        "PARTITION BY vec_a ORDER BY cos DESC, vec_b) AS rk " +
        "FROM c WHERE cos < 0.45) WHERE rk <= 3) " +
        "SELECT vec_a, vec_b, label, round(cos, 6) AS cos FROM " +
        "(SELECT * FROM pos UNION ALL SELECT * FROM neg) " +
        "ORDER BY label, vec_a, vec_b") {
      (s, d) =>
        val idx = VectorIndex.srpForDir(s, d, srpIndexRows).load("srp_idx")
        val cand = idx.select(col("vec_id").as("vec_a"), col("tb"))
          .join(idx.select(col("vec_id").as("vec_b"), col("tb")), Seq("tb"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b")).distinct()
        val base = emb(s, d).select(col("vec_id"), col("embedding"),
          sqrt(VectorFns.normsq(col("embedding"))).as("nrm"))
        val c = cand
          .join(base.select(col("vec_id").as("vec_a"),
            col("embedding").as("ea"), col("nrm").as("na")), Seq("vec_a"))
          .join(base.select(col("vec_id").as("vec_b"),
            col("embedding").as("eb"), col("nrm").as("nb")), Seq("vec_b"))
          .withColumn("cos",
            VectorFns.dot(col("ea"), col("eb")) / col("na") / col("nb"))
          .select(col("vec_a"), col("vec_b"), col("cos"))
        // r18 one-pass experiment: label in-row, ONE window over
        // (vec_a, label) with rk<=3 enforced only on neg rows.
        // Row-identical: pos rows pass unconditionally; neg rows rank
        // within (vec_a, 'neg') by the same (cos desc, vec_b) order.
        c.withColumn("label",
            when(col("cos") >= 0.45, "pos").otherwise("neg"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("vec_a", "label")
              .orderBy(col("cos").desc, col("vec_b"))))
          .filter(col("label") === "pos" || col("rk") <= 3)
          .select(col("vec_a"), col("vec_b"), col("label"),
            round(col("cos"), 6).as("cos"))
          .orderBy("label", "vec_a", "vec_b")
    })
}
