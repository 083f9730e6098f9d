package graft.operators

import graft.Query
import graft.functions.TextFns
import graft.functions.TextFns.Sql
import graft.functions.expressions.TextExpressions
import graft.sources.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Document deduplication (SURVEY.md §2.1 Q21 + the pipeline
 * extensions): exact hash dedup, exact n-gram-Jaccard near-dup pairs
 * via a df-bounded shingle inverted index, and MinHash+LSH near-dup
 * detection.
 *
 * The MinHash signature uses the lexicographic minimum of fixed-width
 * md5-hex chunks per shingle — a portable permutation both Spark and
 * DuckDB evaluate identically, so even the LSH candidate set
 * (including its probabilistic false negatives) is bit-reproducible
 * and fully oracle-checked.
 *
 * Scale design:
 *  - Candidates shuffle once by join key (prefix shingle / LSH band),
 *    per-pair work shuffles once by doc id; both paths verify with
 *    exact Jaccard over the full shingle arrays.
 *  - x7 uses PREFIX FILTERING (the AllPairs/PPJoin family: Bayardo et
 *    al., WWW'07): index only each document's first ⌊n/5⌋+1 shingles
 *    under a global canonical order. For Jaccard ≥ 0.8 two documents
 *    MUST share a prefix shingle (pigeonhole on the ⌈0.8n⌉ overlap a
 *    qualifying pair needs), so the candidate set is complete — the
 *    result is EXACT, unlike a df-cutoff index, which silently drops
 *    pairs whose entire overlap is hot. The canonical order is
 *    ascending document frequency (ties by shingle): stop-phrase
 *    shingles sink to the BACK of every document's ordering and never
 *    enter a prefix, so the O(df²) candidate blowup a hot shingle
 *    causes in a plain inverted index cannot happen — rare shingles
 *    generate the candidates, and rare means few pairs.
 *  - Candidate-generation state is MATERIALIZED once per corpus
 *    version as compact stored tables (ShingleIndex: the hashed pfx3
 *    prefix index, the bands3 LSH signatures, the hashed ex8h
 *    contamination vocabulary) shared by x7, x8 and x36; the
 *    exact-verify shingle ARRAYS are deliberately recomputed per
 *    query in one codegen pass — materialized arrays are several
 *    times larger than the source text and lose to ShinglesDistinct
 *    (measured; see the ShingleIndex header). Nothing pins executor
 *    storage memory across queries (parquet, not cache).
 */
object DedupQueries {

  /** x58 — duplicate-GROUP materialization: documents sharing a 5-token
    * prefix, with the member list aggregated per group (the audit view
    * a dedup reviewer reads — x39 ranks boilerplate GRAMS, this lists
    * the documents carrying each shared template head; array
    * aggregation is also the one agg class the corpus didn't cover).
    * Members sort numerically inside the group and render as one
    * string so both engines serialize identically. Scale: one hash
    * aggregate on the prefix; HAVING prunes singleton groups before
    * the member lists materialize anything wide, and the top-50 is
    * TakeOrdered. */
  private val x58: graft.Query = graft.Query("x58_dup_groups",
    "WITH g AS (SELECT array_to_string(string_split(text, ' ')[1:5], ' ') " +
      "AS prefix, COUNT(*) AS n_docs, " +
      "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids " +
      "FROM documents WHERE text IS NOT NULL " +
      "GROUP BY 1 HAVING COUNT(*) > 1) " +
      "SELECT prefix, n_docs, doc_ids FROM g " +
      "ORDER BY n_docs DESC, prefix LIMIT 50") {
    (s, d) =>
      import org.apache.spark.sql.functions._
      graft.sources.Tables.table(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(array_join(slice(split(col("text"), " "), 1, 5), " ")
          .as("prefix"), col("doc_id"))
        .groupBy("prefix")
        .agg(count(lit(1)).as("n_docs"),
          array_join(transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")), ",").as("doc_ids"))
        .filter(col("n_docs") > 1)
        .orderBy(col("n_docs").desc, col("prefix"))
        .limit(50)
  }

  private val Threshold = 0.8
  /** Prefix length for Jaccard ≥ Threshold: n − ⌈0.8n⌉ + 1 = ⌊n/5⌋+1. */
  private def prefixLen(n: org.apache.spark.sql.Column) =
    floor(n / 5) + 1

  /** doc_id + distinct 3-gram shingle set + its size (docs ≥3 tokens).
    * The canonical `sh3` builder — ShingleIndex materializes exactly
    * this frame, so the stored and inline paths stay hash-identical. */
  private[operators] def shingledFrom(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), TextFns.shingles(col("ts")).as("s"))
      .withColumn("n", size(col("s")))

  private def shingled(s: SparkSession, d: String): DataFrame =
    shingledFrom(table(s, d, "documents"))

  /** The AllPairs prefix index over a (doc_id, s, n) frame: one
    * explode scan feeds BOTH the global-df computation and the
    * per-doc ranking, as two windows (count over g, then row_number
    * over doc ordered by (df, g)) instead of a groupBy + re-join that
    * would re-run the shingle codegen on a second branch. Candidates
    * only need completeness (equal g ⟹ equal hash; the exact verify
    * settles any hash-collision extras), so the index carries a
    * fixed-width xxhash64 key instead of ~50-char shingles. */
  private[operators] def prefixIndex(sh: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDf = Window.partitionBy(col("g"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    sh.select(col("doc_id"), col("n"), explode(col("s")).as("g"))
      .withColumn("df", count(lit(1)).over(wDf))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <= prefixLen(col("n")))
      .select(col("doc_id"), col("n"), xxhash64(col("g")).as("h"))
  }

  /** Candidate pairs share ≥1 PREFIX shingle — complete for
    * Jaccard ≥ Threshold by the prefix-filtering bound — plus length
    * filtering: J ≥ 4/5 forces 4·max(na,nb) ≤ 5·min(na,nb) (all-int
    * arithmetic: a double 0.8·n test could evict a boundary pair). */
  private def candidatePairs(pfx: DataFrame): DataFrame =
    pfx.as("a")
      .join(pfx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * 4 <= col("b.n") * 5 &&
          col("b.n") * 4 <= col("a.n") * 5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** x7's full pipeline over any (doc_id, text) frame — exposed so
    * DedupHotPathSpec can drive the stop-phrase case (where the
    * prefix order's df-ascending canonical order is what keeps the
    * candidate join bounded). The declared query runs the same three
    * stages against the STORED shingle index instead. */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val sh = shingledFrom(docs)
    verified(candidatePairs(prefixIndex(sh)), sh, spread = true, prune = true)
  }

  // ------------------------------------------------------------------
  // 64-bit SimHash near-dup engine (r15). The r8–r14 16-bit engine
  // SATURATED: 2¹⁶ fingerprints mean Hamming-≤2 neighborhoods start
  // percolating at ~10⁴ documents — at sf0.1 the whole corpus
  // collapsed into ONE component (CHECK_SF01_r14.json), which still
  // hash-matched (the oracle replayed the same definition) but is not
  // a near-dup semantics that survives corpus growth. The family now
  // anchors on [[TextExpressions.simhash64]]:
  //  - pair generation is the media engine's technique
  //    ([[MediaQueries]].hamming64Pairs): quotient neighbor table
  //    (present × 2081 ≤2-bit XOR masks) under a saturation guard,
  //    3-band (22+21+21) pigeonhole equi-join above it — exact either
  //    way for Hamming ≤ 2, spec-pinned identical;
  //  - clustering is the DISTRIBUTED pointer-jumping connected
  //    components below (the 64-bit quotient graph is corpus-sized,
  //    so the r8 ≤2¹⁶ driver union-find no longer applies);
  //  - fingerprints and clusters are MATERIALIZED once per corpus
  //    version ([[SimhashIndex]]: `fp64`, `cl64`) and shared by the
  //    whole family — a dedup decision is corpus state, not a
  //    per-query recompute.
  // Oracle-side fingerprints ride as (hi, lo) 32-bit halves — bit 63
  // would overflow signed SQL arithmetic (the x116 convention).

  /** (doc_id, f): 64-bit SimHash per document with non-null text, over
    * any (doc_id, text) frame — one narrow codegen scan; the ingestion
    * flow fingerprints its batches and TableStore corpora with it. */
  private[graft] def simhash64FpsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.simhash64(graft.functions.TextFns.tokens(col("text")))
          .as("f"))

  /** DuckDB CTE chain ending in `fp(doc_id, hi, lo)` — the 64-bit
    * SimHash split into 32-bit halves. Bit j of the fingerprint = bit
    * (j mod 4) of hex digit (16 − j/4) of md5(token) (big-endian first
    * 8 digest bytes — exactly TextExprUtil.simhash64's arithmetic). */
  private[graft] val simhash64FpSql =
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
      "hx AS (SELECT doc_id, md5(t) AS h FROM tok), " +
      "nib AS (SELECT doc_id, j, CASE WHEN ascii(substr(h, CAST(16 - j // 4 AS INT), 1)) >= 97 " +
      "THEN ascii(substr(h, CAST(16 - j // 4 AS INT), 1)) - 87 " +
      "ELSE ascii(substr(h, CAST(16 - j // 4 AS INT), 1)) - 48 END AS hd " +
      "FROM hx, (SELECT unnest(range(64)) AS j)), " +
      "sg AS (SELECT doc_id, j, SUM(CASE WHEN ((hd >> CAST(j % 4 AS INT)) & 1) = 1 " +
      "THEN 1 ELSE -1 END) AS sgn FROM nib GROUP BY 1, 2), " +
      "fp AS (SELECT doc_id, " +
      "CAST(SUM(CASE WHEN sgn > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << CAST(j - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi, " +
      "CAST(SUM(CASE WHEN sgn > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS lo " +
      "FROM sg GROUP BY doc_id)"

  /** `$simhash64FpSql, pairs(doc_a, doc_b, hamming)` — Hamming-≤2
    * pairs as a band-free all-pairs filter: legitimate because BOTH
    * Spark paths are exact for Hamming ≤ 2 (quotient by construction,
    * banded by pigeonhole), so the filtered sets coincide; the oracle
    * only needs the same RESULT, not the same candidate structure. */
  private[graft] val simhash64PairsSql = simhash64FpSql + ", " +
    "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
    "CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming " +
    "FROM fp a JOIN fp b ON a.doc_id < b.doc_id " +
    "WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 2)"

  /** `$simhash64PairsSql, edges, reach, cc(doc_id, cluster)` — the
    * connected components of the pair graph via recursive reachability
    * (callers must open WITH RECURSIVE). */
  private[graft] val simhash64ClustersSql = simhash64PairsSql + ", " +
    "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
    "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
    "reach(doc_id, r) AS (" +
    "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
    "UNION " +
    "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
    "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id)"


  /** (doc_id, f, i, bv): the three-band explosion of a fingerprint
    * frame — the shared candidate alphabet of the banded self-join
    * below and the ingest gate's asymmetric batch-vs-stored probe. */
  private[graft] def banded64(fps: DataFrame): DataFrame =
    fps.select(col("doc_id"), col("f"),
      explode(array((0 until 3).map(i =>
        struct(lit(i).as("i"),
          shiftrightunsigned(col("f"), Hamming64.BandOffs(i))
            .bitwiseAND(lit(Hamming64.BandMasks(i))).as("bv")))
        .toIndexedSeq: _*)).as("band"))
      .select(col("doc_id"), col("f"),
        col("band.i").as("i"), col("band.bv").as("bv"))

  /** Banded candidates (doc_a, doc_b, fa, fb), distinct, over a
    * (doc_id, f) fingerprint frame — one band-key equi-join shuffle,
    * never all-pairs. */
  private[graft] def simhash64Candidates(fps: DataFrame): DataFrame = {
    val bands = banded64(fps)
    bands.as("x")
      .join(bands.as("y"),
        col("x.i") === col("y.i") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.f").as("fa"), col("y.f").as("fb"))
      .distinct()
  }

  /** Past this many present 64-bit fingerprints the ≤2-bit quotient
    * neighbor table (present × 2081 rows) outgrows a sane broadcast
    * and pair generation switches to the banded path — identical
    * results, spec-pinned (DedupHotPathSpec). Same bound as the media
    * engine's dhashQuotientMax. */
  private val Fp64QuotientMax = 1L << 11

  /** Hamming-≤2 pairs (doc_a, doc_b, hamming), doc_a < doc_b,
    * UNORDERED, over a (doc_id, f) fingerprint frame. `nPresent` is
    * the distinct-fingerprint guard statistic (callers cache it per
    * corpus version). */
  private[graft] def hamming64PairsOf(fps: DataFrame, nPresent: Long,
      maxQuotientFps: Long = Fp64QuotientMax): DataFrame =
    if (nPresent > maxQuotientFps)
      simhash64Candidates(fps)
        .withColumn("hamming",
          bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int"))
        .filter(col("hamming") <= 2)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    else {
      val present = fps.select(col("f")).distinct()
      val maskArr = array(Hamming64.masks2.map(m =>
        struct(lit(m).as("m"),
          lit(java.lang.Long.bitCount(m)).as("h"))).toIndexedSeq: _*)
      val nbr = present.select(col("f").as("fa"),
          explode(maskArr).as("mk"))
        .select(col("fa"), col("fa").bitwiseXOR(col("mk.m")).as("fb"),
          col("mk.h").as("hamming"))
        .join(present.select(col("f").as("fb")), Seq("fb"), "left_semi")
      fps.as("x")
        .join(broadcast(nbr), col("x.f") === col("fa"))
        .join(fps.as("y"),
          col("y.f") === col("fb") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("hamming").cast("int").as("hamming"))
    }

  // quotient-vs-banded guard statistic, computed once per corpus
  // version (stored-index lifecycle; cost lands in the bench `build`
  // section) instead of a distinct-count per invocation.
  private val presentFp64Cache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[java.lang.Long]]()

  /** x25's pair generation over the STORED fingerprint table (built
    * once per corpus version — probes never re-tokenize the corpus). */
  private[graft] def simhash64Pairs(s: SparkSession, d: String,
      maxQuotientFps: Long = Fp64QuotientMax): DataFrame = {
    val fps = SimhashIndex.forDir(s, d).load("fp64")
    val nPresent: Long = StoredIndexes.versionedValue(presentFp64Cache, d,
      "documents.parquet", "graft-simhash64-present") {
      fps.select(col("f")).distinct().count()
    }
    hamming64PairsOf(fps, nPresent, maxQuotientFps)
  }

  /** The stored near-dup clustering (doc_id, cluster) for a corpus
    * dir — every doc participating in ≥1 Hamming-≤2 pair, cluster =
    * min doc_id of its component. */
  private[graft] def clusters64(s: SparkSession, d: String): DataFrame =
    SimhashIndex.forDir(s, d).load("cl64")

  /** (doc_id, f, dt, n_chars, source): the 64-bit fingerprint, the
    * x120 quality-election key (distinct-token count, char count) AND
    * the doc's source (null when the frame carries none) in ONE
    * narrow codegen scan — what the ingest flow appends to its stored
    * `text_fps` sidecar per batch. Carrying (n_chars, source) here is
    * what lets the source-cap gate's crash-window subtraction read
    * the STORED row's mass and source (the corpus truth) instead of
    * the re-sent batch row's, without touching the corpus text. */
  private[graft] def fpQualityOf(docs: DataFrame): DataFrame = {
    val ts = graft.functions.TextFns.tokens(col("text"))
    val src =
      if (docs.columns.contains("source")) col("source").cast("string")
      else lit(null).cast("string")
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.simhash64(ts).as("f"),
        size(array_distinct(ts)).cast("long").as("dt"),
        length(col("text")).cast("long").as("n_chars"),
        src.as("source"))
  }

  /** Quality election over a clustering: (doc_id, cluster) joined to
    * its members' (dt, n_chars) quality keys → (doc_id, cluster,
    * canonical) where canonical marks x120's exact-integer winner
    * (dt DESC, n_chars DESC, doc_id ASC). Election cost is one
    * max(struct) aggregate over CLUSTERED docs only. */
  private[graft] def electDecisions(cl: DataFrame,
      quality: DataFrame): DataFrame = {
    val m = cl.select(col("doc_id"), col("cluster"))
      .join(quality.select(col("doc_id"), col("dt"), col("n_chars")),
        Seq("doc_id"))
    val winners = m.groupBy("cluster")
      .agg(max(struct(col("dt"), col("n_chars"),
        (-col("doc_id")).as("ni"))).as("best"))
      .select(col("cluster"), (-col("best.ni")).as("winner"))
    m.join(winners, Seq("cluster"))
      .select(col("doc_id"), col("cluster"),
        (col("doc_id") === col("winner")).as("canonical"))
  }

  /** Full near-dup DECISION recompute over any (doc_id, text) corpus
    * frame: (doc_id, cluster, canonical) for every doc participating
    * in ≥1 Hamming-≤2 pair, canonical = the QUALITY-elected member
    * (so the kept corpus equals x122's output on the same rows — the
    * SemDeDup-style retention the ingest gate enforces since r15).
    * This is the BATCH engine: the Gdpr purge recompute and the
    * parity spec for the ingest flow's INCREMENTALLY-maintained
    * `dedup_decisions` both run it; the per-micro-batch path never
    * does (it merges the batch's new edges into the stored decisions
    * in O(batch) — IngestionFlows). */
  private[graft] def decisions64Of(s: SparkSession,
      docs: DataFrame): DataFrame = {
    val q = fpQualityOf(docs)
    val fps = q.select(col("doc_id"), col("f"))
    val nPresent = fps.select(col("f")).distinct().count()
    val cl = connectedComponents(s,
      hamming64PairsOf(fps, nPresent).select(col("doc_a"), col("doc_b")))
    electDecisions(cl, q)
  }

  /** Distributed connected components over an undirected pair graph
    * (x34; exposed for DedupHotPathSpec's chain/star cases): min-label
    * propagation with pointer jumping (path doubling → O(log diameter)
    * supersteps). Labels only ever DECREASE, so the label sum is a
    * strictly decreasing convergence witness — one tiny aggregate per
    * superstep instead of a change-detection join. Returns
    * (doc_id, cluster) for every node appearing in `pairs`, cluster =
    * min doc_id of the component.
    *
    * r18 (guide §5): the pair graph and each superstep's labels are
    * `localCheckpoint`ed (block-manager-resident, lineage cut) instead
    * of the r12 parquet write/read-back per superstep — same flat
    * lineage, minus one parquet encode + FS round trip + re-scan per
    * iteration (the graft-simhash-index build wrote a label TABLE per
    * superstep through this path). Labels are (long, long) rows —
    * storage-light at any corpus scale; dead label RDDs unpin on GC
    * (the bench's periodic-GC tick). localCheckpoint trades executor-
    * loss recovery for speed — the standard Pregel-loop trade; a
    * deployment with preemptible executors would swap in a reliable
    * checkpoint every K supersteps, which only changes THIS method. */
  def connectedComponents(s: SparkSession, pairsIn: DataFrame): DataFrame = {
    // freshLeaf: strip the checkpoint leaf's inherited constraints —
    // the superstep self-joins/unions these frames, and Spark 4.1.2's
    // DeduplicateRelations + Union.rewriteConstraints throws
    // `key not found: <attr>` on a re-instanced LogicalRDD whose
    // copied constraints mention pre-checkpoint attribute ids
    // (reproduced by DedupHotPathSpec's chain/star case).
    def pin(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.Bridge.freshLeaf(df.localCheckpoint())
    val pairs = pin(pairsIn)
    val Seq(a, b) = pairs.columns.toSeq
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
    // seed with the first propagation folded in: label₀ =
    // min(self, min direct neighbor) — one whole superstep round-trip
    // cheaper than seeding with self and iterating. Labels keep their
    // natural shuffle parallelism (the groupBy's post-AQE
    // partitioning): a fixed-width coalesce here would propagate up
    // the plan and cap the reduce stage of every superstep — the one
    // constant that must NOT appear in an iterative operator's
    // scaling law.
    var lab = edges.groupBy(col("dst").as("doc_id"))
      .agg(min(col("src")).as("__nmin"))
      .select(col("doc_id"),
        least(col("doc_id"), col("__nmin")).as("cluster"))
      .transform(pin)
    def labSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("cluster"))).collect().head
      if (r.isNullAt(0)) 0L else r.getLong(0) // sum of an empty graph
    }
    var prevSum = labSum(lab)
    var converged = prevSum == 0L && lab.isEmpty
    while (!converged) {
      val next = pin(superstep(edges, lab))
      val sum2 = labSum(next)
      converged = sum2 == prevSum
      prevSum = sum2
      lab = next
    }
    lab
  }

  /** One CC superstep: neighbor-min propagation + pointer jumping
    * (cluster := cluster's cluster — path doubling collapses a
    * diameter-D chain in O(log D) supersteps instead of D). Pure plan
    * builder over (src,dst) edges and (doc_id,cluster) labels, exposed
    * so DedupHotPathSpec can pin its physical shape (shuffle-parallel
    * reduce, no repartition/coalesce caps). */
  private[graft] def superstep(edges: DataFrame, lab: DataFrame): DataFrame = {
    val prop = edges.join(lab, col("src") === col("doc_id"))
      .select(col("dst").as("doc_id"), col("cluster"))
    val stepped = lab.unionByName(prop)
      .groupBy("doc_id").agg(min(col("cluster")).as("cluster"))
    stepped.as("x")
      .join(stepped.select(col("doc_id").as("__c"),
        col("cluster").as("__cc")).as("y"),
        col("x.cluster") === col("__c"), "left")
      .select(col("x.doc_id").as("doc_id"),
        coalesce(col("__cc"), col("x.cluster")).as("cluster"))
  }

  private val shingledSql =
    "sh AS (SELECT doc_id, " + Sql.shingles("ts") + " AS s FROM " +
      "(SELECT doc_id, string_split(text, ' ') AS ts FROM documents) " +
      "WHERE len(ts) >= 3)"

  /** Exact-Jaccard verification of candidate pairs (shared by both
    * near-dup paths): set-intersection sizes over the full shingle
    * arrays, so the reported jaccard is exact regardless of how the
    * candidates were generated.
    *
    * The array side is pruned to candidate docs FIRST: the candidate
    * id set (bounded by 2·|cand|) broadcasts into a left-semi filter,
    * so the shingle arrays are computed and joined only for docs that
    * actually appear in a pair — verify cost tracks candidate volume,
    * not corpus size. Without the prune, AQE happily builds a
    * broadcast hash relation out of the WHOLE corpus's arrays when
    * the candidate side looks small (measured: doubled x7's probe). */
  /** x8's exact-verified MinHash-LSH pair frame — band candidates
    * from the STORED bands3 signatures (one MinHashBands pass at
    * index build, never per query), exact verify over one codegen
    * re-shingle scan. ONE definition: the declared x8 AND x140's
    * audit both call it. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    verified(bandCandidates(s, d), shingled(s, d))

  /** x7's exact-verified Jaccard-≥0.8 pair frame — candidates from
    * the STORED prefix index (built once per corpus version, shared
    * machinery with x8/x36; the double-window df ranking never runs
    * at probe time), exact verify over one codegen re-shingle scan.
    * ONE definition: the declared x7 AND x139's audit ground truth
    * both call it (the SQL side shares jaccCandSql/verifiedCteSql the
    * same way), so the audit cannot desynchronize from the detector
    * it grades against (review-caught: the body was duplicated). */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    verified(candidatePairs(ShingleIndex.forDir(s, d).load("pfx3")),
      shingledFrom(table(s, d, "documents")), spread = true, prune = true)

  private def verified(cand: DataFrame, sh: DataFrame,
      spread: Boolean = false, prune: Boolean = false): DataFrame = {
    // `prune` = semi-filter the array side down to docs that appear in
    // a candidate pair (tiny broadcast id set) before computing the
    // shingle arrays, so verify cost tracks candidate volume instead
    // of corpus size — the right shape when candidates ≪ corpus (x7).
    // A candidate-light caller whose whole corpus is already cheap to
    // re-shingle (x8's banded buckets) skips it: the extra distinct +
    // broadcast stages cost more than the full-corpus recompute saves
    // at bench scale, and its candidate volume is band-bounded anyway.
    val pruned =
      if (!prune) sh
      else {
        val ids = cand.select(col("doc_a").as("doc_id"))
          .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
        sh.join(broadcast(ids), Seq("doc_id"), "left_semi")
      }
    val a = pruned.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("na"))
    val b = pruned.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("n").as("nb"))
    // `spread` = repartition the pairs across the session's shuffle
    // width before the per-pair array_intersect. For a candidate-heavy
    // caller (x7: ~90k pairs at sf0.1) the candidate frame is a few MB
    // of (long, long) rows, so AQE's size-based coalescing funnels the
    // verify — whose cost is per-ROW compute, not bytes — into one
    // task (measured: 2.6 s single-task vs ~100 ms spread); a
    // candidate-light caller (x8's banded buckets) skips the extra
    // shuffle, whose fixed stage cost would dominate. The repartition
    // must differ from the distinct's (doc_a, doc_b) hash or the
    // planner elides it as redundant and the surviving
    // ENSURE_REQUIREMENTS exchange coalesces anyway; the explicit
    // width (the session shuffle config) marks it user-specified,
    // which AQE's coalescer leaves alone.
    val pairs =
      if (!spread) cand
      else cand.repartition(
        cand.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_a"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= Threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** CTE form of the exact-Jaccard verify (`ver(doc_a, doc_b,
    * jaccard)` over `cand` and `sh`) — shared by the x7 literal and
    * x139's audit oracle. */
  private val verifiedCteSql =
    "sz AS (SELECT doc_id, s, len(s) AS n FROM sh), " +
      "j AS (SELECT doc_a, doc_b, len(list_intersect(sa.s, sb.s)) AS inter, " +
      "sa.n AS na, sb.n AS nb FROM cand JOIN sz sa ON sa.doc_id = doc_a " +
      "JOIN sz sb ON sb.doc_id = doc_b), " +
      "ver AS (SELECT doc_a, doc_b, " +
      "round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
      s"FROM j WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $Threshold)"

  private val verifiedSql =
    verifiedCteSql + " SELECT doc_a, doc_b, jaccard FROM ver ORDER BY doc_a, doc_b"

  /** The x7 prefix-filtered candidate chain (`ex → dfreq → rk → pfx →
    * cand`) — factored so x139's audit oracle replays the IDENTICAL
    * ground-truth pair generation. */
  private val jaccCandSql =
    "ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh), " +
      "dfreq AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g), " +
      "rk AS (SELECT doc_id, n, ex.g, ROW_NUMBER() OVER " +
      "(PARTITION BY doc_id ORDER BY dfreq.df, ex.g) AS r " +
      "FROM ex JOIN dfreq ON ex.g = dfreq.g), " +
      "pfx AS (SELECT doc_id, g FROM rk WHERE r <= n // 5 + 1), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      "FROM pfx a JOIN pfx b ON a.g = b.g AND a.doc_id < b.doc_id)"

  /** DuckDB CTEs `bands(doc_id, bv)` + `cand(doc_a, doc_b)` — x8's
    * MinHash-LSH band candidates (4 bands of 2 md5-chunk-min
    * signatures over `sh`), factored out of the query literal so the
    * SQL and the Spark twin below sit side by side. */
  /** The candidate CTE is NAME-PARAMETERIZED because x140 composes
    * this chain with [[jaccCandSql]], which also defines `cand` — the
    * r16 form renamed it with a post-hoc string .replace, which any
    * rewording here would have turned into a silent no-op (duplicate
    * `cand` CTEs, a runtime SQL error instead of a compile-time one —
    * r16 ADVICE). */
  private def bandCandSqlAs(candName: String): String = {
    val sigs = Seq.tabulate(8) { k =>
      val (src, off) = if (k < 4) ("md5(g)", 8 * k + 1) else ("md5('~' || g)", 8 * (k - 4) + 1)
      s"list_aggregate(list_transform(s, g -> substr($src, $off, 8)), 'min')"
    }
    val bandVals = sigs.grouped(2).zipWithIndex.map { case (Seq(s1, s2), i) =>
      s"'$i|' || $s1 || $s2"
    }.mkString(", ")
    s"bands AS (SELECT doc_id, unnest([$bandVals]) AS bv FROM sh), " +
      s"$candName AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a " +
      "JOIN bands b ON a.bv = b.bv AND a.doc_id < b.doc_id)"
  }

  private val bandCandSql: String = bandCandSqlAs("cand")

  /** Spark twin of [[bandCandSql]]: candidate pairs from the STORED
    * band signatures (ShingleIndex `bands3`, one MinHashBands pass at
    * index build — never per query). */
  private def bandCandidates(s: SparkSession, d: String): DataFrame = {
    val bands = ShingleIndex.forDir(s, d).load("bands3")
    bands.as("a")
      .join(bands.as("b"),
        col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** (doc_id, fps, n): winnowing fp sets over any (doc_id, text)
    * frame — the inline twin of ShingleIndex's stored `wfp` table
    * (same expressions; CurationSpec's fixture drives ride this). */
  private[graft] def winnowSetsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 4)
      .select(col("doc_id"), TextFns.winnowFps(col("ts")).as("fps"))
      .withColumn("n", size(col("fps")))

  /** x130's pipeline over a (doc_id, fps, n) frame — containment-
    * complete prefix-probe candidates, exact verify with all-integer
    * admission (see the x130 query header). The declared query hands
    * it the STORED wfp table (built once per corpus version); fixture
    * drives hand it [[winnowSetsOf]]. */
  private[graft] def spanContainmentPairs(sz: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = sz.select(col("doc_id"), col("n"), explode(col("fps")).as("fp"))
    // df via aggregate + equi-join (NOT a per-fp window: a hot
    // boilerplate fp's posting list would buffer in one task); the
    // per-doc ranking window is bounded by that doc's own fp count
    val dfq = ex.groupBy("fp").agg(count(lit(1)).as("df"))
    val pfx = ex.join(dfq, Seq("fp"))
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "fp")))
      .filter(col("r") <= floor(col("n") * 2 / 5) + 1)
      .select(col("doc_id"), col("fp"))
    val cand = pfx
      .join(ex.select(col("doc_id").as("idx_doc"), col("fp")), Seq("fp"))
      .filter(col("doc_id") =!= col("idx_doc"))
      .select(least(col("doc_id"), col("idx_doc")).as("doc_a"),
        greatest(col("doc_id"), col("idx_doc")).as("doc_b"))
      .distinct()
    val a = sz.select(col("doc_id").as("doc_a"), col("fps").as("sa"),
      col("n").as("na"))
    val b = sz.select(col("doc_id").as("doc_b"), col("fps").as("sb"),
      col("n").as("nb"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("inter") * 10 >= least(col("na"), col("nb")) * 6 &&
        col("inter") * 5 < (col("na") + col("nb") - col("inter")) * 4)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / least(col("na"), col("nb")), 6)
          .as("containment"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Query] = Seq(
    x58,

    // exact dedup via content hash (survey Q21)
    Query("q21_dedup_exact",
      "SELECT COUNT(*) AS docs, COUNT(DISTINCT md5(text)) AS uniq FROM documents") {
      (s, d) =>
        table(s, d, "documents")
          .agg(count(lit(1)).as("docs"),
            countDistinct(md5(col("text"))).as("uniq"))
    },

    // n-gram-Jaccard near-dup pairs via prefix filtering (see header):
    // only each document's ⌊n/5⌋+1 rarest shingles (df asc, g asc —
    // one global total order in both engines) enter the inverted
    // index, which keeps the candidate join free of the O(df²)
    // stop-phrase blowup while staying COMPLETE for Jaccard ≥ 0.8;
    // candidates then verify with exact Jaccard over the full shingle
    // sets. The oracle replays the same prefix selection on the raw
    // shingles; the Spark side's hashed join key and length filter can
    // only add hash-collision candidates or drop length-incompatible
    // ones — both settled by the exact verify, so results hash-match.
    Query("x7_ngram_jaccard",
      s"WITH $shingledSql, $jaccCandSql, " + verifiedSql) {
      (s, d) => jaccardPairs(s, d)
    },

    // SimHash Hamming-ball near-dup (ROADMAP §5): pairs of documents
    // whose 64-bit SimHash fingerprints differ in ≤ 2 bits — 64-bit
    // since r15 (the 16-bit space saturated at sf0.1: one giant
    // component, 1.08M mostly-spurious pairs; at 64 bits the sf0.1
    // corpus yields ~155 real near-dup pairs).
    //
    // Fingerprints come from the STORED fp64 table (built once per
    // corpus version — probes never re-tokenize). Pair generation is
    // the shared 64-bit engine (hamming64PairsOf, the media engine's
    // technique): under the saturation guard the candidate structure
    // is a broadcast NEIGHBOR TABLE (present fps × the 2081 ≤2-bit
    // XOR masks, semi-joined back to present — built distributedly,
    // nothing driver-side) probed by two equi-joins; above the guard
    // (the 64-bit norm once corpora grow — sf0.1 already crosses it)
    // the 3-band (22+21+21) pigeonhole equi-join takes over. Both
    // paths are EXACT for Hamming ≤ 2 and result-identical
    // (DedupHotPathSpec pins it), which is also why the oracle may
    // verify with a band-free all-pairs filter.
    Query("x25_simhash_neardup",
      s"WITH $simhash64PairsSql " +
        "SELECT doc_a, doc_b, hamming FROM pairs ORDER BY doc_a, doc_b") {
      (s, d) => simhash64Pairs(s, d).orderBy("doc_a", "doc_b")
    },

    // DEDUP QUALITY AUDIT — how the two text near-dup detectors
    // DISAGREE, the question a curator asks before trusting either:
    // ground truth = x7's exact-verified 3-gram Jaccard ≥ 0.8 pairs,
    // detector = x25's SimHash Hamming-≤2 pairs; one full-outer join
    // of the two (bounded) pair sets and ONE aggregate emit the
    // confusion counts plus precision/recall of SimHash against the
    // Jaccard standard. The same audit doctrine as x137/x138 for the
    // vector indexes: an approximate detector's quality is corpus
    // state an operator must be able to MEASURE, not assume — SimHash
    // trades per-token granularity for O(1) fingerprints, and this
    // row quantifies exactly what that trade costs on THIS corpus.
    // Both inputs ride their stored indexes (pfx3 prefix index, fp64
    // fingerprints); the audit adds two bounded-pair-set joins on top.
    Query("x139_dedup_audit", {
      s"WITH $shingledSql, $jaccCandSql, $verifiedCteSql, " +
        simhash64PairsSql + ", " +
        "f AS (SELECT COALESCE(v.doc_a, p.doc_a) AS doc_a, " +
        "COALESCE(v.doc_b, p.doc_b) AS doc_b, " +
        "CASE WHEN v.doc_a IS NULL THEN 0 ELSE 1 END AS in_j, " +
        "CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END AS in_s " +
        "FROM ver v FULL OUTER JOIN pairs p " +
        "ON v.doc_a = p.doc_a AND v.doc_b = p.doc_b), " +
        "agg AS (SELECT CAST(SUM(in_j) AS BIGINT) AS n_jaccard, " +
        "CAST(SUM(in_s) AS BIGINT) AS n_simhash, " +
        "CAST(SUM(in_j * in_s) AS BIGINT) AS n_both FROM f) " +
        "SELECT n_jaccard, n_simhash, n_both, " +
        "CASE WHEN n_simhash > 0 THEN round(CAST(n_both AS DOUBLE) / n_simhash, 4) END AS precision, " +
        "CASE WHEN n_jaccard > 0 THEN round(CAST(n_both AS DOUBLE) / n_jaccard, 4) END AS recall " +
        "FROM agg"
    }) {
      (s, d) =>
        val jp = jaccardPairs(s, d)
          .select(col("doc_a"), col("doc_b"), lit(1).as("in_j"))
        val sp = simhash64Pairs(s, d)
          .select(col("doc_a"), col("doc_b"), lit(1).as("in_s"))
        jp.join(sp, Seq("doc_a", "doc_b"), "full_outer")
          .select(coalesce(col("in_j"), lit(0)).as("in_j"),
            coalesce(col("in_s"), lit(0)).as("in_s"))
          .agg(sum(col("in_j")).cast("bigint").as("n_jaccard"),
            sum(col("in_s")).cast("bigint").as("n_simhash"),
            sum(col("in_j") * col("in_s")).cast("bigint").as("n_both"))
          .select(col("n_jaccard"), col("n_simhash"), col("n_both"),
            when(col("n_simhash") > 0,
              round(col("n_both").cast("double") / col("n_simhash"), 4))
              .as("precision"),
            when(col("n_jaccard") > 0,
              round(col("n_both").cast("double") / col("n_jaccard"), 4))
              .as("recall"))
    },

    // near-dup CLUSTERING — the step that turns pairwise near-dup
    // detection into an actual dedup decision: connected components
    // over the x25 Hamming-ball pair graph, cluster label = min doc_id
    // in the component, `canonical` marks the one representative a
    // pipeline would KEEP (every other row is the drop list).
    //
    // 64-bit since r15: the 16-bit era's driver union-find rested on
    // the ≤2¹⁶ fingerprint quotient, which no longer exists — the
    // clustering is now the DISTRIBUTED pointer-jumping CC
    // (connectedComponents above) over the 64-bit pair graph, run
    // ONCE per corpus version at index build and served from the
    // stored cl64 table (SimhashIndex): seven family queries share
    // one clustering, and a dedup decision is corpus state, exactly
    // like the ingest flow's maintained dedup_decisions. The oracle
    // recomputes the same fixpoint via recursive reachability
    // (feasible at the sf0.01 gate; tools/check_sf01.py replays the
    // pair graph + union-find independently at sf0.1).
    Query("x34_dedup_clusters",
      s"WITH RECURSIVE $simhash64ClustersSql " +
        "SELECT doc_id, cluster, doc_id = cluster AS canonical FROM cc " +
        "ORDER BY cluster, doc_id") {
      (s, d) =>
        clusters64(s, d)
          .select(col("doc_id"), col("cluster"),
            (col("doc_id") === col("cluster")).as("canonical"))
          .orderBy("cluster", "doc_id")
    },

    // MinHash + LSH near-dup: 8 32-bit minhash signatures (md5-hex
    // chunk minima), 4 bands of 2, bucket-join candidates,
    // exact-Jaccard verification. MinHashBands computes all 8
    // signatures + 4 band strings in one codegen pass per document.
    Query("x8_minhash_lsh",
      s"WITH $shingledSql, $bandCandSql, " + verifiedSql) {
      (s, d) => minhashPairs(s, d)
    },

    // MinHash-LSH BAND-RECALL audit — x139's sibling for the OTHER
    // text detector, completing the dedup audit matrix: x8's exact
    // verify makes its output a SUBSET of x7's ground truth by
    // construction (same shingles, same threshold), so the only
    // quality question is which true pairs the 4×2 banding never
    // CANDIDATED — the classic LSH miss probability (1-(1-s^r)^b),
    // here measured instead of assumed. precision therefore must be
    // exactly 1.0 (the audit PINS the subset property — a drift
    // between the two paths' thresholds or shingle widths would
    // surface as precision < 1 long before any downstream symptom);
    // recall is the banding's true catch rate on THIS corpus. One
    // full-outer join of two bounded pair sets + one aggregate, both
    // inputs riding their stored indexes (pfx3, bands3).
    Query("x140_minhash_audit", {
      val bcand = bandCandSqlAs("bcand")
      s"WITH $shingledSql, $jaccCandSql, $verifiedCteSql, $bcand, " +
        "mh AS (SELECT v.doc_a, v.doc_b FROM ver v " +
        "JOIN bcand b ON v.doc_a = b.doc_a AND v.doc_b = b.doc_b), " +
        "f AS (SELECT COALESCE(v.doc_a, m.doc_a) AS doc_a, " +
        "CASE WHEN v.doc_a IS NULL THEN 0 ELSE 1 END AS in_j, " +
        "CASE WHEN m.doc_a IS NULL THEN 0 ELSE 1 END AS in_m " +
        "FROM ver v FULL OUTER JOIN mh m " +
        "ON v.doc_a = m.doc_a AND v.doc_b = m.doc_b), " +
        "agg AS (SELECT CAST(SUM(in_j) AS BIGINT) AS n_jaccard, " +
        "CAST(SUM(in_m) AS BIGINT) AS n_minhash, " +
        "CAST(SUM(in_j * in_m) AS BIGINT) AS n_both FROM f) " +
        "SELECT n_jaccard, n_minhash, n_both, " +
        "CASE WHEN n_minhash > 0 THEN round(CAST(n_both AS DOUBLE) / n_minhash, 4) END AS precision, " +
        "CASE WHEN n_jaccard > 0 THEN round(CAST(n_both AS DOUBLE) / n_jaccard, 4) END AS recall " +
        "FROM agg"
    }) {
      (s, d) =>
        val jp = jaccardPairs(s, d)
          .select(col("doc_a"), col("doc_b"), lit(1).as("in_j"))
        val mh = minhashPairs(s, d)
          .select(col("doc_a"), col("doc_b"), lit(1).as("in_m"))
        jp.join(mh, Seq("doc_a", "doc_b"), "full_outer")
          .select(coalesce(col("in_j"), lit(0)).as("in_j"),
            coalesce(col("in_m"), lit(0)).as("in_m"))
          .agg(sum(col("in_j")).cast("bigint").as("n_jaccard"),
            sum(col("in_m")).cast("bigint").as("n_minhash"),
            sum(col("in_j") * col("in_m")).cast("bigint").as("n_both"))
          .select(col("n_jaccard"), col("n_minhash"), col("n_both"),
            when(col("n_minhash") > 0,
              round(col("n_both").cast("double") / col("n_minhash"), 4))
              .as("precision"),
            when(col("n_jaccard") > 0,
              round(col("n_both").cast("double") / col("n_jaccard"), 4))
              .as("recall"))
    },

    // SPAN CONTAINMENT — the subset-duplication detector Jaccard
    // near-dup misses: a document whose fingerprinted content is
    // mostly EMBEDDED in a longer one (a quoted article inside a
    // page, boilerplate wrapping real content) has
    // |A∩B|/min(|A|,|B|) ≈ 1 while its Jaccard |A∩B|/|A∪B| sits far
    // below any near-dup threshold, so x7/x8/x25 never pair it. The
    // set unit is x65's WINNOWING fingerprint set (k=4-gram, w=4
    // minima — the span-level sketch, so shared RUNS drive
    // containment, not shared vocabulary; this corpus has real
    // span-subset docs at this level and none at the raw-shingle
    // level). Candidates are COMPLETE for containment ≥ 0.6 by
    // prefix-probing (Bayardo et al.'s pigeonhole, re-derived for the
    // asymmetric measure): if ≥ 0.6·n of A's n fps lie in B, then
    // among A's ⌊0.4n⌋+1 rarest fps (global (df, fp) order) at least
    // one is in B — so each doc probes its prefix against the FULL
    // inverted index and every qualifying pair is hit from its
    // smaller side. Scale shape: the probe side carries only RARE fps
    // by construction (hot boilerplate fps sink to the back of every
    // prefix ordering and are never probed), so candidate volume is
    // Σ_prefix-fps df — measured 302 candidates / 5000 docs at sf0.1;
    // df attaches via a map-side-combined aggregate JOIN (no per-fp
    // window buffering a hot posting list in one task). Admission
    // predicates are ALL-INTEGER (inter·10 ≥ min·6, inter·5 <
    // union·4) so no float boundary can flip membership; the rounded
    // ratios are display columns.
    Query("x130_span_containment", {
      val gram = "ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]"
      "WITH wt AS (SELECT doc_id, string_split(text, ' ') AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "wh AS (SELECT doc_id, list_transform(range(len(ts) - 3), " +
        s"i -> ${Sql.md5Bits24(s"md5($gram)")}) AS hs FROM wt " +
        "WHERE len(ts) >= 4), " +
        "wf AS (SELECT doc_id, list_distinct(" +
        "list_transform(range(CASE WHEN len(hs) < 4 THEN 1 " +
        "ELSE len(hs) - 3 END), " +
        "i -> list_min(list_slice(hs, i + 1, i + 4)))) AS fps FROM wh), " +
        "wsz AS (SELECT doc_id, fps, len(fps) AS n FROM wf), " +
        "wex AS (SELECT doc_id, n, unnest(fps) AS fp FROM wsz), " +
        "wdf AS (SELECT fp, COUNT(*) AS df FROM wex GROUP BY fp), " +
        "wrk AS (SELECT doc_id, n, wex.fp, ROW_NUMBER() OVER " +
        "(PARTITION BY doc_id ORDER BY wdf.df, wex.fp) AS r " +
        "FROM wex JOIN wdf ON wex.fp = wdf.fp), " +
        "wpfx AS (SELECT doc_id, fp FROM wrk WHERE r <= n * 2 // 5 + 1), " +
        "wcand AS (SELECT DISTINCT least(p.doc_id, x.doc_id) AS doc_a, " +
        "greatest(p.doc_id, x.doc_id) AS doc_b " +
        "FROM wpfx p JOIN wex x ON p.fp = x.fp AND p.doc_id != x.doc_id), " +
        "wj AS (SELECT doc_a, doc_b, " +
        "len(list_intersect(sa.fps, sb.fps)) AS inter, " +
        "sa.n AS na, sb.n AS nb FROM wcand " +
        "JOIN wsz sa ON sa.doc_id = doc_a " +
        "JOIN wsz sb ON sb.doc_id = doc_b) " +
        "SELECT doc_a, doc_b, " +
        "round(CAST(inter AS DOUBLE) / least(na, nb), 6) AS containment, " +
        "round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
        "FROM wj WHERE inter * 10 >= least(na, nb) * 6 " +
        "AND inter * 5 < (na + nb - inter) * 4 " +
        "ORDER BY doc_a, doc_b"
    }) {
      // probe/verify both ride the STORED wfp table (ShingleIndex,
      // built once per corpus version) — the md5-per-4-gram winnow
      // recompute never runs at probe time (measured: 1.86 → 1.0 s
      // at sf0.1 across the query's five former recompute sites)
      (s, d) => spanContainmentPairs(ShingleIndex.forDir(s, d).load("wfp"))
    },

    // canonical-corpus materialization — the dedup family's actual
    // OUTPUT: the training corpus after near-dup removal. Composes
    // x34's stored clustering into an anti-join: a document is kept
    // iff it is its cluster's canonical member (min doc_id) or it has
    // no near-dup at all (absent from the pair graph — including
    // null-text docs, which cannot pair). Scale shape: the cluster
    // frame is the stored cl64 table (built once per corpus version),
    // the drop list is ∝ duplicate docs, and the anti-join shuffles
    // on doc_id (AQE broadcasts it while small). Narrow metadata
    // projection — re-attaching full text is the same join, just
    // wider.
    Query("x40_dedup_canonical",
      s"WITH RECURSIVE $simhash64ClustersSql, " +
        "dropped AS (SELECT doc_id FROM cc WHERE doc_id != cluster) " +
        "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d " +
        "LEFT JOIN dropped x ON d.doc_id = x.doc_id " +
        "WHERE x.doc_id IS NULL ORDER BY d.doc_id") {
      (s, d) =>
        val dropped = clusters64(s, d)
          .filter(col("doc_id") =!= col("cluster"))
          .select(col("doc_id"))
        table(s, d, "documents")
          .join(dropped, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .orderBy("doc_id")
    },

    // CLUSTER-AWARE split assignment — the TRANSFORM that fixes what
    // x84 audits: the naive per-doc hash split (x35) puts near-dup
    // twins on opposite sides of the train/eval boundary (x84 counts
    // exactly those), so eval scores are inflated by memorized
    // training twins. The fix every careful pipeline ships: the split
    // decision is made once per NEAR-DUP CLUSTER (the x34 quotient
    // clustering) — a doc's split bucket hashes its cluster ANCHOR
    // (min doc_id of its component; unclustered docs anchor on
    // themselves), so an entire component lands on one side by
    // construction. Output: per-split doc counts, how many docs MOVED
    // vs the naive assignment, and the cross-engine invariant column
    // `straddling` = number of clusters whose members span splits —
    // both engines COMPUTE it (an aggregate over their own independent
    // clustering + assignment), and the hash match pins it at 0.
    // Scale: the clustering is the stored cl64 table (one build per
    // corpus version); the assignment adds one md5 per doc and two
    // bounded rollups. The anchor frame is referenced twice (per-split
    // rollup + straddle aggregate) — both are rollups of the same
    // broadcast-joined narrow scan, nothing corpus-sized shuffles
    // twice.
    Query("x118_cluster_split", {
      val anchorBkt = Sql.md5Bits16("md5(CAST(anchor AS VARCHAR))") + " % 100"
      val naiveBkt = Sql.md5Bits16("md5(CAST(doc_id AS VARCHAR))") + " % 100"
      s"WITH RECURSIVE $simhash64ClustersSql, " +
        "a AS (SELECT d.doc_id, COALESCE(cc.cluster, d.doc_id) AS anchor " +
        "FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id), " +
        s"sp AS (SELECT doc_id, anchor, " +
        s"CASE WHEN $anchorBkt < 80 THEN 'train' WHEN $anchorBkt < 90 " +
        "THEN 'val' ELSE 'test' END AS split, " +
        s"CASE WHEN $naiveBkt < 80 THEN 'train' WHEN $naiveBkt < 90 " +
        "THEN 'val' ELSE 'test' END AS naive FROM a), " +
        "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS straddling FROM (" +
        "SELECT anchor FROM sp GROUP BY anchor " +
        "HAVING COUNT(DISTINCT split) > 1)) " +
        "SELECT split, COUNT(*) AS n_docs, " +
        "CAST(SUM(CASE WHEN split <> naive THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_moved, (SELECT straddling FROM st) AS straddling " +
        "FROM sp GROUP BY split ORDER BY split"
    }) {
      (s, d) =>
        def splitOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
          val b = TextFns.md5Bits16(c.cast("string")) % 100
          when(b < 80, "train").when(b < 90, "val").otherwise("test")
        }
        val anchored = table(s, d, "documents").select(col("doc_id"))
          .join(clusters64(s, d)
            .select(col("doc_id"), col("cluster")), Seq("doc_id"),
            "left_outer")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("anchor"))
        val sp = anchored.select(
          splitOf(col("anchor")).as("split"),
          (splitOf(col("anchor")) =!= splitOf(col("doc_id")))
            .cast("long").as("moved"),
          col("anchor"))
        val straddle = sp.groupBy("anchor")
          .agg(countDistinct(col("split")).as("ns"))
          .filter(col("ns") > 1)
          .agg(count(lit(1)).as("straddling"))
        sp.groupBy("split")
          .agg(count(lit(1)).as("n_docs"), sum(col("moved")).as("n_moved"))
          .crossJoin(broadcast(straddle))
          .select(col("split"), col("n_docs"), col("n_moved"),
            col("straddling"))
          .orderBy("split")
    },

    // QUALITY-AWARE canonical election — the retention policy real
    // dedup pipelines (SemDeDup, Dolma) ship that x34/x40 simplify
    // away: within a near-dup cluster, keep the most INFORMATIVE
    // member, not the lowest-id one. Election key is exact-integer
    // (so both engines argmax identically, no float ties): distinct
    // token count DESC, then n_chars DESC, then doc_id ASC. Output
    // per cluster: the elected canonical, its distinct-token count,
    // the member count, and `moved` = the election differs from the
    // min-id default (the cross-engine tripwire — both sides derive
    // it from their own independent clustering + election). Scale:
    // clusters come from the stored cl64 table (one build per corpus
    // version); the quality key tokenizes ONLY clustered docs (the
    // corpus joins cluster ids BEFORE the distinct-token map, so
    // unclustered text never tokenizes), and the election is one
    // max(struct) hash aggregate — map-side combined, one row per
    // cluster out.
    Query("x120_quality_canonical",
      s"WITH RECURSIVE $simhash64ClustersSql, " +
        "q AS (SELECT cc.cluster, cc.doc_id, " +
        "CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT) AS dt, " +
        "d.n_chars FROM cc JOIN documents d ON cc.doc_id = d.doc_id), " +
        "r2 AS (SELECT cluster, doc_id, dt, " +
        "ROW_NUMBER() OVER (PARTITION BY cluster " +
        "ORDER BY dt DESC, n_chars DESC, doc_id ASC) AS rn, " +
        "CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members " +
        "FROM q) " +
        "SELECT cluster, doc_id AS canonical, n_members, dt AS canonical_dt, " +
        "(doc_id <> cluster) AS moved FROM r2 WHERE rn = 1 ORDER BY cluster") {
      (s, d) =>
        val cl = clusters64(s, d).select(col("doc_id"), col("cluster"))
        cl.join(table(s, d, "documents")
            .select(col("doc_id"), col("text"), col("n_chars")),
            Seq("doc_id"))
          .select(col("cluster"), col("doc_id"),
            size(array_distinct(TextFns.tokens(col("text"))))
              .cast("bigint").as("dt"),
            col("n_chars"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            max(struct(col("dt"), col("n_chars"),
              (-col("doc_id")).as("ni"))).as("best"))
          .select(col("cluster"), (-col("best.ni")).as("canonical"),
            col("n_members"), col("best.dt").as("canonical_dt"),
            ((-col("best.ni")) =!= col("cluster")).as("moved"))
          .orderBy("cluster")
    },

    // the TRANSFORM x120 elects for (the house audit→transform pair,
    // x40's analogue under quality election): the deduplicated corpus
    // that keeps each cluster's QUALITY-elected canonical — documents
    // anti-joined against cluster members that lost their election.
    // Same plan skeleton as x40 (quotient clustering + one left-anti
    // against a bounded drop list) plus x120's bounded election
    // aggregate feeding the drop side; the corpus-sized path is one
    // scan + one anti-join either way.
    Query("x122_quality_corpus",
      s"WITH RECURSIVE $simhash64ClustersSql, " +
        "q AS (SELECT cc.cluster, cc.doc_id, " +
        "CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT) AS dt, " +
        "d.n_chars FROM cc JOIN documents d ON cc.doc_id = d.doc_id), " +
        "w AS (SELECT cluster, doc_id, ROW_NUMBER() OVER (" +
        "PARTITION BY cluster ORDER BY dt DESC, n_chars DESC, doc_id ASC) " +
        "AS rn FROM q), " +
        "dropped AS (SELECT doc_id FROM w WHERE rn > 1) " +
        "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d " +
        "LEFT JOIN dropped x ON d.doc_id = x.doc_id " +
        "WHERE x.doc_id IS NULL ORDER BY d.doc_id") {
      (s, d) =>
        val cl = clusters64(s, d).select(col("doc_id"), col("cluster"))
        val m = cl.join(table(s, d, "documents")
            .select(col("doc_id"), col("text"), col("n_chars")),
            Seq("doc_id"))
          .select(col("cluster"), col("doc_id"),
            size(array_distinct(TextFns.tokens(col("text"))))
              .cast("bigint").as("dt"),
            col("n_chars"))
        val winners = m.groupBy("cluster")
          .agg(max(struct(col("dt"), col("n_chars"),
            (-col("doc_id")).as("ni"))).as("best"))
          .select(col("cluster"), (-col("best.ni")).as("winner"))
        val dropped = m.join(winners, Seq("cluster"))
          .filter(col("doc_id") =!= col("winner"))
          .select(col("doc_id"))
        table(s, d, "documents")
          .join(dropped, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .orderBy("doc_id")
    },

    // CONTRASTIVE PAIR MINING — dedup structures repurposed as
    // dataset CONSTRUCTION (the SimCSE/E5-style recipe: embedding
    // models train on mined positive pairs + hard negatives):
    // positives are (cluster anchor, member) pairs from the x34
    // near-dup clustering (same content family, the min-id anchor is
    // the orientation); hard negatives are band-COLLIDING pairs whose
    // fingerprints are nonetheless far (Hamming 3–6) — LSH-adjacent
    // lookalikes, exactly the pairs a contrastive loss needs to be
    // hard — capped at the 3 HARDEST per anchor (hamming asc, doc_b
    // tiebreak). The cap is the scale guard: a real miner keeps O(k)
    // negatives per anchor, and the rank-≤-k filter compiles to
    // WindowGroupLimit (map-local top-k before the doc_a shuffle, the
    // x80 shape), so output is O(docs·k) at any corpus size. At 64
    // bits a band collision is 21-22 shared bits — a genuinely
    // selective lookalike signal, where the 16-bit era's saturated
    // buckets went quadratic (2.5M uncapped pairs at sf0.1).
    // Positives ride the stored clustering + two fingerprint joins;
    // negatives the banded candidate equi-join (one band-key shuffle,
    // never all-pairs) — so the NEGATIVE side's oracle must replay
    // the exact 22+21+21 band layout, unlike the Hamming-≤2 queries
    // whose all-pairs oracle filter coincides with the banded result.
    Query("x124_contrastive_pairs",
      s"WITH RECURSIVE $simhash64ClustersSql, " +
        "bands AS (SELECT doc_id, hi, lo, i, " +
        s"CASE i WHEN 0 THEN ${Hamming64.bandSql(0)} " +
        s"WHEN 1 THEN ${Hamming64.bandSql(1)} " +
        s"ELSE ${Hamming64.bandSql(2)} END AS bv " +
        "FROM fp, (SELECT unnest(range(3)) AS i)), " +
        "pos AS (SELECT cc.cluster AS doc_a, cc.doc_id AS doc_b, " +
        "'pos' AS label, CAST(bit_count(xor(fa.hi, fb.hi)) + " +
        "bit_count(xor(fa.lo, fb.lo)) AS BIGINT) AS hamming " +
        "FROM cc JOIN fp fa ON fa.doc_id = cc.cluster " +
        "JOIN fp fb ON fb.doc_id = cc.doc_id WHERE cc.doc_id <> cc.cluster), " +
        // same-COMPONENT pairs can reach Hamming 3–6 through closure
        // (a–b–c chains) — they are positives by definition and must
        // never mine as negatives (review-caught: 3 double-labeled
        // pairs on the sf0.01 fixture before this filter)
        "negall AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, " +
        "CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) " +
        "AS BIGINT) AS hamming FROM bands x " +
        "JOIN bands y ON x.i = y.i AND x.bv = y.bv AND x.doc_id < y.doc_id " +
        "LEFT JOIN cc ca ON ca.doc_id = x.doc_id " +
        "LEFT JOIN cc cb ON cb.doc_id = y.doc_id " +
        "WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) " +
        "BETWEEN 3 AND 6 " +
        "AND (ca.cluster IS NULL OR cb.cluster IS NULL " +
        "OR ca.cluster <> cb.cluster)), " +
        "neg AS (SELECT doc_a, doc_b, 'neg' AS label, hamming FROM (" +
        "SELECT doc_a, doc_b, hamming, ROW_NUMBER() OVER (" +
        "PARTITION BY doc_a ORDER BY hamming, doc_b) AS rk FROM negall) " +
        "WHERE rk <= 3) " +
        "SELECT doc_a, doc_b, label, hamming FROM " +
        "(SELECT * FROM pos UNION ALL SELECT * FROM neg) " +
        "ORDER BY label, doc_a, doc_b") {
      (s, d) =>
        val fps = SimhashIndex.forDir(s, d).load("fp64")
        val cl = clusters64(s, d).select(col("doc_id"), col("cluster"))
        val pos = cl
          .filter(col("doc_id") =!= col("cluster"))
          .join(fps.select(col("doc_id").as("cluster"), col("f").as("fa")),
            Seq("cluster"))
          .join(fps.select(col("doc_id"), col("f").as("fb")), Seq("doc_id"))
          .select(col("cluster").as("doc_a"), col("doc_id").as("doc_b"),
            lit("pos").as("label"),
            bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long")
              .as("hamming"))
        // cross-component only: a same-component pair at Hamming 3–6
        // (closure chain) is a positive, never a hard negative
        val neg = simhash64Candidates(fps)
          .withColumn("hamming",
            bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
          .filter(col("hamming").between(3, 6))
          .join(cl.select(col("doc_id").as("doc_a"),
            col("cluster").as("ca")), Seq("doc_a"), "left_outer")
          .join(cl.select(col("doc_id").as("doc_b"),
            col("cluster").as("cb")), Seq("doc_b"), "left_outer")
          .filter(col("ca").isNull || col("cb").isNull ||
            col("ca") =!= col("cb"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("doc_a")
              .orderBy(col("hamming"), col("doc_b"))))
          .filter(col("rk") <= 3)
          .select(col("doc_a"), col("doc_b"), lit("neg").as("label"),
            col("hamming"))
        pos.unionByName(neg).orderBy("label", "doc_a", "doc_b")
    },

    // RETENTION FUNNEL — the survivorship summary every pipeline
    // publishes (the Dolma data-card shape): docs and character mass
    // surviving each gate, gates applied as intersecting FULL-CORPUS
    // keep sets (each stage uses the exact semantics of its declared
    // query, not a re-derivation on a filtered corpus): exact text
    // dedup (min doc_id per text — q21's uniq), near-dup canonical
    // retention (x40's kept set from the stored cl64 clustering),
    // x74's quality verdict (too_short / low_quality), x86's
    // eval-decontamination drop roster, x121's source cap (the pct
    // interpolated from the ONE SourceCapPct constant, so the oracle
    // cannot desync from the Spark plan). Scale: five bounded keep
    // columns attach to one narrow corpus frame (a map-side-combined
    // text aggregate, the stored drop list, one codegen quality map,
    // the stored-ex8h contamination probe, the cap window), then ONE
    // aggregate emits all six stages — no per-stage corpus rescans.
    // Survivorship is monotone by construction (stages intersect).
    Query("x126_retention_funnel", {
      val bkt = Sql.md5Bits16("md5(CAST(doc_id AS VARCHAR))") + " % 100"
      s"WITH RECURSIVE $simhash64ClustersSql, " +
        "nd AS (SELECT doc_id FROM cc WHERE doc_id <> cluster), " +
        "exk AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
        "qk AS (SELECT doc_id FROM (SELECT doc_id, n_chars, " +
        "string_split(text, ' ') AS ts FROM documents " +
        "WHERE text IS NOT NULL) WHERE n_chars >= 50 " +
        "AND CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) >= 0.3), " +
        s"csp AS (SELECT doc_id, CASE WHEN $bkt < 80 THEN 'train' " +
        s"WHEN $bkt < 90 THEN 'val' ELSE 'test' END AS split, " +
        "string_split(text, ' ') AS ts FROM documents " +
        "WHERE text IS NOT NULL), " +
        "cex AS (SELECT doc_id, split, unnest(" +
        Sql.shingles("ts", 8) + ") AS g FROM csp WHERE len(ts) >= 8), " +
        "ceg AS (SELECT DISTINCT g FROM cex WHERE split <> 'train'), " +
        "cdrop AS (SELECT DISTINCT doc_id FROM cex " +
        "WHERE split = 'train' AND g IN (SELECT g FROM ceg)), " +
        "m AS (SELECT doc_id, source, n_chars, " +
        "md5(CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
        s"cap AS (SELECT CAST(SUM(n_chars) AS BIGINT) * ${TextQueries.SourceCapPct} // 100 " +
        "AS cap FROM m), " +
        "cw AS (SELECT doc_id, SUM(n_chars) OVER (" +
        "PARTITION BY source ORDER BY h, doc_id) AS cum FROM m), " +
        "flags AS (SELECT d.doc_id, d.n_chars, " +
        "(e.doc_id IS NOT NULL) AS ek, (x.doc_id IS NULL) AS nk, " +
        "(q.doc_id IS NOT NULL) AS qk, (c2.doc_id IS NULL) AS dk, " +
        "(cw.cum <= (SELECT cap FROM cap)) AS ck FROM documents d " +
        "LEFT JOIN exk e ON e.doc_id = d.doc_id " +
        "LEFT JOIN nd x ON x.doc_id = d.doc_id " +
        "LEFT JOIN qk q ON q.doc_id = d.doc_id " +
        "LEFT JOIN cdrop c2 ON c2.doc_id = d.doc_id " +
        "JOIN cw ON cw.doc_id = d.doc_id) " +
        "SELECT 0 AS stage_id, 'all' AS stage, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars FROM flags " +
        "UNION ALL SELECT 1, 'exact_dedup', " +
        "CAST(SUM(CASE WHEN ek THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(SUM(CASE WHEN ek THEN n_chars ELSE 0 END) AS BIGINT) FROM flags " +
        "UNION ALL SELECT 2, 'near_dedup', " +
        "CAST(SUM(CASE WHEN ek AND nk THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(SUM(CASE WHEN ek AND nk THEN n_chars ELSE 0 END) AS BIGINT) FROM flags " +
        "UNION ALL SELECT 3, 'quality', " +
        "CAST(SUM(CASE WHEN ek AND nk AND qk THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(SUM(CASE WHEN ek AND nk AND qk THEN n_chars ELSE 0 END) AS BIGINT) FROM flags " +
        "UNION ALL SELECT 4, 'decontaminated', " +
        "CAST(SUM(CASE WHEN ek AND nk AND qk AND dk THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(SUM(CASE WHEN ek AND nk AND qk AND dk THEN n_chars ELSE 0 END) AS BIGINT) FROM flags " +
        "UNION ALL SELECT 5, 'source_cap', " +
        "CAST(SUM(CASE WHEN ek AND nk AND qk AND dk AND ck THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(SUM(CASE WHEN ek AND nk AND qk AND dk AND ck THEN n_chars ELSE 0 END) AS BIGINT) FROM flags " +
        "ORDER BY stage_id"
    }) {
      (s, d) =>
        val docs = table(s, d, "documents")
        val exKeep = docs.groupBy("text")
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), lit(true).as("ek"))
        val dropped = clusters64(s, d)
          .filter(col("doc_id") =!= col("cluster"))
          .select(col("doc_id"), lit(true).as("dropped"))
        val ts = graft.functions.TextFns.tokens(col("text"))
        // r18 (guide §2.1 — remove the shuffle outright): the quality
        // gate is a PER-ROW predicate of the documents row, so it
        // rides the probe-side scan as a column instead of a fifth
        // doc_id-keyed join (the r14 form derived a (doc_id, qk)
        // frame from a second documents scan and joined it back).
        // Null parity with filter+left_outer+coalesce: null text /
        // null n_chars make the conjunction null, coalesced to false
        // below — exactly the rows the old filter dropped.
        val qkRaw = col("text").isNotNull && col("n_chars") >= 50 &&
          size(array_distinct(ts)).cast("double") / size(ts) >= 0.3
        val contam = TextQueries.contaminatedTrainDocs(s, d)
          .select(col("doc_id"), lit(true).as("contam"))
        val capKeep = TextQueries.sourceCapScoresFor(s, d)
          .select(col("doc_id"), col("kept").as("ck"))
        val flags = docs.select(col("doc_id"), col("n_chars"),
            qkRaw.as("qkRaw"))
          .join(exKeep, Seq("doc_id"), "left_outer")
          .join(dropped, Seq("doc_id"), "left_outer")
          .join(contam, Seq("doc_id"), "left_outer")
          .join(capKeep, Seq("doc_id"))
          .select(col("n_chars"),
            coalesce(col("ek"), lit(false)).as("ek"),
            not(coalesce(col("dropped"), lit(false))).as("nk"),
            coalesce(col("qkRaw"), lit(false)).as("qk"),
            not(coalesce(col("contam"), lit(false))).as("dk"),
            col("ck"))
        def stage(cond: org.apache.spark.sql.Column) = struct(
          sum(when(cond, 1L).otherwise(0L)).as("n_docs"),
          sum(when(cond, col("n_chars")).otherwise(0L)).as("chars"))
        val names = Seq("all", "exact_dedup", "near_dedup", "quality",
          "decontaminated", "source_cap")
        flags.agg(
            stage(lit(true)).as("s0"), stage(col("ek")).as("s1"),
            stage(col("ek") && col("nk")).as("s2"),
            stage(col("ek") && col("nk") && col("qk")).as("s3"),
            stage(col("ek") && col("nk") && col("qk") && col("dk")).as("s4"),
            stage(col("ek") && col("nk") && col("qk") && col("dk") &&
              col("ck")).as("s5"))
          .select(explode(array(names.zipWithIndex.map { case (n, i) =>
            struct(lit(i.toLong).as("stage_id"), lit(n).as("stage"),
              col(s"s$i.n_docs"), col(s"s$i.chars"))
          }.toIndexedSeq: _*)).as("r"))
          .select(col("r.stage_id"), col("r.stage"), col("r.n_docs"),
            col("r.chars"))
          .orderBy("stage_id")
    })
}
