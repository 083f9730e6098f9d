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

  // SimHash Hamming-ball candidate generation (shared by x25/x34):
  // 16-bit fingerprints banded into THREE disjoint bands (5+5+6 bits)
  // — by pigeonhole any pair within Hamming distance ≤ 2 has some
  // band with zero differing bits, so recall is EXACT for the
  // threshold. Three wide bands beat a 4×4-bit layout ~3× on
  // candidate volume (collision probability 2⁻⁵+2⁻⁵+2⁻⁶ vs 4×2⁻⁴).
  // Candidates equi-join on (band index, band value) — one shuffle,
  // no all-pairs. Bands: bits [0,5) [5,10) [10,16).
  private val BandOffs = Seq(0, 5, 10)
  private val BandMasks = Seq(31L, 31L, 63L)

  /** DuckDB CTE chain ending in `cand(doc_a, doc_b, fa, fb)` — the
    * same fingerprints and band boundaries the Spark side uses. */
  private[graft] val simhashCandSql =
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
      "v AS (SELECT doc_id, " + Sql.md5Bits16("md5(t)") + " AS v16 FROM tok), " +
      "vb AS (SELECT doc_id, v16, j FROM v, (SELECT unnest(range(16)) AS j)), " +
      "c AS (SELECT doc_id, j, SUM(CASE WHEN CAST(floor(v16 / power(2, j)) AS BIGINT) % 2 = 1 " +
      "THEN 1 ELSE -1 END) AS sgn FROM vb GROUP BY 1, 2), " +
      "fp AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) " +
      "AS BIGINT) AS f FROM c GROUP BY doc_id), " +
      "bands AS (SELECT doc_id, f, i, " +
      "CASE i WHEN 0 THEN CAST(floor(f / 1) AS BIGINT) % 32 " +
      "WHEN 1 THEN CAST(floor(f / 32) AS BIGINT) % 32 " +
      "ELSE CAST(floor(f / 1024) AS BIGINT) % 64 END AS bv " +
      "FROM fp, (SELECT unnest(range(3)) AS i)), " +
      "cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.f AS fa, y.f AS fb " +
      "FROM bands x JOIN bands y ON x.i = y.i AND x.bv = y.bv AND x.doc_id < y.doc_id)"

  /** (doc_id, f): one narrow codegen scan computing the 16-bit SimHash
    * fingerprint per document (shared by x25's banding and x34's
    * quotient clustering). */
  private def simhashFps(s: SparkSession, d: String): DataFrame =
    simhashFpsOf(table(s, d, "documents"))

  /** The same fingerprint scan over any (doc_id, text) frame — the
    * ingestion flow fingerprints TableStore-held corpora with it. */
  private[graft] def simhashFpsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.simhash16(graft.functions.TextFns.tokens(col("text")))
          .as("f"))

  /** Spark twin of simhashCandSql: (doc_a, doc_b, fa, fb), distinct. */
  private[graft] def simhashCandidates(s: SparkSession, d: String): DataFrame = {
    val fpDf = simhashFps(s, d)
    val bands = fpDf.select(col("doc_id"), col("f"),
      explode(array((0 until 3).map(i =>
        struct(lit(i).as("i"),
          shiftright(col("f"), BandOffs(i)).bitwiseAND(lit(BandMasks(i))).as("bv")))
        .toIndexedSeq: _*)).as("band"))
      .select(col("doc_id"), col("f"),
        col("band.i").as("i"), col("band.bv").as("bv"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.i") === col("y.i") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.f").as("fa"), col("y.f").as("fb"))
      .distinct()
  }

  // Above this many distinct present fingerprints the x25 quotient
  // neighbor table stops being "small" (rows ≈ present × 137; 2¹⁴
  // fps → ~2.2M rows ≈ 50 MB broadcast) and the banded candidate
  // join wins. The 16-bit space saturates at 65536 — the guard is
  // insurance for a wider-fingerprint future, not a path this
  // corpus hits (sf0.1 has ~2.2k present fps).
  private val QuotientMaxFps = 1 << 14

  /** x25's pair generation: (doc_a, doc_b, hamming), doc_a < doc_b,
    * Hamming(fa, fb) ≤ 2, UNORDERED. Quotient path when the present
    * fingerprint count is small (the 16-bit norm): the Hamming-≤2
    * fp neighbor table is built distributedly (present × 137 masks,
    * semi-joined to present — bounded by fp space, not corpus) and
    * broadcast into two equi-joins. Past `maxQuotientFps` (spec knob;
    * wider-fingerprint insurance) it falls back to the banded
    * candidate join — identical results, pinned by spec. */
  // Guard statistic for the quotient-vs-banded choice: the distinct
  // present-fingerprint count is stable per corpus version, so it is
  // computed once per version (same fingerprint-keyed lifecycle as the
  // stored indexes, cost in the bench `build` section) instead of
  // paying a corpus scan per invocation just to pick a path.
  private val presentFpCache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[java.lang.Long]]()

  private[graft] def simhashPairs(s: SparkSession, d: String,
      maxQuotientFps: Long = QuotientMaxFps): DataFrame = {
    val fps = simhashFps(s, d)
    val presentDf = fps.select(col("f")).distinct()
    val nPresent: Long = StoredIndexes.versionedValue(presentFpCache, d,
      "documents.parquet", "graft-simhash-present") { presentDf.count() }
    if (nPresent > maxQuotientFps)
      simhashCandidates(s, d)
        .withColumn("hamming",
          bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int"))
        .filter(col("hamming") <= 2)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    else {
      val masks = Seq(0L) ++ (0 until 16).map(1L << _) ++
        (for (i <- 0 until 16; j <- i + 1 until 16)
          yield (1L << i) | (1L << j))
      val maskArr = array(masks.map(m =>
        struct(lit(m).as("m"),
          lit(java.lang.Long.bitCount(m)).as("h"))).toIndexedSeq: _*)
      val nbr = presentDf.select(col("f").as("fa"),
          explode(maskArr).as("mk"))
        .select(col("fa"), col("fa").bitwiseXOR(col("mk.m")).as("fb"),
          col("mk.h").as("hamming"))
        .join(presentDf.select(col("f").as("fb")), Seq("fb"), "left_semi")
      fps.as("x")
        .join(broadcast(nbr), col("x.f") === col("fa"))
        .join(fps.as("y"),
          col("y.f") === col("fb") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("hamming").cast("int").as("hamming"))
    }
  }

  /** Near-dup clustering on the FINGERPRINT QUOTIENT graph (the x34
    * engine, factored out so the ingestion flow can recompute the
    * dedup-decision table per micro-batch over a TableStore corpus):
    * components of the doc pair graph (Hamming(fa, fb) ≤ 2) are
    * exactly the preimages of components of the ≤2¹⁶-node fingerprint
    * graph — one narrow fingerprint scan + one bounded aggregate feed
    * a driver union-find, docs pick up (cluster, canonical) through
    * one broadcast join. Returns (doc_id, cluster, canonical) for
    * every doc participating in ≥1 pair, UNORDERED — callers add
    * their own determinism ORDER BY. */
  private[graft] def quotientClusters(s: SparkSession,
      fps: DataFrame): DataFrame = {
    // ≤65536 rows: per-fingerprint doc count + min doc_id
    val byFp = fps.groupBy(col("f"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("minDoc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val present = byFp.map(_._1).toSet
    // driver union-find over the fingerprint quotient graph
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: Long, b: Long): Unit = {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val masks = (0 until 16).map(1L << _) ++
      (for (i <- 0 until 16; j <- i + 1 until 16)
        yield (1L << i) | (1L << j))
    byFp.foreach { case (f, _, _) =>
      masks.foreach { m =>
        val nb = f ^ m
        if (f < nb && present.contains(nb)) union(f, nb)
      }
    }
    // a doc is in the output iff its fp pairs with some doc: its
    // fp holds ≥2 docs, or its fp has a present Hamming-≤2
    // neighbor (i.e. it was unioned)
    val eligible = byFp.filter { case (f, cnt, _) =>
      cnt >= 2 || parent.contains(f)
    }
    // component cluster label = min doc_id across member fps
    val clusterOf = eligible
      .groupBy { case (f, _, _) =>
        if (parent.contains(f)) find(f) else f
      }
      .values.flatMap { members =>
        val cluster = members.iterator.map(_._3).min
        members.iterator.map { case (f, _, _) => (f, cluster) }
      }.toSeq
    import s.implicits._
    val compDf = clusterOf.toDF("f", "cluster")
    fps.join(broadcast(compDf), Seq("f"))
      .select(col("doc_id"), col("cluster"),
        (col("doc_id") === col("cluster")).as("canonical"))
  }

  /** Distributed connected components over an undirected pair graph
    * (x34; exposed for DedupHotPathSpec's chain/star cases): min-label
    * propagation with pointer jumping (path doubling → O(log diameter)
    * supersteps) and per-superstep parquet materialization — the pair
    * graph is written once and every superstep reads the previous
    * labels back, keeping lineage flat (the Pregel pattern). Labels
    * only ever DECREASE, so the label sum is a strictly decreasing
    * convergence witness — one tiny aggregate per superstep instead of
    * a change-detection join. Returns (doc_id, cluster) for every node
    * appearing in `pairs`, cluster = min doc_id of the component. */
  def connectedComponents(s: SparkSession, pairsIn: DataFrame): DataFrame = {
    val tmp = graft.tables.TempDirs.scratch("graft-cc")
    pairsIn.write.parquet(s"$tmp/pairs")
    val pairs = s.read.parquet(s"$tmp/pairs")
    val Seq(a, b) = pairs.columns.toSeq
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
    var labPath = s"$tmp/lab0"
    // seed with the first propagation folded in: label₀ =
    // min(self, min direct neighbor) — one whole superstep round-trip
    // cheaper than seeding with self and iterating. Label tables are
    // written at natural shuffle parallelism (the groupBy's post-AQE
    // partitioning): a fixed-width coalesce here would propagate up
    // the plan and cap the reduce stage of every superstep — the one
    // constant that must NOT appear in an iterative operator's
    // scaling law. AQE already collapses small post-shuffle outputs,
    // so the small-files concern is handled without touching the plan.
    edges.groupBy(col("dst").as("doc_id"))
      .agg(min(col("src")).as("__nmin"))
      .select(col("doc_id"),
        least(col("doc_id"), col("__nmin")).as("cluster"))
      .write.parquet(labPath)
    def labSum(path: String): Long = {
      val r = s.read.parquet(path).agg(sum(col("cluster"))).collect().head
      if (r.isNullAt(0)) 0L else r.getLong(0) // sum of an empty graph
    }
    var prevSum = labSum(labPath)
    var converged = edges.isEmpty
    var i = 0
    while (!converged) {
      val lab = s.read.parquet(labPath)
      val nextPath = s"$tmp/lab${i + 1}"
      superstep(edges, lab).write.parquet(nextPath)
      val sum2 = labSum(nextPath)
      converged = sum2 == prevSum
      prevSum = sum2
      // the previous superstep's labels are dead once the next is
      // durable — delete eagerly so a long iteration holds at most
      // two label tables on disk (the scratch root itself is removed
      // at JVM exit, after the returned frame has been consumed)
      graft.tables.TempDirs.delete(labPath)
      labPath = nextPath
      i += 1
    }
    s.read.parquet(labPath)
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

  private val verifiedSql =
    "sz AS (SELECT doc_id, s, len(s) AS n FROM sh), " +
      "j AS (SELECT doc_a, doc_b, len(list_intersect(sa.s, sb.s)) AS inter, " +
      "sa.n AS na, sb.n AS nb FROM cand JOIN sz sa ON sa.doc_id = doc_a " +
      "JOIN sz sb ON sb.doc_id = doc_b) " +
      "SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
      s"FROM j WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $Threshold " +
      "ORDER BY doc_a, doc_b"

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
      s"WITH $shingledSql, " +
        "ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh), " +
        "dfreq AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g), " +
        "rk AS (SELECT doc_id, n, ex.g, ROW_NUMBER() OVER " +
        "(PARTITION BY doc_id ORDER BY dfreq.df, ex.g) AS r " +
        "FROM ex JOIN dfreq ON ex.g = dfreq.g), " +
        "pfx AS (SELECT doc_id, g FROM rk WHERE r <= n // 5 + 1), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM pfx a JOIN pfx b ON a.g = b.g AND a.doc_id < b.doc_id), " +
        verifiedSql) {
      (s, d) =>
        // candidates from the STORED prefix index (built once per
        // corpus version, shared machinery with x8/x36): the
        // double-window df ranking never runs at probe time. The
        // exact verify recomputes the shingle arrays in one codegen
        // scan of the text — cheaper than reading materialized arrays
        // back (see the ShingleIndex header)
        verified(candidatePairs(ShingleIndex.forDir(s, d).load("pfx3")),
          shingledFrom(table(s, d, "documents")), spread = true, prune = true)
    },

    // SimHash Hamming-ball near-dup (ROADMAP §5): pairs of documents
    // whose 16-bit SimHash fingerprints differ in ≤ 2 bits.
    //
    // QUOTIENT formulation (r8, same insight as x34): the pair
    // predicate depends only on the fingerprints, and the fingerprint
    // space is ≤2¹⁶ at any corpus scale — so the candidate structure
    // is a NEIGHBOR TABLE of present fingerprint pairs within
    // Hamming ≤ 2, built DISTRIBUTEDLY (r9): present fps × the 137
    // masks exploded, semi-joined back to the present set — nothing
    // corpus-scale and nothing materialized on the driver (the r8
    // version built ~present×137 boxed tuples driver-side). Docs pick
    // up their pairs through two broadcast joins against it: no
    // banding explode, no candidate shuffle, no distinct — each
    // unordered doc pair emits exactly once via the doc_a < doc_b
    // guard because (fa, fb) neighbor rows are unique. A SATURATION
    // GUARD (r9) falls back to the banded simhashCandidates path when
    // the present-fp count would make the broadcast neighbor table
    // large (a wider-fingerprint future, not this 16-bit one): the
    // two paths are result-identical (DedupHotPathSpec pins it), the
    // banded one just shuffles candidates instead of broadcasting
    // neighbors. Wall-clock at sf0.1 is OUTPUT-bound — 1.08M
    // qualifying pairs through the mandated total ORDER BY.
    Query("x25_simhash_neardup",
      s"WITH $simhashCandSql " +
        "SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming " +
        "FROM cand WHERE bit_count(xor(fa, fb)) <= 2 ORDER BY doc_a, doc_b") {
      (s, d) => simhashPairs(s, d).orderBy("doc_a", "doc_b")
    },

    // near-dup CLUSTERING — the step that turns pairwise near-dup
    // detection into an actual dedup decision: connected components
    // over the x25 Hamming-ball pair graph, cluster label = min doc_id
    // in the component, `canonical` marks the one representative a
    // pipeline would KEEP (every other row is the drop list).
    //
    // QUOTIENT formulation (r8): the pair relation is defined purely
    // on the 16-bit fingerprints (hamming(fa, fb) ≤ 2), so components
    // of the document graph are exactly the preimages of components of
    // the FINGERPRINT graph — which has at most 2¹⁶ nodes at ANY
    // corpus scale. One narrow codegen scan + one ≤65536-row aggregate
    // (per-fp doc count and min doc_id) feed a driver-side union-find
    // over the quotient (each fp probes its 136 Hamming-≤2 neighbor
    // masks); docs then pick up (cluster, canonical) through one
    // broadcast join. No pair graph is ever materialized and nothing
    // iterates — the iterative pointer-jumping operator
    // (connectedComponents above) remains the general-purpose path for
    // graphs whose label space CANNOT be quotiented to driver size,
    // pinned by DedupHotPathSpec. The oracle recomputes the same
    // fixpoint via recursive reachability (feasible at the sf0.01
    // gate; tools/check_sf01.py replays the quotient union-find
    // independently at sf0.1). 5.1 → 0.6 s at sf0.1.
    Query("x34_dedup_clusters",
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id) " +
        "SELECT doc_id, cluster, doc_id = cluster AS canonical FROM cc " +
        "ORDER BY cluster, doc_id") {
      (s, d) =>
        quotientClusters(s, simhashFps(s, d)).orderBy("cluster", "doc_id")
    },

    // MinHash + LSH near-dup: 8 32-bit minhash signatures (md5-hex
    // chunk minima), 4 bands of 2, bucket-join candidates,
    // exact-Jaccard verification. MinHashBands computes all 8
    // signatures + 4 band strings in one codegen pass per document.
    Query("x8_minhash_lsh", {
      val sigs = Seq.tabulate(8) { k =>
        val (src, off) = if (k < 4) ("md5(g)", 8 * k + 1) else ("md5('~' || g)", 8 * (k - 4) + 1)
        s"list_aggregate(list_transform(s, g -> substr($src, $off, 8)), 'min')"
      }
      val bandVals = sigs.grouped(2).zipWithIndex.map { case (Seq(s1, s2), i) =>
        s"'$i|' || $s1 || $s2"
      }.mkString(", ")
      s"WITH $shingledSql, " +
        s"bands AS (SELECT doc_id, unnest([$bandVals]) AS bv FROM sh), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a " +
        "JOIN bands b ON a.bv = b.bv AND a.doc_id < b.doc_id), " +
        verifiedSql
    }) {
      (s, d) =>
        // candidate buckets from the STORED band signatures (one
        // MinHashBands pass at index build, not per query); the exact
        // verify recomputes the shingle arrays in one codegen scan
        val bands = ShingleIndex.forDir(s, d).load("bands3")
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        verified(cand, shingled(s, d))
    },

    // canonical-corpus materialization — the dedup family's actual
    // OUTPUT: the training corpus after near-dup removal. Composes
    // x34's quotient clustering into an anti-join: a document is kept
    // iff it is its cluster's canonical member (min doc_id) or it has
    // no near-dup at all (absent from the pair graph — including
    // null-text docs, which cannot pair). Scale shape: the cluster
    // frame comes from the ≤2¹⁶-fp quotient (corpus-size-independent
    // candidate structure), the drop list is ∝ duplicate docs, and
    // the anti-join shuffles on doc_id (AQE broadcasts it while
    // small). Narrow metadata projection — re-attaching full text is
    // the same join, just wider.
    Query("x40_dedup_canonical",
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id), " +
        "dropped AS (SELECT doc_id FROM cc WHERE doc_id != cluster) " +
        "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d " +
        "LEFT JOIN dropped x ON d.doc_id = x.doc_id " +
        "WHERE x.doc_id IS NULL ORDER BY d.doc_id") {
      (s, d) =>
        val dropped = quotientClusters(s, simhashFps(s, d))
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
    // Scale: the clustering is x34's quotient machinery (one narrow
    // fingerprint scan + ≤2^16-row aggregate + broadcast join back);
    // the assignment adds one md5 per doc and two bounded rollups. The
    // anchor frame is referenced twice (per-split rollup + straddle
    // aggregate) — both are rollups of the same broadcast-joined
    // narrow scan, nothing corpus-sized shuffles twice.
    Query("x118_cluster_split", {
      val anchorBkt = Sql.md5Bits16("md5(CAST(anchor AS VARCHAR))") + " % 100"
      val naiveBkt = Sql.md5Bits16("md5(CAST(doc_id AS VARCHAR))") + " % 100"
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id), " +
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
          .join(quotientClusters(s, simhashFps(s, d))
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
    // clusters come from the x34 quotient machinery (one narrow
    // fingerprint scan + bounded aggregate + broadcast join); the
    // quality key tokenizes ONLY clustered docs (the corpus joins
    // cluster ids BEFORE the distinct-token map, so unclustered text
    // never tokenizes), and the election is one max(struct) hash
    // aggregate — map-side combined, one row per cluster out.
    Query("x120_quality_canonical",
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id), " +
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
        val cl = quotientClusters(s, simhashFps(s, d))
          .select(col("doc_id"), col("cluster"))
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
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id), " +
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
        val cl = quotientClusters(s, simhashFps(s, d))
          .select(col("doc_id"), col("cluster"))
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
    // tiebreak). The cap is the scale guard, found by measurement:
    // the uncapped 3–6 set at sf0.1 is 2.5M pairs because the 16-bit
    // fingerprint space saturates and band buckets go quadratic — a
    // real miner keeps O(k) negatives per anchor, and the rank-≤-k
    // filter compiles to WindowGroupLimit (map-local top-k before the
    // doc_a shuffle, the x80 shape), so output is O(docs·k) at any
    // corpus size. Positives ride the quotient machinery + two
    // fingerprint joins; negatives the banded candidate equi-join
    // (one band-key shuffle, never all-pairs).
    Query("x124_contrastive_pairs",
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id), " +
        "pos AS (SELECT cc.cluster AS doc_a, cc.doc_id AS doc_b, " +
        "'pos' AS label, CAST(bit_count(xor(fa.f, fb.f)) AS BIGINT) AS hamming " +
        "FROM cc JOIN fp fa ON fa.doc_id = cc.cluster " +
        "JOIN fp fb ON fb.doc_id = cc.doc_id WHERE cc.doc_id <> cc.cluster), " +
        // same-COMPONENT pairs can reach Hamming 3–6 through closure
        // (a–b–c chains) — they are positives by definition and must
        // never mine as negatives (review-caught: 3 double-labeled
        // pairs on the sf0.01 fixture before this filter)
        "negall AS (SELECT doc_a, doc_b, " +
        "CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming FROM cand " +
        "LEFT JOIN cc ca ON ca.doc_id = cand.doc_a " +
        "LEFT JOIN cc cb ON cb.doc_id = cand.doc_b " +
        "WHERE bit_count(xor(fa, fb)) BETWEEN 3 AND 6 " +
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
        val fps = simhashFps(s, d)
        val cl = quotientClusters(s, fps).select(col("doc_id"), col("cluster"))
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
        val neg = simhashCandidates(s, d)
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
    // publishes: docs and character mass surviving each gate, gates
    // applied as intersecting FULL-CORPUS keep sets (each stage uses
    // the exact semantics of its declared query, not a re-derivation
    // on a filtered corpus): exact text dedup (min doc_id per text —
    // q21's uniq), near-dup canonical retention (x40's kept set),
    // x121's source cap. Scale: three bounded keep columns attach to
    // one narrow corpus frame (a map-side-combined text aggregate, the
    // quotient drop list, the cap window), then ONE aggregate emits
    // all four stages — no per-stage corpus rescans.
    Query("x126_retention_funnel",
      s"WITH RECURSIVE $simhashCandSql, " +
        "pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(fa, fb)) <= 2), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach(doc_id, r) AS (" +
        "SELECT s, s FROM (SELECT DISTINCT s FROM edges) " +
        "UNION " +
        "SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id), " +
        "cc AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id), " +
        "dropped AS (SELECT doc_id FROM cc WHERE doc_id <> cluster), " +
        "ex AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
        "m AS (SELECT doc_id, source, n_chars, " +
        "md5(CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
        s"cap AS (SELECT CAST(SUM(n_chars) AS BIGINT) * 5 // 100 " +
        "AS cap FROM m), " +
        "cw AS (SELECT doc_id, SUM(n_chars) OVER (" +
        "PARTITION BY source ORDER BY h, doc_id) AS cum FROM m), " +
        "flags AS (SELECT d.doc_id, d.n_chars, " +
        "(e.doc_id IS NOT NULL) AS ek, (x.doc_id IS NULL) AS nk, " +
        "(cw.cum <= (SELECT cap FROM cap)) AS ck FROM documents d " +
        "LEFT JOIN ex e ON e.doc_id = d.doc_id " +
        "LEFT JOIN dropped x ON x.doc_id = d.doc_id " +
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
        "UNION ALL SELECT 3, 'source_cap', " +
        "CAST(SUM(CASE WHEN ek AND nk AND ck THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(SUM(CASE WHEN ek AND nk AND ck THEN n_chars ELSE 0 END) AS BIGINT) FROM flags " +
        "ORDER BY stage_id") {
      (s, d) =>
        val docs = table(s, d, "documents")
        val exKeep = docs.groupBy("text")
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), lit(true).as("ek"))
        val dropped = quotientClusters(s, simhashFps(s, d))
          .filter(col("doc_id") =!= col("cluster"))
          .select(col("doc_id"), lit(true).as("dropped"))
        val capKeep = TextQueries.sourceCapScoresFor(s, d)
          .select(col("doc_id"), col("kept").as("ck"))
        val flags = docs.select(col("doc_id"), col("n_chars"))
          .join(exKeep, Seq("doc_id"), "left_outer")
          .join(dropped, Seq("doc_id"), "left_outer")
          .join(capKeep, Seq("doc_id"))
          .select(col("n_chars"),
            coalesce(col("ek"), lit(false)).as("ek"),
            not(coalesce(col("dropped"), lit(false))).as("nk"),
            col("ck"))
        def stage(cond: org.apache.spark.sql.Column) = struct(
          sum(when(cond, 1L).otherwise(0L)).as("n_docs"),
          sum(when(cond, col("n_chars")).otherwise(0L)).as("chars"))
        flags.agg(
            stage(lit(true)).as("s0"), stage(col("ek")).as("s1"),
            stage(col("ek") && col("nk")).as("s2"),
            stage(col("ek") && col("nk") && col("ck")).as("s3"))
          .select(explode(array(
            struct(lit(0L).as("stage_id"), lit("all").as("stage"),
              col("s0.n_docs"), col("s0.chars")),
            struct(lit(1L).as("stage_id"), lit("exact_dedup").as("stage"),
              col("s1.n_docs"), col("s1.chars")),
            struct(lit(2L).as("stage_id"), lit("near_dedup").as("stage"),
              col("s2.n_docs"), col("s2.chars")),
            struct(lit(3L).as("stage_id"), lit("source_cap").as("stage"),
              col("s3.n_docs"), col("s3.chars")))).as("r"))
          .select(col("r.stage_id"), col("r.stage"), col("r.n_docs"),
            col("r.chars"))
          .orderBy("stage_id")
    })
}
