package graft.operators

import graft.Query
import graft.functions.TextFns
import graft.functions.TextFns.Sql
import graft.sources.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation composites (r15 additions to the LLM-pipeline
 * surface): hybrid lexical+dense retrieval, DSIR-style importance
 * resampling for data selection, and token-window chunking.
 *
 * All three COMPOSE existing scale-audited machinery instead of
 * introducing new corpus passes:
 *  - x128 fuses x94's BM25 scorer (O(term occurrences)) with x11's
 *    stored-SRP-index probe (O(query buckets)) — the fusion itself
 *    touches only two ≤20-row ranked frames;
 *  - x129/x134 probe the STORED per-doc weight table ([[DsirIndex]],
 *    r16): the one-tokenize-scan build (64-row log-ratio table
 *    derived from the same aggregate, ReuseExchange-deduped,
 *    broadcast back — no token shuffle) runs once per corpus
 *    version; each probe is a narrow scan + TakeOrdered;
 *  - x131 is a pure narrow per-document map (sequence + slice +
 *    fingerprint) — zero shuffles beyond the output sort.
 */
object CurationQueries {

  // ------------------------------------------------- x128 hybrid retrieval
  // Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09 — the
  // standard hybrid-search combiner in Elasticsearch/OpenSearch/
  // Vespa): rrf(d) = Σ_arms 1/(60 + rank_arm(d)) over the lexical
  // (BM25, x94's scorer verbatim) and dense (stored-SRP-probe exact
  // cosine, x11's frame verbatim) top-20 rankings. Embeddings are
  // row-aligned with documents (vec_id ≡ doc_id — the corpus's
  // embedding of that document), so the fusion join is an id
  // equi-join of two 20-row frames. Ranks are ROW_NUMBERs over
  // (6-rounded score DESC, id) — total orders, so ranks, the rank-20
  // admission boundary and the final top-10 are all tie-proof; the
  // rrf sum is two doubles from exact integer ranks, deterministic
  // bit-for-bit.
  private val RrfK = 60
  private val ArmK = 20

  private val x128Sql =
    s"WITH ${TextQueries.bm25ScoreSql}, ${VectorQueries.annCosSql}, " +
      "lex AS (SELECT doc_id, ROW_NUMBER() OVER " +
      "(ORDER BY round(sco, 6) DESC, doc_id) AS lex_rank FROM " +
      s"(SELECT * FROM sc ORDER BY round(sco, 6) DESC, doc_id LIMIT $ArmK)), " +
      "den AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER " +
      "(ORDER BY cos DESC, vec_id) AS den_rank FROM " +
      s"(SELECT * FROM res ORDER BY cos DESC, vec_id LIMIT $ArmK)), " +
      "f AS (SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id, " +
      "l.lex_rank, r.den_rank, " +
      s"COALESCE(CAST(1 AS DOUBLE) / ($RrfK + l.lex_rank), 0) + " +
      s"COALESCE(CAST(1 AS DOUBLE) / ($RrfK + r.den_rank), 0) AS rrf " +
      "FROM lex l FULL OUTER JOIN den r ON l.doc_id = r.doc_id) " +
      "SELECT doc_id, lex_rank, den_rank, round(rrf, 6) AS rrf FROM f " +
      "ORDER BY round(rrf, 6) DESC, doc_id LIMIT 10"

  /** The fused top-10 frame — exposed for CurationSpec's arm-consistency
    * pins. */
  private[graft] def hybridFused(s: SparkSession, d: String): DataFrame =
    rrfFused(TextQueries.bm25Scored(s, d),
      VectorQueries.annCosineFrame(s, d)
        .select(col("vec_id").as("doc_id"), col("cos")))
      .limit(10)

  /** x128's RRF combiner factored over ANY two scored arms — the
    * parameterized hybrid endpoint (`GET /search?q=&like=`) fuses the
    * terms-bound BM25 arm with the vec_id-bound IVF arm through this
    * SAME definition. `lex` is (doc_id, score), `den` is (doc_id,
    * cos); each arm is TopK'd to ArmK BEFORE ranking, so the
    * row_number windows and the full-outer fusion join run over
    * ≤ ArmK rows at any corpus scale (x89's bounded-window contract).
    * Returns the fused frame ordered by (rrf desc, doc_id); callers
    * apply their own limit. */
  private[graft] def rrfFused(lex0: DataFrame, den0: DataFrame): DataFrame = {
    val lex = lex0
      .orderBy(col("score").desc, col("doc_id")).limit(ArmK)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val den = den0
      .orderBy(col("cos").desc, col("doc_id")).limit(ArmK)
      .withColumn("den_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("den_rank"))
    lex.join(den, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("den_rank")), lit(0.0)))
      .select(col("doc_id"), col("lex_rank"), col("den_rank"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  // --------------------------------------------------- x129 DSIR selection
  // Data Selection with Importance Resampling (Xie et al., NeurIPS'23):
  // score each raw document by how much more likely its hashed n-gram
  // features are under a TARGET distribution than under the raw pool,
  // w(doc) = Σ_tokens log(p_target[bucket]/p_raw[bucket]), and keep the
  // top-weighted docs. Features are hashed UNIGRAM buckets
  // (md5Bits16 % 64 — the paper's hashed-ngram generative model with
  // B=64), target = the corpus's 'en' documents, both distributions
  // add-one smoothed. Per-bucket log-ratios are exact-integer-ratio
  // logs; per-doc weights sum ≤64 (count × ratio) terms and round to 4
  // (the x93/x97 log-family contract), ranking ties broken by doc_id.
  private val DsirB = 64

  /** The DSIR TARGET distribution — a build knob on [[DsirIndex]]
    * (r16 verdict ask #5: x129 hardcoded target = the corpus's 'en'
    * docs; data selection toward an ARBITRARY target domain is the
    * actual operator DSIR describes). `key` names the variant's
    * per-(corpus version, target) cache entry and stored tables (the
    * IvfParams pattern — tuning experiments never evict the serving
    * build); `pred` marks which corpus rows define the target
    * distribution, evaluated over (doc_id, lang). */
  final case class DsirTarget(key: String,
      pred: org.apache.spark.sql.Column)
  object DsirTarget {
    /** Target = the corpus's docs in language `l` (x129's shape). */
    def lang(l: String): DsirTarget =
      DsirTarget(s"lang=$l", col("lang") === l)
    /** Target = an explicit seed doc-id set — "select raw docs like
      * THESE", the curated-seed workflow of the DSIR paper. */
    def docIds(ids: Seq[Long]): DsirTarget =
      DsirTarget(s"docs=${ids.sorted.mkString(",")}",
        col("doc_id").isin(ids: _*))
    val Default: DsirTarget = lang("en")
  }

  /** DuckDB CTE chain ending in `w(doc_id, wt)` — the weight pipeline
    * for an arbitrary SQL target predicate (over `doc_id`/`lang`),
    * shared by x129/x134 (the default 'en' target) and x143 (a
    * non-default target). */
  private def x129CoreSqlFor(targetPred: String) =
    "WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk " +
      "FROM documents WHERE text IS NOT NULL), " +
      "h AS (SELECT doc_id, lang, md5(tk) AS m FROM t), " +
      s"b AS (SELECT doc_id, lang, ${Sql.md5Bits16("m")} % $DsirB AS bk FROM h), " +
      "dc AS (SELECT doc_id, lang, bk, COUNT(*) AS c FROM b GROUP BY 1, 2, 3), " +
      s"bc AS (SELECT bk, SUM(CASE WHEN $targetPred THEN c ELSE 0 END) AS ct, " +
      "SUM(c) AS cr FROM dc GROUP BY 1), " +
      "tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM bc), " +
      s"lr AS (SELECT bk, ln((CAST(ct + 1 AS DOUBLE) / (tt + $DsirB)) / " +
      s"(CAST(cr + 1 AS DOUBLE) / (tr + $DsirB))) AS lr FROM bc, tot), " +
      "w AS (SELECT dc.doc_id, SUM(dc.c * lr.lr) AS wt FROM dc " +
      "JOIN lr ON dc.bk = lr.bk GROUP BY 1)"

  private val x129CoreSql = x129CoreSqlFor("lang = 'en'")

  private val x129Sql =
    x129CoreSql +
      " SELECT doc_id, round(wt, 4) AS dsir_weight FROM w " +
      "ORDER BY round(wt, 4) DESC, doc_id LIMIT 25"

  /** (doc_id, lang, bk, c): one tokenize scan to per-doc hashed-bucket
    * counts — the single corpus pass both x129 stages hang off.
    *
    * r17: the per-TOKEN explode + md5-hex arithmetic + (doc, lang, bk)
    * hash aggregate is now ONE codegen pass per document
    * ([[graft.functions.expressions.HashedBucketCounts]] — the
    * simhash-family md5 parity: first two digest bytes ==
    * md5Bits16's 4-hex-digit arithmetic), exploded at B=64 rows per
    * doc instead of one row per token. Rows entering the aggregation
    * machinery drop from Σ n_tokens to 64·docs; the c>0 filter
    * reproduces the old groupBy's support exactly (absent buckets
    * never had a row). The trailing groupBy folds rows that are
    * already unique — it exists so dc still ENDS in an exchange, the
    * reuse point CurationSpec pins (lr and the weight join must share
    * ONE md5 pass, not recompute it per reference). */
  private def dsirDocBuckets(s: SparkSession, d: String): DataFrame =
    TextQueries.spreadScan(s, table(s, d, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        posexplode(graft.functions.expressions.TextExpressions
          .hashed_bucket_counts(TextFns.tokens(col("text")), DsirB))
          .as(Seq("bk", "c")))
      .filter(col("c") > 0)
      .groupBy("doc_id", "lang", "bk")
      .agg(sum(col("c")).as("c"))

  /** The full (doc_id, dsir_weight) frame before top-k, served from
    * the STORED weight table ([[DsirIndex]] — what x129/x134 probe) —
    * exposed for CurationSpec's independent-recompute pin, which
    * recomputes every weight driver-side from raw text and therefore
    * verifies the stored table, not just the build plan. */
  private[graft] def dsirWeights(s: SparkSession, d: String,
      target: DsirTarget = DsirTarget.Default): DataFrame =
    DsirIndex.forDir(s, d, target).load("weights")
      .select(col("doc_id"), round(col("wt"), 4).as("dsir_weight"))

  /** (doc_id, wt): the unrounded weight frame — the [[DsirIndex]]
    * BUILD plan (one tokenize scan, 64-row ratio table broadcast
    * back), run once per (corpus version, target), never inside a
    * probe. */
  private[graft] def dsirWeightsRaw(s: SparkSession, d: String,
      target: DsirTarget = DsirTarget.Default): DataFrame = {
    val dc = dsirDocBuckets(s, d)
    // bucket table: ≤ DsirB rows by construction, derived from dc's
    // OWN aggregate (ReuseExchange dedupes the exchange — x94's
    // tf/df pattern) and broadcast back; totals are a window over the
    // bounded bucket frame
    val wAll = Window.partitionBy()
    val lr = dc.groupBy("bk")
      .agg(sum(when(target.pred, col("c")).otherwise(0L)).as("ct"),
        sum(col("c")).as("cr"))
      .withColumn("tt", sum(col("ct")).over(wAll))
      .withColumn("tr", sum(col("cr")).over(wAll))
      .select(col("bk"),
        log(((col("ct") + 1).cast("double") / (col("tt") + DsirB)) /
          ((col("cr") + 1).cast("double") / (col("tr") + DsirB))).as("lr"))
    dc.join(broadcast(lr), Seq("bk"))
      .groupBy("doc_id")
      .agg(sum(col("c") * col("lr")).as("wt"))
  }

  // -------------------------------------------------- x131 token chunking
  // Fixed token windows with overlap — the RAG/training segmentation
  // transform: W=32-token chunks at stride S=24 (8-token overlap), a
  // trailing window shorter than 8 tokens is dropped (its tokens are
  // already covered by the previous chunk's overlap; chunk 0 always
  // emits so no document vanishes). Every chunk carries its token
  // count, x5's rolling-hash fingerprint (the cheap in-plan key), and
  // `ck_md5` — the 128-bit content key a chunk store dedups/retrieves
  // on: the mod-1e9+7 rolling fp's ~30-bit space birthday-collides at
  // ~4·10⁴ chunks (a few thousand docs), far below any real corpus,
  // so IDENTITY rides the md5. Pure narrow per-document arithmetic:
  // zero shuffles at any corpus scale beyond the declared output sort.
  private val ChunkW = 32
  private val ChunkS = 24
  private val ChunkMinTail = 8

  /** DuckDB CTE chain ending in `ch(doc_id, chunk_id, n_tok, fp)` —
    * the chunk pipeline shared by x131 (raw listing) and x132 (dedup
    * groups). */
  private val chunkCteSql: String =
    "t AS (SELECT doc_id, string_split(text, ' ') AS ts " +
      "FROM documents WHERE text IS NOT NULL), " +
      "n AS (SELECT doc_id, ts, len(ts) AS n FROM t), " +
      s"c AS (SELECT doc_id, n, ts, unnest(range(0, n, $ChunkS)) AS st FROM n), " +
      s"k AS (SELECT doc_id, CAST(st // $ChunkS AS BIGINT) AS chunk_id, " +
      s"list_slice(ts, st + 1, least(st + $ChunkW, n)) AS ck FROM c " +
      s"WHERE st = 0 OR n - st >= $ChunkMinTail), " +
      "ch AS (SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_tok, " +
      s"${Sql.fingerprint("ck")} AS fp, " +
      "md5(array_to_string(ck, ' ')) AS ck_md5 FROM k)"

  private val x131Sql =
    s"WITH $chunkCteSql " +
      "SELECT doc_id, chunk_id, n_tok, fp, ck_md5 FROM ch " +
      "ORDER BY doc_id, chunk_id"

  /** The chunk frame (doc_id, chunk_id, n_tok, fp) over ANY
    * (doc_id, text) frame — x131's pipeline; the ingest flow maintains
    * the stored `chunks` table with it (chunks are pure per-doc
    * derivations of an append-only corpus, so incremental maintenance
    * is an idempotent append of each batch's own chunks). */
  private[graft] def chunkRowsOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .withColumn("n", size(col("ts")))
      .select(col("doc_id"), col("n"), col("ts"),
        posexplode(sequence(lit(0), col("n") - 1, lit(ChunkS)))
          .as(Seq("chunk_id", "st")))
      .filter(col("st") === 0 || col("n") - col("st") >= ChunkMinTail)
      .withColumn("ck", slice(col("ts"), col("st") + 1, lit(ChunkW)))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("ck")).cast("long").as("n_tok"),
        TextFns.fingerprint(col("ck")).as("fp"),
        md5(concat_ws(" ", col("ck"))).as("ck_md5"))

  /** [[chunkRowsOf]] over the corpus table — exposed for
    * CurationSpec's coverage/overlap invariants. */
  private[graft] def chunkFrame(s: SparkSession, d: String): DataFrame =
    chunkRowsOf(table(s, d, "documents"))

  /** (doc_id, chunk_id, dl): every chunk's id and token length derived
    * from each doc's token COUNT alone — no chunk-array
    * materialization, no slices. Must stay row-identical to
    * [[chunkRowsOf]]'s (doc_id, chunk_id, n_tok) (CurationSpec pins
    * it). */
  private[graft] def chunkMeta(s: SparkSession, d: String): DataFrame =
    chunkMetaOf(table(s, d, "documents"))

  /** [[chunkMeta]] over ANY (doc_id, text) frame — the
    * [[PostingsIndex]] build and ingest fold both derive from it. */
  private[graft] def chunkMetaOf(docs: DataFrame): DataFrame =
    chunkMetaFromTokens(docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts")))

  /** [[chunkMetaOf]] over an already-tokenized (doc_id, ts)
    * projection — so a caller holding one persisted tokenize pass
    * (the PostingsIndex ingest rule) never pays a second. */
  private[graft] def chunkMetaFromTokens(tk: DataFrame): DataFrame =
    tk.select(col("doc_id"), size(col("ts")).as("n"))
      .select(col("doc_id"), col("n"), explode(sequence(lit(0L),
        greatest(floor((col("n") - ChunkMinTail).cast("double") / ChunkS)
          .cast("long"), lit(0L)))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(ChunkW), col("n") - col("chunk_id") * ChunkS).as("dl"))

  /** Chunk-granular postings of ANY (doc_id, text) frame — the
    * [[PostingsIndex]] `cpostings` build plan: one posexplode pass,
    * each occurrence's containing chunks by x133's position
    * arithmetic (lo/hi window ids, ≤ ⌈W/S⌉ = 2 per position),
    * tail-pruned windows dropped by the SAME max-chunk-id rule
    * [[chunkMetaOf]] enumerates (pure per-row arithmetic here — no
    * join needed, because the doc's token count rides the row), dl by
    * chunkMeta's formula. Aggregated to per-(doc, chunk, term)
    * frequency — exactly the tf frame x133's scorer used to derive
    * from its per-query corpus explode + chunkMeta join. */
  private[graft] def chunkPostingsOf(docs: DataFrame): DataFrame =
    chunkPostingsFromTokens(docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts")))

  /** [[chunkPostingsOf]] over an already-tokenized (doc_id, ts)
    * projection (one shared tokenize pass — see
    * [[chunkMetaFromTokens]]). */
  private[graft] def chunkPostingsFromTokens(tk: DataFrame): DataFrame = {
    val lo = greatest(
      (floor((col("p0") - ChunkW).cast("double") / ChunkS) + 1)
        .cast("long"), lit(0L))
    val hi = floor(col("p0").cast("double") / ChunkS).cast("long")
    val maxCid = greatest(
      floor((col("n") - ChunkMinTail).cast("double") / ChunkS)
        .cast("long"), lit(0L))
    tk.select(col("doc_id"), size(col("ts")).as("n"),
        posexplode(col("ts")).as(Seq("p0", "token")))
      .select(col("doc_id"), col("n"), col("token"),
        explode(sequence(lo, hi)).as("chunk_id"))
      .filter(col("chunk_id") <= maxCid)
      .withColumn("dl",
        least(lit(ChunkW), col("n") - col("chunk_id") * ChunkS))
      .groupBy("token", "doc_id", "chunk_id")
      .agg(first("dl").as("dl"), count(lit(1)).cast("double").as("tf"))
  }

  /** 1-row (nch, sum_dl) chunk stats of ANY (doc_id, text) frame —
    * kept as the exact-integer (count, sum) pair so the ingest fold
    * is pure addition; the probe derives avgdl = sum_dl/nch, which is
    * bit-identical to the AVG both engines previously computed (one
    * exact-long sum, one final double division). coalesce: an empty
    * batch folds as zeros. */
  private[graft] def chunkStatsOf(docs: DataFrame): DataFrame =
    chunkMetaOf(docs).agg(count(lit(1)).as("nch"),
      coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))

  /** [[chunkStatsOf]] over an already-tokenized (doc_id, ts)
    * projection. */
  private[graft] def chunkStatsFromTokens(tk: DataFrame): DataFrame =
    chunkMetaFromTokens(tk).agg(count(lit(1)).as("nch"),
      coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))

  /** (doc_id, chunk_id, score): x133's chunk-granular BM25 scorer for
    * an ARBITRARY term list — the parameterized retrieval surface
    * (`GET /search?unit=chunk`). r17: probes the STORED chunk
    * postings ([[PostingsIndex]] `cpostings`/`cstats`) instead of
    * re-tokenizing the corpus per invocation — the q-terms push into
    * the token-clustered parquet scan, so a novel query costs
    * O(matching postings), never a corpus pass (the r16 verdict's
    * serving-tier scale-killer). Score formula, rounding and df
    * derivation are byte-identical to the pre-index plan (the stored
    * tf/dl rows ARE the frame the old plan aggregated per query), so
    * the declared x133 still hash-matches its recompute-from-raw
    * oracle. */
  private[graft] def chunkBm25For(s: SparkSession, d: String,
      terms: Seq[String]): DataFrame = {
    val ps = PostingsIndex.forDir(s, d)
    val st = broadcast(ps.load("cstats")
      .select(col("nch").cast("double").as("nch"),
        (col("sum_dl").cast("double") / col("nch")).as("avgdl")))
    val tf = ps.load("cpostings").filter(col("token").isin(terms: _*))
    val df = tf.groupBy("token")
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), Seq("token"))
      .crossJoin(st)
      .groupBy("doc_id", "chunk_id")
      .agg(sum(log((col("nch") - col("df") + 0.5) / (col("df") + 0.5) + 1)
        * col("tf") * 2.2 /
        (col("tf") +
          (lit(0.25) + col("dl") * 0.75 / col("avgdl")) * 1.2))
        .as("sco"))
      .select(col("doc_id"), col("chunk_id"),
        round(col("sco"), 6).as("score"))
  }

  val all: Seq[Query] = Seq(

    Query("x128_hybrid_retrieval", x128Sql) {
      (s, d) => hybridFused(s, d)
    },

    Query("x129_dsir_selection", x129Sql) {
      (s, d) =>
        dsirWeights(s, d)
          .orderBy(col("dsir_weight").desc, col("doc_id"))
          .limit(25)
    },

    // DSIR's actual RESAMPLING step (the payoff x129 only scores):
    // importance resampling via the Gumbel top-k trick (Xie
    // NeurIPS'23 §2.2; Vieira '14) — sampling k docs WITHOUT
    // replacement with probability ∝ exp(weight) is exactly taking
    // the top-k of weight + Gumbel noise. The noise is DETERMINISTIC
    // (the x88/x35 doctrine: u = (md5Bits24(doc_id)+0.5)/2^24,
    // g = −ln(−ln u); 24 bits not 16 — 65536 distinct draws birthday-
    // collide at ~300 docs, handing colliding doc_ids IDENTICAL noise
    // and bending the exp(weight)-proportional distribution at corpus
    // scale), so the sample is reproducible on any engine and any
    // cluster size, and a grown corpus keeps its old draws. Keys
    // round to 6 before ranking with a doc_id tie-break —
    // cross-engine libm ulp differences cannot flip the top-k. One
    // codegen projection over the STORED weight table ([[DsirIndex]]):
    // the sampling adds NO corpus pass and no shuffle at all.
    Query("x134_dsir_resample",
      x129CoreSql +
        ", g AS (SELECT doc_id, wt, -ln(-ln((" +
        s"${Sql.md5Bits24("md5(CAST(doc_id AS VARCHAR))")} + 0.5) / 16777216.0)) " +
        "AS gum FROM w) " +
        "SELECT doc_id, round(wt, 4) AS dsir_weight, " +
        "round(wt + gum, 6) AS sample_key FROM g " +
        "ORDER BY round(wt + gum, 6) DESC, doc_id LIMIT 50") {
      (s, d) =>
        DsirIndex.forDir(s, d).load("weights")
          .withColumn("gum", -log(-log(
            (TextFns.md5Bits24(col("doc_id").cast("string")) + 0.5)
              / 16777216.0)))
          .select(col("doc_id"),
            round(col("wt"), 4).as("dsir_weight"),
            round(col("wt") + col("gum"), 6).as("sample_key"))
          .orderBy(col("sample_key").desc, col("doc_id"))
          .limit(50)
    },

    // DSIR toward a NON-DEFAULT target (r16 verdict ask #5): the same
    // importance-weight pipeline with the target distribution a build
    // knob — here 'de' instead of x129's 'en', i.e. "select raw docs
    // that look like the German sub-corpus". Same stored build-once
    // lifecycle, keyed per (corpus version, target) so this build and
    // x129's coexist; probe = one narrow stored-table scan +
    // TakeOrdered, like x129.
    Query("x143_dsir_target",
      x129CoreSqlFor("lang = 'de'") +
        " SELECT doc_id, round(wt, 4) AS dsir_weight FROM w " +
        "ORDER BY round(wt, 4) DESC, doc_id LIMIT 25") {
      (s, d) =>
        dsirWeights(s, d, DsirTarget.lang("de"))
          .orderBy(col("dsir_weight").desc, col("doc_id"))
          .limit(25)
    },

    Query("x131_chunk_windows", x131Sql) {
      (s, d) => chunkFrame(s, d).orderBy("doc_id", "chunk_id")
    },

    // Chunk-granular BM25 — retrieval at the unit RAG actually serves
    // (a CHUNK, not a whole document): top-10 (doc_id, chunk_id) for
    // the x94 query, k1/b/idf identical. r17 shape: the
    // per-(doc, chunk, term) tf/dl rows come from the STORED chunk
    // postings (PostingsIndex `cpostings` — chunk membership by
    // position ARITHMETIC at build, a position sits in ≤ ⌈W/S⌉ = 2
    // windows, tail-pruned windows dropped; chunk token arrays are
    // NEVER materialized anywhere). The term filter pushes into the
    // token-clustered index scan, so the probe is O(matching
    // postings), never a corpus pass. df is chunk-level (count of
    // chunks carrying the term), attached via the same
    // broadcast-agg-back pattern as x94; N/avgdl ride a 1-row
    // broadcast off the stored (nch, sum_dl) fold pair. Scores round
    // to 6 before ranking, ties break on (doc_id, chunk_id) —
    // tie-proof top-10.
    Query("x133_chunk_bm25", {
      "WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "dn AS (SELECT doc_id, len(ts) AS n, ts FROM t), " +
        s"cm AS (SELECT doc_id, n, unnest(range(0, " +
        s"greatest(CAST(floor(CAST(n - $ChunkMinTail AS DOUBLE) / $ChunkS) " +
        "AS BIGINT), 0) + 1)) AS chunk_id FROM dn), " +
        s"cm2 AS (SELECT doc_id, chunk_id, " +
        s"least($ChunkW, n - chunk_id * $ChunkS) AS dl FROM cm), " +
        "st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nch, " +
        "CAST(AVG(dl) AS DOUBLE) AS avgdl FROM cm2), " +
        "oc0 AS (SELECT doc_id, unnest(list_transform(range(len(ts)), " +
        "i -> {'p': i, 'tok': ts[i + 1]})) AS o FROM dn), " +
        "oc AS (SELECT doc_id, o.p AS p0, o.tok AS token FROM oc0 " +
        s"WHERE o.tok IN (${TextQueries.Bm25Terms.map("'" + _ + "'").mkString(", ")})), " +
        "cc AS (SELECT doc_id, token, unnest(range(" +
        s"greatest(CAST(floor(CAST(p0 - $ChunkW AS DOUBLE) / $ChunkS) " +
        "AS BIGINT) + 1, 0), " +
        s"CAST(floor(CAST(p0 AS DOUBLE) / $ChunkS) AS BIGINT) + 1)) " +
        "AS chunk_id FROM oc), " +
        "tf AS (SELECT cc.doc_id, cc.chunk_id, token, any_value(dl) AS dl, " +
        "CAST(COUNT(*) AS DOUBLE) AS tf FROM cc " +
        "JOIN cm2 ON cc.doc_id = cm2.doc_id AND cc.chunk_id = cm2.chunk_id " +
        "GROUP BY 1, 2, 3), " +
        "wdf AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY token) " +
        "AS DOUBLE) AS df FROM tf), " +
        "sc AS (SELECT doc_id, chunk_id, " +
        "SUM(ln((st.nch - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 / " +
        "(tf + 1.2 * (0.25 + 0.75 * dl / st.avgdl))) AS sco " +
        "FROM wdf CROSS JOIN st GROUP BY 1, 2) " +
        "SELECT doc_id, chunk_id, round(sco, 6) AS score FROM sc " +
        "ORDER BY round(sco, 6) DESC, doc_id, chunk_id LIMIT 10"
    }) {
      (s, d) =>
        chunkBm25For(s, d, TextQueries.Bm25Terms)
          .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
          .limit(10)
    },

    // Chunk-store dedup view — the payoff of x131: content keys held
    // by MORE THAN ONE document are exactly the rows a RAG/training
    // chunk store must collapse before indexing (the chunk-granular
    // analogue of q21's doc-level exact dedup; x58 lists template
    // HEADS, this lists every repeated 32-token unit wherever it
    // sits). Groups key on the 128-bit ck_md5 content key (the
    // rolling fp's ~30-bit space would birthday-merge unrelated
    // chunks at real corpus scale). One hash aggregate over the chunk
    // frame — map-side combined, HAVING prunes singletons before the
    // member lists materialize, top-50 by weight is TakeOrdered.
    // Alignment caveat by design: fixed-stride chunks only collide
    // when the shared run sits at the same stride offsets
    // (duplicate/near-dup docs do); shift-robust span detection is
    // x65/x130's job.
    Query("x132_dup_chunks",
      s"WITH $chunkCteSql " +
        "SELECT ck_md5, COUNT(DISTINCT doc_id) AS n_docs, " +
        "COUNT(*) AS n_occ, " +
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id, chunk_id) " +
        "AS members FROM ch GROUP BY ck_md5 " +
        "HAVING COUNT(DISTINCT doc_id) > 1 " +
        "ORDER BY n_occ DESC, ck_md5 LIMIT 50") {
      (s, d) =>
        chunkFrame(s, d)
          .groupBy("ck_md5")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occ"),
            array_join(transform(sort_array(collect_list(
              struct(col("doc_id"), col("chunk_id")))),
              x => x.getField("doc_id").cast("string")), ",").as("members"))
          .filter(col("n_docs") > 1)
          .orderBy(col("n_occ").desc, col("ck_md5"))
          .limit(50)
    },

    // Stored-postings audit — the declared probe of the r17
    // PostingsIndex (the serving-tier index behind x94/x133/x128 and
    // `GET /search?q=`): per query term, doc-level document frequency
    // and total occurrences from the stored `postings`, chunk-level
    // document frequency from the stored `cpostings`. The oracle
    // recomputes all three from RAW TEXT (occurrence explode +
    // position-arithmetic chunk membership), so a drift anywhere in
    // the index build — tokenization, tf aggregation, chunk window
    // arithmetic, tail pruning — breaks the hash, exactly like the
    // stored-DSIR and stored-shard pins. Probe plan: two filtered
    // index-table scans (term filter pushed into the token-clustered
    // parquet), two ≤|terms|-row aggregates, one broadcast join — no
    // corpus scan.
    Query("x141_term_stats", {
      val terms = TextQueries.Bm25Terms.map("'" + _ + "'").mkString(", ")
      "WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "dn AS (SELECT doc_id, len(ts) AS n, ts FROM t), " +
        "oc0 AS (SELECT doc_id, unnest(list_transform(range(len(ts)), " +
        "i -> {'p': i, 'tok': ts[i + 1]})) AS o FROM dn), " +
        "oc AS (SELECT doc_id, o.p AS p0, o.tok AS token FROM oc0 " +
        s"WHERE o.tok IN ($terms)), " +
        "da AS (SELECT token, COUNT(DISTINCT doc_id) AS df_docs, " +
        "COUNT(*) AS n_occ FROM oc GROUP BY token), " +
        s"cm AS (SELECT doc_id, n, unnest(range(0, " +
        s"greatest(CAST(floor(CAST(n - $ChunkMinTail AS DOUBLE) / $ChunkS) " +
        "AS BIGINT), 0) + 1)) AS chunk_id FROM dn), " +
        "cc AS (SELECT doc_id, token, unnest(range(" +
        s"greatest(CAST(floor(CAST(p0 - $ChunkW AS DOUBLE) / $ChunkS) " +
        "AS BIGINT) + 1, 0), " +
        s"CAST(floor(CAST(p0 AS DOUBLE) / $ChunkS) AS BIGINT) + 1)) " +
        "AS chunk_id FROM oc), " +
        "ccj AS (SELECT DISTINCT cc.doc_id, cc.chunk_id, token FROM cc " +
        "JOIN cm ON cc.doc_id = cm.doc_id AND cc.chunk_id = cm.chunk_id), " +
        "ca AS (SELECT token, COUNT(*) AS df_chunks FROM ccj GROUP BY token) " +
        "SELECT da.token, df_docs, n_occ, df_chunks " +
        "FROM da JOIN ca ON da.token = ca.token ORDER BY da.token"
    }) {
      (s, d) => {
        val ps = PostingsIndex.forDir(s, d)
        val terms = TextQueries.Bm25Terms
        val da = ps.load("postings")
          .filter(col("token").isin(terms: _*))
          .groupBy("token")
          .agg(count(lit(1)).as("df_docs"),
            sum(col("tf")).cast("long").as("n_occ"))
        val ca = ps.load("cpostings")
          .filter(col("token").isin(terms: _*))
          .groupBy("token")
          .agg(count(lit(1)).as("df_chunks"))
        da.join(broadcast(ca), Seq("token")).orderBy("token")
      }
    })
}
