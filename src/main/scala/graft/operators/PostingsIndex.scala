package graft.operators

import graft.functions.TextFns
import graft.sources.Tables.table
import graft.tables.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Build-once stored INVERTED POSTINGS index over the `documents`
 * corpus — the serving-tier structure behind every lexical-retrieval
 * consumer (x94 doc BM25, x133 chunk BM25, x128's hybrid lexical arm,
 * and `GET /search?q=`). Same fingerprint-versioned
 * build-once/probe-many lifecycle as ShingleIndex / UnigramLM / the
 * vector indexes ([[StoredIndexes.versioned]], build cost in the bench
 * `build` section).
 *
 * Before this index the BM25 scorers tokenized and exploded the WHOLE
 * corpus per invocation with the term filter sitting above the
 * explode: correct, and O(its-term-occurrences) in OUTPUT, but
 * O(corpus tokens) in SCAN — one full corpus pass per `/search`
 * request, while the dense arm of the same endpoint probed a stored
 * IVF index. The reference's read path is an index-backed Mongo find
 * (eventos/main.go:25-33 — lookups ride an index, never a collection
 * scan); this is the lexical-retrieval analogue.
 *
 * Tables (all term-keyed tables are hash-repartitioned by `token` and
 * SORTED by token within partitions, so each parquet row group covers
 * a narrow token range: a probe's `token IN (...)` filter pushes to
 * the scan — `PushedFilters: [In(token, ...)]`, plan-pinned in
 * PostingsSpec — and row-group min/max stats skip everything but the
 * handful of groups that can hold the query terms; probe I/O is
 * O(matching postings + footers), never O(corpus)):
 *
 *  - `postings` (token, doc_id, dl, tf, pos): one row per (doc, term)
 *    with the doc's token length, the term's in-doc frequency and its
 *    sorted in-doc positions — exactly the per-(doc,term) frame x94's
 *    scorer aggregated from its corpus explode, materialized once per
 *    corpus version, plus the positional payload phrase/snippet
 *    probes need (see [[docPostingsOf]] for the size trade). Without
 *    pos the table is the size class of the corpus's distinct
 *    (doc,term) pairs; pos adds Σtf ints, but only probes that SELECT
 *    it pay for it (parquet column chunks).
 *  - `cpostings` (token, doc_id, chunk_id, dl, tf): the chunk-granular
 *    twin — per (doc, chunk, term) frequency with the chunk's token
 *    length, chunk membership by x133's position arithmetic (a token
 *    position sits in ≤ ⌈W/S⌉ = 2 stride-S windows, tail-pruned
 *    windows dropped). ≤ 2× the doc-level row count by construction.
 *  - `stats` (n_tokens, n_docs, n_rows): 1-row doc-level corpus
 *    stats — BM25's N and avgdl numerator/denominator, plus the
 *    TOTAL corpus row count (incl. null-text rows) that the ingest
 *    coverage check reads instead of rescanning anything.
 *  - `cstats` (nch, sum_dl): 1-row chunk-level stats (chunk count,
 *    summed chunk lengths) — avgdl derives as sum_dl/nch, kept as the
 *    exact-integer pair so ingest can FOLD it (an avg doesn't fold; a
 *    (sum, count) pair does).
 *
 * df is deliberately NOT stored: the scorers derive it per query from
 * the ≤|terms| filtered postings groups (count of rows per token —
 * the same broadcast-agg-back pattern they always used), so appends
 * never have to reconcile a global per-term counter.
 *
 * Incremental ingest ([[ingest]]): postings rows are PER-DOCUMENT
 * (token, tf, dl are doc-local), so an append-only corpus batch
 * appends exactly its own docs' postings — O(batch), the chunk-store
 * maintenance class — and the 1-row stats tables fold by addition.
 * Same two-level checked contract as [[VectorIndex.ingest]]: the
 * corpus data-file listing must EXTEND the covered listing and
 * covered + delta rows must equal the corpus row count; any violation
 * falls back to a full rebuild. What remains trusted is that an
 * append-only growth of exactly N rows IS the N delta rows handed in
 * (the caller owns the corpus writer). Unlike DSIR weights (NOT
 * incrementally foldable — every batch shifts the global ratio
 * table), postings and (sum, count) stats fold exactly.
 */
object PostingsIndex {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[TableStore]]()

  /** Doc-level postings of ANY (doc_id, text) frame — one tokenize
    * scan, one (token, doc_id) aggregate. The per-(doc,term) values
    * are EXACTLY the tf/dl frame the x94 scorer used to aggregate
    * from its per-query corpus explode (same expressions), so moving
    * them to the stored build cannot change a score.
    *
    * `pos` makes the index POSITIONAL (the Lucene trade): the sorted
    * in-doc positions of each term, so phrase adjacency (x144) and
    * best-window extraction (x145) are index probes instead of text
    * rescans. Invariant tf == size(pos) (spec-pinned). Cost: Σ|pos| =
    * corpus token count — the column is the size class of the text it
    * replaces — but parquet column chunks mean a probe that doesn't
    * SELECT pos (all the BM25 scorers) never reads those bytes. */
  private[operators] def docPostingsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"),
        posexplode(col("ts")).as(Seq("p", "token")))
      .groupBy("token", "doc_id")
      .agg(first("dl").as("dl"), count(lit(1)).cast("double").as("tf"),
        sort_array(collect_list(col("p"))).as("pos"))

  /** 1-row doc-level stats of ANY (doc_id, text) frame: token total
    * and doc count over non-null-text rows (UnigramLM's `stats`
    * definition — x94's N/avglen inputs), plus the raw row count the
    * ingest coverage check consumes. coalesce: an empty batch/corpus
    * folds as zeros, not nulls. */
  private[operators] def docStatsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        when(col("text").isNotNull,
          size(TextFns.tokens(col("text")))).as("n"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_tokens"),
        count(col("n")).as("n_docs"),
        count(lit(1)).as("n_rows"))

  def forDir(spark: SparkSession, dir: String): TableStore =
    StoredIndexes.versioned(cache, dir, "documents.parquet",
      "graft-postings-index") { root =>
      buildInto(spark, new TableStore(spark, root),
        table(spark, dir, "documents"))
    }

  /** The build body, shared by [[forDir]] and [[ingest]]'s full-
    * rebuild fallback: all four tables derive from one corpus
    * projection. */
  private def buildInto(spark: SparkSession, store: TableStore,
      docs: DataFrame): TableStore = {
    val n = spark.sessionState.conf.numShufflePartitions
    store.replace("postings", docPostingsOf(docs)
      .repartition(n, col("token")).sortWithinPartitions("token"))
    store.replace("cpostings", CurationQueries.chunkPostingsOf(docs)
      .repartition(n, col("token")).sortWithinPartitions("token"))
    store.replace("stats", docStatsOf(docs))
    store.replace("cstats", CurationQueries.chunkStatsOf(docs))
    store
  }

  /** Incrementally absorb an append-only corpus batch WITHOUT a
    * rebuild: append the batch's own doc/chunk postings (token-
    * clustered like the build's, so pushdown keeps working on the
    * appended segments) and FOLD the 1-row stats by addition —
    * O(batch) compute, no stored-side scan. Contract and fallback as
    * documented on the object; with no index built yet this is a
    * plain build. Call AFTER the corpus dir has grown append-only by
    * exactly `rows`. */
  def ingest(spark: SparkSession, dir: String, rows: DataFrame): TableStore =
    cache.compute(dir, (_, prev) => {
      val listing = StoredIndexes.dataListing(dir, "documents.parquet")
      val fp = StoredIndexes.fingerprint(dir, "documents.parquet")
      lazy val nCorpus: Long = table(spark, dir, "documents").count()
      def full() = {
        val e = StoredIndexes.rebuildEntry(fp, "graft-postings-index",
          listing, nCorpus)(root =>
          buildInto(spark, new TableStore(spark, root),
            table(spark, dir, "documents")))
        if (prev != null) StoredIndexes.retireRoot(prev.root)
        e
      }
      if (prev == null || !StoredIndexes.appendOnly(prev.files, listing))
        full()
      else {
        val deltaN = rows.count()
        // backfill for entries built before any ingest (forDir): the
        // covered row count is the stats table's n_rows — a 1-row
        // stored read, never an index rescan
        val covered =
          if (prev.rows >= 0) prev.rows
          else prev.index.load("stats").head.getLong(2)
        if (covered + deltaN != nCorpus) full()
        else {
          val st = prev.index
          val nPart = spark.sessionState.conf.numShufflePartitions
          st.append("postings", docPostingsOf(rows)
            .repartition(nPart, col("token"))
            .sortWithinPartitions("token"))
          st.append("cpostings", CurationQueries.chunkPostingsOf(rows)
            .repartition(nPart, col("token"))
            .sortWithinPartitions("token"))
          // 1-row folds: old + batch, written as literal rows (two
          // bounded reads + two 1-row writes — no corpus-side work)
          import spark.implicits._
          val o = st.load("stats").head
          val b = docStatsOf(rows).head
          st.replace("stats", Seq((o.getLong(0) + b.getLong(0),
            o.getLong(1) + b.getLong(1), o.getLong(2) + b.getLong(2)))
            .toDF("n_tokens", "n_docs", "n_rows"))
          val oc = st.load("cstats").head
          val bc = CurationQueries.chunkStatsOf(rows).head
          st.replace("cstats", Seq((oc.getLong(0) + bc.getLong(0),
            oc.getLong(1) + bc.getLong(1))).toDF("nch", "sum_dl"))
          StoredIndexes.Cached(fp, prev.root, st, listing,
            covered + deltaN)
        }
      }
    }).index
}
