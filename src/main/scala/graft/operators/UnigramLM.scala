package graft.operators

import graft.functions.TextFns
import graft.sources.Tables.table
import graft.tables.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stored unigram language model over the `documents` corpus — the
 * statistical-quality scoring table a CCNet/Dolma-style pipeline keeps
 * next to its corpus (CCNet scores documents with a reference LM; the
 * unigram self-model is the corpus-intrinsic version of the same
 * signal): `freq(token, lp)` where `lp = ln(count / total_tokens)`.
 *
 * Same build-once lifecycle as the shingle/ANN indexes
 * ([[StoredIndexes.versioned]]): built once per corpus version (cost
 * in the bench `build` section), invalidated by any corpus rewrite —
 * including a GDPR purge. The probe side (x87) is one corpus explode
 * + one token-keyed join against this table + a per-doc average: the
 * table is O(vocabulary) — Zipf-bounded, orders of magnitude smaller
 * than the corpus — so at 100 TB the join side broadcasts or, above
 * the guard, shuffles by token with map-side-combined probe partials.
 */
object UnigramLM {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[TableStore]]()

  /** The stored model: table "freq" (token, c, lp), table "bifreq"
    * (g = adjacent pair, c) and the 1-row "stats" table (n_tokens,
    * n_docs).
    * Every corpus token has count >= 1, so self-scoring never sees an
    * out-of-vocabulary token (external scoring would add smoothing —
    * that constant lives with the caller). */
  def forDir(spark: SparkSession, dir: String): TableStore =
    StoredIndexes.versioned(cache, dir, "documents.parquet",
      "graft-unigram-lm") { root =>
      val store = new TableStore(spark, root)
      // the tokenized projection is cached for the BUILD's duration:
      // the unigram explode, the bigram explode and the doc count all
      // read it, so the corpus is scanned and tokenized exactly once
      // (build-path-only persist — query builders never cache)
      val toks = table(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(TextFns.tokens(col("text")).as("ts"))
        .persist()
      try {
        val counts = toks.select(explode(col("ts")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c"))
        // total = sum of per-token counts — derived from the
        // aggregated vocabulary, not another corpus pass. coalesce:
        // sum over ZERO rows is NULL — an empty/all-null-text corpus
        // (fully-purged is a reachable state) must build an empty
        // model, not NPE at getLong
        val total = counts.agg(coalesce(sum(col("c")), lit(0L)))
          .head.getLong(0)
        store.replace("freq", counts
          .select(col("token"), col("c"),
            log(col("c").cast("double") / total.toDouble).as("lp"))
          .repartition(col("token")))
        // adjacent-bigram counts — the conditional-probability side of
        // the model (x93's bigram LM scoring)
        store.replace("bifreq", toks
          .select(explode(TextFns.allShingles(col("ts"), 2)).as("g"))
          .groupBy("g").agg(count(lit(1)).as("c"))
          .repartition(col("g")))
        // 1-row corpus stats next to the model: probes that need
        // scalar totals (x90's bigram denominator, x94's N/avglen)
        // read THIS — a bounded metadata read, like the IVF centroid
        // table — instead of re-deriving them with a corpus scan or a
        // corpus-wide single-partition window
        import spark.implicits._
        val nDocs = toks.count()
        store.replace("stats",
          Seq((total, nDocs)).toDF("n_tokens", "n_docs"))
      } finally { toks.unpersist(); () }
      store
    }
}

/**
 * Held-out (train-split) LM — the model a REAL perplexity filter
 * scores against: x87/x93 self-score (every token is in-vocabulary by
 * construction), while this builds unigram+bigram counts from the x35
 * TRAIN split only so val/test scoring must handle unseen events —
 * stupid backoff (Brants et al. '07, "Large Language Models in
 * Machine Translation"): bigram ratio if seen, else α·unigram, else a
 * fixed OOV penalty. Same build-once [[StoredIndexes.versioned]]
 * lifecycle as [[UnigramLM]]; tables `freq(token, c)`,
 * `bifreq(g, c)` and 1-row `stats(n_tokens)`.
 */
object HeldOutLM {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[TableStore]]()

  /** x35's deterministic split: md5-derived bucket < 80 is train. */
  def isTrain(doc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TextFns.md5Bits16(doc.cast("string")) % 100 < 80

  def forDir(spark: SparkSession, dir: String): TableStore =
    StoredIndexes.versioned(cache, dir, "documents.parquet",
      "graft-heldout-lm") { root =>
      val store = new TableStore(spark, root)
      // one train-split scan, tokenized once for the build's three
      // consumers (build-path-only persist, like UnigramLM's)
      val toks = table(spark, dir, "documents")
        .filter(col("text").isNotNull && isTrain(col("doc_id")))
        .select(TextFns.tokens(col("text")).as("ts"))
        .persist()
      try {
        val counts = toks.select(explode(col("ts")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c"))
        val total = counts.agg(coalesce(sum(col("c")), lit(0L)))
          .head.getLong(0)
        store.replace("freq", counts.repartition(col("token")))
        store.replace("bifreq", toks
          .select(explode(TextFns.allShingles(col("ts"), 2)).as("g"))
          .groupBy("g").agg(count(lit(1)).as("c"))
          .repartition(col("g")))
        import spark.implicits._
        store.replace("stats", Seq(total).toDF("n_tokens"))
      } finally { toks.unpersist(); () }
      store
    }
}
