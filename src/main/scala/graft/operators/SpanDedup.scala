package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-document repeated-span REMOVAL (Lee et al. '22, "Deduplicating
 * Training Data Makes Language Models Better" — ExactSubstr dedup at
 * n-gram granularity): the transform half of x72's audit. Every
 * cross-doc duplicated n-gram span is excised from every document
 * except its first owner (min doc_id, which keeps ALL its
 * occurrences); a token is dropped when ANY removed span covers it.
 *
 * Shape — ONE corpus pass, no join (the x72 lesson: never reference
 * the exploded corpus twice):
 *   1. posexplode tokens once;
 *   2. rebuild each position's n-gram from the token stream itself
 *      with lead() windows (tail positions get a spaceless
 *      per-(doc,pos) sentinel — a real n-gram always carries exactly
 *      n-1 joiner spaces, so sentinels cannot collide with one);
 *   3. ownership (min doc_id) and duplication (min != max doc_id) are
 *      a single window over the gram key;
 *   4. span→token coverage is a ROWS (-(n-1), 0) running max on the
 *      doc-ordered stream (token positions are dense, so the row
 *      frame IS the position frame);
 *   5. one per-doc aggregate rebuilds the cleaned text in token
 *      order.
 *
 * 100 TB: the single-query window form pays one corpus explode plus
 * three keyed exchanges of token-granular rows. The deployment
 * factorization for a standing corpus is to persist the mined
 * dup-gram→owner list as corpus metadata on the x73/x26 build-once
 * lifecycle and probe it per shard (then ingest only pays the probe);
 * head-gram skew in the ownership window is an acknowledged bound,
 * not a solved one: WindowExec gets no pre-shuffle combine, so a
 * gram occurring k times corpus-wide buffers k rows in ONE window
 * partition — a universal boilerplate gram is a single-task
 * straggler. The production posture is to strip boilerplate
 * upstream (x73's mined-list filter) before span dedup, or to take
 * the stored dup-gram/owner-list factorization above whose df
 * aggregate IS map-side combined; the single-query window form
 * accepts the skew in exchange for the one-pass corpus read.
 */
object SpanDedup {

  /** Cleaned corpus view over (doc_id, lang, text) rows: one output
    * row per input doc with non-null text — doc_id, lang, n_tokens,
    * n_removed, clean_text (tokens surviving span excision, joined by
    * single spaces; "" when every token was removed).
    *
    * `minRun` (default 1 = excise every covered token) is the
    * Lee et al. '22 ExactSubstr length threshold (they use 50): only
    * MAXIMAL runs of ≥ minRun consecutive covered tokens are excised;
    * shorter duplicated stretches — incidental collocations rather
    * than cloned passages — survive untouched. The run merge is a
    * gaps-and-islands pass over the already-computed coverage column
    * (x60's technique) on rows already exchanged+sorted by
    * (doc_id, tp): run ids are a running sum of run-starts over the
    * SAME window, and run length is an unordered window over
    * (doc_id, run_id) — a sub-partition of doc_id, so Spark's
    * ClusteredDistribution check reuses the existing exchange and
    * only adds a cheap in-partition sort. No new shuffle. */
  def cleanedCorpus(docs: DataFrame, n: Int = 5, minRun: Int = 1)
      : DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    // the ingest corpus table carries no lang column; the transform is
    // lang-agnostic, so synthesize a null one rather than requiring it
    val withLang =
      if (docs.columns.contains("lang")) docs
      else docs.withColumn("lang", lit(null).cast("string"))
    val tok = withLang
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        TextFns.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("lang"),
        size(col("ts")).cast("long").as("n_tokens"),
        posexplode(col("ts")).as(Seq("tp", "token")))
    val byDoc = Window.partitionBy("doc_id").orderBy("tp")
    val gramKey = when(lead(col("token"), n - 1).over(byDoc).isNotNull,
      concat_ws(" ", col("token") +:
        (1 until n).map(k => lead(col("token"), k).over(byDoc)): _*))
      .otherwise(concat(col("doc_id").cast("string"), lit("#"),
        col("tp").cast("string")))
    val byGram = Window.partitionBy("gram")
    val cover = Window.partitionBy("doc_id").orderBy("tp")
      .rowsBetween(-(n - 1), 0)
    val covered = tok.withColumn("gram", gramKey)
      .withColumn("owner", min("doc_id").over(byGram))
      .withColumn("mx", max("doc_id").over(byGram))
      .withColumn("span_rm",
        when(col("owner") =!= col("mx") &&
          col("doc_id") =!= col("owner"), 1).otherwise(0))
      .withColumn("rm", max("span_rm").over(cover))
    val excised =
      if (minRun <= 1) covered
      else {
        // gaps-and-islands: a covered token STARTS a run when its
        // predecessor (same doc) is uncovered or absent; the running
        // sum of starts numbers the islands (uncovered tail rows share
        // the preceding island's id, but their rm=0 keeps them out of
        // both the length count and the excision)
        val runStart = when(col("rm") === 1 &&
          coalesce(lag(col("rm"), 1).over(byDoc), lit(0)) === 0, 1)
          .otherwise(0)
        val byRun = Window.partitionBy("doc_id", "run_id")
        covered
          .withColumn("run_id", sum(runStart).over(byDoc))
          .withColumn("run_len", sum(col("rm")).over(byRun))
          .withColumn("rm",
            when(col("rm") === 1 && col("run_len") >= minRun, 1)
              .otherwise(0))
      }
    excised
      .groupBy("doc_id")
      .agg(first("lang").as("lang"),
        first("n_tokens").as("n_tokens"),
        sum(col("rm")).cast("long").as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rm") === 0,
            struct(col("tp"), col("token"))))),
          x => x("token"))).as("clean_text"))
  }
}
