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
 * three keyed exchanges of token-granular rows.
 * Head-gram skew in the ownership window (r14, closing the r12
 * residue): the default window form buffers a gram's every occurrence
 * in ONE WindowExec task — a universal boilerplate gram is a
 * single-task straggler/spill. `skewSafe = true` swaps step 3 for the
 * map-side-combined [[dupGramOwners]] aggregate joined back onto the
 * token stream: the hot gram reaches its reduce task as O(map tasks)
 * partial rows, the attach side is only the duplicated vocabulary
 * slice (AQE-broadcastable), and no operator anywhere buffers a
 * per-gram partition. Hash-identical to the window form
 * (SkewWindowSpec pins it on a one-gram-in-half-the-docs fixture);
 * costs a second run of the narrow explode+gramKey derivation, so the
 * window form stays the default at query scale.
 * The standing-corpus factorization goes one step further:
 * [[dupGramOwners]] is corpus METADATA — persist it once per corpus
 * version (the x73/x26 build-once lifecycle) and probe each shard
 * with [[cleanedCorpusWithOwners]]; a STORED owners table joins as a
 * bare scan, which is exactly the two-bare-shuffle SMJ shape AQE's
 * skew-join can SPLIT across tasks (pinned in SkewWindowSpec) — the
 * bounded-per-task property windows cannot give.
 */
object SpanDedup {

  /** (doc_id, lang, n_tokens, tp, token, gram) token stream with each
    * position's n-gram — the shared front of every span-dedup form.
    *
    * r17: grams are derived NARROWLY from the token array (slice +
    * concat_ws per position) and exploded zipped with their tokens,
    * instead of the r12 lead()-window rebuild over the exploded
    * stream. Same output bit for bit (position tp carries tokens
    * tp..tp+n−1 joined by single spaces when they exist, else the
    * spaceless `doc#tp` sentinel — a real n-gram always carries
    * exactly n−1 joiner spaces, so sentinels cannot collide with
    * one), but the doc-ordered exchange + sort + n−1 lead() window
    * passes over the token-granular stream disappear: gram
    * construction is now part of the scan stage (guide §2.4 — the
    * first keyed exchange any span-dedup form pays is the one its
    * OWNERSHIP step actually needs). */
  private def gramStream(docs: DataFrame, n: Int): DataFrame = {
    // the ingest corpus table carries no lang column; the transform is
    // lang-agnostic, so synthesize a null one rather than requiring it
    val withLang =
      if (docs.columns.contains("lang")) docs
      else docs.withColumn("lang", lit(null).cast("string"))
    withLang
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        TextFns.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("lang"),
        size(col("ts")).cast("long").as("n_tokens"),
        arrays_zip(
          col("ts").as("token"),
          graft.functions.expressions.TextExpressions.grams_with_sentinel(
            col("ts"), col("doc_id").cast("string"), n).as("gram"))
          .as("zg"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        posexplode(col("zg")).as(Seq("tp", "z")))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tp"),
        col("z").getField("token").as("token"),
        col("z").getField("gram").as("gram"))
  }

  /** The mined cross-doc duplicated-gram ownership list:
    * (gram, owner) for every n-gram present in ≥ 2 documents, owner =
    * min doc_id. This is the corpus METADATA a standing pipeline
    * persists per corpus version and probes per shard
    * ([[cleanedCorpusWithOwners]]). Map-side-combined aggregates: a
    * boilerplate-scale hot gram reaches its reduce task as O(map
    * tasks) partial rows and folds into one accumulator — never a
    * buffered window partition.
    *
    * r18 (guide §2.3 — shuffle keys, not payloads): the CANDIDATE
    * mining pass is STRING-FREE — [[GramKeyHashes]] per-position
    * 64-bit keys (equal grams ⇒ equal keys) explode as bare longs, so
    * the dominant exchange of the whole span family carries 8-byte
    * keys instead of ~n·8-char gram strings, and the mine pass never
    * allocates a gram string at all. Bare hashed keys alone would be
    * WRONG here: excision has no verify stage, so a collision that
    * makes a unique gram look duplicated (or elects the wrong owner)
    * would silently excise a non-duplicated span. The BOUNDED
    * STRING-RECHECK stage (the x36/ex8h probe pattern) restores
    * exactness: rows whose key is a duplicate CANDIDATE — a superset
    * of the truly duplicated grams — re-aggregate by the gram string
    * itself, so min≠max and the owner are decided on strings alone.
    * A collision can only ADD rows to the recheck (a few extra string
    * rows shuffled), never flip a verdict. Cost: one extra narrow
    * derivation (scan-stage work that scales out) in exchange for the
    * string exchange shrinking to the duplicated-vocabulary slice
    * (~5% of the vocabulary in the fixtures); SkewWindowSpec pins
    * row-identity against the single-pass string aggregate. */
  def dupGramOwners(docs: DataFrame, n: Int = 5): DataFrame = {
    val withLang =
      if (docs.columns.contains("lang")) docs
      else docs.withColumn("lang", lit(null).cast("string"))
    val base = withLang
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
    // candidate mine: STRING-FREE — per-position 64-bit gram keys
    // (tokens hashed once, polynomial window mix, zero allocation per
    // position; see GramKeyHashes) explode as bare longs and
    // aggregate map-side, so neither the per-task work nor the
    // exchange ever touches a gram string
    val cand = base
      .select(col("doc_id"), explode(
        graft.functions.expressions.TextExpressions.gram_key_hashes(
          col("ts"), col("doc_id").cast("string"), n)).as("gk"))
      .groupBy("gk")
      .agg(min("doc_id").as("o"), max("doc_id").as("mx"))
      .filter(col("o") =!= col("mx"))
      .select("gk")
    // string recheck: only rows whose KEY is a duplicate candidate —
    // a superset of the truly duplicated grams (equal grams share a
    // key by construction) — re-aggregate by the gram STRING, so
    // min≠max and the owner are decided on strings alone and a key
    // collision can only add a few rows here, never excise wrongly
    base
      .select(col("doc_id"), explode(arrays_zip(
        graft.functions.expressions.TextExpressions.grams_with_sentinel(
          col("ts"), col("doc_id").cast("string"), n).as("gram"),
        graft.functions.expressions.TextExpressions.gram_key_hashes(
          col("ts"), col("doc_id").cast("string"), n).as("gk"))).as("z"))
      .select(col("doc_id"), col("z").getField("gram").as("gram"),
        col("z").getField("gk").as("gk"))
      .join(cand, Seq("gk"), "left_semi")
      .groupBy("gram")
      .agg(min("doc_id").as("owner"), max("doc_id").as("mx"))
      .filter(col("owner") =!= col("mx"))
      .select("gram", "owner")
  }

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
    * only adds a cheap in-partition sort. No new shuffle.
    *
    * `skewSafe` selects the ownership strategy (see the object doc):
    * window form (default, one derivation, hot-gram buffer) vs the
    * [[dupGramOwners]] aggregate joined back (no per-gram buffering
    * anywhere, second narrow derivation). */
  def cleanedCorpus(docs: DataFrame, n: Int = 5, minRun: Int = 1,
      skewSafe: Boolean = false): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    if (skewSafe) cleanedCorpusWithOwners(docs, dupGramOwners(docs, n),
      n, minRun)
    else {
      val byGram = Window.partitionBy("gram")
      val flagged = gramStream(docs, n)
        .withColumn("owner", min("doc_id").over(byGram))
        .withColumn("mx", max("doc_id").over(byGram))
        .withColumn("span_rm",
          when(col("owner") =!= col("mx") &&
            col("doc_id") =!= col("owner"), 1).otherwise(0))
      excise(flagged, n, minRun)
    }
  }

  /** [[cleanedCorpus]] probing a PRE-MINED ownership table (the
    * [[dupGramOwners]] output, typically read back from storage on
    * the build-once lifecycle): the token stream left-joins the
    * owners list — AQE broadcasts a small list (the token rows then
    * never shuffle by gram at all); a vocabulary-scale list plans a
    * streaming SMJ over two bare shuffle reads, the exact shape AQE's
    * skew-join splits across tasks when one gram dominates
    * (SkewWindowSpec pins the split). `owners` must hold every
    * cross-doc duplicated gram of `docs` for the result to equal
    * [[cleanedCorpus]]. */
  def cleanedCorpusWithOwners(docs: DataFrame, owners: DataFrame,
      n: Int = 5, minRun: Int = 1): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val flagged = gramStream(docs, n)
      .join(owners.select(col("gram"), col("owner")), Seq("gram"),
        "left_outer")
      .withColumn("span_rm",
        when(col("owner").isNotNull &&
          col("doc_id") =!= col("owner"), 1).otherwise(0))
    excise(flagged, n, minRun)
  }

  /** Shared tail: span→token coverage, optional minRun island merge,
    * per-doc text rebuild. `flagged` carries the gramStream columns
    * plus span_rm. */
  private def excise(flagged: DataFrame, n: Int, minRun: Int)
      : DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("tp")
    val cover = Window.partitionBy("doc_id").orderBy("tp")
      .rowsBetween(-(n - 1), 0)
    val covered = flagged
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
