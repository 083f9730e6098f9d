package graft.operators

import graft.Query
import graft.functions.TextFns
import graft.sources.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence PACKING — the sample-packing step every LLM training
 * pipeline runs between the cleaned corpus and the trainer (GPT-3 /
 * T5 / Llama data loaders: concatenate documents, slice into
 * fixed-length token windows so no step pays padding): a span
 * manifest mapping each W-token training window to the document
 * ranges that fill it. The manifest is pure arithmetic over per-doc
 * token counts — the window CONTENTS never materialize (the trainer
 * reads them later, shard-locally, through this manifest).
 *
 * Shape: one narrow scan computes per-doc token counts; a per-LANG
 * running sum (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING over doc_id
 * order) assigns each doc its shard-local token offset; each doc then
 * explodes into the windows it overlaps (`sequence(first, last)` —
 * O(windows touched), ≤ 1 + n/W per doc). Output rows =
 * O(docs + windows), orders of magnitude below token count.
 *
 * 100 TB: packing is SHARD-LOCAL by construction here (the per-lang
 * window is a per-shard prefix sum — each lang's stream packs
 * independently, which is exactly what production loaders do: packing
 * never crosses a shard/file boundary, so shards pack in parallel
 * with no cross-shard coordination). The skew bound is the largest
 * shard's doc count in one window partition — at real scale the
 * shard key is (lang, file-group) rather than lang alone, making the
 * partition width a tuning knob, not an architecture change. A GLOBAL
 * pack (one stream across everything) would need the classic two-pass
 * distributed prefix sum (per-partition totals → broadcast offsets);
 * that seam is deliberately not taken because global packing also
 * serializes the trainer's shard parallelism.
 */
object PackingQueries {

  private val W = 256 // tokens per training window

  /** Distributed 0..mx window-id generation per input row (carrying
    * every other column through): a single `explode(sequence(0, mx))`
    * would materialize the WHOLE per-shard window universe as one
    * in-memory array — billions of entries for a trillion-token shard,
    * i.e. a guaranteed executor OOM at exactly the scale these
    * operators target. Two-level generation keeps every materialized
    * array ≤ 2^16 entries: explode the chunk ids (≤ nw/2^16 per row),
    * then each chunk's window ids — O(nw) ROWS either way, bounded
    * MEMORY per row always. */
  private def windowUniverse(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val C = 1L << 16
    df.filter(col("mx") >= 0)
      .withColumn("chunk",
        explode(sequence(lit(0L), floor(col("mx") / C).cast("long"))))
      .withColumn("window_id",
        explode(sequence(col("chunk") * C,
          least(col("mx"), (col("chunk") + 1) * C - 1))))
      .drop("chunk", "mx")
  }

  /** tokens per training window — the ONE width constant.
    * ShardExportSpec reads it for its exact-W window assertion (a
    * spec-local duplicate would drift exactly the way this val exists
    * to prevent); [[ShardExport]] itself needs no width — it inherits
    * the geometry entirely through [[manifestOf]]. */
  private[graft] val WindowW: Int = W

  /** The span manifest (lang, window_id, doc_id, start_tok, end_tok) —
    * x100's pipeline, factored so the shard materializer
    * ([[ShardExport]]) consumes the SAME manifest definition the
    * declared query hash-pins. Token range is [start_tok, end_tok),
    * 0-based. */
  private[operators] def manifestOf(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    manifestOfDocs(table(s, d, "documents"))

  /** [[manifestOf]] over ANY (doc_id, lang, text) frame, with an
    * optional per-lang BASE token offset frame (lang, base) — the
    * seam the incremental shard maintainer rides: a batch of docs
    * appended to an already-packed shard manifests exactly as the
    * full corpus would place it when its offsets start where the
    * stored stream ended (packing is a per-lang greedy concat in
    * doc_id order, so higher-id docs never move earlier windows). */
  private[operators] def manifestOfDocs(
      docs: org.apache.spark.sql.DataFrame,
      baseOff: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame =
    manifestOfCounts(docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0), baseOff)

  /** [[manifestOfDocs]] over a pre-tokenized (doc_id, lang, n) count
    * frame — the shard maintainer hands its single cached tokenize
    * pass here instead of paying a second one. */
  private[operators] def manifestOfCounts(
      t0: org.apache.spark.sql.DataFrame,
      baseOff: Option[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame = {
    val shard = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // offsets are exact longs ≪ 2^52, so the floor-of-double
    // divisions below are exact integer division on both engines
    val t1 = t0.withColumn("off",
      coalesce(sum(col("n")).over(shard), lit(0L)))
    val t = baseOff match {
      case None => t1
      case Some(b) =>
        t1.join(broadcast(b), Seq("lang"), "left")
          .withColumn("off", col("off") + coalesce(col("base"), lit(0L)))
          .drop("base")
    }
    t.withColumn("window_id", explode(sequence(
        floor(col("off") / W).cast("long"),
        floor((col("off") + col("n") - 1) / W).cast("long"))))
      .select(col("lang"), col("window_id"), col("doc_id"),
        greatest(lit(0L), col("window_id") * W - col("off"))
          .as("start_tok"),
        least(col("n"), (col("window_id") + 1) * W - col("off"))
          .as("end_tok"))
  }


  val all: Seq[Query] = Seq(
    Query("x100_seq_packing",
      "WITH t AS (SELECT doc_id, lang, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n " +
        "FROM documents WHERE text IS NOT NULL), " +
        "o AS (SELECT doc_id, lang, n, " +
        "CAST(COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS BIGINT) AS off " + // DuckDB SUM(BIGINT) is HUGEINT
        "FROM t WHERE n > 0), " +
        s"e AS (SELECT lang, doc_id, n, off, unnest(range(off // $W, " +
        s"(off + n - 1) // $W + 1)) AS window_id FROM o) " +
        "SELECT lang, CAST(window_id AS BIGINT) AS window_id, doc_id, " +
        s"CAST(greatest(0, window_id * $W - off) AS BIGINT) AS start_tok, " +
        s"CAST(least(n, (window_id + 1) * $W - off) AS BIGINT) AS end_tok " +
        "FROM e ORDER BY lang, window_id, doc_id") {
      (s, d) => manifestOf(s, d).orderBy("lang", "window_id", "doc_id")
    },

    // EPOCH SHUFFLE — the data-order randomization step a trainer runs
    // over the packed windows each epoch (every LLM loader shuffles
    // window order per epoch; doing it deterministically from a seed
    // is what makes a run reproducible and resumable mid-epoch). The
    // window universe derives from the same arithmetic as x100
    // (windows per shard = ceil(Σtokens/W) — no manifest join needed),
    // and each epoch's permutation is a seeded md5 rank with a
    // window_id tiebreak: same technique as x80/x114's reproducible
    // reservoir, so the order is stable under partitioning, reruns
    // and restarts. Emitting two epochs side by side pins that the
    // seed actually changes the order. Scale: one map-side-combined
    // per-shard token total, one O(windows) generate, one per-shard
    // sort — producing a shard's training order IS a sort, and it
    // spills externally; at trillion-token scale the shard key widens
    // to (lang, file-group) exactly as x100 documents, keeping each
    // permutation partition-sized.
    Query("x117_epoch_shuffle",
      "WITH t AS (SELECT lang, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n " +
        "FROM documents WHERE text IS NOT NULL), " +
        s"s AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot FROM t " +
        "WHERE n > 0 GROUP BY lang), " +
        s"w AS (SELECT lang, unnest(range((tot + ${W - 1}) // $W)) " +
        "AS window_id FROM s), " +
        "p AS (SELECT lang, CAST(window_id AS BIGINT) AS window_id, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
        graft.functions.TextFns.Sql.md5Bits16(
          "md5('0#' || CAST(window_id AS VARCHAR))") +
        ", window_id) AS BIGINT) AS pos_e0, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
        graft.functions.TextFns.Sql.md5Bits16(
          "md5('1#' || CAST(window_id AS VARCHAR))") +
        ", window_id) AS BIGINT) AS pos_e1 FROM w) " +
        "SELECT lang, window_id, pos_e0, pos_e1 FROM p " +
        "ORDER BY lang, window_id") {
      (s, d) => {
        def rank(epoch: Int) =
          row_number().over(Window.partitionBy("lang").orderBy(
            graft.functions.TextFns.md5Bits16(
              concat(lit(s"$epoch#"), col("window_id").cast("string"))),
            col("window_id"))).cast("long")
        table(s, d, "documents")
          .filter(col("text").isNotNull)
          .select(col("lang"),
            size(TextFns.tokens(col("text"))).cast("long").as("n"))
          .filter(col("n") > 0)
          .groupBy("lang").agg(sum(col("n")).as("tot"))
          .select(col("lang"),
            (floor((col("tot") + (W - 1)) / W).cast("long") - 1).as("mx"))
          .transform(windowUniverse)
          .select(col("lang"), col("window_id"),
            rank(0).as("pos_e0"), rank(1).as("pos_e1"))
          .orderBy("lang", "window_id")
      }
    },

    // LOADER SCHEDULE — the step-level interleave an LLM trainer
    // follows ACROSS shards: each training step draws the next window
    // from some shard, and the draw order must hit shards in
    // proportion to their (temperature-adjusted) mixing weights,
    // deterministically. This is the classic smooth/deterministic
    // weighted interleave (WFQ virtual time — Demers et al. '89; the
    // same math behind weighted fair queuing and SGMV schedulers):
    // shard L's k-th window is released at virtual time (k+1)/w_L and
    // the global order sorts by it — any schedule prefix then holds
    // each shard within O(#shards) windows of its weighted share while
    // every shard has supply (PackingSpec pins the bound; the tighter ±1 needs stateful
    // server virtual time, which would forfeit the stateless
    // resumable-from-any-step property). No RNG, no sequential state. Weights implement
    // T=2 temperature sampling (x89's family): w_L = floor(sqrt(
    // tokens_L · 2^40)) — integer-exact inputs into ONE correctly-
    // rounded IEEE sqrt/floor, so both engines derive identical
    // weights, and v = (k+1)/w_L is a single exact-int double
    // division (no accumulation anywhere, ties broken (lang, k)).
    // Scale: one map-side-combined per-shard total, one O(windows)
    // generate, one TakeOrdered LIMIT — the schedule PREFIX is what a
    // trainer materializes (the full order is implicit in the
    // formula; any segment regenerates independently, which is the
    // checkpoint-resume story).
    Query("x119_loader_schedule",
      "WITH t AS (SELECT lang, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n " +
        "FROM documents WHERE text IS NOT NULL), " +
        s"s AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot FROM t " +
        "WHERE n > 0 GROUP BY lang), " +
        "ws AS (SELECT lang, CAST(floor(sqrt(CAST(tot AS DOUBLE) " +
        s"* 1099511627776)) AS BIGINT) AS w, (tot + ${W - 1}) // $W " +
        "AS nw FROM s), " +
        "rel AS (SELECT lang, unnest(range(nw)) AS k, w FROM ws), " +
        "v AS (SELECT lang, CAST(k AS BIGINT) AS k, " +
        "CAST(k + 1 AS DOUBLE) / CAST(w AS DOUBLE) AS vt FROM rel), " +
        "sched AS (SELECT lang, k, CAST(ROW_NUMBER() OVER (" +
        "ORDER BY vt, lang, k) AS BIGINT) AS step FROM v) " +
        "SELECT step, lang, k FROM sched ORDER BY step LIMIT 256") {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        table(s, d, "documents")
          .filter(col("text").isNotNull)
          .select(col("lang"),
            size(TextFns.tokens(col("text"))).cast("long").as("n"))
          .filter(col("n") > 0)
          .groupBy("lang").agg(sum(col("n")).as("tot"))
          .select(col("lang"),
            floor(sqrt(col("tot").cast("double") * 1099511627776L))
              .cast("long").as("w"),
            (floor((col("tot") + (W - 1)) / W).cast("long") - 1).as("mx"))
          .transform(windowUniverse)
          .select(col("lang"), col("w"), col("window_id").as("k"))
          .select(col("lang"), col("k"),
            ((col("k") + 1).cast("double") / col("w").cast("double"))
              .as("vt"))
          // TakeOrdered FIRST (map-local top-256, no global sort/
          // window over the O(windows) stream), then number the
          // bounded prefix — the unpartitioned row_number only ever
          // sees 256 rows
          .orderBy(col("vt"), col("lang"), col("k"))
          .limit(256)
          .withColumn("step", row_number().over(
            Window.orderBy(col("vt"), col("lang"), col("k"))).cast("long"))
          .select(col("step"), col("lang"), col("k"))
          .orderBy("step")
      }
    },

    // CURRICULUM ORDER — the quality-staged training order next to
    // x117's uniform shuffle: curricula feed cleaner data first
    // (stage 1 = least-repetitive quartile per shard) and shuffle
    // WITHIN each stage so a stage is not itself quality-sorted (the
    // anneal needs stage boundaries, not a global quality sort the
    // model would see as a drifting distribution). Score is the
    // exact-integer repetition count (tokens − distinct tokens, the
    // x38 signal); staging is ntile(4) per lang shard over (score,
    // doc_id); intra-stage order is x117's seeded md5 rank. Both
    // windows ride ONE lang exchange (same partition key). Scale: a
    // shard's curriculum IS a per-shard sort — the x117 doctrine —
    // and at trillion-token scale the shard key widens the same way;
    // nothing is global, nothing is corpus-wide single-task.
    Query("x123_curriculum_order", {
      val seeded = graft.functions.TextFns.Sql.md5Bits16(
        "md5('c#' || CAST(doc_id AS VARCHAR))")
      "WITH t AS (SELECT lang, doc_id, " +
        "CAST(len(string_split(text, ' ')) - " +
        "len(list_distinct(string_split(text, ' '))) AS BIGINT) AS rep " +
        "FROM documents WHERE text IS NOT NULL), " +
        "s AS (SELECT lang, doc_id, rep, CAST(ntile(4) OVER (" +
        "PARTITION BY lang ORDER BY rep, doc_id) AS BIGINT) AS stage " +
        "FROM t), " +
        "p AS (SELECT lang, doc_id, stage, CAST(ROW_NUMBER() OVER (" +
        s"PARTITION BY lang ORDER BY stage, $seeded, doc_id) AS BIGINT) " +
        "AS pos FROM s) " +
        "SELECT lang, pos, doc_id, stage FROM p ORDER BY lang, pos"
    }) {
      (s, d) => {
        val ts = TextFns.tokens(col("text"))
        val base = table(s, d, "documents")
          .filter(col("text").isNotNull)
          .select(col("lang"), col("doc_id"),
            (size(ts) - size(array_distinct(ts))).cast("long").as("rep"))
          .withColumn("stage", ntile(4).over(
            Window.partitionBy("lang").orderBy(col("rep"), col("doc_id")))
            .cast("long"))
        base.withColumn("pos", row_number().over(
            Window.partitionBy("lang").orderBy(col("stage"),
              TextFns.md5Bits16(
                concat(lit("c#"), col("doc_id").cast("string"))),
              col("doc_id"))).cast("long"))
          .select(col("lang"), col("pos"), col("doc_id"), col("stage"))
          .orderBy("lang", "pos")
      }
    },

    // SHARD EXPORT — the materialized training windows (see
    // [[ShardExport]]): the declared query reads the STORED per-shard
    // parquet back (never recomputes — the build cost sits in the
    // bench `build` section like every stored index) and exposes each
    // window's identity, length and md5 content key. The oracle
    // replays manifest + slice + doc_id-ordered concatenation
    // relationally, so the hash pins the exported BYTES end to end:
    // a shard writer that dropped, reordered or mis-sliced one span
    // changes some window's md5. Window length is exactly W except
    // each shard's final window (token conservation is spec-pinned in
    // ShardExportSpec).
    Query("x136_shard_export", {
      "WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "o AS (SELECT doc_id, lang, ts, len(ts) AS n, " +
        "CAST(COALESCE(SUM(len(ts)) OVER (PARTITION BY lang " +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "1 PRECEDING), 0) AS BIGINT) AS off " +
        "FROM t WHERE len(ts) > 0), " +
        s"e AS (SELECT lang, doc_id, ts, n, off, unnest(range(off // $W, " +
        s"(off + n - 1) // $W + 1)) AS window_id FROM o), " +
        "sg AS (SELECT lang, CAST(window_id AS BIGINT) AS window_id, " +
        "doc_id, list_slice(ts, " +
        s"CAST(greatest(0, window_id * $W - off) AS BIGINT) + 1, " +
        s"CAST(least(n, (window_id + 1) * $W - off) AS BIGINT)) AS sg " +
        "FROM e), " +
        "w AS (SELECT lang, window_id, " +
        "flatten(list(sg ORDER BY doc_id)) AS toks " +
        "FROM sg GROUP BY lang, window_id) " +
        "SELECT lang, window_id, CAST(len(toks) AS BIGINT) AS n_tok, " +
        "md5(array_to_string(toks, ' ')) AS w_md5 " +
        "FROM w ORDER BY lang, window_id"
    }) {
      (s, d) =>
        ShardExport.forDir(s, d).load("shards")
          .select(col("lang"), col("window_id"), col("n_tok"),
            col("w_md5"))
          .orderBy("lang", "window_id")
    })
}
