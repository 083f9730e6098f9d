package graft.streaming

import graft.multimodal.MediaPipeline
import graft.operators.{DedupQueries, KMeansQueries, MediaQueries, VectorIndex, VectorQueries}
import graft.tables.TableStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Dedup-on-ingest: the training-data pipeline's operational flows that
 * keep a growing corpus AND its derived dedup/ANN structures current
 * per micro-batch — the LLM-pipeline analogue of the reference's CDC
 * clone flow, which maintains a derived table alongside every write
 * (kafka-mongodb-connect.yaml:22-33).
 *
 * Two flows:
 *
 *  - [[documentIngestFlow]]: new (doc_id, text) rows append
 *    idempotently into the `documents` corpus table; the
 *    `dedup_decisions` DERIVED table (doc_id, cluster, canonical — the
 *    x34 near-dup clustering of the corpus as of this batch) is then
 *    recomputed, and each NEW doc's admit/drop verdict is emitted to
 *    the `ingest_log` (drop = the doc joined an existing cluster
 *    non-canonically, i.e. a near-dup of the stored corpus).
 *    Recomputing (not patching) the decision table is what makes its
 *    contents EXACTLY x34's canonical selection over the unioned
 *    corpus at every batch boundary — including the cluster-merge case
 *    where a new doc bridges two previously separate clusters and
 *    demotes one old canonical (an incremental patch would miss the
 *    demotion). The recompute is the quotient formulation: one narrow
 *    fingerprint scan + one ≤2¹⁶-row aggregate + driver union-find —
 *    per-batch cost is a codegen scan, not a pair graph.
 *
 *  - [[embeddingIngestFlow]]: new (vec_id, embedding) rows append into
 *    the parquet embeddings corpus and are routed into the STORED
 *    IVF + SRP indexes via the checked incremental-ingest APIs
 *    (frozen centroids / frozen planes, O(new rows), layout-compatible
 *    delta segments) — the serving indexes never go stale and never
 *    rebuild on the ingest path. Idempotence is content-level: a
 *    replayed batch anti-joins to empty against the corpus it already
 *    grew, so neither the corpus nor the indexes double-ingest.
 *
 * Admission semantics note: a doc's logged verdict is fixed at its
 * arrival batch. A LATER batch can demote an earlier canonical (its
 * cluster absorbed a smaller doc_id) — `dedup_decisions` always
 * reflects the current global truth, while `ingest_log` records what
 * was decided when; readers wanting the current drop list read the
 * decision table, not the log.
 *
 * Quality gate (r9): [[IngestQuality]] thresholds reject documents
 * BEFORE the corpus sees them — the x38-style repetition rule
 * (duplicate-5-gram fraction) and a minimum token count, both narrow
 * codegen maps over the batch only. A quality-rejected doc is never
 * appended, never fingerprints into the decision table, and logs
 * `(admitted=false, reason='quality')`; near-dup drops log
 * `reason='near_dup'`. A quality rejection is NOT final: the doc never
 * entered the corpus, so re-sending it with corrected content
 * re-evaluates the gate and an upsert supersedes the stale log row —
 * whereas admitted/near-dup docs are settled (they are in the corpus)
 * and re-sends of them are dropped. The default gate is permissive
 * (admit all) so dedup-only deployments are unchanged.
 *
 * Decontamination gate (r13): with `contaminationDir` set, a
 * quality-passing doc sharing any exact 8-token shingle with that
 * benchmark corpus's val/test split is rejected at the door with
 * reason `contamination` (x86's transform applied at ingest time) —
 * hash-probe of the stored ex8h index + exact-string recheck, both
 * retryable like quality rejections.
 *
 * Source-cap gate (r14): with `sourceCapPct` set, the input schema
 * grows a `source` column and x121's crawl-budget contract is
 * enforced AT THE DOOR: a source's admitted character mass may not
 * exceed sourceCapPct% of total admitted mass. Per batch the cap is
 * evaluated against the snapshot (corpus as of the previous batch
 * boundary + this batch's cap-eligible mass); within the batch each
 * source admits docs in x121's deterministic md5(doc_id) order until
 * its allowance binds — refusals log reason `source_cap` and are
 * RETRYABLE (the doc never entered the corpus; once OTHER sources
 * grow the total, a re-send can fit — the crawl-budget semantics).
 * Documented bound: the cap denominator counts cap-eligible batch
 * mass BEFORE this batch's own refusals (the admitted-only
 * denominator is a fixpoint), so a source can overshoot its true
 * share by at most sourceCapPct% of the batch's refused mass —
 * vanishing at production batch-to-corpus ratios, and never
 * compounding (the next batch re-evaluates against the real corpus).
 * Crash window: the corpus-side mass anti-joins this batch's ids out
 * first, so a replay after "corpus appended, verdict lost" cannot
 * count a doc's own appended mass against its re-evaluation (the
 * media gate's self-match lesson).
 */
final class IngestionFlows(spark: SparkSession, store: TableStore,
    embCorpusDir: String,
    checkpointRoot: Option[String] = None,
    trigger: Trigger = Trigger.AvailableNow(),
    quality: IngestQuality = IngestQuality(),
    spanCleanN: Option[Int] = None,
    contaminationDir: Option[String] = None,
    sourceCapPct: Option[Int] = None) {
  import spark.implicits._

  private def start(df: DataFrame, name: String)(
      body: DataFrame => Unit): StreamingQuery =
    FlowRunner.start(store, checkpointRoot, trigger, df, name)(body)

  /** New documents → quality gate → corpus + recomputed dedup
    * decisions + per-doc admit/drop log. Input schema: (doc_id long,
    * text string). */
  def documentIngestFlow(newDocs: DataFrame): StreamingQuery = {
    require(sourceCapPct.isEmpty || newDocs.columns.contains("source"),
      "sourceCapPct requires a `source` column on the ingest input")
    start(newDocs, "document_ingest") { batch0 =>
      // which of the batch are genuinely new: a doc is settled once its
      // VERDICT is logged — the ingest_log is written LAST, so a batch
      // that crashed mid-way (corpus appended, derived writes lost)
      // replays in full. Every write below is key-idempotent
      // (appendUnique/upsert) or a derived-table recompute, so
      // reprocessing an already-appended doc is harmless; keying
      // freshness off the FIRST write (the corpus) instead would make
      // that crash-replay a silent no-op that permanently loses the
      // doc's verdict. QUALITY rejections are NOT settled: the doc
      // never reached the corpus, so a re-send with corrected content
      // re-enters the gate (and its log row is superseded via upsert
      // below) instead of being permanently anti-joined away. The
      // anti-join runs FIRST so the gate and the dedup window below
      // cost O(new rows), not O(batch), on replay-heavy batches.
      // quality AND contamination rejections are retryable (the doc
      // never entered the corpus); admitted/near-dup verdicts settle
      val unsettled =
        if (!store.exists("ingest_log")) batch0
        else batch0.join(store.load("ingest_log")
          .filter(col("reason").isNull ||
            !col("reason").isin("quality", "contamination", "source_cap"))
          .select("doc_id"), Seq("doc_id"), "left_anti")
      // quality gate (x38's repetition rule + a token-count floor, one
      // codegen map) evaluated ONCE per row; then deterministic
      // in-batch dedup — a micro-batch can carry several sends of a
      // doc_id (a stale row AND its correction), so prefer the
      // gate-PASSING row, then the longest text, then lexicographic:
      // the corrected-re-send contract must not depend on partition
      // order (a bare dropDuplicates picks an arbitrary winner). One
      // persisted frame feeds the corpus append AND the new-doc log.
      val batch = graft.tables.MergeOps.dedupBy(
        unsettled.withColumn("_fail", quality.failure(col("text"))),
        Seq("doc_id"), Seq(
          col("_fail").isNotNull.cast("int"),
          coalesce(length(col("text")), lit(-1)).desc,
          col("text").asc_nulls_last)).persist()
      try {
        val docCols = if (sourceCapPct.isDefined)
          Seq(col("doc_id"), col("text"), col("source"))
        else Seq(col("doc_id"), col("text"))
        val clean = batch.filter(col("_fail").isNull)
          .select(docCols: _*)
        val rejected = batch.filter(col("_fail").isNotNull)
          .select(col("doc_id"), lit(false).as("admitted"),
            col("_fail").as("reason"))
        // eval-decontamination gate (r13): refuse contaminated docs at
        // the door the way near-dups are refused — x86's batch
        // transform moved to ingest time. A quality-passing doc
        // sharing ANY exact 8-token shingle with the benchmark
        // corpus's val/test split is rejected with reason
        // `contamination` and never reaches `documents`. Probe shape
        // is x36/x86's: hash-probe the STORED ex8h index (built once
        // per benchmark version — the benchmark is immutable during
        // ingest, so every batch reuses it), then re-verify hash
        // candidates against exact shingle STRINGS pruned to the
        // candidate hashes — collision-proof, cost ∝ actual
        // contamination, and the per-batch side only ever explodes
        // the BATCH. Like quality, the rejection is retryable (a
        // corrected re-send re-enters the gate) and its log row
        // upserts over any stale verdict.
        val contamIds = contaminationDir.map { cd =>
          val ex = graft.operators.ShingleIndex.forDir(spark, cd)
            .load("ex8h").filter(col("split") =!= "train")
          val freshSh = clean.filter(col("text").isNotNull)
            .select(col("doc_id"),
              graft.functions.TextFns.tokens(col("text")).as("ts"))
            .filter(size(col("ts")) >= 8)
            .select(col("doc_id"), explode(
              graft.functions.TextFns.shingles(col("ts"), 8)).as("g"))
            .withColumn("h", xxhash64(col("g")))
          val candRows = freshSh
            .join(ex.select("h").distinct(), Seq("h"), "left_semi")
          val candH = candRows.select("h").distinct()
          val evalDocs = ex.join(candH, Seq("h"), "left_semi")
            .select("doc_id").distinct()
          // exact-string recheck — the ONE ex8h recheck definition
          // (ShingleIndex.candidateShingles), shared with x36/x86 so
          // shingle width and hash cannot drift between the audit,
          // the transform and this gate
          val evalStr = graft.operators.ShingleIndex
            .candidateShingles(spark, cd, evalDocs, candH)
            .select("g").distinct()
          // persisted for the batch's duration: the anti-join below,
          // the emptiness probe, the log write and the admitted join
          // all reference it — unpersisted at the END of the batch
          // body (an early unpersist would re-run the whole probe,
          // benchmark scan included, for every later reference)
          candRows.join(evalStr, Seq("g"), "left_semi")
            .select("doc_id").distinct().persist()
        }
        try {
          val fresh0 = contamIds.fold(clean)(ids =>
            clean.join(ids, Seq("doc_id"), "left_anti"))
          // source-cap gate (r14): x121's crawl-budget contract at the
          // door. Corpus-side masses EXCLUDE this batch's ids (crash-
          // window replay: "corpus appended, verdict lost" must not
          // count a doc's own appended mass against its re-
          // evaluation); the two denominators are 1-row collects and
          // the per-source table is one map-side-combined aggregate.
          // Within the batch each source admits in x121's
          // deterministic md5(doc_id) order until cumulative mass
          // would pass the allowance. `scored` is persisted for the
          // batch body (the keep filter, the refusal log and the
          // emptiness probes all reference it — recomputing would
          // re-run the corpus-side aggregate per reference).
          val scoredOpt: Option[DataFrame] = sourceCapPct.map { pct =>
            import org.apache.spark.sql.expressions.Window
            val mass = length(coalesce(col("text"), lit(""))).cast("long")
            val prior =
              if (!store.exists("documents")) None
              else {
                val c = store.load("documents")
                // fail with a pointed message, not a mid-plan analysis
                // error, when the gate is turned on over a corpus that
                // predates it (rows appended without a source column)
                require(c.columns.contains("source"),
                  "sourceCapPct set but the existing `documents` corpus " +
                    "has no `source` column — the gate needs per-source " +
                    "masses; rebuild or backfill the corpus with sources")
                Some(c.join(fresh0.select("doc_id"), Seq("doc_id"),
                  "left_anti"))
              }
            val priorTotal: Long = prior
              .map(_.agg(coalesce(sum(mass), lit(0L)).as("t"))
                .collect()(0).getLong(0)).getOrElse(0L)
            val batchTotal: Long = fresh0
              .agg(coalesce(sum(mass), lit(0L)).as("t"))
              .collect()(0).getLong(0)
            val cap = (priorTotal + batchTotal) * pct / 100
            val srcMass = prior.map(_.groupBy("source")
              .agg(sum(mass).as("_cm")))
            val scored0 = fresh0.withColumn("_bcum", sum(mass).over(
              Window.partitionBy("source")
                .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
            srcMass.fold(scored0.withColumn("_cm", lit(0L)))(m =>
                scored0.join(graft.operators.PlanGuards.broadcastIfSmall(m),
                  Seq("source"), "left_outer")
                  .withColumn("_cm", coalesce(col("_cm"), lit(0L))))
              .withColumn("_kept", col("_cm") + col("_bcum") <= cap)
              .persist()
          }
          try {
          val fresh = scoredOpt.fold(fresh0)(sc => sc.filter(col("_kept"))
            .select(fresh0.columns.map(col).toIndexedSeq: _*))
          store.appendUnique("documents", fresh, Seq("doc_id"))
          // upsert, not appendUnique: a retryable rejection must
          // SUPERSEDE a stale retryable row in either direction —
          // appendUnique would leave a doc whose contamination
          // rejection was followed by a quality-failing re-send
          // permanently logged as "contamination"
          if (!rejected.isEmpty)
            store.upsert("ingest_log", rejected, Seq("doc_id"))
          contamIds.foreach { ids =>
            if (!ids.isEmpty)
              store.upsert("ingest_log", ids
                .select(col("doc_id"), lit(false).as("admitted"),
                  lit("contamination").as("reason")), Seq("doc_id"))
          }
          scoredOpt.foreach { sc =>
            val refused = sc.filter(!col("_kept")).select("doc_id")
            if (!refused.isEmpty)
              store.upsert("ingest_log", refused
                .select(col("doc_id"), lit(false).as("admitted"),
                  lit("source_cap").as("reason")), Seq("doc_id"))
          }
        if (!fresh.isEmpty) {
          // recompute the derived decision table on the grown corpus
          // — per-batch cost: one narrow codegen scan + bounded agg
          val decisions = DedupQueries.quotientClusters(spark,
            DedupQueries.simhashFpsOf(store.load("documents")))
          store.replace("dedup_decisions", decisions)
          // the new docs' verdicts: a new doc is DROPPED iff the
          // current clustering marks it non-canonical (near-dup of a
          // smaller-id doc); docs outside any cluster are admitted
          val admitted = fresh.select(col("doc_id"))
            .join(store.load("dedup_decisions")
              .select(col("doc_id"), col("canonical")),
              Seq("doc_id"), "left_outer")
            .select(col("doc_id"),
              coalesce(col("canonical"), lit(true)).as("admitted"),
              when(not(coalesce(col("canonical"), lit(true))),
                lit("near_dup")).as("reason"))
          // upsert, not appendUnique: a doc whose earlier quality
          // rejection was corrected by this batch has a stale
          // (admitted=false,'quality') row to supersede
          store.upsert("ingest_log", admitted, Seq("doc_id"))
          // optional span-clean gate (the x85/SpanDedup transform as a
          // maintained derived table): `documents_clean` is the
          // cross-doc repeated-span-excised view of the corpus as of
          // this batch boundary. Recomputed, not patched, for the same
          // reason as dedup_decisions: a new doc can introduce NEW
          // duplication that excises spans from previously-clean rows,
          // and a new doc with a smaller doc_id can even take
          // ownership of a span an older doc kept — both cases mutate
          // OLD output rows, which a patch would miss.
          spanCleanN.foreach { ng =>
            store.replace("documents_clean",
              graft.operators.SpanDedup.cleanedCorpus(
                store.load("documents"), ng))
          }
        }
          } finally { scoredOpt.foreach { sc => sc.unpersist(); () } }
        } finally { contamIds.foreach { ids => ids.unpersist(); () } }
      } finally { batch.unpersist(); () }
    }
  }

  /** New embeddings → parquet corpus + incremental ingest into the
    * stored IVF and SRP indexes. Input schema: (vec_id long,
    * embedding array<float>). */
  def embeddingIngestFlow(newEmbs: DataFrame): StreamingQuery =
    start(newEmbs, "embedding_ingest") { batch =>
      val corpus = s"$embCorpusDir/embeddings.parquet"
      val existing =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(corpus)))
          Some(spark.read.parquet(corpus))
        else None
      // content-level idempotence: drop vectors the corpus already
      // holds, so a replayed batch appends nothing and ingests nothing
      val fresh0 = batch.dropDuplicates("vec_id")
      val antiJoined = existing
        .map(c => fresh0.join(c.select("vec_id"), Seq("vec_id"), "left_anti"))
        .getOrElse(fresh0)
      // STAGE the delta before touching the corpus: appending to the
      // corpus path refreshes it and invalidates every plan (cached or
      // not) whose lineage reads that path — which the anti-join does.
      // A scratch materialization breaks the lineage, so the delta the
      // indexes ingest is fixed before the corpus grows. O(batch).
      val scratch = graft.tables.TempDirs.scratch("graft-emb-delta")
      antiJoined.write.parquet(s"$scratch/delta")
      val fresh = spark.read.parquet(s"$scratch/delta")
      try {
        if (fresh.head(1).nonEmpty) {
          // corpus first, then the indexes — the order the checked
          // ingest contract requires (covered + delta == corpus rows)
          fresh.write.mode("append").parquet(corpus)
          VectorIndex.ingest(spark, embCorpusDir, fresh)
          VectorIndex.srpIngest(spark, embCorpusDir, fresh,
            VectorQueries.srpIndexRows)
          // incremental topic assignment (the x26-profile lifecycle):
          // centroids are trained ONCE (first batch, on the corpus as
          // of that batch) and FROZEN in the `topic_centroids` stored
          // table; every later batch assigns its new vectors against
          // the stored model — no retrain on the ingest path, so
          // x114-style balanced sampling over `topic_assignments`
          // stays current while ingest runs (periodic retraining is a
          // batch-boundary decision, not an ingest side effect).
          // Assignment is the same join-free literal-centroid argmin
          // the declared x111/x114/x115 queries use; appendUnique
          // keeps crash replays no-ops. The k-row centroid collect is
          // bounded by construction.
          val cents: Array[Array[Long]] =
            if (store.exists("topic_centroids"))
              store.load("topic_centroids").orderBy("cid").collect()
                .map(_.getSeq[Long](1).toArray)
            else {
              val c = KMeansQueries.train(spark, embCorpusDir)
              store.replace("topic_centroids",
                c.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
                  .toSeq.toDF("cid", "c"))
              c
            }
          // SELF-HEALING assignment sweep: assign every corpus vector
          // still missing from the table, not just this batch's rows —
          // a batch that crashed between the corpus append and this
          // write would otherwise leave its vectors permanently
          // unassigned (the content anti-join makes the replay a
          // corpus no-op, so a fresh-only write never revisits them).
          // Cost: one anti-join against the assignment keys per batch,
          // same order as the content-idempotence anti-join above;
          // output is O(missing), normally just the batch.
          val corpusNow = spark.read.parquet(corpus)
          val unassigned =
            if (!store.exists("topic_assignments")) corpusNow
            else corpusNow.join(
              store.load("topic_assignments").select("vec_id"),
              Seq("vec_id"), "left_anti")
          store.appendUnique("topic_assignments",
            unassigned.select(col("vec_id"),
              KMeansQueries.assignCid(cents,
                KMeansQueries.quantExpr(col("embedding"))).as("cid")),
            Seq("vec_id"))
          ()
        }
      } finally { graft.tables.TempDirs.delete(scratch); () }
    }

  /** New MEDIA documents → parse/fingerprint gate → media corpus +
    * per-doc admit/refuse log — the media sibling of
    * [[documentIngestFlow]]'s near-dup gate: a real crawl pipeline
    * gates EVERY modality at the door, not just text. Input schema:
    * (doc_id long, payload binary).
    *
    * Gate semantics, per batch:
    *  - payloads are fingerprinted INSIDE one narrow mapPartitions
    *    ([[MediaPipeline.mediaFp]] — the same signature definitions
    *    the batch pair queries x98/x110/x112/x113 ride, so the gate
    *    and the audit cannot drift); payload bytes never reach a
    *    wide operator, only (doc_id, kind, fp) flows into the probe.
    *  - undecodable/foreign bytes → refused `media_unreadable`
    *    (MediaCodec parsers are total — corrupt bytes refuse, never
    *    throw).
    *  - a doc whose 64-bit fingerprint lands within Hamming ≤ 2 of an
    *    ADMITTED same-kind doc → refused `media_near_dup`. Probe
    *    shape: the x25/x98 quotient technique with the sides swapped
    *    to fit ingest — the BATCH side explodes into its 2081 ≤2-bit
    *    XOR neighbors ([[MediaQueries.hamming2Masks]]) and is
    *    BROADCAST; the stored `media_fps` table is equi-join-probed
    *    in one scan per batch. The corpus-sized side never explodes
    *    and never shuffles — the shape that survives a growing
    *    corpus.
    *  - in-batch near-dups: among gate survivors, a doc within ≤ 2 of
    *    a smaller-id readable batch doc is refused (deterministic:
    *    the smallest id of a near-dup chain is admitted; later chain
    *    members refuse even when their direct partner was itself
    *    refused — conservative, content is represented by the chain
    *    head).
    *  - verdict lifecycle mirrors the text gate: ADMITTED docs settle
    *    (re-sends anti-join away before any decode cost); refusals
    *    are RETRYABLE — a re-send with corrected bytes re-enters the
    *    gate and its log row upserts over the stale verdict. Every
    *    write is key-idempotent, so crash replays are no-ops. */
  def mediaIngestFlow(newMedia: DataFrame): StreamingQuery =
    start(newMedia, "media_ingest") { batch0 =>
      val unsettled =
        if (!store.exists("media_ingest_log")) batch0
        else batch0.join(store.load("media_ingest_log")
          .filter(col("admitted")).select("doc_id"), Seq("doc_id"),
          "left_anti")
      // deterministic in-batch winner per doc_id (a stale send AND its
      // correction can share a micro-batch): longest payload, then
      // digest order — never partition order
      val batch = graft.tables.MergeOps.dedupBy(unsettled, Seq("doc_id"),
        Seq(coalesce(length(col("payload")), lit(-1)).desc,
          md5(col("payload")).asc_nulls_last)).persist()
      try {
        val sigs = batch.select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            MediaPipeline.mediaFp(
              Option(bytes).getOrElse(Array.emptyByteArray)) match {
              case Some((kind, fp)) => (id, kind, fp)
              case None => (id, null.asInstanceOf[String], 0L)
            }
          }).toDF("doc_id", "kind", "fp").persist()
        try {
          val unreadable = sigs.filter(col("kind").isNull).select("doc_id")
          val readable = sigs.filter(col("kind").isNotNull)
          val maskArr = array(MediaQueries.hamming2Masks
            .map(lit).toIndexedSeq: _*)
          val nbrs = readable
            .select(col("doc_id"), col("kind"), col("fp"),
              explode(maskArr).as("m"))
            .select(col("doc_id"), col("kind"),
              col("fp").bitwiseXOR(col("m")).as("probe"))
          val storedHits =
            if (!store.exists("media_fps"))
              readable.select("doc_id").limit(0)
            else store.load("media_fps").as("s")
              .join(broadcast(nbrs).as("n"),
                col("s.fp") === col("n.probe") &&
                  col("s.kind") === col("n.kind") &&
                  // never match a doc against its OWN stored row: a
                  // batch that crashed between the fps append and the
                  // log write replays its docs, and without this guard
                  // each would refuse as a near-dup of itself while
                  // sitting in the corpus — the log would then
                  // permanently contradict media_docs
                  col("s.doc_id") =!= col("n.doc_id"))
              .select(col("n.doc_id").as("doc_id")).distinct()
          val surv = readable.join(storedHits, Seq("doc_id"), "left_anti")
          val inBatch = surv.as("a")
            .join(broadcast(nbrs).as("n"),
              col("a.fp") === col("n.probe") &&
                col("a.kind") === col("n.kind") &&
                col("a.doc_id") < col("n.doc_id"))
            .select(col("n.doc_id").as("doc_id")).distinct()
          val admitted = surv.join(inBatch, Seq("doc_id"), "left_anti")
          store.appendUnique("media_docs",
            batch.join(admitted.select("doc_id"), Seq("doc_id"),
              "left_semi").select("doc_id", "payload"), Seq("doc_id"))
          store.appendUnique("media_fps",
            admitted.select("doc_id", "kind", "fp"), Seq("doc_id"))
          val log = admitted
            .select(col("doc_id"), lit(true).as("admitted"),
              lit(null).cast("string").as("reason"))
            .unionByName(storedHits.unionByName(inBatch).distinct()
              .select(col("doc_id"), lit(false).as("admitted"),
                lit("media_near_dup").as("reason")))
            .unionByName(unreadable
              .select(col("doc_id"), lit(false).as("admitted"),
                lit("media_unreadable").as("reason")))
          if (!log.isEmpty)
            store.upsert("media_ingest_log", log, Seq("doc_id"))
        } finally { sigs.unpersist(); () }
      } finally { batch.unpersist(); () }
    }
}

/** Admission thresholds for [[IngestionFlows.documentIngestFlow]]:
  * reject when the token count is under `minTokens` or the
  * duplicate-5-gram fraction (x38's repetition rule) exceeds
  * `maxRepetition`. The default admits everything — an inactive rule
  * contributes no predicate, so null-text docs pass a permissive gate
  * exactly as they did before the gate existed. */
object IngestionFlows {

  /** Explicit batch-boundary RETRAIN of the frozen topic model — the
    * other half of [[IngestionFlows.embeddingIngestFlow]]'s freeze
    * doctrine (ingest never retrains; an operator decides when the
    * corpus has drifted enough to re-cluster). Re-trains k-means on
    * the CURRENT embeddings corpus (the per-(corpus version, params)
    * cache makes repeat calls on an unchanged corpus free), REPLACES
    * `topic_centroids`, and recomputes `topic_assignments` for every
    * corpus vector under the new model — replace, not patch: an
    * assignment is a function of the model, so a model change
    * invalidates all of them (cid spaces of different models are not
    * comparable). The ingest flow reads the centroid table each
    * batch, so the next micro-batch assigns under the refreshed model
    * automatically. Not atomic against a concurrently-triggering
    * ingest batch — slot it between triggers, the
    * purge → quiesce → verify discipline ([[graft.tables.Gdpr]]). */
  def refreshTopics(spark: SparkSession, store: TableStore,
      embCorpusDir: String,
      p: KMeansQueries.KMeansParams = KMeansQueries.KMeansParams()): Unit = {
    import spark.implicits._
    val cents = KMeansQueries.train(spark, embCorpusDir, p)
    store.replace("topic_centroids",
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
        .toSeq.toDF("cid", "c"))
    store.replace("topic_assignments",
      spark.read.parquet(s"$embCorpusDir/embeddings.parquet")
        .select(col("vec_id"),
          KMeansQueries.assignCid(cents,
            KMeansQueries.quantExpr(col("embedding"))).as("cid")))
  }
}

final case class IngestQuality(minTokens: Int = 0,
    maxRepetition: Double = 1.0) {

  /** Null when the text passes, the rejection reason otherwise —
    * one codegen map over the batch, no shuffle. */
  private[streaming] def failure(text: Column): Column = {
    val ts = graft.functions.TextFns.tokens(text)
    val nTok = size(ts)
    val nGrams = greatest(nTok - 4, lit(0))
    val rep = when(nGrams > 0, lit(1) -
      size(graft.functions.TextFns.shingles(ts, 5)).cast("double") / nGrams)
      .otherwise(lit(0.0))
    val tokFail =
      if (minTokens > 0) text.isNull || nTok < minTokens else lit(false)
    val repFail =
      if (maxRepetition < 1.0) text.isNotNull && rep > maxRepetition
      else lit(false)
    when(tokFail || repFail, lit("quality"))
  }
}
