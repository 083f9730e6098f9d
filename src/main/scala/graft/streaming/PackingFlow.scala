package graft.streaming

import graft.tables.TableStore
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger}

/**
 * S19 — PACK-ON-INGEST: the streaming twin of x100's batch packing
 * manifest. Documents arriving on the ingest stream are assigned to
 * fixed-W-token training windows AS THEY ARRIVE: a per-shard (lang)
 * token-offset counter lives in typed ValueState, each batch's docs
 * extend the shard's window stream from wherever the previous batch
 * left it, and the (lang, window_id, doc_id, start_tok, end_tok) span
 * rows append to the `packing_manifest` table. A training job can
 * therefore start consuming windows while ingest is still running —
 * the batch x100 form requires the corpus to be complete first.
 *
 * Order contract: windows pack in ARRIVAL order (what a production
 * loader does — append order is pack order), with doc_id as the
 * deterministic tiebreak WITHIN a micro-batch (partition arrival
 * order is not deterministic; batch boundaries are, via the
 * checkpoint). Replays re-enter with the checkpoint-restored offset
 * and re-emit identical spans, which the manifest's doc_id anti-join
 * drops — at-least-once in, exactly-once manifest out.
 *
 * Scale: the state is ONE long per shard; per-batch work is
 * O(batch docs) arithmetic after a codegen tokenize (the text column
 * never enters the stateful operator — only (doc_id, lang, n) rows
 * do, so RocksDB sees ~24 bytes per doc per batch, not documents).
 */
object PackingFlow {

  final case class DocCount(doc_id: Long, lang: String, n: Long)
  final case class Span(lang: String, window_id: Long, doc_id: Long,
      start_tok: Long, end_tok: Long)

  final class Processor(w: Int)
      extends StatefulProcessor[String, DocCount, Span] {
    @transient private var off: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      off = getHandle.getValueState[Long]("off",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocCount],
        timerValues: TimerValues): Iterator[Span] = {
      var cur = if (off.exists()) off.get() else 0L
      val out = Seq.newBuilder[Span]
      // doc_id order within the batch: partition arrival order is
      // nondeterministic, batch boundaries are not
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        if (d.n > 0) {
          var k = cur / w
          val last = (cur + d.n - 1) / w
          while (k <= last) {
            out += Span(key, k, d.doc_id,
              math.max(0L, k * w - cur),
              math.min(d.n, (k + 1) * w - cur))
            k += 1
          }
          cur += d.n
        }
      }
      off.update(cur)
      out.result().iterator
    }
  }

  /** The span stream: (doc_id, lang, text) rows → tokenize (codegen,
    * outside the operator) → per-lang offset state → spans. */
  def spans(docs: DataFrame, w: Int = 256): Dataset[Span] = {
    implicit val enc = Encoders.product[Span]
    docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long"), col("lang").cast("string"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n"))
      .as[DocCount](Encoders.product[DocCount])
      .groupByKey(_.lang)(Encoders.STRING)
      .transformWithState(new Processor(w), TimeMode.None(),
        OutputMode.Append())
  }

  /** Operational flow: spans append once into `packing_manifest`
    * (doc_id anti-join dedup — a replayed batch re-derives identical
    * spans from the restored offset, so dropping seen doc_ids is
    * exact, not heuristic). */
  def flow(store: TableStore, docs: DataFrame, w: Int = 256,
      checkpointRoot: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    FlowRunner.start(store, checkpointRoot, trigger,
      spans(docs, w).toDF(), "packing") { batch =>
        val fresh =
          if (!store.exists("packing_manifest")) batch
          else batch.join(
            store.load("packing_manifest").select("doc_id").distinct(),
            Seq("doc_id"), "left_anti")
        if (!fresh.isEmpty) store.append("packing_manifest", fresh)
      }
}
