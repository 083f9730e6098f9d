package graft.streaming

import graft.tables.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dead-letter replay — the second half of the quarantine story. The
 * flows route undecodable CDC payloads into `dead_letter` instead of
 * the reference's no-ack poison-retry loop (inventario/main.go:70-79);
 * this operator drains that quarantine AFTER a codec fix: re-parse
 * each quarantined payload, hand the now-decodable rows to the flow's
 * own merge body, and remove exactly those payloads from the table —
 * still-undecodable rows stay put for the next fix.
 *
 * Idempotence comes from composition, not bookkeeping: the merge
 * bodies are the same key-idempotent MERGE primitives the flows run
 * (a crash between apply and the quarantine rewrite replays rows into
 * MERGEs that drop them as duplicates), and a second replay finds the
 * drained rows gone. The quarantine rewrite is an anti-join + replace
 * — O(dead_letter), which is small BY DESIGN (it holds only broken
 * payloads); if a deployment ever floods it, compaction and the
 * vacuum horizon already bound it like any other table.
 *
 * Single-writer contract: replay is an operator-invoked maintenance
 * action; run it while the owning flow is quiescent (the same
 * convention as every snapshot-rewriting write in the store).
 */
object DeadLetterReplay {

  /** Drain `flow`'s quarantine through `parse` (raw `value` column in,
    * typed rows + `raw` column out, undecodable rows carrying a null
    * `id` — the CdcCodec contract). `parse` MUST echo the input value
    * verbatim as `raw` (every CdcCodec parser does): the drain removes
    * quarantine rows by matching that echo, so a codec that mutates
    * the payload before parsing would strand its drained rows. Fix
    * codecs by parsing differently, not by rewriting the payload.
    * Decodable rows go to `apply`; returns how many were replayed. */
  def replay(store: TableStore, flow: String,
      parse: DataFrame => DataFrame)(apply: DataFrame => Unit): Long = {
    if (!store.exists("dead_letter")) return 0L
    val mine = store.load("dead_letter").filter(col("flow") === flow)
    val parsed = parse(mine.select(col("raw").as("value"))).persist()
    try {
      val good = parsed.filter(col("id").isNotNull)
      val n = good.count()
      if (n > 0L) {
        apply(good)
        // remove exactly the drained payloads; other flows' rows and
        // still-bad rows survive untouched
        val kept = store.load("dead_letter")
          .join(good.select(lit(flow).as("flow"), col("raw")),
            Seq("flow", "raw"), "left_anti")
        store.replace("dead_letter", kept)
      }
      n
    } finally { parsed.unpersist(); () }
  }
}
