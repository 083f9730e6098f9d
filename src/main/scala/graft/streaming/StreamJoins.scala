package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream interval joins — the streaming operator class the
 * stream-static flows (Flows.scala, all `foreachBatch` against table
 * snapshots) don't touch: BOTH sides are unbounded, so the engine must
 * buffer each side in state and expire rows by event-time watermark.
 *
 * Domain story: the reference's saga confirms a reservation and then
 * emits a notification (S2/S7); the natural extension is matching each
 * reservation request against its payment confirmation arriving on a
 * separate topic within a bounded window — the classic two-topic
 * correlation the reference would have to hand-roll with a per-key
 * cache and a sweeper. Here it is one declarative join:
 *
 *  - the interval condition (`pay_ts ∈ [req_ts, req_ts + within]`)
 *    bounds BOTH buffers: a request can be dropped from state once the
 *    payment-side watermark passes `req_ts + within`, a payment once
 *    the request-side watermark passes `pay_ts` — Spark derives both
 *    expiries from the condition, so state size is O(in-flight
 *    window), not O(stream history);
 *  - the left-outer variant emits the unmatched request with NULL
 *    payment columns ONLY after its match window expires (watermark
 *    semantics — not "no match yet", but "no match can ever come"),
 *    which is exactly the abandoned-reservation feed the cancellation
 *    flow (S3) wants.
 *
 * At 100 TB/day scale both sides shuffle on the join key; state lives
 * in the per-partition store (RocksDB in the streaming benches) and
 * the watermark gives the engine permission to reclaim it — the same
 * bounded-state argument as the S8 windowed aggregation.
 */
object StreamJoins {

  /** Inner interval join: (request, payment) pairs matched within
    * `within` of the request's event time. */
  def paymentMatch(requests: DataFrame, payments: DataFrame,
      watermark: String = "30 seconds",
      within: String = "10 minutes"): DataFrame = {
    val r = requests.withWatermark("req_ts", watermark)
    val p = payments.withWatermark("pay_ts", watermark)
    r.join(p, expr(
      s"""req_id = pay_req AND
          pay_ts >= req_ts AND
          pay_ts <= req_ts + interval $within"""))
  }

  /** Left-outer variant: additionally emits each request whose match
    * window expired with no payment (NULL payment columns) — the
    * abandoned-reservation feed. Emission happens when the watermark
    * passes `req_ts + within`, i.e. when no on-time payment can still
    * arrive. */
  def paymentMatchOrExpired(requests: DataFrame, payments: DataFrame,
      watermark: String = "30 seconds",
      within: String = "10 minutes"): DataFrame = {
    val r = requests.withWatermark("req_ts", watermark)
    val p = payments.withWatermark("pay_ts", watermark)
    r.join(p, expr(
      s"""req_id = pay_req AND
          pay_ts >= req_ts AND
          pay_ts <= req_ts + interval $within"""), "left_outer")
  }
}
