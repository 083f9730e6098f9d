package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S9 — event-time windowed aggregation with watermark-based late-data
 * handling (capability extension; the reference has no time semantics
 * at all — Kafka consumption is arrival-ordered). Batch twin: Q15.
 *
 * All three window shapes over the `events` schema
 * (ts, event_type, value):
 *  - tumbling: non-overlapping fixed windows
 *  - sliding: overlapping windows (slide < width)
 *  - session: gap-based dynamic windows
 *
 * The watermark bounds state: aggregation state for windows older than
 * max(event time) − delay is finalized and dropped, and events arriving
 * later than that are discarded — this is what makes unbounded streams
 * feasible at scale (state size ∝ active windows, not stream length).
 */
object EventWindows {

  /** value sums go through DECIMAL for the same order-independence the
    * batch corpus uses. */
  private def stats = Seq(
    count(lit(1)).as("n"),
    sum(col("value").cast("decimal(18,6)")).cast("double").as("s"))

  def tumbling(events: DataFrame, width: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(stats.head, stats.tail: _*)
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("s"))

  def sliding(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(stats.head, stats.tail: _*)
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("s"))

  def session(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("event_type"))
      .agg(stats.head, stats.tail: _*)
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("s"))
}
