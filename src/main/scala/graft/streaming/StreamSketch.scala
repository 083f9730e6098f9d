package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming mergeable-sketch aggregation — approximate distinct users
 * per (event_type, event-time window), maintained as an HLL register
 * array in keyed state and emitted ONCE per window when the watermark
 * closes it.
 *
 * Why a sketch in state: exact streaming COUNT(DISTINCT) needs state
 * proportional to the number of distinct keys per window — at 100 TB/
 * day that is the cardinality being measured, i.e. unbounded. The HLL
 * register array is FIXED-SIZE (m = 256 bytes here, ±~6.5% standard
 * error) and MERGEABLE (register-wise max), so per-batch work folds
 * each micro-batch's values into O(1)-size state, state volume is
 * O(open windows × event types) regardless of traffic, and the same
 * registers could be merged ACROSS partitions or re-aggregated into
 * coarser windows without revisiting the stream — the property that
 * makes sketch state the only cluster-scale answer to streaming
 * distinct counting (same family as x48's batch HLL; this is its
 * unbounded-stream twin).
 *
 * Emission contract: append-mode finality, like a watermarked windowed
 * aggregation — nothing is emitted while a window can still receive
 * rows; when the event-time watermark passes the window end, the
 * EventTimeTimeout fires, the final estimate is emitted and the state
 * evicted. A straggler arriving after eviction re-opens the window and
 * yields a second (partial) row at its own close — the same windowed-
 * finality caveat as every watermark-bounded operator; downstream
 * consumers key on (event_type, window_start) and keep the max.
 */
object StreamSketch {

  /** Register count (2^8): 256 bytes of state per open window/key,
    * standard error 1.04/√m ≈ 6.5%. */
  private val B = 8
  private val M = 1 << B
  // bias-correction constant for m = 256 (Flajolet et al. '07)
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  final case class Observation(event_type: String, user_id: Long,
      wstart: Timestamp, wend: Timestamp, ts: Timestamp)
  final case class WindowSketch(registers: Array[Byte])
  final case class DistinctEstimate(event_type: String,
      window_start: Timestamp, approx_users: Long)

  /** splitmix64 finalizer — a full-avalanche 64-bit hash, deterministic
    * across JVMs (no seed, no object identity). */
  private def hash64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fold(regs: Array[Byte], userId: Long): Unit = {
    val h = hash64(userId)
    val idx = (h >>> (64 - B)).toInt // top B bits pick the register
    val rest = h << B // remaining 56 bits
    val rank = (if (rest == 0L) 64 - B else
      java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Classic HLL estimate with the small-range linear-counting
    * correction — near-exact for the low-cardinality windows small
    * fixtures produce, ±6.5% in the raw regime. */
  private[streaming] def estimate(regs: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    regs.foreach { r =>
      invSum += math.pow(2.0, -r.toDouble)
      if (r == 0) zeros += 1
    }
    val raw = Alpha * M * M / invSum
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(e)
  }

  /** Approximate distinct `user_id` per (event_type, tumbling window)
    * over an events-shaped stream (`ts`, `user_id`, `event_type`).
    * Emits one final row per closed window (append semantics). */
  def approxDistinctPerWindow(stream: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "10 minutes"): Dataset[DistinctEstimate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // the watermark is declared LAST, on the typed Dataset feeding
    // groupByKey: the event-time tag lives in column metadata, and an
    // object conversion between withWatermark and the stateful
    // operator would strip it ("Event-time timeout not supported
    // without watermark")
    val obs = stream
      .select(col("event_type"), col("user_id"),
        window(col("ts"), windowLength).as("w"), col("ts"))
      .select(col("event_type"), col("user_id"),
        col("w.start").as("wstart"), col("w.end").as("wend"), col("ts"))
      .as[Observation]
      .withWatermark("ts", watermark)
    obs.groupByKey(o => (o.event_type, o.wstart))
      .flatMapGroupsWithState[WindowSketch, DistinctEstimate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((eventType, wstart), rows,
            state: GroupState[WindowSketch]) =>
          if (state.hasTimedOut) {
            // watermark passed the window end: final emission + evict
            val est = estimate(state.get.registers)
            state.remove()
            Iterator.single(DistinctEstimate(eventType, wstart, est))
          } else {
            val regs = state.getOption
              .map(_.registers).getOrElse(new Array[Byte](M))
            var wend: Long = 0L
            rows.foreach { o =>
              fold(regs, o.user_id)
              wend = o.wend.getTime
            }
            state.update(WindowSketch(regs))
            // fire when the watermark passes the window end — the
            // watermark delay itself is the lateness slack
            state.setTimeoutTimestamp(wend)
            Iterator.empty
          }
      }
  }
}
