package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming heavy hitters — SpaceSaving (Metwally/Agrawal/El Abbadi
 * '05) counters in keyed state, the bounded-memory answer to "top
 * users right now" over an unbounded stream (the streaming twin of
 * x57's batch count-min sketch, with the opposite trade: CMS answers
 * point frequency queries for ANY key, SpaceSaving maintains the top
 * set itself).
 *
 * Why counters, not counts: exact per-user streaming counts need state
 * linear in the number of distinct users — the quantity being ranked.
 * SpaceSaving keeps a FIXED number m of (id, count, err) slots: a
 * present id increments; a new id with free capacity takes a slot; a
 * new id at capacity EVICTS the minimum-count slot and inherits its
 * count as overestimation error. Guarantees (spec-pinned): estimates
 * only overestimate, `est − err ≤ true ≤ est`, and any id whose true
 * frequency exceeds N/m is guaranteed present — so with m sized a
 * constant factor above k, the reported top-k is exact for skewed
 * traffic at 3 longs × m per key of state, independent of stream
 * length or user cardinality.
 *
 * Emission: Update mode — after each micro-batch, each touched key
 * re-emits its current top-k tagged with `n_seen` (that key's total
 * processed rows), so consumers (and tests) pick the freshest card by
 * max n_seen. Eviction ties break on the smallest id for
 * deterministic replay.
 */
object StreamTopK {

  final case class TopHitter(event_type: String, user_id: Long,
      est_count: Long, err: Long, n_seen: Long)
  final case class SSState(ids: Array[Long], counts: Array[Long],
      errs: Array[Long], seen: Long)

  /** Maintain SpaceSaving top-`k` user_ids per event_type with
    * `capacity` counter slots per key. */
  def spaceSavingTopK(stream: DataFrame, capacity: Int = 64,
      k: Int = 10): Dataset[TopHitter] = {
    require(capacity >= k, "capacity must be at least k")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("event_type"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SSState, TopHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (eventType, rows, state: GroupState[SSState]) =>
          // unpack into a mutable map bounded by `capacity`
          val counts = new scala.collection.mutable.LongMap[(Long, Long)]()
          var seen = 0L
          state.getOption.foreach { s =>
            seen = s.seen
            var i = 0
            while (i < s.ids.length) {
              counts(s.ids(i)) = (s.counts(i), s.errs(i))
              i += 1
            }
          }
          rows.foreach { case (_, uid) =>
            seen += 1
            counts.get(uid) match {
              case Some((c, e)) => counts(uid) = (c + 1, e)
              case None if counts.size < capacity => counts(uid) = (1L, 0L)
              case None =>
                // evict the min-count slot (smallest id on ties) and
                // inherit its count as this id's overestimation error
                val (vid, (vc, _)) = counts.minBy { case (id, (c, _)) =>
                  (c, id)
                }
                counts.remove(vid)
                counts(uid) = (vc + 1, vc)
            }
          }
          val entries = counts.toArray
          state.update(SSState(entries.map(_._1),
            entries.map(_._2._1), entries.map(_._2._2), seen))
          entries.sortBy { case (id, (c, _)) => (-c, id) }.take(k)
            .iterator.map { case (id, (c, e)) =>
              TopHitter(eventType, id, c, e, seen)
            }
      }
  }
}
