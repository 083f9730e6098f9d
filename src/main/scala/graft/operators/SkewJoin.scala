package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys (SURVEY §4.3). AQE's skew-join
 * handles shuffle-join skew at runtime, but it cannot help when the
 * skewed side is a stream (no runtime stats before the batch runs) or
 * when one hot key exceeds what a single task can hold even after AQE
 * splitting. The classic fix is explicit: spread the hot side's rows
 * over `buckets` sub-keys and replicate the other side once per
 * sub-key, turning one straggler partition into `buckets` even ones.
 *
 * `saltedJoin(left, right, keys, buckets)`:
 *  - left (the SKEWED side) gets a deterministic salt in
 *    [0, buckets) — `pmod(hash(all left columns), buckets)` — so
 *    retries and speculative tasks salt identically (no
 *    `monotonically_increasing_id`/rand nondeterminism);
 *  - right is replicated `buckets` times via `explode(sequence(...))`;
 *  - the join adds the salt column to the equi-join keys, and the
 *    salt is dropped afterwards.
 *
 * Result is row-identical to `left.join(right, keys)` (inner join;
 * SkewJoinSpec asserts it) at the cost of a `buckets`× blowup of the
 * replicated side — use for a small-but-not-broadcastable right side
 * against a hot-keyed fact, and size `buckets` near the hot key's
 * task-count target, not higher.
 */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltL: Column =
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(buckets))
    val l = left.withColumn("__salt", saltL)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
