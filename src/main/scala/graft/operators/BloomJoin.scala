package graft.operators

import graft.Query
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/**
 * Bloom-prefiltered join — semi-join reduction for the regime BETWEEN
 * broadcast and plain shuffle: the dimension's payload is too big to
 * broadcast, but its KEY SET compresses into a few-MB bloom filter
 * that is. The fact side is filtered by the bloom BEFORE its shuffle,
 * so only rows that can possibly match pay the exchange; false
 * positives (fpp ≈ 1 %) are eliminated by the exact join that follows,
 * so results are bit-identical to the un-filtered join.
 *
 * This is precisely Spark's own runtime-filter rewrite
 * (`InjectRuntimeFilter`, SPARK-32268) expressed as an explicit
 * operator: the same `BloomFilterAggregate` builds the filter (one
 * distributed pass over the dim keys, map-side partial merges of the
 * fixed-size bit arrays) and the same codegen'd
 * `BloomFilterMightContain` probes it inside the fact scan's
 * WholeStageCodegen. Making it explicit means it applies even when the
 * optimizer's size-estimate thresholds (10 GB application side) would
 * not fire, and the sizing is caller-controlled.
 *
 * Scale: the bloom is O(numBits) regardless of corpus size — 1.2 MB
 * per million keys at 1 % fpp — built with map-side combine and
 * shipped to fact tasks as a task-binary literal. At 100 TB the fact
 * shuffle shrinks by the dim's selectivity (here ~7 %), which is the
 * difference between shuffling 100 TB and shuffling 7 TB.
 */
object BloomJoin {

  /** One distributed pass over `dim`: xxhash64(key) folded into a
    * bloom filter sized for `expectedItems` at `fpp`. Returns the
    * serialized filter (empty-input ⇒ None). */
  def keyBloom(dim: DataFrame, key: Column,
      expectedItems: Long = 100000L, fpp: Double = 0.01): Option[Array[Byte]] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(dim.select(Bridge.column(agg)).head.get(0))
      .map(_.asInstanceOf[Array[Byte]])
  }

  /** Codegen'd probe predicate: does `key` possibly belong to the set
    * the bloom was built over? (No false negatives; fpp false
    * positives.) `None` (empty build side) ⇒ constant false. */
  def mightContain(bloom: Option[Array[Byte]], key: Column): Column =
    bloom match {
      case Some(bytes) => Bridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType), Bridge.expression(xxhash64(key))))
      case None => lit(false)
    }

  /** Inner join with the fact side bloom-prefiltered on the dim's key
    * set before its shuffle. Result is exactly `fact ⋈ dim`. */
  def prefiltered(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val bloom = keyBloom(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(bloom, factKey))
      .join(dim, factKey === dimKey)
  }

  val all: Seq[Query] = Seq(

    // Per-priority line stats for one order-date quarter: the order
    // filter keeps ~7 % of orders, the bloom on their keys prunes
    // ~93 % of lineitem BEFORE the join shuffle. Pure-integer
    // aggregates; the oracle is the plain join (the bloom is
    // invisible in the result by construction).
    Query("x67_bloom_join",
      "SELECT o_orderpriority, COUNT(*) AS n_items, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, " +
        "COUNT(DISTINCT l_orderkey) AS n_orders " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o_orderdate < TIMESTAMP '1995-07-01' " +
        "GROUP BY 1 ORDER BY 1") {
      (s, d) => {
        val dim = table(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1995-07-01")))
          .select(col("o_orderkey"), col("o_orderpriority"))
        prefiltered(table(s, d, "lineitem"), col("l_orderkey"),
          dim, col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("bigint")).as("qty"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy("o_orderpriority")
      }
    })
}
