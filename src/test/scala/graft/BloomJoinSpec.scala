package graft

import graft.operators.BloomJoin
import graft.sources.Tables.table
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered join: no false negatives, exact join equality,
  * empty-build handling, and the scale shape (probe sits on the fact
  * side BELOW the join, so it prunes before the shuffle). */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dim = table(spark, TestSpark.sf, "orders")
    .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
      col("o_orderdate") < to_timestamp(lit("1995-07-01")))
    .select(col("o_orderkey"), col("o_orderpriority"))

  test("no false negatives: every build-side key probes true") {
    val bloom = BloomJoin.keyBloom(dim, col("o_orderkey"))
    val missed = dim.filter(!BloomJoin.mightContain(bloom, col("o_orderkey")))
      .count()
    assert(missed === 0L)
  }

  test("bloom prunes most non-matching fact rows (fpp honored loosely)") {
    val bloom = BloomJoin.keyBloom(dim, col("o_orderkey"))
    val fact = table(spark, TestSpark.sf, "lineitem")
    val kept = fact.filter(BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    val trueMatches = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .count()
    val total = fact.count()
    // kept = true matches + false positives; fpp=1% should keep far
    // fewer than half of the non-matching rows
    assert(kept >= trueMatches)
    assert(kept - trueMatches < (total - trueMatches) / 2,
      s"bloom barely pruned: kept=$kept true=$trueMatches total=$total")
  }

  test("prefiltered join result equals the plain join") {
    val fact = table(spark, TestSpark.sf, "lineitem")
    val pre = BloomJoin.prefiltered(fact, col("l_orderkey"),
      dim, col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
  }

  test("empty build side yields empty result, not a crash") {
    val none = dim.filter(lit(false))
    val bloom = BloomJoin.keyBloom(none, col("o_orderkey"))
    assert(bloom.isEmpty)
    val out = BloomJoin.prefiltered(table(spark, TestSpark.sf, "lineitem"),
      col("l_orderkey"), none, col("o_orderkey"))
    assert(out.count() === 0L)
  }

  test("scale shape: might_contain probes the fact side below the shuffle join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = table(spark, TestSpark.sf, "lineitem")
      val p = BloomJoin.prefiltered(fact, col("l_orderkey"),
        dim, col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"no bloom probe in plan:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join with broadcast disabled:\n$p")
      // the probe must appear under the join, i.e. the Filter carrying
      // it is on the streamed (fact) branch, not applied post-join
      val joinIdx = p.indexOf("Join")
      val probeIdx = p.indexOf("might_contain")
      assert(probeIdx > joinIdx,
        s"bloom probe not below the join in:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
