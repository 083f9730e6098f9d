package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate variants of the exact aggregates — the cardinalities
  * where the oracle-exact forms stop scaling. No DuckDB oracle
  * (different sketch algorithms); correctness = bounded error vs the
  * exact answer. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("HLL distinct-count within 5% of exact (q20's scale path)") {
    val ev = Tables.table(spark, TestSpark.sf, "events")
    val rows = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: $a vs $e")
    }
  }

  test("approx percentile within one percentile-bucket of exact (x17's scale path)") {
    val ev = Tables.table(spark, TestSpark.sf, "events")
    val rows = ev.agg(
      percentile(col("value"), lit(0.5)).as("exact"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx"))
      .collect()
    val (e, a) = (rows.head.getDouble(0), rows.head.getDouble(1))
    val spread = ev.agg(max("value").cast("double") - min("value").cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(a - e) <= spread * 0.01, s"median approx $a vs exact $e")
  }
}
