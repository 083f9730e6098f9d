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

  test("x55 grouped quantile sketch lands inside a ±2-percentile rank window") {
    // GK sketches guarantee RANK error (returned value's true rank is
    // within ±ε·n of the target), not value error — so the bound is a
    // rank window: approx pXX must lie between the exact pXX∓2
    // order statistics (inclusive; with small per-group samples the
    // window can collapse onto a single repeated value).
    val ev = Tables.table(spark, TestSpark.sf, "events")
    val approx = SparkEntry.queries("x55_quantile_sketch")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.48)).as("p48"),
        percentile(col("value"), lit(0.52)).as("p52"),
        percentile(col("value"), lit(0.93)).as("p93"),
        percentile(col("value"), lit(0.97)).as("p97"))
      .collect()
    assert(exact.nonEmpty && approx.nonEmpty)
    exact.foreach { r =>
      val a = approx(r.getString(0))
      assert(a(0) >= r.getAs[Double]("p48") && a(0) <= r.getAs[Double]("p52"),
        s"${r.getString(0)} p50 ${a(0)} outside " +
          s"[${r.getAs[Double]("p48")}, ${r.getAs[Double]("p52")}]")
      assert(a(1) >= r.getAs[Double]("p93") && a(1) <= r.getAs[Double]("p97"),
        s"${r.getString(0)} p95 ${a(1)} outside " +
          s"[${r.getAs[Double]("p93")}, ${r.getAs[Double]("p97")}]")
    }
  }

  test("x57 count-min heavy hitters: overestimate-only within eps*N, top set sane") {
    val ev = Tables.table(spark, TestSpark.sf, "events")
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val est = SparkEntry.queries("x57_heavy_hitters")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(est.length === 10)
    est.foreach { case (u, e) =>
      val ex = exact.getOrElse(u, 0L)
      assert(e >= ex, s"CMS underestimated user $u: $e < $ex")
      assert(e <= ex + math.ceil(0.001 * n).toLong + 1,
        s"CMS overestimate out of bound for user $u: $e vs $ex (n=$n)")
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
