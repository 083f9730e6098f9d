package graft.operators

import graft.Query
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join — the canonical "operator Spark lacks" —
 * implemented with the scalable union+window technique: tag both
 * sides, union, and take the last non-null right value over a
 * (key, time)-ordered running window. ONE shuffle on the key (the
 * union sorts within partitions), versus the naive
 * range-join-then-max which is O(left × right-per-key).
 *
 * Determinism contract: the right side must be unique per (key, t)
 * (callers pre-aggregate ties); right rows sort before left rows at
 * equal t so an exactly-simultaneous right row IS matched ("at or
 * before" semantics).
 */
object AsofJoin {

  /** left + `asof_<valueCol>`: for each left row, the right `valueCol`
    * with the greatest `t` ≤ the left row's `t` within `key`. */
  def backward(left: DataFrame, right: DataFrame, key: String, t: String,
      valueCol: String): DataFrame = {
    val leftCols = left.columns
    val passthrough = leftCols.filterNot(c => c == key || c == t)
    val rightSide = right.select(
      Seq(col(key), col(t), lit(1).as("__isr"), col(valueCol).as("__rv")) ++
        passthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      Seq(col(key), col(t), lit(0).as("__isr"),
        lit(null).cast(right.schema(valueCol).dataType).as("__rv")) ++
        passthrough.map(col): _*)
    val u = rightSide.unionByName(leftSide)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(s"asof_$valueCol", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .select(leftCols.map(col) :+ col(s"asof_$valueCol"): _*)
  }
}

/**
 * Binned range join — the second "operator Spark lacks". A pure
 * interval predicate (`lo ≤ t < hi`, no equi-key) plans as a
 * BroadcastNestedLoopJoin: O(left × right) comparisons, a
 * non-starter at scale. When every interval is at most `binWidth`
 * long, bucketing both sides by `t div binWidth` turns it into a hash
 * EQUI-join: each interval overlaps at most two bins (explode ≤ 2
 * rows), each point lives in exactly one, and the exact predicate
 * re-filters the bin-collisions. Shuffle ∝ rows, join work ∝ rows per
 * bin — the standard interval-join technique (Databricks' range-join
 * hints, Flink's interval join do the same bucketing).
 *
 * Bin ids use integral `div`, not floating floor(a/b) — double
 * division can misround at exact bin boundaries and silently drop a
 * matching pair.
 */
object RangeJoin {

  /** Inner join on loCol(left) ≤ tCol(right) < hiCol(left), all three
    * integral columns, requiring hi − lo ≤ binWidth for every row.
    * The precondition is ENFORCED at runtime — a wider interval would
    * span bins the two-bucket explode misses and silently drop
    * matching pairs, so violation fails the job instead. */
  def binnedInterval(left: DataFrame, right: DataFrame, loCol: String,
      hiCol: String, tCol: String, binWidth: Long): DataFrame = {
    val lb = left
      // raise_error only evaluates on a violating row; the filter
      // wrapper keeps the guard from being pruned as an unused column
      .filter(when(col(hiCol) - col(loCol) > binWidth,
        raise_error(concat(lit(s"binnedInterval: interval wider than " +
          s"binWidth=$binWidth at $loCol="), col(loCol).cast("string")))).isNull)
      .withColumn("__bin", explode(array_distinct(array(
        expr(s"$loCol div $binWidth"), expr(s"($hiCol - 1) div $binWidth")))))
    val rb = right.withColumn("__bin", expr(s"$tCol div $binWidth"))
    lb.join(rb, "__bin")
      .filter(col(tCol) >= col(loCol) && col(tCol) < col(hiCol))
      .drop("__bin")
  }
}

object AsofQueries {

  val all: Seq[Query] = Seq(

    // pure range join (no equi-key): for each error event, how many
    // clicks — by ANY user — happened in the preceding 5 minutes.
    // Binned to a hash equi-join (RangeJoin); the oracle states the
    // raw interval predicate. LEFT join keeps zero-click errors.
    Query("x33_range_join",
      "WITH ev AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, " +
        "event_type FROM events), " +
        "err AS (SELECT event_id, us FROM ev WHERE event_type = 'error'), " +
        "clk AS (SELECT event_id, us FROM ev WHERE event_type = 'click') " +
        "SELECT e.event_id, COUNT(c.event_id) AS clicks FROM err e " +
        "LEFT JOIN clk c ON c.us >= e.us - 300000000 AND c.us < e.us " +
        "GROUP BY 1 ORDER BY 1") {
      (s, d) => {
        val W = 300000000L // 5 minutes in microseconds
        val ev = table(s, d, "events").select(col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("eid"), (col("us") - W).as("lo"),
            col("us").as("hi"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("us").as("cus"))
        val counts = RangeJoin.binnedInterval(err, clk, "lo", "hi", "cus", W)
          .groupBy("eid").agg(count(lit(1)).as("clicks"))
        err.select(col("eid")).join(counts, Seq("eid"), "left")
          .select(col("eid").as("event_id"),
            coalesce(col("clicks"), lit(0L)).as("clicks"))
          .orderBy("event_id")
      }
    },
    // for each error event: the latest click of the same user at or
    // before the error's timestamp
    Query("x22_asof",
      "WITH ev AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, " +
        "event_type FROM events), " +
        "clicks AS (SELECT user_id, us, CAST(MAX(event_id) AS BIGINT) AS click_id " +
        "FROM ev WHERE event_type = 'click' GROUP BY 1, 2), " +
        "errors AS (SELECT user_id, us, event_id FROM ev WHERE event_type = 'error'), " +
        "u AS (SELECT user_id, us, 1 AS isr, click_id, CAST(NULL AS BIGINT) AS event_id " +
        "FROM clicks UNION ALL " +
        "SELECT user_id, us, 0, CAST(NULL AS BIGINT), event_id FROM errors), " +
        "w AS (SELECT *, last_value(click_id IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY us, isr DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id FROM u) " +
        "SELECT event_id, user_id, us, asof_click_id FROM w WHERE isr = 0 " +
        "ORDER BY event_id") {
      (s, d) =>
        val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        // dedupe right ties per (key, t) for the determinism contract
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "us")
          .agg(max(col("event_id")).as("click_id"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("us"), col("event_id"))
        AsofJoin.backward(errors, clicks, "user_id", "us", "click_id")
          .select(col("event_id"), col("user_id"), col("us"),
            col("asof_click_id"))
          .orderBy("event_id")
    })
}
