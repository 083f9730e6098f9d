package graft

import java.nio.file.Files
import graft.streaming.{AggFlows, IncrementalAgg}
import graft.tables.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class AggEv(event_id: Long, event_type: String, value: Double)

/** S14 — incremental materialized aggregate: batches fold partials
  * into the stored view (cost bounded by key cardinality, not
  * history), results equal the batch recompute, and a replayed batch
  * cannot double-count (commit-log guard). */
class AggFlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fresh() = (
    new TableStore(spark,
      Files.createTempDirectory("graft-aggflow").toString),
    Files.createTempDirectory("graft-aggflow-ckpt").toString)

  test("merged folds partials: both-sides add, one-sided pass through") {
    import spark.implicits._
    val cur = Seq(("a", 2L, 100L), ("b", 1L, 50L)).toDF("k", "n", "total")
    val delta = Seq(("b", 3L, 25L), ("c", 1L, 10L)).toDF("k", "n", "total")
    val out = IncrementalAgg.merged(cur, delta, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 2L, 100L), ("b", 4L, 75L), ("c", 1L, 10L)))
  }

  test("view equals batch recompute across several micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val (store, ckpt) = fresh()
    val ms = MemoryStream[AggEv]
    val flows = new AggFlows(spark, store, Some(ckpt))
    def round(): Unit = {
      val q = flows.eventTypeStatsFlow(ms.toDS().toDF())
      try q.processAllAvailable() finally q.stop()
    }
    ms.addData(AggEv(1, "click", 1.50), AggEv(2, "view", 0.20))
    round()
    ms.addData(AggEv(3, "click", 2.25), AggEv(4, "click", 0.05),
      AggEv(5, "buy", 99.99))
    round()
    val got = store.load("event_stats").orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("buy", 1L, 9999L), ("click", 3L, 380L), ("view", 1L, 20L)))
  }

  test("replayed batch does not double-count (commit-log guard)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val (store, ckpt) = fresh()
    val ms = MemoryStream[AggEv]
    val flows = new AggFlows(spark, store, Some(ckpt))
    val q = flows.eventTypeStatsFlow(ms.toDS().toDF())
    try {
      ms.addData(AggEv(1, "click", 1.00))
      q.processAllAvailable()
    } finally q.stop()
    // same checkpoint, same source state: the restarted query replans
    // the last batch; lastCommitted stops a second application
    val committed = store.lastCommitted("event_stats")
    assert(committed >= 0)
    val q2 = flows.eventTypeStatsFlow(ms.toDS().toDF())
    try {
      q2.processAllAvailable()
      val got = store.load("event_stats").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === Seq(("click", 1L, 100L)))
    } finally q2.stop()
  }

  test("refuses to run without a persistent checkpoint") {
    val (store, _) = fresh()
    intercept[IllegalArgumentException](new AggFlows(spark, store, None))
  }
}
