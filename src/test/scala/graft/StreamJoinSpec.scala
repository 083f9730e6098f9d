package graft

import java.sql.Timestamp
import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class ReqEv(req_id: String, evento: String, req_ts: Timestamp)
case class PayEv(pay_req: String, amount: Double, pay_ts: Timestamp)

/** Stream-stream interval joins (StreamJoins): both sides unbounded,
  * state buffered per side and expired by watermark — the streaming
  * operator class the stream-static foreachBatch flows don't cover. */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("inner interval join matches payment to request within the window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val reqs = MemoryStream[ReqEv]
    val pays = MemoryStream[PayEv]
    val q = StreamJoins.paymentMatch(reqs.toDS().toDF(), pays.toDS().toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sj_inner").start()
    try {
      reqs.addData(ReqEv("r1", "Opera Boheme", t("10:00")),
        ReqEv("r2", "Opera Boheme", t("10:01")))
      // r1 pays inside the 10-minute window; r2's payment is too late;
      // p-orphan has no request at all
      pays.addData(PayEv("r1", 30.0, t("10:04")),
        PayEv("r2", 20.0, t("10:30")),
        PayEv("p-orphan", 5.0, t("10:05")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT req_id, amount FROM sj_inner").collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSet ===
        Set(("r1", 30.0)))
    } finally q.stop()
  }

  test("streaming dedup drops redeliveries within the watermark, evicts after") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[ReqEv]
    val q = graft.streaming.StreamDedup.withinWatermark(
        ms.toDS().toDF(), Seq("req_id"), tsCol = "req_ts",
        watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sd_dedup").start()
    try {
      // duplicate redelivery inside the watermark window → one row
      ms.addData(ReqEv("r1", "Opera Boheme", t("10:00")),
        ReqEv("r1", "Opera Boheme", t("10:02")))
      q.processAllAvailable()
      assert(spark.sql("SELECT req_id FROM sd_dedup").count() === 1)
      // advance the watermark far past r1's window so its key evicts
      ms.addData(ReqEv("r-adv", "x", t("12:00")))
      q.processAllAvailable()
      // a replay AFTER eviction is emitted again — windowed
      // idempotence by contract; the keyed MERGE downstream absorbs it
      ms.addData(ReqEv("r1", "Opera Boheme", t("12:01")))
      q.processAllAvailable()
      val r1s = spark.sql(
        "SELECT req_id FROM sd_dedup WHERE req_id = 'r1'").count()
      assert(r1s === 2, s"expected re-emission after state eviction, got $r1s")
    } finally q.stop()
  }

  test("left-outer emits the abandoned request only after its window expires") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val reqs = MemoryStream[ReqEv]
    val pays = MemoryStream[PayEv]
    val q = StreamJoins.paymentMatchOrExpired(
        reqs.toDS().toDF(), pays.toDS().toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sj_outer").start()
    try {
      reqs.addData(ReqEv("r1", "Opera Boheme", t("10:00")),
        ReqEv("r2", "Opera Rigoletto", t("10:01")))
      pays.addData(PayEv("r1", 30.0, t("10:04")))
      q.processAllAvailable()
      // r2 is NOT emitted yet: its window is still open (a payment
      // could still arrive on time)
      val early = spark.sql("SELECT req_id FROM sj_outer").collect()
      assert(early.map(_.getString(0)).toSet === Set("r1"))
      // advance BOTH watermarks past r2's window end (10:11); only then
      // may the engine conclude "no match can ever come"
      reqs.addData(ReqEv("r-late", "x", t("11:00")))
      pays.addData(PayEv("p-late", 1.0, t("11:00")))
      q.processAllAvailable()
      q.processAllAvailable() // second tick: outer results flush after state eviction
      val rows = spark.sql(
        "SELECT req_id, amount FROM sj_outer").collect()
        .map(r => (r.getString(0), Option(r.get(1))))
      assert(rows.toMap.get("r2") === Some(None),
        s"abandoned r2 not emitted null-padded: ${rows.mkString(", ")}")
      assert(rows.toMap.get("r1") === Some(Some(30.0)))
    } finally q.stop()
  }
}
