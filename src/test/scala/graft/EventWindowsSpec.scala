package graft

import java.sql.Timestamp
import graft.streaming.EventWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, event_type: String, value: Double)

/** S9 — event-time windows + watermark late-data drop. */
class EventWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("tumbling windows aggregate by event time; watermark drops late data") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = EventWindows.tumbling(ms.toDS().toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("s9_tumbling").start()

    // window [10:00, 11:00): two clicks; then advance event time beyond
    // the watermark so the window finalizes
    ms.addData(Ev(t("10:05"), "click", 1.5), Ev(t("10:40"), "click", 2.5))
    q.processAllAvailable()
    ms.addData(Ev(t("12:00"), "view", 1.0)) // watermark → 11:50
    q.processAllAvailable()
    // this event is older than the watermark → must be dropped
    ms.addData(Ev(t("10:30"), "click", 100.0))
    q.processAllAvailable()
    ms.addData(Ev(t("14:00"), "view", 1.0)) // flush
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql(
      "SELECT event_type, n, s FROM s9_tumbling WHERE w_start = '2024-01-01 10:00:00'")
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "click")
    assert(rows.head.getLong(1) === 2) // late 100.0 event NOT counted
    assert(rows.head.getDouble(2) === 4.0)
  }

  test("session windows merge events within gap") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = EventWindows.session(ms.toDS().toDF(), "30 minutes", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("s9_session").start()
    ms.addData(Ev(t("10:00"), "click", 1.0), Ev(t("10:20"), "click", 2.0),
      Ev(t("11:30"), "click", 5.0)) // gap > 30m → separate session
    q.processAllAvailable()
    ms.addData(Ev(t("14:00"), "view", 0.0)) // advance watermark, finalize
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT n, s FROM s9_session WHERE event_type = 'click' ORDER BY w_start")
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 2 && rows(0).getDouble(1) === 3.0)
    assert(rows(1).getLong(0) === 1 && rows(1).getDouble(1) === 5.0)
  }
}
