package graft

import java.sql.Timestamp
import graft.streaming.StreamSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class SkEv(ts: Timestamp, user_id: Long, event_type: String)

/** S15 — streaming mergeable-sketch distinct counting: fixed-size HLL
  * state per open window, append-mode finality at the watermark, and
  * batch-split invariance (the mergeability that makes sketch state
  * the cluster-scale answer to streaming COUNT DISTINCT). */
class StreamSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  /** Runs the operator over a MemoryStream; `feed` gets a step
    * function that lands its rows as one micro-batch and waits, so
    * watermark advancement and timeout firing happen at real batch
    * boundaries. */
  private def run(name: String)(feed: (Seq[SkEv] => Unit) => Unit)
      : Seq[(String, Timestamp, Long)] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[SkEv]
    val q = StreamSketch.approxDistinctPerWindow(ms.toDS().toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      feed { rows => ms.addData(rows: _*); q.processAllAvailable() }
      q.processAllAvailable()
      spark.sql(s"SELECT event_type, window_start, approx_users FROM $name")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .toSeq
    } finally q.stop()
  }

  test("emits one final estimate per window at the watermark, within 10%") {
    val distinct = 500
    val got = run("sk_basic") { step =>
      // 500 distinct users, each seen twice, inside the 10:00 window
      step((0 until distinct).flatMap(u => Seq(
        SkEv(t("10:05"), u.toLong, "click"),
        SkEv(t("10:25"), u.toLong, "click"))))
      // nothing may emit while the window can still receive rows
      step(Seq(SkEv(t("10:59"), 9999L, "click")))
      // advance the watermark far past 11:00 → the window closes
      step(Seq(SkEv(t("13:00"), 1L, "click")))
    }
    val closed = got.filter(_._2 == t("10:00"))
    assert(closed.size === 1, s"exactly one final row per window: $got")
    val est = closed.head._3
    val exact = distinct + 1 // the 10:59 straggler user
    assert(math.abs(est - exact) <= exact / 10,
      s"estimate $est outside 10% of $exact")
  }

  test("mergeable: batch-split arrival yields the identical estimate") {
    def feedSplit(parts: Int) = run(s"sk_split$parts") { step =>
      (0 until 300).grouped(300 / parts).foreach { chunk =>
        step(chunk.map(u => SkEv(t("10:10"), u.toLong, "view")))
      }
      step(Seq(SkEv(t("13:00"), 1L, "view"))) // close the window
    }
    val one = feedSplit(1).filter(_._2 == t("10:00")).map(_._3)
    val many = feedSplit(6).filter(_._2 == t("10:00")).map(_._3)
    assert(one === many, "register merge must be arrival-order invariant")
  }

  test("keys are independent: per-event_type windows close separately") {
    val got = run("sk_keys") { step =>
      step(Seq(
        SkEv(t("10:01"), 1L, "click"), SkEv(t("10:02"), 2L, "click"),
        SkEv(t("10:03"), 7L, "view")))
      step(Seq(SkEv(t("13:00"), 1L, "click")))
    }
    val byKey = got.filter(_._2 == t("10:00"))
      .map(r => r._1 -> r._3).toMap
    assert(byKey === Map("click" -> 2L, "view" -> 1L))
  }
}
