package graft

import graft.streaming.StreamTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class TkEv(event_type: String, user_id: Long)

/** S16 — SpaceSaving streaming top-k: fixed counter slots per key,
  * overestimate-only error with `est − err ≤ true ≤ est`, and the
  * N/m presence guarantee that makes the reported top-k exact for
  * skewed traffic — all at O(capacity) state per key. */
class StreamTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(name: String, capacity: Int, k: Int)(
      feed: (Seq[TkEv] => Unit) => Unit): Seq[StreamTopK.TopHitter] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[TkEv]
    val q = StreamTopK.spaceSavingTopK(ms.toDS().toDF(), capacity, k)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    try {
      feed { rows => ms.addData(rows: _*); q.processAllAvailable() }
      val all = spark.sql(
        s"SELECT event_type, user_id, est_count, err, n_seen FROM $name")
        .collect().map(r => StreamTopK.TopHitter(r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      // freshest card per key = the rows carrying that key's max n_seen
      all.groupBy(_.event_type).values.flatMap { rows =>
        val latest = rows.map(_.n_seen).max
        rows.filter(_.n_seen == latest)
      }.toSeq
    } finally q.stop()
  }

  test("skewed traffic: true heavy hitters surface with bounded error") {
    // id 1 × 500, id 2 × 300, 200 distinct noise ids × 1 — N = 1000,
    // capacity 64 → presence guaranteed above 1000/64 ≈ 15.6
    val noise = (100L until 300L).map(u => TkEv("click", u))
    val feed1 = (Seq.fill(500)(TkEv("click", 1L)) ++
      Seq.fill(300)(TkEv("click", 2L)) ++ noise)
    val got = run("ss_skew", 64, 5) { step =>
      // deterministic interleave so evictions are replay-stable
      step(feed1)
    }
    assert(got.size === 5)
    val top2 = got.sortBy(h => (-h.est_count, h.user_id)).take(2)
    assert(top2.map(_.user_id) === Seq(1L, 2L))
    val Seq(h1, h2) = top2
    // overestimate-only: est − err ≤ true ≤ est
    assert(h1.est_count >= 500 && h1.est_count - h1.err <= 500)
    assert(h2.est_count >= 300 && h2.est_count - h2.err <= 300)
    assert(got.forall(_.n_seen === 1000))
  }

  test("counts accumulate across micro-batches; keys stay independent") {
    val got = run("ss_multi", 8, 2) { step =>
      step(Seq.fill(5)(TkEv("click", 7L)) :+ TkEv("view", 9L))
      step(Seq.fill(4)(TkEv("click", 7L)) :+ TkEv("click", 8L))
    }
    val click = got.filter(_.event_type == "click")
      .sortBy(h => (-h.est_count, h.user_id))
    assert(click.head.user_id === 7L && click.head.est_count === 9L &&
      click.head.err === 0L)
    assert(click.head.n_seen === 10L) // 5 + 4 + 1 click rows
    val view = got.filter(_.event_type == "view")
    assert(view.map(h => (h.user_id, h.est_count, h.n_seen)) ===
      Seq((9L, 1L, 1L)))
  }

  test("at capacity, a new id evicts the min slot and inherits its count as err") {
    val got = run("ss_evict", 2, 2) { step =>
      // one row per micro-batch: the fold order is then deterministic
      // regardless of within-batch shuffle order
      Seq(1L, 1L, 2L, 3L).foreach(u => step(Seq(TkEv("t", u))))
    }
    // slots: 1→(2,0); 2→(1,0) evicted by 3→(2,1)
    val byId = got.map(h => h.user_id -> (h.est_count, h.err)).toMap
    assert(byId === Map(1L -> (2L, 0L), 3L -> (2L, 1L)))
  }
}
