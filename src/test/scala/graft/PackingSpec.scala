package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence-packing manifest (x100): the spans must tile each lang's
  * token stream exactly — every token lands in exactly one window,
  * windows are full (W tokens) except each shard's last, and each
  * doc's spans reconstruct the doc without gap or overlap. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val W = 256

  private lazy val manifest =
    SparkEntry.queries("x100_seq_packing")(spark, TestSpark.sf)
      .select(col("lang"), col("window_id"), col("doc_id"),
        col("start_tok"), col("end_tok")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  private lazy val docTokens = {
    import graft.functions.TextFns
    graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  test("spans tile every document exactly — no gap, no overlap, full coverage") {
    val byDoc = manifest.groupBy(_._3)
    docTokens.foreach { case (id, _, n) =>
      val spans = byDoc(id).sortBy(_._4).map(s => (s._4, s._5))
      assert(spans.head._1 === 0L, s"doc $id does not start at token 0")
      assert(spans.last._2 === n, s"doc $id does not end at its length")
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(e1 === s2, s"doc $id has a gap/overlap at $e1 vs $s2")
        case _ =>
      }
      // a doc's consecutive spans sit in consecutive windows
      val wins = byDoc(id).sortBy(_._4).map(_._2)
      assert(wins === (wins.head to wins.last))
    }
  }

  test("every window is exactly W tokens except each shard's last") {
    val perWin = manifest.groupBy(m => (m._1, m._2)).view
      .mapValues(_.map(s => s._5 - s._4).sum).toMap
    val lastWin = manifest.groupBy(_._1).view
      .mapValues(_.map(_._2).max).toMap
    perWin.foreach { case ((lang, w), tokens) =>
      if (w < lastWin(lang))
        assert(tokens === W.toLong, s"window ($lang,$w) holds $tokens")
      else
        assert(tokens >= 1 && tokens <= W)
    }
    // conservation: total span tokens == total corpus tokens
    assert(perWin.values.sum === docTokens.map(_._3).sum)
  }

  test("epoch shuffle: each epoch is a true per-shard permutation, epochs differ, order is seed-stable") {
    val rows = SparkEntry.queries("x117_epoch_shuffle")(
      spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, ws) =>
      val n = ws.length.toLong
      // windows are the full 0..n-1 universe (x100's window count)
      assert(ws.map(_._2).sorted.toSeq === (0L until n),
        s"shard $lang window universe")
      // each epoch's positions are a permutation of 1..n
      assert(ws.map(_._3).sorted.toSeq === (1L to n), s"shard $lang epoch 0")
      assert(ws.map(_._4).sorted.toSeq === (1L to n), s"shard $lang epoch 1")
      // the seed genuinely changes the order (any shard with ≥ 20
      // windows: identical permutations would mean a dead seed)
      if (n >= 20)
        assert(ws.exists(w => w._3 != w._4),
          s"shard $lang: epoch 0 and 1 orders coincide")
    }
    // determinism: a rerun yields the identical permutation
    val again = SparkEntry.queries("x117_epoch_shuffle")(
      spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq === rows.sorted.toSeq)
  }

  test("loader schedule: finish-tag prefix fairness — every prefix holds each shard within #shards of its weighted share") {
    import org.apache.spark.sql.functions._
    val sched = SparkEntry.queries("x119_loader_schedule")(
      spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sched.nonEmpty)
    // steps are 1..n dense and shard-local indices are in-order
    assert(sched.map(_._1).toSeq === (1L to sched.length))
    sched.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.sortBy(_._1).map(_._3).toSeq ===
        (0L until rows.length), s"shard $lang windows out of order")
    }
    // recompute the weights the engine derives (integer-exact inputs
    // into one correctly-rounded sqrt) and check the finish-tag
    // fairness bound: sorting by release tags (k+1)/w deviates from
    // the fluid weighted share by O(#shards) windows in any prefix
    // (±1 per shard pair — the full ±1 WFQ bound needs server virtual
    // time, which would make the schedule stateful/sequential; the
    // O(#shards) bound is what a stateless, resumable-from-any-step
    // formula can give, and is ample at trainer scale)
    val tots = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n"))
      .filter(col("n") > 0)
      .groupBy("lang").agg(sum("n").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = tots.map { case (l, t) =>
      l -> math.floor(math.sqrt(t.toDouble * (1L << 40))).toLong
    }
    val nw = tots.map { case (l, t) => l -> ((t + 255) / 256) }
    // EXACT first-principles recompute: the full finish-tag universe,
    // sorted by (tag, lang, k), truncated to the prefix — the engine
    // schedule must equal it row for row
    val expect = nw.toSeq.flatMap { case (l, n) =>
      (0L until n).map(k => (l, k, (k + 1).toDouble / w(l)))
    }.sortBy { case (l, k, v) => (v, l, k) }.take(sched.length)
    assert(sched.sortBy(_._1).map(t => (t._2, t._3)).toSeq ===
      expect.map(t => (t._1, t._2)),
      "schedule diverges from the finish-tag recompute")
    // fairness bound, valid while every shard still has supply (a
    // small exhausted shard's share redistributes, so the fluid model
    // only applies up to the first exhaustion)
    val ordered = sched.sortBy(_._1)
    val servedAll = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val firstExhaust = ordered.indexWhere { case (_, lang, _) =>
      servedAll(lang) += 1
      servedAll(lang) == nw(lang)
    } match { case -1 => ordered.length; case i => i + 1 }
    val totalW = w.values.sum.toDouble
    val slack = w.size + 1
    val served = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    ordered.take(firstExhaust).zipWithIndex.foreach {
      case ((_, lang, _), i) =>
        served(lang) += 1
        val p = i + 1
        w.keys.foreach { l =>
          val share = p * w(l) / totalW
          assert(math.abs(served(l) - share) <= slack,
            s"prefix $p deviates on $l: ${served(l)} vs share $share")
        }
    }
    assert(firstExhaust > 20, "fixture exhausts too early to test fairness")
  }
}
