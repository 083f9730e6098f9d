package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.HoldExpiry
import graft.streaming.HoldExpiry.HoldEvent
import graft.tables.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S18 — reservation-hold expiry on Spark 4's transformWithState:
  * event-time timers fire exactly once per unsettled hold when the
  * watermark passes the deadline; confirms/cancels before the deadline
  * settle silently; the seat return is once-only under redelivery. */
class HoldExpirySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s"2026-01-01 $s")

  test("unsettled holds expire once on watermark passage; settled holds never do; seats return once-only") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-holdexp").toString
      val store = new TableStore(spark, root)
      store.init("inventario",
        Seq(("Opera", 96, "Cultural", "A"), ("Rock", 200, "Musica", "A"))
          .toDF("nombre", "capacidad", "categoria", "estado"))
      val ms = MemoryStream[HoldEvent]
      def run(): Unit = {
        val q = HoldExpiry.flow(store, ms.toDS(), timeoutMs = 60000L,
          checkpointRoot = Some(root))
        q.processAllAvailable(); q.stop()
      }
      def cap(nombre: String): Int = store.load("inventario")
        .filter(col("nombre") === nombre).select("capacidad")
        .collect().head.getInt(0)
      def expiredIds(): Seq[String] =
        if (!store.exists("expired_holds")) Seq.empty
        else store.load("expired_holds").select("id").collect()
          .map(_.getString(0)).toSeq.sorted

      // run 1: three holds, one confirmed before its deadline
      ms.addData(
        HoldEvent("r1", "Opera", 5, "hold", ts("10:00:00")),
        HoldEvent("r2", "Opera", 3, "hold", ts("10:00:00")),
        HoldEvent("r3", "Rock", 2, "hold", ts("10:00:10")),
        HoldEvent("r2", "Opera", 3, "confirm", ts("10:00:30")))
      run()
      assert(expiredIds() === Seq.empty, "nothing can expire yet")
      assert(cap("Opera") === 96 && cap("Rock") === 200)

      // run 2: a heartbeat hold advances the watermark to 10:30 (the
      // trailing no-data micro-batch lets timers see it within the
      // same run) → r1 (deadline 10:01) and r3 (10:01:10) fire; r2
      // was settled in time; r9's own deadline (10:31) has not passed
      ms.addData(HoldEvent("r9", "Rock", 1, "hold", ts("10:30:00")))
      run()
      assert(expiredIds() === Seq("r1", "r3"))
      assert(cap("Opera") === 101, "Opera returned r1's 5 seats")
      assert(cap("Rock") === 202, "Rock returned r3's 2 seats")

      // run 3: watermark 11:40 → r9 (10:31) fires; r10's own deadline
      // (11:41) has not
      ms.addData(HoldEvent("r10", "Rock", 4, "hold", ts("11:40:00")))
      run()
      assert(expiredIds() === Seq("r1", "r3", "r9"))
      assert(cap("Rock") === 203, "Rock returned r9's single seat")
      assert(cap("Opera") === 101, "Opera untouched by run 3")

      // run 4: a replayed (at-least-once) duplicate of r10's hold —
      // same deadline re-arm is a no-op, watermark unchanged, nothing
      // fires, nothing double-returns
      ms.addData(HoldEvent("r10", "Rock", 4, "hold", ts("11:40:00")))
      run()
      assert(expiredIds() === Seq("r1", "r3", "r9"))
      assert(cap("Rock") === 203 && cap("Opera") === 101)
      // once-only: each id appears exactly once in the expiry table
      assert(store.load("expired_holds").groupBy("id").count()
        .filter(col("count") > 1).isEmpty)
      // cancel settles exactly like confirm, and a confirm arriving
      // AFTER expiry finds no state — a no-op, not a resurrection
      ms.addData(
        HoldEvent("r20", "Opera", 7, "hold", ts("12:00:00")),
        HoldEvent("r20", "Opera", 7, "cancel", ts("12:00:20")),
        HoldEvent("r21", "Opera", 2, "hold", ts("12:00:00")))
      run()
      ms.addData(HoldEvent("hb", "Rock", 1, "hold", ts("13:00:00")))
      run()
      assert(expiredIds() === Seq("r1", "r10", "r21", "r3", "r9"),
        "r21 and the still-pending r10 expired; cancelled r20 did not")
      assert(cap("Opera") === 103, "only r21's 2 Opera seats returned")
      assert(cap("Rock") === 207, "r10's 4 Rock seats returned")
      ms.addData(HoldEvent("r21", "Opera", 2, "confirm", ts("13:30:00")),
        HoldEvent("hb2", "Rock", 1, "hold", ts("14:30:00")))
      run()
      assert(cap("Opera") === 103, "late confirm after expiry is a no-op")
      assert(cap("Rock") === 208, "the first heartbeat's own hold expired")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("out-of-order settles tombstone, same-ts settles lose to their hold, unknown kinds never settle") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-holdooo").toString
      val store = new TableStore(spark, root)
      store.init("inventario",
        Seq(("Opera", 100, "Cultural", "A"), ("Rock", 50, "Musica", "A"))
          .toDF("nombre", "capacidad", "categoria", "estado"))
      val ms = MemoryStream[HoldEvent]
      def run(): Unit = {
        val q = HoldExpiry.flow(store, ms.toDS(), timeoutMs = 60000L,
          checkpointRoot = Some(root), watermarkDelay = "10 minutes")
        q.processAllAvailable(); q.stop()
      }
      def cap(nombre: String): Int = store.load("inventario")
        .filter(col("nombre") === nombre).select("capacidad")
        .collect().head.getInt(0)
      def expiredIds(): Seq[String] =
        if (!store.exists("expired_holds")) Seq.empty
        else store.load("expired_holds").select("id").collect()
          .map(_.getString(0)).toSeq.sorted

      // batch 1: s1's CONFIRM arrives before its hold ever does; s2's
      // hold and cancel share one timestamp (tiebreak: hold first, so
      // the cancel finds and settles it); s3's "confrim" typo must NOT
      // settle the live hold
      ms.addData(
        HoldEvent("s1", "Opera", 4, "confirm", ts("10:20:00")),
        HoldEvent("s2", "Opera", 3, "hold", ts("10:20:00")),
        HoldEvent("s2", "Opera", 3, "cancel", ts("10:20:00")),
        HoldEvent("s3", "Opera", 2, "hold", ts("10:20:00")),
        HoldEvent("s3", "Opera", 2, "confrim", ts("10:20:10")))
      run()
      // batch 2: s1's DELAYED hold arrives (ts before its confirm,
      // within the 10-minute watermark delay) — the tombstone drops it
      ms.addData(HoldEvent("s1", "Opera", 4, "hold", ts("10:19:00")))
      run()
      // batch 3: heartbeat advances the watermark past every deadline
      ms.addData(HoldEvent("hb", "Rock", 1, "hold", ts("11:30:00")))
      run()
      assert(expiredIds() === Seq("s3"),
        "only the typo'd-settle hold expired: tombstoned s1 and " +
          "settled s2 did not")
      assert(cap("Opera") === 102, "only s3's 2 seats returned")
      assert(cap("Rock") === 50)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
