package graft.streaming

import graft.tables.TableStore
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues,
  Trigger}

/**
 * Reservation-HOLD expiry — the timeout leg the reference's seat saga
 * lacks (reservas holds seats on admission, `contratos.go:7-37`, and
 * only an explicit cancel ever returns them; a real booking system
 * expires unconfirmed holds): every hold gets an EVENT-TIME TIMER at
 * ts + timeout; a confirm/cancel before the deadline settles the hold
 * (state cleared, timer deleted); the watermark passing the deadline
 * fires the timer and emits an expiry, which the flow turns into a
 * once-only seat return.
 *
 * Built on Spark 4's `transformWithState` arbitrary-state API
 * (StatefulProcessor + ValueState + registerTimer) — the successor to
 * `flatMapGroupsWithState` used by [[StatefulAdmission]]: timers are
 * first-class (no manual deadline bookkeeping scanned per batch), the
 * hold state is a typed ValueState in RocksDB, and expiry work
 * happens in `handleExpiredTimer` — proportional to FIRING timers,
 * not to open holds. That is the 100 TB shape: a billion open holds
 * cost nothing per batch until their deadlines arrive.
 *
 * Delivery semantics match the reference's consumers (at-least-once +
 * idempotence): a redelivered hold re-arms the same deadline; a
 * confirm after expiry finds no state and is a no-op; the downstream
 * seat return anti-joins the `expired_holds` table so a replayed
 * batch cannot double-return.
 */
object HoldExpiry {

  /** kind ∈ hold | confirm | cancel; ts is event time. */
  final case class HoldEvent(id: String, evento: String, cantidad: Int,
      kind: String, ts: java.sql.Timestamp)

  final case class Expired(id: String, evento: String, cantidad: Int)

  // public: the state encoder's generated projection code accesses
  // the fields reflectively from Janino-compiled classes, which
  // cannot see a private member
  final case class Hold(evento: String, cantidad: Int, deadline: Long)

  final class Processor(timeoutMs: Long)
      extends StatefulProcessor[String, HoldEvent, Expired] {
    @transient private var hold: org.apache.spark.sql.streaming.ValueState[Hold] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hold = getHandle.getValueState[Hold]("hold",
        Encoders.product[Hold], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HoldEvent],
        timerValues: TimerValues): Iterator[Expired] = {
      // a micro-batch can carry a hold AND its settle; apply in event
      // order so the outcome does not depend on partition order
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        e.kind match {
          case "hold" =>
            // redelivery re-arms the SAME deadline (idempotent): the
            // deadline derives from the event's own ts, not arrival
            val deadline = e.ts.getTime + timeoutMs
            val prev = Option(hold.get())
            if (!prev.exists(_.deadline == deadline)) {
              prev.foreach(p => getHandle.deleteTimer(p.deadline))
              hold.update(Hold(e.evento, e.cantidad, deadline))
              getHandle.registerTimer(deadline)
            }
          case _ => // confirm | cancel settle the hold
            Option(hold.get()).foreach { p =>
              getHandle.deleteTimer(p.deadline)
              hold.clear()
            }
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Expired] =
      Option(hold.get()) match {
        case Some(h) =>
          hold.clear()
          Iterator.single(Expired(key, h.evento, h.cantidad))
        case None => Iterator.empty
      }
  }

  /** The expiry stream: holds grouped by reservation id through the
    * timer processor, watermarked on event time. */
  def expiries(events: Dataset[HoldEvent], timeoutMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Expired] = {
    implicit val enc = Encoders.product[Expired]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.id)(Encoders.STRING)
      .transformWithState(new Processor(timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Operational flow: expiries append once into `expired_holds` and
    * return their seats to `inventario` — once-only under replay via
    * the anti-join-then-append pattern the other flows use. */
  def flow(store: TableStore,
      events: Dataset[HoldEvent], timeoutMs: Long,
      checkpointRoot: Option[String] = None): StreamingQuery =
    FlowRunner.start(store, checkpointRoot, Trigger.AvailableNow(),
      expiries(events, timeoutMs).toDF(), "hold_expiry") { batch =>
      val fresh =
        (if (store.exists("expired_holds"))
          batch.join(store.load("expired_holds").select("id"),
            Seq("id"), "left_anti")
        else batch).persist()
      try {
        if (!fresh.isEmpty) {
          store.appendUnique("expired_holds", fresh, Seq("id"))
          val deltas = fresh.groupBy("evento")
            .agg(sum(col("cantidad")).as("__ret"))
          val inv = store.load("inventario")
          store.replace("inventario", inv
            .join(deltas, inv("nombre") === deltas("evento"), "left")
            .withColumn("capacidad",
              col("capacidad") + coalesce(col("__ret"), lit(0L)).cast("int"))
            .drop("evento", "__ret"))
        }
      } finally { fresh.unpersist(); () }
    }
}
