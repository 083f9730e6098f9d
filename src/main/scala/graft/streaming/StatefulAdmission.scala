package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Stream element for the keyed-state admission variant: a lifecycle
  * message for one event key. `kind` discriminates:
  *  - "req"    — reservation request (id, email, cantidad);
  *  - "ret"    — seat return (cantidad seats back, id = the returned
  *               reservation, for idempotence);
  *  - "cancel" — organizer cancellation (estado → C).
  * `motivo` is pre-set to the validation failure
  * (cantidad_invalida / id_invalido) or null when valid. */
final case class SReq(id: String, evento: String, email: String,
    cantidad: Int, seq: Long, motivo: String, kind: String = "req")

/** Per-event keyed state: the remaining capacity, the event lifecycle
  * state, the ids already admitted (redelivery dedup) and the ids
  * already returned (a redelivered X message must not inflate
  * capacity). At scale both sets are bounded by a state TTL
  * (watermark-scoped; the reservas registry stays the durable source
  * of truth past the TTL horizon) — unbounded here because test
  * corpora are finite. */
final case class InvState(capacidad: Long, estado: String,
    seen: Seq[String], returned: Seq[String] = Nil)

/** One lifecycle outcome row: the admission-log shape plus `kind`
  * ("admit" | "reject" | "return" | "cancel"), the post-decision
  * remaining capacity / estado of the key, and `ord` — the row's
  * position in the per-key fold, so downstream consumers can recover
  * the EXACT fold order (max_by(·, ord) = the key's final state)
  * without re-deriving the comparator's tiebreaks. */
final case class AdmitEvent(id: String, evento: String, email: String,
    cantidad: Int, admitted: Boolean, motivo: String, seq: Long,
    capacidad: Long, kind: String, estado: String, ord: Int)

/**
 * Keyed-state admission (O19/O20/O21/O18/O30, ROADMAP §7 + §"unified
 * lifecycle"): the `flatMapGroupsWithState` formulation of
 * `MergeOps.admitReservations` — and of the event's WHOLE lifecycle.
 *
 * The batch-MERGE flows reload the inventario snapshot and rewrite it
 * every micro-batch — O(table) per trigger — and three different
 * flows write (capacidad, estado) for the same key. Here (capacidad,
 * estado) has ONE owner: requests, seat returns and organizer cancels
 * arrive as one unioned stream, are folded per key in `seq` order
 * against state in the Spark state store, and every table becomes a
 * DOWNSTREAM materialization fed by the emitted log — exactly how the
 * reference holds admission state in MongoDB while Kafka carries the
 * changelog (reservas/main.go:151-165, inventario/main.go:105-133).
 * Decisions are O(batch); checkpointing is incremental (RocksDB +
 * `...rocksdb.changelogCheckpointing.enabled=true` in production).
 *
 * Semantics parity (FlowsSpec S2-S5/S8, StatefulAdmissionSpec):
 * per-key messages apply in (seq, id, email, cantidad) order;
 * duplicate request ids and duplicate return ids are no-ops (the
 * `seen`/`returned` sets ARE the anti-joins the batch flows perform
 * against reservas/devoluciones); keys with no state row are unknown
 * events → motivo no_existe; returns carry no capacity guard
 * (inventario/main.go:117-123); organizer cancel flips estado to 'C'
 * so later requests reject (the admission guard requires 'A');
 * pre-validated failures pass through as rejections without touching
 * state.
 */
object StatefulAdmission {

  /** Lifecycle order within a key: MergeOps.admissionCompare (the ONE
    * admission ordering, shared with the batch fold), extended with a
    * kind rank for the unioned stream — at an identical (seq, id,
    * email, cantidad), cancel < ret < req, i.e. close/free before
    * admitting at the same offset. Deterministic even for a req and
    * ret carrying the same reservation id and seq. */
  private def kindRank(k: String): Int = k match {
    case "cancel" => 0
    case "ret" => 1
    case _ => 2
  }

  private[streaming] val order: java.util.Comparator[SReq] =
    new java.util.Comparator[SReq] with Serializable {
      override def compare(a: SReq, b: SReq): Int = {
        val c = graft.tables.MergeOps.admissionCompare(
          a.seq, a.id, a.email, a.cantidad, b.seq, b.id, b.email, b.cantidad)
        if (c != 0) c else Integer.compare(kindRank(a.kind), kindRank(b.kind))
      }
    }

  /** The per-group transition function. */
  def admit(key: String, it: Iterator[SReq],
      state: GroupState[InvState]): Iterator[AdmitEvent] = {
    val reqs = it.toArray
    val out = new scala.collection.mutable.ArrayBuffer[AdmitEvent](reqs.length)
    def emit(id: String, email: String, cantidad: Int, admitted: Boolean,
        motivo: String, seq: Long, cap: Long, kind: String,
        estado: String): Unit =
      out += AdmitEvent(id, key, email, cantidad, admitted, motivo, seq,
        cap, kind, estado, out.length)
    // pre-validated failures: rejected verbatim, no state interaction
    val valid = new scala.collection.mutable.ArrayBuffer[SReq](reqs.length)
    reqs.foreach { r =>
      if (r.motivo != null)
        emit(r.id, r.email, r.cantidad, admitted = false, r.motivo, r.seq,
          -1L, "reject", null)
      else valid += r
    }
    if (!state.exists) {
      // no inventario row ever seeded for this key → unknown event
      valid.foreach { r =>
        emit(r.id, r.email, r.cantidad, admitted = false, "no_existe",
          r.seq, -1L, "reject", null)
      }
      return out.iterator
    }
    val st = state.get
    val arr = valid.toArray
    if (arr.length > 1) java.util.Arrays.sort(arr, order)
    var cap = st.capacidad
    var estado = st.estado
    val seen = scala.collection.mutable.HashSet.empty[String]
    seen ++= st.seen
    val returned = scala.collection.mutable.HashSet.empty[String]
    returned ++= st.returned
    var changed = false
    var i = 0
    while (i < arr.length) {
      val r = arr(i)
      r.kind match {
        case "ret" =>
          // O21 seat return: no CAPACITY guard, once per reservation
          // id. The estado='A' guard matches the batch fold
          // (admitReservations applies returns only to active events);
          // a blocked return is still marked processed — the batch
          // path appends to devoluciones unconditionally too, and a
          // closed event never reopens.
          if (!returned.contains(r.id)) {
            returned += r.id
            changed = true
            if (estado == "A") {
              cap += r.cantidad
              emit(r.id, r.email, r.cantidad, admitted = true, null,
                r.seq, cap, "return", estado)
            }
          }
        case "cancel" =>
          // O18 organizer cancel: estado C; requests after this seq
          // reject (the admission guard requires 'A'). Idempotent.
          if (estado != "C") {
            estado = "C"
            changed = true
            emit(r.id, r.email, 0, admitted = true, null, r.seq, cap,
              "cancel", estado)
          }
        case _ =>
          if (!seen.contains(r.id)) { // duplicate id → no-op, no log row
            val ok = estado == "A" && cap >= r.cantidad
            if (ok) {
              cap -= r.cantidad
              seen += r.id
              changed = true
              emit(r.id, r.email, r.cantidad, admitted = true, null,
                r.seq, cap, "admit", estado)
            } else {
              emit(r.id, r.email, r.cantidad, admitted = false,
                "sin_capacidad", r.seq, cap, "reject", estado)
            }
          }
      }
      i += 1
    }
    if (changed)
      state.update(InvState(cap, estado, seen.toSeq, returned.toSeq))
    out.iterator
  }
}
