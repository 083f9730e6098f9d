package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Stream element for the keyed-state admission variant: a validated
  * reservation request, with `motivo` pre-set to the validation
  * failure (cantidad_invalida / id_invalido) or null when valid. */
final case class SReq(id: String, evento: String, email: String,
    cantidad: Int, seq: Long, motivo: String)

/** Per-event keyed state: the remaining capacity, the event lifecycle
  * state, and the ids already admitted (redelivery dedup). At scale
  * `seen` is bounded by a state TTL (watermark-scoped; the reservas
  * registry stays the durable source of truth past the TTL horizon) —
  * unbounded here because test corpora are finite. */
final case class InvState(capacidad: Long, estado: String,
    seen: Seq[String])

/** One admission outcome row: the same shape as the batch fold's log
  * plus `motivo` (null when admitted) and the post-decision remaining
  * capacity of the key. */
final case class AdmitEvent(id: String, evento: String, email: String,
    cantidad: Int, admitted: Boolean, motivo: String, seq: Long,
    capacidad: Long)

/**
 * Keyed-state admission (O19/O30, ROADMAP §7): the
 * `flatMapGroupsWithState` formulation of `MergeOps.admitReservations`.
 *
 * The batch-MERGE flow reloads the inventario snapshot and rewrites it
 * every micro-batch — O(table) per trigger. Here the oversell guard
 * runs against PER-KEY STATE in the Spark state store: decisions are
 * O(batch), the state store checkpoints incrementally (with RocksDB +
 * `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing
 * .enabled=true` the per-trigger upload is just the changelog), and the
 * inventario table becomes a DOWNSTREAM materialization fed by the
 * emitted log — exactly how the reference holds admission state in
 * MongoDB while Kafka carries the changelog (reservas/main.go:151-165).
 *
 * Semantics parity with the batch fold (FlowsSpec S2/S5/S5b/S8/O16):
 * per-key requests admit in (seq, id, email, cantidad) order under the
 * estado='A' + capacity guard; within-batch and cross-batch duplicate
 * ids are no-ops (the `seen` set IS the anti-join against reservas);
 * keys with no state row are unknown events → motivo no_existe;
 * pre-validated failures pass through as rejections without touching
 * state.
 *
 * Single-owner-per-key: this operator owns (capacidad, estado) for its
 * keys. Lifecycle transitions (organizer cancel, seat returns) enter as
 * further input streams unioned into the same operator in a full
 * deployment — not as concurrent table writers.
 */
object StatefulAdmission {

  /** Admission order — mirrors MergeOps.AdmitReqOrder. */
  private[streaming] val order: java.util.Comparator[SReq] =
    new java.util.Comparator[SReq] {
      private def nullFirst(a: String, b: String): Int =
        if (a eq b) 0
        else if (a == null) -1
        else if (b == null) 1
        else a.compareTo(b)
      override def compare(a: SReq, b: SReq): Int = {
        val c1 = java.lang.Long.compare(a.seq, b.seq)
        if (c1 != 0) return c1
        val c2 = nullFirst(a.id, b.id)
        if (c2 != 0) return c2
        val c3 = nullFirst(a.email, b.email)
        if (c3 != 0) return c3
        Integer.compare(a.cantidad, b.cantidad)
      }
    }

  /** The per-group transition function. */
  def admit(key: String, it: Iterator[SReq],
      state: GroupState[InvState]): Iterator[AdmitEvent] = {
    val reqs = it.toArray
    val out = new scala.collection.mutable.ArrayBuffer[AdmitEvent](reqs.length)
    // pre-validated failures: rejected verbatim, no state interaction
    val valid = new scala.collection.mutable.ArrayBuffer[SReq](reqs.length)
    reqs.foreach { r =>
      if (r.motivo != null)
        out += AdmitEvent(r.id, key, r.email, r.cantidad,
          admitted = false, r.motivo, r.seq, -1L)
      else valid += r
    }
    if (!state.exists) {
      // no inventario row ever seeded for this key → unknown event
      valid.foreach { r =>
        out += AdmitEvent(r.id, key, r.email, r.cantidad,
          admitted = false, "no_existe", r.seq, -1L)
      }
      return out.iterator
    }
    val st = state.get
    val arr = valid.toArray
    if (arr.length > 1) java.util.Arrays.sort(arr, order)
    var cap = st.capacidad
    val active = st.estado == "A"
    val seen = scala.collection.mutable.HashSet.empty[String]
    seen ++= st.seen
    var changed = false
    var i = 0
    while (i < arr.length) {
      val r = arr(i)
      if (!seen.contains(r.id)) { // duplicate id → no-op, no log row
        val ok = active && cap >= r.cantidad
        if (ok) {
          cap -= r.cantidad
          seen += r.id
          changed = true
          out += AdmitEvent(r.id, key, r.email, r.cantidad,
            admitted = true, null, r.seq, cap)
        } else {
          out += AdmitEvent(r.id, key, r.email, r.cantidad,
            admitted = false, "sin_capacidad", r.seq, cap)
        }
      }
      i += 1
    }
    if (changed) state.update(InvState(cap, st.estado, seen.toSeq))
    out.iterator
  }
}
