package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Stream element for the keyed-state admission variant: a lifecycle
  * message for one event key. `kind` discriminates:
  *  - "create" — event creation (cantidad = initial capacity); the
  *               keyed-state analogue of eventCreationFlow, so events
  *               born after query start become admittable (first
  *               create wins, duplicates are no-ops);
  *  - "req"    — reservation request (id, email, cantidad);
  *  - "ret"    — seat return (cantidad seats back, id = the returned
  *               reservation, for idempotence);
  *  - "cancel" — organizer cancellation (estado → C).
  * `motivo` is pre-set to the validation failure
  * (cantidad_invalida / id_invalido) or null when valid. */
final case class SReq(id: String, evento: String, email: String,
    cantidad: Int, seq: Long, motivo: String, kind: String = "req")

/** Per-event keyed state: the remaining capacity, the event lifecycle
  * state, and the redelivery-dedup records — admitted ids (`seen`) and
  * returned ids (`returned`), each mapped to the `seq` at which they
  * were applied so entries older than the dedup horizon behind the
  * key's high-water mark (`highWater`) can be evicted. State size is
  * therefore bounded by the horizon window, not by history; the
  * reservas/devoluciones registries are the durable dedup record past
  * the horizon, and every (re)start reseeds from them. */
final case class InvState(capacidad: Long, estado: String,
    seen: Map[String, Long], returned: Map[String, Long],
    highWater: Long = 0L)

/** One lifecycle outcome row: the admission-log shape plus `kind`
  * ("create" | "admit" | "reject" | "return" | "cancel"), the
  * post-decision remaining capacity / estado of the key, and `ord` —
  * the row's position in the per-key fold, so downstream consumers can
  * recover the EXACT fold order (max_by(·, ord) = the key's final
  * state) without re-deriving the comparator's tiebreaks. */
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
 * estado) has ONE owner: creates, requests, seat returns and organizer
 * cancels arrive as one unioned stream, are folded per key in `seq`
 * order against state in the Spark state store, and every table
 * becomes a DOWNSTREAM materialization fed by the emitted log —
 * exactly how the reference holds admission state in MongoDB while
 * Kafka carries the changelog (reservas/main.go:151-165,
 * inventario/main.go:105-133). Decisions are O(batch); checkpointing
 * is incremental (RocksDB + changelog checkpointing in production).
 *
 * Semantics parity (FlowsSpec S2-S5/S8, StatefulAdmissionSpec):
 * per-key messages apply in (seq, id, email, cantidad) order;
 * duplicate request ids and duplicate return ids are no-ops (the
 * `seen`/`returned` maps ARE the anti-joins the batch flows perform
 * against reservas/devoluciones); keys with no state row and no
 * create are unknown events → motivo no_existe; returns carry no
 * capacity guard (inventario/main.go:117-123); organizer cancel flips
 * estado to 'C' so later requests reject with motivo evento_cerrado
 * (the same label the batch flow derives from estado≠'A');
 * pre-validated failures pass through as rejections without touching
 * state.
 *
 * Dedup TTL contract: ids whose recording `seq` falls more than
 * `horizon` offsets behind the key's high-water mark are evicted from
 * state. Safe because (a) at-least-once redelivery lag within one
 * uninterrupted run is bounded (a Kafka consumer redelivers from its
 * last commit, never from the topic's origin), and (b) every admitted
 * id is durably registered in reservas / devoluciones, from which
 * every (re)start reseeds — so a restart re-arms dedup for ALL
 * history, not just the horizon window.
 *
 * Registry-seeded entries carry the [[SeedSeq]] sentinel, NOT a real
 * offset: the registries record ids, not the offsets they were applied
 * at, and stream offsets are absolute (a first post-restart batch can
 * sit billions of offsets past 0). Seeds are re-anchored at the key's
 * first observed offset of the current run before TTL runs, so they
 * evict only once the run's OWN traffic has advanced `horizon` offsets
 * past the restart point — by which time at-least-once redelivery of
 * pre-restart messages is no longer possible. Anchoring seeds at 0
 * instead would evict the entire reseeded history in the first batch
 * whose high-water clears the horizon, re-admitting registered
 * reservations in batch 2+ of a replay.
 */
object StatefulAdmission {

  /** Sentinel `seq` for dedup entries reseeded from the durable
    * registries at query start; re-anchored to the key's first
    * observed offset of the run in [[admit]] before TTL eviction. */
  val SeedSeq: Long = -1L

  /** Lifecycle order within a key: MergeOps.admissionCompare (the ONE
    * admission ordering, shared with the batch fold), extended with a
    * kind rank for the unioned stream — at an identical (seq, id,
    * email, cantidad), create < cancel < ret < req, i.e. materialize /
    * close / free before admitting at the same offset. Deterministic
    * even for a req and ret carrying the same reservation id and seq. */
  private def kindRank(k: String): Int = k match {
    case "create" => 0
    case "cancel" => 1
    case "ret" => 2
    case _ => 3
  }

  private[streaming] val order: java.util.Comparator[SReq] =
    new java.util.Comparator[SReq] with Serializable {
      override def compare(a: SReq, b: SReq): Int = {
        val c = graft.tables.MergeOps.admissionCompare(
          a.seq, a.id, a.email, a.cantidad, b.seq, b.id, b.email, b.cantidad)
        if (c != 0) c else Integer.compare(kindRank(a.kind), kindRank(b.kind))
      }
    }

  /** The per-group transition function, curried on the dedup horizon
    * (Flows threads its `dedupHorizon` constructor parameter here). */
  def admit(horizon: Long)(key: String, it: Iterator[SReq],
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
    val arr = valid.toArray
    if (arr.length > 1) java.util.Arrays.sort(arr, order)
    var exists = state.exists
    var cap = 0L
    var estado: String = null
    val seen = scala.collection.mutable.HashMap.empty[String, Long]
    val returned = scala.collection.mutable.HashMap.empty[String, Long]
    var hw = 0L
    if (exists) {
      val st = state.get
      cap = st.capacidad
      estado = st.estado
      seen ++= st.seen
      returned ++= st.returned
      hw = st.highWater
    }
    var changed = false
    // re-anchor registry seeds at the run's first observed offset for
    // this key: with valid traffic in hand, min(batch seq) is (an upper
    // bound on) the restart point, so seeded history stays dedup-armed
    // until the run itself has covered `horizon` offsets past it
    if (arr.nonEmpty &&
        (seen.valuesIterator.contains(SeedSeq) ||
         returned.valuesIterator.contains(SeedSeq))) {
      var anchor = Long.MaxValue
      var j = 0
      while (j < arr.length) {
        if (arr(j).seq < anchor) anchor = arr(j).seq
        j += 1
      }
      seen.mapValuesInPlace((_, s) => if (s == SeedSeq) anchor else s)
      returned.mapValuesInPlace((_, s) => if (s == SeedSeq) anchor else s)
      changed = true
    }
    var i = 0
    while (i < arr.length) {
      val r = arr(i)
      r.kind match {
        case "create" =>
          // event creation: first create materializes the key (full
          // capacity, estado A); a duplicate create is a silent no-op —
          // first-wins, the keyed-state analogue of appendUnique on
          // nombre in eventCreationFlow (S1)
          if (!exists) {
            exists = true
            cap = r.cantidad.toLong
            estado = "A"
            changed = true
            if (r.seq > hw) hw = r.seq
            emit(r.id, r.email, r.cantidad, admitted = true, null, r.seq,
              cap, "create", estado)
          }
        case _ if !exists =>
          // no inventario row seeded and no create seen → unknown event
          emit(r.id, r.email, r.cantidad, admitted = false, "no_existe",
            r.seq, -1L, "reject", null)
        case "ret" =>
          // O21 seat return: no CAPACITY guard, once per reservation
          // id. The estado='A' guard matches the batch fold
          // (admitReservations applies returns only to active events);
          // a blocked return is still marked processed — the batch
          // path appends to devoluciones unconditionally too, and a
          // closed event never reopens.
          if (!returned.contains(r.id)) {
            returned.put(r.id, r.seq)
            changed = true
            if (r.seq > hw) hw = r.seq
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
            if (r.seq > hw) hw = r.seq
            emit(r.id, r.email, 0, admitted = true, null, r.seq, cap,
              "cancel", estado)
          }
        case _ =>
          if (!seen.contains(r.id)) { // duplicate id → no-op, no log row
            val ok = estado == "A" && cap >= r.cantidad
            if (ok) {
              cap -= r.cantidad
              seen.put(r.id, r.seq)
              changed = true
              if (r.seq > hw) hw = r.seq
              emit(r.id, r.email, r.cantidad, admitted = true, null,
                r.seq, cap, "admit", estado)
            } else {
              // the batch flow derives the same label from the
              // inventario estado — the two engines agree on motivos
              val motivo = if (estado != "A") "evento_cerrado"
                           else "sin_capacidad"
              emit(r.id, r.email, r.cantidad, admitted = false,
                motivo, r.seq, cap, "reject", estado)
            }
          }
      }
      i += 1
    }
    // TTL eviction: drop dedup entries recorded more than `horizon`
    // offsets behind the high-water mark. Registry seeds were
    // re-anchored above to this run's first offset, so they age out
    // only after the run's own traffic spans the horizon (the
    // registries stay the durable record past that)
    if (exists && hw > horizon) {
      val floor = hw - horizon
      val s0 = seen.size + returned.size
      seen.filterInPlace((_, s) => s >= floor)
      returned.filterInPlace((_, s) => s >= floor)
      if (seen.size + returned.size != s0) changed = true
    }
    if (changed)
      state.update(InvState(cap, estado, seen.toMap, returned.toMap, hw))
    out.iterator
  }
}
