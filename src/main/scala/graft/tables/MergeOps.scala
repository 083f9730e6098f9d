package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch MERGE primitives — the declarative re-expression of the
 * reference's MongoDB `findAndModify` mutations (SURVEY.md §2
 * O17–O23). Each primitive takes the current table snapshot plus a
 * batch of changes and returns the new snapshot (storage swap is
 * TableStore's job), so the same functions serve batch jobs and
 * `foreachBatch` streaming sinks.
 *
 * Scale notes: every primitive is a single equi-join (or
 * aggregate+join) on the merge key — at 100 TB these run as shuffle
 * hash joins partitioned by key, or broadcast joins when the change
 * batch is small (the common case for CDC micro-batches: a batch of
 * thousands merging into a table of billions broadcasts the batch, not
 * the table).
 */
object MergeOps {

  /** One row per `key`: the FIRST by `tieBreak` ordering, an arbitrary
    * row when the ordering is empty (dropDuplicates — a hash agg, no
    * window shuffle). The ONE in-batch keyed dedup shared by the
    * idempotent merges, TableStore.appendUnique and the ingest flows,
    * so ordering/determinism fixes land in one place. */
  def dedupBy(df: DataFrame, key: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame =
    if (tieBreak.isEmpty) df.dropDuplicates(key)
    else {
      val w = Window.partitionBy(key.map(col): _*).orderBy(tieBreak: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === lit(1)).drop("__rn")
    }

  /** O17/O22 — insert-if-absent on a unique key. Duplicate keys inside
    * the batch collapse to the first row by `tieBreak` ordering;
    * rows whose key already exists in the target are dropped
    * (reference: duplicate insert → tolerated no-op,
    * inventario/main.go:91-93). */
  def insertIfAbsent(target: DataFrame, batch: DataFrame, key: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val fresh = dedupBy(batch, key, tieBreak)
      .join(target.select(key.map(col): _*), key, "left_anti")
    target.unionByName(fresh.select(target.columns.map(col): _*))
  }

  /** O18/O20 — guarded single-column update: WHEN MATCHED AND guard
    * THEN SET. `guard` may reference target columns; `sets` assigns
    * target columns from target and/or batch columns (batch columns
    * must be selected into the join via `batchCols`). */
  def guardedUpdate(target: DataFrame, batch: DataFrame, key: Seq[String],
      guard: Column, sets: Map[String, Column],
      batchCols: Seq[String] = Nil): DataFrame = {
    // dedupe batch keys (deterministically, by batch-column order): a
    // left join against duplicate keys would MULTIPLY target rows
    val cols = (key ++ batchCols).distinct
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(cols.filterNot(key.contains).map(col) :+ lit(1): _*)
    val b = batch
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(cols.map(c => col(c).as(s"__b_$c")): _*)
    val joined = target.join(b,
      key.map(k => col(k) === col(s"__b_$k")).reduce(_ && _), "left")
    val matched = col(s"__b_${key.head}").isNotNull && guard
    joined.select(target.columns.map { c =>
      sets.get(c) match {
        case Some(v) => when(matched, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
  }

  /** O23 — cascade / semi-join update: set columns on every target row
    * whose key appears in `filterSource` and that passes `guard`. */
  def semiJoinUpdate(target: DataFrame, filterSource: DataFrame,
      targetKey: String, sourceKey: String, guard: Column,
      sets: Map[String, Column]): DataFrame = {
    val keys = filterSource.select(col(sourceKey).as("__k")).distinct()
    val joined = target.join(keys, col(targetKey) === col("__k"), "left")
    val matched = col("__k").isNotNull && guard
    joined.select(target.columns.map { c =>
      sets.get(c) match {
        case Some(v) => when(matched, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
  }

  /** O19/O21 + S8 — the one genuinely stateful operator: per-key
    * ordered admission of capacity deltas with an oversell guard.
    *
    * Requests are folded per event key in `(seq, id, email, cantidad)`
    * order (`seq` stands in for Kafka offset order, which the
    * reference gets for free from single-partition topics): each
    * request is admitted iff the event exists, estado='A', and
    * remaining capacity covers it; admitted requests decrement the
    * running capacity. Seat returns are the same fold with negative
    * `cantidad` and no capacity guard.
    *
    * Returns (updated inventario, admission log with `admitted` flag).
    *
    * Implementation: typed `cogroup` on the event key — both sides
    * shuffle once, then each key folds in plain Scala (O(n) per key,
    * JIT-compiled). This is the textbook case for dropping out of
    * Catalyst: a data-dependent running fold that emits a per-element
    * decision log has no efficient expression form (an `aggregate`
    * fold that appends to an array accumulator is O(n²) in copies —
    * measured 30 s for 600k requests where this cogroup takes ~2 s).
    * Per-key serialization is the semantic the reference relies on;
    * cross-key parallelism is what it never had. */
  /** Typed fold records — top-level-object case classes so their
    * product encoders codegen (no generic-Row boxing on the hot path;
    * the Row-based first cut of this fold cost ~10× in the bench). */
  final case class AdmitReq(id: String, evento: String, email: String,
      cantidad: Int, seq: Long)
  final case class InvKeyState(nombre: String, capacidad: Int, estado: String)
  /** Flat fold output — one row per request. Flat rows (vs a per-key
    * nested log array) keep the output encoder a cheap product
    * encoder. */
  final case class AdmitOut(id: String, evento: String, email: String,
      cantidad: Int, admitted: Boolean, seq: Long)

  /** THE admission ordering — (seq, id, email, cantidad), nulls first.
    * Single definition shared by the batch cogroup fold below and the
    * keyed-state operator (StatefulAdmission.order), so the two
    * admission engines cannot drift apart. Allocation-free (the
    * tuple-Ordering it replaced threw on nulls). */
  private[graft] def admissionCompare(aSeq: Long, aId: String,
      aEmail: String, aCant: Int, bSeq: Long, bId: String,
      bEmail: String, bCant: Int): Int = {
    def nc(a: String, b: String): Int =
      if (a eq b) 0 else if (a == null) -1 else if (b == null) 1
      else a.compareTo(b)
    var c = java.lang.Long.compare(aSeq, bSeq)
    if (c != 0) return c
    c = nc(aId, bId)
    if (c != 0) return c
    c = nc(aEmail, bEmail)
    if (c != 0) return c
    Integer.compare(aCant, bCant)
  }

  private[tables] object AdmitReqOrder
      extends java.util.Comparator[AdmitReq] with Serializable {
    override def compare(x: AdmitReq, y: AdmitReq): Int =
      admissionCompare(x.seq, x.id, x.email, x.cantidad,
        y.seq, y.id, y.email, y.cantidad)
  }

  /** One row of the tagged-union cogroup input: side 0 = inventario
    * (capacidad/estado live), side 1 = request (id/email/cantidad/seq
    * live). Top-level case class so the product encoder codegens. */
  final case class AdmitMerge(k: String, side: Int, capacidad: Int,
      estado: String, id: String, email: String, cantidad: Int, seq: Long)

  /** The per-partition admission fold over key-clustered, side-ordered
    * [[AdmitMerge]] rows (inv rows of a key first, then its requests —
    * the upstream sort guarantees it). Semantics are EXACTLY the r9
    * cogroup fold's: requests of a key sort by [[AdmitReqOrder]] (the
    * ONE admission ordering — deliberately NOT the Catalyst sort,
    * whose UTF8String binary order diverges from String.compareTo on
    * non-ASCII ids, and cross-engine order agreement with
    * StatefulAdmission matters more than one in-fold sort); each
    * inventario row of the key replays the whole request sequence
    * against its own capacity; keys missing either side emit nothing
    * (unknownEventRequests surfaces the no-inventario ones). */
  private[tables] def foldAdmitPartition(
      rows: Iterator[AdmitMerge]): Iterator[AdmitOut] = {
    val it = rows.buffered
    new Iterator[Array[AdmitOut]] {
      override def hasNext: Boolean = it.hasNext
      override def next(): Array[AdmitOut] = {
        val k = it.head.k
        @inline def same(r: AdmitMerge): Boolean =
          if (k == null) r.k == null else k == r.k
        // inventario states of this key (side 0 sorts first; almost
        // always exactly one row — keep the >1 path allocation-lazy)
        var nInv = 0
        var invHead: InvKeyState = null
        var invMore: scala.collection.mutable.ArrayBuffer[InvKeyState] = null
        while (it.hasNext && same(it.head) && it.head.side == 0) {
          val r = it.next()
          val st = InvKeyState(r.k, r.capacidad, r.estado)
          if (nInv == 0) invHead = st
          else {
            if (invMore == null)
              invMore = new scala.collection.mutable.ArrayBuffer[InvKeyState](2)
            invMore += st
          }
          nInv += 1
        }
        val reqB = new scala.collection.mutable.ArrayBuffer[AdmitReq](8)
        while (it.hasNext && same(it.head)) {
          val r = it.next()
          reqB += AdmitReq(r.id, k, r.email, r.cantidad, r.seq)
        }
        if (nInv == 0 || reqB.isEmpty) Array.empty
        else {
          val arr = reqB.toArray
          if (arr.length > 1) java.util.Arrays.sort(arr, AdmitReqOrder)
          val out = new Array[AdmitOut](arr.length * nInv)
          var v = 0
          while (v < nInv) {
            val st = if (v == 0) invHead else invMore(v - 1)
            var cap = st.capacidad.toLong
            val active = st.estado == "A"
            val base = v * arr.length
            var i = 0
            while (i < arr.length) {
              val r = arr(i)
              val ok = active && (r.cantidad <= 0 || cap >= r.cantidad)
              if (ok) cap -= r.cantidad
              out(base + i) = AdmitOut(r.id, k, r.email, r.cantidad, ok, r.seq)
              i += 1
            }
            v += 1
          }
          out
        }
      }
    }.flatMap(_.iterator)
  }

  def admitReservations(inventario: DataFrame, requests: DataFrame)
      : (DataFrame, DataFrame) = {
    val spark = inventario.sparkSession
    import spark.implicits._

    // project to the typed fold inputs: only (nombre, capacidad,
    // estado) ride the shuffle for the target side — the rest of the
    // inventario row rejoins AFTER the fold, so wide target schemas
    // never pay the fold's encoder cost.
    //
    // r18 (guide §4 — objects only where the fold itself runs): the r9
    // form was groupByKey(lambda).cogroup(groupByKey(lambda)), which
    // pays a WHOLE object-deserialization pass per side just to
    // extract the grouping key (AppendColumns) before CoGroupExec
    // deserializes both sides again for the fold. The tagged union
    // keys relationally (no objects), shuffles ONCE, clusters with the
    // Tungsten radix sort on (k, side), and deserializes each row
    // exactly once — inside the fold that needs the object.
    val invM = inventario.select(
      col("nombre").cast("string").as("k"), lit(0).as("side"),
      col("capacidad").cast("int").as("capacidad"),
      col("estado").cast("string").as("estado"),
      lit(null).cast("string").as("id"), lit(null).cast("string").as("email"),
      lit(0).as("cantidad"), lit(0L).as("seq"))
    val reqM = requests.select(
      col("evento").cast("string").as("k"), lit(1).as("side"),
      lit(0).as("capacidad"), lit(null).cast("string").as("estado"),
      col("id").cast("string").as("id"),
      col("email").cast("string").as("email"),
      col("cantidad").cast("int").as("cantidad"),
      col("seq").cast("long").as("seq"))
    val log = invM.unionByName(reqM)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("side"))
      .as[AdmitMerge]
      .mapPartitions(foldAdmitPartition _)
      .toDF()

    // the updated snapshot is DERIVED FROM THE LOG (cap' = cap − Σ
    // admitted deltas per key — exactly the fold's final capacity), so
    // a caller that persists `log` evaluates the cogroup ONCE for both
    // outputs instead of once per output. The per-key delta side is one
    // row per touched key — broadcastable in the CDC common case.
    val delta = log.filter(col("admitted"))
      .groupBy(col("evento").as("__nombre"))
      .agg(sum(col("cantidad")).as("__delta"))
    val capType = inventario.schema("capacidad").dataType
    val updated = inventario
      .join(delta, col("nombre") === col("__nombre"), "left")
      .select(inventario.columns.map {
        case "capacidad" => (col("capacidad") - coalesce(col("__delta"), lit(0L)))
          .cast(capType).as("capacidad")
        case c => col(c)
      }: _*)
    (updated, log)
  }

  /** Unknown-event requests (no inventario row) — needed by flows to
    * emit rejections the fold never saw. */
  def unknownEventRequests(inventario: DataFrame, requests: DataFrame): DataFrame =
    requests.join(inventario.select(col("nombre")),
      requests("evento") === col("nombre"), "left_anti")
}
