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

  /** O17/O22 — insert-if-absent on a unique key. Duplicate keys inside
    * the batch collapse to the first row by `tieBreak` ordering;
    * rows whose key already exists in the target are dropped
    * (reference: duplicate insert → tolerated no-op,
    * inventario/main.go:91-93). */
  def insertIfAbsent(target: DataFrame, batch: DataFrame, key: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val ordered = if (tieBreak.nonEmpty) tieBreak else Seq(lit(1))
    val w = Window.partitionBy(key.map(col): _*).orderBy(ordered: _*)
    val dedup = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fresh = dedup.join(target.select(key.map(col): _*), key, "left_anti")
    target.unionByName(fresh.select(target.columns.map(col): _*))
  }

  /** O18/O20 — guarded single-column update: WHEN MATCHED AND guard
    * THEN SET. `guard` may reference target columns; `sets` assigns
    * target columns from target and/or batch columns (batch columns
    * must be selected into the join via `batchCols`). */
  def guardedUpdate(target: DataFrame, batch: DataFrame, key: Seq[String],
      guard: Column, sets: Map[String, Column],
      batchCols: Seq[String] = Nil): DataFrame = {
    val b = batch.select((key ++ batchCols).distinct.map(c => col(c).as(s"__b_$c")): _*)
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
    * Requests are folded per event key in `seq` order (the stand-in
    * for Kafka offset order, which the reference gets for free from
    * single-partition topics): each request is admitted iff the event
    * exists, estado='A', and remaining capacity covers it; admitted
    * requests decrement the running capacity. Seat returns are the
    * same fold with negative `cantidad` and no capacity guard.
    *
    * Returns (updated inventario, admission log with `admitted` flag).
    *
    * Implementation: `groupBy(evento)` aggregates the batch into a
    * sorted per-key request list (map-side combinable), one broadcast
    * or shuffle join against inventario, then a single `aggregate`
    * fold per key — the per-key serialization the reference relies on,
    * with cross-key parallelism the reference never had. */
  def admitReservations(inventario: DataFrame, requests: DataFrame)
      : (DataFrame, DataFrame) = {
    // batch → per-key ordered request array
    val perKey = requests
      .groupBy(col("evento"))
      .agg(sort_array(collect_list(struct(
        col("seq"), col("id"), col("email"), col("cantidad")))).as("reqs"))

    val joined = inventario.join(perKey,
      col("nombre") === col("evento"), "left")

    // fold: acc = struct(cap, decisions: array[struct(seq,id,email,cantidad,admitted)])
    val folded = joined.withColumn("fold",
      when(col("reqs").isNull, lit(null))
        .otherwise(aggregate(
          col("reqs"),
          struct(col("capacidad").cast("long").as("cap"),
            expr("CAST(array() AS ARRAY<STRUCT<seq: BIGINT, id: STRING, email: STRING, cantidad: INT, admitted: BOOLEAN>>)").as("log")),
          (acc, r) => {
            val ok = col("estado") === "A" &&
              (r.getField("cantidad") <= 0 || // seat return: no guard
                acc.getField("cap") >= r.getField("cantidad"))
            struct(
              when(ok, acc.getField("cap") - r.getField("cantidad"))
                .otherwise(acc.getField("cap")).as("cap"),
              concat(acc.getField("log"), array(struct(
                r.getField("seq").as("seq"), r.getField("id").as("id"),
                r.getField("email").as("email"),
                r.getField("cantidad").as("cantidad"), ok.as("admitted"))))
                .as("log"))
          })))

    val updated = folded.select(
      (inventario.columns.map {
        case "capacidad" => when(col("fold").isNotNull,
          col("fold.cap").cast("int")).otherwise(col("capacidad")).as("capacidad")
        case c => col(c)
      }): _*)

    val log = folded
      .filter(col("fold").isNotNull)
      .select(col("nombre").as("evento"), explode(col("fold.log")).as("r"))
      .select(col("r.id").as("id"), col("evento"), col("r.email").as("email"),
        col("r.cantidad").as("cantidad"), col("r.admitted").as("admitted"),
        col("r.seq").as("seq"))
    (updated, log)
  }

  /** Unknown-event requests (no inventario row) — needed by flows to
    * emit rejections the fold never saw. */
  def unknownEventRequests(inventario: DataFrame, requests: DataFrame): DataFrame =
    requests.join(inventario.select(col("nombre")),
      requests("evento") === col("nombre"), "left_anti")
}
