package graft.tables

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  def admitReservations(inventario: DataFrame, requests: DataFrame)
      : (DataFrame, DataFrame) = {
    val spark = inventario.sparkSession
    val invSchema = inventario.schema
    val nombreIx = invSchema.fieldIndex("nombre")
    val capIx = invSchema.fieldIndex("capacidad")
    val estadoIx = invSchema.fieldIndex("estado")
    val logType = StructType(Seq(
      StructField("id", StringType), StructField("evento", StringType),
      StructField("email", StringType), StructField("cantidad", IntegerType),
      StructField("admitted", BooleanType), StructField("seq", LongType)))
    val outSchema = StructType(invSchema.fields :+
      StructField("__log", ArrayType(logType)))

    val invByKey = inventario.groupByKey(_.getString(nombreIx))(Encoders.STRING)
    val rIdIx = requests.schema.fieldIndex("id")
    val rEvIx = requests.schema.fieldIndex("evento")
    val rEmIx = requests.schema.fieldIndex("email")
    val rQIx = requests.schema.fieldIndex("cantidad")
    val rSeqIx = requests.schema.fieldIndex("seq")
    val reqByKey = requests.groupByKey(_.getString(rEvIx))(Encoders.STRING)

    val folded = invByKey.cogroup(reqByKey) { (key, invs, reqs) =>
      invs.map { inv =>
        // unknown-event requests never reach here (no inventario row);
        // unknownEventRequests surfaces them to callers
        val sorted = reqs.toArray.sortBy(r =>
          (r.getLong(rSeqIx), r.getString(rIdIx), r.getString(rEmIx),
            r.getInt(rQIx)))
        var cap = inv.getInt(capIx).toLong
        val active = inv.getString(estadoIx) == "A"
        val log = sorted.map { r =>
          val q = r.getInt(rQIx)
          val ok = active && (q <= 0 || cap >= q)
          if (ok) cap -= q
          Row(r.getString(rIdIx), key, r.getString(rEmIx), q, ok,
            r.getLong(rSeqIx))
        }
        val vals = inv.toSeq.toArray
        vals(capIx) = cap.toInt
        Row.fromSeq(vals.toSeq :+ log.toSeq)
      }
    }(Encoders.row(outSchema))

    val updated = folded.drop("__log")
    val log = folded
      .select(explode(col("__log")).as("r"))
      .select(col("r.id").as("id"), col("r.evento").as("evento"),
        col("r.email").as("email"), col("r.cantidad").as("cantidad"),
        col("r.admitted").as("admitted"), col("r.seq").as("seq"))
    (updated, log)
  }

  /** Unknown-event requests (no inventario row) — needed by flows to
    * emit rejections the fold never saw. */
  def unknownEventRequests(inventario: DataFrame, requests: DataFrame): DataFrame =
    requests.join(inventario.select(col("nombre")),
      requests("evento") === col("nombre"), "left_anti")
}
