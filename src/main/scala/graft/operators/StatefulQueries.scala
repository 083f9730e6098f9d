package graft.operators

import graft.Query
import graft.sources.Tables.table
import graft.tables.MergeOps
import org.apache.spark.sql.functions._

/**
 * Batch twin of the stateful admission operator (O19/S8): replays a
 * deterministic request stream derived from `lineitem` against
 * capacities derived from `part`, through the SAME
 * `MergeOps.admitReservations` fold the streaming flow uses — then the
 * DuckDB oracle recomputes the per-key guarded fold independently
 * (`list_reduce` over seq-ordered quantities). 60k–600k requests of
 * cross-engine agreement on the trickiest operator in the engine.
 */
object StatefulQueries {

  val all: Seq[Query] = Seq(
    Query("x16_admission",
      // NB: the oracle folds row-by-row via a RECURSIVE CTE. The
      // natural list-based forms are unusable in DuckDB 1.0: both
      // `list(x ORDER BY y)` and `list_reduce(list_sort(list(x)))`
      // return thread-order-dependent results under parallel grouping.
      "WITH RECURSIVE " +
        "caps AS (SELECT CAST(p_partkey AS VARCHAR) AS nombre, " +
        "CAST(p_size * 10 AS BIGINT) AS cap0 FROM part), " +
        "rr AS (SELECT CAST(l_partkey AS VARCHAR) AS nombre, " +
        "CAST(l_quantity AS BIGINT) AS q, " +
        // ties: the fixture contains duplicate (orderkey, linenumber)
        // rows with different quantities → quantity is the tiebreak,
        // matching the engine's struct-sort order
        "ROW_NUMBER() OVER (PARTITION BY CAST(l_partkey AS VARCHAR) " +
        "ORDER BY l_orderkey * 10 + l_linenumber, CAST(l_quantity AS BIGINT)) " +
        "AS rn FROM lineitem), " +
        "f(nombre, rn, acc) AS (" +
        "SELECT nombre, CAST(0 AS BIGINT), cap0 FROM caps " +
        "UNION ALL " +
        "SELECT f.nombre, f.rn + 1, " +
        "CASE WHEN r.q <= f.acc THEN f.acc - r.q ELSE f.acc END " +
        "FROM f JOIN rr r ON r.nombre = f.nombre AND r.rn = f.rn + 1), " +
        "last AS (SELECT nombre, acc, ROW_NUMBER() OVER " +
        "(PARTITION BY nombre ORDER BY rn DESC) AS k FROM f) " +
        "SELECT nombre, acc AS capacidad FROM last WHERE k = 1 ORDER BY nombre") {
      (s, d) =>
        val caps = table(s, d, "part").select(
          col("p_partkey").cast("string").as("id"),
          col("p_partkey").cast("string").as("nombre"),
          (col("p_size") * 10).as("capacidad"),
          lit("Cat").as("categoria"), lit("A").as("estado"))
        val reqs = table(s, d, "lineitem").select(
          concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("id"),
          col("l_partkey").cast("string").as("evento"),
          lit("e@y").as("email"),
          col("l_quantity").cast("int").as("cantidad"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("seq"))
        val (updated, _) = MergeOps.admitReservations(caps, reqs)
        updated
          .select(col("nombre"), col("capacidad").cast("bigint").as("capacidad"))
          .orderBy("nombre")
    })
}
