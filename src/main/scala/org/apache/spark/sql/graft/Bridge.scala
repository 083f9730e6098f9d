package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 narrowed these converters to
  * `private[sql]`; extension libraries (this one included) reach them
  * via a shim in the sql package namespace — the same technique used
  * by Delta/Iceberg/Sedona for their custom expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-wraps a (typically `localCheckpoint`ed) frame's physical RDD in
    * a FRESH `LogicalRDD` carrying no inherited constraints or stats.
    * Why: `Dataset.checkpoint` copies the optimized plan's constraints
    * onto its `LogicalRDD`; when that leaf is later self-joined or
    * unioned, `DeduplicateRelations`/`Union.rewriteConstraints` can hit
    * a constraint referencing an attribute id that is no longer in the
    * re-instanced output — `java.util.NoSuchElementException: key not
    * found: <attr>` at analysis time (observed on the CC superstep's
    * `lab.unionByName(prop)` + self-join in Spark 4.1.2). Dropping the
    * constraints loses nothing here: the callers' loop plans are
    * trivial scans/aggregates that gain no pruning from them. Zero data
    * movement — `toRdd` over a checkpointed plan is a scan of the
    * already-materialized blocks. */
  def freshLeaf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema)
  }
}
