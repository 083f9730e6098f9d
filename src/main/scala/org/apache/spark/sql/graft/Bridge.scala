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
}
