package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Column↔Expression conversion — the
  * standard pattern for out-of-tree Catalyst expressions (same technique
  * every public Spark extension library uses). No Spark internals are
  * modified; this only re-exports two conversions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
