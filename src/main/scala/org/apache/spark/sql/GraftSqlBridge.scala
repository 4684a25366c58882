package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` column/expression plumbing so graft can
  * expose custom Catalyst Expressions as user-facing Columns — the
  * same technique Spark extension libraries use (the public API only
  * builds Columns from ColumnNodes since Spark 4). */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
