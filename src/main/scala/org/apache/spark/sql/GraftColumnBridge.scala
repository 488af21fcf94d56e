package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column↔Expression converters, the
 * standard mechanism for libraries that ship native Catalyst expressions
 * (Spark 4 made `Column` implementation-agnostic; the classic converters
 * live behind package-private access). The only residents of this package
 * in the project are these two forwarders.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
