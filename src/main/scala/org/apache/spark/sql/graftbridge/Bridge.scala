package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: `ExpressionUtils` (Expression <-> Column) is
  * `private[sql]` in Spark 4's classic backend, so the engine's custom
  * Catalyst expressions expose their Column API through this package —
  * the standard pattern Spark extension libraries use. Nothing else of
  * Spark's internals is re-exported. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
