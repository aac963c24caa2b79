package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression→Column bridge for graft code outside org.apache.spark.sql:
  * `ExpressionUtils` is private[sql], so the wrap lives here beside
  * [[VectorExpressions]] (the same third-party expression-library
  * pattern). Used by the zone-map predicate translation, which
  * pattern-matches parsed Catalyst trees and re-wraps their Literal
  * leaves as Columns. */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
