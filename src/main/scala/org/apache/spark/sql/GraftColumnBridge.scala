package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge exposing Spark's package-private Column ⇄ Expression
  * converters to graft's custom Catalyst expressions. Spark 4 removed
  * the public `Column(expr)` constructor in the Spark Connect
  * refactor; extension libraries conventionally reach the classic
  * converters through a same-package object like this. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
