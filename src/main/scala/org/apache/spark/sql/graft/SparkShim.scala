package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility shim: `ExpressionUtils` (the classic-mode bridge
  * between the public `Column` API and Catalyst `Expression`s) is
  * `private[sql]`, so this one-file object lives under the sql package to
  * re-export the two conversions the graft expression layer needs. No Spark
  * internals are modified or shadowed. */
object SparkShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
