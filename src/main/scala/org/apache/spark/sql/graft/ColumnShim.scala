package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between catalyst Expressions and the public Column API.
  *
  * Spark 4 scopes `ExpressionUtils.column` as private[sql]; libraries that
  * add custom expressions without going through the session function
  * registry use exactly this in-package shim (keeping query functions
  * independent of any session-level extension registration, so the driver
  * can run them on a vanilla SparkSession).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into an ALREADY-RUNNING session (the
    * extensions path only applies at builder time; `sessionState` is
    * private[sql], hence this in-package helper).
    */
  def registerFunction(spark: org.apache.spark.sql.classic.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
