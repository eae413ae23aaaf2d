package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Bridge to classic-mode internals that are `private[sql]` in Spark 4:
  * Column <-> catalyst Expression conversion and SQL function registration.
  * Lives under org.apache.spark.sql so the Scala access check passes.
  */
object Shim {
  /** Public alias for the private[sql] AbstractDataType, so expressions in
    * graft.* can declare `inputTypes` (type coercion from SQL literals). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
