package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the conversions
  * `private[sql]` (Column is ColumnNode-based); custom Catalyst
  * expressions still need them, so this object lives under
  * org.apache.spark.sql to reach ExpressionUtils. */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` is `private[sql]` in Spark 4, but expressions
  * outside org.apache.spark.sql still need it to declare
  * `ExpectsInputTypes.inputTypes`. The alias is public; the underlying
  * type resolves because this file lives under org.apache.spark.sql. */
object BridgeTypes {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}

/** Custom-LogicalPlan plumbing that Spark 4 keeps `private[sql]`:
  * building a DataFrame from a hand-constructed logical node. */
object BridgePlans {
  def ofRows(spark: org.apache.spark.sql.classic.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
}
