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

  /** A plain DataFrame over already-internal rows —
    * `internalCreateDataFrame` is `private[sql]`. The V1 streaming
    * Sink re-batching path needs it: the Dataset a Sink receives is
    * planned incrementally, so re-planning ops (persist, count) on it
    * re-trigger the source; lifting its physical rows into a fresh
    * frame once makes every downstream op safe. */
  def fromInternalRows(spark: org.apache.spark.sql.classic.SparkSession,
                       rows: org.apache.spark.rdd.RDD[
                         org.apache.spark.sql.catalyst.InternalRow],
                       schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.internalCreateDataFrame(rows, schema)
}
