package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE `private[sql]` access point a V1 streaming `Source` needs:
  * `getBatch` must return a DataFrame whose logical plan is marked
  * `isStreaming = true` (MicroBatchExecution asserts it), and the
  * only constructor for that is `SparkSession.internalCreateDataFrame
  * (rdd, schema, isStreaming = true)`. Living under
  * `org.apache.spark.sql` to reach it is the established pattern of
  * every out-of-tree V1 source (Delta Lake's `DeltaSource` ships in
  * `org.apache.spark.sql.delta` for exactly this reason). Nothing
  * else in this repository uses non-public Spark API; keep it that
  * way — this object is deliberately the whole surface. */
object StreamingFrame {
  def create(spark: SparkSession, rdd: RDD[InternalRow],
             schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
