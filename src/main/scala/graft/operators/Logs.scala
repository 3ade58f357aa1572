package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-search primitives — the admin console's operational query
  * (`admin_lambda.py:152-207` get_lambda_logs): elect the most
  * recently active stream per log group (describe_log_streams
  * orderBy=LastEventTime descending limit=1), then fetch that
  * stream's most recent events that match a filter pattern
  * (get_log_events limit=20 startFromHead=False + the CloudWatch
  * filter-pattern idiom), time-bounded.
  *
  * 100 TB shape: stream election is one NARROW aggregate
  * (group, stream, max ts — no payload), and its winners are one row
  * per group, so the join back to the raw log is broadcast-able by
  * construction. The pattern/time filters run map-side on the scan
  * (pushed time bound), and the per-group recency rank windows only
  * over the ELECTED streams' rows — never the full corpus. */
object Logs {

  /** Most recent `limit` pattern-matching events of each group's most
    * recently active stream.
    *
    * @param from      inclusive lower time bound for the event fetch
    *                  (election is unbounded, like describe_log_streams)
    * @param pattern   substring the message must contain
    * @return (group, stream, rn, id, ts_us, message): rn = 1 is the
    *         most recent match; ordered (group, rn) */
  def latestStreamEvents(logs: DataFrame, group: String, stream: String,
                         tsCol: String, idCol: String, msgCol: String,
                         from: Column, pattern: String, limit: Int): DataFrame = {
    val streams = logs.groupBy(col(group), col(stream))
      .agg(max(col(tsCol)).as("__last_ts"))
    val elect = Window.partitionBy(col(group))
      .orderBy(col("__last_ts").desc, col(stream).desc)
    val top = streams
      .withColumn("__srn", row_number().over(elect))
      .filter(col("__srn") === 1)
      .select(col(group), col(stream))
    val recency = Window.partitionBy(col(group))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    logs
      .filter(col(tsCol) >= from && col(msgCol).contains(pattern))
      .join(broadcast(top), Seq(group, stream)) // one row per group — tiny
      .withColumn("rn", row_number().over(recency))
      .filter(col("rn") <= limit)
      .select(col(group), col(stream), col("rn").cast("long").as("rn"),
        col(idCol), unix_micros(col(tsCol)).as("ts_us"), col(msgCol))
  }
}
