package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form).
  *
  * Reference semantics: the app's Kinesis event flow groups user
  * activity; the admin screen aggregates per-hour activity
  * (`admin_lambda.py:75-140`). This generalizes to classic sessions:
  * a new session starts when the gap to the previous event of the same
  * user exceeds `gapSeconds`.
  *
  * Scale: single shuffle on `user_id` (the window partition key); both
  * window passes and the final aggregation reuse that partitioning, so
  * Catalyst plans exactly one exchange.
  */
object Sessionize {
  def sessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
  }
}
