package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left-side event the latest right-side
  * record (per key) with timestamp <= the event's timestamp.
  *
  * Spark has no native as-of join; the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + rank) materializes every
  * (event × earlier-record) pair before pruning — quadratic per key.
  * This implementation composes built-ins scalably: tag and UNION the
  * two sides, then one window pass per key ordered by
  * (ts, side, tiebreak) carries the last right-side value forward
  * (`last(..., ignoreNulls = true)`). Cost: one shuffle on the key,
  * linear scan per partition — the sort-merge shape a dedicated
  * physical operator would use anyway.
  *
  * Only (key, id, ts, side, tie, value) go through the union/window —
  * never the full left row. Wide or string-heavy left columns would
  * otherwise be null-padded through the shuffle and sorted per key;
  * they are joined back by the unique `leftId` afterwards.
  *
  * Ordering uses integer microseconds (`unix_micros`), not double
  * epoch seconds — a double cannot represent every microsecond, which
  * would blur the <= visibility boundary.
  *
  * Ties: right records sharing the as-of timestamp resolve to the
  * greatest `rightTieBreak`; a right record at exactly the event's ts
  * IS visible (<=).
  */
object AsOfJoin {

  /** @param left       event side
    * @param right      state side
    * @param key        equi-join column present on both sides
    * @param leftTs     event-time column on left
    * @param rightTs    event-time column on right
    * @param rightVal   right column to carry (attached as `asof_value`)
    * @param rightTieBreak deterministic tiebreak among equal rightTs
    * @param leftId     unique NON-NULL left row id (used to join the
    *                   match back: the join-back is an inner equi-join
    *                   on this id, so a null id would drop its row and
    *                   a duplicated id would multiply its rows —
    *                   surrogate-key the left side first if needed,
    *                   e.g. `monotonically_increasing_id()`)
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightVal: String, rightTieBreak: String, leftId: String): DataFrame = {
    val l = left.select(
      col(key),
      col(leftId).as("__lid"),
      unix_micros(col(leftTs).cast("timestamp")).as("__t"),
      lit(1).as("__side"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(right.schema(rightVal).dataType).as("__v"))
    val r = right.select(
      col(key),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      unix_micros(col(rightTs).cast("timestamp")).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).cast("long").as("__tie"),
      col(rightVal).as("__v"))
    // right rows sort before left rows at the same __t (side 0 < 1),
    // so a state record timestamped exactly at the event is visible
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("asof_value", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lid"), col("asof_value"))
    left.join(matched, col(leftId) === col("__lid")).drop("__lid")
  }

  /** As-of join via the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]): same semantics as [[asof]] but a
    * strictly better plan — one exchange + sort per side and a single
    * streaming merge pass, where the composed version pays the window
    * pass PLUS a join-back shuffle of the left side. No `leftId` is
    * needed at all: the exec carries the full left row natively.
    * Registered through `spark.experimental.extraStrategies` (the
    * live-session analog of `SparkSessionExtensions
    * .injectPlannerStrategy`).
    *
    * Null KEYS group together (a null-key event sees null-key state),
    * mirroring [[asof]]'s window partitioning — note this differs from
    * a SQL equi-join, where null never matches null. Null TIMESTAMPS
    * sort first on either side: a null-ts state row is visible to
    * every event of its key; a null-ts event sees only null-ts state. */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 rightVal: String, rightTieBreak: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{LongType, TimestampType}
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column '$n' not found in ${p.output.map(_.name)}"))
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    // both ts sides cast to TIMESTAMP — the same normalization the
    // composed formulation applies before unix_micros
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      Cast(attr(lPlan, leftTs), TimestampType, tz),
      Cast(attr(rPlan, rightTs), TimestampType, tz),
      attr(rPlan, rightVal),
      Cast(attr(rPlan, rightTieBreak), LongType, tz))
    org.apache.spark.sql.graftbridge.BridgePlans.ofRows(spark, node)
  }
}
