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
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightVal: String, rightTieBreak: String): DataFrame = {
    val l = left.withColumn("__t", col(leftTs).cast("timestamp").cast("double"))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__v", lit(null).cast(right.schema(rightVal).dataType))
    val r = right.select(
        col(key),
        col(rightTs).cast("timestamp").cast("double").as("__t"),
        lit(0).as("__side"),
        col(rightTieBreak).cast("long").as("__tie"),
        col(rightVal).as("__v"))
    val lCols = left.columns.toSeq
    // right rows sort before left rows at the same __t (side 0 < 1),
    // so a state record timestamped exactly at the event is visible
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((lCols.map(col) :+ col("__t") :+ col("__side") :+ col("__tie") :+ col("__v")): _*)
      .unionByName(r.select((lCols.map(c => if (c == key) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__t") :+ col("__side") :+ col("__tie") :+ col("__v")): _*))
      .withColumn("asof_value", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) :+ col("asof_value"): _*)
  }
}
