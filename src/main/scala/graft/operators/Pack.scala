package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums for sequence packing — the scale-safe
  * replacement for a `Window.partitionBy(shard)` running total, whose
  * unit of parallelism is the SHARD: at 100 TB a handful of sources
  * means billions of narrow rows serialized through one reducer each.
  *
  * The classic two-phase prefix sum instead:
  *   1. bucket each row by a fixed-width RANGE of the leading order
  *      key (`id div bucketWidth` — monotone in the key, so buckets
  *      partition each shard's order into contiguous runs, and ties
  *      on the id can never straddle a bucket boundary);
  *   2. a local window per (shard, bucket) computes the within-bucket
  *      running total — parallelism is now #shards × #buckets;
  *   3. per-bucket totals (a bounded frame: one row per bucket) get an
  *      exclusive prefix sum per shard — this tiny window runs on one
  *      reducer per shard but sees #buckets rows, not #docs;
  *   4. the base offsets broadcast-join back and add.
  *
  * Sums are integers, so phase arithmetic is exact and the result is
  * byte-identical to the single-window plan — the q68 oracle hash
  * proves the rewrite. Mirrors the reference's shard-sequential packer
  * semantics (`process_s3_object.py` batch layout) without its
  * sequential execution.
  */
object Pack {

  /** Adds `cumAs`: the inclusive running total of `valueCol` within
    * each `part`, ordered by (`ordId`, `tieCol`), computed via the
    * two-phase prefix sum above. `ordId` must be an integral column;
    * `bucketWidth` trades bucket count against bucket size (rows per
    * bucket ≈ id density × width).
    *
    * Memory contract: the base-offset frame has one row per
    * (shard, OCCUPIED bucket) ≈ #shards × idRange / bucketWidth.
    * That is "thousands" only while bucketWidth is sized to the id
    * density — a sparse/wide id range (or tiny bucketWidth) pushes it
    * toward one row per input row, where a FORCED broadcast would be
    * an unbounded driver-memory hazard. So the join back carries no
    * broadcast hint: AQE sees the aggregate's true runtime size and
    * broadcasts exactly when it is small, falling back to a shuffle
    * hash join on (shard, bucket) when it is not — same integers
    * either way. */
  def shardedCumSum(df: DataFrame, part: String, ordId: String, tieCol: String,
                    valueCol: String, cumAs: String,
                    bucketWidth: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val quotedOrd = "`" + ordId.replace("`", "``") + "`"
    val bucket = expr(s"$quotedOrd div $bucketWidth")
    val wLocal = Window.partitionBy(col(part), col("__pk_bucket"))
      .orderBy(col(ordId), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__pk_bucket", bucket)
      .withColumn("__pk_lcum", sum(col(valueCol)).over(wLocal))
    // Bounded frame: one row per (shard, bucket). The exclusive prefix
    // over buckets is a one-reducer-per-shard window over #buckets
    // rows — thousands, not billions.
    val wBase = Window.partitionBy(col(part)).orderBy(col("__pk_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy(col(part), col("__pk_bucket"))
      .agg(sum(col(valueCol)).as("__pk_btotal"))
      .withColumn("__pk_base", coalesce(sum(col("__pk_btotal")).over(wBase), lit(0L)))
      .select(col(part), col("__pk_bucket"), col("__pk_base"))
    local.join(bases, Seq(part, "__pk_bucket"))
      .withColumn(cumAs, col("__pk_base") + col("__pk_lcum"))
      .drop("__pk_bucket", "__pk_lcum", "__pk_base")
  }
}
