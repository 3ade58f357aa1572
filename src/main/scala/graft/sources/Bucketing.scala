package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the co-located-join primitive.
  *
  * A fact⋈fact join (e.g. orders⋈lineitem, or the consumer's keyed
  * event store joined to its enrichment log — consumer.py:58-92 /
  * enrichment.py:83-131 at warehouse scale) normally shuffles BOTH
  * sides on the key every query. Writing both tables bucketed by that
  * key with the same bucket count pre-partitions them on disk: the
  * join then reads bucket i against bucket i with NO exchange on
  * either side — at 100 TB that removes the two largest shuffles of
  * the workload, and `sortBy` within buckets lets the sort-merge join
  * skip its sort.
  *
  * Trade-offs (documented, not hidden): bucket counts must match (or
  * divide evenly with `spark.sql.bucketing.coalesceBucketsInJoin`);
  * writes pay one clustering shuffle up front; hot keys still skew a
  * bucket — pick bucket counts so the hottest key's bucket fits an
  * executor, and salt upstream if it can't ([[graft.operators.Skew]]).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted parquet table at
    * `path`, registered as `table` in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
