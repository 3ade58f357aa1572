package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-version diffing — the incremental-pipeline primitive: given
  * two snapshots of a corpus, classify every id as added / removed /
  * changed / unchanged by content hash, so downstream stages
  * (dedup, embedding, indexing) reprocess only the delta instead of
  * the full 100 TB.
  *
  * Scale shape: each side reduces to (id, md5(content)) — 16-byte
  * digests, never the payload — and the comparison is one
  * co-partitioned full outer join on the id. The hash is md5 so an
  * independent engine replays it byte-for-byte.
  */
object Versioning {

  /** Per-id diff status between two snapshots. Returns only the
    * changed rows (added/removed/changed) — at scale the unchanged
    * majority must never leave the join. */
  def datasetDiff(oldDf: DataFrame, newDf: DataFrame,
                  idCol: String, contentCol: String): DataFrame = {
    def hashed(df: DataFrame, as: String) = df.select(
      col(idCol), md5(coalesce(col(contentCol), lit("")).cast("binary")).as(as))
    hashed(oldDf, "old_hash")
      .join(hashed(newDf, "new_hash"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col(idCol), col("status"))
      .orderBy(col(idCol))
  }

  /** Diff summary: one row per status with counts, including the
    * unchanged majority (counted, not emitted). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
                  idCol: String, contentCol: String): DataFrame = {
    def hashed(df: DataFrame, as: String) = df.select(
      col(idCol), md5(coalesce(col(contentCol), lit("")).cast("binary")).as(as))
    hashed(oldDf, "old_hash")
      .join(hashed(newDf, "new_hash"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }
}
