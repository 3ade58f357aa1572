package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** SCD2 history build — turn a changelog of state observations into
    * validity intervals: per key, order observations by (ts, seq),
    * SUPPRESS observations that do not change the state (the no-op
    * updates every upstream emits), then close each surviving version
    * with the next version's start. The reference's enrichment lambda
    * overwrites in place (SCD1, [[upsert]] / enrichment.py:83-131);
    * SCD2 is what the warehouse keeps instead so point-in-time queries
    * ([[AsOfJoin]]) have history to land on.
    *
    * Scale shape: ONE hash shuffle on the key; the change-suppression
    * lag, the closing lead, and the version row_number all share that
    * (key, ts, seq) sort order, so Catalyst plans a single exchange +
    * sort and the three window functions run in two passes over it —
    * no per-key collect, no global window. (ts, seq) must be unique
    * per key (seq is the tie-breaker, e.g. the change's sequence
    * number); nulls in the value column are states, compared
    * null-safely.
    *
    * Output: key, value cols, valid_from, valid_to (null = open),
    * version (1-based per key), is_current.
    */
  def scd2(changelog: DataFrame, keyCol: String, tsCol: String,
           seqCol: String, valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val state = struct(valueCols.map(col): _*)
    val kept = changelog
      .withColumn("__prev", lag(state, 1).over(w))
      // first observation (__prev null from lag) always survives; a
      // null STATE is distinguished via the not-null struct wrapper
      .filter(col("__prev").isNull || !(col("__prev") <=> state))
      .drop("__prev")
    kept
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(keyCol) ++ valueCols ++
        Seq("valid_from", "valid_to", "version", "is_current")).map(col): _*)
  }

  /** POINT-IN-TIME join: enrich each fact with the history version in
    * effect at the fact's own timestamp — the consumer of [[scd2]]'s
    * intervals, and the temporal complement of [[AsOfJoin]] (as-of
    * composes union+window when history is raw observations; this one
    * joins PRE-BUILT intervals, the shape a warehouse stores). A fact
    * at t matches the version with valid_from <= t < valid_to
    * (open-ended current version included); [[scd2]]'s same-ts empty
    * intervals [t, t) match nothing, so each fact lands on exactly
    * one version.
    *
    * Scale shape: equi-join on the key (co-partitioned hash/sort-merge
    * — the range condition rides along as a residual filter, never a
    * cross product); per-key work is #facts_k × #versions_k, bounded
    * because SCD2 version counts per key are small by construction
    * (change-suppressed). */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
                      factKey: String, histKey: String,
                      factTs: String): DataFrame =
    facts.join(history,
      facts(factKey) === history(histKey) &&
        facts(factTs) >= history("valid_from") &&
        (history("valid_to").isNull || facts(factTs) < history("valid_to")))

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
