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

  /** Merkle-style dataset MANIFEST: the whole table reduced to
    * `nBuckets` rows of (bucket, n_rows, checksum) — an order-free
    * certificate two sites exchange to prove snapshot equality (or
    * localize inequality) WITHOUT moving a row. The integrity check a
    * 100 TB replication / publish step runs instead of a row compare;
    * the reference's consumer trusts its ingest blindly
    * (consumer.py's put loop has no verification step) — this is the
    * audit that replaces that trust at warehouse scale.
    *
    * Bucket = md5 of the ID (so a content change stays in its
    * bucket and a diff LOCALIZES to the buckets holding changed ids);
    * checksum = Σ over rows of a 60-bit md5 row digest, accumulated
    * in DECIMAL(38,0) — exact, associative, commutative, hence
    * identical under any partition/fold order — folded mod 2^60. A
    * changed row flips its bucket's checksum unless a 60-bit
    * collision conspires.
    *
    * Scale shape: one scan, map-side partial aggregation into
    * `nBuckets` groups — the only shuffle is nBuckets × #partitions
    * digest rows; the payload never moves. Comparing two snapshots
    * costs two scans plus an nBuckets-row join
    * ([[compareManifests]]); only differing buckets then need a
    * row-level [[datasetDiff]] RESTRICTED to those buckets (the
    * bucket predicate is the same map-only expression, so the
    * drill-down scan prunes by a cheap filter, not a join). Size
    * `nBuckets` so a bucket's row set is re-scannable (~1M buckets
    * at 100 TB). */
  private val ChecksumMod = 1152921504606846976L // 2^60

  /** (bucket, 60-bit row digest) per row — the digest contract shared
    * by [[manifest]] and [[updateManifest]]. null is not empty
    * string: absent values stamp a U+0002 sentinel into the payload
    * (concat_ws would silently DROP nulls and collapse
    * ("a", null, "b") with ("a", "b", null)). */
  private def digested(df: DataFrame, idCol: String,
                       contentCols: Seq[String], nBuckets: Int): DataFrame = {
    val payload = concat_ws("\u0001",
      (idCol +: contentCols).map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val rowHash = conv(substring(md5(payload.cast("binary")), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val bucket = (conv(substring(
        md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % nBuckets)
    df.select(bucket.as("bucket"), rowHash.as("__h"))
  }

  def manifest(df: DataFrame, idCol: String, contentCols: Seq[String],
               nBuckets: Int): DataFrame =
    digested(df, idCol, contentCols, nBuckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h")) % lit(ChecksumMod))
          .cast("long").as("checksum"))

  /** Whole-table digest — [[manifest]] collapsed to ONE
    * (n_rows, checksum) row: the content identity of a snapshot,
    * order- and layout-free (same rows in any file arrangement →
    * same checksum), which is what lets [[TableLog]]'s time-travel
    * reads be certified against a logical replay. */
  def tableChecksum(df: DataFrame, idCol: String,
                    contentCols: Seq[String]): DataFrame =
    digested(df, idCol, contentCols, nBuckets = 1)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h")) % lit(ChecksumMod))
          .cast("long").as("checksum"))

  /** INCREMENTALLY maintain a [[manifest]] — the O(delta) operation
    * that replaces re-scanning 100 TB when a snapshot changes: the
    * bucket checksum is an exact SUM mod 2^60, so a leaving row
    * SUBTRACTS its digest and an entering row adds it. `removed`
    * carries the OLD content of rows leaving the snapshot (deletes,
    * and the before-image of updates); `added` carries rows entering
    * it (the after-image of updates, and inserts). Only the delta is
    * digested — the base data is never re-read — and the result is
    * bucket-for-bucket EQUAL to a fresh [[manifest]] of the new
    * snapshot, which is exactly what q125's oracle (the fresh-rebuild
    * SQL) certifies. Buckets whose count drops to zero leave the
    * manifest, matching the rebuild. The manifest sibling of q97's
    * cell delta / q111's page append / q118's GSI upsert. */
  def updateManifest(man: DataFrame, removed: DataFrame, added: DataFrame,
                     idCol: String, contentCols: Seq[String],
                     nBuckets: Int): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def side(df: DataFrame, sign: Int) =
      digested(df, idCol, contentCols, nBuckets)
        .select(col("bucket"), lit(sign.toLong).as("__dn"),
          (col("__h") * lit(sign)).as("__dh"))
    val delta = side(removed, -1).unionByName(side(added, 1))
      .groupBy(col("bucket"))
      .agg(sum(col("__dn")).as("__dn"), sum(col("__dh")).as("__dh"))
    man.join(delta, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        pmod(coalesce(col("checksum").cast(dec38), lit(0L).cast(dec38))
            + coalesce(col("__dh"), lit(0L).cast(dec38)),
          lit(ChecksumMod))
          .cast("long").as("checksum"))
      .filter(col("n_rows") > 0)
  }

  /** Join two [[manifest]]s and classify each bucket: `equal`,
    * `differs` (count or checksum moved), `only_a` / `only_b` (bucket
    * present on one side — only possible when the sides used
    * different `nBuckets` or a side is empty). nBuckets-row join —
    * driver-scale regardless of data size. */
  def compareManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("n_rows").as("rows_a"), col("checksum").as("check_a"))
      .join(b.select(col("bucket"), col("n_rows").as("rows_b"),
          col("checksum").as("check_b")),
        Seq("bucket"), "full_outer")
      .withColumn("status",
        when(col("rows_a").isNull, "only_b")
          .when(col("rows_b").isNull, "only_a")
          .when(col("rows_a") === col("rows_b") &&
            col("check_a") === col("check_b"), "equal")
          .otherwise("differs"))

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
