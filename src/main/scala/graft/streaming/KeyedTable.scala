package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed last-writer-wins table materialized from a stream — the
  * reference's consumer → DynamoDB write path (consumer.py:58-92:
  * `batch_writer` + unconditional `put_item` per title key) as a
  * Structured Streaming `foreachBatch` sink over
  * [[graft.operators.Relational.upsert]].
  *
  * Storage is a minimal commit protocol on plain parquet:
  *   - every micro-batch writes a FULL merged snapshot to
  *     `root/snap_<batchId>/`;
  *   - a snapshot is committed iff its `_GRAFT_COMMIT` marker exists
  *     (our own file, written after the parquet write returns — NOT
  *     parquet's `_SUCCESS`, which vanishes under
  *     `marksuccessfuljobs=false` committer configs); the table's
  *     current state is the highest-numbered committed snapshot;
  *   - `mode("overwrite")` deletes the target dir (and its marker)
  *     first, so a crash mid-write leaves an uncommitted dir that
  *     readers skip, falling back to the previous snapshot;
  *   - after a crash, foreachBatch replays the last uncommitted batch
  *     against the previous snapshot — the merge is last-writer-wins
  *     by `versionCol`, so the replay is idempotent (same snapshot
  *     content, rewritten in place).
  *
  * `versionCol` must be monotone per key for arrival order to be
  * honored (the reference gets this from Kinesis shard order; here an
  * event timestamp or sequence number). Version ties between the
  * stored row and an incoming row are broken arbitrarily — exactly
  * DynamoDB's behavior for two unconditioned writes of the same key.
  *
  * At scale: full-snapshot rewrites are the plain-parquet stand-in for
  * a table format's merge commit (Delta/Iceberg); the merge itself is
  * one shuffle on the key, and old snapshots are pruned to bound
  * storage at 2× table size.
  */
object KeyedTable {
  private val SnapPrefix = "snap_"
  // our OWN commit marker: parquet's _SUCCESS disappears under
  // mapreduce.fileoutputcommitter.marksuccessfuljobs=false (common
  // with object-store committers), which would make every snapshot
  // look uncommitted and silently reduce the table to the last batch
  private val CommitMarker = "_GRAFT_COMMIT"

  private def fileSystem(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest-numbered committed (marker-bearing) snapshot dir. */
  private def latestSnap(fs: FileSystem, root: String): Option[Path] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return None
    fs.listStatus(rootPath).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(SnapPrefix))
      .filter(s => fs.exists(new Path(s.getPath, CommitMarker)))
      .toSeq
      .sortBy(s => s.getPath.getName.stripPrefix(SnapPrefix).toLong)
      .lastOption.map(_.getPath)
  }

  /** Current committed table state, if any batch has committed yet. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestSnap(fileSystem(spark, root), root)
      .map(p => spark.read.parquet(p.toString))

  /** The foreachBatch sink:
    * {{{
    * stream.writeStream
    *   .foreachBatch(KeyedTable.sink(root, Seq("key"), "ts"))
    *   .option("checkpointLocation", ckpt).start()
    * }}}
    * @param keep snapshots retained after each commit. The default (2)
    *        bounds storage at ~2× table size; widen it when readers
    *        may hold a snapshot open across several commits — a
    *        reader's lazy DataFrame pins a snapshot PATH, and pruning
    *        it mid-scan fails that reader's query. */
  def sink(root: String, keys: Seq[String], versionCol: String,
           keep: Int = 2): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val fs = fileSystem(spark, root)
    val target = new Path(root, f"$SnapPrefix$batchId%012d")
    // If this batch's snapshot is already COMMITTED, the crash happened
    // between our commit and the stream checkpoint: the replay must be
    // a no-op. (Merging again would also read snap_<batchId> while
    // overwriting the same dir — a read-under-write on one path.)
    if (!fs.exists(new Path(target, CommitMarker))) {
      // within-batch last-writer-wins first (the batch_writer collapses
      // repeated keys before hitting the store)
      val updates = graft.operators.Dedup.keepLatest(
        batch, keys, versionCol, versionCol)
      val merged = read(spark, root) match {
        case Some(base) =>
          graft.operators.Relational.upsert(base, updates, keys, versionCol)
        case None => updates
      }
      merged.write.mode("overwrite").parquet(target.toString)
      // the write returning IS the data being fully on disk; the
      // marker makes that durable and committer-config-independent
      fs.create(new Path(target, CommitMarker), true).close()
      pruneOldSnaps(fs, root, keep)
    }
  }

  /** Keep the newest `keep` committed snapshots, drop the rest (plus
    * any stale uncommitted dirs older than the newest commit). */
  private def pruneOldSnaps(fs: FileSystem, root: String, keep: Int): Unit = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return
    val snaps = fs.listStatus(rootPath).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(SnapPrefix))
      .toSeq
      .sortBy(s => s.getPath.getName.stripPrefix(SnapPrefix).toLong)
    snaps.dropRight(keep).foreach(s => fs.delete(s.getPath, true))
  }
}
