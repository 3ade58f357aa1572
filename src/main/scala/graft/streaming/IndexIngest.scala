package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ANN-index maintenance — every micro-batch of
  * (id, embedding[, metaCols]) rows upserts into a
  * [[graft.operators.Similarity.writeIvfPqIndex]] layout via the q97
  * incremental delta applier: only the touched cell directories
  * rewrite, the trained artifacts (centroids, PQ codebook) are fixed
  * at build time, and probes ([[graft.operators.Similarity
  * .probeIvfPqIndex]]) serve continuously between batches. This is
  * the production similarity-search loop: embeddings arrive as
  * documents are encoded, and the index is never offline for a
  * rebuild (the reference's consumer keeps its DynamoDB index current
  * per record — consumer.py's per-event index put — this is that
  * discipline for vector search).
  *
  * Exactly-once from at-least-once, WITHOUT a commit log: every batch
  * id is applied as status `changed` — remove-if-present, then
  * re-encode — so the apply is a pure UPSERT and a replayed batch
  * rewrites its touched cells with byte-identical content (the
  * DedupIngest idempotence discipline; the spec replays the worst
  * point and asserts content stability). A crash INSIDE the
  * directory swap is covered by applyIndexDelta's write-ahead
  * staging: the next apply rolls the published staging forward before
  * touching anything, so no survivor row is lost at any crash point
  * (ScaleOpsSpec fabricates the mid-swap state and proves recovery).
  *
  * At 100 TB: per batch, one broadcast of the batch ids against the
  * cells scan (touched-cell selection is partition-pruned), one
  * re-encode of the batch, one partitioned rewrite of the touched
  * dirs — O(batch + touched cells), never O(index). Re-TRAINING the
  * artifacts on distribution drift is a separate, deliberate rebuild
  * — pair with [[DriftIngest]] to know when. */
object IndexIngest {

  /** The foreachBatch sink. The batch schema must carry `idCol`, the
    * embedding column, and any metaCols the index was built with:
    * {{{
    * embeddings.writeStream
    *   .foreachBatch(IndexIngest.sink(indexPath, "vec_id"))
    *   .option("checkpointLocation", ckpt).start()
    * }}} */
  def sink(indexPath: String, idCol: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      if (!batch.isEmpty) {
        val b = batch.persist() // read by stale selection + re-encode
        try {
          val delta = b.select(col(idCol), lit("changed").as("status"))
          graft.operators.Similarity.applyIndexDelta(b, delta, idCol,
            indexPath)
        } finally b.unpersist()
      }
  }
}
