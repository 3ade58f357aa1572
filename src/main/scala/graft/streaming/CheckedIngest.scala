package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TableLog

/** CONSTRAINT-GATED streaming ingestion — [[TableIngest]]'s
  * exactly-once commit discipline with the table's CHECK constraints
  * ([[TableLog.addCheckConstraint]]) enforced per micro-batch, and
  * violating rows routed to a DEAD-LETTER table instead of crashing
  * the stream (the badRecordsPath pattern: one malformed record in a
  * firehose must quarantine, not take the pipeline down — the
  * reference's consumer.py:30-52 drops malformed Kinesis records for
  * the same reason, but silently; here every rejected row lands
  * queryable with the constraint that refused it).
  *
  * Per batch, ONE O(batch) map-only pass computes every constraint's
  * verdict per row (NULL evaluation = violation — [[TableLog
  * .checkedAppend]]'s three-valued rule); conforming rows commit to
  * the main table with a commit-time change feed, violating rows
  * commit to the dead-letter table widened with `_violated`
  * (comma-joined refusing constraint names) and `_batch_id`. BOTH
  * tables are TableLog tables — the dead letter is time-travelable
  * evidence, and re-ingesting repaired rows is a snapshot query away.
  *
  * Exactly-once on BOTH sides: the two commits carry separate
  * idempotence tags (`<streamId>-b<id>` / `<streamId>-dead-b<id>`),
  * so a crash between them replays only the missing half. The main
  * commit pins the constraint refs the split was computed under
  * ([[TableLog.constraintRefs]] → `expectChecks`): a constraint
  * added or dropped mid-batch by a concurrent writer CONFLICTS, and
  * the batch re-reads and re-splits instead of landing rows
  * validated against a stale rule set. (A crash-replay likewise
  * re-splits under the constraints THEN in force — the correct
  * semantics: the gate is the table's current rules, not the rules
  * of first delivery.)
  *
  * At 100 TB: the validation adds zero extra passes (the verdict
  * columns ride the same scan that stages the batch) and the
  * dead-letter write is O(violations). */
object CheckedIngest {

  /** The foreachBatch sink. `root` must already have its base commit
    * (constraints attach to a committed log); `deadRoot` is created
    * on the first violation. A batch whose rows ALL violate still
    * claims its main-table tag with an empty commit, so replays stay
    * no-ops. */
  def sink(root: String, deadRoot: String, idCol: String,
           streamId: String = "checked"): (DataFrame, Long) => Unit = {
    var seen: scala.collection.mutable.Set[String] = null
    (batch, batchId) =>
      val sp = batch.sparkSession
      if (!batch.isEmpty) {
        if (seen == null)
          seen = scala.collection.mutable.Set(
            (TableLog.committedTags(sp, root) ++
              TableLog.committedTags(sp, deadRoot)).toSeq: _*)
        val tag = s"$streamId-b$batchId"
        val deadTag = s"$streamId-dead-b$batchId"
        var attempt = 0
        var done = seen.contains(tag) && seen.contains(deadTag)
        while (!done && attempt < 8) {
          val refs = TableLog.constraintRefs(sp, root)
          val cs = TableLog.activeConstraints(sp, root).toSeq.sortBy(_._1)
          val verdicts = cs.map { case (n, e) =>
            coalesce(expr(e).cast("boolean"), lit(false)).as(s"_ok_$n")
          }
          val okCols = cs.map(c => s"_ok_${c._1}")
          val flagged = batch.select(col("*") +: verdicts: _*).persist()
          try {
            val okAll = okCols.map(col).foldLeft(lit(true))(_ && _)
            val good = flagged.filter(okAll).drop(okCols: _*)
            val bad = flagged.filter(!okAll)
              .withColumn("_violated", concat_ws(",",
                cs.map(c => when(!col(s"_ok_${c._1}"), lit(c._1))): _*))
              .drop(okCols: _*)
              .withColumn("_batch_id", lit(batchId))
            try {
              if (!seen.contains(tag)) {
                // commit even when good is EMPTY: the tag must land
                // so a crash-replay cannot re-split and re-judge this
                // batch under later rules
                TableLog.commit(sp, root,
                  add = TableLog.stageWrite(good, root,
                    s"$streamId/b$batchId"),
                  remove = Nil,
                  cdf = TableLog.stageFeed(
                    good.select(col(idCol), lit("added").as("status")),
                    root, s"$streamId/b$batchId"),
                  tag = Some(tag),
                  expectChecks = Some(refs))
                seen += tag
              }
              if (!seen.contains(deadTag)) {
                if (!bad.isEmpty)
                  TableLog.commit(sp, deadRoot,
                    add = TableLog.stageWrite(bad, deadRoot,
                      s"$streamId/dead-b$batchId"),
                    remove = Nil, tag = Some(deadTag))
                // zero violations: nothing to commit, nothing a
                // replay could duplicate — the in-memory mark suffices
                seen += deadTag
              }
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                attempt += 1 // constraint set changed mid-split: redo
            }
          } finally flagged.unpersist()
        }
        require(done,
          s"CheckedIngest: batch $batchId lost $attempt constraint races")
      }
  }
}
