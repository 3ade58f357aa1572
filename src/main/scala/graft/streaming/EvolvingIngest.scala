package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TableLog

/** SCHEMA-DRIFT-TOLERANT streaming ingestion — [[TableIngest]]'s
  * exactly-once commit discipline over [[TableLog.evolveAppend]], for
  * event streams whose payloads GROW columns over time (a producer
  * deploy adds a field mid-stream — the mergeSchema-on-streaming-
  * write shape, and the drift case the reference's schemaless
  * DynamoDB items absorb silently): a micro-batch carrying columns
  * the table has never seen lands its rows AND the widened schema in
  * ONE atomic commit; reads at or past it null-fill the new columns
  * for older files, and a batch that REVERTS to fewer columns (a
  * rolled-back producer) appends without disturbing the declared
  * schema (its missing columns read as null). Type CHANGES refuse
  * loudly per evolveAppend's addition-only contract — a poisoned
  * batch fails the stream rather than corrupting the table (pair
  * with [[CheckedIngest]]'s dead-letter when quarantine is wanted).
  *
  * Exactly-once via the commit's idempotence tag, like TableIngest;
  * each commit carries the batch's change feed, so downstream
  * maintainers stay O(delta). Two concurrent evolutions (two streams
  * widening the same table) serialize through evolveAppend's
  * `expectSchema` pin — the loser re-reads the widened schema and
  * retries, so neither stream's columns are ever silently hidden. */
object EvolvingIngest {

  def sink(root: String, idCol: String,
           streamId: String = "evolving"): (DataFrame, Long) => Unit = {
    var seen: scala.collection.mutable.Set[String] = null
    (batch, batchId) =>
      val sp = batch.sparkSession
      if (!batch.isEmpty) {
        if (seen == null)
          seen = scala.collection.mutable.Set(
            TableLog.committedTags(sp, root).toSeq: _*)
        val tag = s"$streamId-b$batchId"
        if (!seen.contains(tag)) {
          var attempt = 0
          var done = false
          while (!done && attempt < 8) {
            try {
              // feed staged per attempt: a conflict-refused attempt's
              // sidecar is an unreferenced orphan (gcOrphans reclaims)
              TableLog.evolveAppend(batch, root, s"$streamId/b$batchId",
                tag = Some(tag),
                cdf = TableLog.stageFeed(
                  batch.select(col(idCol), lit("added").as("status")),
                  root, s"$streamId/b$batchId"))
              seen += tag
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                attempt += 1 // concurrent evolution: re-read, re-widen
            }
          }
          require(done,
            s"EvolvingIngest: batch $batchId lost $attempt schema races")
        }
      }
  }
}
