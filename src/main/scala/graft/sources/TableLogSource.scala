package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, StreamSinkProvider,
  StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.operators.{TableLog, TableLogRelation}

/** The table format as a PLAIN Spark data source — the
  * `spark.read`/`df.write` face a user who never imports graft code
  * expects (the Delta `format("delta")` shape):
  *
  * {{{
  * df.write.format("graft.sources.TableLogSource").save(root)          // create
  * df.write.format(...).mode("append").save(root)                      // append
  * df.write.format(...).mode("overwrite").save(root)                   // replace content
  * df.write.format(...).option("clusterBy", "ts")
  *   .option("parts", "64").option("statsCols", "user_id").save(root)  // + zone maps
  *
  * spark.read.format("graft.sources.TableLogSource").load(root)        // latest snapshot
  * spark.read.format(...).option("versionAsOf", "3").load(root)        // time travel
  * spark.read.format(...).option("timestampAsOf",
  *   "2026-08-15T00:00:00Z").load(root)                                // by commit time
  * }}}
  *
  * Reads return the SAME planner-pruned relation as
  * [[TableLogRelation.snapshotDf]] (a [[TableLogFileIndex]]-backed
  * HadoopFsRelation): typed zone-map skipping, zero-stat planning,
  * and the metadata aggregate/top-k rules all apply unchanged —
  * the format face adds convenience, never a second read path.
  * Reads REFUSE a table with delete sidecars in force (a DSv1
  * BaseRelation cannot carry the anti-join; snapshotDf(idCol) is the
  * face for that) — refusing beats silently resurrecting deleted rows.
  *
  * Writes stage then commit atomically, exactly as the library face:
  * `append` adds files; `overwrite` removes the read snapshot's
  * active set in the same commit (conflict-guarded on it) and resets
  * delete sidecars — the table BECOMES the frame; `errorifexists`
  * (default) refuses a non-empty log; `ignore` no-ops one.
  * `clusterBy` stages range-clustered with a typed zone-map sidecar
  * (`parts`, `statsCols` as in [[TableLog.stageWithZoneMap]]); plain
  * writes stage as-is. Reference: the consumer's put/overwrite of
  * derived tables (consumer.py) re-expressed as idiomatic
  * DataFrameWriter calls. */
class TableLogSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSinkProvider with StreamSourceProvider {

  override def shortName(): String = "tablelog"

  /** `writeStream.format(...)` — each micro-batch is ONE atomic
    * tag-idempotent commit (exactly-once from at-least-once replay;
    * see [[graft.streaming.TableIngest]]). Options: `idCol` commits a
    * change feed per batch (downstream maintainers consume O(delta));
    * absent = plain append. `streamId` scopes the idempotence tags —
    * give every (query, checkpoint generation) its own. Append mode
    * only; partitioning rides the table's own layout, not
    * partitionBy. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"TableLogSource sink is append-only (got $outputMode) — " +
        "aggregate upserts belong to foreachBatch + mergeInto")
    require(partitionColumns.isEmpty,
      "TableLogSource ignores partitionBy — stage layout is the " +
        "table's own (clusterBy/buckets on the batch write face)")
    new graft.streaming.TableLogStreamSink(rootOf(parameters),
      parameters.get("idCol"), parameters.getOrElse("streamId", "ingest"))
  }

  /** `readStream.format(...)` — the table's COMMIT-TIME CHANGE FEED
    * as a stream (NOT a row re-scan: each micro-batch is one
    * commit's O(delta) sidecar — the Delta-table-as-source shape).
    * Delegates to [[graft.streaming.TableChangesSourceProvider]];
    * same options (`idCol`, `startingVersion`,
    * `maxVersionsPerTrigger`, ...), same fixed (version, id, status)
    * schema. */
  private val changesProvider =
    new graft.streaming.TableChangesSourceProvider

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    changesProvider.sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    changesProvider.createSource(sqlContext, metadataPath, schema,
      providerName, parameters)

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "TableLogSource: pass the table root via .load(root)/.save(root) " +
        "or .option(\"path\", root)"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val asOf: Option[Long] =
      (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
        case (Some(_), Some(_)) => sys.error(
          "TableLogSource: versionAsOf and timestampAsOf are exclusive")
        case (Some(v), None) => Some(v.toLong)
        case (None, Some(ts)) => Some(TableLog.versionAtTime(spark, root,
          java.time.Instant.parse(ts).toEpochMilli))
        case _ => None
      }
    val (index, rel) = TableLogRelation.relationAt(spark, root, asOf)
    // a BaseRelation cannot compose the delete-sidecar anti-join —
    // refuse rather than resurrect deleted rows
    require(TableLog.activeDeletes(spark, root, Some(index.version)).isEmpty,
      s"TableLogSource: $root has delete sidecars in force at version " +
        s"${index.version} — read it via TableLogRelation.snapshotDf" +
        "(spark, root, idCol = Some(...)), which applies them")
    rel
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    // existence = any retained entry OR a checkpoint (a fully-expired
    // log keeps only its checkpoint; that is still an existing table)
    val existing = TableLog.versions(spark, root) match {
      case Seq() =>
        val f = new org.apache.hadoop.fs.Path(s"$root/_log")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dir = new org.apache.hadoop.fs.Path(s"$root/_log")
        if (f.exists(dir) && f.listStatus(dir).exists(
          _.getPath.getName.endsWith(".ckpt"))) Seq(-1L) else Seq()
      case vs => vs
    }
    def stage(): (Seq[String], Seq[String]) = parameters.get("clusterBy") match {
      case Some(key) => TableLog.stageWithZoneMap(data, root, "write", key,
        parts = parameters.get("parts").map(_.toInt).getOrElse(16),
        statsCols = parameters.get("statsCols")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil))
      case None => (TableLog.stageWrite(data, root, "write"), Nil)
    }
    mode match {
      case SaveMode.ErrorIfExists if existing.nonEmpty => sys.error(
        s"TableLogSource: $root already has ${existing.length} commits " +
          "(default mode is errorifexists; use append/overwrite/ignore)")
      case SaveMode.Ignore if existing.nonEmpty => () // leave as-is
      case SaveMode.Append | SaveMode.ErrorIfExists | SaveMode.Ignore =>
        val (files, zm) = stage()
        TableLog.commit(spark, root, files, Nil, zmap = zm)
      case SaveMode.Overwrite =>
        // the table BECOMES the frame: remove the read snapshot's
        // active set in the same atomic commit, conflict-guarded on
        // it (a concurrent writer's files must not be silently
        // swept), and reset delete sidecars — they described removed
        // files
        val before = TableLog.activeFiles(spark, root)
        val (files, zm) = stage()
        TableLog.commit(spark, root, files, remove = before, zmap = zm,
          resetDeletes = true, expectActive = before)
    }
    createRelation(sqlContext, parameters)
  }
}
