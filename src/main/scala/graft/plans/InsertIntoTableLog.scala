package graft.plans

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

/** `INSERT INTO` / `INSERT OVERWRITE TABLE` on a catalog-named
  * tablelog table (`CREATE TABLE t USING tablelog LOCATION …` — the
  * DeltaCatalog-precedent name face), made TRANSACTIONAL.
  *
  * Without this rule, Spark's V1 insert path plans the statement as a
  * raw [[InsertIntoHadoopFsRelationCommand]] that writes parquet files
  * straight into the table directory — files the transaction log never
  * records, so the "successful" INSERT is INVISIBLE to every snapshot
  * read (silent data loss) while still polluting the directory. The
  * rule intercepts the analyzed command (Spark's analyzer has already
  * resolved the table, matched arity, reordered any column list, and
  * cast value types — the full INSERT grammar for free) and swaps in a
  * command that routes the rows through the SAME staged-then-committed
  * write the `df.write.format("tablelog")` face uses: `INSERT INTO` is
  * an atomic append commit, `INSERT OVERWRITE` the conflict-guarded
  * full-rewrite commit. Injected by [[GraftExtensions]] as a post-hoc
  * resolution rule (it runs after `DataSourceAnalysis` has produced
  * the V1 write command); non-tablelog inserts pass through untouched.
  */
case class InsertIntoTableLogRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def isTableLog(i: InsertIntoHadoopFsRelationCommand): Boolean =
    i.fileIndex.exists(_.isInstanceOf[graft.operators.TableLogFileIndex]) ||
      i.catalogTable.exists(_.provider.exists(p =>
        InsertIntoTableLogRule.providerNames.contains(p.toLowerCase)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoHadoopFsRelationCommand if isTableLog(i) =>
      require(i.staticPartitions.isEmpty && i.partitionColumns.isEmpty &&
          !i.ifPartitionNotExists,
        "INSERT into a tablelog table cannot name hive-style " +
          "partitions — the layout is the table's own (clusterBy on " +
          "the write face, OPTIMIZE ... CLUSTER BY to re-layout)")
      GraftInsertCommand(i.outputPath.toString, i.query,
        i.outputColumnNames, i.mode, i.catalogTable.map(_.identifier))
    case other => other
  }
}

object InsertIntoTableLogRule {
  /** Provider spellings that address [[graft.sources.TableLogSource]]
    * in the catalog (`USING tablelog` / `USING graft` / either full
    * class name — a spelling missing here silently bypasses the
    * transactional INSERT swap AND every named-target resolution, so
    * the set must cover every way the provider can be written). */
  val providerNames: Set[String] =
    Set("tablelog", "graft", "graft.sources.tablelogsource",
      "graft.sources.graftsource")

  /** THE catalog-name resolution every graft face shares (SQL-text
    * targets, TVF roots, the streaming `table` option): parse the
    * identifier, look up the session catalog's metadata, and accept
    * only a registered tablelog-provider table — returning its
    * identifier (mutations must invalidate its cached relation) and
    * location. None = absent or not a tablelog table; the caller
    * decides whether that falls through (SQL statements) or refuses
    * loudly (streaming). In-memory catalog metadata — no filesystem
    * I/O. */
  def resolveTableLog(spark: org.apache.spark.sql.SparkSession,
      name: String): Option[
      (org.apache.spark.sql.catalyst.TableIdentifier, String)] =
    scala.util.Try {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      meta.provider.map(_.toLowerCase).filter(providerNames.contains)
        .map(_ => (ident, meta.location.toString))
    }.toOption.flatten
}

/** The swapped-in INSERT: evaluates the (already-analyzed,
  * column-matched) source query and hands the frame to
  * [[graft.sources.TableLogSource]] under the equivalent SaveMode —
  * ONE write implementation for the SQL, DataFrameWriter and catalog
  * faces, so atomicity, overwrite conflict guards and zone-map
  * staging options never fork. */
case class GraftInsertCommand(root: String, query: LogicalPlan,
    outputColumnNames: Seq[String], mode: SaveMode,
    ident: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graftbridge.BridgePlans
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        query)
      .toDF(outputColumnNames: _*)
    new graft.sources.TableLogSource().createRelation(
      spark.sqlContext, mode, Map("path" -> root), df)
    // a TableLogFileIndex is a VERSION-PINNED snapshot (refresh() is
    // a contract no-op), so the catalog's relation cache must drop
    // its entry for the next spark.table(...) to see this commit
    ident.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftInsertCommand $mode $root"
}
