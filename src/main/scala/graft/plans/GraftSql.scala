package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** The SQL-TEXT face of the table format — the verbs q158's
  * `format(...)` face cannot carry, spoken as plain `spark.sql(...)`
  * statements (Delta's DeltaSqlParser + SQL-command surface is the
  * public precedent; the reference's analysts drive exactly these
  * verbs through SQL against its managed store).
  *
  * Injected by [[GraftExtensions]] (`SparkSession.builder()
  * .withExtensions(new GraftExtensions)`): a delegating
  * [[ParserInterface]] that recognizes the graft statements below and
  * hands EVERYTHING else to Spark's parser untouched, plus two
  * table-valued functions for reads with time travel. Tables are
  * addressed by their ROOT PATH, Delta's `delta.`/path`` shape:
  *
  * {{{
  * SELECT ... FROM graft_table('<root>')                 -- latest snapshot
  * SELECT ... FROM graft_table('<root>', <version>)      -- VERSION AS OF
  * SELECT ... FROM graft_table('<root>', <v>, '<idCol>') -- deletes applied
  * SELECT ... FROM graft_table_at('<root>', '<ISO ts>')  -- TIMESTAMP AS OF
 * SELECT ... FROM graft_table_changes('<root>', <from>, <to>[, '<idCol>'
 *   [, '<contentCol>']])                 -- CDC rows in versions (from, to]
 * SELECT ... FROM graft_table_profile('<root>'[, <version>])
 *                                        -- the zero-scan DESCRIBE
 * SELECT ... FROM graft_table_history('<root>')
 *                                        -- the ledger, composable
  * DESCRIBE HISTORY graft.`<root>`
  * OPTIMIZE graft.`<root>` KEY <idCol> CLUSTER BY (<keyCol>[, <zCol>])
  *   [PARTS <n>]                                         -- zCol => Z-ORDER
  * DELETE FROM graft.`<root>` WHERE <keyCol> BETWEEN <lit> AND <lit>
  *   [PARTS <n>]          -- lit: 42 | 'str' | DATE '..' | TIMESTAMP '..'
  * MERGE INTO graft.`<root>` USING <table|(subquery)> ON <idCol>
  *   BUCKETS <n> WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * RESTORE graft.`<root>` TO VERSION AS OF <n>
  * VACUUM graft.`<root>` RETAIN VERSION AS OF <n> [DRY RUN]
  *                       -- reclaim below the horizon; returns paths
  * }}}
  *
  * Every verb routes to the existing [[graft.operators.TableLog]]
  * API — one implementation, two faces — so the SQL face inherits the
  * same zone-map pruning, bucket-pruned merges, conflict guards and
  * atomic commits the Scala face has. In `graft_table(...)` a
  * negative version means "latest" (so the 3-arg idCol form can still
  * ask for the head). Mutations execute EAGERLY when `spark.sql` is
  * called (command semantics, like Delta's) and return their new
  * version as a 1-row result.
  */
object GraftSql {

  /** One generic eagerly-executed command: the verbs all reduce to
    * "call a TableLog API, return the new version". `label` keeps
    * plans readable in explain output. */
  case class GraftVersionCommand(label: String,
      body: SparkSession => Long) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(body(spark)))
    override def simpleString(maxFields: Int): String =
      s"GraftVersionCommand $label"
  }

  /** Path-list sibling of [[GraftVersionCommand]] — VACUUM's shape:
    * one row per root-relative path the call reclaimed (or, DRY RUN,
    * would reclaim). */
  case class GraftPathsCommand(label: String,
      body: SparkSession => Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("path",
        org.apache.spark.sql.types.StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      body(spark).map(Row(_))
    override def simpleString(maxFields: Int): String =
      s"GraftPathsCommand $label"
  }

  // ---- statement grammar (regex — five fixed statement shapes, not
  // ---- a general SQL dialect; anything unmatched falls through to
  // ---- Spark's parser, and a malformed graft statement errors with
  // ---- the expected shape rather than a confusing Spark parse error)
  private val Hist =
    """(?is)\s*DESCRIBE\s+HISTORY\s+graft\.`([^`]+)`\s*;?\s*""".r
  private val Opt =
    ("""(?is)\s*OPTIMIZE\s+graft\.`([^`]+)`\s+KEY\s+(\w+)\s+CLUSTER\s+BY""" +
      """\s*\(\s*(\w+)\s*(?:,\s*(\w+)\s*)?\)(?:\s+PARTS\s+(\d+))?\s*;?\s*""").r
  private val Lit = """('[^']*'|(?:DATE|TIMESTAMP)\s+'[^']*'|-?\d+)"""
  private val Del =
    ("""(?is)\s*DELETE\s+FROM\s+graft\.`([^`]+)`\s+WHERE\s+(\w+)\s+""" +
      s"""BETWEEN\\s+$Lit\\s+AND\\s+$Lit(?:\\s+PARTS\\s+(\\d+))?\\s*;?\\s*""").r
  private val Merge =
    ("""(?is)\s*MERGE\s+INTO\s+graft\.`([^`]+)`\s+USING\s+""" +
      """([\w.]+|\(.*\))\s+ON\s+(\w+)\s+BUCKETS\s+(\d+)\s+""" +
      """WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+graft\.`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF""" +
      """\s+(\d+)\s*;?\s*""").r
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+graft\.`([^`]+)`\s+RETAIN\s+VERSION\s+AS\s+OF""" +
      """\s+(\d+)(\s+DRY\s+RUN)?\s*;?\s*""").r
  // a graft-addressed statement that matches none of the shapes above
  private val GraftHead =
    """(?is)\s*(DESCRIBE\s+HISTORY|OPTIMIZE|DELETE\s+FROM|MERGE\s+INTO|RESTORE|VACUUM)\s+graft\.`.*""".r

  /** SQL literal → the typed bound [[graft.operators.TableLog
    * .deleteWhereTyped]] expects (Long / String / LocalDate /
    * Instant). TIMESTAMP accepts both the conventional SQL spelling
    * (`TIMESTAMP '2024-01-08 00:00:00'`, read as UTC — the session
    * timezone every graft session declares) and strict ISO-8601 with
    * zone (`'2024-01-08T00:00:00Z'`). */
  private def sqlLit(s: String): Any = {
    val t = s.trim
    def quoted(prefixLen: Int): String = {
      val q = t.substring(prefixLen).trim
      q.stripPrefix("'").stripSuffix("'")
    }
    if (t.regionMatches(true, 0, "DATE", 0, 4))
      java.time.LocalDate.parse(quoted(4))
    else if (t.regionMatches(true, 0, "TIMESTAMP", 0, 9)) {
      val q = quoted(9)
      if (q.contains("T")) java.time.Instant.parse(q)
      else java.time.LocalDateTime.parse(q.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
    }
    else if (t.startsWith("'")) t.stripPrefix("'").stripSuffix("'")
    else t.toLong
  }

  /** The graft statement in `sqlText`, or None to fall through to
    * Spark's parser. Read-only DESCRIBE HISTORY returns the history
    * frame's own plan (lazily executed like any query); mutations
    * return an eager [[GraftVersionCommand]]. */
  def parseGraftStatement(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Hist(root) => Some(
        graft.operators.TableLog.history(SparkSession.active, root)
          .queryExecution.logical)
      case Opt(root, idCol, keyCol, zCol, parts) => Some(
        GraftVersionCommand(s"OPTIMIZE $root", s =>
          graft.operators.TableLog.optimizeTable(s, root, idCol, keyCol,
            name = "sqloptimize",
            parts = Option(parts).map(_.toInt).getOrElse(8),
            zorderWith = Option(zCol))))
      case Del(root, keyCol, loS, hiS, parts) => Some(
        GraftVersionCommand(s"DELETE WHERE $root", s =>
          (sqlLit(loS), sqlLit(hiS)) match {
            case (lo: Long, hi: Long) =>
              graft.operators.TableLog.deleteWhere(s, root, keyCol, lo, hi,
                name = "sqldelete",
                parts = Option(parts).map(_.toInt).getOrElse(4))
            case (lo, hi) =>
              graft.operators.TableLog.deleteWhereTyped(s, root, keyCol,
                lo, hi, name = "sqldelete",
                parts = Option(parts).map(_.toInt).getOrElse(4))
          }))
      case Merge(root, src, idCol, buckets) => Some(
        GraftVersionCommand(s"MERGE INTO $root", s => {
          val source = // a (subquery) re-enters the full parser; a bare
            if (src.startsWith("(")) // name resolves as table/view
              s.sql(src.stripPrefix("(").stripSuffix(")"))
            else s.table(src)
          graft.operators.TableLog.mergeInto(s, root, idCol,
            upserts = source,
            deleteIds = source.select(source.col(idCol)).limit(0),
            nBuckets = buckets.toInt, name = "sqlmerge")
        }))
      case Restore(root, v) => Some(
        GraftVersionCommand(s"RESTORE $root", s =>
          graft.operators.TableLog.restoreTable(s, root, v.toLong)))
      // VACUUM returns the doomed file list (one row per reclaimed —
      // or, under DRY RUN, reclaimable — root-relative path), Delta's
      // shape; the RETENTION DECISION is explicit: versions below the
      // named one become unrestorable. Eager at EXECUTION like every
      // mutation (parse/EXPLAIN must not reclaim anything).
      case Vacuum(root, v, dry) => Some(
        GraftPathsCommand(s"VACUUM $root", s =>
          graft.operators.TableLog.vacuum(s, root, v.toLong,
            dryRun = dry != null)))
      case GraftHead(verb) => sys.error(
        s"GraftSql: malformed $verb statement for a graft.`<root>` " +
          "table — see graft.plans.GraftSql for the statement shapes")
      case _ => None
    }

  // ---- table-valued functions: reads with time travel ----

  private def litString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.toString
  }
  private def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be an integer literal")
    e.eval() match {
      case n: Number => n.longValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got " +
          s"${Option(other).fold("NULL")(_.toString)}")
    }
  }

  /** graft_table(root [, version [, idCol]]) — negative version =
    * latest. The returned plan is the SAME TableLogFileIndex relation
    * snapshotDf serves, so zone-map skipping and the metadata rules
    * apply to pure-SQL readers too. */
  def graftTableBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.nonEmpty && es.length <= 3,
      "graft_table(root[, version[, idCol]])")
    val root = litString(es.head, "graft_table: root")
    val asOf = es.lift(1).map(litLong(_, "graft_table: version"))
      .filter(_ >= 0L)
    val idCol = es.lift(2).map(litString(_, "graft_table: idCol"))
    graft.operators.TableLogRelation
      .snapshotDf(SparkSession.active, root, asOf, idCol)
      .queryExecution.logical
  }

  /** graft_table_at(root, isoTimestamp) — TIMESTAMP AS OF, resolved
    * by commit-file mtime exactly like the format face's
    * `timestampAsOf` option. */
  def graftTableAtBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 2, "graft_table_at(root, isoTimestamp)")
    val spark = SparkSession.active
    val root = litString(es.head, "graft_table_at: root")
    val ts = java.time.Instant.parse(
      litString(es(1), "graft_table_at: timestamp"))
    val v = graft.operators.TableLog.versionAtTime(spark, root,
      ts.toEpochMilli)
    graft.operators.TableLogRelation.snapshotDf(spark, root, Some(v))
      .queryExecution.logical
  }

  /** graft_table_changes(root, fromVersion, toVersion [, idCol
    * [, contentCol]]) — the CDC read as SQL: row-level
    * (version, id, status) changes in versions (from, to], served
    * from each version's O(delta) commit-time feed sidecar exactly
    * like [[graft.operators.TableLog.changes]] (requireFeed = false,
    * so pre-feed history falls back to the snapshot diff with
    * `contentCol`, default `text`). A range log expiry punched a hole
    * in errors loudly — same contract as the streaming source. */
  def graftTableChangesBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 3 && es.length <= 5,
      "graft_table_changes(root, fromVersion, toVersion[, idCol[, contentCol]])")
    val root = litString(es.head, "graft_table_changes: root")
    val idCol = es.lift(3).map(litString(_, "graft_table_changes: idCol"))
      .getOrElse("doc_id")
    val contentCol = es.lift(4)
      .map(litString(_, "graft_table_changes: contentCol"))
      .getOrElse("text")
    graft.operators.TableLog.changes(SparkSession.active, root,
        litLong(es(1), "graft_table_changes: fromVersion"),
        litLong(es(2), "graft_table_changes: toVersion"),
        idCol, contentCol)
      .queryExecution.logical
  }

  /** graft_table_profile(root[, version]) — the zero-scan DESCRIBE
    * as SQL ([[graft.operators.TableLog.metadataProfile]]): one row
    * per fully-covered column with exact counts, serialized bounds
    * and bank-served distinct estimates, all from the log's sidecars.
    * Declines LOUDLY with the ACTUAL reason — delete sidecars in
    * force (per-file stats describe pre-delete rows), or no
    * fully-covered column (a table committed without zone maps) —
    * the scan-based [[graft.operators.Profile.profile]] serves both. */
  def graftTableProfileBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.nonEmpty && es.length <= 2,
      "graft_table_profile(root[, version])")
    val spark = SparkSession.active
    val root = litString(es.head, "graft_table_profile: root")
    val asOf = es.lift(1).map(litLong(_, "graft_table_profile: version"))
      .filter(_ >= 0L)
    graft.operators.TableLog.metadataProfile(spark, root, asOf)
      .getOrElse {
        val reason =
          if (graft.operators.TableLog.activeDeletes(spark, root, asOf)
              .nonEmpty)
            "delete sidecars are in force (per-file stats describe " +
              "pre-delete rows; compact first)"
          else
            "no column is fully stats-covered (commit with " +
              "stageWithZoneMap / the clusterBy+statsCols writer options)"
        sys.error(s"graft_table_profile: $root declined — $reason; the " +
          "scan-based profiler (graft.operators.Profile.profile) always " +
          "serves")
      }
      .queryExecution.logical
  }

  /** graft_table_history(root) — the DESCRIBE HISTORY ledger as a
    * COMPOSABLE table function: unlike the statement, it joins,
    * filters and aggregates like any relation (`WHERE operation =
    * 'MERGE'`, "bytes added last week", ...). Same O(log) metadata
    * read as [[graft.operators.TableLog.history]]. */
  def graftTableHistoryBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 1, "graft_table_history(root)")
    graft.operators.TableLog.history(SparkSession.active,
        litString(es.head, "graft_table_history: root"))
      .queryExecution.logical
  }

  val tableFunctions: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_table" -> graftTableBuilder _,
    "graft_table_at" -> graftTableAtBuilder _,
    "graft_table_changes" -> graftTableChangesBuilder _,
    "graft_table_profile" -> graftTableProfileBuilder _,
    "graft_table_history" -> graftTableHistoryBuilder _)
}

/** The delegating parser [[GraftExtensions]] injects: graft
  * statements short-circuit, everything else — including every other
  * ParserInterface entry point — goes to Spark's own parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parseGraftStatement(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
