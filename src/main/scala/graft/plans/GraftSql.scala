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
  * hands EVERYTHING else to Spark's parser untouched, plus
  * table-valued functions for reads with time travel. Tables are
  * addressed by their ROOT PATH (Delta's `delta.`/path`` shape) or,
  * in every statement below, by CATALOG NAME after `CREATE TABLE
  * <name> USING tablelog LOCATION '<root>'` (`spark.table(<name>)`
  * and `INSERT INTO <name>` ride Spark's own resolution — see
  * [[InsertIntoTableLogRule]] for the transactional INSERT):
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
 * SELECT ... FROM graft_table_window_stats('<root>', '<keyCol>',
 *   <lo>, <hi>, '<col>'[, ...])          -- range-scoped metadata aggs
 * SELECT ... FROM graft_table_window_distinct('<root>', '<sketchCol>',
 *   '<keyCol>', <lo>, <hi>)              -- range-scoped HLL distinct
  * DESCRIBE HISTORY (graft.`<root>`|<name>)
  * OPTIMIZE <target> KEY <idCol> CLUSTER BY (<keyCol>[, <zCol>])
  *   [PARTS <n>]                                         -- zCol => Z-ORDER
  * DELETE FROM <target> WHERE <keyCol> BETWEEN <lit> AND <lit>
  *   [PARTS <n>]          -- lit: 42 | 'str' | DATE '..' | TIMESTAMP '..'
  * UPDATE <target> SET <col> = <expr>[, ...]
  *   WHERE <keyCol> BETWEEN <lit> AND <lit> [PARTS <n>]
  * MERGE INTO <target> USING <table|(subquery)> ON <idCol> BUCKETS <n>
  *   { WHEN MATCHED [AND <cond>] THEN (UPDATE SET (*|c=e,..)|DELETE) }*
  *   [ WHEN NOT MATCHED [AND <cond>] THEN INSERT * ]
  *                        -- cond/exprs over the t (target) and s
  *                        -- (source) aliases; first matching clause wins
  * INSERT INTO <name> (VALUES ...|SELECT ...)   -- atomic append commit
  * INSERT OVERWRITE TABLE <name> ...            -- guarded full rewrite
  * RESTORE <target> TO VERSION AS OF <n>
  * VACUUM <target> RETAIN VERSION AS OF <n> [DRY RUN]
  *                       -- reclaim below the horizon; returns paths
  * }}}
  *
  * Every `'<root>'` argument above also accepts a catalog NAME
  * (`graft_table('events', 3)` is named time travel) — a string
  * without '/' resolving to a registered tablelog table uses its
  * location; everything else is treated as a path.
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

  /** Fixed-schema row command — DESCRIBE HISTORY's shape: the output
    * schema is STATIC ([[graft.operators.TableLog.historySchema]]),
    * so parse and EXPLAIN stay metadata-free and the ledger read
    * happens only at execution (previously the parser read the whole
    * log inline, so a failed statement later in the text — or a bare
    * EXPLAIN — paid one readEntry per version). */
  case class GraftRowsCommand(label: String,
      rowSchema: org.apache.spark.sql.types.StructType,
      body: SparkSession => Seq[Row]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = rowSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    override def run(spark: SparkSession): Seq[Row] = body(spark)
    override def simpleString(maxFields: Int): String =
      s"GraftRowsCommand $label"
  }

  // ---- statement targets: path-addressed or catalog-named ----

  /** A statement target is either the path-addressed ``graft.`<root>` ``
    * form or a bare catalog NAME (`CREATE TABLE t USING tablelog
    * LOCATION '<root>'` — the Delta-catalog shape: the first thing a
    * warehouse user types is the name, not the path). Two capture
    * groups: (path, name). */
  private val T = """(?:graft\.`([^`]+)`|([A-Za-z_][\w.]*))"""

  /** A resolved statement target: the table root, plus the catalog
    * identifier when it was addressed by NAME — mutations must drop
    * the name's relation-cache entry (a [[graft.operators
    * .TableLogFileIndex]] is version-pinned; refresh() is a no-op),
    * or the next `spark.table(name)` read would serve the pre-commit
    * snapshot. */
  private case class Target(root: String,
      ident: Option[org.apache.spark.sql.catalyst.TableIdentifier]) {
    /** Wrap a mutation body: run, then invalidate the cached relation
      * so subsequent name reads re-resolve at the new head. A
      * NAME-addressed mutation drops exactly its own entry; a
      * PATH-addressed one scans the session catalog's in-memory
      * metadata for tablelog tables whose LOCATION is this root and
      * refreshes exactly those (an unrelated table's cached relation
      * — or cached DATA pinned via df.cache — must survive a mutation
      * it cannot observe; the previous invalidateAllCachedTables
      * evicted everything in the session per mutation). The scan is
      * catalog metadata only, no filesystem I/O, and mutations are
      * rare next to reads. */
    def refreshing[A](body: SparkSession => A): SparkSession => A = s => {
      val out = body(s)
      ident match {
        case Some(i) => s.sessionState.catalog.refreshTable(i)
        case None =>
          val cat = s.sessionState.catalog
          cat.listDatabases().foreach { db =>
            cat.listTables(db).foreach { id =>
              if (InsertIntoTableLogRule
                    .resolveTableLog(s, id.unquotedString)
                    .exists { case (_, loc) => sameRoot(loc, root) })
                cat.refreshTable(id)
            }
          }
      }
      out
    }
  }

  /** Whether two root strings address the same table location — the
    * catalog stores a URI (`file:/tmp/t`) while callers pass bare
    * paths (`/tmp/t`); normalize scheme (absent = file), authority
    * and a trailing slash before comparing. */
  private def sameRoot(a: String, b: String): Boolean = {
    def norm(s: String) = {
      val u = new org.apache.hadoop.fs.Path(s).toUri
      (Option(u.getScheme).getOrElse("file"),
        Option(u.getAuthority).getOrElse(""),
        Option(u.getPath).getOrElse("").stripSuffix("/"))
    }
    norm(a) == norm(b)
  }

  /** Resolve a (path, name) target capture, or None when the named
    * table is absent / not a tablelog table — the statement then
    * falls through to Spark's parser so non-graft tables keep
    * Spark's own (error) semantics. The lookup is in-memory
    * session-catalog METADATA (no filesystem I/O); it runs at parse
    * only for statements that already match a full graft statement
    * shape. */
  private def resolveTarget(path: String, name: String): Option[Target] =
    if (path != null) Some(Target(path, None))
    else InsertIntoTableLogRule.resolveTableLog(SparkSession.active, name)
      .map { case (ident, loc) => Target(loc, Some(ident)) }

  // ---- statement grammar (regex — fixed statement shapes, not a
  // ---- general SQL dialect; anything unmatched falls through to
  // ---- Spark's parser, and a malformed graft statement errors with
  // ---- the expected shape rather than a confusing Spark parse error)
  private val Hist =
    (s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$T\\s*;?\\s*""").r
  private val Opt =
    (s"""(?is)\\s*OPTIMIZE\\s+$T\\s+KEY\\s+(\\w+)\\s+CLUSTER\\s+BY""" +
      """\s*\(\s*(\w+)\s*(?:,\s*(\w+)\s*)?\)(?:\s+PARTS\s+(\d+))?\s*;?\s*""").r
  private val Lit = """('[^']*'|(?:DATE|TIMESTAMP)\s+'[^']*'|-?\d+)"""
  private val Del =
    (s"""(?is)\\s*DELETE\\s+FROM\\s+$T\\s+WHERE\\s+(\\w+)\\s+""" +
      s"""BETWEEN\\s+$Lit\\s+AND\\s+$Lit(?:\\s+PARTS\\s+(\\d+))?\\s*;?\\s*""").r
  private val Upd =
    (s"""(?is)\\s*UPDATE\\s+$T\\s+SET\\s+(.+?)\\s+WHERE\\s+(\\w+)\\s+""" +
      s"""BETWEEN\\s+$Lit\\s+AND\\s+$Lit(?:\\s+PARTS\\s+(\\d+))?\\s*;?\\s*""").r
  private val Merge =
    (s"""(?is)\\s*MERGE\\s+INTO\\s+$T\\s+USING\\s+""" +
      """([\w.]+|\(.*\))\s+ON\s+(\w+)\s+BUCKETS\s+(\d+)\s+(WHEN\s.*?);?\s*""").r
  // clause boundaries anchor on `WHEN [NOT] MATCHED` specifically —
  // a bare `WHEN` lookahead would split inside `CASE WHEN ...`
  // expressions in a SET assignment
  private val MergeClauseRe =
    ("""(?is)\s*WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+""" +
      """(UPDATE\s+SET\s+(.+?)|DELETE|INSERT\s+\*)\s*""" +
      """(?=WHEN\s+(?:NOT\s+)?MATCHED\s|$)""").r
  private val Restore =
    (s"""(?is)\\s*RESTORE\\s+$T\\s+TO\\s+VERSION\\s+AS\\s+OF""" +
      """\s+(\d+)\s*;?\s*""").r
  private val Vacuum =
    (s"""(?is)\\s*VACUUM\\s+$T\\s+RETAIN\\s+VERSION\\s+AS\\s+OF""" +
      """\s+(\d+)(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val AlterAdd =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+COLUMNS?\\s*""" +
      """\(\s*(.+?)\s*\)\s*;?\s*""").r
  private val Trunc =
    (s"""(?is)\\s*TRUNCATE\\s+TABLE\\s+$T\\s*;?\\s*""").r
  private val Detail =
    (s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+$T\\s*;?\\s*""").r
  private val AddCon =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+CONSTRAINT\\s+(\\w+)""" +
      """\s+CHECK\s*\(\s*(.+?)\s*\)(?:\s+ID\s+(\w+))?\s*;?\s*""").r
  private val DropCon =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+CONSTRAINT\\s+(\\w+)""" +
      """\s*;?\s*""").r
  // CREATE TABLE ... USING <graft provider> with a PARTITIONED BY /
  // CLUSTERED BY clause: Spark's v1 path stores the spec in the
  // catalog and then IGNORES it — files land unpartitioned while the
  // catalog claims otherwise, the silent-wrong-layout class. Refuse
  // at parse with the format's actual layout mechanism.
  private val PartitionedCreate =
    ("""(?is)\s*CREATE\s+TABLE\s+.*\bUSING\s+`?(?:tablelog|""" +
      """graft\.sources\.tablelogsource|graft\.sources\.graftsource|""" +
      """graft)`?(?![\w.]).*\b(?:PARTITIONED|CLUSTERED)\s+BY\b.*""").r
  /** Single-quoted SQL literals blanked, so clause-keyword checks
    * (PartitionedCreate) cannot false-match inside a COMMENT or
    * LOCATION string. */
  private def blankLiterals(sql: String): String =
    sql.replaceAll("'[^']*'", "''")
  // a graft-addressed statement that matches none of the shapes above
  private val GraftHead =
    """(?is)\s*(DESCRIBE\s+HISTORY|DESCRIBE\s+DETAIL|OPTIMIZE|DELETE\s+FROM|MERGE\s+INTO|UPDATE|RESTORE|VACUUM|ALTER\s+TABLE|TRUNCATE\s+TABLE)\s+graft\.`.*""".r
  // a DML verb on a NAMED table: only claimed (with a shape error)
  // when the name really is a tablelog table — everything else stays
  // Spark's to parse and reject with its own semantics
  private val NamedDmlHead =
    (s"""(?is)\\s*(UPDATE|DELETE\\s+FROM|MERGE\\s+INTO)\\s+$T(\\s.*)?""").r

  // ---- MERGE clause parsing ----

  private sealed trait PClause
  private final case class PUpd(cond: Option[String],
      set: Option[Seq[(String, String)]]) extends PClause // None = SET *
  private final case class PDel(cond: Option[String]) extends PClause
  private final case class PIns(cond: Option[String]) extends PClause

  /** Split at top-level commas (outside parens and single-quoted
    * strings) — assignment lists carry exprs with calls/literals. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach { ch =>
      if (inStr) { cur += ch; if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val Assign = """(?s)\s*(\w+)\s*=\s*(.+?)\s*""".r
  private def parseAssigns(s: String, stmt: String): Seq[(String, String)] =
    splitTop(s).map {
      case Assign(c, e) => c -> e.trim
      case bad => sys.error(
        s"GraftSql: malformed SET assignment '$bad' in $stmt — " +
          "expected col = <expr>[, ...]")
    }

  /** The WHEN-clause tail of a MERGE, parsed to [[PClause]]s. The
    * matches must TILE the text (any gap = malformed clause, loud). */
  private def parseMergeClauses(text: String): Seq[PClause] = {
    val ms = MergeClauseRe.findAllMatchIn(text).toSeq
    val covered = ms.nonEmpty && ms.head.start == 0 &&
      ms.last.end == text.length &&
      ms.sliding(2).forall {
        case Seq(a, b) => b.start == a.end
        case _ => true
      }
    if (!covered) sys.error(
      "GraftSql: malformed MERGE clauses — supported: WHEN MATCHED " +
        "[AND <cond>] THEN UPDATE SET (*|col = expr, ...) | DELETE; " +
        "WHEN NOT MATCHED [AND <cond>] THEN INSERT *")
    val clauses = ms.map { m =>
      val not = m.group(1) != null
      val cond = Option(m.group(2)).map(_.trim)
      val action = m.group(3).trim
      val upper = action.toUpperCase(java.util.Locale.ROOT)
      if (not) {
        if (!upper.startsWith("INSERT")) sys.error(
          "GraftSql: WHEN NOT MATCHED supports only INSERT *")
        PIns(cond)
      } else if (upper.startsWith("UPDATE")) {
        val setText = m.group(4).trim
        if (setText == "*") PUpd(cond, None)
        else PUpd(cond, Some(parseAssigns(setText, "MERGE")))
      } else if (upper.startsWith("DELETE")) PDel(cond)
      else sys.error(
        "GraftSql: WHEN MATCHED supports UPDATE SET ... or DELETE")
    }
    require(clauses.count(_.isInstanceOf[PIns]) <= 1,
      "GraftSql: at most one WHEN NOT MATCHED clause")
    clauses
  }

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
    * Spark's parser. All statements — including DESCRIBE HISTORY —
    * parse to COMMANDS whose bodies run at execution, so parse and
    * EXPLAIN never touch the log. A named target that is not a
    * tablelog catalog table makes the whole statement fall through
    * (None), keeping Spark's own semantics for foreign tables. */
  def parseGraftStatement(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Hist(path, name) => resolveTarget(path, name).map { t =>
        val root = t.root
        GraftRowsCommand(s"DESCRIBE HISTORY $root",
          graft.operators.TableLog.historySchema,
          s => graft.operators.TableLog.history(s, root).collect().toSeq)
      }
      case Opt(path, name, idCol, keyCol, zCol, parts) =>
        resolveTarget(path, name).map { t => val root = t.root
        GraftVersionCommand(s"OPTIMIZE $root", t.refreshing(s =>
          graft.operators.TableLog.optimizeTable(s, root, idCol, keyCol,
            name = "sqloptimize",
            parts = Option(parts).map(_.toInt).getOrElse(8),
            zorderWith = Option(zCol)))) }
      case Del(path, name, keyCol, loS, hiS, parts) =>
        resolveTarget(path, name).map { t => val root = t.root
        GraftVersionCommand(s"DELETE WHERE $root", t.refreshing(s =>
          (sqlLit(loS), sqlLit(hiS)) match {
            case (lo: Long, hi: Long) =>
              graft.operators.TableLog.deleteWhere(s, root, keyCol, lo, hi,
                name = "sqldelete",
                parts = Option(parts).map(_.toInt).getOrElse(4))
            case (lo, hi) =>
              graft.operators.TableLog.deleteWhereTyped(s, root, keyCol,
                lo, hi, name = "sqldelete",
                parts = Option(parts).map(_.toInt).getOrElse(4))
          })) }
      // UPDATE over a key range: REPLACE WHERE with the SET applied —
      // survivors outside the range keep their physical files, the
      // touched range rewrites once, atomically, zone-pruned
      // (O(range), not O(table)). SET of the range key itself must
      // stay inside [lo, hi] (replaceWhere refuses a widening rewrite
      // loudly — silent predicate escape is the classic UPDATE bug).
      case Upd(path, name, setText, keyCol, loS, hiS, parts) =>
        resolveTarget(path, name).map { t => val root = t.root
          val assigns = parseAssigns(setText, "UPDATE")
          GraftVersionCommand(s"UPDATE $root", t.refreshing(s => {
            import org.apache.spark.sql.functions.{col, expr}
            val tl = graft.operators.TableLog
            // pin the read version and derive the slice AT it, then
            // hand the SAME pin to replaceWhere — its conflict guard
            // then covers every commit after this read (an un-pinned
            // pair would let a commit racing in between vanish)
            val readV = tl.versions(s, root).lastOption.getOrElse(
              sys.error(s"GraftSql: UPDATE on empty log at $root"))
            val snap = graft.operators.TableLogRelation
              .snapshotDf(s, root, Some(readV))
            // SET columns resolve like Spark does (case-insensitive);
            // one column assigned twice is ambiguous, refuse it
            val byLower = snap.columns.map(c => c.toLowerCase -> c).toMap
            val resolved = assigns.map { case (c, e) =>
              byLower.getOrElse(c.toLowerCase, sys.error(
                s"GraftSql: UPDATE SET column '$c' is not a table column " +
                  s"(table has ${snap.columns.mkString(",")})")) -> e }
            require(resolved.map(_._1).distinct.size == resolved.size,
              s"GraftSql: UPDATE assigns a column more than once " +
                s"(${resolved.map(_._1).mkString(", ")})")
            val assignFor = resolved.toMap
            // the slice predicate reuses the ORIGINAL SQL literals —
            // DATE '...' / TIMESTAMP '...' are valid Spark SQL too
            val slice = snap.filter(expr(s"$keyCol BETWEEN $loS AND $hiS"))
            // ONE select: every RHS evaluates against the PRE-UPDATE
            // row (SQL semantics — `SET a = b, b = a` swaps; a
            // sequential withColumn chain would feed later
            // assignments the already-updated values).
            // Assignments follow the SAME store-assignment policy as
            // the INSERT path into this table: an RHS type that is
            // not ANSI-store-assignable to the column refuses at plan
            // time, and the cast itself is pinned to ANSI eval mode
            // (errors on 'abc' -> long, overflow on narrowing) — a
            // session-conf-dependent legacy cast would silently
            // rewrite the whole matched range to NULL instead.
            val updated = slice.select(snap.columns.toSeq.map { c =>
              assignFor.get(c)
                .map { e =>
                  val target = snap.schema(c).dataType
                  val rhsT = slice.select(expr(e)).schema.head.dataType
                  if (rhsT == target) expr(e).as(c)
                  else {
                    import org.apache.spark.sql.catalyst.expressions.{Cast => CCast, EvalMode}
                    require(CCast.canANSIStoreAssign(rhsT, target),
                      s"GraftSql: UPDATE SET $c = $e assigns " +
                        s"${rhsT.sql} to a ${target.sql} column — not " +
                        "an ANSI store assignment (same policy as " +
                        "INSERT INTO this table); cast explicitly if " +
                        "the conversion is intended")
                    org.apache.spark.sql.graftbridge.Bridge.toColumn(
                      CCast(org.apache.spark.sql.graftbridge.Bridge
                        .toExpression(expr(e)), target,
                        None, EvalMode.ANSI)).as(c)
                  }
                }
                .getOrElse(col(c))
            }: _*)
            val nParts = Option(parts).map(_.toInt).getOrElse(4)
            (sqlLit(loS), sqlLit(hiS)) match {
              case (lo: Long, hi: Long) =>
                tl.replaceWhere(s, root, keyCol, lo, hi, updated,
                  name = "sqlupdate", parts = nParts, asOf = Some(readV))
              case (lo, hi) =>
                tl.replaceWhereTyped(s, root, keyCol, lo, hi, updated,
                  name = "sqlupdate", parts = nParts, asOf = Some(readV))
            }
          }))
        }
      // MERGE: the unconditional UPDATE SET * / INSERT * pair routes
      // to the fast upsert; any conditional clause, partial SET,
      // DELETE action or gated/absent INSERT routes to
      // mergeIntoConditional — the full Delta clause surface, same
      // bucket-pruned read/rewrite and conflict contract either way.
      case Merge(path, name, src, idCol, buckets, clausesText) =>
        resolveTarget(path, name).map { t => val root = t.root
          val clauses = parseMergeClauses(clausesText.trim)
          GraftVersionCommand(s"MERGE INTO $root", t.refreshing(s => {
            val source = // a (subquery) re-enters the full parser; a bare
              if (src.startsWith("(")) // name resolves as table/view
                s.sql(src.stripPrefix("(").stripSuffix(")"))
              else s.table(src)
            val simple = clauses == Seq(PUpd(None, None), PIns(None))
            if (simple)
              graft.operators.TableLog.mergeInto(s, root, idCol,
                upserts = source,
                deleteIds = source.select(source.col(idCol)).limit(0),
                nBuckets = buckets.toInt, name = "sqlmerge")
            else {
              val tl = graft.operators.TableLog
              val cols = graft.operators.TableLogRelation
                .snapshotDf(s, root).columns.toSeq
              val matched: Seq[tl.MergeClause] = clauses.collect {
                case PUpd(c, None) =>
                  tl.MatchedUpdate(c, cols.map(x => x -> s"s.`$x`").toMap)
                case PUpd(c, Some(set)) => tl.MatchedUpdate(c, set.toMap)
                case PDel(c) => tl.MatchedDelete(c)
              }
              val insertWhen: Option[String] =
                clauses.collectFirst { case PIns(c) => c } match {
                  case None => Some("false") // no insert clause: drop
                  case Some(None) => None    // unconditional insert
                  case Some(Some(c)) => Some(c)
                }
              tl.mergeIntoConditional(s, root, idCol, source,
                buckets.toInt, "sqlmerge", matched, insertWhen)
            }
          }))
        }
      case Restore(path, name, v) => resolveTarget(path, name).map { t =>
        val root = t.root
        GraftVersionCommand(s"RESTORE $root", t.refreshing(s =>
          graft.operators.TableLog.restoreTable(s, root, v.toLong)))
      }
      // VACUUM returns the doomed file list (one row per reclaimed —
      // or, under DRY RUN, reclaimable — root-relative path), Delta's
      // shape; the RETENTION DECISION is explicit: versions below the
      // named one become unrestorable. Eager at EXECUTION like every
      // mutation (parse/EXPLAIN must not reclaim anything).
      case Vacuum(path, name, v, dry) => resolveTarget(path, name).map { t =>
        val root = t.root
        GraftPathsCommand(s"VACUUM $root", t.refreshing(s =>
          graft.operators.TableLog.vacuum(s, root, v.toLong,
            dryRun = dry != null)))
      }
      // ALTER TABLE … ADD COLUMNS: a metadata-only schema-widening
      // commit (TableLog.addColumns — zero data I/O; reads null-fill
      // the new columns for every pre-alter file). The column list is
      // parsed as DDL at parse time (pure — no filesystem touch); the
      // catalog's declared schema follows the LOG's post-commit truth
      // for named tables so DESCRIBE stays honest.
      case AlterAdd(path, name, colsDdl) =>
        // resolve FIRST: a non-tablelog table's ALTER must fall
        // through to Spark untouched even when its column DDL uses a
        // form this parse would reject
        resolveTarget(path, name).map { t =>
          val cols = org.apache.spark.sql.types.StructType.fromDDL(colsDdl)
          GraftVersionCommand(s"ALTER TABLE ${t.root} ADD COLUMNS",
            t.refreshing { s =>
              val v = graft.operators.TableLog.addColumns(s, t.root, cols)
              for (id <- t.ident;
                   st <- graft.operators.TableLog.logSchema(s, t.root))
                s.sessionState.catalog.alterTableDataSchema(id, st)
              v
            })
        }
      // TRUNCATE TABLE: one metadata commit de-references the whole
      // active file set (time travel / RESTORE keep working until
      // VACUUM; concurrent writers conflict rather than lose rows).
      case Trunc(path, name) => resolveTarget(path, name).map { t =>
        GraftVersionCommand(s"TRUNCATE ${t.root}", t.refreshing(s =>
          graft.operators.TableLog.truncateTable(s, t.root)))
      }
      // DESCRIBE DETAIL: Delta's one-row summary — O(log) metadata at
      // EXECUTION (static schema keeps parse/EXPLAIN I/O-free).
      case Detail(path, name) => resolveTarget(path, name).map { t =>
        GraftRowsCommand(s"DESCRIBE DETAIL ${t.root}",
          graft.operators.TableLog.detailSchema,
          s => graft.operators.TableLog.describeDetail(s, t.root))
      }
      // ALTER TABLE … ADD CONSTRAINT <n> CHECK (<expr>) [ID <col>]:
      // the Delta constraint verb — existing rows are validated first
      // (a violating table refuses the declaration), then checked
      // writes enforce it. The optional ID names the delete-sidecar
      // id column for tables with deletes in force.
      case AddCon(path, name, cname, expr, idCol) =>
        resolveTarget(path, name).map { t =>
          GraftVersionCommand(s"ADD CONSTRAINT $cname ON ${t.root}",
            t.refreshing(s => graft.operators.TableLog.addCheckConstraint(
              s, t.root, cname, expr, Option(idCol))))
        }
      case DropCon(path, name, cname) => resolveTarget(path, name).map { t =>
        GraftVersionCommand(s"DROP CONSTRAINT $cname ON ${t.root}",
          t.refreshing(s => graft.operators.TableLog.dropCheckConstraint(
            s, t.root, cname)))
      }
      case _ if PartitionedCreate.matches(blankLiterals(sqlText)) => sys.error(
        "GraftSql: PARTITIONED BY / CLUSTERED BY on a tablelog table " +
          "is not supported — Spark's v1 path would silently ignore " +
          "the spec (files land unpartitioned while the catalog claims " +
          "otherwise). The format's layout mechanism is zone-map " +
          "clustering: stage with stageWithZoneMap / the clusterBy " +
          "writer option, or OPTIMIZE <table> KEY <id> CLUSTER BY (...)")
      case GraftHead(verb) => sys.error(
        s"GraftSql: malformed $verb statement for a graft.`<root>` " +
          "table — see graft.plans.GraftSql for the statement shapes")
      // a DML verb addressed at a REAL tablelog catalog table in a
      // shape the face doesn't support: error with the supported
      // shape instead of handing Spark a statement it will reject
      // with an unrelated message (v1 tables have no UPDATE/DELETE)
      case NamedDmlHead(verb, path, name, _)
          if resolveTarget(path, name).isDefined => sys.error(
        s"GraftSql: unsupported $verb shape on tablelog table " +
          s"'${Option(name).getOrElse(path)}' — supported: UPDATE/DELETE " +
          "with WHERE <keyCol> BETWEEN <lit> AND <lit> [PARTS n]; MERGE " +
          "INTO ... USING <src> ON <idCol> BUCKETS <n> WHEN ... (see " +
          "graft.plans.GraftSql)")
      case _ => None
    }

  // ---- table-valued functions: reads with time travel ----

  /** TVF root arguments accept either a table ROOT PATH or a catalog
    * NAME (the q169 face extended to the pure-SQL TVF readers —
    * `graft_table('events', 3)` is named time travel). A string with
    * a '/' is always a path (so `./name` explicitly forces a relative
    * path); otherwise a catalog lookup resolving to a tablelog table
    * wins, and anything unresolved falls back to being treated as a
    * path so path-shaped errors stay loud and unchanged.
    *
    * SHADOWING: a bare name that is both a registered table AND an
    * existing relative directory resolves to the TABLE — creating a
    * table named like a pre-existing relative-path argument silently
    * changes what that caller reads, so the collision is logged
    * loudly here; relative-path callers that must stay stable should
    * write `./name`. */
  private def resolveRoot(s: String): String =
    if (s.contains("/")) s
    else InsertIntoTableLogRule.resolveTableLog(SparkSession.active, s)
      .map { case (_, loc) =>
        if (new java.io.File(s).isDirectory)
          log.warn(s"GraftSql: TVF root '$s' resolves to catalog table " +
            s"at $loc, SHADOWING the existing relative directory " +
            s"'./$s' — pass './$s' to read the path instead")
        loc
      }.getOrElse(s)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def litString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.toString
  }
  private def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be an integer literal")
    e.eval() match {
      // INTEGRAL only — a Double/Float literal would silently
      // truncate (1.9 -> 1) and answer for a different argument
      case n @ (_: java.lang.Integer | _: java.lang.Long |
                _: java.lang.Short | _: java.lang.Byte) =>
        n.asInstanceOf[Number].longValue
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
    val root = resolveRoot(litString(es.head, "graft_table: root"))
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
    val root = resolveRoot(litString(es.head, "graft_table_at: root"))
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
    val root = resolveRoot(litString(es.head, "graft_table_changes: root"))
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
    val root = resolveRoot(litString(es.head, "graft_table_profile: root"))
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
        resolveRoot(litString(es.head, "graft_table_history: root")))
      .queryExecution.logical
  }

  /** A literal range bound: integer literals stay Long, string
    * literals stay String (the zone map's own serialized domains —
    * [[graft.operators.TableLog]]'s zbound handles both). */
  private def litBound(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      // INTEGRAL only — a fractional bound silently truncated would
      // aggregate a different window than the user asked for
      case n @ (_: java.lang.Integer | _: java.lang.Long |
                _: java.lang.Short | _: java.lang.Byte) =>
        n.asInstanceOf[Number].longValue
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be an integer or string literal, got " +
          s"${Option(other).fold("NULL")(_.toString)}")
    }
  }

  /** graft_table_window_stats(root, keyCol, lo, hi, col1[, col2 ...])
    * — the range-scoped metadata aggregates
    * ([[graft.operators.TableLog.metadataAggRange]]) reachable by a
    * PURE-SQL reader: count/min/max/sum per asked column over `lo <=
    * keyCol <= hi`, answered from zone-map sidecars for every file
    * provably inside the window plus a boundary-file scan for the
    * straddlers — O(boundary files), never O(window). Declines
    * LOUDLY (not silently scanning) when stats can't prove the
    * window. */
  def graftTableWindowStatsBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 5,
      "graft_table_window_stats(root, keyCol, lo, hi, col1[, ...])")
    val root = resolveRoot(litString(es.head, "graft_table_window_stats: root"))
    val keyCol = litString(es(1), "graft_table_window_stats: keyCol")
    val lo = litBound(es(2), "graft_table_window_stats: lo")
    val hi = litBound(es(3), "graft_table_window_stats: hi")
    val cols = es.drop(4).map(litString(_, "graft_table_window_stats: col"))
    graft.operators.TableLog.metadataAggRange(SparkSession.active, root,
        keyCol, lo, hi, cols)
      .getOrElse(sys.error(
        "graft_table_window_stats: declined — the window's files are " +
          "not stats-covered on the asked columns (or delete sidecars " +
          "are in force); scan the window through graft_table(...)"))
      .queryExecution.logical
  }

  /** graft_table_window_distinct(root, sketchCol, keyCol, lo, hi) —
    * the range-scoped distinct estimate
    * ([[graft.operators.TableLog.metadataDistinctRange]]) as SQL:
    * `count(distinct sketchCol) WHERE lo <= keyCol <= hi` from the
    * per-file HLL register banks of files inside the window, merged
    * with a boundary-file scan. Coverage gaps DEGRADE to scanning
    * those files (never a wrong estimate); declines loudly only for
    * deletes-in-force or a column that exists nowhere. */
  def graftTableWindowDistinctBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 5,
      "graft_table_window_distinct(root, sketchCol, keyCol, lo, hi)")
    val root = resolveRoot(litString(es.head, "graft_table_window_distinct: root"))
    val sketchCol = litString(es(1), "graft_table_window_distinct: sketchCol")
    val keyCol = litString(es(2), "graft_table_window_distinct: keyCol")
    val lo = litBound(es(3), "graft_table_window_distinct: lo")
    val hi = litBound(es(4), "graft_table_window_distinct: hi")
    graft.operators.TableLog.metadataDistinctRange(SparkSession.active,
        root, sketchCol, keyCol, lo, hi)
      .getOrElse(sys.error(
        "graft_table_window_distinct: declined — the window's files " +
          "lack HLL sketches on the asked column (commit with " +
          "sketchCols) or delete sidecars are in force"))
      .queryExecution.logical
  }

  val tableFunctions: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_table" -> graftTableBuilder _,
    "graft_table_at" -> graftTableAtBuilder _,
    "graft_table_changes" -> graftTableChangesBuilder _,
    "graft_table_profile" -> graftTableProfileBuilder _,
    "graft_table_history" -> graftTableHistoryBuilder _,
    "graft_table_window_stats" -> graftTableWindowStatsBuilder _,
    "graft_table_window_distinct" -> graftTableWindowDistinctBuilder _)
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
