package graft.sources

import java.io.{BufferedInputStream, FileInputStream}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for newline-delimited JSON event files — the
  * ingest seam for the reference's JSON payload stream (ingestion.py
  * fetch_titles → Kinesis records), built the way a 100 TB file source
  * must be:
  *
  *  - **Byte-range splits**, not per-file tasks: each file is cut into
  *    `split.bytes` chunks (default 32 MiB); a line belongs to the
  *    range containing its FIRST byte — a reader seeks to its range,
  *    discards the remainder of a line spanning its start (read whole
  *    by the range the line starts in; the byte before the start
  *    decides the case locally), and reads lines starting before its
  *    end — so parallelism scales with DATA SIZE, not file count.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): only
  *    requested fields are extracted from each JSON node.
  *  - **Filter pushdown** (SupportsPushDownFilters): eq/lt/gt/le/ge/
  *    IsNotNull on top-level fields are evaluated on the parsed node
  *    BEFORE a row is materialized — `.explain` shows them under
  *    `PushedFilters`, and Spark drops its redundant post-filter.
  *  - **Explicit schema** (`.schema(...)`) — inference would be a full
  *    extra pass at scale; without one, the events schema is assumed.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.JsonlSource")
  *   .schema(...).option("path", dir).load()
  * }}}
  */
class JsonlSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  /** Default schema: the event stream's shape (TESTDATA.md events). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlSource.defaultSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new JsonlTable(schema, properties.get("path"),
      Option(properties.get("split.bytes")).map(_.toLong).getOrElse(32L * 1024 * 1024))

  // streaming options (read via newScanBuilder's options):
  //  - maxBytesPerTrigger: per-micro-batch byte cap (backlog throttle)
  //  - retire.deleted: drop DELETED files' entries from the offset —
  //    see JsonlMicroBatchStream's scaladoc for the naming contract
}

object JsonlSource {
  val defaultSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))
}

class JsonlTable(tableSchema: StructType, path: String, splitBytes: Long)
  extends Table with SupportsRead {
  require(path != null, "jsonl source requires a path option")
  override def name(): String = s"jsonl($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(tableSchema, path, splitBytes,
      options.getLong("maxBytesPerTrigger", Long.MaxValue),
      options.getBoolean("retire.deleted", false))
}

class JsonlScanBuilder(fullSchema: StructType, path: String, splitBytes: Long,
                       maxBytesPerTrigger: Long = Long.MaxValue,
                       retireDeleted: Boolean = false)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our field order (parser builds rows positionally)
    required = StructType(fullSchema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** Accept simple comparisons on top-level fields — but ONLY the
    * (field dtype, literal type) combinations the reader's `cmp()` can
    * actually evaluate (long/int/double/string). A consumed filter
    * Spark never re-applies post-scan, so claiming a comparison on,
    * say, a BooleanType field (legal in user schemas — `fieldVal`
    * parses it) would silently drop every row when `cmp()` returns
    * None. Unsupported combinations stay in Spark's post-scan filter
    * instead. */
  private def comparable(field: String, lit: Any): Boolean =
    fullSchema.fields.exists(f => f.name == field && (f.dataType match {
      case LongType | IntegerType | DoubleType | StringType => true
      case _ => false
    })) && (lit match {
      case _: java.lang.Long | _: Integer | _: java.lang.Double |
           _: String | _: UTF8String => true
      case _ => false
    })

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo(a, v) => comparable(a, v)
      case GreaterThan(a, v) => comparable(a, v)
      case GreaterThanOrEqual(a, v) => comparable(a, v)
      case LessThan(a, v) => comparable(a, v)
      case LessThanOrEqual(a, v) => comparable(a, v)
      case IsNotNull(a) => fullSchema.fieldNames.contains(a)
      case _ => false
    }
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new JsonlScan(fullSchema, required, pushed, path, splitBytes,
      maxBytesPerTrigger, retireDeleted)
}

class JsonlScan(fullSchema: StructType, required: StructType, pushed: Array[Filter],
                path: String, splitBytes: Long,
                maxBytesPerTrigger: Long = Long.MaxValue,
                retireDeleted: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonlMicroBatchStream(fullSchema, required, pushed, path, splitBytes,
      maxBytesPerTrigger, retireDeleted)
  override def description(): String =
    s"jsonl($path) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    JsonlScan.listFiles(path).flatMap { f =>
      JsonlScan.rangePartitions(f.getAbsolutePath, 0L, f.length(), splitBytes)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(fullSchema, required, pushed)
}

object JsonlScan {
  /** Visible data files under `path` (dot/underscore prefixes are
    * temp/metadata by convention — e.g. SocketSpool's in-flight
    * `.part-*.tmp` files), stable name order. */
  def listFiles(path: String): Seq[java.io.File] = {
    val root = new java.io.File(path)
    (if (root.isDirectory) Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
     else Seq(root))
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
  }

  /** Cut [start, end) of a file into `splitBytes` chunks. */
  def rangePartitions(file: String, start: Long, end: Long,
                      splitBytes: Long): Seq[InputPartition] = {
    if (end <= start) Seq.empty
    else {
      val nSplits = math.max(1L, (end - start + splitBytes - 1) / splitBytes)
      (0L until nSplits).map(i =>
        JsonlPartition(file, start + i * splitBytes,
          math.min(start + (i + 1) * splitBytes, end)): InputPartition)
    }
  }
}

case class JsonlPartition(file: String, start: Long, end: Long) extends InputPartition

class JsonlReaderFactory(fullSchema: StructType, required: StructType,
                         pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonlReader(fullSchema, required, pushed,
      partition.asInstanceOf[JsonlPartition])
}

/** Reads lines whose FIRST BYTE lies in [start, end): a line belongs
  * to the range containing its start, and a line SPANNING a boundary
  * is read whole by the range it starts in (the next range discards
  * the remainder). First-byte ownership — unlike the Hadoop
  * terminator rule — stays exactly-once across STREAMING BATCHES
  * too: an uncapped micro-batch always ends at EOF, which is a line
  * boundary, and the terminator rule would make the next batch
  * discard a line nobody read (the previous batch could not overshoot
  * past bytes that did not exist yet). Whether the boundary splits a
  * line is decided locally by peeking the byte before `start`. */
class JsonlReader(fullSchema: StructType, required: StructType,
                  pushed: Array[Filter], part: JsonlPartition)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val in = new BufferedInputStream(new FileInputStream(part.file), 1 << 16)
  private var pos = 0L
  private var row: InternalRow = _
  private var done = false

  // seek; discard the remainder of a line SPANNING our start (owned
  // by the range containing its first byte). The byte before `start`
  // tells which case holds: '\n' means `start` opens a fresh line —
  // ours, nothing to discard.
  if (part.start > 0) {
    var skipped = 0L
    while (skipped < part.start - 1) skipped += in.skip(part.start - 1 - skipped)
    val prevByte = in.read()
    pos = part.start
    if (prevByte != '\n') readLine() // mid-line: the starter read it whole
  }

  private def readLine(): String = {
    val buf = new ArrayBuffer[Byte](128)
    var b = in.read()
    pos += (if (b >= 0) 1 else 0)
    while (b >= 0 && b != '\n') {
      buf += b.toByte
      b = in.read()
      pos += (if (b >= 0) 1 else 0)
    }
    if (b < 0 && buf.isEmpty) null
    else new String(buf.toArray, StandardCharsets.UTF_8)
  }

  private def fieldVal(node: JsonNode, name: String, dt: DataType): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else dt match {
      case LongType => v.asLong()
      case IntegerType => v.asInt()
      case DoubleType => v.asDouble()
      case StringType => UTF8String.fromString(v.asText())
      case BooleanType => v.asBoolean()
      case TimestampType =>
        // ISO-8601 instants (the JSON event payload's ts format) or
        // numeric epoch millis → Catalyst micros; unparseable → null
        if (v.isNumber) v.asLong() * 1000L
        else try java.time.Instant.parse(v.asText()).toEpochMilli * 1000L
        catch { case _: java.time.format.DateTimeParseException => null }
      case _ => null
    }
  }

  private def passes(node: JsonNode): Boolean = pushed.forall {
    case IsNotNull(a) => node.get(a) != null && !node.get(a).isNull
    case EqualTo(a, v) => cmp(node, a, v).exists(_ == 0)
    case GreaterThan(a, v) => cmp(node, a, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(node, a, v).exists(_ >= 0)
    case LessThan(a, v) => cmp(node, a, v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(node, a, v).exists(_ <= 0)
    case _ => true
  }

  /** None when the field is absent/null (comparisons are then false,
    * matching SQL three-valued logic). */
  private def cmp(node: JsonNode, name: String, lit: Any): Option[Int] = {
    val v = node.get(name)
    if (v == null || v.isNull) None
    else lit match {
      case l: Long => Some(java.lang.Long.compare(v.asLong(), l))
      case i: Integer => Some(java.lang.Long.compare(v.asLong(), i.longValue()))
      case d: java.lang.Double => Some(java.lang.Double.compare(v.asDouble(), d))
      case s: String => Some(v.asText().compareTo(s))
      case u: UTF8String => Some(v.asText().compareTo(u.toString))
      case _ => None
    }
  }

  override def next(): Boolean = {
    if (done) return false
    var line: String = null
    var accepted = false
    // start a new line only while pos < end: a line whose first byte
    // is AT `end` belongs to the next range (first-byte ownership);
    // one STARTING before `end` is ours whole, reading past `end`
    while (!accepted && { line = if (pos < part.end) readLine() else null; line != null }) {
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        val node = mapper.readTree(trimmed)
        if (passes(node)) {
          row = InternalRow.fromSeq(required.fields.toSeq
            .map(f => fieldVal(node, f.name, f.dataType)))
          accepted = true
        }
      }
    }
    if (!accepted) done = true
    accepted
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Streaming offset: a (file → bytes consumed) log. JSON is a single
  * sorted object so serialization is deterministic and diffable in the
  * checkpoint's offset WAL. The reserved `_format` key versions the
  * OWNERSHIP RULE the byte positions were written under (2 =
  * first-byte line ownership; absent = the pre-round-16 terminator
  * rule) — see [[JsonlOffset.FORMAT]]. File keys are ABSOLUTE paths
  * (they always contain '/'), so the bare reserved key can never
  * collide with one. */
case class JsonlOffset(files: Map[String, Long])
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    val node = m.createObjectNode()
    node.put(JsonlOffset.FORMAT_KEY, JsonlOffset.FORMAT)
    files.toSeq.sortBy(_._1).foreach { case (f, n) => node.put(f, n) }
    m.writeValueAsString(node)
  }
}

object JsonlOffset {
  /** Offset format version. 2 = byte positions under the FIRST-BYTE
    * line-ownership rule (a partition owns a line iff it owns its
    * first byte). Version 1 (any checkpoint written before the key
    * existed) used the terminator rule, whose capped offsets can land
    * exactly ON a line start — under the new rule that one line
    * replays once on resume. The version makes that upgrade hazard
    * DETECTABLE: [[JsonlMicroBatchStream.deserializeOffset]] logs a
    * loud warning on a v1 offset instead of resuming silently. */
  val FORMAT = 2L
  val FORMAT_KEY = "_format"

  /** Parse an offset; returns the offset plus the format version the
    * checkpoint was written under (1 when the key is absent). */
  def fromJsonVersioned(s: String): (JsonlOffset, Long) = {
    val node = new ObjectMapper().readTree(s)
    val it = node.fields()
    val b = Map.newBuilder[String, Long]
    var fmt = 1L
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey == FORMAT_KEY) fmt = e.getValue.asLong()
      else b += e.getKey -> e.getValue.asLong()
    }
    (JsonlOffset(b.result()), fmt)
  }

  def fromJson(s: String): JsonlOffset = fromJsonVersioned(s)._1
}

/** Micro-batch streaming over a directory of jsonl files — the
  * checkpointable message-bus analog of the reference's Kinesis ingest
  * (consumer.py:30-52 record loop): the offset is a durable
  * (file, byte position) log, so a restarted query resumes EXACTLY
  * where the last committed batch ended, including mid-file.
  *
  * Exactly-once mechanics:
  *  - `latestOffset` advances each visible file's position to its
  *    current length (files are expected to appear atomically and then
  *    be immutable — the SocketSpool / object-store landing pattern;
  *    a file that grows in place is still consumed correctly as long
  *    as appends are whole lines).
  *  - A batch's partitions are the byte ranges between the two
  *    offsets, cut into `split.bytes` chunks — the SAME first-byte
  *    ownership rule as the batch reader, so consecutive batches
  *    partition the file's lines exactly, whether a boundary is a
  *    trigger cap mid-line or a caught-up batch's EOF on a line
  *    boundary. (Ownership-rule caveat: a checkpoint whose LAST
  *    capped offset landed exactly on a line start, written by a
  *    pre-first-byte-rule build, replays that one line on upgrade —
  *    drain a query to caught-up before upgrading across the rule
  *    change.)
  *  - Offsets live in the query's checkpoint WAL; a crashed batch is
  *    re-planned from identical offsets and re-reads identical rows
  *    (deterministic), which with an idempotent/transactional sink is
  *    end-to-end exactly-once.
  *
  * `maxBytesPerTrigger` bounds each micro-batch (admission in stable
  * file-name order, cut at an exact byte position) — the backlog-drain
  * throttle a 100 TB replay needs so the first trigger doesn't plan
  * the whole history as one batch.
  *
  * Offset-size bound: by default the log keeps an entry for EVERY file
  * ever seen — deleted files hold their position so a recreated file
  * with the same name cannot replay from zero. For a long-lived spool
  * that is unbounded growth (~100 bytes × total files ever written).
  * When the writer NEVER reuses names (SocketSpool's sessionId-seq
  * naming, or any object-store landing with unique keys), set
  * `retire.deleted=true`: entries for files no longer on disk retire
  * from the offset, bounding it by the LIVE file count — pair with a
  * spool retention sweep and both the directory listing and the
  * offset stay O(retention window).
  *
  * Pushdown caveat (engine behavior, spec-pinned): Spark's V2 filter/
  * column pushdown does NOT run for streaming relations — the
  * streaming scan parses the DECLARED schema and the engine filters
  * post-scan (results identical; parse not narrowed). Declare only
  * the fields you need in the readStream schema when parse cost
  * matters; the batch path of this source does push down. */
class JsonlMicroBatchStream(fullSchema: StructType, required: StructType,
                            pushed: Array[Filter], path: String, splitBytes: Long,
                            maxBytesPerTrigger: Long,
                            retireDeleted: Boolean = false)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  /** Per-file high-water mark of every offset this stream has seen —
    * engine-reported starts, committed batches, WAL offsets replayed
    * through deserializeOffset on restart, and offsets this stream
    * itself returned. Budgeting from the max keeps returned offsets
    * MONOTONE even when a crash left the WAL's planned end ahead of
    * the commit log — a trigger-capped latestOffset from a stale
    * baseline could otherwise step backward. */
  @volatile private var baseline: Map[String, Long] = Map.empty

  private def mergeMax(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    (a.keySet ++ b.keySet).iterator
      .map(k => k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap

  override def initialOffset(): Offset = JsonlOffset(Map.empty)

  // ---- Trigger.AvailableNow, implemented DIRECTLY (not via Spark's
  // AvailableNowMicroBatchStreamWrapper): the wrapper snapshots ONE
  // latestOffset call as the run's single batch end — under
  // maxBytesPerTrigger that is the first CAPPED offset, so a capped
  // AvailableNow run served one bounded batch and silently left the
  // backlog. Here the fence is the TRUE per-file length snapshot at
  // launch; capped triggers then drain TO the fence (files created
  // after launch — or bytes appended past a fenced position — wait
  // for the next run), and the run ends when the fence is reached.
  @volatile private var availableNowFence: Option[Map[String, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowFence = Some(
      JsonlScan.listFiles(path)
        .map(f => f.getAbsolutePath -> f.length()).toMap)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control path: the engine hands us the batch's START
    * offset (recovered from the WAL on restart), so the byte budget
    * counts strictly NEW bytes. The ReadLimit is ignored — the cap is
    * this source's own maxBytesPerTrigger option. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val prev = mergeMax(baseline, start.asInstanceOf[JsonlOffset].files)
    var budget = maxBytesPerTrigger
    val out = Map.newBuilder[String, Long]
    JsonlScan.listFiles(path).foreach { f =>
      val fp = f.getAbsolutePath
      val done = prev.getOrElse(fp, 0L)
      // under an AvailableNow fence, a post-launch file (absent from
      // the fence) and bytes past a fenced position wait for the
      // next run
      val visible = availableNowFence
        .fold(f.length())(fence => math.min(f.length(), fence.getOrElse(fp, 0L)))
      // never regress a file's position (a shrunk file would otherwise
      // re-serve bytes); admission in stable name order up to the cap
      val take = math.max(0L, math.min(visible - done, budget))
      budget -= take
      out += fp -> (done + take)
    }
    // files deleted after processing keep their last position unless
    // the writer guarantees unique names (retire.deleted): dropping an
    // entry otherwise would make a recreated file replay from zero
    if (!retireDeleted) prev.foreach { case (fp, n) =>
      if (!new java.io.File(fp).exists()) out += fp -> n
    }
    val computed = out.result()
    val next = if (retireDeleted) {
      // retirement must still never REGRESS a live file's position
      computed.map { case (fp, n) => fp -> math.max(n, prev.getOrElse(fp, 0L)) }
    } else mergeMax(prev, computed)
    baseline = next
    JsonlOffset(next)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[JsonlOffset].files
    val e = end.asInstanceOf[JsonlOffset].files
    e.toSeq.sortBy(_._1).flatMap { case (fp, endPos) =>
      val startPos = s.getOrElse(fp, 0L)
      if (endPos > startPos && new java.io.File(fp).exists())
        JsonlScan.rangePartitions(fp, startPos, endPos, splitBytes)
      else Seq.empty
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(fullSchema, required, pushed)

  override def commit(end: Offset): Unit =
    baseline = mergeMax(baseline, end.asInstanceOf[JsonlOffset].files)

  override def deserializeOffset(json: String): Offset = {
    // the restart path: Spark replays the WAL's offsets through here
    // before the first latestOffset call — seed the admission baseline
    val (o, fmt) = JsonlOffset.fromJsonVersioned(json)
    if (fmt < JsonlOffset.FORMAT)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"JsonlSource: resuming a format-$fmt checkpoint at $path — " +
          "its byte positions were written under the pre-first-byte " +
          "ownership rule, so a capped offset that landed exactly on " +
          "a line start will replay that ONE line once. Drain the " +
          "query to caught-up on the old build before upgrading to " +
          "avoid this; the replayed line is a no-op under an " +
          "idempotent sink.")
    baseline = mergeMax(baseline, o.files)
    o
  }

  override def stop(): Unit = ()
}
