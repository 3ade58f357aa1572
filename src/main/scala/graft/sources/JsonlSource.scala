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
  *    `split.bytes` chunks (default 32 MiB); a reader seeks to its
  *    range, skips the partial first line (owned by the previous
  *    split), and stops at the first line ending past its range — so
  *    parallelism scales with DATA SIZE, not file count.
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
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(tableSchema, path, splitBytes)
}

class JsonlScanBuilder(fullSchema: StructType, path: String, splitBytes: Long)
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

  override def build(): Scan = new JsonlScan(fullSchema, required, pushed, path, splitBytes)
}

class JsonlScan(fullSchema: StructType, required: StructType, pushed: Array[Filter],
                path: String, splitBytes: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"jsonl($path) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new java.io.File(path)
    val files = (if (root.isDirectory) root.listFiles().toSeq else Seq(root))
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    files.flatMap { f =>
      val len = f.length()
      val nSplits = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until nSplits).map(i =>
        JsonlPartition(f.getAbsolutePath, i * splitBytes,
          math.min((i + 1) * splitBytes, len)): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(fullSchema, required, pushed)
}

case class JsonlPartition(file: String, start: Long, end: Long) extends InputPartition

class JsonlReaderFactory(fullSchema: StructType, required: StructType,
                         pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonlReader(fullSchema, required, pushed,
      partition.asInstanceOf[JsonlPartition])
}

/** Reads lines whose TERMINATOR lies in [start, end): the standard
  * split-ownership rule — a line belongs to the split its newline ends
  * in, so every line is read exactly once across splits. */
class JsonlReader(fullSchema: StructType, required: StructType,
                  pushed: Array[Filter], part: JsonlPartition)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val in = new BufferedInputStream(new FileInputStream(part.file), 1 << 16)
  private var pos = 0L
  private var row: InternalRow = _
  private var done = false

  // seek, then discard the partial line owned by the previous split
  if (part.start > 0) {
    var skipped = 0L
    while (skipped < part.start) skipped += in.skip(part.start - skipped)
    pos = part.start
    readLine() // partial (or whole) line ending in our range: ours starts after it
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
    // start a new line while pos <= end: the line that STARTS exactly at
    // `end` is read here and discarded by the next split's initial skip —
    // the Hadoop LineRecordReader ownership pairing, exactly-once lines
    while (!accepted && { line = if (pos <= part.end) readLine() else null; line != null }) {
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
