package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Event

/** Live-source seam: every streaming pipeline in [[EventPipeline]]
  * takes a DataFrame with the `events` schema, and this is the single
  * entry that produces one from a pluggable live source — the
  * reference's Kinesis stream (consumer.py handler; docs/design.md
  * ingestion flow) abstracted so the transport is swappable.
  *
  * Built-in transports (all in the Spark distribution, no extra deps):
  *  - [[EventSource.Rate]] — synthetic load, shaped into events; the
  *    demo/smoke-test stand-in for a firehose;
  *  - [[EventSource.FileTail]] — tail a directory of event files (the
  *    file-drop analog of a queue; exactly-once with a checkpoint);
  *  - [[EventSource.Socket]] — JSON event lines over a socket
  *    (`nc -lk 9999`-style live demos). NOT checkpoint-resumable (a
  *    raw socket can't replay); for exactly-once over a socket, land
  *    frames with [[SocketSpool]] and read the spool via `FileTail(dir,
  *    "json")` — persist-then-process, proved live in StreamingSpec.
  *
  * A production deployment swaps in Kafka/Kinesis by adding a case
  * that maps the connector's payload to the same schema:
  * {{{
  * spark.readStream.format("kafka")
  *   .option("kafka.bootstrap.servers", ...).option("subscribe", "events").load()
  *   .select(EventStreams.jsonLinesToEvents(col("value").cast("string")))
  * }}}
  * Downstream pipelines are unchanged — they never see the transport.
  *
  * ==Kafka/Kinesis binding checklist==
  * The drop-in is verified by the generic source contract
  * (`StreamSourceContract` in the test tree) — the same harness the
  * jsonl and tablechanges bindings pass. `KafkaSourceContractSpec`
  * now EXISTS (test tree), compiled connector-free: the reader is the
  * `format("kafka")` string, the producer goes through reflection,
  * and every test `assume`s the connector class + a
  * `GRAFT_KAFKA_BOOTSTRAP` broker — on this zero-egress image it
  * compiles and cancels; point build.sbt's `GRAFT_KAFKA_JARS` at the
  * connector + kafka-clients jars and the contract runs unedited.
  * Checklist for any further binding (Kinesis, a queue):
  *
  *  1. implement `SourceContractFixture`: `append(n)` produces n
  *     uniquely-id'd JSON records to a fresh test topic; `stream`
  *     builds the readStream above (capped variant sets
  *     `maxOffsetsPerTrigger` low enough that 1000 records take >3
  *     micro-batches);
  *  2. `class <X>SourceContractSpec extends AnyFunSuite with
  *     StreamSourceContract` — zero new test code; the contract pins
  *     capped exactly-once coverage, exact mid-backlog checkpoint
  *     resume, and idle-restart replay silence;
  *  3. add the `EventSource` case mapping `value` through
  *     [[jsonLinesToEvents]] (the consumer.py:38-52 analog);
  *  4. keep offset-encoding edge cases (the analog of
  *     JsonlSourceSpec's shrunk/deleted-file guards) in a
  *     binding-specific spec — they depend on the connector's offset
  *     type.
  */
object EventStreams {

  sealed trait EventSource
  object EventSource {
    /** Synthetic events at `rowsPerSecond`. */
    final case class Rate(rowsPerSecond: Int) extends EventSource
    /** Tail `dir` for new event files of `format` (parquet/json/csv). */
    final case class FileTail(dir: String, format: String = "parquet") extends EventSource
    /** JSON event lines from a TCP socket. */
    final case class Socket(host: String, port: Int) extends EventSource
    /** Tail `dir` of jsonl files through graft's own DSv2 micro-batch
      * source — a durable (file, byte-range) offset log, so resume is
      * exact even MID-FILE, and `maxBytesPerTrigger` caps each batch
      * (the backlog-drain throttle). The checkpointable message-bus
      * analog: SocketSpool (or any queue lander) writes the dir, this
      * reads it exactly-once. */
    final case class JsonlDir(dir: String,
                              maxBytesPerTrigger: Long = Long.MaxValue) extends EventSource
  }
  import EventSource._

  val eventSchema: org.apache.spark.sql.types.StructType =
    Encoders.product[Event].schema

  /** Parse a string column of JSON event lines into event columns —
    * shared by the socket transport and any queue connector whose
    * payload is a JSON blob (the reference's Kinesis records,
    * consumer.py:38-52 json.loads). Malformed lines become null-id
    * rows the caller can filter. */
  def jsonLinesToEvents(lines: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    from_json(lines, eventSchema)

  /** One live event stream, whatever the transport. */
  def readEventStream(spark: SparkSession, src: EventSource): DataFrame = src match {
    case Rate(rps) =>
      spark.readStream.format("rate")
        .option("rowsPerSecond", rps.toString).load()
        .select(col("value").as("event_id"), col("timestamp").as("ts"),
          (col("value") % 50).as("user_id"),
          element_at(array(lit("click"), lit("view"), lit("purchase")),
            (col("value") % 3 + 1).cast("int")).as("event_type"),
          (col("value") % 100).cast("double").as("value"),
          lit("{}").as("props"))
    case FileTail(dir, format) =>
      spark.readStream.schema(eventSchema).format(format).load(dir)
    case Socket(host, port) =>
      spark.readStream.format("socket")
        .option("host", host).option("port", port.toString).load()
        .select(jsonLinesToEvents(col("value")).as("e"))
        .select("e.*")
        .filter(col("event_id").isNotNull)
    case JsonlDir(dir, cap) =>
      spark.readStream.format("graft.sources.JsonlSource")
        .schema(eventSchema)
        .option("path", dir)
        .option("maxBytesPerTrigger", cap.toString)
        .load()
  }
}
