package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At scale these map to the reference's stores: `events` is the Kinesis
  * title/event stream, `sources`/`genres`-like dims are the small
  * reference tables (region/nation here), `documents`/`embeddings` are
  * the training-data-pipeline tables. Loaders keep the scan declarative
  * (plain `spark.read.parquet`) so Catalyst retains predicate pushdown
  * and column pruning on every downstream query.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** JSON source with explicit schema (schema inference is a full
    * extra pass at 100 TB — never rely on it). The reference ingests
    * JSON API payloads (ingestion.py fetch_titles). */
  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV source with explicit schema. */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read nanos as long (legacy conf) and truncate to
    * microsecond timestamps — the same ns→us truncation DuckDB's
    * `CAST(ts AS TIMESTAMP)` performs, keeping both engines aligned. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Typed views for operators where compile-time fields help. */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double, props: String)
case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)
case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
