package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 jsonl event source: byte-range splits (exactly-once
  * lines), filter pushdown, column pruning. */
class JsonlSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("jsonl_src").toString
    val types = Seq("click", "view", "purchase")
    // two files, varied line lengths so split boundaries land mid-line
    for (f <- 0 until 2) {
      val lines = (0 until 3000).map { i =>
        val id = f * 3000 + i
        val pad = "x" * (i % 37)
        s"""{"event_id":$id,"user_id":${id % 100},"event_type":"${types(id % 3)}","value":${id % 500}.5,"pad":"$pad"}"""
      }
      Files.write(Paths.get(d, s"part-$f.jsonl"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    }
    d
  }

  private def read(splitBytes: Long) =
    spark.read.format("graft.sources.JsonlSource").schema(schema)
      .option("path", dir).option("split.bytes", splitBytes.toString).load()

  test("byte-range splits read every line exactly once") {
    val single = read(1L << 30).count() // one split per file
    assert(single === 6000)
    for (sb <- Seq(512L, 1024L, 7777L)) {
      assert(read(sb).count() === 6000, s"split.bytes=$sb")
      // no duplicates either: ids are unique
      assert(read(sb).select("event_id").distinct().count() === 6000, s"split.bytes=$sb dup")
    }
  }

  test("matches spark.read.json on the same data and predicate") {
    val viaJson = spark.read.schema(schema).json(dir)
      .filter(col("event_type") === "purchase" && col("value") > 400)
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaV2 = read(2048)
      .filter(col("event_type") === "purchase" && col("value") > 400)
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaV2 === viaJson && viaV2.nonEmpty)
  }

  test("filters reach the scan and columns are pruned") {
    val df = read(4096)
      .filter(col("event_type") === "purchase" && col("value") > 400)
      .select("event_id")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.contains("EqualTo(event_type,purchase)"), scan)
    assert(scan.contains("GreaterThan(value,400"), scan)
    // every predicate was pushed (no post-scan filter), so pruning cuts
    // the read schema all the way down to the projected column
    assert(scan.contains("ReadSchema: struct<event_id:bigint>"), scan)
    assert(!scan.contains("user_id"), scan)
    assert(df.count() === read(1L << 30).filter(
      col("event_type") === "purchase" && col("value") > 400).count())
  }

  test("unsupported filter dtypes stay post-scan (no silent empty results)") {
    // A consumed V2 filter is never re-applied by Spark, so the scan
    // must NOT claim comparisons its reader can't evaluate. Boolean is
    // a legal schema dtype (fieldVal parses it) but cmp() has no
    // boolean branch — claiming flag=true used to return zero rows.
    val d = Files.createTempDirectory("jsonl_bool").toString
    val lines = (0 until 100).map(i => s"""{"event_id":$i,"flag":${i % 2 == 0}}""")
    Files.write(Paths.get(d, "part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("flag", BooleanType)))
    val df = spark.read.format("graft.sources.JsonlSource").schema(sch)
      .option("path", d).load().filter(col("flag") === true)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(!scan.contains("EqualTo(flag"), scan)
    assert(df.count() === 50) // Spark evaluates it post-scan instead
    // supported comparisons on the same read still push down
    val pushed = spark.read.format("graft.sources.JsonlSource").schema(sch)
      .option("path", d).load().filter(col("event_id") < 10)
    val scan2 = pushed.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.get
    assert(scan2.contains("LessThan(event_id,10)"), scan2)
    assert(pushed.count() === 10)
  }

  test("default schema covers the event stream shape") {
    val df = spark.read.format("graft.sources.JsonlSource").option("path", dir).load()
    assert(df.schema.fieldNames.toSeq ===
      Seq("event_id", "user_id", "event_type", "value"))
  }
}
