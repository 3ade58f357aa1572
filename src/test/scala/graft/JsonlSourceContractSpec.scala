package graft

import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The jsonl streaming binding run against the generic
  * [[StreamSourceContract]] — records append to ONE growing file, so
  * the resume property exercises MID-FILE byte offsets, the hardest
  * case for the (file → byte position) offset log. */
class JsonlSourceContractSpec extends AnyFunSuite with StreamSourceContract {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  lazy val fixture: SourceContractFixture = new SourceContractFixture {
    val sourceName = "JsonlSource"
    def newEnv(): SourceContractEnv = new SourceContractEnv {
      private val base = Files.createTempDirectory("jsonl_contract")
      private val in = base.resolve("in")
      Files.createDirectories(in)
      private var n = 0L
      def append(k: Int): Unit = {
        val sb = new StringBuilder
        var i = n
        while (i < n + k) {
          sb.append(s"""{"event_id":$i,"user_id":$i,"event_type":"e","value":1.5}""")
          sb.append('\n')
          i += 1
        }
        Files.write(in.resolve("a.jsonl"), sb.toString.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        n += k
      }
      def appended: Long = n
      def stream(capped: Boolean): DataFrame =
        spark.readStream.format("graft.sources.JsonlSource").schema(schema)
          .option("path", in.toString)
          .option("maxBytesPerTrigger",
            if (capped) "9000" else Long.MaxValue.toString)
          .option("split.bytes", "2048").load()
      val idCol = "event_id"
      val ckptDir: String = base.resolve("ckpt").toString
      val outDir: String = base.resolve("out").toString
    }
  }

  test("exactly-once across an EOF batch boundary: full drain, append, " +
      "drain again — the first appended line is not dropped (an " +
      "uncapped batch always ends at EOF, a line boundary; terminator-" +
      "rule ownership discarded the next line nobody had read)") {
    val env = fixture.newEnv()
    def drain(): Unit = {
      val q = env.stream(capped = false).writeStream.format("parquet")
        .option("path", env.outDir)
        .option("checkpointLocation", env.ckptDir)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    env.append(100)
    drain()
    def rows() = spark.read.parquet(env.outDir).count()
    assert(rows() === 100L)
    env.append(50) // resumes EXACTLY at the previous EOF line boundary
    drain()
    assert(rows() === 150L, s"the EOF-boundary resume dropped rows: ${rows()}")
    assert(spark.read.parquet(env.outDir)
      .select("event_id").distinct().count() === 150L)
  }

  test("Trigger.AvailableNow under maxBytesPerTrigger drains the whole " +
      "pre-launch backlog in bounded triggers and stops at the " +
      "launch-time fence; the next run serves exactly the delta") {
    val env = fixture.newEnv()
    env.append(2000) // ~120 KB >> the 9 KB cap: many bounded triggers
    def run(): Unit = {
      val q = env.stream(capped = true).writeStream.format("parquet")
        .option("path", env.outDir)
        .option("checkpointLocation", env.ckptDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000),
        "AvailableNow run did not terminate — fence never reached?")
    }
    run()
    def rows() = spark.read.parquet(env.outDir).count()
    def ids() = spark.read.parquet(env.outDir)
      .select("event_id").distinct().count()
    assert(rows() === 2000L && ids() === 2000L,
      s"a capped AvailableNow run must drain to the launch fence, got ${rows()}")
    // post-launch appends wait for the next explicitly-started run…
    env.append(300)
    assert(rows() === 2000L)
    // …which serves exactly the delta, exactly once (mid-file fence:
    // the new bytes append to the SAME file the fence cut)
    run()
    assert(rows() === 2300L && ids() === 2300L,
      s"the second run must serve exactly the appended rows, got ${rows()}")
  }
}
