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
}
