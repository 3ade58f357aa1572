package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLog

/** The tablechanges streaming binding run against the generic
  * [[StreamSourceContract]] — offsets are TABLE VERSIONS, so the
  * capped-drain property exercises `maxVersionsPerTrigger` admission
  * control (a deep commit backlog must split into bounded
  * micro-batches) and the resume property exercises the source's
  * persisted served-high-water across restarts. Records arrive as
  * 100-row commits, each carrying its commit-time change-feed
  * sidecar (the only thing the source serves). */
class TableChangesContractSpec extends AnyFunSuite with StreamSourceContract {
  lazy val spark = TestSpark.spark

  lazy val fixture: SourceContractFixture = new SourceContractFixture {
    val sourceName = "TableChangesSource"
    def newEnv(): SourceContractEnv = new SourceContractEnv {
      private val base = Files.createTempDirectory("tablechanges_contract")
      private val root = base.resolve("t").toString
      private var n = 0L
      TableLog.commit(spark, root, Nil, Nil) // v0: the (empty) base load
      def append(k: Int): Unit = {
        import spark.implicits._
        var off = 0
        while (off < k) {
          val m = math.min(100, k - off)
          val df = ((n + off) until (n + off + m))
            .map(i => (i, s"r$i")).toDF("doc_id", "text")
          TableLog.commit(spark, root,
            TableLog.stageWrite(df, root, s"b${n + off}"), Nil,
            cdf = TableLog.stageFeed(
              df.select(col("doc_id"), lit("added").as("status")),
              root, s"b${n + off}"))
          off += m
        }
        n += k
      }
      def appended: Long = n
      def stream(capped: Boolean): DataFrame = {
        val r = spark.readStream
          .format("graft.streaming.TableChangesSourceProvider")
          .option("path", root).option("idCol", "doc_id")
        (if (capped) r.option("maxVersionsPerTrigger", "2") else r).load()
      }
      val idCol = "doc_id"
      val ckptDir: String = base.resolve("ckpt").toString
      val outDir: String = base.resolve("out").toString
    }
  }

  private def drain(env: SourceContractEnv, capped: Boolean,
                    once: Boolean): Unit = {
    val w = env.stream(capped).writeStream.format("parquet")
      .option("path", env.outDir)
      .option("checkpointLocation", env.ckptDir)
      .outputMode("append")
    val q = if (once)
      w.trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    else w.start()
    if (once) q.awaitTermination(120000)
    else { q.processAllAvailable(); q.stop() }
  }

  test("TableChangesSource: re-enabling maxVersionsPerTrigger after an uncapped run never re-serves") {
    val env = fixture.newEnv()
    env.append(1000) // 10 versions of 100 rows
    drain(env, capped = true, once = true) // marker at v2, 200 rows
    drain(env, capped = false, once = false) // uncapped: commits to v10
    def rows() = spark.read.parquet(env.outDir).count()
    def ids() = spark.read.parquet(env.outDir)
      .select("doc_id").distinct().count()
    assert(rows() === 1000 && ids() === 1000)
    env.append(200) // v11, v12
    // the cap comes BACK ON: its base must be the committed offset
    // (v10 — seeded by the restart's recovery getBatch and by the
    // uncapped run's persisted marker), never a stale capped-era
    // value (v2). The single Once trigger must serve exactly the two
    // new versions — no re-walk of the committed range, no re-serve.
    drain(env, capped = true, once = true)
    assert(rows() === 1200,
      s"first capped trigger after re-enable must serve the new versions, got ${rows()}")
    // and however it resumes, the drain must never duplicate
    drain(env, capped = true, once = false)
    assert(rows() === 1200, s"re-served rows after cap re-enable: ${rows()}")
    assert(ids() === 1200)
  }
}
