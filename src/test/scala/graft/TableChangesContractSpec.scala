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

  test("TableChangesSource: maxBytesPerTrigger batches thin commits " +
      "together and serves a fat commit ALONE — bounded triggers, " +
      "exactly-once drain") {
    import spark.implicits._
    val base = Files.createTempDirectory("tablechanges_bytes")
    val root = base.resolve("t").toString
    TableLog.commit(spark, root, Nil, Nil) // v0: base load
    def appendCommit(lo: Long, m: Long): Unit = {
      val df = (lo until lo + m).map(i => (i, s"r$i")).toDF("doc_id", "text")
      TableLog.commit(spark, root,
        TableLog.stageWrite(df.coalesce(1), root, s"b$lo"), Nil,
        cdf = TableLog.stageFeed(
          df.select(col("doc_id"), lit("added").as("status")).coalesce(1),
          root, s"b$lo"))
    }
    // v1..v6 thin (10 ids), v7 FAT (5000 ids), v8..v10 thin
    (0 until 6).foreach(i => appendCommit(i * 10L, 10L))
    appendCommit(100000L, 5000L)
    (0 until 3).foreach(i => appendCommit(200000L + i * 10L, 10L))
    // budget: two thin feeds fit, the fat one never does — derived
    // from the log's own logged sizes so the test is layout-proof
    val sizes = (1L to 10L).map(v => v -> TableLog.feedBytes(spark, root, v)).toMap
    val thinMax = (sizes - 7L).values.max
    val budget = thinMax * 2 + 1
    assert(sizes(7L) > budget,
      s"fat feed ${sizes(7L)} must exceed the budget $budget")
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    val q = spark.readStream
      .format("graft.streaming.TableChangesSourceProvider")
      .option("path", root).option("idCol", "doc_id")
      .option("maxBytesPerTrigger", budget.toString)
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    // exactly-once: every id served exactly once
    val got = spark.read.parquet(out)
    assert(got.count() === 5090L)
    assert(got.select("doc_id").distinct().count() === 5090L)
    // the WAL's end-offset sequence IS the admission record: the
    // trigger crossing v7 must admit v7 ALONE (ends ... 6, 7 ...),
    // while thin commits batch together (some step spans >= 2)
    val ends = new java.io.File(new java.io.File(ckpt), "offsets")
      .listFiles().toSeq
      .filter(_.getName.forall(_.isDigit))
      .sortBy(_.getName.toLong)
      .map { f =>
        import scala.jdk.CollectionConverters._
        val lines = java.nio.file.Files.readAllLines(f.toPath).asScala
          .filter(_.nonEmpty)
        lines.last.trim.toLong // single source: last line is its offset
      }
    val steps = (0L +: ends).sliding(2).map(w => (w(0), w(1))).toSeq
    assert(steps.contains((6L, 7L)),
      s"the fat version must be admitted alone, end sequence was $ends")
    assert(steps.exists(w => w._2 - w._1 >= 2 && w._2 != 7L),
      s"thin commits should batch under the byte budget, ends $ends")
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

  test("Trigger.AvailableNow drains a capped backlog to the launch-time " +
      "fence across bounded triggers, exactly once, and stops — new " +
      "commits after launch wait for the next run") {
    val env = fixture.newEnv()
    env.append(800) // v1..v8: 100 rows each
    // capped at 2 versions/trigger: AvailableNow must still drain the
    // WHOLE pre-launch backlog (4 bounded triggers), then terminate
    val q = env.stream(capped = true).writeStream.format("parquet")
      .option("path", env.outDir)
      .option("checkpointLocation", env.ckptDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000),
        "AvailableNow run did not terminate — fence never reached?")
    def rows() = spark.read.parquet(env.outDir).count()
    def ids() = spark.read.parquet(env.outDir)
      .select("doc_id").distinct().count()
    assert(rows() === 800L && ids() === 800L,
      s"AvailableNow must drain the whole backlog, got ${rows()}")
    // commits landing AFTER the run ended are NOT served until the
    // next explicitly-started run (the fence semantics)…
    env.append(100)
    assert(rows() === 800L)
    // …and that next run serves exactly the delta, no re-serve
    val q2 = env.stream(capped = true).writeStream.format("parquet")
      .option("path", env.outDir)
      .option("checkpointLocation", env.ckptDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(180000), "second AvailableNow run did not terminate")
    assert(rows() === 900L && ids() === 900L,
      s"the second run must serve exactly the new commits, got ${rows()}")
  }

  test("the catalog-named streaming face: option(\"table\") resolves a " +
      "registered tablelog table on BOTH source and sink; a " +
      "non-tablelog name refuses loudly") {
    import spark.implicits._
    val base = Files.createTempDirectory("tablechanges_named")
    val src = base.resolve("s").toString
    val dst = base.resolve("d").toString
    val df = (0L until 50L).map(i => (i, s"r$i")).toDF("doc_id", "text")
    TableLog.commit(spark, src, Nil, Nil) // v0: the (empty) base load
    TableLog.commit(spark, src, TableLog.stageWrite(df, src, "b1"), Nil,
      cdf = TableLog.stageFeed(
        df.select(col("doc_id"), lit("added").as("status")), src, "b1"))
    spark.sql(s"CREATE TABLE named_chg_src USING tablelog LOCATION '$src'")
    spark.sql("CREATE TABLE named_chg_dst (version BIGINT, doc_id BIGINT, " +
      s"status STRING) USING tablelog LOCATION '$dst'")
    val q = spark.readStream
      .format("graft.streaming.TableChangesSourceProvider")
      .option("table", "named_chg_src").option("idCol", "doc_id")
      .load()
      .writeStream.format("tablelog").option("table", "named_chg_dst")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    assert(q.awaitTermination(120000), "named-sink stream did not terminate")
    assert(TableLog.snapshot(spark, dst).count() === 50L)
    assert(spark.table("named_chg_dst").count() === 50L,
      "the sink's commits must be visible through the name read too")
    // a non-tablelog name refuses loudly rather than streaming a
    // foreign directory as if it were a log
    spark.sql("CREATE TABLE named_chg_plain (a INT) USING parquet " +
      s"LOCATION '${base.resolve("p")}'")
    val e = intercept[Exception] {
      val qq = spark.readStream
        .format("graft.streaming.TableChangesSourceProvider")
        .option("table", "named_chg_plain").load()
        .writeStream.format("parquet")
        .option("path", base.resolve("pout").toString)
        .option("checkpointLocation", base.resolve("pckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      qq.awaitTermination(120000)
      qq.exception.foreach(throw _)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("not a tablelog table"), msgs)
    Seq("named_chg_src", "named_chg_dst", "named_chg_plain")
      .foreach(t => spark.sql(s"DROP TABLE $t"))
  }
}
