package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** What a concrete streaming-source binding provides to run the
  * contract: an isolated environment that can append uniquely-id'd
  * records to the external system and build a streaming reader over
  * it. The contract itself ([[StreamSourceContract]]) is
  * binding-agnostic — a Kafka/Kinesis drop-in implements THIS trait
  * (append = produce to a test topic; stream = readStream over the
  * topic with maxOffsetsPerTrigger) and inherits every test
  * unchanged. */
trait SourceContractEnv {
  /** Append `n` new records with ids continuing from the last append
    * (globally unique longs starting at 0). */
  def append(n: Int): Unit
  /** Records appended so far. */
  def appended: Long
  /** Streaming DataFrame over the environment. `capped = true` must
    * bound per-trigger admission tightly enough that draining 1000
    * records takes more than 3 micro-batches. */
  def stream(capped: Boolean): DataFrame
  /** Column holding the unique record id. */
  def idCol: String
  /** Scratch dirs owned by the environment (fresh per newEnv). */
  def ckptDir: String
  def outDir: String
}

trait SourceContractFixture {
  def sourceName: String
  def newEnv(): SourceContractEnv
}

/** The micro-batch source contract — the engine-visible properties
  * JsonlSourceSpec proves for the jsonl binding, extracted so ANY
  * future Source binding (Kafka, Kinesis, a queue) can be dropped in
  * and verified identically the day its client library resolves:
  *
  *  1. exactly-once coverage under byte/record-capped admission
  *     control (the backlog splits into several micro-batches, no
  *     loss, no duplicates);
  *  2. exact mid-backlog checkpoint resume (a stopped query continues
  *     from the WAL offset, never from zero, never re-serving);
  *  3. replay determinism (an idle restart on the same checkpoint
  *     emits nothing new).
  *
  * Offset-encoding edge cases (shrunk/deleted inputs, retire bounds)
  * stay with each binding's own spec — they depend on the offset
  * type. */
trait StreamSourceContract { this: AnyFunSuite =>
  def spark: SparkSession
  def fixture: SourceContractFixture

  private def run(env: SourceContractEnv, capped: Boolean,
                  once: Boolean): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = env.stream(capped).writeStream.format("parquet")
      .option("path", env.outDir)
      .option("checkpointLocation", env.ckptDir)
      .outputMode("append")
      .pipe(w => if (once) w.trigger(Trigger.Once()) else w)
      .start()
    if (once) q.awaitTermination(120000) else { q.processAllAvailable(); q.stop() }
    q
  }

  private implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  private def distinctIds(env: SourceContractEnv): Long =
    spark.read.parquet(env.outDir).select(env.idCol).distinct().count()

  private def rows(env: SourceContractEnv): Long =
    spark.read.parquet(env.outDir).count()

  test(s"${fixture.sourceName} contract: capped drain is exactly-once across >3 micro-batches") {
    val env = fixture.newEnv()
    env.append(1000)
    val q = run(env, capped = true, once = false)
    assert(rows(env) === 1000, "loss or duplication under admission control")
    assert(distinctIds(env) === 1000, "duplicate ids under admission control")
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches > 3, s"cap did not split the backlog: $batches batches")
  }

  test(s"${fixture.sourceName} contract: checkpoint resume continues mid-backlog without loss or dup") {
    val env = fixture.newEnv()
    env.append(1000)
    run(env, capped = true, once = true)
    val c1 = rows(env)
    assert(c1 > 0 && c1 < 1000, s"first capped run should stop mid-backlog, got $c1")
    run(env, capped = true, once = true)
    val c2 = rows(env)
    assert(c2 > c1 && c2 < 1000, s"second run must RESUME (not restart), got $c2 after $c1")
    env.append(500)
    run(env, capped = false, once = false)
    assert(rows(env) === 1500, "full drain across 3 restarts must cover every record once")
    assert(distinctIds(env) === 1500)
  }

  test(s"${fixture.sourceName} contract: idle restart on the same checkpoint re-serves nothing") {
    val env = fixture.newEnv()
    env.append(200)
    run(env, capped = false, once = false)
    assert(rows(env) === 200)
    run(env, capped = false, once = false) // no new data arrived
    assert(rows(env) === 200, "idle restart replayed already-committed offsets")
  }

  test(s"${fixture.sourceName} contract: exactly-once across a caught-up " +
      "batch boundary (full drain, append, drain again — the first " +
      "record appended after a drain is the classic boundary drop)") {
    val env = fixture.newEnv()
    env.append(300)
    run(env, capped = false, once = false)
    assert(rows(env) === 300)
    env.append(100) // resumes exactly at the caught-up boundary offset
    run(env, capped = false, once = false)
    assert(rows(env) === 400,
      s"the caught-up-boundary resume lost records: ${rows(env)}")
    assert(distinctIds(env) === 400)
  }

  test(s"${fixture.sourceName} contract: Trigger.AvailableNow under " +
      "admission caps drains the whole pre-launch backlog to the " +
      "launch-time fence and stops; the next run serves exactly the delta") {
    val env = fixture.newEnv()
    env.append(1000)
    def availableNow(): Unit = {
      val q = env.stream(capped = true).writeStream.format("parquet")
        .option("path", env.outDir)
        .option("checkpointLocation", env.ckptDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000),
        "AvailableNow run did not terminate — fence never reached?")
    }
    availableNow()
    assert(rows(env) === 1000 && distinctIds(env) === 1000,
      s"a capped AvailableNow run must drain to the launch fence, got ${rows(env)}")
    env.append(200)
    assert(rows(env) === 1000,
      "records appended after the run must wait for the next run")
    availableNow()
    assert(rows(env) === 1200 && distinctIds(env) === 1200,
      s"the second run must serve exactly the delta, got ${rows(env)}")
  }
}
