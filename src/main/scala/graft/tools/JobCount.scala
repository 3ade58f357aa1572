package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Measurement tool (optimization rounds only, never part of the
  * driver contract): runs each query once through the noop sink and
  * prints how many Spark JOBS and STAGES it submitted plus its wall
  * time. At small scale factors most of the bench total is
  * stage-scheduling floor, so #stages × stage-floor ≈ cost — this is
  * the profile that says WHICH queries pay a fixed overhead far above
  * their data size (guide §1.1: decide where the time goes first).
  *
  * Usage: JobCount <sfDir> [namePrefixFilter]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val filter = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try {
        if (t == "events") Tables.events(spark, sfDir).count()
        else Tables.load(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    }
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    var totJ = 0; var totS = 0; var totSec = 0.0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (filter.forall(name.startsWith)) {
        try {
          // run 1 warms per-query setup fixtures (and JIT); run 2 is
          // the number the bench's min-of-3 actually measures
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          jobs.set(0); stages.set(0); tasks.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          // listener events are async; give the bus a beat to drain
          // (private listenerBus — a bounded sleep is enough for a
          // measurement tool; counts are stable ±1 at these scales)
          Thread.sleep(150)
          totJ += jobs.get(); totS += stages.get(); totSec += sec
          println(f"$name%-28s $sec%7.2f ${jobs.get()}%5d ${stages.get()}%7d ${tasks.get()}%6d")
        } catch {
          case e: Throwable => println(f"$name%-28s FAILED: ${e.toString.take(120)}")
        }
      }
    }
    println(f"TOTAL sec=$totSec%.1f jobs=$totJ stages=$totS")
    spark.stop()
  }
}
