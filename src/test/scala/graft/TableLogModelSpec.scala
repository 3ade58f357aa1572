package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLog

/** MODEL-BASED check of the table format's replay semantics: seeded
  * random sequences of the mutating operations run against BOTH the
  * real log and a trivial in-memory model (a Map the operation's
  * documented semantics update directly). After every op the live
  * snapshot must equal the model; at the end, EVERY recorded version
  * must time-travel back to exactly the state the model held when
  * that version was committed — one property covering the
  * interactions (deletes folded by compaction, restore resetting
  * sidecar state, truncate + time travel, schema widening over old
  * versions, zone-mapped vs plain appends) that example-based specs
  * cover only pairwise. Seeds are FIXED: failures reproduce. */
class TableLogModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runSequence(seed: Long, nOps: Int): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory(s"graft_model_$seed").toString + "/t"

    var cur = Map.empty[Long, Long] // id -> v (the model)
    var sidecars = false            // delete sidecars in force
    var nextId = 0L
    var nextCol = 0
    val histByVersion = mutable.Map.empty[Long, (Map[Long, Long], Boolean)]
    val opLog = mutable.ArrayBuffer.empty[String]

    def df(rows: Seq[(Long, Long)]) = rows.toDF("id", "v").coalesce(1)
    def head: Long = TableLog.versions(spark, root).last
    def record(): Unit = { histByVersion(head) = (cur, sidecars) }

    def appendOp(): Unit = {
      val n = 1 + rnd.nextInt(40)
      val rows = (nextId until nextId + n).map(i => (i, i * 7L))
      nextId += n
      if (rnd.nextBoolean()) {
        val (f, zm) = TableLog.stageWithZoneMap(df(rows), root,
          s"a$nextId", "id", 1 + rnd.nextInt(3))
        TableLog.commit(spark, root, f, Nil, zmap = zm)
      } else
        TableLog.commit(spark, root,
          TableLog.stageWrite(df(rows), root, s"a$nextId"), Nil)
      cur = cur ++ rows
      opLog += s"append($n)"
    }

    // first op is always an append so every later op has a table
    appendOp(); record()

    (1 until nOps).foreach { _ =>
      val choice = rnd.nextInt(100)
      if (choice < 30) appendOp()
      else if (choice < 45 && cur.nonEmpty) {
        // sidecar deletes of a random sample of live ids
        val ids = rnd.shuffle(cur.keys.toSeq).take(1 + rnd.nextInt(8))
        TableLog.commitDeletes(ids.toDF("id"), root, s"d$nextId")
        cur = cur -- ids
        sidecars = true
        opLog += s"commitDeletes(${ids.size})"
      } else if (choice < 60 && cur.nonEmpty) {
        TableLog.compactTable(spark, root, "id", s"c$nextId")
        sidecars = false
        opLog += "compact"
      } else if (choice < 75 && !sidecars) {
        // range purge; may be a NO-OP commit-wise when nothing
        // intersects (deleteWhere returns the current version)
        val lo = rnd.nextLong(math.max(1L, nextId))
        val hi = lo + rnd.nextInt(50)
        val before = head
        TableLog.deleteWhere(spark, root, "id", lo, hi,
          s"p$nextId", parts = 2)
        cur = cur.filter { case (id, _) => id < lo || id > hi }
        opLog += (if (head == before) s"deleteWhere($lo,$hi,noop)"
                  else s"deleteWhere($lo,$hi)")
      } else if (choice < 85) {
        TableLog.truncateTable(spark, root)
        cur = Map.empty
        sidecars = false
        opLog += "truncate"
      } else if (choice < 95 && histByVersion.nonEmpty) {
        val v = rnd.shuffle(histByVersion.keys.toSeq).head
        TableLog.restoreTable(spark, root, v)
        val (st, sc) = histByVersion(v)
        cur = st; sidecars = sc
        opLog += s"restore($v)"
      } else {
        // metadata-only schema widening: must not disturb row reads,
        // at the head or via time travel below
        nextCol += 1
        TableLog.addColumns(spark, root,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              s"extra$nextCol", org.apache.spark.sql.types.StringType))))
        opLog += "addColumns"
      }
      record()

      val got = TableLog.snapshot(spark, root, None, Some("id"))
        .select(col("id"), col("v")).as[(Long, Long)].collect().toMap
      assert(got === cur,
        s"seed=$seed live snapshot diverged after: ${opLog.mkString(" -> ")}")
    }

    // TIME TRAVEL: every recorded version must replay to the state
    // the model held when it was committed
    histByVersion.toSeq.sortBy(_._1).foreach { case (v, (st, _)) =>
      val got = TableLog.snapshot(spark, root, Some(v), Some("id"))
        .select(col("id"), col("v")).as[(Long, Long)].collect().toMap
      assert(got === st,
        s"seed=$seed version $v time travel diverged; ops: ${opLog.mkString(" -> ")}")
    }
  }

  test("seeded random op sequences: live snapshot and every version's " +
      "time travel match the in-memory model (seed 41)") {
    runSequence(41L, 18)
  }
  test("seeded random op sequences: live snapshot and every version's " +
      "time travel match the in-memory model (seed 1337)") {
    runSequence(1337L, 18)
  }
  test("seeded random op sequences: live snapshot and every version's " +
      "time travel match the in-memory model (seed 20260816)") {
    runSequence(20260816L, 18)
  }
}
