package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Pagination}
import graft.sources.Tables

/** Storage-layout operators: Z-order clustering (q99) and the
  * page-serving index (q100). The point of both is SKIPPING — so the
  * tests assert actual file/partition reads, not just row equality. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
    case q: QueryStageExec => findScans(q.plan)
    case r: ReusedExchangeExec => findScans(r.child)
    case f: FileSourceScanExec => Seq(f)
    case o => (o.children ++ o.subqueries).flatMap(findScans)
  }

  test("zValue interleaves bits exactly (scalar cross-check)") {
    import spark.implicits._
    // x=5 (101b) in even bits, y=3 (011b) in odd bits:
    // z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 b = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
    assert(df.head().getLong(0) === 27L)
    // round-trip: de-interleaving even/odd bits recovers the inputs
    val r = new scala.util.Random(7)
    val pts = Seq.fill(50)((r.nextInt(1 << 16).toLong, r.nextInt(1 << 16).toLong))
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16).as("z"))
      .collect()
    zs.foreach { row =>
      val (x, y, z) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val xb = (0 until 16).map(i => ((z >>> (2 * i)) & 1L) << i).reduce(_ | _)
      val yb = (0 until 16).map(i => ((z >>> (2 * i + 1)) & 1L) << i).reduce(_ | _)
      assert(xb === x && yb === y, s"z=$z does not round-trip ($x,$y)")
    }
  }

  test("zorderStats buckets tile the data and rectangles are tight") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_partkey"), col("l_suppkey"))
    val stats = Layout.zorderStats(li, "l_partkey", "l_suppkey").collect()
    assert(stats.map(_.getAs[Long]("cnt")).sum === li.count(), "buckets must tile all rows")
    val (pLo, pHi) = (stats.map(_.getAs[Long]("l_partkey_min")).min,
      stats.map(_.getAs[Long]("l_partkey_max")).max)
    // structural tightness: a Z-prefix bucket at prefixBits=4 spans at
    // most 1/16 of the quantized range per dimension (+1 for the cell
    // boundary landing mid-integer)
    val maxSpan = (pHi - pLo + 1) / 16 + 1
    stats.foreach { r =>
      val span = r.getAs[Long]("l_partkey_max") - r.getAs[Long]("l_partkey_min")
      assert(span <= maxSpan,
        s"bucket ${r.getAs[Long]("zbucket")} spans $span > $maxSpan in l_partkey")
    }
  }

  test("writeZBucketed layout prunes 2-D box queries to candidate dirs, result exact") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val dir = Files.createTempDirectory("graft_zorder").toString
    val (xlo, xhi, ylo, yhi) = Layout.writeZBucketed(li, "l_partkey", "l_suppkey", dir)
    // a box covering ~1/4 × 1/4 of each dimension
    val (qx0, qx1) = (xlo + (xhi - xlo) / 2, xlo + 3 * (xhi - xlo) / 4)
    val (qy0, qy1) = (ylo + (yhi - ylo) / 4, ylo + (yhi - ylo) / 2)
    val cands = Layout.zBucketsForBox(qx0, qx1, qy0, qy1, xlo, xhi, ylo, yhi)
    assert(cands.size < 256, "candidate set must prune some of the 256 buckets")
    val boxPred = col("l_partkey").between(qx0, qx1) &&
      col("l_suppkey").between(qy0, qy1)
    val pruned = spark.read.parquet(dir)
      .filter(col("zbucket").isin(cands: _*)).filter(boxPred)
    val expected = li.filter(boxPred)
    assert(pruned.count() === expected.count(), "pruned box result lost rows")
    assert(pruned.drop("zbucket").exceptAll(expected).count() === 0)
    // the scan must actually read ONLY candidate directories
    pruned.collect()
    val scan = findScans(pruned.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no file scan in pruned plan"))
    val partitionsRead = scan.metrics("numPartitions").value
    val allBuckets = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("zbucket="))
    info(s"box query read $partitionsRead of $allBuckets bucket dirs " +
      s"(candidates: ${cands.size})")
    assert(partitionsRead <= cands.size, "scan read beyond the candidate buckets")
    assert(partitionsRead < allBuckets, "scan read every bucket — no pruning")
  }

  test("pagedFromIndex output is identical to the protocol drain (stitched)") {
    val frame = Tables.events(spark, TestSpark.sf)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft_pageidx").toString
    Pagination.buildPageIndex(frame, "event_id", bucketRows = 100L, path = dir)
    val fromIndex = Pagination.pagedFromIndex(spark, dir, "event_id",
      Seq("event_id", "user_id", "event_type", "value"), pageSize = 40, pages = 5)
    val protocol = Pagination.stitched(frame, Seq("event_id"),
      pageSize = 40, pages = Some(5))
    assert(fromIndex.count() === protocol.count())
    assert(fromIndex.exceptAll(protocol).count() === 0)
    assert(protocol.exceptAll(fromIndex).count() === 0)
  }

  test("pagedFromIndex reads O(bucket) dirs per page, not the suffix") {
    import spark.implicits._
    // 997 non-dense keys / bucketRows=100 → 10 bucket dirs
    val keys = new scala.util.Random(11).shuffle((1 to 997).map(_ * 7L)).toSeq
    val frame = keys.toDF("k").withColumn("v", col("k") * 2)
    val dir = Files.createTempDirectory("graft_pageidx2").toString
    Pagination.buildPageIndex(frame, "k", bucketRows = 100L, path = dir)
    val allBuckets = new java.io.File(s"$dir/data").listFiles()
      .count(_.getName.startsWith("pbucket="))
    assert(allBuckets > 3, s"need >3 buckets for a meaningful pruning proof, got $allBuckets")
    // the full drained output is still exact...
    val drained = Pagination.pagedFromIndex(spark, dir, "k", Seq("k", "v"),
      pageSize = 40, pages = 1000)
    assert(drained.select("k", "v").exceptAll(frame).count() === 0)
    assert(drained.count() === 997L)
    // ...and a mid-drain page's scan (cursor inside bucket 0, zone-map
    // selection = buckets {0, 1}) reads exactly those two directories
    val cursor = keys.sorted.apply(79)
    val page = spark.read.parquet(s"$dir/data")
      .filter(col("pbucket").isin(0L, 1L) && col("k") > cursor)
      .orderBy(col("k")).limit(40)
    page.collect()
    val scan = findScans(page.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no file scan in page plan"))
    val partitionsRead = scan.metrics("numPartitions").value
    info(s"page read $partitionsRead of $allBuckets bucket dirs")
    assert(partitionsRead <= 2, s"page read $partitionsRead dirs — selection not O(bucket)")
    // the manifest math that makes {0,1} sufficient: fixed occupancy
    val m0rows = spark.read.parquet(s"$dir/manifest")
      .filter(col("pbucket") === 0).head().getAs[Long]("rows")
    assert(m0rows === 100L, "fixed-occupancy invariant broken")
  }

  test("pagedFromIndex collects only the manifest prefix the drain can touch") {
    import spark.implicits._
    // 5000 rows / bucketRows=50 → 100 bucket dirs: a manifest big
    // enough that an unbounded collect would be visibly larger than
    // the drain's needs
    val frame = (1L to 5000L).toDF("k").withColumn("v", col("k") + 1)
    val dir = Files.createTempDirectory("graft_pageidx3").toString
    Pagination.buildPageIndex(frame, "k", bucketRows = 50L, path = dir)
    val nBuckets = new java.io.File(s"$dir/data").listFiles()
      .count(_.getName.startsWith("pbucket="))
    assert(nBuckets === 100, s"expected 100 buckets, got $nBuckets")
    // a 2-page × 40-row drain needs rows 1..80 → buckets 0 and 1;
    // the bounded collect must stay O(pages), not O(#buckets)
    val m = Pagination.boundedManifest(spark, dir, needRows = 80L)
    assert(m.length <= 4,
      s"manifest collect not bounded by the drain: ${m.length} of $nBuckets rows")
    assert(m.map(_._1).toSeq === m.map(_._1).toSeq.sorted, "manifest prefix unsorted")
    // and the drain the bound feeds is still exact
    val out = Pagination.pagedFromIndex(spark, dir, "k", Seq("k", "v"),
      pageSize = 40, pages = 2)
    assert(out.count() === 80L)
    assert(out.agg(max(col("k"))).head().getLong(0) === 80L)
    assert(out.filter(col("v") =!= col("k") + 1).count() === 0L)
    // CURSOR-RESUMED drain: the bound anchors at the cursor's bucket
    // (not bucket 0 — the old prefix bound would filter out every
    // bucket a deep resume touches and pages would come back short)
    val cursor = 3210L // inside bucket 64 (rows 3201..3250)
    val mc = Pagination.boundedManifest(spark, dir, needRows = 80L,
      cursor = Some(cursor))
    assert(mc.nonEmpty && mc.map(_._1).min === 64L,
      s"cursor bound must anchor at bucket 64, got ${mc.map(_._1).toSeq}")
    assert(mc.length <= 4,
      s"cursor-anchored collect not bounded by the drain: ${mc.length}")
    val resumed = Pagination.pagedFromIndex(spark, dir, "k", Seq("k", "v"),
      pageSize = 40, pages = 2, startAfter = Some(cursor))
    assert(resumed.count() === 80L, "resumed pages must come back FULL")
    val ks = resumed.select("k").collect().map(_.getLong(0)).sorted
    assert(ks.head === 3211L && ks.last === 3290L,
      s"resumed drain must serve exactly the 80 rows past the cursor")
    // resuming past the last key is an empty drain, not an error
    assert(Pagination.pagedFromIndex(spark, dir, "k", Seq("k", "v"),
      pageSize = 40, pages = 2, startAfter = Some(99999L)).count() === 0L)
  }

  test("writeGsi probes read only the matching key directories") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_gsi").toString
    Layout.writeGsi(docs, dir, "source", "lang")
    val srcDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("source="))
    val allLeaves = srcDirs.map(sd =>
      sd.listFiles().count(_.getName.startsWith("lang="))).sum
    assert(allLeaves > 10, s"need many key dirs for a pruning proof, got $allLeaves")
    val probe = spark.read.parquet(dir)
      .filter(col("source").isin("src1", "src3") && col("lang") === "en")
    // the layout is invisible: probe ≡ the same predicate on the base
    val base = docs.filter(col("source").isin("src1", "src3") && col("lang") === "en")
    assert(probe.select("doc_id").exceptAll(base.select("doc_id")).count() === 0)
    assert(probe.count() === base.count())
    // ...and the scan touched only the ≤ 2 matching leaf directories
    val scan = findScans(probe.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no file scan in GSI probe plan"))
    probe.collect()
    val partitionsRead = scan.metrics("numPartitions").value
    info(s"GSI probe read $partitionsRead of $allLeaves key dirs")
    assert(partitionsRead <= 2, s"probe read $partitionsRead dirs — GSI not pruning")
  }

  test("compact bin-packs small files, preserves content, and buys file skipping") {
    val events = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val smallDir = Files.createTempDirectory("graft_small").toString
    val bigDir = Files.createTempDirectory("graft_compacted").toString
    // the streaming-ingestion pathology: 64 files, each spanning the
    // whole key range (round-robin repartition)
    events.repartition(64).write.mode("overwrite").parquet(smallDir)
    val probe = spark.read.parquet(smallDir)
    val perFile = probe.select(input_file_name().as("f"), col("event_id"))
      .groupBy("f").agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect()
    assert(perFile.length === 64)
    // match compact's hadoop listing: skip _SUCCESS AND the local-fs
    // .crc shadow files java.io.File sees but FileSystem hides
    val bytes = new java.io.File(smallDir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum
    val (before, after, measured) =
      Layout.compact(spark, smallDir, bigDir, "event_id", targetBytes = bytes / 4)
    assert(before === 64)
    assert(after <= 6, s"expected ~4-5 outputs, got $after") // ceil + range split slack
    assert(measured === bytes)
    // content identical
    val out = spark.read.parquet(bigDir)
    assert(out.count() === events.count())
    assert(out.exceptAll(events).count() === 0)
    assert(events.exceptAll(out).count() === 0)
    // re-clustering: output files cover DISJOINT key ranges where every
    // small file spanned ~the whole space
    val outRanges = out.select(input_file_name().as("f"), col("event_id"))
      .groupBy("f").agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
    outRanges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "output key ranges overlap")
      case _ =>
    }
    // and that buys skipping: a narrow key predicate's matching rows
    // live in ≤ 2 compacted files (zone stats let a reader skip the
    // rest), where the small-file layout smears them over ~every file
    // (nothing is skippable). input_file_name() measures exactly the
    // file set a min/max-pruning reader must touch.
    val (kLo, kHi) = (outRanges.head._1, outRanges.head._2)
    val pred = col("event_id").between(kLo, (kLo + kHi) / 2)
    val compactedTouched = out.filter(pred)
      .select(input_file_name()).distinct().count()
    val smallTouched = probe.filter(pred)
      .select(input_file_name()).distinct().count()
    info(s"narrow predicate: rows live in $compactedTouched of $after compacted files " +
      s"vs $smallTouched of 64 small files")
    assert(compactedTouched <= 2,
      s"compacted layout smears the narrow range over $compactedTouched files")
    assert(smallTouched > after,
      "small-file layout unexpectedly already clustered — test premise broken")
  }

  test("buildPageIndex is deterministic and bucket occupancy is fixed") {
    import spark.implicits._
    // non-dense, shuffled keys: occupancy must come from RANK, not key
    // arithmetic
    val keys = new scala.util.Random(3).shuffle((1 to 997).map(_ * 7L)).toSeq
    val df = keys.toDF("k").withColumn("v", col("k") * 2)
    val d1 = Files.createTempDirectory("graft_pidx_a").toString
    val d2 = Files.createTempDirectory("graft_pidx_b").toString
    Pagination.buildPageIndex(df, "k", bucketRows = 100L, path = d1, parts = 7)
    Pagination.buildPageIndex(df, "k", bucketRows = 100L, path = d2, parts = 3)
    val m1 = spark.read.parquet(s"$d1/manifest").orderBy("pbucket").collect()
    val m2 = spark.read.parquet(s"$d2/manifest").orderBy("pbucket").collect()
    assert(m1.toSeq === m2.toSeq,
      "manifest must not depend on the staging partition count")
    assert(m1.init.forall(_.getAs[Long]("rows") === 100L), "non-final buckets must hold exactly bucketRows")
    assert(m1.last.getAs[Long]("rows") === 997L % 100L)
    // zone map is ordered and disjoint
    val zones = m1.map(r => (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
    zones.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, "bucket key ranges must be disjoint and ordered")
    }
  }
}
