package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the part of a 100 TB pipeline that
  * decides how bytes sit on disk so that QUERIES can skip them.
  * Spark's scan-side pruning (partition pruning, parquet row-group
  * min/max) only pays off when the write side clustered related rows
  * together; these operators produce those clusterings:
  *
  *  - [[zValue]]/[[zorderStats]]: multi-dimensional clustering by
  *    bit-interleaved Z-order (Morton order) — the standard answer
  *    when queries filter boxes over TWO dimensions and a single-key
  *    sort can only serve one of them (reference analog: the
  *    two-attribute access patterns of web_api.py's
  *    genre+year filtering, re-expressed as a layout problem);
  *  - [[writeZBucketed]]: materialize the clustering as a
  *    partitioned layout whose directories a 2-D box query prunes
  *    (LayoutSpec proves the skipped files are never read).
  *
  * Everything is integer arithmetic on deterministic quantization —
  * no RNG, no floats — so the DuckDB oracle replays the exact layout
  * (q99) and the pruning proof needs no tolerance. */
object Layout {

  /** Quantize `v` into [0, 2^bits) by integer arithmetic over the
    * CLOSED range [lo, hi]: ((v - lo) * 2^bits) div (hi - lo + 1) —
    * INTEGRAL division (`div`, DuckDB `//`), not double `/`, so the
    * oracle replay is exact with no float-rounding edge at integer
    * quotients. Monotone, so range predicates on `v` translate to
    * range predicates on the quantized value. */
  def quantize(v: Column, lo: Column, hi: Column, bits: Int): Column =
    call_function("div", (v - lo) * lit(1L << bits), hi - lo + lit(1L))

  /** Bit-interleaved Z-value (Morton code) of two already-quantized
    * non-negative coordinates: bit i of `x` lands at position 2i, bit
    * i of `y` at 2i+1. Composed from codegen'd bit functions (stays
    * inside whole-stage codegen; 2·bits OR-terms), NOT a UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-order layout audit (q99): quantize two dimensions to `bits`
    * bits each over their true min/max (one tiny aggregate,
    * broadcast-joined back), compute the interleaved Z-value, and
    * group rows into the 2^(2·prefixBits) Z-prefix buckets a
    * partitioned writer would use. The output is the layout's ZONE
    * MAP: per bucket, the row count and the tight min/max rectangle
    * in the ORIGINAL coordinates — tight rectangles are the whole
    * point, because scan pruning can only skip a file whose zone is
    * disjoint from the query box. Each bucket covers exactly a
    * 2^-prefixBits × 2^-prefixBits fraction of the quantized space,
    * so rectangle tightness is a structural guarantee, not a data
    * accident.
    *
    * Scale shape: one scan + one ≤ 4^prefixBits-group aggregate; the
    * min/max prepass is a 1-row broadcast. The same expression
    * ordered by the FULL z-value is the 100 TB writer's sort key
    * (repartitionByRange(z) → files = contiguous z-runs). */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int = 16, prefixBits: Int = 4): DataFrame = {
    // one bounded 1-row collect, inlined as literals: keeps the main
    // plan a pure scan → project → aggregate (no 1-row cross join for
    // the plan-hygiene guard to squint at) and constant-folds the
    // quantization denominators inside codegen
    val r = df.agg(min(col(xCol)), max(col(xCol)),
      min(col(yCol)), max(col(yCol))).head()
    val (xlo, xhi, ylo, yhi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z = zValue(
      quantize(col(xCol), lit(xlo), lit(xhi), bits),
      quantize(col(yCol), lit(ylo), lit(yhi), bits), bits)
    df.withColumn("zbucket", shiftrightunsigned(z, 2 * (bits - prefixBits)))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(xCol)).as(s"${xCol}_min"), max(col(xCol)).as(s"${xCol}_max"),
        min(col(yCol)).as(s"${yCol}_min"), max(col(yCol)).as(s"${yCol}_max"))
      .orderBy(col("zbucket"))
  }

  /** Materialize the Z-clustering as a directory-partitioned layout:
    * one `zbucket=N` directory per Z-prefix bucket. A 2-D box query
    * computes its candidate buckets by enumerating the quantized
    * prefix rectangle (≤ 2^2·prefixBits driver-side ints — the
    * classic Z-range decomposition bounded to the prefix level) and
    * prunes every other directory at the source listing. Returns the
    * (xlo, xhi, ylo, yhi) range used, so callers quantize query
    * boxes identically. */
  def writeZBucketed(df: DataFrame, xCol: String, yCol: String, path: String,
                     bits: Int = 16, prefixBits: Int = 4): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol)))
      .head()
    val (xlo, xhi, ylo, yhi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z = zValue(
      quantize(col(xCol), lit(xlo), lit(xhi), bits),
      quantize(col(yCol), lit(ylo), lit(yhi), bits), bits)
    df.withColumn("zbucket", shiftrightunsigned(z, 2 * (bits - prefixBits)))
      .write.partitionBy("zbucket").mode("overwrite").parquet(path)
    (xlo, xhi, ylo, yhi)
  }

  /** The candidate `zbucket` ids intersecting the box
    * [qxlo, qxhi] × [qylo, qyhi] (original coordinates), for a layout
    * written by [[writeZBucketed]] over ranges (xlo..xhi, ylo..yhi):
    * quantize the box corners with the SAME integer rule, keep the
    * top `prefixBits` of each, and enumerate the prefix rectangle.
    * Driver-side, ≤ 4^prefixBits ints — bounded by construction. */
  def zBucketsForBox(qxlo: Long, qxhi: Long, qylo: Long, qyhi: Long,
                     xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                     bits: Int = 16, prefixBits: Int = 4): Seq[Long] = {
    def q(v: Long, lo: Long, hi: Long): Long =
      ((v - lo) * (1L << bits)) / (hi - lo + 1L)
    def prefix(v: Long): Long = v >>> (bits - prefixBits)
    def interleave(x: Long, y: Long): Long =
      (0 until prefixBits).map { i =>
        (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val (px0, px1) = (prefix(q(qxlo max xlo, xlo, xhi)), prefix(q(qxhi min xhi, xlo, xhi)))
    val (py0, py1) = (prefix(q(qylo max ylo, ylo, yhi)), prefix(q(qyhi min yhi, ylo, yhi)))
    for (px <- px0 to px1; py <- py0 to py1) yield interleave(px, py)
  }

  /** Materialize a GLOBAL SECONDARY INDEX layout: the table rewritten
    * partitioned by the index key columns, one directory per key
    * combination — the warehouse form of the reference's DynamoDB GSI
    * (`source:<s>:genre:<g>` → title ids, consumer.py's inverted
    * index; web_api.py's per-preference Query reads it key by key).
    * A probe filtering on the index keys then prunes every other
    * directory at source listing, reading O(matching keys) bytes of a
    * 100 TB table, exactly as DynamoDB's Query reads one key's item
    * collection. One clustering shuffle at write (repartition on the
    * keys so each directory gets few, large files instead of one
    * file per upstream task); probes are free of any shuffle.
    *
    * Key cardinality must be directory-sane (the GSI contract: probe
    * keys, not unique ids — q100's page index is the layout for
    * high-cardinality keyset access). */
  def writeGsi(df: DataFrame, path: String, keys: String*): Unit =
    df.repartition(keys.map(col): _*)
      .write.partitionBy(keys: _*).mode("overwrite").parquet(path)

  /** INCREMENTAL GSI maintenance — upsert a batch of rows into a
    * [[writeGsi]] layout touching ONLY the key directories the batch
    * lands in (the GSI sibling of the IVF-cell delta
    * ([[Similarity]].applyIndexDelta) and the page-index append
    * ([[Pagination]].appendToPageIndex)): the reference's consumer
    * keeps its DynamoDB inverted index current per item
    * (consumer.py's per-event index put); a warehouse GSI must absorb
    * the same deltas without rewriting the other 10,000 directories.
    *
    * Plan: the batch's distinct key combinations (driver-bounded by
    * the GSI contract — probe keys, not ids) select the touched
    * directories; ONLY those are read back (partition-pruned scan),
    * merged with the batch id-wise (batch wins on conflict), and
    * rewritten via dynamic partition overwrite. O(batch + touched
    * dirs) regardless of table size; untouched directories stay
    * byte-identical; replaying the same batch is a no-op rewrite of
    * the same content (idempotent crash recovery). */
  def upsertIntoGsi(delta: DataFrame, path: String, idCol: String,
                    keys: String*): Unit = {
    val spark = delta.sparkSession
    val touched = delta.select(keys.map(col): _*).distinct().collect()
    if (touched.isEmpty) return
    // Read back ONLY the touched directories, with a plan that stays
    // small however many key combinations the batch carries:
    //  - static partition pruning via per-COLUMN value sets — one
    //    In/InSet node per key column (O(distinct values per column)),
    //    never the OR-of-ANDs combination tree a thousand-combo delta
    //    would explode into (optimizer blowup long before memory);
    //  - the per-column product may over-select directories whose
    //    exact combination the batch does NOT touch — those rows must
    //    not enter the rewrite (dynamic overwrite would rewrite their
    //    dirs and break untouched-dir immutability), so a broadcast
    //    left-semi join on the touched-keys frame (null-safe, O(1)
    //    plan size) restores exact combo membership.
    val existing = touchedReadBack(spark, path, touched, delta, keys)
      .select(delta.columns.map(col): _*) // partition cols reorder on read
    val merged = existing.withColumn("__pri", lit(0))
      .unionByName(delta.withColumn("__pri", lit(1)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("__pri").desc)))
      .filter(col("__rn") === 1).drop("__pri", "__rn")
    // dynamic overwrite scoped to THIS write via the per-writer
    // option — never a session-conf mutation (racy under concurrency)
    merged.repartition(keys.map(col): _*)
      .write.option("partitionOverwriteMode", "dynamic")
      .partitionBy(keys: _*).mode("overwrite").parquet(path)
  }

  /** The touched-directory read-back of [[upsertIntoGsi]], exposed
    * package-visibly so the plan-size contract is spec-testable. */
  private[graft] def touchedReadBack(
      spark: org.apache.spark.sql.SparkSession, path: String,
      touched: Array[org.apache.spark.sql.Row], delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val perColPrune = keys.zipWithIndex.map { case (k, i) =>
      val vals = touched.map(_.get(i)).distinct.toSeq
      val nonNull = vals.filter(_ != null)
      val in = if (nonNull.isEmpty) lit(false) else col(k).isin(nonNull: _*)
      if (vals.contains(null)) col(k).isNull || in else in
    }.reduce(_ && _)
    // the semi-join's build side is the ALREADY-COLLECTED combo set —
    // re-deriving it from delta would run the (possibly expensive)
    // delta lineage a second time, and a non-deterministic delta could
    // diverge from the prune predicate built above (rows surviving the
    // join in dirs the prune excluded → dynamic overwrite dropping
    // their neighbors). One collected array, one truth.
    val keySchema = org.apache.spark.sql.types.StructType(
      keys.map(k => delta.schema(k)))
    val touchedKeys = spark.createDataFrame(
      java.util.Arrays.asList(touched: _*), keySchema)
      .toDF(keys.map(k => s"__tk_$k"): _*)
    val combo = keys.map(k => col(k) <=> col(s"__tk_$k")).reduce(_ && _)
    spark.read.parquet(path).filter(perColPrune)
      .join(broadcast(touchedKeys), combo, "left_semi")
  }

  /** Small-file compaction — the most common daily layout operation
    * of a 100 TB pipeline: streaming ingestion and fine-grained
    * partition writes leave directories of kilobyte files whose
    * per-file open/footer/seek overhead dominates scans (and whose
    * name listing alone strains the driver). Compaction bin-packs
    * them into ~`targetBytes` outputs AND re-clusters by `sortCol`,
    * so the rewrite also buys zone pruning: each output file covers a
    * tight, disjoint key range (parquet row-group min/max + file
    * skipping), where the small files each spanned the whole key
    * space.
    *
    * Plan shape: one read of the small files → repartitionByRange on
    * the sort key (output file count = total bytes / targetBytes,
    * computed from the REAL file sizes, not a guess) →
    * sortWithinPartitions → write. One shuffle, no driver loops; at
    * scale the same call runs per partition directory so rewrite
    * scope stays bounded (compose with writePartitioned layouts).
    * Returns (filesBefore, filesAfter, bytes). */
  def compact(spark: org.apache.spark.sql.SparkSession,
              inPath: String, outPath: String, sortCol: String,
              targetBytes: Long = 128L << 20): (Int, Int, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hp = new org.apache.hadoop.fs.Path(inPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hp).filter { s =>
      s.isFile && !s.getPath.getName.startsWith("_")
    }
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (files.length, outFiles, bytes)
  }

  /** SHUFFLED SHARD EXPORT — the last step of a training-data
    * pipeline: write the corpus as `nShards` equal-size shards in a
    * DETERMINISTIC global random order (md5-of-id order — the
    * engine-neutral shuffle), so the trainer streams shards
    * round-robin and every shard is an IID sample of the corpus
    * (WebDataset-style layout). q56's hash split gives IID groups of
    * BINOMIAL size; training exports need exact sizes (a trailing
    * short shard starves one data-parallel rank), so shards here are
    * round-robin off a global md5 rank: sizes differ by at most 1 at
    * ANY corpus size, and `pos` is the deterministic within-shard
    * read order.
    *
    * Scale shape: the global rank is the q100 two-phase trick — rows
    * stage range-partitioned by (md5, id) (files pin the boundary
    * sample, so ranks cannot race a recompute), per-partition counts
    * (≤ `parts` rows) collect to offsets, rank = offset + local
    * row_number; never a single-reducer global window. One range
    * shuffle + one partitioned write. */
  def writeShards(df: DataFrame, idCol: String, path: String,
                  nShards: Int, parts: Int = 32): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val okey = md5(col(idCol).cast("string").cast("binary"))
    val stage = s"$path/stage"
    df.withColumn("__okey", okey)
      .repartitionByRange(parts, col("__okey"), col(idCol))
      .sortWithinPartitions(col("__okey"), col(idCol))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    val counts = staged.groupBy(col("__pid")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0L, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col("__okey"), col(idCol))
    staged.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__rank", col("__off") + row_number().over(wLocal) - 1)
      .withColumn("shard", col("__rank") % nShards)
      .withColumn("pos", call_function("div", col("__rank"), lit(nShards.toLong)))
      .drop("__pid", "__off", "__rank", "__okey")
      .write.partitionBy("shard").mode("overwrite").parquet(s"$path/data")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }
}
