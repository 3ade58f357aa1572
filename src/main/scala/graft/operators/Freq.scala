package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Frequency / membership sketches for corpus-scale pipelines.
  *
  * Both operators here answer "how often / is it present" questions
  * with FIXED-SIZE state where the exact answer would shuffle a
  * vocabulary- or eval-set-sized structure:
  *
  *  - [[cmsHeavyHitters]]: count-min sketch term frequencies — the
  *    d×w counter grid is map-side combined, so the shuffle carries at
  *    most d×w rows per partition no matter how many distinct terms
  *    the corpus has (exact counting shuffles every distinct term).
  *  - [[bloomContamination]]: Bloom-filter membership against an eval
  *    set — the broadcast is m BITS regardless of eval-set size (the
  *    q57 inverted index broadcasts the eval shingles themselves).
  *
  * Everything is md5-derived and integer-exact so an independent SQL
  * engine replays the sketches bit-for-bit (same discipline as
  * [[graft.functions.Sketches]]).
  */
object Freq {

  /** CMS bucket for hash row `h`: first 32 md5 bits of "h:term" mod
    * width. Engine-neutral: hex-prefix integer arithmetic, no
    * sign/overflow edge (8 hex chars < 2^32). */
  private def cmsBucket(row: Column, term: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"), term).cast("binary")),
      1, 8), 16, 10).cast("long") % width

  /** The `depth` (row, bucket) cells a term hashes into. Public so the
    * streaming window sketch ([[graft.streaming.EventPipeline]]) uses
    * the identical cell mapping as the batch grid. */
  def cmsCells(term: Column, depth: Int, width: Int): Column =
    transform(sequence(lit(0), lit(depth - 1)),
      h => struct(h.cast("long").as("row"), cmsBucket(h, term, width).as("bucket")))

  /** Count-min-sketch term frequencies (Cormode & Muthukrishnan 2005),
    * verified against exact counts for the top `topN` terms.
    *
    * Build: every token instance increments one counter per hash row;
    * `groupBy(row, bucket).count` IS the sketch — partial aggregation
    * caps the shuffle at depth×width rows per map partition, and
    * counter grids from different shards/days merge by plain addition
    * (the counts are sums), so the sketch is as mergeable as the HLL
    * register bank. Probe: estimate(term) = min over rows of its
    * counter — never an underestimate, inflated only by collisions.
    *
    * Returns one row per top-`topN` exact term: (term, n_exact,
    * n_est), n_est >= n_exact always. The exact side is only the
    * verification harness; the sketch itself never touches
    * per-term state. */
  /** The raw counter grid (row, bucket, c) for a corpus — the entire
    * sketch state. Grids from disjoint shards merge by summing `c`
    * per cell. */
  def cmsSketch(docs: DataFrame, textCol: String,
                depth: Int = 4, width: Int = 1024): DataFrame =
    docs.select(explode(TF.tokens(col(textCol))).as("term"))
      .select(explode(cmsCells(col("term"), depth, width)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  def cmsHeavyHitters(docs: DataFrame, textCol: String,
                      depth: Int = 4, width: Int = 1024, topN: Int = 20): DataFrame = {
    val terms = docs.select(explode(TF.tokens(col(textCol))).as("term"))
    val sketch = cmsSketch(docs, textCol, depth, width)
    val top = terms.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term")).limit(topN)
    val probes = top.select(col("term"), col("n_exact"),
      explode(cmsCells(col("term"), depth, width)).as("cell"))
    // the probe side is tiny (topN×depth rows): broadcast it onto the
    // d×w-row sketch, then min across rows
    sketch.join(broadcast(probes),
        sketch("row") === col("cell.row") && sketch("bucket") === col("cell.bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .orderBy(col("n_exact").desc, col("term"))
  }

  /** Bloom bit position for hash `h` of a shingle: first 32 md5 bits
    * of "h:shingle" mod mBits. */
  private def bloomPos(h: Column, s: Column, mBits: Int): Column =
    conv(substring(md5(concat(h.cast("string"), lit(":"), s).cast("binary")),
      1, 8), 16, 10).cast("long") % mBits

  private def bloomPositions(s: Column, hashes: Int, mBits: Int): Column =
    transform(sequence(lit(0), lit(hashes - 1)), h => bloomPos(h, s, mBits))

  /** Benchmark decontamination through a Bloom filter: flag corpus
    * docs whose k-shingles look present in the eval set.
    *
    * The filter is the DISTINCT set of set bit positions over the eval
    * shingles — at most mBits values to broadcast however large the
    * eval set grows (the exact q57 guard broadcasts the eval shingles
    * themselves). A corpus shingle "hits" when all `hashes` of its
    * positions are set; no false negatives by construction, false
    * positives at the classic (1-e^(-kn/m))^k rate — visible in the
    * output as bloom_hits > true_hits.
    *
    * Scale shape: the corpus is scanned ONCE — the bloom probe and
    * the exact-truth flag ride the same flow as two broadcast LEFT
    * joins (both builds bounded: m bit positions, eval shingles), and
    * the only wide shuffles are the (doc, shingle) distinct and the
    * per-doc reduce; the (doc, shingle) partitioning carries through
    * generate + broadcast joins, so the flag aggregation adds no
    * exchange. `true_hits` is the verification harness — a pure
    * deployment drops it and the eval-shingle broadcast, keeping only
    * the m-bit filter.
    *
    * Returns per corpus doc with at least one flagged shingle:
    * (doc_id, n_shingles, bloom_hits, true_hits). */
  def bloomContamination(corpus: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, k: Int = 3, hashes: Int = 3,
                         mBits: Int = 65536): DataFrame = {
    def shingleSet(df: DataFrame) = df
      .select(col(idCol), explode(TF.shingles(TF.tokens(col(textCol)), k)).as("s"))
      .distinct()
    val evalShingles = shingleSet(eval).select(col("s")).distinct()
    val bloom = evalShingles
      .select(explode(bloomPositions(col("s"), hashes, mBits)).as("pos"))
      .distinct()
    // a shingle is flagged when all `hashes` positions (with
    // multiplicity, if two hash rows collide) land on set bits
    shingleSet(corpus)
      .select(col(idCol), col("s"),
        explode(bloomPositions(col("s"), hashes, mBits)).as("pos"))
      .join(broadcast(bloom.withColumn("set_bit", lit(1L))), Seq("pos"), "left")
      .groupBy(col(idCol), col("s"))
      .agg(sum(coalesce(col("set_bit"), lit(0L))).as("nset"))
      .join(broadcast(evalShingles.withColumn("in_eval", lit(1L))), Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("nset") === hashes, lit(1L)).otherwise(lit(0L))).as("bloom_hits"),
        sum(coalesce(col("in_eval"), lit(0L))).as("true_hits"))
      .filter(col("bloom_hits") > 0)
      .orderBy(col(idCol))
  }
}
