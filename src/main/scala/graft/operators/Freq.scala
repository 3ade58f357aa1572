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
    * the identical cell mapping as the batch grid.
    *
    * Unrolled to a literal `array(...)` over the plan-time-known
    * depth, NOT `transform(sequence(...))`: higher-order functions
    * are CodegenFallback nodes, so the md5+conv per cell ran
    * INTERPRETED per token instance (depth× per token — the q76 build
    * side's whole cost); as a plain CreateArray of codegen'd
    * expressions the same cells (bit-identical — same "h:term" md5,
    * same hex window, same mod) stay in whole-stage codegen. */
  def cmsCells(term: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { h =>
      struct(lit(h.toLong).as("row"),
        cmsBucket(lit(h), term, width).as("bucket"))
    }: _*)

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

  /** The `hashes` Bloom bit positions of a shingle: ONE md5, its hex
    * digest split into disjoint 8-hex (32-bit) windows, each mod
    * mBits. One hash evaluation per shingle instead of one per
    * position — the per-row cost of both the filter build and the
    * probe is hash-bound, so this is the 100 TB lever (the plan-side
    * lever being the map-only probe below). 32 hex chars bound
    * `hashes` at 4; windows are independent uniform bits, the classic
    * partitioned-hash Bloom construction. */
  private def bloomPositionSeq(s: Column, hashes: Int, mBits: Int): Seq[Column] = {
    // the lower bound is load-bearing: hashes=0 would make the probe's
    // reduce(_ && _) throw an opaque empty-collection error at plan
    // build (the old forall-over-empty silently returned true)
    require(hashes >= 1 && hashes <= 4,
      s"bloomPositions: between 1 and 4 hash windows per md5, got $hashes")
    val digest = md5(s.cast("binary"))
    // plan-time unroll (hashes is a literal), NOT transform(sequence):
    // a higher-order function is a CodegenFallback node, so the md5 +
    // conv per window ran interpreted per row; as plain expressions
    // the windows stay codegen'd and subexpression elimination shares
    // the one digest. Values are bit-identical (same hex windows).
    (0 until hashes).map(h =>
      conv(substring(digest, h * 8 + 1, 8), 16, 10).cast("long") % mBits)
  }

  private def bloomPositions(s: Column, hashes: Int, mBits: Int): Column =
    array(bloomPositionSeq(s, hashes, mBits): _*)

  /** Benchmark decontamination through a Bloom filter: flag corpus
    * docs whose k-shingles look present in the eval set.
    *
    * The filter is the DISTINCT set of set bit positions over the eval
    * shingles, COLLECTED ONCE into an mBits-size boolean bitmap and
    * shipped as a single plan LITERAL (8 KB at the default 2^16 bits)
    * — constant-size however large the eval set grows (the exact q57
    * guard broadcasts the eval shingles themselves). A corpus shingle
    * "hits" when all `hashes` of its positions index set bits —
    * evaluated MAP-ONLY with a higher-order `forall` over the literal
    * (no explode, no join, no per-position shuffle); no false
    * negatives by construction, false positives at the classic
    * (1-e^(-kn/m))^k rate — visible as bloom_hits > true_hits.
    *
    * Per-doc shingle dedup: by default (`uniqueIds = false`) the
    * exploded (id, shingle) pairs are distinct'd — correct for ANY
    * corpus shape, including several rows per id, at the cost of one
    * extra exchange carrying the distinct pairs. A caller whose frame
    * has ONE row per `idCol` value (the documents-table shape) passes
    * `uniqueIds = true`: dedup is then `array_distinct` on the row's
    * own shingle array — map-side, which keeps the plan at ONE
    * exchange (the per-doc reduce). The flag is an attestation, not a
    * heuristic — passing it over a multi-row-per-id frame double
    * counts shingles shared between an id's rows.
    *
    * Scale shape: the corpus is scanned ONCE and the plan has one
    * exchange (`uniqueIds = true`) or two (default) — never a
    * per-position shuffle. The bloom probe is the
    * forall-over-literal above, and only `true_hits` — the
    * verification harness a pure deployment drops — needs the
    * broadcast LEFT join against the eval shingles. Before this
    * rewrite the probe exploded ×hashes positions, broadcast-joined
    * the bit set and re-aggregated by (doc, shingle) — a second full
    * shuffle of the distinct shingle set that the bitmap literal
    * makes unnecessary.
    *
    * Returns per corpus doc with at least one flagged shingle:
    * (doc_id, n_shingles, bloom_hits, true_hits). */
  def bloomContamination(corpus: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, k: Int = 3, hashes: Int = 3,
                         mBits: Int = 65536,
                         uniqueIds: Boolean = false): DataFrame = {
    // native one-loop shingling (plans/ShingleTokens) — the probe is
    // generation+hash bound, so both matter more than the plan here
    def sh(c: Column) =
      graft.plans.ShingleTokens.shingleTokens(TF.tokens(c), k)
    val evalShingles = eval
      .select(explode(sh(col(textCol))).as("s"))
      .distinct()
    // the ONE bounded collect: ≤ mBits distinct positions (the
    // filter's whole state), packed 64-per-long — 2^16 bits = 1 KB of
    // plan literal
    val words = new Array[Long]((mBits + 63) / 64)
    evalShingles
      .select(explode(bloomPositions(col("s"), hashes, mBits)).as("pos"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p >>> 6) |= (1L << (p & 63))
      }
    val bitmap = typedLit(words.toSeq)
    // all `hashes` positions set (with multiplicity if two hash rows
    // collide) — element_at is 1-based; getbit tests inside the word.
    // Unrolled conjunction instead of forall-over-array: forall is a
    // CodegenFallback HOF, which made every probe evaluate its whole
    // subtree (md5 included) interpreted; the AND of plain codegen'd
    // tests is value-identical.
    def allSet(s: Column): Column =
      bloomPositionSeq(s, hashes, mBits).map { p =>
        call_function("getbit",
          element_at(bitmap, (p / 64).cast("int") + 1),
          (p % 64).cast("int")) === 1
      }.reduce(_ && _)
    val pairs = corpus
      .select(col(idCol),
        explode(array_distinct(sh(col(textCol)))).as("s"))
    // cross-ROW dedup (an id split over several rows must count a
    // shared shingle once); map-side partial dedup bounds the exchange
    (if (uniqueIds) pairs else pairs.distinct())
      .withColumn("bloom_hit", when(allSet(col("s")), 1L).otherwise(0L))
      .join(broadcast(evalShingles.withColumn("in_eval", lit(1L))), Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("bloom_hit")).as("bloom_hits"),
        sum(coalesce(col("in_eval"), lit(0L))).as("true_hits"))
      .filter(col("bloom_hits") > 0)
      .orderBy(col(idCol))
  }
}
