package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial skew stress for the three collect-per-key shapes the
  * r17 optimization introduced (each replaced a join/Window with an
  * in-row array of a whole key group, trading spillability for one
  * fewer exchange):
  *
  *  1. the PPJoin per-SHINGLE candidate group
  *     (Dedup.ngramJaccardPairsPrefix: groupBy(s).collect_list) —
  *     bounded only by the rarest-first prefix argument, so the
  *     pathological corpus is many near-identical docs whose PREFIXES
  *     are forced to share a shingle;
  *  2. the per-DOC prefix collect (groupBy(doc_id).collect_list) —
  *     bounded by doc length, so the pathology is one giant document;
  *  3. the per-ORDER part set (q115 edge build:
  *     groupBy(l_orderkey).collect_set) — bounded by order size, so
  *     the pathology is one hot order holding many parts.
  *
  * Each stress pins (a) COMPLETION at a group size far beyond the
  * bench corpus (the group row stays comfortably under task memory:
  * the structural risk is a row that cannot spill mid-build, so the
  * spec documents measured row sizes) and (b) EXACTNESS against the
  * naive formulation where one is affordable, or an analytic pair
  * count where it is not. Scale notes per shape are in the asserts. */
class SkewStressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.Dedup

  test("per-shingle candidate group: 2000 docs forced into ONE prefix group complete exactly") {
    import spark.implicits._
    // every doc: 6 unique shingle-generating tokens + 6 HOT tokens
    // shared by all docs. n = 12 distinct shingles per doc (k=1 so
    // tokens ≡ shingles); prefix length = n − ⌈t·n⌉ + 1 = 7 at t=0.5,
    // and the df-sorted order puts the 6 df=1 uniques first, then ONE
    // hot shingle (df=2000) at rank 7 — the SAME hot shingle for every
    // doc (df ties break by hash). The candidate group for that
    // shingle therefore holds ALL 2000 docs: C(2000,2) ≈ 2.0M ordered
    // pairs explode from ONE in-row group (the adversarial case the
    // rarest-first argument cannot bound). True Jaccard of every pair
    // is 6/18 = 0.33 < 0.5, so verification rejects everything — the
    // output is provably empty and the stress isolates candidate-side
    // memory/work, not output volume.
    val n = 2000
    val hot = (1 to 6).map(h => s"hot$h").mkString(" ")
    val docs = (0 until n).map { i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f $hot")
    }.toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      k = 1, threshold = 0.5)
    assert(out.count() === 0, "J = 6/18 < 0.5 for every pair — must verify to empty")
    // group-row memory: 2000 structs of (long, long, long) ≈ 50 KB —
    // the collect_list row grows LINEARLY in group size; a 10⁶-doc hot
    // group is ~25 MB in one unspillable row, which is the documented
    // ceiling before the shape must be split (OPTIMIZATION_r18.md).
  }

  test("per-shingle candidate group: near-identical docs yield the exact naive pair set") {
    import spark.implicits._
    // 300 docs sharing 10 of 11 shingles — every pair IS a near-dup
    // (J = 10/12 > 0.5): the candidate group is the whole corpus AND
    // the output is the full C(300,2) clique. Exactness is checked
    // against the naive inverted-index join on the same corpus.
    val n = 300
    val shared = (1 to 10).map(h => s"s$h").mkString(" ")
    val docs = (0 until n).map { i => (i.toLong, s"$shared u$i") }
      .toDF("doc_id", "text")
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      k = 1, threshold = 0.5)
    val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 1, threshold = 0.5)
    assert(prefix.count() === n.toLong * (n - 1) / 2)
    assert(prefix.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(prefix).count() === 0)
  }

  test("per-doc prefix collect: a 100k-token document completes and stays exact") {
    import spark.implicits._
    // one giant doc (100k distinct tokens → ~100k distinct 3-shingles
    // collected into ONE row ≈ 2.4 MB of (df, hash) structs) next to
    // normal docs, two of which are near-dups. The giant doc shares
    // nothing, so the pair set is exactly the small docs' — checked
    // against the naive join, which is cheap here (all df small).
    val giant = (0 until 100000).map(i => s"g$i").mkString(" ")
    val docs = (Seq(
      (0L, giant),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    ) ++ (3 until 40).map(i => (i.toLong, s"n${i}a n${i}b n${i}c n${i}d n${i}e")))
      .toDF("doc_id", "text")
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      k = 3, threshold = 0.5)
    val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.5)
    assert(prefix.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(prefix).count() === 0)
    assert(prefix.count() >= 1, "the near-dup pair must survive next to the giant doc")
  }

  test("per-order part set: one hot order with 3000 parts builds the exact edge clique") {
    import spark.implicits._
    // q115's edge build: collect_set per order + in-task double
    // explode. A 3000-part order is one ~24 KB row exploding to
    // 3000·2999 ordered pairs in-task; edges must be exactly the
    // clique plus the small orders' pairs, deduplicated.
    val hotOrder = (0 until 3000).map(p => (1L, p.toLong))
    val small = Seq((2L, 1L), (2L, 2L), (3L, 2L), (3L, 3L), (3L, 1L))
    val li = (hotOrder ++ small).toDF("l_orderkey", "l_partkey")
    val e = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // clique on 3000 parts (both directions) ∪ small-order edges; the
    // small orders' pairs {1,2},{2,3},{1,3} are inside the clique
    assert(e.count() === 3000L * 2999L)
    // spot-check symmetry and in-order dedup
    assert(e.filter(col("src") === 0 && col("dst") === 1).count() === 1)
    assert(e.filter(col("src") === 1 && col("dst") === 0).count() === 1)
  }
}
