package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** The q25 recall contract: the registered bucketed cosine near-dup
  * plan ([[Dedup.cosineNearDupPairsBucketed]]) is APPROXIMATE in its
  * candidate generation — the hash oracle proves determinism, this
  * spec pins retrieval quality against the exhaustive per-label
  * baseline ([[Dedup.cosineNearDupPairs]]).
  *
  * Corpus caveat that sets the floors: the synthetic embeddings are
  * noise-dominated — every true pair sits barely above the 0.4
  * threshold (cos 0.40–0.48, ambient ≈ 0.35), the hardest regime for
  * ANY sublinear candidate scheme. Measured recall at the registered
  * params (cellTarget=125, keep=4): 1.00 at sf0.001, 0.60 at sf0.01,
  * 0.92 at sf0.1. Floors sit below the deterministic measurements
  * only to absorb benign reorderings. Precision must be EXACTLY 1.0:
  * candidates are scored with the same exact cosine, so every
  * reported pair is a true pair. */
class CosineNearDupRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def measure(sfDir: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = pairs(Dedup.cosineNearDupPairs(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4))
    val bucketed = pairs(Dedup.cosineNearDupPairsBucketed(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4))
    (exact, bucketed)
  }

  test("bucketed pairs are a SUBSET of the exhaustive pairs (precision 1.0)") {
    val (exact, bucketed) = measure("/root/testdata/sf0.01")
    assert(bucketed.subsetOf(exact),
      s"false positives: ${bucketed.diff(exact).take(5)}")
  }

  test("recall floor at sf0.01 (borderline pairs, registered params)") {
    val (exact, bucketed) = measure("/root/testdata/sf0.01")
    val recall = bucketed.count(exact).toDouble / math.max(1, exact.size)
    info(f"sf0.01 recall = ${bucketed.count(exact)}/${exact.size} = $recall%.3f")
    assert(recall >= 0.5, f"bucketed recall $recall%.3f below floor 0.5")
  }

  test("two-level pairs: precision 1.0, recall floor, subset discipline") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = pairs(Dedup.cosineNearDupPairs(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4))
    val two = pairs(Dedup.cosineNearDupPairsTwoLevel(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4))
    assert(two.subsetOf(exact), s"false positives: ${two.diff(exact).take(5)}")
    val recall = two.count(exact).toDouble / math.max(1, exact.size)
    info(f"sf0.01 two-level recall = ${two.count(exact)}/${exact.size} = $recall%.3f")
    // one more (1-p)^keep factor than the flat scheme: floor sits lower
    assert(recall >= 0.4, f"two-level recall $recall%.3f below floor 0.4")
  }

  test("two-level widening levers recover the flat scheme's recall") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = pairs(Dedup.cosineNearDupPairs(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4))
    // tiny corpus: 4 coarse cells; probing all of them and keeping
    // every fine cell makes candidate generation exhaustive-adjacent
    val wide = pairs(Dedup.cosineNearDupPairsTwoLevel(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4,
      keepCoarse = 4, keepFine = 16))
    assert(wide == exact,
      "probing every coarse cell with all fine cells must reproduce the exhaustive set")
  }

  test("keep is a monotone recall lever: probing every cell is exhaustive-adjacent") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = pairs(Dedup.cosineNearDupPairs(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4))
    // keep = nCells (16 at this sf) assigns every vector to every cell
    // → every same-label pair is a candidate → recall exactly 1.0
    val full = pairs(Dedup.cosineNearDupPairsBucketed(
      emb, "vec_id", "embedding", col("label"), threshold = 0.4, keep = 16))
    assert(full == exact, "keep=nCells must reproduce the exhaustive pair set")
  }
}
