package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Training}
import graft.sources.Tables

/** The persist-once training contract: trained artifacts (IVF
  * centroids, PQ codebooks, BPE merge tables) are functions of
  * (dataset, params), so a second invocation must NOT re-run the
  * training scan. `Training.misses` counts actual training runs —
  * training only happens inside a miss, so a zero-delta on
  * re-invocation IS the proof the scan was skipped. */
class TrainingCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cached trainer runs once per key and returns the same instance") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val key = "spec-ivf-" + System.nanoTime()
    val before = Training.misses.get
    val c1 = Training.cached(key)(Similarity.trainIvfCentroids(emb, 8, 1))
    assert(Training.misses.get === before + 1)
    val c2 = Training.cached(key)(Similarity.trainIvfCentroids(emb, 8, 1))
    assert(Training.misses.get === before + 1, "second call re-ran training")
    assert(c1 eq c2, "cache must return the identical artifact instance")
  }

  test("trained queries skip training on re-invocation, results unchanged") {
    val d = TestSpark.sf
    for (name <- Seq("q91_ann_ivf_trained", "q95_pq_trained",
        "q92_bpe_tokens", "q96_bpe_pack")) {
      val q = SparkEntry.queries(name)
      val r1 = q(spark, d).collect()
      val m = Training.misses.get
      val r2 = q(spark, d).collect()
      assert(Training.misses.get === m,
        s"$name re-ran its training scan on the second invocation")
      assert(r1.sameElements(r2), s"$name results changed across invocations")
    }
  }

  test("q92 and q96 share one merge-table artifact") {
    val d = TestSpark.sf
    SparkEntry.queries("q92_bpe_tokens")(spark, d).collect()
    val m = Training.misses.get
    SparkEntry.queries("q96_bpe_pack")(spark, d).collect()
    assert(Training.misses.get === m,
      "q96 re-trained the merge table q92 already trained")
  }
}
