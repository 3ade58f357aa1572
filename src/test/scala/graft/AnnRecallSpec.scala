package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Retrieval QUALITY of the ANN family — the hash oracles prove the
  * implementations are deterministic, but an index with recall 0.1
  * would still pass them. Here each approximate method's top-10 is
  * scored against the exact brute-force top-10 on the sf0.1
  * embeddings (2000 × 64-dim unit vectors), with asserted floors.
  *
  * Corpus caveat that sets the ceilings: the synthetic embeddings are
  * noise-dominated — only ~12% of a probe's true top-10 share its
  * label (avg top-10 cosine ≈ 0.35) — so recall is bounded by the
  * candidate fraction an index examines, not by cluster structure.
  * The floors therefore assert (a) the MONOTONE levers every real
  * deployment pulls — Lloyd training, multi-probe, exact re-rank of
  * an ADC shortlist — each lifting its seed, and (b) the exactness
  * invariant nProbe = nCentroids ≡ brute force. Data is
  * deterministic, so measured values are repeatable; floors sit
  * below them only to absorb benign reorderings, not noise. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.1"
  private val k = 10
  private val nProbes = 20

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val probes = emb.filter(col("vec_id") < nProbes)

  /** probe_id -> top-k neighbor ids. */
  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("probe_id"), col("nbr_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private lazy val exact = topkSets(Similarity.bruteForceTopK(emb, probes, k))

  private def recallAtK(approx: DataFrame): Double = {
    val got = topkSets(approx)
    val per = exact.map { case (p, truth) =>
      got.getOrElse(p, Set.empty).count(truth).toDouble / truth.size
    }
    per.sum / per.size
  }

  test("IVF: Lloyd training lifts the seed; nProbe=8/16 clears 0.75") {
    val seed = recallAtK(Similarity.ivfTopK(emb, probes, k, nCentroids = 16, nProbe = 4))
    val trained4 = recallAtK(Similarity.ivfTopK(emb, probes, k,
      nCentroids = 16, nProbe = 4, refineIters = 2))
    val trained8 = recallAtK(Similarity.ivfTopK(emb, probes, k,
      nCentroids = 16, nProbe = 8, refineIters = 2))
    info(f"ivf recall@10: seed np4 = $seed%.3f, trained np4 = $trained4%.3f, " +
      f"trained np8 = $trained8%.3f")
    assert(trained4 >= seed - 1e-9, "training must not hurt recall")
    assert(trained4 >= 0.50, f"trained IVF np4 recall $trained4%.3f below floor")
    assert(trained8 >= 0.75, f"trained IVF np8 recall $trained8%.3f below floor")
  }

  test("IVF exactness invariant: probing every cell IS brute force") {
    val full = recallAtK(Similarity.ivfTopK(emb, probes, k,
      nCentroids = 16, nProbe = 16, refineIters = 2))
    assert(full === 1.0, f"nProbe=nCentroids must equal exact search, got $full%.3f")
  }

  test("LSH: Hamming-1 multi-probe lifts the exact-bucket prior") {
    val exact1 = recallAtK(Similarity.lshTopK(emb, probes, k, bits = 4))
    val mp = recallAtK(Similarity.lshTopK(emb, probes, k, bits = 4, multiProbe = 1))
    info(f"lsh recall@10: exact-bucket = $exact1%.3f, multi-probe = $mp%.3f")
    assert(mp >= exact1 - 1e-9, "multi-probe must not hurt recall")
    assert(mp >= 0.45, f"multi-probe LSH recall@10 $mp%.3f below floor")
  }

  test("PQ-ADC: per-block training + exact re-rank recover the top-10") {
    val raw = recallAtK(Similarity.pqTopK(emb, probes, k,
      nCentroids = 16, blockDim = 4, refineIters = 2))
    val rr = recallAtK(Similarity.pqTopK(emb, probes, k,
      nCentroids = 16, blockDim = 4, refineIters = 2, rerank = 100))
    info(f"pq recall@10 (bd=4, 2 iters): adc-rank = $raw%.3f, reranked-100 = $rr%.3f")
    assert(rr >= raw - 1e-9, "re-rank must not hurt recall")
    assert(rr >= 0.70, f"trained+reranked PQ recall@10 $rr%.3f below floor")
  }

  test("IVFPQ: trained cells + codebook + re-rank clear 0.60") {
    val rr = recallAtK(Similarity.ivfPqTopK(emb, probes, k,
      nCentroids = 16, nProbe = 8, blockDim = 4, refineIters = 2, rerank = 100))
    info(f"ivfpq recall@10 (np8, bd=4, 2 iters, rr=100) = $rr%.3f")
    assert(rr >= 0.60, f"trained IVFPQ recall@10 $rr%.3f below floor")
  }

  test("hard negatives: every mined negative is wrong-class; full probe ≡ filtered brute force") {
    val mined = Similarity.hardNegativesTopK(emb, probes, k,
      nCentroids = 16, nProbe = 16)
    val anchorLabels = probes.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = mined.select(col("probe_id"), col("nbr_label")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) != anchorLabels(r.getLong(0)),
        s"anchor ${r.getLong(0)} mined a SAME-class negative")
    }
    // probing every cell makes the mine exhaustive: identical to the
    // brute-force top-k restricted to wrong-class candidates
    val lab = emb.select(col("vec_id").as("nbr_id"), col("label").as("bl"))
    val bruteAll = Similarity.bruteForceTopK(emb, probes,
      k = emb.count().toInt) // full ranking, filter labels after
    val bruteNeg = bruteAll.join(lab, "nbr_id")
      .join(probes.select(col("vec_id").as("probe_id"), col("label").as("al")), "probe_id")
      .filter(col("bl") =!= col("al"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    val bruteTop = bruteNeg.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    // compare the per-probe MULTISET of rounded cosines, not id sets:
    // bruteForceTopK ranks on cos rounded to 6 decimals while the
    // miner ranks on the exact value, so a <1e-6 tie at the k
    // boundary may legally pick a different (equally-near) id
    def topkCos(df: DataFrame): Map[Long, Seq[Double]] =
      df.select(col("probe_id"), col("cos")).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getDouble(1)).sorted.toSeq).toMap
    assert(topkCos(mined) === topkCos(bruteTop),
      "exhaustive-probe hard negatives must equal label-filtered brute force")
  }
}
