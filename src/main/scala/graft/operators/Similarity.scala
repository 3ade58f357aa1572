package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — the PROBE side is broadcast
  * (probes are a small query set), so the big corpus is scanned exactly
  * once with no shuffle of the corpus itself; only the per-probe top-k
  * reduction shuffles k rows per probe per partition.
  *
  * Scale path: random-hyperplane LSH bucketing — corpus and probes are
  * signed into nBits-bit buckets; candidate scoring happens only inside
  * a probe's bucket, pruning the scan by ~2^bits for balanced data.
  */
object Similarity {

  /** Project (id, double-vector, norm) once — every pair comparison
    * afterwards is a single dot product. */
  private def prepped(df: DataFrame, idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col("vec_id").as(idAs),
      VectorFunctions.asDouble(col("embedding")).as(vecAs))
      .withColumn(normAs, sqrt(VectorFunctions.dotD(col(vecAs), col(vecAs))))

  /** Exact top-k by cosine for each probe vector. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = prepped(corpus, "nbr_id", "cv", "cn")
      .crossJoin(broadcast(prepped(probes, "probe_id", "pv", "pn")))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("cos", VectorFunctions.cosinePre(col("cv"), col("pv"), col("cn"), col("pn")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("nbr_id"), round(col("cos"), 6).as("cos"))
  }

  /** IVF-flat ANN: partition the corpus into cells around deterministic
    * centroids (hash-rank-sampled corpus vectors), assign each probe to
    * its nProbe nearest cells, score only inside those cells.
    *
    * Scale shape: the tiny centroid set is selected with a distributed
    * top-n (per-partition top-n, merge n×partitions at the driver — no
    * global sort), collected once, and inlined as literal vectors; cell
    * assignment is then a MAP-ONLY per-row argmax over the literal
    * array — no cross-join, no window, no shuffle of the corpus at all.
    * The candidate join is an equi-join on cell id. Corpus assignment
    * is computed once — in a real deployment it would be materialized
    * alongside the embeddings (partitioned by cell) so queries prune at
    * the scan. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nCentroids: Int, nProbe: Int): DataFrame = {
    // deterministic centroids: first nCentroids corpus vectors by
    // md5(vec_id) order (hash-rank sample, engine-independent).
    // orderBy(...).limit(n) plans as TakeOrderedAndProject: each task
    // keeps n rows, the driver merges — nothing like a global sort.
    val centroids = prepped(corpus, "cent_id", "centv", "centn")
      .orderBy(md5(col("cent_id").cast("string").cast("binary")), col("cent_id"))
      .limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    if (centroids.isEmpty)
      return probes.select(col("vec_id").as("probe_id"), lit(0L).as("rank"),
        col("vec_id").as("nbr_id"), lit(0.0).as("cos")).limit(0)
    // per-row nearest cells: ONE native expression carrying the
    // centroid set as data (plan size independent of nCentroids) —
    // a transform/sort_array HOF over a typedlit would evaluate
    // nCentroids INTERPRETED dot products per corpus row, the exact
    // hot-path trap the native tier exists to avoid. Ordering is
    // (neg sim, cent_id) ascending == sim desc, cent_id asc — the
    // original window ordering, exactly
    def cells(vecAs: String, normAs: String, keep: Int) =
      graft.plans.NearestCells.nearestCells(
        col(vecAs), col(normAs), centroids.toSeq, keep)
    def assign(df: DataFrame, idAs: String, vecAs: String, normAs: String, keep: Int) =
      prepped(df, idAs, vecAs, normAs)
        .select(col(idAs), col(vecAs), col(normAs),
          explode(cells(vecAs, normAs, keep)).as("cell"))
    val c = assign(corpus, "nbr_id", "cv", "cn", 1)
    val p = assign(probes, "probe_id", "pv", "pn", nProbe)
    val scored = c.join(broadcast(p), Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("cos", VectorFunctions.cosinePre(col("cv"), col("pv"), col("cn"), col("pn")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), round(col("cos"), 6).as("cos"))
  }

  /** LSH-bucketed ANN: score only corpus vectors in the probe's bucket.
    * Recall < 1.0 by construction; bits trades recall vs. cost. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int): DataFrame = {
    val sig = (df: DataFrame, idAs: String, vecAs: String, normAs: String) =>
      prepped(df, idAs, vecAs, normAs)
        .withColumn("bucket", VectorFunctions.hyperplaneSignature(col(vecAs), bits))
    val c = sig(corpus, "nbr_id", "cv", "cn")
    val p = sig(probes, "probe_id", "pv", "pn")
    val scored = c.join(broadcast(p), Seq("bucket"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("cos", VectorFunctions.cosinePre(col("cv"), col("pv"), col("cn"), col("pn")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("nbr_id"), round(col("cos"), 6).as("cos"))
  }
}
