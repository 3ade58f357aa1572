package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Semantic deduplication over an embedding column (SemDeDup, Abbas et
  * al. 2023): cluster the embedding space, find near-duplicate groups
  * WITHIN each cluster by cosine similarity, and keep one exemplar per
  * group — the embedding-space counterpart of MinHash near-dup, used to
  * prune semantically redundant training data.
  *
  * Keep rule (as in the paper): within a duplicate group, keep the
  * vector with the LOWEST cosine to its cluster centroid — the most
  * "peripheral" exemplar preserves diversity; ties resolve by vec_id.
  *
  * Scale shape: centroids are a deterministic hash-rank sample
  * (TakeOrderedAndProject + one bounded collect, the q41 IVF pattern);
  * cell assignment is a MAP-ONLY native argmax ([[graft.plans.NearestCells]]
  * — no corpus shuffle); pair generation is an equi-join on cell id, so
  * comparisons are O(sum of cell sizes squared), never all-pairs; the
  * duplicate groups come from the alternating-star connected-components
  * loop ([[Cluster.connectedComponents]], map-side-combined minima);
  * exemplar selection is a groupBy min(struct) + join-back — no
  * per-cluster window reducer.
  *
  * Determinism: centroid choice, assignment order, cosine comparisons
  * and the keep rule are all engine-exact (sequential dot products,
  * md5 ranks), so the full pipeline replays in SQL — q73's oracle.
  */
object SemDedup {

  /** [[semDedup]] with the cell count scaled to the corpus —
    * `nCells = clamp(ceil(n / cellTarget), 16, maxCells)` (the q25
    * bucketed-near-dup rule). A FIXED cell count is a scale ceiling:
    * cell population grows ∝ n, so within-cell pair work grows
    * quadratically with the corpus. Targeting a constant per-cell
    * population keeps pair work linear; the floor pins small-corpus
    * outputs (and the oracle) stable, the cap bounds the driver-side
    * centroid collect. */
  def semDedupAdaptive(emb: DataFrame, threshold: Double,
                       cellTarget: Int = 125, maxCells: Int = 4096): DataFrame = {
    val n = emb.count()
    val nCells = math.min(maxCells.toLong,
      math.max(16L, (n + cellTarget - 1) / cellTarget)).toInt
    semDedup(emb, nCells, threshold)
  }

  /** Label every embedding with its cell, duplicate-cluster id, cosine
    * to its cell centroid, and whether it is the kept exemplar. */
  def semDedup(emb: DataFrame, nCentroids: Int, threshold: Double): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._

    val prep = emb.select(col("vec_id"),
        VectorFunctions.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.dotD(col("v"), col("v"))))

    // deterministic centroids: hash-rank sample, distributed top-n +
    // one bounded (<= nCentroids rows) collect, inlined as literals
    val centArr = prep
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
      .limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    require(centArr.nonEmpty, "semDedup needs a non-empty embedding table")

    // map-only cell assignment (argmax cosine over the literal set)
    val assigned = prep.select(col("vec_id"), col("v"), col("nrm"),
      explode(graft.plans.NearestCells.nearestCells(
        col("v"), col("nrm"), centArr.toSeq, 1)).as("cell"))

    // cosine to own centroid via the tiny broadcast centroid table
    val centDf = centArr.toSeq.toDF("cell", "cv", "cn")
    val mine = assigned.join(broadcast(centDf), "cell")
      .withColumn("cos_cent",
        VectorFunctions.cosinePre(col("v"), col("cv"), col("nrm"), col("cn")))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"), col("cos_cent"))

    // near-dup edges only within a cell
    val a = mine.select(col("cell"), col("vec_id").as("ea"),
      col("v").as("va"), col("nrm").as("na"))
    val b = mine.select(col("cell"), col("vec_id").as("eb"),
      col("v").as("vb"), col("nrm").as("nb"))
    val edges = a.join(b, Seq("cell"))
      .filter(col("ea") < col("eb"))
      .filter(VectorFunctions.cosinePre(
        col("va"), col("vb"), col("na"), col("nb")) > threshold)
      .select(col("ea"), col("eb"))

    val cc = Cluster.connectedComponents(edges, "ea", "eb")
    val labeled = mine
      .join(cc, mine("vec_id") === cc("node"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("vec_id")))
      .select(col("vec_id"), col("cell"), col("cluster_id"), col("cos_cent"))

    // exemplar = argmin (cos_cent, vec_id) per cluster: struct min is
    // fieldwise-lexicographic, combines map-side; the join-back keys on
    // cluster_id (high cardinality — stays at scan parallelism)
    val keepers = labeled.groupBy(col("cluster_id"))
      .agg(min(struct(col("cos_cent"), col("vec_id"))).as("k"))
      .select(col("cluster_id"), col("k.vec_id").as("__keep_id"))
    labeled.join(keepers, "cluster_id")
      .select(col("vec_id"), col("cell"), col("cluster_id"),
        round(col("cos_cent"), 6).as("cos_cent"),
        (col("vec_id") === col("__keep_id")).as("is_kept"))
  }
}
