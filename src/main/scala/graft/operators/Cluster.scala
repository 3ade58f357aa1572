package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster resolution — the dedup family's capstone.
  *
  * Pair generators (MinHash/SimHash/Jaccard: [[Dedup]]) emit EDGES; a
  * training pipeline must resolve them into connected components and
  * keep one canonical document per component (the reference dedups per
  * key — `consumer.py:57-92 processed_keys` — which at corpus scale
  * becomes per-CLUSTER canonicalization).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * shuffle-native formulation. Each round is a bounded number of
  * hash-shuffles on node id; convergence in O(log n) rounds on
  * high-diameter graphs and 1–2 rounds on the tight cliques near-dup
  * corpora actually produce. No driver-side graph: the driver loop
  * only compares two scalar aggregates per round for the fixpoint
  * test.
  *
  *  - large-star: every node links its LARGER neighbors to the
  *    minimum of its neighborhood (incl. itself);
  *  - small-star: every node links its smaller neighbors and itself
  *    to the minimum of its smaller neighborhood.
  *
  * Fixpoint: the edge set is a forest of depth-1 stars rooted at each
  * component's minimum node. Each iteration `localCheckpoint`s the
  * edge set — the lineage would otherwise double per round and the
  * fixpoint test would recompute the whole history.
  *
  * Skew posture at 100 TB: a giant component makes its root a hot key
  * — once stars form, the root's neighborhood is the whole membership.
  * Neighborhood minima are therefore computed with groupBy (map-side
  * partial combine collapses the hot key to one row per map partition)
  * and joined back with an equi-join AQE can skew-split — never with a
  * window over partitionBy(node), which would sort the entire
  * membership on one reducer.
  */
object Cluster {

  /** Connected components of an undirected edge list.
    *
    * @param edges  DataFrame with two LONG node-id columns (self-loops
    *               and duplicate/reversed edges are fine)
    * @param src    first endpoint column name
    * @param dst    second endpoint column name
    * @param maxIter safety bound on star rounds (components of
    *                diameter d need ~log d rounds; 20 covers any
    *                realistic graph — 2^20-diameter paths)
    * @return (node, component) — every node that appears in an edge,
    *         labeled with the smallest node id reachable from it
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    // LAZY checkpoint: the sig() action right below both materializes
    // the checkpoint blocks and computes the fixpoint witness in ONE
    // job — an eager checkpoint would pay a separate materialization
    // job per round (2 driver round-trips instead of 1; the loop is
    // round-trip-bound at bench scale)
    var e = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)

    // cheap set-equality witness: (row count, order-independent XOR of
    // 64-bit row hashes — xor never overflows under ANSI, where a long
    // SUM of hashes does). Edges are distinct, so equal (count, xor)
    // means equal set up to 2^-64 collision odds.
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var s = sig(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Neighborhood minima via groupBy + join-back, NOT a window: a
      // groupBy gets map-side partial aggregation (the giant
      // component's root — whose neighborhood is the whole membership
      // once stars form — combines to one row per map partition before
      // the shuffle), and the join back on u is an equi-join AQE can
      // skew-split. A window over partitionBy(u) would put that entire
      // hot neighborhood on ONE reducer with no partial combine.
      // (tried r17: pre-repartition(u) shared by the groupBy and the
      // join-back — one exchange instead of two per star op. Measured
      // SLOWER on the 5 CC queries (23.6s vs 19.8s subset): the
      // repartition exchange is not reused across the two consumers'
      // AQE stages, so it double-materializes AND loses the map-side
      // partial min. Reverted; the groupBy+join shape also keeps AQE
      // skew-split on the join-back.)
      def withMin(edges: DataFrame): DataFrame = {
        val mins = edges.groupBy("u").agg(min(col("v")).as("__mn"))
        edges.join(mins, "u")
      }
      // large-star: symmetrize; m(u) = min(N(u) ∪ {u}); emit (v, m(u))
      // for v in N(u), v > u.
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      // no distinct on the large-star output: |large| ≤ |sym|/2 by
      // construction (one emission per v>u row), the small-star's
      // groupBy(u) min combines duplicates map-side for free, and the
      // final distinct's partial aggregation dedupes (u, m) per map
      // partition before its shuffle — the removed exchange was a
      // whole extra round-trip per round for a set the next two
      // operators tolerate as a multiset (r17: −1 AQE job/round,
      // measured on the 5 CC queries)
      val large = withMin(sym)
        .withColumn("m", least(col("u"), col("__mn")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star: m(u) = min of the smaller neighborhood; emit
      // (v, m(u)) for each smaller neighbor and (u, m(u)). Large-star
      // output already satisfies u > v by construction (the emitted
      // pair is (old v, m) with m the neighborhood minimum < v), so no
      // re-orientation pass is needed.
      val dirM = withMin(large).withColumnRenamed("__mn", "m")
      // no inner distinct on the (u, m) branch: the outer distinct
      // below dedupes the union anyway — the inner one was a whole
      // extra exchange per round for nothing
      val small = dirM
        .select(col("v").as("a"), col("m").as("b"))
        .unionByName(dirM.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(col("a").as("u"), col("b").as("v"))
        .distinct()
        .localCheckpoint(false)
      val s2 = sig(small)
      converged = s2 == s
      s = s2
      e = small
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // fixpoint edges are (member, root) stars; roots appear only on the
    // right — add their self-rows
    e.select(col("u").as("node"), col("v").as("component"))
      .unionByName(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Resolve near-dup pairs into clusters and pick one canonical doc
    * per cluster (smallest id — deterministic, engine-independent).
    * Returns (doc_id, cluster_id, is_canonical) for every doc that
    * appears in at least one pair; docs with no near-dup are already
    * canonical by construction and are not repeated here. */
  def canonicalize(pairs: DataFrame, src: String, dst: String): DataFrame =
    connectedComponents(pairs, src, dst)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"),
        (col("node") === col("component")).as("is_canonical"))
}
