package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over edge lists — the link-analysis tier
  * of the engine. The reference ranks titles by a scalar rating
  * (web_api.py get_recommendations, user_rating > 7); PageRank is the
  * structural upgrade a catalog-scale recommender runs over the
  * co-engagement graph ("viewers of A also watched B") where no
  * per-item score exists.
  *
  * The whole computation is INTEGER arithmetic (ranks in millionths,
  * integral `div` for the per-edge share, exact long sums) so the
  * result is bit-deterministic under any partitioning / AQE plan and
  * an independent engine replays it exactly — the same trick as the
  * Lloyd/PQ trainers ([[graft.plans.VecSumLong]]).
  *
  * Scale shape per iteration: ranks ⋈ out-degree (co-partitioned on
  * the vertex), ranks ⋈ edges on src (the one big shuffle — edges
  * partitioned by src), then a partial-aggregating groupBy dst. No
  * driver-side state: the rank table never leaves the cluster, and
  * iterations compose as plan stages (unrolled, AQE re-plans each
  * exchange). Vertices with no in-edges keep the damping floor via
  * the left join.
  */
object Graph {

  /** `iterations` rounds of damped PageRank over the directed edge
    * list `edges(srcCol, dstCol)` (pre-deduplicated; parallel edges
    * count double). Rank unit: `scale` = 1.0. Update rule, all in
    * long arithmetic:
    *
    *   share(u)  = rank(u) div outdeg(u)
    *   rank'(v)  = (scale * (den-num)) div den
    *             + (num * Σ_{(u,v)∈E} share(u)) div den
    *
    * with damping num/den (default 85/100). Returns (vertex, rank)
    * for every vertex of the edge list. */
  /** @param dedupEdges when true, duplicate (src, dst) rows are
    *        dropped INSIDE the operator's own src-partitioned
    *        exchange: hash(src) clusters equal (src, dst) rows, so
    *        the dedup aggregate runs in-partition with NO exchange of
    *        its own. A caller that `.distinct()`s before passing
    *        edges pays a second full-edge shuffle (hash(src, dst) for
    *        the distinct, then hash(src) here) — at 100× the bench SF
    *        that second exchange was ~40% of q115's edge pipeline. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int, dampNum: Long = 85L, dampDen: Long = 100L,
                  scale: Long = 1000000L, dedupEdges: Boolean = false): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Materialize the loop-invariant frames ONCE. Without this the
    // unrolled plan re-derives the edge list in every iteration's
    // join AND both vertex branches (measured: 56 parquet scans / 28
    // exchanges for 3 iterations before caching). Iterative-by-action
    // is the right shape for a fixpoint operator: each round's ranks
    // are persisted and counted, the previous round's cache dropped —
    // lineage stays one round deep, like GraphX/Pregel loops.
    // The edge list is the BIG side of every iteration's join, and the
    // join key never changes — so cache it already hash-partitioned on
    // src. The cached partitioning satisfies each round's distribution
    // requirement and the per-iteration Exchange of the full edge list
    // disappears (GraphSpec pins the plan): iterations shuffle only
    // the ranks (O(V)) and the per-edge shares into groupBy(dst).
    // (A stats-sized explicit partition count for this exchange was
    // measured at 100× bench SF and REJECTED: REPARTITION_BY_NUM is
    // exempt from AQE coalescing, the explode pipeline's size estimate
    // overshoots, and the extra partitions cost more in cache blocks +
    // per-iteration scheduling than the dedup spill they saved —
    // 74.6s → 87.1s. The plain hash(src) repartition stands.)
    val eRaw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
    val e = (if (dedupEdges) eRaw.dropDuplicates("src", "dst") else eRaw)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The out-degree is LOOP-INVARIANT, so it rides INSIDE the rank
    // table: (vertex, deg, rank). The pre-r17 loop joined ranks ⋈
    // outDeg every round to form the shares — one whole join (and its
    // exchanges/broadcast build) per iteration for a value that never
    // changes; with deg in the iterate, shares are a map-only
    // projection of the cached ranks.
    // per-side distinct BEFORE the union: the src side dedupes with NO
    // exchange (the cache is hash(src)-partitioned), the dst side
    // shuffles |V|-bounded partials instead of |E| raw rows, and the
    // outer distinct then sees ≤ 2|V| rows — where distinct-after-
    // union shuffled the full 2|E| vertex stream
    val vertices = e.select(col("src").as("vertex")).distinct()
      .union(e.select(col("dst").as("vertex")).distinct()).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val floor = (scale * (dampDen - dampNum)) / dampDen
    var ranks = vertices
      .join(outDeg, vertices("vertex") === outDeg("src"), "left")
      .select(col("vertex"), coalesce(col("deg"), lit(0L)).as("deg"),
        lit(scale).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count() // one action materializes e + the initial iterate
    var prev: DataFrame = ranks
    for (_ <- 1 to iterations) {
      // fresh aliases each round: every frame below descends from `e`,
      // so joins go through renamed columns, never same-lineage attrs
      val shares = ranks.filter(col("deg") > 0)
        .select(col("vertex").as("share_src"), expr("rank div deg").as("share"))
      val incoming = e.join(shares, col("src") === col("share_src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("s"))
        .select(col("dst").as("in_dst"), col("s"))
      val next = ranks
        .join(incoming, col("vertex") === col("in_dst"), "left")
        .select(col("vertex"), col("deg"),
          (lit(floor) +
            expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
            .as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      prev.unpersist(false)
      prev = next
      ranks = next
    }
    // the returned frame is materialized in cache; the loop-invariant
    // edge list can be released now (recompute path stays correct if
    // the cache is ever evicted). Callers running many invocations
    // should unpersist the result when done.
    e.unpersist(false)
    ranks.select(col("vertex"), col("rank"))
  }
}
