package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-rank sampling: rank rows per stratum by a cryptographic hash of
  * a unique id and keep the first k. Unlike `rand()`-based sampling the
  * result is stable across runs, executors and engines — a requirement
  * for reproducible training sets — and unlike `TABLESAMPLE` it gives
  * exactly-k per group.
  *
  * Scale shape: the k winners per stratum are picked by the bounded
  * [[graft.plans.BottomKIds]] aggregate (buffer holds k pairs, combines
  * map-side, shuffle carries k×strata×partitions rows), then a
  * broadcast semi-join fetches the full rows — no per-stratum global
  * sort, so parallelism is independent of the stratum count. A window
  * formulation would put each stratum's entire population on a single
  * reducer.
  */
object Sample {

  /** Keep k rows per stratum, chosen by md5(idCol) order (id must be
    * unique across `df`; ties under md5 collision resolve by id). */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String, k: Int): DataFrame = {
    val hashKey = md5(col(idCol).cast("string").cast("binary"))
    val keep = df
      .groupBy(strata.map(col): _*)
      .agg(graft.plans.BottomKIds.bottomK(
        struct(hashKey, col(idCol).cast("long")), k).as("__ids"))
      .select(explode(col("__ids")).as("__keep_id"))
    df.join(broadcast(keep), col(idCol).cast("long") === col("__keep_id"), "left_semi")
  }
}
