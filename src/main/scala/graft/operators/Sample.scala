package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-rank sampling: rank rows per stratum by a cryptographic hash of
  * a unique id and keep the first k. Unlike `rand()`-based sampling the
  * result is stable across runs, executors and engines — a requirement
  * for reproducible training sets — and unlike `TABLESAMPLE` it gives
  * exactly-k per group. One shuffle on the stratum key.
  */
object Sample {

  /** Keep k rows per stratum, chosen by md5(idCol) order. */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
