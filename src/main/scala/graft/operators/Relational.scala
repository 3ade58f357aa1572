package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational composites mirroring the reference's materialization
  * patterns. */
object Relational {

  /** SCD1 upsert: apply `updates` over `base` keyed by `keys`, highest
    * `versionCol` wins (ties broken toward updates being later is the
    * caller's responsibility via version values). UNION + keep-latest —
    * one shuffle on the key, the MERGE INTO shape without a table
    * format (reference: periodic reference refresh batch upserts,
    * reference.py _save_items_to_dynamodb). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCol: String): DataFrame =
    Dedup.keepLatest(base.unionByName(updates), keys, versionCol, versionCol)
}
