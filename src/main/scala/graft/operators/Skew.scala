package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles most cases at runtime; saltedJoin is
  * the explicit form for joins where one key dominates (the reference's
  * `source:<s>:genre:<g>` index has exactly this shape — popular
  * source/genre pairs hold most titles). The fact side gains a
  * deterministic salt in [0, saltFactor); the dim side is replicated
  * saltFactor×, so a hot key spreads over saltFactor reducers.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted. `dim` is the small side
    * (replication cost = saltFactor × |dim|). Result equals the plain
    * inner join row-for-row. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltFactor: Int): DataFrame = {
    // salt from the whole fact row: deterministic, uniform, and not a
    // function of the key alone (which would just move the hot spot)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toSeq.map(col): _*)), lit(saltFactor.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
