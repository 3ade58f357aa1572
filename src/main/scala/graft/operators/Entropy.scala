package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-distribution entropy — the classic cheap gibberish /
  * binary-spill / encoding-damage signal in corpus quality filtering
  * (low entropy = repeated filler, high entropy near ln(alphabet) =
  * random noise; natural text sits in a stable band).
  *
  * H(doc) = ln(n) − (Σ_c count_c·ln(count_c))/n over the doc's
  * character histogram. Engine-exact by the same discipline as the
  * q72 LM fold: the Σ term folds over counts in sorted character
  * order, so both engines perform the identical sequence of IEEE
  * ops (DuckDB's list_sum is a strict left fold — verified round 6).
  *
  * Scale shape: MAP-ONLY — the histogram and its ordered fold live in
  * the one-pass native [[graft.plans.CharStats]] expression
  * (alphabet-sized JVM map per row). The first formulation exploded
  * one row PER CHARACTER and aggregated twice: the fan-out hit the
  * shuffle machinery before map-side combine could absorb it.
  */
object Entropy {

  /** Per-doc char entropy: (id, n_chars_counted, distinct_chars,
    * entropy). Docs with null/empty text produce no row. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), graft.plans.CharStats.charStats(col(textCol)).as("cs"))
      .filter(col("cs.n") > 0)
      .select(col(idCol), col("cs.n").as("n"),
        col("cs.distinct_chars").as("distinct_chars"),
        round(
          log(col("cs.n").cast("double")) -
            col("cs.sum_cln") / col("cs.n").cast("double"), 6).as("entropy"))
}
