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
  * Scale shape: explode→count shuffles on (doc_id, char) — keys a few
  * bytes wide with ≤ alphabet-size distinct chars per doc — then one
  * per-doc reduce whose state is the ≤ alphabet-sized histogram.
  * Map-side combine absorbs the char-instance fan-out.
  */
object Entropy {

  /** Per-doc char entropy: (id, n_chars_counted, distinct_chars,
    * entropy). Docs with null/empty text produce no row. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
    counts
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("distinct_chars"),
        sort_array(collect_list(struct(col("ch"), col("c")))).as("cs"))
      .select(col(idCol), col("n"), col("distinct_chars"),
        round(
          log(col("n").cast("double")) -
            aggregate(col("cs"), lit(0.0),
              (a, s) => a + s.getField("c").cast("double") *
                log(s.getField("c").cast("double"))) / col("n").cast("double"),
          6).as("entropy"))
  }
}
