package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the data-quality audit a pipeline runs
  * before trusting a new 100 TB drop (the admin summary of
  * admin_lambda.py:31-50 deepened from table counts to per-COLUMN
  * statistics): for every column, its non-null coverage, distinct
  * cardinality, and value range, emitted as one long-format row per
  * column so downstream constraint checks (completeness floors, range
  * bands, key-uniqueness) are plain filters over the profile.
  *
  * Scale shape: ONE aggregate over ONE scan — all per-column metrics
  * are expressions of the same Aggregate node, so the table is read
  * once no matter how many columns it has; the single output row is
  * then exploded to long format (no collect, no per-column jobs).
  * The one caveat is exact distinct counts: k exact count(DISTINCT)
  * aggregates make Catalyst Expand the scan k-fold before the
  * shuffle. That is the price of exactness; at 100 TB pass
  * `exact = false` and every cardinality becomes
  * approx_count_distinct (HLL++, one unexpanded pass, ~2% error) —
  * same plan otherwise, same output schema.
  */
object Profile {

  /** Profile every column of `df`. Output, one row per column,
    * ordered by column name: (col_name, n, n_null, n_distinct,
    * min_num, max_num, min_str, max_str) — numeric/timestamp ranges
    * in min_num/max_num (timestamps as epoch seconds, the
    * engine-neutral form), string ranges in min_str/max_str. */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    def nd(f: StructField) =
      if (exact) countDistinct(col(f.name)) else approx_count_distinct(col(f.name))
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case _: NumericType => (min(c).cast("double"), max(c).cast("double"))
        case _: TimestampType => (min(c).cast("double"), max(c).cast("double"))
        // NTZ/date: hop through session-TZ timestamp (sessions here are
        // UTC) so the double is epoch seconds, the engine-neutral form
        case _: TimestampNTZType | _: DateType =>
          (min(c).cast("timestamp").cast("double"),
            max(c).cast("timestamp").cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (ms, xs) = f.dataType match {
        case _: StringType => (min(c), max(c))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(count(c).as(s"${f.name}__cnt"), nd(f).as(s"${f.name}__nd"),
        mn.as(s"${f.name}__mn"), mx.as(s"${f.name}__mx"),
        ms.as(s"${f.name}__ms"), xs.as(s"${f.name}__xs"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"${f.name}__cnt")).as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__mn").as("min_num"),
        col(s"${f.name}__mx").as("max_num"),
        col(s"${f.name}__ms").as("min_str"),
        col(s"${f.name}__xs").as("max_str"))
    }: _*)).as("p")).select("p.*").orderBy("col_name")
  }
}
