package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * `exact = false` and every cardinality becomes an HLL register-bank
  * estimate ([[graft.plans.HllRegisters]], m=256 — the q70 sketch,
  * NOT Spark's internal HLL++, so an independent engine replays the
  * estimate bit-for-bit): one unexpanded pass, k×256 bytes of
  * aggregate state, same plan otherwise, same output schema
  * (n_distinct rounds the estimate to a long).
  */
object Profile {

  /** Profile every column of `df`. Output, one row per column,
    * ordered by column name: (col_name, n, n_null, n_distinct,
    * min_num, max_num, min_str, max_str) — numeric/timestamp ranges
    * in min_num/max_num (timestamps as epoch seconds, the
    * engine-neutral form), string ranges in min_str/max_str. */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    import graft.functions.Sketches
    val fields = df.schema.fields.toSeq
    // sketch-mode hash input: a canonical cross-engine string.
    // Timestamps hop through exact integer epoch micros (their string
    // rendering differs between engines); everything else casts
    // directly (int/date/string renderings agree, and doubles agree on
    // shortest-round-trip within non-scientific range).
    def canon(f: StructField): Column = f.dataType match {
      case _: TimestampType | _: TimestampNTZType =>
        unix_micros(col(f.name).cast("timestamp")).cast("string")
      case _ => col(f.name).cast("string")
    }
    // Sketch mode pre-projects every column's (bucket, rho) BEFORE the
    // aggregate: a TypedImperativeAggregate evaluates its child with
    // interpreted expression eval per row, so leaving the hash trees
    // inside the aggregate runs them outside codegen (measured ~10×
    // slower); as plain Project columns they stay whole-stage
    // codegen'd and the aggregate's child is one column ref (the q70
    // shape). The (bucket, rho) pair comes from the native
    // [[graft.plans.Md5BucketRho]] — bit-identical to the md5-hex
    // substring/conv/ltrim chain (same digest bits; the oracle still
    // replays the hex form), without materializing a 32-char hex
    // string per column per row (r17: the chain ran once per sketched
    // column — 9× per row on q132's orders profile).
    val pre =
      if (exact) df
      else {
        val extra = fields.map { f =>
          graft.plans.Md5BucketRho.md5BucketRho(canon(f)).as(s"${f.name}__bs")
        }
        df.select(col("*") +: extra: _*)
      }
    def nd(f: StructField) =
      if (exact) countDistinct(col(f.name))
      else graft.plans.HllRegisters.hllRegisters(
        col(s"${f.name}__bs"), Sketches.M)
    def ndOut(name: String) =
      if (exact) col(s"${name}__nd")
      else round(Sketches.hllEstimate(col(s"${name}__nd"))).cast("long")
    val statsAggs = fields.flatMap { f =>
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
      Seq(count(c).as(s"${f.name}__cnt"),
        mn.as(s"${f.name}__mn"), mx.as(s"${f.name}__mx"),
        ms.as(s"${f.name}__ms"), xs.as(s"${f.name}__xs"))
    }
    val ndAggs = fields.map(f => nd(f).as(s"${f.name}__nd"))
    // Exact mode runs the distinct counts as their OWN aggregate and
    // cross-joins the two single rows. One combined aggregate puts
    // min/max(string) — whose var-length buffers force SortAggregate —
    // over the k-fold Expand the countDistinct rewrite introduces,
    // i.e. a full (k+1)·n-row multi-key SORT before any aggregation
    // (measured 2.9s → 1.?s on q117 at sf0.1). Split, the distinct
    // pass is a pure-count HashAggregate over the Expand and the
    // stats pass is ONE keys-less (sort-free) pass over the plain
    // scan; the extra scan is 1× against the Expand's built-in (k+1)×.
    // Sketch mode has no Expand and stays a single pass.
    val row =
      if (exact)
        pre.agg(count(lit(1)).as("__n"), statsAggs: _*)
          .crossJoin(broadcast(pre.agg(ndAggs.head, ndAggs.tail: _*)))
      else
        pre.agg(count(lit(1)).as("__n"), statsAggs ++ ndAggs: _*)
    row.select(explode(array(fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"${f.name}__cnt")).as("n_null"),
        ndOut(f.name).as("n_distinct"),
        col(s"${f.name}__mn").as("min_num"),
        col(s"${f.name}__mx").as("max_num"),
        col(s"${f.name}__ms").as("min_str"),
        col(s"${f.name}__xs").as("max_str"))
    }: _*)).as("p")).select("p.*").orderBy("col_name")
  }

  /** Embedding DISTRIBUTION DRIFT between two corpus snapshots —
    * per-dimension Population Stability Index over fixed histogram
    * bins, the monitor a production embedding pipeline runs when the
    * upstream model or corpus mix changes (a new encoder checkpoint,
    * a re-weighted source mixture): PSI > 0.2 on any dimension means
    * the ANN index / classifier downstream is consuming a different
    * distribution than it was built for. Complements [[profile]]
    * (per-column scalars) and q81's source-KL (token distributions)
    * with the embedding-space check.
    *
    * PSI_d = Σ_bins (p_a − p_b) · ln(p_a / p_b), Laplace-smoothed
    * (s = 0.5 per bin) so empty bins are defined. Bins are FIXED
    * [lo, hi) intervals, clamped at the edges — data-independent, so
    * two sites histogram without coordinating (no quantile pass).
    *
    * Scale shape: posexplode is map-only; each side's histogram is
    * one partial-aggregated groupBy into (nDims × nBins) groups —
    * the only shuffle is that constant-size group set per partition,
    * the payload never moves. The PSI join and window run over
    * nDims × nBins ≤ a few thousand rows — driver-scale. Means ride
    * the same aggregate. */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String,
                     nBins: Int = 8, lo: Double = -1.0,
                     hi: Double = 1.0): DataFrame =
    psiFromHists(binnedHist(a, vecCol, nBins, lo, hi),
      binnedHist(b, vecCol, nBins, lo, hi), nBins)

  /** Fixed-bin per-dimension histogram: (dim, bin, c, sx) — the
    * MERGEABLE form of the drift monitor's state (sum two histograms
    * bin-wise and you have the histogram of the union), which is what
    * lets [[graft.streaming.DriftIngest]] maintain it incrementally
    * over a stream. Bins are clamped [lo, hi) intervals —
    * data-independent, no quantile pass. */
  def binnedHist(df: DataFrame, vecCol: String, nBins: Int = 8,
                 lo: Double = -1.0, hi: Double = 1.0): DataFrame = {
    val width = (hi - lo) / nBins
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim"),
        least(greatest(floor((col("x") - lit(lo)) / lit(width)), lit(0.0)),
          lit(nBins - 1.0)).cast("int").as("bin"),
        col("x"))
      .groupBy(col("dim"), col("bin"))
      .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"))
  }

  /** PSI + mean comparison of two [[binnedHist]] frames (a =
    * reference, b = candidate). Output identical to
    * [[embeddingDrift]], which is this over freshly-built
    * histograms. */
  def psiFromHists(ha0: DataFrame, hb0: DataFrame,
                   nBins: Int = 8): DataFrame = {
    val wDim = Window.partitionBy(col("dim"))
    // materialize both histograms once (dims × bins rows — tiny): the
    // densify grid below references each side a second time, and
    // without the checkpoint that re-runs the whole upstream subplan
    // (for embeddingDrift, a second full posexplode+aggregate scan of
    // the embedding table per side)
    val ha = ha0.select(col("dim"), col("bin"), col("c").as("ca"), col("sx").as("sxa"))
      .localCheckpoint(true)
    val hb = hb0.select(col("dim"), col("bin"), col("c").as("cb"), col("sx").as("sxb"))
      .localCheckpoint(true)
    // DENSIFY to the full dim × nBins grid before joining: smoothing
    // defines a nonzero probability for EVERY bin, so a bin empty on
    // both sides still contributes (sa−sb)·ln(sa/sb) ≠ 0 whenever the
    // two sides' totals differ — joining only observed bins would
    // silently understate PSI exactly when the reference and the
    // candidate have different row counts (the streaming-monitor
    // regime: large frozen reference vs small early stream).
    val grid = ha.select(col("dim")).union(hb.select(col("dim"))).distinct()
      .select(col("dim"), explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
    val joined = grid
      .join(ha, Seq("dim", "bin"), "left_outer")
      .join(hb, Seq("dim", "bin"), "left_outer")
      .select(col("dim"), col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("sxa"), lit(0.0)).as("sxa"),
        coalesce(col("sxb"), lit(0.0)).as("sxb"))
      .withColumn("na", sum(col("ca")).over(wDim))
      .withColumn("nb", sum(col("cb")).over(wDim))
    val s = 0.5
    val pa = (col("ca") + lit(s)) / (col("na") + lit(s * nBins))
    val pb = (col("cb") + lit(s)) / (col("nb") + lit(s * nBins))
    joined
      .withColumn("term", (pa - pb) * log(pa / pb))
      .groupBy(col("dim"))
      .agg(round(sum(col("term")), 6).as("psi"),
        round(sum(col("sxa")) / max(col("na")), 4).as("mean_a"),
        round(sum(col("sxb")) / max(col("nb")), 4).as("mean_b"))
      .withColumn("status", when(col("psi") > 0.2, "drifted")
        .when(col("psi") > 0.1, "watch").otherwise("stable"))
      .select(col("dim").cast("long").as("dim"), col("psi"),
        col("mean_a"), col("mean_b"), col("status"))
      .orderBy(col("dim"))
  }
}
