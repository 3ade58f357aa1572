package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Keep k rows per stratum, chosen by md5(idCol) order.
    *
    * `idCol` must be a unique INTEGRAL id (ties under md5 collision
    * resolve by id): the bounded aggregate keys on the id cast to
    * long, and a non-numeric id would cast to null — skipped by the
    * aggregate and never matched by the semi-join — silently
    * returning a partial sample. Fail fast instead. */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String, k: Int): DataFrame = {
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"Sample.stratified: idCol '$idCol' must be an integral type " +
          s"(byte/short/int/long), got ${other.sql}. Map your id to a " +
          "unique long (e.g. xxhash64) before sampling.")
    }
    val hashKey = md5(col(idCol).cast("string").cast("binary"))
    val keep = df
      .groupBy(strata.map(col): _*)
      .agg(graft.plans.BottomKIds.bottomK(
        struct(hashKey, col(idCol).cast("long")), k).as("__ids"))
      .select(explode(col("__ids")).as("__keep_id"))
    df.join(broadcast(keep), col(idCol).cast("long") === col("__keep_id"), "left_semi")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum
    * (Efraimidis–Spirakis A-ES, IPL 2006): each row gets key
    * -ln(u)/w with u a deterministic md5-uniform in (0, 1] and w its
    * weight; the k smallest keys are an exact weighted sample. Unlike
    * rate-based thinning ([[mixtureBySource]]) this yields EXACTLY k
    * rows per stratum with inclusion probability proportional to
    * weight — the "pick the 5 best-weighted docs per source" shape.
    *
    * Deterministic across runs/engines: u comes from 52 md5 bits of
    * the id ((v+1)/2^52, never 0), and -ln/division are single IEEE
    * ops. Scale shape: keys are map-only; the k winners per stratum
    * come from the bounded [[graft.plans.BottomKByScore]] aggregate
    * (k pairs of state, map-side combined), then a broadcast join
    * fetches the full rows — same posture as [[stratified]].
    *
    * Non-positive/null weights fall back to 1 (guards the key
    * against -ln(u)/0 = Inf and keeps u's ordering intact for
    * degenerate rows); positive fractional weights are honored as-is —
    * A-ES is scale-free, so normalized weights work. Adds
    * `sample_key` to the surviving rows. */
  def weighted(df: DataFrame, strata: Seq[String], idCol: String,
               weight: Column, k: Int): DataFrame = {
    val hx = md5(col(idCol).cast("string").cast("binary"))
    val v = conv(substring(hx, 1, 13), 16, 10).cast("long")
    val u = (v + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val w = weight.cast("double")
    val key = (lit(0.0) - log(u)) /
      when(w.isNull || isnan(w) || w <= 0.0, lit(1.0)).otherwise(w)
    val picks = df
      .withColumn("__aes_key", key)
      .groupBy(strata.map(col): _*)
      .agg(graft.plans.BottomKByScore.bottomKByScore(
        struct(col("__aes_key"), col(idCol).cast("long")), k).as("__picks"))
      .select(explode(col("__picks")).as("__p"))
      .select(col("__p.id").as("__keep_id"), col("__p.key").as("sample_key"))
    df.join(broadcast(picks), col(idCol).cast("long") === col("__keep_id"))
      .drop("__keep_id")
  }

  private val SplitBuckets = 1000000L

  /** The shared deterministic bucket: first 8 md5 hex chars of the id
    * string, mod [[SplitBuckets]]. ONE definition for both
    * [[hashSplit]] and [[mixtureBySource]] — their cross-operator
    * stability contract (a row keeps its fate across runs, engines and
    * operators) holds only if the bucket expression never diverges. */
  private def md5Bucket(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % SplitBuckets

  /** Temperature-weighted source rebalancing (the "data mixing" step
    * of a pre-training pipeline): thin each source group to a rate
    * proportional to n_s^0.5 / n_s — i.e. sample counts follow
    * sqrt-temperature weights (alpha = 0.5), flattening the source
    * distribution toward small sources the way multilingual /
    * multi-domain training mixes do.
    *
    * Deterministic end to end: keep decisions are md5-bucket
    * thresholds (same scheme as [[hashSplit]] — a row keeps its fate
    * across runs and engines), and the per-source rates use only
    * engine-exact arithmetic — sqrt (IEEE correctly rounded) floored
    * to integer weights so the cross-source sum is order-independent.
    *
    * Scale shape: the per-source counts are a tiny aggregate broadcast
    * back onto the scan; the thinning itself is MAP-ONLY. Returns the
    * input rows that survive, plus the computed `keep_rate`. */
  def mixtureBySource(df: DataFrame, sourceCol: String, idCol: String,
                      targetRows: Long): DataFrame = {
    // counts is ONE ROW PER SOURCE — materialize it eagerly so the
    // scalar total below reads the tiny checkpoint, not the corpus a
    // second time (exchange reuse across the two aggregates is not
    // guaranteed, and a degenerate global window would warn + single-
    // partition). The checkpoint holds #sources rows: bounded.
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      // integer weights: floor(sqrt(n)*1e6) — sqrt is correctly
      // rounded IEEE (engine-independent); the integer sum below is
      // order-independent where a double sum would not be
      .withColumn("__w", floor(sqrt(col("__n").cast("double")) * 1e6).cast("long"))
      .localCheckpoint(true)
    val rates = counts
      .crossJoin(broadcast(counts.agg(sum(col("__w")).as("__tw"))))
      .withColumn("keep_rate", least(lit(1.0),
        lit(targetRows) * col("__w") / col("__tw") / col("__n")))
      .select(col(sourceCol), col("keep_rate"))
    df.join(broadcast(rates), sourceCol)
      .filter(md5Bucket(idCol) < col("keep_rate") * SplitBuckets)
  }

  /** Deterministic train/val/test split: each row gets a stable label
    * from an md5 hash bucket of its unique id. Unlike
    * `randomSplit`, assignment is reproducible across runs, engines
    * and cluster layouts, and a row keeps its split when the dataset
    * grows (the property training pipelines need to avoid test-set
    * leakage between dataset versions). Map-only — no shuffle, no
    * state; `weights` need not be normalized. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "hashSplit needs at least one (label, weight)")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    val bucket = md5Bucket(idCol)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.round(f * SplitBuckets))
    val assign = splits.zip(cuts).init.foldRight(lit(splits.last._1): Column) {
      case (((label, _), cut), acc) => when(bucket < cut, label).otherwise(acc)
    }
    df.withColumn(splitCol, assign)
  }

  /** TOKEN-budgeted mixture sampling — the "fill a pre-training token
    * budget" step: given per-source token masses, apportion a global
    * token budget across sources by sqrt-temperature weights (the
    * [[mixtureBySource]] α=0.5 rule at TOKEN granularity, flattening
    * dominant sources), then within each source keep documents in
    * deterministic md5 order while the running token total fits the
    * source's budget. Rate-based thinning ([[mixtureBySource]]) hits a
    * ROW target in expectation; training runs are provisioned in
    * TOKENS, and this hits the token budget exactly (to one document).
    *
    * Engine-exact by construction: weights are integer-quantized
    * floor(sqrt(tokens)·1e6) (one correctly-rounded IEEE sqrt each),
    * budgets are exact integer arithmetic in DECIMAL(38,0) —
    * (total div budgetDiv) · w div Σw — and the selection order is
    * (md5-derived 60-bit int, id), so the oracle replays every step.
    *
    * Scale shape: per-source totals are one small aggregate
    * (#sources rows, checkpointed, broadcast back); the running
    * total is [[Pack.shardedCumSum]] — bucket-parallel two-phase
    * prefix sums, never a one-reducer-per-source window over the
    * corpus; the keep decision is map-only against the broadcast
    * budget frame.
    *
    * @param tokensCol per-row token count (e.g.
    *                  `lexTokenCount(text).ws_tokens`); nulls count 0
    * @param budgetDiv global budget = total tokens div budgetDiv
    * @return input rows + (n_tokens, cum_tokens, budget, kept) */
  def tokenBudgetMixture(df: DataFrame, sourceCol: String, idCol: String,
                         tokensCol: Column, budgetDiv: Long = 2L): DataFrame = {
    require(budgetDiv > 0, "budgetDiv must be positive")
    val base = df
      .withColumn("n_tokens", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("__ord",
        conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long"))
    // one row per source — bounded; checkpoint so the grand total
    // reads the tiny frame, not the corpus again
    val totals = base.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("__ts"))
      .withColumn("__w", floor(sqrt(col("__ts").cast("double")) * 1e6).cast("long"))
      .localCheckpoint(true)
    val budgets = totals
      .crossJoin(broadcast(totals.agg(
        sum(col("__ts")).as("__tts"), sum(col("__w")).as("__tw"))))
      .withColumn("budget",
        expr(s"(CAST(__tts div ${budgetDiv}L AS DECIMAL(38,0)) * __w) div __tw"))
      .select(col(sourceCol), col("budget"))
    val cum = Pack.shardedCumSum(
      base.join(broadcast(budgets), sourceCol),
      sourceCol, "__ord", idCol, "n_tokens", "cum_tokens")
    cum.withColumn("kept", col("cum_tokens") <= col("budget"))
      .drop("__ord")
  }

  /** Cluster-aware train/val/test split — [[hashSplit]] keyed on the
    * near-dup CLUSTER id instead of the document id, so every member
    * of a near-duplicate cluster lands in the SAME split. A per-doc
    * split leaks: two near-identical documents can straddle train and
    * test, and the model is then evaluated on (a paraphrase of) its
    * own training data. Splitting by cluster representative is the
    * standard guard (the reference dedups per key —
    * consumer.py:57-92 — before its data ever reaches consumers; a
    * training pipeline must extend that to near-dup groups).
    *
    * @param clusters (docCol, clusterCol) membership rows — e.g.
    *                 [[graft.operators.Cluster.canonicalize]] output.
    *                 Docs absent from it are singletons: their own id
    *                 is their cluster, so they split exactly as
    *                 [[hashSplit]] would.
    *
    * Scale shape: the cluster map holds only docs that have a near-dup
    * edge — a small fraction of the corpus — so the left join is a
    * hash join AQE sizes (broadcast when small), followed by the
    * map-only bucket assignment. The corpus itself shuffles zero
    * times. Determinism: cluster ids are the component-minimum doc id
    * (engine-independent), and the md5 bucket is the shared
    * [[hashSplit]] contract — so the assignment is stable across
    * runs, engines and dataset versions. */
  def clusterAwareSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                        docCol: String, clusterCol: String,
                        splits: Seq[(String, Double)],
                        splitCol: String = "split"): DataFrame = {
    val cmap = clusters.select(col(docCol).cast("long").as("__ca_doc"),
      col(clusterCol).cast("long").as("__ca_cluster"))
    val keyed = df.join(cmap, df(idCol).cast("long") === col("__ca_doc"), "left")
      .withColumn("cluster_id", coalesce(col("__ca_cluster"), col(idCol).cast("long")))
      .drop("__ca_doc", "__ca_cluster")
    hashSplit(keyed, "cluster_id", splits, splitCol)
  }
}
