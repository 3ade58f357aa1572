package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus term statistics: TF-IDF keyword extraction.
  *
  * Generalizes the reference's per-title text fields (title/plot,
  * `web_api.py:207-216`) to corpus-scale term weighting — the
  * classic feature used for topic filtering and near-dup triage in
  * training-data pipelines.
  *
  * Scale shape: term frequencies shuffle (doc, term) pairs once
  * (map-side combined); document frequencies aggregate the already-
  * distinct (doc, term) rows by term. The corpus cardinality joins in
  * as a broadcast single row, never a driver-side collect. The df join
  * keys on term — hot boilerplate terms skew it, which AQE skew-split
  * absorbs; the final top-k windows by doc_id, a high-cardinality key
  * whose partitions stay at scan parallelism.
  */
object Terms {

  /** Top-k terms per document by tf·idf, idf = ln(N/df).
    * Deterministic: ties in score resolve by term asc. */
  def topTfidf(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), round(col("tfidf"), 6).as("tfidf"))
  }

  /** Per-source unigram-distribution KL divergence from the corpus
    * distribution: KL(P_source ‖ Q_corpus) = Σ_t p_t·ln(p_t/q_t) —
    * the domain-shift / mixture-health diagnostic run after every
    * rebalancing step (does a source's token distribution drift from
    * the blend it feeds?). P's support is a subset of Q's by
    * construction, so every term is well-defined.
    *
    * Engine-exact floats: the Σ folds per source in sorted-term order
    * (q72 discipline), and each contribution is the same op sequence
    * both engines run (two count ratios, one ln of their quotient,
    * one multiply). Scale shape: the corpus is scanned once into the
    * (source, term) count grid, which is materialized eagerly (the
    * [[Sample.mixtureBySource]] checkpoint pattern — the grid is
    * vocabulary×sources-bounded, not corpus-bounded, and without the
    * materialization Spark recomputes the corpus explode+aggregate
    * for EACH of its four consumers); global term counts, per-source
    * totals and the corpus total are all re-aggregations of the grid
    * joining back as broadcasts. Final state per source is its
    * vocabulary histogram. */
  def sourceDivergence(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val st = docs
      .select(col(sourceCol).as("source"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c_st"))
      .localCheckpoint(true)
    val global = st.groupBy("term").agg(sum(col("c_st")).as("c_t"))
    val perSource = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val total = perSource.agg(sum(col("n_s")).as("n_total"))
    val contrib = st
      .join(global, "term")
      .join(broadcast(perSource), "source")
      .crossJoin(broadcast(total))
      .withColumn("p", col("c_st").cast("double") / col("n_s").cast("double"))
      .withColumn("q", col("c_t").cast("double") / col("n_total").cast("double"))
      .withColumn("kl_term", col("p") * log(col("p") / col("q")))
    contrib
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"), count(lit(1)).as("vocab"),
        sort_array(collect_list(struct(col("term"), col("kl_term")))).as("ts"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(aggregate(col("ts"), lit(0.0), (a, s) => a + s.getField("kl_term")), 6)
          .as("kl"))
      .orderBy(col("source"))
  }

  /** DSIR-style IMPORTANCE WEIGHTS (Xie et al., NeurIPS 2023:
    * Data Selection via Importance Resampling): score every document
    * by how much its hashed-unigram distribution looks like a TARGET
    * slice versus the RAW corpus — the data-selection step that
    * up-samples target-like documents when curating a pretraining
    * mixture. log w(doc) = Σ over tokens of
    * ln( p_target(bucket) / p_raw(bucket) ), features hashed into
    * `nBuckets` md5 buckets (the fixed feature space that makes two
    * engines — and two sites — agree without a shared vocabulary).
    *
    * Determinism: the per-BUCKET log-likelihood ratio is quantized
    * ONCE to integer millionths (floor — bit-defined, engine-neutral),
    * so per-doc scores are exact integer sums — associative,
    * order-free, hash-reproducible (the VecSumLong discipline applied
    * to importance weighting). Laplace smoothing s=0.5/bucket keeps
    * empty buckets defined.
    *
    * Scale shape: two constant-size aggregates (nBuckets groups,
    * map-side combined) build the ratio table; it joins back as a
    * BROADCAST of nBuckets rows; the per-doc sum groups by doc_id —
    * tokens of a doc are co-partitioned post-explode, so partial
    * aggregation reduces each doc to one row per input partition.
    * The corpus payload never shuffles. */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     targetPred: org.apache.spark.sql.Column,
                     nBuckets: Int = 256): DataFrame = {
    val tk = docs
      .select(col(idCol).as("doc_id"), targetPred.as("is_target"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), col("is_target"),
        (conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10)
          .cast("long") % nBuckets).as("b"))
      .localCheckpoint(true) // one explode feeds counts AND the scan
    val raw = tk.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = tk.filter(col("is_target")).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    // A target predicate matching no tokens would make every ratio
    // null and the final coalesce would report logw_micro = 0 for all
    // docs — plausible-looking, meaningless weights from a misspelled
    // target slice. The totals are two constant-size aggregates over
    // the checkpointed token frame, so evaluating them here is cheap;
    // fail fast instead.
    val totals = raw.agg(sum(col("cr")).as("nr"))
      .crossJoin(tgt.agg(sum(col("ct")).as("nt"))).head()
    require(!totals.isNullAt(0) && totals.getLong(0) > 0L,
      "dsirLogWeights: corpus has no tokens")
    require(!totals.isNullAt(1) && totals.getLong(1) > 0L,
      "dsirLogWeights: target predicate matched no tokens — refusing to " +
        "emit all-zero weights for a (likely misspelled) empty target slice")
    val (nr, nt) = (totals.getLong(0), totals.getLong(1))
    val s = 0.5
    val lr = raw.join(tgt, Seq("b"), "left_outer")
      .select(col("b"),
        floor(lit(1e6) * log(
          ((coalesce(col("ct"), lit(0L)) + lit(s)) / (lit(nt) + lit(s * nBuckets))) /
            ((col("cr") + lit(s)) / (lit(nr) + lit(s * nBuckets)))))
          .cast("long").as("lr"))
    val perDoc = tk.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("logw_micro"))
    // "score EVERY document": a token-less doc (empty/whitespace text)
    // never leaves the explode, so join the per-token sums back onto
    // the full id set with an explicit zero weight — downstream
    // resampling joins on doc_id and must not silently drop rows
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
  }
}
