package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained bigram language-model scoring — the CCNet/KenLM-style
  * quality filter: train token statistics ON the corpus, then score
  * each document by its mean bigram log-probability (add-one
  * smoothing). Low scores = word-soup / boilerplate; the standard
  * perplexity gate for pre-training data.
  *
  * Scale shape: unigram/bigram counts are map-side-combined
  * aggregates; the vocabulary size joins in as ONE broadcast row off
  * the already-aggregated (checkpointed) unigram table — the corpus is
  * scanned once for counts and once for scoring. Scoring joins key on
  * bigram/term (hot boilerplate n-grams skew them — AQE skew-split
  * absorbs it), and the per-doc reduce carries one (pos, lp) pair per
  * bigram instance.
  *
  * Determinism: the per-doc sum folds its bigram log-probs in POSITION
  * order (sort_array + left fold) — a plain float sum would depend on
  * partitioning. Every arithmetic step (integer counts, one division,
  * one ln per bigram, ordered fold) replays bit-for-bit in an
  * independent engine, which is how q72's oracle hash-matches.
  *
  * Reference semantics: the quality/score surfaces over document text
  * (web_api.py title/plot projections) generalized to corpus-trained
  * scoring.
  */
object LanguageModel {

  /** Per-doc mean bigram log-prob: ln((c(w1 w2)+1) / (c(w1)+V)).
    * Returns (doc_id, n_bigrams, lp_avg, keep) for docs with at least
    * one bigram; `keep` flags lp_avg above `keepThreshold`. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  keepThreshold: Double = -7.0): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(coalesce(col(textCol), lit(""))).as("toks"))

    // bigram instances, position-stamped so the per-doc fold has a
    // deterministic order. Counting and joining key on NATIVE 64-bit
    // shingle hashes, never the bigram/term strings: equal hashes ≡
    // equal strings up to 2^-64 (the q75 span-hash argument), so every
    // count — and the resulting log-prob — is unchanged, while the
    // count exchanges and both scoring joins carry 8-byte keys instead
    // of text. Both hashes of a bigram — h2 of the window, h1 of its
    // first token — come from ONE per-doc BigramHashes array that the
    // posexplode consumes directly: selecting h1 separately
    // (element_at into a ShingleHashes(toks, 1) array, the r17 shape)
    // collapsed under Catalyst so the per-BIGRAM projection re-ran the
    // whole doc's token-hash pass per row — O(n²) hashing per doc.
    val bi = toks
      .select(col("doc_id"),
        posexplode(graft.plans.BigramHashes.bigramHashes(col("toks"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.h2").as("h2"), col("col.h1").as("h1"))

    val uni = toks.select(explode(
        graft.plans.ShingleHashes.shingleHashes(col("toks"), 1)).as("termh"))
      .groupBy(col("termh")).agg(count(lit(1)).as("c1"))
      // vocab size below reads this tiny table, not the corpus again
      .localCheckpoint(true)
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bic = bi.groupBy(col("h2")).agg(count(lit(1)).as("c2"))

    val lp = bi
      .join(bic, "h2")
      .join(uni, col("h1") === col("termh"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        log((col("c2") + lit(1L)) / (col("c1") + col("v"))).as("lp"))

    lp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(sort_array(collect_list(struct(col("pos"), col("lp")))),
            p => p.getField("lp")),
          lit(0.0), (acc, x) => acc + x).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s") / col("n_bigrams"), 4).as("lp_avg"),
        when(col("__s") / col("n_bigrams") > keepThreshold, 1L).otherwise(0L).as("keep"))
  }
}
