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
}
