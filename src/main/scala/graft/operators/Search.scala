package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Full-text retrieval scoring: BM25 top-k documents per query — the
  * classic inverted-index ranking function (Robertson–Spärck Jones;
  * the Lucene-parameterized form with idf = ln(1 + (N-df+.5)/(df+.5))).
  * In a training-data pipeline this is the retrieval half of
  * decontamination audits and targeted corpus slicing.
  *
  * Scale shape: tf/df/doc-length are map-side-combined aggregates over
  * one corpus scan; the query-term set is tiny and BROADCAST onto the
  * posting lists (the corpus never shuffles for the probe side);
  * scalars (N, avgdl) ride along as one broadcast row off the
  * already-aggregated doc-length table. Per-query top-k uses the
  * bounded [[graft.plans.BottomKByScore]] aggregate on the NEGATED
  * score — k pairs of state per query, map-side combined — never a
  * per-query window over every matching document.
  *
  * Determinism: per-(query, doc) contributions fold in term order
  * (each is a few IEEE ops over exact integers), avgdl is an exact
  * integer sum over count, and ranking compares unrounded doubles —
  * all replayable in an independent engine (q74's oracle).
  */
object Search {

  /** Top-k docs per query by BM25. Returns (qid, rank, doc_id, score). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._

    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(coalesce(col(textCol), lit("")))).as("term"))
    // tf and df matter ONLY for the query terms, so the token stream
    // is pre-filtered with the literal term set (a pushable map-side
    // In predicate) BEFORE any aggregation — the pre-r17 shape
    // aggregated (doc_id, term) over the WHOLE vocabulary and then
    // df over that, two corpus-wide string-keyed shuffles whose rows
    // were immediately discarded by the qterms join. Per-query-term
    // df/tf values are identical; only the rows that never matched
    // disappear. The doc-length pass is the one remaining full scan
    // (every doc's dl and the corpus avgdl are genuinely needed).
    val qtermList = queries.flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
    val qtoks = toks.filter(col("term").isin(qtermList: _*))
    val tf = qtoks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      // scalars below read this tiny table, not the corpus again
      .localCheckpoint(true)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scalars = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))

    val qterms = queries.toDF("qid", "qtext")
      .select(col("qid"), explode(TextFunctions.tokens(col("qtext"))).as("term"))
      .distinct()

    val contrib = tf
      .join(broadcast(qterms), "term")
      .join(dfreq, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scalars))
      .select(col("qid"), col("doc_id"), col("term"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
            (col("sum_dl").cast("double") / col("n_docs"))))).as("c"))

    val scored = contrib.groupBy(col("qid"), col("doc_id"))
      .agg(aggregate(
        transform(sort_array(collect_list(struct(col("term"), col("c")))),
          p => p.getField("c")),
        lit(0.0), (acc, x) => acc + x).as("score"))

    scored.groupBy(col("qid"))
      .agg(graft.plans.BottomKByScore.bottomKByScore(
        struct((lit(0.0) - col("score")).as("nk"), col("doc_id")), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"),
        round(lit(0.0) - col("col.key"), 4).as("score"))
  }
}
