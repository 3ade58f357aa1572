package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Fixed-size token chunking with overlap — the standard document →
  * training-example transform (context windows with stride).
  *
  * Map-only: tokens are materialized ONCE per document in a projection
  * BEFORE the generator, so the per-chunk work (`slice` over the
  * materialized array) never re-tokenizes — the CollapseProject trap
  * of putting `split()` both under the generator and in the downstream
  * projection would cost O(text × chunks) per doc. No shuffle at all;
  * at 100 TB this is a pure scan → scan stage.
  */
object Chunker {

  /** Explode each document into chunks of `chunkSize` tokens starting
    * every `stride` tokens (stride < chunkSize ⇒ overlap). The final
    * partial chunk is kept; empty documents produce no chunks.
    * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text). */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(chunkSize), size(col("__toks")) - col("__start"))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }
}
