package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Streaming embedding-drift monitor — q121's PSI check run
  * CONTINUOUSLY over an embedding stream: every micro-batch folds its
  * vectors into a cumulative per-dimension histogram and publishes the
  * PSI of (everything seen so far) against a frozen REFERENCE
  * histogram — the live alarm that fires the day a new encoder
  * checkpoint (or an upstream corpus-mix change) starts shipping
  * vectors the serving-side ANN index was not built for. The streaming
  * sibling of [[DedupIngest]] (state is a parquet STORE, not the state
  * store) built on [[graft.operators.Profile.binnedHist]]'s mergeable
  * form: histograms sum bin-wise, so per-batch work is
  * O(batch + dims × bins) and the stream's history is never re-read.
  *
  * Layout under `storePath`: `hist/batch=N/` — batch N's OWN histogram
  * (dim, bin, c, sx); `psi/batch=N/` — the monitor row per dimension
  * after folding batch N in.
  *
  * Exactly-once from at-least-once: a replayed batch id overwrites
  * exactly its own `batch=N` directories (dynamic partition
  * overwrite), and the cumulative fold reads the per-batch histograms
  * EXCLUDING the replaying id before adding the recomputed one — so
  * whatever the crash point, the replay writes the same bytes
  * ([[DedupIngest]]'s discipline; the spec proves streamed ≡ one-shot
  * and worst-point replay stability).
  */
object DriftIngest {

  /** Build + persist the frozen reference histogram once. */
  def writeReference(ref: DataFrame, vecCol: String, path: String,
                     nBins: Int = 8, lo: Double = -1.0,
                     hi: Double = 1.0): Unit =
    Profile.binnedHist(ref, vecCol, nBins, lo, hi)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** The foreachBatch sink:
    * {{{
    * vecs.writeStream
    *   .foreachBatch(DriftIngest.sink(refPath, storePath, "embedding"))
    *   .option("checkpointLocation", ckpt).start()
    * }}}
    */
  def sink(refPath: String, storePath: String, vecCol: String,
           nBins: Int = 8, lo: Double = -1.0, hi: Double = 1.0)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val sp = batch.sparkSession
    if (!batch.isEmpty) {
      val saved =
        sp.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        val bh = Profile.binnedHist(batch, vecCol, nBins, lo, hi)
          .withColumn("batch", lit(batchId))
        graft.sources.Sinks.writePartitioned(
          bh, s"$storePath/hist", Seq("batch"))
        // cumulative = Σ per-batch histograms; exclude the replaying
        // id from the READ and add the recomputed frame instead, so a
        // replay after a partial crash folds each batch exactly once
        val histRoot = new Path(s"$storePath/hist")
        val prior = sp.read.parquet(histRoot.toString)
          .filter(col("batch") =!= batchId)
          .select(col("dim"), col("bin"), col("c"), col("sx"))
        val cum = prior
          .unionByName(bh.select(col("dim"), col("bin"), col("c"), col("sx")))
          .groupBy(col("dim"), col("bin"))
          .agg(sum(col("c")).as("c"), sum(col("sx")).as("sx"))
        val ref = sp.read.parquet(refPath)
        val psi = Profile.psiFromHists(ref, cum, nBins)
          .withColumn("batch", lit(batchId))
        graft.sources.Sinks.writePartitioned(
          psi, s"$storePath/psi", Seq("batch"))
      } finally saved.fold(
        sp.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    }
  }
}
