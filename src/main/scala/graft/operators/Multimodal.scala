package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns plus typed metadata —
  * the Spark-side schema, partitioning and batch shape are real; the
  * codec call itself is STUBBED with a deterministic fake (this
  * container has no image/audio libraries). Swap `decodeStub` for a real
  * codec (JNI / spawned worker) without touching the plumbing.
  *
  * Scale: decode runs inside `mapPartitions` in fixed-size batches —
  * the distributed analogue of a vectorized `mapInPandas` — so per-batch
  * codec setup cost is amortized and memory stays bounded regardless of
  * partition size.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, checksum: Long)

  val BatchSize = 64

  /** Deterministic fake decode: byte count + additive checksum. A real
    * build replaces this body with the codec invocation; signature and
    * batch contract stay identical. */
  private def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      var sum = 0L
      var i = 0
      while (i < m.payload.length) { sum += (m.payload(i) & 0xff); i += 1 }
      MediaFeatures(m.doc_id, m.payload.length.toLong, m.width, sum & 0x7fffffffL)
    }

  /** documents table → media rows: utf-8 payload as the opaque binary,
    * metadata derived deterministically from n_chars. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 64).cast("int").as("width"),
        (col("n_chars") % 48).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Batched decode pipeline. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(batch => decodeStub(batch))
    }
  }
}
