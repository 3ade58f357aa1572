package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing AND real codec
  * paths.
  *
  * Media travel as opaque `binary` payload columns plus typed
  * metadata. Two tiers live here:
  *  - REAL codecs through the JDK's own libraries: PNG encode/decode
  *    via javax.imageio ([[decodeImageStats]], [[dhash]]) and 16-bit
  *    PCM WAV via javax.sound ([[decodeAudioStats]]) — byte-true
  *    decode paths whose oracles replay the closed-form pixel/sample
  *    generators, proving codec fidelity end to end;
  *  - a deterministic `decodeStub` tier for formats whose codecs this
  *    container lacks (JPEG/video): schema, partitioning and batch
  *    shape are real; swap the stub body for the codec (JNI / spawned
  *    worker) without touching the plumbing.
  *
  * Scale: decode runs inside `mapPartitions` in fixed-size batches —
  * the distributed analogue of a vectorized `mapInPandas` — so
  * per-batch codec setup cost is amortized and memory stays bounded
  * regardless of partition size; SPI caching is per-partition and the
  * input repartitions to core count before the decode stage (the
  * q130 24× fix).
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

  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Long)

  /** Feature-extract stub: 16-bin byte histogram, L1-normalized — a
    * deterministic stand-in for a real image/audio embedding model.
    * Output feeds the ANN/near-dup operators unchanged (same
    * Array[Float] embedding shape as the embeddings table). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < m.payload.length) { hist((m.payload(i) & 0xff) >> 4) += 1f; i += 1 }
        val n = math.max(1, m.payload.length).toFloat
        MediaEmbedding(m.doc_id, hist.map(_ / n))
      })
    }
  }

  /** Resize stub: every-other-byte downscale, halved dimensions —
    * stands in for an image resample; batch contract identical. */
  def resize(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val out = new Array[Byte]((m.payload.length + 1) / 2)
        var i = 0
        while (i < out.length) { out(i) = m.payload(i * 2); i += 1 }
        MediaRow(m.doc_id, out, m.width / 2, m.height / 2)
      })
    }
  }

  /** Frame-sample stub: treat the payload as a frame stream
    * (frameBytes per frame), keep every `stride`-th frame — the video
    * path's explode shape (one row per sampled frame). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = m.payload.length / frameBytes
      (0 until nFrames by stride).map { f =>
        Frame(m.doc_id, f, math.min(frameBytes, m.payload.length - f * frameBytes).toLong)
      }
    }
  }

  // ---- Real image decode (javax.imageio — no external dependency) ----

  case class ImageRow(doc_id: Long, png: Array[Byte])
  case class ImageStats(doc_id: Long, img_w: Int, img_h: Int,
                        r_mean: Double, g_mean: Double, b_mean: Double)

  /** Per-pixel channel values of the generated test images — shared by
    * the PNG writer and the oracle contract: pixel i of doc `id` is
    * (r, g, b) = ((id·31 + i·7) % 256, (id·17 + i·11) % 256,
    * (id·13 + i·5) % 256). Closed-form in (id, i), so an independent
    * engine replays the decoded channel statistics without decoding
    * anything — which is what makes a REAL codec path oracle-able. */
  @inline private def pixel(id: Long, i: Long): (Int, Int, Int) =
    (((id * 31 + i * 7) % 256).toInt,
     ((id * 17 + i * 11) % 256).toInt,
     ((id * 13 + i * 5) % 256).toInt)

  /** documents table → REAL PNG payloads: a decodable image per doc,
    * dimensions from n_chars (w = 8 + n_chars%24, h = 8 + n_chars%16),
    * pixels from [[pixel]]. PNG is lossless RGB, so the bytes
    * round-trip exactly through any compliant decoder — the generated
    * corpus stands in for enrichment.py:60-67's poster fetches with
    * value-stable content. Encoding runs batched in mapPartitions like
    * every other codec call here. */
  def pngFromDocuments(docs: DataFrame): Dataset[ImageRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        (lit(8) + col("n_chars") % 24).cast("int").as("w"),
        (lit(8) + col("n_chars") % 16).cast("int").as("h"))
      // codec stages are CPU-bound, not byte-bound: partition by CORES.
      // Packed small parquet files land in 1-2 byte-sized partitions
      // (maxPartitionBytes), which would run the per-row codec work
      // nearly single-threaded; shuffling the 16-byte pre-codec rows
      // is free and unlocks full parallelism for the encode AND every
      // decode stage pipelined after it.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        // resolve the PNG writer ONCE per partition and stream to
        // memory: ImageIO.write probes the writer registry per call
        // AND spools through a disk-backed cache file per image —
        // both serialize/throttle 32 executor threads (the same
        // lesson as the audio SPI caching; q98/q123 sf1 times dropped
        // ~10× when this landed)
        val writer = pngWriter()
        it.grouped(BatchSize).flatMap(_.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0L
          while (i < w.toLong * h) {
            val (r, g, b) = pixel(id, i)
            img.setRGB((i % w).toInt, (i / w).toInt, (r << 16) | (g << 8) | b)
            i += 1
          }
          ImageRow(id, encodePng(writer, img))
        })
      }
  }

  /** Per-partition PNG codec plumbing (see the scaladoc above): one
    * writer/reader instance per partition (they are single-thread
    * objects), explicit MEMORY-cache image streams so no temp file is
    * ever touched. */
  private def pngWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

  private def pngReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

  private def encodePng(writer: javax.imageio.ImageWriter,
                        img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally ios.close()
    bos.toByteArray
  }

  /** Decode one PNG, attaching the document identity to any codec
    * failure (ImageReader.read throws rather than returning null, so
    * without this the "which doc is bad" diagnostic would be lost in
    * a bare IIOException). */
  private def decodePng(reader: javax.imageio.ImageReader,
                        bytes: Array[Byte],
                        docId: Long): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } catch {
      case e: Exception =>
        throw new java.io.IOException(s"doc $docId is not a decodable image", e)
    } finally iis.close()
  }

  /** REAL decode: `javax.imageio.ImageIO.read` over the binary column,
    * batched in mapPartitions (fixed-size batches bound memory; codec
    * setup amortizes per batch, the mapInPandas shape). Emits decoded
    * dimensions and exact per-channel means — integer pixel sums in
    * long arithmetic, one double division at the end, so the oracle's
    * closed-form replay matches bit-for-bit. Decode failures surface
    * with the doc id rather than as a silent skip. */
  def decodeImageStats(images: Dataset[ImageRow]): Dataset[ImageStats] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      val reader = pngReader() // per-partition (see encode scaladoc)
      it.grouped(BatchSize).flatMap(_.map { m =>
        val img = decodePng(reader, m.png, m.doc_id)
        val (w, h) = (img.getWidth, img.getHeight)
        var (rs, gs, bs) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        ImageStats(m.doc_id, w, h, rs / n, gs / n, bs / n)
      })
    }
  }

  // ---- Real audio decode (javax.sound.sampled — no external dep) ----

  case class AudioRow(doc_id: Long, wav: Array[Byte])
  case class AudioStats(doc_id: Long, n_samples: Long, peak: Int,
                        sum_sq: Long, zero_crossings: Long)

  /** Sample i of doc `id` — the closed form shared by the WAV writer
    * and the oracle contract (the audio analog of [[pixel]]):
    * a signed 16-bit value ((id·7919 + i·104729) mod 65536) − 32768.
    * PCM WAV is lossless, so the bytes round-trip exactly through any
    * compliant decoder — which is what makes a REAL audio codec path
    * oracle-able. */
  @inline private def pcmSample(id: Long, i: Long): Int =
    ((id * 7919 + i * 104729) % 65536).toInt - 32768

  /** documents table → REAL 16-bit mono PCM WAV payloads (8 kHz,
    * little-endian), n = 256 + n_chars%512 samples from [[pcmSample]].
    * Encoded through javax.sound's own WAVE writer, batched in
    * mapPartitions like every codec call here — the audio half of the
    * reference's media columns (enrichment.py:60-67 fetches media
    * URLs; this generates value-stable stand-ins). */
  def wavFromDocuments(docs: DataFrame): Dataset[AudioRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        (lit(256) + col("n_chars") % 512).cast("int").as("n"))
      // CPU-bound codec work: partition by cores, not bytes (see
      // pngFromDocuments — the same 16-byte pre-codec shuffle)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .as[(Long, Int)]
      .mapPartitions { it =>
        // resolve the WAVE writer ONCE per partition via the public
        // SPI: AudioSystem.write goes through a synchronized provider
        // registry per call, which serializes 32 executor threads
        // (measured ×15.6 at the 10× bench point before this)
        val writer = {
          val sl = java.util.ServiceLoader.load(
            classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
          var w: javax.sound.sampled.spi.AudioFileWriter = null
          while (w == null && sl.hasNext) {
            val c = sl.next()
            if (c.isFileTypeSupported(
                javax.sound.sampled.AudioFileFormat.Type.WAVE)) w = c
          }
          require(w != null, "no WAVE AudioFileWriter provider")
          w
        }
        it.grouped(BatchSize).flatMap(_.map { case (id, n) =>
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = pcmSample(id, i)
            data(2 * i) = (s & 0xff).toByte
            data(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            true /*signed*/, false /*littleEndian*/)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          AudioRow(id, bos.toByteArray)
        })
      }
  }

  /** REAL decode: `AudioSystem.getAudioInputStream` over the binary
    * column — sample count, peak amplitude, energy (exact integer
    * sum of squares) and zero crossings, all integer stats so the
    * oracle's closed-form replay matches bit-for-bit. Decode failures
    * surface with the doc id. */
  def decodeAudioStats(audio: Dataset[AudioRow]): Dataset[AudioStats] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { it =>
      // same per-partition SPI caching as the writer, PLUS first-hit
      // reader memoization: probing every provider per clip funnels
      // through the non-audio readers' synchronized machinery (the
      // MIDI reader's provider lookup serializes all executor
      // threads — measured 100 → 3.2 µs/clip wall at 16 threads when
      // the accepting reader is resolved once and reused)
      val readers = {
        val sl = java.util.ServiceLoader.load(
          classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
        while (sl.hasNext) b += sl.next()
        b.result()
      }
      var cached: javax.sound.sampled.spi.AudioFileReader = null
      def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
        if (cached != null)
          try return cached.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        readers.foreach { r =>
          try {
            val a = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            cached = r
            return a
          } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        }
        sys.error("no AudioFileReader provider accepted the clip")
      }
      it.grouped(BatchSize).flatMap(_.map { m =>
        val ais = open(m.wav)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"decodeAudioStats: doc ${m.doc_id} is not 16-bit mono PCM")
        val bytes = try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var r = ais.read(buf)
          while (r >= 0) { bos.write(buf, 0, r); r = ais.read(buf) }
          bos.toByteArray
        } finally ais.close()
        val n = bytes.length / 2
        var (sumSq, zc) = (0L, 0L)
        var peak = 0
        var prev = 0
        var i = 0
        while (i < n) {
          val s =
            if (fmt.isBigEndian)
              (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
            else
              (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          val a = if (s < 0) -s else s
          if (a > peak) peak = a
          sumSq += s.toLong * s
          if (i > 0 && ((prev < 0) != (s < 0))) zc += 1
          prev = s
          i += 1
        }
        AudioStats(m.doc_id, n.toLong, peak, sumSq, zc)
      })
    }
  }

  case class ImageHash(doc_id: Long, img_w: Int, img_h: Int, dhash: Long)

  /** Perceptual DIFFERENCE HASH (dHash) over the REAL decode path —
    * the image-dedup fingerprint (Krawetz's gradient hash): sample the
    * decoded image on a fixed 8×8 luma grid (nearest-neighbor
    * sampling, integer arithmetic — no resampling kernel to
    * replicate), then emit one bit per horizontal gradient
    * (luma[x+1] > luma[x], 7 bits × 8 rows = 56 bits — deliberately
    * not 64 so the hash never touches the sign bit in any engine).
    * Brightness-invariant by construction (a constant luma shift
    * preserves every comparison), which is what makes it a PERCEPTUAL
    * hash rather than a byte hash: re-encoded or brightness-adjusted
    * copies collide, and near-copies sit at small hamming distance —
    * feed [[graft.operators.Dedup]]'s banding for the pair join at
    * corpus scale. Map-only, batched like every codec call here.
    *
    * Luma = (299·r + 587·g + 114·b) / 1000 in integer arithmetic
    * (floor — positive operands, so `/` and `//` agree across
    * engines); grid point (gx, gy) reads pixel
    * (gx·w / 8, gy·h / 8), integer division. */
  def dhash(images: Dataset[ImageRow]): Dataset[ImageHash] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      val reader = pngReader() // per-partition (see encode scaladoc)
      it.grouped(BatchSize).flatMap(_.map { m =>
        val img = decodePng(reader, m.png, m.doc_id)
        val (w, h) = (img.getWidth, img.getHeight)
        def luma(gx: Int, gy: Int): Int = {
          val p = img.getRGB(gx * w / 8, gy * h / 8)
          (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
            (p & 0xff) * 114) / 1000
        }
        var hash = 0L
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 7) {
            if (luma(gx + 1, gy) > luma(gx, gy)) hash |= 1L << (gy * 7 + gx)
            gx += 1
          }
          gy += 1
        }
        ImageHash(m.doc_id, w, h, hash)
      })
    }
  }
}
