package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages as partition-streaming transforms.
  *
  * IMAGE decode and resize are REAL — the JDK's javax.imageio codec
  * (PNG/JPEG/BMP/GIF) runs inside the partition stream, and the synthetic
  * media table carries genuine PNG payloads to exercise it. Audio/video
  * kernels remain STUBS (no ffmpeg in this container), implemented as
  * deterministic functions of the payload bytes and clearly marked below.
  * Everything AROUND the kernels is the real engineering and is real here:
  *  - schema: (media_id, kind, payload binary, meta struct) — the shape a
  *    100 TB media lake table has;
  *  - `mapPartitions` with Iterator-to-Iterator streaming (the Scala
  *    analogue of mapInPandas batch processing: rows stream through the
  *    decoder without materializing a partition in memory);
  *  - partition sizing: payloads are large, so stages repartition by
  *    byte budget, not row count, before CPU-heavy decode.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
                         source: String)
  final case class Decoded(media_id: Long, kind: String, width: Int,
                           height: Int, channels: Int, n_bytes: Long)
  final case class MediaFeature(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Derive a deterministic media table from `documents` (the harness has
    * no binary table): kind cycles by doc_id; `image` rows carry a REAL
    * deterministic PNG payload and `audio` rows a REAL PCM WAV payload
    * (so the decode stages exercise genuine codecs); `video` keeps the
    * UTF-8 text bytes as an opaque payload (no video codec in the JDK).
    */
  def syntheticMedia(documents: DataFrame): Dataset[Media] = {
    implicit val enc: Encoder[Media] = Encoders.product[Media]
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"))
      .as[Media]
      .mapPartitions(_.map { m =>
        if (m.kind == "image") m.copy(payload = syntheticPng(m.media_id))
        else if (m.kind == "audio") m.copy(payload = syntheticWav(m.media_id))
        else m
      })
  }

  /** Deterministic small PNG for a media id: dimensions and pixel pattern
    * are pure functions of the id, encoded by the JDK's ImageIO — a real
    * compressed PNG byte stream, not a fake payload.
    */
  private[ops] def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 32).toInt
    val h = 8 + (id % 24).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (id * 31 + x * 7 + y * 131) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Rebalance by payload bytes ahead of CPU-heavy decode: target
    * ~`targetBytes` per partition so one giant video cannot straggle a
    * task while 4 KB thumbnails idle elsewhere.
    *
    * The byte budget comes from Catalyst's OWN size statistic
    * (`optimizedPlan.stats.sizeInBytes`): for a file scan that is the
    * file-size statistic from the listing — free — where the previous
    * `sum(length(payload))` aggregate was a full extra pass over the media
    * lake before any decode started. For derived inputs it is an estimate,
    * which is the right trade: partition WIDTH only needs to be
    * order-of-magnitude right, and the 1..10000 clamp bounds both a
    * missing statistic (defaults huge) and an empty input.
    *
    * CAVEAT: the statistic measures the INPUT plan's bytes. For an
    * upstream that synthesizes or inflates payloads downstream of the scan
    * (`syntheticMedia` swapping text for encoded PNG/WAV is the in-repo
    * example) the estimate can be off by the inflation factor — callers
    * with such upstreams should size from known payload dimensions and
    * `repartition(n)` explicitly, or sample actual payload sizes first.
    * On a real media lake the payloads ARE the scanned bytes and the
    * statistic is exact from the file listing.
    */
  def repartitionByBytes(media: Dataset[Media],
                         targetBytes: Long = 128L << 20): Dataset[Media] = {
    val bytes = media.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes / targetBytes).min(BigInt(9999)).toInt + 1
    media.repartition(math.max(1, parts))
  }

  /** Deterministic small PCM WAV for a media id: sample rate, frame count
    * and waveform are pure functions of the id, written through the JDK's
    * javax.sound.sampled WAVE encoder — a real RIFF/WAVE byte stream
    * (44-byte canonical header + 16-bit mono PCM), not a fake payload.
    */
  private[ops] val wavRates = Array(8000, 11025, 16000, 22050)

  private[ops] def syntheticWav(id: Long): Array[Byte] = {
    val rate = wavRates((id % 4).toInt)
    val frames = 200 + (id % 800).toInt
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = (math.sin(2 * math.Pi * (220.0 + id % 220) * i / rate) * 3000).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real audio decode via the stock-JDK javax.sound.sampled reader
    * (WAV/AIFF/AU): sample rate, channel count and frame length come from
    * the parsed RIFF header, duration is integer-derived from them
    * (`frames * 1_000_000 div rate` — no float rounding to disagree on).
    * None for payloads the sound API cannot parse.
    */
  final case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
                             audio_frames: Long, duration_us: Long)

  private[ops] def decodeAudioOne(m: Media): Option[AudioMeta] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try {
        val f = ais.getFormat
        val frames = ais.getFrameLength
        val rate = math.round(f.getSampleRate)
        Some(AudioMeta(m.media_id, rate, f.getChannels, frames,
          frames * 1000000L / rate))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Audio metadata stage: real header decode for `kind = audio` rows,
    * partition-streaming; unparseable payloads are dropped (a corrupt file
    * must not kill a 100 TB decode job — route them to a quarantine sink
    * in a real pipeline).
    */
  def decodeAudio(media: Dataset[Media]): Dataset[AudioMeta] = {
    implicit val enc: Encoder[AudioMeta] = Encoders.product[AudioMeta]
    media.filter(col("kind") === "audio").mapPartitions(
      _.flatMap(decodeAudioOne))
  }

  /** ======== STUB (video only, + unparseable fallbacks) ========
    * Deterministic fake decode: dimensions derived from payload bytes. A
    * real deployment swaps ONLY this function body for a codec call
    * (ffmpeg via JNI); the Spark plumbing — typed schema, Iterator
    * streaming, partitioning — stays identical. Images take the REAL
    * ImageIO path and audio the REAL javax.sound path; only video lacks a
    * stock-JDK codec and reaches this stub by design.
    */
  private def decodeStub(m: Media): Decoded = {
    val n = m.payload.length
    val h = java.util.Arrays.hashCode(m.payload)
    Decoded(m.media_id, m.kind, math.abs(h % 1920) + 1,
      math.abs((h >> 8) % 1080) + 1, if (m.kind == "audio") 1 else 3, n.toLong)
  }

  /** Real image decode via the JDK codec (PNG/JPEG/BMP/GIF): width, height
    * and channel count come from the decoded raster, not the payload hash.
    * Returns None for payloads ImageIO cannot parse — callers fall back to
    * the stub so one corrupt file never kills a 100 TB decode job.
    */
  private[ops] def decodeImage(m: Media): Option[Decoded] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload))
      Option(img).map { i =>
        Decoded(m.media_id, m.kind, i.getWidth, i.getHeight,
          i.getColorModel.getNumComponents, m.payload.length.toLong)
      }
    } catch { case _: java.io.IOException => None }

  private def decodeOne(m: Media): Decoded =
    if (m.kind == "image") decodeImage(m).getOrElse(decodeStub(m))
    else if (m.kind == "audio")
      // real header decode: channel count from the RIFF header; width and
      // height are not a concept for audio and stay 0
      decodeAudioOne(m)
        .map(a => Decoded(m.media_id, m.kind, 0, 0, a.channels,
          m.payload.length.toLong))
        .getOrElse(decodeStub(m))
    else decodeStub(m)

  /** Decode stage: partition-streaming, one pass, no materialization.
    * ImageIO's shared-tmpfile cache is off — executor threads would
    * contend on it, and these payloads are already in memory.
    */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    implicit val enc: Encoder[Decoded] = Encoders.product[Decoded]
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decodeOne)
    }
  }

  final case class DecodePath(kind: String, real: Boolean)

  /** Stub-rate GOVERNANCE census: per media kind, how many payloads the
    * decode stage would put through a REAL codec (ImageIO / javax.sound)
    * versus the documented deterministic stub (video — no stock-JDK
    * codec — plus any unparseable fallback). The number a 100 TB run
    * reads BEFORE trusting decode-derived features: a stub_pm that
    * drifts up means corrupt payloads (or a codec gap) are silently
    * feeding fake dimensions downstream. Uses the SAME real-vs-stub
    * decision as `decode` (decodeImage/decodeAudioOne success), so the
    * census can never disagree with the stage it audits.
    */
  def decodeCensus(media: Dataset[Media]): DataFrame = {
    implicit val enc: Encoder[DecodePath] = Encoders.product[DecodePath]
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val real =
          if (m.kind == "image") decodeImage(m).isDefined
          else if (m.kind == "audio") decodeAudioOne(m).isDefined
          else false
        DecodePath(m.kind, real)
      }
    }
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        coalesce(sum(when(col("real"), 1L)), lit(0L)).as("n_real"),
        coalesce(sum(when(!col("real"), 1L)), lit(0L)).as("n_stub"))
      .withColumn("stub_pm", expr("n_stub * 1000 div n_media"))
      .orderBy("kind")
  }

  final case class ImageHash(media_id: Long, width: Int, height: Int,
                             ahash_hi: Long, ahash_lo: Long)

  /** Perceptual average-hash (aHash) over REAL decoded pixels: an 8×8
    * grid of nearest-point samples — x_i = (i·w) div 8, y_j = (j·h)
    * div 8 — each reduced to integer luma `(299·r + 587·g + 114·b) div
    * 1000`, thresholded at the integer grid mean; bit (j·8 + i) set iff
    * luma ≥ mean. Every step is integer arithmetic on losslessly-decoded
    * PNG pixels, so the hash is a pure function of the image content —
    * oracle-derivable, and stable across resize-free re-encodes (the
    * property perceptual dedup needs; byte-level md5 breaks on
    * re-encode). Emitted as two 32-bit halves in int64 because a bit-63
    * single-word hash overflows engines that range-check shifts.
    *
    * Scale shape: partition-streaming decode (one pass, byte-budget
    * repartition upstream per `repartitionByBytes`); downstream near-dup
    * pairing rides the simhash pigeonhole machinery — hamming ≤ t on a
    * 64-bit hash means some 64/(t+1)-bit chunk matches exactly, so
    * chunk-equality buckets propose candidates without an all-pairs
    * stage. Non-image rows and undecodable payloads drop (the decode
    * fallback story stays with `decode`).
    */
  def imageAHash(media: Dataset[Media]): Dataset[ImageHash] = {
    implicit val enc: Encoder[ImageHash] = Encoders.product[ImageHash]
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        if (m.kind != "image") None
        else try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))).map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val luma = new Array[Long](64)
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                val v = img.getRGB((i * w) / 8, (j * h) / 8) & 0xffffff
                val r = (v >> 16) & 255
                val g = (v >> 8) & 255
                val b = v & 255
                luma(j * 8 + i) = (299L * r + 587L * g + 114L * b) / 1000L
                i += 1
              }
              j += 1
            }
            val mean = luma.sum / 64L
            var hi = 0L
            var lo = 0L
            var k = 0
            while (k < 64) {
              if (luma(k) >= mean) {
                if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
              }
              k += 1
            }
            ImageHash(m.media_id, w, h, hi, lo)
          }
        } catch { case _: java.io.IOException => None }
      }
    }
  }

  /** Perceptual near-duplicate pairs over `imageAHash` output: images
    * whose 64-bit aHashes differ in at most `maxHamming` bits — the
    * re-encode/recompress-robust image dedup face (the text analogue is
    * `Dedup.simhashPairs`, and the same PIGEONHOLE blocking applies:
    * hamming ≤ 7 over 8 disjoint 8-bit chunks forces at least one chunk
    * to match exactly, so equal-chunk buckets propose every true pair
    * and the exact bit_count verify decides). No all-pairs stage: the
    * join is bucketed by (chunk index, chunk value), and a chunk value
    * shared by many images is the hot-bucket skew case — all-black
    * thumbnails land in one bucket; arm a df-cap on (idx, val) postings
    * exactly like `Dedup.cappedInvertedIndex` if a corpus has such mass.
    */
  def imageNearDupPairs(hashes: DataFrame,
                        maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "pigeonhole over 8 chunks needs maxHamming <= 7")
    val chunks = hashes.select(col("media_id"), col("ahash_hi"),
        col("ahash_lo"),
        explode(expr(
          """transform(sequence(0, 7), c -> named_struct('idx', c,
            |  'val', case when c < 4
            |    then (ahash_lo >> cast(8 * c as int)) & 255
            |    else (ahash_hi >> cast(8 * (c - 4) as int)) & 255 end))"""
            .stripMargin)).as("ch"))
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
        col("ch.idx").as("idx"), col("ch.val").as("val"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.idx") === col("b.idx") && col("a.val") === col("b.val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        (expr("bit_count(a.ahash_hi ^ b.ahash_hi)") +
          expr("bit_count(a.ahash_lo ^ b.ahash_lo)")).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("id_a", "id_b")
  }

  /** ======== STUB ========
    * Deterministic fake feature extractor (fixed-dim float vector from
    * rolling byte hashes) standing in for a vision/audio embedding model.
    * Batch shape matches a model server: the iterator is consumed in
    * fixed-size batches so a real implementation can amortize inference.
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16,
                      batchSize: Int = 64): Dataset[MediaFeature] = {
    implicit val enc: Encoder[MediaFeature] = Encoders.product[MediaFeature]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real extractor runs the whole batch through the model here
        batch.map { m =>
          val f = new Array[Float](dim)
          var acc = 1125899906842597L
          var i = 0
          while (i < m.payload.length) {
            acc = acc * 31 + m.payload(i)
            f(i % dim) += (acc % 1000) / 1000.0f
            i += 1
          }
          MediaFeature(m.media_id, f)
        }
      }
    }
  }

  /** Resize stage. Images: a REAL bilinear rescale through the JDK raster
    * pipeline, re-encoded as PNG at (targetW, targetH). Audio/video
    * payloads (STUB): deterministic byte downsample standing in for a
    * codec-level scale. Partition-streaming like decode either way.
    */
  def resize(media: Dataset[Media], targetW: Int = 224,
             targetH: Int = 224): Dataset[Media] = {
    implicit val enc: Encoder[Media] = Encoders.product[Media]
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val realResized =
          if (m.kind == "image") resizeImage(m.payload, targetW, targetH)
          else None
        realResized match {
          case Some(bytes) => m.copy(payload = bytes)
          case None =>
            // ======== STUB (audio/video + unparseable images) ========
            // keep every k-th byte so output size tracks the scale ratio
            val ratio = math.max(1,
              m.payload.length / math.max(1, targetW * targetH / 512))
            val out = Array.range(0, m.payload.length / ratio)
              .map(i => m.payload(i * ratio))
            m.copy(payload = out)
        }
      }
    }
  }

  /** Bilinear rescale of an encoded image to (w, h), re-encoded as PNG;
    * None when the payload doesn't parse as an image.
    */
  private[ops] def resizeImage(payload: Array[Byte], w: Int,
                               h: Int): Option[Array[Byte]] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { src =>
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
    } catch { case _: java.io.IOException => None }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk becomes a frame row (explode-style fan-out, streamed).
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[Frame] = {
    implicit val enc: Encoder[Frame] = Encoders.product[Frame]
    media.filter(col("kind") === "video").mapPartitions { it =>
      it.flatMap { m =>
        m.payload.grouped(frameBytes).zipWithIndex
          .collect { case (chunk, idx) if idx % stride == 0 =>
            Frame(m.media_id, idx, chunk) }
      }
    }
  }
}
