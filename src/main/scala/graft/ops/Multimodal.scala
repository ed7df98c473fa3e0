package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages as partition-streaming transforms.
  *
  * The decode kernels themselves are STUBS — this container has no
  * image/audio codecs — implemented as deterministic functions of the
  * payload bytes and clearly marked below. Everything AROUND the stub is
  * the real engineering and is real here:
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
    * no binary table): payload = UTF-8 bytes, kind cycles by doc_id.
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
  }

  /** Rebalance by payload bytes ahead of CPU-heavy decode: target
    * ~`targetBytes` per partition so one giant video cannot straggle a
    * task while 4 KB thumbnails idle elsewhere.
    */
  def repartitionByBytes(media: Dataset[Media],
                         targetBytes: Long = 128L << 20): Dataset[Media] = {
    val row = media.select(sum(length(col("payload")))).head()
    if (row.isNullAt(0)) media // empty input: nothing to balance
    else {
      val parts = math.max(1,
        math.min(10000, (row.getLong(0) / targetBytes).toInt + 1))
      media.repartition(parts)
    }
  }

  /** ======== STUB ========
    * Deterministic fake decode: dimensions derived from payload bytes. A
    * real deployment swaps ONLY this function body for a codec call
    * (e.g. javax.imageio / ffmpeg via JNI); the Spark plumbing — typed
    * schema, Iterator streaming, partitioning — stays identical.
    */
  private def decodeStub(m: Media): Decoded = {
    val n = m.payload.length
    val h = java.util.Arrays.hashCode(m.payload)
    Decoded(m.media_id, m.kind, math.abs(h % 1920) + 1,
      math.abs((h >> 8) % 1080) + 1, if (m.kind == "audio") 1 else 3, n.toLong)
  }

  /** Decode stage: partition-streaming, one pass, no materialization. */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    implicit val enc: Encoder[Decoded] = Encoders.product[Decoded]
    media.mapPartitions(_.map(decodeStub))
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

  /** ======== STUB ========
    * Resize stage: deterministic downsample of the payload bytes standing
    * in for an image resize (a real implementation swaps the body for a
    * codec-level scale). Output metadata carries the target dimensions;
    * payload shrinks by the same ratio — partition-streaming like decode.
    */
  def resize(media: Dataset[Media], targetW: Int = 224,
             targetH: Int = 224): Dataset[Media] = {
    implicit val enc: Encoder[Media] = Encoders.product[Media]
    media.mapPartitions(_.map { m =>
      // keep every k-th byte so output size tracks the scale ratio
      val ratio = math.max(1, m.payload.length / math.max(1, targetW * targetH / 512))
      val out = Array.range(0, m.payload.length / ratio)
        .map(i => m.payload(i * ratio))
      m.copy(payload = out)
    })
  }

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
