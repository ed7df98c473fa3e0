package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (0L, "an image payload", "s0"), (1L, "an audio payload", "s1"),
    (2L, "a video payload body long enough for several frame chunks " +
      "abcdefghijklmnopqrstuvwxyz 0123456789 abcdefghijklmnopqrstuvwxyz " +
      "0123456789 abcdefghijklmnopqrstuvwxyz 0123456789 the end", "s2"))
    .toDF("doc_id", "text", "source")

  test("synthetic media: stable schema, binary payload round-trips") {
    val m = Multimodal.syntheticMedia(docsDf).collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(new String(m(0).payload, "UTF-8") == "an image payload")
  }

  test("decode stub: deterministic typed metadata, audio is mono") {
    val media = Multimodal.syntheticMedia(docsDf)
    val d1 = Multimodal.decode(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq) // deterministic
    assert(d1.forall(d => d.width > 0 && d.height > 0))
    assert(d1.find(_.kind == "audio").get.channels == 1)
    assert(d1.find(_.media_id == 0L).get.n_bytes == 16L)
  }

  test("feature extraction: fixed dim, deterministic, batch-shaped") {
    val media = Multimodal.syntheticMedia(docsDf)
    val f = Multimodal.extractFeatures(media, dim = 16, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(f.length == 3)
    assert(f.forall(_.feature.length == 16))
    val again = Multimodal.extractFeatures(media, dim = 16, batchSize = 1)
      .collect().sortBy(_.media_id)
    // batch size must not change results, only amortization
    assert(f.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("resize stub: deterministic, shrinks payload, keeps schema") {
    val media = Multimodal.syntheticMedia(docsDf)
    val r1 = Multimodal.resize(media, 8, 8).collect().sortBy(_.media_id)
    val r2 = Multimodal.resize(media, 8, 8).collect().sortBy(_.media_id)
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
    val orig = media.collect().sortBy(_.media_id)
    r1.zip(orig).foreach { case (resized, o) =>
      assert(resized.payload.length <= o.payload.length)
      assert(resized.kind == o.kind && resized.media_id == o.media_id)
    }
  }

  test("frame sampling: only video, every stride-th chunk, indexed") {
    val media = Multimodal.syntheticMedia(docsDf)
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .collect()
    assert(frames.forall(_.media_id == 2L))
    assert(frames.map(_.frame_idx).sorted.toSeq ==
      frames.map(_.frame_idx).sorted.distinct.toSeq)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(_.frame.length <= 16))
  }

  test("byte-budget repartitioning bounds partition payload") {
    val media = Multimodal.syntheticMedia(docsDf)
    val parts = Multimodal.repartitionByBytes(media, targetBytes = 64)
      .rdd.getNumPartitions
    assert(parts >= 2) // ~300 payload bytes / 64-byte budget
  }
}
