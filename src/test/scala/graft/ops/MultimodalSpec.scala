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

  test("synthetic media: stable schema, image rows carry a real PNG") {
    val m = Multimodal.syntheticMedia(docsDf).collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video"))
    // PNG magic bytes — the image payload is a genuine encoded stream
    assert(m(0).payload.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    // RIFF magic bytes — the audio payload is a genuine encoded WAV stream
    assert(new String(m(1).payload.take(4), "US-ASCII") == "RIFF")
    // video has no stock-JDK codec: payload stays the opaque UTF-8 bytes
    assert(new String(m(2).payload, "UTF-8").startsWith("a video payload"))
  }

  test("decode: images through the real codec, audio stub is mono") {
    val media = Multimodal.syntheticMedia(docsDf)
    val d1 = Multimodal.decode(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq) // deterministic
    // width/height is an image/video concept; audio reports 0×0 mono from
    // the parsed RIFF header
    assert(d1.filter(_.kind != "audio").forall(d => d.width > 0 && d.height > 0))
    val audio = d1.find(_.kind == "audio").get
    assert(audio.channels == 1 && audio.width == 0 && audio.height == 0)
    // golden: syntheticPng(id) is (8 + id%32) × (8 + id%24) RGB — the real
    // decoded raster must report exactly that, not a hash of the bytes
    val img = d1.find(_.media_id == 0L).get
    assert(img.width == 8 && img.height == 8 && img.channels == 3)
  }

  test("golden PNG decode/resize: exact dimensions through ImageIO") {
    val png = Multimodal.syntheticPng(5L) // 13 × 13
    val dec = Multimodal.decodeImage(
      Multimodal.Media(5L, "image", png, "s")).get
    assert(dec.width == 13 && dec.height == 13 && dec.channels == 3)
    val resized = Multimodal.resizeImage(png, 4, 6).get
    val dec2 = Multimodal.decodeImage(
      Multimodal.Media(5L, "image", resized, "s")).get
    assert(dec2.width == 4 && dec2.height == 6)
    // garbage payload → None, never a crash
    assert(Multimodal.decodeImage(
      Multimodal.Media(6L, "image", Array[Byte](1, 2, 3), "s")).isEmpty)
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

  test("resize: real rescale for images, deterministic stub otherwise") {
    val media = Multimodal.syntheticMedia(docsDf)
    val r1 = Multimodal.resize(media, 4, 4).collect().sortBy(_.media_id)
    val r2 = Multimodal.resize(media, 4, 4).collect().sortBy(_.media_id)
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
    val orig = media.collect().sortBy(_.media_id)
    r1.zip(orig).foreach { case (resized, o) =>
      assert(resized.kind == o.kind && resized.media_id == o.media_id)
      if (o.kind == "image") {
        // real path: re-decoded dimensions are exactly the target
        val d = Multimodal.decodeImage(resized).get
        assert(d.width == 4 && d.height == 4)
      } else assert(resized.payload.length <= o.payload.length)
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

  test("imageAHash: content-determined, non-images drop") {
    import spark.implicits._
    val png = Multimodal.syntheticPng(5L) // 13×13 (8 + 5%32, 8 + 5%24)
    val wav = Multimodal.syntheticWav(1L)
    val media = Seq(
      Multimodal.Media(1L, "image", png, "s"),
      Multimodal.Media(2L, "image", png, "s"), // same BYTES, other id
      Multimodal.Media(3L, "audio", wav, "s"))
      .toDS()
    val got = Multimodal.imageAHash(media).collect()
      .sortBy(_.media_id)
    assert(got.length == 2) // audio dropped
    assert(got.forall(h => h.width == 13 && h.height == 13))
    // the hash is a function of CONTENT, not of the media id
    assert((got(0).ahash_hi, got(0).ahash_lo) ==
      (got(1).ahash_hi, got(1).ahash_lo))
    // halves are 32-bit clean (no sign games)
    assert(got.forall(h => h.ahash_hi >= 0 && h.ahash_hi < (1L << 32) &&
      h.ahash_lo >= 0 && h.ahash_lo < (1L << 32)))
  }

  test("imageNearDupPairs: exact dup at hamming 0, disjoint hashes cut") {
    import spark.implicits._
    // hand hashes: 10/11 identical; 12 differs from 10 in exactly 8
    // bits of the low word (> 7 → cut); 13 differs from 10 in 3 bits
    // (≤ 7 → pair, via the untouched chunks)
    val h = Seq(
      (10L, 5L, 255L), (11L, 5L, 255L),
      (12L, 5L, 255L ^ 0xFF00L),           // 8 flipped bits
      (13L, 5L, 255L ^ 0x7L))              // 3 flipped bits
      .toDF("media_id", "ahash_hi", "ahash_lo")
    val got = Multimodal.imageNearDupPairs(h, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSeq
    // (12,13): xor lo = 0xFF07 → 11 bits → cut despite shared hi chunks
    assert(got == Seq((10L, 11L, 0L), (10L, 13L, 3L), (11L, 13L, 3L)))
  }

  test("decodeCensus: images/audio decode real, video is all stub, " +
      "corrupt payloads counted as stub") {
    import spark.implicits._
    val docs = (0L until 9L).map(i => (i, s"text $i", "src"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.syntheticMedia(docs)
    val got = Multimodal.decodeCensus(media)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("audio", 3L, 3L, 0L, 0L),
      ("image", 3L, 3L, 0L, 0L), ("video", 3L, 0L, 3L, 1000L)))
    // a corrupt image payload falls to the stub and the census sees it
    val corrupt = media.map(m =>
      if (m.kind == "image" && m.media_id == 0L)
        m.copy(payload = Array[Byte](1, 2, 3)) else m)
    val bad = Multimodal.decodeCensus(corrupt)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(bad.find(_._1 == "image").get == (("image", 3L, 2L, 1L, 333L)))
  }
}
