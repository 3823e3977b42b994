package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.WavCodec
import org.apache.spark.sql.functions.col

/** Real PCM WAV codec: header parse, frame features, distributed paths. */
class WavSpec extends SparkSpec {
  import spark.implicits._

  test("probe parses a synthesized RIFF/PCM header exactly") {
    val wav = WavCodec.synthesize(440.0, ms = 200, rate = 16000)
    val m = WavCodec.probe(wav).get
    assert(m.sample_rate == 16000 && m.channels == 1 && m.bits_per_sample == 16)
    assert(m.n_samples == 3200 && m.duration_ms == 200)
    assert(WavCodec.probe("not a wav at all".getBytes).isEmpty)
    assert(WavCodec.probe(wav.take(30)).isEmpty)
  }

  test("adversarial chunk sizes: unsigned-32 overflow never loops or throws") {
    val wav = WavCodec.synthesize(440.0, ms = 50)
    // Corrupt the fmt chunk size to 0xFFFFFFFF (unsigned 2^32-1): an Int
    // walk would advance by 8 + (-1) + 1 = 8+0 or wrap negative → hang.
    val evil = wav.clone()
    evil(16) = 0xFF.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0xFF.toByte
    assert(WavCodec.probe(evil).isEmpty)        // walks past end, no hang
    // Size 0x80000000 (2^31): Int-negative but Long-positive.
    val evil2 = wav.clone()
    evil2(16) = 0x00; evil2(17) = 0x00; evil2(18) = 0x00; evil2(19) = 0x80.toByte
    assert(WavCodec.probe(evil2).isEmpty)
    assert(WavCodec.frameStats(evil).isEmpty && WavCodec.frameStats(evil2).isEmpty)
    // channels=0 with a valid blockAlign must not divide-by-zero.
    val zeroCh = wav.clone()
    zeroCh(22) = 0x00; zeroCh(23) = 0x00
    assert(WavCodec.probe(zeroCh).isEmpty)
    assert(WavCodec.frameStats(zeroCh).isEmpty)
  }

  test("frame stats measure the signal: sine RMS = A/sqrt(2), ZCR = 2f per second") {
    val wav = WavCodec.synthesize(440.0, ms = 200, rate = 16000, amplitude = 0.8)
    val frames = WavCodec.frameStats(wav, frameMs = 25)
    assert(frames.size == 8)
    val expectedRms = 0.8 / math.sqrt(2.0)
    frames.foreach { case (_, rms, zc) =>
      assert(math.abs(rms - expectedRms) < 0.01, s"rms $rms != $expectedRms")
      // 440 Hz → 880 crossings/s → 22 per 25 ms frame (±1 at boundaries)
      assert(math.abs(zc - 22) <= 1, s"zcr $zc")
    }
  }

  test("ImageMeta probes PNG/GIF/JPEG dimensions from headers") {
    import Multimodal.ImageMeta
    assert(ImageMeta.probe(ImageMeta.synthesizePngHeader(640, 480))
      .contains(ImageMeta.Dims("png", 640, 480)))
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xF0.toByte, 0x00)   // 320 × 240 LE
    assert(ImageMeta.probe(gif).contains(ImageMeta.Dims("gif", 320, 240)))
    // JPEG: SOI, APP0 (len 4), SOF0 (len 17): height 600, width 800
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0x00, 0x04, 0x00, 0x00,
      0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08,
      0x02, 0x58, 0x03, 0x20,
      0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00)
    assert(ImageMeta.probe(jpeg).contains(ImageMeta.Dims("jpeg", 800, 600)))
    assert(ImageMeta.probe("not an image".getBytes).isEmpty)
    assert(ImageMeta.probe(Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00)).isEmpty)
  }

  test("ImageCodec: PNG round-trip features are exact pixel arithmetic") {
    import Multimodal.ImageCodec
    // solid color (10, 20, 30): means equal the color, one luma bin
    val solid = ImageCodec.encodePng(8, 8, (_, _) => (10 << 16) | (20 << 8) | 30)
    val f = ImageCodec.features(ImageCodec.decode(solid).get)
    assert(f.width == 8 && f.height == 8)
    assert(f.sumR == 10 * 64 && f.sumG == 20 * 64 && f.sumB == 30 * 64)
    val luma = (299 * 10 + 587 * 20 + 114 * 30) / 1000 // = 18 → bin 0
    assert(f.lumaHist.toSeq == Seq.tabulate(8)(b => if (b == luma >> 5) 64L else 0L))
    // horizontal gradient r = x*255/7: sum per row = 1017
    val grad = ImageCodec.encodePng(8, 8, (x, _) => (x * 255 / 7) << 16)
    val g = ImageCodec.features(ImageCodec.decode(grad).get)
    assert(g.sumR == 8L * (0 until 8).map(_ * 255 / 7).sum && g.sumG == 0 && g.sumB == 0)
    // luma of (r,0,0) = 299r/1000: bins from the 8 distinct column lumas
    val bins = (0 until 8).map(x => (299 * (x * 255 / 7)) / 1000 >> 5)
    assert(g.lumaHist.toSeq == Seq.tabulate(8)(b => 8L * bins.count(_ == b)))
  }

  test("ImageCodec: animated GIF decodes per-frame; BMP probed via ImageIO fallback") {
    import Multimodal.ImageCodec
    def solidImg(rgb: Int) = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    val gif = ImageCodec.encodeGif(Seq(solidImg(0xFF0000), solidImg(0x00FF00), solidImg(0x0000FF)))
    val frames = ImageCodec.frames(gif, 4)
    assert(frames.map(_._1) == Seq(0, 1, 2))
    val feats = frames.map { case (_, img) => ImageCodec.features(img) }
    assert(feats(0).sumR == 255L * 64 && feats(0).sumG == 0)
    assert(feats(1).sumG == 255L * 64 && feats(1).sumB == 0)
    assert(feats(2).sumB == 255L * 64 && feats(2).sumR == 0)
    // maxFrames sampling: 3 frames capped to 2 picks evenly
    assert(ImageCodec.frames(gif, 2).map(_._1) == Seq(0, 1))
    // BMP: header walk doesn't know it; ImageIO fallback does
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solidImg(0x123456), "bmp", bos)
    val bmp = bos.toByteArray
    assert(Multimodal.ImageMeta.probe(bmp).isEmpty)
    assert(ImageCodec.probe(bmp).map(d => (d.format, d.width, d.height))
      .contains(("bmp", 8, 8)))
    assert(ImageCodec.frames("junk".getBytes, 4).isEmpty)
    assert(ImageCodec.decode("junk".getBytes).isEmpty)
  }

  test("dHash: stable on identical pixels, near on small edits, banded pairs find planted dup") {
    import Multimodal.ImageCodec
    def pseudoPx(seed: Int)(x: Int, y: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.productHash((seed, x, y))
      h & 0xFFFFFF
    }
    // identical pixel content, independent encodes → identical hash
    val a1 = ImageCodec.decode(ImageCodec.encodePng(16, 16, pseudoPx(1))).get
    val a2 = ImageCodec.decode(ImageCodec.encodePng(16, 16, pseudoPx(1))).get
    assert(ImageCodec.dHash(a1) == ImageCodec.dHash(a2))
    // a small edit (one corner region brightened) moves few bits;
    // unrelated noise images differ in many
    def edited(x: Int, y: Int): Int =
      if (x < 2 && y < 2) 0xFFFFFF else pseudoPx(1)(x, y)
    val ha = ImageCodec.dHash(a1)
    val he = ImageCodec.dHash(ImageCodec.decode(ImageCodec.encodePng(16, 16, edited)).get)
    val hb = ImageCodec.dHash(ImageCodec.decode(ImageCodec.encodePng(16, 16, pseudoPx(7))).get)
    assert(java.lang.Long.bitCount(ha ^ he) <= 8,
      s"small edit moved ${java.lang.Long.bitCount(ha ^ he)} bits")
    assert(java.lang.Long.bitCount(ha ^ hb) > 8,
      s"unrelated images too close: ${java.lang.Long.bitCount(ha ^ hb)}")

    // distributed: 20 noise images + an edited copy of image 1; banded
    // near-dup pairs find exactly the planted pair (pigeonhole: no
    // false negatives within the bound by construction)
    val rows = ((1 to 20).map(i =>
        (i.toLong, ImageCodec.encodePng(16, 16, pseudoPx(i)))) :+
      (100L, ImageCodec.encodePng(16, 16, edited))).toDF("doc_id", "media")
    val hashes = Multimodal.imagePHash(spark, rows, "doc_id")
    assert(hashes.filter(!org.apache.spark.sql.functions.col("valid")).count() == 0)
    val pairs = Multimodal.phashNearDupPairs(hashes, "id", "phash", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L)), s"got $pairs")
    // large maxHamming: every band must keep a non-empty bit mask — a
    // zero-width band would put ALL rows in one bucket (O(n²) join);
    // with the pigeonhole still sound, the planted pair is still found
    // and unrelated noise (hamming ~28) stays out at maxHamming=20
    val wide = Multimodal.phashNearDupPairs(hashes, "id", "phash", maxHamming = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(wide.exists(p => p._1 == 1L && p._2 == 100L))
    assert(wide.forall(_._3 <= 30))
  }

  test("audioFingerprint: envelope shape, gain-invariant, banded near-dup pairs") {
    def wav(amps: Seq[Double]) = WavCodec.synthesizeEnvelope(440.0, amps)
    val up = Seq(0.2, 0.8, 0.2, 0.8, 0.2)   // rises at frames 0→1, 2→3
    val rows = Seq(
      (1L, wav(up)),
      (2L, wav(up.map(_ * 0.5))),           // same shape, half the gain
      (3L, wav(Seq(0.8, 0.2, 0.8, 0.2, 0.8))), // inverted envelope
      (4L, "not audio".getBytes)
    ).toDF("doc_id", "media")
    val fp = Multimodal.audioFingerprint(spark, rows, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(fp(4L) == ((false, None)))
    // rises at frame deltas 0 and 2 → bits 0b0101 = 5
    assert(fp(1L) == ((true, Some(5L))), s"got ${fp(1L)}")
    // uniform gain change preserves the fingerprint exactly
    assert(fp(2L) == fp(1L))
    // inverted envelope: rises at deltas 1 and 3 → 0b1010 = 10
    assert(fp(3L) == ((true, Some(10L))))
    // hamming near-dup over afp reuses the generic banded pairs: ids 1
    // and 2 collide at distance 0; the inverse stays apart (distance 4)
    val hashes = Multimodal.audioFingerprint(spark, rows.filter(col("doc_id") < 4), "doc_id")
      .select(col("id"), col("afp"))
    val pairs = Multimodal.phashNearDupPairs(hashes, "id", "afp", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("distributed probe and frame features; malformed media → nulls, not failures") {
    val rows = Seq(
      (1L, WavCodec.synthesize(440.0, 200)),
      (2L, WavCodec.synthesize(100.0, 100)),
      (3L, "garbage".getBytes)
    ).toDF("doc_id", "media")
    val meta = Multimodal.probeWavMeta(spark, rows, "doc_id")
      .orderBy("id").collect()
    assert(meta.map(_.getBoolean(1)).toSeq == Seq(true, true, false))
    assert(meta(0).getLong(6) == 200L && meta(1).getLong(6) == 100L)
    assert(meta(2).isNullAt(6))
    val feats = Multimodal.wavFrameFeatures(spark, rows, "doc_id")
    assert(feats.count() == 8 + 4)   // 200ms and 100ms at 25ms frames; garbage → 0
  }

  test("decimate: kept samples verbatim, rate/count halve, unsupported → None") {
    val src = WavCodec.synthesize(440.0, 100)           // 16 kHz, 1600 samples
    val out = WavCodec.decimate(src, 2).get
    val m = WavCodec.probe(out).get
    assert(m.sample_rate == 8000 && m.n_samples == 800 && m.duration_ms == 100)
    // kept samples are the even-index source samples bit-for-bit: the
    // first frame's RMS over aligned 25ms windows can only differ by
    // the dropped-sample halving, not by value corruption — compare a
    // few raw samples directly
    def sampleAt(b: Array[Byte], i: Int): Int = {
      val off = 44 + 2 * i
      ((b(off) & 0xFF) | (b(off + 1) << 8)).toShort.toInt
    }
    (0 until 20).foreach(i =>
      assert(sampleAt(out, i) == sampleAt(src, 2 * i), s"sample $i corrupted"))
    assert(WavCodec.decimate("junk".getBytes, 2).isEmpty)
    assert(WavCodec.decimate(src, 3).isEmpty)   // 16000 % 3 != 0 → unsupported
    // distributed face: malformed rows become null rows, not failures
    val rows = Seq((1L, src), (2L, "junk".getBytes)).toDF("doc_id", "media")
    val got = Multimodal.resampleWav(spark, rows, "doc_id", 2)
      .orderBy("id").collect()
    assert(got(0).getInt(2) == 8000 && got(0).getLong(3) == 800L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  test("resizeImages: nearest-neighbor pixel mapping survives the PNG round-trip") {
    // 4×1 gradient → 2×1: nearest-neighbor keeps pixels at x' = 0, 2
    val src = Multimodal.ImageCodec.encodePng(4, 1, (x, _) => x * 10)
    val rows = Seq((1L, src), (2L, "not-a-png".getBytes)).toDF("doc_id", "media")
    val out = Multimodal.resizeImages(spark, rows, "doc_id", outW = 2, outH = 1)
      .orderBy("id").collect()
    val decoded = Multimodal.ImageCodec.decode(out(0).getAs[Array[Byte]](1)).get
    assert(decoded.getWidth == 2 && decoded.getHeight == 1)
    assert((decoded.getRGB(0, 0) & 0xFFFFFF) == 0 &&
      (decoded.getRGB(1, 0) & 0xFFFFFF) == 20,
      "resized pixels must be the source pixels at x' = x·srcW/outW")
    // malformed media → null bytes and dims, row preserved
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
  }
}
