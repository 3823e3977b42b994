package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Model: media is an opaque `binary` column plus typed metadata columns.
  * ALL codecs here are real pure-JVM parsers/decoders — PCM WAV byte
  * parsing ([[WavCodec]]), container-header probing ([[ImageMeta]]), and
  * full pixel decode via `javax.imageio` ([[ImageCodec]], PNG/GIF/JPEG/
  * BMP in any stock JDK). Features are integer-exact (sums of pixel
  * bytes, integer luma) so they carry arithmetic oracles; heavier model
  * featurization (CNN embeddings) would slot into the same
  * mapPartitions shape with an executor-side model load.
  */
object Multimodal {

  case class DecodedFrame(doc_id: Long, frame_idx: Int, feature: Array[Float])

  /** REAL pixel decoder on `javax.imageio` (pure JDK — PNG, GIF
    * incl. animation, JPEG, BMP). Features are computed in integer
    * arithmetic (pixel-byte sums; luma = (299r+587g+114b)/1000) so
    * they are bit-reproducible cross-engine and oracle-checkable.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    // ImageIO's default stream cache writes a TEMP FILE per
    // created stream — a per-row disk write/delete in every decode task.
    // Byte-array inputs need no disk backing; keep streams in memory.
    // (Class-load-time, so it applies once per executor JVM.)
    ImageIO.setUseCache(false)

    /** (meanR, meanG, meanB) as exact integer sums over w·h pixels plus
      * an 8-bin luma histogram (bin = luma >> 5). Means are left as sums
      * so callers choose the division (sum/(w·h) in double is the same
      * IEEE op in any engine).
      */
    case class FrameFeature(width: Int, height: Int, sumR: Long, sumG: Long,
                            sumB: Long, lumaHist: Array[Long])

    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      scala.util.Try(Option(ImageIO.read(new java.io.ByteArrayInputStream(bytes))))
        .toOption.flatten

    /** ImageIO-based metadata probe — the fallback for containers the
      * cheap header walk ([[ImageMeta.probe]]) doesn't know (BMP, …).
      * Reads only the header plane via ImageReader, not the pixels.
      */
    def probe(bytes: Array[Byte]): Option[ImageMeta.Dims] =
      scala.util.Try {
        val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some(ImageMeta.Dims(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally iis.close()
      }.toOption.flatten

    /** Up to `maxFrames` decoded frames, evenly sampled across the
      * container's frame count (GIF animations have many; PNG/JPEG one).
      */
    def frames(bytes: Array[Byte], maxFrames: Int): Seq[(Int, BufferedImage)] =
      scala.util.Try {
        val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val n = math.max(1, scala.util.Try(r.getNumImages(true)).getOrElse(1))
              val picks =
                if (n <= maxFrames) 0 until n
                else (0 until maxFrames).map(i => i * n / maxFrames)
              picks.flatMap(i =>
                scala.util.Try((i, r.read(i))).toOption)
            } finally r.dispose()
          }
        } finally iis.close()
      }.getOrElse(Seq.empty)

    /** Integer-exact frame features: channel sums + 8-bin luma histogram. */
    def features(img: BufferedImage): FrameFeature = {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          hist(((299 * r + 587 * g + 114 * b) / 1000) >> 5) += 1L
          x += 1
        }
        y += 1
      }
      FrameFeature(w, h, sr, sg, sb, hist)
    }

    /** 56-bit difference hash (dHash) over the decoded luma plane,
      * nearest-neighbor resampled to an 8×8 grid: bit y·7+x set iff
      * luma(x+1, y) > luma(x, y). Integer arithmetic end-to-end
      * (integer luma, floor resampling) — reproducible cross-engine,
      * and 56 bits keeps every shift inside a signed BIGINT for SQL
      * oracles. Perceptually-similar images differ in few bits; near-dup
      * detection is hamming distance over these longs.
      */
    def dHash(img: BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      val lum = Array.ofDim[Int](8, 8)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val rgb = img.getRGB(x * w / 8, y * h / 8)
          lum(y)(x) = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
            114 * (rgb & 0xFF)) / 1000
          x += 1
        }
        y += 1
      }
      var hash = 0L
      y = 0
      while (y < 8) {
        var x = 0
        while (x < 7) {
          if (lum(y)(x + 1) > lum(y)(x)) hash |= 1L << (y * 7 + x)
          x += 1
        }
        y += 1
      }
      hash
    }

    /** Nearest-neighbor resize — integer source sampling
      * (src = dst·srcDim/outDim, floor), the same resampling [[dHash]]
      * uses, so resized pixels carry closed-form SQL oracles. TYPE_INT_RGB
      * output: re-encoding to PNG stays lossless.
      */
    def resize(img: BufferedImage, outW: Int, outH: Int): BufferedImage = {
      val sw = img.getWidth; val sh = img.getHeight
      val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < outH) {
        var x = 0
        while (x < outW) {
          out.setRGB(x, y, img.getRGB(x * sw / outW, y * sh / outH))
          x += 1
        }
        y += 1
      }
      out
    }

    /** Encode an RGB pixel function as a real PNG (lossless round-trip). */
    def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Encode frames as a multi-frame (animated) GIF — the multi-frame
      * test fixture. Solid-color frames survive palettization exactly.
      */
    def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f => writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
  }

  /** Deterministic synthetic image for `docId`: even ids a solid color,
    * odd ids a horizontal gradient — both fully determined by (docId, x)
    * in integer arithmetic, so decoded features have a closed-form SQL
    * oracle. 8×8 PNG (lossless; dimensions fixed so the oracle's pixel
    * grid is a plain generate_series).
    */
  def synthImage(docId: Long): Array[Byte] = {
    val d = (docId % 256).toInt
    ImageCodec.encodePng(8, 8, (x, _) =>
      if (docId % 2 == 0)
        (d << 16) | ((((docId * 7 + 3) % 256).toInt) << 8) | ((docId * 13 + 5) % 256).toInt
      else
        ((x * 255 / 7) << 16) | (d << 8) | (255 - x * 255 / 7))
  }

  /** (id, media) with a real synthesized PNG per row — the stand-in for
    * `spark.read.format("binaryFile")` in tests and driver queries.
    */
  def syntheticImages(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map(id => (id, synthImage(id))))
      .toDF("id", "media")
  }

  /** Thumbnail / normalization stage: decode each image, nearest-neighbor
    * resize to (outW, outH), re-encode as PNG — (id, media, width,
    * height) with the resized bytes as a new opaque binary column, ready
    * to feed any downstream decode stage (the q_image_resize oracle
    * re-decodes them and checks the pixels closed-form). Runs in
    * `mapPartitions` so codec init amortizes per partition; malformed
    * media yields a null-media row, never a task failure.
    */
  def resizeImages(spark: SparkSession, df: DataFrame, idCol: String,
                   outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    require(outW > 0 && outH > 0, "output dimensions must be positive")
    df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageCodec.decode(bytes) match {
          case Some(img) =>
            val r = ImageCodec.resize(img, outW, outH)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(r, "png", bos)
            (id, Some(bos.toByteArray), Some(outW), Some(outH))
          case None => (id, None, None, None)
        }
      })
      .toDF("id", "media", "width", "height")
  }

  /** REAL per-frame image features: decode up to `maxFrames` frames per
    * row and emit exact channel means + the 8-bin luma histogram
    * (flattened to scalar columns — engine-portable, oracle-friendly).
    * Malformed media emits no rows, never a task failure.
    */
  def imageFrameFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                         maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.flatMap { case (id, bytes) =>
      ImageCodec.frames(bytes, maxFrames).iterator.map { case (idx, img) =>
        val f = ImageCodec.features(img)
        val n = (f.width.toLong * f.height).toDouble
        (id, idx, f.width, f.height,
          f.sumR / n, f.sumG / n, f.sumB / n,
          f.lumaHist(0), f.lumaHist(1), f.lumaHist(2), f.lumaHist(3),
          f.lumaHist(4), f.lumaHist(5), f.lumaHist(6), f.lumaHist(7))
      }
    }.toDF("id", "frame_idx", "width", "height", "mean_r", "mean_g", "mean_b",
      "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
  }

  /** REAL codec for one modality: PCM WAV (RIFF). Pure-JVM byte parsing —
    * no audio library needed: metadata comes from the actual chunk
    * layout and features are measured from the PCM samples.
    */
  object WavCodec {
    case class WavMeta(sample_rate: Int, channels: Int, bits_per_sample: Int,
                       n_samples: Long, duration_ms: Long)

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** (offset-of-chunk-data, chunk-size) for the first chunk with `id`.
      * The offset walk stays in Long: `sz` is an unsigned 32-bit value from
      * untrusted bytes, so an Int advance could wrap negative (infinite
      * loop / negative index). With Long arithmetic the advance is always
      * >= 8 and an oversized sz simply walks past the end → None.
      */
    private def findChunk(bytes: Array[Byte], id: String): Option[(Int, Long)] = {
      var off = 12L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val cid = tag(bytes, o)
        val sz = u32(bytes, o + 4)
        if (cid == id) return Some((o + 8, math.min(sz, bytes.length - off - 8L)))
        off += 8L + sz + (sz & 1L) // chunks are 2-byte aligned
      }
      None
    }

    /** Parse the RIFF/fmt/data layout; None for anything that is not a
      * well-formed PCM WAV (a malformed file must not kill a 100 TB job —
      * callers surface nulls and count them).
      */
    def probe(bytes: Array[Byte]): Option[WavMeta] =
      if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") None
      else for {
        (fo, fsz) <- findChunk(bytes, "fmt ") if fsz >= 16 && u16(bytes, fo) == 1 // PCM
        (_, dsz) <- findChunk(bytes, "data")
        block = u16(bytes, fo + 12) if block > 0
        ch = u16(bytes, fo + 2) if ch > 0 // channels=0 would divide-by-zero downstream
        rate = u32(bytes, fo + 4).toInt if rate > 0
      } yield {
        val n = dsz / block
        WavMeta(rate, ch, u16(bytes, fo + 14), n, n * 1000L / rate)
      }

    /** Per-frame (rms, zero-crossing count) over channel 0 of 16-bit PCM —
      * the classic cheap audio features (silence/energy gating, rough
      * pitch). Empty for non-PCM16 input.
      */
    def frameStats(bytes: Array[Byte], frameMs: Int = 25): Seq[(Int, Float, Int)] =
      (for {
        m <- probe(bytes) if m.bits_per_sample == 16
        (dOff, dSz) <- findChunk(bytes, "data")
      } yield {
        val block = m.channels * 2
        val nSamples = (dSz / block).toInt
        val perFrame = math.max(1, m.sample_rate * frameMs / 1000)
        def sample(i: Int): Int = {
          val o = dOff + i * block
          ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toInt
        }
        (0 until nSamples / perFrame).map { f =>
          var sumSq = 0.0; var zc = 0; var prev = sample(f * perFrame)
          var i = f * perFrame
          while (i < (f + 1) * perFrame) {
            val s = sample(i)
            sumSq += s.toDouble * s
            if ((s >= 0) != (prev >= 0)) zc += 1
            prev = s; i += 1
          }
          (f, (math.sqrt(sumSq / perFrame) / 32768.0).toFloat, zc)
        }
      }).getOrElse(Seq.empty)

    /** Synthesize a valid mono PCM16 WAV (test fixtures + docs). */
    def synthesize(freqHz: Double, ms: Int, rate: Int = 16000,
                   amplitude: Double = 0.8): Array[Byte] = {
      val n = rate * ms / 1000
      val dataSz = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSz)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataSz)
      var i = 0
      while (i < n) {
        bb.putShort((amplitude * 32767.0 *
          math.sin(2.0 * math.Pi * freqHz * i / rate)).toShort)
        i += 1
      }
      bb.array()
    }

    /** Decimation resample of a mono PCM16 WAV: keep every `factor`-th
      * sample, the rate divides by `factor` — the audio analogue of the
      * image thumbnail stage (16 kHz → 8 kHz model-ingest
      * normalization; proper band-limiting belongs upstream of this
      * primitive). Kept samples are the source samples verbatim, so
      * the re-probe oracle is pure header arithmetic. None for
      * non-mono / non-PCM16 / non-dividing-rate / malformed input.
      */
    def decimate(bytes: Array[Byte], factor: Int): Option[Array[Byte]] = {
      require(factor >= 1, "decimation factor must be ≥ 1")
      for {
        m <- probe(bytes)
        if m.channels == 1 && m.bits_per_sample == 16 &&
          m.sample_rate % factor == 0
        (dOff, dSz) <- findChunk(bytes, "data")
      } yield {
        val n = (dSz / 2).toInt
        val outN = (n + factor - 1) / factor
        val dataSz = outN * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataSz)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSz)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(m.sample_rate / factor)
          .putInt(m.sample_rate / factor * 2).putShort(2).putShort(16)
        bb.put("data".getBytes("US-ASCII")).putInt(dataSz)
        var i = 0
        while (i < n) {
          bb.putShort(((bytes(dOff + 2 * i) & 0xFF) |
            (bytes(dOff + 2 * i + 1) << 8)).toShort)
          i += factor
        }
        bb.array()
      }
    }

    /** Synthesize with a PER-FRAME amplitude envelope (one amplitude per
      * `frameMs` frame, aligned with [[frameStats]] framing) — the
      * fixture for [[Multimodal.audioFingerprint]]: frame-RMS ordering
      * then follows the envelope exactly when adjacent amplitudes differ
      * by more than quantization noise.
      */
    def synthesizeEnvelope(freqHz: Double, amps: Seq[Double],
                           frameMs: Int = 25, rate: Int = 16000): Array[Byte] = {
      val perFrame = math.max(1, rate * frameMs / 1000)
      val n = perFrame * amps.size
      val dataSz = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSz)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataSz)
      var i = 0
      while (i < n) {
        bb.putShort((amps(i / perFrame) * 32767.0 *
          math.sin(2.0 * math.Pi * freqHz * i / rate)).toShort)
        i += 1
      }
      bb.array()
    }
  }

  /** Audio resample stage (decimation): mono PCM16 WAV in, WAV at
    * rate/factor out as a new binary column — (id, media, sample_rate,
    * n_samples), nulls when the input is malformed or unsupported.
    * Same mapPartitions/null-row contract as [[resizeImages]].
    */
  def resampleWav(spark: SparkSession, df: DataFrame, idCol: String,
                  factor: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        WavCodec.decimate(bytes, factor) match {
          case Some(out) =>
            val m = WavCodec.probe(out).get
            (id, Some(out), Some(m.sample_rate), Some(m.n_samples))
          case None => (id, None, None, None)
        }
      })
      .toDF("id", "media", "sample_rate", "n_samples")
  }

  /** Probe real WAV metadata per row (mapPartitions, like [[probeMeta]]).
    * Malformed media yields null fields, never a task failure.
    */
  def probeWavMeta(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // Try: the no-task-failure contract must hold even for parser bugs
        // on adversarial bytes, not just the malformed shapes probe expects.
        scala.util.Try(WavCodec.probe(bytes)).toOption.flatten match {
          case Some(m) => (id, true, Some(m.sample_rate), Some(m.channels),
            Some(m.bits_per_sample), Some(m.n_samples), Some(m.duration_ms))
          case None => (id, false, None, None, None, None, None)
        }
      }
    }.toDF("id", "valid", "sample_rate", "channels", "bits_per_sample",
      "n_samples", "duration_ms")
  }

  /** Real per-frame audio features (RMS energy + zero crossings) — the
    * same 1→N fan-out shape as [[sampleFrames]], measured not faked.
    */
  def wavFrameFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                       frameMs: Int = 25): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.flatMap { case (id, bytes) =>
      scala.util.Try(WavCodec.frameStats(bytes, frameMs)).getOrElse(Seq.empty)
        .iterator.map { case (f, rms, zc) => (id, f, rms, zc) }
    }.toDF("id", "frame_idx", "rms", "zero_crossings")
  }

  /** REAL image METADATA probing: PNG / GIF / JPEG dimensions parsed
    * from the container headers in pure JVM — dimension filtering (drop
    * tiny thumbnails, absurd aspect ratios) needs no pixel decode; the
    * pixel path itself (decode / resize / dHash) is real ImageIO in
    * [[ImageCodec.decode]] and the frame/phash operators built on it.
    */
  object ImageMeta {
    case class Dims(format: String, width: Int, height: Int)

    private def u16be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
        ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

    def probe(bytes: Array[Byte]): Option[Dims] = {
      def isPng = bytes.length >= 24 &&
        bytes.take(8).sameElements(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)) &&
        new String(bytes, 12, 4, "US-ASCII") == "IHDR"
      def isGif = bytes.length >= 10 && {
        val sig = new String(bytes, 0, 6, "US-ASCII")
        sig == "GIF87a" || sig == "GIF89a"
      }
      def isJpeg = bytes.length >= 4 &&
        (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
      if (isPng) Some(Dims("png", u32be(bytes, 16), u32be(bytes, 20)))
      else if (isGif) Some(Dims("gif", u16le(bytes, 6), u16le(bytes, 8)))
      else if (isJpeg) {
        // walk segment markers to the first SOFn frame header
        var o = 2
        while (o + 9 < bytes.length) {
          if ((bytes(o) & 0xFF) != 0xFF) return None
          val marker = bytes(o + 1) & 0xFF
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof)
            return Some(Dims("jpeg", u16be(bytes, o + 7), u16be(bytes, o + 5)))
          o += 2 + u16be(bytes, o + 2)
        }
        None
      } else None
    }

    /** Minimal PNG header bytes (signature + IHDR) — probe-valid test
      * fixture; a full encoder is pixel-decode territory, out of scope.
      */
    def synthesizePngHeader(width: Int, height: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(33)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
      bb.putInt(width).putInt(height)
      bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.array()
    }
  }

  /** Probe image dimensions per row (mapPartitions, like [[probeMeta]]);
    * malformed media yields null fields, never a task failure.
    */
  def probeImageMeta(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        ImageMeta.probe(bytes) match {
          case Some(d) => (id, true, Some(d.format), Some(d.width), Some(d.height))
          case None => (id, false, None, None, None)
        }
      }
    }.toDF("id", "valid", "format", "width", "height")
  }

  /** Audio perceptual fingerprint per media row: (id, valid, afp) with
    * up to 56 sign-of-delta bits over the frame-RMS sequence (bit f set
    * iff rms(f+1) > rms(f)) — the audio analogue of the image dHash:
    * energy-envelope SHAPE, robust to uniform gain. Non-PCM16 media →
    * valid=false, null fingerprint. Near-dups via
    * [[phashNearDupPairs]] (it is generic over any ≤56-bit long
    * column).
    */
  def audioFingerprint(spark: SparkSession, df: DataFrame, idCol: String,
                       frameMs: Int = 25): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val frames = scala.util.Try(WavCodec.frameStats(bytes, frameMs))
          .getOrElse(Seq.empty)
        if (frames.isEmpty) (id, false, None)
        else {
          var fp = 0L
          val rms = frames.map(_._2)
          val n = math.min(rms.size - 1, 56)
          var f = 0
          while (f < n) {
            if (rms(f + 1) > rms(f)) fp |= 1L << f
            f += 1
          }
          (id, true, Some(fp))
        }
      }
    }.toDF("id", "valid", "afp")
  }

  /** Perceptual hash per media row: (id, valid, phash) with the 56-bit
    * dHash of the decoded first frame; undecodable media → valid=false,
    * null hash. The image-side analogue of text fingerprinting — exact
    * dedup on `phash` catches resized/recompressed copies, and
    * [[phashNearDupPairs]] catches small edits.
    */
  def imagePHash(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        ImageCodec.decode(bytes) match {
          case Some(img) => (id, true, Some(ImageCodec.dHash(img)))
          case None => (id, false, None)
        }
      }
    }.toDF("id", "valid", "phash")
  }

  /** Near-duplicate image pairs by dHash hamming distance ≤ `maxHamming`
    * — banded like SimHash: the 56 bits split into `maxHamming + 1`
    * bands, so any pair within the bound shares at least one exact band
    * (pigeonhole); candidates join on (band, band-bits), then the full
    * hamming check verifies. No O(n²) pass; same shape as
    * `TextDedup.simhashPairs`.
    */
  def phashNearDupPairs(hashes: DataFrame, idCol: String, phashCol: String,
                        maxHamming: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 56, "maxHamming must be in [0, 56)")
    val bands = maxHamming + 1
    // distribute the 56 bits so EVERY band is non-empty: base width plus
    // one extra bit for the first 56 % bands bands. A fixed ceil width
    // would give trailing bands an empty mask (bits = 0 for every row)
    // once bands·width overshoots 56 — an accidental all-pairs join.
    val base = 56 / bands
    val rem = 56 % bands
    val widths = (0 until bands).map(b => base + (if (b < rem) 1 else 0))
    val los = widths.scanLeft(0)(_ + _)
    val h = col(phashCol).cast("long")
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        h.bitwiseAND(lit(((1L << widths(b)) - 1) << los(b))).as("bits"))
    }
    val banded = hashes
      .select(col(idCol).cast("long").as("_id"), h.as("_h"),
        explode(array(bandCols: _*)).as("_b"))
      .select(col("_id"), col("_h"), col("_b.band").as("band"), col("_b.bits").as("bits"))
    val a = banded.select(col("_id").as("id_a"), col("_h").as("_ha"),
      col("band"), col("bits"))
    val b = banded.select(col("_id").as("id_b"), col("_h").as("_hb"),
      col("band"), col("bits"))
    a.join(b, Seq("band", "bits")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Attach a deliberately NON-image binary column (md5 bytes) — the
    * negative-path fixture proving malformed media yields nulls/empties,
    * never task failures. Production media comes from
    * `spark.read.format("binaryFile")` (or [[syntheticImages]] in tests).
    */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", to_binary(md5(col(textCol)), lit("hex")))
      .withColumn("media_type", lit("image/fake"))

  /** Probe metadata for each media row: the cheap header walk
    * ([[ImageMeta.probe]]) first, ImageIO header read as fallback for
    * formats it doesn't know (BMP, …). Runs per-partition so codec init
    * amortizes per partition, not per row; undecodable media yields
    * nulls, never a task failure.
    */
  def probeMeta(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        ImageMeta.probe(bytes).orElse(ImageCodec.probe(bytes)) match {
          case Some(d) => (id, true, Some(d.format), Some(d.width), Some(d.height),
            bytes.length.toLong)
          case None => (id, false, None, None, None, bytes.length.toLong)
        }
      }
    }.toDF("id", "valid", "format", "width", "height", "n_bytes")
  }

  /** Frame-sample: emit up to `framesPerDoc` REAL feature rows per media
    * item — the fan-out shape (1 row → N frames) of video/audio feature
    * extraction, with the feature vector measured from decoded pixels
    * (channel means + 8-bin luma histogram). Undecodable media emits no
    * frames.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   framesPerDoc: Int = 4): Dataset[DecodedFrame] = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.flatMap { case (id, bytes) =>
      ImageCodec.frames(bytes, framesPerDoc).iterator.map { case (idx, img) =>
        val f = ImageCodec.features(img)
        val n = (f.width.toLong * f.height).toFloat
        DecodedFrame(id, idx,
          Array(f.sumR / n, f.sumG / n, f.sumB / n) ++
            f.lumaHist.map(_.toFloat))
      }
    }
  }
}
