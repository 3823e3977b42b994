package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Model: media is an opaque `binary` column plus a typed metadata struct
  * `(media_type, width, height, duration_ms, n_bytes)`. The Spark-side
  * plumbing — schema, partition-friendly batch shape, per-partition
  * processing — is real and tested; the actual codec step is STUBBED with
  * a deterministic fake (image/audio libraries are not in this
  * container). Swap [[FakeCodec]] for a real decoder (JavaCV/TwelveMonkeys
  * on the executor classpath) without touching the dataflow.
  */
object Multimodal {

  case class MediaMeta(media_type: String, width: Int, height: Int,
                       duration_ms: Long, n_bytes: Long)
  case class DecodedFrame(doc_id: Long, frame_idx: Int, feature: Array[Float])

  /** STUB decoder — deterministic fake deriving pseudo-metadata from the
    * byte content. Replace with a real codec for production.
    */
  object FakeCodec {
    def probe(bytes: Array[Byte], mediaType: String): MediaMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      MediaMeta(mediaType, 16 + math.abs(h % 1024), 16 + math.abs((h / 7) % 1024),
        math.abs(h.toLong % 600000L), bytes.length.toLong)
    }
    /** Fake per-frame feature vector (would be a CNN embedding / fbank). */
    def frameFeature(bytes: Array[Byte], frameIdx: Int, dim: Int = 8): Array[Float] = {
      val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes).toLong * 31 + frameIdx)
      Array.fill(dim)(rnd.nextFloat())
    }
  }

  /** REAL codec for one modality: PCM WAV (RIFF). Pure-JVM byte parsing —
    * no audio library needed — so unlike [[FakeCodec]] this is NOT a
    * stub: metadata comes from the actual chunk layout and features are
    * measured from the PCM samples. Demonstrates the swap-in path the
    * FakeCodec documents.
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
    * tiny thumbnails, absurd aspect ratios) needs no pixel decode, so
    * like [[WavCodec]] this part is NOT a stub; only pixel decode /
    * resize stays behind [[FakeCodec]].
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

  /** Attach a binary media column (here synthesized from a text column for
    * testing; in production this is `spark.read.format("binaryFile")`).
    */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", to_binary(md5(col(textCol)), lit("hex")))
      .withColumn("media_type", lit("image/fake"))

  /** Probe metadata for each media row. Runs per-partition (mapPartitions
    * under the typed API) so a real codec would amortize init per
    * partition, not per row.
    */
  def probeMeta(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"), col("media_type"))
      .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.map { case (id, bytes, mt) =>
        val m = FakeCodec.probe(bytes, mt)
        (id, m.media_type, m.width, m.height, m.duration_ms, m.n_bytes)
      }
    }.toDF("id", "media_type", "width", "height", "duration_ms", "n_bytes")
  }

  /** Frame-sample: emit `framesPerDoc` feature rows per media item — the
    * fan-out shape (1 row → N frames) of video/audio feature extraction.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   framesPerDoc: Int = 4): Dataset[DecodedFrame] = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.flatMap { case (id, bytes) =>
      (0 until framesPerDoc).iterator
        .map(i => DecodedFrame(id, i, FakeCodec.frameFeature(bytes, i)))
    }
  }
}
