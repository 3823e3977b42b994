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
