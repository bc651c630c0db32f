package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` payloads plus typed metadata, with decode / feature-extraction
  * as batched partition-local transforms.
  *
  * The Spark-side architecture is the real deliverable here — schema,
  * partitioning, batch shape. The codec itself is a STUB: this container
  * has no image/audio libraries, so [[FakeCodec]] derives deterministic
  * "decoded" features from the payload bytes. Swapping in a real decoder
  * (JNI ffmpeg, javacv, …) changes only the body of `decode`, not the
  * pipeline: `mapPartitions` gives the per-executor batching a native
  * decoder needs (amortized init, sequential buffers), exactly the role
  * `mapInPandas` plays on the Python side.
  */
object Multimodal {

  /** Feature row produced by decode: payload identity + fake media dims. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload_len", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** A media decoder: payload bytes → (width, height, n_frames). Real
    * implementations (JNI ffmpeg, javacv, …) plug in here and run through
    * the batched [[extractFeaturesWith]] path.
    */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): (Long, Long, Long)
  }

  /** STUB decoder: deterministic features from payload length. A real
    * implementation would parse the container format here.
    */
  object FakeCodec extends Codec {
    def dims(payloadLen: Long): (Long, Long, Long) =
      (64 + payloadLen % 512, 64 + (payloadLen * 7) % 512, 1 + payloadLen % 8)
    def decode(payload: Array[Byte]): (Long, Long, Long) = dims(payload.length.toLong)
  }

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — the
    * deterministic stand-in for real media bytes) plus a media_type tag.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      lit("image/fake").as("media_type"),
      col(textCol).cast("binary").as("payload"))

  /** Feature extraction with the stub codec, expressed as pure codegen'd
    * column algebra (md5 / octet_length / arithmetic) — everything the stub
    * computes is expressible without leaving Tungsten, so the default path
    * stays inside whole-stage codegen. A REAL native decoder cannot be a
    * column expression; that is what [[extractFeaturesWith]] is for.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val len = octet_length(col("payload")).cast("long")
    media.select(col("doc_id"), col("media_type"),
      len.as("payload_len"),
      md5(col("payload")).as("payload_md5"),
      (lit(64L) + len % 512L).as("width"),
      (lit(64L) + (len * 7L) % 512L).as("height"),
      (lit(1L) + len % 8L).as("n_frames"))
  }

  /** Batched decode/feature-extract over (doc_id, media_type, payload)
    * through an opaque [[Codec]]. Partition-local: one decoder instance per
    * partition, rows streamed through it — no shuffle, no driver
    * involvement; `mapPartitions` gives native decoders the amortized-init,
    * sequential-buffer batch shape (the JVM analogue of `mapInPandas`).
    */
  def extractFeaturesWith(media: DataFrame, codec: Codec): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          digest.reset()
          val md5hex = digest.digest(payload).map("%02x".format(_)).mkString
          val (w, h, f) = codec.decode(payload)
          Row(id, mt, payload.length.toLong, md5hex, w, h, f)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling stub: every `stride`-th frame index of each media row —
    * shows the explode-shaped (one row per frame) pipeline stage used by
    * video training-data prep.
    */
  def sampleFrames(features: DataFrame, stride: Int = 2): DataFrame =
    features.select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))

  /** Resize planning: fit each media's (width, height) into a
    * (maxW, maxH) box preserving aspect ratio, never upscaling. The
    * geometry is the real pipeline stage (it decides per-row decode
    * parameters and output batch shapes); applying it to pixels belongs to
    * a [[Codec]]. Pure column arithmetic — codegen'd, row-local.
    */
  def resizePlan(features: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0d))
    features.select(col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("long").as("out_width"),
      floor(col("height") * scale).cast("long").as("out_height"),
      round(scale, 4).as("scale"))
  }
}
