package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` payloads plus typed metadata, with decode / feature-extraction
  * as batched partition-local transforms.
  *
  * The decode path is REAL: [[ImageIoCodec]] parses actual PNG/GIF
  * container bytes with pure-JVM `javax.imageio` (no external deps) —
  * width/height from the image header, frame count by walking the GIF
  * frame sequence. Other decoders (JNI ffmpeg, javacv, …) plug in behind
  * the same [[Codec]] trait and run through the batched
  * [[extractFeaturesWith]] path: `mapPartitions` gives the per-executor
  * batching a native decoder needs (amortized init, sequential buffers),
  * exactly the role `mapInPandas` plays on the Python side.
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

  /** Real pure-JVM image decoder (`javax.imageio`): width/height from the
    * container header, frame count by walking the frame sequence (animated
    * GIFs report every frame). Rejects undecodable payloads loudly — a
    * silent sentinel would let corrupt media flow into training data.
    */
  object ImageIoCodec extends Codec {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      // memory-cached input: the default file-cache spills every payload
      // to a temp file, an absurd cost for in-memory byte arrays
      javax.imageio.ImageIO.setUseCache(false)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            s"undecodable payload (${payload.length} bytes): no ImageIO reader claims it")
        val r = readers.next()
        r.setInput(in)
        try (r.getWidth(0).toLong, r.getHeight(0).toLong,
          r.getNumImages(true).toLong)
        finally r.dispose()
      } finally in.close()
    }
  }

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — the
    * deterministic stand-in for real media bytes) plus a media_type tag.
    * The synthetic-payload fixture for the column-algebra feature path
    * ([[extractFeatures]]); real image bytes come from
    * [[attachImagePayload]].
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      lit("image/fake").as("media_type"),
      col(textCol).cast("binary").as("payload"))

  /** Deterministic REAL image dimensions as a pure function of id — the
    * closed form both the payload generator and the decode oracle share.
    */
  def imageDims(id: Long): (Int, Int) =
    (16 + (id % 32).toInt, 16 + ((id * 3) % 32).toInt)

  /** GIF frame count for odd ids (PNGs are single-frame). */
  def gifFrames(id: Long): Int = 2 + (id % 4).toInt

  private val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Attach REAL media bytes: a PNG (even ids) or multi-frame animated GIF
    * (odd ids) encoded per row with `javax.imageio`, dimensions and frame
    * counts the closed form of [[imageDims]]/[[gifFrames]]. This is the
    * test-corpus generator standing in for media read from object storage;
    * the bytes are genuine container formats that any external decoder
    * also parses. Partition-local imperative byte work — the same batched
    * `mapPartitions` shape as decode.
    */
  def attachImagePayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = imageDims(id)
        if (id % 2 == 0) Row(id, "image/png", encodePng(id, w, h))
        else Row(id, "image/gif", encodeGif(id, w, h, gifFrames(id)))
      }
    }
    spark.createDataFrame(rdd, payloadSchema)
  }

  /** One deterministic frame: every pixel a hash of (id, frame, x, y). */
  private def renderFrame(id: Long, w: Int, h: Int, f: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((id + f) * 2654435761L + x * 31L + y * 131L) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(renderFrame(id, w, h, 0), "png", bos)
    bos.toByteArray
  }

  private def encodeGif(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(renderFrame(id, w, h, f), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      out.close()
    }
    bos.toByteArray
  }

  /** Payload-metadata features as pure codegen'd column algebra
    * (md5 / octet_length / synthetic dims from the length) — everything
    * here is expressible without leaving Tungsten, so this path stays
    * inside whole-stage codegen. Parsing a REAL container format cannot
    * be a column expression; that is [[extractFeaturesWith]] +
    * [[ImageIoCodec]].
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
