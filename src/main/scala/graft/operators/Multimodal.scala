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

  /** Perceptual dHash over REAL decoded pixels — image near-dup detection
    * for multimodal training data (re-encoded/renamed duplicates share a
    * hash; byte-level md5 cannot see them). Pipeline per row, all INTEGER
    * arithmetic so any engine replays it bit-for-bit: decode the first
    * frame with ImageIO → BT.601 integer grayscale
    * `(299r + 587g + 114b) / 1000` → 9×8 box-average grid (pixel (x,y) →
    * cell `(x·9 / w, y·8 / h)`, cell value = floor mean) → 64 bits, bit
    * (r,c) = 1 iff `cell(r, c+1) > cell(r, c)`, emitted as a 64-char
    * '0'/'1' string (a 2^63 bit would overflow a signed long).
    *
    * Same batched `mapPartitions` decode shape as
    * [[extractFeaturesWith]] — no shuffle, no driver, amortized decoder
    * init. Output: doc_id, media_type, width, height, dhash.
    */
  def perceptualDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
          require(img != null, s"undecodable payload for doc ${r.getLong(0)}")
          val (w, h) = (img.getWidth, img.getHeight)
          val sum = Array.ofDim[Long](8, 9)
          val cnt = Array.ofDim[Long](8, 9)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val gray = (((rgb >> 16) & 255) * 299L +
                ((rgb >> 8) & 255) * 587L + (rgb & 255) * 114L) / 1000L
              val (ci, rj) = (x * 9 / w, y * 8 / h)
              sum(rj)(ci) += gray; cnt(rj)(ci) += 1
              x += 1
            }
            y += 1
          }
          val bits = new StringBuilder(64)
          var rj = 0
          while (rj < 8) {
            var ci = 0
            while (ci < 8) {
              bits += (if (sum(rj)(ci + 1) / cnt(rj)(ci + 1) >
                sum(rj)(ci) / cnt(rj)(ci)) '1' else '0')
              ci += 1
            }
            rj += 1
          }
          Row(r.getLong(0), r.getString(1), w.toLong, h.toLong, bits.toString)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("dhash", StringType, nullable = false))))
  }

  /** Near-dup image pairs by banded dHash (the SimHash pigeonhole): 4
    * bands of 16 bits — hamming ≤ 3 guarantees an identical band — then
    * the exact hamming verify on candidates only. Never all-pairs: the
    * join key is (band index, band bits).
    */
  def perceptualNearDupPairs(hashed: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 6): DataFrame = {
    val banded = hashed.select(col(idCol), col("dhash"),
        posexplode(array((0 until 4).map(b =>
          substring(col("dhash"), b * 16 + 1, 16)): _*)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_key")
    val hamming = aggregate(
      zip_with(split(col("_ha"), ""), split(col("_hb"), ""),
        (x, y) => when(x === y, 0).otherwise(1)),
      lit(0), (acc, v) => acc + v)
    banded.select(col(idCol).as("a"), col("dhash").as("_ha"),
        col("_band"), col("_key"))
      .join(banded.select(col(idCol).as("b"), col("dhash").as("_hb"),
        col("_band"), col("_key")), Seq("_band", "_key"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Per-frame content fingerprints from REAL AVI containers — the
    * frame-level dedup primitive of video dataset curation (shared
    * intros/outros/static cards duplicate across files; file-level hashes
    * can't see them). Walks RIFF → `LIST movi` → `00db` chunks in
    * `mapPartitions` (batched, no shuffle) and fingerprints each frame as
    * the md5 of its bytes' canonical comma-joined unsigned form — a
    * string form any engine reproduces. Output: doc_id, frame_idx,
    * frame_len, frame_md5.
    */
  def videoFrameHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag4(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag4() == "RIFF", s"doc $id: not a RIFF container")
        buf.getInt()
        require(tag4() == "AVI ", s"doc $id: not an AVI")
        // walk top-level LIST chunks to the movi payload
        val frames = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (buf.remaining() >= 8) {
          val tag = tag4(); val len = buf.getInt()
          if (tag == "LIST") {
            val listEnd = buf.position() + len
            if (tag4() == "movi") {
              var idx = 0L
              while (buf.position() < listEnd) {
                val ctag = tag4(); val clen = buf.getInt()
                val bytes = new Array[Byte](clen); buf.get(bytes)
                if (ctag == "00db") {
                  digest.reset()
                  val canonical = bytes.map(_ & 0xFF).mkString(",")
                  val md5hex = digest.digest(canonical.getBytes("UTF-8"))
                    .map("%02x".format(_)).mkString
                  frames += Row(id, idx, clen.toLong, md5hex)
                  idx += 1
                }
              }
            } else buf.position(listEnd)
          } else buf.position(buf.position() + len)
        }
        frames
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_len", LongType, nullable = false),
      StructField("frame_md5", StringType, nullable = false))))
  }

  /** Scene parameters for the scene-structured AVI arm: (frames,
    * sceneLen) — frames within a scene are byte-identical, scenes differ
    * hash-randomly.
    */
  def sceneParams(id: Long): (Int, Int) =
    (8 + (id % 9).toInt, 3 + (id % 4).toInt)

  /** AVI payloads whose frames are SCENE-structured: frame f of doc id
    * carries byte i = ((id·131 + ⌊f/sceneLen⌋)·2654435761 + i·31) & 0xFF —
    * byte-identical inside a scene, hash-random across scene boundaries.
    * Closed form of (id, f, i), so scene-cut detection over REAL container
    * walks gets a full pixel-rederiving oracle (the q167/q168 pattern).
    */
  def attachAviScenesPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (n, sceneLen) = sceneParams(id)
        Row(id, "video/avi",
          encodeAviFrames(id, 32, 24, n, 10,
            (f, i) => (((id * 131 + f / sceneLen) * 2654435761L + i * 31L) & 0xFF).toByte))
      }
    }
    spark.createDataFrame(rdd, payloadSchema)
  }

  /** Scene-cut detection over real AVI walks: consecutive-frame mean
    * absolute byte delta, thresholded — the keyframe segmentation a
    * frame-sampling video pipeline runs before picking representative
    * frames per scene.
    *
    * Scale shape: the container is one blob, so the comparison is
    * DECODE-LOCAL — the walk keeps the previous frame in a local and
    * emits (frame, delta, is_cut) rows with NO shuffle at all; a
    * downstream per-scene aggregation shuffles scene rows, never pixels.
    */
  def videoSceneCuts(media: DataFrame, threshold: Double = 16.0): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag4(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag4() == "RIFF", s"doc $id: not a RIFF container")
        buf.getInt()
        require(tag4() == "AVI ", s"doc $id: not an AVI")
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var prev: Array[Byte] = null
        while (buf.remaining() >= 8) {
          val tag = tag4(); val len = buf.getInt()
          if (tag == "LIST") {
            val listEnd = buf.position() + len
            if (tag4() == "movi") {
              var idx = 0L
              while (buf.position() < listEnd) {
                val ctag = tag4(); val clen = buf.getInt()
                val bytes = new Array[Byte](clen); buf.get(bytes)
                if (ctag == "00db") {
                  if (prev != null) {
                    var s = 0L; var i = 0
                    val n = math.min(bytes.length, prev.length)
                    while (i < n) {
                      s += math.abs((bytes(i) & 0xFF) - (prev(i) & 0xFF)); i += 1
                    }
                    val delta = s.toDouble / math.max(1, n)
                    out += Row(id, idx,
                      BigDecimal(delta).setScale(4,
                        BigDecimal.RoundingMode.HALF_UP).toDouble,
                      delta >= threshold)
                  }
                  prev = bytes
                  idx += 1
                }
              }
            } else buf.position(listEnd)
          } else buf.position(buf.position() + len)
        }
        out
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("delta", DoubleType, nullable = false),
      StructField("is_cut", BooleanType, nullable = false))))
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

  // ------------------------------------------------------------------
  // Audio: REAL RIFF/WAVE container bytes, synthesized and decoded with
  // plain JVM byte work (PCM is a spec, not a codec — no external deps).
  // ------------------------------------------------------------------

  /** Deterministic per-id audio parameters shared by the synthesizer and
    * every oracle: (sampleRate, nSamples, sineHz).
    */
  def audioParams(id: Long): (Int, Int, Double) =
    (8000, 800 + (id % 800).toInt, 200.0 + (id % 20) * 40.0)

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload_len", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_channels", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  /** Attach REAL 16-bit PCM mono WAV bytes per row: a half-amplitude sine
    * at [[audioParams]]'s frequency, in a hand-built RIFF/WAVE container
    * any audio tool parses. Batched partition-local byte work, like the
    * image payload generator.
    */
  def attachWavPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (sr, n, hz) = audioParams(id)
        Row(id, "audio/wav", encodeWav(sr, n, hz))
      }
    }
    spark.createDataFrame(rdd, payloadSchema)
  }

  private def encodeWav(sampleRate: Int, nSamples: Int, hz: Double): Array[Byte] = {
    val dataLen = nSamples * 2 // 16-bit mono
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(math.round(
        16383.0 * math.sin(2.0 * math.Pi * hz * i / sampleRate)).toShort)
      i += 1
    }
    buf.array()
  }

  // ------------------------------------------------------------------
  // Video: REAL RIFF/AVI containers — same chunk discipline as WAV
  // (AVI is RIFF), synthesized with genuine frame chunks and decoded by
  // walking LIST/avih structure. Compressed codecs (H.264 etc.) plug in
  // behind the same batched mapPartitions shape with a JNI decoder; the
  // container walk — the Spark-side plumbing — is identical.
  // ------------------------------------------------------------------

  /** Deterministic per-id video parameters: (width, height, nFrames, fps). */
  def videoParams(id: Long): (Int, Int, Int, Int) =
    (32 + (id % 16).toInt * 8, 24 + (id % 12).toInt * 8,
      4 + (id % 13).toInt, 10 + (id % 3).toInt * 5)

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fps", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Attach REAL AVI bytes per row: RIFF('AVI ') with an `avih` main
    * header and a `movi` list of uncompressed '00db' frame chunks whose
    * bytes are a hash of (id, frame, offset) — genuine container
    * structure any AVI demuxer walks.
    */
  def attachAviPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h, n, fps) = videoParams(id)
        Row(id, "video/avi", encodeAvi(id, w, h, n, fps))
      }
    }
    spark.createDataFrame(rdd, payloadSchema)
  }

  private def encodeAvi(id: Long, w: Int, h: Int, frames: Int, fps: Int): Array[Byte] =
    encodeAviFrames(id, w, h, frames, fps,
      (f, i) => (((id + f) * 2654435761L + i * 31L) & 0xFF).toByte)

  private def encodeAviFrames(id: Long, w: Int, h: Int, frames: Int, fps: Int,
      byteAt: (Long, Long) => Byte): Array[Byte] = {
    val frameLen = 64 // token frame payload (uncompressed stand-in)
    val moviLen = 4 + frames * (8 + frameLen)
    val hdrlLen = 4 + 8 + 56 // 'hdrl' + avih chunk header + avih body
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlLen)
      .put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(frames) // dwTotalFrames
      .putInt(0).putInt(1) // dwInitialFrames, dwStreams
      .putInt(frameLen) // dwSuggestedBufferSize
      .putInt(w).putInt(h) // dwWidth, dwHeight
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviLen)
      .put("movi".getBytes("US-ASCII"))
    var f = 0
    while (f < frames) {
      buf.put("00db".getBytes("US-ASCII")).putInt(frameLen)
      var i = 0
      while (i < frameLen) {
        buf.put(byteAt(f.toLong, i.toLong))
        i += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Decode AVI payloads: RIFF('AVI ') walk to the `hdrl` list's `avih`
    * main header (width/height/frame count/frame period) and COUNT the
    * actual '00db'/'00dc' frame chunks in `movi` — the declared and the
    * physical frame count must agree or the container is corrupt (loud
    * failure, like the image/audio codecs).
    */
  def extractVideoFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag4(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag4() == "RIFF", s"doc $id: not RIFF")
        buf.getInt
        require(tag4() == "AVI ", s"doc $id: not AVI")
        var w = 0L; var h = 0L; var declared = 0L; var usPerFrame = 0L
        var counted = 0L
        while (buf.remaining() >= 8) {
          val chunk = tag4(); val len = buf.getInt
          if (chunk == "LIST") {
            val listType = tag4()
            if (listType == "hdrl") {
              val sub = tag4(); val subLen = buf.getInt
              require(sub == "avih", s"doc $id: hdrl without avih")
              val start = buf.position()
              usPerFrame = buf.getInt.toLong
              buf.getInt; buf.getInt; buf.getInt
              declared = buf.getInt.toLong
              buf.getInt; buf.getInt; buf.getInt
              w = buf.getInt.toLong; h = buf.getInt.toLong
              buf.position(start + subLen)
            } else if (listType == "movi") {
              val end = buf.position() + (len - 4)
              while (buf.position() < end) {
                val fc = tag4(); val fl = buf.getInt
                if (fc.endsWith("db") || fc.endsWith("dc")) counted += 1
                buf.position(buf.position() + fl + (fl & 1))
              }
            } else buf.position(buf.position() + (len - 4))
          } else buf.position(buf.position() + len + (len & 1))
        }
        require(declared == counted,
          s"doc $id: avih declares $declared frames, movi holds $counted")
        val fps = if (usPerFrame == 0) 0L else 1000000L / usPerFrame
        Row(id, payload.length.toLong, w, h, counted, fps,
          if (fps == 0) 0L else counted * 1000L / fps)
      }
    }
    spark.createDataFrame(rdd, videoFeatureSchema)
  }

  /** Decode WAV payloads: RIFF/WAVE chunk walk (fmt + data), then one
    * pass over the PCM samples for rms/peak. Undecodable or non-PCM
    * payloads throw — same loud-failure contract as [[ImageIoCodec]].
    * Batched `mapPartitions`, sequential buffers, no allocation per
    * sample.
    */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag4(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag4() == "RIFF", s"doc $id: not a RIFF container")
        buf.getInt // riff size
        require(tag4() == "WAVE", s"doc $id: not a WAVE file")
        var sampleRate = 0; var channels = 0; var bits = 0
        var nSamples = 0L; var sumSq = 0.0; var peak = 0.0
        var seenData = false
        while (buf.remaining() >= 8) {
          val chunk = tag4(); val len = buf.getInt
          chunk match {
            case "fmt " =>
              val fmt = buf.getShort
              require(fmt == 1, s"doc $id: not PCM (format $fmt)")
              channels = buf.getShort
              sampleRate = buf.getInt
              buf.getInt; buf.getShort // byte rate, block align
              bits = buf.getShort
              require(bits == 16, s"doc $id: only 16-bit PCM supported")
              buf.position(buf.position() + (len - 16))
            case "data" =>
              require(sampleRate > 0, s"doc $id: data chunk before fmt")
              seenData = true
              val count = len / 2
              var i = 0
              while (i < count) {
                val s = buf.getShort.toDouble / 32768.0
                sumSq += s * s
                val a = math.abs(s); if (a > peak) peak = a
                i += 1
              }
              nSamples += count / channels
            case _ => buf.position(buf.position() + len)
          }
        }
        require(seenData, s"doc $id: no data chunk")
        val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / (nSamples * channels))
        Row(id, payload.length.toLong, sampleRate.toLong, channels.toLong,
          nSamples, nSamples * 1000L / sampleRate,
          math.rint(rms * 10000) / 10000, math.rint(peak * 10000) / 10000)
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }
}
