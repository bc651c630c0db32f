package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Delta deletion-vector bitmap codec: the 64-bit RoaringBitmapArray
  * "portable" serialization delta-io's PROTOCOL.md specifies for
  * deletion vectors, over the standard 32-bit RoaringBitmap wire format
  * (the public RoaringFormatSpec). No library dependency — a reader and
  * a minimal writer over plain byte buffers.
  *
  * Layout (all little-endian unless noted):
  *  - blob = [magic: i32 = 1681511377][portable RoaringBitmapArray]
  *  - portable array = [numBitmaps: i64][per bitmap, ascending key:
  *    [key: i32][standard 32-bit RoaringBitmap]]; a set bit `(key, low)`
  *    encodes the 64-bit value `key << 32 | low`.
  *  - standard 32-bit bitmap = [cookie][containers...] with three
  *    container kinds (array / bitmap / run) per RoaringFormatSpec.
  *
  * The writer emits array/bitmap containers only (no runs) with the
  * SERIAL_COOKIE_NO_RUNCONTAINER header — the simplest spec-valid
  * encoding; the reader accepts all three kinds.
  */
object RoaringBitmaps {

  val Magic = 1681511377

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Decode a DV blob (magic + portable array) to ascending row indexes. */
  def decodeBlob(blob: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, s"bad deletion-vector magic $magic (want $Magic)")
    val numBitmaps = bb.getLong()
    require(numBitmaps >= 0 && numBitmaps <= Int.MaxValue,
      s"implausible bitmap count $numBitmaps")
    val out = Array.newBuilder[Long]
    var b = 0L
    while (b < numBitmaps) {
      val key = bb.getInt().toLong & 0xFFFFFFFFL
      decode32(bb, v => out += (key << 32) | (v.toLong & 0xFFFFFFFFL))
      b += 1
    }
    out.result()
  }

  /** Decode one standard 32-bit RoaringBitmap starting at bb's position,
    * advancing the position past it; emits set values in order.
    */
  private def decode32(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt()
    val hasRuns = (cookie & 0xFFFF) == SerialCookie
    val nContainers =
      if (hasRuns) (cookie >>> 16) + 1
      else {
        require((cookie & 0xFFFF) == SerialCookieNoRun,
          s"bad roaring cookie ${cookie & 0xFFFF}")
        bb.getInt()
      }
    val runFlags = new Array[Boolean](nContainers)
    if (hasRuns) {
      val bytes = (nContainers + 7) / 8
      var i = 0
      while (i < bytes) {
        val v = bb.get().toInt & 0xFF
        var j = 0
        while (j < 8 && i * 8 + j < nContainers) {
          runFlags(i * 8 + j) = ((v >> j) & 1) == 1
          j += 1
        }
        i += 1
      }
    }
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort().toInt & 0xFFFF
      cards(i) = (bb.getShort().toInt & 0xFFFF) + 1
      i += 1
    }
    // offset header present for the no-run cookie, or with runs once the
    // container count reaches the spec's threshold — skip it either way
    if (!hasRuns || nContainers >= NoOffsetThreshold)
      bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val hi = keys(i) << 16
      if (runFlags(i)) {
        val nRuns = bb.getShort().toInt & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort().toInt & 0xFFFF
          val len = bb.getShort().toInt & 0xFFFF
          var v = start
          while (v <= start + len) { emit(hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitmap container: 1024 x 64-bit words
        var w = 0
        while (w < 1024) {
          val word = bb.getLong()
          if (word != 0L) {
            var bit = 0
            while (bit < 64) {
              if (((word >>> bit) & 1L) == 1L) emit(hi | (w * 64 + bit))
              bit += 1
            }
          }
          w += 1
        }
      } else {
        var c = 0
        while (c < cards(i)) {
          emit(hi | (bb.getShort().toInt & 0xFFFF))
          c += 1
        }
      }
      i += 1
    }
  }

  /** Encode ascending, distinct row indexes as a DV blob. */
  def encodeBlob(values: Array[Long]): Array[Byte] = {
    require(values.sameElements(values.sorted.distinct),
      "values must be ascending and distinct")
    val byKey = values.groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    val bb = new ByteArrayOutputStream()
    val out = new DataOutputStream(bb)
    def i16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def i32(v: Int): Unit = { i16(v & 0xFFFF); i16((v >>> 16) & 0xFFFF) }
    def i64(v: Long): Unit = { i32((v & 0xFFFFFFFFL).toInt); i32((v >>> 32).toInt) }
    i32(Magic)
    i64(byKey.size.toLong)
    byKey.foreach { case (key, vs) =>
      i32(key)
      val chunks = vs.map(v => (v & 0xFFFFFFFFL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      i32(SerialCookieNoRun)
      i32(chunks.size)
      chunks.foreach { case (hi, lows) =>
        i16(hi); i16(lows.length - 1)
      }
      // offset header: running byte offsets of each container, counted
      // from the bitmap's start (cookie byte 0)
      var off = 4 + 4 + 4 * chunks.size + 4 * chunks.size
      chunks.foreach { case (_, lows) =>
        i32(off)
        off += (if (lows.length > 4096) 8192 else 2 * lows.length)
      }
      chunks.foreach { case (_, lows) =>
        if (lows.length > 4096) {
          val words = new Array[Long](1024)
          lows.foreach { v =>
            val low = v & 0xFFFF
            words(low >> 6) |= (1L << (low & 63))
          }
          words.foreach(i64)
        } else lows.foreach(v => i16(v & 0xFFFF))
      }
    }
    out.flush()
    bb.toByteArray
  }

  /** Z85 codec (the 4-byte-block Base85 variant delta's descriptors use
    * for UUIDs and inline bitmaps).
    */
  object Z85 {
    private val alphabet =
      "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    private val decodeMap: Array[Int] = {
      val m = Array.fill(128)(-1)
      alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
      m
    }

    def encode(bytes: Array[Byte]): String = {
      require(bytes.length % 4 == 0, "Z85 encodes 4-byte blocks")
      val sb = new StringBuilder(bytes.length / 4 * 5)
      var i = 0
      while (i < bytes.length) {
        var v = 0L
        var j = 0
        while (j < 4) { v = (v << 8) | (bytes(i + j).toLong & 0xFF); j += 1 }
        val block = new Array[Char](5)
        var k = 4
        while (k >= 0) { block(k) = alphabet((v % 85).toInt); v /= 85; k -= 1 }
        sb.appendAll(block)
        i += 4
      }
      sb.toString
    }

    def decode(s: String): Array[Byte] = {
      require(s.length % 5 == 0, "Z85 decodes 5-char blocks")
      val out = new Array[Byte](s.length / 5 * 4)
      var i = 0
      while (i < s.length) {
        var v = 0L
        var j = 0
        while (j < 5) {
          val c = s.charAt(i + j).toInt
          val d = if (c < 128) decodeMap(c) else -1
          require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
          v = v * 85 + d
          j += 1
        }
        var k = 3
        val base = i / 5 * 4
        while (k >= 0) { out(base + k) = (v & 0xFF).toByte; v >>= 8; k -= 1 }
        i += 5
      }
      out
    }

    def encodeUuid(uuid: java.util.UUID): String = {
      val bb = ByteBuffer.allocate(16)
      bb.putLong(uuid.getMostSignificantBits)
      bb.putLong(uuid.getLeastSignificantBits)
      encode(bb.array())
    }

    def decodeUuid(s: String): java.util.UUID = {
      val b = decode(s)
      require(b.length == 16, s"UUID must decode to 16 bytes, got ${b.length}")
      val bb = ByteBuffer.wrap(b)
      new java.util.UUID(bb.getLong(), bb.getLong())
    }
  }
}
