package graft.fls

import java.nio.charset.StandardCharsets
import java.util.Arrays

/** Little-endian growable byte sink for segment + footer encoding. */
final class ByteWriter(initial: Int = 1 << 16) {
  private var buf = new Array[Byte](initial)
  private var pos = 0

  def size: Int = pos

  private def ensure(n: Int): Unit =
    if (pos + n > buf.length) {
      var cap = buf.length
      while (cap < pos + n) cap <<= 1
      buf = Arrays.copyOf(buf, cap)
    }

  def writeByte(v: Int): Unit = { ensure(1); buf(pos) = v.toByte; pos += 1 }

  /** Overwrite an already-written byte (wrapper encodings patch their
    * inner tag after the inner encoder has run). */
  def patchByte(at: Int, v: Int): Unit = {
    require(at >= 0 && at < pos, s"patchByte($at) out of range 0..$pos")
    buf(at) = v.toByte
  }

  def writeInt(v: Int): Unit = {
    ensure(4)
    buf(pos) = v.toByte; buf(pos + 1) = (v >>> 8).toByte
    buf(pos + 2) = (v >>> 16).toByte; buf(pos + 3) = (v >>> 24).toByte
    pos += 4
  }

  def writeLong(v: Long): Unit = {
    ensure(8)
    var i = 0
    while (i < 8) { buf(pos + i) = (v >>> (8 * i)).toByte; i += 1 }
    pos += 8
  }

  def writeDouble(v: Double): Unit = writeLong(java.lang.Double.doubleToRawLongBits(v))

  def writeBytes(b: Array[Byte], off: Int, len: Int): Unit = {
    ensure(len); System.arraycopy(b, off, buf, pos, len); pos += len
  }

  def writeBytes(b: Array[Byte]): Unit = writeBytes(b, 0, b.length)

  def writeString(s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    writeInt(b.length); writeBytes(b)
  }

  def writeLongs(vs: Array[Long], off: Int, len: Int): Unit = {
    ensure(len * 8)
    var i = 0
    while (i < len) { // manual LE store keeps this a tight JIT loop
      val v = vs(off + i)
      val p = pos + i * 8
      buf(p) = v.toByte; buf(p + 1) = (v >>> 8).toByte
      buf(p + 2) = (v >>> 16).toByte; buf(p + 3) = (v >>> 24).toByte
      buf(p + 4) = (v >>> 32).toByte; buf(p + 5) = (v >>> 40).toByte
      buf(p + 6) = (v >>> 48).toByte; buf(p + 7) = (v >>> 56).toByte
      i += 1
    }
    pos += len * 8
  }

  def toArray: Array[Byte] = Arrays.copyOf(buf, pos)
}

/** Little-endian reader over a byte array (one decoded segment). */
final class ByteReader(buf: Array[Byte], private var pos: Int, val limit: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  def position: Int = pos
  def remaining: Int = limit - pos

  def readByte(): Byte = { val v = buf(pos); pos += 1; v }

  def readInt(): Int = {
    val v = BitsLE.getInt(buf, pos); pos += 4; v
  }

  def readLong(): Long = {
    val v = BitsLE.getLong(buf, pos); pos += 8; v
  }

  /** Raw buffer + cursor access for the bit-unpack fast path, which
    * reads unaligned longs straight off the segment bytes. */
  private[fls] def buffer: Array[Byte] = buf
  private[fls] def skip(n: Int): Unit = pos += n

  def readDouble(): Double = java.lang.Double.longBitsToDouble(readLong())

  def readBytes(len: Int): Array[Byte] = {
    val out = Arrays.copyOfRange(buf, pos, pos + len); pos += len; out
  }

  def readBytesInto(out: Array[Byte], len: Int): Unit = {
    System.arraycopy(buf, pos, out, 0, len); pos += len
  }

  def readString(): String = {
    val len = readInt()
    val s = new String(buf, pos, len, StandardCharsets.UTF_8); pos += len; s
  }

  def readLongs(n: Int): Array[Long] = {
    val out = new Array[Long](n)
    readLongsInto(out, n)
    out
  }

  def readLongsInto(out: Array[Long], n: Int): Unit = {
    var i = 0
    while (i < n) { out(i) = BitsLE.getLong(buf, pos + i * 8); i += 1 }
    pos += n * 8
  }
}
