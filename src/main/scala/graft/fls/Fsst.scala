package graft.fls

import scala.collection.mutable

/** FSST string compression (per the published FSST paper: a symbol
  * table of up to 255 symbols, each 1-8 bytes; code 255 escapes a
  * literal byte), re-implemented from scratch for the JVM — the
  * reference consumes an FSST library through decode kernels
  * (/root/reference/src/include/reader/materializer/kernels/
  * fsst_kernel.hpp:11-59); here both sides live in Scala.
  *
  * Training is the paper's iterative scheme, simplified: each round
  * encodes a sample with the current table, counts symbol and
  * adjacent-pair frequencies, and keeps the 255 candidates with the
  * best gain (frequency × length). Deterministic: ties break on the
  * packed symbol value.
  */
object Fsst {
  val EscapeCode = 255
  val MaxSymbols = 255
  val MaxSymbolLen = 8

  /** A symbol is ≤8 bytes packed little-endian into a Long + a length. */
  final class SymbolTable(
      val packed: Array[Long], // by code
      val lens: Array[Int]) {
    val nSymbols: Int = packed.length

    /** first-byte → codes sorted by symbol length descending (greedy
      * longest-match encode support). */
    private[Fsst] val byFirstByte: Array[Array[Int]] = {
      val buckets = Array.fill(256)(mutable.ArrayBuffer[Int]())
      var c = 0
      while (c < nSymbols) {
        buckets((packed(c) & 0xff).toInt) += c
        c += 1
      }
      buckets.map(_.sortBy(c2 => -lens(c2)).toArray)
    }

    def symbolBytes(code: Int): Array[Byte] = {
      val out = new Array[Byte](lens(code))
      var i = 0
      while (i < out.length) { out(i) = (packed(code) >>> (8 * i)).toByte; i += 1 }
      out
    }
  }

  @inline private def packAt(data: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v |= (data(pos + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Train a table on a sample (bounded; callers pass ≤ ~64KB). */
  def train(sample: Array[Byte], rounds: Int = 5): SymbolTable = {
    var table = new SymbolTable(Array.empty, Array.empty)
    if (sample.isEmpty) return table
    var r = 0
    while (r < rounds) {
      // encode sample with current table, counting (code-or-literal)
      // occurrences and adjacent concatenations
      val gain = mutable.HashMap[(Long, Int), Long]()
      var pos = 0
      var prevPacked = 0L
      var prevLen = 0
      while (pos < sample.length) {
        val (p, l) = matchAt(table, sample, pos)
        gain.updateWith((p, l))(g => Some(g.getOrElse(0L) + l))
        if (prevLen > 0 && prevLen + l <= MaxSymbolLen) {
          val cat = prevPacked | (p << (8 * prevLen))
          gain.updateWith((cat, prevLen + l))(g => Some(g.getOrElse(0L) + prevLen + l))
        }
        prevPacked = p; prevLen = l
        pos += l
      }
      // keep best 255 by gain; singles with gain 1 only pay off when
      // frequent, the gain metric handles that
      val chosen = gain.toArray
        .sortBy { case ((p, l), g) => (-g, l, p) }
        .take(MaxSymbols)
      table = new SymbolTable(chosen.map(_._1._1), chosen.map(_._1._2))
      r += 1
    }
    table
  }

  /** Longest symbol match at pos, else (byte, 1) literal. */
  @inline private def matchAt(t: SymbolTable, data: Array[Byte], pos: Int): (Long, Int) = {
    val avail = math.min(MaxSymbolLen, data.length - pos)
    val codes = t.byFirstByte((data(pos) & 0xff).toInt)
    var i = 0
    while (i < codes.length) {
      val c = codes(i)
      val l = t.lens(c)
      if (l <= avail && packAt(data, pos, l) == t.packed(c)) return (t.packed(c), l)
      i += 1
    }
    (data(pos) & 0xffL, 1)
  }

  /** Encode one string; returns bytes appended to `out`. */
  def encode(t: SymbolTable, data: Array[Byte], from: Int, until: Int,
      out: mutable.ArrayBuilder[Byte]): Int = {
    // code index for exact (packed,len) lookups
    var written = 0
    var pos = from
    while (pos < until) {
      val avail = math.min(MaxSymbolLen, until - pos)
      val codes = t.byFirstByte((data(pos) & 0xff).toInt)
      var matched = -1
      var i = 0
      while (matched < 0 && i < codes.length) {
        val c = codes(i)
        val l = t.lens(c)
        if (l <= avail && packAt(data, pos, l) == t.packed(c)) matched = c
        i += 1
      }
      if (matched >= 0) {
        out += matched.toByte
        written += 1
        pos += t.lens(matched)
      } else {
        out += EscapeCode.toByte
        out += data(pos)
        written += 2
        pos += 1
      }
    }
    written
  }

  /** Decode one string of `encLen` bytes starting at `pos` into `out`. */
  def decode(t: SymbolTable, enc: Array[Byte], pos: Int, encLen: Int,
      out: mutable.ArrayBuilder[Byte]): Int = {
    var p = pos
    val end = pos + encLen
    var produced = 0
    while (p < end) {
      val code = enc(p) & 0xff
      if (code == EscapeCode) {
        out += enc(p + 1)
        produced += 1
        p += 2
      } else {
        val l = t.lens(code)
        val v = t.packed(code)
        var i = 0
        while (i < l) { out += (v >>> (8 * i)).toByte; i += 1 }
        produced += l
        p += 1
      }
    }
    produced
  }

  // ---- segment (de)serialization of the table ----

  def writeTable(t: SymbolTable, out: ByteWriter): Unit = {
    out.writeByte(t.nSymbols)
    var c = 0
    while (c < t.nSymbols) {
      out.writeByte(t.lens(c))
      out.writeLong(t.packed(c))
      c += 1
    }
  }

  def readTable(in: ByteReader): SymbolTable = {
    val n = in.readByte() & 0xff
    val packed = new Array[Long](n)
    val lens = new Array[Int](n)
    var c = 0
    while (c < n) {
      lens(c) = in.readByte() & 0xff
      packed(c) = in.readLong()
      c += 1
    }
    new SymbolTable(packed, lens)
  }
}
