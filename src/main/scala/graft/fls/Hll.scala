package graft.fls

/** HyperLogLog NDV sketch for per-file manifest statistics — the
  * Iceberg/Delta model (theta/HLL sketches in table metadata) sized for
  * a manifest line: p=9 → 512 one-byte registers (~4.6% relative
  * error), base64'd into the per-column stats JSON under `"n"`
  * ([[FlsFileStats]]). At plan time the driver merges each column's
  * sketches register-wise across the planned files (union semantics —
  * HLL's one algebraic superpower) and serves the estimate as
  * `distinctCount` in DSv2 column statistics, so Catalyst's CBO can
  * size aggregates and reorder/broadcast joins on fls tables instead of
  * flying blind on key cardinality. Estimates only — never used for
  * pruning or results, so DV'd files (live-row subsets) and write-time
  * duplicates stay safely conservative.
  *
  * Self-contained (no deps): splitmix64-style mixing for longs, an
  * 8-byte-chunk polynomial + final mix for byte strings; the standard
  * bias-corrected estimator with the linear-counting small-range
  * correction (Flajolet et al., AOFA 2007; the HLL++ 64-bit-hash
  * variant needs no large-range correction). The reference engine has
  * no NDV statistics at all (its host serves footer min/max only —
  * /root/reference/src/reader/fls_reader.cpp:190-292). */
object Hll {
  /** log2(registers): 512 registers = 512 B raw, 684 B base64 per
    * column per file in the manifest — O(files) like the manifest
    * itself, and only on columns the writer was told to sketch
    * (`ndv_columns`). */
  val P = 9
  val M = 1 << P

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hashLong(v: Long): Long = mix(v)

  /** Canonical double hashing: collapse -0.0/0.0 and all NaN payloads
    * so "same SQL value" always lands in the same register. */
  def hashDouble(v: Double): Long =
    if (v == 0.0) mix(0L)
    else if (v != v) mix(0x7FF8000000000000L)
    else mix(java.lang.Double.doubleToRawLongBits(v))

  def hashBytes(b: Array[Byte]): Long = {
    var h = 0x8B1A9953C4611296L ^ mix(b.length.toLong)
    var i = 0
    while (i + 8 <= b.length) {
      var chunk = 0L
      var j = 0
      while (j < 8) { chunk = (chunk << 8) | (b(i + j) & 0xFFL); j += 1 }
      h = mix(h ^ chunk)
      i += 8
    }
    if (i < b.length) {
      var tail = 0L
      while (i < b.length) { tail = (tail << 8) | (b(i) & 0xFFL); i += 1 }
      h = mix(h ^ tail)
    }
    h
  }

  /** Union two register arrays (element-wise max) into `into`. */
  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length,
      s"fls hll: register-size mismatch (${into.length} vs ${from.length})")
    var i = 0
    while (i < into.length) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
  }

  /** Bias-corrected cardinality estimate over `regs` (any power-of-two
    * length; p is implied). */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xFF
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.max(0L, math.round(corrected))
  }
}

/** One streaming sketch (writer side, per file per column). */
final class Hll {
  val regs = new Array[Byte](Hll.M)

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - Hll.P)).toInt
    // rank = leading zeros of the remaining 64-p bits, + 1
    val w = h << Hll.P
    val rank =
      if (w == 0L) (64 - Hll.P + 1)
      else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def isEmpty: Boolean = {
    var i = 0
    while (i < regs.length) { if (regs(i) != 0) return false; i += 1 }
    true
  }

  def clear(): Unit = java.util.Arrays.fill(regs, 0.toByte)
}
