package graft
import graft.fls._

/** Single-thread microbenchmark of the ALP decode path: isolates unpack,
  * ref-add, multiply, and the vector-fill copy so scan-level gaps can be
  * attributed. Values mimic l_extendedprice (e=2, ~24-bit digits). */
object AlpMicro {
  def main(args: Array[String]): Unit = {
    val n = 1 << 20 // 1M values = 1024 vectors
    val rnd = new java.util.Random(42)
    val vs = Array.fill(n)((rnd.nextInt(10000000) + 100) / 100.0)
    val w = new ByteWriter()
    Codecs.encodeAlp(vs, 2, w)
    val bytes = w.toArray
    println(f"[micro] n=$n encoded=${bytes.length} bytes (${bytes.length * 8.0 / n}%.2f bits/val)")
    def time(name: String, reps: Int)(f: => Unit): Double = {
      var k = 0
      while (k < 3) { f; k += 1 } // warm + JIT
      val t0 = System.nanoTime()
      k = 0
      while (k < reps) { f; k += 1 }
      val perVal = (System.nanoTime() - t0).toDouble / reps / n
      println(f"[micro] $name%-28s ${perVal}%.2f ns/value")
      perVal
    }
    val reps = 100
    time("decodeAlp (full)", reps) {
      Codecs.decodeAlp(new ByteReader(bytes))
    }
    // FFOR alone (skip header: int n + byte e)
    val r0 = new ByteReader(bytes); r0.readInt(); r0.readByte()
    val fforStart = r0.position
    time("decodeFFOR alone", reps) {
      Codecs.decodeFFOR(new ByteReader(bytes, fforStart, bytes.length))
    }
    val ints = Codecs.decodeFFOR(new ByteReader(bytes, fforStart, bytes.length))
    time("readLongs bulk", reps) {
      new ByteReader(bytes).readLongs(bytes.length / 8 - 1)
    }
    val out = new Array[Double](n)
    time("multiply loop alone", reps) {
      val inv = 0.01
      var i = 0
      while (i < n) { out(i) = ints(i) * inv; i += 1 }
    }
    val dst = new Array[Double](n)
    time("arraycopy (vector fill)", reps) {
      System.arraycopy(out, 0, dst, 0, n)
    }
  }
}
