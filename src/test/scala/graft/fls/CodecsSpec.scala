package graft.fls

import org.scalatest.funsuite.AnyFunSuite

/** encode ∘ decode = id for every kernel (SURVEY.md §5 port strategy:
  * per-codec property tests the reference lacks). Seeded fuzz loops
  * stand in for scalacheck properties (no scalatest-scalacheck bridge
  * in the offline cache). */
class CodecsSpec extends AnyFunSuite {

  private def fuzzLongs(seed: Int)(body: Array[Long] => Unit): Unit = {
    val rng = new scala.util.Random(seed)
    (0 until 200).foreach { _ =>
      val n = rng.nextInt(3000)
      val vs = Array.fill(n) {
        rng.nextInt(4) match {
          case 0 => rng.nextLong()
          case 1 => rng.nextInt(200).toLong - 100
          case 2 => Long.MinValue + rng.nextInt(3)
          case _ => Long.MaxValue - rng.nextInt(3)
        }
      }
      body(vs)
    }
  }

  private def viaFFOR(vs: Array[Long]): Array[Long] = {
    val w = new ByteWriter()
    Codecs.encodeFFOR(vs, w)
    Codecs.decodeFFOR(new ByteReader(w.toArray))
  }

  test("FFOR round-trips arbitrary longs incl. extremes") {
    fuzzLongs(1) { vs => assert(viaFFOR(vs).sameElements(vs)) }
    val edge = Array(Long.MinValue, Long.MaxValue, 0L, -1L, 1L)
    assert(viaFFOR(edge).sameElements(edge))
  }

  test("FFOR round-trips multi-block (crosses 1024 boundary)") {
    val vs = Array.tabulate(3000)(i => (i * 7 - 1000).toLong)
    assert(viaFFOR(vs).sameElements(vs))
  }

  test("bit widths: constant block packs to zero payload") {
    val vs = Array.fill(2048)(42L)
    val w = new ByteWriter()
    Codecs.encodeFFOR(vs, w)
    // 4 (n) + 2 blocks * (8 ref + 1 bw) = 22 bytes
    assert(w.size == 22)
  }

  test("ALP round-trips decimal-ish doubles and exceptions") {
    val vs = Array(1.25, 3.14, 100.0, -2.5, 0.001, Double.NaN,
      Double.PositiveInfinity, 1.0 / 3.0, -0.0, 1e300)
    val (e, _) = Codecs.alpChooseExponent(vs)
    val w = new ByteWriter()
    Codecs.encodeAlp(vs, e, w)
    val out = Codecs.decodeAlp(new ByteReader(w.toArray))
    vs.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(out(i)) ==
        java.lang.Double.doubleToRawLongBits(vs(i)), s"index $i")
    }
  }

  test("ALP round-trips arbitrary doubles bitwise") {
    val rng = new scala.util.Random(2)
    (0 until 200).foreach { _ =>
      val n = rng.nextInt(3000)
      val vs = Array.fill(n) {
        rng.nextInt(3) match {
          case 0 => math.rint(rng.nextDouble() * 2e8 - 1e8) / 100
          case 1 => java.lang.Double.longBitsToDouble(rng.nextLong())
          case _ => rng.nextDouble()
        }
      }
      val (e, _) = Codecs.alpChooseExponent(vs)
      val w = new ByteWriter()
      Codecs.encodeAlp(vs, e, w)
      val out = Codecs.decodeAlp(new ByteReader(w.toArray))
      vs.indices.foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(out(i)) ==
          java.lang.Double.doubleToRawLongBits(vs(i)))
      }
    }
  }

  test("RLE long round-trip") {
    val vs = Array.fill(100)(7L) ++ Array.fill(50)(-3L) ++ Array(9L)
    val runVals = Array(7L, -3L, 9L)
    val runLens = Array(100L, 50L, 1L)
    val w = new ByteWriter()
    Codecs.encodeRleLong(vs.length, runVals, runLens, w)
    assert(Codecs.decodeRleLong(new ByteReader(w.toArray)).sameElements(vs))
  }

  private def mkBytes(strs: Seq[String]): BytesData = {
    val bytes = strs.flatMap(_.getBytes("UTF-8")).toArray
    val offsets = strs.scanLeft(0)(_ + _.getBytes("UTF-8").length).toArray
    BytesData(offsets, bytes)
  }

  private def strsOf(d: BytesData): Seq[String] =
    (0 until d.n).map(i => new String(d.bytes, d.offsets(i), d.offsets(i + 1) - d.offsets(i), "UTF-8"))

  test("plain/const/dict/rle bytes round-trip") {
    val strs = Seq("alpha", "beta", "alpha", "", "日本語", "alpha", "beta")
    val d = mkBytes(strs)

    val w1 = new ByteWriter()
    Codecs.encodePlainBytes(d, w1)
    assert(strsOf(Codecs.decodePlainBytes(new ByteReader(w1.toArray))) == strs)

    val w2 = new ByteWriter()
    Codecs.encodeConstBytes(4, "xy".getBytes, w2)
    assert(strsOf(Codecs.decodeConstBytes(new ByteReader(w2.toArray))) == Seq("xy", "xy", "xy", "xy"))

    val dict = mkBytes(Seq("alpha", "beta", "", "日本語"))
    val codes = Array(0L, 1L, 0L, 2L, 3L, 0L, 1L)
    val w3 = new ByteWriter()
    Codecs.encodeDictBytes(strs.length, dict, codes, w3)
    assert(strsOf(Codecs.decodeDictBytes(new ByteReader(w3.toArray))) == strs)

    val runs = Seq("aa", "aa", "bb", "bb", "bb", "c")
    val w4 = new ByteWriter()
    Codecs.encodeRleBytes(6, mkBytes(Seq("aa", "bb", "c")), Array(2L, 3L, 1L), w4)
    assert(strsOf(Codecs.decodeRleBytes(new ByteReader(w4.toArray))) == runs)
  }

  test("Encoder picks sane encodings and round-trips through decode") {
    def roundTrip(col: ColData): ColData = {
      val w = new ByteWriter()
      val (enc, _) = Encoder.encodeColumn(col, w)
      val phys = col match {
        case _: LongData => Format.Phys.LONG
        case _: DoubleData => Format.Phys.DOUBLE
        case _: BytesData => Format.Phys.BYTES
      }
      Codecs.decode(w.toArray, enc, phys)
    }

    // constant
    val c = roundTrip(LongData(Array.fill(500)(5L)))
    assert(c.asInstanceOf[LongData].v.forall(_ == 5L))
    // sequential ints → FFOR
    val seq0 = Array.tabulate(5000)(_.toLong * 3)
    assert(roundTrip(LongData(seq0)).asInstanceOf[LongData].v.sameElements(seq0))
    // low-cardinality strings → dict or rle
    val strs = (0 until 4000).map(i => s"val${i % 7}")
    assert(strsOf(roundTrip(mkBytes(strs)).asInstanceOf[BytesData]) == strs)
    // prices → ALP
    val prices = Array.tabulate(4000)(i => (i * 17 % 10000) / 100.0)
    assert(roundTrip(DoubleData(prices)).asInstanceOf[DoubleData].v.sameElements(prices))
    // random doubles → plain (still exact)
    val rng = new scala.util.Random(42)
    val rnd = Array.fill(3000)(rng.nextDouble() * 1e18)
    assert(roundTrip(DoubleData(rnd)).asInstanceOf[DoubleData].v.sameElements(rnd))
  }

  test("fuzz: Encoder round-trips arbitrary long columns") {
    fuzzLongs(3) { vs =>
      val w = new ByteWriter()
      val (enc, _) = Encoder.encodeColumn(LongData(vs), w)
      val out = Codecs.decode(w.toArray, enc, Format.Phys.LONG).asInstanceOf[LongData].v
      assert(out.sameElements(vs))
    }
  }

  test("FSST round-trips text and compresses a wordy corpus") {
    val rng = new scala.util.Random(7)
    val vocab = Array("table", "query", "spark", "filter", "window", "batch",
      "merge", "hash", "value", "column")
    val strs = (0 until 2000).map(_ =>
      (0 until 10).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    val d = mkBytes(strs)
    val sample = java.util.Arrays.copyOfRange(d.bytes, 0, math.min(d.bytes.length, 1 << 16))
    val table = Fsst.train(sample)
    val w = new ByteWriter()
    Codecs.encodeFsst(d, table, w)
    assert(strsOf(Codecs.decodeFsst(new ByteReader(w.toArray))) == strs)
    assert(w.size < d.bytes.length / 2, s"fsst ${w.size} vs raw ${d.bytes.length}")
  }

  test("FSST round-trips adversarial bytes (escapes, empty, binary)") {
    val rng = new scala.util.Random(11)
    val strs = Seq("", "\u0000\u00ff", new String(Array.fill(300)(rng.nextInt(256).toByte).map(_.toChar))) ++
      (0 until 50).map(_ => new String(Array.fill(rng.nextInt(40))((rng.nextInt(90) + 32).toChar)))
    val bytes = strs.flatMap(_.toCharArray.map(_.toByte)).toArray
    val offsets = strs.scanLeft(0)(_ + _.length).toArray
    val d = BytesData(offsets, bytes)
    val table = Fsst.train(java.util.Arrays.copyOf(bytes, bytes.length))
    val w = new ByteWriter()
    Codecs.encodeFsst(d, table, w)
    val back = Codecs.decodeFsst(new ByteReader(w.toArray))
    assert(back.offsets.sameElements(d.offsets))
    assert(back.bytes.sameElements(d.bytes))
  }

  test("FREQ round-trips dominated columns") {
    val vs = Array.fill(5000)(42L)
    vs(17) = -1L; vs(900) = 7L; vs(4999) = Long.MaxValue
    val w = new ByteWriter()
    Codecs.encodeFreqLong(vs, 42L, w)
    assert(Codecs.decodeFreqLong(new ByteReader(w.toArray)).sameElements(vs))
  }

  test("FREQ bytes round-trips dominated string columns (incl. edge shapes)") {
    // scattered exceptions
    val strs = (0 until 4000).map { i =>
      if (i % 97 == 0) s"outlier-$i" else "the-dominant-value"
    }
    val d = mkBytes(strs)
    val w = new ByteWriter()
    val dom = strs.indexOf("the-dominant-value")
    Codecs.encodeFreqBytes(d, d.offsets(dom), d.offsets(dom + 1), w)
    assert(strsOf(Codecs.decodeFreqBytes(new ByteReader(w.toArray))) == strs)
    // no exceptions at all
    val pure = mkBytes(Seq.fill(100)("same"))
    val w2 = new ByteWriter()
    Codecs.encodeFreqBytes(pure, 0, 4, w2)
    assert(strsOf(Codecs.decodeFreqBytes(new ByteReader(w2.toArray))) == Seq.fill(100)("same"))
    // exceptions at both ends, empty strings among exceptions
    val edge = Seq("", "x", "x", "x", "") ++ Seq.fill(50)("x") :+ ""
    val de = mkBytes(edge)
    val w3 = new ByteWriter()
    Codecs.encodeFreqBytes(de, de.offsets(1), de.offsets(2), w3)
    assert(strsOf(Codecs.decodeFreqBytes(new ByteReader(w3.toArray))) == edge)
  }

  test("Encoder picks FREQ for a scattered-dominant string column and compresses") {
    val rng = new scala.util.Random(31)
    // 99% one long value, 1% unique long outliers scattered randomly:
    // RLE degenerates (runs ~ 2*nEx), DICT pays code bits on every row
    val strs = (0 until 20000).map { i =>
      if (rng.nextInt(100) == 0) s"unique-outlier-value-$i-${rng.nextInt()}"
      else "the-overwhelmingly-dominant-string-value-of-this-column"
    }
    val d = mkBytes(strs)
    val w = new ByteWriter()
    val (enc, _) = Encoder.encodeColumn(d, w)
    assert(enc == Format.Enc.FREQ, s"expected FREQ, got $enc")
    assert(strsOf(Codecs.decode(w.toArray, enc, Format.Phys.BYTES).asInstanceOf[BytesData]) == strs)
    val dictSize = {
      val w2 = new ByteWriter()
      val distinct = strs.distinct
      val codeOf = distinct.zipWithIndex.toMap
      Codecs.encodeDictBytes(strs.length, mkBytes(distinct),
        strs.map(s => codeOf(s).toLong).toArray, w2)
      w2.size
    }
    assert(w.size < dictSize, s"FREQ ${w.size} should beat DICT $dictSize here")
  }

  test("fuzz: FREQ bytes round-trips random dominated columns") {
    val rng = new scala.util.Random(77)
    (0 until 20).foreach { trial =>
      val domLen = rng.nextInt(30)
      val dom = Array.fill(domLen)(rng.nextInt(256).toByte)
      val domStr = new String(dom.map(b => ('a' + (b & 15)).toChar))
      val n = 200 + rng.nextInt(2000)
      val strs = (0 until n).map { _ =>
        if (rng.nextInt(10) == 0) new String(Array.fill(rng.nextInt(20))(('a' + rng.nextInt(26)).toChar))
        else domStr
      }
      val d = mkBytes(strs)
      val di = strs.indexOf(domStr)
      val w = new ByteWriter()
      Codecs.encodeFreqBytes(d, d.offsets(di), d.offsets(di + 1), w)
      assert(strsOf(Codecs.decodeFreqBytes(new ByteReader(w.toArray))) == strs, s"trial $trial")
    }
  }

  test("K16 transpose: permutation is a bijection; inverse restores order") {
    assert(Codecs.TransposePerm.sorted.sameElements(0 until Format.VecSize))
    val rng = new scala.util.Random(41)
    // full blocks + a short tail (tail stays sequential)
    val vs = Array.fill(3 * Format.VecSize + 137)(rng.nextLong())
    val t = Codecs.transposeLongs(vs)
    assert(!t.sameElements(vs)) // permutation actually moves values
    assert(Codecs.untransposeLongs(t).sameElements(vs))
    assert(t.takeRight(137).sameElements(vs.takeRight(137))) // tail untouched
    val ds = Array.fill(2 * Format.VecSize + 5)(rng.nextDouble())
    assert(Codecs.untransposeDoubles(Codecs.transposeDoubles(ds)).sameElements(ds))
  }

  test("K16 transpose: TRANSPOSED wrapper round-trips through encode/decode") {
    val rng = new scala.util.Random(43)
    val vs = Array.fill(4096)(rng.nextInt(100000).toLong)
    val w = new ByteWriter()
    val (enc, desc) = Encoder.encodeColumn(LongData(vs), w, transpose = true)
    assert(enc == Format.Enc.TRANSPOSED)
    assert(desc.hasStats && desc.minLong == vs.min && desc.maxLong == vs.max)
    val back = Codecs.decode(w.toArray, enc, Format.Phys.LONG).asInstanceOf[LongData].v
    assert(back.sameElements(vs))
    val dvs = Array.fill(2048)(rng.nextDouble() * 1000)
    val w2 = new ByteWriter()
    val (enc2, _) = Encoder.encodeColumn(DoubleData(dvs), w2, transpose = true)
    assert(enc2 == Format.Enc.TRANSPOSED)
    val back2 = Codecs.decode(w2.toArray, enc2, Format.Phys.DOUBLE).asInstanceOf[DoubleData].v
    dvs.indices.foreach(i => assert(
      java.lang.Double.doubleToRawLongBits(back2(i)) ==
        java.lang.Double.doubleToRawLongBits(dvs(i))))
  }

  test("ALP-RD round-trips real doubles bitwise and compresses") {
    val rng = new scala.util.Random(5)
    val vs = Array.fill(8000)(rng.nextDouble() * 1e17 + 1e16)
    val w = new ByteWriter()
    val (enc, _) = Encoder.encodeColumn(DoubleData(vs), w)
    assert(enc == Format.Enc.ALP_RD, s"expected ALP_RD, got $enc")
    val out = Codecs.decode(w.toArray, enc, Format.Phys.DOUBLE).asInstanceOf[DoubleData].v
    vs.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(out(i)) ==
        java.lang.Double.doubleToRawLongBits(vs(i)))
    }
    assert(w.size < vs.length * 8, s"alp-rd ${w.size} vs raw ${vs.length * 8}")
  }

  test("Encoder picks FSST for high-cardinality wordy strings") {
    val rng = new scala.util.Random(9)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val strs = (0 until 3000).map(i =>
      s"doc$i " + (0 until 8).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    val d = mkBytes(strs)
    val w = new ByteWriter()
    val (enc, _) = Encoder.encodeColumn(d, w)
    assert(enc == Format.Enc.FSST, s"expected FSST, got $enc")
    assert(strsOf(Codecs.decode(w.toArray, enc, Format.Phys.BYTES).asInstanceOf[BytesData]) == strs)
  }

  test("FSST12 round-trips and wins on high-symbol-count corpora") {
    val rng = new scala.util.Random(13)
    // ~600 distinct frequent words -> more symbols than 8-bit FSST holds
    val vocab = Array.tabulate(600)(i => s"token${i}word")
    val strs = (0 until 3000).map(_ =>
      (0 until 12).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    val d = mkBytes(strs)
    val table = Fsst12.train(java.util.Arrays.copyOfRange(d.bytes, 0, math.min(d.bytes.length, 1 << 16)))
    val w = new ByteWriter()
    Codecs.encodeFsst12(d, table, w)
    assert(strsOf(Codecs.decodeFsst12(new ByteReader(w.toArray))) == strs)
    assert(w.size < d.bytes.length, s"fsst12 ${w.size} vs raw ${d.bytes.length}")
  }

  test("FSST12 12-bit packing round-trips all code values") {
    val rng = new scala.util.Random(17)
    val codes = Array.fill(5000)(rng.nextInt(4096))
    val packed = Fsst12.packCodes(codes)
    codes.indices.foreach { i =>
      assert(Fsst12.readCode(packed, i) == codes(i), s"idx $i")
    }
  }

  test("FSST12 adversarial bytes round-trip") {
    val rng = new scala.util.Random(19)
    val strs = Seq("", "\u0000") ++ (0 until 60).map(_ =>
      new String(Array.fill(rng.nextInt(50))((rng.nextInt(256)).toChar)))
    val bytes = strs.flatMap(_.toCharArray.map(_.toByte)).toArray
    val offsets = strs.scanLeft(0)(_ + _.length).toArray
    val d = BytesData(offsets, bytes)
    val table = Fsst12.train(java.util.Arrays.copyOf(bytes, bytes.length))
    val w = new ByteWriter()
    Codecs.encodeFsst12(d, table, w)
    val back = Codecs.decodeFsst12(new ByteReader(w.toArray))
    assert(back.offsets.sameElements(d.offsets))
    assert(back.bytes.sameElements(d.bytes))
  }

  test("ALP Markstein decode is bitwise identical to IEEE division") {
    // decodeAlp divides digits by 10^e via the reciprocal-multiply +
    // two-FMA correction; the encoder's exactness check uses the plain
    // divide — the two must agree on EVERY representable digit, or a
    // value the encoder kept as "exact" decodes differently
    val rng = new scala.util.Random(23)
    (0 to 14).foreach { e =>
      val d = math.pow(10, e)
      val rcp = 1.0 / d
      (0 until 200000).foreach { _ =>
        val digits = rng.nextLong() % (1L << 51)
        val x = digits.toDouble
        val q = x * rcp
        val fma = Math.fma(Math.fma(-d, q, x), rcp, q)
        assert(java.lang.Double.doubleToRawLongBits(fma) ==
          java.lang.Double.doubleToRawLongBits(x / d),
          s"digits=$digits e=$e: fma=$fma div=${x / d}")
      }
    }
  }
}
