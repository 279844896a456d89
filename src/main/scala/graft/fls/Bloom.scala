package graft.fls

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-file Bloom-filter sidecars for POINT-LOOKUP pruning
  * (`bloom_columns` writer option, manifest tables): needle-in-100 TB
  * id lookups (q58-style contamination checks, GDPR subject scans) hit
  * high-cardinality UNCLUSTERED keys where zone maps cannot decide —
  * every row group's [min, max] straddles the needle, so the scan
  * opens every footer and decodes every group. A Bloom filter answers
  * "definitely absent" per FILE from one tiny cached sidecar read, so
  * an `id = ?` lookup skips the file before its footer is even
  * fetched. The planner consults it only for EqualTo/In on sketched
  * columns; false positives just degrade to the normal scan, false
  * negatives are impossible (the writer hashes every value it wrote).
  *
  * One sidecar per DATA FILE carries all sketched columns, referenced
  * from the manifest stats JSON by basename (`"bf"` key — same
  * plumbing as delete vectors). Sizing: m = -n·ln(p)/ln²2 bits for the
  * file's actual row count at close (fpp default 1%), k = m/n·ln 2
  * probes — ~1.2 KB per 1000 rows. Hashing reuses [[Hll]]'s canonical
  * value hashes (one definition of "same SQL value" across NDV and
  * Bloom); probe positions derive by double hashing h1 + i·h2.
  *
  * Layout (little-endian): magic "FLSBF1\n\0", int32 nCols, then per
  * column: int16 nameLen + UTF-8 name, int32 k, int64 nBits, then
  * ceil(nBits/8) filter bytes. The reference has no point-lookup
  * structure at all (scan-only format). */
object Bloom {
  private val Magic: Array[Byte] = "FLSBF1\n\u0000".getBytes("UTF-8")
  val Suffix = ".blm"

  final case class Filter(k: Int, nBits: Long, bits: Array[Byte]) {
    def mightContain(h: Long): Boolean = {
      val h2 = Hll.mix(h) | 1L
      var i = 0
      var x = h
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(x, nBits)
        if ((bits((bit >>> 3).toInt) & (1 << (bit & 7).toInt)) == 0) return false
        x += h2
        i += 1
      }
      true
    }
  }

  /** Streaming builder: buffers the 64-bit value hashes (8 B/row) and
    * sizes the filter to the file's ACTUAL row count at seal time. */
  final class Builder(fpp: Double) {
    require(fpp > 0 && fpp < 0.5, s"fls bloom: fpp must be in (0, 0.5), got $fpp")
    private var hashes = new Array[Long](1024)
    private var n = 0
    def add(h: Long): Unit = {
      if (n == hashes.length)
        hashes = java.util.Arrays.copyOf(hashes, hashes.length * 2)
      hashes(n) = h
      n += 1
    }
    def size: Int = n
    def clear(): Unit = n = 0
    def seal(): Filter = {
      val ln2sq = math.log(2) * math.log(2)
      val nBits = math.max(64L,
        math.ceil(-n.toDouble * math.log(fpp) / ln2sq).toLong)
      val k = math.max(1, math.round(nBits.toDouble / math.max(1, n) * math.log(2)).toInt)
      val bits = new Array[Byte](((nBits + 7) / 8).toInt)
      val f = Filter(k, nBits, bits)
      var i = 0
      while (i < n) {
        val h = hashes(i)
        val h2 = Hll.mix(h) | 1L
        var j = 0
        var x = h
        while (j < k) {
          val bit = java.lang.Long.remainderUnsigned(x, nBits)
          bits((bit >>> 3).toInt) =
            (bits((bit >>> 3).toInt) | (1 << (bit & 7).toInt)).toByte
          x += h2
          j += 1
        }
        i += 1
      }
      f
    }
  }

  /** Write one sidecar holding `cols` (name → sealed filter) next to
    * data file `dataRel`, name-spaced by `writeId` (attempt-unique,
    * never collides — same convention as delete vectors). Returns the
    * sidecar's dir-relative path. */
  def write(fs: FileSystem, root: Path, dataRel: String, writeId: String,
      cols: Seq[(String, Filter)]): String = {
    val rel = s"$dataRel-$writeId$Suffix"
    val sz = Magic.length + 4 + cols.map { case (name, f) =>
      2 + name.getBytes("UTF-8").length + 4 + 8 + f.bits.length
    }.sum
    val buf = java.nio.ByteBuffer.allocate(sz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putInt(cols.length)
    cols.foreach { case (name, f) =>
      val nb = name.getBytes("UTF-8")
      buf.putShort(nb.length.toShort)
      buf.put(nb)
      buf.putInt(f.k)
      buf.putLong(f.nBits)
      buf.put(f.bits)
    }
    val out = fs.create(new Path(root, rel), false)
    try out.write(buf.array()) finally out.close()
    rel
  }

  def parse(bytes: Array[Byte], path: String): Map[String, Filter] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](Magic.length)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"fls: not a bloom sidecar: $path")
    val nCols = buf.getInt
    require(nCols >= 0 && nCols < 10000, s"fls: corrupt bloom sidecar $path")
    (0 until nCols).map { _ =>
      val nameLen = buf.getShort.toInt
      val nb = new Array[Byte](nameLen)
      buf.get(nb)
      val k = buf.getInt
      val nBits = buf.getLong
      val bits = new Array[Byte](((nBits + 7) / 8).toInt)
      buf.get(bits)
      new String(nb, "UTF-8") -> Filter(k, nBits, bits)
    }.toMap
  }

  /** Driver-side sidecar cache: sidecar names are attempt-unique and
    * the files immutable, so path alone keys safely; access-ordered
    * LRU keeps hot tables' filters resident across repeated lookups
    * (the workload blooms exist for). */
  private val MaxCached = 100000
  private val cache: java.util.Map[String, Map[String, Filter]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Map[String, Filter]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Map[String, Filter]]): Boolean =
          size() > MaxCached
      })

  /** Read (cached) the sidecar at `abs`; None on any IO/parse trouble —
    * pruning then simply keeps the file. */
  def readCached(abs: String, conf: Configuration): Option[Map[String, Filter]] = {
    val hit = cache.get(abs)
    if (hit != null) return Some(hit)
    try {
      val p = new Path(abs)
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      val parsed = parse(bytes, abs)
      cache.put(abs, parsed)
      Some(parsed)
    } catch { case _: Exception => None }
  }

  /** Test hook. */
  private[fls] def clearCache(): Unit = cache.clear()

  // ------------------------------------------------------ planner side

  /** Hash a FILTER literal exactly the way the writer hashed the
    * column's values ([[graft.fls.connector.FlsDataWriter]]'s
    * accessors) — None when the literal's shape doesn't canonicalize
    * (the file is then kept; pruning must never guess). */
  private def hashLiteral(dt: org.apache.spark.sql.types.DataType,
      v: Any): Option[Long] = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    if (v == null) return None // `= NULL` never matches; undecidable here
    (dt, v) match {
      case (LongType | IntegerType | ShortType | ByteType, n: java.lang.Number) =>
        Some(Hll.hashLong(n.longValue()))
      case (BooleanType, b: java.lang.Boolean) =>
        Some(Hll.hashLong(if (b) 1L else 0L))
      case (DateType, d: java.sql.Date) =>
        Some(Hll.hashLong(DateTimeUtils.fromJavaDate(d).toLong))
      case (DateType, d: java.time.LocalDate) =>
        Some(Hll.hashLong(d.toEpochDay))
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(Hll.hashLong(DateTimeUtils.fromJavaTimestamp(t)))
      case (TimestampType, t: java.time.Instant) =>
        Some(Hll.hashLong(DateTimeUtils.instantToMicros(t)))
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        Some(Hll.hashLong(DateTimeUtils.localDateTimeToMicros(t)))
      case (StringType, s: String) =>
        Some(Hll.hashBytes(s.getBytes("UTF-8")))
      case (StringType, s: org.apache.spark.unsafe.types.UTF8String) =>
        Some(Hll.hashBytes(s.getBytes))
      case (BinaryType, b: Array[Byte]) => Some(Hll.hashBytes(b))
      case (DoubleType, n: java.lang.Double) => Some(Hll.hashDouble(n))
      case (FloatType, n: java.lang.Float) =>
        Some(Hll.hashDouble(n.floatValue().toDouble))
      case (d: DecimalType, x) if d.precision <= 18 =>
        val bd = x match {
          case b: java.math.BigDecimal => Some(b)
          case b: BigDecimal => Some(b.bigDecimal)
          case _ => None
        }
        bd.flatMap { b =>
          try Some(Hll.hashLong(
            b.setScale(d.scale).unscaledValue().longValueExact()))
          catch { case _: ArithmeticException => None }
        }
      case _ => None
    }
  }

  /** Can the file at `dataPath` (manifest stats `statsJson`) possibly
    * satisfy the conjunctive `filters`? Consults the bloom sidecar
    * ONLY for top-level EqualTo/EqualNullSafe/In on sketched columns;
    * anything else (ranges, Or, missing sidecar, hash-shape doubt)
    * keeps the file. One cached sidecar read per candidate file — the
    * read zone maps cannot save on high-cardinality unclustered keys,
    * repaid by skipping the footer AND the data. */
  def mayMatch(statsJson: String, dataPath: Path,
      filters: Array[org.apache.spark.sql.sources.Filter],
      schema: org.apache.spark.sql.types.StructType,
      conf: Configuration): Boolean = {
    import org.apache.spark.sql.sources.{And, EqualNullSafe, EqualTo, In, Filter => SFilter}
    if (filters.isEmpty) return true
    // cheap guard before the JSON parse: the overwhelmingly common
    // bloom-less entry must cost a substring check, not a parse —
    // this runs once per LISTED file on the planning path
    if (statsJson == null || !statsJson.contains("\"bf\"")) return true
    val bfBase = FlsFileStats.bfOf(statsJson).getOrElse(return true)
    def typeOf(c: String) = schema.fields.find(_.name == c).map(_.dataType)
    // resolve the sidecar lazily: only point predicates consult it
    lazy val blooms: Option[Map[String, Bloom.Filter]] = {
      val abs = new Path(dataPath.getParent, bfBase).toString
      readCached(abs, conf)
    }
    def absent(c: String, v: Any): Boolean =
      (for {
        dt <- typeOf(c)
        bs <- blooms
        bf <- bs.get(c)
        h <- hashLiteral(dt, v)
      } yield !bf.mightContain(h)).getOrElse(false)
    def ok(f: SFilter): Boolean = f match {
      case And(l, r) => ok(l) && ok(r)
      case EqualTo(c, v) => !absent(c, v)
      case EqualNullSafe(c, v) if v != null => !absent(c, v)
      case In(c, vs) if vs.nonEmpty => !vs.forall(v => v != null && absent(c, v))
      case _ => true
    }
    filters.forall(ok)
  }

  /** Can the file at `dataPath` possibly contain a row the committed
    * delete predicate matches, per its bloom sidecar? The zone-map
    * complement for SCATTERED keys: on an unclustered table a GDPR
    * point delete's value sits inside every file's [min, max], but a
    * definite bloom NO proves absence exactly — the residual can be
    * dropped / absorb can skip the rewrite. Consulted only for IN
    * legs whose stored domain matches the leg kind (`desc` carries
    * the file's column tags — [[FlsEqDeletes.domainOk]], the same
    * guard the residual compile enforces); legs hash in the semantic
    * domain, which is exactly what the write-side sketch hashed
    * (FlsDataWriter mkHashAccessors). Conservative on every doubt:
    * no sidecar, unsketched column, range legs → true. */
  def mayMatchEq(p: FlsEqDeletes.EqDelete, desc: Format.TableDesc,
      statsJson: String, dataPath: Path, conf: Configuration): Boolean = {
    if (statsJson == null || !statsJson.contains("\"bf\"")) return true
    val bfBase = FlsFileStats.bfOf(statsJson).getOrElse(return true)
    // Memoized per (sidecar path, stamped predicate, leg binding):
    // this runs per (manifest entry × IN-leg predicate) on EVERY
    // planning pass while a point-delete predicate is active —
    // including scans that never touch the key column — and a cold
    // pass would otherwise pay O(files) sidecar reads before the
    // byte-level LRU warms. Staleness cover: a rewrite gives the file
    // (and its sidecar) a new attempt-unique name, re-stamping gives
    // the predicate a new version, and the BINDING component (each
    // leg's resolved column position + stored type/scale in `desc`)
    // changes when a RENAME COLUMN rebinds a name within this JVM —
    // the verdict is a function of exactly those inputs. The predicate
    // rides as a fixed-size DIGEST, so a 100k-key IN list does not
    // retain its JSON per file in the count-bounded LRU.
    val bfPath = new Path(dataPath.getParent, bfBase).toString
    val binding = p.legs.map { l =>
      val i = desc.columns.indexWhere(_.name == l.col)
      if (i < 0) "-"
      else {
        val ct = desc.columns(i).colType
        s"$i:${ct.tag}:${ct.scale}"
      }
    }.mkString(",")
    val memoKey = s"$bfPath ${p.v} ${p.digest} $binding"
    val hit = eqVerdictCache.get(memoKey)
    if (hit != null) return hit.booleanValue()
    lazy val blooms: Option[Map[String, Bloom.Filter]] =
      readCached(bfPath, conf)
    val verdict = p.legs.forall {
      case in: FlsEqDeletes.InLeg =>
        val idx = desc.columns.indexWhere(_.name == in.col)
        if (idx < 0 || !FlsEqDeletes.domainOk(in, desc.columns(idx).colType))
          true
        else (for { bs <- blooms; bf <- bs.get(in.col) } yield {
          val hashes: Array[Long] = in.kind match {
            case FlsEqDeletes.KindLong => in.longs.map(Hll.hashLong)
            case FlsEqDeletes.KindDouble => in.doubles.map(Hll.hashDouble)
            case FlsEqDeletes.KindString =>
              in.strings.map(s => Hll.hashBytes(
                s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            // wide decimals hash their unscaled two's-complement bytes
            // — the writer's sketch convention (FlsDataWriter)
            case FlsEqDeletes.KindBig =>
              in.bigs.map(b => Hll.hashBytes(b.toByteArray))
          }
          hashes.exists(bf.mightContain)
        }).getOrElse(true)
      case _ => true // range legs: zone maps are the right tool
    }
    eqVerdictCache.put(memoKey, java.lang.Boolean.valueOf(verdict))
    verdict
  }

  /** LRU verdict memo for [[mayMatchEq]] — entries are a short string
    * key + a boxed boolean, so 64k of them is a few MB of driver heap
    * bounding what would otherwise be per-planning-pass sidecar I/O. */
  private val eqVerdictCache: java.util.Map[String, java.lang.Boolean] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > 65536
      })

  /** Test hook. */
  private[fls] def clearEqVerdictCache(): Unit = eqVerdictCache.clear()
}
