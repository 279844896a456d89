package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.IncrementalPq

/** Incremental PQ maintenance ([[IncrementalPq]]): codebooks train
  * once and freeze; a refresh after an append reads ONLY the appended
  * corpus files (scan-bytes asserted) and encodes only their vectors;
  * the patched codes are BIT-IDENTICAL to re-encoding the
  * whole corpus against the same frozen codebooks; an up-to-date
  * refresh is a zero-job no-op; a non-append range refuses and
  * rebuild() (which retrains) recovers. */
class PqIncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("pq-inc-spec").toString
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pq-inc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb() = spark.read.parquet(s"$sf/embeddings.parquet")

  // 9 shifted copies (4500 vectors) seed the corpus; copy 10 appends —
  // big enough that the constant-size codebook reads (~40 KB × a few
  // joins) stay far below the corpus-fraction assertion
  private def copyAt(i: Int) =
    emb().withColumn("vec_id", col("vec_id") + lit(i * 1000L))

  private def seed(dir: String): Unit =
    (0 until 9).map(copyAt).reduce(_ union _).repartition(5)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(dir)

  private def append(dir: String): Unit =
    copyAt(9).repartition(2)
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(dir)

  // the persisted artifact is PACKED CODES (M bytes/vector — r18);
  // compare as unsigned ints for readability
  private def codesOf(idx: String): Map[Long, Seq[Int]] =
    spark.read.format("fls").load(idx)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) ->
        r.getAs[Array[Byte]](1).toSeq.map(_ & 0xFF)).toMap

  private class Metrics extends SparkListener {
    @volatile var jobs = 0
    @volatile var bytesRead = 0L
    override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytesRead += t.taskMetrics.inputMetrics.bytesRead
  }

  private def measured[A](body: => A): (A, Metrics) = {
    val m = new Metrics
    spark.sparkContext.addSparkListener(m)
    try {
      val r = body
      Thread.sleep(400)
      (r, m)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("refresh after an append is O(new data); the patch equals a " +
      "frozen-codebook re-encode of the whole corpus; no-op refresh " +
      "runs zero jobs") {
    val corpus = s"$tmp/corpus"
    val idx = s"$tmp/idx"
    seed(corpus)
    val s1 = IncrementalPq.refresh(spark, corpus, idx)
    assert(s1.rebuilt && s1.toVersion == 1L && s1.vecsEncoded == 4500L)
    val fullBytes = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".fls")).map(_.length()).sum
    append(corpus)
    val (s2, m2) = measured(IncrementalPq.refresh(spark, corpus, idx))
    assert(!s2.rebuilt && s2.fromVersion == 1L && s2.toVersion == 2L &&
      s2.vecsEncoded == 500L)
    assert(m2.bytesRead < (fullBytes * 0.6).toLong,
      s"refresh read ${m2.bytesRead} B of a $fullBytes B corpus — not incremental")
    // the patch is bit-identical to encoding the WHOLE corpus against
    // the same frozen codebooks (codebooks train once — the operational
    // PQ contract; rebuild() would retrain and is a different index)
    val cb = spark.read.format("fls").load(s"$idx/_codebook")
    val u = spark.read.format("fls").load(corpus)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nr", org.apache.spark.sql.functions.sqrt(
        org.apache.spark.sql.graftexprs.GraftFunctions.arrayDot(col("v"), col("v"))))
      .select(col("vec_id"), expr("transform(v, x -> x / nr)").as("uv"))
    val scratch = IncrementalPq.encodeAgainst(spark, u, cb)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Array[Byte]](1).toSeq.map(_ & 0xFF)).toMap
    assert(codesOf(idx) == scratch)
    // already current: zero jobs
    val (s3, m3) = measured(IncrementalPq.refresh(spark, corpus, idx))
    assert(s3.vecsEncoded == 0L && !s3.rebuilt)
    assert(m3.jobs == 0, s"no-op refresh launched ${m3.jobs} job(s)")
  }

  test("a non-append range refuses loudly and rebuild() retrains; " +
      "outgrowing the drift threshold retrains automatically") {
    val corpus = s"$tmp/corpus_ow"
    val idx = s"$tmp/idx_ow"
    seed(corpus)
    IncrementalPq.refresh(spark, corpus, idx)
    // an overwrite rewrites history: stale reconstructions would keep
    // serving vectors that no longer exist
    emb().filter(col("vec_id") < 100).repartition(2)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    val e = intercept[Exception](IncrementalPq.refresh(spark, corpus, idx))
    assert(e.getMessage.contains("not append-only"), e.getMessage)
    val st = IncrementalPq.rebuild(spark, corpus, idx)
    assert(st.rebuilt && st.vecsEncoded == 100L)
    assert(codesOf(idx).size == 100)
    // drift: past the threshold a refresh RETRAINS instead of patching
    append(corpus) // corpus is 100 → +500 = 6×, past any threshold
    sys.props("graft.pq.drift") = "1.05"
    try {
      val st2 = IncrementalPq.refresh(spark, corpus, idx)
      assert(st2.rebuilt, "outgrowing the drift threshold must retrain")
      assert(st2.vecsEncoded == 600L)
    } finally sys.props.remove("graft.pq.drift")
  }

  test("a non-64-dim corpus round-trips (r17 — geometry derived from " +
      "the dimension and a code-memory budget, not hardcoded): dim 48 " +
      "trains m=6 subspaces; the incremental patch stays bit-identical " +
      "and encodes against the CODEBOOK's geometry") {
    import graft.queries.Similarity
    // geometry derivation itself
    assert(Similarity.pqGeomFor(64) == Similarity.PqGeom(8, 8, 64),
      "the 64-dim default must derive the former constants")
    assert(Similarity.pqGeomFor(48) == Similarity.PqGeom(6, 8, 256),
      "6-byte budget over 6 subspaces affords 8-bit codes")
    assert(Similarity.pqGeomFor(10) == Similarity.PqGeom(2, 5, 256))
    // prime dims: one whole-vector subspace when dim <= 8 (plain VQ),
    // dsub=1 scalar quantization when a large dim has no divisor <= 8
    assert(Similarity.pqGeomFor(7) == Similarity.PqGeom(1, 7, 256))
    assert(Similarity.pqGeomFor(67).m == 67)
    val corpus = s"$tmp/corpus48"
    val idx = s"$tmp/idx48"
    // dim-48 corpus: truncate the 64-dim embeddings
    def c48(i: Int) = emb()
      .withColumn("vec_id", col("vec_id") + lit(i * 1000L))
      .withColumn("embedding", slice(col("embedding"), 1, 48))
    (0 until 2).map(c48).reduce(_ union _).repartition(3)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    val st = IncrementalPq.refresh(spark, corpus, idx)
    assert(st.rebuilt && st.vecsEncoded == 1000L)
    val cb = spark.read.format("fls").load(s"$idx/_codebook")
    assert(Similarity.pqGeomOfCodebook(cb) == Similarity.PqGeom(6, 8, 256))
    val r = codesOf(idx)
    assert(r.size == 1000 && r.values.forall(_.length == 6),
      "a dim-48 corpus must store m=6 codes per vector")
    // append + patch: bit-identical to a frozen-codebook whole re-encode
    c48(2).repartition(2).write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(corpus)
    val st2 = IncrementalPq.refresh(spark, corpus, idx)
    assert(!st2.rebuilt && st2.vecsEncoded == 500L)
    val patched = codesOf(idx)
    assert(patched.size == 1500)
    val whole = IncrementalPq.encodeAgainst(spark,
        spark.read.format("fls").load(corpus)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("nr", sqrt(
            org.apache.spark.sql.graftexprs.GraftFunctions
              .arrayDot(col("v"), col("v"))))
          .select(col("vec_id"),
            expr("transform(v, x -> x / nr)").as("uv")), cb)
      .select("vec_id", "codes").collect()
      .map(x => x.getLong(0) ->
        x.getAs[Array[Byte]](1).toSeq.map(_ & 0xFF)).toMap
    assert(patched == whole,
      "the dim-48 patch must be bit-identical to a whole re-encode")
  }

  test("out-of-corpus query encoding (r17 stretch): a driver-side " +
      "PqEncoder over the collected frozen codebook reproduces the " +
      "STORED codes bit-for-bit — a serving tier can " +
      "ADC-score novel vectors with zero Spark jobs") {
    import graft.queries.Similarity
    val corpus = s"$tmp/corpus_enc"
    val idx = s"$tmp/idx_enc"
    copyAt(0).repartition(3).write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    IncrementalPq.refresh(spark, corpus, idx)
    val cb = spark.read.format("fls").load(s"$idx/_codebook")
    val enc = Similarity.pqEncoder(cb)
    assert(enc.geom == Similarity.PqGeom(8, 8, 64))
    val stored = codesOf(idx)
    // the same normalized vectors the index encoded
    val uvs = spark.read.format("fls").load(corpus)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nr", sqrt(org.apache.spark.sql.graftexprs.GraftFunctions
        .arrayDot(col("v"), col("v"))))
      .select(col("vec_id"), expr("transform(v, x -> x / nr)").as("uv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    assert(uvs.length == 500)
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val mismatches =
      try uvs.count { case (id, uv) =>
        enc.codes(uv).toSeq != stored(id)
      } finally {
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(mismatches == 0,
      s"$mismatches of ${uvs.length} driver-side encodes diverged from " +
        "the stored codes")
    assert(jobs == 0, s"driver-side encoding ran $jobs Spark job(s)")
    // a genuinely NOVEL vector encodes too (sanity: valid codes, right
    // shape, ADC is a plain dot)
    val novel = Array.tabulate(64)(i => math.sin(i + 0.5))
    val nrm = math.sqrt(novel.map(x => x * x).sum)
    val unovel = novel.map(_ / nrm)
    val cds = enc.codes(unovel)
    assert(cds.length == 8 && cds.forall(c => c >= 0 && c < 64))
    val rv = enc.reconstruct(unovel)
    assert(rv.length == 64)
    assert(enc.adc(unovel, rv) > 0.0)
  }

  test("a truncated/garbled index marker means 'no marker' — refresh " +
      "rebuilds instead of throwing (r19, ADVICE: crash mid-marker-write " +
      "on a pre-atomic binary)") {
    val corpus = s"$tmp/corpus_garbled"
    val idx = s"$tmp/idx_garbled"
    seed(corpus)
    IncrementalPq.refresh(spark, corpus, idx)
    val marker = new java.io.File(s"$idx/_pq_inc_done")
    assert(marker.exists())
    // what a crash mid-PrintWriter.print leaves behind
    java.nio.file.Files.writeString(marker.toPath, "n=45")
    val st = IncrementalPq.refresh(spark, corpus, idx)
    assert(st.rebuilt, "a garbled marker must route to the full rebuild")
    assert(java.nio.file.Files.readString(marker.toPath)
      .contains("fmt=codes"), "the rebuild must restore a whole marker")
    // and a marker that is pure garbage (not even k=v shaped)
    java.nio.file.Files.writeString(marker.toPath, "  ;;==")
    assert(IncrementalPq.refresh(spark, corpus, idx).rebuilt)
    // after the rebuild the normal no-op fast path re-engages
    val st3 = IncrementalPq.refresh(spark, corpus, idx)
    assert(!st3.rebuilt && st3.vecsEncoded == 0L)
  }
}
