package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{IncrementalAdc, IncrementalIvf, IncrementalPq}

/** Incremental residual-IVFADC maintenance ([[IncrementalAdc]], r17):
  * the q126 recall rung gets the same steady-state O(new data) story
  * as plain PQ — appended vectors assign against FROZEN centroids and
  * encode against FROZEN residual codebooks, bit-identical to a whole
  * re-encode; an IVF recluster (which moves every subtraction anchor)
  * invalidates the artifact whole and retrains. */
class IncrementalAdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("adc-inc-spec").toString
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("adc-inc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb() = spark.read.parquet(s"$sf/embeddings.parquet")
  private def copyAt(i: Int) =
    emb().withColumn("vec_id", col("vec_id") + lit(i * 1000L))

  // the persisted artifact is PACKED RESIDUAL CODES (M bytes — r18)
  private def codesOf(idx: String): Map[Long, Seq[Int]] =
    spark.read.format("fls").load(idx)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) ->
        r.getAs[Array[Byte]](1).toSeq.map(_ & 0xFF)).toMap

  test("refresh after an append encodes only the appended vectors and " +
      "the patch is bit-identical to a whole re-encode against the " +
      "frozen centroids + codebooks") {
    val corpus = s"$tmp/corpus"
    val ivf = s"$tmp/ivf"
    val adc = s"$tmp/adc"
    (0 until 4).map(copyAt).reduce(_ union _).repartition(4)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    val st = IncrementalAdc.refresh(spark, corpus, ivf, adc)
    assert(st.rebuilt && st.vecsEncoded == 2000L)
    val r0 = codesOf(adc)
    assert(r0.size == 2000 && r0.values.forall(_.length == 8),
      "the residual artifact must store m=8 packed codes per vector")
    // append; refresh must PATCH (no retrain), and only the new rows
    copyAt(4).repartition(2).write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(corpus)
    val st2 = IncrementalAdc.refresh(spark, corpus, ivf, adc)
    assert(!st2.rebuilt, "an in-threshold append must patch, not retrain")
    assert(st2.vecsEncoded == 500L)
    val patched = codesOf(adc)
    assert(patched.size == 2500)
    // old rows byte-identical, new rows = frozen-artifact encode of
    // the WHOLE corpus restricted to them
    assert(r0.forall { case (id, cs) => patched(id) == cs },
      "patching must not touch existing codes")
    val cb = spark.read.format("fls").load(s"$adc/_codebook")
    val whole = IncrementalAdc.encodeAgainst(spark,
        IncrementalPq.normalized(spark.read.format("fls").load(corpus))
          .select(col("vec_id"), col("uv")), ivf, cb)
      .select("vec_id", "codes").collect()
      .map(x => x.getLong(0) ->
        x.getAs[Array[Byte]](1).toSeq.map(_ & 0xFF)).toMap
    assert(patched == whole,
      "the patch must be bit-identical to a whole frozen re-encode")
    // up-to-date refresh is a no-op
    val st3 = IncrementalAdc.refresh(spark, corpus, ivf, adc)
    assert(!st3.rebuilt && st3.vecsEncoded == 0L)
  }

  test("an IVF RECLUSTER (moved subtraction anchors) invalidates the " +
      "residual artifact whole: the next refresh retrains instead of " +
      "mixing anchors") {
    val corpus = s"$tmp/corpus2"
    val ivf = s"$tmp/ivf2"
    val adc = s"$tmp/adc2"
    copyAt(0).repartition(2).write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    IncrementalAdc.refresh(spark, corpus, ivf, adc)
    assert(codesOf(adc).size == 500)
    // grow the corpus past the IVF drift threshold: IncrementalIvf
    // reclusters inside the next refresh, which must then rebuild the
    // ADC artifact (its marker no longer matches the IVF stamp)
    (1 until 4).map(copyAt).reduce(_ union _).repartition(2)
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(corpus)
    sys.props("graft.ivf.drift") = "1.5"
    try {
      val st = IncrementalAdc.refresh(spark, corpus, ivf, adc)
      assert(st.rebuilt,
        "a reclustered IVF index must retrain the residual artifact")
      assert(st.vecsEncoded == 2000L)
    } finally sys.props.remove("graft.ivf.drift")
    // and the rebuilt artifact matches a frozen whole-encode again
    val cb = spark.read.format("fls").load(s"$adc/_codebook")
    val whole = IncrementalAdc.encodeAgainst(spark,
        IncrementalPq.normalized(spark.read.format("fls").load(corpus))
          .select(col("vec_id"), col("uv")), ivf, cb)
      .select("vec_id", "codes").collect()
      .map(x => x.getLong(0) ->
        x.getAs[Array[Byte]](1).toSeq.map(_ & 0xFF)).toMap
    assert(codesOf(adc) == whole)
  }

  test("a non-append corpus range refuses loudly; rebuild() recovers") {
    val corpus = s"$tmp/corpus3"
    val ivf = s"$tmp/ivf3"
    val adc = s"$tmp/adc3"
    copyAt(0).repartition(2).write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    IncrementalAdc.refresh(spark, corpus, ivf, adc)
    emb().filter(col("vec_id") < 100).repartition(2)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    val e = intercept[Exception](
      IncrementalAdc.refresh(spark, corpus, ivf, adc))
    assert(e.getMessage.contains("not append-only"), e.getMessage)
    IncrementalIvf.rebuild(spark, corpus, ivf)
    val st = IncrementalAdc.rebuild(spark, corpus, ivf, adc)
    assert(st.rebuilt && st.vecsEncoded == 100L)
    assert(codesOf(adc).size == 100)
  }
}
