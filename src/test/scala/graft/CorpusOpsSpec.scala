package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Corpus

/** Corpus operators q59–q62: q59's plan must be the k-bounded
  * aggregator (no WindowExec, no global sort of group members) yet
  * row-for-row equal to the windowed formulation; q60/q62 must be
  * non-degenerate (crafted repetition / token-reordered duplicates are
  * actually caught); q61 must interpolate exactly. */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("corpus-ops").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("corpus-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Crafted documents table: d0/d1 in lang "aa" are token-reorderings
    * of each other (same bag), d2 is highly repetitive, lang "bb" has 5
    * docs with known lengths for quantile checks. */
  private lazy val dir: String = {
    val rows = Seq(
      (0L, "red blue green yellow", "aa", "s0"),
      (1L, "yellow green blue red", "aa", "s0"),
      (2L, "dup dup dup dup dup dup dup one", "aa", "s0"),
      (3L, "all tokens here are distinct", "aa", "s1"),
      (10L, "a", "bb", "s0"), (11L, "ab c", "bb", "s0"),
      (12L, "abc de", "bb", "s0"), (13L, "abcd efg", "bb", "s1"),
      (14L, "abcde fghi", "bb", "s1"))
    val d = s"$tmp/docs"
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q59 plan is aggregated top-k: no WindowExec, and equals the window answer") {
    val df = Corpus.q59TopPerGroup(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q59 must not sort groups via a window:\n$plan")
    val viaWindow = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)"))
      .filter(col("rn") <= 3)
      .select("lang", "doc_id", "n_chars")
      .orderBy(col("lang"), col("n_chars").desc, col("doc_id"))
    assert(df.collect().toSeq == viaWindow.collect().toSeq)
  }

  test("q60 flags the repetitive doc and only it") {
    val r = Corpus.q60RepetitionRatio(spark, dir)
      .filter(col("lang") === "aa").collect().head
    assert(r.getAs[Long]("n_docs") == 4)
    // only doc 2 (7×dup + one: 2 distinct of 8 tokens) crosses ratio 0.5
    assert(r.getAs[Long]("n_flagged") == 1)
  }

  test("q61 interpolates exactly on known lengths") {
    // bb lengths sorted: 1,4,6,8,10 → p50 = 6; p90 = 8 + 0.6·(10−8) = 9.2
    val r = Corpus.q61LengthQuantiles(spark, dir)
      .filter(col("lang") === "bb").collect().head
    assert(r.getAs[Double]("p50") == 6.0)
    assert(r.getAs[Double]("p90") == 9.2)
  }

  test("q61 approx twin tracks the exact quantiles within sketch tolerance") {
    val exact = Corpus.q61LengthQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Corpus.q61ApproxLengthQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    // the sketch's guarantee is RANK error, not value error: it returns
    // an actual data value whose rank is within ±1 of the target on a
    // handful of inputs (exact interpolates BETWEEN ranks, so compare
    // against the bracketing data values, not the interpolated number)
    val lengths = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> rs.map(_.getLong(1).toDouble).sorted }
    def admissible(lang: String, p: Double): Set[Double] = {
      val vs = lengths(lang)
      val r = p * (vs.length - 1)
      val lo = math.max(math.floor(r).toInt - 1, 0)
      val hi = math.min(math.ceil(r).toInt + 1, vs.length - 1)
      (lo to hi).map(vs).toSet
    }
    for ((lang, (a50, a90)) <- approx) {
      assert(admissible(lang, 0.5).contains(a50),
        s"$lang p50: approx=$a50 not within rank tolerance of ${lengths(lang).toSeq}")
      assert(admissible(lang, 0.9).contains(a90),
        s"$lang p90: approx=$a90 not within rank tolerance of ${lengths(lang).toSeq}")
    }
  }

  test("q69 broadcast is gated: hint under the ceiling, AQE's choice above") {
    def optimized(ceiling: Long): String =
      Corpus.ngramContamination(spark, dir, ceiling)
        .queryExecution.optimizedPlan.toString
    // generous ceiling → the test side carries an explicit broadcast hint
    assert(optimized(Long.MaxValue >> 3).contains("strategy=broadcast"),
      "expected a broadcast hint under the ceiling")
    // zero ceiling → no hint; join strategy left to Catalyst/AQE sizes
    assert(!optimized(0L).contains("strategy=broadcast"),
      "expected no forced broadcast above the ceiling")
    // both sides of the ceiling must agree on the answer
    val under = Corpus.ngramContamination(spark, dir, Long.MaxValue >> 3)
      .collect().toSeq
    val over = Corpus.ngramContamination(spark, dir, 0L).collect().toSeq
    assert(under == over)
  }

  test("q62 collapses token-reordered duplicates, keeps distinct bags apart") {
    val bySource = Corpus.q62BagDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // s0: docs 0,1 share a bag; 2, 10..12 distinct → 6 docs, 5 bags
    assert(bySource("s0") == (6L, 5L), s"got $bySource")
    assert(bySource("s1") == (3L, 3L))
  }
}
