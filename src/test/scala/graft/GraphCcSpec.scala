package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q70's iterative min-label propagation must equal a local union-find
  * over the same blocking edges — on a topology DESIGNED to need
  * multi-hop closure (length bands chain sources that share no block
  * directly). */
class GraphCcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("graph-cc").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graph-cc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (doc_id, lang, source, n_chars): sources s0..s9 within a lang are
    * chained pairwise through shared length bands, so the closure needs
    * several hops; a second lang stays fully separate. */
  private def docs: Seq[(Long, String, String, Long)] = {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var id = 0L
    for (lang <- Seq("en", "de"); s <- 0 until 10; i <- 0 until 5) {
      // band s*2 and s*2+1 both appear in source s; band s*2+1 also in
      // source s+1 → chain s0–s1–…–s9 via overlapping bands
      val band = if (i < 3) s * 2 else s * 2 + 1
      rows += ((id, lang, s"s$s", band * 64L + (i % 3)))
      id += 1
      if (i == 4 && s < 9) { // the chaining doc: next source, same band
        rows += ((id, lang, s"s${s + 1}", band * 64L + 1))
        id += 1
      }
    }
    rows.toSeq
  }

  private def unionFind(rows: Seq[(Long, String, String, Long)]): Map[Long, Int] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for ((_, g) <- rows.groupBy(r => (r._2, r._3)))
      g.map(_._1).foreach(union(_, g.map(_._1).min))
    for ((_, g) <- rows.groupBy(r => (r._2, r._4 / 64)))
      g.map(_._1).foreach(union(_, g.map(_._1).min))
    rows.map(_._1).groupBy(find).map { case (rep, members) => rep -> members.size }
  }

  test("components equal a local union-find; closure is genuinely multi-hop") {
    val sp = spark; import sp.implicits._
    val d = docs
    d.toDF("doc_id", "lang", "source", "n_chars")
      .selectExpr("doc_id", "'x' AS text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val exp = unionFind(d).map { case (k, v) => (k, v.toLong) }
    val got = graft.queries.Graph.q70DedupComponents(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == exp, s"missing=${(exp.toSet -- got.toSet).take(3)} " +
      s"extra=${(got.toSet -- exp.toSet).take(3)}")
    // the design goal: one component per lang spanning all 10 sources —
    // reachable only through ≥2 propagation hops
    assert(got.size == 2, s"expected 2 chained components, got ${got.size}")
  }

  test("star contraction equals min-label propagation on the chained graph") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions._
    val d = docs.toDF("doc_id", "lang", "source", "n_chars")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), expr("n_chars DIV 64"))
    val b1 = d.select(col("doc_id").as("a"), min("doc_id").over(w1).as("b"))
    val b2 = d.select(col("doc_id").as("a"), min("doc_id").over(w2).as("b"))
    val edges = b1.union(b2).filter(col("a") =!= col("b")).distinct()
    val nodes = d.select(col("doc_id").as("node"))
    val contraction = graft.queries.Graph.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val propagation = graft.queries.Graph.labelPropagation(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contraction == propagation)
  }

  test("path graph with diameter > 64 converges (propagation's cap territory)") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions._
    // a 200-node path 0-1-2-…-199: diameter 199, where plain min-label
    // propagation would need 199 rounds and trip its 64-round cap;
    // contraction must close it in O(log n) rounds
    val n = 200L
    val nodes = sp.range(0, n).select(col("id").as("node"))
    val edges = sp.range(0, n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = graft.queries.Graph.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L),
      s"path must collapse to one component rooted at 0: " +
        s"${labels.filter(_._2 != 0L).take(5).mkString(",")}")
    // the O(log n) claim, asserted: diameter 199 must close in far
    // fewer rounds than propagation's 199 (2·log2(200) ≈ 15)
    val rounds = graft.queries.Graph.lastRounds
    assert(rounds <= 16, s"contraction took $rounds rounds on a 200-path " +
      "— that is propagation-like, not O(log n)")
    // isolated node: labels itself
    val lone = graft.queries.Graph.connectedComponents(
      sp.range(500, 503).select(col("id").as("node")),
      sp.emptyDataset[(Long, Long)].toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lone == Set((500L, 500L), (501L, 501L), (502L, 502L)))
  }

  test("NULL lang/source/band group together like the oracle's window (r21)") {
    val sp = spark; import sp.implicits._
    // docs 0-2 share (NULL, NULL) via lang/source; docs 3-4 share a NULL
    // band key only through lang 'en'; doc 5 is a singleton. The old
    // equi-join dropped every NULL-keyed star edge (ADVICE r20) — the
    // window semantics (and the DuckDB oracle) group NULLs together.
    val rows = Seq[(Long, Option[String], Option[String], Option[Long])](
      (0L, None, None, Some(10L)), (1L, None, None, Some(200L)),
      (2L, None, None, Some(400L)),
      (3L, Some("en"), Some("sA"), None), (4L, Some("en"), Some("sB"), None),
      (5L, Some("de"), Some("sC"), Some(700L)))
    val dir = Files.createTempDirectory("cc-null").toString
    rows.toDF("doc_id", "lang", "source", "n_chars")
      .selectExpr("doc_id", "'x' AS text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Graph.q70DedupComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 3L, 3L -> 2L, 5L -> 1L),
      s"NULL keys must block together (window semantics), got $got")
  }
}
