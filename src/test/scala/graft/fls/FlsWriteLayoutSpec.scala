package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And, Filter, GreaterThanOrEqual, LessThan}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Write-side physical layout (FlsWrite's RequiresDistributionAndOrdering
  * contract + ZOrder clustering): the planner must exchange/sort rows
  * BEFORE the writer so partitioned writes don't explode into
  * tasks x partitions files, cluster_by yields cross-file-disjoint zone
  * maps, sort_by yields within-file-monotone zone maps, and a Z-order
  * layout serves selective filters on EVERY clustered dimension. */
class FlsWriteLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-layout").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-write-layout-spec")
      .config("spark.sql.shuffle.partitions", "4")
      // keep the layout shuffles at the configured parallelism — AQE
      // coalescing at toy scale would fold everything into one file and
      // the cross-file assertions would measure nothing
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (path, row-group (min,max) list) for the key column of every data
    * file under dir. */
  private def fileStats(dir: String, colName: String): Seq[(String, Seq[(Long, Long)])] = {
    val conf = spark.sessionState.newHadoopConf()
    FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf).map { p =>
      val r = new FlsFileReader(p, conf)
      try {
        val ci = r.table.columns.indexWhere(_.name == colName)
        assert(ci >= 0, s"column $colName not found in $p")
        p.toString -> r.table.rowGroups.toSeq.map { rg =>
          val s = rg.segments(ci)
          assert(s.hasStats, s"no stats for $colName in $p")
          (s.minLong, s.maxLong)
        }
      } finally r.close()
    }
  }

  private def plannedPartitions(dir: String, fs: Filter*): Int = {
    import graft.fls.connector._
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir))
    val schema = new FlsDataSource().inferSchema(opts)
    val b = new FlsScanBuilder(schema, opts)
    b.pushFilters(fs.toArray)
    // one row group per split so the count measures PRUNING, not packing
    spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
    try b.build().toBatch.planInputPartitions().length
    finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("partition_by clusters rows before the writer (no tasks x partitions file spray)") {
    val df = spark.range(0, 8000)
      .selectExpr("id AS v", "CAST(id % 4 AS INT) AS k")
      .repartition(8) // 8 write-side input tasks, all 4 k-values in each
    val laid = s"$tmp/part_laid"
    df.write.format("fls").mode("overwrite").option("partition_by", "k").save(laid)
    val legacy = s"$tmp/part_legacy"
    df.write.format("fls").mode("overwrite").option("partition_by", "k")
      .option("write_distribution", "none").save(legacy)
    val conf = spark.sessionState.newHadoopConf()
    def files(d: String) =
      FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(d), conf).length
    // legacy: every task writes every partition -> 8*4 = 32 files
    assert(files(legacy) == 32, s"legacy wrote ${files(legacy)} files")
    // ordered distribution: each partition value lands in a handful of
    // range buckets (4 values over <=4 shuffle partitions -> <=7 files
    // counting boundary straddles)
    assert(files(laid) <= 8, s"distributed write still sprayed: ${files(laid)} files")
    // identical table content either way
    val a = spark.read.format("fls").load(laid)
    val b = spark.read.format("fls").load(legacy)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("cluster_by produces disjoint per-file ranges and zone-map skipping") {
    val dir = s"$tmp/clustered"
    spark.range(0, 64 * 1024).selectExpr("id AS v", "hash(id) AS noise")
      .repartition(8) // destroy the natural order first
      .write.format("fls").mode("overwrite")
      .option("cluster_by", "v").option("row_group_size", "4096").save(dir)
    val stats = fileStats(dir, "v")
    assert(stats.size > 1, "want multiple files to prove cross-file disjointness")
    // per-file [min,max] spans must not overlap (range exchange), and
    // within each file row-group mins must be sorted (task-side sort)
    val spans = stats.map { case (_, rgs) => (rgs.map(_._1).min, rgs.map(_._2).max) }
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"file spans overlap: $spans")
      case _ => ()
    }
    stats.foreach { case (p, rgs) =>
      assert(rgs.map(_._1) == rgs.map(_._1).sorted, s"row groups unsorted in $p")
    }
    // a 1/16 range filter must plan ~1/16 of the row groups
    val total = plannedPartitions(dir)
    val pruned = plannedPartitions(dir,
      And(GreaterThanOrEqual("v", 1000L), LessThan("v", 5000L)))
    assert(pruned * 4 < total, s"pruned=$pruned total=$total — zone maps not selective")
  }

  test("sort_by sorts within tasks only (monotone row-group stats per file)") {
    val dir = s"$tmp/sorted"
    spark.range(0, 32 * 1024).selectExpr("id AS v", "id % 97 AS salt")
      .repartition(4, col("salt")) // rows arrive unsorted within each task
      .write.format("fls").mode("overwrite")
      .option("sort_by", "v").option("row_group_size", "4096").save(dir)
    val stats = fileStats(dir, "v")
    stats.foreach { case (p, rgs) =>
      rgs.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi <= lo2,
          s"row groups in $p not sorted: $rgs")
        case _ => ()
      }
    }
    // no global exchange: with 4 input tasks the files still cover
    // overlapping global ranges (sort_by is the cheap local layout)
    assert(stats.size >= 2)
  }

  test("sort_by desc direction is honored") {
    val dir = s"$tmp/sorted_desc"
    spark.range(0, 8192).selectExpr("id AS v")
      .coalesce(1).write.format("fls").mode("overwrite")
      .option("sort_by", "v:desc").option("row_group_size", "1024").save(dir)
    val rgs = fileStats(dir, "v").head._2
    rgs.sliding(2).foreach {
      case Seq((lo, _), (_, hi2)) => assert(hi2 <= lo, s"not descending: $rgs")
      case _ => ()
    }
  }

  test("layout option validation fails fast") {
    val df = spark.range(0, 10).selectExpr("id AS v", "id % 2 AS k")
    def bad(opts: (String, String)*): Unit = {
      val w = opts.foldLeft(df.write.format("fls").mode("overwrite")) {
        case (x, (k, v)) => x.option(k, v)
      }
      intercept[Exception] { w.save(s"$tmp/bad") }
    }
    bad("cluster_by" -> "nope")
    bad("sort_by" -> "v:sideways")
    bad("write_distribution" -> "zigzag")
    bad("partition_by" -> "k", "cluster_by" -> "k") // partition col re-listed
    bad("cluster_by" -> "v", "sort_by" -> "v") // duplicate
  }

  test("runtime join filters prune row groups of a clustered table") {
    import graft.fls.connector._
    import org.apache.spark.sql.sources.In
    val dir = s"$tmp/clustered" // written by the cluster_by test above
    assert(new java.io.File(dir).exists())
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir))
    val schema = new FlsDataSource().inferSchema(opts)
    val b = new FlsScanBuilder(schema, opts)
    spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
    try {
      val scan = b.build().asInstanceOf[FlsScan]
      val total = scan.toBatch.planInputPartitions().length
      // a broadcast-side key set arriving AFTER planning (DPP-style)
      // must hit the same zone maps the static path uses — on the
      // clustered layout a 3-key set touches a couple of row groups
      assert(scan.filterAttributes().map(_.describe()).contains("v"))
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        In("v", Array[Any](100L, 101L, 40000L))))
      val pruned = scan.toBatch.planInputPartitions().length
      assert(pruned * 4 < total, s"runtime In-filter: $pruned of $total")
    } finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("the layout contract applies to streaming micro-batch epochs") {
    val src = s"$tmp/stream_src"
    spark.range(0, 16 * 1024).selectExpr("id AS v", "hash(id) AS noise")
      .repartition(4).write.format("fls").mode("overwrite").save(src)
    val out = s"$tmp/stream_clustered"
    val schema = spark.read.format("fls").load(src).schema
    val q = spark.readStream.format("fls").schema(schema).load(src)
      .writeStream.format("fls")
      .option("path", out)
      .option("cluster_by", "v")
      .option("row_group_size", "1024")
      .option("checkpointLocation", s"$out/_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stats = fileStats(out, "v")
    assert(stats.nonEmpty)
    // each epoch range-exchanges + sorts: every file's row groups are
    // internally ordered, and this epoch's files are pairwise disjoint
    stats.foreach { case (p, rgs) =>
      rgs.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"unsorted epoch file $p: $rgs")
        case _ => ()
      }
    }
    val spans = stats.map { case (_, rgs) => (rgs.map(_._1).min, rgs.map(_._2).max) }
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"epoch files overlap: $spans")
      case _ => ()
    }
    // rows survive exactly
    assert(spark.read.format("fls").load(out).agg(sum("v")).collect()(0).getLong(0) ==
      (16L * 1024 - 1) * (16L * 1024) / 2)
  }

  test("zvalue interleaves quantile buckets and isolates nulls at zero") {
    import org.apache.spark.sql.graftexprs.ZValue
    import org.apache.spark.sql.catalyst.expressions.Literal
    val cuts = Array(10.0, 20.0, 30.0) // buckets 1..4 for values, 0 for null
    def z(a: Any, b: Any): Long = ZValue(
      Seq(Literal(a, org.apache.spark.sql.types.DoubleType),
        Literal(b, org.apache.spark.sql.types.DoubleType)),
      Seq(cuts, cuts)).eval(null).asInstanceOf[Long]
    assert(z(null, null) == 0L)
    assert(z(5.0, 5.0) == 3L) // bucket 1 in both dims -> bits 0 and 1
    assert(z(15.0, 5.0) == 6L) // dim0 bucket 2 (bit at pos 2), dim1 bucket 1 (pos 1)
    assert(z(10.0, 5.0) == 3L) // a value equal to a cut joins the lower bucket
    // monotone in each dimension when the other is fixed
    assert(z(5.0, 15.0) < z(5.0, 25.0) && z(15.0, 5.0) < z(25.0, 5.0))
    // interpreted eval matches codegen through a real projection
    val df = spark.range(0, 1000).selectExpr(
      "CAST(id % 40 AS DOUBLE) AS a", "CAST(id % 37 AS DOUBLE) AS b")
    val zc = graft.functions.ZOrder.zvalue(Seq(col("a"), col("b")), Seq(cuts, cuts))
    val viaCodegen = df.select(zc.as("z")).agg(sum("z")).collect()(0).getLong(0)
    val viaRows = df.collect().map(r =>
      ZValue(Seq(Literal(r.getDouble(0)), Literal(r.getDouble(1))),
        Seq(cuts, cuts)).eval(null).asInstanceOf[Long]).sum
    assert(viaCodegen == viaRows)
  }

  test("zorder with a categorical (string) dimension skips on equality via string zone maps") {
    import org.apache.spark.sql.sources.EqualTo
    val dir = s"$tmp/zorder_str"
    val langs = Seq("en", "de", "fr", "nl", "pt", "it", "es", "pl")
    val df = spark.range(0, 64 * 1024)
      .selectExpr(s"element_at(array(${langs.map(l => s"'$l'").mkString(",")}), " +
        "CAST(pmod(hash(id), 8) + 1 AS INT)) AS lang",
        "CAST(pmod(hash(id + 3), 5000) AS LONG) AS n_chars", "id AS payload")
    graft.functions.ZOrder.cluster(df, Seq("lang", "n_chars"), buckets = 256,
      numPartitions = 4)
      .write.format("fls").mode("overwrite").option("row_group_size", "1024").save(dir)
    val total = plannedPartitions(dir)
    // equality on the hashed categorical dim: rows of one lang occupy
    // one curve region, so the byte-prefix string zone maps prune
    val prunedLang = plannedPartitions(dir, EqualTo("lang", "de"))
    assert(prunedLang * 2 < total, s"lang: $prunedLang of $total")
    // the numeric dim still range-skips
    val prunedChars = plannedPartitions(dir,
      And(GreaterThanOrEqual("n_chars", 0L), LessThan("n_chars", 100L)))
    assert(prunedChars * 2 < total, s"n_chars: $prunedChars of $total")
  }

  test("zorder layout narrows zone maps on BOTH dimensions") {
    val dir = s"$tmp/zorder"
    val df = spark.range(0, 64 * 1024)
      .selectExpr("CAST(hash(id) % 1000 AS LONG) AS a",
        "CAST(hash(id + 7) % 1000 AS LONG) AS b", "id AS payload")
    graft.functions.ZOrder.cluster(df, Seq("a", "b"), buckets = 256, numPartitions = 4)
      .write.format("fls").mode("overwrite").option("row_group_size", "1024").save(dir)
    val total = plannedPartitions(dir)
    // a selective band on EITHER dimension must skip most row groups —
    // the property a single-column sort cannot deliver
    val prunedA = plannedPartitions(dir,
      And(GreaterThanOrEqual("a", -20L), LessThan("a", 20L)))
    val prunedB = plannedPartitions(dir,
      And(GreaterThanOrEqual("b", -20L), LessThan("b", 20L)))
    assert(prunedA * 2 < total, s"dim a: $prunedA of $total")
    assert(prunedB * 2 < total, s"dim b: $prunedB of $total")
  }
}
