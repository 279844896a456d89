package graft.fls

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.fls.connector.FlsPartitioning

/** Partition-spec evolution (`CALL system.evolve_partition_spec`):
  * an O(1) metadata commit changes how FUTURE writes are partitioned;
  * old files keep serving under the layout their paths encode. Locks
  * the heterogeneous discovery (union keys + absent markers), per-file
  * column binding (path vs data), pruning soundness on both
  * generations, the loud refusals, and that uniform-layout tables are
  * untouched. */
class FlsSpecEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-evo-spec").toString
  private val cat = "fls_evo_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-spec-evolution")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("heterogeneous discovery: union keys, absent markers, unknown-on-absent pruning") {
    val conf = spark.sessionState.newHadoopConf()
    val base = new Path(s"$tmp/disc")
    val files = Seq(
      new Path(base, "month=2020-01/a.fls"),
      new Path(base, "day=2020-02-03/b.fls"))
    val disc = FlsPartitioning.discover(Seq(base.toString),
      files.map(f => f.getFileSystem(conf).makeQualified(f)), conf)
    assert(!disc.uniform)
    assert(disc.keys == Seq("month", "day"))
    val fA = files.head.getFileSystem(conf).makeQualified(files.head).toString
    val fB = files(1).getFileSystem(conf).makeQualified(files(1)).toString
    assert(disc.pvalsOf(fA) == Map("month" -> "2020-01"))
    assert(disc.pvalsOf(fB) == Map("day" -> "2020-02-03"))
    // pruning: a filter on a key the file's path LACKS keeps the file
    import org.apache.spark.sql.sources.EqualTo
    val types = Map[String, org.apache.spark.sql.types.DataType](
      "month" -> org.apache.spark.sql.types.StringType,
      "day" -> org.apache.spark.sql.types.StringType)
    assert(FlsPartitioning.evaluates(EqualTo("month", "2020-01"), types,
      disc.keys, disc.byFile(fA)) == Some(true))
    assert(FlsPartitioning.evaluates(EqualTo("month", "2020-09"), types,
      disc.keys, disc.byFile(fA)) == Some(false))
    assert(FlsPartitioning.evaluates(EqualTo("month", "2020-09"), types,
      disc.keys, disc.byFile(fB)).isEmpty) // absent → can't tell → keep
    // a flat file in the mix still turns discovery off entirely
    val mixed = FlsPartitioning.discover(Seq(base.toString),
      files :+ new Path(base, "c.fls"), conf)
    assert(mixed.keys.isEmpty)
  }

  test("evolve month→day: both generations read, prune, and route correctly") {
    val tbl = s"$cat.db.evo"
    val dir = s"$tmp/warehouse/db/evo"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE, month STRING, " +
      s"day STRING) PARTITIONED BY (month) TBLPROPERTIES " +
      "('commit_mode'='manifest')")
    // gen 1 under month=: 2 months × 2 days × 25 rows
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, CAST(id AS DOUBLE),
             concat('2020-0', CAST(1 + (id % 2) AS STRING)),
             concat('2020-0', CAST(1 + (id % 2) AS STRING), '-0',
                    CAST(1 + (id % 4) DIV 2 AS STRING))
      FROM range(0, 100)""")
    val res = spark.sql(s"CALL $cat.system.evolve_partition_spec(" +
      s"`table` => 'db.evo', partition_by => 'day')").collect()
    assert(res(0).getString(0) == "month" && res(0).getString(1) == "day")
    // gen 2 under day=: same shape, ids 100..199
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, CAST(id AS DOUBLE),
             concat('2020-0', CAST(1 + (id % 2) AS STRING)),
             concat('2020-0', CAST(1 + (id % 2) AS STRING), '-0',
                    CAST(1 + (id % 4) DIV 2 AS STRING))
      FROM range(100, 200)""")
    // the new generation landed under day= directories
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(dir, "day=2020-01-01")))
    assert(fs.exists(new Path(dir, "month=2020-01")))
    // full read: both generations, all four columns correct
    assert(spark.table(tbl).count() == 200)
    val r = spark.sql(s"SELECT count(*) n, count(DISTINCT month) m, " +
      s"count(DISTINCT day) d FROM $tbl").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (200L, 2L, 4L))
    // filters answer identically on path-stored and data-stored copies
    val byMonth = spark.sql(
      s"SELECT count(*) FROM $tbl WHERE month = '2020-01'").collect()(0).getLong(0)
    assert(byMonth == 100)
    val byDay = spark.sql(
      s"SELECT count(*) FROM $tbl WHERE day = '2020-01-01'").collect()(0).getLong(0)
    assert(byDay == 50)
    val cross = spark.sql(s"SELECT sum(id) FROM $tbl WHERE " +
      s"month = '2020-02' AND day = '2020-02-02'").collect()(0).getLong(0)
    // ids with id%2==1 and (id%4) div 2 == 1, i.e. id%4 == 3, over 0..199
    assert(cross == (3 until 200 by 4).map(_.toLong).sum)
    // grouped aggregates stay exact across the spec boundary
    val grouped = spark.sql(s"SELECT month, day, count(*) n FROM $tbl " +
      "GROUP BY month, day ORDER BY month, day").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(grouped == Seq(
      ("2020-01", "2020-01-01", 50L), ("2020-01", "2020-01-02", 50L),
      ("2020-02", "2020-02-01", 50L), ("2020-02", "2020-02-02", 50L)))
  }

  test("pruning skips the other generation's directories by path") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val tbl = s"$cat.db.evo" // fixture from the previous test
    def plannedParts(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputPartitions.length
      }.sum
    val all = plannedParts(s"SELECT id FROM $tbl")
    val dayFiltered = plannedParts(
      s"SELECT id FROM $tbl WHERE day = '2020-01-01'")
    // day= pruning drops gen-2 files of the other three days; gen-1
    // files (day in data) survive path pruning
    assert(dayFiltered < all, s"$dayFiltered !< $all")
    val monthFiltered = plannedParts(
      s"SELECT id FROM $tbl WHERE month = '2020-02'")
    assert(monthFiltered < all, s"$monthFiltered !< $all")
  }

  test("compact after evolution re-layouts the history under the CURRENT spec") {
    val tbl = s"$cat.db.evo_compact"
    val dir = s"$tmp/warehouse/db/evo_compact"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, m STRING, d STRING) " +
      "PARTITIONED BY (m) TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"""INSERT INTO $tbl SELECT id,
      concat('m', CAST(id % 2 AS STRING)),
      concat('d', CAST(id % 4 AS STRING)) FROM range(0, 100)""")
    spark.sql(s"CALL $cat.system.evolve_partition_spec(" +
      s"`table` => 'db.evo_compact', partition_by => 'd')")
    spark.sql(s"""INSERT INTO $tbl SELECT id,
      concat('m', CAST(id % 2 AS STRING)),
      concat('d', CAST(id % 4 AS STRING)) FROM range(100, 200)""")
    // mixed layout now; compact = the physical re-layout
    spark.sql(s"CALL $cat.system.compact(`table` => 'db.evo_compact')")
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val files = FlsManifest.read(fs, root).get.map(_.rel)
    // every live file sits under the CURRENT spec's layout (d=...),
    // none under the old month dirs
    assert(files.nonEmpty && files.forall(_.startsWith("d=")), files)
    val disc = connector.FlsPartitioning.discover(Seq(dir),
      FlsManifest.statuses(fs, root, FlsManifest.read(fs, root).get)
        .map(_.getPath), conf)
    assert(disc.uniform && disc.keys == Seq("d"))
    // and the data survived the re-layout exactly
    val r = spark.sql(s"SELECT count(*) n, count(DISTINCT m) cm, " +
      s"count(DISTINCT d) cd, sum(id) s FROM $tbl").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (200L, 2L, 4L, (0L until 200).sum))
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE m = 'm1'")
      .collect()(0).getLong(0) == 100)
  }

  test("refusals: unknown column, every column, same spec, flat, unsanctioned append") {
    val tbl = s"$cat.db.evo_refuse"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 'a')")
    def call(spec: String) = spark.sql(
      s"CALL $cat.system.evolve_partition_spec(`table` => 'db.evo_refuse', " +
        s"partition_by => '$spec')")
    val e1 = intercept[Exception](call("nope"))
    assert(e1.getMessage.contains("not a column"))
    val e2 = intercept[Exception](call("id,dt"))
    assert(e2.getMessage.contains("every column"))
    val e3 = intercept[Exception](call("dt"))
    assert(e3.getMessage.contains("already partitioned"))
    val e4 = intercept[Exception](call(""))
    assert(e4.getMessage.contains("at least one"))
    // an append whose layout differs WITHOUT the evolution marker still
    // refuses loudly (the accidental-mixed-layout guard)
    val plainDir = s"$tmp/plain_part"
    spark.range(5).selectExpr("id", "CAST(id % 2 AS STRING) AS dt")
      .write.format("fls").mode("overwrite")
      .option("partition_by", "dt").save(plainDir)
    val e5 = intercept[Exception] {
      spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS v",
        "CAST(id % 2 AS STRING) AS dt")
        .write.format("fls").mode("append").option("partition_by", "v")
        .save(plainDir)
    }
    assert(e5.getMessage.contains("does not match"))
  }
}
