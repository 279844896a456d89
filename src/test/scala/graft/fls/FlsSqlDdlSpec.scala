package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pure-SQL DDL/DML surface over the fls TableProvider: a user who never
  * touches the DataFrame API can CREATE TABLE ... USING fls, INSERT
  * INTO/OVERWRITE, CTAS, and SELECT — Spark's session catalog resolves
  * the provider through DataSourceRegister ("fls") and routes reads and
  * writes through the same DSv2 scan/write paths the load()/save() API
  * uses (so commit protocol, zone maps, pushdown all apply unchanged). */
class FlsSqlDdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-sql-ddl-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CREATE TABLE USING fls + INSERT INTO + SELECT round-trips, pure SQL") {
    val dir = Files.createTempDirectory("fls-sql-ddl").toString
    spark.sql("DROP TABLE IF EXISTS fls_sql_t")
    spark.sql(s"CREATE TABLE fls_sql_t (v BIGINT, s STRING) USING fls LOCATION '$dir'")
    spark.sql("INSERT INTO fls_sql_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO fls_sql_t SELECT id, CAST(id AS STRING) FROM range(3, 6)")
    assert(spark.sql("SELECT count(*) FROM fls_sql_t").collect()(0).getLong(0) == 5)
    assert(spark.sql("SELECT v FROM fls_sql_t WHERE s = 'b'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // the location is a plain fls table for the DataFrame API too
    assert(spark.read.format("fls").load(dir).count() == 5)
    // INSERT OVERWRITE truncates through the same commit protocol
    spark.sql("INSERT OVERWRITE fls_sql_t VALUES (9, 'z')")
    assert(spark.sql("SELECT v, s FROM fls_sql_t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "z")))
    spark.sql("DROP TABLE fls_sql_t")
  }

  test("CTAS: CREATE TABLE ... USING fls AS SELECT") {
    val dir = Files.createTempDirectory("fls-sql-ctas").toString
    spark.sql("DROP TABLE IF EXISTS fls_sql_ctas")
    spark.sql(
      s"""CREATE TABLE fls_sql_ctas USING fls LOCATION '$dir'
         AS SELECT id AS v, id * 2 AS dbl FROM range(0, 100)""")
    assert(spark.sql("SELECT sum(dbl) FROM fls_sql_ctas").collect()(0).getLong(0)
      == (0L until 100L).map(_ * 2).sum)
    spark.sql("DROP TABLE fls_sql_ctas")
  }

  test("CREATE TABLE OPTIONS route writer options (manifest commit mode)") {
    val dir = Files.createTempDirectory("fls-sql-opts").toString
    spark.sql("DROP TABLE IF EXISTS fls_sql_opt")
    spark.sql(
      s"""CREATE TABLE fls_sql_opt (v BIGINT) USING fls
         OPTIONS (commit_mode 'manifest') LOCATION '$dir'""")
    spark.sql("INSERT INTO fls_sql_opt SELECT id FROM range(0, 50)")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(FlsManifest.read(fs, p).exists(_.nonEmpty),
      "OPTIONS(commit_mode 'manifest') must reach the write path")
    assert(spark.sql("SELECT count(*) FROM fls_sql_opt").collect()(0).getLong(0) == 50)
    spark.sql("DROP TABLE fls_sql_opt")
  }

  test("SQL reads hit the same pushdown surface (filter prune plans fewer partitions)") {
    val dir = Files.createTempDirectory("fls-sql-push").toString
    spark.sql("DROP TABLE IF EXISTS fls_sql_push")
    spark.sql(s"CREATE TABLE fls_sql_push (v BIGINT) USING fls LOCATION '$dir'")
    // sorted single-task write → tight zone maps per row group
    spark.range(0, 16384).createOrReplaceTempView("src_push")
    spark.sql(
      """INSERT INTO fls_sql_push
         SELECT id FROM src_push ORDER BY id""")
    val all = spark.sql("SELECT * FROM fls_sql_push")
    val pruned = spark.sql("SELECT * FROM fls_sql_push WHERE v < 100")
    assert(pruned.rdd.getNumPartitions < all.rdd.getNumPartitions ||
      all.rdd.getNumPartitions == 1,
      s"zone-map pruning must reach SQL scans: ${pruned.rdd.getNumPartitions} vs ${all.rdd.getNumPartitions}")
    assert(pruned.count() == 100)
    spark.sql("DROP TABLE fls_sql_push")
  }
}
