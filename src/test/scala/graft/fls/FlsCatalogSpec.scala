package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution through the [[graft.fls.connector.FlsCatalog]]
  * TableCatalog: CREATE / INSERT / ALTER ADD COLUMN / ALTER COLUMN TYPE
  * (widening) / RENAME / DROP, with old files reconciled per-file at
  * scan — added columns read as NULL from pre-ALTER files, widened
  * columns decode from the narrow physical type, renamed columns bind
  * through their name history. Locks the OLD-READER contract too: a
  * reader planned against a pre-ALTER metadata version keeps working. */
class FlsCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("fls-cat").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-catalog-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.flscat", classOf[graft.fls.connector.FlsCatalog].getName)
      .config("spark.sql.catalog.flscat.path", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE NAMESPACE flscat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ADD COLUMN: old files read NULL, new files carry values") {
    spark.sql("CREATE TABLE flscat.db.evo (id BIGINT, v INT)")
    spark.sql("INSERT INTO flscat.db.evo VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE flscat.db.evo ADD COLUMN tag STRING")
    spark.sql("INSERT INTO flscat.db.evo VALUES (3, 30, 'x'), (4, 40, 'y')")
    val rows = spark.sql(
      "SELECT id, v, tag FROM flscat.db.evo ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toSeq == Seq((1L, 10, null), (2L, 20, null), (3L, 30, "x"), (4L, 40, "y")))
    // filters on the added column work across old and new files
    assert(spark.sql("SELECT count(*) FROM flscat.db.evo WHERE tag IS NULL")
      .collect()(0).getLong(0) == 2)
    assert(spark.sql("SELECT id FROM flscat.db.evo WHERE tag = 'y'")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("ALTER COLUMN TYPE widens; old narrow files decode into the wide type") {
    spark.sql("CREATE TABLE flscat.db.widen (id BIGINT, n INT, f FLOAT)")
    spark.sql("INSERT INTO flscat.db.widen VALUES (1, 100, CAST(1.5 AS FLOAT))")
    spark.sql("ALTER TABLE flscat.db.widen ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE flscat.db.widen ALTER COLUMN f TYPE DOUBLE")
    spark.sql("INSERT INTO flscat.db.widen VALUES (2, 5000000000, 2.25)")
    val rows = spark.sql("SELECT id, n, f FROM flscat.db.widen ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 100L, 1.5), (2L, 5000000000L, 2.25)))
    // aggregation across mixed physical types
    assert(spark.sql("SELECT sum(n) FROM flscat.db.widen").collect()(0).getLong(0)
      == 5000000100L)
    // a NON-widening change is rejected as metadata-only impossible
    val e = intercept[Exception](
      spark.sql("ALTER TABLE flscat.db.widen ALTER COLUMN n TYPE INT"))
    assert(e.getMessage.contains("promotion") || e.getMessage.contains("widen"))
  }

  test("RENAME COLUMN binds old files through the name history") {
    spark.sql("CREATE TABLE flscat.db.ren (id BIGINT, score INT)")
    spark.sql("INSERT INTO flscat.db.ren VALUES (1, 7), (2, 9)")
    spark.sql("ALTER TABLE flscat.db.ren RENAME COLUMN score TO quality")
    // old files store 'score'; the scan serves it as 'quality'
    assert(spark.sql("SELECT quality FROM flscat.db.ren ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(7, 9))
    spark.sql("INSERT INTO flscat.db.ren VALUES (3, 11)")
    // chained rename: files now exist under BOTH prior names
    spark.sql("ALTER TABLE flscat.db.ren RENAME COLUMN quality TO q")
    assert(spark.sql("SELECT sum(q) FROM flscat.db.ren").collect()(0).getLong(0) == 27)
    // zone-map filters prune through the rename too
    assert(spark.sql("SELECT id FROM flscat.db.ren WHERE q > 8 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("DROP COLUMN is metadata-only and tombstones the name") {
    spark.sql("CREATE TABLE flscat.db.drop1 (id BIGINT, junk STRING, keep INT)")
    spark.sql("INSERT INTO flscat.db.drop1 VALUES (1, 'a', 5)")
    spark.sql("ALTER TABLE flscat.db.drop1 DROP COLUMN junk")
    val cols = spark.table("flscat.db.drop1").schema.fieldNames.toSeq
    assert(cols == Seq("id", "keep"))
    assert(spark.sql("SELECT id, keep FROM flscat.db.drop1").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 5)))
    // re-adding the dropped name must fail: old files still store it and
    // a name-bound scan would resurrect the old values into the new column
    val e = intercept[Exception](
      spark.sql("ALTER TABLE flscat.db.drop1 ADD COLUMN junk INT"))
    assert(e.getMessage.contains("dropped"))
  }

  test("old reader: a pre-ALTER schema still reads post-ALTER files") {
    spark.sql("CREATE TABLE flscat.db.oldr (id BIGINT, v INT)")
    spark.sql("INSERT INTO flscat.db.oldr VALUES (1, 10)")
    // capture the table location, then evolve and append
    val dir = s"$warehouse/db/oldr"
    spark.sql("ALTER TABLE flscat.db.oldr ADD COLUMN extra STRING")
    spark.sql("INSERT INTO flscat.db.oldr VALUES (2, 20, 'e')")
    // an old reader pinned to the ORIGINAL two-column schema (e.g. a
    // long-running job planned before the ALTER) reads both files: the
    // new file simply carries a column it never asks for
    val old = spark.read.format("fls")
      .schema("id BIGINT, v INT").load(dir)
    assert(old.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      == Seq((1L, 10), (2L, 20)))
    // and a fresh path-read picks up the DECLARED (evolved) schema from
    // the metadata log, not one footer's guess
    assert(spark.read.format("fls").load(dir).schema.fieldNames.toSeq
      == Seq("id", "v", "extra"))
  }

  test("catalog lifecycle: list, rename, drop, partitioned create") {
    spark.sql("CREATE TABLE flscat.db.lc (id BIGINT, dt DATE) PARTITIONED BY (dt)")
    spark.sql("INSERT INTO flscat.db.lc VALUES (1, DATE'2024-01-01'), (2, DATE'2024-02-01')")
    assert(spark.sql("SELECT count(*) FROM flscat.db.lc WHERE dt = DATE'2024-01-01'")
      .collect()(0).getLong(0) == 1)
    val tables = spark.sql("SHOW TABLES IN flscat.db").collect().map(_.getString(1)).toSet
    assert(tables.contains("lc"))
    spark.sql("ALTER TABLE flscat.db.lc RENAME TO flscat.db.lc2")
    assert(spark.sql("SELECT count(*) FROM flscat.db.lc2").collect()(0).getLong(0) == 2)
    spark.sql("DROP TABLE flscat.db.lc2")
    assert(!spark.sql("SHOW TABLES IN flscat.db").collect()
      .map(_.getString(1)).contains("lc2"))
  }

  test("table properties become default write options and survive ALTER") {
    spark.sql("CREATE TABLE flscat.db.props (id BIGINT) " +
      "TBLPROPERTIES ('row_group_size'='2048')")
    spark.sql("INSERT INTO flscat.db.props SELECT id FROM range(5000)")
    spark.sql("ALTER TABLE flscat.db.props SET TBLPROPERTIES ('k'='v')")
    assert(spark.sql("SELECT count(*) FROM flscat.db.props").collect()(0).getLong(0) == 5000)
    // row_group_size=2048 must have produced multiple row groups per file
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/db/props")
    val conf = spark.sessionState.newHadoopConf()
    val footers = FlsFooters.list(Seq(dir.toString), conf, None)
    assert(footers.flatMap(_.table.rowGroups).forall(_.nTuples <= 2048))
  }
}
