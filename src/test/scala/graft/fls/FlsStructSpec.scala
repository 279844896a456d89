package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** STRUCT<scalars> materialization: a struct field flattens into a
  * zero-byte parent marker plus dotted child columns in the footer —
  * children are ordinary columns, so encodings, stats, zone maps, and
  * MCC apply to them unchanged — and reassembles into one StructField
  * on read, with nested column pruning (unrequested children never
  * decode). */
class FlsStructSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-struct-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-struct-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sample(n: Int): DataFrame =
    spark.range(0, n).toDF("id").selectExpr(
      "id",
      """named_struct(
           'width', CAST(id % 7 AS INT),
           'score', CAST(id AS DOUBLE) / 3.0,
           'kind', concat('k', id % 5),
           'flag', id % 2 = 0,
           'at', timestamp_micros(id * 1000000)
         ) AS meta""",
      "concat('body-', id) AS body")

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"datasets differ")
  }

  test("struct of mixed scalars round-trips across row groups") {
    val df = sample(10000)
    val dir = s"$tmp/rt"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 2048).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    // read schema reassembles the struct with non-null fields
    val meta = back.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("width", "score", "kind", "flag", "at"))
    assert(meta.fields.forall(!_.nullable))
    assertSame(df, back)
    assert(back.rdd.getNumPartitions == 5) // 5 row groups, tiny → 1 rg/split
  }

  test("footer carries the parent marker + dotted children; children keep stats") {
    val dir = s"$tmp/rt"
    sample(10000).coalesce(1).write.format("fls")
      .option("row_group_size", 2048).mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val file = FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf).head
    val r = new FlsFileReader(file, conf)
    try {
      val names = r.table.columns.map(_.name).toSeq
      assert(names == Seq("id", "meta", "meta.width", "meta.score", "meta.kind",
        "meta.flag", "meta.at", "body"))
      val metaIdx = names.indexOf("meta")
      assert(r.table.columns(metaIdx).colType ==
        Format.ColumnType(Format.TypeTag.STRUCT, 5, 0))
      r.table.rowGroups.foreach { rg =>
        assert(rg.segments(metaIdx).length == 0, "parent segment must be zero bytes")
        // numeric child carries ordinary zone-map stats
        assert(rg.segments(names.indexOf("meta.width")).hasStats)
      }
    } finally r.close()
  }

  test("projecting one struct field decodes only that child (plus parent plumbing)") {
    val dir = s"$tmp/rt"
    sample(10000).coalesce(1).write.format("fls")
      .option("row_group_size", 2048).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    val got = back.select(col("meta.width")).agg(sum("width")).collect()(0).getLong(0)
    assert(got == (0 until 10000).map(_ % 7).sum)
    // whole-struct predicates work too
    assert(back.filter(col("meta.kind") === "k3").count() == 2000)
    assert(back.filter(col("meta.flag")).count() == 5000)
  }

  test("NULL struct and NULL struct field are rejected") {
    val sp = spark; import sp.implicits._
    val nullStruct = spark.range(0, 10).toDF("id")
      .selectExpr("id", "IF(id = 5, NULL, named_struct('a', id)) AS s")
    val e1 = intercept[Exception] {
      nullStruct.write.format("fls").mode("overwrite").save(s"$tmp/ns")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e1).contains("NULL"))
    val nullField = spark.range(0, 10).toDF("id")
      .selectExpr("id", "named_struct('a', IF(id = 5, NULL, id)) AS s")
    val e2 = intercept[Exception] {
      nullField.write.format("fls").mode("overwrite").save(s"$tmp/nf")
    }
    assert(msgs(e2).contains("struct field"))
  }

  test("nested struct / struct-of-decimal are rejected with clear errors") {
    val inner = spark.range(0, 5).toDF("id")
      .selectExpr("id", "named_struct('x', named_struct('y', id)) AS s")
    val e1 = intercept[Exception] {
      inner.write.format("fls").mode("overwrite").save(s"$tmp/nested")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e1).contains("one level"))
    val dec = spark.range(0, 5).toDF("id")
      .selectExpr("id", "named_struct('d', CAST(id AS DECIMAL(10,2))) AS s")
    val e2 = intercept[Exception] {
      dec.write.format("fls").mode("overwrite").save(s"$tmp/dec")
    }
    assert(msgs(e2).contains("decimal"))
  }

  test("struct composes with partitioned writes and the manifest commit") {
    val dir = s"$tmp/part_man"
    sample(300)
      .withColumn("p", (col("id") % 3).cast("string"))
      .repartition(col("p"))
      .write.format("fls").mode("overwrite")
      .option("partition_by", "p").option("commit_mode", "manifest").save(dir)
    val back = spark.read.format("fls").load(dir)
    assert(back.count() == 300)
    assert(back.filter(col("p") === "1")
      .agg(sum(col("meta.width"))).collect()(0).getLong(0) ==
      (0 until 300).filter(_ % 3 == 1).map(_ % 7).sum)
  }

  test("zone maps prune on dotted struct-child filters") {
    val dir = s"$tmp/prune"
    // meta.width ascends with id → tight per-row-group child stats
    spark.range(0, 8192).toDF("id")
      .selectExpr("id", "named_struct('width', id, 'kind', concat('k', id % 5)) AS meta")
      .orderBy("id").coalesce(1)
      .write.format("fls").option("row_group_size", 1024).mode("overwrite").save(dir)
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.fls.connector.{FlsDataSource, FlsScanBuilder}
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val opts = new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
      val schema = new FlsDataSource().inferSchema(opts)
      val b = new FlsScanBuilder(schema, opts)
      b.pushFilters(filters.toArray)
      spark.conf.set("spark.sql.files.openCostInBytes", "134217728") // 1 rg/split
      try b.build().toBatch.planInputPartitions().length
      finally spark.conf.unset("spark.sql.files.openCostInBytes")
    }
    assert(planned() == 8)
    // struct children are ordinary footer columns: a filter addressed
    // by the dotted name prunes from their stats
    assert(planned(org.apache.spark.sql.sources.LessThan("meta.width", 1024L)) == 1)
    assert(planned(org.apache.spark.sql.sources.EqualTo("meta.width", 5000L)) == 1)
  }

  test("struct columns work through pure-SQL DDL") {
    val dir = s"$tmp/sql_ddl"
    spark.sql("DROP TABLE IF EXISTS fls_struct_t")
    spark.sql(
      s"""CREATE TABLE fls_struct_t
         (id BIGINT, meta STRUCT<width: BIGINT, kind: STRING>)
         USING fls LOCATION '$dir'""")
    spark.sql(
      """INSERT INTO fls_struct_t
         SELECT id, named_struct('width', id * 2, 'kind', concat('k', id % 3))
         FROM range(0, 100)""")
    assert(spark.sql("SELECT sum(meta.width) FROM fls_struct_t")
      .collect()(0).getLong(0) == (0L until 100L).map(_ * 2).sum)
    assert(spark.sql("SELECT count(*) FROM fls_struct_t WHERE meta.kind = 'k1'")
      .collect()(0).getLong(0) == 33)
    spark.sql("DROP TABLE fls_struct_t")
  }

  test("MCC EQUAL fires on duplicated struct children") {
    val dir = s"$tmp/mcc"
    spark.range(0, 2048).toDF("id")
      .selectExpr("id", "named_struct('a', id, 'b', id) AS s")
      .coalesce(1).write.format("fls").mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val file = FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf).head
    val r = new FlsFileReader(file, conf)
    try {
      val names = r.table.columns.map(_.name).toSeq
      val bIdx = names.indexOf("s.b")
      assert(r.table.rowGroups.head.segments(bIdx).encoding == Format.Enc.EQUAL,
        "duplicate struct children must share one encoded segment")
    } finally r.close()
    val back = spark.read.format("fls").load(dir)
    assert(back.agg(sum(col("s.b"))).collect()(0).getLong(0) == 2047L * 2048 / 2)
  }

  test("union_by_name merges DRIFTED struct fields; missing children read NULL") {
    // file 1: meta = {a INT, b STRING}; file 2: meta = {a BIGINT, c DOUBLE}
    // merged: meta = {a BIGINT, b STRING (nullable), c DOUBLE (nullable)}
    val d1 = s"$tmp/drift1"
    val d2 = s"$tmp/drift2"
    spark.range(0, 4).selectExpr("id",
      "named_struct('a', CAST(id AS INT), 'b', concat('s', id)) AS meta")
      .write.format("fls").mode("overwrite").save(d1)
    spark.range(4, 8).selectExpr("id",
      "named_struct('a', CAST(id * 10 AS BIGINT), 'c', CAST(id AS DOUBLE)) AS meta")
      .write.format("fls").mode("overwrite").save(d2)
    val df = spark.read.format("fls").option("union_by_name", "true").load(d1, d2)
    val meta = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(meta("a").dataType == org.apache.spark.sql.types.LongType, "a promotes INT->BIGINT")
    assert(meta("b").nullable && meta("c").nullable, "drifted children are nullable")
    val rows = df.selectExpr("id", "meta.a", "meta.b", "meta.c").orderBy("id").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L, 40L, 50L, 60L, 70L))
    assert(rows.take(4).map(_.getString(2)).toSeq == Seq("s0", "s1", "s2", "s3"))
    assert(rows.drop(4).forall(_.isNullAt(2)), "file-2 rows read NULL for b")
    assert(rows.take(4).forall(_.isNullAt(3)), "file-1 rows read NULL for c")
    assert(rows.drop(4).map(_.getDouble(3)).toSeq == Seq(4.0, 5.0, 6.0, 7.0))
    // aggregate over the merged struct field across both generations
    assert(df.agg(sum(col("meta.a"))).collect()(0).getLong(0) == 6L + 220L)
    // struct-vs-scalar drift for one name stays a loud error
    val d3 = s"$tmp/drift3"
    spark.range(0, 2).selectExpr("id", "CAST(id AS STRING) AS meta")
      .write.format("fls").mode("overwrite").save(d3)
    val e = intercept[Exception](
      spark.read.format("fls").option("union_by_name", "true").load(d1, d3).count())
    assert(e.getMessage.contains("STRUCT"))
  }
}
