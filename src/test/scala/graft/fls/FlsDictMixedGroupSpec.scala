package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regression: with `string_dictionary=true`, a packed split reuses one
  * OnHeapColumnVector across row groups, and WritableColumnVector.reset()
  * does NOT clear an installed dictionary. A dict-encoded group followed
  * by a plain/FSST-encoded group for the same column must not serve the
  * previous group's dictionary (stale values). The writer picks encodings
  * per row group by cost, so a file whose first group is low-cardinality
  * (dict wins) and whose second is unique strings (FSST/plain wins)
  * exercises exactly the dict→plain transition inside one split. */
class FlsDictMixedGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-dictmix").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("fls-dict-mixed-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mixedFrame(n: Int) = {
    // rows [0,n): 5 distinct values → dictionary encoding wins;
    // rows [n,2n): unique long strings → FSST/plain wins
    spark.range(0, 2L * n, 1, 1).selectExpr(
      "id",
      s"""CASE WHEN id < $n THEN concat('common-', id % 5)
          ELSE concat('unique-string-', id, '-', id * 2654435761 % 1000003)
          END AS s""")
  }

  test("dict group then plain group in one packed split reads exact values") {
    // pack everything into one split so one reader serves both groups
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024 // = one row group per phase with row_group_size=1024
    val dir = s"$tmp/mixed"
    val df = mixedFrame(n)
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)

    // both row groups must land in ONE split so the reader reuses vectors
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    assert(back.rdd.getNumPartitions == 1,
      "precondition: the two row groups must pack into a single split")

    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2 * n)
    val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty,
      s"stale-dictionary corruption on ${bad.size} rows, first: ${bad.take(3)}")
  }

  test("plain group then dict group (reverse order) also exact") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/mixed-rev"
    val df = spark.range(0, 2L * n, 1, 1).selectExpr(
      "id",
      s"""CASE WHEN id >= $n THEN concat('common-', id % 5)
          ELSE concat('unique-string-', id, '-', id * 2654435761 % 1000003)
          END AS s""")
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty, s"mismatch on ${bad.size} rows, first: ${bad.take(3)}")
  }

  test("alternating dict/plain groups across a 4-group split are exact") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/mixed-alt"
    val df = spark.range(0, 4L * n, 1, 1).selectExpr(
      "id",
      s"""CASE WHEN (id DIV $n) % 2 = 0 THEN concat('common-', id % 3)
          ELSE concat('unique-string-', id, '-', id * 2654435761 % 1000003)
          END AS s""")
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty, s"mismatch on ${bad.size} rows, first: ${bad.take(3)}")
  }

  test("size-adaptive auto mode (threshold crossed) equals both forced modes") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/auto"
    val df = mixedFrame(n)
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // auto with a lowered threshold => the 2n-row split serves the
    // dictionary path; auto with a huge threshold => eager; both exact
    for (thr <- Seq("128", s"${10 * n}")) {
      val got = spark.read.format("fls")
        .option("string_dictionary_auto_rows", thr).load(dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
      assert(bad.isEmpty, s"auto(thr=$thr) mismatch: ${bad.take(3)}")
    }
  }

  /** The long/timestamp/double analog: dict-encoded numeric groups are
    * served through zero-copy dictionary vectors (FlsLongDictionary /
    * FlsDoubleDictionary), and a dict group followed by a plain group
    * for the same column in one packed split must not serve the stale
    * dictionary — same bug class as the string tests above. */
  test("numeric/timestamp dict→plain transitions in one packed split are exact") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/mixed-num"
    // group 0: 5 distinct SPREAD values (dict beats FFOR's wide bit
    // range); group 1: unique spread values (FFOR/plain beats an
    // n-entry dict)
    val df = spark.range(0, 2L * n, 1, 1).selectExpr(
      "id",
      s"CASE WHEN id < $n THEN (id % 5) * 1234567890123 ELSE id * 2654435761 END AS l",
      s"""CASE WHEN id < $n THEN timestamp_micros((id % 5) * 31557600000000)
          ELSE timestamp_micros(id * 987654321) END AS ts""",
      s"CASE WHEN id < $n THEN (id % 5) * 1.5e30 ELSE id * 1.11e30 END AS d")
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)

    // non-vacuous: the writer must have picked DICT for group 0 and
    // something else for group 1 on each column
    val conf = spark.sessionState.newHadoopConf()
    val file = graft.fls.FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf).head
    val r = new FlsFileReader(file, conf)
    try {
      assert(r.table.rowGroups.length == 2)
      for (c <- Seq("l", "ts", "d")) {
        val ci = r.table.columns.indexWhere(_.name == c)
        assert(r.table.rowGroups(0).segments(ci).encoding == Format.Enc.DICT,
          s"$c group 0 should dict-encode, got ${r.table.rowGroups(0).segments(ci).encoding}")
        assert(r.table.rowGroups(1).segments(ci).encoding != Format.Enc.DICT,
          s"$c group 1 must NOT dict-encode or the transition isn't exercised")
      }
    } finally r.close()

    val key = (row: org.apache.spark.sql.Row) => {
      // getTime alone is millis — group-1 values are NOT ms-aligned, so
      // include getNanos or sub-ms dictionary corruption would slip by
      val ts = row.getTimestamp(2)
      (row.getLong(0), (row.getLong(1), ts.getTime, ts.getNanos, row.getDouble(3)))
    }
    val exp = df.collect().map(key).toMap
    for (mode <- Seq("true", "false")) {
      val got = spark.read.format("fls")
        .option("string_dictionary", mode).load(dir)
        .collect().map(key).toMap
      assert(got.size == 2 * n)
      val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
      assert(bad.isEmpty,
        s"dict_vectors=$mode: stale-dictionary corruption on ${bad.size} rows, " +
          s"first: ${bad.take(3)}")
    }
  }

  test("pushed filters evaluate correctly over numeric dictionary vectors") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/mixed-num-filter"
    val df = spark.range(0, 2L * n, 1, 1).selectExpr(
      "id",
      s"CASE WHEN id < $n THEN (id % 5) * 1234567890123 ELSE id * 2654435761 END AS l",
      s"CASE WHEN id < $n THEN (id % 5) * 1.5e30 ELSE id * 1.11e30 END AS d")
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    // equality, range, and IN over the dict-coded long domain; range
    // over the dict-coded double domain — each against the DataFrame
    for (cond <- Seq(
        s"l = ${2L * 1234567890123L}",
        s"l >= ${3L * 1234567890123L}",
        s"l IN (0, ${1234567890123L}, ${4L * 1234567890123L})",
        "d > 2.9e30",
        "d = 0.0")) {
      val expIds = df.filter(cond).select("id").collect().map(_.getLong(0)).sorted
      val gotIds = back.filter(cond).select("id").collect().map(_.getLong(0)).sorted
      assert(gotIds.toSeq == expIds.toSeq, s"filter [$cond] diverged")
    }
  }
}
