package graft

import org.apache.spark.sql.SparkSession

/** Measures the DML machinery at scale on a month-partitioned orders
  * table built from the ScaleSweep's 128x parquet (~19M rows, ~80
  * partitions): a NARROW update (one month, data-column condition)
  * must rewrite only that month's files — runtime group filtering at
  * work — while a table-wide update rewrites everything; a
  * partition-decided DELETE must be metadata-time regardless of size.
  *
  * Usage: runMain graft.DmlProbe [scaledDir] */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_scale/x128")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val dir = "/tmp/graft_dml_probe/orders"
    val marker = new java.io.File(s"$dir/_done_probe")
    if (!marker.exists()) {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$srcDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
          to_date(date_trunc("month", col("o_orderdate"))).as("dt"))
        .write.format("fls").mode("overwrite")
        .option("partition_by", "dt").save(dir)
      marker.createNewFile()
      println(f"[dml] built table in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    def files(): Set[String] =
      graft.fls.FlsFile.listDataFiles(root, conf).map(_.toString).toSet
    val total = spark.read.format("fls").load(dir).count()
    val before = files()
    println(s"[dml] rows=$total files=${before.size}")

    spark.sql("DROP TABLE IF EXISTS dml_probe")
    spark.sql(s"CREATE TABLE dml_probe (o_orderkey BIGINT, o_totalprice DOUBLE, " +
      s"o_orderpriority STRING, dt DATE) USING fls PARTITIONED BY (dt) " +
      s"LOCATION '$dir'")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[dml] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // narrow UPDATE: one month, data-column condition — group filtering
    // must confine the rewrite to that month's files
    timed("update one month") {
      spark.sql("UPDATE dml_probe SET o_orderpriority = 'RESTATED' " +
        "WHERE dt = DATE'1995-03-01' AND o_orderkey % 3 = 0")
    }
    val afterNarrow = files()
    println(s"[dml] narrow update: kept ${(before intersect afterNarrow).size} " +
      s"of ${before.size} files in place, wrote ${(afterNarrow -- before).size} new")

    // table-wide UPDATE: every file affected — the honest upper bound
    timed("update table-wide") {
      spark.sql("UPDATE dml_probe SET o_orderpriority = 'BULK' " +
        "WHERE o_orderkey % 1000 = 0")
    }

    // partition-decided DELETE: metadata-time at any size
    timed("retention delete (metadata)") {
      spark.sql("DELETE FROM dml_probe WHERE dt < DATE'1996-01-01'")
    }
    println(s"[dml] rows after=${spark.table("dml_probe").count()}")
    spark.sql("DROP TABLE dml_probe")
    spark.stop()
  }
}
