package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the write-side layout features actually buy at scale:
  * the SAME selective scans over the SAME rows in three physical
  * layouts — arrival order (plain), `cluster_by=l_partkey` (single-axis
  * range clustering), and 2-D Z-order over (l_partkey, l_suppkey) —
  * reporting wall time and the scan's own rowGroupsRead metric. Run
  * after ScaleSweep has generated /tmp/graft_scale/x<mult> (the probe
  * reuses its 77M-row lineitem at 128x).
  *
  * Usage: runMain graft.LayoutProbe [scaledDir] */
object LayoutProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_scale/x128")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // plain executedPlan (no AQE wrapper) so the probe can read the
      // scan's custom metrics off the leaf directly
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/tmp/graft_layout_probe"
    val src = spark.read.parquet(s"$srcDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"))

    def ensure(name: String)(write: DataFrame => Unit): String = {
      val out = s"$base/$name"
      val marker = new java.io.File(s"$out/_done_probe")
      if (!marker.exists()) {
        val t0 = System.nanoTime()
        write(src)
        marker.createNewFile()
        println(f"[layout] wrote $name in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      out
    }

    val plain = ensure("plain") {
      _.write.format("fls").mode("overwrite").save(s"$base/plain")
    }
    val clustered = ensure("clustered") {
      _.write.format("fls").mode("overwrite")
        .option("cluster_by", "l_partkey").save(s"$base/clustered")
    }
    val zorder = ensure("zorder") { d =>
      graft.functions.ZOrder.cluster(d, Seq("l_partkey", "l_suppkey"))
        .write.format("fls").mode("overwrite").save(s"$base/zorder")
    }

    // the two probe filters: a ~1.5% band on the clustered/leading axis
    // and a ~1.5% band on the SECOND axis (the one single-column
    // clustering cannot serve)
    def qPart(dir: String): DataFrame =
      spark.read.format("fls").load(dir)
        .filter(col("l_partkey") >= 100 && col("l_partkey") < 400)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    def qSupp(dir: String): DataFrame =
      spark.read.format("fls").load(dir)
        .filter(col("l_suppkey") >= 10 && col("l_suppkey") < 25)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

    def measure(label: String, df: => DataFrame): (Double, Long) = {
      var best = Double.MaxValue
      var groups = -1L
      (1 to 3).foreach { _ =>
        val d = df
        val t0 = System.nanoTime()
        d.collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        groups = d.queryExecution.executedPlan.collectLeaves().flatMap { p =>
          p.metrics.get("rowGroupsRead").map(_.value)
        }.headOption.getOrElse(-1L)
      }
      println(f"[layout] $label%-22s ${best}%8.3f s  rowGroupsRead=$groups")
      (best, groups)
    }

    def totalGroups(dir: String): Int = {
      val conf = spark.sessionState.newHadoopConf()
      graft.fls.FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf)
        .map { p =>
          val r = new graft.fls.FlsFileReader(p, conf)
          try r.table.rowGroups.length finally r.close()
        }.sum
    }

    println(s"[layout] total row groups: plain=${totalGroups(plain)} " +
      s"clustered=${totalGroups(clustered)} zorder=${totalGroups(zorder)}")
    val results = Seq(
      "plain/partkey" -> measure("plain/partkey", qPart(plain)),
      "clustered/partkey" -> measure("clustered/partkey", qPart(clustered)),
      "zorder/partkey" -> measure("zorder/partkey", qPart(zorder)),
      "plain/suppkey" -> measure("plain/suppkey", qSupp(plain)),
      "clustered/suppkey" -> measure("clustered/suppkey", qSupp(clustered)),
      "zorder/suppkey" -> measure("zorder/suppkey", qSupp(zorder)))
    val json = results.map { case (k, (s, g)) =>
      f""""$k":{"sec":$s%.3f,"rowGroupsRead":$g}"""
    }.mkString("{", ",", "}")
    println(s"[layout-json] $json")
    spark.stop()
  }
}
