package graft

import org.apache.spark.sql.SparkSession

/** Throwaway repro driver for row-level operation planning. */
object RlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/rl_probe_tbl"
    (1 to 300).map(i => (i.toLong, s"old-$i", (i % 3).toString))
      .toDF("id", "body", "k")
      .write.format("fls").mode("overwrite").option("partition_by", "k").save(dir)
    spark.sql("DROP TABLE IF EXISTS rl_probe")
    spark.sql(s"CREATE TABLE rl_probe (id BIGINT, body STRING, k STRING) " +
      s"USING fls PARTITIONED BY (k) LOCATION '$dir'")
    try {
      val upd = spark.sql("UPDATE rl_probe SET body = 'x' WHERE id % 10 = 0")
      println("[rlprobe] plan:\n" + upd.queryExecution.executedPlan.toString.take(3000))
      println("[rlprobe] UPDATE OK rows=" +
        spark.table("rl_probe").filter($"body" === "x").count())
      println("[rlprobe] total=" + spark.table("rl_probe").count())
      println("[rlprobe] files=" + graft.fls.FlsFile.listDataFiles(
        new org.apache.hadoop.fs.Path(dir),
        spark.sessionState.newHadoopConf()).mkString("\n  "))
    } catch {
      case e: Throwable =>
        var t: Throwable = e
        while (t != null) { t.printStackTrace(); t = t.getCause }
    }
    spark.sql("DROP TABLE rl_probe")
    spark.stop()
  }
}
