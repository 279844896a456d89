package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the GlobalRowNumber operator: dense-rank sanity at a size
  * where two independently-sampled range exchanges visibly disagree
  * (the two-DataFrame-branch design this operator replaced ranked 10000
  * rows to a max of 9861 — column pruning broke exchange reuse, each
  * branch resampled its own bounds), plus the physical plan shape. */
object ProbeRank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("probe-rank")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, 10000, 1, 8)
      .selectExpr("pmod(id * 2654435761, 100003) AS k", "id AS payload")
    val ranked = graft.functions.DistributedRank.withRowNumber(df, Seq(col("k")), "rn")
    val n = ranked.count()
    val distinct = ranked.select("rn").distinct().count()
    val mx = ranked.agg(max("rn")).head.getLong(0)
    println(s"[probe] rows=$n distinctRanks=$distinct maxRank=$mx")
    val planStr = ranked.queryExecution.executedPlan.toString
    println("[probe] GlobalRowNumberExec=" + planStr.contains("GlobalRowNumber")
      + " rddRoundTrip=" + (planStr.contains("DeserializeToObject") || planStr.contains("Scan ExistingRDD")))
    println(planStr.linesIterator.take(20).mkString("\n"))
    spark.stop()
  }
}
