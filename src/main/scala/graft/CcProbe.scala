package graft
import org.apache.spark.sql.SparkSession
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.queries.Graph.q70DedupComponents(spark, "/root/testdata/sf0.1").count()
    println(s"[ccprobe] q70 rounds=${graft.queries.Graph.lastRounds} t=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    graft.queries.Graph.q71NearDupPurge(spark, "/root/testdata/sf0.1").count()
    println(s"[ccprobe] q71 rounds=${graft.queries.Graph.lastRounds} t=${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}
