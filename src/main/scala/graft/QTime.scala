package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time a SUBSET of SparkEntry queries with the exact Bench
  * methodology (warm pre-flight + 3 timed passes, min per query) so a
  * single optimization can be measured in isolation without the full
  * 131-query run. Usage: runMain graft.QTime <substr> [<substr> ...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val subset = SparkEntry.queries.filter { case (name, _) =>
      args.isEmpty || args.exists(name.contains)
    }
    val (times, errors) = Harness.benchAll(spark, subset, sfDir)
    spark.stop()
    println(Harness.benchJson(times, errors, sfDir))
    System.out.flush()
    if (errors.nonEmpty) sys.exit(1)
  }
}
