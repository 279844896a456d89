package graft
import org.apache.spark.sql.SparkSession

/** Times `collect()` (not `count()`) on selected gate queries.
  *
  * Bench and ScaleSweep time `df.count()`, and `count()` RE-OPTIMIZES
  * from the logical plan: ColumnPruning strips the aggregate columns
  * first, so an interval-agg query times the grouping-only sweep and
  * the SUM channels (in r20, the decimal limb machinery) never run in
  * a perf harness. This probe materializes the full rows — the numbers
  * that land in results/ for the sum-channel queries come from here.
  *
  * Usage: runMain graft.CollectProbe <dir> <q1,q2,...> [reps=2]
  * Env: SPARK_GRAFT_CPUS (default 32). Prints one JSON line
  * {"dir":..., "queries":{name: bestSec}} and mirrors it to
  * SPARK_GRAFT_PROBE_OUT if set.
  */
object CollectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = names.map { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, dir).collect() // warm
      val best = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      q -> best
    }
    spark.stop()
    val json = times
      .map { case (q, t) => s""""$q": ${f"$t%.3f"}""" }
      .mkString(s"""{"dir": "$dir", "queries": {""", ", ", "}}")
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(json)
  }
}
