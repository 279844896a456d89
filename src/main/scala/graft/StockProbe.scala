package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement: what do the optimizer rewrites actually buy? Runs
  * selected SparkEntry queries twice in ONE session — rules ON
  * (default) vs all three rule kill-switches OFF (stock Catalyst
  * planning; nested loops for range joins, single-partition sorts for
  * global windows) — and prints both times. A stock run is capped by
  * wall-clock observation only (no cancel), so pick queries/scales
  * accordingly.
  *
  * Usage: runMain graft.StockProbe <sfDir> q1,q2,...
  */
object StockProbe {
  private val Switches = Seq(
    "spark.graft.rangeJoin.enabled",
    "spark.graft.rangeFrames.enabled",
    "spark.graft.globalWindows.enabled")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(q: String): Double = {
      val t0 = System.nanoTime()
      // foreach, NOT count: count() lets ColumnPruning drop unused
      // window expressions entirely, timing a plan with no windows;
      // deserializing every row consumes every output column
      SparkEntry.queries(q)(spark, dir).foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    qs.foreach { q =>
      time(q) // warm both paths' inputs (page cache, codegen)
      val on = time(q)
      Switches.foreach(spark.conf.set(_, "false"))
      val off = try time(q) finally Switches.foreach(spark.conf.unset)
      println(f"[stockprobe] $q%-28s rules-on $on%8.2f s   stock $off%8.2f s   x${off / on}%.1f")
    }
    spark.stop()
  }
}
