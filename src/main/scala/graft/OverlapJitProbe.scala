package graft

import org.apache.spark.sql.SparkSession

/** Magnitude probe for the q88 marathon transient's surviving
  * hypothesis: the hot bucketed-join stage executing WITHOUT compiled
  * code. The r13 run-2 sweep telemetry pinned the slow run to pure
  * executor CPU (7813 cpu-s, gc 6 s, spill 0, shuffle 118 MB — same
  * SortMergeJoin plan as the 7 s steady state), which only a per-row
  * evaluation-cost multiplier explains. Two mechanisms produce one:
  * Janino compile failure → interpreted Spark fallback, or HotSpot
  * declining/deferring JIT of the generated stage method (code-cache
  * churn in a ~150-query marathon). This probe measures what each
  * mode actually COSTS on the real 128× data, so the sweep's observed
  * 317 s can be matched against a mechanism instead of guessed at:
  *
  *   runMain graft.OverlapJitProbe <scaledDir> normal        ~7 s
  *   runMain graft.OverlapJitProbe <scaledDir> nowholestage  wholestage off,
  *       expression codegen still on (≈ hugeMethodLimit fallback)
  *   runMain graft.OverlapJitProbe <scaledDir> nocodegen     wholestage off +
  *       interpreted expressions (≈ Janino failure fallback)
  *
  * Each run prints total seconds plus Janino compile count and JIT
  * compilation-time deltas (the same counters the sweep now records
  * per query). */
object OverlapJitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x128")
    val mode = if (args.length > 1) args(1) else "normal"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    mode match {
      case "normal" => ()
      case "nowholestage" =>
        b.config("spark.sql.codegen.wholeStage", "false")
      case "nocodegen" =>
        b.config("spark.sql.codegen.wholeStage", "false")
          .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      case other => sys.error(s"unknown mode '$other'")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def jitMs: Long =
      java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
    def janinoCompiles: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount

    (1 to 2).foreach { i =>
      val (j0, c0) = (jitMs, janinoCompiles)
      val t0 = System.nanoTime()
      val n = graft.queries.Joins.q88AutoIntervalOverlap(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[jitprobe] mode=$mode run$i total ${secs}%8.1f s rows=$n " +
        f"janino_compiles=${janinoCompiles - c0} jit_ms=${jitMs - j0}")
    }
    spark.stop()
  }
}
