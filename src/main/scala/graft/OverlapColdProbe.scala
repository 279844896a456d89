package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Localizes the q87/q88 interval-overlap COLD transient: at 128× the
  * first overlap query of a session measures ~350 s while an identical
  * re-run in the same JVM takes ~6 s (seen in r11 on q87 and in r12 on
  * q88 — it lands on whichever family member runs first). Same data,
  * same plan, same work — so the delta must be environmental. This
  * probe runs the q88 shape twice in one fresh JVM with a stage
  * listener dumping per-stage wall/executor-cpu/GC/spill/shuffle
  * totals, which names the guilty stage and resource.
  *
  * Usage: runMain graft.OverlapColdProbe [scaledDir] */
object OverlapColdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x128")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var stages = List.empty[(Int, String, Long, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages ::= ((i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, m.memoryBytesSpilled + m.diskBytesSpilled,
          m.shuffleWriteMetrics.bytesWritten))
      }
    })

    def runOnce(label: String): Unit = {
      stages = Nil
      val t0 = System.nanoTime()
      val n = graft.queries.Joins.q88AutoIntervalOverlap(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label total ${secs}%8.1f s rows=$n")
      println("[probe]  stage  wall_s  run_s  cpu_s  gc_s  spill_mb  shufw_mb  name")
      stages.reverse.foreach { case (id, name, wall, run, cpu, gc, spill, shw) =>
        println(f"[probe]  $id%5d ${wall / 1e3}%7.1f ${run / 1e3}%6.1f " +
          f"${cpu / 1e3}%6.1f ${gc / 1e3}%5.1f ${spill / 1e6}%9.1f " +
          f"${shw / 1e6}%9.1f  $name")
      }
    }

    if (args.length > 1 && args(1) == "pressure") {
      // reproduce the SWEEP's session context: the dedup family's
      // persisted frames (128× shingled corpus + groups + signatures,
      // MEMORY_AND_DISK) filling the unified pool before the join runs
      val t0 = System.nanoTime()
      graft.queries.Dedup.probeGroups(spark, dir).count()
      graft.queries.Dedup.q22MinhashLsh(spark, dir).count()
      println(f"[probe] cache-pressure built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    runOnce("run1-cold")
    runOnce("run2-warm")
    spark.stop()
  }
}
