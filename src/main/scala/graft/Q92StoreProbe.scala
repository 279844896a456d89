package graft

import org.apache.spark.sql.SparkSession

/** r20 probe: q92's symmetric-hash state under the two built-in state
  * store providers. The 128× sweep pins q92 at ~305-456 s with ~11-14 s
  * of GC — state is the cost center — so the one state-store-level idea
  * left (RocksDB, off-heap) gets a measurement instead of a guess.
  * Usage: runMain graft.Q92StoreProbe [dir] [provider|both]
  * (provider: hdfs | rocksdb | both; dir defaults to the 128× copy). */
object Q92StoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x128"
    val which = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .filter { case (n, _) => which == "both" || which == n }
    providers.foreach { case (name, cls) =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      val t0 = System.nanoTime()
      val n = graft.queries.Streaming.q92StreamStreamRangeJoin(spark, dir).count()
      println(f"[q92store] $name%-8s ${(System.nanoTime() - t0) / 1e9}%8.1f s (rows=$n)")
    }
    spark.stop()
  }
}
