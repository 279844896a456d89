package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Selection-vector probe at 64×: mid-selectivity filters that zone
  * maps cannot prune (every row group spans the full value range) —
  * the case scan-side row filtering exists for. */
object SelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fls = spark.read.format("fls").load("/tmp/fls_scale/lineitem64x")
    val flsNoSel = spark.read.format("fls").option("filter_keep_ratio", "0.0")
      .load("/tmp/fls_scale/lineitem64x")
    val pq = spark.read.parquet("/tmp/fls_scale/lineitem64x_parquet")
    def time(name: String, reps: Int = 5)(f: => Unit): Unit = {
      f
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[sel] $name%-44s min=${ts.min}%.3f s med=${ts.sorted.apply(reps / 2)}%.3f s")
    }
    for ((nm, df) <- Seq(("fls", fls), ("fls-nosel", flsNoSel), ("pq", pq))) {
      // ~10% selectivity, uniform: zone maps useless, selection compacts
      time(s"$nm qty<=5 sum(extprice)")(
        df.filter(col("l_quantity") <= 5).agg(sum("l_extendedprice")).collect())
      // string-equality selectivity (~25%: one of 4 return/status combos)
      time(s"$nm returnflag=R sum(discount)")(
        df.filter(col("l_returnflag") === "R")
          .agg(sum("l_discount"), count(lit(1))).collect())
      // wide projection: 7 columns survive the filter — compaction
      // saves 6 columns' fills at 10% keep
      time(s"$nm qty<=5 wide 7-col sum")(
        df.filter(col("l_quantity") <= 5).agg(sum("l_extendedprice"),
          sum("l_discount"), sum("l_tax"), sum("l_orderkey"),
          sum("l_partkey"), sum("l_suppkey")).collect())
      // non-selective (98%): keep-ratio gate must avoid the gather
      time(s"$nm q1-shape filter 98%")(
        df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
          .agg(sum("l_quantity")).collect())
    }
    // correctness cross-check on the selective paths
    val a = fls.filter(col("l_quantity") <= 5).agg(sum("l_extendedprice"), count(lit(1))).collect()(0)
    val b = pq.filter(col("l_quantity") <= 5).agg(sum("l_extendedprice"), count(lit(1))).collect()(0)
    println(s"[sel] qty<=5: fls=$a pq=$b count_match=${a.getLong(1) == b.getLong(1)}")
    val c = fls.filter(col("l_returnflag") === "R").count()
    val d = pq.filter(col("l_returnflag") === "R").count()
    println(s"[sel] returnflag=R: fls=$c pq=$d match=${c == d}")
    spark.stop()
  }
}
