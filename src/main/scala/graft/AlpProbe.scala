package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ALP double decode path against parquet at equal 64×
  * physical layout: doubles-only aggregate (pure decode) and TPC-H Q1
  * (decode + filter + agg). Pass `rewrite` to regenerate the fls copy
  * after a codec change. */
object AlpProbe {
  def main(args: Array[String]): Unit = {
    val rewrite = args.contains("rewrite")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/fls_scale/lineitem64x"
    val pdir = "/tmp/fls_scale/lineitem64x_parquet"
    if (rewrite) {
      val t0 = System.nanoTime()
      spark.read.parquet(pdir).repartition(32)
        .write.format("fls").mode("overwrite").save(dir)
      println(f"[alp] rewrite 64x: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val fls = spark.read.format("fls").load(dir)
    val pq = spark.read.parquet(pdir)
    def time(name: String, reps: Int = 5)(f: => Unit): Unit = {
      f // warm
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[alp] $name%-36s min=${ts.min}%.3f s med=${ts.sorted.apply(reps / 2)}%.3f s")
    }
    for ((nm, df) <- Seq(("fls", fls), ("pq", pq))) {
      time(s"$nm doubles only (4 cols)")(
        df.selectExpr("sum(l_quantity + l_extendedprice + l_discount + l_tax)").collect())
      time(s"$nm tpch q1")(
        df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1))).collect())
    }
    // decode correctness cross-check at scale: identical sums both sides
    val fs = fls.selectExpr("sum(l_quantity)", "sum(l_extendedprice)").collect()(0)
    val ps = pq.selectExpr("sum(l_quantity)", "sum(l_extendedprice)").collect()(0)
    println(s"[alp] sums fls=$fs pq=$ps match=${fs == ps}")
    spark.stop()
  }
}
