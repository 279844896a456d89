package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val big = (0 until mult).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
      .reduce(_ union _)
    val dir = s"/tmp/fls_scale/lineitem${mult}x"
    val t0 = System.nanoTime()
    big.repartition(32).write.format("fls").mode("overwrite").save(dir)
    println(f"[scale] write ${mult}x: ${(System.nanoTime()-t0)/1e9}%.1f s")
    // parquet at the SAME physical layout (not a re-read of one file
    // unioned N times — that would hand parquet an unfair cache win)
    val pdir = s"/tmp/fls_scale/lineitem${mult}x_parquet"
    big.repartition(32).write.mode("overwrite").parquet(pdir)
    val fls = spark.read.format("fls").load(dir)
    val pq = spark.read.parquet(pdir)
    println(s"[scale] rows=${fls.count()} partitions=${fls.rdd.getNumPartitions}")
    def q1(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1)))
    q1(fls).collect() // warm
    q1(pq).collect()
    var t = System.nanoTime()
    q1(fls).collect()
    println(f"[scale] Q1 over fls ${mult}x: ${(System.nanoTime()-t)/1e9}%.2f s")
    t = System.nanoTime()
    q1(pq).collect()
    println(f"[scale] Q1 over parquet ${mult}x: ${(System.nanoTime()-t)/1e9}%.2f s")
    // filter pushdown at scale: zone-map prune on orderkey
    t = System.nanoTime()
    val n = fls.filter(col("l_orderkey") >= (mult - 1) * 10000000L).count()
    println(f"[scale] selective filter fls rows=$n: ${(System.nanoTime()-t)/1e9}%.2f s")
    t = System.nanoTime()
    val n2 = pq.filter(col("l_orderkey") >= (mult - 1) * 10000000L).count()
    println(f"[scale] selective filter parquet rows=$n2: ${(System.nanoTime()-t)/1e9}%.2f s")
    spark.stop()
  }
}
