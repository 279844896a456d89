package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val big = (0 until 16).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
      .reduce(_ union _)
    val dir = "/tmp/fls_scale/lineitem16x"
    val t0 = System.nanoTime()
    big.repartition(32).write.format("fls").mode("overwrite").save(dir)
    println(f"[scale] write 16x (9.6M rows): ${(System.nanoTime()-t0)/1e9}%.1f s")
    val fls = spark.read.format("fls").load(dir)
    println(s"[scale] rows=${fls.count()} partitions=${fls.rdd.getNumPartitions}")
    def q1(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1)))
    q1(fls).collect() // warm
    var t = System.nanoTime()
    q1(fls).collect()
    println(f"[scale] Q1 over fls 16x: ${(System.nanoTime()-t)/1e9}%.2f s")
    t = System.nanoTime()
    q1(big).collect()
    println(f"[scale] Q1 over parquet-union 16x: ${(System.nanoTime()-t)/1e9}%.2f s")
    // filter pushdown at scale: zone-map prune on orderkey
    t = System.nanoTime()
    val n = fls.filter(col("l_orderkey") >= 150000000L).count()
    println(f"[scale] selective filter rows=$n: ${(System.nanoTime()-t)/1e9}%.2f s")
    spark.stop()
  }
}
