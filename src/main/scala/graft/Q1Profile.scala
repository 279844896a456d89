package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Column-group attribution of the remaining 64× Q1 gap: times each
  * Q1 ingredient in isolation over identical physical layouts. */
object Q1Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fls = spark.read.format("fls").load("/tmp/fls_scale/lineitem64x")
    val flsDict = spark.read.format("fls").option("string_dictionary", "true")
      .load("/tmp/fls_scale/lineitem64x")
    val pq = spark.read.parquet("/tmp/fls_scale/lineitem64x_parquet")
    def time(name: String, reps: Int = 5)(f: => Unit): Unit = {
      f
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[q1p] $name%-40s min=${ts.min}%.3f s")
    }
    for ((nm, df) <- Seq(("fls", fls), ("fls-dict", flsDict), ("pq", pq))) {
      time(s"$nm ts-filter count only")(
        df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
          .count())
      time(s"$nm strings groupBy count")(
        df.groupBy("l_returnflag", "l_linestatus").count().collect())
      time(s"$nm doubles-only 2col sum")(
        df.agg(sum("l_quantity"), sum("l_extendedprice")).collect())
      time(s"$nm full q1")(
        df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1))).collect())
    }
    spark.stop()
  }
}
