package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why didn't size-adaptive dictionary vectors engage on the 64× scan?
  * Prints split row counts vs the auto threshold, and times Q1 at
  * explicit thresholds. */
object DictAutoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fls = spark.read.format("fls").load("/tmp/fls_scale/lineitem64x")
    // split shapes: rows per partition
    val perPart = fls.groupBy(spark_partition_id().as("pid")).count()
      .orderBy("pid").collect().map(_.getLong(1))
    println(s"[dap] splits=${perPart.length} " +
      s"rows min=${perPart.min} max=${perPart.max} " +
      s"belowThreshold=${perPart.count(_ < 512L * 1024)}")
    def q1(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1))).collect()
    // interleaved reps: mode order rotates so JIT/page-cache warmup
    // doesn't bias whichever frame is measured first
    val frames = Seq(
      "fls-auto" -> fls,
      "fls-dict" -> spark.read.format("fls")
        .option("string_dictionary", "true").load("/tmp/fls_scale/lineitem64x"),
      "fls-eager" -> spark.read.format("fls")
        .option("string_dictionary", "false").load("/tmp/fls_scale/lineitem64x"),
      "parquet" -> spark.read.parquet("/tmp/fls_scale/lineitem64x_parquet"))
    frames.foreach { case (_, df) => q1(df) } // warm all
    val reps = 9
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until reps; (nm, df) <- frames.drop(r % frames.length) ++ frames.take(r % frames.length)) {
      val t0 = System.nanoTime(); q1(df)
      times(nm) ::= (System.nanoTime() - t0) / 1e9
    }
    for ((nm, _) <- frames) {
      val ts = times(nm).sorted
      println(f"[dap] q1 $nm%-12s min=${ts.head}%.3f med=${ts(ts.length / 2)}%.3f s")
    }
    spark.stop()
  }
}
