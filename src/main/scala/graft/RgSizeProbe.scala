package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Row-group size vs the ~1.2× scan residue: Q1 and strings-groupBy
  * over the same 64× data at 64Ki (default), 256Ki, and 1Mi rows per
  * group, vs parquet. Bigger groups amortize per-group decode setup
  * (dict rebuild, segment reads, selection reset) at the cost of
  * coarser zone-map pruning — this probe quantifies the first half. */
object RgSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val frames = Seq(
      "fls-64k" -> spark.read.format("fls").load("/tmp/fls_scale/lineitem64x"),
      "fls-256k" -> spark.read.format("fls").load("/tmp/fls_scale/lineitem64x_rg262144"),
      "fls-1m" -> spark.read.format("fls").load("/tmp/fls_scale/lineitem64x_rg1048576"),
      "parquet" -> spark.read.parquet("/tmp/fls_scale/lineitem64x_parquet"))
    def q1(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1))).collect()
    def strs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag", "l_linestatus").count().collect()
    frames.foreach { case (_, df) => q1(df); strs(df) }
    val t = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until 9; (nm, df) <- frames.drop(r % frames.length) ++ frames.take(r % frames.length)) {
      var t0 = System.nanoTime(); q1(df)
      t(s"$nm q1") ::= (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); strs(df)
      t(s"$nm strs") ::= (System.nanoTime() - t0) / 1e9
    }
    for ((nm, _) <- frames; q <- Seq("q1", "strs")) {
      val ts = t(s"$nm $q").sorted
      println(f"[rgs] $nm%-10s $q%-5s min=${ts.head}%.3f med=${ts(ts.length / 2)}%.3f s")
    }
    spark.stop()
  }
}
