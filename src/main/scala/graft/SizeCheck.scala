package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: fls vs parquet size + scan wall time at a given sf. */
object SizeCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (tbl <- Seq("lineitem", "orders", "part", "documents")) {
      val pq = spark.read.parquet(s"$dir/$tbl.parquet")
      val out = s"/tmp/fls_size/${tbl}"
      pq.write.format("fls").mode("overwrite").save(out)
      def sizeOf(p: String): Long = {
        val f = new java.io.File(p)
        if (f.isFile) f.length else f.listFiles().map(x => sizeOf(x.getPath)).sum
      }
      val rawPq = sizeOf(s"$dir/$tbl.parquet")
      val rawFls = sizeOf(out)
      // warm read both, then time
      val fls = spark.read.format("fls").load(out)
      fls.count(); pq.count()
      def time(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      val tF = time(fls.selectExpr("count(*)", "sum(hash(*))").count())
      val tP = time(pq.selectExpr("count(*)", "sum(hash(*))").count())
      println(f"[size] $tbl%-10s parquet=${rawPq/1024}%7dKB fls=${rawFls/1024}%7dKB ratio=${rawFls.toDouble/rawPq}%.2f  scanAll: fls=$tF%.2fs pq=$tP%.2fs")
    }
    spark.stop()
  }
}
