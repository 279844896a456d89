package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/fls_size/lineitem"
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .write.format("fls").mode("overwrite").save(dir)
    val fls = spark.read.format("fls").load(dir)
    val pq = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(name: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val ts = (0 until reps).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"[prof] $name%-40s min=${ts.min}%.3f s")
    }
    // wide low-cardinality strings (dict-encoded): part brand/type/container-ish
    val pdir = "/tmp/fls_size/part"
    spark.read.parquet("/root/testdata/sf0.1/part.parquet")
      .write.format("fls").mode("overwrite").save(pdir)
    val flsPart = spark.read.format("fls").load(pdir)
    val pqPart = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
    for ((nm, df) <- Seq(("fls", flsPart), ("pq", pqPart))) {
      time(s"$nm part wide strings (brand+type)")(
        df.selectExpr("sum(length(p_brand) + length(p_type))").collect())
      time(s"$nm part group by type")(df.groupBy("p_type").count().collect())
    }
    for ((nm, df) <- Seq(("fls", fls), ("pq", pq))) {
      time(s"$nm count()")(df.count())
      time(s"$nm strings only (2 cols)")(df.selectExpr("sum(length(l_returnflag) + length(l_linestatus))").collect())
      time(s"$nm strings group (returnflag)")(df.groupBy("l_returnflag").count().collect())
      time(s"$nm doubles only (4 cols)")(df.selectExpr("sum(l_quantity + l_extendedprice + l_discount + l_tax)").collect())
      time(s"$nm longs only (3 cols)")(df.selectExpr("sum(l_orderkey + l_partkey + l_suppkey)").collect())
      time(s"$nm timestamp col")(df.selectExpr("max(l_shipdate)").collect())
      time(s"$nm all cols hash")(df.selectExpr("sum(hash(*))").collect())
    }
    spark.stop()
  }
}
