package graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.fls._

/** One-off diagnosis for the r19 sweep finding: the freshly rebuilt
  * x128 fls lineitem reads ~4.5x slower than r18's (stale-cached)
  * copy while sf0.1 parity is 0.96x — dump the rebuilt table's
  * row-group/encoding layout and time the q15 scan against parquet
  * at the same scale. */
object SweepScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      "/tmp/graft_fls_cache_v4/_tmp_graft_scale_x128_lineitem")
    val pqDir = args.lift(1).getOrElse("/tmp/graft_scale/x128/lineitem.parquet")
    val conf = new org.apache.hadoop.conf.Configuration()
    val entry = FlsFooters.list(Seq(dir), conf, None).head
    val t = entry.table
    val encName = Map(0->"PLAIN",1->"CONST",2->"FFOR",3->"DICT",4->"RLE",5->"ALP",6->"FSST",
      7->"FSST_DICT",8->"FREQ",9->"ALP_RD",10->"FSST12",11->"FSST12_DICT",12->"EQUAL",13->"TRANSPOSED")
    println(s"[probe] file=${entry.file} rowGroups=${t.rowGroups.length} rows=${t.rowGroups.map(_.nTuples.toLong).sum}")
    t.columns.zipWithIndex.foreach { case (c, i) =>
      val encs = t.rowGroups.map(_.segments(i).encoding).groupBy(identity)
        .map { case (e, xs) => s"${encName.getOrElse(e, e.toString)}x${xs.length}" }.mkString(",")
      val bytes = t.rowGroups.map(_.segments(i).length).sum
      println(f"[enc] ${c.name}%-18s $encs%-28s ${bytes / 1e6}%8.1f MB")
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, reps: Int = 3)(f: => Unit): Unit = {
      f
      val ts = (0 until reps).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"[prof] $name%-36s min=${ts.min}%.3f s")
    }
    val fls = spark.read.format("fls").load(dir)
    val pq = spark.read.parquet(pqDir)
    queries.Relational.q01From(fls).queryExecution.executedPlan.toString
      .linesIterator.take(40).foreach(l => println("[plan-fls] " + l))
    for ((nm, df) <- Seq(("fls", fls), ("pq", pq))) {
      time(s"$nm count()")(df.count())
      time(s"$nm q1-agg")(queries.Relational.q01From(df).collect())
      time(s"$nm q1-agg.count()")(queries.Relational.q01From(df).count())
      time(s"$nm doubles (4 cols)")(df.selectExpr("sum(l_quantity + l_extendedprice + l_discount + l_tax)").collect())
      time(s"$nm strings (2 cols)")(df.selectExpr("sum(length(l_returnflag) + length(l_linestatus))").collect())
      time(s"$nm ts col")(df.selectExpr("max(l_shipdate)").collect())
    }
    spark.stop()
  }
}
