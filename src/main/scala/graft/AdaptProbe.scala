package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does adaptive conjunct ordering pay for itself? A two-conjunct scan
  * whose PUSHED order is pathological — an expensive pass-through
  * string compare first, a cheap highly-selective long equality second
  * — timed with adaptation on vs pinned pushed order, interleaved reps.
  * Also times the already-good order to bound the overhead of the
  * bookkeeping (nanoTime + ranks) when there is nothing to fix. */
object AdaptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/fls_scale/lineitem64x"
    // pushed order follows the And tree: the 98%-pass shipdate
    // conjunct first is the bad order — it makes the 2%-pass quantity
    // conjunct scan nearly the full selection; flipped, shipdate only
    // re-checks the 2%
    val bad = "l_shipdate <= timestamp'1998-09-02 00:00:00' AND l_quantity <= 1"
    val good = "l_quantity <= 1 AND l_shipdate <= timestamp'1998-09-02 00:00:00'"
    def run(cond: String): Long = {
      val df = spark.read.format("fls").option("filter_keep_ratio", "0.9")
        .load(dir).filter(cond)
      df.agg(count(lit(1)), sum("l_extendedprice")).collect()
      0L
    }
    def timeIt(cond: String): Double = {
      val t0 = System.nanoTime(); run(cond); (System.nanoTime() - t0) / 1e9
    }
    val modes = Seq("adaptive" -> ("true", bad), "pinned-bad" -> ("false", bad),
      "pinned-good" -> ("false", good))
    modes.foreach { case (_, (en, c)) => sys.props("graft.fls.adaptive") = en; run(c) }
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until 9; (nm, (en, c)) <- modes.drop(r % modes.length) ++ modes.take(r % modes.length)) {
      sys.props("graft.fls.adaptive") = en
      times(nm) ::= timeIt(c)
    }
    sys.props("graft.fls.adaptive") = "true"
    for ((nm, _) <- modes) {
      val ts = times(nm).sorted
      println(f"[adp] $nm%-12s min=${ts.head}%.3f med=${ts(ts.length / 2)}%.3f s")
    }
    spark.stop()
  }
}
