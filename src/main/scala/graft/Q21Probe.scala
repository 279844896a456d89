package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure q21's prefix-extraction variants: the in-place HOF
  * (array_sort with an interpreted comparator lambda per element) vs
  * explode + codegen'd window rank. Dev tool, not part of the bench. */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (0 until 2).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[q21probe] $name%-28s min=${ts.min}%.2f s")
    }

    // shared shingled groups (replicates Dedup.groupsOf(shingled()))
    val groups = graft.queries.Dedup.probeGroups(spark, dir).persist()
    println(s"[q21probe] groups=${groups.count()}")

    val hofPrefixes = groups.select(col("ghash"),
      explode(expr(
        """slice(array_sort(transform(gr, s -> struct(xxhash64(s) AS h, s)), (x, y) ->
             CASE WHEN x.h < y.h THEN -1 WHEN x.h > y.h THEN 1
                  WHEN x.s < y.s THEN -1 WHEN x.s > y.s THEN 1 ELSE 0 END),
           1, CAST(size(gr) - ((4 * size(gr) + 4) DIV 5) + 1 AS INT))""")).as("tok"))

    val winPrefixes = {
      val toks = groups.select(col("ghash"), col("nsh"), explode(col("gr")).as("s"))
        .withColumn("h", xxhash64(col("s")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ghash").orderBy(col("h").asc, col("s").asc)
      toks.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("nsh") - expr("(4 * nsh + 4) DIV 5") + 1)
        .select(col("ghash"), struct(col("h"), col("s")).as("tok"))
    }

    time("HOF array_sort prefixes")(hofPrefixes.count())
    time("explode+window prefixes")(winPrefixes.count())

    def candPairs(prefixes: DataFrame): Long =
      prefixes.select(col("ghash").as("gh_a"), col("tok"))
        .join(prefixes.select(col("ghash").as("gh_b"), col("tok")), Seq("tok"))
        .filter(col("gh_a") < col("gh_b"))
        .select("gh_a", "gh_b").dropDuplicates("gh_a", "gh_b").count()

    time("HOF full candidate join")(candPairs(hofPrefixes))
    time("window full candidate join")(candPairs(winPrefixes))
    spark.stop()
  }
}
