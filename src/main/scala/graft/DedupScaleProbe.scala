package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Stress the near-dup operators on a 16x-duplicated corpus (80k docs):
  * clusters grow 16x so candidate pairs grow ~256x — the adversarial
  * shape of web-crawl dedup. */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until 16).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ union _)
    val dir = "/tmp/scale_docs"
    big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"[dedup-scale] corpus rows=${spark.read.parquet(s"$dir/documents.parquet").count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[dedup-scale] $name%-24s out=$n%-9d ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    time("q20 exact")(graft.queries.Dedup.q20ExactDedup(spark, dir).count())
    time("q22 minhash-lsh")(graft.queries.Dedup.q22MinhashLsh(spark, dir).count())
    time("q23 simhash")(graft.queries.Dedup.q23Simhash(spark, dir).count())
    time("q21 ngram-jaccard")(graft.queries.Dedup.q21NgramJaccard(spark, dir).count())
    spark.stop()
  }
}
