package graft
import org.apache.spark.sql.SparkSession

/** One-off fixture (re)writer for RgSizeProbe's 1Mi-row-group copy. */
object RgGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.format("fls").load("/tmp/fls_scale/lineitem64x")
      .write.format("fls").mode("overwrite")
      .option("row_group_size", 1048576)
      .save("/tmp/fls_scale/lineitem64x_rg1048576")
    println("[rggen] done")
    spark.stop()
  }
}
