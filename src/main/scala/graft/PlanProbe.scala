package graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planning-cost probe over a many-small-files table: the shape where
  * serial driver footer IO dominates at cluster scale (tens of
  * thousands of files on object storage). Measures cold (parallel
  * fetch) vs warm (cached) footer listing and end-to-end planning. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nFiles = args.headOption.map(_.toInt).getOrElse(512)
    val dir = s"/tmp/fls_plan_probe_$nFiles"
    // 512 files of one 1024-row row group each
    spark.range(0, nFiles.toLong * graft.fls.Format.VecSize)
      .selectExpr("id", "CAST(id % 1000 AS DOUBLE) AS d", "concat('s', id % 37) AS s")
      // range-partitioned on id: files hold disjoint id ranges, so the
      // filtered scan demonstrates zone-map pruning across 512 files
      // (round-robin repartition would smear ids over every file and
      // legitimately defeat pruning)
      .repartitionByRange(nFiles, col("id"))
      .write.format("fls").mode("overwrite")
      .option("row_group_size", graft.fls.Format.VecSize.toString)
      .save(dir)
    val conf = spark.sessionState.newHadoopConf()
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[plan-probe] $name%-34s ${(System.nanoTime() - t0) / 1e3}%.0f us")
    }
    graft.fls.FlsFooters.clear()
    timed(s"cold footer list ($nFiles files)") {
      assert(graft.fls.FlsFooters.list(Seq(dir), conf).length == nFiles)
    }
    timed("warm footer list (cached)") {
      assert(graft.fls.FlsFooters.list(Seq(dir), conf).length == nFiles)
    }
    // serial baseline for comparison: one footer at a time
    graft.fls.FlsFooters.clear()
    timed("serial footer reads (baseline)") {
      graft.fls.FlsFile.listDataFiles(new Path(dir), conf).foreach { f =>
        val r = new graft.fls.FlsFileReader(f, conf)
        try r.table finally r.close()
      }
    }
    // end-to-end: planning + a metadata-only count over the table
    timed(s"count() over $nFiles files") {
      assert(spark.read.format("fls").load(dir).count() ==
        nFiles.toLong * graft.fls.Format.VecSize)
    }
    timed(s"filtered scan over $nFiles files") {
      assert(spark.read.format("fls").load(dir)
        .filter(col("id") < 2048).count() == 2048)
    }
    // manifest mode: the same table published through the versioned
    // manifest — file discovery becomes one tiny-dir listing + one
    // manifest read instead of a recursive listing (the object-store
    // planning win)
    val mdir = s"/tmp/fls_plan_probe_${nFiles}_manifest"
    spark.range(0, nFiles.toLong * graft.fls.Format.VecSize)
      .selectExpr("id", "CAST(id % 1000 AS DOUBLE) AS d", "concat('s', id % 37) AS s")
      .repartitionByRange(nFiles, col("id"))
      .write.format("fls").mode("overwrite")
      .option("row_group_size", graft.fls.Format.VecSize.toString)
      .option("commit_mode", "manifest")
      .save(mdir)
    graft.fls.FlsFooters.clear()
    timed(s"cold footer list, manifest ($nFiles files)") {
      assert(graft.fls.FlsFooters.list(Seq(mdir), conf).length == nFiles)
    }
    timed("warm footer list, manifest (cached)") {
      assert(graft.fls.FlsFooters.list(Seq(mdir), conf).length == nFiles)
    }
    timed("file discovery only, listing") {
      assert(graft.fls.FlsFile.listDataFiles(new Path(dir), conf).length == nFiles)
    }
    timed("file discovery only, manifest") {
      assert(graft.fls.FlsFile.listDataFiles(new Path(mdir), conf).length == nFiles)
    }
    spark.stop()
  }
}
