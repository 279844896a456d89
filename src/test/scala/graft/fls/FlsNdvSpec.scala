package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Manifest NDV sketches ([[Hll]], `ndv_columns` writer option):
  * per-file HLL registers in the stats JSON, merged at plan time into
  * DSv2 `distinctCount` column statistics. Locks the estimator's
  * accuracy, the JSON round-trip, the plan-time merge, the
  * stats-less-legacy degradation, and the headline effect: with CBO
  * on, Catalyst sizes a group-by from key NDV and picks a broadcast
  * join it previously missed. */
class FlsNdvSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-ndv-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-ndv-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("estimator accuracy across magnitudes; merge is union") {
    def sketchOf(ids: Range): Hll = {
      val h = new Hll
      ids.foreach(i => h.addHash(Hll.hashLong(i.toLong)))
      h
    }
    Seq(1, 10, 500, 10000, 200000).foreach { n =>
      val est = Hll.estimate(sketchOf(0 until n).regs)
      assert(math.abs(est - n) <= math.max(2.0, 0.10 * n),
        s"n=$n est=$est")
    }
    // union: overlapping halves merge to the true distinct total
    val a = sketchOf(0 until 6000)
    val b = sketchOf(3000 until 9000)
    val m = java.util.Arrays.copyOf(a.regs, a.regs.length)
    Hll.mergeInto(m, b.regs)
    val est = Hll.estimate(m)
    assert(math.abs(est - 9000) <= 0.10 * 9000, s"est=$est")
    // string/double hashing: distinct values spread, equal values don't
    val s = new Hll
    (0 until 5000).foreach(i => s.addHash(Hll.hashBytes(s"doc-$i".getBytes)))
    (0 until 5000).foreach(_ => s.addHash(Hll.hashDouble(42.5)))
    val estS = Hll.estimate(s.regs)
    assert(math.abs(estS - 5001) <= 0.10 * 5001, s"est=$estS")
  }

  test("ndv_columns round-trips through the manifest stats JSON") {
    val sp = spark
    import sp.implicits._
    val dir = s"$tmp/roundtrip"
    (0 until 50000).map(i => (i.toLong % 137, s"s${i % 23}", i.toDouble))
      .toDF("k", "s", "v")
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest")
      .option("ndv_columns", "k,s")
      .save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val entries = FlsManifest.read(fs, root).get
    assert(entries.nonEmpty)
    // every file carries sketches for exactly the asked columns
    entries.foreach { e =>
      val ndv = FlsFileStats.ndvOf(e.stats)
      assert(ndv.keySet == Set("k", "s"), ndv.keySet)
      // and the bounds stats still parse (pruning unharmed)
      assert(FlsFileStats.toDesc(e.stats).isDefined)
    }
    // merged across files, the estimates land near the truth
    def mergedEst(col: String): Long = {
      val regs = entries.map(e => FlsFileStats.ndvOf(e.stats)(col))
      val m = java.util.Arrays.copyOf(regs.head, regs.head.length)
      regs.tail.foreach(Hll.mergeInto(m, _))
      Hll.estimate(m)
    }
    assert(math.abs(mergedEst("k") - 137) <= 14, mergedEst("k"))
    assert(math.abs(mergedEst("s") - 23) <= 3, mergedEst("s"))
    // refusals: unknown column, nested type
    val e1 = intercept[Exception] {
      Seq((1L, "a")).toDF("k", "s").write.format("fls").mode("overwrite")
        .option("ndv_columns", "nope").save(s"$tmp/refuse1")
    }
    assert(e1.getMessage.contains("not a column"))
  }

  test("plan-time merge serves distinctCount to Catalyst; legacy files degrade") {
    val sp = spark
    import sp.implicits._
    val dir = s"$tmp/colstats"
    (0 until 40000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").option("ndv_columns", "k")
      .save(dir)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val leaf = spark.read.format("fls").load(dir).select("k")
        .queryExecution.optimizedPlan.collectLeaves().head
      val ndv = leaf.stats.attributeStats.find(_._1.name == "k")
        .flatMap(_._2.distinctCount).map(_.toLong)
      assert(ndv.isDefined, leaf.stats.attributeStats)
      assert(math.abs(ndv.get - 50) <= 5, ndv)
      // append a sketch-less generation: the column must degrade to
      // no-distinct-count (conservative), not serve a partial estimate
      (0 until 1000).map(i => (i.toLong % 200, i.toLong)).toDF("k", "v")
        .write.format("fls").mode("append")
        .option("commit_mode", "manifest").save(dir)
      val leaf2 = spark.read.format("fls").load(dir).select("k")
        .queryExecution.optimizedPlan.collectLeaves().head
      val ndv2 = leaf2.stats.attributeStats.find(_._1.name == "k")
        .flatMap(_._2.distinctCount)
      assert(ndv2.isEmpty, ndv2)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("CBO + NDV flips a join over a group-by to broadcast") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val big = s"$tmp/bcast_big"
    val bigNoNdv = s"$tmp/bcast_big_nondv"
    val other = s"$tmp/bcast_other"
    val bigDf = (0 until 200000).map(i => (i.toLong % 20, i.toLong))
      .toDF("k", "v")
    bigDf.write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").option("ndv_columns", "k").save(big)
    bigDf.write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(bigNoNdv)
    (0 until 200000).map(i => (i.toLong % 1000, i.toLong)).toDF("k", "w")
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(other)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // judge the STATIC plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256 * 1024).toString)
    try {
      def joinPlan(bigDir: String) = {
        val agg = spark.read.format("fls").load(bigDir)
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("sv"))
        spark.read.format("fls").load(other).join(agg, "k")
          .queryExecution.executedPlan
      }
      // with the sketch: the 20-key aggregate is estimated tiny → broadcast
      val withNdv = joinPlan(big)
      assert(withNdv.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        withNdv)
      // without: the aggregate's size estimate stays input-sized → SMJ
      val without = joinPlan(bigNoNdv)
      assert(without.collect { case s: SortMergeJoinExec => s }.nonEmpty,
        without)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
