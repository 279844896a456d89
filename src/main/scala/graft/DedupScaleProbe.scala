package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Stress the near-dup operators on an Nx-duplicated corpus (args(0) =
  * multiplier, default 16 → 80k docs): clusters grow Nx so candidate
  * pairs grow ~N² — the adversarial shape of web-crawl dedup. Run at
  * two multipliers (e.g. 4 and 16) to measure a scaling CURVE, not one
  * point. args(1) = "events" additionally stresses the events-table
  * operators (hourly aggregation, stateful sessionization) on an
  * Nx-duplicated user population. */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(16)
    val withEvents = args.length > 1 && args(1) == "events"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[dedup-scale] x$mult%-3d $name%-24s out=$n%-9d ${(System.nanoTime()-t0)/1e9}%.1f s")
    }

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until mult).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ union _)
    val dir = s"/tmp/scale_docs_x$mult"
    big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"[dedup-scale] corpus rows=${spark.read.parquet(s"$dir/documents.parquet").count()}")
    time("q20 exact")(graft.queries.Dedup.q20ExactDedup(spark, dir).count())
    // materialize the shared shingle/groups caches SEPARATELY, so the
    // per-query timings below are marginal costs (previously q22, the
    // first cache toucher, absorbed the whole shingling pass and looked
    // 9× slower than its plan actually is)
    time("shingle+groups (shared)")(graft.queries.Dedup.probeGroups(spark, dir).count())
    time("q22 minhash-lsh")(graft.queries.Dedup.q22MinhashLsh(spark, dir).count())
    time("q23 simhash")(graft.queries.Dedup.q23Simhash(spark, dir).count())
    time("q21 ngram-jaccard")(graft.queries.Dedup.q21NgramJaccard(spark, dir).count())

    // embedding near-dup: the broadcast baseline (q24) vs the block-grid
    // scale shape (q43) on an Nx corpus — same output by construction
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val bigEmb = (0 until mult).map(i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))).reduce(_ union _)
    bigEmb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    time("q24 embed broadcast")(graft.queries.Dedup.q24EmbeddingNearDup(spark, dir).count())
    time("q43 embed block-grid")(graft.queries.Dedup.q43EmbeddingBlocked(spark, dir).count())

    if (withEvents) {
      // events.ts dtype is runtime-dependent (nanos long on <=4.0 with
      // the legacy conf, TIMESTAMP_NTZ on 4.1+); the scaled copy stores
      // whatever loaded, and the queries dispatch via Tables.tsMicros
      val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.1")
      val bigEv = (0 until mult).map(i =>
        ev.withColumn("user_id", col("user_id") + lit(i * 10000000L))).reduce(_ union _)
      val evDir = s"/tmp/scale_events_x$mult"
      bigEv.write.mode("overwrite").parquet(s"$evDir/events.parquet")
      println(s"[dedup-scale] events rows=${spark.read.parquet(s"$evDir/events.parquet").count()}")
      time("q12 events-hourly")(graft.queries.Relational.q12EventsHourly(spark, evDir).count())
      time("q33 sessionize-typed")(graft.queries.Streaming.q33Sessionize(spark, evDir).count())
    }
    graft.queries.Dedup.unpersistAll()
    spark.stop()
  }
}
