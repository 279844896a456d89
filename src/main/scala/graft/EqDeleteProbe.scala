package graft

import org.apache.spark.sql.SparkSession

/** Head-to-head of the three delete legs on the GDPR shape — a
  * point/IN delete on an UNCLUSTERED key over a many-file table built
  * from the ScaleSweep's 128x orders (~19M rows, 64 files, every file
  * spanning the whole key domain, so nothing decides by metadata):
  *
  *   - copy-on-write: rewrites EVERY straddling file (here: all);
  *   - merge-on-read: reads every candidate file to find positions,
  *     writes tiny DV sidecars;
  *   - equality:      commits the predicate — one manifest line, zero
  *     data reads, zero Spark jobs.
  *
  * Also measures the read-side residual tax (full-scan aggregate
  * before/after the equality delete) and the compaction absorb.
  * Three fresh copies of the same table, one per mode, so each leg
  * pays identical I/O conditions.
  *
  * Usage: runMain graft.EqDeleteProbe [scaledDir] */
object EqDeleteProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_scale/x128")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val src = spark.read.parquet(s"$srcDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    // the needle set: 37 EXISTING keys scattered across the whole
    // domain (TPC-H orderkeys are sparse — synthetic strides miss)
    val keys = src.select("o_orderkey").distinct()
      .sample(withReplacement = false, 0.00002, seed = 7)
      .limit(37).collect().map(_.getLong(0)).toSeq.sorted
    require(keys.nonEmpty, "sample produced no needles")
    val inList = keys.mkString(", ")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[eqprobe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    Seq("copy-on-write", "merge-on-read", "equality").foreach { mode =>
      val tag = mode.replace("-", "")
      val dir = s"/tmp/graft_eqdel_probe/$tag"
      val tbl = s"eqprobe_$tag"
      // fresh copy every run: the probe DELETES from it
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      src.repartition(64) // unclustered: every file spans the domain
        .write.format("fls").mode("overwrite")
        .option("commit_mode", "manifest").save(dir)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice " +
        s"DOUBLE, o_orderpriority STRING) USING fls LOCATION '$dir' " +
        s"TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='$mode')")
      val n0 = spark.table(tbl).count()
      timed(s"$mode: DELETE 37 scattered keys of $n0")(
        spark.sql(s"DELETE FROM $tbl WHERE o_orderkey IN ($inList)"))
      val n1 = timed(s"$mode: full count after")(spark.table(tbl).count())
      require(n0 - n1 == keys.length, s"$mode deleted ${n0 - n1}")
      if (mode == "equality") {
        // a second generation appended AFTER the predicate (newer birth
        // version): exempt from the residual AND from absorption — the
        // targeted-absorb claim is rewriting 64 of 128 files, not all
        timed("equality: append exempt generation (64 files)")(
          src.repartition(64).write.format("fls").mode("append")
            .option("commit_mode", "manifest").save(dir))
        timed("equality: full-scan agg WITH residual (128 files)")(
          spark.table(tbl).agg(sum("o_totalprice")).collect())
        val st = timed("equality: TARGETED absorb (subject files only)")(
          graft.fls.FlsMaintenance.absorbDeletes(spark, dir,
            targetRowsPerFile = 2000000))
        println(s"[eqprobe] absorb rewrote ${st.subjectFiles} subject " +
          s"file(s) of 128, dropped ${st.predicates} predicate(s)")
        require(st.subjectFiles == 64, s"expected 64 subject, got ${st.subjectFiles}")
        timed("equality: full-scan agg after absorb (128 files)")(
          spark.table(tbl).agg(sum("o_totalprice")).collect())
        val n2 = spark.table(tbl).count()
        require(n2 == 2 * n0 - keys.length,
          s"post-absorb count $n2, expected ${2 * n0 - keys.length}")
        timed("equality: full compact (reference)")(
          graft.fls.FlsMaintenance.compact(spark, dir,
            targetRowsPerFile = 2000000))
      }
    }

    // ---- RETENTION shape (r16): `o_orderkey < cutoff` as a range
    // predicate on a CLUSTERED table (64 disjoint-range files). The
    // zone-map prune means the residual taxes only the files the
    // cutoff actually touches, and targeted absorb rewrites only the
    // files whose stats intersect the range — the rest restamp
    // metadata-only. ----
    locally {
      val dir = "/tmp/graft_eqdel_probe/retention"
      val tbl = "eqprobe_retention"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      src.repartitionByRange(64, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.format("fls").mode("overwrite")
        .option("commit_mode", "manifest")
        .option("write_distribution", "none").save(dir)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice " +
        s"DOUBLE, o_orderpriority STRING) USING fls LOCATION '$dir' " +
        "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
      val n0 = spark.table(tbl).count()
      val cutoff = src.stat.approxQuantile("o_orderkey", Array(0.25), 0.001)(0).toLong
      timed("retention: baseline full-scan agg (64 files, no predicate)")(
        spark.table(tbl).agg(sum("o_totalprice")).collect())
      timed(s"retention: DELETE o_orderkey < $cutoff (range line)")(
        spark.sql(s"DELETE FROM $tbl WHERE o_orderkey < $cutoff"))
      timed("retention: full-scan agg WITH residual (zone-pruned)")(
        spark.table(tbl).agg(sum("o_totalprice")).collect())
      val n1 = timed("retention: count after (untouched files metadata)")(
        spark.table(tbl).count())
      val st = timed("retention: TARGETED absorb (intersecting files only)")(
        graft.fls.FlsMaintenance.absorbDeletes(spark, dir,
          targetRowsPerFile = 2000000))
      println(s"[eqprobe] retention absorb rewrote ${st.subjectFiles} " +
        s"file(s) of 64 (stats-exempt rest restamped), dropped " +
        s"${st.predicates} predicate(s)")
      require(st.subjectFiles <= 20,
        s"zone pruning must confine the rewrite to the ~17 intersecting " +
          s"files, rewrote ${st.subjectFiles}")
      val n2 = spark.table(tbl).count()
      require(n1 == n2, s"absorb changed visible rows: $n1 -> $n2")
      timed("retention: full-scan agg after absorb")(
        spark.table(tbl).agg(sum("o_totalprice")).collect())
      println(s"[eqprobe] retention rows $n0 -> $n1 (cutoff $cutoff)")
    }

    // ---- GDPR + bloom (r16): scattered point keys on an UNCLUSTERED
    // table, with a bloom sketch on the key. Zone maps prove nothing
    // here (every file spans the domain); the bloom's definite NO
    // confines both the residual tax and the absorb rewrite to the
    // files that actually contain the keys. ----
    locally {
      val dir = "/tmp/graft_eqdel_probe/bloomeq"
      val tbl = "eqprobe_bloomeq"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      src.repartition(64)
        .write.format("fls").mode("overwrite")
        .option("commit_mode", "manifest")
        .option("bloom_columns", "o_orderkey").save(dir)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice " +
        s"DOUBLE, o_orderpriority STRING) USING fls LOCATION '$dir' " +
        "TBLPROPERTIES ('commit_mode'='manifest', " +
        "'delete_mode'='equality', 'bloom_columns'='o_orderkey')")
      val needles = keys.take(5)
      val n0 = spark.table(tbl).count()
      timed("bloom: baseline full-scan agg (64 files)")(
        spark.table(tbl).agg(sum("o_totalprice")).collect())
      timed(s"bloom: DELETE ${needles.length} scattered keys (one line)")(
        spark.sql(s"DELETE FROM $tbl WHERE o_orderkey IN " +
          s"(${needles.mkString(", ")})"))
      timed("bloom: full-scan agg WITH residual (bloom-pruned)")(
        spark.table(tbl).agg(sum("o_totalprice")).collect())
      val n1 = spark.table(tbl).count()
      require(n0 - n1 == needles.length, s"bloom leg deleted ${n0 - n1}")
      val st = timed("bloom: TARGETED absorb (key-bearing files only)")(
        graft.fls.FlsMaintenance.absorbDeletes(spark, dir,
          targetRowsPerFile = 2000000))
      println(s"[eqprobe] bloom absorb rewrote ${st.subjectFiles} " +
        s"file(s) of 64, dropped ${st.predicates} predicate(s)")
      // expected rewrites = bearing files (≤5) + the bloom FP tail:
      // ~59 clean files × (1 - (1-fpp)^5) ≈ 3 at the default 1% fpp —
      // measured 8 of 64 (5 bearing + 3 FPs), vs 64 without the proof
      require(st.subjectFiles <= 16,
        s"bloom proof must confine the rewrite to the ~${needles.length} " +
          s"key-bearing files plus a small FP tail, rewrote ${st.subjectFiles}")
      timed("bloom: full-scan agg after absorb")(
        spark.table(tbl).agg(sum("o_totalprice")).collect())
    }
    spark.stop()
  }
}
