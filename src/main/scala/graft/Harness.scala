package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared core of the driver-facing mains (`Verify`, `Bench`), extracted
  * so the failure contract is spec-testable (HarnessSpec): a query that
  * throws must surface as a LOUD per-query error — recorded in the
  * artifact itself and reflected in the process exit code — never as a
  * silently-missing row or a fail-fast "time". Round 9 shipped five
  * broken queries as ~0.06 s bench entries because the old mains
  * swallowed exceptions; this contract makes that class of miss
  * impossible to hide. */
object Harness {

  /** Runs every query and dumps its result as parquet under
    * `outDir/<name>`. Returns name -> error message for every query
    * that threw (empty map = all green). */
  def dumpAll(spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String, outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    queries.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] FAILED $name: ${e.toString.take(400)}")
        Some(name -> e.toString.take(2000))
      }
    }
  }

  /** Warm pass doubling as a pre-flight gate: every query must RUN on
    * the current runtime before it is benched (analysis alone is not
    * enough — the streaming queries execute inside their builder, and
    * runtime behavior shifts like the 4.0→4.1 TIMESTAMP(NANOS) change
    * only surface on execution). Queries that fail the warm pass are
    * excluded from the timed passes and returned as errors; a timed-pass
    * throw likewise records an error and drops the query's time.
    * Survivors get two timed passes, min per query (GC/compilation noise
    * on a busy 32-thread JVM is one-sided, so min is the honest
    * steady-state). */
  def benchAll(spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String): (Map[String, Double], Map[String, String]) = {
    captureRuntime(spark)
    val errors = scala.collection.mutable.Map[String, String]()
    val ok = queries.flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); Some(name -> fn) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] PRE-FLIGHT FAILED $name: ${e.toString.take(400)}")
        errors(name) = e.toString.take(2000)
        None
      }
    }
    def timedPass(): Map[String, Double] =
      ok.flatMap { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some(name -> (System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: ${e.toString.take(400)}")
          errors(name) = e.toString.take(2000)
          None
        }
      }
    // three timed passes, min per query (r19 — VERDICT #7): the
    // pre-flight already pins cache state (every timed pass is WARM),
    // so run-to-run drift is box load; min-of-3 absorbs one loaded
    // pass per query, and the per-query SPREAD (max-min)/min lands in
    // the artifact so a "regression" that is really measurement noise
    // is visible as such without a re-run.
    val passes = Seq(timedPass(), timedPass(), timedPass())
    val times = passes.head.keys.flatMap { k =>
      val vs = passes.flatMap(_.get(k))
      if (vs.size == passes.size) Some(k -> vs.min) else None
    }.toMap
    benchSpreads = passes.head.keys.flatMap { k =>
      val vs = passes.flatMap(_.get(k))
      if (vs.size == passes.size && vs.min > 0)
        Some(k -> (vs.max - vs.min) / vs.min)
      else None
    }.toMap
    (times, errors.toMap -- times.keys)
  }

  /** Per-query relative spread of the last [[benchAll]]'s timed passes
    * ((max-min)/min) — the measurement-noise channel of the bench
    * artifact. */
  @volatile var benchSpreads: Map[String, Double] = Map.empty

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL or an exception
    * message would otherwise make the driver's json.load fail and
    * silently zero the round. */
  def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def jObj(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
      .mkString("{", ",", "}")

  /** The one JSON line Bench prints. Failed queries appear ONLY under
    * "errors" — never as a time — so the artifact itself shows the
    * breakage (ADVICE r9: annotate in the artifact, not just VERDICT). */
  /** The core count and master string the benched session was actually
    * built with — emitted into both JSON shapes (r21, VERDICT r20 #2:
    * the driver's scaling check could not VERIFY that the bench honored
    * `$SPARK_GRAFT_CPUS` because the line never said what it ran with;
    * `suspect_cpus_ignored` fired on a bench that demonstrably honored
    * it). Captured from the LIVE SparkContext inside [[benchAll]] — not
    * from the env var (the field must report ground truth), and not at
    * emit time (Bench stops the session before printing so shutdown
    * stacks cannot interleave with the JSON line). */
  @volatile private var runtimeFields: String =
    """"cpus":-1,"master":"bench-never-ran""""

  private def captureRuntime(spark: SparkSession): Unit =
    runtimeFields = s""""cpus":${spark.sparkContext.defaultParallelism},""" +
      s""""master":${jq(spark.sparkContext.master)}"""

  def benchJson(times: Map[String, Double], errors: Map[String, String],
      sfDir: String): String = {
    val qs = times.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val total = if (times.nonEmpty) times.values.sum else 0.0
    val errPart = if (errors.isEmpty) "" else s""","errors":${jObj(errors)}"""
    val spreads = benchSpreads.toSeq.sortBy(_._1)
      .map { case (k, v) => f"${jq(k)}:$v%.4f" }.mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","queries_spread":$spreads,$runtimeFields""" +
      s""","spark_version":"${org.apache.spark.SPARK_VERSION}"$errPart}"""
  }

  /** STDOUT variant of [[benchJson]] sized for the driver's bounded
    * tail capture (~2000 chars): the full 110-query map at double
    * precision is ~4.5 KB, so every round's BENCH artifact since the
    * suite passed ~60 queries parsed as null. Keeps total + the `keep`
    * slowest queries at 3 decimals and points at the full-precision
    * file. */
  def benchJsonCompact(times: Map[String, Double], errors: Map[String, String],
      sfDir: String, fullPath: String, keep: Int = 30): String = {
    val top = times.toSeq.sortBy(-_._2).take(keep).sortBy(_._1)
      .map { case (k, v) => f"${jq(k)}:$v%.3f" }.mkString("{", ",", "}")
    val total = if (times.nonEmpty) times.values.sum else 0.0
    val errPart =
      if (errors.isEmpty) ""
      else s""","errors":${jObj(errors.map { case (k, v) => k -> v.take(60) })}"""
    // median relative spread — one number for "how noisy was this box"
    val medSpread = {
      val vs = benchSpreads.values.toSeq.sorted
      if (vs.isEmpty) 0.0 else vs(vs.size / 2)
    }
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir",""" +
      s""""n_queries":${times.size},"queries":$top,""" +
      f""""median_spread":$medSpread%.4f,""" +
      s"""$runtimeFields,""" +
      s""""queries_full":"$fullPath"""" +
      s""","spark_version":"${org.apache.spark.SPARK_VERSION}"$errPart}"""
  }

  /** Writes `errors.json` (name -> message) into outDir so a broken
    * query leaves a visible failure artifact next to the result dumps. */
  def writeErrors(outDir: String, errors: Map[String, String]): Unit =
    Files.writeString(Paths.get(s"$outDir/errors.json"), jObj(errors))
}
