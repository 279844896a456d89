ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbfastlanesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `runMain` output is normally routed through sbt's logger,
// which prefixes every line with "[info] " — that prefix has broken
// the driver's last-line JSON parse of Bench output three rounds
// running. StdoutOutput passes the child's stdout through verbatim,
// and showSuccess drops the trailing "[success] Total time" line, so
// the bare JSON really is the final stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Marathon sessions (100+ distinct queries in one JVM) generate
  // thousands of codegen classes; at the default 240m the code-cache
  // sweeper starts flushing warm methods and a single-invocation OSR'd
  // stage loop can run INTERPRETED for a whole task wave — measured on
  // this box as the q88 sweep transient: 7 s JIT'd, 317 s marathon,
  // 1521 s with generated classes force-excluded from JIT
  // (OverlapJitProbe). Same setting production Spark clusters use for
  // long-lived executors.
  "-XX:ReservedCodeCacheSize=512m",
)
