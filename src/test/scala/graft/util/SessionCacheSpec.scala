package graft.util

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SessionCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("session-cache-spec")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cache hit for the owning session; rebuild for a different session") {
    val cache = new SessionCache
    var builds = 0
    def build(s: SparkSession) = { builds += 1; s.range(3).toDF("v") }
    val a = cache.getOrBuild(spark, "/d")(build(spark))
    val a2 = cache.getOrBuild(spark, "/d")(build(spark))
    assert((a eq a2) && builds == 1, "same session must hit the cache")
    // a different SparkSession over the same context (what a fresh
    // session in a long-lived JVM looks like) must NOT get the old frame
    val other = spark.newSession()
    val b = cache.getOrBuild(other, "/d")(build(other))
    assert(builds == 2 && (b.sparkSession eq other),
      "a different session must rebuild, not receive a foreign frame")
    cache.clearAll()
  }

  test("two live sessions over the same dir do not evict each other") {
    val cache = new SessionCache
    var builds = 0
    def build(s: SparkSession) = { builds += 1; s.range(3).toDF("v") }
    val other = spark.newSession()
    val a = cache.getOrBuild(spark, "/d")(build(spark))
    val b = cache.getOrBuild(other, "/d")(build(other))
    // alternate lookups: each session must keep hitting ITS frame —
    // no rebuild, no unpersist thrash of the other session's frame
    val a2 = cache.getOrBuild(spark, "/d")(build(spark))
    val b2 = cache.getOrBuild(other, "/d")(build(other))
    val a3 = cache.getOrBuild(spark, "/d")(build(spark))
    assert((a eq a2) && (a eq a3) && (b eq b2) && builds == 2,
      "concurrently live sessions must each keep their own cached frame")
    cache.clearAll()
  }
}
