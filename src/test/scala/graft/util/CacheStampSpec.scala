package graft.util

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The memoized gate tables must rebuild when the CODE that wrote them
  * changes (VERDICT r18 "What's missing" #2): markers carry a bytecode
  * fingerprint, and any marker written by a different code version —
  * including the pre-r19 empty markers — wipes and rebuilds the cache. */
class CacheStampSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dataDir: File = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("cache-stamp-spec")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dataDir = Files.createTempDirectory("cachestamp_data").toFile
    spark.range(100).selectExpr("id AS k", "CAST(id * 3 AS STRING) AS v")
      .coalesce(1).write.parquet(s"$dataDir/stamptab.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cacheDir: File =
    new File(graft.queries.FlsQueries.flsTablePath(dataDir.toString, "stamptab"))
  private def marker: File = new File(cacheDir, "_done")
  private def build() =
    graft.queries.FlsQueries.flsTable(spark, dataDir.toString, "stamptab")

  test("stamp is a stable non-empty bytecode fingerprint") {
    assert(CacheStamp.stamp.length == 32)
    assert(CacheStamp.stamp == CacheStamp.stamp)
  }

  test("marker written at build time carries the current stamp") {
    assert(build().count() == 100)
    assert(Files.readString(marker.toPath) == CacheStamp.stamp)
  }

  test("a current-stamp marker is reused, not rebuilt") {
    build()
    val sentinel = new File(cacheDir, "sentinel_reuse")
    sentinel.createNewFile()
    graft.queries.FlsQueries.forgetMemo()
    assert(build().count() == 100)
    assert(sentinel.exists(), "valid marker must not trigger a wipe/rebuild")
    sentinel.delete()
  }

  test("a stamp change forces wipe + rebuild from source") {
    build()
    val sentinel = new File(cacheDir, "sentinel_stale")
    sentinel.createNewFile()
    Files.writeString(marker.toPath, "stamp-from-a-previous-round")
    graft.queries.FlsQueries.forgetMemo()
    assert(build().count() == 100, "rebuilt table must read correctly")
    assert(!sentinel.exists(), "stale-stamp cache dir must be wiped")
    assert(Files.readString(marker.toPath) == CacheStamp.stamp)
  }

  test("miss path holds the cross-process rebuild lock until write()") {
    build()
    Files.writeString(marker.toPath, "stamp-from-a-previous-round")
    graft.queries.FlsQueries.forgetMemo()
    assert(!CacheStamp.valid(marker), "stale stamp must miss")
    val lockFile = new File(cacheDir.getParentFile, cacheDir.getName + ".lock")
    assert(lockFile.exists(), "miss must create the lock file outside the dir")
    val raf = new java.io.RandomAccessFile(lockFile, "rw")
    try {
      // our own JVM holds it -> an independent channel cannot
      intercept[java.nio.channels.OverlappingFileLockException] {
        raf.getChannel.tryLock()
      }
    } finally raf.close()
    CacheStamp.write(marker)
    val raf2 = new java.io.RandomAccessFile(lockFile, "rw")
    try {
      val l = raf2.getChannel.tryLock()
      assert(l != null, "write() must release the rebuild lock")
      l.release()
    } finally raf2.close()
    // the miss above wiped the fixture dir; drop the blessing marker so
    // the next build rebuilds from source instead of reusing emptiness
    marker.delete()
    graft.queries.FlsQueries.forgetMemo()
    assert(build().count() == 100)
  }

  test("a pre-r19 empty marker also forces rebuild") {
    build()
    val sentinel = new File(cacheDir, "sentinel_empty")
    sentinel.createNewFile()
    Files.writeString(marker.toPath, "")
    graft.queries.FlsQueries.forgetMemo()
    assert(build().count() == 100)
    assert(!sentinel.exists())
    assert(Files.readString(marker.toPath) == CacheStamp.stamp)
  }
}
