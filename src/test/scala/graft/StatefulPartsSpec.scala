package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streaming

/** r20: the shared stateful-shuffle sizing ([[Streaming.statefulParts]]
  * / [[Streaming.withStatefulParts]]) — one state store per shuffle
  * partition makes partitions a sizing decision, derived from source
  * bytes (~8 MiB per partition), floored at 8, capped at the session's
  * parallelism, and always restored after the body. */
class StatefulPartsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("stateful-parts").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("stateful-parts-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fileOf(bytes: Long): String = {
    val f = new java.io.File(tmp, s"src_$bytes.bin")
    val out = new java.io.FileOutputStream(f)
    try {
      val chunk = new Array[Byte](1 << 20)
      var left = bytes
      while (left > 0) {
        val n = math.min(left, chunk.length.toLong).toInt
        out.write(chunk, 0, n)
        left -= n
      }
    } finally out.close()
    f.getPath
  }

  test("small inputs floor at 8 partitions; growth is ~8 MiB per " +
      "partition; the session's parallelism caps it") {
    // 2 MB → well under 8 stores' worth of input → the floor
    assert(Streaming.statefulParts(spark, fileOf(2L << 20)) == 8L)
    // 80 MiB → 10 partitions by the bytes rule, but local[4] caps...
    // (cap = defaultParallelism = 4 < floor 8 → the floor wins the max)
    assert(Streaming.statefulParts(spark, fileOf(80L << 20)) == 8L)
    // the formula itself: max(8, min(cpus, bytes/8MiB))
    val cpus = spark.sparkContext.defaultParallelism
    val bytes = 200L << 20
    assert(Streaming.statefulParts(spark, fileOf(bytes)) ==
      math.max(8L, math.min(cpus.toLong, bytes / (8L << 20))))
  }

  test("withStatefulParts pins the conf for the body and restores the " +
      "previous value even when the body throws") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val seen = Streaming.withStatefulParts(spark, fileOf(1L << 20)) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(seen == "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
    intercept[RuntimeException] {
      Streaming.withStatefulParts(spark, fileOf(1L << 20)) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
  }
}
