package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r21 tiled grid kernel (flat buffers, TileJ-blocked sweep, 4-pair
  * unroll) must be BITWISE identical to the broadcast all-pairs plan on
  * a corpus sized to exercise every kernel path: blocks larger than one
  * 256-row j-tile (multi-tile sweeps), blocks not divisible by 4 (the
  * scalar unroll tail), diagonal cells (triangle sweep) and cross cells,
  * and a planted mix of passing / near-threshold / failing pairs. */
class EmbeddingGridKernelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("grid-kernel").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("embedding-grid-kernel-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 3001 vectors (prime-ish: odd block sizes, unroll tails), dim 7.
    // Deterministic LCG; planted near-dups every 97 ids (a copy of the
    // base vector with one coordinate nudged) so pairs land on both
    // sides of the 0.45 threshold.
    val rnd = new java.util.Random(42)
    val rows = (0 until 3001).map { i =>
      val base =
        if (i % 97 == 0 && i > 0) {
          val donor = new java.util.Random(7L)
          val v = Array.fill(7)(donor.nextDouble() * 2 - 1)
          v(i % 7) += 0.05 * (i % 5)
          v
        } else Array.fill(7)(rnd.nextDouble() * 2 - 1)
      (i.toLong, base.map(_.toFloat).toSeq, s"l${i % 3}")
    }
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("tiled grid kernel == broadcast plan, bitwise, at multi-tile scale") {
    val grid = Dedup.q43EmbeddingBlocked(spark, dir).collect()
    val brute = Dedup.q24EmbeddingNearDup(spark, dir).collect()
    assert(grid.length == brute.length,
      s"pair counts diverged: grid=${grid.length} brute=${brute.length}")
    assert(grid.nonEmpty, "test corpus must produce passing pairs")
    // some planted pairs must FAIL the threshold too, or the threshold
    // logic is untested — the full cross product is far larger
    assert(grid.length.toLong < 3001L * 3000 / 2)
    grid.zip(brute).foreach { case (g, b) => assert(g == b, s"$g != $b") }
    Dedup.unpersistAll()
  }
}
