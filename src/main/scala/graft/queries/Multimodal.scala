package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition. The Spark
  * side — schema, partition-parallel batch iteration, typed Encoders —
  * is real; the decode step is a clearly-marked deterministic STUB
  * (image/audio libraries are not in this container), as the build
  * brief requires.
  *
  * Scale shape: `mapPartitions` over `Dataset[MediaRow]` keeps the
  * decode loop executor-local with zero shuffles; binary payloads never
  * leave their input partition.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(
      doc_id: Long, width: Long, height: Long,
      n_bytes: Long, n_frames: Long, brightness_sum: Long)

  /** STUB decoder: a real implementation would JNI/FFI into an image
    * codec here. The fake is deterministic on the payload bytes:
    * "brightness" = sum of the first 64 byte values, "frames" = 256-byte
    * chunks — enough to exercise the full Spark plumbing and be
    * oracle-checkable. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val head = r.media.take(64)
    var s = 0L
    var i = 0
    while (i < head.length) { s += head(i) & 0xff; i += 1 }
    MediaFeatures(r.doc_id, r.width.toLong, r.height.toLong,
      r.media.length.toLong, r.media.length.toLong / 256 + 1, s)
  }

  /** q31: binary media column + metadata → per-partition feature
    * extraction. Media payload is the utf-8 bytes of `text` (the only
    * binary-ish data in the corpus); metadata derives from n_chars. */
  def q31MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("media"),
        (lit(32) + col("n_chars") % 64).cast("int").as("width"),
        (lit(32) + (col("n_chars") * 7) % 64).cast("int").as("height"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle mirrors the stub arithmetic (ASCII corpus: utf-8 bytes ==
    * codepoints, octet_length == n_chars). */
  val q31Sql: String =
    """SELECT doc_id,
        (32 + n_chars % 64)::BIGINT AS width,
        (32 + (n_chars * 7) % 64)::BIGINT AS height,
        octet_length(text::BLOB)::BIGINT AS n_bytes,
        (octet_length(text::BLOB) // 256 + 1)::BIGINT AS n_frames,
        list_sum(list_transform(string_split(substr(text, 1, 64), ''),
          c -> unicode(c)::BIGINT))::BIGINT AS brightness_sum
      FROM documents ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_multimodal_features" -> (q31MultimodalFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "q31_multimodal_features" -> q31Sql,
  )
}
