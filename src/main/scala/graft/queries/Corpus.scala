package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Corpus-analytics operators a training-data pipeline runs at scale:
  * vocabulary heavy-hitters, embedding scalar quantization, and
  * test-set contamination screening. All three are shapes that hold at
  * 100 TB: heavy-hitters is explode + map-side partial aggregation +
  * TopK (no full sort); quantization is a pure map-side transform;
  * contamination is one distinct + one semi-join on a narrow hash key
  * whose build side Catalyst/AQE sizes (broadcast small, shuffle at
  * corpus scale). */
object Corpus {

  /** q56: vocabulary heavy hitters — the top-20 most frequent tokens
    * (≥3 chars) across the corpus. The plan is the scalable one:
    * explode feeds a partial (map-side) hash aggregate, and the top-20
    * is TakeOrderedAndProject — per-partition top-k then a single
    * 20-row merge, never a global sort of the vocabulary. */
  def q56HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 3)
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  val q56Sql: String =
    """SELECT token, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE length(token) >= 3
      GROUP BY token ORDER BY cnt DESC, token LIMIT 20"""

  /** q57: per-vector int8 scalar quantization — the standard 4×
    * memory reduction before ANN indexing: codes = round((x−mn)/(mx−mn)
    * ·255). Entirely map-side (zero shuffle before the final order);
    * the oracle recomputes the same arithmetic in DuckDB, so the hash
    * match proves the quantization grid is bit-reproducible across
    * engines — which is what makes a quantized index rebuildable. */
  def q57QuantizeEmbeddings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("mn", expr("array_min(v)"))
      .withColumn("mx", expr("array_max(v)"))
      .select(col("vec_id"),
        round(col("mn"), 6).as("mn"),
        round(col("mx"), 6).as("mx"),
        expr("""aggregate(
            transform(v, x -> CAST(round((x - mn) / (mx - mn) * 255, 0) AS BIGINT)),
            CAST(0 AS BIGINT), (a, c) -> a + c)""").as("code_sum"))
      .orderBy("vec_id")

  val q57Sql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                  FROM embeddings WHERE vec_id < 200),
         m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e)
      SELECT vec_id, round(mn, 6) AS mn, round(mx, 6) AS mx,
             list_sum(list_transform(v,
               x -> CAST(round((x - mn) / (mx - mn) * 255, 0) AS BIGINT)))::BIGINT AS code_sum
      FROM m ORDER BY vec_id"""

  /** q58: test-set contamination screening — the held-out split
    * (doc_id % 10 = 0) checked for near-verbatim leakage from the train
    * split via a 120-char prefix hash (exact-dup contamination is the
    * first screen every eval pipeline runs; q21-q23 are the fuzzier
    * follow-ups). One distinct over train hashes, one semi-join on the
    * 32-byte key. The join side is left to Catalyst/AQE on purpose: at
    * bench scale the distinct hash set is small and broadcasts; at
    * 100 TB its stats exceed the broadcast threshold and the same plan
    * degrades gracefully to a shuffle semi-join — size-adaptive, not
    * hard-coded. */
  def q58Contamination(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val trainH = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(md5(substring(col("text"), 1, 120).cast("binary")).as("h"))
      .distinct()
    d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("h", md5(substring(col("text"), 1, 120).cast("binary")))
      .join(trainH, Seq("h"), "left_semi")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_contaminated"))
      .orderBy("lang")
  }

  val q58Sql: String =
    """SELECT lang, count(*) AS n_contaminated
      FROM documents
      WHERE doc_id % 10 = 0
        AND md5(substr(text, 1, 120)) IN
            (SELECT md5(substr(text, 1, 120)) FROM documents WHERE doc_id % 10 <> 0)
      GROUP BY lang ORDER BY lang"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_heavy_hitters" -> (q56HeavyHitters _),
    "q57_quantize_embeddings" -> (q57QuantizeEmbeddings _),
    "q58_contamination" -> (q58Contamination _))

  val oracles: Map[String, String] = Map(
    "q56_heavy_hitters" -> q56Sql,
    "q57_quantize_embeddings" -> q57Sql,
    "q58_contamination" -> q58Sql)
}
