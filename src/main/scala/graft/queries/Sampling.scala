package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Corpus-construction operators a training-data pipeline runs AFTER
  * analysis/dedup: deterministic stratified sampling (data mixing) and
  * applying a dedup decision to materialize the cleaned corpus. Both
  * are shuffle-minimal shapes that hold at 100 TB: sampling is a
  * per-row hash filter (no shuffle at all before the final aggregate);
  * dedup-apply is one hash aggregation plus one semi-join on the key. */
object Sampling {

  /** Portable per-document bucket in [0, 100): first 8 hex chars of
    * md5(doc_id as string), identical in Spark (md5+conv, codegen'd)
    * and DuckDB (md5 + hex fold). Deterministic — reruns, retries, and
    * different engines sample the SAME documents, which is what makes
    * a sampled training mix reproducible. */
  private val bucketSpark =
    "CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 100"

  private val bucketDuck =
    """list_reduce(list_prepend(0::BIGINT,
         list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
           c -> (CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
                      ELSE unicode(c) - 48 END)::BIGINT)),
       (a, d) -> a * 16 + d) % 100"""

  /** q51: stratified sampling — each source stratum keeps a different
    * deterministic fraction (mixing weights; here derived from the
    * source id: src<i> keeps 5·(i+1)%). The hash filter needs no
    * shuffle and no state: at 100 TB it runs entirely map-side inside
    * the scan's codegen stage, and the mix is reproducible across
    * reruns and engines. */
  def q51SampleStratified(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bucket", expr(bucketSpark))
      .withColumn("rate", expr("5 * (CAST(substr(source, 4, 10) AS INT) + 1)"))
      .filter(col("bucket") < col("rate"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
      .orderBy("source")

  val q51Sql: String =
    s"""SELECT source, count(*) AS n_kept, sum(n_chars)::BIGINT AS chars_kept
      FROM (SELECT source, n_chars, $bucketDuck AS bucket,
              5 * (CAST(substr(source, 4, 10) AS INT) + 1) AS rate
            FROM documents)
      WHERE bucket < rate
      GROUP BY source ORDER BY source"""

  /** q52: dedup-apply — materialize the CLEANED corpus from the exact
    * dedup decision (q20's lowest-id-winner rule) and profile it by
    * language. One hash aggregation over content hashes plus one
    * semi-join on doc_id; the winner set never broadcasts by
    * assumption (at 100 TB it is ~corpus-sized), so the plan is the
    * shuffle-both-sides semi-join that scales. */
  def q52DedupApply(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val winners = d
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep"))
      .select(col("keep"))
    d.join(winners, d("doc_id") === winners("keep"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  val q52Sql: String =
    """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
      FROM documents
      WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
      GROUP BY lang ORDER BY lang"""

  /** q55: corpus-wide global ranking through the RANGE-PARTITIONED
    * two-pass shape ([[graft.functions.DistributedRank]]) instead of a
    * single-partition window sort — the form that still scales when the
    * corpus is 100 TB (sampled range bounds, per-partition offsets, no
    * global funnel). The (n_chars, doc_id) order is unique, so the
    * numbering is deterministic and the plain-window oracle matches
    * exactly. Keeps only every 17th rank so the result stays small
    * while still spanning the whole range (any off-by-one in the offset
    * arithmetic shifts some kept rank). */
  def q55DistributedRank(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("n_chars"))
    graft.functions.DistributedRank
      .withRowNumber(d, Seq(col("n_chars"), col("doc_id")), "rn")
      .filter(pmod(col("rn"), lit(17)) === 1)
      .orderBy("rn")
  }

  val q55Sql: String =
    """SELECT doc_id, n_chars, rn FROM (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM documents)
      WHERE rn % 17 = 1 ORDER BY rn"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_sample_stratified" -> (q51SampleStratified _),
    "q52_dedup_apply" -> (q52DedupApply _),
    "q55_distributed_rank" -> (q55DistributedRank _))

  val oracles: Map[String, String] = Map(
    "q51_sample_stratified" -> q51Sql,
    "q52_dedup_apply" -> q52Sql,
    "q55_distributed_rank" -> q55Sql)
}
