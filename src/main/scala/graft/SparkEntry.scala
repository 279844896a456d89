package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01TpchQ1(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Relational2.queries ++
      graft.queries.FlsQueries.queries ++
      graft.queries.Dedup.queries ++ graft.queries.Similarity.queries ++
      graft.queries.TextAnalysis.queries ++ graft.queries.Multimodal.queries ++
      graft.queries.Streaming.queries ++ graft.queries.AsofJoin.queries ++
      graft.queries.Joins.queries ++
      graft.queries.Sampling.queries ++ graft.queries.Corpus.queries ++
      graft.queries.Graph.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Relational2.oracles ++
      graft.queries.FlsQueries.oracles ++
      graft.queries.Dedup.oracles ++ graft.queries.Similarity.oracles ++
      graft.queries.TextAnalysis.oracles ++ graft.queries.Multimodal.oracles ++
      graft.queries.Streaming.oracles ++ graft.queries.AsofJoin.oracles ++
      graft.queries.Joins.oracles ++
      graft.queries.Sampling.oracles ++ graft.queries.Corpus.oracles ++
      graft.queries.Graph.oracles
}
