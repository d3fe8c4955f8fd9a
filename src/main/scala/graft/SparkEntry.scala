package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here
  * (and, when SQL-expressible, a DuckDB oracle with IDENTICAL column
  * names and deterministic ordering).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Semantic search IS the engine's core capability: embed →
    * pruned scored scan → top-k → keyword rerank. */
  def entry(spark: SparkSession): DataFrame =
    operators.Search.qSearchSemantic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Ingest.queries ++
      operators.Search.queries ++ operators.TextAnalysis.queries ++
      operators.Dedup.queries ++ operators.Ann.queries ++
      operators.ResultAnalytics.queries ++ operators.Media.queries ++
      operators.Ci.queries ++ operators.Events.queries ++
      operators.Curation.queries ++ operators.Quality.queries ++
      operators.Hnsw.queries ++ operators.IncrementalIndex.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Ingest.oracles ++
      operators.Search.oracles ++ operators.TextAnalysis.oracles ++
      operators.Dedup.oracles ++ operators.Ann.oracles ++
      operators.ResultAnalytics.oracles ++ operators.Media.oracles ++
      operators.Ci.oracles ++ operators.Events.oracles ++
      operators.Curation.oracles ++ operators.Quality.oracles ++
      operators.Hnsw.oracles ++ operators.IncrementalIndex.oracles
}
