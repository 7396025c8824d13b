package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Attribution, Bm25, BpeVocab, DataPipeline, Dedup, DedupRewrite, Drift, EventsQueries, EventsSketches, Expectations, GraphQueries, GroupTopK, IncrementalGraph, InvertedIndex, IvfIndex, MalformedInput, MaterializedAgg, Multimodal, PipeQueries, Profiling, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Relational7, Resample, SimilaritySearch, SqlInterface, TextAnalysis, ZoneScan}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2.B); `oracleSql` holds
  * the DuckDB-equivalent SQL for every hash-checkable query. Queries whose
  * semantics aren't ANSI-SQL-expressible (LSH, SimHash, pipes through external
  * commands, ...) are present in `queries` only → driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++ Relational4.queries ++ Relational5.queries ++ Relational6.queries ++ Relational7.queries ++ MalformedInput.queries ++ PipeQueries.queries ++ Dedup.queries ++
      DedupRewrite.queries ++ SimilaritySearch.queries ++ IvfIndex.queries ++ TextAnalysis.queries ++ BpeVocab.queries ++ Multimodal.queries ++
      EventsQueries.queries ++ EventsSketches.queries ++ Resample.queries ++ DataPipeline.queries ++ Expectations.queries ++ Drift.queries ++ MaterializedAgg.queries ++ ZoneScan.queries ++ GraphQueries.queries ++ IncrementalGraph.queries ++ InvertedIndex.queries ++ Bm25.queries ++ SqlInterface.queries ++ Profiling.queries ++ GroupTopK.queries ++ Attribution.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++ Relational4.oracles ++ Relational5.oracles ++ Relational6.oracles ++ Relational7.oracles ++ MalformedInput.oracles ++ PipeQueries.oracles ++ Dedup.oracles ++
      DedupRewrite.oracles ++ SimilaritySearch.oracles ++ IvfIndex.oracles ++ TextAnalysis.oracles ++ BpeVocab.oracles ++ Multimodal.oracles ++
      EventsQueries.oracles ++ EventsSketches.oracles ++ Resample.oracles ++ DataPipeline.oracles ++ Expectations.oracles ++ Drift.oracles ++ MaterializedAgg.oracles ++ ZoneScan.oracles ++ GraphQueries.oracles ++ IncrementalGraph.oracles ++ InvertedIndex.oracles ++ Bm25.oracles ++ SqlInterface.oracles ++ Profiling.oracles ++ GroupTopK.oracles ++ Attribution.oracles
}
