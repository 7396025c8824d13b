package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CommandReduce, Pipeline, TextFile}
import graft.sources.Tables

/** MaRe-style containerized-pipe queries, surfaced as oracle-checkable
  * DataFrames. These exercise the reference's core capability — partition-level
  * external commands (map + tree reduce) — against the DuckDB oracle, the same
  * differential pattern the reference tests use
  * (`/root/reference/src/test/scala/se/uu/it/mare/MaReTest.scala:17-27`:
  * container result vs native-Spark oracle). */
object PipeQueries {

  /** Total vowel count across all documents, computed by piping partitions
    * through POSIX tools: per-partition `grep|wc` count, then an `awk`-summing
    * tree reduce (depth 3 → exercises the multi-round merge schedule). */
  def pipeVowelCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"text").as[String]
    val counts = Pipeline(docs)
      .mapPartitionsThrough(
        TextFile("/in.txt"), TextFile("/out.txt"),
        "grep -o '[aeiou]' in.txt | wc -l > out.txt")
      .treeReduce(
        TextFile("/in.txt"), TextFile("/out.txt"),
        "awk '{s+=$1} END {print s}' in.txt > out.txt",
        depth = 3)
    counts.ds.map(_.trim.toLong).toDF("total_vowels")
  }

  val pipeVowelCountSql: String =
    """SELECT CAST(sum(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT)
      |  AS total_vowels
      |FROM documents""".stripMargin

  /** Per-source line filtering through a pipe: keep documents whose text
    * contains the word "spark" (grep as the filter operator, run per
    * partition), then count survivors per source natively. The pipe carries
    * "source\ttext" records so the external filter can pass the key through. */
  def pipeGrepFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = Tables.documents(spark, dir)
      .selectExpr("concat(source, '\t', text) AS rec").as[String]
    // match only in the text field (after the tab), not in the source key —
    // awk field test rather than whole-line grep, and POSIX-portable
    val kept = Pipeline(recs)
      .mapPartitionsThrough(
        TextFile("/in.txt"), TextFile("/out.txt"),
        "awk -F'\\t' 'index($2, \"spark\") > 0' in.txt > out.txt; true")
    kept.ds
      .map(_.takeWhile(_ != '\t'))
      .toDF("source")
      .groupBy("source").count().withColumnRenamed("count", "n_spark_docs")
      .orderBy("source")
  }

  val pipeGrepFilterSql: String =
    """SELECT source, count(*) AS n_spark_docs
      |FROM documents
      |WHERE text LIKE '%spark%'
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Containerized reduce INSIDE relational groupBy: per-returnflag quantity
    * sums where the per-group combiner is an external `awk` command run by
    * [[graft.operators.CommandReduceAgg]] (TypedImperativeAggregate →
    * ObjectHashAggregate: partial buffers map-side, command batches of ≤64k
    * records, shuffled partials merged and reduced once more at eval). The
    * reference can only reduce a whole dataset to one value per job; this
    * composes the same command contract with grouped aggregation. */
  def pipeGroupReduce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        $"l_quantity".cast("long").cast("string").as("rec"))
    recs.groupBy($"l_returnflag")
      .agg(element_at(
        CommandReduce.commandReduce(
          $"rec", "awk '{s+=$1} END {print s}' in.txt > out.txt",
          batchSize = 65536), 1)
        .cast("long").as("qty_sum"))
      .orderBy($"l_returnflag")
  }

  // quantities are integral doubles, so the BIGINT cast is exact in both
  // engines (DuckDB rounds, Spark truncates — identical on integral values)
  val pipeGroupReduceSql: String =
    """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_vowel_count" -> (pipeVowelCount _),
    "pipe_grep_filter" -> (pipeGrepFilter _),
    "pipe_group_reduce" -> (pipeGroupReduce _))

  val oracles: Map[String, String] = Map(
    "pipe_vowel_count" -> pipeVowelCountSql,
    "pipe_grep_filter" -> pipeGrepFilterSql,
    "pipe_group_reduce" -> pipeGroupReduceSql)
}
