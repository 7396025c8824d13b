package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** The pure-SQL deployment face: everything this engine adds — codegen'd
  * expressions, registered via [[graft.GraftExtensions]] — reachable from
  * a `spark.sql(...)` string with NO Scala in the query path. This is the
  * Thrift-server / Spark Connect / notebook contract: the platform builds
  * the session with `spark.sql.extensions=graft.GraftExtensions`, users
  * write SQL, and the engine's functions are just there.
  *
  * Every other driver face exercises the DataFrame API; this one pins the
  * SQL-string path end-to-end with a hash-checked oracle, using two
  * engine-registered functions (`quality_score`, `language_id`) whose
  * DuckDB twins are GENERATED from the same constants the expressions
  * evaluate ([[OracleFragments.quality]] / [[OracleFragments.langidBest]])
  * — so this face also guards the registration plumbing: a function
  * silently missing from the registry fails the query, not just a spec.
  *
  * Scale shape: one documents scan, one hash aggregate — the functions
  * are codegen'd expressions inside the scan's WholeStageCodegen span,
  * exactly as they plan from the DataFrame API (spec-pinned equal plans).
  */
object SqlInterface {

  def q80SqlInterface(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT source,
        |  count(*) AS n_docs,
        |  round(avg(quality_score(text)), 4) AS avg_quality,
        |  sum(CAST(language_id(text) = lang AS BIGINT)) AS langid_agree
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin)
  }

  val q80Sql: String =
    s"""WITH scored AS (
       |  SELECT source, lang,
       |    ${OracleFragments.quality("text")} AS q,
       |    ${OracleFragments.langidBest(OracleFragments.tokens("text"))} AS b
       |  FROM documents)
       |SELECT source,
       |  count(*) AS n_docs,
       |  round(avg(q), 4) AS avg_quality,
       |  CAST(sum(CAST((${OracleFragments.langidPredicted("b")}) = lang
       |    AS BIGINT)) AS BIGINT) AS langid_agree
       |FROM scored
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_sql_interface" -> (q80SqlInterface _))

  val oracles: Map[String, String] = Map(
    "q80_sql_interface" -> q80Sql)
}
