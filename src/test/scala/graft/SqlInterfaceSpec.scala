package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}
import graft.queries.SqlInterface
import graft.sources.Tables

/** The SQL-string path must be the SAME engine as the DataFrame path:
  * identical results, functions resolved from the extensions-injected
  * registry, one scan + one aggregate with the expressions inside codegen.
  */
class SqlInterfaceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q80 via SQL equals the identical DataFrame-API query, row for row") {
    val viaSql = SqlInterface.q80SqlInterface(spark, sf)
      .as[(String, Long, Double, Long)].collect().toSeq
    val viaDf = Tables.documents(spark, sf)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(TF.qualityScore($"text")), 4).as("avg_quality"),
        sum((TF.languageId($"text") === $"lang").cast("long"))
          .as("langid_agree"))
      .orderBy($"source")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(viaSql.nonEmpty && viaSql == viaDf)
  }

  test("the engine functions resolve from the extensions registry in plain SQL") {
    Tables.registerAll(spark, sf)
    // a registry miss makes THIS throw AnalysisException, not just fail a pin
    val row = spark.sql(
      "SELECT quality_score('some clean text here'), language_id('the of and a to in is')")
      .head()
    assert(row.getDouble(0) >= 0.0 && row.getDouble(0) <= 1.0)
    assert(row.getString(1) == "en")
  }

  test("SQL path plans one scan + one aggregate, functions inside codegen") {
    val df = SqlInterface.q80SqlInterface(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("documents\\.parquet".r.findAllIn(plan).size == 1,
      s"one documents scan:\n$plan")
    // codegen stages print as `*(n)` prefixes in the compact plan form
    assert(plan.contains("HashAggregate") && plan.contains("*(1)"),
      s"hash aggregate inside a codegen stage expected:\n$plan")
    assert(plan.contains("quality_score") && plan.contains("language_id"),
      s"engine expressions must evaluate inside the aggregate, not a UDF wrapper:\n$plan")
  }
}
