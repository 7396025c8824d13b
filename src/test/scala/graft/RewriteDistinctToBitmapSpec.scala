package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RewriteDistinctToBitmap
import graft.sources.Tables

/** Differentials for the opt-in count(DISTINCT integral) → bitmap
  * aggregation rewrite. Every test restores the flag, so suite ordering
  * cannot leak the opt-in into other specs. */
class RewriteDistinctToBitmapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def withFlag[A](on: Boolean)(body: => A): A = {
    val key = RewriteDistinctToBitmap.ConfKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def optimizedStr(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("grouped distinct count: rewritten plan, identical results") {
    def q = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
    val off = withFlag(false)(q.as[(String, Long)].collect().toMap)
    withFlag(true) {
      val df = q
      assert(optimizedStr(df).contains("bitmap_construct_agg"),
        s"rule must fire on the eligible shape:\n${optimizedStr(df)}")
      assert(df.as[(String, Long)].collect().toMap == off)
    }
  }

  test("global distinct count over empty input yields 0, not null") {
    withFlag(true) {
      val df = Tables.events(spark, sf)
        .filter($"event_type" === "no_such_type")
        .agg(countDistinct($"user_id").as("n"))
      assert(optimizedStr(df).contains("bitmap_construct_agg"))
      assert(df.as[Long].collect().toSeq == Seq(0L))
    }
  }

  test("NULL and negative keys round-trip exactly") {
    val data = Seq[(String, Option[Long])](
      ("a", Some(-5L)), ("a", Some(-5L)), ("a", Some(Long.MinValue / 2)),
      ("a", None), ("a", Some(0L)), ("b", None), ("b", None),
      ("c", Some(7L)), ("c", Some(-7L)), ("c", Some(7L)))
      .toDF("g", "k")
    def q = data.groupBy($"g").agg(countDistinct($"k").as("n"))
    val off = withFlag(false)(q.as[(String, Long)].collect().toMap)
    assert(off == Map("a" -> 3L, "b" -> 0L, "c" -> 2L))
    withFlag(true) {
      val df = q
      assert(optimizedStr(df).contains("bitmap_construct_agg"))
      assert(df.as[(String, Long)].collect().toMap == off)
    }
  }

  test("sub-long integral keys are cast for the post-analysis bitmap exprs") {
    // the bitmap expressions want LongType and implicit casts only run at
    // analysis — an Int key must work end to end, not just match the rule
    val data = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 7), ("b", -3))
      .toDF("g", "k")
    def q = data.groupBy($"g").agg(countDistinct($"k").as("n"))
    val off = withFlag(false)(q.as[(String, Long)].collect().toMap)
    assert(off == Map("a" -> 2L, "b" -> 2L))
    withFlag(true) {
      val df = q
      assert(optimizedStr(df).contains("bitmap_construct_agg"))
      assert(df.as[(String, Long)].collect().toMap == off)
    }
  }

  test("flag off: plan untouched") {
    withFlag(false) {
      val df = Tables.events(spark, sf)
        .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      assert(!optimizedStr(df).contains("bitmap_construct_agg"))
    }
  }

  test("ineligible shapes stay on the stock plan") {
    withFlag(true) {
      // non-integral key
      val s = Tables.documents(spark, sf)
        .groupBy($"lang").agg(countDistinct($"source").as("n"))
      assert(!optimizedStr(s).contains("bitmap_construct_agg"))
      // mixed with another aggregate function
      val m = Tables.events(spark, sf)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n"), sum($"value").as("v"))
      assert(!optimizedStr(m).contains("bitmap_construct_agg"))
      // two DIFFERENT distinct keys
      val t = Tables.events(spark, sf)
        .agg(countDistinct($"user_id").as("a"),
          countDistinct($"event_id").as("b"))
      assert(!optimizedStr(t).contains("bitmap_construct_agg"))
      // results still correct on the stock path
      assert(m.count() > 0 && t.count() == 1)
    }
  }

  test("SQL face: user-written COUNT(DISTINCT) goes through the rewrite") {
    withFlag(true) {
      Tables.registerAll(spark, sf)
      val df = spark.sql(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY event_type")
      assert(optimizedStr(df).contains("bitmap_construct_agg"))
      val expect = withFlag(false) {
        spark.sql(
          "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY event_type")
          .as[(String, Long)].collect().toMap
      }
      assert(df.as[(String, Long)].collect().toMap == expect)
    }
  }
}
