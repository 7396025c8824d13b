package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Profiling
import graft.sources.Tables

class ProfilingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stats match a driver recompute on all three columns") {
    val got = Profiling.prepTableStats(spark, sf)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    val rows = Tables.lineitem(spark, sf)
      .select($"l_quantity".cast("long"), $"l_returnflag",
        to_date($"l_shipdate").cast("string"))
      .as[(Long, String, String)].collect()
    val n = rows.length.toLong
    assert(got("l_quantity") ==
      ((n, 0L, rows.map(_._1).distinct.length.toLong,
        rows.map(_._1).min.toString, rows.map(_._1).max.toString)))
    assert(got("l_returnflag") ==
      ((n, 0L, rows.map(_._2).distinct.length.toLong,
        rows.map(_._2).min, rows.map(_._2).max)))
    assert(got("l_shipdate") ==
      ((n, 0L, rows.map(_._3).distinct.length.toLong,
        rows.map(_._3).min, rows.map(_._3).max)))
  }

  test("profiling is ONE scan, not one per column (the anti-pattern it replaces)") {
    val df = Profiling.prepTableStats(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"one fact scan for all columns:\n$plan")
    assert(plan.contains("Expand"),
      s"exact multi-column NDV plans through one Expand:\n$plan")
  }

  test("approx variant: every NDV within ±2% of exact, other stats identical, and NO Expand in the plan") {
    val exact = Profiling.prepTableStats(spark, sf)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val approxDf = Profiling.prepTableStatsApprox(spark, sf)
    val approx = approxDf
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (col, (_, n, nulls, ndv, mn, mx)) =>
      val (_, an, anulls, andv, amn, amx) = approx(col)
      // everything except NDV is computed identically — exact equality
      assert((an, anulls, amn, amx) == ((n, nulls, mn, mx)),
        s"$col non-NDV stats must match exactly")
      // HLL++ at 5% rsd on these cardinalities: pin ±2% (the q20 protocol)
      assert(math.abs(andv - ndv) <= math.max(1L, math.ceil(ndv * 0.02).toLong),
        s"$col approx ndv $andv vs exact $ndv outside ±2%")
    }
    // the production win: the k-fold Expand of exact multi-countDistinct
    // is gone — each row is aggregated once however many columns profile
    val plan = approxDf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"one fact scan:\n$plan")
    assert(!plan.contains("Expand"),
      s"approx NDV must not plan an Expand:\n$plan")
  }
}
