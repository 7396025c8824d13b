package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Drift
import graft.sources.Tables

class DriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("drift report equals a driver-side share recompute; single corpus scan") {
    val df = Drift.prepDrift(spark, sf)
    val rows = df.as[(String, Long, Long, Double, Double, Double, Int)].collect()
    assert(rows.nonEmpty)

    val docs = Tables.documents(spark, sf)
      .select($"lang", $"source").as[(String, String)].collect()
    val refCohort = (0 to 9).map(i => s"src$i").toSet
    val byLang = docs.groupBy(_._1)
    val totA = docs.count(d => refCohort(d._2)).toDouble
    val totB = docs.count(d => !refCohort(d._2)).toDouble
    rows.foreach { case (lang, nA, nB, sA, sB, drift, flag) =>
      val ds = byLang(lang)
      val (eA, eB) = (ds.count(d => refCohort(d._2)).toLong, ds.count(d => !refCohort(d._2)).toLong)
      assert((nA, nB) == ((eA, eB)), s"$lang counts")
      assert(sA == math.rint(eA / totA * 1e6) / 1e6, s"$lang share_a")
      assert(sB == math.rint(eB / totB * 1e6) / 1e6, s"$lang share_b")
      val d = math.abs(eA / totA - eB / totB)
      assert(drift == math.rint(d * 1e6) / 1e6, s"$lang drift")
      assert(flag == (if (d > 0.02) 1 else 0), s"$lang flag")
    }

    // denominators come from the aggregated counts, never a second corpus
    // scan: exactly one documents scan in the executed plan
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("documents\\.parquet".r.findAllIn(plan).size == 1,
      s"exactly one documents scan expected:\n$plan")
  }
}
