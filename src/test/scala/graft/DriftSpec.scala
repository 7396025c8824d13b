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

  test("dataset diff classifies added/removed/changed/unchanged exactly") {
    val df = Drift.prepDatasetDiff(spark, sf)
    val got = df.as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)

    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val expect = docs.groupBy(_._2).view.mapValues { ds =>
      val ids = ds.map(_._1)
      val added = ids.count(_ % 10 == 7).toLong     // absent from prior
      val changed = ids.count(_ % 10 == 3).toLong   // stale text in prior
      (ids.length.toLong, added, 0L, changed,
        ids.length - added - changed)
    }.toMap
    got.foreach { case (src, n, a, r, c, u) =>
      assert((n, a, r, c, u) == expect(src), s"source $src")
    }
    // the diff join must carry digests, not text: no column named text in
    // the join operator's output
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(!j.output.map(_.name).contains("text"),
        s"diff join must be hash-projected: ${j.output.map(_.name)}")
    }
  }
}
