package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational4
import graft.sources.Tables

class Relational4Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q34 min_by/max_by winners achieve the group extremes with the documented tie-break") {
    val res = Relational4.q34MinmaxBy(spark, sf)
      .select($"o_orderpriority", $"best_key", $"worst_key", $"max_price", $"min_price")
      .as[(String, Long, Long, Double, Double)].collect()
    val orders = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1)
    assert(res.nonEmpty)
    res.foreach { case (prio, best, worst, maxP, minP) =>
      val grp = orders(prio)
      assert(maxP == grp.map(_._3).max && minP == grp.map(_._3).min)
      // struct ordering (price, key): max_by breaks price ties to the
      // LARGEST key, min_by to the SMALLEST
      val expBest = grp.filter(_._3 == maxP).map(_._2).max
      val expWorst = grp.filter(_._3 == minP).map(_._2).min
      assert(best == expBest, s"$prio best_key $best != $expBest")
      assert(worst == expWorst, s"$prio worst_key $worst != $expWorst")
    }
  }

  test("q35 SCD2 versions chain per customer: one current row, contiguous validity") {
    val res = Relational4.q35Scd2(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Long, String, String, Long)].collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(res.length.toLong == nOrders, "one version row per order")
    res.groupBy(_._1).foreach { case (cust, rows) =>
      assert(rows.count(_._5 == 1L) == 1, s"customer $cust current-row count")
      // chain in window order (valid_from, orderkey): each row's valid_to is
      // the next row's valid_from; the last is the open-ended sentinel.
      // 'yyyy-MM-dd HH:mm:ss' strings sort chronologically, so string sort
      // reproduces the window order.
      val chain = rows.sortBy(r => (r._3, r._2))
      chain.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"customer $cust gap: ${a._4} -> ${b._3}")
        case _ =>
      }
      assert(chain.last._4 == "9999-12-31 00:00:00" && chain.last._5 == 1L)
      chain.dropRight(1).foreach(r => assert(r._5 == 0L))
    }
  }
}
