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

  test("q36 RANGE frame equals a brute-force 30-day rolling recompute") {
    val res = Relational4.q36RangeFrame(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"sum_30d", $"n_30d")
      .as[(Long, Long, Double, Long)].collect()
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate".cast("date"), lit("1970-01-01")).cast("long"),
        $"o_totalprice")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    assert(res.length.toLong == orders.values.map(_.length).sum.toLong)
    res.foreach { case (cust, key, sum30, n30) =>
      val grp = orders(cust)
      val day = grp.find(_._2 == key).get._3
      val inFrame = grp.filter(o => o._3 >= day - 30 && o._3 <= day)
      assert(n30 == inFrame.length.toLong, s"cust $cust order $key n_30d")
      // exact-decimal window sum vs cents-summed recompute
      val cents = inFrame.map(o => math.round(o._4 * 100)).sum
      assert(math.round(sum30 * 100) == cents, s"cust $cust order $key sum_30d")
    }
  }

  test("q39 rank ratios are per-customer consistent at entity-key cardinality") {
    val rows = Relational4.q39WindowHicard(spark, sf)
      .select($"o_custkey", $"quartile", $"pct_rank", $"cume")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, q, pr, cd) =>
      assert(q >= 1 && q <= 4, s"cust $c quartile $q out of range")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
    }
    val byCust = rows.groupBy(_._1)
    byCust.foreach { case (c, rs) =>
      // a unique ordering makes cume_dist hit exactly i/n and percent_rank
      // (i-1)/(n-1); the max of each must close at 1.0
      assert(rs.map(_._4).max == 1.0, s"cust $c cume must reach 1.0")
      if (rs.length > 1) assert(rs.map(_._3).max == 1.0)
    }
    // parallelism claim: the partition count equals the customer count scale,
    // not a handful of priorities — every customer forms its own window group
    assert(byCust.size > 100, s"expected high-cardinality keys, got ${byCust.size}")
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

  test("q43 decorrelates both EXISTS legs to semi/anti joins; brute-force parity") {
    val df = Relational4.q43LateSuppliers(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "q43 should flag some suppliers at this SF")
    // plan pin: EXISTS -> left semi, NOT EXISTS -> left anti, both as real
    // joins on l_orderkey with the <>-suppkey residual — never a per-row
    // subquery re-execution, nested loop, or cartesian product
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"no nested-loop/cartesian fallback allowed:\n$plan")

    // brute-force differential: recompute the waiting set driver-side
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      .as[(Long, Long, String)].collect()
    val byOrder = li.groupBy(_._1)
    val finished = Tables.orders(spark, sf).filter($"o_orderstatus" === "F")
      .select($"o_orderkey").as[Long].collect().toSet
    val supp = Tables.supplier(spark, sf)
      .select($"s_suppkey", $"s_name", $"s_nationkey").as[(Long, String, Long)].collect()
      .map(s => s._1 -> (s._2, s._3)).toMap
    val nation = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap
    val expect = li.iterator
      .filter { case (ok, sk, rf) =>
        rf == "R" && finished(ok) && {
          val others = byOrder(ok).filter(_._2 != sk)
          others.nonEmpty && !others.exists(_._3 == "R")
        }
      }
      .map { case (_, sk, _) => val (name, nk) = supp(sk); (name, nation(nk)) }
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == expect, s"only-got=${got.toSet -- expect.toSet} only-exp=${expect.toSet -- got.toSet}")
  }
}
