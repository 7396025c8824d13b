package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational5
import graft.sources.Tables

class Relational5Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q44 winner equals the brute-force quarterly revenue max; no cartesian") {
    val df = Relational5.q44TopSupplier(spark, sf)
    val rows = df.select($"s_suppkey", $"total_revenue").as[(Long, Double)].collect()
    assert(rows.nonEmpty, "q44 must crown at least one supplier")

    // driver-side recompute in cents (exact): revenue per supplier in window
    val li = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .select($"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
    // mirror the DECIMAL(12,2) * DECIMAL(4,2) arithmetic: price in cents x
    // discount in hundredths -> exact integral ten-thousandths
    val rev = li.groupBy(_._1).view.mapValues(_.map { case (_, p, d) =>
      math.round(p * 100) * (100L - math.round(d * 100))
    }.sum).toMap
    val maxRev = rev.values.max
    val expect = rev.filter(_._2 == maxRev).keySet
    assert(rows.map(_._1).toSet == expect)
    rows.foreach { case (_, tot) =>
      assert(math.round(tot * 10000) == maxRev, s"revenue $tot != $maxRev/10000")
    }
    // the revenue aggregate feeds both the rows side and its own max:
    // ReuseExchange must collapse the identical subtrees so the fact table
    // scans exactly once in the final plan (materialize df itself first —
    // AQE only finalizes reuse on the executed plan)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("ReusedExchange"), s"revenue exchange must be reused:\n$plan")
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"exactly one lineitem scan expected:\n$plan")
  }

  test("q45 nation rollup equals an exact-cents threshold + never-urgent recompute") {
    val df = Relational5.q45QuietWealth(spark, sf)
    val rows = df.select($"c_nationkey", $"numcust", $"totacctbal")
      .as[(Int, Long, Double)].collect()
    assert(rows.nonEmpty, "q45 must keep some quiet-wealth customers")

    val cust = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
      .as[(Long, Int, Double)].collect()
    val centsOf = (b: Double) => math.round(b * 100)
    val pos = cust.map(c => centsOf(c._3)).filter(_ > 0)
    val nPos = pos.length.toLong
    val totPos = pos.sum
    val urgent = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").as[Long].collect().toSet
    val kept = cust.filter(c => centsOf(c._3) * nPos > totPos && !urgent(c._1))
    val expect = kept.groupBy(_._2).view.mapValues { cs =>
      (cs.length.toLong, cs.map(c => centsOf(c._3)).sum)
    }.toMap
    val got = rows.map(r => r._1 -> ((r._2, math.round(r._3 * 100)))).toMap
    assert(got == expect, s"got=$got expect=$expect")

    // the never-urgent test must be a real anti join, the threshold a
    // broadcast 1-row aggregate — never a per-row subquery or cartesian
    // blow-up of the fact side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS leg must be an anti join:\n$plan")
  }

  test("q46 dominant suppliers equal the flat recompute; single scan via exchange reuse") {
    val df = Relational5.q46DominantSuppliers(spark, sf)
    val rows = df.select($"s_suppkey", $"n_dominant_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty, "q46 must find dominant suppliers")

    val li = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .as[(Long, Long, Double)].collect()
    val ps = li.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val byPart = ps.toSeq.groupBy(_._1._1)
    val expect = ps.toSeq.filter { case ((pk, _), q) =>
      val grp = byPart(pk)
      q * grp.length > 3 * grp.map(_._2).sum
    }.groupBy(_._1._2).view.mapValues(_.length.toLong).toMap
    assert(rows.toMap == expect)

    // the shipped flat form reuses the (partkey, suppkey) aggregate
    // exchange for its own rollup: one fact scan total
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange"), s"ps exchange must be reused:\n$plan")
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"exactly one lineitem scan expected:\n$plan")
  }

  test("q46 correlated-HAVING face matches the shipped flat form and decorrelates") {
    val flat = Relational5.q46DominantSuppliers(spark, sf)
      .select($"s_suppkey", $"n_dominant_parts").as[(Long, Long)].collect().toMap
    val corr = Relational5.q46Correlated(spark, sf)
    val got = corr.select($"s_suppkey", $"n_dominant_parts").as[(Long, Long)].collect().toMap
    assert(got == flat, "correlated wording must agree with the flat form")
    // both correlated scalar aggregates must decorrelate to grouped
    // aggregates + equi-joins — no nested-loop, no cartesian, no per-row
    // subquery re-execution
    val plan = corr.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"correlated aggregates must decorrelate to joins:\n$plan")
  }

  test("q47 keeps exactly the min-unit-cost suppliers per small part") {
    val df = Relational5.q47CheapestSupplier(spark, sf)
    val rows = df.select($"p_partkey", $"s_suppkey", $"unit_cost")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty, "q47 must match suppliers for small parts")

    val smallParts = Tables.part(spark, sf).filter($"p_size" <= 10)
      .select($"p_partkey").as[Long].collect().toSet
    val li = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
      .as[(Long, Long, Double, Double)].collect()
    val cost = li.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(t => t._3 / t._4).min).toMap
    val minPerPart = cost.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).min).toMap
    val expect = cost.toSeq.collect {
      case ((pk, sk), uc) if smallParts(pk) && uc == minPerPart(pk) => (pk, sk, uc)
    }.toSet
    assert(rows.toSet == expect,
      s"only-got=${rows.toSet -- expect} only-exp=${expect -- rows.toSet}")

    // decorrelated to aggregate + join, with the cost CTE's exchange reused
    // between its two consumers: one fact scan total
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"correlated min must decorrelate to an aggregate + join:\n$plan")
    assert(plan.contains("ReusedExchange"), s"cost exchange must be reused:\n$plan")
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"exactly one lineitem scan expected:\n$plan")
  }

  test("q54 bag set ops carry multiplicities: min for intersect, difference for except") {
    val got = Relational5.q54BagSetOps(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", year($"o_orderdate")).as[(Long, Int)].collect()
    val a = orders.filter(_._2 == 1995).map(_._1)
    val b = orders.filter(_._2 == 2000).map(_._1)
    val ca = a.groupBy(identity).view.mapValues(_.length).toMap
    val cb = b.groupBy(identity).view.mapValues(_.length).toMap
    def stats(bag: Iterable[(Long, Int)]): (Long, Long) = {
      val pairs = bag.toSeq
      (pairs.map(_._2.toLong).sum, pairs.map { case (k, n) => k * n }.sum)
    }
    val inter = stats(ca.map { case (k, n) => k -> math.min(n, cb.getOrElse(k, 0)) })
    val except = stats(ca.map { case (k, n) => k -> math.max(0, n - cb.getOrElse(k, 0)) })
    val union = stats((ca.keySet ++ cb.keySet).map(k => k -> (ca.getOrElse(k, 0) + cb.getOrElse(k, 0))))
    assert(got("intersect_all") == inter, s"intersect: ${got("intersect_all")} vs $inter")
    assert(got("except_all") == except, s"except: ${got("except_all")} vs $except")
    assert(got("union_all") == union, s"union: ${got("union_all")} vs $union")
    // multiplicity matters: the bag intersection must exceed the distinct
    // one whenever any customer repeats in both years
    val distinctInter = ca.keySet.intersect(cb.keySet).size.toLong
    assert(inter._1 >= distinctInter)
  }

  test("q51 bilateral volumes are symmetric-pair-complete and cents-exact") {
    val rows = Relational5.q51TradeVolume(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // only the two pair directions may appear, never a self-pair (at
    // sf0.001 one direction may be absent — the oracle at sf0.01 covers
    // the complete result)
    val dirs = rows.map(r => (r._1, r._2)).distinct.toSet
    assert(dirs.nonEmpty &&
      dirs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))), s"$dirs")
    // cents-exact recompute of one direction-year cell
    val (cn, sn, yr, rev) = rows.head
    val nk = Tables.nation(spark, sf).select($"n_name", $"n_nationkey")
      .as[(String, Long)].collect().toMap
    val custs = Tables.customer(spark, sf)
      .filter($"c_nationkey" === nk(cn)).select($"c_custkey").as[Long].collect().toSet
    val supps = Tables.supplier(spark, sf)
      .filter($"s_nationkey" === nk(sn)).select($"s_suppkey").as[Long].collect().toSet
    val orderCust = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect().toMap
    val cents = Tables.lineitem(spark, sf)
      .filter(year($"l_shipdate") === yr)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Long, Double, Double)].collect()
      .filter(l => supps(l._2) && custs(orderCust(l._1)))
      .map { case (_, _, p, d) => math.round(p * 100) * (100L - math.round(d * 100)) }
      .sum
    assert(math.round(rev * 10000) == cents, s"$cn->$sn @$yr: $rev vs $cents/10000")
  }

  test("q52 market shares are in (0,1) and denominator-consistent per year") {
    val rows = Relational5.q52MarketShare(spark, sf).as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (y, s) => assert(s >= 0.0 && s <= 1.0, s"year $y share $s") }
    // at least one year must have nonzero share (the supplier nation trades)
    assert(rows.exists(_._2 > 0.0))
  }

  test("q50 recursive BOM explosion equals an iterative driver traversal") {
    val rows = Relational5.q50RecursiveBom(spark, sf)
      .as[(Int, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice").as[(Long, Double)].collect().toMap
    // iterative BFS over parent(k) = floor(k/2): the independent recompute
    val byDepth = collection.mutable.Map.empty[Int, Seq[Long]]
    var frontier = Seq(1L).filter(parts.contains)
    var depth = 0
    while (frontier.nonEmpty) {
      byDepth(depth) = frontier
      frontier = frontier.flatMap(pk => Seq(pk * 2, pk * 2 + 1))
        .filter(k => k >= 2 && parts.contains(k))
      depth += 1
    }
    val expect = byDepth.toSeq.sortBy(_._1).map { case (d, ks) =>
      (d, ks.length.toLong,
        ks.map(k => math.round(parts(k) * 100)).sum / 100.0)
    }
    assert(rows.map(r => (r._1, r._2, math.rint(r._3 * 100) / 100)) == expect,
      s"got=$rows exp=$expect")
    // the hierarchy must actually recurse past a trivial depth
    assert(rows.length >= 8, s"expected a deep tree, got ${rows.length} levels")
  }

  test("q49 groups NULL as one row and counts skip NULLs") {
    val rows = Relational5.q49NullSemantics(spark, sf)
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // exactly one NULL group, and it must be first under NULLS FIRST
    assert(rows.count(_._1.isEmpty) == 1, "NULL bucket must aggregate as ONE group")
    assert(rows.head._1.isEmpty, "NULLS FIRST must place the NULL group first")
    val nullGrp = rows.head
    assert(nullGrp._3 == 0L, "count(big) must skip NULLs entirely")
    assert(nullGrp._2 > 0L, "count(*) must still count the rows")
    // non-null groups: every row carries a big value
    rows.tail.foreach { g => assert(g._2 == g._3, s"group ${g._1}") }
  }

  test("q48 ignore-nulls value windows equal a driver-side running recompute") {
    val res = Relational5.q48ValueWindows(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"first_big", $"recent_big", $"second_big")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(res.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")), $"o_totalprice")
      .as[(Long, Long, Long, Double)].collect()
    val expect = orders.groupBy(_._1).flatMap { case (cust, os) =>
      val sorted = os.sortBy(o => (o._3, o._2))
      sorted.indices.map { i =>
        val bigs = sorted.take(i + 1).map(_._4).filter(_ > 150000)
        (cust, sorted(i)._2, bigs.headOption, bigs.lastOption,
          if (bigs.length >= 2) Some(bigs(1)) else None)
      }
    }.toSet
    assert(res.toSet == expect,
      s"only-got=${res.toSet -- expect} only-exp=${expect -- res.toSet}")
  }
}
