package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational7
import graft.sources.Tables

/** Differential recomputes + plan pins for the TPC-H-deck-completing
  * queries (q71-q78). Each test recomputes the answer driver-side with
  * plain Scala collections in exact integer/cents arithmetic, then pins the
  * plan shape that makes the query scale (broadcast dims, top-k heap, one
  * fact scan, pushed filters).
  */
class Relational7Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q71 matches driver recompute; top-10 is a bounded heap, customer broadcasts") {
    val df = Relational7.q71ShippingPriority(spark, sf)
    val got = df.select($"l_orderkey", $"revenue")
      .as[(Long, Double)].collect().map { case (k, r) => (k, math.round(r * 10000)) }

    val cutoff = java.sql.Timestamp.valueOf("1996-07-01 00:00:00")
    val building = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .as[Long].collect().toSet
    val ordOk = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(o => o._3.before(cutoff) && building(o._2)).map(_._1).toSet
    val expect = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .as[(Long, java.sql.Timestamp, Double, Double)].collect()
      .filter(l => l._2.after(cutoff) && ordOk(l._1))
      .groupBy(_._1).view
      // cents * (100 - disc%) keeps everything integral (prices have cents,
      // discounts are on a 0.01 grid) → exact at scale 1e-4
      .mapValues(_.map(l => math.round(l._3 * 100) * (100 - math.round(l._4 * 100))).sum)
      .toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    assert(got.toSeq == expect.map { case (k, v) => (k, v) },
      s"got=${got.toSeq} expect=$expect")

    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be a bounded heap, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"customer dim must broadcast:\n$plan")
  }

  test("q72 counts each qualifying order once (semi join, no DISTINCT crutch)") {
    val df = Relational7.q72OrderPriority(spark, sf)
    val got = df.as[(String, Long)].collect().toMap

    val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-04-01 00:00:00")
    val lines = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_shipdate")
      .as[(Long, java.sql.Timestamp)].collect().groupBy(_._1)
    val expect = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .filter(o => !o._2.before(lo) && o._2.before(hi))
      .filter { o =>
        val lateCut = o._2.getTime + 30L * 86400 * 1000
        lines.getOrElse(o._1, Array.empty).exists(_._2.getTime > lateCut)
      }
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    assert(got == expect, s"got=$got expect=$expect")

    val plan = planOf(df)
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
  }

  test("q73 local-supplier condition filters joined rows, all dims broadcast") {
    val df = Relational7.q73LocalSupplierVolume(spark, sf)
    val got = df.as[(String, Double)].collect()
      .map { case (n, r) => n -> math.round(r * 10000) }.toMap

    val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap
    val cust = Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey")
      .as[(Long, Int)].collect().toMap
    val suppNation = Tables.supplier(spark, sf).select($"s_suppkey", $"s_nationkey")
      .as[(Long, Int)].collect().toMap
    val ordCust = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(o => !o._3.before(lo) && o._3.before(hi))
      .map(o => o._1 -> o._2).toMap
    val expect = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Long, Double, Double)].collect()
      .flatMap { l =>
        ordCust.get(l._1).flatMap { ck =>
          val cn = cust(ck)
          if (suppNation(l._2) == cn) asiaNations.get(cn).map { nname =>
            nname -> (math.round(l._3 * 100) * (100 - math.round(l._4 * 100)))
          } else None
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == expect, s"got=$got expect=$expect")

    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"geo/customer/supplier dims must broadcast:\n$plan")
  }

  test("q74 pushes all predicates into the scan and reads only needed columns") {
    val df = Relational7.q74RevenueChange(spark, sf)
    val Array(row) = df.collect()

    val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val rows = Tables.lineitem(spark, sf)
      .select($"l_shipdate", $"l_quantity", $"l_extendedprice", $"l_discount")
      .as[(java.sql.Timestamp, Double, Double, Double)].collect()
      .filter { l =>
        val d = math.round(l._4 * 100)
        !l._1.before(lo) && l._1.before(hi) && l._2 < 24 && d >= 5 && d <= 7
      }
    val expectDelta = rows.map(l => math.round(l._3 * 100) * math.round(l._4 * 100)).sum
    assert(row.getAs[Long]("n_lines") == rows.length.toLong)
    assert(math.round(row.getAs[Double]("revenue_delta") * 10000) == expectDelta)

    val analyzed = df.queryExecution.sparkPlan.toString
    assert(analyzed.contains("PushedFilters") &&
      analyzed.contains("l_shipdate") && analyzed.contains("l_quantity"),
      s"date/quantity predicates must reach the parquet scan:\n$analyzed")
    // The scan must be pruned to the 4 referenced columns.
    assert(!analyzed.contains("l_orderkey"),
      s"column pruning must drop unreferenced lineitem columns:\n$analyzed")
  }

  test("q75 profit matches exact cents recompute; part/supplier broadcast") {
    val df = Relational7.q75ProductProfit(spark, sf)
    val got = df.as[(String, Int, Double)].collect()
      .map { case (n, y, p) => (n, y) -> math.round(p * 10000) }.toMap

    val redCost = Tables.part(spark, sf).filter($"p_name".like("%red%"))
      .select($"p_partkey", $"p_retailprice").as[(Long, Double)].collect()
      .map { case (k, c) => k -> math.round(c * 100) }.toMap
    val suppName = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name").as[(Long, String)].collect().toMap
    val ordYear = Tables.orders(spark, sf).select($"o_orderkey", year($"o_orderdate"))
      .as[(Long, Int)].collect().toMap
    val expect = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount", $"l_quantity")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .flatMap { l =>
        redCost.get(l._2).map { cost =>
          // rev at scale 1e-4 (cents * percent); cost*qty at 1e-2 → ×100
          val rev = math.round(l._4 * 100) * (100 - math.round(l._5 * 100))
          val c = cost * l._6.toLong * 100
          (suppName(l._3), ordYear(l._1)) -> (rev - c)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == expect, s"got=$got expect=$expect")

    val plan = planOf(df)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"part and supplier-geo must broadcast:\n$plan")
  }

  test("q76 threshold is exact: value*200 > total; no second fact scan") {
    val df = Relational7.q76ImportantSuppliers(spark, sf)
    val got = df.as[(Long, Double)].collect()
      .map { case (k, v) => k -> math.round(v * 10000) }

    val values = Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(l => math.round(l._2 * 100) * (100 - math.round(l._3 * 100))).sum)
      .toMap
    val total = values.values.sum
    val expect = values.filter { case (_, v) => v * 200 > total }
      .toSeq.sortBy { case (k, v) => (-v, k) }
    assert(got.toSeq == expect, s"got=${got.toSeq} expect=$expect")

    // the per-supplier aggregate feeds BOTH the detail side and the 1-row
    // total: the fact table must be scanned exactly once
    val plan = planOf(df)
    assert("lineitem\\.parquet".r.findAllIn(plan).size <= 2,
      s"the total must come from the grouped aggregate, not a full rescan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row total must broadcast-append, not cartesian:\n$plan")
  }

  test("q77 late-line counters ride one aggregate over one join") {
    val df = Relational7.q77LateByPriority(spark, sf)
    val got = df.as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val hi = Set("1-URGENT", "2-HIGH")
    val ords = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .map(o => o._1 -> ((o._2.getTime, o._3))).toMap
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    val expect = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_shipdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .flatMap { l =>
        val (odate, pri) = ords(l._1)
        if (l._2.getTime > odate + 60L * 86400 * 1000) {
          cal.setTimeInMillis(l._2.getTime)
          Some(cal.get(java.util.Calendar.YEAR) -> pri)
        } else None
      }
      .groupBy(_._1).view
      .mapValues(ps => (ps.count(p => hi(p._2)).toLong,
        ps.count(p => !hi(p._2)).toLong))
      .toMap
    assert(got == expect, s"got=$got expect=$expect")

    val plan = planOf(df)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1 &&
      "orders\\.parquet".r.findAllIn(plan).size == 1,
      s"one scan per table — CASE counters must share one aggregate:\n$plan")
  }

  test("q78 bridge dedups before the dim join; blacklist is a broadcast anti join") {
    val df = Relational7.q78PartsSupplier(spark, sf)
    val got = df.as[(String, String, Int, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap

    val sizes = Set(1, 14, 23, 45, 19, 3, 36, 9)
    val bad = Tables.supplier(spark, sf).filter($"s_acctbal" < 0)
      .select($"s_suppkey").as[Long].collect().toSet
    val dims = Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      .as[(Long, String, String, Int)].collect()
      .filter(p => p._2 != "Brand#45" && sizes(p._4))
      .map(p => p._1 -> ((p._2, p._3, p._4))).toMap
    val expect = Tables.lineitem(spark, sf).select($"l_partkey", $"l_suppkey")
      .as[(Long, Long)].collect().distinct
      .filter(p => !bad(p._2) && dims.contains(p._1))
      .groupBy(p => dims(p._1)).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(got == expect, s"got=$got expect=$expect")

    // Pin the STATIC plan: at sf0.001 the blacklist happens to be empty and
    // AQE (correctly) eliminates the anti join against an empty build side
    // at runtime — the shape under test is what the optimizer committed to.
    val static = df.queryExecution.sparkPlan.toString
    assert(static.contains("LeftAnti"),
      s"NOT IN on non-null keys must plan as an anti join:\n$static")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"part dim must broadcast:\n$plan")
  }
}
