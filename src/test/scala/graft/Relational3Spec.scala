package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational3
import graft.sources.Tables

class Relational3Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("exact-moment stats agree with Spark's native corr/stddev to 1e-9") {
    val exact = Relational3.q30StatsMoments(spark, sf)
      .select($"l_returnflag", $"stddev_qty", $"corr_qty_price")
      .as[(String, Double, Double)].collect()
      .map { case (k, s, c) => k -> ((s, c)) }.toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(stddev_samp($"l_quantity").as("s"),
        corr($"l_quantity", $"l_extendedprice").as("c"))
      .as[(String, Double, Double)].collect()
    native.foreach { case (flag, s, c) =>
      val (es, ec) = exact(flag)
      assert(math.abs(es - s) < 1e-9 * math.max(1, math.abs(s)),
        s"$flag stddev exact=$es native=$s")
      assert(math.abs(ec - c) < 1e-9, s"$flag corr exact=$ec native=$c")
    }
  }

  test("exact-moment regression agrees with native regr_slope/intercept/r2") {
    val exact = Relational3.q38Regression(spark, sf)
      .select($"l_returnflag", $"slope", $"intercept", $"r2")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("s"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("i"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r"))
      .as[(String, Double, Double, Double)].collect()
    assert(native.nonEmpty)
    native.foreach { case (flag, s, i, r) =>
      val (es, ei, er) = exact(flag)
      assert(math.abs(es - s) < 1e-9 * math.max(1, math.abs(s)),
        s"$flag slope exact=$es native=$s")
      assert(math.abs(ei - i) < 1e-9 * math.max(1, math.abs(i)),
        s"$flag intercept exact=$ei native=$i")
      assert(math.abs(er - r) < 1e-9, s"$flag r2 exact=$er native=$r")
    }
  }

  test("pivot with enumerated values plans a single aggregate, no value-discovery job") {
    val plan = Relational3.q27Pivot(spark, sf).queryExecution.optimizedPlan.toString
    // enumerated pivot lowers to exactly two chained Aggregates ((flag,status)
    // partial + pivotfirst) inside ONE job; value discovery would show up as a
    // separate Distinct/collect before this plan could even be built
    assert(plan.split("\\bAggregate\\b").length - 1 == 2, s"unexpected plan:\n$plan")
    assert(plan.contains("pivotfirst"), s"no pivotfirst:\n$plan")
  }

  test("unpivot plans an Expand, not a union of re-scans") {
    val analyzed = Relational3.q28Unpivot(spark, sf).queryExecution.analyzed.toString
    assert(analyzed.contains("Expand"), s"no Expand node:\n$analyzed")
    assert(!analyzed.contains("Union"), s"unexpected Union:\n$analyzed")
  }

  test("runtime bloom filter is injected into the lineitem side of q32") {
    val df = Relational3.q32BloomJoin(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
      s"no runtime bloom filter in plan:\n$opt")
    // and the filtered result still matches a plain (no-bloom) join
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000.0),
        $"l_orderkey" === $"o_orderkey")
      .count()
    assert(df.agg(sum($"n")).as[Long].head() == plain)
  }

  test("window extras are within-partition consistent") {
    val rows = Relational3.q31WindowExtras(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (prio, rs) =>
      val n = rs.length
      assert(rs.map(_._3).max <= 4 && rs.map(_._3).min >= 1)
      // quartile sizes differ by at most one (ntile contract)
      val sizes = rs.groupBy(_._3).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, s"$prio ntile sizes $sizes")
      assert(rs.map(_._4).max == 1.0 && rs.map(_._4).min == 0.0)
      assert(math.abs(rs.map(_._5).min - 1.0 / n) < 1e-12)
    }
  }
}
