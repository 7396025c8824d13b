package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RewriteRunningDistinct optimizer rule (injected via GraftExtensions,
  * active in the shared test session) must replace the O(distinct)-state
  * collect_set running window with the constant-state first-occurrence sum
  * — without changing a single result row, including NULL keys, duplicate
  * keys, and order ties. */
class RewriteRunningDistinctSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val w = Window.partitionBy($"p").orderBy($"o", $"k")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  test("rewrite fires: no collect_set survives, results equal the brute-force recompute") {
    // dup keys, a NULL key, two partitions, repeated keys across positions
    val rows = Seq(
      ("a", 1, Some(10L)), ("a", 2, Some(10L)), ("a", 3, None),
      ("a", 4, Some(20L)), ("a", 5, Some(10L)), ("a", 6, Some(30L)),
      ("b", 1, Some(7L)), ("b", 2, None), ("b", 3, Some(7L)), ("b", 4, Some(8L)))
    val df = rows.toDF("p", "o", "k")
      .select($"p", $"o", $"k", size(collect_set($"k").over(w)).as("run_dist"))

    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set"), s"rule must remove collect_set:\n$plan")
    assert(plan.contains("row_number"), s"rewritten form uses row_number:\n$plan")

    val got = df.as[(String, Int, Option[Long], Int)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.indices.foreach { i =>
        val expect = sorted.take(i + 1).flatMap(_._3).distinct.size
        assert(got((p, sorted(i)._2)) == expect, s"($p, o=${sorted(i)._2})")
      }
    }
  }

  test("direct array consumers are NOT rewritten") {
    val df = Seq(("a", 1, 10L), ("a", 2, 20L)).toDF("p", "o", "k")
      .select($"p", $"o", collect_set($"k").over(w).as("seen"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("collect_set"),
      s"an actual array request must keep collect_set:\n$plan")
    val r = df.orderBy($"o").as[(String, Int, Seq[Long])].collect()
    assert(r(1)._3.sorted == Seq(10L, 20L))
  }

  test("mixed window lists: only the size(collect_set) expression is rewritten") {
    val df = Seq(("a", 1, 10L), ("a", 2, 10L), ("a", 3, 20L)).toDF("p", "o", "k")
      .select($"p", $"o",
        size(collect_set($"k").over(w)).as("run_dist"),
        sum($"k").over(w).as("run_sum"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set"), plan)
    val got = df.orderBy($"o").as[(String, Int, Int, Long)].collect().toSeq
    assert(got.map(r => (r._3, r._4)) == Seq((1, 10L), (1, 20L), (2, 40L)))
  }

  test("q55's shipped query runs rewritten in an extensions session, same results") {
    val df = graft.queries.Relational5.q55DistinctWindow(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set"),
      s"q55 must run the constant-state form under the rule:\n$plan")
    // spot-check monotone non-decreasing running counts per priority
    val rows = df.as[(String, Long, Long)].collect().groupBy(_._1)
    rows.foreach { case (prio, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3)
      assert(sorted.head >= 1L, prio)
    }
  }
}
