package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GroupTopK
import graft.sources.Tables

/** The aggregate top-k must equal the window top-k row for row, while
  * planning as a partial-merging aggregate (map-side heaps) with no
  * Window and no full-fact sort.
  */
class GroupTopKSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("aggregate top-3 equals the window row_number form exactly") {
    val agg = GroupTopK.q81GroupTopkAgg(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"p".desc, $"o_orderkey")
    val win = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey",
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("p"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"o_custkey", $"rank".cast("long"), $"o_orderkey",
        ($"p".cast("double") / 100.0).as("price"))
      .orderBy($"o_custkey", $"rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(agg.nonEmpty && agg == win)
  }

  test("plans as a partial-merging aggregate: no Window, no full-fact sort") {
    val df = GroupTopK.q81GroupTopkAgg(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"),
      s"the whole point is NOT being a window:\n$plan")
    assert(plan.contains("partial_topkby") ||
      "HashAggregate.*partial".r.findFirstIn(plan).isDefined ||
      plan.contains("ObjectHashAggregate"),
      s"map-side partial heaps expected:\n$plan")
    // the only Sort allowed is the final presentation orderBy, which
    // prints ABOVE (before) every aggregate in the top-down plan string;
    // a sort feeding the partials would print between the aggregates and
    // the scan, i.e. AFTER the first Aggregate occurrence
    val firstAgg = plan.indexOf("Aggregate")
    assert(firstAgg >= 0, s"aggregate expected:\n$plan")
    var s = plan.indexOf("Sort ")
    while (s >= 0) {
      assert(s < firstAgg,
        s"a Sort below the aggregates would be feeding the partials:\n$plan")
      s = plan.indexOf("Sort ", s + 1)
    }
  }

  test("heap state is bounded: buffer never exceeds k under adversarial merge order") {
    val a = new graft.functions.TypedAggregators.TopKBy(3)
    val big = (1L to 100L).map(i => (i, 1000L - i))
    val reduced = big.foldLeft(a.zero)(a.reduce)
    assert(reduced.size == 3)
    val merged = a.merge(reduced, big.take(50).foldLeft(a.zero)(a.reduce))
    assert(merged.size == 3)
    assert(a.finish(merged) == Seq((100L, 900L), (99L, 901L), (98L, 902L)))
    // tiebreak: equal scores resolve by ascending id
    val ties = Seq((5L, 3L), (5L, 1L), (5L, 2L), (5L, 4L))
    assert(a.finish(ties.foldLeft(a.zero)(a.reduce)) ==
      Seq((5L, 1L), (5L, 2L), (5L, 3L)))
  }
}
