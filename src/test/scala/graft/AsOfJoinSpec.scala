package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf
import graft.queries.EventsQueries

/** Differential + unit specs for the native as-of join operator
  * (custom LogicalPlan/Strategy/SparkPlan). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native as-of equals the union-window formulation on real data") {
    val native = EventsQueries.eventsAsofNative(spark, sf)
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    val window = EventsQueries.eventsAsofJoin(spark, sf)
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("as-of picks the latest at-or-before right row, null when none") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:00:20")),
      (3L, 20L, ts("2024-01-01 10:00:10")),
      (4L, 30L, ts("2024-01-01 10:00:10"))
    ).toDF("id", "k", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),
      (10L, ts("2024-01-01 10:00:05"), 2.0), // same instant as trade 1 -> wins (<=)
      (10L, ts("2024-01-01 10:00:15"), 3.0),
      (20L, ts("2024-01-01 10:00:30"), 9.0) // after trade 3 -> no match
    ).toDF("k", "qt", "price")
    val out = AsOf.join(trades, quotes, "k", "t", "qt")
      .select($"id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(2.0))
    assert(out(2L).contains(3.0))
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty) // key with no right rows at all
  }

  test("forward as-of picks the earliest at-or-after right row, null when none") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:00:20")),
      (3L, 20L, ts("2024-01-01 10:00:40")),
      (4L, 30L, ts("2024-01-01 10:00:10"))
    ).toDF("id", "k", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0), // before trade 1 -> skipped
      (10L, ts("2024-01-01 10:00:05"), 2.0), // same instant as trade 1 -> wins (>=)
      (10L, ts("2024-01-01 10:00:25"), 3.0),
      (20L, ts("2024-01-01 10:00:30"), 9.0)  // before trade 3 -> no match
    ).toDF("k", "qt", "price")
    val out = AsOf.joinForward(trades, quotes, "k", "t", "qt")
      .select($"id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(2.0))
    assert(out(2L).contains(3.0))
    assert(out(3L).isEmpty)  // key's rights are all strictly before
    assert(out(4L).isEmpty)  // key with no right rows at all
    // one right row can serve MANY left rows (no head consumption on match)
    val many = Seq((1L, 10L, ts("2024-01-01 09:00:00")),
      (2L, 10L, ts("2024-01-01 09:30:00"))).toDF("id", "k", "t")
    val one = Seq((10L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "qt", "price")
    val served = AsOf.joinForward(many, one, "k", "t", "qt")
      .select($"id", $"price").as[(Long, Option[Double])].collect().toMap
    assert(served(1L).contains(7.0) && served(2L).contains(7.0))
  }

  test("forward as-of equals a window formulation on real data") {
    val native = EventsQueries.eventsAsofForward(spark, sf)
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    // independent formulation: union purchases+signups, FIRST purchase ts in
    // the frame [current row, unbounded following] per user (purchases sort
    // after signups at identical ts via p_ts asc_nulls_last? — mirror of the
    // backward union trick, with min over the following frame)
    val ev = graft.sources.Tables.events(spark, sf)
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts", lit(null).cast("timestamp").as("p_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select(lit(null).cast("long").as("event_id"), $"user_id", $"ts", $"ts".as("p_ts"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
      .orderBy($"ts", $"p_ts".asc_nulls_first)
      .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ref = signups.unionByName(purchases)
      .withColumn("next_p", first($"p_ts", ignoreNulls = true).over(w))
      .filter($"event_id".isNotNull)
      .select($"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("signup_ts"),
        date_format($"next_p", "yyyy-MM-dd HH:mm:ss").as("next_purchase_ts"))
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(native == ref)
    assert(native.nonEmpty)
  }

  test("as-of survives repartitioned, unsorted inputs (requirements planned)") {
    val left = spark.range(0, 1000)
      .select($"id", ($"id" % 7).as("k"), ($"id" * 13 % 997).as("t"))
      .repartition(8)
    val right = spark.range(0, 300)
      .select(($"id" % 7).as("k"), ($"id" * 29 % 997).as("rt"), $"id".as("payload"))
      .repartition(5)
    val got = AsOf.join(left, right, "k", "t", "rt")
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    // oracle: brute force on the driver
    val rightRows = right.as[(Long, Long, Long)].collect()
    val leftRows = left.as[(Long, Long, Long)].collect()
    leftRows.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(id) == expect, s"row $id k=$k t=$t")
    }
  }

  test("as-of handles null keys and times without NPE (no match for nulls)") {
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-01 10:00:10"))),
      (2L, None, Some(ts("2024-01-01 10:00:10"))),
      (3L, Some(10L), None)
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 10:00:00")), 1.0),
      (None, Some(ts("2024-01-01 10:00:00")), 2.0),
      (Some(10L), None, 3.0)
    ).toDF("k", "qt", "price")
    val out = AsOf.join(left, right, "k", "t", "qt")
      .select($"id", $"price").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0)) // only the non-null right row matches
    assert(out(2L).isEmpty) // null left key -> no match
    assert(out(3L).isEmpty) // null left time -> no match
  }

  test("as-of with string keys is correct (buffer-reuse safety)") {
    val left = (1 to 200).map(i => (i.toLong, s"key_${i % 5}", i.toLong * 10))
      .toDF("id", "k", "t").repartition(4)
    val right = (1 to 50).map(j => (s"key_${j % 5}", j.toLong * 37 % 2000, j.toLong))
      .toDF("k", "rt", "payload").repartition(3)
    val got = AsOf.join(left, right, "k", "t", "rt")
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    val rightRows = (1 to 50).map(j => (s"key_${j % 5}", j.toLong * 37 % 2000, j.toLong))
    (1 to 200).foreach { i =>
      val k = s"key_${i % 5}"; val t = i.toLong * 10
      val expect = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(i.toLong) == expect, s"id=$i k=$k t=$t")
    }
  }

  test("as-of rejects sides sharing attribute ids") {
    val df = Seq((1L, 2L)).toDF("k", "t")
    val ex = intercept[IllegalArgumentException] {
      AsOf.join(df, df, "k", "t", "t")
    }
    assert(ex.getMessage.contains("share attributes"))
  }
}
