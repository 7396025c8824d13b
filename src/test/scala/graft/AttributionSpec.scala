package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Attribution
import graft.sources.Tables

class AttributionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("the frame's order key is unique per user — 'last' is well-defined") {
    val dups = Tables.events(spark, sf)
      .groupBy($"user_id", $"ts").count().filter($"count" > 1).count()
    assert(dups == 0,
      "duplicate (user, ts) would make last-touch engine-dependent; " +
        "if the generator ever produces ties, the order key needs event_id folded in")
  }

  test("attribution equals a driver-side scan of each user's history") {
    val got = Attribution.eventsAttribution(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val byUser = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val credited = byUser.toSeq.flatMap { case (uid, evs) =>
      evs.filter(_._3 == "purchase").map { case (_, t, _) =>
        val chan = evs
          .filter(e => e._2 >= t - 7L * 86400 * 1000000 && e._2 < t &&
            e._3 != "purchase")
          .lastOption.map(_._3).getOrElse("organic")
        (uid, chan)
      }
    }
    val expect = credited.groupBy(_._2).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._1).distinct.size.toLong)
    }.toMap
    assert(got == expect, s"got=$got expect=$expect")
    assert(got.contains("organic") || got.size >= 2,
      "the corpus should exercise more than one channel")
  }

  test("linear multi-touch conserves credit mass and matches the history recompute") {
    val got = Attribution.eventsAttributionLinear(spark, sf)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((math.round(r._2 * 1e4), r._3))).toMap

    val byUser = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val credits = byUser.toSeq.flatMap { case (_, evs) =>
      evs.filter(_._3 == "purchase").toSeq.flatMap { case (_, t, _) =>
        val touches = evs.filter(e =>
          e._2 >= t - 7L * 86400 * 1000000 && e._2 < t && e._3 != "purchase")
        if (touches.isEmpty) Seq("organic" -> 1.0)
        else touches.toSeq.map(e => e._3 -> 1.0 / touches.size)
      }
    }
    val expect = credits.groupBy(_._1).view.mapValues { xs =>
      (math.round(xs.map(_._2).sum * 1e4), xs.size.toLong)
    }.toMap
    assert(got == expect, s"got=$got expect=$expect")
    // credit is conserved: total credit across channels = total purchases
    val nPurchases = byUser.values.flatten.count(_._3 == "purchase")
    val totalCredit = Attribution.eventsAttributionLinear(spark, sf)
      .agg(sum($"credit")).head().getDouble(0)
    assert(math.abs(totalCredit - nPurchases) < 1e-2,
      s"each purchase must distribute exactly 1.0: $totalCredit vs $nPurchases")
  }

  test("one events scan, one user-partition window — no purchase-history self-join") {
    val df = Attribution.eventsAttribution(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("events\\.parquet".r.findAllIn(plan).size == 1,
      s"one scan:\n$plan")
    assert(plan.contains("Window") && !plan.contains("Join"),
      s"window, not a self-join:\n$plan")
  }
}
