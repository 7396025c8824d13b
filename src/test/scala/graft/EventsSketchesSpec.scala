package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventsSketches
import graft.sources.Tables

/** Pins the invariants DuckDB cannot oracle for events_hll_mergeable: the
  * unioned-daily estimate must equal the one-shot estimate (HLL_8 union is
  * an elementwise register max — same state as sketching the window
  * directly at equal lgK), re-union must be associative (split the days
  * any way, union the partials, same answer), and the estimate must sit
  * within HLL(lgK=12)'s error envelope of the exact count. */
class EventsSketchesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("union of daily sketches equals the one-shot sketch estimate") {
    val rows = EventsSketches.eventsHllMergeable(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, nDays, estUnion, estOneShot) =>
      assert(nDays > 1, s"$et: fixture must span multiple days for the union to mean anything")
      assert(estUnion == estOneShot,
        s"$et: daily-union estimate $estUnion != one-shot $estOneShot — " +
          "register-max union must reproduce the single-shot state")
    }
  }

  test("estimates sit within the lgK=12 error envelope of the exact count") {
    val est = EventsSketches.eventsHllMergeable(spark, sf)
      .select($"event_type", $"est_union").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (et, e) =>
      val x = exact(et)
      // 3 standard errors at lgK=12 is ~4.9%; use 5%
      assert(math.abs(e - x) <= math.max(1L, (0.05 * x).toLong),
        s"$et: estimate $e vs exact $x")
    }
  }

  test("bitmap store: interleaved admission serves exact counts; replay is harmless") {
    import graft.queries.EventsSketches
    import graft.sources.Store
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm_store_").toString
    val events = Tables.events(spark, sf)
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap

    EventsSketches.admitBitmaps(spark, store, events.filter($"event_id" % 2 === 0))
    EventsSketches.admitBitmaps(spark, store, events.filter($"event_id" % 2 =!= 0))
    assert(EventsSketches.distinctFromStore(spark, store)
      .as[(String, Long)].collect().toMap == exact)

    // OR is semantically idempotent: replaying a whole batch WITHOUT an
    // idempotency id must not change any count
    EventsSketches.admitBitmaps(spark, store, events.filter($"event_id" % 2 === 0))
    assert(EventsSketches.distinctFromStore(spark, store)
      .as[(String, Long)].collect().toMap == exact,
      "duplicate admission must be invisible in exact counts")

    // compaction OR-merges partials flat and preserves every count
    Store.compact(spark, store, numFiles = 2,
      rewrite = EventsSketches.mergeBitmaps)
    assert(Store.deltaCount(store) == 0)
    assert(EventsSketches.distinctFromStore(spark, store)
      .as[(String, Long)].collect().toMap == exact)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("bitmap store: streamed micro-batches serve the same exact counts") {
    import graft.queries.EventsSketches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm_stream_").toString
    val raw = Tables.events(spark, sf)
      .select($"event_type", $"user_id").as[(String, Long)].collect()
    val input = MemoryStream[(String, Long)]
    val q = EventsSketches.bitmapStreamingAdmission(
      input.toDF().toDF("event_type", "user_id"), store).start()
    try {
      // arbitrary interleave — bitmap admission is order-independent
      raw.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1).foreach {
        case (_, s) => input.addData(s.map(_._1).toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val exact = raw.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(EventsSketches.distinctFromStore(spark, store)
      .as[(String, Long)].collect().toMap == exact)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("day-keyed bitmap store serves exact counts for ANY day window") {
    import graft.queries.EventsSketches
    val store = java.nio.file.Files
      .createTempDirectory("graft_bmday_").toString
    val events = Tables.events(spark, sf)
    EventsSketches.admitDailyBitmaps(spark, store, events.filter($"event_id" % 3 === 0))
    EventsSketches.admitDailyBitmaps(spark, store, events.filter($"event_id" % 3 =!= 0))
    val start = events.agg(min(to_date($"ts"))).head().getDate(0).toLocalDate
    // three different windows, all served from the same stored day slices
    Seq(3L, 7L, 40L).foreach { days =>
      val got = EventsSketches
        .distinctWindowFromStore(spark, store, start, start.plusDays(days))
        .as[(String, Long)].collect().toMap
      val exact = events
        .filter(to_date($"ts") < lit(java.sql.Date.valueOf(start.plusDays(days)))
          && to_date($"ts") >= lit(java.sql.Date.valueOf(start)))
        .groupBy($"event_type").agg(countDistinct($"user_id"))
        .as[(String, Long)].collect().toMap
      assert(got == exact, s"window of $days days")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("heavy hitters: CMS never undercounts, overshoot within εN, reruns identical") {
    import graft.queries.EventsSketches
    val rows = EventsSketches.eventsHeavyHitters(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    val n = Tables.events(spark, sf).count()
    val epsN = math.ceil(math.E / 1024 * n).toLong
    rows.foreach { case (uid, exact, cms, over) =>
      assert(cms >= exact, s"user $uid: CMS must never undercount")
      assert(over == cms - exact)
      assert(over <= epsN, s"user $uid: overshoot $over beyond eps*N = $epsN")
    }
    // exact_n really is the exact top-10 (ties to smaller uid)
    val expectTop = Tables.events(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
      .sortBy { case (u, c) => (-c, u) }.take(10).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == expectTop)
    val again = EventsSketches.eventsHeavyHitters(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sameElements(again), "seeded hashes: reruns bit-identical")
  }

  test("re-union is associative: half-split partials union to the same estimate") {
    val ev = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"), $"user_id")
    val daily = ev.groupBy($"event_type", $"day")
      .agg(expr(s"hll_sketch_agg(user_id, ${EventsSketches.LgK})").as("sk"))
    val cutoff = daily.agg(min($"day")).head().getDate(0).toLocalDate.plusDays(7)
    val twoLevel = daily
      .groupBy($"event_type", ($"day" < lit(java.sql.Date.valueOf(cutoff))).as("half"))
      .agg(expr("hll_union_agg(sk, false)").as("partial"))
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(partial, false))").as("est"))
      .as[(String, Long)].collect().toMap
    val direct = EventsSketches.eventsHllMergeable(spark, sf)
      .select($"event_type", $"est_union").as[(String, Long)].collect().toMap
    assert(twoLevel == direct,
      "unioning partial unions must equal unioning the daily sketches directly")
  }
}
