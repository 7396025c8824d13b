package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventsQueries

/** events_funnel / events_retention: the single-shuffle fold form vs the
  * textbook multi-join form, plus hand-computed fixtures pinning the
  * strictly-after semantics the fold implements. */
class FunnelRetentionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Write a tiny events table in the driver's physical schema (ts is
    * int64 NANOS — Tables.events normalizes it) to a temp dir. */
  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_").toString
    rows.zipWithIndex
      .map { case ((_, ts, user, typ), i) =>
        (i.toLong, Timestamp.valueOf(ts).getTime * 1000000L, user, typ, 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events_histogram: exact edges, v=hi clamp, empty buckets emitted") {
    // one type, values 0..10: lo=0, hi=10, w=1; v=10 must clamp into bucket
    // 9 (last edge inclusive), bucket 5 is deliberately empty
    val dir = java.nio.file.Files.createTempDirectory("graft_hist_").toString
    val values = Seq(0.0, 0.5, 1.5, 2.5, 3.5, 4.5, 6.5, 7.5, 8.5, 9.5, 10.0)
    values.zipWithIndex
      .map { case (v, i) =>
        (i.toLong, 1700000000000000000L + i, 1L, "click", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventsQueries.eventsHistogram(spark, dir)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(got.length == 10, "full bucket spine even with gaps")
    val byBucket = got.map(r => r._2 -> r).toMap
    assert(byBucket(5L)._5 == 0L, "empty bucket must appear with cnt 0")
    assert(byBucket(9L)._5 == 2L, "v = hi clamps into the last bucket (9.5 and 10.0)")
    assert(byBucket(0L)._5 == 2L, "bucket 0 holds 0.0 and 0.5")
    got.foreach { case (_, b, lo, hi, _) =>
      assert(lo == b.toDouble && hi == (b + 1).toDouble, s"edges of bucket $b")
    }
    assert(got.map(_._5).sum == values.length.toLong, "counts partition the rows")
  }

  /** The textbook 3-aggregation funnel (the oracle's shape) in DataFrame
    * form — the differential reference for the fold. */
  private def threeJoinFunnel(dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
    val s = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = ev.filter($"event_type" === "click").join(s, "user_id")
      .filter($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    s.agg(count(lit(1)).as("n")).select(lit("1_signup").as("stage"), $"n".as("users"))
      .union(c.agg(count(lit(1))).select(lit("2_click"), $"count(1)"))
      .union(p.agg(count(lit(1))).select(lit("3_purchase"), $"count(1)"))
      .orderBy($"stage")
  }

  test("funnel fold matches the 3-join form on the sf corpus") {
    val fold = EventsQueries.eventsFunnel(spark, sf).collect().map(r => (r.getString(0), r.getLong(1)))
    val ref = threeJoinFunnel(sf).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fold.sameElements(ref))
  }

  test("funnel stages are monotonically non-increasing") {
    val counts = EventsQueries.eventsFunnel(spark, sf).collect().map(_.getLong(1))
    assert(counts.length == 3)
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
  }

  test("funnel requires strict event-time order signup < click < purchase") {
    // u1: completes in order. u2: click BEFORE signup, never re-clicks →
    // stage 1 only. u3: purchase before its click → stage 2 only.
    // u4: click exactly AT the signup timestamp (tie) → stage 1 only.
    val dir = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "signup"),
      (0L, "2024-01-01 10:05:00", 1L, "click"),
      (0L, "2024-01-01 10:10:00", 1L, "purchase"),
      (0L, "2024-01-01 09:00:00", 2L, "click"),
      (0L, "2024-01-01 10:00:00", 2L, "signup"),
      (0L, "2024-01-01 10:00:00", 3L, "signup"),
      (0L, "2024-01-01 10:02:00", 3L, "purchase"),
      (0L, "2024-01-01 10:04:00", 3L, "click"),
      (0L, "2024-01-01 10:00:00", 4L, "signup"),
      (0L, "2024-01-01 10:00:00", 4L, "click")))
    val got = EventsQueries.eventsFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("1_signup" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("funnelSteps with repeated step types needs a strictly-later re-hit") {
    // steps [view, view, purchase]: a SECOND view strictly after the first.
    // u1: two views then purchase -> all 3 stages. u2: one view only ->
    // stage 1. u3: two views at the SAME timestamp -> the tie can't complete
    // step 2 (one event completes at most one step; acc is pre-event state).
    val dir = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "view"),
      (0L, "2024-01-01 10:05:00", 1L, "view"),
      (0L, "2024-01-01 10:10:00", 1L, "purchase"),
      (0L, "2024-01-01 10:00:00", 2L, "view"),
      (0L, "2024-01-01 10:00:00", 3L, "view"),
      (0L, "2024-01-01 10:00:00", 3L, "view")))
    val got = EventsQueries.funnelSteps(
      graft.sources.Tables.events(spark, dir), Seq("view", "view", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("1_view" -> 3L, "2_view" -> 1L, "3_purchase" -> 1L))
  }

  test("funnelSteps at length 4 matches an iterated 2-table recompute") {
    val steps = Seq("signup", "view", "click", "purchase")
    val got = EventsQueries.funnelSteps(
      graft.sources.Tables.events(spark, sf), steps)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // driver recompute: per user, fold the time-sorted event list
    val evs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)))
    val counts = Array.fill(steps.length)(0L)
    evs.foreach { case (_, es) =>
      val acc = Array.fill[Option[Long]](steps.length)(None)
      es.foreach { case (_, t, typ) =>
        val prev = acc.clone()
        for (i <- steps.indices)
          if (prev(i).isEmpty && typ == steps(i) &&
              (i == 0 || prev(i - 1).exists(_ < t)))
            acc(i) = Some(t)
      }
      for (i <- steps.indices if acc(i).isDefined) counts(i) += 1
    }
    steps.indices.foreach { i =>
      assert(got(s"${i + 1}_${steps(i)}") == counts(i), s"stage $i")
    }
  }

  test("session funnel: gap resets steps; two complete sessions count twice") {
    val dir = eventsDir(Seq(
      // u1: completes within one sitting
      (0L, "2024-01-01 10:00:00", 1L, "signup"),
      (0L, "2024-01-01 10:05:00", 1L, "click"),
      (0L, "2024-01-01 10:10:00", 1L, "purchase"),
      // u2: signup, then the click 31 minutes later — NEW session, so the
      // click cannot complete stage 2 (an unsessionized funnel would count it)
      (0L, "2024-01-01 10:00:00", 2L, "signup"),
      (0L, "2024-01-01 10:31:00", 2L, "click"),
      // u3: TWO complete sessions in one day -> contributes 2 to every stage
      (0L, "2024-01-01 09:00:00", 3L, "signup"),
      (0L, "2024-01-01 09:01:00", 3L, "click"),
      (0L, "2024-01-01 09:02:00", 3L, "purchase"),
      (0L, "2024-01-01 15:00:00", 3L, "signup"),
      (0L, "2024-01-01 15:01:00", 3L, "click"),
      (0L, "2024-01-01 15:02:00", 3L, "purchase")))
    val got = EventsQueries.eventsSessionFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // sessions reaching each stage: u1 (1) + u2's first session (signup
    // only) + u2's second session (click alone, no signup -> stage 0) +
    // u3 (2 sessions)
    assert(got == Map("1_signup" -> 4L, "2_click" -> 3L, "3_purchase" -> 3L))
  }

  test("events_paths: trigram counts with event_id tie-break at equal ts") {
    // u1 emits a>b>c>d (two trigrams); u2 emits a>b>c with b,c at the SAME
    // timestamp — event_id order (insertion order here) must break the tie
    val dir = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "a"),
      (0L, "2024-01-01 10:01:00", 1L, "b"),
      (0L, "2024-01-01 10:02:00", 1L, "c"),
      (0L, "2024-01-01 10:03:00", 1L, "d"),
      (0L, "2024-01-01 10:00:00", 2L, "a"),
      (0L, "2024-01-01 10:01:00", 2L, "b"),
      (0L, "2024-01-01 10:01:00", 2L, "c")))
    val got = EventsQueries.eventsPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a>b>c" -> 2L, "b>c>d" -> 1L))
  }

  test("rolling actives: 7-day window includes day 7, excludes day 8") {
    // u1 active Jan 1 only; u2 active Jan 7 and Jan 8
    val dir = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "view"),
      (0L, "2024-01-07 10:00:00", 2L, "view"),
      (0L, "2024-01-08 10:00:00", 2L, "view")))
    val got = EventsQueries.eventsRollingActives(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2024-01-01") == ((1L, 1L)))
    assert(got("2024-01-07") == ((1L, 2L)), "u1's Jan 1 still in the Jan 7 window")
    assert(got("2024-01-08") == ((1L, 1L)), "u1 aged out; u2 counted once")
    // u2's two active days never double-count within one window
    assert(got("2024-01-13") == ((0L, 1L)), "no activity that day, u2 in window")
  }

  test("rolling actives sketch form tracks the exact form within 5%") {
    val exact = EventsQueries.eventsRollingActives(spark, sf)
      .select($"day", $"wau").as[(String, Long)].collect().toMap
    val approx = EventsQueries.rollingActivesApprox(
        graft.sources.Tables.events(spark, sf))
      .as[(String, Double)].collect().toMap
    assert(approx.keySet == exact.keySet, "same window days")
    exact.foreach { case (day, wau) =>
      val est = approx(day)
      assert(math.abs(est - wau) <= math.max(1.0, 0.05 * wau),
        s"$day: estimate $est vs exact $wau")
    }
  }

  test("retention: offset 0 is the full cohort; actives never exceed it") {
    val rows = EventsQueries.eventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, active, cohort, rate) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(active <= cohort)
      if (off == 0) assert(active == cohort && rate == 1.0)
    }
  }

  test("retention on a hand fixture: day-1 returner counted, day-9 not") {
    // u1 first active Jan 1, returns Jan 2 and Jan 10 (outside the 0-7
    // window). u2 first active Jan 1 only. One cohort of 2.
    val dir = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "view"),
      (0L, "2024-01-02 10:00:00", 1L, "view"),
      (0L, "2024-01-10 10:00:00", 1L, "view"),
      (0L, "2024-01-01 11:00:00", 2L, "view")))
    val got = EventsQueries.eventsRetention(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("2024-01-01", 0, 2L, 2L), ("2024-01-01", 1, 1L, 2L)))
  }

  test("anomaly: a 10x spike day flags, steady days don't, zero-variance " +
      "types never flag (strict inequality)") {
    // click: ten days of 10 events, then one day of 100. mean ≈ 18.2,
    // σ ≈ 25.9 — the spike (dev ≈ 81.8 > 2σ) flags, steady days
    // (dev ≈ 8.2) don't. view: three identical days — variance 0, and the
    // STRICT > keeps dev-0 days unflagged rather than flagging everything.
    val rows =
      (1 to 10).flatMap { d =>
        (0 until 10).map(k => (0L, f"2024-01-$d%02d 10:00:$k%02d", k.toLong, "click"))
      } ++
      (0 until 100).map(k => (0L, f"2024-01-11 10:${k / 60}%02d:${k % 60}%02d", k.toLong, "click")) ++
      (1 to 3).map(d => (0L, f"2024-02-$d%02d 09:00:00", 7L, "view"))
    val got = EventsQueries.eventsAnomaly(spark, eventsDir(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("click", "2024-01-11", 100L, 900L)),
      s"got ${got.toSeq}")
    // dev_n = n*cnt - s = 11*100 - 200 = 900: positive = spike (a drop
    // would carry a negative dev_n)
  }

  test("incremental anomaly: delta admits converge to the batch flag set, " +
      "and late data revises a flag") {
    val store = java.nio.file.Files.createTempDirectory("graft_anom_").toString + "/store"
    val ev = graft.sources.Tables.events(spark, sf)
    // split every day across both batches (id parity): the merge must SUM
    // per-day deltas, not append disjoint days
    val interim = EventsQueries.anomalyAdmitBatch(ev.filter($"event_id" % 2 === 0), store)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = EventsQueries.anomalyAdmitBatch(ev.filter($"event_id" % 2 =!= 0), store)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val expect = EventsQueries.eventsAnomaly(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"only=${got -- expect} missing=${expect -- got}")
    // the half-corpus interim verdict is allowed to differ (prefix
    // semantics — flags are revised as data lands), but it must have
    // evaluated SOMETHING: the store existed and fed the shared flag logic
    assert(interim.nonEmpty || expect.isEmpty)
  }

  test("replayed anomaly admission with a batch id is a no-op (additive counts would double)") {
    val store = java.nio.file.Files.createTempDirectory("graft_anom_r_").toString + "/store"
    val ev = graft.sources.Tables.events(spark, sf)
    def flagsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val first = flagsOf(EventsQueries.anomalyAdmitBatch(ev, store, id = Some("b0")))
    val deltas = graft.sources.Store.deltaCount(store)
    // the anomaly store is ADDITIVE — unlike the dedup indexes, a replayed
    // append would genuinely corrupt it by doubling every day's count, so
    // the id-keyed skip is load-bearing here
    val replay = flagsOf(EventsQueries.anomalyAdmitBatch(ev, store, id = Some("b0")))
    assert(replay == first, "replay must not change the flag set")
    assert(graft.sources.Store.deltaCount(store) == deltas,
      "replay must not append a delta")
    val batchFlags = flagsOf(EventsQueries.eventsAnomaly(spark, sf))
    assert(first == batchFlags)
  }

  test("anomalyAdmitBatch slots into foreachBatch (streaming face)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft_anom_s_").toString + "/store"
    // same fixture as the batch spike test, split across two micro-batches
    val steady = (1 to 10).flatMap { d =>
      (0 until 10).map(k => (f"2024-01-$d%02d 10:00:$k%02d", k.toLong))
    }
    val spike = (0 until 100).map(k => (f"2024-01-11 10:${k / 60}%02d:${k % 60}%02d", k.toLong))
    val input = MemoryStream[(String, Long)]
    var lastFlags = Array.empty[(String, String, Long)]
    val q = input.toDF().toDF("ts_str", "user_id")
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batch = df.select(
          to_timestamp(col("ts_str")).as("ts"), lit("click").as("event_type"))
        // id-keyed admission: a foreachBatch replay must not double-count
        lastFlags = EventsQueries.anomalyAdmitBatch(batch, store, id = Some(s"sb$batchId"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        ()
      }
      .start()
    try {
      input.addData(steady: _*)
      q.processAllAvailable()
      assert(lastFlags.isEmpty, // ten identical days: zero variance, no flags
        s"steady prefix must not flag: ${lastFlags.toSeq}")
      input.addData(spike: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(lastFlags.toSeq == Seq(("click", "2024-01-11", 100L)),
      s"spike must flag after its batch lands: ${lastFlags.toSeq}")
  }

  test("anomaly flags survive production-scale counts (BIGINT would overflow)") {
    // cnt ≈ 4·10^12: Σcnt² ≈ 10^26 and dev² ≈ 10^27 — far past 2^63 ≈
    // 9.2·10^18, so a BIGINT formulation throws under ANSI mode. The
    // decimal form must both EVALUATE and agree with exact BigInt flags.
    val base = 4_000_000_000_000L
    val rnd = new scala.util.Random(11)
    val counts = (1 to 30).map(d =>
      (java.sql.Date.valueOf(f"2024-03-$d%02d"),
        base + rnd.nextLong(200_000_000_000L))) :+
      ((java.sql.Date.valueOf("2024-03-31"), 9_000_000_000_000L)) // spike
    val daily = counts.map { case (day, c) => ("ingest", day, c) }
      .toDF("event_type", "day", "cnt")
    val got = EventsQueries.anomalyFlagsOn(daily).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    val n = BigInt(counts.length)
    val s = counts.map(c => BigInt(c._2)).sum
    val q = counts.map(c => BigInt(c._2) * BigInt(c._2)).sum
    val expect = counts.filter { case (_, c) =>
      val dev = n * BigInt(c) - s
      dev * dev > 4 * (n * q - s * s)
    }.map { case (day, c) => (day.toString, c) }.toSet
    assert(got == expect, s"only=${got -- expect} missing=${expect -- got}")
    assert(got.exists(_._2 == 9_000_000_000_000L), "the spike day must flag")
  }

  test("anomaly on sf matches an independent double-precision recompute") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    val expect = daily.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val n = rows.length
      val mean = rows.map(_._3).sum.toDouble / n
      val sigma = math.sqrt(rows.map(r => (r._3 - mean) * (r._3 - mean)).sum / n)
      rows.filter(r => math.abs(r._3 - mean) > 2 * sigma)
        .map(r => (r._1, r._2.toString, r._3))
    }.toSet
    val got = EventsQueries.eventsAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect, s"only=${got -- expect} missing=${expect -- got}")
  }
}
