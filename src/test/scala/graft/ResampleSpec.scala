package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Resample
import graft.sources.Tables

class ResampleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("resampled grid is dense, gap-filled, and equals a driver recompute") {
    val df = Resample.eventsResample(spark, sf)
    val rows = df.select($"event_type", $"hour", $"n_events", $"is_gap", $"filled_micro")
      .as[(String, String, Long, Int, Long)].collect()
    assert(rows.nonEmpty)

    // driver recompute from raw events
    val raw = Tables.events(spark, sf)
      .select($"event_type", (floor(unix_micros($"ts") / 3600000000L) * 3600L).as("hsec"),
        round($"value" * 1000000).cast("long").as("micro"))
      .as[(String, Long, Long)].collect()
    val hourly = raw.groupBy(e => (e._1, e._2)).view
      .mapValues(es => (es.length.toLong, es.map(_._3).sum)).toMap
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val expect = raw.map(_._1).distinct.flatMap { t =>
      val hs = hourly.keys.filter(_._1 == t).map(_._2)
      val (lo, hi) = (hs.min, hs.max)
      var lastVal = 0L
      (lo to hi by 3600L).map { h =>
        val cell = hourly.get((t, h))
        cell.foreach { c => lastVal = c._2 }
        (t, fmt.format(java.time.Instant.ofEpochSecond(h)),
          cell.map(_._1).getOrElse(0L), if (cell.isEmpty) 1 else 0, lastVal)
      }
    }.toSet
    assert(rows.toSet == expect,
      s"only-got=${(rows.toSet -- expect).take(3)} only-exp=${(expect -- rows.toSet).take(3)}")

    // the corpus must actually have gaps for the fill to be demonstrated
    assert(rows.exists(_._4 == 1), "expected at least one gap hour")
    // grid density: per type, rows == (hi - lo)/hour + 1 with no duplicates
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length, s"$t grid must be duplicate-free")
    }
    // forward fill: a gap row carries the previous non-gap row's value
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur._4 == 1 =>
          assert(cur._5 == prev._5, s"$t ${cur._2}: gap must carry ${prev._5}")
        case _ => ()
      }
    }
  }

  test("incremental admission (with late arrivals and forced compaction) equals from-scratch") {
    val store = java.nio.file.Files.createTempDirectory("graft_rs_spec_").toString
    val events = Tables.events(spark, sf)
    // three interleaved slices: slice 2 lands hours EARLIER than slice 1's
    // already-admitted data (late arrival); maintainEvery=2 forces a
    // sum-merge compaction mid-sequence
    (0 to 2).foreach { i =>
      Resample.admitHourly(spark, store, events.filter($"event_id" % 3 === i),
        maintainEvery = 2)
    }
    val incremental = Resample.admitHourly(spark, store,
      events.limit(0), maintainEvery = 0) // empty admit: read-only serve
    val batch = Resample.eventsResample(spark, sf)
    assert(incremental.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq,
      "incremental grid must be byte-identical to the from-scratch grid")
    // compaction actually fired: deltas were folded flat
    assert(graft.sources.Store.deltaCount(store) < 4)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("replayed micro-batch admissions are no-ops, even after compaction") {
    val store = java.nio.file.Files.createTempDirectory("graft_rs_idem_").toString
    val events = Tables.events(spark, sf)
    val b0 = events.filter($"event_id" % 2 === 0)
    val b1 = events.filter($"event_id" % 2 =!= 0)

    assert(Resample.admitBatch(spark, store, b0, id = Some("sb0")))
    // immediate replay (crash before the streaming checkpoint committed)
    assert(!Resample.admitBatch(spark, store, b0, id = Some("sb0")))
    assert(Resample.admitBatch(spark, store, b1, id = Some("sb1")))
    val before = Resample.gridFromStore(spark, store)
      .collect().map(_.toString).sorted.toSeq

    // compaction folds the delta dirs away; the admission markers survive,
    // so even a very late replay still skips
    graft.sources.Store.compact(spark, store, rewrite = df =>
      df.groupBy("event_type", "h")
        .agg(sum($"n").as("n"), sum($"val_micro").as("val_micro")))
    assert(graft.sources.Store.deltaCount(store) == 0)
    assert(!Resample.admitBatch(spark, store, b0, id = Some("sb0")),
      "post-compaction replay must still be a no-op")
    val after = Resample.gridFromStore(spark, store)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "replays must never change the grid")

    // and the grid equals the batch form throughout
    val batch = Resample.eventsResample(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(after == batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("streaming admission through the same store equals the batch grid") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft_rs_stream_").toString

    val raw = Tables.events(spark, sf)
      .select($"ts".cast("timestamp"), $"event_type", $"value")
      .as[(Timestamp, String, Double)].collect()
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = Resample.streamingAdmission(
      input.toDF().toDF("ts", "event_type", "value"), store).start()
    try {
      // three micro-batches, deliberately out of time order
      val slices = raw.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      slices.foreach { case (_, s) => input.addData(s.map(_._1)); q.processAllAvailable() }
    } finally q.stop()

    val streamed = Resample.gridFromStore(spark, store)
      .collect().map(_.toString).sorted.toSeq
    val batch = Resample.eventsResample(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      "grid served from the streaming-admitted store must equal the batch grid")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("fact table scans once: both consumers read the materialized hourly rollup") {
    val df = Resample.eventsResample(spark, sf)
    df.collect()
    // the hourly aggregate is checkpointed before the query under test
    // executes, so the executed plan must contain NO events.parquet scan at
    // all — both the spine bounds and the fill join read the rollup
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"fact scans must be absorbed by the materialized rollup:\n$plan")
  }
}
