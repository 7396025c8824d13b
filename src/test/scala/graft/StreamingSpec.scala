package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming semantics driven through MemoryStream: watermarked
  * tumbling windows, late-data drop, session windows, and custom state via
  * flatMapGroupsWithState. Uses format("memory") + processAllAvailable for
  * synchronous batch-by-batch control. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked tumbling window aggregates and drops late data") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStreams.tumblingCountsWatermarked(events, "1 hour", "30 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("tumbling_out").start()
    try {
      // two events in hour 10, one in hour 11
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 3.0))
      q.processAllAvailable()
      // advance watermark: max event 13:00 -> watermark 12:30 -> hours 10,11 close
      input.addData((ts("2024-01-01 13:00:00"), "click", 4.0))
      q.processAllAvailable()
      val closed = spark.table("tumbling_out").as[(String, String, Long, Double)]
        .collect().toSet
      assert(closed.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
      assert(closed.contains(("2024-01-01 11:00:00", "view", 1L, 3.0)))
      // late event for hour 10, far behind watermark: must be DROPPED
      input.addData((ts("2024-01-01 10:20:00"), "click", 99.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 15:00:00"), "click", 5.0)) // close everything else
      q.processAllAvailable()
      val all = spark.table("tumbling_out").as[(String, String, Long, Double)]
        .collect().toSet
      // hour-10 row unchanged: the late event did not resurrect or alter it
      assert(all.count(_._1 == "2024-01-01 10:00:00") == 1)
      assert(all.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming session windows merge events within the gap") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val sessions = EventStreams.sessionStatsWatermarked(events, "30 minutes", "1 hour")
      .select($"user_id", $"n_events")
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("session_out").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L), // session A
        (ts("2024-01-01 10:10:00"), 1L), // merges into A (gap 10m)
        (ts("2024-01-01 11:30:00"), 1L), // session B (gap 80m)
        (ts("2024-01-01 10:00:00"), 2L)) // user 2 session
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), 99L)) // advance watermark
      q.processAllAvailable()
      val out = spark.table("session_out").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      assert(out(1L) == List(1, 2)) // sessions of 2 and 1 events
      assert(out(2L) == List(1))
    } finally q.stop()
  }

  test("streaming query resumes state from a checkpoint after restart") {
    implicit val sql = spark.sqlContext
    // the memory sink refuses checkpoint recovery; foreachBatch supports it
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val input = MemoryStream[(String, Int)]
    def mkQuery() = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Long]) =>
          val sum = state.getOption.getOrElse(0L) + rows.map(_._2.toLong).sum
          state.update(sum)
          Iterator((key, sum))
      }
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        batch.collect().foreach(seen.add)
      }
    val q1 = mkQuery().start()
    try {
      input.addData(("a", 5))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: per-key state must carry over
    val q2 = mkQuery().start()
    try {
      input.addData(("a", 2))
      q2.processAllAvailable()
      val rows = seen.toArray(Array.empty[(String, Long)]).toSet
      assert(rows.contains(("a", 7L)), s"state not recovered: $rows")
    } finally q2.stop()
  }

  test("stream-stream correlated join matches within the delay bound only") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, String, Double)]
    val buys = MemoryStream[(Timestamp, String, String, Double)]
    def df(m: MemoryStream[(Timestamp, String, String, Double)]) =
      m.toDF().toDF("ts", "event_type", "user_id", "value")
    val joined = EventStreams.correlatedJoin(
      df(clicks), df(buys), maxDelay = "10 minutes", watermark = "5 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_out").start()
    try {
      clicks.addData(
        (ts("2024-01-01 10:00:00"), "click", "alice", 1.0),
        (ts("2024-01-01 10:00:00"), "click", "bob", 1.0))
      buys.addData(
        (ts("2024-01-01 10:05:00"), "buy", "alice", 9.0), // within bound
        (ts("2024-01-01 10:30:00"), "buy", "alice", 9.0), // outside bound
        (ts("2024-01-01 10:05:00"), "buy", "carol", 9.0)) // other user
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select("user_id", "r_ts").collect()
        .map(r => (r.getString(0), r.getTimestamp(1))).toSet
      assert(rows == Set(("alice", ts("2024-01-01 10:05:00"))), s"got $rows")
    } finally q.stop()
  }

  test("stream-stream left-outer join emits unmatched rows after the watermark") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, String, Double)]
    val buys = MemoryStream[(Timestamp, String, String, Double)]
    def df(m: MemoryStream[(Timestamp, String, String, Double)]) =
      m.toDF().toDF("ts", "event_type", "user_id", "value")
    val joined = EventStreams.correlatedJoin(
      df(clicks), df(buys), maxDelay = "10 minutes", watermark = "5 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_outer_out").start()
    try {
      clicks.addData((ts("2024-01-01 10:00:00"), "click", "dave", 1.0))
      buys.addData((ts("2024-01-01 10:01:00"), "buy", "erin", 9.0))
      q.processAllAvailable()
      // dave has no match, but can't be emitted until the watermark proves
      // none can arrive: advance both streams well past 10:15 (bound) + 5m
      for (i <- 1 to 2) {
        val sentinel = ts(s"2024-01-01 12:0$i:00")
        clicks.addData((sentinel, "click", "zz", 0.0))
        buys.addData((sentinel, "buy", "zz", 0.0))
        q.processAllAvailable()
      }
      val unmatched = spark.table("ssj_outer_out")
        .filter($"user_id" === "dave").collect()
      assert(unmatched.length == 1, s"expected one null-padded dave row")
      assert(unmatched.head.isNullAt(unmatched.head.fieldIndex("r_ts")))
    } finally q.stop()
  }

  test("stream-stream join equals the batch join on the same data") {
    implicit val sql = spark.sqlContext
    // same correlatedJoin expressions over batch inputs (watermark no-op)
    // vs a hand-written batch range join — the differential pins semantics
    val evs = Seq(
      (ts("2024-01-01 10:00:00"), "click", "u1", 1.0),
      (ts("2024-01-01 10:04:00"), "buy", "u1", 5.0),
      (ts("2024-01-01 10:09:59"), "buy", "u1", 6.0),
      (ts("2024-01-01 10:10:01"), "buy", "u1", 7.0),
      (ts("2024-01-01 10:00:00"), "click", "u2", 1.0),
      (ts("2024-01-01 09:59:00"), "buy", "u2", 8.0))
    val all = evs.toDF("ts", "event_type", "user_id", "value")
    val clicks = all.filter($"event_type" === "click")
    val buys = all.filter($"event_type" === "buy")
    val viaOp = EventStreams.correlatedJoin(clicks, buys, "10 minutes", "5 minutes")
      .select($"user_id", $"r_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet
    val expected = clicks.as("c").join(buys.as("b"),
        $"c.user_id" === $"b.user_id" &&
          $"b.ts".between($"c.ts", $"c.ts" + expr("INTERVAL 10 minutes")))
      .select($"c.user_id", $"b.ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(viaOp == expected && viaOp ==
      Set(("u1", ts("2024-01-01 10:04:00")), ("u1", ts("2024-01-01 10:09:59"))))
  }

  test("killed query recovers from checkpoint with exactly-once file-sink output") {
    implicit val sql = spark.sqlContext
    // kill-and-recover: data arrives while the query is DOWN (stopped before
    // ever seeing it); the restarted query must deliver it from the
    // checkpointed offsets exactly once into the transactional file sink —
    // no loss, no duplication, including across a third no-new-data restart
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kr_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_kr_out_").toString
    val input = MemoryStream[Int]
    def start() = input.toDS().toDF("n")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .start()
    val q1 = start()
    try {
      input.addData(1 to 5: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    input.addData(6 to 10: _*) // arrives while no query is running
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val q3 = start() // replays committed offsets only — must add nothing
    try q3.processAllAvailable() finally q3.stop()
    val out = spark.read.parquet(outDir).as[Int].collect().sorted.toSeq
    assert(out == (1 to 10), s"expected exactly-once 1..10, got $out")
  }

  test("foreachBatch sink lands streaming aggregates in parquet") {
    implicit val sql = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb_").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStreams.tumblingCountsWatermarked(
      input.toDF().toDF("ts", "event_type", "value"), "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), "click", 4.0)) // close hour 10
      q.processAllAvailable()
      val written = spark.read.parquet(outDir)
        .as[(String, String, Long, Double)].collect().toSet
      assert(written.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState maintains custom per-key running state") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val counts = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Long]) =>
          val sum = state.getOption.getOrElse(0L) + rows.map(_._2.toLong).sum
          state.update(sum)
          Iterator((key, sum))
      }
    val q = counts.toDF("key", "running").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("state_out").start()
    try {
      input.addData(("a", 1), ("a", 2), ("b", 10))
      q.processAllAvailable()
      input.addData(("a", 4), ("b", 5))
      q.processAllAvailable()
      val rows = spark.table("state_out").as[(String, Long)].collect().toSet
      // batch 1: a->3, b->10; batch 2 resumes state: a->7, b->15
      assert(rows == Set(("a", 3L), ("b", 10L), ("a", 7L), ("b", 15L)))
    } finally q.stop()
  }

  test("file-source streaming over the events parquet matches batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.types._
    // file-stream sources monitor a directory; stage the single parquet file
    val dir = Files.createTempDirectory("graft_stream_src_")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-stream sources need an explicit schema: take the staged file's own
    // (ts arrives as long nanos or TIMESTAMP_NTZ depending on the generator;
    // the loader's normalizer owns the difference)
    val schema = spark.read.parquet(dir.toString).schema
    def normalize(df: org.apache.spark.sql.DataFrame) =
      graft.sources.Tables.normalizeEventTs(df)
    val stream = normalize(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = EventStreams.tumblingCounts(stream, "1 hour")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("file_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_out")
        .as[(String, String, Long, Double)].collect().toSet
      val batch = EventStreams.tumblingCounts(
        normalize(spark.read.schema(schema).parquet(dir.toString)), "1 hour")
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate events") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val deduped = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_stream_out").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:01:00"), 1L), // dup within watermark -> dropped
        (ts("2024-01-01 10:02:00"), 2L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:03:00"), 1L)) // still within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_stream_out").select("event_id")
        .as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("streaming prep pipeline: quality screen + exact dedup over a document file stream") {
    // the LLM-prep operators compose in Structured Streaming unchanged: the
    // codegen'd quality/fingerprint kernels are stateless projections, so
    // readStream -> screen -> dropDuplicates(fp) is the incremental face of
    // (prep_screen + dedup_exact). AvailableNow bounds the dedup state to
    // this drain; an unbounded deployment would use
    // dropDuplicatesWithinWatermark (pinned two tests up).
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.types._
    import graft.functions.{TextFunctions => TF}
    val dir = Files.createTempDirectory("graft_docs_stream_")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def prep(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", TF.fingerprintMd5($"text").as("fp"),
        TF.qualityScore($"text").as("quality"))
      .filter($"quality" >= 0.75)
    val q = prep(spark.readStream.schema(schema).parquet(dir.toString))
      .dropDuplicates("fp")
      .writeStream.outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("prep_stream_out").start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("prep_stream_out")
        .select($"fp", $"quality").as[(String, Double)].collect()
      val batch = prep(spark.read.schema(schema).parquet(dir.toString))
        .dropDuplicates("fp")
        .select($"fp", $"quality").as[(String, Double)].collect()
      // keeper choice within a duplicate group is arrival-order-dependent
      // (same fingerprint can carry different raw-text quality), so compare
      // the screened fingerprint SET, which is not
      assert(streamed.map(_._1).toSet == batch.map(_._1).toSet)
      assert(streamed.length == streamed.map(_._1).distinct.length,
        "streaming dedup emitted a duplicate fingerprint")
      assert(streamed.forall(_._2 >= 0.75))
      assert(streamed.nonEmpty && streamed.length <
        spark.read.schema(schema).parquet(dir.toString).count(),
        "screen+dedup should strictly shrink the corpus")
    } finally q.stop()
  }

  test("streaming upsert admission (foreachBatch) equals the batch merge minus keeps") {
    // ingestion-time corpus upsert: each arriving delta micro-batch resolves
    // against a STATIC snapshot through the same action projection the batch
    // operator uses. State-free; 'keep' is definitionally absent (no delta
    // arrived), so batch splits can't duplicate rows and the union over any
    // arrival partitioning equals the batch merge's non-keep rows.
    implicit val sql = spark.sqlContext
    import graft.queries.DataPipeline
    val docs = graft.sources.Tables.documents(spark, sf)
    val snap = DataPipeline.upsertSnapshotOf(docs)
    val deltaRows = DataPipeline.upsertDeltaOf(docs)
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, String, Long, String)]()
    val q = input.toDF().toDF("doc_id", "delta_text")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= DataPipeline.upsertAdmit(batch, snap)
          .as[(Long, String, Long, String)].collect(); ()
      }.start()
    try {
      val (b1, b2) = deltaRows.splitAt(deltaRows.length / 3)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val batchRun = DataPipeline.upsert(spark, sf)
        .filter($"action" =!= "keep")
        .as[(Long, String, Long, String)].collect().toSet
      assert(got.toSet == batchRun,
        s"stream-only=${got.toSet.diff(batchRun).take(5)} " +
          s"batch-only=${batchRun.diff(got.toSet).take(5)}")
      Seq("insert", "update", "noop").foreach(a =>
        assert(batchRun.exists(_._2 == a), s"fixture must exercise '$a'"))
    } finally q.stop()
  }

  test("streaming fuzzy contamination guard (foreachBatch) equals the batch cross-join") {
    // ingestion-time fuzzy decontamination: each arriving micro-batch of
    // documents is PassJoin-probed against a STATIC reference corpus (the
    // test split) with the same batch generator prep_fuzzy_decontam uses —
    // foreachBatch applies Dedup.fuzzyCrossPairs per batch, so the guard is
    // STATE-FREE (no keys survive a batch; nothing accumulates) and its
    // output over any arrival partitioning equals the one-shot batch run.
    implicit val sql = spark.sqlContext
    import graft.functions.{TextFunctions => TF}
    import graft.queries.{DataPipeline, Dedup}
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", TF.normalizeText($"text").as("t"))
      .withColumn("len", length($"t"))
    val docs = graft.sources.Tables.documents(spark, sf)
    val split = docs.select($"doc_id", $"text",
      DataPipeline.splitCol($"doc_id").as("split"))
    val reference = norm(split.filter($"split" === "test")
      .select($"doc_id", $"text"))
    val incoming = split.filter($"split" === "train")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Long, Long)]()
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= Dedup.fuzzyCrossPairs(norm(batch), reference, k = 4)
          .as[(Long, Long, Long)].collect(); ()
      }.start()
    try {
      // two uneven batches: a true pair must be found regardless of which
      // batch its train side arrives in
      val (b1, b2) = incoming.splitAt(incoming.length / 3)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val batchRun = Dedup.fuzzyCrossPairs(
        norm(split.filter($"split" === "train").select($"doc_id", $"text")),
        reference, k = 4).as[(Long, Long, Long)].collect().toSet
      assert(got.toSet == batchRun,
        s"stream-only=${got.toSet.diff(batchRun)} batch-only=${batchRun.diff(got.toSet)}")
      assert(batchRun.nonEmpty, "fixtures should contain cross-split near-dups")
    } finally q.stop()
  }

  test("batch and streaming tumbling aggregations agree on the same data") {
    implicit val sql = spark.sqlContext
    val data = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.5),
      (ts("2024-01-01 10:55:00"), "click", 2.5),
      (ts("2024-01-01 11:30:00"), "view", 1.0),
      (ts("2024-01-01 12:01:00"), "view", 4.0))
    val batch = EventStreams.tumblingCounts(
      data.toDF("ts", "event_type", "value"), "1 hour")
      .as[(String, String, Long, Double)].collect().toSet

    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.tumblingCountsWatermarked(
      input.toDF().toDF("ts", "event_type", "value"), "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("agree_out").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-02 00:00:00"), "click", 0.0)) // flush watermark
      q.processAllAvailable()
      val streamed = spark.table("agree_out").as[(String, String, Long, Double)]
        .collect().toSet
      assert(batch.subsetOf(streamed))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the file source and stops on its own") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_avnow_src_")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = EventStreams.tumblingCounts(stream, "1 hour")
      .writeStream.outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("avnow_out").start()
    // AvailableNow processes everything present at start, then TERMINATES —
    // the batch-job-over-streaming-checkpoint mode for scheduled ingestion
    assert(q.awaitTermination(120000), "query did not self-terminate")
    assert(!q.isActive)
    val n = spark.table("avnow_out").count()
    val batchN = EventStreams.tumblingCounts(
      graft.sources.Tables.normalizeEventTs(
        spark.read.schema(schema).parquet(dir.toString)), "1 hour").count()
    assert(n == batchN && n > 0)
  }

  test("stream-static enrichment join attaches dimension rows per micro-batch") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val input = MemoryStream[(Timestamp, Long, Double)]
    val enriched = EventStreams.enrich(
      input.toDF().toDF("ts", "user_id", "value"), dim, "user_id")
    val q = enriched.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_out").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:01:00"), 2L, 2.0),
        (ts("2024-01-01 10:02:00"), 3L, 3.0)) // no dim row -> null segment
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select($"user_id", $"segment").as[(Long, Option[String])]
        .collect().toSet
      assert(out == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    } finally q.stop()
  }

  test("keyed-upsert sink is idempotent under batch replay") {
    val target = java.nio.file.Files.createTempDirectory("graft_upsert_")
      .resolve("state").toString
    val sink = EventStreams.upsertByKey(target, "user_id", "ts") _
    val b0 = Seq((1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 11.0), // same key, later -> wins
      (2L, ts("2024-01-01 10:30:00"), 20.0)).toDF("user_id", "ts", "value")
    sink(b0, 0L)
    def state() = spark.read.parquet(target)
      .select($"user_id", $"value").as[(Long, Double)].collect().toSet
    val afterB0 = state()
    assert(afterB0 == Set((1L, 11.0), (2L, 20.0)))
    sink(b0, 0L) // replay after simulated sink failure: state must not change
    assert(state() == afterB0, "replaying a batch changed the target state")
    val b1 = Seq((2L, ts("2024-01-01 12:00:00"), 21.0),
      (3L, ts("2024-01-01 12:00:00"), 30.0)).toDF("user_id", "ts", "value")
    sink(b1, 1L)
    assert(state() == Set((1L, 11.0), (2L, 21.0), (3L, 30.0)))
    // crash between the two promote renames: target is gone, .old holds the
    // pre-batch state. A replay must restore from .old and converge — not
    // treat the sink as empty and drop keys 1 and 3 (which are absent from
    // b1's own rows)
    val preCrash = state()
    assert(new java.io.File(target).renameTo(new java.io.File(target + ".old")))
    sink(b1, 1L)
    assert(state() == preCrash, "replay after mid-swap crash lost state")
    assert(!new java.io.File(target + ".old").exists(), ".old not cleaned up")
    // and it drives from an actual stream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = input.toDF().toDF("user_id", "ts", "value")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch(sink).start()
    try {
      input.addData((3L, ts("2024-01-01 13:00:00"), 31.0))
      q.processAllAvailable()
      assert(state() == Set((1L, 11.0), (2L, 21.0), (3L, 31.0)))
    } finally q.stop()
  }

  test("streaming funnel folds out-of-order arrivals in event-time order") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.funnelStepsStream(
        input.toDF().toDF("ts", "user_id", "event_type"),
        Seq("signup", "click", "purchase"), "10 minutes")
      .toDF("user_id", "stage", "tus")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_out").start()
    try {
      // u1's CLICK arrives first, its SIGNUP second (out of order, both
      // above watermark): an arrival-order fold would complete only stage 1
      input.addData((ts("2024-01-01 10:05:00"), 1L, "click"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:00:00"), 1L, "signup"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").count() == 0,
        "nothing may finalize before the watermark passes the events")
      // watermark advance (another user far in the future) drains the buffer
      input.addData((ts("2024-01-01 12:00:00"), 99L, "signup"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 98L, "signup"))
      q.processAllAvailable()
      val out = spark.table("funnel_out")
        .as[(Long, String, Long)].collect().filter(_._1 == 1L)
        .map(r => r._2 -> r._3).toMap
      assert(out.keySet == Set("1_signup", "2_click"),
        s"click must fold AFTER the later-arriving signup: $out")
      assert(out("1_signup") < out("2_click"))
      // a purchase delivered above the watermark completes stage 3 once the
      // watermark passes it (timeout drain, no further u1 events needed)
      input.addData((ts("2024-01-01 13:30:00"), 1L, "purchase"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:30:00"), 97L, "signup"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 15:00:00"), 96L, "signup"))
      q.processAllAvailable()
      val stages = spark.table("funnel_out")
        .as[(Long, String, Long)].collect().filter(_._1 == 1L).map(_._2).toSet
      assert(stages == Set("1_signup", "2_click", "3_purchase"))
    } finally q.stop()
  }

  test("streaming funnel buffer and acc survive a checkpoint restart") {
    implicit val sql = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_funnel_ckpt_").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val input = MemoryStream[(Timestamp, Long, String)]
    def mkQuery() = EventStreams.funnelStepsStream(
        input.toDF().toDF("ts", "user_id", "event_type"),
        Seq("signup", "click"), "10 minutes")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[(Long, String, Long)], _: Long) =>
          batch.collect().foreach(seen.add)
      }
    val q1 = mkQuery().start()
    try {
      // both events buffered (watermark still behind them) when q1 dies
      input.addData((ts("2024-01-01 10:00:00"), 1L, "signup"))
      q1.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 1L, "click"))
      q1.processAllAvailable()
      assert(seen.isEmpty, "nothing finalized before the watermark advance")
    } finally q1.stop()
    val q2 = mkQuery().start()
    try {
      input.addData((ts("2024-01-01 12:00:00"), 99L, "signup"))
      q2.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 98L, "signup"))
      q2.processAllAvailable()
      val u1 = seen.toArray(Array.empty[(Long, String, Long)]).filter(_._1 == 1L)
      assert(u1.map(_._2).toSet == Set("1_signup", "2_click"),
        s"buffered events must finalize after restart: ${u1.toSeq}")
    } finally q2.stop()
  }

  test("streaming funnel stage times equal the batch fold on the same data") {
    implicit val sql = spark.sqlContext
    val steps = Seq("signup", "click", "purchase")
    // real corpus slice: 3 users' events, shuffled arrival across batches
    val ev = graft.sources.Tables.events(spark, sf)
      .filter($"user_id".isin(1L, 2L, 3L) && $"event_type".isin(steps: _*))
      .select($"ts", $"user_id", $"event_type")
      .as[(Timestamp, Long, String)].collect()
    val shuffled = ev.sortBy(e => (e._1.getTime % 7, e._2))
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.funnelStepsStream(
        input.toDF().toDF("ts", "user_id", "event_type"), steps, "365 days")
      .toDF("user_id", "stage", "tus")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_batch_par").start()
    try {
      // wide watermark: nothing is ever too late; deliver in 3 scrambled
      // chunks, then flush far in the future
      shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      input.addData((ts("2030-01-01 00:00:00"), 99999L, "signup"))
      q.processAllAvailable()
      val got = spark.table("funnel_batch_par")
        .as[(Long, String, Long)].collect().filter(_._1 <= 3L)
        .map(r => (r._1, r._2) -> r._3).toMap
      // driver recompute with the same shared fold
      val expected = ev.groupBy(_._2).flatMap { case (u, es) =>
        val acc = Array.fill(steps.length)(-1L)
        EventStreams.foldFunnel(steps.toIndexedSeq, acc,
          // full micros (getTime is ms-truncated; the corpus has sub-ms)
          es.map(e => (e._1.toInstant.getEpochSecond * 1000000L +
            e._1.toInstant.getNano / 1000L, e._3)).toSeq)
          .map { case (i, t) => (u, s"${i + 1}_${steps(i)}") -> t }
      }.toMap
      assert(got == expected,
        s"stream-only=${got.toSet.diff(expected.toSet).take(3)} " +
          s"batch-only=${expected.toSet.diff(got.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming domain cap: single-batch ≡ batch operator, budget persists") {
    implicit val sql = spark.sqlContext
    import graft.queries.DataPipeline
    val budget = 10L
    // 4 tokens/doc: budget 10 admits ceil(10/4) = 3 hot docs total
    def doc(i: Int, src: String) = (i.toLong, s"tok$i one two three", src)
    val all = (0 until 6).map(doc(_, "hot")) :+ doc(6, "cold")

    // face 1: everything in ONE micro-batch must equal the batch operator
    val in1 = MemoryStream[(Long, String, String)]
    val q1 = DataPipeline.domainCapStream(
        in1.toDF().toDF("doc_id", "text", "source"), budget)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cap_one").start()
    val oneBatch = try {
      in1.addData(all: _*)
      q1.processAllAvailable()
      spark.table("cap_one").as[(Long, String, Long, Long)].collect().toSet
    } finally q1.stop()
    val batch = DataPipeline.domainCapOn(
        all.toDF("doc_id", "text", "source"), budget)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(oneBatch == batch,
      s"stream-only=${oneBatch.diff(batch)} batch-only=${batch.diff(oneBatch)}")

    // face 2: split across micro-batches — consumed state must carry over,
    // and an exhausted domain admits nothing later
    val in2 = MemoryStream[(Long, String, String)]
    val q2 = DataPipeline.domainCapStream(
        in2.toDF().toDF("doc_id", "text", "source"), budget)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cap_two").start()
    try {
      in2.addData(all.take(2): _*) // 8 of 10 tokens consumed
      q2.processAllAvailable()
      in2.addData(all.drop(2): _*)
      q2.processAllAvailable()
      val got = spark.table("cap_two").as[(Long, String, Long, Long)].collect()
      val hot = got.filter(_._2 == "hot")
      assert(hot.length == 3, s"3 hot admissions total, got ${hot.length}")
      assert(hot.map(_._1).toSet.intersect(Set(0L, 1L)) == Set(0L, 1L),
        "batch-1 admissions are arrival-order, not revised retroactively")
      assert(got.count(_._2 == "cold") == 1)
      // third micro-batch against an exhausted domain ships nothing
      in2.addData(doc(7, "hot"))
      q2.processAllAvailable()
      assert(spark.table("cap_two").count() == got.length)
    } finally q2.stop()
  }
}
